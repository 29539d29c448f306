"""Manifest O(files) scale probe (r12 VERDICT task 3).

The snapshot layer keeps ONE JSON manifest per version carrying the
full file list + per-file stats, and every driver-side consumer
(commit, head read, stat prune, manifest-count) walks it linearly.
SCALE.md prices DML/CDC/reads against ROW growth at bounded file
counts — compaction is the documented control — but the manifest's own
O(files) terms were unmeasured: the regime where Delta moved to parquet
checkpoints. This probe grows HEAD FILE COUNT (tiny files, constant
rows/file) through 512 -> 4096 -> 16384 and measures, at each point:

- manifest_bytes: the head manifest's on-disk size;
- commit_wall_1file_s: wall of appending ONE file (the pure
  O(head files) manifest-rewrite term — data write is constant);
- head_read_wall_s: _head() on a FRESH handle (manifest parse);
- prune_wall_s: prune_files() over an equality predicate (the
  driver-side stat walk);
- count_wall_s: count() via manifest row sums (same walk);
- bulk_commit_wall_s: the last 512-file append at that size (the
  ingest-shaped commit: new-file stats scan + manifest rewrite).

Correctness is asserted in-probe (count == rows appended) so the
numbers grade a working table, not a stub. Output: one JSON line per
scale point. The decision criterion recorded in SCALE.md: if the
1-file commit wall at 16k files exceeds ~2x the 512-file point, the
two-level manifest / parquet-stats-sidecar design note triggers.

r12 follow-up: that criterion FIRED (2.36x, linear-driven), so the
two-level manifest now exists (SnapshotTable.stats_sidecar_min_files;
delta sidecars re-referenced across appends). ``--mode`` selects what
this probe grades: ``inline`` pins the single-level format
(stats_sidecar_min_files=None — the r12 baseline numbers), ``two-level``
arms it from the first commit (min_files=1) so every point measures the
delta-reuse path. Two-level points additionally report the sidecar
chain (count + total bytes) so the bounded-chain claim is in the
artifact; consolidation cycles show up in the chain length across
points (n_sidecars drops when a commit consolidates).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logverzcore_spark.engine import get_session
from logverzcore_spark.snapshots import SnapshotTable

FILES_PER_COMMIT = 512
ROWS_PER_FILE = 8
POINTS = [512, 4096, 16384]


def _local(p: str) -> str:
    return p[len("file:"):] if p.startswith("file:") else p


def main() -> None:
    modes = [a for a in sys.argv[1:] if a.startswith("--mode=")]
    mode = modes[-1].split("=", 1)[1] if modes else "inline"
    if mode not in ("inline", "two-level"):
        raise SystemExit(f"unknown --mode={mode!r}: inline | two-level")
    # r14 (VERDICT task 7): --points=... extends the sweep (e.g. to
    # 65536) without changing the committed r12/r13-comparable defaults.
    global POINTS
    pts = [a for a in sys.argv[1:] if a.startswith("--points=")]
    if pts:
        POINTS = [int(x) for x in pts[-1].split("=", 1)[1].split(",")]
    spark = get_session()
    work = tempfile.mkdtemp(prefix="manifest_scale_")
    root = os.path.join(work, "t")
    t = SnapshotTable(
        root,
        stats_sidecar_min_files=(1 if mode == "two-level" else None),
    )
    total_rows = 0
    n_files = 0
    try:
        for target in POINTS:
            bulk_wall = None
            while n_files < target:
                lo = total_rows
                hi = lo + FILES_PER_COMMIT * ROWS_PER_FILE
                df = spark.range(lo, hi).select(
                    F.col("id").alias("k"),
                    (F.col("id") % 97).cast("int").alias("g"),
                )
                t0 = time.time()
                t.append(df.repartition(FILES_PER_COMMIT))
                bulk_wall = time.time() - t0
                n_files += FILES_PER_COMMIT
                total_rows += hi - lo

            head_v = t.versions(spark)[-1]
            mpath = _local(os.path.join(t.snaps, f"v{head_v}.json"))
            manifest_bytes = os.path.getsize(mpath)

            # the pure manifest-rewrite term: ONE tiny file appended
            one = spark.range(total_rows, total_rows + ROWS_PER_FILE).select(
                F.col("id").alias("k"),
                (F.col("id") % 97).cast("int").alias("g"),
            ).coalesce(1)
            t0 = time.time()
            t.append(one)
            commit_wall = time.time() - t0
            n_files += 1
            total_rows += ROWS_PER_FILE

            t0 = time.time()
            fresh = SnapshotTable(
                root,
                stats_sidecar_min_files=(
                    1 if mode == "two-level" else None
                ),
            )
            hv, head = fresh._head(spark)
            head_wall = time.time() - t0
            assert head is not None and len(head["files"]) == n_files
            sidecar_names = head.get("stats_sidecars") or []
            sidecar_bytes = sum(
                os.path.getsize(_local(os.path.join(t.snaps, nm)))
                for nm in sidecar_names
            )

            t0 = time.time()
            kept, tot = t.prune_files(spark, {"k": {"between": [0, 40]}})
            prune_wall = time.time() - t0
            assert tot == n_files

            t0 = time.time()
            n = t.count(spark)
            count_wall = time.time() - t0
            assert n == total_rows, (n, total_rows)  # correctness gate

            print(json.dumps({
                "mode": mode,
                "n_sidecars": len(sidecar_names),
                "sidecar_bytes": sidecar_bytes,
                "head_files": n_files,
                "rows": total_rows,
                "manifest_bytes": manifest_bytes,
                "commit_wall_1file_s": round(commit_wall, 3),
                "head_read_wall_s": round(head_wall, 3),
                "prune_wall_s": round(prune_wall, 3),
                "prune_kept": len(kept),
                "count_wall_s": round(count_wall, 3),
                "bulk_commit_wall_s": (
                    round(bulk_wall, 3) if bulk_wall is not None else None
                ),
            }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
