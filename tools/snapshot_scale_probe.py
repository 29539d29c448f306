"""Scale probe for snapshot data skipping + incremental MV maintenance.

Builds a range-committed SnapshotTable at 1x/10x/100x rows and times,
at each scale:
  - full-scan filter count (the no-stats baseline)
  - stats-pruned selective read (read(where=)) of a fixed ~50k-row slice
  - metadata-only count()
  - IncrementalAggregate.refresh of a FIXED 100k-row delta vs the
    one-shot full recompute of the same aggregate

The claims under test: pruned-read wall tracks the slice (files kept),
not the corpus; count() is manifest-time at any size; refresh cost is
delta+groups (flat), recompute is corpus (linear).

Usage: python tools/snapshot_scale_probe.py [base_rows] [scales...]
Defaults: 1_000_000 rows, scales 1 10 100.
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
from logverzcore_spark.incremental import IncrementalAggregate
from logverzcore_spark.snapshots import SnapshotTable


def _data(spark, lo: int, hi: int):
    return (
        spark.range(lo, hi)
        .withColumn("k", F.col("id").cast("long"))
        .withColumn("g", (F.col("id") % 1000).cast("int"))
        .withColumn("v", (F.col("id") * 2654435761 % 1000003).cast("long"))
        .withColumn(
            "s", F.concat(F.lit("row-"), F.lpad(F.col("id").cast("string"), 12, "0"))
        )
    )


def probe(spark, rows: int, work: str) -> dict:
    # commits scale with the corpus (8 at 1x -> 128 at 100x), 4 files
    # each: file count grows with data, the real lakehouse shape.
    n_commits = max(8, min(128, rows // 125_000))
    width = rows // n_commits
    t = SnapshotTable(os.path.join(work, f"tbl_{rows}"))
    t0 = time.time()
    for i in range(n_commits):
        t.append(_data(spark, i * width, (i + 1) * width).repartition(4))
    build_s = time.time() - t0

    mid = rows // 2
    where = {"k": {"gte": mid, "lt": mid + 50_000}}

    t0 = time.time()
    full = t.read(spark).filter(
        (F.col("k") >= mid) & (F.col("k") < mid + 50_000)
    ).count()
    full_s = time.time() - t0

    kept, total = t.prune_files(spark, where)
    t0 = time.time()
    pruned = t.read(spark, where=where).count()
    pruned_s = time.time() - t0
    assert pruned == full == 50_000, (pruned, full)

    t0 = time.time()
    n = t.count(spark)
    count_s = time.time() - t0
    assert n == rows

    mv = IncrementalAggregate(
        t,
        os.path.join(work, f"mv_{rows}"),
        group_keys=["g"],
        aggregates={
            "n": ("count", None),
            "total": ("sum", "v"),
            "hi": ("max", "v"),
        },
    )
    mv.refresh(spark)  # initial build (not timed: one-off)
    t.append(_data(spark, rows, rows + 100_000).repartition(4))
    t0 = time.time()
    rep = mv.refresh(spark)
    refresh_s = time.time() - t0
    assert rep["mode"] == "delta"

    t0 = time.time()
    t.read(spark).groupBy("g").agg(
        F.count(F.lit(1)), F.sum("v"), F.max("v")
    ).collect()
    recompute_s = time.time() - t0

    return {
        "rows": rows,
        "commits": n_commits,
        "files_total": total,
        "files_kept": len(kept),
        "build_s": round(build_s, 2),
        "full_filter_s": round(full_s, 2),
        "pruned_read_s": round(pruned_s, 2),
        "meta_count_s": round(count_s, 3),
        "mv_delta_refresh_s": round(refresh_s, 2),
        "mv_full_recompute_s": round(recompute_s, 2),
    }


def probe_bloom(spark, rows: int, work: str) -> dict:
    """Bloom-skipping scaling: RANDOM layout (intervals prune nothing),
    point lookup via the per-file filter vs the full-filter baseline."""
    from pyspark.sql import functions as FF

    n_commits = max(8, min(64, rows // 250_000))
    width = rows // n_commits
    t = SnapshotTable(
        os.path.join(work, f"bl_{rows}"), bloom_columns=["key"]
    )
    df = (
        spark.range(0, rows)
        .withColumn(
            "key",
            FF.concat(
                FF.lit("user-"),
                FF.substring(FF.md5(FF.col("id").cast("string")), 1, 12),
            ),
        )
        .withColumn("v", (FF.col("id") * 7 % 1009).cast("long"))
    )
    t0 = time.time()
    for i in range(n_commits):
        t.append(
            df.where(
                (FF.col("id") >= i * width) & (FF.col("id") < (i + 1) * width)
            ).repartition(4)
        )
    build_s = time.time() - t0

    import hashlib

    probe_key = "user-" + hashlib.md5(
        str(rows // 2).encode("utf-8")
    ).hexdigest()[:12]

    t0 = time.time()
    full = t.read(spark).filter(FF.col("key") == probe_key).count()
    full_s = time.time() - t0
    kept, total = t.prune_files(spark, {"key": probe_key})
    t0 = time.time()
    pruned = t.read(spark, where={"key": probe_key}).count()
    pruned_s = time.time() - t0
    assert pruned == full == 1, (pruned, full)
    return {
        "rows": rows,
        "files_total": total,
        "files_kept": len(kept),
        "build_s": round(build_s, 2),
        "full_lookup_s": round(full_s, 2),
        "bloom_lookup_s": round(pruned_s, 2),
    }


def main():
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scales = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    bloom_mode = os.environ.get("PROBE_BLOOM") == "1"
    spark = get_session(app_name="snapshot-scale-probe")
    work = tempfile.mkdtemp(prefix="snapscale_")
    try:
        for s in scales:
            out = (probe_bloom if bloom_mode else probe)(spark, base * s, work)
            out["scale"] = s
            print(json.dumps(out), flush=True)
            # reclaim between scales: the 100x table is ~10 GB
            shutil.rmtree(os.path.join(work, f"tbl_{base * s}"), ignore_errors=True)
            shutil.rmtree(os.path.join(work, f"mv_{base * s}"), ignore_errors=True)
            shutil.rmtree(os.path.join(work, f"bl_{base * s}"), ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
