"""Scale probe for streaming CDC apply (st38/st39, r10 VERDICT task 7):
the dml_scale_probe merge arm driven through
streaming.avro_stream.cdc_merge_stream — per-TRIGGER cost vs table
size at a FIXED CDC batch.

Per scale: a table of N rows lands in range commits (file count grows
with the corpus); a fixed 3-batch CDC feed (each batch: 4k updates in
one key stripe + 1k inserts + 1k tombstones in another stripe, all
batch-disjoint) then drains through cdc_merge_stream(delete_col=) with
maxFilesPerTrigger=1. Reported per trigger: wall (committed_at deltas
between that batch's two merge commits and the drain share) and files
rewritten (manifest diff). The claim of st38's 100 TB cost model holds
when files-rewritten and per-trigger wall stay ~flat while N and
files-total grow 100x — each merge pays the files its batch's keys
live in, never the table.

Row-level outcomes are asserted in-probe before timings are reported.

Usage: python tools/cdc_stream_scale_probe.py [base_rows] [scales...]
Defaults: 500_000 rows, scales 1 10 100. Prints one JSON line per cell.
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


def _data(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).cast("int").alias("g"),
        (F.col("id") * 2654435761 % 1000003).cast("long").alias("v"),
        F.concat(F.lit("row-"), F.lpad(F.col("id").cast("string"), 12, "0"))
        .alias("s"),
    )


def probe(spark, rows: int, work: str) -> None:
    from logverzcore_spark.streaming.avro_stream import cdc_merge_stream

    n_commits = max(8, min(128, rows // 125_000))
    width = rows // n_commits
    t = SnapshotTable(os.path.join(work, f"tbl_{rows}"))
    t0 = time.time()
    for i in range(n_commits):
        t.append(_data(spark, i * width, (i + 1) * width).repartition(4))
    build_s = time.time() - t0
    files_total = len(t._read_manifest(spark, n_commits)["files"])

    # the FIXED feed: 3 batches, each 4k updates + 1k inserts + 1k
    # tombstones, key-stripes disjoint across batches
    src = os.path.join(work, f"cdc_{rows}")
    for b in range(3):
        u_lo = rows // 2 + b * 10_000
        d_lo = rows // 4 + b * 10_000
        ups = spark.range(u_lo, u_lo + 4_000).select(
            F.col("id").alias("k"),
            F.lit(-(10 + b)).cast("long").alias("v"),
            F.lit(False).alias("__deleted"),
        )
        ins = spark.range(rows + 1 + b * 10_000, rows + 1_001 + b * 10_000).select(
            F.col("id").alias("k"),
            F.lit(-(20 + b)).cast("long").alias("v"),
            F.lit(False).alias("__deleted"),
        )
        dels = spark.range(d_lo, d_lo + 1_000).select(
            F.col("id").alias("k"),
            F.lit(0).cast("long").alias("v"),
            F.lit(True).alias("__deleted"),
        )
        ups.unionByName(ins).unionByName(dels).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = spark.read.parquet(src).schema
    ck = os.path.join(work, f"ck_{rows}")
    manifests_before = {
        v: set(t._manifest(spark, v)) for v in (t.versions(spark)[-1],)
    }
    head_before = t.versions(spark)[-1]

    t0 = time.time()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    cdc_merge_stream(
        spark, stream, t.root, on="k", delete_col="__deleted",
        checkpoint_dir=ck,
    ).awaitTermination()
    drain_s = time.time() - t0

    vs = t.versions(spark)
    assert vs[-1] == head_before + 6, "2 tagged merges per batch"
    # correctness before any timing is believed
    assert t.count(spark) == rows + 3 * 1_000 - 3 * 1_000
    for b in range(3):
        assert t.read(spark, where={"v": {"eq": -(10 + b)}}).count() == 4_000
        assert t.read(spark, where={"v": {"eq": -(20 + b)}}).count() == 1_000
        d_lo = rows // 4 + b * 10_000
        assert t.read(
            spark, where={"k": {"between": [d_lo, d_lo + 999]}}
        ).count() == 0

    # CDF read-back over the whole drained span (r11 read_changes):
    # cost is the span's removed+added files only — per batch 4k
    # update pre+post images, 1k inserts, 1k deletes = 10k rows
    t0 = time.time()
    cdf = t.read_changes(spark, head_before, vs[-1], keys="k")
    by_type = {
        r["_change_type"]: r["n"]
        for r in cdf.groupBy("_change_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    cdf_s = time.time() - t0
    assert by_type == {
        "update_preimage": 12_000, "update_postimage": 12_000,
        "insert": 3_000, "delete": 3_000,
    }, by_type

    # per-commit wall from the manifests' committed_at stamps; files
    # rewritten per commit from consecutive manifest diffs
    per_commit = []
    prev_files = manifests_before[head_before]
    prev_ca = t._read_manifest(spark, head_before)["committed_at"]
    for v in range(head_before + 1, vs[-1] + 1):
        m = t._read_manifest(spark, v)
        cur = set(m["files"])
        per_commit.append({
            "version": v,
            "op": m["op"],
            "wall_s": round((m["committed_at"] - prev_ca) / 1000.0, 2),
            "files_rewritten": len(prev_files - cur),
        })
        prev_files, prev_ca = cur, m["committed_at"]

    print(json.dumps({
        "probe": "cdc_merge_stream_per_trigger",
        "rows": rows,
        "files_total": files_total,
        "build_s": round(build_s, 1),
        "drain_s": round(drain_s, 2),
        "per_trigger_s": round(drain_s / 3, 2),
        "cdf_readback_s": round(cdf_s, 2),
        "cdf_rows": int(sum(by_type.values())),
        "commits": per_commit,
        "max_files_rewritten": max(c["files_rewritten"] for c in per_commit),
    }))


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    scales = [int(x) for x in sys.argv[2:]] or [1, 10, 100]
    spark = get_session("cdc-stream-scale-probe")
    work = tempfile.mkdtemp(prefix="cdc_probe_")
    try:
        for s in scales:
            probe(spark, base * s, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
