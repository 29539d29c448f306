"""Scale probe for the snapshot DML triad (r10): the selective-rewrite
claim, measured — a FIXED-size delete/update/merge against a
range-committed table grown 1x/10x/100x must cost the SLICE's rewrite,
not the corpus's.

Per scale: a table of N rows lands in range commits (file count grows
with the corpus); then
  - delete_where of a fixed ~20k-key slice      (wall + files rewritten)
  - update_where of a different fixed slice      (wall + files rewritten)
  - merge_into with a fixed 5k-row CDC source    (wall + files rewritten)
Each step asserts its row-level outcome before the timing is reported.
The claim holds when wall and files-rewritten stay ~flat while N and
files-total grow 100x.

Usage: python tools/dml_scale_probe.py [base_rows] [scales...]
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
    n_commits = max(8, min(128, rows // 125_000))
    width = rows // n_commits
    t = SnapshotTable(os.path.join(work, f"tbl_{rows}"))
    t0 = time.time()
    for i in range(n_commits):
        t.append(_data(spark, i * width, (i + 1) * width).repartition(4))
    build_s = time.time() - t0
    files_total = len(t._read_manifest(spark, n_commits)["files"])

    mid = rows // 2
    # fixed 20k-key delete slice in the middle of the key space
    d_lo, d_hi = mid, mid + 20_000
    before = t._read_manifest(spark, t.versions(spark)[-1])
    t0 = time.time()
    t.delete_where(spark, {"k": {"between": [d_lo, d_hi - 1]}})
    delete_s = time.time() - t0
    after = t._read_manifest(spark, t.versions(spark)[-1])
    del_rewrote = len(set(before["files"]) - set(after["files"]))
    assert t.count(spark) == rows - 20_000

    # fixed 20k-key update slice, elsewhere
    u_lo, u_hi = rows // 4, rows // 4 + 20_000
    before = after
    t0 = time.time()
    t.update_where(
        spark, {"k": {"between": [u_lo, u_hi - 1]}}, {"v": F.lit(-1)}
    )
    update_s = time.time() - t0
    after = t._read_manifest(spark, t.versions(spark)[-1])
    upd_rewrote = len(set(before["files"]) - set(after["files"]))
    assert t.read(spark, where={"v": {"eq": -1}}).count() == 20_000

    # fixed 5k-row CDC source: 4k updates in one stripe + 1k inserts
    m_lo = rows // 8
    src = spark.range(m_lo, m_lo + 4_000).select(
        F.col("id").alias("k"), F.lit(-7).cast("long").alias("v")
    ).unionByName(
        spark.range(rows + 1, rows + 1_001).select(
            F.col("id").alias("k"), F.lit(-8).cast("long").alias("v")
        )
    )
    before = after
    t0 = time.time()
    t.merge_into(spark, src, on="k")
    merge_s = time.time() - t0
    after = t._read_manifest(spark, t.versions(spark)[-1])
    mrg_rewrote = len(set(before["files"]) - set(after["files"]))
    assert t.count(spark) == rows - 20_000 + 1_000
    assert t.read(spark, where={"v": {"eq": -7}}).count() == 4_000
    assert t.read(spark, where={"v": {"eq": -8}}).count() == 1_000

    print(json.dumps({
        "probe": "dml_selective_rewrite",
        "rows": rows,
        "files_total": files_total,
        "build_s": round(build_s, 1),
        "delete_s": round(delete_s, 2),
        "delete_files_rewritten": del_rewrote,
        "update_s": round(update_s, 2),
        "update_files_rewritten": upd_rewrote,
        "merge_s": round(merge_s, 2),
        "merge_files_rewritten": mrg_rewrote,
    }))


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scales = [int(x) for x in sys.argv[2:]] or [1, 10, 100]
    spark = get_session("dml-scale-probe")
    work = tempfile.mkdtemp(prefix="dml_probe_")
    try:
        for s in scales:
            probe(spark, base * s, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
