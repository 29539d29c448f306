"""Partition-scoped compaction (r10 task 2): ``compact(where=)``
rewrites only the files an optree predicate cannot prune; every other
file carries into the new manifest untouched — the 100 TB maintenance
move (a full compact of 100 TB is a 100 TB write; a day-partition
compact is that day's bytes).

Proofs required by the r9 verdict: rows identical, overlap collapses
only in the target slice, untouched files byte-identical (path-proved:
data files are immutable, so identical paths ARE identical bytes) in
the new manifest.
"""

import os
import uuid

from pyspark.sql import functions as F

from logverzcore_spark.snapshots import SnapshotTable


def _mkroot(tmpdir_path) -> str:
    return os.path.join(str(tmpdir_path), f"pc_{uuid.uuid4().hex[:8]}")


def _two_day_table(spark, tmpdir_path):
    """Day 0: four RANDOM-layout appends (every file spans the whole k
    range — overlap saturated). Day 1: four DISJOINT-range appends
    (already healthy)."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    base = spark.range(0, 2000).select(
        F.col("id"),
        (F.col("id") % 2).alias("day"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k"),
        F.concat(F.lit("p-"), F.col("id")).alias("payload"),
    )
    day0 = base.where("day = 0")
    for j in range(4):  # random layout: slice by id stripe, k spans all
        t.append(day0.where((F.col("id") % 8) == j * 2).coalesce(1))
    day1 = base.where("day = 1").withColumn(
        "k", (F.col("id") % 1000).cast("bigint")
    )
    for lo in (0, 250, 500, 750):  # disjoint k ranges
        t.append(
            day1.where((F.col("k") >= lo) & (F.col("k") < lo + 250)).coalesce(1)
        )
    return t, base


def test_partition_scoped_compact(spark, tmpdir_path):
    t, _ = _two_day_table(spark, tmpdir_path)
    head_before = t._read_manifest(spark, 8)
    rows_before = sorted(
        (r["id"], r["day"], r["k"], r["payload"])
        for r in t.read(spark).collect()
    )
    h0_before = t.skipping_health(spark, "k", where={"day": 0})
    h1_before = t.skipping_health(spark, "k", where={"day": 1})
    assert h0_before["avg_overlap"] >= 2.5  # saturated slice
    assert h1_before["avg_overlap"] <= 1.0  # healthy slice

    v = t.compact(spark, sort_cols=["k"], target_files=4, where={"day": 0})
    assert v == 9
    head_after = t._read_manifest(spark, 9)

    # untouched files carry over byte-identical: day-1's PATHS are
    # unchanged (immutability makes path identity byte identity), and
    # their stats entries are carried verbatim
    day0_files = set(
        f for f in head_before["files"]
        if head_before["stats"][f]["cols"]["day"]["max"] == 0
    )
    day1_files = set(head_before["files"]) - day0_files
    assert day1_files <= set(head_after["files"])
    assert day0_files.isdisjoint(set(head_after["files"]))
    for f in day1_files:
        assert head_after["stats"][f] == head_before["stats"][f]

    # rows identical — compaction never changes content
    rows_after = sorted(
        (r["id"], r["day"], r["k"], r["payload"])
        for r in t.read(spark).collect()
    )
    assert rows_after == rows_before

    # overlap collapses ONLY in the target slice
    h0_after = t.skipping_health(spark, "k", where={"day": 0})
    h1_after = t.skipping_health(spark, "k", where={"day": 1})
    assert h0_after["avg_overlap"] <= 1.0 < h0_before["avg_overlap"]
    assert h1_after == h1_before

    # ...and predicates on the compacted slice now actually prune
    kept, total = t.prune_files(spark, {"and": [{"day": 0}, {"k": {"lt": 100}}]})
    assert len(kept) < total

    # time travel to the pre-compact version is intact
    assert t.count(spark, version=8) == len(rows_before)

    # read_incremental refuses to span the rewrite (file diff ≠ row diff)
    import pytest

    with pytest.raises(ValueError, match="overwrite"):
        t.read_incremental(spark, 8, 9)


def test_partition_compact_noop_and_tag(spark, tmpdir_path):
    """A predicate selecting nothing is a no-op (no new version); a
    tagged partition compact is replay-idempotent."""
    t, _ = _two_day_table(spark, tmpdir_path)
    assert t.compact(spark, where={"day": 99}) == 8  # nothing selected
    assert len(t.versions(spark)) == 8
    v = t.compact(spark, sort_cols=["k"], where={"day": 0}, tag="maint:run-1")
    assert v == 9
    assert t.compact(spark, sort_cols=["k"], where={"day": 0}, tag="maint:run-1") == 9


def test_partition_compact_zorder_scopes_bounds(spark, tmpdir_path):
    """Z-order partition compaction folds its grid bounds over the
    SELECTED files only, and rows stay identical."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 1500).select(
        F.col("id"),
        (F.col("id") % 3).alias("part"),
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(100)).alias("y"),
    )
    for p in range(3):
        for j in range(2):
            t.append(
                df.where((F.col("part") == p) & ((F.col("id") % 2) == j))
                .coalesce(1)
            )
    before = sorted(
        (r["id"], r["part"], r["x"], r["y"]) for r in t.read(spark).collect()
    )
    v = t.compact(spark, zorder_cols=["x", "y"], target_files=4,
                  where={"part": 1})
    after = sorted(
        (r["id"], r["part"], r["x"], r["y"]) for r in t.read(spark).collect()
    )
    assert after == before
    m = t._read_manifest(spark, v)
    # the 4 untouched part∈{0,2} files carried; part=1's two rewrote
    carried = [f for f in m["files"] if "/data/" in f]
    assert len(m["files"]) >= 4 + 1
    # predicates on either z column prune within the compacted slice
    kept, total = t.prune_files(
        spark, {"and": [{"part": 1}, {"x": {"lt": 10}}]}
    )
    assert len(kept) < total
