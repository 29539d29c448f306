"""Snapshot-layer row deletes (r10 task 3): ``delete_where`` as a
stats/bloom-pruned selective rewrite — only files that can match are
rewritten; the rest carry over untouched. Reference parity: q113's
point-delete (export.delete_rows) one layer down, at the versioned
table.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.incremental import IncrementalAggregate
from logverzcore_spark.snapshots import SnapshotTable


def _mkroot(tmpdir_path, name="dw") -> str:
    return os.path.join(str(tmpdir_path), f"{name}_{uuid.uuid4().hex[:8]}")


def _ranged(spark, tmpdir_path, **kw):
    """Four appends with disjoint id ranges — point deletes should
    rewrite exactly one file."""
    t = SnapshotTable(_mkroot(tmpdir_path), **kw)
    df = spark.range(0, 1200).select(
        F.col("id"),
        F.concat(F.lit("user-"), F.col("id") % 100).alias("user"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )
    for lo in (0, 300, 600, 900):
        t.append(df.where((F.col("id") >= lo) & (F.col("id") < lo + 300)).coalesce(1))
    return t, df


def test_delete_rewrites_only_matching_files(spark, tmpdir_path):
    t, df = _ranged(spark, tmpdir_path)
    before = t._read_manifest(spark, 4)
    v = t.delete_where(spark, {"id": {"between": [450, 470]}})
    assert v == 5
    after = t._read_manifest(spark, v)

    # exactly one file (the 300-599 range) was rewritten; the other
    # three carried over path-identical (immutable files: path identity
    # IS byte identity), stats entries verbatim
    carried = set(before["files"]) & set(after["files"])
    assert len(carried) == 3
    assert len(after["files"]) == 4
    for f in carried:
        assert after["stats"][f] == before["stats"][f]

    # matching rows gone, everything else intact
    assert t.count(spark) == 1200 - 21
    assert t.read(spark, where={"id": {"between": [450, 470]}}).count() == 0
    got = sorted(r["id"] for r in t.read(spark).select("id").collect())
    assert got == [i for i in range(1200) if not (450 <= i <= 470)]

    # time travel to the pre-delete version still has the rows
    assert t.count(spark, version=4) == 1200
    assert t.read(spark, version=4, where={"id": 460}).count() == 1

    # read_incremental refuses to span the delete
    with pytest.raises(ValueError, match="overwrite"):
        t.read_incremental(spark, 4, 5)


def test_delete_null_semantics_and_noop(spark, tmpdir_path):
    """SQL DELETE 3VL: rows where the predicate is NULL survive; a
    predicate pruning proves can't-match is a version-free no-op."""
    t = SnapshotTable(_mkroot(tmpdir_path, "nul"))
    df = spark.range(0, 20).selectExpr(
        "id", "CASE WHEN id % 4 = 0 THEN NULL ELSE cast(id % 5 AS int) END AS g"
    )
    t.append(df.coalesce(1))
    v = t.delete_where(spark, {"g": {"lt": 2}})
    assert v == 2
    rows = {r["id"]: r["g"] for r in t.read(spark).collect()}
    # g NULL rows (id%4==0) all survive; g in {0,1} rows are gone
    assert all(i in rows for i in range(0, 20, 4))
    assert all(g is None or g >= 2 for g in rows.values())
    # provably-no-match predicate: head version returned, no commit
    assert t.delete_where(spark, {"id": {"gt": 10_000}}) == 2
    assert t.versions(spark)[-1] == 2
    # tagged delete is replay-idempotent
    v3 = t.delete_where(spark, {"g": 3}, tag="gdpr:req-7")
    assert v3 == 3
    assert t.delete_where(spark, {"g": 3}, tag="gdpr:req-7") == 3


def test_delete_bloom_pruned_point_erasure(spark, tmpdir_path):
    """On a RANDOM layout (intervals useless) the bloom filter scopes
    the rewrite: erasing one key rewrites only the file(s) actually
    holding it — the 100 TB GDPR cost model."""
    t = SnapshotTable(
        _mkroot(tmpdir_path, "bl"), bloom_columns=["key"]
    )
    df = spark.range(0, 800).selectExpr("id", "concat('k-', id) AS key")
    for j in range(5):  # random layout: id stripes, key spans everything
        t.append(df.where((F.col("id") % 5) == j).coalesce(1))
    before = t._read_manifest(spark, 5)
    v = t.delete_where(spark, {"key": "k-123"})
    after = t._read_manifest(spark, v)
    carried = set(before["files"]) & set(after["files"])
    # bloom pruning: 4 of 5 files provably lack the key and carry over
    assert len(carried) == 4
    assert t.read(spark, where={"key": "k-123"}).count() == 0
    assert t.count(spark) == 799
    # the erased key's neighbors in the rewritten file are intact
    assert t.read(spark, where={"key": "k-128"}).count() == 1


def test_delete_triggers_mv_rebuild(spark, tmpdir_path):
    """An incremental MV downstream of a delete lands on the
    post-delete truth. r11 sharpened the answer: a count/sum MV is
    RETRACTABLE, so the refresh FOLDS the change feed (DML-slice
    cost) instead of rebuilding — the rebuild remains the answer for
    min/max/HLL MVs (test_incremental_mv covers both)."""
    src = SnapshotTable(_mkroot(tmpdir_path, "src"))
    df = spark.range(0, 400).selectExpr(
        "id", "cast(id % 8 AS int) AS g", "cast(id AS double) AS v"
    )
    src.append(df.where("id < 200").coalesce(1))
    mv = IncrementalAggregate(
        src,
        _mkroot(tmpdir_path, "mv"),
        ["g"],
        {"n": ("count", None), "total": ("sum", "v")},
        # g is id%8: the delete rewrites both of this tiny fixture's
        # files, so the r12 cost gate would (rightly) rebuild — off,
        # to exercise the fold path
        fold_cost_factor=None,
    )
    assert mv.refresh(spark)["mode"] == "initial"
    src.append(df.where("id >= 200").coalesce(1))
    assert mv.refresh(spark)["mode"] == "delta"
    src.delete_where(spark, {"g": 3})
    rep = mv.refresh(spark)
    assert rep["mode"] == "fold"  # retractable aggregates: no rescan
    got = {r["g"]: (r["n"], r["total"]) for r in mv.result(spark).collect()}
    assert 3 not in got
    want = {
        r["g"]: (r["n"], r["total"])
        for r in df.where("g <> 3").groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == want
