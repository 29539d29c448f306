"""IncrementalAggregate: delta-cost materialized aggregates over
snapshot tables. The contract: after any refresh sequence, result()
equals the one-shot groupBy over the source head — and a delta refresh
never re-reads committed history (proved by poisoning the full-read
path)."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.incremental import IncrementalAggregate
from logverzcore_spark.snapshots import SnapshotTable


def _roots(tmpdir_path):
    base = os.path.join(str(tmpdir_path), uuid.uuid4().hex[:8])
    return os.path.join(base, "src"), os.path.join(base, "mv")


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumn("g", (F.col("id") % 4).cast("int"))
        .withColumn("v", (F.col("id") * 3 % 101).cast("long"))
        .withColumn("u", F.concat(F.lit("user-"), (F.col("id") % 37).cast("string")))
    )


def _mv(src, mv_root, where=None):
    return IncrementalAggregate(
        src,
        mv_root,
        group_keys=["g"],
        aggregates={
            "n": ("count", None),
            "total": ("sum", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
            "mean": ("avg", "v"),
            "users": ("approx_distinct", "u"),
        },
        where=where,
    )


def _expect(df):
    return {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("v").alias("mean"),
        )
        .collect()
    }


def _check_exact(mv, spark, df):
    got = {r["g"]: r for r in mv.result(spark).collect()}
    want = _expect(df)
    assert set(got) == set(want)
    for g, w in want.items():
        r = got[g]
        assert (r["n"], r["total"], r["lo"], r["hi"]) == (
            w["n"], w["total"], w["lo"], w["hi"],
        )
        assert r["mean"] == pytest.approx(w["mean"], rel=1e-12)
        assert r["users"] > 0


def test_refresh_modes_and_exactness(spark, tmpdir_path):
    src_root, mv_root = _roots(tmpdir_path)
    src = SnapshotTable(src_root)
    mv = _mv(src, mv_root)
    src.append(_df(spark, 0, 400))
    assert mv.refresh(spark)["mode"] == "initial"
    _check_exact(mv, spark, _df(spark, 0, 400))
    src.append(_df(spark, 400, 700))
    assert mv.refresh(spark)["mode"] == "delta"
    _check_exact(mv, spark, _df(spark, 0, 700))
    assert mv.refresh(spark)["mode"] == "noop"
    assert mv.source_version(spark) == 2


def test_delta_refresh_never_rereads_history(spark, tmpdir_path):
    src_root, mv_root = _roots(tmpdir_path)
    src = SnapshotTable(src_root)
    mv = _mv(src, mv_root)
    src.append(_df(spark, 0, 300))
    mv.refresh(spark)
    src.append(_df(spark, 300, 350))
    # poison the full-read path: a delta refresh must use
    # read_incremental only — touching source.read means it rescanned
    # committed history.
    def _boom(*a, **kw):
        raise AssertionError("delta refresh re-read the full source")

    src.read = _boom
    assert mv.refresh(spark)["mode"] == "delta"
    src = SnapshotTable(src_root)  # un-poisoned handle
    _check_exact(_mv(src, mv_root), spark, _df(spark, 0, 350))


def test_overwrite_triggers_rebuild(spark, tmpdir_path):
    src_root, mv_root = _roots(tmpdir_path)
    src = SnapshotTable(src_root)
    mv = _mv(src, mv_root)
    src.append(_df(spark, 0, 300))
    mv.refresh(spark)
    src.overwrite(_df(spark, 100, 200))  # compaction/correction
    assert mv.refresh(spark)["mode"] == "rebuild"
    _check_exact(mv, spark, _df(spark, 100, 200))


def test_where_filtered_mv(spark, tmpdir_path):
    src_root, mv_root = _roots(tmpdir_path)
    src = SnapshotTable(src_root)
    mv = _mv(src, mv_root, where={"v": {"gte": 50}})
    src.append(_df(spark, 0, 300))
    mv.refresh(spark)
    src.append(_df(spark, 300, 600))
    mv.refresh(spark)
    _check_exact(mv, spark, _df(spark, 0, 600).filter("v >= 50"))


def test_concurrent_refresher_sees_tag_and_noops(spark, tmpdir_path):
    src_root, mv_root = _roots(tmpdir_path)
    src = SnapshotTable(src_root)
    a = _mv(src, mv_root)
    b = _mv(SnapshotTable(src_root), mv_root)
    src.append(_df(spark, 0, 200))
    assert a.refresh(spark)["mode"] == "initial"
    # b raced a to the same source version: the state commit's tag
    # (srcv:1) makes b's attempt a no-op, never a double-apply.
    assert b.refresh(spark)["mode"] == "noop"
    src.append(_df(spark, 200, 300))
    assert a.refresh(spark)["mode"] == "delta"
    assert b.refresh(spark)["mode"] == "noop"
    _check_exact(a, spark, _df(spark, 0, 300))


def test_unsupported_aggregate_rejected(spark, tmpdir_path):
    src_root, mv_root = _roots(tmpdir_path)
    with pytest.raises(ValueError, match="not incrementally mergeable"):
        IncrementalAggregate(
            SnapshotTable(src_root), mv_root,
            group_keys=["g"],
            aggregates={"p50": ("percentile", "v")},
        )


def test_state_is_group_cardinality_not_corpus(spark, tmpdir_path):
    src_root, mv_root = _roots(tmpdir_path)
    src = SnapshotTable(src_root)
    mv = _mv(src, mv_root)
    src.append(_df(spark, 0, 2000))
    mv.refresh(spark)
    src.append(_df(spark, 2000, 4000))
    mv.refresh(spark)
    state_rows = mv.state.read(spark).count()
    assert state_rows == 4  # |groups|, regardless of corpus size


def test_crash_between_append_and_refresh_folds_multi_version_span(spark, tmpdir_path):
    """The incremental_mv_stream crash window: a batch whose append
    committed but whose refresh didn't leaves state one version behind;
    the NEXT refresh must fold the whole multi-version increment."""
    src_root, mv_root = _roots(tmpdir_path)
    src = SnapshotTable(src_root)
    mv = _mv(src, mv_root)
    src.append(_df(spark, 0, 200))
    mv.refresh(spark)
    src.append(_df(spark, 200, 300))  # crash here: no refresh
    src.append(_df(spark, 300, 450))
    rep = mv.refresh(spark)
    assert rep["mode"] == "delta" and rep["source_version"] == 3
    _check_exact(mv, spark, _df(spark, 0, 450))
