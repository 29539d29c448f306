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
    rep = mv.refresh(spark)
    assert rep["mode"] == "rebuild"
    # r12 cost gate: the replace-the-corpus span priced at removed
    # (300 rows) + added (100 rows) > head (100 rows) — the report
    # carries both numbers that drove the decision
    assert rep["priced_unit"] in ("bytes", "rows")
    assert rep["priced_span"] > rep["priced_head"] > 0
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


def test_mv_fold_across_dml_matches_recompute(spark, tmpdir_path):
    """r11: an overwrite no longer always costs a rebuild — a
    count/sum/avg MV consumes the CHANGE FEED: deletes retract,
    updates fold pre−/post+, merges fold all three classes, and a
    group whose last row died disappears (presence counter). Every
    fold must equal a from-scratch recompute of the same head."""
    import os as _os
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    root = _os.path.join(str(tmpdir_path), f"mvf_{_uuid.uuid4().hex[:6]}")
    t = SnapshotTable(_os.path.join(root, "src"))
    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("int").alias("g"),
        (F.col("id") * 3).alias("v"),
    )
    t.append(df.where("k < 200").repartition(3))
    t.append(df.where("k >= 200").coalesce(1))
    mv = IncrementalAggregate(
        t, _os.path.join(root, "state"), ["g"],
        {"n": ("count", None), "s": ("sum", "v"), "m": ("avg", "v")},
        source_keys=["k"],
        # machinery test: the 1-4-file fixture makes every DML rewrite
        # ~all bytes, so the r12 cost gate would (correctly) rebuild —
        # disable it to exercise the fold algebra itself
        fold_cost_factor=None,
    )
    assert mv.refresh(spark)["mode"] == "initial"

    def check():
        got = {
            r["g"]: (r["n"], r["s"], r["m"])
            for r in mv.result(spark).collect()
        }
        want = {
            r["g"]: (r["n"], r["s"], r["m"])
            for r in t.read(spark).groupBy("g").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("s"),
                F.avg("v").alias("m"),
            ).collect()
        }
        assert got == want, (got, want)

    # delete: retracts rows; g=7 loses some rows, none vanish yet
    t.delete_where(spark, {"k": {"between": [60, 99]}})
    assert mv.refresh(spark)["mode"] == "fold"
    check()
    # update: pre-image retracts, post-image adds
    t.update_where(spark, {"k": {"lt": 30}}, {"v": "v + 1000"})
    assert mv.refresh(spark)["mode"] == "fold"
    check()
    # merge: update + insert + delete classes in one commit
    src = spark.createDataFrame(
        [(0, 0, -999), (1000, 3, 5), (1001, 3, 7)],
        "k long, g int, v long",
    )
    t.merge_into(spark, src, on="k")
    assert mv.refresh(spark)["mode"] == "fold"
    check()
    # group extinction: delete EVERY row of g=9 — the group must
    # disappear from the MV, exactly as a recompute would drop it
    t.delete_where(spark, {"g": {"eq": 9}})
    assert mv.refresh(spark)["mode"] == "fold"
    check()
    assert not [
        r for r in mv.result(spark).collect() if r["g"] == 9
    ]
    # replay idempotence still holds (same srcv tag)
    assert mv.refresh(spark)["mode"] == "noop"


def test_mv_fold_nonretractable_rebuilds_and_null_sum_edge(spark, tmpdir_path):
    """min/max cannot retract (the evicted maximum needs a runner-up):
    a DML still answers with a rebuild. And SUM's folded zero must
    finalize to NULL when a group's every non-null value was
    retracted — the SQL answer."""
    import os as _os
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    root = _os.path.join(str(tmpdir_path), f"mvn_{_uuid.uuid4().hex[:6]}")
    t = SnapshotTable(_os.path.join(root, "src"))
    t.append(spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("g"),
        F.col("id").alias("v"),
    ).coalesce(2))
    mv = IncrementalAggregate(
        t, _os.path.join(root, "state"), ["g"],
        {"hi": ("max", "v"), "n": ("count", None)},
        fold_cost_factor=None,
    )
    mv.refresh(spark)
    t.delete_where(spark, {"v": {"gte": 50}})
    # r12: max met a delete — no longer a full rebuild: the feed's
    # affected groups (all 4 here) are recomputed from source, mode
    # 'repair'
    rep = mv.refresh(spark)
    assert rep["mode"] == "repair" and rep["repaired_groups"] == 4
    got = {r["g"]: r["hi"] for r in mv.result(spark).collect()}
    assert got == {0: 48, 1: 49, 2: 46, 3: 47}

    # the NULL-sum edge: g=1's only non-null v is retracted while a
    # null-v row keeps the group alive — SUM must be NULL, not 0
    t2 = SnapshotTable(_os.path.join(root, "src2"))
    t2.append(spark.createDataFrame(
        [(1, 1, 10), (2, 1, None), (3, 2, 5)], "k long, g int, v long"
    ).coalesce(1))
    mv2 = IncrementalAggregate(
        t2, _os.path.join(root, "state2"), ["g"],
        {"s": ("sum", "v"), "m": ("avg", "v")}, source_keys=["k"],
        fold_cost_factor=None,
    )
    mv2.refresh(spark)
    t2.delete_where(spark, {"k": {"eq": 1}})
    assert mv2.refresh(spark)["mode"] == "fold"
    # avg shares the guard: cnt==0 must finalize to NULL, not raise
    # DIVIDE_BY_ZERO under Spark 4's default ANSI mode (r11 ADVICE)
    got = {r["g"]: (r["s"], r["m"]) for r in mv2.result(spark).collect()}
    want = {r["g"]: (r["s"], r["m"]) for r in t2.read(spark).groupBy("g").agg(
        F.sum("v").alias("s"), F.avg("v").alias("m")
    ).collect()}
    assert got == want == {1: (None, None), 2: (5, 5.0)}


def test_mv_fold_where_predicate_boundary(spark, tmpdir_path):
    """An UPDATE that moves rows across the MV's where-predicate
    boundary folds correctly: only the surviving image passes the
    filter, so entering rows add and leaving rows retract."""
    import os as _os
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    root = _os.path.join(str(tmpdir_path), f"mvw_{_uuid.uuid4().hex[:6]}")
    t = SnapshotTable(_os.path.join(root, "src"))
    t.append(spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("int").alias("g"),
        F.col("id").alias("v"),
    ).coalesce(2))
    mv = IncrementalAggregate(
        t, _os.path.join(root, "state"), ["g"],
        {"n": ("count", None), "s": ("sum", "v")},
        where={"v": {"gte": 20}}, source_keys=["k"],
        fold_cost_factor=None,
    )
    mv.refresh(spark)
    # rows 30..39 LEAVE the predicate (v -> v-25), rows 10..14 ENTER
    # (v -> v+20)
    t.update_where(spark, {"k": {"gte": 30}}, {"v": "v - 25"})
    assert mv.refresh(spark)["mode"] == "fold"
    t.update_where(spark, {"k": {"between": [10, 14]}}, {"v": "v + 20"})
    assert mv.refresh(spark)["mode"] == "fold"
    got = {r["g"]: (r["n"], r["s"]) for r in mv.result(spark).collect()}
    want = {
        r["g"]: (r["n"], r["s"])
        for r in t.read(spark).where("v >= 20").groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        ).collect()
    }
    assert got == want


def _mixed_mv(t, root, **kw):
    from logverzcore_spark.incremental import IncrementalAggregate
    return IncrementalAggregate(
        t, root, ["g"],
        {
            "n": ("count", None), "s": ("sum", "v"),
            "lo": ("min", "v"), "hi": ("max", "v"),
            "u": ("approx_distinct", "k"),
        },
        source_keys=["k"], **kw,
    )


def _mixed_want(t, spark):
    return {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in t.read(spark).groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        ).collect()
    }


def test_repair_equals_recompute_across_dml(spark, tmpdir_path):
    """r12: a min/max/HLL MV follows DML through mode 'repair' — only
    the change feed's groups are recomputed from source, untouched
    groups carry — and every repair equals a from-scratch recompute
    of the head, including group extinction."""
    import os as _os
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    root = _os.path.join(str(tmpdir_path), f"rep_{_uuid.uuid4().hex[:6]}")
    t = SnapshotTable(_os.path.join(root, "src"))
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).cast("int").alias("g"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    t.append(df.repartition(3))
    mv = _mixed_mv(t, _os.path.join(root, "state"), fold_cost_factor=None)
    assert mv.refresh(spark)["mode"] == "initial"

    def check():
        got = {
            r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
            for r in mv.result(spark).collect()
        }
        assert got == _mixed_want(t, spark)

    # delete touches groups 0..7 (k in [100,149] covers every g)
    t.delete_where(spark, {"k": {"between": [100, 149]}})
    rep = mv.refresh(spark)
    assert rep["mode"] == "repair" and rep["repaired_groups"] == 8
    check()
    # update: pre+post images mark the groups; v changes, g doesn't
    t.update_where(spark, {"k": {"lt": 20}}, {"v": "v + 5000"})
    rep = mv.refresh(spark)
    assert rep["mode"] == "repair"
    check()
    # merge with an insert into a fresh group value and a delete
    src = spark.createDataFrame(
        [(5000, 9, 1), (0, 0, -1)], "k long, g int, v long"
    )
    t.merge_into(spark, src, on="k")
    rep = mv.refresh(spark)
    assert rep["mode"] == "repair"
    check()
    # extinction: delete every row of g=9 — repair must drop the group
    t.delete_where(spark, {"g": {"eq": 9}})
    rep = mv.refresh(spark)
    assert rep["mode"] == "repair" and rep["repaired_groups"] == 1
    check()
    assert not [r for r in mv.result(spark).collect() if r["g"] == 9]
    assert mv.refresh(spark)["mode"] == "noop"


def test_repair_clustered_layout_prunes_files(spark, tmpdir_path):
    """When the layout clusters the group key, repair's rescan is
    file-pruned by the affected-group in-list: the report proves a
    strict file subset was scanned."""
    import os as _os
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    root = _os.path.join(str(tmpdir_path), f"rcl_{_uuid.uuid4().hex[:6]}")
    t = SnapshotTable(_os.path.join(root, "src"))
    df = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") % 16).cast("int").alias("g"),
        F.col("id").alias("v"),
    )
    t.append(df.repartitionByRange(8, "g"))  # groups cluster per file
    mv = _mixed_mv(t, _os.path.join(root, "state"), fold_cost_factor=None)
    mv.refresh(spark)
    t.delete_where(spark, {"and": [{"g": {"eq": 3}}, {"k": {"lt": 400}}]})
    rep = mv.refresh(spark)
    assert rep["mode"] == "repair" and rep["repaired_groups"] == 1
    assert 0 < rep["files_scanned"] < rep["files_total"]
    got = {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in mv.result(spark).collect()
    }
    assert got == _mixed_want(t, spark)


def test_repair_null_group_key_falls_back_to_rebuild(spark, tmpdir_path):
    """A NULL group key in the feed cannot be addressed by the repair
    in-list (SQL equality) — the refresh must answer with the rebuild,
    never a silently-stale NULL-group row."""
    import os as _os
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    root = _os.path.join(str(tmpdir_path), f"rnl_{_uuid.uuid4().hex[:6]}")
    t = SnapshotTable(_os.path.join(root, "src"))
    t.append(spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, 1, 5), (4, 1, 7)],
        "k long, g int, v long",
    ).coalesce(1))
    mv = _mixed_mv(t, _os.path.join(root, "state"), fold_cost_factor=None)
    mv.refresh(spark)
    t.delete_where(spark, {"k": {"eq": 1}})  # a NULL-g row dies
    rep = mv.refresh(spark)
    assert rep["mode"] == "rebuild"
    got = {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in mv.result(spark).collect()
    }
    assert got == _mixed_want(t, spark)
    assert got[None] == (1, 20, 20, 20)


def test_fold_cost_gate_discriminates_slice_from_corpus(spark, tmpdir_path):
    """The default gate (fold_cost_factor=1.0) folds a narrow DML
    slice of a many-file table and rebuilds a half-table rewrite —
    priced from manifests alone, both numbers in the report."""
    import os as _os
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    root = _os.path.join(str(tmpdir_path), f"gate_{_uuid.uuid4().hex[:6]}")
    t = SnapshotTable(_os.path.join(root, "src"))
    df = spark.range(0, 3200).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("int").alias("g"),
        F.col("id").alias("v"),
    )
    t.append(df.repartitionByRange(16, "k"))
    mv = IncrementalAggregate(
        t, _os.path.join(root, "state"), ["g"],
        {"n": ("count", None), "s": ("sum", "v")}, source_keys=["k"],
    )
    mv.refresh(spark)

    def check():
        got = {
            r["g"]: (r["n"], r["s"]) for r in mv.result(spark).collect()
        }
        want = {
            r["g"]: (r["n"], r["s"])
            for r in t.read(spark).groupBy("g").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
            ).collect()
        }
        assert got == want

    # narrow slice: ~1/16 of the key range -> a file or two rewritten
    t.delete_where(spark, {"k": {"between": [0, 199]}})
    rep = mv.refresh(spark)
    assert rep["mode"] == "fold", rep
    assert rep["priced_span"] <= rep["priced_head"]
    check()
    # half-table rewrite: span prices past the head -> rebuild
    t.update_where(spark, {"k": {"gte": 1600}}, {"v": "v + 1"})
    rep = mv.refresh(spark)
    assert rep["mode"] == "rebuild", rep
    assert rep["priced_span"] > rep["priced_head"]
    check()


def test_repair_prices_unclustered_rescan_to_rebuild(spark, tmpdir_path):
    """On a layout that does NOT cluster the group key, repair's
    in-list prunes nothing — recomputing the affected groups reads
    ~the corpus plus the feed plus the anti-join, so the default gate
    must answer with the rebuild. The clustered twin (same data,
    range-partitioned on g) repairs."""
    import os as _os
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    root = _os.path.join(str(tmpdir_path), f"unc_{_uuid.uuid4().hex[:6]}")
    df = spark.range(0, 3200).select(
        F.col("id").alias("k"),
        (F.col("id") % 16).cast("int").alias("g"),
        F.col("id").alias("v"),
    )

    def mk(name, layout):
        t = SnapshotTable(_os.path.join(root, name))
        t.append(layout(df))
        mv = IncrementalAggregate(
            t, _os.path.join(root, name + "_mv"), ["g"],
            {"hi": ("max", "v"), "n": ("count", None)},
            source_keys=["k"],
        )
        mv.refresh(spark)
        return t, mv

    def check(t, mv):
        got = {
            r["g"]: (r["hi"], r["n"]) for r in mv.result(spark).collect()
        }
        want = {
            r["g"]: (r["hi"], r["n"])
            for r in t.read(spark).groupBy("g").agg(
                F.max("v").alias("hi"), F.count(F.lit(1)).alias("n")
            ).collect()
        }
        assert got == want

    # unclustered: g = k % 16 spread across every range file — the
    # in-list keeps all files, the priced rescan == head -> rebuild
    t1, mv1 = mk("rand", lambda d: d.repartitionByRange(16, "k"))
    t1.delete_where(spark, {"k": {"between": [100, 139]}})
    rep = mv1.refresh(spark)
    assert rep["mode"] == "rebuild", rep
    check(t1, mv1)

    # clustered twin: a group-scoped delete (narrow in the layout
    # dimension too) repairs with a pruned rescan
    t2, mv2 = mk("clus", lambda d: d.repartitionByRange(16, "g"))
    t2.delete_where(spark, {"and": [{"g": {"eq": 3}}, {"k": {"lt": 1600}}]})
    rep = mv2.refresh(spark)
    assert rep["mode"] == "repair", rep
    assert rep["files_scanned"] < rep["files_total"]
    check(t2, mv2)


def test_state_keep_last_bounds_state_history(spark, tmpdir_path):
    """state_keep_last=N: every refresh vacuums the state table to its
    newest N versions — an always-refreshing MV's metadata stays
    bounded — while replay idempotence survives (the srcv tag history
    lives in the head manifest, which vacuum always keeps)."""
    import os as _os
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    root = _os.path.join(str(tmpdir_path), f"skl_{_uuid.uuid4().hex[:6]}")
    t = SnapshotTable(_os.path.join(root, "src"))
    mv = IncrementalAggregate(
        t, _os.path.join(root, "state"), ["g"],
        {"n": ("count", None), "s": ("sum", "v")},
        state_keep_last=2,
    )
    for i in range(6):
        t.append(spark.range(i * 50, (i + 1) * 50).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("int").alias("g"),
            F.col("id").alias("v"),
        ).coalesce(1))
        mv.refresh(spark)
    assert len(mv.state.versions(spark)) <= 2
    assert mv.refresh(spark)["mode"] == "noop"  # tag history intact
    got = {r["g"]: (r["n"], r["s"]) for r in mv.result(spark).collect()}
    want = {
        r["g"]: (r["n"], r["s"])
        for r in t.read(spark).groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        ).collect()
    }
    assert got == want
