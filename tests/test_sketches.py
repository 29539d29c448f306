"""Sketch battery behavior beyond the exact regime, and the streaming
sketch-rollup fold contract.

The graded suite entries (q77/q78/q79/q48b/st13) hash-verify the sketches
in their exact regime (small cardinalities). These tests force the
ESTIMATION regime — the one that actually runs at 100 TB — and assert the
published DataSketches error bounds, plus the foreachBatch idempotency
contract of the sketch rollup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_theta_estimation_regime_bound(spark):
    """200k distinct ids >> theta's 4096 nominal entries → estimation
    mode. Union/intersection/difference must land within a few relative
    standard errors (RSE ≈ 1/√4096 ≈ 1.6%) of exact; intersections
    compound error so the envelope is wider."""
    # A = [0, 120k), B = [80k, 200k): |A∪B|=200k, |A∩B|=40k, |A\B|=80k.
    ids = spark.range(200_000)
    sk = ids.agg(
        F.expr("theta_sketch_agg(id) FILTER (WHERE id < 120000)").alias("ska"),
        F.expr("theta_sketch_agg(id) FILTER (WHERE id >= 80000)").alias("skb"),
    )
    row = sk.select(
        F.expr("theta_sketch_estimate(theta_union(ska, skb))").alias("u"),
        F.expr("theta_sketch_estimate(theta_intersection(ska, skb))").alias("i"),
        F.expr("theta_sketch_estimate(theta_difference(ska, skb))").alias("d"),
    ).first()
    assert abs(row["u"] - 200_000) / 200_000 < 0.05
    assert abs(row["i"] - 40_000) / 40_000 < 0.10
    assert abs(row["d"] - 80_000) / 80_000 < 0.10


def test_hll_estimation_regime_bound(spark):
    """200k distinct ids force HLL_4 estimation (coupon list promotes
    around 3/4·2^lgK); the estimate must sit inside ~3σ of the published
    1.04/√2^12 ≈ 1.6% standard error."""
    est = (
        spark.range(200_000)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("e"))
        .first()["e"]
    )
    assert abs(est - 200_000) / 200_000 < 0.05


def test_approx_topk_above_capacity_finds_heavy_hitter(spark):
    """5k distinct keys through a 1000-slot summary: the true heavy
    hitter must surface with its count within n/maxItemsTracked of
    exact (the sketch's guaranteed envelope)."""
    # key 0 appears 10_000 times; keys 1..4999 once each. n = 15_000.
    heavy = spark.range(10_000).select(F.lit(0).alias("k"))
    tail = spark.range(1, 5_000).select(F.col("id").alias("k"))
    df = heavy.unionByName(tail)
    tk = df.agg(F.expr("approx_top_k(k, 1, 1000)").alias("tk")).first()["tk"]
    item, count = tk[0]["item"], tk[0]["count"]
    assert item == 0
    assert abs(count - 10_000) <= 15_000 / 1000


def test_kll_rank_error_bound(spark):
    """100k values through a k=800 KLL sketch: the returned p50/p99
    items' exact ranks must be within 1% (published ε(k=800) ≈ 0.45%,
    asserted at ~2× slack)."""
    df = spark.range(100_000).select(F.col("id").cast("double").alias("v"))
    row = df.agg(
        F.expr("kll_sketch_get_quantile_double(kll_sketch_agg_double(v, 800), array(0.5D, 0.99D))").alias("q")
    ).first()
    q50, q99 = row["q"][0], row["q"][1]
    assert abs(q50 / 100_000 - 0.5) < 0.01
    assert abs(q99 / 100_000 - 0.99) < 0.01


@pytest.fixture()
def _events_df(spark):
    # Deterministic two-day event set: day 1 = users 0..49, day 2 = users 25..74.
    d1 = spark.range(50).select(
        F.lit("2024-01-01 10:00:00").cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
    )
    d2 = spark.range(25, 75).select(
        F.lit("2024-01-02 10:00:00").cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
    )
    return d1.unionByName(d2)


def test_sketch_fold_merges_and_is_idempotent(spark, _events_df):
    """The sketch fold must (a) merge a late batch's users into the
    stored day sketch via hll_union_agg, and (b) skip a replayed batch
    id entirely (foreachBatch is at-least-once)."""
    from logverzcore_spark.streaming.rollup import make_sketch_fold

    table = "t_skfold"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_meta")
    fold = make_sketch_fold(spark, table)
    try:
        fold(_events_df, 0)
        # Late batch: 25 NEW users for day 1 (50..74) + 25 already-seen.
        late = spark.range(25, 75).select(
            F.lit("2024-01-01 18:00:00").cast("timestamp").alias("ts"),
            F.col("id").alias("user_id"),
        )
        fold(late, 1)
        # Replay of batch 1 must be a no-op.
        fold(late, 1)
        rows = {
            r["day"]: (r["est"], r["n_events"])
            for r in spark.table(table)
            .select(
                F.date_format("day_ts", "yyyy-MM-dd").alias("day"),
                F.hll_sketch_estimate("user_sk").cast("bigint").alias("est"),
                "n_events",
            )
            .collect()
        }
        # Day 1: users 0..74 = 75 distinct (exact regime), events 50+50.
        assert rows["2024-01-01"] == (75, 100)
        assert rows["2024-01-02"] == (50, 50)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_meta")


def test_sketch_fold_merges_across_lgk_upgrade(spark, _events_df):
    """A rollup table persisted under an OLDER lgK default must keep
    folding after the default changes: hll_union_agg is called with
    allowDifferentLgConfigK, so the union downgrades to the minimum lgK
    instead of hard-failing on the first post-upgrade micro-batch
    (regression: r4 moved the default 12→19 and the fold would have
    thrown on any pre-r4 table)."""
    from logverzcore_spark.streaming.rollup import make_sketch_fold

    table = "t_skfold_lgk"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_meta")
    try:
        # Batch 0 stored under the old default (lgK=12)...
        make_sketch_fold(spark, table, lg_config_k=12)(_events_df, 0)
        # ...then the deployment upgrades and batch 1 arrives at lgK=19.
        late = spark.range(50, 80).select(
            F.lit("2024-01-01 18:00:00").cast("timestamp").alias("ts"),
            F.col("id").alias("user_id"),
        )
        make_sketch_fold(spark, table, lg_config_k=19)(late, 1)
        est = {
            r["day"]: r["est"]
            for r in spark.table(table)
            .select(
                F.date_format("day_ts", "yyyy-MM-dd").alias("day"),
                F.hll_sketch_estimate("user_sk").cast("bigint").alias("est"),
            )
            .collect()
        }
        # Union downgraded to lgK=12 — still the exact coupon regime at
        # these cardinalities, so counts stay exact: 0..79 = 80 distinct.
        assert est["2024-01-01"] == 80
        assert est["2024-01-02"] == 50
        # A post-upgrade batch for a NEW day persists at lgK=19, so the
        # stored table now holds mixed-precision day rows...
        day3 = spark.range(200, 240).select(
            F.lit("2024-01-03 09:00:00").cast("timestamp").alias("ts"),
            F.col("id").alias("user_id"),
        )
        make_sketch_fold(spark, table, lg_config_k=19)(day3, 2)
        # ...and the READ side (st18's rolling re-aggregation shape)
        # must union across them — allowDifferentLgConfigK again, or
        # the first upgrade-spanning window throws.
        total = (
            spark.table(table)
            .agg(
                F.hll_sketch_estimate(
                    F.hll_union_agg(F.col("user_sk"), F.lit(True))
                ).cast("bigint").alias("e")
            )
            .first()["e"]
        )
        assert total == 120  # 0..79 ∪ 200..239, exact in the min-lgK regime
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_meta")


def test_countmin_overcounts_never_under(spark):
    """CMS point estimates dominate exact counts; unseen keys estimate 0
    (all-rows-absent path); a tiny width forces collisions and the min
    over depth rows still never under-counts."""
    from logverzcore_spark.operators import sketches
    from pyspark.sql import functions as F

    df = spark.range(2000).select((F.col("id") % 37).alias("k"))
    cms = sketches.countmin_build(df, "k", depth=3, width=16)
    assert cms.count() <= 3 * 16
    keys = spark.range(50).select(F.col("id").alias("k"))  # 37..49 unseen
    est = {r.k: r.est for r in
           sketches.countmin_estimate(cms, keys, "k", depth=3, width=16).collect()}
    exact = {r.k: r.n for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    for k in range(50):
        if k < 37:
            assert est[k] >= exact[k]
        # unseen keys may still collide into occupied cells, but the
        # estimate must never be negative and is 0 when any row misses
        assert est[k] >= 0
