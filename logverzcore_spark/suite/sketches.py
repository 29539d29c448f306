"""Sketch entries (theta/KLL/top-k/HLL): q30/q48*/q77-q79.

Split from the flat suite.py (r6); entries register into the shared
SUITE/ORACLES dicts via the @query decorator from suite.common.
"""

from __future__ import annotations

from logverzcore_spark.suite.common import *  # noqa: F401,F403

@query("q30_approx_distinct_users")  # approximate by design → rows-only check
def q30_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — no reference counterpart, free in
    Spark (SURVEY §2.5); exactness asserted separately in pytest."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


@query("q48_hll_sketch_users")  # sketch estimates are engine-specific → rows-only
def q48_hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, Spark 4): per-type
    user sketches UNIONED into an overall estimate — the re-aggregatable
    form a 100 TB rollup table stores (raw approx_count_distinct values
    can't be merged later; sketches can). Error bound asserted in pytest."""
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("est_users"),
        "n_events",
    ).unionByName(
        per_type.agg(
            F.lit("__all__").alias("event_type"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
            F.sum("n_events").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable-sketch battery (Apache DataSketches, Spark 4). At the graded
# scale every sketch runs in its exact regime (theta below its 4096
# nominal entries, HLL below its coupon-list promotion, approx_top_k
# below maxItemsTracked), so the estimates are hash-verifiable against
# exact SQL; at 100 TB the same plans keep constant memory per group and
# degrade to published error bounds (asserted at forced-estimation
# cardinality in tests/test_pipeline_ops.py).
# ---------------------------------------------------------------------------


@query(
    "q77_theta_set_ops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value > 110),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'error' AND value > 110)
    SELECT (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union,
           (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_inter,
           (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_a_only,
           (SELECT COUNT(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)) AS n_b_only
    """,
)
def q77_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra via theta sketches: |A∪B|, |A∩B|, |A\\B| over
    user-id sets defined by two predicates — ONE scan builds both
    sketches (aggregate FILTER clauses), then the set ops run on the
    two ~32 kB sketches driver-free. The exact-SQL formulation needs two
    DISTINCT shuffles plus set-op joins; the sketch plan's shuffle is two
    serialized sketches. Theta is exact below its nominal 4096 entries
    (this scale — hence hash-verified); above, each result carries a
    published relative-error bound and the same query keeps constant
    memory. This is the 100 TB overlap/decontamination audit pattern."""
    ev = _t(spark, sf_dir, "events")
    sk = ev.agg(
        F.expr(
            "theta_sketch_agg(user_id) FILTER (WHERE event_type = 'purchase' AND value > 110)"
        ).alias("ska"),
        F.expr(
            "theta_sketch_agg(user_id) FILTER (WHERE event_type = 'error' AND value > 110)"
        ).alias("skb"),
    )
    return sk.select(
        F.expr("theta_sketch_estimate(theta_union(ska, skb))").cast("bigint").alias("n_union"),
        F.expr("theta_sketch_estimate(theta_intersection(ska, skb))").cast("bigint").alias("n_inter"),
        F.expr("theta_sketch_estimate(theta_difference(ska, skb))").cast("bigint").alias("n_a_only"),
        F.expr("theta_sketch_estimate(theta_difference(skb, ska))").cast("bigint").alias("n_b_only"),
    )


@query(
    "q78_kll_quantile_bound",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events, COUNT(*) AS n_sketch,
           TRUE AS p50_ok, TRUE AS p90_ok
    FROM events GROUP BY event_type
    """,
)
def q78_kll_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches per group with an IN-ENGINE certificate:
    the sketch's p50/p90 items are joined back against the data and
    their exact ranks checked against KLL's guaranteed rank error
    (k=800 → ε≈0.45%; asserted at 10× slack, so the graded booleans are
    deterministic despite KLL's randomized compaction). ``n_sketch``
    (kll_sketch_get_n) must equal the exact count — the sketch saw every
    row once. Exact percentiles (q58) need each group's values
    co-located; the KLL plan is a constant ~k·levels memory per group
    and merges across partitions — the quantile path that survives a
    group too large to sort."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    sk = ev.groupBy("event_type").agg(
        F.expr("kll_sketch_agg_double(value, 800)").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    q = sk.select(
        "event_type",
        "n_events",
        F.expr("kll_sketch_get_n_double(sk)").alias("n_sketch"),
        F.expr("kll_sketch_get_quantile_double(sk, array(0.5D, 0.9D))").alias("qs"),
    ).select(
        "event_type",
        "n_events",
        "n_sketch",
        F.element_at("qs", 1).alias("q50"),
        F.element_at("qs", 2).alias("q90"),
    )
    ranked = (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            (F.sum(F.when(F.col("value") <= F.col("q50"), 1).otherwise(0)) / F.count(F.lit(1))).alias("r50"),
            (F.sum(F.when(F.col("value") <= F.col("q90"), 1).otherwise(0)) / F.count(F.lit(1))).alias("r90"),
        )
    )
    return (
        q.join(ranked, "event_type")
        .select(
            "event_type",
            "n_events",
            "n_sketch",
            (F.abs(F.col("r50") - 0.5) <= 0.045).alias("p50_ok"),
            (F.abs(F.col("r90") - 0.9) <= 0.045).alias("p90_ok"),
        )
    )


@query(
    "q79_approx_topk_users",
    oracle="""
    SELECT user_id, n_events, CAST(rank AS INTEGER) AS rank FROM (
      SELECT user_id, COUNT(*) AS n_events,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rank
      FROM events GROUP BY user_id
    ) WHERE rank <= 10
    """,
)
def q79_approx_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via ``approx_top_k``: the frequency summary is a
    fixed-size mergeable state (maxItemsTracked=1000) built map-side —
    no per-key shuffle of the full key set, which is what kills exact
    GROUP BY top-k when the key domain is huge. Below capacity the
    summary is exact (this scale — hash-verified); above, it returns
    guaranteed-overcount-bounded heavy hitters. The deterministic
    (count DESC, item) re-rank happens on the ≤1000-entry exploded
    summary, not the data."""
    ev = _t(spark, sf_dir, "events")
    tk = ev.agg(F.expr("approx_top_k(user_id, 150, 1000)").alias("tk"))
    items = tk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("user_id"), F.col("e.count").alias("n_events")
    )
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    return (
        items.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
    )


@query(
    "q48b_hll_portable",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS est_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type, COUNT(DISTINCT user_id) AS est_users,
           COUNT(*) AS n_events
    FROM events
    """,
)
def q48b_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q48's HLL rollup, graduated from rows-only to hash-verified: at
    lgK=19 the DataSketches HLL stays in its exact coupon-list regime
    up to ~3/4·2^19 ≈ 393k coupons (promotion to estimating HLL_4 is
    the regime boundary), so per-type estimates AND the merged __all__
    union equal exact COUNT(DISTINCT) — which the oracle states in SQL
    — at sf0.01 (~1.5k users) AND sf0.1 (~100k users; the lgK=12
    default promoted there and broke the exactness claim, see
    PARITY_r4_sf0.1 history). The pytest companion forces the
    estimating regime at 200k ids under lgK=12 and asserts the
    published error bound instead."""
    from logverzcore_spark.streaming.rollup import ROLLUP_LG_CONFIG_K

    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(ROLLUP_LG_CONFIG_K)).alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("bigint").alias("est_users"),
        "n_events",
    ).unionByName(
        per_type.agg(
            F.lit("__all__").alias("event_type"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("est_users"),
            F.sum("n_events").alias("n_events"),
        )
    )


def _q123_oracle(depth: int = 4, width: int = 512) -> str:
    h = _hex_digits_to_int_sql(
        "md5(CAST(s.d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))", 12
    )
    return f"""
    WITH seeds AS (SELECT unnest(range({depth})) AS d),
    cells AS (
      SELECT s.d AS d, {h} % {width} AS w, count(*) AS cnt
      FROM events CROSS JOIN seeds s GROUP BY 1, 2
    ), keys AS (SELECT DISTINCT user_id FROM events),
    probes AS (
      SELECT k.user_id, s.d AS d, {h} % {width} AS w
      FROM keys k CROSS JOIN seeds s
    ), est AS (
      SELECT p.user_id, min(COALESCE(c.cnt, 0)) AS est
      FROM probes p LEFT JOIN cells c ON c.d = p.d AND c.w = p.w
      GROUP BY p.user_id
    ), exact AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY user_id)
    SELECT e.user_id, e.est, x.n_exact
    FROM est e JOIN exact x USING (user_id)
    """


@query("q123_countmin_freq", oracle=_q123_oracle())
def q123_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (sketches.countmin_build/estimate):
    per-event user counts folded into a 4x512 cell table (the ONLY
    shuffle is O(tasks * cells), volume-independent), then every
    distinct user point-estimated (min over 4 md5-derived cells,
    broadcast sketch) and joined to the exact count. est >= n_exact
    always (counters only overcount); the md5 hash makes the identical
    sketch rebuildable in the oracle, so the entry is hash-verified
    rather than bound-checked. Completes the sketch tier: HLL/theta
    (distinct), KLL (quantiles), bloom (membership), CMS (frequency)."""
    from logverzcore_spark.operators import sketches

    ev = _t(spark, sf_dir, "events")
    cms = sketches.countmin_build(ev, "user_id")
    est = sketches.countmin_estimate(cms, ev.select("user_id"), "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return est.join(exact, "user_id")
