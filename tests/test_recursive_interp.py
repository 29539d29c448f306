"""Tests for the round-3 relational additions: recursive-CTE chain walk
(q101), higher-order-function battery (q102), and hourly linear
interpolation (q103)."""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_DIR
from logverzcore_spark.engine import read_table
from logverzcore_spark.suite import SUITE


def test_recursive_chain_equals_window_form(spark):
    """For per-customer chains the recursive walk must agree with the
    one-pass window formulation: depth = row_number-1, root = first
    order key — and cover every order exactly once."""
    chain = SUITE["q101_recursive_chain"](spark, SF_DIR)
    orders = read_table(spark, SF_DIR, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    expected = orders.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("root_key"),
        (F.row_number().over(w) - 1).alias("depth"),
    )
    assert chain.count() == orders.count()
    diff = chain.exceptAll(
        expected.select("o_orderkey", "root_key", F.col("depth").cast("int"))
    )
    assert diff.count() == 0


def test_recursive_chain_restores_session_confs(spark):
    """q101 raises the recursive-CTE runaway row limit for its own run;
    the shared session must come back with the guard intact (r3 ADVICE:
    the loosened limit silently applied to every later recursive query).
    The entry materializes eagerly inside the save/restore scope, so
    restoring before the caller collects cannot under-guard the run."""
    prior = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    out = SUITE["q101_recursive_chain"](spark, SF_DIR)
    assert spark.conf.get("spark.sql.cteRecursionRowLimit", None) == prior
    # the frame is already materialized — collecting after restore works
    assert out.count() > 0
    assert spark.conf.get("spark.sql.cteRecursionRowLimit", None) == prior


def test_hof_battery_matches_python(spark):
    rows = (
        SUITE["q102_hof_battery"](spark, SF_DIR)
        .join(
            read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding"),
            "vec_id",
        )
        .orderBy("vec_id")
        .limit(20)
        .collect()
    )
    assert rows
    for r in rows:
        q = [math.floor(float(x) * 1e6 + 0.5) for x in r["embedding"]]
        assert r["n_dims"] == len(q)
        assert r["l1_micro"] == sum(abs(v) for v in q)
        assert r["n_neg"] == sum(1 for x in r["embedding"] if x < 0)
        assert r["max_micro"] == max(q)
        assert r["head8_micro"] == sum(q[:8])


def test_interpolation_dense_spine_and_bounds(spark):
    df = SUITE["q103_interpolate_hourly"](spark, SF_DIR).cache()
    try:
        # Dense spine: per user, rows == max(hr) - min(hr) + 1, no NULL fills.
        spans = df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            (F.max("hr") - F.min("hr") + 1).alias("span"),
            F.sum(F.col("filled_value").isNull().cast("int")).alias("nulls"),
        )
        bad = spans.filter(
            (F.col("n") != F.col("span")) | (F.col("nulls") > 0)
        ).count()
        assert bad == 0

        # Interpolated points lie within [min, max] of their user's
        # observed values (linear interpolation cannot overshoot).
        obs = df.filter(F.col("fill_kind") == "obs").groupBy("user_id").agg(
            F.min("filled_value").alias("lo"), F.max("filled_value").alias("hi")
        )
        out_of_band = (
            df.filter(F.col("fill_kind") == "interp")
            .join(obs, "user_id")
            .filter(
                (F.col("filled_value") < F.col("lo") - 1e-9)
                | (F.col("filled_value") > F.col("hi") + 1e-9)
            )
            .count()
        )
        assert out_of_band == 0

        # Edge fills only at the edges: a bfill row may not come after an
        # observation (no prev), an ffill row may not precede one (no next).
        w = Window.partitionBy("user_id").orderBy("hr")
        flagged = df.withColumn(
            "saw_obs_before",
            F.max((F.col("fill_kind") == "obs").cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        assert (
            flagged.filter(
                (F.col("fill_kind") == "bfill") & (F.col("saw_obs_before") == 1)
            ).count()
            == 0
        )
    finally:
        df.unpersist()


def test_keyset_pagination_equals_offset_page(spark):
    """The scalable keyset form (WHERE key > last ORDER BY key LIMIT n)
    must return exactly the OFFSET form's page."""
    from logverzcore_spark.suite import SUITE

    page = SUITE["q106_pagination"](spark, SF_DIR).collect()
    assert len(page) == 100
    last_prev = (
        read_table(spark, SF_DIR, "orders")
        .orderBy("o_orderkey")
        .limit(200)
        .agg(F.max("o_orderkey").alias("m"))
        .collect()[0]["m"]
    )
    keyset = (
        read_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderkey") > last_prev)
        .orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey")
        .collect()
    )
    assert [r["o_orderkey"] for r in page] == [r["o_orderkey"] for r in keyset]


def test_read_table_pins_utc_under_foreign_session_tz(spark):
    """The driver's session may carry any local timezone; read_table
    must pin UTC at runtime so timestamp rendering matches the naive-UTC
    oracles (the q13 hour buckets shift by 5 under America/New_York if
    the pin regresses)."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        hours = [
            r["hour_ts"]
            for r in SUITE["q13_hourly_events"](spark, SF_DIR).collect()
        ]
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # spot-anchor: the first generated event hour is 2024-01-01 00:xx UTC
        assert any(h.startswith("2024-01-01 00") for h in hours)
        assert not any(h.startswith("2023-12-31") for h in hours)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_recursive_guard_auto_sizes_beyond_static_default(spark):
    """r6: a synthetic 1.05M-node chain — past the static 1M
    ``cteRecursionRowLimit`` default that trips near SF1 — completes
    because _run_recursive_chain sizes the guard from the edge count
    (2·|edges|); the raised limit is restored afterwards so the shared
    session keeps the default runaway ceiling."""
    from pyspark.sql import functions as F

    from logverzcore_spark.suite.common import _run_recursive_chain

    n_roots, depth = 50_000, 21
    assert n_roots * depth > 1_000_000  # the scale that matters
    edges = (
        spark.range(n_roots * depth)
        .select(
            F.col("id").alias("o_orderkey"),
            F.when(F.col("id") % depth != 0, F.col("id") - 1).alias("parent"),
        )
        .coalesce(4)
        .localCheckpoint(eager=True)
    )
    prior = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    out = _run_recursive_chain(spark, edges)
    assert out.count() == n_roots * depth  # exactly one row per node
    # depth histogram: every depth 0..20 has exactly n_roots rows
    hist = {r["depth"]: r["count"]
            for r in out.groupBy("depth").count().collect()}
    assert hist == {d: n_roots for d in range(depth)}
    # guard restored for the rest of the session
    assert spark.conf.get("spark.sql.cteRecursionRowLimit", None) == prior
