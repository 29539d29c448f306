"""The graded query suite: every entry pairs a Spark implementation with a
DuckDB oracle SQL string over the same parquet tables (TESTDATA.md).

Numeric-determinism conventions (so Spark and DuckDB hash-match exactly):
- money/metric sums go through DECIMAL(18,2/4) so addition is exact and
  order-independent (Spark's parallel partial aggregation must not change
  the result), then cast to DOUBLE for a stable output type;
- products (price * (1-discount)) are rounded to 2dp *per row* before the
  decimal cast — both engines round the same IEEE double;
- averages divide an exact decimal sum (as double) by a count;
- window ranks order by exact columns with an id tie-break;
- timestamps leave the engine as formatted strings (UTC session TZ).

Column names are aliased identically on both sides — the driver sorts
columns by name before hashing.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logverzcore_spark.operators import dedup, optree, similarity, text
from logverzcore_spark.operators.coerce import coerce
from logverzcore_spark.plans.sqlgate import rewrite_legacy_query

QueryFn = Callable[[SparkSession, str], DataFrame]

SUITE: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        SUITE[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from logverzcore_spark.engine import read_table

    return read_table(spark, sf_dir, name)


def _docs_stream(spark: SparkSession, sf_dir: str):
    """File-source stream over the documents table, robust to BOTH
    layouts: the driver's single ``documents.parquet`` file (watch
    sf_dir with a basename glob — the file source wants a directory)
    and a Spark-written ``documents.parquet/`` DIRECTORY of part files
    (the scale replicas' shape), where that same glob would match ZERO
    leaf files and the stream would silently never run — watch the
    directory itself instead."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    sch = spark.read.parquet(docs_path).schema
    if os.path.isdir(docs_path):
        return spark.readStream.schema(sch).parquet(docs_path)
    return (
        spark.readStream.schema(sch)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def _money_sum(col, scale: int = 2):
    """Money sum as exact integer units (floor(x*10^s + 0.5) — half-up
    toward +inf, identical IEEE ops in any engine) divided back once.
    Integer SUM is ~2x faster than DECIMAL(18,s) aggregation buffers
    (measured on the q01 agg) and immune to summation-order effects."""
    unit = 10 ** scale
    return F.sum(F.floor(F.col(col) * unit + 0.5).cast("bigint")) / F.lit(float(unit))


# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.3/§2.5: the query surface users ran through Q1)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
           SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT)/100.0 AS sum_disc_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*(1+l_tax)*100 + 0.5) AS BIGINT)) AS BIGINT)/100.0 AS sum_charge,
           SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) / 100.0/COUNT(*) AS avg_qty,
           SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) / 100.0/COUNT(*) AS avg_price,
           SUM(CAST(FLOOR(l_discount*10000 + 0.5) AS BIGINT)) / 10000.0/COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash aggregate (SURVEY §2.5)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    # Per-row rounding as floor(x*100+0.5): pure IEEE double ops, so any
    # engine computes the identical cent count (ROUND() semantics differ
    # subtly between engines); the cent sums are exact integers.
    disc_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
    charge_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100 + 0.5
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _money_sum("l_quantity").alias("sum_qty"),
        _money_sum("l_extendedprice").alias("sum_base_price"),
        (F.sum(disc_cents) / F.lit(100.0)).alias("sum_disc_price"),
        (F.sum(charge_cents) / F.lit(100.0)).alias("sum_charge"),
        (_money_sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        (_money_sum("l_extendedprice") / F.count(F.lit(1))).alias("avg_price"),
        (_money_sum("l_discount", 4) / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q02_part_filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_type LIKE '%ECO%' AND p_size IN (1,5,10,15,20) AND p_brand <> 'Brand#3'
    """,
)
def q02_part_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate corpus: LIKE / IN / != compound filters (SURVEY §2.3 P2)."""
    part = _t(spark, sf_dir, "part")
    return part.where(
        F.col("p_type").like("%ECO%")
        & F.col("p_size").isin(1, 5, 10, 15, 20)
        & (F.col("p_brand") != "Brand#3")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@query(
    "q03_top_orders",
    oracle="""
    SELECT l_orderkey, rev/100.0 AS revenue, n_items
    FROM (
      SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev,
             COUNT(*) AS n_items
      FROM lineitem GROUP BY l_orderkey
      ORDER BY rev DESC, l_orderkey LIMIT 10
    )
    """,
)
def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K over aggregate: order-by + limit → TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    disc_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
    agg = li.groupBy("l_orderkey").agg(
        F.sum(disc_cents).alias("rev"), F.count(F.lit(1)).alias("n_items")
    )
    return (
        agg.orderBy(F.col("rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", (F.col("rev") / F.lit(100.0)).alias("revenue"), "n_items")
    )


@query(
    "q04_region_revenue",
    oracle="""
    SELECT r_name, n_name,
           SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name, n_name
    """,
)
def q04_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact shuffles once; dims are broadcast (SURVEY §2.5)."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        _money_sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q05_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q05_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking (top-K per group) — SURVEY §2.5 windows."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn"))
    )


@query(
    "q06_union_all",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'purchase' AND value > 100
    UNION ALL
    SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'error' AND value <= 50
    """,
)
def q06_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered scans — in the reference's corpus
    (Samplesqlqueries.txt:58-62)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    a = ev.where((F.col("event_type") == "purchase") & (F.col("value") > 100))
    b = ev.where((F.col("event_type") == "error") & (F.col("value") <= 50))
    return a.unionAll(b)


@query(
    "q07_distinct_segments",
    oracle="""
    SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def q07_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "q08_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q08_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q09_big_spender_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def q09_big_spender_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "q10_rollup_orders",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def q10_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (SURVEY §2.5)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), _money_sum("o_totalprice").alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@query(
    "q11_json_extract_events",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q11_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction — the reference corpus's ->/->> queries
    (Samplesqlqueries.txt:43-55, SURVEY §2.6)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.max(k).alias("max_k"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q12_between_case",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS high_qty,
           CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS low_qty,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
    GROUP BY l_returnflag
    """,
)
def q12_between_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN range predicate + conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 23:59:59").cast("timestamp"),
        )
    )
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("high_qty"),
        F.sum(F.when(F.col("l_quantity") <= 25, 1).otherwise(0)).alias("low_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q13_hourly_events",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           event_type,
           COUNT(*) AS n,
           SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) / 100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q13_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling aggregation (batch form of §2.7 windows)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n"), _money_sum("value").alias("total_value"))
    )


@query(
    "q14_user_type_matrix",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS click_value,
           CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS view_value,
           CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS purchase_value,
           CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS signup_value,
           CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS error_value
    FROM events GROUP BY user_id
    """,
)
def q14_user_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (one pass, no extra shuffle)."""
    ev = _t(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,2)")

    def bucket(t: str):
        return F.sum(F.when(F.col("event_type") == t, val).otherwise(F.lit(0).cast("decimal(18,2)"))).cast(
            "double"
        ).alias(f"{t}_value")

    return ev.groupBy("user_id").agg(
        bucket("click"), bucket("view"), bucket("purchase"), bucket("signup"), bucket("error")
    )


@query(
    "q15_optree_find",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus <> 'O' AND (o_totalprice > 300000.5 OR o_orderpriority LIKE '%URGENT%')
    """,
)
def q15_optree_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-tree findAll — the reference's Sequelize query API
    (SURVEY §2.3 Q4/Q5) compiled to a Column predicate."""
    orders = _t(spark, sf_dir, "orders")
    where = {
        "and": [
            {"o_orderstatus": {"ne": "O"}},
            {"or": [{"o_totalprice": {"gt": "300000.5"}}, {"o_orderpriority": {"like": "%URGENT%"}}]},
        ]
    }
    return optree.find_all(
        orders,
        where=where,
        attributes=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )


@query(
    "q16_legacy_ingest_filter",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE event_type = 'purchase' AND value > 150.5
    """,
)
def q16_legacy_ingest_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's S3-Select-descended ingest dialect
    (`FROM S3Object[*].Records[*] s`, SURVEY §2.2 P2) rewritten onto a
    staged view and run as Spark SQL."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("s3object_staged_events")
    legacy = (
        "SELECT s.event_id, s.event_type, s.value FROM S3Object[*].Records[*] s "
        "WHERE s.event_type = 'purchase' AND s.value > 150.5"
    )
    return spark.sql(rewrite_legacy_query(legacy, "s3object_staged_events"))


@query(
    "q17_coercion_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(CASE WHEN l_linenumber NOT IN (3,4,5) THEN 1 END) AS BIGINT) AS n_qty_nonnull,
           SUM(CASE WHEN l_linenumber NOT IN (3,4,5) THEN CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) END) / 100.0 AS sum_qty,
           CAST(COUNT(CASE WHEN l_linenumber <> 2 THEN 1 END) AS BIGINT) AS n_disc_nonnull,
           SUM(CASE WHEN l_linenumber <> 2 THEN CAST(FLOOR(l_discount*10000 + 0.5) AS BIGINT) END) / 10000.0 AS sum_disc
    FROM lineitem
    """,
)
def q17_coercion_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-coercion semantics (SURVEY §2.2 P3): numeric columns with the
    reference's NULL markers ('-', '', 'null', 'NULL') coerce to NULL; the
    oracle computes ground truth directly from the typed columns."""
    from pyspark.sql import types as T

    li = _t(spark, sf_dir, "lineitem")
    raw = li.select(
        F.when(F.col("l_linenumber") == 3, F.lit("-"))
        .when(F.col("l_linenumber") == 4, F.lit(""))
        .when(F.col("l_linenumber") == 5, F.lit("null"))
        .otherwise(F.col("l_quantity").cast("string"))
        .alias("qty"),
        F.when(F.col("l_linenumber") == 2, F.lit("NULL"))
        .otherwise(F.col("l_discount").cast("string"))
        .alias("disc"),
    )
    schema = T.StructType(
        [T.StructField("qty", T.DoubleType()), T.StructField("disc", T.DoubleType())]
    )
    typed = coerce(raw, schema)
    return typed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("qty").alias("n_qty_nonnull"),
        _money_sum("qty").alias("sum_qty"),
        F.count("disc").alias("n_disc_nonnull"),
        _money_sum("disc", 4).alias("sum_disc"),
    )


@query(
    "q18_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def q18_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + running sum (SURVEY §2.7 beyond-parity;
    30-minute inactivity gap)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = ev.withColumn("session_id", F.sum(is_new).over(running))
    return sessions.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@query(
    "q19_segment_balance_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(median(c_acctbal), 4) AS median_bal,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_bal,
           COUNT(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
)
def q19_segment_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + min/max/avg per group."""
    customer = _t(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.round(F.median("c_acctbal"), 4).alias("median_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        (_money_sum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q20_orders_view_projection",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q20_orders_view_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-projection Views (SURVEY §2.2 P4): stored column subset."""
    orders = _t(spark, sf_dir, "orders")
    view_cols = ["o_orderkey", "o_orderdate", "o_totalprice"]
    return (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(*view_cols)
        .withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))
    )


@query(
    "q21_intersect_customers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q21_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op (SURVEY §2.5)."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = orders.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "q22_except_parts",
    oracle="""
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey AS p_partkey FROM lineitem
    """,
)
def q22_except_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op: parts never ordered."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    used = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return part.exceptAll(used.distinct())


@query(
    "q23_nation_order_counts_outer",
    oracle="""
    SELECT n_name, COALESCE(cnt, 0) AS n_orders
    FROM nation
    LEFT JOIN (
      SELECT c_nationkey, COUNT(*) AS cnt
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_nationkey
    ) x ON x.c_nationkey = n_nationkey
    """,
)
def q23_nation_order_counts_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with NULL-fill — nations with zero orders kept."""
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_nation = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return nation.join(
        per_nation, nation.n_nationkey == per_nation.c_nationkey, "left"
    ).select("n_name", F.coalesce("cnt", F.lit(0)).alias("n_orders"))


@query(
    "q24_cube_lineitem",
    oracle="""
    SELECT COALESCE(l_returnflag, '*') AS rf, COALESCE(l_linestatus, '*') AS ls,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q24_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("*")).alias("ls"),
            "n",
        )
    )


@query(
    "q25_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderkey - lag(o_orderkey) OVER w AS BIGINT) AS gap,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def q25_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: lag + running-sum frame (SURVEY §2.5)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_orderkey") - F.lag("o_orderkey").over(w)).alias("gap"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(run).cast("double").alias("running_total"),
    )


@query(
    "q26_monthly_order_trend",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1, 2
    """,
)
def q26_monthly_order_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + aggregation (scalar date functions §2.6)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.count(F.lit(1)).alias("n"), _money_sum("o_totalprice").alias("total"))


@query(
    "q27_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(SUBSTR(p_name, 1, 10)) AS name10,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS type_tail,
           CAST(length(p_name) AS INTEGER) AS name_len,
           CONCAT(p_brand, '/', p_type) AS brand_type
    FROM part WHERE p_size >= 40
    """,
)
def q27_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string functions (§2.6): substr/upper/regexp/concat/length."""
    part = _t(spark, sf_dir, "part").where(F.col("p_size") >= 40)
    return part.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 10)).alias("name10"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_tail"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "q28_above_avg_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (
      SELECT AVG(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    """,
)
def q28_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — decorrelated by Catalyst into an
    aggregate + join; expressed via window to keep one shuffle."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("avg_price", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > 2 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q29_supplier_part_revenue",
    oracle="""
    SELECT s_name, p_brand,
           CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT)/100.0 AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    GROUP BY s_name, p_brand
    """,
)
def q29_supplier_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dim join: fact-to-two-dims, both broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("s_name", "p_brand")
        .agg((F.sum(cents) / F.lit(100.0)).alias("revenue"))
    )


@query(
    "q31_json_struct_path",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
)
def q31_json_struct_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON columns as real structs (SURVEY §1.2/§7): from_json once,
    then struct-path access — Catalyst prunes to the needed field instead
    of re-parsing JSON per predicate (the strictly-better alternative to
    the reference's string-JSON)."""
    from pyspark.sql import types as T

    ev = _t(spark, sf_dir, "events")
    struct = T.StructType([T.StructField("k", T.LongType())])
    typed = ev.withColumn("props_struct", F.from_json("props", struct))
    return typed.where(F.col("props_struct.k") > 90).select(
        "event_id", F.col("props_struct.k").alias("k_typed")
    )


@query(
    "q32_having_filter",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) >= 50 AND SUM(CAST(c_acctbal AS DECIMAL(18,2))) > 0
    """,
)
def q32_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — post-aggregation predicate."""
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _money_sum("c_acctbal").alias("total_bal"),
        )
        .where((F.col("n_customers") >= 50) & (F.col("total_bal") > 0))
    )


@query(
    "q33_weekday_orders",
    oracle="""
    SELECT CAST(dayofweek(o_orderdate) AS INTEGER) AS dow_iso,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
)
def q33_weekday_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday aggregation. Engines disagree on week numbering (Spark
    dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6) — normalized
    to DuckDB's convention via dayofweek()-1."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow_iso")
    ).agg(F.count(F.lit(1)).alias("n"), _money_sum("o_totalprice").alias("total"))


@query(
    "q34_embedding_norm_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           ROUND(MIN(sqrt(list_dot_product(e, e))), 4) AS min_norm,
           ROUND(MAX(sqrt(list_dot_product(e, e))), 4) AS max_norm
    FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings)
    GROUP BY label
    """,
)
def q34_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column aggregation: per-label L2-norm stats over embeddings —
    relational ops over vector columns in one pass."""
    emb = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return emb.select("label", norm.alias("nrm")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
    )


@query("q30_approx_distinct_users")  # approximate by design → rows-only check
def q30_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — no reference counterpart, free in
    Spark (SURVEY §2.5); exactness asserted separately in pytest."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Text analysis / dedup / similarity (beyond-reference pipeline operators)
# ---------------------------------------------------------------------------

_T01_ORACLE = """
WITH tk AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks,
         list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS dtoks
  FROM documents
), feat AS (
  SELECT doc_id, text, toks,
         len(list_filter(list_transform(toks, x -> lower(x)),
             x -> x IN ('the','a','an','and','or','of','to','in','is'))) AS n_stop,
         len(list_distinct(list_transform(toks, x -> lower(x)))) AS n_distinct,
         len(list_filter(dtoks, x -> x IN ('the','and','of','to','a','in','is'))) AS s_en,
         len(list_filter(dtoks, x -> x IN ('der','die','und','das','nicht','ist'))) AS s_de,
         len(list_filter(dtoks, x -> x IN ('le','la','et','les','des','est'))) AS s_fr,
         len(list_filter(dtoks, x -> x IN ('el','la','los','que','es','una'))) AS s_es
  FROM tk
)
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_computed,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
       ROUND(n_stop / greatest(len(toks), 1), 4) AS stopword_ratio,
       ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
             / greatest(length(text), 1), 4) AS punct_ratio,
       ROUND(1.0 - n_distinct / greatest(len(toks), 1), 4) AS repetition_ratio,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            ELSE 'de' END AS lang_guess
FROM feat
"""


@query("t01_text_profile", oracle=_T01_ORACLE)
def t01_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis feature pass: token counts, quality ratios,
    fingerprint, heuristic language ID — all JVM-side expressions."""
    docs = _t(spark, sf_dir, "documents")
    return text.text_profile(docs, "text").select(
        "doc_id",
        "n_chars_computed",
        "n_tokens",
        "n_bpe_tokens",
        "stopword_ratio",
        "punct_ratio",
        "repetition_ratio",
        "fingerprint",
        "lang_guess",
    )


_T02_ORACLE = """
WITH tk AS (
  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), feat AS (
  SELECT doc_id, text, toks,
         len(list_filter(list_transform(toks, x -> lower(x)),
             x -> x IN ('the','a','an','and','or','of','to','in','is'))) AS n_stop,
         len(list_distinct(list_transform(toks, x -> lower(x)))) AS n_distinct
  FROM tk
)
SELECT doc_id
FROM feat
WHERE len(toks) BETWEEN 10 AND 1000
  AND ROUND(n_stop / greatest(len(toks), 1), 4) >= 0.05
  AND ROUND(1.0 - n_distinct / greatest(len(toks), 1), 4) <= 0.6
"""


@query("t02_quality_filter", oracle=_T02_ORACLE)
def t02_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate pipeline stage: keep documents passing length,
    stopword-ratio, and repetition thresholds — the standard pretraining
    corpus filter, one narrow pass."""
    docs = _t(spark, sf_dir, "documents")
    prof = text.text_profile(docs, "text")
    return prof.where(
        F.col("n_tokens").between(10, 1000)
        & (F.col("stopword_ratio") >= 0.05)
        & (F.col("repetition_ratio") <= 0.6)
    ).select("doc_id")


@query(
    "d06_dedup_materialize",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, text,
             row_number() OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT doc_id FROM ranked WHERE rn = 1
    """,
)
def d06_dedup_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup as a pipeline stage: the corpus with exact duplicates removed
    (keep lowest doc_id per fingerprint) — the output a training-data run
    would write."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.dedup_keep_first(docs).select("doc_id")


@query(
    "d01_dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a normalized md5 fingerprint."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


_JACCARD_ORACLE_TMPL = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 0)+1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
  FROM tok
), sz AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id1, id2, ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS jaccard
FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= {thr}
"""


@query("d02_ngram_jaccard", oracle=_JACCARD_ORACLE_TMPL.format(thr=0.5))
def d02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via inverted-index self-join."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.5)


@query("d03_minhash_lsh", oracle=_JACCARD_ORACLE_TMPL.format(thr=0.7))
def d03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification. With
    r=2/b=16 the probability of missing a 0.7-Jaccard pair is ~2e-5, so
    the verified output equals the brute-force oracle."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, threshold=0.7)


@query(
    "d15_winnow_overlap",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t)-2, 0)+1),
                    i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS hs
      FROM tok
    ), win AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                    range(1, greatest(len(hs)-4+1, 0)+1),
                    i -> list_min(hs[i:i+3])))) AS fp
      FROM sh
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM win GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM win a JOIN win b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id1, id2, ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS winnow_jaccard
    FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
    WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= 0.4
    """,
)
def d15_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap pairs (MOSS selection,
    ``dedup.winnow_overlap_pairs``): positional 3-gram md5 hashes,
    4-hash sliding-window minima, inverted-index join over the SELECTED
    fingerprints only (~2/(w+1) of the shingle volume). The oracle
    replays the exact selection in SQL — md5 is engine-portable, unlike
    the xxhash64 the speed-first operators use — so the window minima,
    dedup, and jaccard all verify hash-exact."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.winnow_overlap_pairs(docs, threshold=0.4)


@query("d04_simhash_pairs")  # xxhash64 is not reproducible in the oracle → rows-only check
def d04_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3) via banded chunk join."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs(docs, max_hamming=3)


@query(
    "d05_embedding_neardup",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ), n AS (
      SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.35
    """,
)
def d05_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label to bound the join."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs(emb, threshold=0.35, block_col="label")


@query(
    "s01_cosine_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), n AS (
      SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    ), ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a broadcast query set — the exact ANN
    baseline, via the size-dispatched entry point (nq=20 × dim=64 is far
    under the BLAS crossover, so this grades the JVM fold tier; the
    dispatch itself is pytest-pinned in both directions)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.cosine_topk_auto(emb, queries, k=5)


@query("s02_lsh_topk")  # approximate → rows-only check; recall tested in pytest
def s02_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH-bucketed ANN top-k (the scale path)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.lsh_topk(emb, queries, k=5, dim=64)


@query("s03_ivf_topk")  # approximate → rows-only check
def s03_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse-quantized ANN top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.ivf_topk(emb, queries, k=5, n_cells=16, nprobe=4)


@query(
    "m01_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def m01_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary column + mapInPandas metadata
    extraction (decode stage stubbed — see operators/multimodal.py)."""
    from logverzcore_spark.operators.multimodal import extract_binary_meta

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return extract_binary_meta(docs, payload_col="payload", id_col="doc_id")


@query(
    "m02_resize_planning",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(100 + doc_id % 1900 AS INTEGER) AS width,
             CAST(100 + (doc_id * 7) % 1900 AS INTEGER) AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           CAST(FLOOR(width * LEAST(1.0, 512.0 / GREATEST(width, height))) AS INTEGER) AS out_width,
           CAST(FLOOR(height * LEAST(1.0, 512.0 / GREATEST(width, height))) AS INTEGER) AS out_height
    FROM meta
    """,
)
def m02_resize_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata-only planning (resize dims capped at 512,
    aspect preserved): operates purely on the typed metadata struct, so
    column pruning never touches the binary payload. Meta is synthesized
    deterministically from doc_id (no image codecs in the container)."""
    from logverzcore_spark.operators.multimodal import fake_resize_meta

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.struct(
            (100 + F.col("doc_id") % 1900).cast("int").alias("width"),
            (100 + (F.col("doc_id") * 7) % 1900).cast("int").alias("height"),
        ).alias("meta"),
    )
    return fake_resize_meta(docs, meta_col="meta", max_side=512).select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        "out_width",
        "out_height",
    )


@query(
    "st01_streaming_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           event_type,
           COUNT(*) AS n,
           SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) / 100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def st01_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregation (SURVEY §2.7),
    driven to completion with Trigger.AvailableNow over the events files;
    result equals the batch oracle."""
    from logverzcore_spark.streaming.collect_stream import run_windowed_aggregate

    return run_windowed_aggregate(spark, os.path.join(sf_dir, "events.parquet"))


@query(
    "st12_rocksdb_state",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           event_type,
           COUNT(*) AS n,
           SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) / 100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def st12_rocksdb_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st01's tumbling-window aggregation under the RocksDB state-store
    provider — the off-heap configuration a 100 TB streaming deployment
    runs (heap state OOMs at billions of open keys; RocksDB checkpoints
    incrementally). Same oracle as st01: the provider must not change a
    single result."""
    from logverzcore_spark.streaming.collect_stream import run_windowed_aggregate

    return run_windowed_aggregate(
        spark, os.path.join(sf_dir, "events.parquet"), state_store="rocksdb"
    )


@query(
    "st02_session_windows",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def st02_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session_window aggregation with watermark (SURVEY §2.7
    beyond-parity); the oracle is the batch gaps-and-islands equivalent."""
    from logverzcore_spark.streaming.collect_stream import run_session_windows

    return run_session_windows(spark, os.path.join(sf_dir, "events.parquet"))


@query(
    "st03_stateful_user_stats",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def st03_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): the
    final per-user state equals the batch aggregate."""
    from logverzcore_spark.streaming.collect_stream import run_stateful_user_stats

    return run_stateful_user_stats(spark, os.path.join(sf_dir, "events.parquet"))


@query(
    "q35_asof_attribution",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, epoch_us(ts) AS tus,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS is_left,
             CASE WHEN event_type = 'click' THEN event_id END AS click_ev,
             CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_tus
      FROM events WHERE event_type IN ('purchase', 'click')
    ), w AS (
      SELECT event_id, is_left, tus,
             LAST_VALUE(click_ev IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, is_left, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
             LAST_VALUE(click_tus IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, is_left, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_tus
      FROM t
    )
    SELECT event_id AS purchase_id, click_id, tus - click_tus AS gap_us
    FROM w WHERE is_left = 1
    """,
)
def q35_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator): each purchase attributed to the same
    user's most recent prior click, with the gap in microseconds. One
    shuffle on user_id — no range-join pair explosion (asofjoin.py)."""
    from logverzcore_spark.operators.asofjoin import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    joined = asof_join(purchases, clicks, on="ts", by="user_id", tie_break="event_id")
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        F.col("event_id_matched").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_matched")).alias("gap_us"),
    )


@query(
    "q36_group_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT), 0.5) / 100.0 AS p50,
           quantile_cont(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT), 0.9) / 100.0 AS p90,
           quantile_cont(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT), 0.99) / 100.0 AS p99,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q36_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. Percentiles run on exact
    integer cents so the interpolation arithmetic (x + frac*(y-x) on
    integer-valued doubles) is bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    return li.groupBy("l_returnflag").agg(
        (F.percentile(cents, F.lit(0.5)) / 100.0).alias("p50"),
        (F.percentile(cents, F.lit(0.9)) / 100.0).alias("p90"),
        (F.percentile(cents, F.lit(0.99)) / 100.0).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


#: Shared transitive-closure prefix for the duplicate-cluster oracles:
#: 3-gram Jaccard≥0.5 pair graph → recursive reachability.
_DUP_GRAPH_CTE = """
WITH RECURSIVE tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 0)+1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
  FROM tok
), sz AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id1, id2
  FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
  WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= 0.5
), edges AS (
  SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
), reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
), labels AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id
)
"""

_D07_ORACLE = (
    _DUP_GRAPH_CTE
    + """
SELECT doc_id, cluster_id, doc_id = cluster_id AS is_rep FROM labels
"""
)


@query("d07_dup_clusters", oracle=_D07_ORACLE)
def d07_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components (iterative min-label
    propagation) over the 3-gram-Jaccard≥0.5 near-dup graph — the step
    that turns pairwise evidence into keep-one-per-cluster dedup. The
    oracle replays it as a recursive transitive closure."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup.dup_clusters(docs, pairs)


@query(
    "q37_range_join_attribution",
    oracle="""
    SELECT p.user_id, COUNT(*) AS n_pairs
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND epoch_us(p.ts) BETWEEN epoch_us(c.ts) AND epoch_us(c.ts) + 1800000000
    GROUP BY p.user_id
    """,
)
def q37_range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (custom operator): purchases matched to every click
    window [click, click+30min] of the same user, via bucketized
    equi-join — no nested-loop/cartesian plan (rangejoin.py)."""
    from logverzcore_spark.operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("lo_us"),
        (F.unix_micros("ts") + F.lit(1_800_000_000)).alias("hi_us"),
    )
    joined = range_join(
        purchases, clicks, "p_us", "lo_us", "hi_us",
        by="user_id", bucket_width=1_800_000_000,
    )
    return joined.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "q38_salted_skew_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q38_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (worst-case
    skew) key: results must equal the plain GROUP BY. The salt spreads
    each hot key over N reducers before the final combine (skew.py)."""
    from logverzcore_spark.operators.skew import salted_aggregate

    ev = _t(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        exprs={"n": ("count", "*"), "total_value": ("sum", "value_dec")},
    )
    return out.select("event_type", "n", F.col("total_value").cast("double").alias("total_value"))


@query(
    "q39_time_range_moving_avg",
    oracle="""
    SELECT event_id,
           CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
             / COUNT(*) OVER w / 100.0 AS avg_1h,
           COUNT(*) OVER w AS n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q39_time_range_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame: per-user trailing-1-hour moving
    average. The frame bound is a time offset (not a row count) — the
    time-series shape row frames can't express. Exact integer cents keep
    the sum engine-stable."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    return ev.select(
        "event_id",
        (F.sum(cents).over(w).cast("double") / F.count(F.lit(1)).over(w) / 100.0).alias("avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query(
    "s04_embedding_dup_clusters",
    oracle="""
    WITH RECURSIVE v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ), n AS (
      SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    ), pairs AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.35
    ), edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT emb.vec_id,
           LEAST(emb.vec_id, COALESCE(MIN(r.dst), emb.vec_id)) AS cluster_id,
           emb.vec_id = LEAST(emb.vec_id, COALESCE(MIN(r.dst), emb.vec_id)) AS is_rep
    FROM embeddings emb LEFT JOIN reach r ON r.src = emb.vec_id
    GROUP BY emb.vec_id
    """,
)
def s04_embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator composition: embedding-cosine near-dup pairs feed the same
    connected-components clustering used for text dedup — semantic
    dedup's keep-one-per-cluster step."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.35, block_col="label")
    return dedup.dup_clusters(emb, pairs, id_col="vec_id")


# ---------------------------------------------------------------------------
# Round 2 additions: pivot/grouping-sets relational surface, event
# analytics (funnel/retention/gap-fill), corpus text stats, streaming dedup
# ---------------------------------------------------------------------------


@query(
    "q40_pivot_priority_revenue",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_medium,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_notspec,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_low
    FROM orders
    GROUP BY 1
    """,
)
def q40_pivot_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): yearly revenue per order priority as columns.
    Spark's pivot with an explicit value list is a single hash aggregate —
    no per-column scans; the explicit list also keeps the schema static
    (an unlisted-pivot plan needs a distinct-values job first)."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    names = {
        "1-URGENT": "rev_urgent",
        "2-HIGH": "rev_high",
        "3-MEDIUM": "rev_medium",
        "4-NOT SPECIFIED": "rev_notspec",
        "5-LOW": "rev_low",
    }
    pv = (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .pivot("o_orderpriority", list(names))
        .agg((F.sum(cents).cast("double") / 100.0))
    )
    for old, new in names.items():
        pv = pv.withColumnRenamed(old, new)
    return pv


@query(
    "q41_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q41_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — finer control than
    rollup/cube (q10/q24); one expand + one aggregate in the plan."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q41_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
        FROM q41_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "q42_funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS step1_view_users,
           (SELECT COUNT(*) FROM s2) AS step2_click_users,
           (SELECT COUNT(*) FROM s3) AS step3_purchase_users
    """,
)
def q42_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase with min-time step semantics
    (operators/eventops.funnel)."""
    from logverzcore_spark.operators import eventops

    ev = _t(spark, sf_dir, "events")
    return eventops.funnel(ev, ["view", "click", "purchase"])


@query(
    "q43_retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT user_id,
             CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS w
      FROM events
    ), cohorts AS (
      SELECT user_id, MIN(w) AS cohort_week FROM wk GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, w FROM wk
    )
    SELECT c.cohort_week, a.w - c.cohort_week AS week_offset,
           COUNT(DISTINCT c.user_id) AS n_users
    FROM active a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def q43_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (operators/eventops.retention_cohorts);
    integer week bucketing keeps the result engine-portable."""
    from logverzcore_spark.operators import eventops

    ev = _t(spark, sf_dir, "events")
    return eventops.retention_cohorts(ev, "2024-01-01")


@query(
    "q44_hourly_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS h_min, date_trunc('hour', MAX(ts)) AS h_max
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(h_min, h_max, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), keys AS (
      SELECT DISTINCT event_type AS key FROM events
    ), observed AS (
      SELECT date_trunc('hour', ts) AS hour, event_type AS key, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour_ts, k.key,
           COALESCE(o.n, 0) AS n
    FROM hours h CROSS JOIN keys k
    LEFT JOIN observed o ON o.hour = h.hour AND o.key = k.key
    """,
)
def q44_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense gap-filled hourly series (operators/eventops.hourly_spine_fill):
    a groupBy alone drops empty hours; the spine join restores them with
    zero counts."""
    from logverzcore_spark.operators import eventops

    ev = _t(spark, sf_dir, "events")
    return eventops.hourly_spine_fill(ev)


@query(
    "t03_top_bigrams",
    oracle="""
    WITH tk AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents
    ), bi AS (
      SELECT unnest(list_filter(
               list_transform(toks, (x, i) ->
                 CASE WHEN i < len(toks) THEN x || ' ' || toks[i+1] END),
               v -> v IS NOT NULL)) AS bigram
      FROM tk
    )
    SELECT bigram, COUNT(*) AS n FROM bi GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 50
    """,
)
def t03_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 bigrams — n-gram frequency via codegen'd
    arrays_zip, top-k as TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents")
    return text.top_bigrams(docs, "text", k=50)


@query(
    "t04_tfidf_top_terms",
    oracle="""
    WITH tk AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df_ FROM tf GROUP BY term
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df_), 6) AS score
      FROM tf, dfreq, n WHERE tf.term = dfreq.term
    ), ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, score FROM ranked WHERE rn = 1
    """,
)
def t04_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top TF-IDF term (operators/text.tfidf_top_terms) —
    scores rounded before ranking so the argmax is engine-stable."""
    docs = _t(spark, sf_dir, "documents")
    return text.tfidf_top_terms(docs, "text", "doc_id")


@query(
    "st04_streaming_dedup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def st04_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type) + per-type count
    — the streaming form of COUNT(DISTINCT); equals the batch answer."""
    from logverzcore_spark.streaming.collect_stream import run_streaming_dedup_counts

    return run_streaming_dedup_counts(spark, os.path.join(sf_dir, "events.parquet"))


@query(
    "m03_frame_sample_plan",
    oracle="""
    WITH meta AS (
      SELECT doc_id, CAST(1000 + (doc_id * 13) % 59000 AS BIGINT) AS duration_ms
      FROM documents
    )
    SELECT doc_id, CAST(s AS BIGINT) AS sample_ms,
           CAST(s * 30 // 1000 AS BIGINT) AS frame_idx
    FROM meta, unnest(generate_series(0, duration_ms, 1000)) AS t(s)
    """,
)
def m03_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-fanning multimodal stage: one output row per sampled video
    frame timestamp (operators/multimodal.plan_frame_samples, real
    mapInPandas; decode stubbed — no codecs). Duration is synthesized
    deterministically from doc_id."""
    from logverzcore_spark.operators.multimodal import plan_frame_samples

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", (1000 + (F.col("doc_id") * 13) % 59000).cast("long").alias("duration_ms")
    )
    return plan_frame_samples(docs, "duration_ms", "doc_id", every_ms=1000, fps=30)


@query(
    "st05_stream_stream_join",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def st05_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join: views correlated with same-user
    clicks within the following hour; bounded state via watermarks +
    time-bound join condition."""
    from logverzcore_spark.streaming.collect_stream import run_stream_stream_join

    return run_stream_stream_join(spark, os.path.join(sf_dir, "events.parquet"))


@query(
    "q45_variant_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q45_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through the VARIANT type (Spark 4):
    parse_json once into the binary-encoded variant, then typed
    variant_get extraction — the scale path for repeatedly-queried JSON
    (no per-query string re-parse, unlike get_json_object in q11)."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    return v.groupBy("event_type").agg(
        F.sum(F.try_variant_get("v", "$.k", "bigint")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q46_customer_quartiles",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q46_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window battery (ntile / percent_rank / cume_dist) with a
    deterministic tie-broken order — one shuffle on the partition key."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q47_unpivot_revenue",
    oracle="""
    WITH wide AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_urgent,
             CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                  THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) END) AS DOUBLE)/100.0 AS rev_low
      FROM orders GROUP BY 1
    )
    SELECT order_year, 'rev_urgent' AS priority, rev_urgent AS revenue FROM wide
    UNION ALL
    SELECT order_year, 'rev_low' AS priority, rev_low AS revenue FROM wide
    """,
)
def q47_unpivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, the inverse of q40): melt per-priority revenue
    columns back to rows — a single Expand node, no join or union scan
    duplication in the physical plan."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    wide = (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .agg((F.sum(cents).cast("double") / 100.0))
        .withColumnRenamed("1-URGENT", "rev_urgent")
        .withColumnRenamed("5-LOW", "rev_low")
    )
    return wide.unpivot(
        ["order_year"], ["rev_urgent", "rev_low"], "priority", "revenue"
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


@query(
    "q49_exists_late_ship",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q49_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): orders with any lineitem
    shipping ≥60 days after order date, counted by priority. The
    DataFrame form is an explicit LEFT SEMI join — Catalyst plans the
    same shuffled-hash/broadcast semi it derives from the SQL EXISTS, no
    decorrelation subtlety, and the semi stops probing a key at first
    match (no duplicate explosion from multi-lineitem orders)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q50_latest_order_argmax",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
      FROM orders
    )
    SELECT o_custkey,
           o_orderkey AS latest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_order_ts,
           n_orders
    FROM ranked WHERE rn = 1
    """,
)
def q50_latest_order_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group argmax via a bit-packed MAX aggregate: the
    latest order per customer without a window sort. Packing
    (days_since_epoch << 47) | orderkey makes argmax an ordinary
    map-side-combinable long MAX — HashAggregate, one partial-aggregated
    shuffle — where the row_number() formulation (the oracle) would
    shuffle-and-sort every order row, and a struct-MAX falls back to
    SortAggregate (struct buffers aren't hash-aggregable). Ties on date
    resolve to the highest orderkey by construction. Width check: days
    fit 16 bits until year 2149, leaving 47 bits ≈ 1.4e14 for orderkey —
    TPC-H orderkeys reach ~6e9 at SF1000 (≈1 PB), four orders of
    magnitude of headroom (vs 1e8 for the decimal pack this replaced);
    dates must be ≥ 1970 (TPC-H's are 1992+) or the pack goes negative."""
    o = _t(spark, sf_dir, "orders")
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    packed = F.shiftleft(days, 47) + F.col("o_orderkey")
    return (
        o.groupBy("o_custkey")
        .agg(F.max(packed).alias("p"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_custkey",
            F.expr(f"p & {(1 << 47) - 1}").alias("latest_orderkey"),
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"),
                    F.expr("CAST(p >> 47 AS INT)"),
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("latest_order_ts"),
            "n_orders",
        )
    )


@query(
    "t05_hash_split",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                  ELSE 'test' END AS split,
             doc_id, n_chars
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM assigned GROUP BY split
    """,
)
def t05_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (text.hash_split):
    stable across engines, runs, and cluster sizes — the reproducibility
    property random sample() lacks. Pure projection + one partial-agg'd
    groupBy; no shuffle of the corpus itself."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(text.hash_split(F.col("doc_id")).alias("split"), "doc_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@query(
    "t06_corpus_stats",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
             AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, source
    """,
)
def t06_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report (docs/tokens/chars by language × source)
    — the mixture table a training run is provisioned from. Token counts
    are computed inline (codegen'd split+filter), aggregated map-side;
    one shuffle on the tiny group key."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "d08_dedup_corpus",
    oracle=_DUP_GRAPH_CTE
    + """
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN labels l ON d.doc_id = l.doc_id
    WHERE l.cluster_id = d.doc_id
    """,
)
def d08_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy-dedup materialization: near-dup pair graph →
    connected components → keep each cluster's representative → the
    cleaned corpus with original columns. This is the full pipeline the
    pairwise queries (d02/d03) feed at 100 TB; transitivity means A~B~C
    collapses to one doc even when A~C misses the threshold."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    clusters = dedup.dup_clusters(docs, pairs)
    reps = clusters.where(F.col("is_rep")).select(F.col("doc_id"))
    return docs.join(reps, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "d09_contamination",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(range(1, greatest(len(t)-4, 0)+1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])))
               AS sh
      FROM tok
    ), bench AS (
      SELECT DISTINCT sh FROM sh WHERE source = 'src0'
    )
    SELECT t.doc_id, COUNT(*) AS n_shared_grams
    FROM (SELECT doc_id, sh FROM sh WHERE source <> 'src0') t
    JOIN bench b ON t.sh = b.sh
    GROUP BY t.doc_id
    """,
)
def d09_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan (dedup.contamination_check): distinct
    5-gram overlap between each training doc (source≠src0) and the
    benchmark corpus (source=src0). The benchmark gram set is broadcast,
    so the 100 TB training side never shuffles — explode, broadcast-hash
    lookup, partial-agg count."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0")
    train = docs.where(F.col("source") != "src0")
    return dedup.contamination_check(train, bench, n=5)


@query(
    "st06_sliding_windows",
    oracle="""
    WITH ex AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS wstart,
             value
      FROM events, (SELECT unnest([0, 1]) AS k) ks
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM ex GROUP BY wstart
    """,
)
def st06_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hopping-window aggregation (30 min windows / 15 min
    slide): every event counted in exactly two overlapping windows. The
    oracle replays it as two shifted tumbling groupings — window starts
    align to epoch multiples of the slide."""
    from logverzcore_spark.streaming.collect_stream import run_sliding_windows

    return run_sliding_windows(spark, os.path.join(sf_dir, "events.parquet"))


@query(
    "m04_decode_batch_plan",
    oracle="""
    SELECT doc_id, source, n_chars AS n_bytes,
           CAST(FLOOR((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_chars) / 10000.0) AS INTEGER)
             AS batch_id
    FROM documents
    """,
)
def m04_decode_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-batch packing (multimodal.plan_decode_batches): payloads
    greedily packed into ≤10 KB batches per source via an exclusive
    prefix sum — the task-sizing step before a GPU/codec stage. n_chars
    stands in for payload bytes (no codecs in the container)."""
    from logverzcore_spark.operators.multimodal import plan_decode_batches

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("n_bytes")
    )
    return plan_decode_batches(
        docs, bytes_col="n_bytes", budget_bytes=10_000, part_col="source", id_col="doc_id"
    )


@query(
    "q51_rank_battery",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(percent_rank() OVER w, 6) AS pr,
           ROUND(cume_dist() OVER w, 6) AS cd,
           ntile(4) OVER w AS quartile,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY ROUND(c_acctbal, 2), c_custkey)
    """,
)
def q51_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function battery (percent_rank / cume_dist / ntile / rank /
    dense_rank) over a deterministic total order — one shuffle+sort per
    partition key, all five functions share the single window pass."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.round("c_acctbal", 2), "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q52_date_battery",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d %H:%M:%S') AS plus_3m,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d %H:%M:%S') AS quarter_start,
           dayofyear(o_orderdate) AS doy,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def q52_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar-function battery: interval arithmetic with
    month-end clamping, day arithmetic, last_day, quarter truncation —
    the temporal surface log analytics leans on. Pure projection; the
    modulo filter keeps the graded result compact."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(ts + F.expr("INTERVAL 3 MONTHS"), "yyyy-MM-dd HH:mm:ss").alias(
            "plus_3m"
        ),
        F.datediff(ts.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_format(F.last_day(ts.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("quarter", ts), "yyyy-MM-dd HH:mm:ss").alias(
            "quarter_start"
        ),
        F.dayofyear(ts).alias("doy"),
        F.quarter(ts).cast("int").alias("qtr"),
    )


@query(
    "q53_correlated_scalar",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
    FROM customer c
    WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
)
def q53_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their own nation's
    average balance. Exercises Catalyst's decorrelation — the subquery
    rewrites to a per-nation aggregate + join, so it runs as two
    shuffles, not per-row re-execution. The threshold divides an exact
    decimal sum by a count so both engines compute the identical IEEE
    double (suite numeric-determinism convention)."""
    cust = _t(spark, sf_dir, "customer")
    view = "q53_customer"
    cust.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
        FROM {view} c
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM {view} c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@query(
    "q54_null_semantics",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           NULLIF(CAST(FLOOR(c_acctbal) AS BIGINT) % 10, 0) AS nz_digit,
           ROUND(LEAST(c_acctbal, 0.0), 2) AS neg_part,
           ROUND(GREATEST(c_acctbal, 0.0), 2) AS pos_part
    FROM customer
    """,
)
def q54_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar battery: COALESCE / NULLIF / LEAST / GREATEST
    composition — the fringe semantics user queries trip over (NULLIF
    producing NULLs mid-expression, LEAST/GREATEST ignoring nothing).
    Pure projection, no shuffle."""
    cust = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.nullif(F.floor(bal).cast("bigint") % 10, F.lit(0)).alias("nz_digit"),
        F.round(F.least(bal, F.lit(0.0)), 2).alias("neg_part"),
        F.round(F.greatest(bal, F.lit(0.0)), 2).alias("pos_part"),
    )


@query(
    "q55_multiset_ops",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_tax > 0.04
    """,
)
def q55_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag (multiset) semantics: each orderkey appears
    min(count_left, count_right) times, which plain INTERSECT collapses
    to one. The corner users hit re-running RDS queries that relied on
    duplicate multiplicity."""
    li = _t(spark, sf_dir, "lineitem")
    left = li.where(F.col("l_discount") > 0.05).select("l_orderkey")
    right = li.where(F.col("l_tax") > 0.04).select("l_orderkey")
    return left.intersectAll(right)


@query(
    "q56_except_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_tax > 0.04
    """,
)
def q56_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: multiplicity max(left-right, 0) per
    key, vs plain EXCEPT's all-or-nothing row removal."""
    li = _t(spark, sf_dir, "lineitem")
    left = li.where(F.col("l_discount") > 0.05).select("l_orderkey")
    right = li.where(F.col("l_tax") > 0.04).select("l_orderkey")
    return left.exceptAll(right)


@query(
    "d10_simhash_portable",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      FROM documents
    ), h AS (
      SELECT doc_id, CAST('0x' || substr(md5(tkn), 1, 15) AS BIGINT) AS hv
      FROM (SELECT doc_id, unnest(ts) AS tkn FROM tok)
    ), votes AS (
      SELECT doc_id, bits.b AS b,
             SUM(CASE WHEN (hv >> bits.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h, (SELECT unnest(range(0, 60)) AS b) bits
      GROUP BY doc_id, bits.b
    ), fp AS (
      SELECT doc_id, SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS f
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= 6
    """,
)
def d10_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, HASH-VERIFIED end to end: the md5-derived
    60-bit fingerprint is engine-portable, so the whole pipeline —
    token hashing, bit votes, pigeonhole banding, hamming≤6 pairs —
    checks exactly against a SQL oracle (d04's xxhash64 variant is
    faster but Spark-only, hence rows-only). The oracle replays it
    brute-force; the Spark side still bands (7 chunks > 6 bits), so its
    plan has no cross join at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs(
        docs, max_hamming=6, n_bands=7, hash_fn="md5"
    )


@query(
    "st07_incremental_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           strftime(date_trunc('hour', ts), '%Y%m%d') AS day_part
    FROM events GROUP BY 1, 2, 5
    """,
)
def st07_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained hourly rollup table (streaming/rollup.py):
    foreachBatch folds micro-batches into hour partitions via dynamic
    partition overwrite; the final table equals the batch aggregate."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.collect_stream import _events_stream
    from logverzcore_spark.streaming.rollup import incremental_hourly_rollup

    table = f"st07_rollup_{_uuid.uuid4().hex[:8]}"
    stream = _events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    q = incremental_hourly_rollup(
        spark, stream, table,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
    )
    q.awaitTermination()
    out = spark.table(table).select(
        F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "event_type",
        "n",
        F.col("total_value").cast("double").alias("total_value"),
        "day_part",
    )
    # Materialize before dropping the backing table (suite callers may
    # collect lazily after return), then leave the warehouse clean.
    out = out.localCheckpoint(eager=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_meta")
    return out


# ---------------------------------------------------------------------------
# Portable-oracle ANN variants (VERDICT r2 #6): the LSH hyperplanes and
# IVF centroids come from the deterministic LCG stream, so the SQL oracle
# holds the SAME literal vectors and replays bucketing / cell assignment
# exactly — the ANN paths graduate from rows-only to hash-verified.
# ---------------------------------------------------------------------------


def _sql_double_array(row: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in row) + "]::DOUBLE[]"


_ANN_TOPK_TAIL = """
    ), n AS (
      SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    ), scored AS (
      SELECT cand.qid AS query_id, cand.nid AS neighbor_id,
             list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
      FROM cand JOIN n q ON q.vec_id = cand.qid
                JOIN n c ON c.vec_id = cand.nid
    ), ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
"""


def _s02b_oracle(dim: int = 64, n_planes: int = 4, n_tables: int = 12) -> str:
    planes = similarity._hyperplanes(dim, n_planes * n_tables)
    values = ",\n      ".join(
        f"({p}, {_sql_double_array(row)})" for p, row in enumerate(planes)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), planes(p, plane) AS (VALUES
      {values}
    ), b AS (
      SELECT v.vec_id, p.p // {n_planes} AS t,
             SUM(CASE WHEN list_dot_product(v.e, p.plane) >= 0
                      THEN (1 << (p.p % {n_planes})) ELSE 0 END) AS bucket
      FROM v CROSS JOIN planes p
      GROUP BY v.vec_id, p.p // {n_planes}
    ), cand AS (
      SELECT DISTINCT qb.vec_id AS qid, cb.vec_id AS nid
      FROM b qb JOIN b cb ON qb.t = cb.t AND qb.bucket = cb.bucket
                         AND qb.vec_id <> cb.vec_id
      WHERE qb.vec_id < 20
    {_ANN_TOPK_TAIL}
    """


def _s03b_oracle(dim: int = 64, n_cells: int = 16, nprobe: int = 4) -> str:
    cents = similarity.lcg_centroids(dim, n_cells)
    values = ",\n      ".join(
        f"({ci}, {_sql_double_array(row)})" for ci, row in enumerate(cents)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cents(cell, cvec) AS (VALUES
      {values}
    ), sims AS (
      SELECT v.vec_id, c.cell, list_dot_product(v.e, c.cvec) AS sim
      FROM v CROSS JOIN cents c
    ), c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims
      ) WHERE rn = 1
    ), q_probe AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims WHERE vec_id < 20
      ) WHERE rn <= {nprobe}
    ), cand AS (
      SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
      FROM q_probe q JOIN c_assign c ON q.cell = c.cell
                                    AND q.vec_id <> c.vec_id
    {_ANN_TOPK_TAIL}
    """


@query("s02b_lsh_topk_portable", oracle=_s02b_oracle())
def s02b_lsh_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s02's computation, hash-verified: the oracle replays the exact
    hyperplane bucketing (literal LCG planes, sign bits, per-table bucket
    ids, candidate equi-join) and the cosine top-k in SQL. Cell-level
    determinism notes: both engines compute float64 dots on the same
    literal planes; tie-breaks are (cos DESC, neighbor_id) on both
    sides."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.lsh_topk(emb, queries, k=5, dim=64)


@query("s03b_ivf_topk_portable", oracle=_s03b_oracle())
def s03b_ivf_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with engine-portable LCG centroids (no data-dependent
    k-means), hash-verified: cell argmax and nprobe probing replay in SQL
    with the same literal centroid vectors. Normalizing the vector before
    the centroid dot (Spark) vs dividing after (oracle) is a positive
    per-row scaling — identical rankings. Recall is below the k-means
    variant (s03) at equal nprobe; nprobe=4 of 16 cells compensates."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.ivf_topk(
        emb, queries, k=5, n_cells=16, nprobe=4,
        centroids=similarity.lcg_centroids(64, 16),
    )


# ---------------------------------------------------------------------------
# Round-3 coverage: Gopher quality rules, intra-doc repetition, embedding
# quantization, range-frame windows, stream-static enrichment.
# ---------------------------------------------------------------------------


@query(
    "t07_gopher_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id, len(toks) AS n_words,
             CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                  AS DOUBLE) / greatest(len(toks), 1) AS mean_len,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / greatest(len(toks), 1) AS alpha_ratio,
             len(list_filter(list_transform(toks, x -> lower(x)),
                 x -> x IN ('the','a','an','and','or','of','to','in','is'))) AS n_stop_hits
      FROM t
    )
    SELECT doc_id, n_words,
           ROUND(mean_len, 4) AS mean_word_len,
           ROUND(alpha_ratio, 4) AS alpha_word_ratio,
           n_stop_hits,
           (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
           (mean_len >= 3 AND mean_len <= 10) AS pass_mean_word_len,
           (alpha_ratio >= 0.8) AS pass_alpha_ratio,
           (n_stop_hits >= 2) AS pass_stopwords,
           (n_words >= 50 AND n_words <= 100000
            AND mean_len >= 3 AND mean_len <= 10
            AND alpha_ratio >= 0.8 AND n_stop_hits >= 2) AS keep
    FROM m
    """,
)
def t07_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (text.gopher_quality) over the corpus —
    per-rule flags + combined keep, all in one codegen'd projection."""
    docs = _t(spark, sf_dir, "documents")
    return text.gopher_quality(docs).select(
        "doc_id", "n_words", "mean_word_len", "alpha_word_ratio", "n_stop_hits",
        "pass_word_count", "pass_mean_word_len", "pass_alpha_ratio",
        "pass_stopwords", "keep",
    )


@query(
    "t08_dup_ngram_fraction",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(generate_series(1, len(toks) - 2),
                                      i -> array_to_string(toks[i:i+2], ' '))
                  ELSE []::VARCHAR[] END AS grams
      FROM t
    )
    SELECT doc_id, len(grams) AS n_ngrams,
           len(list_distinct(grams)) AS n_distinct_ngrams,
           ROUND(CASE WHEN len(grams) > 0
                      THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                                 / len(grams)
                      ELSE 0.0 END, 4) AS dup_ngram_frac
    FROM g
    """,
)
def t08_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document duplicate 3-gram fraction (the Gopher repetition
    rule) — per-row n-gram arrays, zero shuffle at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    return text.dup_ngram_fraction(docs).select(
        "doc_id", "n_ngrams", "n_distinct_ngrams", "dup_ngram_frac"
    )


@query(
    "s05_embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), s AS (
      SELECT vec_id, e,
             127.0 / greatest(list_max(list_transform(e, x -> abs(x))), 1e-12) AS scale
      FROM v
    )
    SELECT vec_id, ROUND(scale, 6) AS scale,
           ROUND(sqrt(list_sum(list_transform(e,
             x -> pow(x - least(greatest(floor(x*scale + 0.5), -127), 127)/scale, 2)))), 6)
             AS recon_rmse,
           CAST(list_sum(list_transform(e,
             x -> abs(least(greatest(floor(x*scale + 0.5), -127), 127)))) AS BIGINT)
             AS q_l1_checksum,
           len(e) AS n_dims
    FROM s
    """,
)
def s05_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization audit (similarity.quantize_embedding_stats):
    per-vector scale, reconstruction RMSE, and the exact integer L1
    checksum of the quantized vector — floor arithmetic keeps the
    quantized payload hash-identical across engines."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.quantize_embedding_stats(emb)


@query(
    "q57_rolling_7d_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT priority, day, revenue,
           ROUND(SUM(revenue) OVER (PARTITION BY priority ORDER BY day
                                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
             AS rev_7d
    FROM daily
    """,
)
def q57_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling window (7 calendar days, gaps included): the
    heavy work is the parallel daily pre-aggregation; the range window
    then runs over the bounded (priority × day) frame — at 100 TB the
    window input stays ~days × cardinality rows no matter how many orders
    feed it. RANGE (value-based) vs ROWS matters when days are missing:
    the frame spans calendar distance, not row count."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
        )
        .agg(_money_sum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("priority").orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "priority", "day", "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("rev_7d"),
    )


@query(
    "st08_stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def st08_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: the event stream joins a
    broadcast customer dimension per micro-batch, then aggregates by
    market segment — the streaming form of attaching slowly-changing
    dims without stateful join state."""
    from logverzcore_spark.streaming.collect_stream import run_stream_static_enrich

    return run_stream_static_enrich(
        spark, os.path.join(sf_dir, "events.parquet"), _t(spark, sf_dir, "customer")
    )


@query(
    "q58_percentile_battery",
    oracle="""
    SELECT o_orderpriority AS priority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           ROUND(median(o_totalprice), 4) AS med
    FROM orders GROUP BY 1
    """,
)
def q58_percentile_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics) per
    group — Spark's `percentile` vs DuckDB's `quantile_cont`. Exact
    percentiles need the group's values together (that is the operator's
    semantics); at 100 TB the approx sketch (q30/q48's family,
    percentile_approx) is the scale path and this the audit path."""
    o = _t(spark, sf_dir, "orders")
    pct = F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.round(F.element_at(pct, 1), 4).alias("p50"),
            F.round(F.element_at(pct, 2), 4).alias("p90"),
            F.round(F.element_at(pct, 3), 4).alias("p99"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("med"),
        )
    )


@query(
    "q59_regexp_battery",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
           length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS n_after_devowel,
           regexp_matches(p_name, '(red|blue|green)') AS has_color
    FROM part
    WHERE p_partkey < 500
    """,
)
def q59_regexp_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar battery (extract / match / global replace) — all
    codegen'd JVM regex, pushdown-friendly projection over a key-pruned
    scan."""
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.col("p_name").rlike(r"^[a-z]+ ").alias("starts_word"),
        F.length(F.regexp_replace("p_name", r"[aeiou]", "")).alias("n_after_devowel"),
        F.col("p_name").rlike(r"(red|blue|green)").alias("has_color"),
    )


@query(
    "t09_hash_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
    """,
)
def t09_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sample of the corpus (text.hash_sample):
    ~12.5% of docs, identical membership on every engine/run/cluster
    size — the reproducible alternative to TABLESAMPLE for pipeline
    debugging and eval-set carving."""
    docs = _t(spark, sf_dir, "documents")
    return docs.where(text.hash_sample(F.col("doc_id"))).select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "q60_frame_battery",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(price) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
             AS rolling3,
           ROUND(first_value(price) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW), 2) AS first_price,
           ROUND(last_value(price) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING), 2) AS final_price,
           ROUND(nth_value(price, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING), 2) AS second_price,
           ROUND(lag(price, 1, 0.0) OVER w, 2) AS prev_price,
           ROUND(lead(price, 1, -1.0) OVER w, 2) AS next_price
    FROM (SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price
          FROM orders WHERE o_custkey < 100)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def q60_frame_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame battery: ROWS frames (bounded rolling, running
    first, whole-partition last/nth) plus lag/lead with defaults — all
    six functions share one shuffle+sort per partition key. Frame inputs
    are pre-rounded so both engines fold identical doubles."""
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 100)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("price").over(w.rowsBetween(-2, 0)), 2).alias("rolling3"),
        F.round(
            F.first("price").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("first_price"),
        F.round(
            F.last("price").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
            2,
        ).alias("final_price"),
        F.round(
            F.nth_value("price", 2).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
            2,
        ).alias("second_price"),
        F.round(F.lag("price", 1, 0.0).over(w), 2).alias("prev_price"),
        F.round(F.lead("price", 1, -1.0).over(w), 2).alias("next_price"),
    )


@query(
    "st09_cdc_upsert",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           event_type, ROUND(value, 2) AS value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def st09_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed CDC upsert (streaming/upsert.py): the event stream folds
    into a bucket-partitioned latest-row-per-user table — per batch only
    the touched hash buckets are merged and dynamically overwritten,
    never the whole table. Graded result: the final table equals the
    batch argmax per user."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.collect_stream import _events_stream
    from logverzcore_spark.streaming.upsert import BUCKET_COL, upsert_stream

    table = f"st09_upsert_{_uuid.uuid4().hex[:8]}"
    stream = _events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    q = upsert_stream(
        spark, stream, table, key_col="user_id", ts_col="ts",
        tie_cols=["event_id"],
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
    )
    q.awaitTermination()
    out = spark.table(table).select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "event_type", F.round("value", 2).alias("value"),
    )
    out = out.localCheckpoint(eager=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_meta")
    return out


@query(
    "d11_containment",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 0)+1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      FROM tok
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), directed AS (
      SELECT id1 AS src_id, id2 AS dst_id,
             ROUND(c * 1.0 / s1.n, 4) AS containment
      FROM inter JOIN sz s1 ON s1.doc_id = id1
      UNION ALL
      SELECT id2, id1, ROUND(c * 1.0 / s2.n, 4)
      FROM inter JOIN sz s2 ON s2.doc_id = id2
    )
    SELECT src_id, dst_id, containment FROM directed WHERE containment >= 0.5
    """,
)
def d11_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment pairs (dedup.containment_pairs):
    catches subset/quote duplication that symmetric Jaccard (d02)
    under-scores."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.containment_pairs(docs, threshold=0.5)


@query(
    "t10_source_scorecard",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    ), m AS (
      SELECT source, n_chars, len(toks) AS n_words,
             CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                  AS DOUBLE) / greatest(len(toks), 1) AS mean_len,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / greatest(len(toks), 1) AS alpha_ratio,
             len(list_filter(list_transform(toks, x -> lower(x)),
                 x -> x IN ('the','a','an','and','or','of','to','in','is'))) AS n_stop_hits
      FROM t
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_words >= 50 AND n_words <= 100000
                          AND mean_len >= 3 AND mean_len <= 10
                          AND alpha_ratio >= 0.8 AND n_stop_hits >= 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           ROUND(SUM(CASE WHEN n_words >= 50 AND n_words <= 100000
                           AND mean_len >= 3 AND mean_len <= 10
                           AND alpha_ratio >= 0.8 AND n_stop_hits >= 2
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS keep_rate,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM m GROUP BY source
    """,
)
def t10_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus scorecard: Gopher keep-rate + volume per crawl
    source — the 'which sources are garbage' dashboard query. Composes
    the t07 projection with one map-side-combined groupBy on source."""
    docs = _t(spark, sf_dir, "documents")
    g = text.gopher_quality(docs)
    return (
        g.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("bigint")).alias("n_keep"),
            F.round(F.sum(F.col("keep").cast("int")) / F.count(F.lit(1)), 4).alias(
                "keep_rate"
            ),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "t11_sequence_packing",
    oracle=r"""
    WITH staged AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS BIGINT)
                  % 16 AS INTEGER) AS shard,
             md5(CAST(doc_id AS VARCHAR)) AS ord_key,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord_key, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS cum_excl
      FROM staged
    )
    SELECT doc_id, shard, CAST(n_tokens AS INTEGER) AS n_tokens,
           shard * 4294967296 + CAST(FLOOR(cum_excl / 512.0) AS BIGINT) AS pack_id
    FROM packed
    """,
)
def t11_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic greedy sequence packing (text.pack_sequences):
    documents assigned to 512-token context-window packs, stable across
    engines/runs/cluster sizes; packing parallelism = shard count."""
    docs = _t(spark, sf_dir, "documents")
    return text.pack_sequences(docs, max_tokens=512)


@query(
    "t12_mixture_sample",
    oracle="""
    WITH drawn AS (
      SELECT doc_id, source, n_chars,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                  AS DOUBLE) / 4294967296.0 AS u,
             CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                         WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.1
                         ELSE 0.05 END AS rate
      FROM documents
    )
    SELECT doc_id, source, n_chars FROM drawn WHERE u < rate
    """,
)
def t12_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source mixture sampling (text.mixture_sample):
    materialize a corpus mixture (quotas per crawl source) with stable
    id-hash draws — identical membership on every engine and re-run."""
    docs = _t(spark, sf_dir, "documents")
    return text.mixture_sample(
        docs,
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1},
        default_rate=0.05,
    ).select("doc_id", "source", "n_chars")


@query(
    "q61_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT CAST(c_nationkey + 10 AS VARCHAR) AS cc, c_custkey, c_acctbal
      FROM customer
      WHERE CAST(c_nationkey + 10 AS VARCHAR) IN ('13','31','23','29','30','18','17')
        AND c_acctbal > (
          SELECT AVG(c_acctbal) FROM customer
          WHERE c_acctbal > 0.00
            AND CAST(c_nationkey + 10 AS VARCHAR) IN ('13','31','23','29','30','18','17')
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 350000
        )
    )
    SELECT cc, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM eligible GROUP BY cc
    """,
)
def q61_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: country code (TPC-H defines phone CC = nationkey+10;
    the synthetic customer table has no c_phone, so derive it directly),
    IN-list, scalar AVG subquery (broadcast one-row cross join), and a
    NOT EXISTS anti-join against orders — the composite that exercises
    scalar-subquery + anti-join planning together. The avg is computed
    once, broadcast; the anti-join shuffles on custkey only."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 350000)
        .select("o_custkey")
    )
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    cc = (F.col("c_nationkey") + 10).cast("string")
    base = cust.where(cc.isin(codes))
    avg_bal = base.where(F.col("c_acctbal") > 0.00).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    eligible = (
        base.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        eligible.groupBy(cc.alias("cc"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            _money_sum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "q62_top_supplier_revenue",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
                  AS BIGINT)/100.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q62_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue 'view' consumed twice — once for the
    per-supplier totals, once for the global MAX scalar subquery. The
    revenue aggregate is computed once and reused (same frame object →
    Spark reuses the exchange); the max arrives as a broadcast one-row
    frame, supplier joins broadcast the small side."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg((F.sum(cents).cast("bigint") / 100.0).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "m05_audio_frame_features",
    oracle="""
    WITH pos AS (
      SELECT doc_id, text, i
      FROM documents, LATERAL (SELECT UNNEST(range(0, length(text))) AS i)
    ), vals AS (
      SELECT doc_id, CAST(i // 32 AS INTEGER) AS frame_idx,
             unicode(substr(text, CAST(i + 1 AS INTEGER), 1)) AS v
      FROM pos
    )
    SELECT doc_id, frame_idx, COUNT(*) AS n_bytes,
           ROUND(SQRT(AVG(CAST(v AS DOUBLE) * v)), 6) AS rms,
           CAST(MAX(v) AS INTEGER) AS peak
    FROM vals GROUP BY doc_id, frame_idx
    """,
)
def m05_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio featurization: payload bytes as header-less 8-bit
    PCM, framed into 32-byte windows; per-frame RMS + peak via a 1→N
    numpy mapInPandas (operators/multimodal.py). The payloads are the
    UTF-8 document bytes (pure ASCII in the synthetic corpus), so the
    oracle replays the byte values as character codes — frame sums are
    exact integers in float64, making RMS bit-identical across engines."""
    from logverzcore_spark.operators.multimodal import audio_frame_features

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return audio_frame_features(docs, payload_col="payload", id_col="doc_id")


@query(
    "q63_sole_supplier_orders",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_orders
    FROM supplier s JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_linenumber <> l1.l_linenumber)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1, 2
    """,
)
def q63_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per supplier, the multi-line orders it supplied
    ALONE (an EXISTS + NOT-EXISTS pair over the same fact table). The
    oracle runs the correlated form; this side decorrelates it into ONE
    per-order aggregation — n_lines ≥ 2 ∧ distinct suppliers = 1 names
    the sole supplier directly (min = the only one) — so the 100 TB fact
    table is scanned once and shuffled once on the order key, instead of
    twice more for the two correlated probes. Supplier names arrive by
    broadcast. Note the synthetic data has orders with duplicated
    l_linenumber — the EXISTS probe demands a DIFFERENT linenumber, so
    the decorrelation must count distinct linenumbers, not lines."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_linenumber").alias("n_linenos"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.min("l_suppkey").alias("sole_supp"),
    )
    sole = per_order.where((F.col("n_linenos") >= 2) & (F.col("n_supp") == 1))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(supp), sole["sole_supp"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q64_min_price_supplier",
    oracle="""
    SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
           CAST(l.l_extendedprice AS DOUBLE) AS best_price
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size <= 5
      AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q64_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the supplier(s) offering each small part at its
    minimum observed price — a correlated scalar MIN subquery in the
    oracle, decorrelated here into one per-part aggregation joined back
    on (part, price). The price equality joins the exact stored double
    (MIN returns an existing value — no arithmetic, so cross-engine
    equality is safe). part and supplier broadcast; the fact table is
    scanned twice but shuffled only on l_partkey both times, and AQE
    reuses nothing bigger. Ties at the min price keep every tying
    supplier, as the correlated form does."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_size") <= 5)
        .select("p_partkey", "p_name")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    min_price = (
        li.groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("best_price"))
        .withColumnRenamed("l_partkey", "mp_partkey")
    )
    return (
        li.join(
            min_price,
            (li["l_partkey"] == min_price["mp_partkey"])
            & (li["l_extendedprice"] == min_price["best_price"]),
        )
        .join(F.broadcast(part), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name",
            F.col("best_price").cast("double").alias("best_price"),
        )
        .distinct()
    )


@query(
    "q65_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c FROM events
    ), p AS (
      SELECT event_type,
             quantile_cont(c, 0.05) AS lo, quantile_cont(c, 0.95) AS hi
      FROM b GROUP BY event_type
    )
    SELECT b.event_type, COUNT(*) AS n,
           SUM(CASE WHEN CAST(b.c AS DOUBLE) < p.lo THEN 1 ELSE 0 END) AS n_low,
           SUM(CASE WHEN CAST(b.c AS DOUBLE) > p.hi THEN 1 ELSE 0 END) AS n_high,
           SUM(LEAST(GREATEST(b.c, CAST(CEIL(p.lo) AS BIGINT)),
                     CAST(FLOOR(p.hi) AS BIGINT))) AS clipped_sum_cents,
           ROUND(p.lo / 100.0, 4) AS lo, ROUND(p.hi / 100.0, 4) AS hi
    FROM b JOIN p USING (event_type)
    GROUP BY b.event_type, p.lo, p.hi
    """,
)
def q65_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping to per-group p05/p95) — the
    value-cleaning step of a training-data pipeline, engine-stable:
    percentiles interpolate over exact integer cents (q36's pattern),
    clip bounds snap to integers (ceil/floor of the same double in both
    engines), and the clipped sum is pure integer arithmetic — no
    order-sensitive float summation anywhere. Plan: one agg for the
    per-type bounds (a handful of rows, broadcast back), one agg for the
    clipped stats — the fact table shuffles only on event_type."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    b = ev.select("event_type", cents.alias("c"))
    p = b.groupBy("event_type").agg(
        F.percentile("c", F.lit(0.05)).alias("lo"),
        F.percentile("c", F.lit(0.95)).alias("hi"),
    )
    j = b.join(F.broadcast(p), "event_type")
    clipped = F.least(
        F.greatest(F.col("c"), F.ceil("lo").cast("bigint")),
        F.floor("hi").cast("bigint"),
    )
    return (
        j.groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("c").cast("double") < F.col("lo"), 1).otherwise(0)).alias("n_low"),
            F.sum(F.when(F.col("c").cast("double") > F.col("hi"), 1).otherwise(0)).alias("n_high"),
            F.sum(clipped).alias("clipped_sum_cents"),
        )
        .select(
            "event_type", "n", "n_low", "n_high", "clipped_sum_cents",
            F.round(F.col("lo") / 100.0, 4).alias("lo"),
            F.round(F.col("hi") / 100.0, 4).alias("hi"),
        )
    )


@query(
    "st10_streaming_neardup",
    oracle=(
        _JACCARD_ORACLE_TMPL.replace(
            "SELECT id1, id2, ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS jaccard",
            "SELECT d.doc_id FROM documents d WHERE d.doc_id NOT IN (\n"
            "  SELECT id2",
        ).replace(
            "WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= {thr}",
            "  WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= {thr})",
        )
    ).format(thr=0.7),
)
def st10_streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup suppression (streaming/stream_neardup.py):
    MinHash+LSH state tables + exact-Jaccard verify inside a
    foreachBatch stream. Over one availableNow batch the committed set
    equals batch semantics — every doc except the higher id of each
    verified ≥0.7 pair — which the oracle states as a NOT IN over the
    exact-Jaccard pair set (recall of the LSH candidate step at these
    parameters is d03's hash-verified behavior)."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.stream_neardup import neardup_stream

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    docs_path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(docs_path).schema
    table = f"st10_neardup_{_uuid.uuid4().hex[:8]}"
    q = neardup_stream(
        spark,
        os.path.dirname(docs_path),
        schema,
        table,
        fmt="parquet",
        reader_options={"pathGlobFilter": os.path.basename(docs_path)},
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
    )
    q.awaitTermination()
    out = spark.table(table).select("doc_id").localCheckpoint(eager=True)
    for t in (table, f"{table}_lsh_buckets", f"{table}_lsh_sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


def _d12_oracle(dim: int = 64, n_planes: int = 4, threshold: float = 0.25) -> str:
    planes = similarity._hyperplanes(dim, n_planes)
    values = ",\n      ".join(
        f"({p}, {_sql_double_array(row)})" for p, row in enumerate(planes)
    )
    return f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), planes(p, plane) AS (VALUES
      {values}
    ), b AS (
      SELECT v.vec_id, v.e,
             SUM(CASE WHEN list_dot_product(v.e, p.plane) >= 0
                      THEN (1::BIGINT << p.p) ELSE 0 END) AS cell
      FROM v CROSS JOIN planes p GROUP BY v.vec_id, v.e
    ), n AS (
      SELECT vec_id, e, cell, sqrt(list_dot_product(e, e)) AS nrm FROM b
    ), pairs AS (
      SELECT a.vec_id AS id1, c.vec_id AS id2
      FROM n a JOIN n c ON a.cell = c.cell AND a.vec_id < c.vec_id
      WHERE ROUND(list_dot_product(a.e, c.e) / (a.nrm * c.nrm), 6) >= {threshold}
    ), edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a
    ), labels AS (
      SELECT v.vec_id, LEAST(v.vec_id, COALESCE(MIN(r.dst), v.vec_id)) AS cluster_id
      FROM v LEFT JOIN reach r ON r.src = v.vec_id
      GROUP BY v.vec_id
    )
    SELECT vec_id, cluster_id, vec_id = cluster_id AS is_rep FROM labels
    """


@query("d12_semantic_dedup", oracle=_d12_oracle())
def d12_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/dedup.semantic_dedup):
    deterministic hyperplane cells bound the pairwise cosine work, cos ≥
    0.25 pairs are grouped transitively (min-label propagation), one
    representative survives per semantic group. Hash-verified end to end:
    the oracle replays the literal LCG planes, the sign-bit cell ids, the
    rounded-cosine pair predicate, and the connected components as a
    recursive transitive closure."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.semantic_dedup(emb, dim=64, threshold=0.25, n_planes=4)


def _s06b_oracle(dim: int = 64, m: int = 8, n_codes: int = 16) -> str:
    import numpy as np

    sub = dim // m
    books = similarity.lcg_codebooks(dim, m, n_codes)
    C = np.array(books, dtype=np.float64)
    c2 = (C * C).sum(axis=2)
    c2i = np.floor(c2 * similarity.PQ_SCALE + 0.5).astype(np.int64)
    values = ",\n      ".join(
        f"({s}, {j}, {_sql_double_array(books[s][j])}, {c2[s, j]!r}, {int(c2i[s, j])})"
        for s in range(m)
        for j in range(n_codes)
    )
    S = similarity.PQ_SCALE
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cb(s, j, cvec, c2, c2i) AS (VALUES
      {values}
    ), codes AS (
      SELECT vec_id, s, j AS code FROM (
        SELECT v.vec_id, cb.s, cb.j,
               row_number() OVER (PARTITION BY v.vec_id, cb.s ORDER BY
                 floor((cb.c2 - 2 * list_dot_product(
                   v.e[cb.s*{sub}+1 : (cb.s+1)*{sub}], cb.cvec)) * {S} + 0.5),
                 cb.j) AS rn
        FROM v CROSS JOIN cb
      ) WHERE rn = 1
    ), recon AS (
      SELECT c.vec_id, SUM(cb.c2i) AS recon
      FROM codes c JOIN cb ON cb.s = c.s AND cb.j = c.code
      GROUP BY c.vec_id
    ), lut AS (
      SELECT q.vec_id AS qid, cb.s, cb.j,
             CAST(floor(list_dot_product(
               q.e[cb.s*{sub}+1 : (cb.s+1)*{sub}], cb.cvec) * {S} + 0.5) AS BIGINT) AS t
      FROM v q CROSS JOIN cb WHERE q.vec_id < 20
    ), scored AS (
      SELECT l.qid, c.vec_id AS nid, SUM(l.t) AS adc
      FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.code
      WHERE l.qid <> c.vec_id
      GROUP BY 1, 2
    ), qn AS (
      SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v WHERE vec_id < 20
    ), ranked AS (
      SELECT s.qid, s.nid, s.adc, r.recon,
             row_number() OVER (PARTITION BY s.qid ORDER BY
               (s.adc / {S}.0) / sqrt(r.recon / {S}.0) DESC, s.nid) AS rank
      FROM scored s JOIN recon r ON r.vec_id = s.nid
    )
    SELECT qid AS query_id, nid AS neighbor_id,
           ROUND((adc / {S}.0) / (qn.nrm * sqrt(recon / {S}.0)), 6) AS approx_cosine,
           CAST(rank AS INTEGER) AS rank
    FROM ranked JOIN qn ON qn.vec_id = ranked.qid
    WHERE rank <= 5
    """


@query("s06_pq_topk")  # trained codebooks are data-sampled → rows-only check
def s06_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with per-subspace k-means codebooks —
    the classic 8-bit-code setting (m=4 subspaces × 256 codewords =
    32 bits/vector vs 64×32-bit floats, a 64× memory cut) plus the
    standard ADC-shortlist + exact-rescore refinement (rerank=64; ADC
    ordering alone lost recall as the corpus grew — 0.55 → 0.25 from
    sf0.01 → sf0.1). Codebooks are data-sampled → rows-only check;
    recall floor asserted in pytest AND measured into the parity
    artifact's bound_check."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    books = similarity.trained_codebooks(emb, dim=64, m=4, n_codes=256)
    return similarity.pq_topk(
        emb, queries, k=5, dim=64, m=4, n_codes=256, codebooks=books, rerank=64
    )


@query("s06b_pq_topk_portable", oracle=_s06b_oracle())
def s06b_pq_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN with engine-portable LCG codebooks, hash-verified: encode
    (fixed-point argmin per subspace), ADC lookup-table scoring (integer
    sums), and the adc/√recon rank key all replay bit-identically in SQL
    — see operators/similarity.pq_topk for why the fixed-point grid makes
    summation order irrelevant."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.pq_topk(emb, queries, k=5, dim=64)


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join battery (round 3): the join-reordering /
# decorrelation / disjunctive-pushdown shapes (Q7/Q8/Q9/Q14/Q17/Q19)
# the reference's users ran against RDS through Q1 (SURVEY §2.5). All
# money math uses the exact-integer-cents pattern so parallel partial
# aggregation cannot perturb the result.
# ---------------------------------------------------------------------------

_CENTS = "CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)"


def _cents() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")


@query(
    "q66_nation_trade_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(c) AS BIGINT)/100.0 AS revenue,
           COUNT(*) AS n_items
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {_CENTS} AS c
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey  = o_custkey
      JOIN supplier ON s_suppkey  = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q66_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. Plan: nation (25 rows) broadcasts onto supplier/customer so both
    dimension sides are pre-reduced to the two nations BEFORE touching the
    fact table (2/25 selectivity the RDBMS would only get after the join);
    the pair disjunction then runs on two small string columns. lineitem
    shuffles once on orderkey (orders join) and once on custkey — the
    supplier side stays broadcast (2/25 of suppliers is broadcastable even
    at large SF: supplier is the smallest dimension)."""
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = nation.where(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").alias("l_year"),
            _cents().alias("c"),
        )
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy("supp_nation", "cust_nation", "l_year").agg(
        (F.sum("c").cast("bigint") / 100.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q67_market_share",
    oracle=f"""
    SELECT o_year,
           SUM(CASE WHEN supp_nation = 'NATION_5' THEN c ELSE 0 END) * 1.0
             / SUM(c) AS mkt_share,
           CAST(SUM(c) AS BIGINT)/100.0 AS total_revenue
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             n1.n_name AS supp_nation,
             {_CENTS} AS c
      FROM lineitem
      JOIN part     ON p_partkey  = l_partkey
      JOIN supplier ON s_suppkey  = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey  = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey   = n2.n_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) GROUP BY o_year
    """,
)
def q67_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold into
    ASIA customers, by order year. The share divides two exact integer
    cent sums (one IEEE division — engine-identical). Plan: part is
    filtered to 1/6 of rows before its join; region⋈nation collapses to a
    broadcast 25-row filter on the customer side; supplier nation rides a
    broadcast. The fact table shuffles on partkey/orderkey only — the
    conditional numerator avoids a second pass."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("asia_nationkey"))
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("asia_nationkey"))
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _cents().alias("c")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("c")).otherwise(0))
    return joined.groupBy("o_year").agg(
        (num * 1.0 / F.sum("c")).alias("mkt_share"),
        (F.sum("c").cast("bigint") / 100.0).alias("total_revenue"),
    )


@query(
    "q68_product_profit",
    oracle=f"""
    SELECT supp_nation, o_year,
           CAST(SUM(c) AS BIGINT)/100.0 AS profit,
           COUNT(*) AS n_items
    FROM (
      SELECT n_name AS supp_nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_CENTS} AS c
      FROM lineitem
      JOIN part     ON p_partkey  = l_partkey
      JOIN supplier ON s_suppkey  = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%widget%'
    ) GROUP BY supp_nation, o_year
    """,
)
def q68_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: revenue on a product family (p_name LIKE) grouped
    by supplier nation and order year. Plan: the LIKE prunes part before
    the join (pushed to the parquet scan as a string-contains filter);
    supplier⋈nation broadcasts; lineitem shuffles on partkey then
    orderkey. No date filter — this is the full-history rollup shape, so
    partial aggregation (exact integer cents) carries the reduction."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _cents().alias("c")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy("supp_nation", "o_year").agg(
        (F.sum("c").cast("bigint") / 100.0).alias("profit"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q69_promo_revenue",
    oracle=f"""
    SELECT 100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN c ELSE 0 END) / SUM(c)
             AS promo_share,
           CAST(SUM(c) AS BIGINT)/100.0 AS total_revenue
    FROM (
      SELECT p_type, {_CENTS} AS c
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    )
    """,
)
def q69_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share in one ship month —
    conditional aggregation over a single fact⋈dim join, no second scan
    for the denominator. The date range prunes lineitem at the scan; the
    share is exact-int/exact-int in one IEEE division."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.select("l_partkey", _cents().alias("c")).join(
        part, F.col("l_partkey") == F.col("p_partkey")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("c")).otherwise(0))
    return j.agg(
        (F.lit(100.0) * promo / F.sum("c")).alias("promo_share"),
        (F.sum("c").cast("bigint") / 100.0).alias("total_revenue"),
    )


@query(
    "q70_small_qty_revenue",
    oracle="""
    WITH brand_li AS (
      SELECT l_partkey, l_quantity,
             CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS price_cents
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23'
    ), avg_qty AS (
      SELECT l_partkey AS a_partkey, SUM(l_quantity)/COUNT(*) AS avg_q
      FROM brand_li GROUP BY l_partkey
    )
    SELECT CAST(SUM(price_cents) AS BIGINT)/100.0/7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM brand_li JOIN avg_qty ON l_partkey = a_partkey
    WHERE l_quantity < 0.2 * avg_q
    """,
)
def q70_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity order revenue for one brand,
    decorrelated — the per-part AVG(l_quantity) correlated scalar becomes
    one aggregate joined back to the same filtered frame. Quantities are
    integral doubles, so SUM/COUNT is exact and the 0.2× threshold
    compare is engine-identical. Plan: part(brand) prunes lineitem via a
    semi-reduction first; the avg frame is per-partkey (small) and
    broadcast back — the fact side shuffles once on partkey."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select(
            "l_partkey",
            "l_quantity",
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("price_cents"),
        )
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_q")
    )
    small = li.join(
        F.broadcast(avg_q), F.col("l_partkey") == F.col("a_partkey")
    ).where(F.col("l_quantity") < 0.2 * F.col("avg_q"))
    return small.agg(
        (F.sum("price_cents").cast("bigint") / 100.0 / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q71_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM(c) AS BIGINT)/100.0 AS revenue, COUNT(*) AS n_items
    FROM (
      SELECT {_CENTS} AS c
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)
    )
    """,
)
def q71_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicates across
    a join. The per-side implications of the OR are extracted manually —
    part scans only `p_brand IN (…) AND p_size ≤ 15` rows and lineitem
    only `l_quantity ≤ 30` rows (the CNF residuals Catalyst won't derive
    across a join on its own) — then the exact disjunction re-applies
    after the join. At 100 TB the derived scan filters are the difference
    between reading 3 brands and reading the whole part table."""
    part = (
        _t(spark, sf_dir, "part")
        .where(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
        .select("l_partkey", "l_quantity", _cents().alias("c"))
    )
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.where(cond).agg(
        (F.sum("c").cast("bigint") / 100.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q72_cust_order_histogram",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q72_cust_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution — a LEFT OUTER join with
    the filter in the JOIN CONDITION (not a WHERE, which would turn the
    outer join inner and drop zero-order customers), then a two-level
    aggregation. The second agg's input is one row per customer — tiny —
    so the expensive shuffle happens exactly once, on custkey."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q73_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size <= 10 AND p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q73_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group with a
    NOT IN supplier exclusion. The exclusion list is tiny and its key
    (s_suppkey) is non-nullable, so the null-aware NOT IN semantics
    reduce to a broadcast left-anti join — the form that scales (a true
    null-aware anti join degenerates to BNLJ when the column is
    nullable; keep exclusion keys NOT NULL at 100 TB). COUNT(DISTINCT)
    expands to a two-phase aggregate on (group, suppkey) — no row-set
    materialization."""
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10)
        & (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("bad_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q74_returned_top_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM({_CENTS}) AS BIGINT)/100.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q74_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in one
    quarter. The quarter filter prunes orders at the scan; lineitem joins
    the pruned orders (shuffle on orderkey), customer joins on custkey,
    nation broadcasts; the final ORDER BY+LIMIT is a TakeOrdered — no
    global sort. Ties broken by custkey so the LIMIT edge is stable."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", _cents().alias("c"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (F.sum("c").cast("bigint") / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q75_big_quantity_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT o.o_orderkey, c.c_name,
           CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)/100.0 AS total_price,
           SUM(l.l_quantity) AS total_qty
    FROM orders o
    JOIN big     ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3
    """,
)
def q75_big_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold —
    a semi-join against a HAVING aggregate. The qualifying-key set is
    tiny (heavy-hitter orders), so it broadcasts back onto orders and
    lineitem; lineitem is scanned twice but shuffled only once (the
    HAVING aggregate), since the second pass joins the broadcast key set
    map-side. Quantities are integral doubles → exact sums."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.withColumnRenamed("l_orderkey", "lk")
        .join(F.broadcast(big), F.col("lk") == F.col("l_orderkey"))
        .join(orders, F.col("lk") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "o_orderkey",
            "c_name",
            (F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint") / 100.0).alias(
                "total_price"
            ),
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@query(
    "q76_discount_band_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice*l_discount*10000 + 0.5) AS BIGINT))
                AS BIGINT)/10000.0 AS revenue_delta,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q76_discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan conditional revenue — every predicate
    (date range, discount band, quantity cap) reaches the parquet scan as
    a pushed filter, and the whole query is one codegen'd scan+agg with
    no shuffle beyond the final single-row reduce."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    units = F.floor(F.col("l_extendedprice") * F.col("l_discount") * 10000 + 0.5).cast(
        "bigint"
    )
    return li.agg(
        (F.sum(units).cast("bigint") / 10000.0).alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "d13_incremental_dedup",
    oracle="""
    WITH fps AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             doc_id, source
      FROM documents
    ), corpus AS (
      SELECT DISTINCT fp FROM fps WHERE source <> 'src3'
    ), fresh AS (
      SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
      FROM fps WHERE source = 'src3' GROUP BY fp
    )
    SELECT f.fp, f.keep_id, f.n_copies
    FROM fresh f LEFT JOIN corpus c ON f.fp = c.fp
    WHERE c.fp IS NULL
    """,
)
def d13_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (snapshot-vs-corpus) exact dedup
    (dedup.incremental_dedup): treat source=src3 as the newly crawled
    batch and every other source as the accumulated corpus; the batch
    self-dedups map-side first, then anti-joins the corpus fingerprint
    set on fp."""
    docs = _t(spark, sf_dir, "documents")
    new_batch = docs.where(F.col("source") == "src3")
    corpus = docs.where(F.col("source") != "src3").select(
        dedup.fingerprint_md5(F.col("text")).alias("fp")
    )
    return dedup.incremental_dedup(new_batch, corpus)


@query(
    "st11_late_data_watermark",
    oracle="""
    WITH p1 AS (
      SELECT ts, event_type FROM events WHERE event_id % 4 != 0
    ), p2 AS (
      SELECT ts, event_type FROM events WHERE event_id % 4 = 0
    ), wm1 AS (
      SELECT max(ts) - INTERVAL 6 HOUR AS w FROM p1
    ), wmf AS (
      SELECT max(ts) - INTERVAL 6 HOUR AS w FROM events
    ), kept AS (
      SELECT ts, event_type FROM p1
      UNION ALL
      SELECT p2.ts, p2.event_type FROM p2, wm1 WHERE p2.ts >= wm1.w
    )
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type, COUNT(*) AS n
    FROM kept, wmf
    WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= wmf.w
    GROUP BY 1, 2
    """,
)
def st11_late_data_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data policy (streaming/collect_stream.py
    run_late_arrival_replay): a backfill run recovering from checkpoint
    loses its rows strictly older than the checkpointed watermark
    (``ts < wm`` dropped, equality kept — verified at the boundary in
    tests/test_streaming.py), and the trailing open day is withheld from
    the append sink (windows emit once ``end <= wm``). The oracle replays
    both rules in SQL from the deterministic phase split — a
    hash-verified statement of Spark's watermark semantics."""
    from logverzcore_spark.streaming.collect_stream import run_late_arrival_replay

    return run_late_arrival_replay(spark, os.path.join(sf_dir, "events.parquet"))


@query(
    "t13_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
    ), tot AS (
      SELECT SUM(cnt) AS total FROM freq
    )
    SELECT doc_id, COUNT(*) AS n_toks,
           CAST(SUM(CAST(FLOOR((log10(CAST(cnt AS DOUBLE))
                                - log10(CAST(total AS DOUBLE))) * 1000000 + 0.5)
                         AS BIGINT)) AS BIGINT) / 1000000.0 / COUNT(*)
             AS avg_logprob
    FROM tok JOIN freq USING (tok), tot
    GROUP BY doc_id
    """,
)
def t13_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: mean log10 token probability
    per document — the classic perplexity-proxy filter for training-data
    curation. The corpus-wide frequency table is tiny relative to the
    corpus (vocab ≪ tokens) and broadcasts; per-token log-probs are
    quantized to 1e-6 BEFORE summation so Spark's partial aggregation
    order cannot perturb the float sum (log10 of exact integers is the
    only libm call, identical input in both engines). One shuffle total:
    the per-doc groupBy."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    tok = docs.select("doc_id", F.explode("toks").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    q = F.floor(
        (F.log10(F.col("cnt").cast("double")) - F.log10(F.col("total").cast("double")))
        * 1000000
        + 0.5
    ).cast("bigint")
    return (
        tok.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            (F.sum(q).cast("bigint") / 1000000.0 / F.count(F.lit(1))).alias("avg_logprob"),
        )
    )


@query(
    "t14_segment_dedup",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), seg AS (
      SELECT t.doc_id, u.i AS seg_idx,
             md5(array_to_string(t.toks[(u.i*10+1):(u.i*10+10)], ' ')) AS fp
      FROM tok t, UNNEST(range(CAST(floor(len(t.toks)/10) AS BIGINT))) AS u(i)
    ), cnt AS (
      SELECT fp, COUNT(*) AS n_occ FROM seg GROUP BY fp
    ), per AS (
      SELECT s.doc_id, COUNT(*) AS n_segments,
             SUM(CASE WHEN c.n_occ > 1 THEN 1 ELSE 0 END) AS n_dup
      FROM seg s JOIN cnt c USING (fp) GROUP BY s.doc_id
    )
    SELECT t.doc_id, len(t.toks) AS n_tokens,
           COALESCE(p.n_segments, 0) AS n_segments,
           COALESCE(p.n_dup, 0) AS n_dup_segments,
           ROUND(CASE WHEN COALESCE(p.n_segments, 0) > 0
                      THEN CAST(COALESCE(p.n_dup, 0) AS DOUBLE) / p.n_segments
                      ELSE 0.0 END, 4) AS dup_segment_frac,
           len(t.toks) - COALESCE(p.n_dup, 0) * 10 AS n_tokens_clean
    FROM tok t LEFT JOIN per p USING (doc_id)
    """,
)
def t14_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-segment scrub (text.dedup_segments): the
    C4-style "drop any line seen more than once in the corpus" rule over
    10-token segments. One shuffle for corpus segment counts; the
    duplicated-fingerprint set broadcasts back (its size tracks actual
    boilerplate, not corpus size)."""
    docs = _t(spark, sf_dir, "documents")
    return text.dedup_segments(docs, seg_tokens=10)


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


@query(
    "q80_excess_volume_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small %'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) > 4000
    )
    """,
)
def q80_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers that moved excess volume of a part
    family in one year. The inner block is a (suppkey, partkey) grain
    aggregate over a name+date-pruned lineitem⋈part (part side filtered
    BEFORE the join and broadcast); the outer IN is a LEFT SEMI join on
    the distinct suppkey set — no decorrelated subquery re-evaluation,
    one pass over the pruned fact."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_suppkey", "l_partkey", "l_quantity")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("small %")).select("p_partkey")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("bigint")).alias("qty_units"))
        .where(F.col("qty_units") > 4000)
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "st13_sketch_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(DISTINCT user_id) AS est_users, COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def st13_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained distinct-user rollup
    (streaming/rollup.py::incremental_user_sketch_rollup): micro-batches
    fold per-day HLL sketches into a stored sketch table via
    ``hll_union_agg`` — the mergeable form a 100 TB pipeline must store,
    because raw distinct counts can't absorb late batches. The final
    per-day estimates equal exact COUNT(DISTINCT) at this cardinality
    (HLL exact coupon regime → hash-verified); the rollup table is
    O(#days) rows regardless of stream volume."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.collect_stream import _events_stream
    from logverzcore_spark.streaming.rollup import incremental_user_sketch_rollup

    table = f"st13_skrollup_{_uuid.uuid4().hex[:8]}"
    stream = _events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    q = incremental_user_sketch_rollup(
        spark, stream, table,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
    )
    q.awaitTermination()
    out = spark.table(table).select(
        F.date_format("day_ts", "yyyy-MM-dd").alias("day"),
        F.hll_sketch_estimate("user_sk").cast("bigint").alias("est_users"),
        "n_events",
    )
    out = out.localCheckpoint(eager=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_meta")
    return out


@query(
    "q81_late_ship_priority",
    oracle="""
    SELECT l_returnflag,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q81_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact⋈fact join with conditional CASE counts.
    (This testdata's lineitem has no shipmode/receiptdate, so 'late' is
    l_shipdate > o_orderdate + 60 days and the group key is
    l_returnflag — same two-table join + pivoted-CASE-count plan.) The
    lineitem date band is pushed to the scan; orders arrives pre-pruned
    to its two needed columns; the CASE counts partial-aggregate
    map-side so the only full-width shuffle is the o_orderkey join."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q82_important_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
               AS rev_cents
      FROM lineitem GROUP BY l_partkey
    ), total AS (
      SELECT SUM(rev_cents) AS total_cents FROM rev
    )
    SELECT p_partkey, p_name,
           CAST(rev_cents AS BIGINT) / 100.0 AS part_revenue
    FROM rev JOIN part ON l_partkey = p_partkey, total
    WHERE rev_cents > total_cents * 0.00055
    """,
)
def q82_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group aggregate filtered against a scalar
    fraction of the global total (HAVING SUM(v) > SUM(ALL v) * f). One
    pass builds the per-part revenue; the global total is a second
    aggregation OF THE PARTIAL RESULT (25k rows at SF1 — never a second
    fact scan) broadcast back as a one-row cross join; part names join
    broadcast. At 100 TB the fact is read exactly once."""
    li = _t(spark, sf_dir, "lineitem")
    disc_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
    rev = (
        li.groupBy("l_partkey")
        .agg(F.sum(disc_cents).cast("bigint").alias("rev_cents"))
    )
    rev = rev.localCheckpoint(eager=False)  # reuse: per-part agg feeds both sides
    total = rev.agg(F.sum("rev_cents").alias("total_cents"))
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        rev.join(F.broadcast(total))
        .where(F.col("rev_cents") > F.col("total_cents") * 0.00055)
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            (F.col("rev_cents") / F.lit(100.0)).alias("part_revenue"),
        )
    )


@query(
    "m06_cdc_neardup",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, length(text) AS sz FROM documents
    ), pos AS (
      SELECT doc_id, text, sz, UNNEST(range(1, GREATEST(1, sz - 16 + 1) + 1)) AS p
      FROM d
    ), bounds AS (
      SELECT doc_id, text, sz, p FROM pos
      WHERE p = 1
         OR substring(md5(substring(text, CAST(p AS BIGINT), 16)), 1, 2) = 'ff'
    ), chunks AS (
      SELECT doc_id,
             md5(substring(text, CAST(p AS BIGINT),
                 CAST(COALESCE(LEAD(p) OVER (PARTITION BY doc_id ORDER BY p),
                               sz + 1) - p AS BIGINT))) AS chunk_md5
      FROM bounds
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(*) AS n_shared_chunks
    FROM chunks a JOIN chunks b
      ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
)
def m06_cdc_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free binary near-dup via content-defined chunking
    (multimodal.cdc_neardup_pairs): rolling-window hashes open chunk
    boundaries that re-synchronize across byte insertions, so spliced /
    re-muxed payload variants still share their unchanged chunks —
    unlike fixed-position banding. Candidates come from a bucketed
    equi-join on 16-byte chunk hashes (payload bytes pruned first;
    never all-pairs). The oracle replays the identical boundary rule
    (char slicing == byte slicing: the corpus is ASCII)."""
    from logverzcore_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return multimodal.cdc_neardup_pairs(docs, min_shared_chunks=2)


def _s07_oracle(dim: int = 64, n_cells: int = 16, per_cell: int = 5) -> str:
    cents = similarity.lcg_centroids(dim, n_cells)
    values = ",\n      ".join(
        f"({ci}, {_sql_double_array(row)})" for ci, row in enumerate(cents)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cents(cell, cvec) AS (VALUES
      {values}
    ), sims AS (
      SELECT v.vec_id, c.cell, list_dot_product(v.e, c.cvec) AS sim
      FROM v CROSS JOIN cents c
    ), c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims
      ) WHERE rn = 1
    ), picked AS (
      SELECT cell, vec_id,
             row_number() OVER (PARTITION BY cell
                                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS pick_rank
      FROM c_assign
    )
    SELECT CAST(cell AS INTEGER) AS cell, vec_id,
           CAST(pick_rank AS INTEGER) AS pick_rank
    FROM picked WHERE pick_rank <= {per_cell}
    """


@query("s07_cluster_sample", oracle=_s07_oracle())
def s07_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced subset selection
    (similarity.cluster_balanced_sample): nearest-centroid assignment
    (portable LCG centroids) + per-cluster deterministic hash pick —
    the diversity-preserving downsample a curation pipeline runs where a
    global random sample would oversample dense embedding modes. Hash-
    verified: the oracle replays assignment AND pick order literally."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cluster_balanced_sample(
        emb, per_cell=5, centroids=similarity.lcg_centroids(64, 16)
    )


@query(
    "t15_shard_manifest",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hx
      FROM documents
    ), a AS (
      SELECT doc_id, n_chars,
             ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 16
               AS shard
      FROM h
    )
    SELECT CAST(shard AS INTEGER) AS shard, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM a GROUP BY shard
    """,
)
def t15_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic export sharding + manifest (export.shard_manifest):
    md5-of-id shard assignment (stable across engines, runs, and
    re-exports — trainer resume offsets survive a re-run) and the
    per-shard manifest a training job validates against. The write path
    (export.export_shards, pytest-covered) repartitions on the shard
    column so each shard directory is written by its owning tasks."""
    from logverzcore_spark import export

    docs = _t(spark, sf_dir, "documents")
    return export.shard_manifest(docs)


@query(
    "st14_stream_shard_export",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hx
      FROM documents
    ), a AS (
      SELECT doc_id, n_chars,
             ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 16
               AS shard
      FROM h
    )
    SELECT CAST(shard AS INTEGER) AS shard, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM a GROUP BY shard
    """,
)
def st14_stream_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming shard export (export.export_shards_stream): the
    documents source drains through the parquet streaming sink into the
    same ``shard=K/`` layout as the batch exporter, exactly-once via the
    sink's ``_spark_metadata`` commit log. Hash-verified equivalence to
    the BATCH manifest oracle proves the property that matters: because
    shards hash the document id, batch and streaming exports are
    interchangeable — micro-batch boundaries and arrival order cannot
    move a document between shards. The returned manifest is computed
    from the files read back, not from the plan."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark import export

    stream = _docs_stream(spark, sf_dir)
    run_id = _uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"st14_{run_id}_")
    manifest = export.export_shards_stream(
        spark,
        stream,
        out_dir=os.path.join(base, "shards"),
        checkpoint_dir=os.path.join(base, "ck"),
    )
    return manifest.localCheckpoint(eager=True)


@query(
    "t16_curated_corpus",
    oracle="""
    WITH tk AS (
      SELECT doc_id, text, source, n_chars,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), feat AS (
      SELECT doc_id,
             len(toks) AS n_toks,
             len(list_filter(list_transform(toks, x -> lower(x)),
                 x -> x IN ('the','a','an','and','or','of','to','in','is'))) AS n_stop,
             len(list_distinct(list_transform(toks, x -> lower(x)))) AS n_distinct
      FROM tk
    ), quality AS (
      SELECT t.doc_id FROM tk t JOIN feat f USING (doc_id)
      WHERE t.source <> 'src0'
        AND f.n_toks BETWEEN 10 AND 1000
        AND ROUND(f.n_stop / greatest(f.n_toks, 1), 4) >= 0.05
        AND ROUND(1.0 - f.n_distinct / greatest(f.n_toks, 1), 4) <= 0.6
    ), keep1 AS (
      SELECT MIN(t.doc_id) AS doc_id
      FROM tk t JOIN quality q USING (doc_id)
      GROUP BY md5(regexp_replace(lower(trim(t.text)), '\\s+', ' ', 'g'))
    ), sh3 AS (
      SELECT t.doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(t.toks)-2, 0)+1),
                    i -> t.toks[i] || ' ' || t.toks[i+1] || ' ' || t.toks[i+2]))) AS sh
      FROM tk t JOIN keep1 k USING (doc_id)
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM sh3 GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh3 a JOIN sh3 b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id2 FROM inter
      JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
      WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= 0.7
    ), keep2 AS (
      SELECT doc_id FROM keep1 WHERE doc_id NOT IN (SELECT id2 FROM pairs)
    ), sh5 AS (
      SELECT t.doc_id, t.source,
             unnest(list_distinct(list_transform(range(1, greatest(len(t.toks)-4, 0)+1),
                    i -> t.toks[i] || ' ' || t.toks[i+1] || ' ' || t.toks[i+2]
                         || ' ' || t.toks[i+3] || ' ' || t.toks[i+4]))) AS sh
      FROM tk t
    ), bench AS (
      SELECT DISTINCT sh FROM sh5 WHERE source = 'src0'
    ), contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM sh5 s JOIN keep2 k USING (doc_id) JOIN bench b ON s.sh = b.sh
    ), final AS (
      SELECT doc_id FROM keep2
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT d.doc_id,
           CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                ELSE 'test' END AS split,
           d.source, d.n_chars
    FROM documents d JOIN final f USING (doc_id)
    """,
)
def t16_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline (pipeline.curate): quality gate →
    exact keep-first dedup → MinHash-LSH fuzzy dedup (exact-Jaccard
    verified) → benchmark decontamination (source=src0 as the held-out
    suite) → deterministic split. One lazy Spark plan end to end; the
    oracle replays every stage in SQL, so the hash match certifies the
    COMPOSITION, not just the stages."""
    from logverzcore_spark.pipeline import curate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0")
    train = docs.where(F.col("source") != "src0")
    return curate(train, benchmark=bench)


@query(
    "q83_listagg_battery",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           string_agg(DISTINCT CAST(o_custkey % 7 AS VARCHAR), ','
                      ORDER BY CAST(o_custkey % 7 AS VARCHAR))
             AS custkey_mod_classes
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q83_listagg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (LISTAGG/STRING_AGG shape): DISTINCT +
    deterministic ORDER BY inside the aggregate — expressed as
    ``collect_set`` → ``array_sort`` → ``array_join`` so the sort is
    per-GROUP (bounded by the distinct-value domain), never a global
    sort; the set collapse is map-side combined like any hash
    aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def sorted_agg(col, sep):
        return F.array_join(F.array_sort(F.collect_set(col)), sep)

    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            sorted_agg(F.col("o_orderpriority"), "|").alias("priorities"),
            F.count_distinct("o_orderpriority").alias("n_priorities"),
            sorted_agg((F.col("o_custkey") % 7).cast("string"), ",").alias(
                "custkey_mod_classes"
            ),
        )
    )


@query(
    "q84_fuzzy_supplier_match",
    oracle="""
    WITH s AS (
      SELECT s_suppkey, s_name, length(s_name) AS ln FROM supplier
    ), seg AS (
      SELECT s_suppkey, s_name, ln, i.idx,
             substring(s_name,
                       CAST(FLOOR(ln * i.idx / 2) AS BIGINT) + 1,
                       CAST(FLOOR(ln * (i.idx + 1) / 2) AS BIGINT)
                         - CAST(FLOOR(ln * i.idx / 2) AS BIGINT)) AS seg
      FROM s CROSS JOIN (SELECT UNNEST([0, 1]) AS idx) i
    ), cand AS (
      SELECT DISTINCT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
                      a.s_name AS n1, b.s_name AS n2
      FROM seg a JOIN seg b
        ON a.idx = b.idx AND a.ln = b.ln AND a.seg = b.seg
       AND a.s_suppkey < b.s_suppkey
    )
    SELECT id_a, id_b, CAST(levenshtein(n1, n2) AS INTEGER) AS distance
    FROM cand WHERE levenshtein(n1, n2) <= 1
    """,
)
def q84_fuzzy_supplier_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-matching join (fuzzyjoin.edit_distance_pairs):
    supplier-name pairs within 1 substitution, found by pigeonhole
    segment blocking (2 segments — a distance-1 pair must share one
    exactly) + codegen'd Levenshtein verification. Never all-pairs by
    construction, though the shared 'Supplier#' prefix makes segment 0
    a degenerate block here — the documented skew caveat; segment 1
    (the digit run) carries the selectivity."""
    from logverzcore_spark.operators import fuzzyjoin

    sup = _t(spark, sf_dir, "supplier")
    return fuzzyjoin.edit_distance_pairs(sup, "s_name", "s_suppkey", max_distance=1)


@query(
    "t17_exact_sample",
    oracle="""
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents
    ) WHERE rk <= 100
    """,
)
def t17_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size deterministic sample: the n smallest md5(id) values —
    eval-set construction needs EXACTLY n rows (hash-threshold sampling,
    t09, only approximates the size) chosen stably across engines, runs,
    and cluster sizes. Plan: TakeOrderedAndProject — each partition
    ships only its local top-n hash values to the driver, never a global
    sort; at 100 TB the cross-partition traffic is n×(hash+id) per
    partition, independent of corpus size."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", "source", "n_chars",
            F.md5(F.col("doc_id").cast("string")).alias("_h"),
        )
        .orderBy("_h", "doc_id")
        .limit(100)
        .drop("_h")
    )


@query(
    "q85_rolling_distinct_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM du
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           COUNT(DISTINCT u.user_id) AS users_7d
    FROM days d JOIN du u
      ON u.day > d.day - INTERVAL 7 DAY AND u.day <= d.day
    GROUP BY d.day
    """,
)
def q85_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day — the window shape SQL
    engines can't express directly (no DISTINCT inside a window
    function). Scalable form: dedup once to (day, user) grain — the ONE
    shuffle over event volume — then range-join that small frame against
    the broadcast day spine and count distinct per day. Work after the
    dedup is (days × active-users/day), independent of raw event count;
    the naive collect_set-over-range-window alternative re-buffers every
    user id per row."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct().select(F.col("day").alias("d"))
    return (
        du.join(
            F.broadcast(days),
            (F.col("day") > F.col("d") - F.expr("INTERVAL 7 DAYS"))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("users_7d"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "users_7d")
    )


@query(
    "st15_topk_rollup",
    oracle="""
    SELECT user_id, n_events, CAST(rank AS INTEGER) AS rank FROM (
      SELECT user_id, COUNT(*) AS n_events,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rank
      FROM events GROUP BY user_id
    ) WHERE rank <= 10
    """,
)
def st15_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained heavy hitters
    (streaming/rollup.incremental_topk_rollup): micro-batches accumulate
    map-side ``approx_top_k`` summaries and combine them into a ONE-ROW
    state table — fixed-size state regardless of stream volume or key
    domain, where exact streaming GROUP BY top-k needs a state entry per
    key. Below sketch capacity the estimate is exact (hash-verified
    against the batch top-10); the deterministic re-rank happens on the
    ≤1000-entry summary."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.collect_stream import _events_stream
    from logverzcore_spark.streaming.rollup import incremental_topk_rollup

    table = f"st15_topk_{_uuid.uuid4().hex[:8]}"
    stream = _events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    q = incremental_topk_rollup(
        spark, stream, table, key_col="user_id",
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
    )
    q.awaitTermination()
    items = (
        spark.table(table)
        .select(F.explode(F.expr("approx_top_k_estimate(topk_sk, 150)")).alias("e"))
        .select(F.col("e.item").alias("user_id"), F.col("e.count").alias("n_events"))
    )
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    out = (
        items.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("user_id", "n_events", F.col("rank").cast("int").alias("rank"))
    )
    out = out.localCheckpoint(eager=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_meta")
    return out


@query(
    "q86_column_profile",
    oracle="""
    SELECT 'l_quantity' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_quantity) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
           COUNT(DISTINCT l_linenumber),
           CAST(MIN(l_linenumber) AS DOUBLE), CAST(MAX(l_linenumber) AS DOUBLE)
    FROM lineitem
    """,
)
def q86_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the admin describeTable companion): per-column
    row/null/distinct counts and value range, computed in ONE scan —
    each column's stats are independent aggregates of the same pass, and
    Spark plans the multi-DISTINCT via a single Expand (no per-column
    re-scan, which is what a naive profile loop costs at 100 TB; swap
    COUNT DISTINCT for approx_count_distinct there to also drop the
    Expand)."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c in ("l_quantity", "l_discount", "l_linenumber"):
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
        )
        for c in ("l_quantity", "l_discount", "l_linenumber")
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select(
        "p.col", "p.n_rows", "p.n_nulls", "p.n_distinct", "p.min_v", "p.max_v"
    )


@query(
    "q87_regression_battery",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_pop(l_quantity, l_discount), 6) AS covar_qty_disc,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope_price_on_qty,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q87_regression_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery: correlation, population covariance,
    and OLS slope/intercept per group — single-pass co-moment aggregates
    (Welford-style mergeable state, so they partial-aggregate map-side
    like any SUM; no second centering pass over the fact table)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope_price_on_qty"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
        F.regr_count("l_extendedprice", "l_quantity").cast("bigint").alias("n_pairs"),
    )


@query(
    "q88_price_histogram",
    oracle="""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT), 9) AS bucket
      FROM orders
    )
    SELECT bucket,
           CAST(bucket * 50000 AS DOUBLE) AS lo,
           CAST((bucket + 1) * 50000 AS DOUBLE) AS hi,
           COUNT(*) AS n_orders
    FROM b GROUP BY bucket
    """,
)
def q88_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: fixed-width bucket assignment is a pure
    projection (floor division, top bucket clamped), so the histogram is
    one map-side-combined aggregate over ≤10 groups — the constant-cost
    distribution profile a UI draws without pulling data (contrast exact
    percentiles, which need a sort or KLL sketch). Fixed literal edges
    (not data-derived min/max) keep it single-pass and
    engine-replayable."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast("bigint")
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * 50000).cast("double").alias("lo"),
            ((F.col("bucket") + 1) * 50000).cast("double").alias("hi"),
            "n_orders",
        )
    )


@query(
    "t18_stratified_sample",
    oracle="""
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
)
def t18_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified exact sampling: exactly 20 docs PER SOURCE, chosen by
    hash order — eval sets need per-stratum exactness (a proportional
    random sample leaves small strata empty) and engine/run stability.
    One shuffle on the stratum key; each window partition does
    stratum-local top-n work. Complements t17 (global exact) and t12
    (proportional mixture)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= 20)
        .drop("_rk")
    )


@query(
    "st16_streaming_curate",
    oracle="""
    WITH tk AS (
      SELECT doc_id, text, source, n_chars,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), feat AS (
      SELECT doc_id,
             len(toks) AS n_toks,
             len(list_filter(list_transform(toks, x -> lower(x)),
                 x -> x IN ('the','a','an','and','or','of','to','in','is'))) AS n_stop,
             len(list_distinct(list_transform(toks, x -> lower(x)))) AS n_distinct
      FROM tk
    ), quality AS (
      SELECT t.doc_id FROM tk t JOIN feat f USING (doc_id)
      WHERE f.n_toks BETWEEN 10 AND 1000
        AND ROUND(f.n_stop / greatest(f.n_toks, 1), 4) >= 0.05
        AND ROUND(1.0 - f.n_distinct / greatest(f.n_toks, 1), 4) <= 0.6
    ), keep1 AS (
      SELECT MIN(t.doc_id) AS doc_id
      FROM tk t JOIN quality q USING (doc_id)
      GROUP BY md5(regexp_replace(lower(trim(t.text)), '\\s+', ' ', 'g'))
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d JOIN keep1 k USING (doc_id)
    """,
)
def st16_streaming_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming curation (stream_dedup.curate_stream): the quality gate
    runs as per-row projections ON the stream, and exact dedup runs as
    the fingerprint-state fold — the committed table equals the batch
    pipeline's first two stages over the same files, which the oracle
    replays (quality rules + keep-first fingerprint dedup). Per-row
    predicates are batch-boundary-invariant by construction; the dedup
    equivalence is the st04 family's property."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.stream_dedup import curate_stream

    run_id = _uuid.uuid4().hex[:8]
    table = f"st16_cur_{run_id}"
    stream = _docs_stream(spark, sf_dir)
    q = curate_stream(
        spark, stream, table,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
    )
    q.awaitTermination()
    out = spark.table(table).select("doc_id", "source", "n_chars")
    out = out.localCheckpoint(eager=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_fingerprints")
    return out


@query(
    "q89_snapshot_diff",
    oracle="""
    WITH bounds AS (
      SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
    ), a AS (
      SELECT user_id, COUNT(*) AS n FROM events, bounds
      WHERE epoch_us(ts) < mid GROUP BY user_id
    ), b AS (
      SELECT user_id, COUNT(*) AS n FROM events, bounds
      WHERE epoch_us(ts) >= mid GROUP BY user_id
    )
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           CASE WHEN a.user_id IS NULL THEN 'added'
                WHEN b.user_id IS NULL THEN 'removed'
                WHEN a.n <> b.n THEN 'changed'
                ELSE 'same' END AS status,
           a.n AS n_before, b.n AS n_after
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
)
def q89_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot change detection: the added/removed/changed/same
    classification between two dataset versions (here: per-user activity
    in the first vs second half of the event history) — the audit query
    a pipeline runs after every re-crawl or backfill. One aggregation
    per snapshot at the compare grain, then a single full-outer join on
    the key; at 100 TB both sides pre-aggregate to the key grain BEFORE
    the join, so the shuffle carries one row per key, not raw events,
    and bucketing both snapshot tables by key removes it entirely."""
    ev = _t(spark, sf_dir, "events").withColumn("_us", F.unix_micros("ts"))
    # Integer-micros midpoint: interval/2 rounds differently per engine.
    bounds = ev.agg(
        F.floor((F.min("_us") + F.max("_us")) / 2).cast("long").alias("mid")
    )
    with_mid = ev.join(F.broadcast(bounds))
    a = (
        with_mid.where(F.col("_us") < F.col("mid"))
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("user_id").alias("ua"), F.col("n").alias("n_before"))
    )
    b = (
        with_mid.where(F.col("_us") >= F.col("mid"))
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("user_id").alias("ub"), F.col("n").alias("n_after"))
    )
    joined = a.join(b, a.ua == b.ub, "full_outer")
    status = (
        F.when(F.col("ua").isNull(), F.lit("added"))
        .when(F.col("ub").isNull(), F.lit("removed"))
        .when(F.col("n_before") != F.col("n_after"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return joined.select(
        F.coalesce("ua", "ub").alias("user_id"),
        status.alias("status"),
        "n_before",
        "n_after",
    )


@query(
    "m07_cdc_dedup_corpus",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT doc_id, text, length(text) AS sz FROM documents
    ), pos AS (
      SELECT doc_id, text, sz, UNNEST(range(1, GREATEST(1, sz - 16 + 1) + 1)) AS p
      FROM d
    ), bounds AS (
      SELECT doc_id, text, sz, p FROM pos
      WHERE p = 1
         OR substring(md5(substring(text, CAST(p AS BIGINT), 16)), 1, 2) = 'ff'
    ), chunks AS (
      SELECT doc_id,
             md5(substring(text, CAST(p AS BIGINT),
                 CAST(COALESCE(LEAD(p) OVER (PARTITION BY doc_id ORDER BY p),
                               sz + 1) - p AS BIGINT))) AS chunk_md5
      FROM bounds
    ), pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2
      FROM chunks a JOIN chunks b
        ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ), edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ), labels AS (
      SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
      FROM d LEFT JOIN reach r ON r.src = d.doc_id
      GROUP BY d.doc_id
    )
    SELECT dd.doc_id, dd.source, dd.n_chars
    FROM documents dd JOIN labels l ON dd.doc_id = l.doc_id
    WHERE l.cluster_id = dd.doc_id
    """,
)
def m07_cdc_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary dedup MATERIALIZED (the media analog of d08): CDC chunk
    pairs → connected components (transitivity: a re-muxed variant of a
    spliced variant collapses with the original even if the end-to-end
    pair misses the threshold) → keep each cluster's min-id
    representative, returning the cleaned corpus. Decode-free end to
    end."""
    from logverzcore_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    pairs = multimodal.cdc_neardup_pairs(payloads, min_shared_chunks=2).select(
        F.col("id_a").alias("id1"), F.col("id_b").alias("id2")
    )
    clusters = dedup.dup_clusters(payloads, pairs)
    reps = clusters.where(F.col("is_rep")).select("doc_id")
    return docs.join(reps, "doc_id", "left_semi").select("doc_id", "source", "n_chars")


def _hex_digits_to_int_sql(expr: str, n: int) -> str:
    """SQL expression: first ``n`` hex digits of ``expr`` as an integer
    (DuckDB has no hex-parse scalar; strpos over the alphabet replays
    Spark's conv() exactly)."""
    terms = [
        f"(strpos('0123456789abcdef', substring({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + "\n               + ".join(terms) + ")"


@query(
    "t19_weighted_sample",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, source, n_chars,
             ({_hex_digits_to_int_sql("md5(CAST(doc_id AS VARCHAR))", 8)} + 1.0)
               / 4294967297.0 AS unit
      FROM documents
    ), keyed AS (
      SELECT doc_id, source, n_chars,
             -ln(unit) / n_chars AS es_key
      FROM u
    )
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (ORDER BY es_key, doc_id) AS rk
      FROM keyed
    ) WHERE rk <= 50
    """,
)
def t19_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): each doc draws a uniform from its id hash and
    competes on key = -ln(u)/weight (weight = n_chars — longer docs
    proportionally likelier); the n smallest keys are the sample. All
    the properties of t17's exact sample (engine/run/cluster-size
    stable, exact size, TakeOrdered plan) plus weight-proportional
    inclusion — the curation op for quality- or length-weighted subset
    selection. The uniform is (hash32+1)/(2^32+1) ∈ (0,1): exactly
    representable inputs, so both engines compute identical IEEE
    doubles."""
    docs = _t(spark, sf_dir, "documents")
    unit = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
         .cast("double") + 1.0)
        / 4294967297.0
    )
    es_key = -F.log(unit) / F.col("n_chars")
    return (
        docs.select("doc_id", "source", "n_chars", es_key.alias("_k"))
        .orderBy("_k", "doc_id")
        .limit(50)
        .drop("_k")
    )


@query(
    "q90_modern_sql",
    oracle="""
    WITH base AS (
      SELECT * EXCLUDE (o_orderkey, o_custkey) FROM orders
      WHERE o_orderstatus = 'F'
    )
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             / 100.0 AS revenue,
           COUNT(*) AS n
    FROM base GROUP BY ALL
    """,
)
def q90_modern_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL ergonomics through the raw-SQL surface: ``SELECT *
    EXCEPT(...)`` (column pruning without naming survivors — Catalyst
    still prunes the scan to what's referenced) and ``GROUP BY ALL``
    (keys inferred from the non-aggregate select list). Run as a SQL
    string — the shape interactive users actually type — not DataFrame
    calls."""
    ev = _t(spark, sf_dir, "orders")
    ev.createOrReplaceTempView("q90_orders")
    return spark.sql(
        """
        WITH base AS (
          SELECT * EXCEPT (o_orderkey, o_custkey) FROM q90_orders
          WHERE o_orderstatus = 'F'
        )
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 / CAST(100 AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM base GROUP BY ALL
        """
    )


@query(
    "st17_watermarked_dedup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def st17_watermarked_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup
    (collect_stream.run_watermarked_dedup_counts):
    ``dropDuplicatesWithinWatermark`` expires dedup state once the
    watermark passes a key's event time + horizon — st04's unbounded
    form with the state-size contract a 100 TB stream actually needs.
    Horizon spans the test window → equals full-history dedup
    (hash-verified)."""
    from logverzcore_spark.streaming.collect_stream import (
        run_watermarked_dedup_counts,
    )

    return run_watermarked_dedup_counts(
        spark, os.path.join(sf_dir, "events.parquet")
    )


@query(
    "m08_audio_segments",
    oracle="""
    WITH pos AS (
      SELECT doc_id, text, i
      FROM documents, LATERAL (SELECT UNNEST(range(0, length(text))) AS i)
    ), vals AS (
      SELECT doc_id, CAST(i // 32 AS INTEGER) AS frame_idx,
             unicode(substr(text, CAST(i + 1 AS INTEGER), 1)) AS v
      FROM pos
    ), frames AS (
      SELECT doc_id, frame_idx,
             ROUND(SQRT(AVG(CAST(v AS DOUBLE) * v)), 6) AS rms
      FROM vals GROUP BY doc_id, frame_idx
    ), active AS (
      SELECT doc_id, frame_idx, rms,
             frame_idx - row_number() OVER (PARTITION BY doc_id
                                            ORDER BY frame_idx) AS grp
      FROM frames WHERE rms >= 100.0
    )
    SELECT doc_id,
           CAST(MIN(frame_idx) AS INTEGER) AS start_frame,
           CAST(MAX(frame_idx) AS INTEGER) AS end_frame,
           COUNT(*) AS n_frames,
           MAX(rms) AS peak_rms
    FROM active GROUP BY doc_id, grp
    HAVING COUNT(*) >= 2
    """,
)
def m08_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-style energy segmentation over the PCM featurizer's frames
    (m05): contiguous runs of frames with RMS ≥ threshold become
    segments — the gaps-and-islands pattern (island id = frame_idx −
    row_number per payload) that turns per-frame features into
    utterance/asset spans. One window pass over the FRAME table (already
    ~32× smaller than the payload bytes), then a map-side-combined
    groupBy; the payload bytes never reach the segmentation stages."""
    from logverzcore_spark.operators.multimodal import audio_frame_features

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frames = audio_frame_features(docs, payload_col="payload", id_col="doc_id")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    active = (
        frames.where(F.col("rms") >= 100.0)
        .withColumn("grp", F.col("frame_idx") - F.row_number().over(w))
    )
    return (
        active.groupBy("doc_id", "grp")
        .agg(
            F.min("frame_idx").cast("int").alias("start_frame"),
            F.max("frame_idx").cast("int").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.max("rms").alias("peak_rms"),
        )
        .where(F.col("n_frames") >= 2)
        .drop("grp")
    )


@query(
    "st18_sketch_rolling_distinct",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM du
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           COUNT(DISTINCT u.user_id) AS users_7d
    FROM days d JOIN du u
      ON u.day > d.day - INTERVAL 7 DAY AND u.day <= d.day
    GROUP BY d.day
    """,
)
def st18_sketch_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read side of the sketch rollup (st13), proving
    re-aggregatability: trailing-7-day distinct users computed by
    UNIONING the stored per-day HLL sketches (`hll_union_agg` over a
    range self-join of the O(#days) sketch table) — the raw event store
    is never rescanned, which is the entire point of storing sketches
    instead of counts. Matches q85's exact answer at this cardinality
    (sub-capacity regime → hash-verified); at higher cardinality the
    same query returns bounded estimates."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.collect_stream import _events_stream
    from logverzcore_spark.streaming.rollup import incremental_user_sketch_rollup

    table = f"st18_skroll_{_uuid.uuid4().hex[:8]}"
    stream = _events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    q = incremental_user_sketch_rollup(
        spark, stream, table,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
    )
    q.awaitTermination()
    sk = spark.table(table).select("day_ts", "user_sk")
    days = sk.select(F.col("day_ts").alias("d"))
    out = (
        sk.join(
            F.broadcast(days),
            (F.col("day_ts") > F.col("d") - F.expr("INTERVAL 7 DAYS"))
            & (F.col("day_ts") <= F.col("d")),
        )
        .groupBy("d")
        .agg(
            # allowDifferentLgConfigK: stored day rows may span an lgK
            # default upgrade (the fold persists mixed precisions by
            # design — rollup.py's make_sketch_fold), and a 7-day window
            # crossing the upgrade boundary must still union (downgrades
            # to the window's minimum lgK).
            F.hll_sketch_estimate(F.hll_union_agg(F.col("user_sk"), F.lit(True)))
            .cast("bigint")
            .alias("users_7d")
        )
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "users_7d")
    )
    out = out.localCheckpoint(eager=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_meta")
    return out


@query(
    "q91_integrity_audit",
    oracle="""
    SELECT 'orphan_lineitems' AS check_name,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS n_violations
    UNION ALL
    SELECT 'duplicate_order_pks',
           (SELECT COUNT(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'nonpositive_quantity',
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'discount_out_of_range',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 1)
    """,
)
def q91_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-validation battery — the post-ingest audit a pipeline runs
    before publishing a table: FK orphans (anti-join), duplicate primary
    keys (grouped HAVING), and domain-range checks (pushed scan
    predicates). Each check is an independent aggregate; the FK check is
    the only join and plans as a LEFT ANTI on the key — at 100 TB all
    checks share the fact scan budget, none is a cross join."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    orphans = check(
        "orphan_lineitems",
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti"),
    )
    dup_pks = check(
        "duplicate_order_pks",
        o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1),
    )
    nonpos = check("nonpositive_quantity", li.where(F.col("l_quantity") <= 0))
    disc_oob = check(
        "discount_out_of_range",
        li.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
    )
    return orphans.unionByName(dup_pks).unionByName(nonpos).unionByName(disc_oob)


@query(
    "t20_token_budget_pack",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    ), cum AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (ORDER BY hx, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_chars
      FROM h
    )
    SELECT doc_id, source, n_chars, CAST(cum_chars AS BIGINT) AS cum_chars
    FROM cum WHERE cum_chars <= 20000
    """,
)
def t20_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: keep documents in deterministic hash
    order until the cumulative size hits the budget — how a fixed-token
    training mix is actually cut. The cumulative sum is TWO-LEVEL, not a
    global-order window (which would serialize onto one partition at
    100 TB): docs bucket by their md5 PREFIX (prefix order == the
    global hash order), per-bucket totals (256 rows) compute running
    offsets driver-free, and each bucket's in-partition cumsum adds its
    offset. Same answer as the naive global window, shuffle on the
    bucket key only."""
    docs = _t(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "source", "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("_hx"),
    ).withColumn("_bkt", F.substring("_hx", 1, 2))
    bkt_totals = (
        h.groupBy("_bkt").agg(F.sum("n_chars").alias("_bkt_sum"))
    )
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bkt_totals.select(
        "_bkt", F.coalesce(F.sum("_bkt_sum").over(w_off), F.lit(0)).alias("_offset")
    )
    w_in = Window.partitionBy("_bkt").orderBy("_hx", "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        h.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "cum_chars",
            (F.sum("n_chars").over(w_in) + F.col("_offset")).cast("bigint"),
        )
        .where(F.col("cum_chars") <= 20000)
        .select("doc_id", "source", "n_chars", "cum_chars")
    )


@query(
    "q92_timezone_battery",
    oracle="""
    WITH z AS (
      SELECT UNNEST(['America/New_York', 'Europe/Berlin', 'Asia/Tokyo']) AS tz
    ), local_ts AS (
      SELECT z.tz,
             CAST(timezone(z.tz, ts AT TIME ZONE 'UTC') AS TIMESTAMP) AS lt
      FROM events CROSS JOIN z
    )
    SELECT tz,
           SUM(CASE WHEN EXTRACT(hour FROM lt) BETWEEN 9 AND 17
                    THEN 1 ELSE 0 END) AS business_hours_events,
           COUNT(*) AS n_events,
           MIN(strftime(lt, '%Y-%m-%d %H:%M:%S')) AS first_local
    FROM local_ts GROUP BY tz
    """,
)
def q92_timezone_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion battery — log engines constantly re-localize
    UTC event time: ``from_utc_timestamp`` against IANA zones, local
    business-hours classification, local formatting. Pure per-row
    projections (the zone list is a literal explode), one
    map-side-combined aggregate; both engines resolve the same IANA
    tzdb rules, which the hash match certifies across a DST-free test
    window."""
    ev = _t(spark, sf_dir, "events")
    zones = F.array(
        F.lit("America/New_York"), F.lit("Europe/Berlin"), F.lit("Asia/Tokyo")
    )
    local = ev.select(
        F.explode(zones).alias("tz"), "ts"
    ).withColumn("lt", F.expr("from_utc_timestamp(ts, tz)"))
    return local.groupBy("tz").agg(
        F.sum(
            F.when(F.hour("lt").between(9, 17), 1).otherwise(0)
        ).alias("business_hours_events"),
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.date_format("lt", "yyyy-MM-dd HH:mm:ss")).alias("first_local"),
    )


@query(
    "t21_curation_reasons",
    oracle="""
    WITH tk AS (
      SELECT doc_id, text, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents WHERE source <> 'src0'
    ), feat AS (
      SELECT doc_id,
             len(toks) AS n_toks,
             len(list_filter(list_transform(toks, x -> lower(x)),
                 x -> x IN ('the','a','an','and','or','of','to','in','is'))) AS n_stop,
             len(list_distinct(list_transform(toks, x -> lower(x)))) AS n_distinct
      FROM tk
    ), quality AS (
      SELECT t.doc_id FROM tk t JOIN feat f USING (doc_id)
      WHERE f.n_toks BETWEEN 10 AND 1000
        AND ROUND(f.n_stop / greatest(f.n_toks, 1), 4) >= 0.05
        AND ROUND(1.0 - f.n_distinct / greatest(f.n_toks, 1), 4) <= 0.6
    ), keep1 AS (
      SELECT MIN(t.doc_id) AS doc_id
      FROM tk t JOIN quality q USING (doc_id)
      GROUP BY md5(regexp_replace(lower(trim(t.text)), '\\s+', ' ', 'g'))
    ), sh3 AS (
      SELECT t.doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(t.toks)-2, 0)+1),
                    i -> t.toks[i] || ' ' || t.toks[i+1] || ' ' || t.toks[i+2]))) AS sh
      FROM tk t JOIN keep1 k USING (doc_id)
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM sh3 GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh3 a JOIN sh3 b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), near_dropped AS (
      SELECT DISTINCT id2 AS doc_id FROM inter
      JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
      WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= 0.7
    ), sh5 AS (
      SELECT d.doc_id, d.source,
             unnest(list_distinct(list_transform(
                    range(1, greatest(len(list_filter(string_split(d.text, ' '),
                                                      x -> x <> ''))-4, 0)+1),
                    i -> list_filter(string_split(d.text, ' '), x -> x <> '')[i]
                         || ' ' || list_filter(string_split(d.text, ' '), x -> x <> '')[i+1]
                         || ' ' || list_filter(string_split(d.text, ' '), x -> x <> '')[i+2]
                         || ' ' || list_filter(string_split(d.text, ' '), x -> x <> '')[i+3]
                         || ' ' || list_filter(string_split(d.text, ' '), x -> x <> '')[i+4])))
               AS sh
      FROM documents d
    ), bench AS (
      SELECT DISTINCT sh FROM sh5 WHERE source = 'src0'
    ), survivors3 AS (
      SELECT doc_id FROM keep1
      WHERE doc_id NOT IN (SELECT doc_id FROM near_dropped)
    ), contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM sh5 s JOIN survivors3 k USING (doc_id) JOIN bench b ON s.sh = b.sh
    )
    SELECT t.doc_id, t.source,
           CASE WHEN q.doc_id IS NULL THEN 'quality'
                WHEN k.doc_id IS NULL THEN 'exact_dup'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                WHEN c.doc_id IS NOT NULL THEN 'contaminated'
                ELSE 'kept' END AS disposition
    FROM tk t
    LEFT JOIN quality q ON t.doc_id = q.doc_id
    LEFT JOIN keep1 k ON t.doc_id = k.doc_id
    LEFT JOIN near_dropped n ON t.doc_id = n.doc_id
    LEFT JOIN contaminated c ON t.doc_id = c.doc_id
    """,
)
def t21_curation_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation observability (pipeline.curate_report): every input doc
    labeled with the FIRST stage that dropped it — quality / exact_dup /
    near_dup / contaminated / kept. Built from the same lazy stage
    frames as the pipeline itself (anti-joins coalesced by precedence),
    so the attribution cannot drift from the pipeline it explains; the
    oracle replays the full stage cascade."""
    from logverzcore_spark.pipeline import curate_report

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0")
    train = docs.where(F.col("source") != "src0")
    return curate_report(train, benchmark=bench)


@query(
    "q93_schema_evolution_union",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, NULL AS o_orderpriority,
             'v1' AS schema_ver
      FROM orders WHERE o_orderkey % 3 = 0
    ), v2 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
             'v2' AS schema_ver
      FROM orders WHERE o_orderkey % 3 <> 0
    ), unioned AS (
      SELECT * FROM v1 UNION ALL SELECT * FROM v2
    )
    SELECT schema_ver, o_orderstatus,
           COUNT(*) AS n,
           SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
             AS n_missing_priority
    FROM unioned GROUP BY schema_ver, o_orderstatus
    """,
)
def q93_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two dataset versions — the old one missing
    a later-added column — combine via ``unionByName(allowMissingColumns
    =True)`` (absent columns NULL-fill, names align regardless of
    position), the pattern every long-lived log table needs when its
    DataType grows a field. Position-based UNION would silently
    mis-align; the by-name form is the contract."""
    o = _t(spark, sf_dir, "orders")
    v1 = (
        o.where(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("schema_ver", F.lit("v1"))
    )
    v2 = (
        o.where(F.col("o_orderkey") % 3 != 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .withColumn("schema_ver", F.lit("v2"))
    )
    unioned = v1.unionByName(v2, allowMissingColumns=True)
    return unioned.groupBy("schema_ver", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
        ).alias("n_missing_priority"),
    )


@query(
    "t22_leakage_safe_split",
    oracle=_DUP_GRAPH_CTE
    + """
    SELECT d.doc_id, l.cluster_id,
           CASE WHEN substr(md5(CAST(l.cluster_id AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'train'
                WHEN substr(md5(CAST(l.cluster_id AS VARCHAR)), 1, 1) <= 'd'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents d JOIN labels l ON d.doc_id = l.doc_id
    """,
)
def t22_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: hashing the DOCUMENT id (t05)
    can strand two near-duplicates on opposite sides of the train/test
    wall — silent eval contamination. Splitting on the near-dup CLUSTER
    id instead (connected components over the 3-gram Jaccard≥0.5 graph,
    min-member label) puts every member of a duplicate family in the
    same split by construction. Same determinism properties as t05; the
    extra cost is exactly the dup-clustering pass a curation pipeline
    already ran."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    clusters = dedup.dup_clusters(docs, pairs)
    return clusters.select(
        "doc_id",
        "cluster_id",
        text.hash_split(F.col("cluster_id")).alias("split"),
    )


@query(
    "q94_filter_clause_battery",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE l_discount = 0) AS BIGINT) / 100.0
             AS undiscounted_revenue,
           COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0.05)
             AS n_hightax_suppliers
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q94_filter_clause_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregates (the standard form of conditional
    aggregation, clearer than CASE pivots and planned identically): run
    as SQL since that is the user-facing surface. All filters evaluate
    inside the single map-side-combined aggregate — one scan serves
    every conditional metric."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("q94_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    FILTER (WHERE l_discount = 0) AS BIGINT)
                 / CAST(100 AS DOUBLE) AS undiscounted_revenue,
               COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0.05)
                 AS n_hightax_suppliers
        FROM q94_lineitem GROUP BY l_returnflag
        """
    )


@query(
    "st19_streaming_argmax",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events
    )
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
           event_type AS last_event_type
    FROM ranked WHERE rn = 1
    """,
)
def st19_streaming_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming latest-row-per-key: ``max_by`` over a packed
    (event-time, id) key inside a streaming aggregation — per-key state
    is ONE row (the current argmax), the streaming form of q50's
    argmax-without-window. The id tie-break makes concurrent-timestamp
    events deterministic across engines and micro-batch orders."""
    from logverzcore_spark.streaming.collect_stream import run_streaming_argmax

    return run_streaming_argmax(spark, os.path.join(sf_dir, "events.parquet"))


@query(
    "q95_lateral_top_order",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.best_order, t.best_price
    FROM customer c, LATERAL (
      SELECT o_orderkey AS best_order,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0 AS best_price
      FROM orders o WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    ) t
    WHERE c.c_custkey <= 300
    """,
)
def q95_lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-1 order per customer) — the
    standard SQL form of per-key top-N, run as SQL. Catalyst
    decorrelates the LATERAL into a join + per-key aggregation, so the
    orders table is scanned once, not once per customer (the plan a
    naive nested-loop engine executes). The deterministic
    (price DESC, key) tie-break keeps both engines exact."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("q95_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q95_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.best_order, t.best_price
        FROM q95_customer c, LATERAL (
          SELECT o_orderkey AS best_order,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   / CAST(100 AS DOUBLE) AS best_price
          FROM q95_orders o WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) t
        WHERE c.c_custkey <= 300
        """
    )


@query(
    "q96_null_safe_compare",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             NULLIF(o_orderpriority, '3-MEDIUM') AS p
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT
      SUM(CASE WHEN a.p IS NOT DISTINCT FROM b.p THEN 1 ELSE 0 END)
        AS n_null_safe_eq,
      SUM(CASE WHEN a.p = b.p THEN 1 ELSE 0 END) AS n_plain_eq,
      SUM(CASE WHEN a.p IS DISTINCT FROM b.p THEN 1 ELSE 0 END)
        AS n_distinct_from
    FROM t a JOIN t b ON a.o_orderkey = b.o_orderkey
    """,
)
def q96_null_safe_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe comparison semantics (`<=>` / IS [NOT] DISTINCT FROM):
    NULL <=> NULL is TRUE while NULL = NULL is NULL — the distinction
    that silently drops rows from joins on nullable keys. The battery
    self-joins a NULLIF'd column and counts under all three operators;
    plain `=` must undercount by exactly the NULL rows."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 3000)
    t = o.select(
        "o_orderkey", F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("p")
    )
    a = t.alias("a")
    b = t.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"))
    return j.agg(
        F.sum(
            F.when(F.col("a.p").eqNullSafe(F.col("b.p")), 1).otherwise(0)
        ).alias("n_null_safe_eq"),
        F.sum(F.when(F.col("a.p") == F.col("b.p"), 1).otherwise(0)).alias("n_plain_eq"),
        F.sum(
            F.when(~F.col("a.p").eqNullSafe(F.col("b.p")), 1).otherwise(0)
        ).alias("n_distinct_from"),
    )


@query(
    "t23_fused_quality_rank",
    oracle="""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), tfeat AS (
      SELECT doc_id,
             ROUND(len(list_filter(list_transform(toks, x -> lower(x)),
                   x -> x IN ('the','a','an','and','or','of','to','in','is')))
                   * 1.0 / greatest(len(toks), 1), 4) AS sw
      FROM tk
    ), efeat AS (
      SELECT vec_id,
             ROUND(sqrt(list_sum(list_transform(embedding,
                                                x -> CAST(x AS DOUBLE) * x))), 6)
               AS enorm
      FROM embeddings
    ), fused AS (
      SELECT t.doc_id,
             ROUND(t.sw * 10.0 + e.enorm, 6) AS fused_score
      FROM tfeat t JOIN efeat e ON t.doc_id = e.vec_id
    )
    SELECT doc_id, fused_score FROM (
      SELECT doc_id, fused_score,
             row_number() OVER (ORDER BY fused_score DESC, doc_id) AS rk
      FROM fused
    ) WHERE rk <= 50
    """,
)
def t23_fused_quality_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation ranking: text-side quality (stopword ratio)
    fused with embedding-side magnitude into one score, top-k selected.
    The modality join is id-to-id (both sides pre-reduced to per-doc
    scalars BEFORE joining — vectors and text never meet in the
    shuffle), and the top-k is TakeOrdered — the pattern for any
    multi-signal curation score at corpus scale."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    sw = F.round(text.stopword_ratio(F.col("text")), 4)
    tfeat = docs.select("doc_id", sw.alias("sw"))
    from logverzcore_spark.operators.similarity import l2_norm

    efeat = emb.select(
        F.col("vec_id"), F.round(l2_norm(F.col("embedding")), 6).alias("enorm")
    )
    fused = (
        tfeat.join(efeat, tfeat.doc_id == efeat.vec_id)
        .select(
            "doc_id",
            F.round(F.col("sw") * 10.0 + F.col("enorm"), 6).alias("fused_score"),
        )
    )
    return fused.orderBy(F.desc("fused_score"), "doc_id").limit(50)


@query(
    "q97_grouping_id_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           GROUPING(o_orderstatus) + GROUPING(o_orderpriority) * 2
             AS grouping_level,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q97_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() disambiguation: subtotal rows are labeled
    by which key was rolled up — the only correct way to tell a
    rolled-up NULL from a NULL data value in multi-level reports (q10's
    plain rollup can't distinguish them). One Expand + hash aggregate,
    same plan cost as the unlabeled rollup."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.grouping("o_orderstatus") + F.grouping("o_orderpriority") * 2
            ).alias("grouping_level"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.col("grouping_level").cast("long").alias("grouping_level"),
            "n",
        )
    )


@query(
    "q98_try_arithmetic",
    oracle="""
    SELECT l_returnflag,
           SUM(CASE WHEN l_discount = 0 THEN NULL
                    ELSE CAST(FLOOR(l_quantity / l_discount) AS BIGINT) END)
             AS sum_qty_per_disc,
           SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS n_zero_disc,
           SUM(TRY_CAST(CASE WHEN l_linenumber <= 4
                             THEN CAST(l_linenumber AS VARCHAR)
                             ELSE 'seven' END AS BIGINT)) AS sum_parsed
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q98_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_* total-function battery under ANSI mode (Spark 4 default):
    ``try_divide`` yields NULL on /0 instead of killing the job, and
    ``try_cast`` absorbs unparseable text — the per-expression form of
    the coercion layer's whole-job safety (operators/coerce.py). The
    oracle states the identical semantics with CASE guards."""
    li = _t(spark, sf_dir, "lineitem")
    parsed_src = F.when(
        F.col("l_linenumber") <= 4, F.col("l_linenumber").cast("string")
    ).otherwise(F.lit("seven"))
    return li.groupBy("l_returnflag").agg(
        F.sum(
            F.floor(F.try_divide(F.col("l_quantity"), F.col("l_discount")))
            .cast("bigint")
        ).alias("sum_qty_per_disc"),
        F.sum(F.when(F.col("l_discount") == 0, 1).otherwise(0)).alias("n_zero_disc"),
        F.sum(parsed_src.try_cast("bigint")).alias("sum_parsed"),
    )


@query(
    "d14_novelty_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 0)+1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      FROM tok
    ), df_ AS (
      SELECT sh, COUNT(*) AS n_docs FROM sh GROUP BY sh
    )
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           SUM(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) AS n_unique,
           ROUND(SUM(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS novelty
    FROM sh s JOIN df_ d ON s.sh = d.sh
    GROUP BY s.doc_id
    """,
)
def d14_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty score: per document, the fraction of its distinct
    3-grams that appear NOWHERE else in the corpus — the inverse signal
    of near-duplication, used to up-weight genuinely new content in a
    training mix (t08's within-doc dup fraction can't see cross-doc
    repetition). One inverted-index pass over shingle ROWS (the same
    d02 plan shape): shingle document-frequency, joined back, one
    partial-agg'd groupBy — never an all-pairs comparison."""
    docs = _t(spark, sf_dir, "documents")
    from logverzcore_spark.operators.dedup import _shingle_table
    from logverzcore_spark.operators.util import fan_out

    sh = _shingle_table(fan_out(docs), "text", "doc_id", 3)
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sh.join(df_counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).alias("n_unique"),
            F.round(
                F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("novelty"),
        )
    )


@query(
    "q99_event_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lead(event_type) OVER w AS next_type,
             lead(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id, COUNT(*) AS n_view_click
    FROM seq
    WHERE event_type = 'view' AND next_type = 'click'
      AND next_ts <= ts + INTERVAL 10 MINUTE
    GROUP BY user_id
    """,
)
def q99_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-event pattern matching (MATCH_RECOGNIZE-lite): per user,
    count of view→click transitions where the click is the IMMEDIATELY
    next event and lands within 10 minutes — strict adjacency, which
    the funnel operator (q42, min-time joins) deliberately does NOT
    require. One window pass ordered by (event time, id); the pattern
    predicate is a projection over lead()."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id", "event_type", "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return (
        seq.where(
            (F.col("event_type") == "view")
            & (F.col("next_type") == "click")
            & (F.col("next_ts") <= F.col("ts") + F.expr("INTERVAL 10 MINUTES"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_view_click"))
    )


@query(
    "t24_bigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t)-1, 0)+1),
                    i -> t[i] || CHR(31) || t[i+1])) AS bg
      FROM tok
    ), c12 AS (
      SELECT bg, COUNT(*) AS n12 FROM big GROUP BY bg
    ), c1 AS (
      SELECT string_split(bg, CHR(31))[1] AS w1, SUM(n12) AS n1
      FROM c12 GROUP BY 1
    )
    SELECT b.doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(FLOOR((log10(CAST(c12.n12 AS DOUBLE))
                                - log10(CAST(c1.n1 AS DOUBLE))) * 1000000 + 0.5)
                         AS BIGINT)) AS BIGINT) / 1000000.0 / COUNT(*)
             AS avg_cond_logprob
    FROM big b
    JOIN c12 ON b.bg = c12.bg
    JOIN c1 ON string_split(b.bg, CHR(31))[1] = c1.w1
    GROUP BY b.doc_id
    """,
)
def t24_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score: mean conditional log10
    p(w2|w1) per document — one LM order above t13's unigram filter,
    catching word-salad documents whose unigram mix looks normal.
    Conditional probabilities derive ENTIRELY from the bigram count
    table (count(w1·) = Σ_w2 count(w1,w2) — no second corpus pass);
    both count tables broadcast (vocab² observed ≪ corpus); per-bigram
    log-probs quantize to 1e-6 before the order-insensitive integer
    sum, the same determinism treatment as t13."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    pairs = F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)), "
        "(x, i) -> concat(x, '\\u001F', t[i + 1]))"
    )
    big = docs.select("doc_id", F.explode(pairs).alias("bg"))
    c12 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("n12"))
    c1 = (
        c12.withColumn("w1", F.split("bg", "\x1f").getItem(0))
        .groupBy("w1")
        .agg(F.sum("n12").alias("n1"))
    )
    q = F.floor(
        (F.log10(F.col("n12").cast("double")) - F.log10(F.col("n1").cast("double")))
        * 1000000
        + 0.5
    ).cast("bigint")
    return (
        big.join(F.broadcast(c12), "bg")
        .withColumn("w1", F.split("bg", "\x1f").getItem(0))
        .join(F.broadcast(c1), "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum(q).cast("bigint") / 1000000.0 / F.count(F.lit(1))).alias(
                "avg_cond_logprob"
            ),
        )
    )


@query(
    "q100_share_of_total",
    oracle="""
    WITH rev AS (
      SELECT r_name, n_name,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           CAST(cents AS BIGINT) / 100.0 AS revenue,
           ROUND(cents * 1.0 / SUM(cents) OVER (PARTITION BY r_name), 6)
             AS share_of_region,
           ROUND(cents * 1.0 / SUM(cents) OVER (), 6) AS share_of_world
    FROM rev
    """,
)
def q100_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total analytics (RATIO_TO_REPORT shape): each nation's
    revenue as a fraction of its region and of the world, via window
    sums OVER THE AGGREGATE — the windows run on the 25-row rollup, not
    the fact table, so the two extra totals are free at any scale. All
    ratios divide exact integer cents, so both engines compute identical
    doubles."""
    orders = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    rev = (
        orders.join(F.broadcast(c), orders.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(cents).alias("cents"))
    )
    w_region = Window.partitionBy("r_name")
    w_world = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        (F.col("cents").cast("bigint") / 100.0).alias("revenue"),
        F.round(F.col("cents") / F.sum("cents").over(w_region), 6).alias(
            "share_of_region"
        ),
        F.round(F.col("cents") / F.sum("cents").over(w_world), 6).alias(
            "share_of_world"
        ),
    )


#: The recursive core, shared verbatim by both engines; only where the
#: edge set comes from differs (oracle: inline CTE; Spark: a temp view
#: over a materialized frame — see the docstring).
_Q101_CHAIN = """chain(o_orderkey, root_key, depth) AS (
      SELECT o_orderkey, o_orderkey, 0 FROM {edges} WHERE parent IS NULL
      UNION ALL
      SELECT e.o_orderkey, c.root_key, c.depth + 1
      FROM chain c JOIN {edges} e ON e.parent = c.o_orderkey
    )
    SELECT o_orderkey, root_key, depth FROM chain
"""

_Q101_ORACLE = (
    """
    WITH RECURSIVE edges AS (
      SELECT o_orderkey, o_custkey,
             LAG(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS parent
      FROM orders
    ), """
    + _Q101_CHAIN.format(edges="edges")
)


@query("q101_recursive_chain", oracle=_Q101_ORACLE)
def q101_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE hierarchy walk (Spark 4 ``WITH RECURSIVE``): every
    order's position in its customer's succession chain — parent = the
    customer's previous order, roots = first orders — walked root-down so
    each node is reached exactly once (single-parent edges keep UNION ALL
    duplicate-free; Spark does not yet allow UNION inside recursion).
    The same shape walks org charts, reply threads, and BOM levels where
    depth is unbounded and window functions cannot reach.

    The edge frame is materialized ONCE (eager localCheckpoint) before
    the recursion: inlined as a CTE it would be re-derived — window
    shuffle and all — at every level (measured 10.6s → 3.9s at sf0.01).
    It is also coalesced to a few large partitions: each level's
    frontier join is tiny, so per-level cost is task-scheduling overhead
    × partitions; size partitions to the edge volume, not the cluster
    (raise toward cluster parallelism when edges stop fitting ~100k rows
    a partition). Levels run sequentially by nature (= max chain depth,
    ≤ 25 here; limits: ``spark.sql.cteRecursionLevelLimit`` 100,
    ``spark.sql.cteRecursionRowLimit`` 1M — raise the row limit beyond
    ~SF1). For pure per-key chains a single window pass is cheaper —
    this entry grades the general recursive form on the SQL surface."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nparts = max(2, spark.sparkContext.defaultParallelism // 8)
    edges = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey", "o_custkey", F.lag("o_orderkey").over(w).alias("parent")
        )
        .coalesce(nparts)
        .localCheckpoint(eager=True)
    )
    # The recursion's total output is exactly one row per node, so size
    # the runaway-guard row limit from the (already materialized) edge
    # count instead of tripping the 1M default at ~SF1 — the guard still
    # fires on a genuinely divergent recursion (cycle/multi-parent bug).
    # The raised limit is SCOPED: the recursion is forced eagerly inside
    # a save/restore block (localCheckpoint pins the ~1-row-per-node
    # result), so later queries on the shared session keep the default
    # runaway guard instead of silently inheriting a multi-million-row
    # ceiling.
    prior = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    spark.conf.set(
        "spark.sql.cteRecursionRowLimit",
        str(max(1_000_000, 2 * edges.count())),
    )
    try:
        edges.createOrReplaceTempView("q101_edges")
        return spark.sql(
            "WITH RECURSIVE " + _Q101_CHAIN.format(edges="q101_edges")
        ).localCheckpoint(eager=True)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.cteRecursionRowLimit")
        else:
            spark.conf.set("spark.sql.cteRecursionRowLimit", prior)


@query(
    "q102_hof_battery",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS n_dims,
           CAST(list_sum(list_transform(embedding,
                x -> ABS(CAST(FLOOR(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT))))
                AS BIGINT) AS l1_micro,
           len(list_filter(embedding, x -> x < 0)) AS n_neg,
           list_max(list_transform(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT)))
                AS max_micro,
           CAST(list_sum(list_transform(embedding[1:8],
                x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT)))
                AS BIGINT) AS head8_micro
    FROM embeddings
    """,
)
def q102_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column without
    exploding it: ``transform``/``filter``/``aggregate``/``slice``/
    ``array_max`` compute per-vector metrics in place — one row stays one
    row, so there is no n×dim row blowup and no shuffle at all (narrow
    projection over the scan). Elements are float32; both engines widen
    to double then quantize to integer micros so sums are
    order-independent. Spark's HOF lambdas are CodegenFallback
    (interpreted per element) — fine for per-row metrics; hot-loop
    scoring paths in this repo use codegen'd multi-arg hashes or Arrow
    matmuls instead (see d03/s01)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = "ABS(CAST(FLOOR(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT))"
    qs = "CAST(FLOOR(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT)"
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dims"),
        F.expr(
            f"CAST(aggregate(transform(embedding, x -> {q}), 0L, (a, x) -> a + x) AS BIGINT)"
        ).alias("l1_micro"),
        F.size(F.expr("filter(embedding, x -> x < 0)")).alias("n_neg"),
        F.expr(f"array_max(transform(embedding, x -> {qs}))").alias("max_micro"),
        F.expr(
            f"CAST(aggregate(transform(slice(embedding, 1, 8), x -> {qs}), 0L, (a, x) -> a + x) AS BIGINT)"
        ).alias("head8_micro"),
    )


@query(
    "q103_interpolate_hourly",
    oracle="""
    WITH hourly AS (
      SELECT user_id,
             DATEDIFF('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS hr,
             SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT))
               // COUNT(*) AS val_q
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT user_id, UNNEST(generate_series(mn, mx)) AS hr
      FROM (SELECT user_id, MIN(hr) AS mn, MAX(hr) AS mx
            FROM hourly GROUP BY user_id)
    ), joined AS (
      SELECT s.user_id, s.hr, h.val_q FROM spine s
      LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
    ), ctx AS (
      SELECT user_id, hr, val_q,
        LAST_VALUE(val_q IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_q,
        LAST_VALUE(CASE WHEN val_q IS NOT NULL THEN hr END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_h,
        FIRST_VALUE(val_q IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_q,
        FIRST_VALUE(CASE WHEN val_q IS NOT NULL THEN hr END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_h
      FROM joined
    )
    SELECT user_id, hr,
      CASE WHEN val_q IS NOT NULL THEN val_q
           WHEN prev_q IS NOT NULL AND next_q IS NOT NULL THEN
             (prev_q*(next_h - hr) + next_q*(hr - prev_h)) // (next_h - prev_h)
           WHEN prev_q IS NOT NULL THEN prev_q ELSE next_q END / 1000000.0
        AS filled_value,
      CASE WHEN val_q IS NOT NULL THEN 'obs'
           WHEN prev_q IS NOT NULL AND next_q IS NOT NULL THEN 'interp'
           WHEN prev_q IS NOT NULL THEN 'ffill' ELSE 'bfill' END AS fill_kind
    FROM ctx
    """,
)
def q103_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap repair: per-user hourly means on a dense hour
    spine, missing hours filled by LINEAR INTERPOLATION between the
    nearest observed neighbors (edges fall back to forward/backward
    fill). The sensor/metrics resampling primitive the reference's log
    tables invite but RDS made users hand-roll. Engine-stable math:
    hourly means are integer-micro floor-averages and the interpolation
    is one integer lerp ``(prev*(nh-h) + next*(h-ph)) div (nh-ph)`` —
    no float accumulation anywhere. Plan: ONE shuffle by user_id serves
    the per-user aggregate, the spine explode, and all four
    IGNORE-NULLS window passes (same partitioning+ordering → a single
    Window operator); spine size is users × hours, independent of event
    volume."""
    ev = _t(spark, sf_dir, "events")
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    micro = F.floor(F.col("value") * 1000000 + 0.5).cast("bigint")
    hourly = (
        ev.select(
            "user_id",
            (F.timestamp_diff("HOUR", base, F.col("ts"))).alias("hr"),
            micro.alias("micro"),
        )
        .groupBy("user_id", "hr")
        .agg(F.expr("sum(micro) div count(*)").alias("val_q"))
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
        .select("user_id", F.explode(F.sequence("mn", "mx")).alias("hr"))
    )
    joined = spine.join(hourly, ["user_id", "hr"], "left")
    # Both neighbor scans are RUNNING frames: "nearest non-null after"
    # is last-non-null over the DESC ordering, not first-non-null over an
    # UNBOUNDED FOLLOWING frame — Spark recomputes unbounded-following
    # aggregates from scratch per row (O(rows²) per partition; measured
    # 9.6 s → 1.3 s on the sf0.1 spine). Cost: one extra in-partition
    # sort, no extra shuffle.
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("hr"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    obs_hr = F.when(F.col("val_q").isNotNull(), F.col("hr"))
    ctx = joined.select(
        "user_id",
        "hr",
        "val_q",
        F.last("val_q", ignorenulls=True).over(w_back).alias("prev_q"),
        F.last(obs_hr, ignorenulls=True).over(w_back).alias("prev_h"),
        F.last("val_q", ignorenulls=True).over(w_fwd).alias("next_q"),
        F.last(obs_hr, ignorenulls=True).over(w_fwd).alias("next_h"),
    )
    lerp = F.expr(
        "(prev_q*(next_h - hr) + next_q*(hr - prev_h)) div (next_h - prev_h)"
    )
    filled = (
        F.when(F.col("val_q").isNotNull(), F.col("val_q"))
        .when(F.col("prev_q").isNotNull() & F.col("next_q").isNotNull(), lerp)
        .when(F.col("prev_q").isNotNull(), F.col("prev_q"))
        .otherwise(F.col("next_q"))
    )
    kind = (
        F.when(F.col("val_q").isNotNull(), F.lit("obs"))
        .when(
            F.col("prev_q").isNotNull() & F.col("next_q").isNotNull(),
            F.lit("interp"),
        )
        .when(F.col("prev_q").isNotNull(), F.lit("ffill"))
        .otherwise(F.lit("bfill"))
    )
    return ctx.select(
        "user_id",
        "hr",
        (filled / 1000000.0).alias("filled_value"),
        kind.alias("fill_kind"),
    )


@query(
    "st20_stream_outer_join",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def st20_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming LEFT OUTER stream-stream join (st05's inner form plus
    eviction-driven NULL emission): unmatched views surface exactly once,
    when the watermark proves their click window closed. Hash-verified
    against the plain batch left join — the bounded replay is finalized
    by an end-of-stream sentinel (see
    ``collect_stream.run_stream_stream_outer_join``)."""
    from logverzcore_spark.streaming.collect_stream import (
        run_stream_stream_outer_join,
    )

    return run_stream_stream_outer_join(
        spark, os.path.join(sf_dir, "events.parquet")
    )


@query(
    "q104_mad_outliers",
    oracle="""
    WITH m AS (
      SELECT event_type,
             median(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS med
      FROM events GROUP BY event_type
    ), d AS (
      SELECT e.event_type,
             CAST(FLOOR(e.value*1000000 + 0.5) AS BIGINT) AS v, m.med
      FROM events e JOIN m ON e.event_type = m.event_type
    ), s AS (
      SELECT event_type, med, median(ABS(v - med)) AS mad
      FROM d GROUP BY event_type, med
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           ROUND(s.med / 1000000.0, 6) AS median_value,
           ROUND(s.mad / 1000000.0, 6) AS mad_value,
           SUM(CASE WHEN ABS(d.v - s.med) > 3 * s.mad THEN 1 ELSE 0 END)
             AS n_outliers
    FROM d JOIN s ON d.event_type = s.event_type
    GROUP BY d.event_type, s.med, s.mad
    """,
)
def q104_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median/MAD fences (|x - med| >
    3·MAD) — the breakdown-resistant alternative to mean/stddev z-scores
    that one heavy tail can't drag. Engine-stable: medians interpolate
    over integer micros so med and MAD are exact integers-or-halves and
    3·MAD stays exact in binary. Plan: the two exact median levels are
    inherently sequential (MAD needs the median), so the projected
    (event_type, value) frame is scanned three times — median, MAD,
    fence counts — each a narrow two-column scan shuffled only on the
    5-value group key, with the tiny med/MAD frames broadcast. At
    100 TB swap the exact medians for KLL sketches (q78): one pass,
    same fence logic."""
    ev = _t(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 1000000 + 0.5).cast("bigint")
    vals = ev.select("event_type", v.alias("v"))
    med = vals.groupBy("event_type").agg(F.median("v").alias("med"))
    s = (
        vals.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.median(F.abs(F.col("v") - F.col("med"))).alias("mad"))
    )
    return (
        vals.join(F.broadcast(s), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.abs(F.col("v") - F.col("med")) > 3 * F.col("mad")).cast("int")
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("med") / 1000000.0, 6).alias("median_value"),
            F.round(F.col("mad") / 1000000.0, 6).alias("mad_value"),
            "n_outliers",
        )
    )


@query(
    "q105_session_window",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, epoch_us(ts) AS us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    )
    SELECT user_id, MIN(us) AS session_start_us,
           MAX(us) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q105_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` in BATCH aggregation — Spark's built-in
    gap-merge operator (merge while the gap to the previous event is
    ≤ 30 min; window end = last event + gap), hash-verified against the
    classic lag/running-sum islands formulation q18 uses. One shuffle on
    the session key; the merge itself runs inside the aggregation
    operator, so there is no O(rows) window-function state — at scale
    this is the form that lets AQE size partitions by user volume."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
        )
    )


@query(
    "m09_image_header_probe",
    oracle="""
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                      ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + doc_id % 2032 AS INTEGER) END AS width,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + (doc_id * 5) % 2032 AS INTEGER) END AS height,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + doc_id % 2032 AS BIGINT)
                * (16 + (doc_id * 5) % 2032) END AS n_pixels
    FROM documents
    """,
)
def m09_image_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free image-dimension sniffing over binary payloads
    (``multimodal.sniff_image_meta``): PNG IHDR big-endian and GIF
    little-endian dims parsed from header bytes with codegen'd
    expressions — no decoder, no Python. The graded round trip BUILDS
    genuine PNG/GIF headers from doc_id (byte-exact signatures + packed
    dims), parses them back, and the oracle restates the expected dims
    arithmetically — a packing or parsing bug on either side breaks the
    hash. Every third doc carries non-image bytes and must sniff as
    'unknown' with NULL dims (the honest fixed-offset answer; JPEG's
    variable-offset SOF goes to the real decode stage)."""
    from logverzcore_spark.operators.multimodal import sniff_image_meta

    docs = _t(spark, sf_dir, "documents")
    w = (16 + F.col("doc_id") % 2032).cast("int")
    h = (16 + (F.col("doc_id") * 5) % 2032).cast("int")

    def be32(c):
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    def le16(c):
        lo = F.lpad(F.hex(c % 256), 2, "0")
        hi = F.lpad(F.hex(F.floor(c / 256).cast("int")), 2, "0")
        return F.unhex(F.concat(lo, hi))

    # PNG: signature + IHDR length/tag, then width/height (BE32).
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A0000000D49484452")), be32(w), be32(h)
    )
    gif = F.concat(F.encode(F.lit("GIF89a"), "UTF-8"), le16(w), le16(h))
    payload = (
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, gif)
        .otherwise(F.encode("text", "UTF-8"))
    )
    return sniff_image_meta(
        docs.select("doc_id", payload.alias("payload"))
    )


@query(
    "m11_jpeg_header_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 3 < 2 THEN 'jpeg' ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + doc_id % 4080 AS INTEGER) END AS width,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(16 + (doc_id * 7) % 4080 AS INTEGER) END AS height,
      CASE WHEN doc_id % 3 < 2 THEN CAST(3 AS INTEGER) END AS n_components,
      CASE WHEN doc_id % 3 < 2 THEN doc_id % 2 = 1 END AS progressive
    FROM documents
    """,
)
def m11_jpeg_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG frame-header walk over binary payloads
    (``multimodal.parse_jpeg_meta``): unlike m09's fixed-offset PNG/GIF
    sniffing, the SOF marker floats behind a variable-length segment
    chain, so the graded round trip BUILDS genuine JFIF byte streams
    with a doc_id-dependent chain (APP0 + a COM segment padded by
    ``doc_id % 7`` bytes → the SOF offset varies row to row), half
    baseline (SOF0) and half progressive (SOF2), parses them back with
    the bounded segment walker, and the oracle restates the packed
    dims/flags arithmetically — an off-by-one anywhere in the walk
    breaks the hash. Every third doc carries text bytes and must report
    'unknown' with NULL fields."""
    from logverzcore_spark.operators.multimodal import parse_jpeg_meta

    docs = _t(spark, sf_dir, "documents")
    w = (16 + F.col("doc_id") % 4080).cast("int")
    h = (16 + (F.col("doc_id") * 7) % 4080).cast("int")
    pad = (F.col("doc_id") % 7).cast("int")

    def be16(c):
        return F.unhex(F.lpad(F.hex(c), 4, "0"))

    app0 = F.unhex(F.lit("FFE000104A46494600010100000100010000"))
    com = F.concat(
        F.unhex(F.lit("FFFE")), be16(pad + 2), F.encode(F.repeat(F.lit("A"), pad), "UTF-8")
    )
    sof_marker = F.when(F.col("doc_id") % 2 == 1, F.unhex(F.lit("FFC2"))).otherwise(
        F.unhex(F.lit("FFC0"))
    )
    sof = F.concat(
        sof_marker, F.unhex(F.lit("001108")), be16(h), be16(w),
        F.unhex(F.lit("03012200021101031101")),
    )
    jpeg = F.concat(F.unhex(F.lit("FFD8")), app0, com, sof, F.unhex(F.lit("FFD9")))
    payload = (
        F.when(F.col("doc_id") % 3 < 2, jpeg)
        .otherwise(F.encode("text", "UTF-8"))
    )
    return parse_jpeg_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "m12_webp_header_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 4 < 3 THEN 'webp' ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 4 < 3
           THEN CAST(1 + doc_id % 16383 AS INTEGER) END AS width,
      CASE WHEN doc_id % 4 < 3
           THEN CAST(1 + (doc_id * 3) % 16383 AS INTEGER) END AS height,
      CASE WHEN doc_id % 4 < 3
           THEN CAST(1 + doc_id % 16383 AS BIGINT)
                * (1 + (doc_id * 3) % 16383) END AS n_pixels
    FROM documents
    """,
)
def m12_webp_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP dimension sniffing across ALL THREE first-chunk layouts
    (``multimodal.sniff_image_meta``): VP8X extended (24-bit LE
    canvas-1), VP8L lossless (14+14-bit packed dims-1 behind the 0x2F
    signature), VP8 lossy (14-bit dims behind the 9D012A sync code) —
    each still a FIXED-offset parse, so the sniffer stays codegen-only
    (no Python in the plan, same as m09). The graded round trip builds
    byte-exact container bytes per layout from doc_id (cycling layouts
    with doc_id % 4; every fourth doc is text → 'unknown'), parses them
    back, and the oracle restates the dims arithmetically — a bit-shift
    or offset error in any layout breaks the hash."""
    from logverzcore_spark.operators.multimodal import sniff_image_meta

    docs = _t(spark, sf_dir, "documents")
    w = (1 + F.col("doc_id") % 16383).cast("int")
    h = (1 + (F.col("doc_id") * 3) % 16383).cast("int")

    def le_pack(c, nbytes):
        parts = [
            F.lpad(F.hex((c / (256 ** i)).cast("long") % 256), 2, "0")
            for i in range(nbytes)
        ]
        return F.unhex(F.concat(*parts))

    riff = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"), le_pack(F.lit(30), 4),
        F.encode(F.lit("WEBP"), "UTF-8"),
    )
    vp8x = F.concat(
        riff, F.encode(F.lit("VP8X"), "UTF-8"), le_pack(F.lit(10), 4),
        F.unhex(F.lit("00000000")),  # flags + reserved
        le_pack(w - 1, 3), le_pack(h - 1, 3),
    )
    vp8l = F.concat(
        riff, F.encode(F.lit("VP8L"), "UTF-8"), le_pack(F.lit(5), 4),
        F.unhex(F.lit("2F")),
        le_pack((w - 1) + 16384 * (h - 1).cast("long"), 4),
    )
    vp8 = F.concat(
        riff, F.encode(F.lit("VP8 "), "UTF-8"), le_pack(F.lit(10), 4),
        F.unhex(F.lit("000000")),  # frame tag
        F.unhex(F.lit("9D012A")),  # sync code
        le_pack(w, 2), le_pack(h, 2),
    )
    payload = (
        F.when(F.col("doc_id") % 4 == 0, vp8x)
        .when(F.col("doc_id") % 4 == 1, vp8l)
        .when(F.col("doc_id") % 4 == 2, vp8)
        .otherwise(F.encode("text", "UTF-8"))
    )
    return sniff_image_meta(docs.select("doc_id", payload.alias("payload")))


@query(
    "q106_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) / 100.0 AS total
    FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 200
    """,
)
def q106_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result paging on the SQL surface: ``ORDER BY … LIMIT 100 OFFSET
    200`` (the page-3 request every result browser issues — the
    reference chunked whole results over the data channel instead,
    p2pconnection.js:308-312; Q11's `sql_chunked` covers that form).
    Spark plans this as TakeOrderedAndProject with a skip — each
    partition keeps only offset+limit rows locally, the driver merges
    and drops the first 200 — so cost grows with OFFSET, not with table
    size. Deep paging should use KEYSET pagination instead (``WHERE
    o_orderkey > :last ORDER BY o_orderkey LIMIT 100`` — O(page), and
    the predicate prunes row groups); the pytest proves the two forms
    return identical pages."""
    ev = _t(spark, sf_dir, "orders")
    return (
        ev.orderBy("o_orderkey")
        .select(
            "o_orderkey",
            "o_custkey",
            (F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint") / 100.0
             ).alias("total"),
        )
        .offset(200)
        .limit(100)
    )


@query("s08_ivf_index_probe", oracle=_s03b_oracle())
def s08_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once/probe-many IVF: persist the cell-partitioned index +
    centroid table (``similarity.ivf_index_build``), then answer the
    query batch from the index alone (``ivf_index_probe``) — the probe's
    ``cell IN (...)`` predicate prunes the corpus read to nprobe/n_cells
    of its FILES (partition pruning asserted in pytest). Same parameters
    and literal LCG centroids as s03b, so the SAME SQL oracle grades it:
    a persistence/pruning bug would break the hash. The graded run
    materializes the probe (eager localCheckpoint) and drops its index
    tables — no warehouse residue."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    tbl = f"s08_ivf_idx_{uuid.uuid4().hex[:8]}"
    similarity.ivf_index_build(
        emb, tbl, n_cells=16, centroids=similarity.lcg_centroids(64, 16)
    )
    try:
        out = similarity.ivf_index_probe(
            spark, queries, tbl, k=5, nprobe=4
        ).localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_centroids")
    return out


@query("s10_ivf_index_append", oracle=_s03b_oracle())
def s10_ivf_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF maintenance (``similarity.ivf_index_append``):
    build the index on 80% of the corpus, append the held-out 20% as an
    arriving batch (assigned to the EXISTING centroids, appended only
    under the touched cell partitions), then probe. Because append
    reuses the stored centroids, probing the appended index is exactly
    equivalent to s08's from-scratch build over the full corpus — so
    the SAME SQL oracle grades it hash-exact: any divergence between
    append and rebuild (lost rows, wrong cell, stale centroids) breaks
    the hash. A second idempotence property — re-appending the same
    batch adds nothing (dedupe anti-join over touched cells only) — and
    the untouched-partition-files-unchanged invariant are asserted in
    pytest (test_ivf_index_append_*)."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)
    queries = emb.where(F.col("vec_id") < 20)
    tbl = f"s10_ivf_idx_{uuid.uuid4().hex[:8]}"
    similarity.ivf_index_build(
        base, tbl, n_cells=16, centroids=similarity.lcg_centroids(64, 16)
    )
    try:
        similarity.ivf_index_append(spark, delta, tbl)
        out = similarity.ivf_index_probe(
            spark, queries, tbl, k=5, nprobe=4
        ).localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_centroids")
    return out


@query(
    "t26_range_manifest",
    oracle="""
    WITH src AS (
      SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), b AS (
      SELECT quantile_cont(cents,
        [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs
      FROM src
    )
    SELECT len(list_filter(b.bs, x -> s.cents > x)) AS shard,
           COUNT(*) AS n_rows,
           MIN(cents) AS min_val, MAX(cents) AS max_val
    FROM src s CROSS JOIN b
    GROUP BY 1
    """,
)
def t26_range_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-sharded export manifest (``export.range_bounds`` /
    ``range_manifest``): shard boundaries are EXACT interpolated
    percentiles — deterministic and engine-replayable, unlike Spark's
    sampled RangePartitioner — and assignment is a codegen'd monotone
    comparison chain, so shard [min, max] ranges are provably disjoint
    (a merge scan or range router depends on that; the disjointness and
    the in-file sort of the full ``export_sorted_ranges`` write are
    asserted in pytest). The manifest itself is one groupBy over the
    pruned (shard, key) projection."""
    from logverzcore_spark import export as ex

    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    src = _t(spark, sf_dir, "orders").select(cents.alias("cents"))
    bounds = ex.range_bounds(src, "cents", n_shards=8)
    return ex.range_manifest(src, "cents", bounds)


_Q107_SQL = """
    WITH agg AS (
      SELECT r_name, n_name,
             SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS cents,
             GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n
      FROM {src}
      GROUP BY ROLLUP(r_name, n_name)
    )
    SELECT r_name, n_name,
           CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           g_r + g_n AS lochierarchy,
           ROW_NUMBER() OVER (
             PARTITION BY g_r + g_n,
                          CASE WHEN g_n = 0 THEN r_name END
             ORDER BY cents DESC, COALESCE(n_name, ''), COALESCE(r_name, '')
           ) AS rank_within_parent
    FROM agg
"""


@query(
    "q107_rollup_rank",
    oracle=_Q107_SQL.format(
        src="""(SELECT r_name, n_name, o_totalprice
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey) t"""
    ),
)
def q107_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-within-rollup-level (the TPC-DS Q36 signature): one ROLLUP
    pass produces leaf, subtotal, and grand-total rows; a window then
    ranks each row AGAINST ITS PEERS AT THE SAME LEVEL (nations within
    their region, regions against regions), with GROUPING() flags both
    labeling the level and forming the partition key — rolled-up NULLs
    never collide with data NULLs. The windows run over the ~31-row
    rollup result, not the fact table, so the ranking is free at any
    scale; deterministic tie-breaks make it hash-verifiable."""
    orders = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    src = (
        orders.join(F.broadcast(c), orders.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", "o_totalprice")
    )
    src.createOrReplaceTempView("q107_src")
    return spark.sql(_Q107_SQL.format(src="q107_src"))


_Q108_SQL = """
    WITH m AS (
      SELECT n_name,
             CAST(date_part('year', o_orderdate) AS INTEGER) AS yr,
             CAST(date_part('month', o_orderdate) AS INTEGER) AS mon,
             SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS cents
      FROM {src}
      GROUP BY 1, 2, 3
    )
    SELECT n_name, yr, mon,
           CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           ROUND(CAST(cents AS DOUBLE)
                 / (SUM(cents) OVER (PARTITION BY n_name, yr)
                    / CAST(COUNT(*) OVER (PARTITION BY n_name, yr) AS DOUBLE)),
                 6) AS vs_year_avg,
           CAST(COALESCE(LAG(cents) OVER w, 0) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS prev_rev,
           CAST(COALESCE(LEAD(cents) OVER w, 0) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS next_rev
    FROM m
    WINDOW w AS (PARTITION BY n_name ORDER BY yr, mon)
"""


@query(
    "q108_seasonal_deviation",
    oracle=_Q108_SQL.format(
        src="""(SELECT n_name, o_orderdate, o_totalprice
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey) t"""
    ),
)
def q108_seasonal_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality analysis (the TPC-DS Q47 signature): each nation's
    monthly revenue against its own yearly average, with the adjacent
    months alongside (lag/lead) — the deviation-vs-trend shape behind
    'which months ran hot'. Both window families (year-partition
    average, month-ordered neighbors) run over the ~300-row monthly
    aggregate, never the fact table; ratios divide exact integer cents
    cast identically, rounded to 6dp."""
    orders = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    src = (
        orders.join(F.broadcast(c), orders.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("n_name", "o_orderdate", "o_totalprice")
    )
    src.createOrReplaceTempView("q108_src")
    return spark.sql(_Q108_SQL.format(src="q108_src"))


@query(
    "q109_bitmap_rollup",
    oracle="""
    WITH per_user AS (
      SELECT user_id, event_type,
             BIT_OR(1 << (CAST(date_part('isodow', ts) AS INTEGER) - 1))
               AS active_mask
      FROM events GROUP BY user_id, event_type
    )
    SELECT event_type, active_mask,
           bit_count(active_mask) AS n_active_days,
           COUNT(*) AS n_users
    FROM per_user GROUP BY event_type, active_mask
    """,
)
def q109_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap aggregation: each (user, event type)'s active
    WEEKDAYS packed into a 7-bit mask by a ``BIT_OR`` aggregate (map-side combinable — the
    whole per-user state is one integer), then cohorts counted per
    exact activity pattern with ``bit_count`` for cardinality. The
    bitmap-index idiom for set-of-small-domain rollups: at 100 TB the
    shuffle carries 8 bytes per user instead of a weekday set, and mask
    equality finds behavioral cohorts without array comparisons.
    Weekday numbering is aligned Monday=0 on both engines (Spark
    ``weekday`` vs DuckDB ``isodow - 1`` — their ``dow`` zero-points
    differ)."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("q109_events")
    return spark.sql(
        """
        WITH per_user AS (
          SELECT user_id, event_type,
                 BIT_OR(1 << weekday(ts)) AS active_mask
          FROM q109_events GROUP BY user_id, event_type
        )
        SELECT event_type, active_mask,
               bit_count(active_mask) AS n_active_days,
               COUNT(*) AS n_users
        FROM per_user GROUP BY event_type, active_mask
        """
    )


_Q110_SQL = """
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS cents
      FROM {src} GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
      FROM spend
    )
    SELECT decile,
           COUNT(*) AS n_customers,
           CAST(SUM(cents) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(cents) AS DOUBLE)
                 / CAST(SUM(SUM(cents)) OVER () AS DOUBLE), 6) AS share,
           ROUND(CAST(SUM(SUM(cents)) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(SUM(SUM(cents)) OVER () AS DOUBLE), 6) AS cum_share,
           CASE
             WHEN CAST(SUM(SUM(cents)) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / CAST(SUM(SUM(cents)) OVER () AS DOUBLE) <= 0.80 THEN 'A'
             WHEN CAST(SUM(SUM(cents)) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / CAST(SUM(SUM(cents)) OVER () AS DOUBLE) <= 0.95 THEN 'B'
             ELSE 'C'
           END AS abc_class
    FROM ranked GROUP BY decile
"""


@query("q110_decile_lift", oracle=_Q110_SQL.format(src="orders"))
def q110_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / lift-chart analysis: customers NTILE'd into spend
    deciles, each decile's revenue share, cumulative share, and an
    A/B/C classification at the 80/95% cut — the 'do 20% of customers
    drive 80% of revenue' question. The NTILE runs over the per-customer
    aggregate (O(customers), one total-order window on a frame that is
    tiny relative to the fact table — at true scale swap NTILE for a
    bucketed two-level cumsum like t20's); window-over-GROUP-BY nesting
    (``SUM(SUM(cents)) OVER``) runs on the 10-row decile result, free at
    any scale. Deterministic: NTILE ties broken by custkey, exact-cents
    ratios rounded identically."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q110_orders")
    return spark.sql(_Q110_SQL.format(src="q110_orders"))


def _s09_oracle(
    dim: int = 64,
    n_planes: int = 4,
    threshold: float = 0.25,
    n_cells: int = 16,
    per_cell: int = 5,
) -> str:
    planes = similarity._hyperplanes(dim, n_planes)
    plane_values = ",\n      ".join(
        f"({p}, {_sql_double_array(row)})" for p, row in enumerate(planes)
    )
    cents = similarity.lcg_centroids(dim, n_cells)
    cent_values = ",\n      ".join(
        f"({ci}, {_sql_double_array(row)})" for ci, row in enumerate(cents)
    )
    return f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), planes(p, plane) AS (VALUES
      {plane_values}
    ), b AS (
      SELECT v.vec_id, v.e,
             SUM(CASE WHEN list_dot_product(v.e, p.plane) >= 0
                      THEN (1::BIGINT << p.p) ELSE 0 END) AS cell0
      FROM v CROSS JOIN planes p GROUP BY v.vec_id, v.e
    ), nn AS (
      SELECT vec_id, e, cell0, sqrt(list_dot_product(e, e)) AS nrm FROM b
    ), pairs AS (
      SELECT a.vec_id AS id1, c.vec_id AS id2
      FROM nn a JOIN nn c ON a.cell0 = c.cell0 AND a.vec_id < c.vec_id
      WHERE ROUND(list_dot_product(a.e, c.e) / (a.nrm * c.nrm), 6)
            >= {threshold}
    ), edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a
    ), labels AS (
      SELECT v.vec_id,
             LEAST(v.vec_id, COALESCE(MIN(r.dst), v.vec_id)) AS cluster_id
      FROM v LEFT JOIN reach r ON r.src = v.vec_id
      GROUP BY v.vec_id
    ), reps AS (
      SELECT vec_id FROM labels WHERE vec_id = cluster_id
    ), rv AS (
      SELECT v.vec_id, v.e FROM v JOIN reps USING (vec_id)
    ), cents(cell, cvec) AS (VALUES
      {cent_values}
    ), sims AS (
      SELECT rv.vec_id, c.cell, list_dot_product(rv.e, c.cvec) AS sim
      FROM rv CROSS JOIN cents c
    ), c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims
      ) WHERE rn = 1
    ), picked AS (
      SELECT cell, vec_id,
             row_number() OVER (PARTITION BY cell
                                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS pick_rank
      FROM c_assign
    )
    SELECT CAST(cell AS INTEGER) AS cell, vec_id,
           CAST(pick_rank AS INTEGER) AS pick_rank,
           CASE WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) <= 'b'
                THEN 'train'
                WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) <= 'd'
                THEN 'val' ELSE 'test' END AS split
    FROM picked WHERE pick_rank <= {per_cell}
    """


@query("s09_curated_embeddings", oracle=_s09_oracle())
def s09_curated_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED embedding-curation chain (pipeline.curate_embeddings)
    — semantic dedup keeps one representative per SemDeDup family (d12),
    cluster-balanced selection keeps per_cell per centroid cell (s07),
    and the survivors get the deterministic md5 split (t05) — graded as
    one pipeline: the oracle replays hyperplane cells, the recursive
    component closure, rep selection, centroid assignment, hash pick
    order, AND the split rule in a single SQL statement, so a drift in
    any stage (or in how the stages hand off) breaks the hash. This is
    the vector-corpus counterpart of t16's text curation chain."""
    emb = _t(spark, sf_dir, "embeddings")
    from logverzcore_spark.pipeline import curate_embeddings

    return curate_embeddings(emb)


@query(
    "m10_wav_header_probe",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 3 < 2 THEN 'wav' ELSE 'unknown' END AS format,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(1 + doc_id % 2 AS INTEGER) END AS channels,
      CASE WHEN doc_id % 3 < 2 THEN CAST(
        CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        WHEN 2 THEN 44100 ELSE 48000 END AS BIGINT)
        END AS sample_rate,
      CASE WHEN doc_id % 3 < 2
           THEN CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END
                     AS INTEGER) END AS bits_per_sample
    FROM documents
    """,
)
def m10_wav_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free WAV metadata sniffing (``multimodal.sniff_wav_meta``)
    — m09's audio sibling: byte-exact RIFF/WAVE headers are BUILT from
    doc_id (channels, sample rate, bit depth packed little-endian at the
    canonical fmt-chunk offsets), parsed back with codegen'd binary
    expressions, and the oracle restates the expected fields
    arithmetically — the round trip breaks if either the packing or the
    parsing mis-addresses a byte. Every third doc carries non-audio
    bytes and must sniff 'unknown'."""
    from logverzcore_spark.operators.multimodal import sniff_wav_meta

    docs = _t(spark, sf_dir, "documents")
    ch = (1 + F.col("doc_id") % 2).cast("int")
    rate = (
        F.when(F.col("doc_id") % 4 == 0, 8000)
        .when(F.col("doc_id") % 4 == 1, 16000)
        .when(F.col("doc_id") % 4 == 2, 44100)
        .otherwise(48000)
        .cast("long")
    )
    bits = F.when(F.col("doc_id") % 2 == 0, 16).otherwise(24).cast("int")

    def le(c, nbytes: int):
        hexed = F.lpad(F.hex(c.cast("long")), nbytes * 2, "0")
        # reverse byte order: take hex pairs from the END forward
        pairs = [
            F.substring(hexed, (nbytes - 1 - i) * 2 + 1, 2) for i in range(nbytes)
        ]
        return F.unhex(F.concat(*pairs))

    header = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        le(F.lit(36), 4),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        le(F.lit(16), 4),  # fmt chunk size
        le(F.lit(1), 2),  # PCM
        le(ch, 2),
        le(rate, 4),
        le(rate * ch * bits / 8, 4),  # byte rate
        le(ch * bits / 8, 2),  # block align
        le(bits, 2),
    )
    payload = F.when(F.col("doc_id") % 3 < 2, header).otherwise(
        F.encode("text", "UTF-8")
    )
    return sniff_wav_meta(docs.select("doc_id", payload.alias("payload")))


# ---------------------------------------------------------------------------


def run(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return SUITE[name](spark, sf_dir)


@query(
    "t27_pii_scrub",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@mail.example.com' ||
             CASE WHEN doc_id % 2 = 0 THEN ' from 10.1.' || (doc_id % 200) || '.42' ELSE '' END ||
             CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-0173' ELSE '' END AS t
      FROM documents
    ), s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t
      FROM aug
    ), s2 AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(t, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ip,
             regexp_replace(t, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '[IP]', 'g') AS t
      FROM s1
    ), s3 AS (
      SELECT doc_id, n_email, n_ip,
             len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssn,
             regexp_replace(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g') AS t
      FROM s2
    ), s4 AS (
      SELECT doc_id, n_email, n_ip, n_ssn,
             len(regexp_extract_all(t, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS n_phone,
             regexp_replace(t, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '[PHONE]', 'g') AS t
      FROM s3
    )
    SELECT doc_id, CAST(n_email AS INT) AS n_email, CAST(n_ip AS INT) AS n_ip,
           CAST(n_ssn AS INT) AS n_ssn, CAST(n_phone AS INT) AS n_phone,
           CAST(n_email + n_ip + n_ssn + n_phone AS INT) AS n_pii,
           md5(t) AS clean_md5
    FROM s4
    """,
)
def t27_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (text.pii_scrub): the pre-export redaction pass. The
    synthetic corpus carries no real PII, so the graded round trip
    INJECTS it deterministically (doc_id-derived email for every doc,
    dotted-quad / SSN-shaped / phone strings on residue classes), runs
    the ordered category chain (email -> ip -> ssn -> phone, counts
    sequentially exclusive exactly like the redaction), and hashes the
    cleaned text — the oracle restates construction, chain, and order
    in RE2; any divergence in pattern, order, or replace-all semantics
    breaks the hash. Every step is a codegen'd regexp projection: zero
    shuffle at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" from 10.1."),
                    (F.col("doc_id") % 200).cast("string"), F.lit(".42"),
                ),
            ).otherwise(""),
            F.when(F.col("doc_id") % 3 == 0, " ssn 123-45-6789").otherwise(""),
            F.when(F.col("doc_id") % 5 == 0, " call 415-555-0173").otherwise(""),
        ).alias("text"),
    )
    return text.pii_scrub(aug).select(
        "doc_id", "n_email", "n_ip", "n_ssn", "n_phone", "n_pii",
        F.md5("clean").alias("clean_md5"),
    )


@query(
    "t28_chunk_documents",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sz AS (
      SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) > 0
    ), ch AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CASE WHEN n <= 24 THEN 1
                             ELSE CAST(ceil((n - 24) * 1.0 / 16) AS INT) + 1 END),
               i -> struct_pack(
                 chunk_id := CAST(i AS INT),
                 n_tokens := CAST(least(24, n - i * 16) AS INT),
                 chunk_text := array_to_string(t[i*16+1 : i*16+24], ' ')
               ))) AS c
      FROM sz
    )
    SELECT doc_id, c.chunk_id AS chunk_id, c.n_tokens AS n_tokens,
           c.chunk_text AS chunk_text
    FROM ch
    """,
)
def t28_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (text.chunk_documents,
    size=24/stride=16 -> 8-token overlap): the RAG/context-prep
    primitive, graded hash-exact against a SQL restatement of the
    window arithmetic. In-row transform + explode — no shuffle; output
    rows are the chunks themselves."""
    docs = _t(spark, sf_dir, "documents")
    return text.chunk_documents(docs, size=24, stride=16)


@query(
    "t29_blocklist_filter",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(t, x -> x IN ('data', 'spark', 'slow'))) AS INT)
             AS n_blocked,
           ROUND(len(list_filter(t, x -> x IN ('data', 'spark', 'slow'))) * 1.0
                 / greatest(len(t), 1), 6) AS blocked_ratio,
           (len(list_filter(t, x -> x IN ('data', 'spark', 'slow'))) * 1.0
                 / greatest(len(t), 1)) <= 0.08 AS keep
    FROM tok
    """,
)
def t29_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-blocklist content filter (text.blocklist_profile): per-doc
    blocked-token count/ratio + keep verdict. The synthetic corpus has
    no unsafe terms, so the graded list uses common corpus words
    ('data','spark','slow') to exercise non-trivial counts and both
    verdict branches at max_ratio=0.08. One codegen'd projection —
    zero shuffle at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    return text.blocklist_profile(
        docs, terms=("data", "spark", "slow"), max_ratio=0.08
    )


@query(
    "t30_source_quota_cap",
    oracle="""
    SELECT doc_id, source, n_chars, CAST(source_rank AS INT) AS source_rank
    FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS source_rank
      FROM documents
    )
    WHERE source_rank <= 10
    """,
)
def t30_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (text.source_quota_cap): keep the 10 largest
    docs per source — the domain-balancing rule of crawl curation (no
    host may dominate the corpus). One shuffle on the source key; the
    deterministic (n_chars DESC, doc_id) order makes the cut
    hash-verifiable."""
    docs = _t(spark, sf_dir, "documents")
    return text.source_quota_cap(docs, quota=10)


@query(
    "st21_streaming_quota_cap",
    oracle="""
    SELECT doc_id, source, n_chars, CAST(source_rank AS INT) AS source_rank
    FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS source_rank
      FROM documents
    )
    WHERE source_rank <= 10
    """,
)
def st21_streaming_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental per-source quota cap: the t30 domain
    balancer maintained continuously (streaming/rollup.make_quota_fold).
    Top-N-per-key is a monotone fold, so the maintained state always
    equals the batch answer over everything seen — which is exactly
    what this oracle states in SQL. Multi-batch merge, eviction, and
    per-row replay idempotence are pytest-covered
    (test_quota_fold_incremental_equals_batch)."""
    import uuid as _uuid

    from logverzcore_spark.streaming.rollup import incremental_quota_cap

    stream = _docs_stream(spark, sf_dir)
    state = f"quota_state_{_uuid.uuid4().hex[:8]}"
    q = incremental_quota_cap(spark, stream, state, quota=10)
    q.awaitTermination()
    return spark.table(state).select("doc_id", "source", "n_chars", "source_rank")
