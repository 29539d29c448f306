"""Relational core entries (q*): the SURVEY §2.5 query surface.

Split from the flat suite.py (r6); entries register into the shared
SUITE/ORACLES dicts via the @query decorator from suite.common.
"""

from __future__ import annotations

from logverzcore_spark.suite.common import *  # noqa: F401,F403

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
           CAST(SUM(CASE WHEN CAST(b.c AS DOUBLE) < p.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN CAST(b.c AS DOUBLE) > p.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(LEAST(GREATEST(b.c, CAST(CEIL(p.lo) AS BIGINT)),
                     CAST(FLOOR(p.hi) AS BIGINT))) AS BIGINT) AS clipped_sum_cents,
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
    "q81_late_ship_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
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
           CAST(SUM(CASE WHEN EXTRACT(hour FROM lt) BETWEEN 9 AND 17
                    THEN 1 ELSE 0 END) AS BIGINT) AS business_hours_events,
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
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_missing_priority
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
      CAST(SUM(CASE WHEN a.p IS NOT DISTINCT FROM b.p THEN 1 ELSE 0 END)
        AS BIGINT) AS n_null_safe_eq,
      CAST(SUM(CASE WHEN a.p = b.p THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq,
      CAST(SUM(CASE WHEN a.p IS DISTINCT FROM b.p THEN 1 ELSE 0 END)
        AS BIGINT) AS n_distinct_from
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
           CAST(SUM(CASE WHEN l_discount = 0 THEN NULL
                    ELSE CAST(FLOOR(l_quantity / l_discount) AS BIGINT) END)
             AS BIGINT) AS sum_qty_per_disc,
           CAST(SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
           CAST(SUM(TRY_CAST(CASE WHEN l_linenumber <= 4
                             THEN CAST(l_linenumber AS VARCHAR)
                             ELSE 'seven' END AS BIGINT)) AS BIGINT) AS sum_parsed
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
    # Guard sizing + save/restore live in _run_recursive_chain (r6:
    # extracted so pytest can drive the same path at a synthetic >1M-row
    # scale the static default would reject).
    return _run_recursive_chain(spark, edges)


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
           CAST(SUM(CASE WHEN ABS(d.v - s.med) > 3 * s.mad THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers
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


@query("q111_zorder_cluster_stats", oracle=_q111_oracle())
def q111_zorder_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key (export.zorder_key): the Morton
    interleave behind multi-dimensional data layout (Delta/Iceberg
    OPTIMIZE ZORDER) as pure codegen arithmetic — quantize
    (l_partkey, l_suppkey) onto a 2^16 grid between their exact global
    bounds, interleave the bits, bucket rows by the key's top byte,
    and report each bucket's row count and BOTH columns' min/max
    envelopes. The envelopes are the point: a Z-bucket bounds every
    clustered column at once (the oracle restates quantization,
    all 32 shift/and/or interleave terms, and the bucketing in SQL —
    any drift in the bit math breaks the hash). The write-side
    operator (export_zordered: range-shard on the key, in-task sort,
    bounded files) is pytest-graded on measured file-envelope
    narrowing vs a single-column sort."""
    from logverzcore_spark import export

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    row = li.agg(
        F.min("l_partkey").alias("plo"), F.max("l_partkey").alias("phi"),
        F.min("l_suppkey").alias("slo"), F.max("l_suppkey").alias("shi"),
    ).first()
    bounds = [
        (float(row["plo"]), float(row["phi"])),
        (float(row["slo"]), float(row["shi"])),
    ]
    keyed = li.withColumn(
        "zkey",
        export.zorder_key(
            [F.col("l_partkey"), F.col("l_suppkey")], bounds, bits=16
        ),
    )
    return keyed.groupBy(
        F.shiftright("zkey", 24).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
        F.min("zkey").alias("min_zkey"),
        F.max("zkey").alias("max_zkey"),
    )


@query(
    "q112_compaction_roundtrip",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(SUM(value), 4) AS total_value,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events
    GROUP BY event_type
    """,
)
def q112_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (export.compact_files): events written as
    64 deliberately tiny part files, compacted in one sized-from-
    measured-bytes rewrite + atomic directory swap, then read back —
    the oracle grades the per-type profile of the COMPACTED copy
    against the source table, so any row lost, duplicated, or mangled
    by the rewrite/swap breaks the hash. File-count and clustering
    assertions live in pytest (test_compact_files_*)."""
    import shutil
    import tempfile
    import uuid

    from logverzcore_spark import export

    ev = _t(spark, sf_dir, "events")
    path = os.path.join(tempfile.gettempdir(), f"q112_compact_{uuid.uuid4().hex[:8]}")
    try:
        ev.repartition(64).write.mode("overwrite").parquet(path)
        stats = export.compact_files(spark, path, target_file_bytes=256 * 1024 * 1024)
        assert stats["files_after"] < stats["files_before"], stats
        out = (
            spark.read.parquet(path)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 4).alias("total_value"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "q113_point_delete",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE event_id % 97 <> 0
    GROUP BY event_type
    """,
)
def q113_point_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style point deletes (export.delete_rows): events staged as a
    many-file copy, every 97th event_id deleted via the touched-file-only
    rewrite (locate with a pruned id+file scan, anti-join rewrite of just
    those files, file-level swap), then the surviving content is graded
    against the source minus the delete predicate — a row left behind,
    double-deleted, or lost from an untouched file breaks the hash.
    File-level invariants (untouched files byte-identical, rewrite count
    bounded) are pytest-graded (test_delete_rows_*)."""
    import shutil
    import tempfile
    import uuid

    from logverzcore_spark import export

    ev = _t(spark, sf_dir, "events")
    path = os.path.join(tempfile.gettempdir(), f"q113_del_{uuid.uuid4().hex[:8]}")
    try:
        ev.repartition(16).write.mode("overwrite").parquet(path)
        doomed = ev.where(F.col("event_id") % 97 == 0).select("event_id")
        stats = export.delete_rows(spark, path, doomed, "event_id")
        assert stats["files_rewritten"] >= 1, stats
        out = (
            spark.read.parquet(path)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
                F.min("event_id").alias("min_id"),
                F.max("event_id").alias("max_id"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "q114_scd2_history",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ), ch AS (
      SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    ), v AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS INTEGER) AS version
      FROM ch
    )
    SELECT user_id, event_type, valid_from, valid_to,
           valid_to IS NULL AS is_current, version
    FROM v
    """,
)
def q114_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD build (eventops.scd2_history): each user's event_type
    observation stream collapsed into versioned half-open validity
    intervals — re-assertions of the same state are not new versions;
    the open version carries is_current. One key shuffle; change-lag,
    interval-lead, and versioning all ride the same window sort (no
    self-join — the naive SCD2 build is quadratic). st09 keeps only the
    latest row per key; this keeps the history a point-in-time join
    needs."""
    from logverzcore_spark.operators import eventops

    ev = _t(spark, sf_dir, "events")
    return eventops.scd2_history(
        ev, key_col="user_id", ts_col="ts", attr_cols=["event_type"],
        tie_col="event_id",
    )


@query(
    "q115_time_weighted_avg",
    oracle="""
    WITH o AS (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
             (epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))
              - epoch_us(ts)) // 1000 AS dt
      FROM events
    )
    SELECT user_id, CAST(COUNT(*) AS INTEGER) AS n_intervals,
           CAST(SUM(dt) AS BIGINT) AS total_ms,
           ROUND(SUM(c * dt) / (100.0 * SUM(dt)), 6) AS twa
    FROM o WHERE dt IS NOT NULL GROUP BY user_id
    """,
)
def q115_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over irregular samples
    (eventops.time_weighted_avg): gauge semantics — each value holds
    until the user's next event; weighted sums are exact BIGINTs
    (integer cents x integer milliseconds, any aggregation order), one
    final IEEE division. One key shuffle, interval lead on a single
    window sort."""
    from logverzcore_spark.operators import eventops

    ev = _t(spark, sf_dir, "events")
    return eventops.time_weighted_avg(
        ev, key_col="user_id", ts_col="ts", value_col="value", tie_col="event_id"
    )


@query(
    "q116_bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lineitems,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100 AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q116_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed storage — THE answer to
    the repeated-big-join problem at 100 TB: both fact tables are written
    ONCE bucketed (+ bucket-sorted) on the join key, and every subsequent
    join on that key reads pre-partitioned buckets with ZERO exchange on
    either side (pytest test_bucketed_tables_join_without_shuffle asserts
    the plan carries no Exchange; here the oracle grades that the
    bucketed copies' join answer is byte-identical to a plain join on the
    source parquet). Broadcast is pinned off inside the entry (restored
    after) so the graded plan is the sort-merge-on-buckets shape the big
    ends of a real cluster would take; revenue is per-row-rounded integer
    cents so any aggregation order hash-matches."""
    import uuid as _uuid

    tag = _uuid.uuid4().hex[:8]
    t_orders, t_li = f"q116_orders_{tag}", f"q116_lineitem_{tag}"
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(t_orders)
        )
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(t_li)
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cents = F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
        ).cast("bigint")
        out = (
            spark.table(t_orders)
            .join(
                spark.table(t_li),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lineitems"),
                F.countDistinct("o_orderkey").alias("n_orders"),
                (F.sum(cents).cast("double") / 100).alias("revenue"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        if prev_bc is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
    return out


@query(
    "q117_orc_roundtrip",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000
             AS total_value,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE event_id % 5 <> 0
    GROUP BY event_type
    """,
)
def q117_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second columnar storage format: events written to ORC (Spark's
    built-in native ORC source), read back with a pushed predicate, and
    profiled per type — the oracle grades the ORC copy against the
    parquet source, so any value/type/timestamp mangled by the ORC
    write/read path (timestamps are the classic casualty) breaks the
    hash. The filter on the ORC scan verifies predicate pushdown works
    on the second format too (asserted in pytest test_orc_scan_pushdown);
    value sums are per-row-rounded integer units for order-independent
    equality."""
    import shutil
    import tempfile
    import uuid as _uuid

    ev = _t(spark, sf_dir, "events")
    path = os.path.join(tempfile.gettempdir(), f"q117_orc_{_uuid.uuid4().hex[:8]}")
    try:
        ev.write.mode("overwrite").orc(path)
        units = F.floor(F.col("value") * 10000 + 0.5).cast("bigint")
        out = (
            spark.read.orc(path)
            .where(F.col("event_id") % 5 != 0)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                (F.sum(units).cast("double") / 10000).alias("total_value"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
                F.min("event_id").alias("min_id"),
                F.max("event_id").alias("max_id"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "q118_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT p_partkey, p_retailprice AS x, p_size AS y FROM part
    )
    SELECT x, y, COUNT(*) AS n_points, CAST(MIN(p_partkey) AS BIGINT) AS min_id
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.x <= p.x AND q.y >= p.y AND (q.x < p.x OR q.y > p.y)
    )
    GROUP BY x, y
    """,
)
def q118_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier / 2-D skyline over parts — cheapest-price vs
    largest-size non-dominated points (eventops.pareto_frontier_2d).
    The oracle is the textbook quadratic NOT-EXISTS dominance self-join;
    the Spark side computes the identical set as a distinct-x collapse +
    two-level distributed prefix-max (range slices, per-slice running
    max, n_ranges-row offset fold) — no self-join anywhere, the shape
    that survives 100 TB. Strict dominance: co-located duplicates stay
    (counted), same-price-smaller-size and same-size-higher-price drop."""
    from logverzcore_spark.operators import eventops

    part = _t(spark, sf_dir, "part")
    return eventops.pareto_frontier_2d(
        part, x_col="p_retailprice", y_col="p_size", id_col="p_partkey"
    )


_PAGERANK_ITER = """, inbox{k} AS (
      SELECT e.dst, SUM(p.score // o.od) AS in_sum
      FROM edges e JOIN outdeg o ON e.src = o.src
      JOIN it{p} p ON p.node = e.src
      GROUP BY e.dst
    ), it{k} AS (
      SELECT n.node,
             CAST(150000 + (85 * COALESCE(i.in_sum, 0)) // 100 AS BIGINT) AS score
      FROM nodes n LEFT JOIN inbox{k} i ON n.node = i.dst
    )"""

_PAGERANK_ORACLE = (
    """
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS src, 100000 + l_partkey AS dst FROM lineitem
      UNION
      SELECT DISTINCT 100000 + l_partkey AS src, l_suppkey AS dst FROM lineitem
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst AS node FROM edges
    ), outdeg AS (
      SELECT src, COUNT(*) AS od FROM edges GROUP BY src
    ), it0 AS (
      SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes
    )"""
    + "".join(_PAGERANK_ITER.format(k=k, p=k - 1) for k in range(1, 6))
    + "\n    SELECT node, score FROM it5"
)


@query("q119_pagerank", oracle=_PAGERANK_ORACLE)
def q119_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank (graph.pagerank_fixed_point), 5 rounds over
    the supplier↔part bipartite graph induced by lineitem (both edge
    directions, part ids offset into their own namespace). All
    arithmetic is scaled-integer with truncating division on positive
    operands, so Spark's ``div`` and DuckDB's ``//`` agree bit-for-bit
    and the oracle simply UNROLLS the five iterations as chained CTEs —
    an iterative driver-loop algorithm graded hash-exact, like s13's
    Lloyd refinement. Each round is one src join (broadcastable score
    side; bucket edges by src at real scale) + one dst aggregation
    shuffle; the driver never collects."""
    from logverzcore_spark.operators import graph

    li = _t(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_suppkey").alias("src"), (100000 + F.col("l_partkey")).alias("dst")
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return graph.pagerank_fixed_point(edges, n_iter=5)


@query(
    "q120_rank_movers",
    oracle="""
    WITH m AS (
      SELECT o_custkey,
             CAST(EXTRACT(year FROM o_orderdate) * 100
                  + EXTRACT(month FROM o_orderdate) AS INTEGER) AS ym,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    ), r AS (
      SELECT o_custkey, ym,
             CAST(cents AS DOUBLE) / 100 AS revenue,
             CAST(dense_rank() OVER (PARTITION BY ym
                  ORDER BY cents DESC, o_custkey) AS INTEGER) AS rnk
      FROM m
    ), l AS (
      SELECT *, lag(rnk) OVER (PARTITION BY o_custkey ORDER BY ym) AS prev_rnk,
                lag(ym) OVER (PARTITION BY o_custkey ORDER BY ym) AS prev_ym
      FROM r
    )
    SELECT o_custkey AS custkey, ym, revenue, rnk,
           CAST(prev_ym AS INTEGER) AS prev_ym,
           CAST(prev_rnk AS INTEGER) AS prev_rnk,
           CAST(prev_rnk - rnk AS INTEGER) AS rank_gain
    FROM l WHERE prev_rnk IS NOT NULL
    """,
)
def q120_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period rank movers — the movers-and-shakers report:
    customers ranked by monthly revenue (dense rank on exact integer
    cents, id tie-break), each month's rank compared to the customer's
    PREVIOUS active month via lag, positive gain = climbed. Two window
    passes on different keys (month for the rank, customer for the
    lag) — each is one shuffle; the month grain keeps both frames far
    smaller than the fact table."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_custkey"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("ym"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias("cents")
    )
    w_rank = Window.partitionBy("ym").orderBy(F.col("cents").desc(), F.col("o_custkey"))
    w_lag = Window.partitionBy("o_custkey").orderBy("ym")
    r = m.select(
        "o_custkey", "ym",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        F.dense_rank().over(w_rank).cast("int").alias("rnk"),
    )
    out = r.select(
        F.col("o_custkey").alias("custkey"), "ym", "revenue", "rnk",
        F.lag("ym").over(w_lag.orderBy("ym")).cast("int").alias("prev_ym"),
        F.lag("rnk").over(w_lag.orderBy("ym")).cast("int").alias("prev_rnk"),
    )
    return out.where(F.col("prev_rnk").isNotNull()).withColumn(
        "rank_gain", (F.col("prev_rnk") - F.col("rnk")).cast("int")
    )


@query(
    "q121_merge_changes",
    oracle="""
    WITH init AS (
      SELECT user_id, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_id % 3 <> 0
    ), target0 AS (
      SELECT user_id, ts, value, event_id FROM init WHERE rn = 1
    ), ch AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN event_id % 11 = 0 THEN 'delete' ELSE 'upsert' END AS op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_id % 3 = 0
    ), chl AS (
      SELECT * FROM ch WHERE rn = 1
    ), merged AS (
      SELECT t.user_id, t.ts, t.value, t.event_id
      FROM target0 t LEFT JOIN chl c ON t.user_id = c.user_id
      WHERE c.user_id IS NULL
      UNION ALL
      SELECT user_id, ts, value, event_id FROM chl WHERE op <> 'delete'
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, ts,
           ROUND(value, 4) AS value, CAST(event_id AS BIGINT) AS event_id
    FROM merged
    """,
)
def q121_merge_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch three-way MERGE (upsert.apply_changes): a user-profile
    table bootstrapped from the pre-cutover events (latest per user),
    then an op-typed change set (every third event; every 11th of
    those a DELETE) merged in ONE pass — update + insert + delete with
    only the touched hash buckets read and dynamically overwritten.
    The oracle replays the collapse-to-latest-change and the
    matched-update / not-matched-insert / delete semantics; any key
    left behind, resurrected, or double-applied breaks the hash."""
    import uuid as _uuid

    from logverzcore_spark.streaming.upsert import BUCKET_COL, apply_changes

    table = f"q121_profiles_{_uuid.uuid4().hex[:8]}"
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    try:
        initial = ev.where(F.col("event_id") % 3 != 0).withColumn("op", F.lit("upsert"))
        apply_changes(spark, table, initial, "user_id", "ts", tie_cols=["event_id"])
        changes = ev.where(F.col("event_id") % 3 == 0).withColumn(
            "op",
            F.when(F.col("event_id") % 11 == 0, F.lit("delete")).otherwise(
                F.lit("upsert")
            ),
        )
        stats = apply_changes(spark, table, changes, "user_id", "ts", tie_cols=["event_id"])
        assert stats["touched_buckets"] > 0, stats
        out = (
            spark.table(table)
            .select("user_id", "ts", F.round("value", 4).alias("value"), "event_id")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    return out


@query(
    "q122_triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), tri AS (
      SELECT e1.x AS x, e1.y AS y, e2.y AS z
      FROM e e1
      JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
      JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y
    ), corners AS (
      SELECT x AS vertex FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT vertex, count(*) AS triangles FROM corners GROUP BY vertex
    """,
)
def q122_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counting (graph.triangle_count) over the
    parts-co-ordered-together graph (edge = two parts sharing an
    order). The operator orients edges by (degree, id) — Cohen's
    MapReduce triangle algorithm — bounding the wedge join at
    O(m^1.5) where the oracle's naive id-ordered 3-way join is fine
    only at oracle scale; both count each triangle exactly once, so
    the per-corner counts hash-match."""
    from logverzcore_spark.operators import graph

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    return graph.triangle_count(pairs)


@query(
    "q124_xml_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS odate,
           o_orderpriority || ' <mark> & "x" ' || o_orderstatus AS note,
           CAST(NULL AS VARCHAR) AS _corrupt_record
    FROM orders
    """,
)
def q124_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion round-trip (sources.readers.parse_xml_column over
    Spark 4's native StaxXmlParser): each order is serialized to an XML
    record (to_xml — entity-escaping the injected <mark> & "x" payload)
    and parsed back through the PERMISSIVE + corrupt-column reader path.
    The oracle is the identity on the source columns, so any escaping,
    type-coercion, or parser loss breaks the hash; _corrupt_record must
    come back NULL for every row. Zero shuffle — both directions are
    per-row projections."""
    from logverzcore_spark.sources import readers

    orders = _t(spark, sf_dir, "orders")
    rec = F.struct(
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.concat(
            F.col("o_orderpriority"), F.lit(' <mark> & "x" '), F.col("o_orderstatus")
        ).alias("note"),
    )
    xml = orders.select("o_orderkey", F.to_xml(rec).alias("xml"))
    parsed = readers.parse_xml_column(
        xml,
        "xml",
        "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE,"
        " odate STRING, note STRING",
    )
    return parsed.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "odate",
        "note",
        "_corrupt_record",
    )


@query(
    "q125_variant_extract",
    oracle="""
    SELECT event_id,
           event_type AS etype,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS vcents,
           CAST(user_id % 10 AS BIGINT) AS tag0,
           CAST(user_id % 7 AS BIGINT) AS tag1,
           CAST(NULL AS BIGINT) AS missing
    FROM events
    """,
)
def q125_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path extraction (Spark 4's native
    shredded-binary JSON type — the OLAP answer to schemaless props
    columns, vs string get_json_object reparsing per access): each
    event's columns are serialized to nested JSON, parsed ONCE with
    parse_json into a VARIANT, then typed paths are extracted
    (object field, nested field, array index, and a missing path that
    must yield NULL via try_variant_get, not an error). The oracle is
    the identity on the source columns, so any parse/extraction/type
    coercion loss breaks the hash. Pure per-row projections — zero
    shuffle."""
    ev = _t(spark, sf_dir, "events")
    js = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.struct(
                F.col("event_type").alias("type"),
                F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vcents"),
            ).alias("meta"),
            F.array(
                (F.col("user_id") % 10).cast("long"),
                (F.col("user_id") % 7).cast("long"),
            ).alias("tags"),
        )
    )
    v = ev.select("event_id", F.parse_json(js).alias("v"))
    return v.select(
        "event_id",
        F.try_variant_get("v", "$.meta.type", "string").alias("etype"),
        F.try_variant_get("v", "$.meta.vcents", "long").alias("vcents"),
        F.try_variant_get("v", "$.tags[0]", "long").alias("tag0"),
        F.try_variant_get("v", "$.tags[1]", "long").alias("tag1"),
        F.try_variant_get("v", "$.nope.deep", "long").alias("missing"),
    )


@query(
    "q126_ohlc_downsample",
    oracle="""
    WITH e AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
             event_type, ts, event_id,
             CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY hour_ts, event_type
                                ORDER BY ts ASC, event_id ASC) AS rk_open,
             row_number() OVER (PARTITION BY hour_ts, event_type
                                ORDER BY ts DESC, event_id DESC) AS rk_close
      FROM e
    )
    SELECT hour_ts, event_type,
           MAX(CASE WHEN rk_open = 1 THEN cents END) AS open_cents,
           MAX(cents) AS high_cents,
           MIN(cents) AS low_cents,
           MAX(CASE WHEN rk_close = 1 THEN cents END) AS close_cents,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS volume_cents
    FROM r GROUP BY hour_ts, event_type
    """,
)
def q126_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series OHLC downsampling (the hypertable-rollup shape a
    monitoring/market pipeline renders): per (hour, event_type) bucket,
    the opening and closing values — earliest/latest by (ts, event_id)
    via ``min_by``/``max_by`` on the struct ordering key — plus
    high/low/volume in exact integer cents. Plan: ONE exchange with the
    partial aggregate BEFORE it (map-side combine shrinks the shuffle
    from n events to n buckets — the property a row_number window can
    never have), no Window; the struct ordering key costs a
    SortAggregate fallback (struct buffers aren't hash-mutable — a
    q50-style single-long pack would need 66 bits here, so the
    bucket-key-local sort is the honest price of the exact tie-break).
    The oracle replays the tie-break with two window ranks."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    staged = ev.select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_ts"
        ),
        "event_type",
        F.struct(F.col("ts"), F.col("event_id")).alias("_k"),
        cents.alias("_c"),
    )
    return staged.groupBy("hour_ts", "event_type").agg(
        F.min_by("_c", "_k").alias("open_cents"),
        F.max("_c").alias("high_cents"),
        F.min("_c").alias("low_cents"),
        F.max_by("_c", "_k").alias("close_cents"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_c").cast("long").alias("volume_cents"),
    )


@query(
    "q127_avro_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           length(text) AS n_text,
           CAST(NULL AS VARCHAR) AS _corrupt_record
    FROM documents
    """,
)
def q127_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro ingestion round-trip (sources.avro_ocf.read_avro): the
    documents table is serialized to REAL Avro object container files —
    one null-codec, one raw-deflate, exercising both block codecs and
    the multi-file schema-consistency check — then read back through
    the avro source (native spark-avro when on the classpath, the
    self-contained binaryFile + mapInPandas OCF decoder here) with the
    CSV path's quarantine contract. The oracle is the identity on the
    source columns, so any varint/zigzag/union/codec loss breaks the
    hash; _corrupt_record must come back NULL for every row. Fixture
    build is driver-side and bounded by the suite SF (the m13
    build-and-parse pattern); the READ is the graded artifact — a
    binaryFile scan decoded one file per task, which at 100 TB
    distributes by file exactly like the ZIP path."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.sources.avro_ocf import encode_ocf, read_avro

    docs = _t(spark, sf_dir, "documents")
    rows = sorted(
        (r.asDict() for r in docs.collect()), key=lambda r: r["doc_id"]
    )
    avro_schema = {
        "type": "record",
        "name": "document",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": ["null", "string"]},
            {"name": "lang", "type": ["null", "string"]},
            {"name": "source", "type": ["null", "string"]},
            {"name": "n_chars", "type": ["null", "long"]},
        ],
    }
    path = os.path.join(tempfile.gettempdir(), f"q127_avro_{_uuid.uuid4().hex[:8]}")
    os.makedirs(path)
    try:
        half = len(rows) // 2
        with open(os.path.join(path, "part-0.avro"), "wb") as fh:
            fh.write(encode_ocf(rows[:half], avro_schema, codec="null"))
        with open(os.path.join(path, "part-1.avro"), "wb") as fh:
            fh.write(encode_ocf(rows[half:], avro_schema, codec="deflate"))
        out = (
            read_avro(spark, path)
            .select(
                "doc_id",
                "lang",
                "source",
                "n_chars",
                F.length("text").alias("n_text"),
                "_corrupt_record",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "q129_snapshot_time_travel",
    oracle="""
    WITH v1 AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0),
    v2 AS (SELECT * FROM orders WHERE o_orderkey % 3 <= 1),
    v3 AS (SELECT * FROM orders WHERE o_orderkey % 3 <= 1
           AND o_orderstatus = 'F')
    SELECT 1 AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM v1
    UNION ALL
    SELECT 2, COUNT(*),
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT),
           CAST(MAX(o_orderkey) AS BIGINT)
    FROM v2
    UNION ALL
    SELECT 3, COUNT(*),
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT),
           CAST(MAX(o_orderkey) AS BIGINT)
    FROM v3
    """,
)
def q129_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (snapshots.SnapshotTable): version 1 appends
    a third of orders, version 2 appends another third, version 3 is a
    filtering REWRITE (overwrite — the compaction/correction shape) —
    and all three versions must still read back exactly (count, rounded
    cent total, max key per version vs the oracle's arithmetic
    restatement). Reads resolve manifests, never directory listings, so
    the v1/v2 reads are untouched by the later rewrite. Crash windows
    and vacuum are pytest-graded."""
    import tempfile
    import shutil
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"q129_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        t.append(orders.where(F.col("o_orderkey") % 3 == 0))
        t.append(orders.where(F.col("o_orderkey") % 3 == 1))
        t.overwrite(
            orders.where(
                (F.col("o_orderkey") % 3 <= 1)
                & (F.col("o_orderstatus") == "F")
            )
        )
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = None
        for v in (1, 2, 3):
            agg = t.read(spark, v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(cents).cast("long").alias("total_cents"),
                F.max("o_orderkey").cast("long").alias("max_key"),
            ).select("version", "n_rows", "total_cents", "max_key")
            out = agg if out is None else out.unionByName(agg)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q130_snapshot_incremental",
    oracle="""
    SELECT 'v1_to_v2' AS increment, COUNT(*) AS n_rows,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT 'v2_to_v3', COUNT(*),
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM orders WHERE o_orderkey % 3 = 2
    """,
)
def q130_snapshot_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot reads (SnapshotTable.read_incremental): the
    "rows added since my last run" read, answered from the MANIFEST
    file-list difference (immutable files + append-only ⇒ file diff ==
    row diff) — no corpus scan, no anti-join. Three appends; the two
    increments must each contain exactly their commit's rows (the
    oracle restates them arithmetically), and together with v1 they
    partition the corpus. The overwrite refusal is pytest-graded."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"q130_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        for k in (0, 1, 2):
            t.append(orders.where(F.col("o_orderkey") % 3 == k))
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = None
        for name, lo, hi in (("v1_to_v2", 1, 2), ("v2_to_v3", 2, 3)):
            agg = (
                t.read_incremental(spark, lo, hi)
                .agg(
                    F.lit(name).alias("increment"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(cents).cast("long").alias("total_cents"),
                )
                .select("increment", "n_rows", "total_cents")
            )
            out = agg if out is None else out.unionByName(agg)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q131_json_schema_drift",
    oracle="""
    WITH c AS (
      SELECT CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_old,
             CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new
      FROM events
    )
    SELECT 'k' AS key, 'stable' AS status,
           'number' AS types_old, 'number' AS types_new, n_old, n_new FROM c
    UNION ALL
    SELECT 'old_only', 'removed', 'string', CAST(NULL AS VARCHAR),
           n_old, CAST(0 AS BIGINT) FROM c
    UNION ALL
    SELECT 'new_only', 'added', CAST(NULL AS VARCHAR), 'boolean',
           CAST(0 AS BIGINT), n_new FROM c
    UNION ALL
    SELECT 'mut', 'type_changed', 'number', 'string', n_old, n_new FROM c
    """,
)
def q131_json_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON schema-drift report (coerce.json_schema_drift): the ingest
    monitor for a producer silently moving a semi-structured payload's
    shape. Even event_ids play last week's batch, odd this week's, with
    props rebuilt so every drift class fires: 'k' stays numeric
    (stable), 'old_only' disappears (removed), 'new_only' arrives as a
    boolean (added), 'mut' flips number→string (type_changed). The
    profile is one explode + key groupBy per side and a key-level
    full-outer join — batches never join row-to-row; the oracle
    restates all four rows and both batch counts arithmetically."""
    from logverzcore_spark.operators.coerce import json_schema_drift

    ev = _t(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    old = ev.where(F.col("event_id") % 2 == 0).select(
        F.concat(
            F.lit('{"k": '), uid, F.lit(', "old_only": "x", "mut": '), uid,
            F.lit("}"),
        ).alias("props")
    )
    new = ev.where(F.col("event_id") % 2 == 1).select(
        F.concat(
            F.lit('{"k": '), uid, F.lit(', "new_only": true, "mut": "s"}'),
        ).alias("props")
    )
    return json_schema_drift(old, new)


@query(
    "q132_snapshot_skipping",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q132_snapshot_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping read (SnapshotTable.read(where=)): commits carry
    per-file min/max/null/row stats collected at write time, and a
    selective read prunes files whose intervals provably cannot match
    BEFORE the scan — the Delta/Iceberg file-skipping design on the
    repo's manifest tables. Fixture: orders committed in three
    date-range appends (disjoint o_orderdate intervals — the layout a
    range-partitioned or Z-ordered writer produces), then one year read
    back through the stats-pruned path and aggregated; the oracle is
    the same year over the flat table, so the result proves pruning
    changed nothing while the pytest gate (test_snapshot_skipping)
    proves files were actually skipped. Parity note: the reference
    registry declares an "Indexes" facility but ships it empty
    (Logverz-Engine.json:1606-1770 'Indexes: []'); interval skipping is
    the scan-architecture realization of that intent."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"q132_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        yr = F.year("o_orderdate")
        for lo, hi in ((1995, 1997), (1997, 1999), (1999, 2002)):
            t.append(orders.where((yr >= lo) & (yr < hi)))
        pruned = t.read(
            spark,
            where={
                "o_orderdate": {"gte": "1997-01-01", "lt": "1998-01-01"}
            },
        )
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            pruned.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).alias("total_cents"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q133_incremental_mv",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q133_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized aggregate (incremental.
    IncrementalAggregate): the delta-cost refresh the full-recompute
    sweep (refresh_materialized) can't give a 100 TB source. Orders
    arrive as three snapshot appends; after EACH append the MV merges
    only that delta's partial aggregates into group-cardinality state
    (read_incremental file diff — committed history is never re-read),
    and the final state must equal the one-shot GROUP BY over
    everything (the oracle). Partials are the mergeable algebra
    (count/sum/min/max as themselves, avg as sum+count, approx-distinct
    as hll_union_agg); state lives in its own SnapshotTable, so
    refreshes are atomic tagged commits — crash replay and concurrent
    refreshers are pytest-graded (test_incremental_mv)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders").withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    )
    root = os.path.join(
        tempfile.gettempdir(), f"q133_mv_{_uuid.uuid4().hex[:8]}"
    )
    src = SnapshotTable(os.path.join(root, "src"))
    mv = IncrementalAggregate(
        src,
        os.path.join(root, "mv"),
        group_keys=["o_orderpriority"],
        aggregates={
            "n_orders": ("count", None),
            "total_cents": ("sum", "cents"),
            "min_key": ("min", "o_orderkey"),
            "max_key": ("max", "o_orderkey"),
        },
    )
    try:
        for k in (0, 1, 2):
            src.append(orders.where(F.col("o_orderkey") % 3 == k))
            mv.refresh(spark)
        out = (
            mv.result(spark)
            .select(
                "o_orderpriority",
                F.col("n_orders").cast("long").alias("n_orders"),
                F.col("total_cents").cast("long").alias("total_cents"),
                F.col("min_key").cast("long").alias("min_key"),
                F.col("max_key").cast("long").alias("max_key"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q134_snapshot_compact_skipping",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    WHERE o_orderkey >= 500 AND o_orderkey < 1000
    """,
)
def q134_snapshot_compact_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout maintenance for data skipping (SnapshotTable.compact +
    skipping_health): orders arrive in four commits each spanning the
    FULL key range (the worst-case append layout — every file interval
    overlaps every other, so the range predicate prunes nothing), then
    one range-sorted compaction restores near-disjoint intervals and
    the same read prunes. The entry asserts the health report's
    overlap actually collapsed and the pruned read got selective; the
    returned aggregate must equal the flat-table oracle — compaction
    and pruning changed the layout, never the rows."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"q134_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        for i in range(4):  # interleaved keys: full range per commit
            t.append(
                orders.where(F.col("o_orderkey") % 4 == i).repartition(3)
            )
        h0 = t.skipping_health(spark, "o_orderkey")
        where = {"o_orderkey": {"gte": 500, "lt": 1000}}
        kept0, total0 = t.prune_files(spark, where)
        assert len(kept0) == total0, "worst-case layout should not prune"
        t.compact(spark, sort_cols=["o_orderkey"], target_files=12)
        h1 = t.skipping_health(spark, "o_orderkey")
        assert h1["avg_overlap"] < h0["avg_overlap"], (h0, h1)
        kept1, total1 = t.prune_files(spark, where)
        assert len(kept1) < total1, "sorted layout must prune"
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(spark, where=where)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).cast("long").alias("total_cents"),
                F.min("o_orderkey").cast("long").alias("min_key"),
                F.max("o_orderkey").cast("long").alias("max_key"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q135_snapshot_schema_evolution",
    oracle="""
    WITH unioned AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
               AS priority
      FROM orders
    )
    SELECT COALESCE(priority, '<pre-column>') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM unioned
    GROUP BY 1
    ORDER BY 1
    """,
)
def q135_snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-additive snapshot schema evolution: commit 1 appends
    orders WITHOUT the priority column, commit 2 adds it — the manifest
    records the union schema, so the full read returns the column with
    nulls for pre-column rows instead of Spark's default
    sample-one-file behavior (which silently DROPS whichever side the
    sampled file lacks). The oracle restates the union: even keys are
    the pre-column commit (null priority), odd keys carry it. Type
    conflicts and time-travel shapes are pytest-graded
    (test_snapshot_skipping)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"q135_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        t.append(
            orders.where(F.col("o_orderkey") % 2 == 0).select("o_orderkey")
        )
        t.append(
            orders.where(F.col("o_orderkey") % 2 == 1).select(
                "o_orderkey", F.col("o_orderpriority").alias("priority")
            )
        )
        out = (
            t.read(spark)
            .groupBy(
                F.coalesce(F.col("priority"), F.lit("<pre-column>")).alias(
                    "priority"
                )
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.max("o_orderkey").cast("long").alias("max_key"),
            )
            .orderBy("priority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q136_bloom_point_lookup",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           o_orderpriority
    FROM orders
    WHERE o_orderkey IN (100, 777, 1200)
    ORDER BY o_orderkey
    """,
)
def q136_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom skipping (SnapshotTable bloom_columns): point
    lookups on a column whose layout is RANDOM — where min/max interval
    stats span everything and prune nothing — still skip every file
    whose filter proves the key absent (no false negatives ⇒ sound;
    false positives only cost a scan). The Delta bloom-index
    counterpart, with md5-based hashing byte-identical between the JVM
    build (F.md5 over CAST AS STRING) and the driver probe (hashlib
    over str). Fixture: orders committed interleaved (every commit
    spans the key range), bloom on a derived string key; three known
    keys probed through an in-list; the entry asserts files were
    actually skipped, and the oracle restates the lookup by the
    bijective integer key."""
    import hashlib as _hl
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders").withColumn(
        "okey",
        F.concat(
            F.lit("ord-"),
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12),
        ),
    )
    root = os.path.join(
        tempfile.gettempdir(), f"q136_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root, bloom_columns=["okey"])
    try:
        for i in range(4):  # interleaved: every commit spans the key space
            t.append(
                orders.where(F.col("o_orderkey") % 4 == i).repartition(3)
            )
        probes = [
            "ord-" + _hl.md5(str(key).encode("utf-8")).hexdigest()[:12]
            for key in (100, 777, 1200)
        ]
        kept, total = t.prune_files(spark, {"okey": {"in": probes}})
        assert 0 < len(kept) < total, "bloom must actually skip files"
        out = (
            t.read(spark, where={"okey": {"in": probes}})
            .select(
                F.col("o_orderkey").cast("long").alias("o_orderkey"),
                F.floor(F.col("o_totalprice") * 100 + 0.5)
                .cast("long")
                .alias("cents"),
                "o_orderpriority",
            )
            .orderBy("o_orderkey")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q137_snapshot_delete_where",
    oracle="""
    WITH b AS (
      SELECT (MAX(o_orderkey) * 3) // 10 AS lo,
             (MAX(o_orderkey) * 4) // 10 AS hi
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders, b
    WHERE o_orderkey NOT BETWEEN b.lo AND b.hi
    """,
)
def q137_snapshot_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-layer row deletes (SnapshotTable.delete_where): a
    stats-pruned SELECTIVE rewrite — only the files whose intervals
    admit the predicate are rewritten with matching rows removed;
    every other file carries into the new manifest path-identical
    (immutable files: path identity is byte identity). The GDPR /
    right-to-erasure cost model: deleting a key slice from a
    range-laid-out corpus rewrites one commit's files, not the table.
    Reference parity: q113's point-delete (controller delete flow) one
    layer down, at the versioned table. The entry asserts the rewrite
    actually skipped the non-matching files and time travel still
    reads the pre-delete count; the survivors' aggregate must equal
    the flat-table oracle with the same predicate negated (NOT
    BETWEEN)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    maxk = orders.agg(F.max("o_orderkey")).first()[0]
    lo, hi = maxk * 3 // 10, maxk * 4 // 10
    q = [maxk // 4, maxk // 2, maxk * 3 // 4]
    root = os.path.join(
        tempfile.gettempdir(), f"q137_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        ranges = [(0, q[0]), (q[0], q[1]), (q[1], q[2]), (q[2], maxk + 1)]
        for a, b in ranges:  # range layout: one commit per key quartile
            t.append(
                orders.where(
                    (F.col("o_orderkey") >= a) & (F.col("o_orderkey") < b)
                ).repartition(3)
            )
        before = t._read_manifest(spark, 4)
        n_before = t.count(spark)
        v = t.delete_where(spark, {"o_orderkey": {"between": [lo, hi]}})
        after = t._read_manifest(spark, v)
        carried = set(before["files"]) & set(after["files"])
        # [lo,hi] ⊂ quartile 2: its 3 files rewrite, the other 9 carry
        assert len(carried) == 9, (len(carried), len(before["files"]))
        assert t.count(spark, version=4) == n_before  # time travel intact
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(spark)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).cast("long").alias("total_cents"),
                F.min("o_orderkey").cast("long").alias("min_key"),
                F.max("o_orderkey").cast("long").alias("max_key"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q138_partition_scoped_compact",
    oracle="""
    SELECT CAST(o_orderkey % 2 AS INT) AS pt,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE o_custkey >= 100 AND o_custkey < 200
    GROUP BY 1
    ORDER BY 1
    """,
)
def q138_partition_scoped_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped compaction (SnapshotTable.compact(where=) +
    scoped skipping_health): partition pt=0 arrives interleaved (every
    file spans the o_custkey range — overlap saturated, predicates
    prune nothing), pt=1 arrives range-sorted (already healthy). The
    maintenance loop measures health PER PARTITION, compacts ONLY the
    drifted slice, and the healthy slice's files carry over untouched
    — the 100 TB move: a day-partition compact writes that day's
    bytes, not the table's. The entry asserts overlap collapsed in the
    target slice only, the untouched partition's files are
    path-identical, and the post-compact selective read prunes; the
    returned per-partition aggregate must equal the flat-table oracle
    — maintenance never changes rows."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders").withColumn(
        "pt", (F.col("o_orderkey") % 2).cast("int")
    )
    maxc = orders.agg(F.max("o_custkey")).first()[0]
    root = os.path.join(
        tempfile.gettempdir(), f"q138_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        p0 = orders.where("pt = 0")
        for i in range(3):  # interleaved custkeys: full range per file
            t.append(p0.where(F.col("o_custkey") % 3 == i).coalesce(1))
        p1 = orders.where("pt = 1")
        third = maxc // 3 + 1
        for j in range(3):  # range-sorted: disjoint custkey intervals
            t.append(
                p1.where(
                    (F.col("o_custkey") >= j * third)
                    & (F.col("o_custkey") < (j + 1) * third)
                ).coalesce(1)
            )
        h0 = t.skipping_health(spark, "o_custkey", where={"pt": 0})
        h1 = t.skipping_health(spark, "o_custkey", where={"pt": 1})
        assert h0["avg_overlap"] > h1["avg_overlap"], (h0, h1)
        before = t._read_manifest(spark, 6)
        p1_files = [
            f
            for f in before["files"]
            if before["stats"][f]["cols"]["pt"]["min"] == 1
        ]
        v = t.compact(
            spark, sort_cols=["o_custkey"], target_files=3, where={"pt": 0}
        )
        after = t._read_manifest(spark, v)
        assert set(p1_files) <= set(after["files"])  # untouched carry
        h0b = t.skipping_health(spark, "o_custkey", where={"pt": 0})
        assert h0b["avg_overlap"] < h0["avg_overlap"], (h0, h0b)
        assert t.skipping_health(spark, "o_custkey", where={"pt": 1}) == h1
        where = {
            "and": [{"pt": 0}, {"o_custkey": {"gte": 100, "lt": 200}}]
        }
        kept, total = t.prune_files(spark, where)
        assert len(kept) < total, "compacted slice must prune"
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(
                spark,
                where={"o_custkey": {"gte": 100, "lt": 200}},
            )
            .groupBy("pt")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).cast("long").alias("total_cents"),
            )
            .orderBy("pt")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q139_snapshot_update_where",
    oracle="""
    WITH b AS (
      SELECT (MAX(o_orderkey) * 11) // 20 AS lo,
             (MAX(o_orderkey) * 12) // 20 AS hi
      FROM orders
    )
    SELECT CASE WHEN o_orderkey BETWEEN b.lo AND b.hi
                THEN '9-REDACTED' ELSE o_orderpriority END AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders, b
    GROUP BY 1
    ORDER BY 1
    """,
)
def q139_snapshot_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-layer UPDATE (SnapshotTable.update_where): the same
    stats-pruned selective rewrite as q137's delete, applied as
    redaction — matching rows get SET applied (here a priority mask),
    their file-neighbors ride along byte-unchanged, and every
    non-matching file carries over path-identical. SQL UPDATE 3VL
    (NULL-predicate rows keep values) and type preservation are
    pytest-graded (test_merge_update); this entry hash-verifies the
    row content against the flat-table CASE WHEN oracle and asserts
    the rewrite actually skipped files. The GDPR redaction cost model:
    masking a key slice rewrites the slice's files, not the corpus."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    maxk = orders.agg(F.max("o_orderkey")).first()[0]
    lo, hi = maxk * 11 // 20, maxk * 12 // 20
    q = [maxk // 4, maxk // 2, maxk * 3 // 4]
    root = os.path.join(
        tempfile.gettempdir(), f"q139_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        ranges = [(0, q[0]), (q[0], q[1]), (q[1], q[2]), (q[2], maxk + 1)]
        for a, b in ranges:
            t.append(
                orders.where(
                    (F.col("o_orderkey") >= a) & (F.col("o_orderkey") < b)
                ).repartition(3)
            )
        before = t._read_manifest(spark, 4)
        v = t.update_where(
            spark,
            {"o_orderkey": {"between": [lo, hi]}},
            {"o_orderpriority": F.lit("9-REDACTED")},
        )
        after = t._read_manifest(spark, v)
        carried = set(before["files"]) & set(after["files"])
        # [lo,hi] ⊂ quartile 3: its 3 files rewrite, 9 carry untouched
        assert len(carried) == 9, (len(carried), len(before["files"]))
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(spark)
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).cast("long").alias("total_cents"),
            )
            .orderBy("priority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q140_snapshot_merge_upsert",
    oracle="""
    WITH b AS (
      SELECT MAX(o_orderkey) // 4 AS lo,
             MAX(o_orderkey) // 2 AS hi,
             MAX(o_orderkey) AS mx
      FROM orders
    ),
    merged AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0
                       AND o_orderkey >= b.lo AND o_orderkey < b.hi
                  THEN 'X-MERGED' ELSE o_orderpriority END AS pr,
             CASE WHEN o_orderkey % 97 = 0
                       AND o_orderkey >= b.lo AND o_orderkey < b.hi
                  THEN o_totalprice + 1000 ELSE o_totalprice END AS tp
      FROM orders, b
      UNION ALL
      SELECT b.mx + t.s, 'X-INSERTED', 100.0
      FROM b, range(1, 51) t(s)
    )
    SELECT pr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(tp * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM merged
    GROUP BY pr
    ORDER BY pr
    """,
)
def q140_snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-layer MERGE INTO (SnapshotTable.merge_into): the
    Delta/Iceberg upsert core as a selective rewrite — the CDC batch's
    keys (here: every 97th key inside quartile 2, plus 50 brand-new
    keys) are collected for an exact in-list prune, so only the files
    those keys can live in are read and rewritten; matched rows take
    the source's values for the shared non-key columns, unmatched
    source rows insert with target-only columns NULL, and the other
    three quartiles' files carry over path-identical (asserted). The
    oracle restates the merge as CASE WHEN + UNION ALL over the flat
    table. Reference parity: q114's MERGE one layer down, on the
    versioned table. 100 TB cost model: a daily upsert rewrites the
    files its keys hit, never the table."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    maxk = orders.agg(F.max("o_orderkey")).first()[0]
    q = [maxk // 4, maxk // 2, maxk * 3 // 4]
    root = os.path.join(
        tempfile.gettempdir(), f"q140_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        ranges = [(0, q[0]), (q[0], q[1]), (q[1], q[2]), (q[2], maxk + 1)]
        for a, b in ranges:
            t.append(
                orders.where(
                    (F.col("o_orderkey") >= a) & (F.col("o_orderkey") < b)
                ).repartition(3)
            )
        upd = orders.where(
            (F.col("o_orderkey") % 97 == 0)
            & (F.col("o_orderkey") >= q[0])
            & (F.col("o_orderkey") < q[1])
        ).select(
            "o_orderkey",
            F.lit("X-MERGED").alias("o_orderpriority"),
            (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        )
        ins = spark.range(1, 51).select(
            (F.lit(maxk) + F.col("id")).alias("o_orderkey"),
            F.lit("X-INSERTED").alias("o_orderpriority"),
            F.lit(100.0).alias("o_totalprice"),
        )
        before = t._read_manifest(spark, 4)
        v = t.merge_into(spark, upd.unionByName(ins), on="o_orderkey")
        after = t._read_manifest(spark, v)
        carried = set(before["files"]) & set(after["files"])
        # all upsert keys live in quartile 2 (inserts are > maxk, which
        # only that selection's rewrite absorbs): 9 of 12 files carry
        assert len(carried) == 9, (len(carried), len(before["files"]))
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(spark)
            .groupBy(F.col("o_orderpriority").alias("pr"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).cast("long").alias("total_cents"),
                F.max("o_orderkey").cast("long").alias("max_key"),
            )
            .orderBy("pr")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q141_snapshot_restore",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    WHERE o_orderkey % 3 <> 1
    """,
)
def q141_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit rollback (SnapshotTable.restore — Delta RESTORE parity):
    a bad delete lands on a two-commit table, restore() re-commits the
    pre-delete manifest verbatim as the new head (zero data I/O —
    files are immutable), and the final read must hash-match the
    flat-table oracle of the ORIGINAL two commits. In-entry asserts:
    the restored manifest's file list is byte-equal to the target's,
    the bad version stays time-travelable (auditable history reads
    [restore, delete, append, append]), and the rollback is a new
    version, never an erasure."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"q141_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        t.append(orders.where(F.col("o_orderkey") % 3 == 0).coalesce(2))
        t.append(orders.where(F.col("o_orderkey") % 3 == 2).coalesce(2))
        n_full = t.count(spark)
        t.delete_where(spark, {"o_custkey": {"lt": 1_000_000_000}})
        assert t.count(spark) < n_full  # the bad delete really landed
        v = t.restore(spark, version=2)
        assert v == 4
        m2 = t._read_manifest(spark, 2)
        m4 = t._read_manifest(spark, 4)
        assert m4["files"] == m2["files"]  # verbatim re-commit
        assert [e["op"] for e in t.history(spark)] == [
            "restore", "delete", "append", "append"
        ]
        assert t.count(spark, version=3) < n_full  # still auditable
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(spark)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).cast("long").alias("total_cents"),
                F.countDistinct("o_custkey").cast("long").alias("n_custs"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q142_snapshot_retention",
    oracle="""
    WITH cuts AS (
      SELECT CAST(FLOOR(MAX(o_orderkey) / 3.0) AS BIGINT) AS cut
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(MIN(o.o_orderkey) AS BIGINT) AS min_key,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_custs
    FROM orders o, cuts
    WHERE o.o_orderkey % 3 <> 1 AND o.o_orderkey >= cuts.cut
    """,
)
def q142_snapshot_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based vacuum retention (r11 — vacuum(older_than=), the
    Delta retention shape): a two-commit table takes a GDPR delete
    (the low THIRD of the key space — data-relative so the graded
    state is non-trivial at every SF), then
    ``vacuum(older_than=now)`` drops every version
    committed before the cutoff — the head survives (never
    age-vacuumed), the delete becomes PHYSICAL erasure (the rewritten
    pre-delete files are gone from disk, asserted in-entry), and
    timestamp travel outside the retained window raises while the
    head's own stamp still resolves. The final read hash-matches the
    flat oracle of 'both commits minus the deleted keys'. In-entry
    asserts: pre-vacuum as_of resolves to v1; post-vacuum versions ==
    [3]; every v3-referenced file still readable; every file the
    delete rewrote physically deleted. 100 TB note: retention is
    manifest-count metadata work + unreferenced-dir deletes — data
    I/O zero; the in-flight grace (orphan_grace_s) is disabled here
    because the entry is the only writer."""
    import shutil
    import tempfile
    import time as _time
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    root = os.path.join(
        tempfile.gettempdir(), f"q142_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        t.append(orders.where(F.col("o_orderkey") % 3 == 0).coalesce(2))
        ts_after_v1 = _time.time()
        _time.sleep(0.02)
        t.append(orders.where(F.col("o_orderkey") % 3 == 2).coalesce(2))
        _time.sleep(0.02)
        before = set(t._manifest(spark, 2))
        cut = int(orders.agg(F.max("o_orderkey")).first()[0]) // 3
        t.delete_where(spark, {"o_orderkey": {"lt": cut}})
        assert t.version_asof(spark, ts_after_v1) == 1  # travel works now
        rewritten = before - set(t._manifest(spark, 3))
        assert rewritten, "the delete must rewrite at least one file"
        local = lambda p: p.replace("file:", "")  # noqa: E731
        assert all(os.path.exists(local(f)) for f in rewritten)

        deleted = t.vacuum(
            spark, older_than=_time.time() + 1, orphan_grace_s=0.0
        )
        assert deleted >= 1
        assert t.versions(spark) == [3]
        # erasure is now physical: the pre-delete bytes are gone ...
        assert not any(os.path.exists(local(f)) for f in rewritten)
        # ... while every head-referenced file still reads
        assert all(os.path.exists(local(f)) for f in t._manifest(spark, 3))
        try:
            t.version_asof(spark, ts_after_v1)
            raise AssertionError("travel outside the window must raise")
        except ValueError:
            pass
        head_ca = t._read_manifest(spark, 3)["committed_at"] / 1000.0
        assert t.version_asof(spark, head_ca) == 3

        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(spark)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(cents).cast("long").alias("total_cents"),
                F.min("o_orderkey").cast("long").alias("min_key"),
                F.countDistinct("o_custkey").cast("long").alias("n_custs"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q143_change_feed",
    oracle="""
    WITH cuts AS (
      SELECT CAST(FLOOR(MAX(o_orderkey) / 4.0) AS BIGINT) AS cut_u,
             CAST(FLOOR(MAX(o_orderkey) * 3 / 8.0) AS BIGINT) AS cut_d
      FROM orders
    ),
    base AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    upd AS (
      SELECT b.* FROM base b, cuts
      WHERE b.o_orderkey % 5 = 1 AND b.o_orderkey < cuts.cut_u
    ),
    ins AS (
      SELECT o.o_orderkey, o.o_totalprice FROM orders o, cuts
      WHERE o.o_orderkey % 3 = 1 AND o.o_orderkey % 5 = 1
        AND o.o_orderkey < cuts.cut_u
    ),
    v2_state AS (
      SELECT b.o_orderkey,
             CASE WHEN b.o_orderkey % 5 = 1 AND b.o_orderkey < cuts.cut_u
                  THEN b.o_totalprice + 1000 ELSE b.o_totalprice END AS tp,
             CASE WHEN b.o_orderkey % 5 = 1 AND b.o_orderkey < cuts.cut_u
                  THEN 'CDC' ELSE b.o_orderpriority END AS pr
      FROM base b, cuts
      UNION ALL
      SELECT o_orderkey, o_totalprice AS tp, 'NEW' AS pr FROM ins
    )
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           o_orderpriority AS pr,
           'update_preimage' AS change_type, 2 AS commit_version
    FROM upd
    UNION ALL
    SELECT o_orderkey,
           CAST(floor((o_totalprice + 1000) * 100 + 0.5) AS BIGINT),
           'CDC', 'update_postimage', 2
    FROM upd
    UNION ALL
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
           'NEW', 'insert', 2
    FROM ins
    UNION ALL
    SELECT v.o_orderkey, CAST(floor(v.tp * 100 + 0.5) AS BIGINT),
           v.pr, 'delete', 3
    FROM v2_state v, cuts WHERE v.o_orderkey < cuts.cut_d
    """,
)
def q143_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed (r11 — SnapshotTable.read_changes, the Delta
    CDF read): a table takes a keyed MERGE (updates + inserts) then a
    GDPR delete, and the feed AFTER v1 must carry exactly the semantic
    row-level changes — update_preimage/update_postimage pairs for the
    merged keys, inserts for the new keys, deletes for the erased
    slice — and NOTHING for the thousands of neighbor rows the
    selective rewrites carried along unchanged (a CDF that replayed
    physical rewrites would be useless to a subscriber). Hash-verified
    against the flat oracle spelling out all four change classes.
    100 TB cost: per commit, only the removed+added files are read —
    the DML slice, never the table (asserted in-entry: the span's
    diffed file sets stay strictly smaller than the manifests)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    root = os.path.join(
        tempfile.gettempdir(), f"q143_snap_{_uuid.uuid4().hex[:8]}"
    )
    t = SnapshotTable(root)
    try:
        # range-committed base; the merge/delete keys are scoped to
        # the LOW QUARTER (cut_u = max/4) and LOW 3/8 (cut_d) of the
        # key space, so with 4 range files the high-range files must
        # CARRY through both commits at every SF — the selectivity
        # gate below is layout-sound, not fixture luck
        hi = int(orders.agg(F.max("o_orderkey")).first()[0])
        cut_u, cut_d = hi // 4, hi * 3 // 8
        t.append(
            orders.where(k % 3 == 0).select(
                "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
            ).repartitionByRange(4, "o_orderkey")
        )
        src = orders.where(
            (k % 3 == 0) & (k % 5 == 1) & (k < cut_u)
        ).select(
            k,
            (F.col("o_totalprice") + 1000).alias("o_totalprice"),
            F.lit("CDC").alias("o_orderpriority"),
        ).unionByName(
            orders.where(
                (k % 3 == 1) & (k % 5 == 1) & (k < cut_u)
            ).select(
                k, "o_totalprice", F.lit("NEW").alias("o_orderpriority"),
            )
        )
        t.merge_into(spark, src, on="o_orderkey")
        t.delete_where(spark, {"o_orderkey": {"lt": cut_d}})

        # selectivity gate: each diffed commit touched a strict subset
        m1, m2, m3 = (set(t._manifest(spark, v)) for v in (1, 2, 3))
        assert m1 & m2 and m2 & m3, "carried files must exist"
        assert len(m1 - m2) < len(m1) and len(m2 - m3) < len(m2)

        cdf = t.read_changes(spark, 1, keys="o_orderkey")
        out = (
            cdf.select(
                "o_orderkey",
                F.floor(F.col("o_totalprice") * 100 + 0.5)
                .cast("long").alias("cents"),
                F.col("o_orderpriority").alias("pr"),
                F.col("_change_type").alias("change_type"),
                F.col("_commit_version").cast("int")
                .alias("commit_version"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "q144_mv_fold_after_dml",
    oracle="""
    WITH cuts AS (
      SELECT CAST(FLOOR(MAX(o_orderkey) / 5.0) AS BIGINT) AS c1,
             CAST(FLOOR(MAX(o_orderkey) / 2.0) AS BIGINT) AS c2,
             CAST(FLOOR(MAX(o_orderkey) * 3 / 5.0) AS BIGINT) AS c3
      FROM orders
    ),
    final AS (
      SELECT CASE WHEN o.o_orderkey % 5 = 2 AND o.o_orderkey >= cuts.c2
                       AND o.o_orderkey < cuts.c3
                  THEN 'MRG' ELSE o.o_orderpriority END AS pr,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
             + CASE WHEN o.o_orderkey % 5 = 2 AND o.o_orderkey >= cuts.c2
                         AND o.o_orderkey < cuts.c3 THEN 11
                    WHEN o.o_orderkey >= cuts.c2 AND o.o_orderkey < cuts.c3
                    THEN 7 ELSE 0 END AS cents
      FROM orders o, cuts
      WHERE o.o_orderkey % 3 = 0 AND o.o_orderkey >= cuts.c1
      UNION ALL
      SELECT 'MRG-NEW' AS pr,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o, cuts
      WHERE o.o_orderkey % 3 = 1 AND o.o_orderkey % 5 = 2
        AND o.o_orderkey >= cuts.c2 AND o.o_orderkey < cuts.c3
    )
    SELECT pr, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY pr ORDER BY pr
    """,
)
def q144_mv_fold_after_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retractable MV maintenance across DML (r11 — the change-feed
    fold): a count/sum IncrementalAggregate follows its source through
    a GDPR delete, a redaction update, and a CDC merge WITHOUT ever
    rescanning the corpus — each refresh consumes read_changes and
    folds signed partials (deletes/pre-images retract, inserts/
    post-images add), asserted in-entry to run in 'fold' mode (the
    pre-r11 answer was a full rebuild for every one of these). r12
    adds the manifest-priced cost gate: each refresh row now carries
    priced_span/priced_head (the span's removed+added bytes vs the
    head's — zero-I/O arithmetic), asserted in-entry to admit the
    fold, and the DMLs here are genuinely narrow key bands of a
    16-file range layout, so the slice prices well under the head —
    exactly the 100 TB shape (a replace-the-corpus span prices ~2×
    head and rebuilds instead; pytest covers the gate's both sides).
    The final MV state hash-matches the flat oracle of the
    fully-mutated source. min/max/HLL MVs take the r12 group-scoped
    'repair' (pytest)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    work = tempfile.mkdtemp(prefix=f"q144_{_uuid.uuid4().hex[:8]}_")
    try:
        hi = int(orders.agg(F.max("o_orderkey")).first()[0])
        c1, c2, c3 = hi // 5, hi // 2, hi * 3 // 5
        t = SnapshotTable(os.path.join(work, "src"))
        base = orders.where(k % 3 == 0).select(
            k, "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long").alias("cents"),
        )
        t.append(base.repartitionByRange(16, "o_orderkey"))
        mv = IncrementalAggregate(
            t, os.path.join(work, "state"), ["o_orderpriority"],
            {"n_rows": ("count", None), "total_cents": ("sum", "cents")},
            source_keys=["o_orderkey"],
        )
        assert mv.refresh(spark)["mode"] == "initial"

        def _fold(rep):
            # the default cost gate ADMITTED the fold: slice < head
            assert rep["mode"] == "fold", rep
            assert rep["priced_span"] <= rep["priced_head"], rep

        t.delete_where(spark, {"o_orderkey": {"lt": c1}})
        _fold(mv.refresh(spark))
        t.update_where(
            spark, {"o_orderkey": {"between": [c2, c3 - 1]}},
            {"cents": "cents + 7"},
        )
        _fold(mv.refresh(spark))
        src = orders.where(
            (k % 3 == 0) & (k % 5 == 2) & (k >= c2) & (k < c3)
        ).select(
            k, F.lit("MRG").alias("o_orderpriority"),
            (
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                + 11
            ).alias("cents"),
        ).unionByName(
            orders.where(
                (k % 3 == 1) & (k % 5 == 2) & (k >= c2) & (k < c3)
            ).select(
                k, F.lit("MRG-NEW").alias("o_orderpriority"),
                F.floor(F.col("o_totalprice") * 100 + 0.5)
                .cast("long").alias("cents"),
            )
        )
        t.merge_into(spark, src, on="o_orderkey")
        _fold(mv.refresh(spark))

        out = (
            mv.result(spark)
            .select(
                F.col("o_orderpriority").alias("pr"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("total_cents").cast("long").alias("total_cents"),
            )
            .orderBy("pr")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out

@query(
    "q145_mv_repair_after_dml",
    oracle="""
    WITH cuts AS (
      SELECT MAX(o_orderkey) AS hi,
             CAST(FLOOR(MAX(o_orderkey) * 2 / 16.0) AS BIGINT) AS s1,
             CAST(FLOOR(MAX(o_orderkey) * 4 / 16.0) AS BIGINT) AS e1,
             CAST(FLOOR(MAX(o_orderkey) * 6 / 16.0) AS BIGINT) AS s2,
             CAST(FLOOR(MAX(o_orderkey) * 7 / 16.0) AS BIGINT) AS e2
      FROM orders
    ),
    final AS (
      SELECT CAST(FLOOR(o.o_orderkey * 20.0 / (c.hi + 1)) AS BIGINT) AS g,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
             + CASE WHEN o.o_orderkey >= c.s2 AND o.o_orderkey < c.e2
                    THEN 7 ELSE 0 END AS cents
      FROM orders o, cuts c
      WHERE o.o_orderkey % 3 = 0
        AND NOT (o.o_orderkey >= c.s1 AND o.o_orderkey < c.e1)
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM final GROUP BY g ORDER BY g
    """,
)
def q145_mv_repair_after_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-scoped MV REPAIR across DML (r12 — q144's twin for the
    non-retractable algebra): a min/max/count/sum IncrementalAggregate
    follows its source through a GDPR band erasure and a band
    redaction update. min/max cannot fold a retraction (the evicted
    extremum needs its runner-up) and pre-r12 the answer was a full
    rebuild; now the refresh runs in 'repair' mode — the change feed's
    affected GROUPS (and only those) are recomputed from source, every
    untouched group's state row carries, and a group whose band died
    entirely DROPS (extinction, asserted in-entry). The group key is
    a key-range bucket, so the range layout CLUSTERS groups per file
    and the repair's group-key in-list prunes the rescan to a file
    subset — asserted in-entry (0 < files_scanned < files_total),
    with a data-relative bound on repaired_groups (a 2/16-wide key
    band intersects at most 4 of the 20 buckets) and the priced gate
    admitting the span. Final MV state hash-matches the flat oracle.
    100 TB story: a narrow erasure against a min/max dashboard costs
    the DML slice + the affected groups' clustered file subset, never
    a corpus rescan — and when groups do NOT cluster, the same
    refresh honestly prices toward the rebuild instead of claiming
    slice cost."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    work = tempfile.mkdtemp(prefix=f"q145_{_uuid.uuid4().hex[:8]}_")
    try:
        hi = int(orders.agg(F.max("o_orderkey")).first()[0])
        # the erase band is 2/16 of the keyspace — wider than one
        # 1/20 bucket, so at least one bucket dies ENTIRELY
        s1, e1 = hi * 2 // 16, hi * 4 // 16
        s2, e2 = hi * 6 // 16, hi * 7 // 16
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        t = SnapshotTable(os.path.join(work, "src"))
        t.append(
            orders.where(k % 3 == 0).select(
                k,
                F.floor(k * 20 / F.lit(hi + 1)).alias("g"),
                cents.alias("cents"),
            ).repartitionByRange(16, "o_orderkey")
        )
        mv = IncrementalAggregate(
            t, os.path.join(work, "state"), ["g"],
            {
                "n_rows": ("count", None),
                "total_cents": ("sum", "cents"),
                "min_cents": ("min", "cents"),
                "max_cents": ("max", "cents"),
            },
            source_keys=["o_orderkey"],
        )
        assert mv.refresh(spark)["mode"] == "initial"
        before = {r["g"] for r in mv.result(spark).select("g").collect()}

        def _repair(rep):
            assert rep["mode"] == "repair", rep
            # a <=2/16 key band intersects at most
            # floor(20*2/16)+2 = 4 buckets
            assert 0 < rep["repaired_groups"] <= 4, rep
            assert 0 < rep["files_scanned"] < rep["files_total"], rep
            assert rep["priced_span"] <= rep["priced_head"], rep

        # GDPR erasure of one key band
        t.delete_where(spark, {"o_orderkey": {"between": [s1, e1 - 1]}})
        _repair(mv.refresh(spark))
        # extinction: buckets fully inside the erased band dropped
        after = {r["g"] for r in mv.result(spark).select("g").collect()}
        assert after < before, "erased band's interior buckets must drop"
        # redaction update on a second band
        t.update_where(
            spark, {"o_orderkey": {"between": [s2, e2 - 1]}},
            {"cents": "cents + 7"},
        )
        _repair(mv.refresh(spark))

        out = (
            mv.result(spark)
            .select(
                F.col("g").cast("long").alias("g"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("total_cents").cast("long").alias("total_cents"),
                F.col("min_cents").cast("long").alias("min_cents"),
                F.col("max_cents").cast("long").alias("max_cents"),
            )
            .orderBy("g")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "q146_two_level_manifest",
    oracle="""
    WITH cuts AS (
      SELECT CAST(FLOOR(MAX(o_orderkey) / 8.0) AS BIGINT) AS c1,
             CAST(FLOOR(MAX(o_orderkey) / 4.0) AS BIGINT) AS c2,
             CAST(FLOOR(MAX(o_orderkey) / 2.0) AS BIGINT) AS c3,
             CAST(FLOOR(MAX(o_orderkey) * 5 / 8.0) AS BIGINT) AS c4
      FROM orders
    )
    SELECT CASE WHEN o.o_orderkey >= cuts.c3 AND o.o_orderkey < cuts.c4
                THEN 'TLM' ELSE o.o_orderpriority END AS pr,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders o, cuts
    WHERE o.o_orderkey % 3 = 0
      AND NOT (o.o_orderkey >= cuts.c1 AND o.o_orderkey < cuts.c2)
    GROUP BY 1 ORDER BY pr
    """,
)
def q146_two_level_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level manifest end-to-end (r12 — the design the manifest
    scale probe's measurement fired, SCALE.md): a snapshot table
    crosses ``stats_sidecar_min_files``, after which its file list +
    per-file stats live in immutable DELTA sidecars and the manifest
    JSON keeps only tags/schema/pointers — commit metadata cost
    O(new files), not O(head files). Asserted in-entry on the RAW
    on-disk JSON (not the hydrated view): the pre-threshold commit is
    byte-format single-level, the crossing commit moves files/stats
    out, and the next append RE-REFERENCES the parent's entire chain
    plus exactly one new delta (the O(new) claim in manifest bytes:
    the head manifest stays tag-sized while the table's file count
    triples). The hydrated surface is then driven through the full
    lifecycle on top of the sidecars — stat pruning (kept < total),
    a redaction update, a GDPR band delete — and the final read
    hash-matches the flat oracle replaying both. 100 TB story: a
    100k-file table's always-on stream pays per-commit metadata for
    its own files only; the chain is bounded by consolidation
    (stats_sidecar_max), and compaction returns the table to the
    inline format when the file count drops — format follows scale
    in both directions. Reduced from the public Iceberg manifest-list
    / Delta checkpoint designs; reference parity: metadata bounding is
    the same concern the reference's registry size model enforces
    (scale.js RDS sizing)."""
    import json as _json
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    work = tempfile.mkdtemp(prefix=f"q146_{_uuid.uuid4().hex[:8]}_")
    root = os.path.join(work, "t")

    def _raw(v: int) -> dict:
        with open(os.path.join(root, "_snapshots", f"v{v}.json")) as fh:
            return _json.load(fh)

    try:
        hi = int(orders.agg(F.max("o_orderkey")).first()[0])
        c1, c2 = hi // 8, hi // 4
        c3, c4 = hi // 2, hi * 5 // 8
        base = orders.where(k % 3 == 0).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        t = SnapshotTable(root, stats_sidecar_min_files=8)
        # three appends of 4 range files each: 4 -> 8 -> 12
        for m in (0, 3, 6):
            t.append(
                base.where(k % 9 == m).repartitionByRange(4, "o_orderkey")
            )
        r1, r2, r3 = _raw(1), _raw(2), _raw(3)
        # pre-threshold: classic single-level format, byte-for-byte
        assert r1["files"] and "stats_sidecars" not in r1
        # crossing: files/stats keys ABSENT (not empty) — a
        # pre-two-level reader must KeyError loudly, never silently
        # read a populated table as empty
        assert "files" not in r2 and "stats" not in r2
        assert r2["n_files"] == 8 and r2["stats_sidecars"]
        # the O(new files) append: parent chain re-referenced verbatim
        # + exactly one delta for the 4 new files
        assert set(r2["stats_sidecars"]) <= set(r3["stats_sidecars"])
        assert len(r3["stats_sidecars"]) == len(r2["stats_sidecars"]) + 1
        # the manifest itself stays tag-sized while files tripled
        assert len(_json.dumps(r3)) < 4096, len(_json.dumps(r3))

        # hydrated lifecycle ON TOP of the sidecars:
        kept, total = t.prune_files(
            spark, {"o_orderkey": {"between": [c1, c2 - 1]}}
        )
        assert 0 < len(kept) < total, (len(kept), total)
        t.update_where(
            spark, {"o_orderkey": {"between": [c3, c4 - 1]}},
            {"o_orderpriority": F.lit("TLM")},
        )
        t.delete_where(spark, {"o_orderkey": {"between": [c1, c2 - 1]}})

        out = (
            t.read(spark)
            .groupBy(F.col("o_orderpriority").alias("pr"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5)
                    .cast("long")
                ).cast("long").alias("total_cents"),
            )
            .orderBy("pr")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out
