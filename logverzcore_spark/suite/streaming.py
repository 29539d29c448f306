"""Streaming entries (st*): structured-streaming parity operators.

Split from the flat suite.py (r6); entries register into the shared
SUITE/ORACLES dicts via the @query decorator from suite.common.
"""

from __future__ import annotations

from logverzcore_spark.suite.common import *  # noqa: F401,F403

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
    from logverzcore_spark.engine import parquet_schema

    schema = parquet_schema(spark, docs_path)
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


@query(
    "st22_streaming_curation_cascade",
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
    ), aug AS (
      SELECT d.doc_id, d.source, d.n_chars,
             d.text || ' contact user' || d.doc_id || '@mail.example.com' ||
             CASE WHEN d.doc_id % 2 = 0 THEN ' from 10.1.' || (d.doc_id % 200) || '.42' ELSE '' END ||
             CASE WHEN d.doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END ||
             CASE WHEN d.doc_id % 5 = 0 THEN ' call 415-555-0173' ELSE '' END AS t
      FROM documents d JOIN keep2 k USING (doc_id)
    ), s1 AS (
      SELECT doc_id, source, n_chars,
             len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t
      FROM aug
    ), s2 AS (
      SELECT doc_id, source, n_chars, n_email,
             len(regexp_extract_all(t, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ip,
             regexp_replace(t, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '[IP]', 'g') AS t
      FROM s1
    ), s3 AS (
      SELECT doc_id, source, n_chars, n_email, n_ip,
             len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssn,
             regexp_replace(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g') AS t
      FROM s2
    ), s4 AS (
      SELECT doc_id, source, n_chars, n_email, n_ip, n_ssn,
             len(regexp_extract_all(t, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS n_phone,
             regexp_replace(t, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '[PHONE]', 'g') AS t
      FROM s3
    )
    SELECT doc_id, source, n_chars,
           CAST(n_email AS INT) AS n_email, CAST(n_ip AS INT) AS n_ip,
           CAST(n_ssn AS INT) AS n_ssn, CAST(n_phone AS INT) AS n_phone,
           CAST(n_email + n_ip + n_ssn + n_phone AS INT) AS n_pii,
           md5(t) AS clean_md5
    FROM s4
    """,
)
def st22_streaming_curation_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL streaming curation cascade
    (stream_dedup.full_curation_stream): quality gate + exact dedup +
    MinHash-LSH near-dup suppression + PII scrub maintained as ONE
    foreachBatch pipeline — st16's two stages composed with
    stream_neardup's LSH state and t27's injection/scrub projections
    as the finalize stage. The oracle replays the complete batch
    cascade (t16's quality → keep-first → drop-every-pair's-higher-id
    stages, then t27's ordered redaction chain on the survivors) in
    one SQL statement, so the hash certifies the streaming
    COMPOSITION equals the batch pipeline — including that both state
    tables record every exact-stage survivor (a near-dup-dropped doc
    must still drop its own later near-duplicates and same-text
    copies). Cross-batch chains and restart idempotence are
    pytest-covered (test_full_curation_stream_*)."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.operators.text import pii_counts, redact_pii
    from logverzcore_spark.streaming.stream_dedup import full_curation_stream

    def scrub_finalize(df: DataFrame) -> DataFrame:
        aug = F.concat(
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
        )
        return df.select(
            "doc_id", "source", "n_chars",
            pii_counts(aug).alias("_c"),
            F.md5(redact_pii(aug)).alias("clean_md5"),
        ).select(
            "doc_id", "source", "n_chars",
            F.col("_c.n_email").alias("n_email"),
            F.col("_c.n_ip").alias("n_ip"),
            F.col("_c.n_ssn").alias("n_ssn"),
            F.col("_c.n_phone").alias("n_phone"),
            (
                F.col("_c.n_email") + F.col("_c.n_ip")
                + F.col("_c.n_ssn") + F.col("_c.n_phone")
            ).alias("n_pii"),
            "clean_md5",
        )

    run_id = _uuid.uuid4().hex[:8]
    table = f"st22_cur_{run_id}"
    stream = _docs_stream(spark, sf_dir)
    q = full_curation_stream(
        spark, stream, table,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
        finalize=scrub_finalize,
    )
    q.awaitTermination()
    out = spark.table(table).localCheckpoint(eager=True)
    for t in (table, f"{table}_fingerprints",
              f"{table}_lsh_buckets", f"{table}_lsh_sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


@query("st23_streaming_ivfpq_append", oracle=_s11b_oracle())
def st23_streaming_ivfpq_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF-PQ index maintenance
    (streaming/ivf_stream.ivfpq_append_stream): build the PQ-coded
    index on 80% of the corpus, fold the held-out 20% in as a
    multi-batch embedding stream (maxFilesPerTrigger=1 — cells touched
    across separate commits), then probe. Appends re-encode with the
    STORED centroid/codebook tables, so the stream-maintained index is
    exactly a from-scratch build over everything seen — the SAME SQL
    oracle as s11b grades it hash-exact: a lost batch, a stale
    codebook read, or a replay duplicate breaks the hash. Per-row
    replay idempotence is pytest-covered
    (test_ivfpq_append_stream_replay_idempotent)."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.ivf_stream import ivfpq_append_stream

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 20)
    run_id = _uuid.uuid4().hex[:8]
    tbl = f"st23_ivfpq_{run_id}"
    similarity.ivfpq_index_build(
        base, tbl, n_cells=16, m=8, n_codes=16, dim=64,
        centroids=similarity.lcg_centroids(64, 16),
        codebooks=similarity.lcg_codebooks(64, 8, 16),
    )
    try:
        work = tempfile.mkdtemp(prefix=f"st23_{run_id}_")
        src = os.path.join(work, "delta")
        delta.coalesce(2).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = ivfpq_append_stream(
            spark, stream, tbl, checkpoint_dir=os.path.join(work, "ck")
        )
        q.awaitTermination()
        out = similarity.ivfpq_index_probe(
            spark, queries, tbl, k=5, nprobe=4
        ).localCheckpoint(eager=True)
    finally:
        for t in (tbl, f"{tbl}_centroids", f"{tbl}_codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


@query(
    "st24_stream_compacted_sink",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents
    GROUP BY source
    """,
)
def st24_stream_compacted_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming append with IN-STREAM compaction
    (export.CompactedAppendSink): documents staged as 6 source files
    drain one-file-per-micro-batch through the sink, which folds inbox
    batch dirs into the compacted base every 2 batches; the consistent
    read view (base + un-consumed committed inboxes via the _consumed
    manifest) must equal the batch profile — a batch double-counted
    across a compaction boundary, lost in a swap, or visible before
    commit breaks the hash. Replay/crash-window idempotence is
    pytest-driven through sink.process directly."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark import export

    docs = _t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix=f"st24_{_uuid.uuid4().hex[:8]}_")
    src = os.path.join(base, "src")
    try:
        docs.repartition(6).write.parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        sink = export.export_compacted_stream(
            spark,
            stream,
            out_dir=os.path.join(base, "sink"),
            checkpoint_dir=os.path.join(base, "ck"),
            compact_every=2,
        )
        out = (
            sink.read_view(spark)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.min("doc_id").alias("min_id"),
                F.max("doc_id").alias("max_id"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


@query(
    "st25_streaming_scd2",
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
def st25_streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance (upsert.make_scd2_fold): the events
    log staged as 4 event-time-ordered files drains one-per-micro-batch
    into a bucket-partitioned history table — each batch re-folds ONLY
    its keys' open versions with the new observations (closed versions
    immutable, touched buckets dynamically overwritten) — and the final
    table must hash-match the BATCH scd2 oracle (q114's SQL): a version
    split wrong at a batch boundary, a collapse missed against a seed,
    or a mis-numbered continuation breaks the hash. Late-data gate and
    replay-marker semantics are pytest-driven on the fold directly."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming import upsert as _ups

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    run = _uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"st25_{run}_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    table = f"st25_scd2_{run}"
    try:
        n_files = 4
        total = ev.count()
        chunk = (total + n_files - 1) // n_files
        w = Window.orderBy("ts", "event_id")
        ranked = ev.withColumn("_rn", F.row_number().over(w) - 1)
        t0 = 1_700_000_000
        for i in range(n_files):
            part = ranked.where(
                (F.col("_rn") >= i * chunk) & (F.col("_rn") < (i + 1) * chunk)
            ).drop("_rn")
            tmp = os.path.join(base, f"w{i}")
            part.coalesce(1).write.parquet(tmp)
            pf = next(f for f in os.listdir(tmp) if f.startswith("part-"))
            dst = os.path.join(src, f"chunk-{i:02d}.parquet")
            shutil.move(os.path.join(tmp, pf), dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))  # mod-time order = event order
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = _ups.scd2_stream(
            spark, stream, table,
            key_col="user_id", ts_col="ts", attr_cols=["event_type"],
            tie_col="event_id",
            checkpoint_dir=os.path.join(base, "ck"),
        )
        q.awaitTermination()
        out = (
            spark.table(table)
            .select("user_id", "event_type", "valid_from", "valid_to",
                    "is_current", "version")
            .localCheckpoint(eager=True)
        )
    finally:
        for t in (table, f"{table}_meta"):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        shutil.rmtree(base, ignore_errors=True)
    return out


@query(
    "st26_streaming_bloom_dedup",
    oracle="""
    WITH fps AS (
      SELECT doc_id, source, lang, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents
    ), corpus AS (
      SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0
    ), strm AS (
      SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM fps WHERE doc_id % 2 = 1
    ), adm AS (
      SELECT s.doc_id, s.source, s.lang, s.n_chars
      FROM strm s LEFT JOIN corpus c ON s.fp = c.fp
      WHERE s.rn = 1 AND c.fp IS NULL
    )
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM adm GROUP BY source, lang
    """,
)
def st26_streaming_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental dedup against a Bloom-compressed corpus
    (stream_dedup.bloom_dedup_stream): even doc_ids play the accumulated
    corpus (fingerprints persisted + bloom built once), odd doc_ids play
    the crawl stream; per micro-batch, bloom-negative docs commit
    without ever touching the corpus table, bloom-positive suspects pay
    the exact confirm join — the committed table equals the batch
    anti-join the oracle replays (d20's no-false-negative argument,
    lifted to foreachBatch). The per-stream fingerprint state handles
    cross-batch stream-internal dups."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.operators import dedup
    from logverzcore_spark.streaming.stream_dedup import bloom_dedup_stream

    run_id = _uuid.uuid4().hex[:8]
    table = f"st26_bd_{run_id}"
    corpus_tbl = f"st26_corpus_{run_id}"
    docs = _t(spark, sf_dir, "documents")
    try:
        (
            docs.where(F.col("doc_id") % 2 == 0)
            .select(dedup.fingerprint_md5(F.col("text")).alias("fp"))
            .distinct()
            .write.mode("overwrite")
            .saveAsTable(corpus_tbl)
        )
        bloom = dedup.build_fp_bloom(spark.table(corpus_tbl), fpp=0.01)
        stream = _docs_stream(spark, sf_dir).where(F.col("doc_id") % 2 == 1)
        q = bloom_dedup_stream(
            spark, stream, table, corpus_tbl, bloom,
            checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
        )
        q.awaitTermination()
        out = (
            spark.table(table)
            .groupBy("source", "lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("doc_id").alias("min_id"),
                F.sum("n_chars").alias("total_chars"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_fingerprints")
        spark.sql(f"DROP TABLE IF EXISTS {corpus_tbl}")
    return out


@query(
    "st27_streaming_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT doc_id, n_chars AS x,
             len(list_distinct(list_transform(
                 list_filter(string_split(text, ' '), t -> t <> ''),
                 t -> lower(t)))) AS y
      FROM documents
    )
    SELECT x, y, CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.x <= p.x AND q.y >= p.y AND (q.x < p.x OR q.y > p.y)
    )
    GROUP BY x, y
    """,
)
def st27_streaming_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Pareto-frontier maintenance
    (rollup.incremental_pareto_frontier): the shortest-doc /
    most-lexical-types frontier folded per micro-batch — frontier(A∪B)
    = frontier(frontier(A)∪B), so state stays bounded at the frontier
    size and the stored table equals the batch skyline the oracle
    replays as the quadratic NOT-EXISTS (q118's semantics; the y
    projection is per-row, hence batch-boundary-invariant). min_id is
    idempotent under re-delivery; the batch form's duplicate count is
    deliberately absent (not replay-safe without id-level state)."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.operators import text as textops
    from logverzcore_spark.streaming.rollup import incremental_pareto_frontier

    state = f"st27_front_{_uuid.uuid4().hex[:8]}"
    stream = _docs_stream(spark, sf_dir).select(
        "doc_id",
        F.col("n_chars").alias("x"),
        F.size(
            F.array_distinct(
                F.transform(textops.tokens(F.col("text")), lambda t: F.lower(t))
            )
        ).alias("y"),
    )
    try:
        q = incremental_pareto_frontier(
            spark, stream, state, "x", "y", "doc_id",
            checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{state}"),
        )
        q.awaitTermination()
        out = spark.table(state).localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {state}")
    return out


from logverzcore_spark.suite.sketches import _q123_oracle as _q123_oracle_sql


@query("st28_streaming_countmin", oracle=_q123_oracle_sql())
def st28_streaming_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min rollup (rollup.make_countmin_fold):
    micro-batches of events fold cell-wise-additive CMS tables into a
    ≤ 4×512-row state table — the frequency companion to st13's HLL
    and st15's top-k rollups. Because CMS merge is exact addition and
    the hash is md5-derived, the post-stream sketch equals the batch
    build over the same events bit-for-bit, so the final per-user
    estimates reuse q123's oracle verbatim (replay guard is
    load-bearing: addition is not idempotent)."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.operators import sketches
    from logverzcore_spark.streaming.collect_stream import _events_stream
    from logverzcore_spark.streaming.rollup import incremental_countmin_rollup

    table = f"st28_cms_{_uuid.uuid4().hex[:8]}"
    stream = _events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    q = incremental_countmin_rollup(
        spark, stream, table,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
    )
    q.awaitTermination()
    cms = spark.table(table).select("d", "w", "cnt")
    ev = _t(spark, sf_dir, "events")
    est = sketches.countmin_estimate(cms, ev.select("user_id"), "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    out = est.join(exact, "user_id").localCheckpoint(eager=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_meta")
    return out


@query("st29_streaming_bm25_append", oracle=ORACLES["s18_bm25_index_probe"])
def st29_streaming_bm25_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming BM25 index maintenance
    (streaming/lexical_stream.bm25_append_stream): build the postings
    on 80% of the corpus, fold the held-out 20% in as a multi-batch
    document stream (maxFilesPerTrigger=1), then probe with s18's query
    set. Appends tokenize only their own batch and recompute the stats
    row from the postings, so the stream-maintained index ranks exactly
    like a from-scratch build over everything seen — the SAME SQL
    oracle as s18 grades it hash-exact: a lost batch, a stale stats
    row, or a replay duplicate breaks the hash."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.lexical_stream import bm25_append_stream

    docs = _t(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 != 0)
    delta = docs.where(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    run_id = _uuid.uuid4().hex[:8]
    tbl = f"st29_bm25_{run_id}"
    text.bm25_index_build(base, tbl)
    try:
        work = tempfile.mkdtemp(prefix=f"st29_{run_id}_")
        src = os.path.join(work, "delta")
        delta.coalesce(2).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = bm25_append_stream(
            spark, stream, tbl, checkpoint_dir=os.path.join(work, "ck")
        )
        q.awaitTermination()
        qtf = (
            docs.where(F.col("doc_id") % 40 == 0)
            .select(
                F.col("doc_id").alias("query_id"),
                F.explode(text.tokens(F.lower(F.col("text")))).alias("term"),
            )
            .groupBy("query_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        win = Window.partitionBy("query_id").orderBy(F.desc("tf"), F.asc("term"))
        qterms = (
            qtf.withColumn("rk", F.row_number().over(win))
            .where(F.col("rk") <= 2)
            .select("query_id", "term")
        )
        out = text.bm25_index_topk(spark, tbl, qterms, k=3).localCheckpoint(
            eager=True
        )
    finally:
        for t in (tbl, f"{tbl}_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


@query("st30_streaming_mixture_state", oracle=ORACLES["t53_temperature_mixture"])
def st30_streaming_mixture_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mixture planning
    (streaming/rollup.incremental_mixture_rollup +
    text.temperature_mixture_from_state): per-source token volume folds
    into a #sources-row state table as documents stream in (2 batches,
    additive counts behind the last_batch crash guard), then the T=2
    temperature allocation runs from the STATE — no corpus rescan at
    decision time. Graded against t53's batch oracle verbatim: a lost
    batch, a double-applied replay, or a stale state row breaks the
    hash."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.rollup import incremental_mixture_rollup

    docs = _t(spark, sf_dir, "documents")
    run_id = _uuid.uuid4().hex[:8]
    state = f"st30_mix_{run_id}"
    try:
        work = tempfile.mkdtemp(prefix=f"st30_{run_id}_")
        src = os.path.join(work, "docs")
        docs.select("doc_id", "source", "text").coalesce(2).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = incremental_mixture_rollup(
            spark, stream, state, checkpoint_dir=os.path.join(work, "ck")
        )
        q.awaitTermination()
        out = text.temperature_mixture_from_state(
            spark, state, total_tokens=1_000_000
        ).localCheckpoint(eager=True)
    finally:
        for t in (state, f"{state}_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


@query("st31_streaming_canary_gate", oracle=ORACLES["t58_canary_scan"])
def st31_streaming_canary_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous eval-canary gate
    (streaming/lexical_stream.canary_scan_stream): the canary-planted
    corpus (t58's plant: every 41st doc) streams in 2 batches, hits
    fold into a state table with (canary, doc_id) replay idempotence,
    and the state grouped by (source, canary) must equal the batch scan
    over everything seen — t58's oracle verbatim. A hit missed in
    either batch, or a replay duplicate, breaks the hash."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.lexical_stream import canary_scan_stream

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 41 == 0,
            F.concat("text", F.lit(" canary:" + text.BIGBENCH_CANARY)),
        ).otherwise(F.col("text")).alias("text"),
    )
    run_id = _uuid.uuid4().hex[:8]
    state = f"st31_canary_{run_id}"
    try:
        work = tempfile.mkdtemp(prefix=f"st31_{run_id}_")
        src = os.path.join(work, "docs")
        planted.coalesce(2).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = canary_scan_stream(
            spark, stream, state, checkpoint_dir=os.path.join(work, "ck")
        )
        q.awaitTermination()
        out = (
            spark.table(state)
            .groupBy("source", "canary")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs_hit"),
                F.array_join(
                    F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20), ","
                ).alias("doc_ids"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {state}")
    return out


@query("st32_streaming_avro_collect", oracle=ORACLES["q127_avro_roundtrip"])
def st32_streaming_avro_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous Avro collection (streaming/avro_stream.
    avro_collect_stream): q127's two-codec OCF fixture drops into a
    watch dir, streams in one-file micro-batches through the SAME
    mapInPandas decode as the batch reader, and folds into a table with
    per-file replay idempotence — the drained table must equal q127's
    identity oracle verbatim (rows lost to a batch boundary, or
    duplicated by the second drain over a fresh checkpoint, break the
    hash)."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.sources.avro_ocf import encode_ocf
    from logverzcore_spark.streaming.avro_stream import avro_collect_stream

    docs = _t(spark, sf_dir, "documents")
    rows = sorted((r.asDict() for r in docs.collect()), key=lambda r: r["doc_id"])
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
    run_id = _uuid.uuid4().hex[:8]
    tbl = f"st32_avro_{run_id}"
    work = tempfile.mkdtemp(prefix=f"st32_{run_id}_")
    watch = os.path.join(work, "drop")
    os.makedirs(watch)
    half = len(rows) // 2
    with open(os.path.join(watch, "a.avro"), "wb") as fh:
        fh.write(encode_ocf(rows[:half], avro_schema, codec="null"))
    with open(os.path.join(watch, "b.avro"), "wb") as fh:
        fh.write(encode_ocf(rows[half:], avro_schema, codec="deflate"))
    try:
        q = avro_collect_stream(
            spark, watch, tbl, avro_schema,
            checkpoint_dir=os.path.join(work, "ck"),
            max_files_per_trigger=1,
        )
        q.awaitTermination()
        # full redelivery (fresh checkpoint): per-file idempotence
        q2 = avro_collect_stream(
            spark, watch, tbl, avro_schema,
            checkpoint_dir=os.path.join(work, "ck2"),
            max_files_per_trigger=1,
        )
        q2.awaitTermination()
        out = (
            spark.table(tbl)
            .where(F.col("_corrupt_record").isNull())
            .select(
                "doc_id", "lang", "source", "n_chars",
                F.length("text").alias("n_text"),
                "_corrupt_record",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    return out


@query(
    "st33_streaming_snapshot_commits",
    oracle="""
    WITH half AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0)
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM half
    """,
)
def st33_streaming_snapshot_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming snapshot commits
    (streaming/avro_stream.snapshot_append_stream): half of orders
    streams in one-file micro-batches, each batch committing ONE tagged
    snapshot version; a SECOND drain over a fresh checkpoint redelivers
    every batch and must commit nothing (tag no-ops). The latest
    version's totals must equal the batch oracle, version count must
    equal batch count (not 2x), and every intermediate version must be
    a prefix — the mid-stream pinned-corpus property."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable
    from logverzcore_spark.streaming.avro_stream import snapshot_append_stream

    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 2 == 0)
    import shutil

    run_id = _uuid.uuid4().hex[:8]
    work = tempfile.mkdtemp(prefix=f"st33_{run_id}_")
    try:
        src = os.path.join(work, "src")
        orders.coalesce(2).write.parquet(src)
        schema = spark.read.parquet(src).schema
        root = os.path.join(work, "snap")

        ck = os.path.join(work, "ck1")

        def drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(src)
            )
            q = snapshot_append_stream(spark, stream, root, checkpoint_dir=ck)
            q.awaitTermination()

        drain()
        t = SnapshotTable(root)
        n_versions = len(t.versions(spark))
        # Lost checkpoint, SAME checkpoint path (= same stream identity,
        # so tags match): every batch is fully redelivered and every
        # commit must be a tag no-op.
        shutil.rmtree(ck)
        drain()
        assert len(t.versions(spark)) == n_versions, "replay committed dupes"
        # prefix property: each version's rows are a subset of the next
        counts = [t.read(spark, v).count() for v in t.versions(spark)]
        assert counts == sorted(counts)
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(spark)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(cents).cast("long").alias("total_cents"),
                F.countDistinct("o_custkey").cast("long").alias("n_custs"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "st34_streaming_url_frontier",
    oracle="""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN 'not a url at all'
                  WHEN doc_id % 3 = 0 THEN
                    'HTTPS://Site' || (doc_id // 3) || '.Example:443/p/'
                    || (doc_id // 3) || '?utm_source=x&b=2&a=1#frag'
                  WHEN doc_id % 3 = 1 THEN
                    'https://site' || (doc_id // 3) || '.example/p/'
                    || (doc_id // 3) || '?a=1&b=2'
                  ELSE
                    'https://site' || (doc_id // 3) || '.example/p/'
                    || (doc_id // 3) || '/?b=2&a=1&gclid=zzz' END AS url
      FROM documents
    ), parsed AS (
      SELECT doc_id,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(
          regexp_extract(
            regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
            '([^@]*)$', 1),
          '^([^:]*)', 1)) AS host,
        regexp_replace(
          regexp_replace(
            regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
            '/{2,}', '/', 'g'),
          '(.)/$', '\\1') AS path_c,
        regexp_extract(url, '\\?([^#]*)', 1) AS qraw
      FROM planted
    ), canon AS (
      SELECT doc_id,
        scheme || '://' || host ||
        (CASE WHEN path_c = '' THEN '/' ELSE path_c END) ||
        (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canon_url
      FROM (
        SELECT doc_id, scheme, host, path_c,
               array_to_string(list_sort(list_filter(string_split(qraw, '&'),
                 x -> x <> '' AND NOT regexp_matches(x,
                   '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))), '&') AS q
        FROM parsed WHERE scheme <> ''
      )
    )
    SELECT canon_url, CAST(MIN(doc_id) AS BIGINT) AS doc_id
    FROM canon GROUP BY canon_url
    """,
)
def st34_streaming_url_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming crawl-frontier dedup on canonical URLs
    (stream_dedup.url_frontier_stream): the documents stream plants
    t63's URL-variant grammar (three transport variants per page,
    every 10th doc unparseable), the frontier canonicalizes per
    micro-batch and admits only first-seen canonical keys across
    batches via the persistent state table — the committed table is
    one row per PAGE, lowest doc_id sighting kept, which the oracle
    replays as canonicalize + min-per-key. Unparseable rows must never
    enter the frontier (NULL canon dropped before state)."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.stream_dedup import url_frontier_stream

    run_id = _uuid.uuid4().hex[:8]
    table = f"st34_uf_{run_id}"
    g = F.expr("doc_id div 3").cast("string")
    url = (
        F.when(F.col("doc_id") % 10 == 0, F.lit("not a url at all"))
        .when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("HTTPS://Site"), g, F.lit(".Example:443/p/"), g,
                     F.lit("?utm_source=x&b=2&a=1#frag")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("https://site"), g, F.lit(".example/p/"), g,
                     F.lit("?a=1&b=2")),
        )
        .otherwise(
            F.concat(F.lit("https://site"), g, F.lit(".example/p/"), g,
                     F.lit("/?b=2&a=1&gclid=zzz")),
        )
    )
    stream = _docs_stream(spark, sf_dir).select("doc_id", url.alias("url"))
    try:
        q = url_frontier_stream(
            spark, stream, table,
            checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
        )
        q.awaitTermination()
        out = (
            spark.table(table)
            .select("canon_url", F.col("doc_id").cast("long").alias("doc_id"))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_frontier_keys")
    return out


@query(
    "st35_streaming_schema_drift",
    oracle="""
    SELECT 'mut' AS key, 'type_changed' AS status,
           'number' AS types_old, 'string' AS types_new
    UNION ALL
    SELECT 'new_only', 'added', CAST(NULL AS VARCHAR), 'boolean'
    UNION ALL
    SELECT 'old_only', 'removed', 'string', CAST(NULL AS VARCHAR)
    """,
)
def st35_streaming_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous schema-drift monitoring (monitor.schema_drift_stream):
    the q131 fixture's OLD batch becomes the persisted baseline profile,
    the NEW shape streams through the collection path, and the drift
    table must flag exactly the three non-stable keys (added boolean
    'new_only', removed 'old_only', number→string 'mut') while stable
    'k' stays silent. Counts and batch ids are deliberately excluded
    from the graded columns so micro-batch slicing can't flip the hash
    — the per-batch semantics are pytest-driven."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.operators.coerce import json_key_profile
    from logverzcore_spark.streaming.collect_stream import _events_stream
    from logverzcore_spark.streaming.monitor import schema_drift_stream

    run_id = _uuid.uuid4().hex[:8]
    baseline_tbl = f"st35_base_{run_id}"
    drift_tbl = f"st35_drift_{run_id}"
    ev = _t(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    old_props = F.concat(
        F.lit('{"k": '), uid, F.lit(', "old_only": "x", "mut": '), uid,
        F.lit("}"),
    )
    try:
        json_key_profile(
            ev.where(F.col("event_id") % 2 == 0).select(old_props.alias("props"))
        ).write.mode("overwrite").saveAsTable(baseline_tbl)
        stream = _events_stream(
            spark, os.path.join(sf_dir, "events.parquet")
        ).where(F.col("event_id") % 2 == 1)
        new_props = F.concat(
            F.lit('{"k": '),
            F.col("user_id").cast("string"),
            F.lit(', "new_only": true, "mut": "s"}'),
        )
        q = schema_drift_stream(
            spark,
            stream.select(new_props.alias("props")),
            baseline_tbl,
            drift_tbl,
            checkpoint_dir=os.path.join(
                tempfile.gettempdir(), f"ck_{drift_tbl}"
            ),
        )
        q.awaitTermination()
        out = (
            spark.table(drift_tbl)
            .select("key", "status", "types_old", "types_new")
            .distinct()
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {baseline_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {drift_tbl}")
    return out


from logverzcore_spark.suite.multimodal import _M30_ORACLE  # noqa: E402


@query("st36_streaming_crawl_curate", oracle=_M30_ORACLE)
def st36_streaming_crawl_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming crawl INGESTION end-to-end
    (stream_dedup.crawl_curate_stream — r9): the byte-identical WARC
    corpus m30 grades in batch (the shared _m30_warc_payload fixture —
    two-record WARCs, 404s, cookie-boilerplate dup mass, NFC/entity
    traps) arrives as a STREAM, each micro-batch runs the same
    pipeline.crawl_curate cascade (container walk → extract → strip →
    scrub → re-line → C4; all per-row), and survivors fold through the
    cross-batch fingerprint-state exact dedup. Graded against m30's
    OWN exhaustive oracle over everything seen: the hash certifies
    that streaming the container front-end changes nothing — not a
    byte of any page, not which duplicate survives. Cross-batch dup
    drops, out-of-order arrival, and restart idempotence are
    pytest-covered (test_crawl_curate_stream_*)."""
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.streaming.stream_dedup import crawl_curate_stream
    from logverzcore_spark.suite.multimodal import _m30_warc_payload

    run_id = _uuid.uuid4().hex[:8]
    table = f"st36_crawl_{run_id}"
    warc = _m30_warc_payload(_docs_stream(spark, sf_dir))
    q = crawl_curate_stream(
        spark, warc, table,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{table}"),
    )
    q.awaitTermination()
    out = (
        spark.table(table)
        .select(
            "doc_id",
            F.md5("text").alias("fp"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .localCheckpoint(eager=True)
    )
    for t in (table, f"{table}_fingerprints"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


@query("st37_streaming_incremental_mv", oracle=ORACLES["q133_incremental_mv"])
def st37_streaming_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintained aggregate (streaming/avro_stream.
    incremental_mv_stream): orders stream in micro-batches; each batch
    appends one tagged snapshot version AND folds only that delta into
    IncrementalAggregate state — the always-current dashboard at
    delta + group-cardinality cost per trigger. After the drain the
    maintained state must equal q133's one-shot GROUP BY oracle; a
    SECOND drain over a lost checkpoint redelivers every batch and
    must change neither the source version count nor the state (tag
    no-ops at the manifest, version no-ops at the refresh)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable
    from logverzcore_spark.streaming.avro_stream import incremental_mv_stream

    orders = _t(spark, sf_dir, "orders").withColumn(
        "cents", F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    )
    run_id = _uuid.uuid4().hex[:8]
    work = tempfile.mkdtemp(prefix=f"st37_{run_id}_")
    try:
        src_files = os.path.join(work, "in")
        orders.coalesce(4).write.parquet(src_files)
        schema = spark.read.parquet(src_files).schema
        mv = IncrementalAggregate(
            SnapshotTable(os.path.join(work, "src")),
            os.path.join(work, "mv"),
            group_keys=["o_orderpriority"],
            aggregates={
                "n_orders": ("count", None),
                "total_cents": ("sum", "cents"),
                "min_key": ("min", "o_orderkey"),
                "max_key": ("max", "o_orderkey"),
            },
        )
        ck = os.path.join(work, "ck")

        def drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(src_files)
            )
            incremental_mv_stream(
                spark, stream, mv, checkpoint_dir=ck
            ).awaitTermination()

        drain()
        n_src = len(mv.source.versions(spark))
        n_state = len(mv.state.versions(spark))
        first = sorted(map(tuple, mv.result(spark).collect()))
        # lost checkpoint, same identity: full redelivery must no-op
        shutil.rmtree(ck)
        drain()
        assert len(mv.source.versions(spark)) == n_src, "replay re-appended"
        assert len(mv.state.versions(spark)) == n_state, "replay re-refreshed"
        assert sorted(map(tuple, mv.result(spark).collect())) == first
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
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "st38_streaming_cdc_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    merged AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 1 THEN 'CDC-1'
                  WHEN o_orderkey % 5 = 2 THEN 'CDC-2'
                  WHEN o_orderkey % 5 IN (3, 4) THEN 'CDC-3'
                  ELSE o_orderpriority END AS pr,
             CASE WHEN o_orderkey % 5 = 1 THEN o_totalprice + 1000
                  WHEN o_orderkey % 5 = 2 THEN o_totalprice + 2000
                  WHEN o_orderkey % 5 IN (3, 4) THEN o_totalprice + 3000
                  ELSE o_totalprice END AS tp
      FROM base
      UNION ALL
      SELECT o_orderkey,
             'NEW-' || CAST(o_orderkey % 5 AS VARCHAR) AS pr,
             o_totalprice AS tp
      FROM orders
      WHERE o_orderkey % 3 = 1 AND o_orderkey % 5 IN (1, 2, 3)
    )
    SELECT pr,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(tp * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM merged
    GROUP BY pr
    ORDER BY pr
    """,
)
def st38_streaming_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC APPLY (avro_stream.cdc_merge_stream): a keyed
    upsert feed lands per micro-batch as one tagged
    SnapshotTable.merge_into — the Delta streaming-MERGE shape. Three
    ordered CDC batches stream over a base table: batch i updates the
    base keys with o_orderkey %5 in {i, i+1} (absolute values: price +
    1000·i, priority 'CDC-i' — so later batches OVERRIDE earlier ones
    on the overlap keys %5=2 and %5=3) and inserts brand-new keys
    (%3=1, %5=i → priority 'NEW-i', target-only columns NULL). The
    drained end state must hash-match the flat-table oracle's CASE
    mapping (the override algebra spelled out); a second drain over a
    LOST checkpoint at the same path redelivers every batch and must
    commit nothing (merge tags no-op — exactly-once); history must
    read [merge, merge, merge, append]. 100 TB per-trigger cost is
    merge's selective rewrite: the files the batch's keys live in."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable
    from logverzcore_spark.streaming.avro_stream import cdc_merge_stream

    orders = _t(spark, sf_dir, "orders")
    work = tempfile.mkdtemp(prefix=f"st38_{_uuid.uuid4().hex[:8]}_")
    try:
        root = os.path.join(work, "snap")
        t = SnapshotTable(root)
        t.append(
            orders.where(F.col("o_orderkey") % 3 == 0).select(
                "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
            ).coalesce(2)
        )
        src = os.path.join(work, "cdc")
        for i in (1, 2, 3):
            upd = orders.where(
                (F.col("o_orderkey") % 3 == 0)
                & (F.col("o_orderkey") % 5).isin(i, i + 1)
            ).select(
                "o_orderkey",
                (F.col("o_totalprice") + 1000 * i).alias("o_totalprice"),
                F.lit(f"CDC-{i}").alias("o_orderpriority"),
            )
            ins = orders.where(
                (F.col("o_orderkey") % 3 == 1)
                & (F.col("o_orderkey") % 5 == i)
            ).select(
                "o_orderkey",
                "o_totalprice",
                F.lit(f"NEW-{i}").alias("o_orderpriority"),
            )
            upd.unionByName(ins).coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        ck = os.path.join(work, "ck")

        def drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(src)
            )
            cdc_merge_stream(
                spark, stream, root, on="o_orderkey", checkpoint_dir=ck
            ).awaitTermination()

        drain()
        assert len(t.versions(spark)) == 4, "one merge per CDC batch"
        # lost checkpoint, same path: full redelivery must no-op
        shutil.rmtree(ck)
        drain()
        assert len(t.versions(spark)) == 4, "replay committed dupes"
        assert [e["op"] for e in t.history(spark)] == [
            "merge", "merge", "merge", "append"
        ]
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(spark)
            .groupBy(F.col("o_orderpriority").alias("pr"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(cents).cast("long").alias("total_cents"),
                F.max("o_orderkey").cast("long").alias("max_key"),
            )
            .orderBy("pr")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "st39_streaming_cdc_deletes",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderkey % 7 AS k7
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    final AS (
      -- base keys that survive: %7 in {4,5,6} were tombstoned
      -- (batch i deletes %7 = i+3); %7 in {1,2,3} carry batch i's
      -- absolute values
      SELECT o_orderkey,
             CASE WHEN k7 = 1 THEN 'UPD-1'
                  WHEN k7 = 2 THEN 'UPD-2'
                  WHEN k7 = 3 THEN 'UPD-3'
                  ELSE o_orderpriority END AS pr,
             CASE WHEN k7 = 1 THEN o_totalprice + 100
                  WHEN k7 = 2 THEN o_totalprice + 200
                  WHEN k7 = 3 THEN o_totalprice + 300
                  ELSE o_totalprice END AS tp,
             0 AS null_cust
      FROM base WHERE k7 NOT IN (4, 5, 6)
      UNION ALL
      -- %7=4 keys deleted by batch 1 are RE-inserted by batch 3's
      -- upsert side (key no longer matches): target-only o_custkey NULL
      SELECT o_orderkey, 'RES-3' AS pr, o_totalprice + 77 AS tp,
             1 AS null_cust
      FROM base WHERE k7 = 4
      UNION ALL
      -- stream inserts (%3=1, %7=i in batch i), minus the subset
      -- batch 3 tombstones (batch 1's inserts with %5=0)
      SELECT o_orderkey,
             'INS-' || CAST(o_orderkey % 7 AS VARCHAR) AS pr,
             o_totalprice AS tp, 1 AS null_cust
      FROM orders
      WHERE o_orderkey % 3 = 1 AND o_orderkey % 7 IN (1, 2, 3)
        AND NOT (o_orderkey % 7 = 1 AND o_orderkey % 5 = 0)
    )
    SELECT pr,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(tp * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           CAST(SUM(null_cust) AS BIGINT) AS n_null_cust
    FROM final
    GROUP BY pr
    ORDER BY pr
    """,
)
def st39_streaming_cdc_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC RETRACTIONS (r10 VERDICT task 6): st38's apply
    loop fed a Debezium-shaped feed whose rows carry a ``__deleted``
    tombstone flag — cdc_merge_stream(delete_col=) routes each
    micro-batch's tombstones to a when_matched='delete' merge and the
    rest to the configured upsert, as two tagged commits with distinct
    tag prefixes. Three ordered batches over a pre-seeded base (keys
    %3=0): batch i updates base keys %7=i (price+100·i, 'UPD-i'),
    inserts new keys (%3=1, %7=i, 'INS-i'), and tombstones base keys
    %7=i+3; batch 3 additionally RE-inserts the %7=4 keys batch 1
    deleted ('RES-3' — proving a delete's key is genuinely gone, not
    masked) and tombstones a subset of batch 1's inserts (%5=0 —
    retracting a streamed insert). The drained end state hash-matches
    the flat oracle (incl. NULL o_custkey counts on every insert
    path); a drain over a LOST checkpoint at the same path redelivers
    all three batches and must commit NOTHING (both tag prefixes
    no-op — exactly-once for retractions too). Reference anchor:
    worker.js's at-least-once redelivery made exactly-once (SURVEY
    §2.7/S13), extended to deletes. 100 TB per-trigger cost: each
    side's merge rewrites only the files its keys live in."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable
    from logverzcore_spark.streaming.avro_stream import cdc_merge_stream

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    work = tempfile.mkdtemp(prefix=f"st39_{_uuid.uuid4().hex[:8]}_")
    try:
        root = os.path.join(work, "snap")
        t = SnapshotTable(root)
        t.append(
            orders.where(k % 3 == 0).select(
                "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
            ).coalesce(2)
        )
        src = os.path.join(work, "cdc")
        dead = F.lit(True).alias("__deleted")
        live = F.lit(False).alias("__deleted")
        for i in (1, 2, 3):
            upd = orders.where((k % 3 == 0) & (k % 7 == i)).select(
                k,
                (F.col("o_totalprice") + 100 * i).alias("o_totalprice"),
                F.lit(f"UPD-{i}").alias("o_orderpriority"),
                live,
            )
            ins = orders.where((k % 3 == 1) & (k % 7 == i)).select(
                k, "o_totalprice",
                F.lit(f"INS-{i}").alias("o_orderpriority"), live,
            )
            dels = orders.where((k % 3 == 0) & (k % 7 == i + 3)).select(
                k, "o_totalprice", "o_orderpriority", dead,
            )
            batch = upd.unionByName(ins).unionByName(dels)
            if i == 3:
                res = orders.where((k % 3 == 0) & (k % 7 == 4)).select(
                    k,
                    (F.col("o_totalprice") + 77).alias("o_totalprice"),
                    F.lit("RES-3").alias("o_orderpriority"),
                    live,
                )
                retract = orders.where(
                    (k % 3 == 1) & (k % 7 == 1) & (k % 5 == 0)
                ).select(k, "o_totalprice", "o_orderpriority", dead)
                batch = batch.unionByName(res).unionByName(retract)
            batch.coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        ck = os.path.join(work, "ck")

        def drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(src)
            )
            cdc_merge_stream(
                spark, stream, root, on="o_orderkey",
                delete_col="__deleted", checkpoint_dir=ck,
            ).awaitTermination()

        drain()
        # append + (upsert-merge, delete-merge) per batch
        assert len(t.versions(spark)) == 7, "two tagged merges per batch"
        shutil.rmtree(ck)
        drain()  # lost checkpoint: full redelivery must no-op
        assert len(t.versions(spark)) == 7, "replay committed dupes"
        assert [e["op"] for e in t.history(spark)] == ["merge"] * 6 + [
            "append"
        ]
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        out = (
            t.read(spark)
            .groupBy(F.col("o_orderpriority").alias("pr"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(cents).cast("long").alias("total_cents"),
                F.max("o_orderkey").cast("long").alias("max_key"),
                F.sum(
                    F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
                ).cast("long").alias("n_null_cust"),
            )
            .orderBy("pr")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "st40_streaming_cdf_consumer",
    oracle="""
    WITH cuts AS (
      SELECT CAST(FLOOR(MAX(o_orderkey) * 2 / 16.0) AS BIGINT) AS s1,
             CAST(FLOOR(MAX(o_orderkey) * 3 / 16.0) AS BIGINT) AS e1,
             CAST(FLOOR(MAX(o_orderkey) * 6 / 16.0) AS BIGINT) AS s2,
             CAST(FLOOR(MAX(o_orderkey) * 7 / 16.0) AS BIGINT) AS e2,
             CAST(FLOOR(MAX(o_orderkey) * 10 / 16.0) AS BIGINT) AS s3,
             CAST(FLOOR(MAX(o_orderkey) * 11 / 16.0) AS BIGINT) AS e3
      FROM orders
    ),
    base AS (
      SELECT o.o_orderkey AS k, o.o_orderpriority AS pr0,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents0
      FROM orders o WHERE o.o_orderkey % 3 = 0
    ),
    final AS (
      -- base rows surviving the banded tombstones (odd keys in the
      -- three bands die), with each band's update on the even keys
      SELECT CASE WHEN b.k >= c.s1 AND b.k < c.e1 AND b.k % 2 = 0
                  THEN 'UPD-1'
                  WHEN b.k >= c.s2 AND b.k < c.e2 AND b.k % 2 = 0
                  THEN 'UPD-2'
                  WHEN b.k >= c.s3 AND b.k < c.e3 AND b.k % 2 = 0
                  THEN 'UPD-3'
                  ELSE b.pr0 END AS pr,
             b.cents0
             + CASE WHEN b.k >= c.s1 AND b.k < c.e1 AND b.k % 2 = 0
                    THEN 10000
                    WHEN b.k >= c.s2 AND b.k < c.e2 AND b.k % 2 = 0
                    THEN 20000
                    WHEN b.k >= c.s3 AND b.k < c.e3 AND b.k % 2 = 0
                    THEN 30000
                    ELSE 0 END AS cents
      FROM base b, cuts c
      WHERE NOT (b.k % 2 = 1 AND (
              (b.k >= c.s1 AND b.k < c.e1)
              OR (b.k >= c.s2 AND b.k < c.e2)
              OR (b.k >= c.s3 AND b.k < c.e3)))
      UNION ALL
      -- batch 3 re-inserts the %5=0 subset of band 1's deleted keys
      SELECT 'RES' AS pr, b.cents0 + 7700 AS cents
      FROM base b, cuts c
      WHERE b.k >= c.s1 AND b.k < c.e1 AND b.k % 2 = 1 AND b.k % 5 = 0
      UNION ALL
      -- streamed inserts: fresh even %3=1 keys, one band per batch
      SELECT CASE WHEN o.o_orderkey < c.e1 THEN 'INS-1'
                  WHEN o.o_orderkey < c.e2 THEN 'INS-2'
                  ELSE 'INS-3' END AS pr,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o, cuts c
      WHERE o.o_orderkey % 3 = 1 AND o.o_orderkey % 2 = 0
        AND ((o.o_orderkey >= c.s1 AND o.o_orderkey < c.e1)
             OR (o.o_orderkey >= c.s2 AND o.o_orderkey < c.e2)
             OR (o.o_orderkey >= c.s3 AND o.o_orderkey < c.e3))
    )
    SELECT pr, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY pr ORDER BY pr
    """,
)
def st40_streaming_cdf_consumer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDF CONSUMER (r12 VERDICT task 4): a downstream
    maintained aggregate FOLLOWS a snapshot table through DML, per
    trigger, via the change feed — cdc_mv_stream composes the st38/39
    CDC apply with a per-batch IncrementalAggregate.refresh() that
    consumes read_changes for exactly the commits the batch landed.
    Three banded micro-batches (each confined to one eighth of the
    key range of a 16-file range layout) update the band's even base
    keys, insert fresh keys, and tombstone the band's odd keys; batch
    3 also re-inserts a slice batch 1 deleted. EVERY refresh is
    asserted in-entry to run in 'fold' mode with the manifest-priced
    span <= head (the r12 cost gate admitting a genuine DML slice),
    so per-trigger consumer cost = the batch's own file slice + group
    cardinality — never a source rescan. The drained MV state
    hash-matches the flat oracle; a lost-checkpoint full redelivery
    is asserted to move NOTHING (merges no-op on tags, the source
    version stays, every refresh is a srcv-tag noop). 100 TB story:
    the dashboard follows a mutating 100 TB corpus at DML-slice cost
    per trigger, and the gate would answer a corpus-sized batch with
    a rebuild instead of a 2x-corpus diff."""
    import shutil
    import tempfile
    import uuid as _uuid

    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable
    from logverzcore_spark.streaming.avro_stream import cdc_mv_stream

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    work = tempfile.mkdtemp(prefix=f"st40_{_uuid.uuid4().hex[:8]}_")
    try:
        hi = int(orders.agg(F.max("o_orderkey")).first()[0])
        # three NARROW, SEPARATED key bands (1/16 of the keyspace at
        # 2/16, 6/16, 10/16): narrow keeps each batch's rewrite slice
        # a small file subset; the gaps keep batch i+1 from touching
        # the widened output file batch i's rewrite produced (adjacent
        # bands cascade: each rewrite's interval straddles the next
        # band's edge and the slice snowballs past the cost gate)
        bands = [
            (hi * (4 * i - 2) // 16, hi * (4 * i - 1) // 16)
            for i in (1, 2, 3)
        ]
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        t = SnapshotTable(os.path.join(work, "src"))
        t.append(
            orders.where(k % 3 == 0).select(
                k, "o_orderpriority", cents.alias("cents")
            ).repartitionByRange(16, "o_orderkey")
        )
        mv = IncrementalAggregate(
            t, os.path.join(work, "state"), ["o_orderpriority"],
            {"n_rows": ("count", None), "total_cents": ("sum", "cents")},
            source_keys=["o_orderkey"],
        )
        assert mv.refresh(spark)["mode"] == "initial"

        src = os.path.join(work, "cdc")
        dead = F.lit(True).alias("__deleted")
        live = F.lit(False).alias("__deleted")
        import time as _time

        for i in (1, 2, 3):
            lo, hi_b = bands[i - 1]
            band = (k >= lo) & (k < hi_b)
            upd = orders.where((k % 3 == 0) & band & (k % 2 == 0)).select(
                k, F.lit(f"UPD-{i}").alias("o_orderpriority"),
                (cents + 10000 * i).alias("cents"), live,
            )
            ins = orders.where((k % 3 == 1) & band & (k % 2 == 0)).select(
                k, F.lit(f"INS-{i}").alias("o_orderpriority"),
                cents.alias("cents"), live,
            )
            dels = orders.where((k % 3 == 0) & band & (k % 2 == 1)).select(
                k, "o_orderpriority", cents.alias("cents"), dead,
            )
            batch = upd.unionByName(ins).unionByName(dels)
            batch.coalesce(1).write.mode("append").parquet(src)
            _time.sleep(1.1)  # distinct mtimes: stable file->batch order
        # batch 4: RE-INSERT a slice of the keys batch 1 deleted — its
        # own trigger, so its rewrite slice is band 1 alone (folding a
        # re-insert after a retraction the MV already folded), not a
        # two-band span
        res = orders.where(
            (k % 3 == 0) & (k >= bands[0][0]) & (k < bands[0][1])
            & (k % 2 == 1) & (k % 5 == 0)
        ).select(
            k, F.lit("RES").alias("o_orderpriority"),
            (cents + 7700).alias("cents"), live,
        )
        res.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
        schema = spark.read.parquet(src).schema
        ck = os.path.join(work, "ck")
        reports: list = []

        def drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(src)
            )
            cdc_mv_stream(
                spark, stream, mv, on="o_orderkey",
                delete_col="__deleted", checkpoint_dir=ck,
                on_refresh=reports.append,
            ).awaitTermination()

        drain()
        # every trigger's refresh folded the batch's own DML slice,
        # admitted by the priced gate (span <= head) — the per-trigger
        # cost contract this entry grades
        assert reports, "no refresh ran"
        for rep in reports:
            assert rep["mode"] == "fold", rep
            assert rep["priced_span"] <= rep["priced_head"], rep
        n_src = len(t.versions(spark))
        n_state = len(mv.state.versions(spark))
        assert n_state == 1 + len(reports)
        # lost checkpoint: full redelivery moves NOTHING — merges
        # no-op on tags, the source version stays, refreshes noop
        shutil.rmtree(ck)
        drain()
        assert len(t.versions(spark)) == n_src, "replay committed dupes"
        assert len(mv.state.versions(spark)) == n_state
        assert all(r["mode"] == "noop" for r in reports[len(reports) // 2:])
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


@query("st41_streaming_index_consumer", oracle=_st41_oracle())
def st41_streaming_index_consumer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDF consumer for a SERVING ANN INDEX: cdc_index_stream
    composes the st38/39 CDC apply with per-trigger
    ivf_index_apply_changes — a persisted IVF index follows its source
    embedding table through a CDC stream at touched-cell cost. Three
    banded micro-batches (bands at 2/16, 6/16, 10/16 of the vec_id
    range) negate each band's even vectors (updates — guaranteed cell
    moves), insert reversed copies under shifted ids, and tombstone the
    band's odd ids; a fourth batch re-inserts band 1's odd %5==0 ids
    with reversed vectors (upsert-after-tombstone, the retraction
    reversal path). Every live trigger is asserted to touch cells
    (noop=False); the index catch-up watermark is persisted
    ({index}_applied), so a lost-checkpoint full redelivery is asserted
    to move NOTHING at either layer (merges no-op on tags, no new
    versions, every apply an empty-span noop). The final probe is
    graded hash-exact against an oracle that replays the whole CDC
    history AND the IVF probe in SQL — a lost tombstone, a stale cell,
    or a missed re-insert breaks the hash. 100 TB story: the serving
    index follows a mutating corpus at (span images × bounded cell
    rows) per trigger — never an index rebuild (the scale cell is
    tools/ivf_cdf_scale_probe.py's)."""
    import shutil
    import tempfile
    import time as _time
    import uuid as _uuid

    from logverzcore_spark.snapshots import SnapshotTable
    from logverzcore_spark.streaming.avro_stream import cdc_index_stream

    emb = _t(spark, sf_dir, "embeddings")
    m = int(emb.agg(F.max("vec_id")).first()[0])
    bands = [(m * (4 * i - 2) // 16, m * (4 * i - 1) // 16) for i in (1, 2, 3)]
    work = tempfile.mkdtemp(prefix=f"st41_{_uuid.uuid4().hex[:8]}_")
    idx = f"st41_ivf_{_uuid.uuid4().hex[:8]}"
    k = F.col("vec_id")
    try:
        t = SnapshotTable(os.path.join(work, "src"))
        t.append(
            emb.select("vec_id", "embedding").repartitionByRange(16, "vec_id")
        )
        similarity.ivf_index_build(
            t.read(spark), idx, n_cells=16,
            centroids=similarity.lcg_centroids(64, 16),
        )
        src = os.path.join(work, "cdc")
        neg = F.transform("embedding", lambda x: -x)
        rev = F.reverse("embedding")
        live = F.lit(False).alias("__deleted")
        dead = F.lit(True).alias("__deleted")
        for lo, hi in bands:
            band = (k >= lo) & (k < hi)
            upd = emb.where(band & (k % 2 == 0)).select(
                k, neg.alias("embedding"), live
            )
            ins = emb.where(band & (k % 2 == 0)).select(
                (k + m + 1).alias("vec_id"), rev.alias("embedding"), live
            )
            dels = emb.where(band & (k % 2 == 1)).select(
                k, F.col("embedding"), dead
            )
            batch = upd.unionByName(ins).unionByName(dels)
            batch.coalesce(1).write.mode("append").parquet(src)
            _time.sleep(1.1)  # distinct mtimes: stable file->batch order
        lo, hi = bands[0]
        res = emb.where(
            (k >= lo) & (k < hi) & (k % 2 == 1) & (k % 5 == 0)
        ).select(k, rev.alias("embedding"), live)
        res.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
        schema = spark.read.parquet(src).schema
        ck = os.path.join(work, "ck")
        reports: list = []

        def drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(src)
            )
            cdc_index_stream(
                spark, stream, t, idx, on="vec_id",
                delete_col="__deleted", checkpoint_dir=ck,
                on_apply=reports.append,
            ).awaitTermination()

        drain()
        assert reports, "no apply ran"
        for rep in reports:
            assert not rep["noop"] and rep["touched_cells"], rep
        n_src = len(t.versions(spark))
        # lost checkpoint: full redelivery moves NOTHING — merges no-op
        # on tags, no new versions appear, every apply is an empty-span
        # noop against the persisted watermark
        shutil.rmtree(ck)
        drain()
        assert len(t.versions(spark)) == n_src, "replay committed dupes"
        assert all(r["noop"] for r in reports[len(reports) // 2:]), reports
        queries = t.read(spark).where(F.col("vec_id") < 20)
        out = similarity.ivf_index_probe(
            spark, queries, idx, k=5, nprobe=4
        ).localCheckpoint(eager=True)
    finally:
        for tb in (idx, f"{idx}_centroids", f"{idx}_applied"):
            spark.sql(f"DROP TABLE IF EXISTS {tb}")
        shutil.rmtree(work, ignore_errors=True)
    return out
