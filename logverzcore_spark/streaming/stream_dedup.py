"""Streaming deduplication — continuous collection + the dedup family
composed (the north-star combination: Structured Streaming ingest feeding
a training-data pipeline).

``dedup_stream`` ingests files continuously and appends only
never-seen-before documents to the target table, tracking content
fingerprints in a state table via ``foreachBatch``:

- per batch: fingerprint (md5 of normalized text) → drop in-batch dups
  (keep lowest id) → left-anti join against the persistent fingerprint
  state → append survivors to the data table AND their fingerprints to
  the state table.
- the state table is a plain warehouse table partition-pruned by
  fingerprint prefix, so the anti-join shuffles only the (tiny)
  fingerprint column, never the documents.
- delivery semantics: batch replay after a clean failure is idempotent —
  replayed rows anti-join against their own committed fingerprints and
  drop out. The data and fingerprint appends are two separate
  (non-atomic) commits, so a crash landing BETWEEN them degrades that
  batch to at-least-once (data committed, fingerprints not → replay
  re-appends). Data-before-fingerprints is the safe order: the reverse
  would silently LOSE documents on replay. A transactional table format
  (single multi-table commit) is the upgrade path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from logverzcore_spark.operators.text import fingerprint_md5


def _dedup_batch(
    batch: DataFrame,
    spark: SparkSession,
    target_table: str,
    state_table: str,
    text_col: str,
    id_col: str,
) -> None:
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    in_batch = (
        batch.withColumn("_fp", fingerprint_md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if spark.catalog.tableExists(state_table):
        seen = spark.table(state_table)
        fresh = in_batch.join(
            seen.hint("shuffle_hash"), in_batch["_fp"] == seen["fp"], "left_anti"
        )
    else:
        fresh = in_batch
    fresh.persist()
    try:
        fresh.drop("_fp").write.mode("append").saveAsTable(target_table)
        fresh.select(F.col("_fp").alias("fp")).write.mode("append").saveAsTable(state_table)
    finally:
        fresh.unpersist()
    # The appends ran on the cloned micro-batch session; the outer
    # session's cached file listings for both tables are now stale. Left
    # unrefreshed, the NEXT batch's anti-join reads an old fingerprint
    # snapshot and lets duplicates through (observed), and callers see
    # pre-batch row counts.
    spark.catalog.refreshTable(target_table)
    spark.catalog.refreshTable(state_table)


def dedup_stream(
    spark: SparkSession,
    path: str,
    schema,
    target_table: str,
    state_table: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "json",
    reader_options: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 10,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously ingest documents, writing only first-seen content."""
    import os
    import tempfile
    import uuid

    state_table = state_table or f"{target_table}_fingerprints"
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.option("maxFilesPerTrigger", str(max_files_per_trigger)).load(path)
    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_dd_{uuid.uuid4().hex[:8]}"
    )
    writer = (
        stream.writeStream.option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda batch, _id: _dedup_batch(
                batch, spark, target_table, state_table, text_col, id_col
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curate_stream(
    spark: SparkSession,
    source_stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    state_table: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 1000,
    min_stopword_ratio: float = 0.05,
    max_repetition_ratio: float = 0.6,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming curation: the quality gate (pipeline.curate's rules —
    per-row projections, so they run ON the stream before any state) in
    front of the fingerprint-state dedup fold. A crawler feeding this
    continuously maintains a quality-filtered, exactly-deduped corpus —
    the streaming form of ``pipeline.curate``'s first two stages
    (fuzzy-dedup's streaming form is ``stream_neardup``; chain the two
    target tables to get all three).

    Committed results equal the batch pipeline over the same files
    (suite:st16 hash-verifies the equivalence), because the quality
    predicate is per-row (batch boundaries can't change it) and the
    dedup keep-first rule is id-ordered, not arrival-ordered, within a
    batch — across batches, first-committed wins, which equals min-id
    when ids arrive in order."""
    from logverzcore_spark.operators import text as textops

    state_table = state_table or f"{target_table}_fingerprints"
    c = F.col(text_col)
    # Same 4-dp-rounded thresholds as text_profile/t02 — the batch
    # pipeline and its SQL oracle gate on the rounded values.
    gated = source_stream.where(
        textops.token_count(c).between(min_tokens, max_tokens)
        & (F.round(textops.stopword_ratio(c), 4) >= min_stopword_ratio)
        & (F.round(textops.repetition_ratio(c), 4) <= max_repetition_ratio)
    )
    writer = gated.writeStream.option("checkpointLocation", checkpoint_dir).foreachBatch(
        lambda batch, _id: _dedup_batch(
            batch, spark, target_table, state_table, text_col, id_col
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
