"""Streaming BM25 index maintenance — fold a document stream into a
persisted term-bucketed postings index (``text.bm25_index_build`` /
``bm25_index_append``), the lexical sibling of ``ivf_stream``.

Replay safety follows the ivf_stream rationale: ``foreachBatch`` is
at-least-once, and the fold's id-level dedupe (in-batch
``dropDuplicates`` + seen-id anti-join inside ``bm25_index_append``)
makes a redelivered batch a no-op — per-ROW idempotence, no batch-id
marker table. Corpus stats (n_docs, l_tok) are RECOMPUTED from the
postings after every append rather than folded incrementally, so a
crash between the postings commit and the stats write self-heals on
the next batch instead of drifting.

Because postings rows are per-doc-local, append == rebuild: a
stream-maintained index probes exactly like a from-scratch build over
everything seen — suite st29 hash-verifies that against the same SQL
oracle as the batch-built s18.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from logverzcore_spark.operators.text import bm25_index_append


def bm25_append_stream(
    spark: SparkSession,
    doc_stream: DataFrame,
    index_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a BM25 postings index over a streaming source of
    (id, text) rows. Each micro-batch tokenizes ONLY its own documents
    (never the corpus), appends their postings under the existing
    bucketed layout, and refreshes the stats row."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        bm25_index_append(
            spark, batch_df, index_table, text_col=text_col, id_col=id_col
        )

    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_bm25_{uuid.uuid4().hex[:8]}"
    )
    writer = doc_stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = ["bm25_append_stream", "canary_scan_stream"]


def canary_scan_stream(
    spark: SparkSession,
    doc_stream: DataFrame,
    state_table: str,
    canaries: tuple[str, ...] | None = None,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """The eval-canary release gate (``text.canary_scan``) as a
    CONTINUOUS check: every micro-batch of a collected corpus is
    scanned for the literal canary strings and hits append to a state
    table — so a leak is known at COLLECTION time, not discovered by a
    pre-release scan months of data later. Per-row replay idempotence
    via a (canary, doc_id) anti-join against the state (a re-delivered
    hit appends nothing); reading the state grouped by (source, canary)
    equals the batch scan over everything seen (suite st31 grades that
    against t58's oracle verbatim)."""
    from pyspark.sql import functions as F

    from logverzcore_spark.operators.text import BIGBENCH_CANARY

    cans = tuple(canaries) if canaries else (BIGBENCH_CANARY,)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        hits = None
        for c in cans:
            h = batch_df.where(F.col(text_col).contains(c)).select(
                F.col(source_col).alias("source"),
                F.lit(c).alias("canary"),
                F.col(id_col).alias("doc_id"),
            )
            hits = h if hits is None else hits.unionByName(h)
        hits = hits.dropDuplicates(["canary", "doc_id"])
        if spark.catalog.tableExists(state_table):
            seen = spark.table(state_table).select("canary", "doc_id")
            hits = hits.join(seen, ["canary", "doc_id"], "left_anti")
            hits.write.mode("append").saveAsTable(state_table)
        else:
            hits.write.saveAsTable(state_table)
        spark.catalog.refreshTable(state_table)

    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_canary_{uuid.uuid4().hex[:8]}"
    )
    writer = doc_stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
