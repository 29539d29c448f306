"""Streaming IVF index maintenance — fold an embedding stream into a
persisted cell-partitioned ANN index (``similarity.ivf_index_build`` /
``ivf_index_append``).

The batch operator already has the bucket-touched fold shape
(streaming/upsert.py): per micro-batch, assign new vectors to the
index's stored centroids (one Arrow matmul, no shuffle), anti-join only
the touched cells (partition-pruned), append files only under touched
cell directories. This module wires that fold into ``foreachBatch`` so a
continuously-collected embedding table keeps its serving index fresh
without ever re-scanning the corpus.

Replay safety: ``foreachBatch`` is at-least-once; the fold's id-level
dedupe (in-batch ``dropDuplicates`` + anti-join per touched cell, r5)
makes a redelivered batch — or a batch that repeats a row internally —
a no-op, so no batch-id marker table is needed: idempotence is
per-ROW, which also covers the partial-append crash window (rows
written before a crash are skipped on replay, the rest land). Asserted
in ``test_ivf_append_stream_replay_idempotent``. This rationale holds
ONLY because the fold pins ``dedupe=True``; exposing ``dedupe=False``
here would require a batch-id marker table instead.

Centroid drift is the operator's responsibility: appends never move
centroids, so schedule ``similarity.ivf_index_recenter`` when cell-size
skew (cheap to monitor: one groupBy over the partition column) degrades
probe selectivity.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from logverzcore_spark.operators.similarity import ivf_index_append


def ivf_append_stream(
    spark: SparkSession,
    vector_stream: DataFrame,
    index_table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``index_table`` (built once with ``ivf_index_build``)
    over a streaming source of (id, vector) rows."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ivf_index_append(
            spark, batch_df, index_table, vec_col=vec_col, id_col=id_col,
            dedupe=True,
        )

    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_ivf_{uuid.uuid4().hex[:8]}"
    )
    writer = vector_stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivfpq_append_stream(
    spark: SparkSession,
    vector_stream: DataFrame,
    index_table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain an IVF-PQ index (built once with
    ``similarity.ivfpq_index_build``) over a streaming source of
    (id, vector) rows — the PQ-coded sibling of ``ivf_append_stream``
    with the same per-ROW replay-idempotence rationale (the fold pins
    ``dedupe=True``; cell AND codes are functions of the STORED
    centroid/codebook tables, so a replayed or re-delivered row
    re-encodes identically and anti-joins away). Because append equals
    rebuild, a stream-maintained index probes exactly like a
    from-scratch build over everything seen — suite st23 hash-verifies
    that against the same SQL oracle as s11b."""
    from logverzcore_spark.operators.similarity import ivfpq_index_append

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ivfpq_index_append(
            spark, batch_df, index_table, vec_col=vec_col, id_col=id_col,
            dedupe=True,
        )

    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_ivfpq_{uuid.uuid4().hex[:8]}"
    )
    writer = vector_stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = ["ivf_append_stream", "ivfpq_append_stream"]
