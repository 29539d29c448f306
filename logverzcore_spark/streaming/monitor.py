"""Streaming job heartbeat — the reference's Invocations progress rows
for the continuous-collection path.

Batch workers heartbeat one row per iteration into the Invocations SQL
table (jobid, invocationid, updateunixtime, status — worker.js:718-772,
enginesharedv3.mjs:17-36) and the controller polls it to babysit the
fleet. For streams, Spark's ``StreamingQueryListener`` delivers the same
signal natively: one progress event per micro-batch with rows/sec and
batch duration, plus start/termination events. ``InvocationsListener``
adapts those events to Invocations-shaped records and can snapshot them
to a metrics table for SQL-side monitoring.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener


class InvocationsListener(StreamingQueryListener):
    """Collects per-micro-batch heartbeat records, driver-side.

    Records accumulate in memory (one dict per event — bounded by
    ``max_records``, oldest dropped first, same spirit as the
    reference's rolling Invocations rows) and flush to a table on
    demand; a listener must never do per-event Spark writes, which
    would stall the streaming thread.
    """

    SCHEMA = (
        "query_id string, run_id string, name string, batch_id long, "
        "status string, num_input_rows long, updateunixtime double"
    )

    def __init__(self, max_records: int = 10_000):
        self.records: list[dict] = []
        self.max_records = max_records

    def _add(self, **rec) -> None:
        self.records.append(rec)
        if len(self.records) > self.max_records:
            del self.records[: len(self.records) - self.max_records]

    def onQueryStarted(self, event) -> None:
        self._add(
            query_id=str(event.id), run_id=str(event.runId), name=event.name or "",
            batch_id=-1, status="started", num_input_rows=0,
            updateunixtime=time.time(),
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._add(
            query_id=str(p.id), run_id=str(p.runId), name=p.name or "",
            batch_id=p.batchId, status="progress",
            num_input_rows=p.numInputRows, updateunixtime=time.time(),
        )

    def onQueryIdle(self, event) -> None:
        self._add(
            query_id=str(event.id), run_id=str(event.runId), name="",
            batch_id=-1, status="idle", num_input_rows=0,
            updateunixtime=time.time(),
        )

    def onQueryTerminated(self, event) -> None:
        self._add(
            query_id=str(event.id), run_id=str(event.runId), name="",
            batch_id=-1,
            status="failed" if event.exception else "terminated",
            num_input_rows=0, updateunixtime=time.time(),
        )

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """The collected heartbeats as a DataFrame (empty-safe)."""
        return spark.createDataFrame(
            [tuple(r.values()) for r in self.records] or [], self.SCHEMA
        )

    def flush_to_table(self, spark: SparkSession, table: str) -> int:
        """Append collected heartbeats to ``table`` and clear the buffer;
        returns the number of rows written."""
        n = len(self.records)
        if n:
            self.snapshot(spark).write.mode("append").saveAsTable(table)
            self.records = []
        return n


__all__ = ["InvocationsListener"]


def schema_drift_stream(
    spark: SparkSession,
    source_stream: DataFrame,
    baseline_table: str,
    drift_table: str,
    checkpoint_dir: str,
    json_col: str = "props",
    available_now: bool = True,
):
    """Continuous JSON schema-drift monitoring — q131's audit lifted to
    the collection stream: every micro-batch's key profile
    (coerce.json_key_profile) diffs against a PERSISTED baseline
    profile table, and non-stable keys (added / removed / type_changed
    vs the baseline) append to ``drift_table`` with the batch id — the
    alert feed an ingest operator watches while a producer's payload
    shape moves under a running collection. 'removed' here means
    "baseline key absent from this batch", which per micro-batch is a
    weaker signal than the batch report's (a sparse key can skip small
    batches); the drift row carries the batch id so the consumer can
    require persistence across batches before paging anyone.

    Per batch: one explode + key groupBy of the BATCH only (the
    baseline is a ≤keys-row table), a metadata-sized diff join, an
    append. Replayed batches re-emit their drift rows keyed by the
    same batch id — dedup on (batch_id, key) is a reader-side filter,
    kept out of the write path to stay append-only."""
    from logverzcore_spark.operators.coerce import (
        diff_key_profiles,
        json_key_profile,
    )
    from pyspark.sql import functions as F

    def _batch(batch: DataFrame, bid: int) -> None:
        if batch.isEmpty():
            # an empty trigger carries no shape signal — reporting it
            # would flag every baseline key 'removed' on every idle
            # micro-batch
            return
        prof = json_key_profile(batch, json_col)
        drift = (
            diff_key_profiles(spark.table(baseline_table), prof)
            .where(F.col("status") != "stable")
            .withColumn("batch_id", F.lit(int(bid)).cast("long"))
        )
        drift.write.mode("append").saveAsTable(drift_table)
        spark.catalog.refreshTable(drift_table)

    writer = source_stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
