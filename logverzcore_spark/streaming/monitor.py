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
