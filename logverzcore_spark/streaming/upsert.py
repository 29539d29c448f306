"""Keyed CDC upsert — a change stream folded into a bucket-partitioned
table that always holds the LATEST row per key.

The reference's continuous collection is append-only (worker inserts,
collection.js); a training-data / operational pipeline also needs the
keyed-upsert shape: user profiles, document revisions, label fixes. On
plain parquet a naive upsert rewrites the whole table per batch. This
one doesn't: the table is partitioned by ``_bucket = pmod(xxhash64(key),
n_buckets)``, each micro-batch computes which buckets its keys touch,
merges ONLY those partitions' rows with the batch (latest-wins by the
event-time column, deterministic tie columns, then new-over-old), and
dynamically overwrites just those partitions. Per-batch cost is
O(touched buckets × bucket size), not O(table) — the same
touched-partition pattern as ``rollup.py``, applied to keys instead of
days. A transactional format upgrades the partition swap to ACID; the
data flow is identical.

Replay safety: same ``<table>_meta`` last-applied-batch-id marker as the
rollup (foreachBatch is at-least-once; see rollup.py module doc for the
residual plain-parquet window).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from logverzcore_spark.streaming.rollup import (
    _last_applied_batch,
    _record_applied_batch,
)

BUCKET_COL = "_bucket"


def _latest_per_key(
    df: DataFrame, key_col: str, ts_col: str, tie_cols: list[str], src_col: str | None
) -> DataFrame:
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tie_cols]
    if src_col is not None:  # new rows beat existing rows on a full tie
        order.append(F.col(src_col).desc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def make_upsert_fold(
    spark: SparkSession,
    table: str,
    key_col: str,
    ts_col: str,
    tie_cols: list[str] | None = None,
    n_buckets: int = 32,
):
    """Build the per-micro-batch upsert closure (exposed for direct
    testing of merge and replay semantics). ``tie_cols`` make
    latest-wins deterministic when ``ts_col`` ties — pass the natural
    unique column (e.g. event_id).

    Unlike the additive rollups, a post-write/pre-meta crash replay is
    harmless here WITHOUT extra markers: latest-wins merge is idempotent
    (re-merging a batch already reflected in the table reproduces the
    same rows), so the meta marker only short-circuits wasted work —
    pinned by test_upsert_replay_after_committed_write."""
    tie_cols = tie_cols or []
    meta_table = f"{table}_meta"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_applied_batch(spark, meta_table):
            return
        batch = _latest_per_key(batch_df, key_col, ts_col, tie_cols, None).withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
        )
        if not spark.catalog.tableExists(table):
            # Cluster rows by bucket before the partitioned write: without
            # it every upstream task writes a file into every bucket dir
            # (tasks × buckets files — measured 4× slower even at sf0.01,
            # and a file-count explosion at scale).
            batch.repartition(F.col(BUCKET_COL)).write.partitionBy(
                BUCKET_COL
            ).saveAsTable(table)
            _record_applied_batch(spark, meta_table, batch_id)
            return
        touched = [r[BUCKET_COL] for r in batch.select(BUCKET_COL).distinct().collect()]
        if not touched:
            _record_applied_batch(spark, meta_table, batch_id)
            return
        existing = spark.table(table).where(F.col(BUCKET_COL).isin(touched))
        merged = _latest_per_key(
            existing.withColumn("_src", F.lit(0)).unionByName(
                batch.withColumn("_src", F.lit(1))
            ),
            key_col, ts_col, tie_cols, "_src",
        ).drop("_src")
        merged = merged.repartition(F.col(BUCKET_COL))  # one file per bucket
        merged = merged.localCheckpoint(eager=True)  # break read-overwrite cycle
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").insertInto(table)
        finally:
            # restore EXACTLY: re-pinning an unset conf is session-conf
            # drift the parity gate rejects
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        _record_applied_batch(spark, meta_table, batch_id)

    return fold


def upsert_stream(
    spark: SparkSession,
    change_stream: DataFrame,
    table: str,
    key_col: str,
    ts_col: str,
    tie_cols: list[str] | None = None,
    n_buckets: int = 32,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``table`` as the latest-row-per-key view of a change
    stream (see module doc for the bucket-partitioned merge)."""
    fold = make_upsert_fold(spark, table, key_col, ts_col, tie_cols, n_buckets)
    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_upsert_{uuid.uuid4().hex[:8]}"
    )
    writer = change_stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_scd2_fold(
    spark: SparkSession,
    table: str,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_col: str,
    n_buckets: int = 32,
):
    """Incremental Type-2 SCD maintenance — the streaming sibling of the
    batch ``eventops.scd2_history`` (suite:q114), as a per-micro-batch
    closure over a bucket-partitioned history table (upsert.py's
    touched-partition mechanics, applied to versioned history instead of
    latest-wins).

    Per batch: load ONLY the touched buckets; keys not in the batch pass
    through untouched; for batch keys, closed versions are immutable and
    carried as-is, while each OPEN version is re-expressed as a seed
    observation and re-folded together with the batch's observations
    through the same scd2 window logic — a leading re-assertion
    collapses into the seed (the open row survives), a change closes it
    and appends versions numbered from the seed's version. One dynamic
    partition overwrite of the touched buckets.

    Contracts (documented, pytest-pinned): observations must arrive in
    event-time order ACROSS batches (the CDC log shape) — a batch row
    older than a key's open version is late data, counted out and
    dropped (retro-edits take the batch rebuild path); replay safety
    comes from the meta marker (an SCD2 re-fold of an already-applied
    batch is NOT idempotent, unlike latest-wins upsert — same residual
    plain-parquet window as rollup.py, closed by a transactional
    format)."""
    from logverzcore_spark.operators.eventops import scd2_history

    meta_table = f"{table}_meta"
    obs_cols = [key_col, *attr_cols, ts_col, tie_col]

    def _with_bucket(df: DataFrame) -> DataFrame:
        return df.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_applied_batch(spark, meta_table):
            return
        obs = batch_df.select(*obs_cols)
        if not spark.catalog.tableExists(table):
            hist = scd2_history(
                obs, key_col=key_col, ts_col=ts_col, attr_cols=attr_cols,
                tie_col=tie_col,
            )
            _with_bucket(hist).repartition(F.col(BUCKET_COL)).write.partitionBy(
                BUCKET_COL
            ).saveAsTable(table)
            _record_applied_batch(spark, meta_table, batch_id)
            return
        batch = _with_bucket(obs)
        touched = [r[BUCKET_COL] for r in batch.select(BUCKET_COL).distinct().collect()]
        if not touched:
            _record_applied_batch(spark, meta_table, batch_id)
            return
        existing = spark.table(table).where(F.col(BUCKET_COL).isin(touched))
        batch_keys = batch.select(key_col).distinct()
        affected = existing.join(batch_keys, key_col, "semi")
        bystander = existing.join(batch_keys, key_col, "anti")
        closed = affected.where(~F.col("is_current"))
        seed = affected.where("is_current").select(
            F.col(key_col), *[F.col(a) for a in attr_cols],
            F.col("valid_from").alias(ts_col),
            F.col("version").alias("_seed_version"),
        )
        # late-data gate: a batch obs older than the open version breaks
        # the append-only contract — drop it (retro-edits rebuild in batch)
        seed_ts = seed.select(
            F.col(key_col), F.col(ts_col).alias("_open_ts"),
            F.col("_seed_version"),
        )
        gated = (
            batch.join(seed_ts, key_col, "left")
            .where(F.col("_open_ts").isNull() | (F.col(ts_col) >= F.col("_open_ts")))
        )
        combined = (
            seed.withColumn("_ord", F.lit(0))
            .withColumn("_tiev", F.lit(None).cast("long"))
            .select(
                key_col, *attr_cols, ts_col,
                F.struct("_ord", "_tiev").alias("_tie"),
            )
            .unionByName(
                gated.select(
                    key_col, *attr_cols, ts_col,
                    F.struct(
                        F.lit(1).alias("_ord"),
                        F.col(tie_col).cast("long").alias("_tiev"),
                    ).alias("_tie"),
                )
            )
        )
        refold = scd2_history(
            combined, key_col=key_col, ts_col=ts_col, attr_cols=attr_cols,
            tie_col="_tie",
        ).join(
            seed_ts.select(key_col, "_seed_version"), key_col, "left"
        ).withColumn(
            "version",
            (F.col("version") + F.coalesce(F.col("_seed_version") - 1, F.lit(0)))
            .cast("int"),
        ).drop("_seed_version")
        out_cols = [key_col, *attr_cols, "valid_from", "valid_to", "is_current",
                    "version"]
        merged = _with_bucket(
            closed.select(*out_cols).unionByName(refold.select(*out_cols))
            .unionByName(bystander.select(*out_cols))
        )
        merged = merged.repartition(F.col(BUCKET_COL)).localCheckpoint(eager=True)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").insertInto(table)
        finally:
            # restore EXACTLY: re-pinning an unset conf is session-conf
            # drift the parity gate rejects
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        _record_applied_batch(spark, meta_table, batch_id)

    return fold


def scd2_stream(
    spark: SparkSession,
    change_stream: DataFrame,
    table: str,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_col: str,
    n_buckets: int = 32,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Maintain ``table`` as the full Type-2 history of an in-order
    change stream (see ``make_scd2_fold``)."""
    fold = make_scd2_fold(
        spark, table, key_col, ts_col, attr_cols, tie_col, n_buckets
    )
    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_scd2_{uuid.uuid4().hex[:8]}"
    )
    return (
        change_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )



def apply_changes(
    spark: SparkSession,
    table: str,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    tie_cols: list[str] | None = None,
    op_col: str = "op",
    n_buckets: int = 32,
) -> dict:
    """Batch MERGE of an op-typed change set ('upsert' | 'delete' rows)
    into the bucket-partitioned keyed table — the batch sibling of
    ``make_upsert_fold`` completing the CDC surface: streaming
    latest-wins (st09), SCD2 history (st25), point deletes by id
    (q113), and now the three-way batch merge (update + insert +
    delete in ONE pass) a lakehouse MERGE INTO expresses.

    Semantics: changes collapse to the LATEST row per key (ts +
    tie_cols, deterministic); that row's op decides — 'delete' removes
    the key, anything else replaces-or-inserts the row unconditionally
    (standard WHEN MATCHED UPDATE / NOT MATCHED INSERT). Only the
    buckets the change keys hash into are read and dynamically
    overwritten — per-merge cost is O(touched buckets × bucket size),
    never O(table). Creating the table from an upsert-only change set
    bootstraps the same layout. Returns
    ``{"touched_buckets", "deletes", "upserts"}``."""
    tie_cols = tie_cols or []
    latest = _latest_per_key(changes, key_col, ts_col, tie_cols, None)
    latest = latest.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    ).localCheckpoint(eager=True)  # pin: bucket list + both branches reuse it
    dels = latest.where(F.col(op_col) == "delete")
    ups = latest.where(F.col(op_col) != "delete").drop(op_col)
    n_del, n_up = dels.count(), ups.count()
    if not spark.catalog.tableExists(table):
        ups.repartition(F.col(BUCKET_COL)).write.partitionBy(BUCKET_COL).saveAsTable(
            table
        )
        return {"touched_buckets": -1, "deletes": n_del, "upserts": n_up}
    touched = [r[BUCKET_COL] for r in latest.select(BUCKET_COL).distinct().collect()]
    if not touched:
        return {"touched_buckets": 0, "deletes": 0, "upserts": 0}
    existing = spark.table(table).where(F.col(BUCKET_COL).isin(touched))
    # Drop every changed key from the existing slice (delete AND update
    # targets), then add the upsert rows back — unconditional replace.
    change_keys = latest.select(F.col(key_col)).distinct()
    kept = existing.join(change_keys, key_col, "left_anti")
    merged = kept.unionByName(ups.select(*existing.columns))
    merged = merged.repartition(F.col(BUCKET_COL)).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").insertInto(table)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"touched_buckets": len(touched), "deletes": n_del, "upserts": n_up}


__all__ = ["upsert_stream", "make_upsert_fold", "make_scd2_fold", "scd2_stream", "apply_changes", "BUCKET_COL"]

