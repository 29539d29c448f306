"""Continuous Avro collection: .avro object-container drops stream into
a table exactly-once (suite st32).

The batch reader (sources.avro_ocf.read_avro) already runs as a
binaryFile scan + Arrow-batched decode, and Structured Streaming has a
binaryFile SOURCE — so the streaming variant is the same decode applied
inside ``foreachBatch``, with per-FILE replay idempotence: files are the
delivery unit of an object-store drop zone (the reference's SQS-driven
collection), so the table is partitioned by a file-hash column and each
batch DYNAMICALLY OVERWRITES only its own files' partitions — a
redelivered file clobbers its prior partition instead of appending a
duplicate, at O(batch) cost per batch (no table scan, no anti-join).
Corrupt files keep the batch reader's quarantine contract (one
lineage-carrying row, carried into the table with ``_corrupt_record``
set) instead of killing the stream.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = ["avro_collect_stream", "snapshot_append_stream", "incremental_mv_stream"]


def avro_collect_stream(
    spark: SparkSession,
    watch_dir: str,
    table: str,
    avro_schema: dict,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Drain ``watch_dir``'s .avro files into ``table``.

    ``avro_schema`` is the directory's writer schema (the batch path
    peeks it from the first file; a STREAM has no first file at plan
    time, so the contract is explicit here — the same reason streaming
    sources require a user schema everywhere in Spark). Decode reuses
    the batch mapInPandas path verbatim, so batch and stream cannot
    drift (suite st32 grades the drained table against q127's oracle
    shape)."""
    from logverzcore_spark.sources.avro_ocf import (
        avro_to_spark_schema,
        decode_ocf,
    )
    from logverzcore_spark.sources.readers import CORRUPT_COL, SOURCE_COL

    import json as _json

    import pandas as pd

    from pyspark.sql import types as T

    spark_schema = avro_to_spark_schema(avro_schema)
    names = [f.name for f in spark_schema.fields]
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in spark_schema.fields]
        + [
            T.StructField(CORRUPT_COL, T.StringType(), True),
            T.StructField(SOURCE_COL, T.StringType(), True),
        ]
    )
    out_columns = names + [CORRUPT_COL, SOURCE_COL]
    expected_canon = _json.dumps(avro_schema, sort_keys=True)

    def decode(batches):
        for pdf in batches:
            for src, blob in zip(pdf["path"], pdf["content"]):
                try:
                    schema, records = decode_ocf(bytes(blob))
                    if _json.dumps(schema, sort_keys=True) != expected_canon:
                        yield pd.DataFrame(
                            [[None] * len(names)
                             + ["writer schema differs from stream schema", src]],
                            columns=out_columns, dtype=object,
                        )
                        continue
                except Exception as exc:
                    yield pd.DataFrame(
                        [[None] * len(names) + [str(exc), src]],
                        columns=out_columns, dtype=object,
                    )
                    continue
                if records:
                    # dtype=object exactly like the batch reader
                    # (avro_ocf): pandas inference would turn a
                    # nullable long column with any null into float64
                    # and silently round big int64 values.
                    yield pd.DataFrame(
                        [[r.get(n) for n in names] + [None, src]
                         for r in records],
                        columns=out_columns, dtype=object,
                    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # Per-file exactly-once WITHOUT a table scan: the table is
        # partitioned by a file-hash column and each batch dynamically
        # overwrites only ITS files' partitions — a redelivered file
        # clobbers its own partition instead of appending a duplicate.
        # Cost per batch is O(batch), where the previous anti-join
        # against SELECT DISTINCT _source_file re-scanned the whole
        # table per micro-batch (O(n²) over the stream's lifetime).
        decoded = (
            batch_df.select("path", "content")
            .mapInPandas(decode, out_schema)
            .withColumn("_file_fp", F.md5(F.col(SOURCE_COL)))
        )
        if not spark.catalog.tableExists(table):
            decoded.write.partitionBy("_file_fp").saveAsTable(table)
            spark.catalog.refreshTable(table)
            return
        # foreachBatch hands the batch a CLONED session with isolated
        # conf — the overwrite mode must be set on THAT session (the
        # one the write plans under), not the outer one, or "overwrite"
        # silently truncates the whole table.
        bs = batch_df.sparkSession
        prev = bs.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        bs.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            decoded.write.mode("overwrite").insertInto(table)
        finally:
            # restore EXACTLY: re-pinning an unset conf is session-conf
            # drift the parity gate rejects
            if prev is None:
                bs.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                bs.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        spark.catalog.refreshTable(table)

    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_avro_{uuid.uuid4().hex[:8]}"
    )
    # Streaming sources require an explicit schema; binaryFile's is fixed.
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("pathGlobFilter", "*.avro")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(watch_dir)
    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_append_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    retries: int = 0,
) -> StreamingQuery:
    """Exactly-once streaming commits into a
    :class:`~logverzcore_spark.snapshots.SnapshotTable`: every
    micro-batch appends as ONE new snapshot version tagged with the
    batch id, so (a) a redelivered batch is a manifest-level no-op (the
    tag is already committed — per-batch idempotence without any data
    read), and (b) the stream's whole history stays time-travelable: a
    trainer can pin "the corpus as of version N" mid-stream and re-read
    it byte-stable while collection continues. The two-commit race
    (version manifest vs streaming checkpoint) is resolved by the tag:
    whichever side crashes first, the replay converges on exactly one
    committed copy (suite st33 grades the drained latest version; the
    kill/restart window is pytest-driven through the fold directly).

    Tags are NAMESPACED by the checkpoint identity — Spark restarts
    batch ids at 0 per checkpoint, so a bare batch id would make a
    SECOND stream into the same table silently no-op against the
    first's tags (the Delta-sink (queryId, batchId) lesson). Note the
    SnapshotTable single-writer contract still applies: two streams may
    ingest into one table only one at a time."""
    import hashlib

    from logverzcore_spark.snapshots import SnapshotTable

    table = SnapshotTable(root)
    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_snapstream_{uuid.uuid4().hex[:8]}"
    )
    ckid = hashlib.md5(checkpoint.encode("utf-8")).hexdigest()[:12]

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # retries re-points the batch's already-written files at a
        # newer head on CommitConflict (append's documented conflict
        # semantics; the tag keeps the retry replay-safe) — an
        # always-on ingest survives a concurrent compact/vacuum
        table.append(
            batch_df, tag=f"{ckid}:batch-{int(batch_id)}", retries=retries
        )
    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_merge_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    root: str,
    on,
    checkpoint_dir: str | None = None,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    delete_col: str | None = None,
    available_now: bool = True,
    retries: int = 0,
) -> StreamingQuery:
    """Streaming CDC APPLY into a
    :class:`~logverzcore_spark.snapshots.SnapshotTable`: every
    micro-batch of keyed upserts lands as ONE tagged
    :meth:`~logverzcore_spark.snapshots.SnapshotTable.merge_into` —
    the Delta streaming-MERGE shape on this layer. What composes here:

    - merge's selective rewrite makes the per-trigger cost the files
      the BATCH's keys live in (stats/bloom-pruned), not the table;
    - the batch tag makes redelivery a manifest-level no-op, so the
      checkpoint/commit crash window converges exactly like
      snapshot_append_stream's (same (ckid, batchId) namespacing);
    - within-batch duplicate keys are merge_into's documented refusal
      — a CDC feed must be key-unique per batch (compact upstream with
      keep-latest if it is not);
    - ORDER is the stream's order: later batches override earlier ones
      because each merge carries the source's absolute values. The
      single-writer contract applies as everywhere on this table.

    ``delete_col`` names a boolean tombstone column on the feed (the
    Debezium ``__deleted`` shape): rows where it is TRUE are applied
    as retractions (``when_matched='delete'``), the rest as the
    configured upsert — each side as its own tagged merge with a
    DISTINCT tag prefix (``{ckid}:u:batch-`` / ``{ckid}:d:batch-``),
    so a crash between the two converges on redelivery (the landed
    side no-ops on its tag, the other applies). The two sides have
    disjoint keys by the key-unique-per-batch contract, so their
    order within a batch is immaterial. The tombstone column itself
    is stripped before the merge (it is feed metadata, not data). A
    tombstone whose key is absent from the table is a no-op (the
    delete merge runs ``when_not_matched='ignore'``).

    BOOTSTRAP: a batch arriving before the table has any committed
    rows cannot MERGE (merge_into refuses an empty/absent head);
    upserts are then APPLIED AS AN APPEND under the same batch tag —
    semantically identical (nothing can match an empty table, so
    every row is an insert) and replay-safe through the same tag.
    With ``when_not_matched='ignore'`` the bootstrap batch lands
    nothing — but its tag STILL burns (an empty tagged commit), as
    does a tombstone side skipped against an empty table: a lost-
    checkpoint full redelivery must no-op on these batches rather
    than apply them against LATER state (e.g. replayed batch-1
    tombstones deleting keys a later batch inserted).

    ``retries`` threads to every merge/append the stream lands
    (merge re-RUNS against the freshly-read head, append re-points —
    each op's documented conflict semantics; the batch tag keeps
    every retry replay-safe), so an always-on CDC stream survives an
    owner's concurrent maintenance write — ``Engine.snapshot_compact``
    / ``snapshot_vacuum`` on the same table — instead of dying on the
    first :class:`CommitConflict` (threaded pytest proves the
    mid-drain compaction converges byte-identically).

    Suite st38 grades the drained end state against a flat-table
    oracle (st39 the tombstone path); replay (lost checkpoint, same
    path) is asserted in-entry."""
    import hashlib

    from logverzcore_spark.snapshots import SnapshotTable

    table = SnapshotTable(root)
    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_cdcstream_{uuid.uuid4().hex[:8]}"
    )
    ckid = hashlib.md5(checkpoint.encode("utf-8")).hexdigest()[:12]
    fold = _make_cdc_fold(
        table, ckid, on, when_matched, when_not_matched, delete_col,
        retries,
    )
    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _make_cdc_fold(
    table, ckid: str, on, when_matched: str, when_not_matched: str,
    delete_col: str | None, retries: int,
):
    """The per-micro-batch CDC apply (cdc_merge_stream's core), as a
    reusable closure so derived consumers (cdc_mv_stream) can compose
    their own work after the same tag-disciplined apply."""

    def _empty_head(sp) -> bool:
        head_v, head = table._head(sp)
        return head is None or not head["files"]

    def _apply(sp, batch_df: DataFrame, tag: str) -> None:
        """One upsert merge — or the bootstrap append when the table
        has nothing to merge into yet."""
        if _empty_head(sp):
            if when_not_matched == "insert":
                table.append(batch_df, tag=tag, retries=retries)
            else:
                # inserts off + empty table: provably nothing lands,
                # but the tag must burn anyway — a lost-checkpoint
                # full redelivery would otherwise re-apply this batch
                # against LATER state (r11 ADVICE)
                table.append(batch_df.limit(0), tag=tag, retries=retries)
            return
        table.merge_into(
            sp, batch_df, on,
            when_matched=when_matched,
            when_not_matched=when_not_matched,
            tag=tag,
            retries=retries,
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return  # empty trigger: no version, no tag burn
        sp = batch_df.sparkSession
        if delete_col is None:
            _apply(sp, batch_df, f"{ckid}:batch-{int(batch_id)}")
            return
        from pyspark.sql import functions as F

        tomb = F.coalesce(
            F.col(f"`{delete_col}`").cast("boolean"), F.lit(False)
        )
        ups = batch_df.where(~tomb).drop(delete_col)
        dels = batch_df.where(tomb).drop(delete_col)
        if ups.head(1):
            _apply(sp, ups, f"{ckid}:u:batch-{int(batch_id)}")
        if dels.head(1):
            dtag = f"{ckid}:d:batch-{int(batch_id)}"
            if _empty_head(sp):
                # tombstones against an empty table: semantic no-op,
                # tag burned regardless — see _apply's bootstrap note
                table.append(dels.limit(0), tag=dtag, retries=retries)
            else:
                table.merge_into(
                    sp, dels, on,
                    when_matched="delete",
                    when_not_matched="ignore",
                    tag=dtag,
                    retries=retries,
                )

    return fold


def cdc_mv_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    mv,
    on,
    checkpoint_dir: str | None = None,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    delete_col: str | None = None,
    available_now: bool = True,
    retries: int = 0,
    on_refresh=None,
) -> StreamingQuery:
    """Streaming CDF CONSUMER (r12): follow a snapshot table through
    DML and keep a maintained aggregate current — the streaming
    composition of the q144 fold. Every micro-batch:

    1. applies the CDC feed to ``mv.source`` exactly as
       :func:`cdc_merge_stream` would (same tag discipline, tombstone
       routing, bootstrap, ``retries`` — one shared implementation);
    2. calls ``mv.refresh()``, whose overwrite-class path consumes
       ``SnapshotTable.read_changes`` for PRECISELY the commits the
       batch just landed and folds signed partials — so the
       downstream dashboard follows each DML at the DML's own file
       slice + group cardinality, never a source rescan (the
       manifest-priced cost gate still arbitrates; a corpus-sized
       batch would rebuild, reported as such).

    Crash windows compose from the layers' own idempotence: a crash
    between the merge and the refresh leaves the state one span
    behind — the NEXT trigger's refresh folds the multi-commit span
    (read_changes spans versions); a lost checkpoint redelivers every
    batch, the merges no-op on their tags, the source version does
    not move, and every refresh is a srcv-tag noop. ``on_refresh``
    (driver-side callback, one refresh-report dict per trigger) lets
    callers grade the mode/priced decision per batch — suite st40
    asserts 'fold' with span<=head on every one."""
    import hashlib

    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_cdcmv_{uuid.uuid4().hex[:8]}"
    )
    ckid = hashlib.md5(checkpoint.encode("utf-8")).hexdigest()[:12]
    apply_batch = _make_cdc_fold(
        mv.source, ckid, on, when_matched, when_not_matched, delete_col,
        retries,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(batch_df, batch_id)
        report = mv.refresh(batch_df.sparkSession)
        if on_refresh is not None:
            on_refresh(report)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_index_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    table,
    index_table: str,
    on,
    checkpoint_dir: str | None = None,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    delete_col: str | None = None,
    available_now: bool = True,
    retries: int = 0,
    on_apply=None,
    vec_col: str = "embedding",
) -> StreamingQuery:
    """Streaming CDF consumer for a SERVING ANN INDEX (r12): the
    cdc_mv_stream composition with
    :func:`~logverzcore_spark.operators.similarity.ivf_index_apply_changes`
    in the consumer seat — a persisted IVF index follows its source
    embedding table through a CDC stream. Every micro-batch:

    1. applies the CDC feed to ``table`` exactly as
       :func:`cdc_merge_stream` would (same tag discipline, tombstone
       routing via ``delete_col``, bootstrap, ``retries``);
    2. reads the span of versions the batch just landed
       (``read_changes``) and drives the index to the new head at
       touched-cell cost — erased vectors stop being servable within
       the trigger, updated vectors move cells, inserts land in their
       cells; untouched cell partitions are never opened.

    The index's catch-up point is PERSISTED in a one-row watermark
    table ``{index_table}_applied`` (written after each apply), so a
    restarted stream resumes from where the index actually is, not
    from where the checkpoint thinks the feed is. Crash windows
    compose from the layers' idempotence: a crash between the merge
    and the apply leaves the watermark behind — the next trigger's
    span covers both commits; a crash between the apply and the
    watermark write re-applies the span, which CONVERGES
    (apply_changes is a net-state upsert, pytest-proved); a lost
    checkpoint redelivers every batch, the merges no-op on their
    tags, no new versions appear, and every apply is an empty-span
    noop. Precondition (first run only): the index is in sync with
    the source head when the stream starts — true whenever it was
    just built from ``table.read()``, the s26 shape.

    ``on_apply`` (driver-side callback, one report dict per trigger:
    apply_changes' report plus from/to versions and ``noop``) lets
    callers grade per-trigger cost — suite st41 asserts every
    trigger's touched cells and the replay's noops."""
    import hashlib

    from logverzcore_spark.operators.similarity import (
        ivf_index_apply_changes,
    )

    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_cdcidx_{uuid.uuid4().hex[:8]}"
    )
    ckid = hashlib.md5(checkpoint.encode("utf-8")).hexdigest()[:12]
    apply_batch = _make_cdc_fold(
        table, ckid, on, when_matched, when_not_matched, delete_col,
        retries,
    )
    applied_tbl = f"{index_table}_applied"
    if isinstance(on, str):
        id_col = on
    else:
        keys = list(on)
        if len(keys) != 1:
            # A composite merge key cannot drive index maintenance:
            # apply_changes net-resolves and removes by ONE id column,
            # so two source rows sharing the first key component would
            # be collapsed to one id — one image wins and the removal
            # join deletes both stored vectors (r12 ADVICE). Refuse
            # loudly instead of silently corrupting the serving index.
            raise ValueError(
                "cdc_index_stream: index maintenance requires a single "
                f"unique id column; got composite merge key {keys!r}"
            )
        id_col = keys[0]

    def _applied(sess) -> int | None:
        try:
            row = sess.table(applied_tbl).first()
        except Exception:
            return None
        return None if row is None else row["v"]

    def _set_applied(sess, v: int) -> None:
        sess.createDataFrame([(int(v),)], "v bigint").write.mode(
            "overwrite"
        ).saveAsTable(applied_tbl)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        from_v = _applied(sess)
        if from_v is None:
            vs = table.versions(sess)
            from_v = vs[-1] if vs else None
        apply_batch(batch_df, batch_id)
        to_vs = table.versions(sess)
        to_v = to_vs[-1] if to_vs else None
        rep = {"noop": True, "from_version": from_v, "to_version": to_v}
        if to_v is not None and from_v is None:
            # bootstrap: the batch created the table — the whole head
            # is inserts (read_changes emits changes AFTER from, so
            # the creating commit needs the direct read)
            changes = (
                table.read(sess)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_commit_version", F.lit(to_v).cast("int"))
            )
            rep = ivf_index_apply_changes(
                sess, changes, index_table, vec_col=vec_col, id_col=id_col
            )
            rep.update(noop=False, from_version=None, to_version=to_v)
            _set_applied(sess, to_v)
        elif to_v is not None and to_v > from_v:
            changes = table.read_changes(sess, from_v, to_v, keys=on)
            rep = ivf_index_apply_changes(
                sess, changes, index_table, vec_col=vec_col, id_col=id_col
            )
            rep.update(noop=False, from_version=from_v, to_version=to_v)
            _set_applied(sess, to_v)
        if not rep["noop"]:
            # the apply ran on the CLONED micro-batch session; the
            # OUTER session's cached file listing would otherwise keep
            # referencing partitions the apply dropped — for an append
            # that silently misses rows (the st23 lesson), for a drop
            # it makes the next outer-session probe CRASH on a missing
            # file. Refresh the creating session too.
            try:
                spark.catalog.refreshTable(index_table)
            except Exception:
                pass  # table dropped mid-stream: nothing to refresh
        if on_apply is not None:
            on_apply(rep)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_mv_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    mv,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    retries: int = 0,
) -> StreamingQuery:
    """Streaming maintained aggregate: every micro-batch (a) appends to
    the MV's source :class:`SnapshotTable` as one tagged version (the
    snapshot_append_stream contract — replays no-op at the manifest)
    and (b) folds ONLY that delta into the
    :class:`~logverzcore_spark.incremental.IncrementalAggregate` state
    — so the maintained dashboard is current to the last batch at
    delta + group-cardinality cost per trigger, never a corpus rescan.

    Crash windows compose from the two idempotence layers underneath:
    a batch redelivered after its append committed no-ops on the tag
    and its refresh no-ops on the reflected source version; a crash
    BETWEEN append and refresh leaves the state one version behind,
    and the next trigger's refresh folds the multi-version increment
    in one read_incremental span. ``mv`` is the caller's
    IncrementalAggregate — read results via ``mv.result(spark)``
    (group-cardinality state scan, zero source I/O)."""
    import hashlib

    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_mvstream_{uuid.uuid4().hex[:8]}"
    )
    ckid = hashlib.md5(checkpoint.encode("utf-8")).hexdigest()[:12]

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # retries: the source append re-points on CommitConflict (an
        # always-on dashboard survives a concurrent compact/vacuum on
        # its source — same contract as snapshot_append_stream)
        mv.source.append(
            batch_df, tag=f"{ckid}:batch-{int(batch_id)}", retries=retries
        )
        mv.refresh(batch_df.sparkSession)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
