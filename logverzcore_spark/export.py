"""Training-data export: deterministic sharding + manifests.

The last stage of a curation pipeline writes the corpus as N shards a
trainer can stream, with a manifest (row/byte counts, id ranges) the
training job validates against. Two properties matter at 100 TB:

- **Deterministic shard assignment** — a stable content hash of the id,
  not ``rand()`` or partition index: re-running export after adding one
  source must keep every unchanged document in the same shard (trainer
  caches/resume offsets survive), and any engine can recompute the
  assignment (the manifest is hash-verifiable, suite:t15).
- **Bounded files** — each shard directory is written with
  ``maxRecordsPerFile`` so a single hot shard still splits into
  trainer-friendly files; the shard column prunes reads (a trainer
  resuming shard 7 opens one directory).

The write path shuffles once (repartition on shard) so each output file
is written by exactly one task — no tiny-file explosion from 32 tasks
x 16 shards cross-writing.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_assign(id_col: Column, n_shards: int = 16) -> Column:
    """Stable shard id in [0, n_shards) from md5 of the row id.

    Uses the leading hex digits of md5 — engine-portable (any SQL engine
    replays it), unlike xxhash64/pmod which are Spark-specific. Supports
    up to 65536 shards (4 hex digits)."""
    if not 1 <= n_shards <= 65536:
        raise ValueError("n_shards must be in [1, 65536]")
    digits = F.substring(F.md5(id_col.cast("string")), 1, 4)
    return F.pmod(F.conv(digits, 16, 10).cast("long"), F.lit(n_shards)).cast("int")


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "n_chars",
    n_shards: int = 16,
) -> DataFrame:
    """The export manifest: per-shard row count, payload volume, and id
    range. One partial-agg'd groupBy over (shard, counters) — the
    documents themselves are column-pruned out of the shuffle."""
    return (
        df.select(
            shard_assign(F.col(id_col), n_shards).alias("shard"),
            F.col(id_col),
            F.col(bytes_col),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(bytes_col).cast("bigint").alias("total_bytes"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    bytes_col: str = "n_chars",
    n_shards: int = 16,
    max_records_per_file: int = 100_000,
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` as ``out_dir/shard=K/`` directories and return the
    manifest (also written to ``out_dir/_manifest``).

    One shuffle: rows are repartitioned BY THE SHARD COLUMN before the
    partitioned write, so every shard directory is produced by the tasks
    owning that shard — without it, every task appends to every shard and
    a 1000-task cluster emits 1000×n_shards files. ``maxRecordsPerFile``
    re-splits hot shards into bounded files. ``fmt="json"`` gives
    JSONL shards (the common trainer input); parquet is the default for
    typed columns.
    """
    with_shard = df.withColumn("shard", shard_assign(F.col(id_col), n_shards))
    (
        with_shard.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .format(fmt)
        .save(out_dir)
    )
    manifest = shard_manifest(df, id_col, bytes_col, n_shards)
    manifest.coalesce(1).write.mode("overwrite").format("parquet").save(
        os.path.join(out_dir, "_manifest")
    )
    return manifest


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Seeded, reproducible global pseudo-shuffle — the epoch-level
    reorder a training pipeline needs: every epoch sees the corpus in a
    different order, yet any epoch REPLAYS exactly (trainer restart,
    shard re-export, cross-run audit) because the order is a pure
    function of (seed, id), not of partitioning, timing, or engine.

    Key = ``md5(seed ':' id)`` — engine-portable (any SQL engine
    replays it; suite t59 hash-verifies against DuckDB), unlike
    xxhash64/rand(seed). Shard = leading key hex mod ``n_shards`` (the
    shard_assign construction on the epoch key, so shard MEMBERSHIP
    reshuffles per epoch too); ``epoch_rank`` = 1-based position within
    the shard in key order.

    The rank is TWO-LEVEL, never a global or per-shard window (a
    window partitioned only by shard serializes each shard onto one
    task — a 6 TB sort per shard at 100 TB): rows bucket by the key's
    LEADING two hex digits (a prefix of the sort key, so bucket order
    equals key order within every shard — bucketing on any non-prefix
    substring breaks the equivalence), per-(shard, bucket) counts give
    running offsets over
    a ≤ n_shards×256-row frame (driver-free, broadcast back), and each
    bucket's in-partition row_number adds its offset. Same answer as
    the naive window; the only corpus-wide exchange is the (shard,
    bucket) hash shuffle. Returns ``df``'s columns + (shard,
    epoch_rank)."""
    from pyspark.sql import Window

    # A NULL id would make the key/shard NULL and the row silently
    # vanish through the offsets equi-join — an epoch missing a
    # document with no error. Ids are the operator's contract; fail
    # loudly per row instead (codegen branch, no extra pass).
    checked_id = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(f"epoch_shuffle: NULL {id_col} — every row needs a stable id")
        ).cast("string"),
    ).otherwise(F.col(id_col).cast("string"))
    key = F.md5(F.concat(F.lit(f"{int(seed)}:"), checked_id))
    h = df.withColumn("_ek", key).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("_ek", 1, 4), 16, 10).cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    ).withColumn("_bkt", F.substring("_ek", 1, 2))
    counts = h.groupBy("shard", "_bkt").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.partitionBy("shard")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "shard", "_bkt",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("shard", "_bkt").orderBy("_ek", id_col)
    return (
        h.join(F.broadcast(offsets), ["shard", "_bkt"])
        .withColumn(
            "epoch_rank",
            (F.row_number().over(w_in) + F.col("_off")).cast("long"),
        )
        .drop("_ek", "_bkt")
    )


def export_epoch_shards(
    df: DataFrame,
    out_dir: str,
    seed: int,
    id_col: str = "doc_id",
    n_shards: int = 16,
    max_records_per_file: int = 100_000,
    fmt: str = "parquet",
) -> DataFrame:
    """Write one epoch's shuffled corpus as ``out_dir/shard=K/``
    directories whose file order IS the epoch order (rows sorted by
    epoch_rank within each shard directory), plus a per-shard manifest.
    Same single-shuffle write discipline as export_shards: repartition
    on the shard column, sort within tasks — a trainer streams shard K
    in epoch order by reading its files in name order."""
    shuffled = epoch_shuffle(df, seed, id_col=id_col, n_shards=n_shards)
    (
        shuffled.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "epoch_rank")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .format(fmt)
        .save(out_dir)
    )
    # Manifest from the WRITTEN files, not a recompute: re-deriving it
    # from `shuffled` would run the whole corpus shuffle pipeline a
    # second time, while this scan reads two pruned columns of the data
    # just written — and it validates the files on disk, not the plan.
    spark = df.sparkSession
    manifest = (
        spark.read.format(fmt).load(out_dir)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("epoch_rank").alias("first_rank"),
            F.max("epoch_rank").alias("last_rank"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").format("parquet").save(
        os.path.join(out_dir, "_manifest")
    )
    return manifest


def export_shards_stream(
    spark,
    source_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    bytes_col: str = "n_chars",
    n_shards: int = 16,
) -> DataFrame:
    """Streaming variant of :func:`export_shards`: a continuous-collection
    source drains into the same ``shard=K/`` layout with exactly-once file
    tracking (the parquet streaming sink's ``_spark_metadata`` commit log
    — a crashed micro-batch's orphan files are invisible to readers), so
    a crawler can append to the training corpus while keeping the
    trainer-facing shard contract identical to a batch export. Because
    shard assignment hashes the document id, a document arriving in any
    micro-batch, in any order, lands in the same shard a batch re-export
    would give it — streaming and batch exports are interchangeable,
    which suite:st14 hash-verifies against the batch manifest oracle.

    Runs the stream to completion (availableNow) and returns the manifest
    computed from the FILES READ BACK — the manifest states what a
    trainer will actually see, not what the plan intended."""
    with_shard = source_stream.withColumn(
        "shard", shard_assign(F.col(id_col), n_shards)
    )
    q = (
        with_shard.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("shard")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out_dir)
    return (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(bytes_col).cast("bigint").alias("total_bytes"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .select(F.col("shard").cast("int").alias("shard"), "n_docs", "total_bytes", "min_id", "max_id")
    )


# ---------------------------------------------------------------------------
# Range-partitioned sorted export — the layout for downstream MERGE scans
# ---------------------------------------------------------------------------


def range_bounds(df: DataFrame, value_col, n_shards: int = 8) -> list[float]:
    """Exact-percentile cut points for range sharding — ``n_shards - 1``
    interior boundaries from ONE aggregate pass (a single array-percentile,
    one-row collect). Deterministic by construction, unlike Spark's
    ``repartitionByRange`` whose RangePartitioner samples the input —
    fine for balance, unusable when the manifest must be reproducible or
    another engine must recompute the same assignment."""
    probs = [i / n_shards for i in range(1, n_shards)]
    row = df.select(
        F.percentile(value_col, F.array(*[F.lit(p) for p in probs])).alias("bs"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).isNull().cast("long")).alias("n_null"),
    ).first()
    # Same single aggregate validates the contract: NULL sort keys would
    # assign shard NULL (every `>` comparison is NULL) and silently land
    # in a default partition a merge scan never visits, and an empty
    # input has no boundaries at all — both are caller errors, not data
    # to swallow.
    if row["n"] == 0 or row["bs"] is None:
        raise ValueError("range_bounds: input is empty; no boundaries exist")
    if row["n_null"]:
        raise ValueError(
            f"range_bounds: {row['n_null']} NULL values in {value_col!r}; "
            "range sharding needs a total order — filter or impute first"
        )
    return [float(b) for b in row["bs"]]


def range_shard_assign(value_col: Column, bounds: list[float]) -> Column:
    """Shard index = how many boundaries the value exceeds (codegen'd
    comparison chain over literal bounds — no join, no UDF). Monotone in
    the value, so shard ranges cannot overlap."""
    idx = F.lit(0)
    for b in bounds:
        idx = idx + (value_col > F.lit(b)).cast("int")
    return idx.alias("shard")


def range_manifest(
    df: DataFrame, value_col: str, bounds: list[float]
) -> DataFrame:
    """Per-shard manifest for a range-sharded export: row count and the
    shard's actual [min, max] of the sort key. Because assignment is
    monotone, consecutive shards' ranges are disjoint — the property a
    downstream merge scan (or a query router doing shard pruning)
    relies on; asserted in tests."""
    return (
        df.select(
            range_shard_assign(F.col(value_col), bounds), F.col(value_col)
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("min_val"),
            F.max(value_col).alias("max_val"),
        )
    )


def export_sorted_ranges(
    df: DataFrame,
    out_dir: str,
    value_col: str,
    n_shards: int = 8,
    max_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Write a globally range-ordered corpus: shard k holds exactly the
    rows between cut points k-1 and k, and every file within a shard is
    sorted on the key — so a reader concatenating shard 0..N-1 (files in
    order) sees a fully sorted corpus, and parquet min/max row-group
    stats prune range predicates to one shard's worth of files. This is
    the complement of ``export_shards``' hash layout: hash for even,
    resumable trainer streams; range for merge scans and key-range
    serving. One shuffle (repartition on shard), in-task sort, bounded
    files. Returns the manifest computed FROM THE WRITTEN FILES — it
    describes what is actually on disk (a re-scan of a nondeterministic
    source could disagree with the output it is supposed to certify),
    and the read-back prunes to the (shard, key) columns."""
    bounds = range_bounds(df, value_col, n_shards)
    assigned = df.withColumn(
        "shard", range_shard_assign(F.col(value_col), bounds)
    )
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", value_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    return (
        spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("min_val"),
            F.max(value_col).alias("max_val"),
        )
    )


def zorder_key(
    cols: list[Column],
    bounds: list[tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton (Z-order) key over 2+ columns — the multi-dimensional
    clustering lever behind Delta/Iceberg's OPTIMIZE ZORDER, built from
    plain codegen arithmetic: each column is quantized onto a
    ``2^bits`` grid between its (caller-supplied, deterministic)
    bounds, then the grid coordinates' bits are interleaved
    (column i contributes bit b to key position ``b·ncols + i``).
    Rows close in the key are close in EVERY column, so a sort on the
    key clusters parquet row-group min/max stats on all the columns at
    once — a range predicate on ANY of them prunes, where a
    single-column sort prunes only its own column.

    Everything is exact integer/IEEE arithmetic on literal bounds —
    suite q111 hash-verifies the interleave against a SQL replay.
    ``bits·ncols`` must fit a signed 64-bit key (≤ 62); values outside
    the bounds clamp to the grid edge; NULLs yield a NULL key (sort
    them first/last explicitly). The expression unrolls to
    ``bits·ncols`` shift-and-or terms — all inside whole-stage
    codegen, zero Python."""
    ncols = len(cols)
    if ncols < 2:
        raise ValueError("zorder_key needs >= 2 columns (else just sort)")
    if len(bounds) != ncols:
        raise ValueError("one (lo, hi) bound pair per column required")
    if bits * ncols > 62:
        raise ValueError(f"bits*ncols = {bits * ncols} exceeds the 62-bit key")
    grid = (1 << bits) - 1
    key = F.lit(0).cast("long")
    null_guard = F.lit(False)
    for i, (col, (lo, hi)) in enumerate(zip(cols, bounds)):
        if not hi > lo:
            raise ValueError(f"degenerate bounds for column {i}: ({lo}, {hi})")
        q = F.floor(
            (col.cast("double") - F.lit(float(lo)))
            * F.lit(grid / (float(hi) - float(lo)))
        ).cast("long")
        # greatest/least SKIP null args (they'd silently clamp a NULL
        # coordinate to the grid edge) — track nullness separately and
        # null the whole key at the end.
        null_guard = null_guard | col.isNull()
        q = F.greatest(F.lit(0).cast("long"), F.least(F.lit(grid).cast("long"), q))
        for b in range(bits):
            key = key + (
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * ncols + i)
            )
    return F.when(null_guard, F.lit(None).cast("long")).otherwise(key)


def export_zordered(
    df: DataFrame,
    out_dir: str,
    cols: list[str],
    bits: int = 16,
    n_shards: int = 8,
    max_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Write a Z-order-clustered corpus: compute the Morton key over
    ``cols`` (bounds = exact global min/max, one tiny agg), range-shard
    ON THE KEY (contiguous key ranges per shard — a hash repartition
    would scatter the locality the key exists to create), sort within
    tasks, bound file sizes. Files end up with narrow min/max envelopes
    on EVERY clustered column, so selective scans on any of them skip
    row groups — the layout HALF of multi-dimensional pruning; the scan
    half is Spark's existing parquet stats filtering. Returns the
    per-shard manifest computed from the written files (n_rows + each
    column's envelope)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).first()
    # Degenerate-column fallback (same contract as ingest._zorder_value):
    # an all-NULL column gets synthetic (0, 1) bounds, a constant column
    # widens hi to lo+1, and NULL cells coalesce to the column min so
    # every row lands in a shard instead of a NULL key.
    bounds, inputs = [], []
    for c in cols:
        lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
        lo = None if lo is None else float(lo)
        hi = None if hi is None else float(hi)
        if lo is None:
            lo, hi = 0.0, 1.0
        elif hi is None or not hi > lo:
            hi = lo + 1.0
        bounds.append((lo, hi))
        inputs.append(F.coalesce(F.col(c).cast("double"), F.lit(lo)))
    keyed = df.withColumn("zkey", zorder_key(inputs, bounds, bits=bits))
    kb = range_bounds(keyed, "zkey", n_shards)
    (
        keyed.withColumn("shard", range_shard_assign(F.col("zkey"), kb))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "zkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    out = spark.read.parquet(out_dir).groupBy("shard")
    m_aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        m_aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return out.agg(*m_aggs)


def compact_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> dict:
    """Small-file compaction — the OPTIMIZE of a parquet directory that
    accumulated too many part files (streaming micro-batches, per-source
    appends, over-parallel writes). At 100 TB the small-file problem IS
    the scan bill: every file costs a driver listing entry, a task, and
    a parquet footer read, so 10⁶ x 1 MB files can cost more than the
    bytes themselves.

    Sizes the output from the MEASURED input bytes (ceil(total /
    ``target_file_bytes``)), rewrites in one job — plain round-robin
    ``repartition`` for pure compaction, or ``repartitionByRange`` +
    in-task sort when ``sort_col`` is given so the rewrite also restores
    clustering (narrow min/max envelopes -> row-group skipping) — then
    swaps directories via FileSystem.rename. Rename is atomic on
    local/HDFS; on object stores a production deployment swaps a catalog
    pointer instead (documented, not emulated here). File enumeration
    uses the Hadoop FS API, so the same code runs against hdfs:// and
    s3a:// paths.

    Returns {files_before, files_after, bytes_before, bytes_after,
    n_target_files}; the table's CONTENT is untouched (suite q112
    hash-verifies the round trip; row identity pytest-asserted).
    """
    import math

    jpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = jpath(path).getFileSystem(spark._jsc.hadoopConfiguration())

    def _parts(p: str):
        it = fs.listFiles(jpath(p), True)
        out = []
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().startswith("part-"):
                out.append((st.getPath().toString(), int(st.getLen())))
        return out

    before = _parts(path)
    if not before:  # nothing to compact (empty or foreign dir): no-op
        return {"files_before": 0, "files_after": 0, "bytes_before": 0,
                "bytes_after": 0, "n_target_files": 0}
    bytes_before = sum(sz for _, sz in before)
    n_out = max(1, math.ceil(bytes_before / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_col is not None:
        staged = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
    else:
        staged = df.repartition(n_out)
    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".compact-old"
    staged.write.mode("overwrite").parquet(tmp)
    if not fs.rename(jpath(path), jpath(old)):
        raise IOError(f"compact_files: could not stage {path} aside")
    if not fs.rename(jpath(tmp), jpath(path)):
        fs.rename(jpath(old), jpath(path))  # roll back
        raise IOError(f"compact_files: could not swap in compacted {path}")
    fs.delete(jpath(old), True)
    after = _parts(path)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes_before": bytes_before,
        "bytes_after": sum(sz for _, sz in after),
        "n_target_files": n_out,
    }


def delete_rows(
    spark,
    path: str,
    ids_df: DataFrame,
    id_col: str,
) -> dict:
    """Targeted point-deletes over an immutable parquet directory — the
    GDPR/right-to-be-forgotten shape. At 100 TB you cannot rewrite the
    corpus to drop 0.001% of rows; the only viable plan is: find the
    FILES that contain a doomed id, rewrite ONLY those files with an
    anti-join, and leave every other byte untouched.

    Locate: one scan projecting (file, id) with the delete set
    broadcast-semi-joined — parquet column pruning means the scan reads
    just the id column, and the distinct file list is bounded by the
    deletions, not the corpus. Rewrite: only the affected files are
    re-read (Spark file-list read), anti-joined against the broadcast
    delete set, and written to a staging dir; the swap then deletes the
    affected originals and moves the replacements in. The swap is
    file-at-a-time (not atomic across files) — production object-store
    deployments do the same rewrite under a table format's commit
    (Delta/Iceberg); here the recovery story is a WRITE-AHEAD MANIFEST
    in the staging dir: ``_touched.json`` (the originals to delete) is
    written only after the staged replacements are complete, and no
    original is deleted before it exists. On entry, a leftover staging
    dir is resolved before anything is recomputed: with a manifest, the
    prior swap is FINISHED (delete any still-present manifest'd
    originals, move the remaining staged files in); without one, the
    prior run died mid-stage with all originals intact, so the staging
    dir is simply discarded. Every crash window re-runs to the correct
    final state — including the window the naive "recompute and
    overwrite tmp" approach corrupts (crash after some originals were
    deleted: the un-moved replacements are the only copy of those
    files' surviving rows).

    ``ids_df`` must be a single-column DataFrame of ids (kept
    distributed until the broadcast — never collected). Returns
    {files_total, files_rewritten, rows_deleted}.
    """
    import json

    jpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = jpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    ids = ids_df.toDF(id_col)

    tmp = path.rstrip("/") + ".delete-tmp"
    if fs.exists(jpath(tmp)):
        _finish_or_discard_delete_staging(spark, fs, jpath, path, tmp)

    src = spark.read.parquet(path)
    touched = [
        r["f"]
        for r in (
            src.select(F.col(id_col), F.input_file_name().alias("f"))
            .join(F.broadcast(ids), id_col, "semi")
            .select("f")
            .distinct()
            .collect()
        )
    ]
    files_total = len(src.inputFiles())
    if not touched:
        return {"files_total": files_total, "files_rewritten": 0, "rows_deleted": 0}

    affected = spark.read.parquet(*touched)
    n_before = affected.count()
    kept = affected.join(F.broadcast(ids), id_col, "anti")
    kept.repartition(max(1, len(touched))).write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()

    # Write-ahead manifest: staged replacements are complete, so record
    # the originals to delete BEFORE deleting any — a crash anywhere
    # after this point is finished (not redone) by the entry recovery.
    # Written to a temp name and renamed in, so the manifest's
    # EXISTENCE is atomic: recovery can never observe a truncated one
    # (a crash mid-write leaves only the .part file, which recovery
    # ignores — originals are all intact in that window).
    mf_part = jpath(os.path.join(tmp, "_touched.json.part"))
    out = fs.create(mf_part, True)
    try:
        out.write(bytearray(json.dumps(sorted(touched)).encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(mf_part, jpath(os.path.join(tmp, "_touched.json"))):
        raise IOError("delete_rows: could not commit the staging manifest")

    for f in touched:
        fs.delete(jpath(f), False)
    it = fs.listFiles(jpath(tmp), True)
    dest = jpath(path)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("part-"):
            # After the manifest commit the staged files are the ONLY
            # copy of surviving rows — a failed swap must leave the
            # stage in place for the next recovery pass, never fall
            # through to the staging delete below.
            if not fs.rename(st.getPath(), jpath(dest, "deleted-" + name)):
                raise IOError(
                    f"delete_rows: could not move staged file {name} into "
                    f"{path}; staging dir kept for recovery"
                )
    fs.delete(jpath(tmp), True)
    return {
        "files_total": files_total,
        "files_rewritten": len(touched),
        "rows_deleted": int(n_before - n_after),
    }


def _finish_or_discard_delete_staging(spark, fs, jpath, path: str, tmp: str) -> None:
    """Resolve a leftover ``delete_rows`` staging dir (crash recovery).

    With a ``_touched.json`` manifest the staged replacements were
    complete and some originals may already be gone: finish the swap —
    delete any manifest'd original that still exists, move the staged
    part files in, drop the staging dir. Without a manifest the prior
    run died before any original was touched: discard the stage.
    Idempotent — a crash during recovery re-enters the same path."""
    import json

    from logverzcore_spark.fsutil import read_small_json

    mf_path = os.path.join(tmp, "_touched.json")
    if not fs.exists(jpath(mf_path)):
        fs.delete(jpath(tmp), True)
        return
    try:
        touched = read_small_json(spark, mf_path)
    except ValueError:
        # Cannot happen under the rename-committed write above, but an
        # unreadable manifest must not wedge every future delete_rows:
        # a manifest that never committed means no original was
        # deleted, so discarding the stage is the safe recovery.
        fs.delete(jpath(tmp), True)
        return
    for f in touched:
        fs.delete(jpath(f), False)
    it = fs.listFiles(jpath(tmp), True)
    dest = jpath(path)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("part-"):
            if not fs.rename(st.getPath(), jpath(dest, "deleted-" + name)):
                raise IOError(
                    f"delete_rows recovery: could not move staged file "
                    f"{name} into {path}; staging dir kept for the next pass"
                )
    fs.delete(jpath(tmp), True)


class CompactedAppendSink:
    """Exactly-once streaming append sink with IN-STREAM compaction —
    the production shape for "micro-batches write small files forever":
    batches land in per-batch inbox dirs, and every ``compact_every``
    batches the inboxes fold into one compacted ``base/`` directory,
    so the table never accumulates more than ``compact_every`` batch
    dirs of small files no matter how long the stream runs.

    Exactly-once without a transaction log, from three idempotent
    pieces (each crash window re-runs safely):

    - **inbox write**: ``inbox/<batch_id>/`` written with overwrite —
      a replayed batch clobbers its own partial dir, never appends;
    - **batch marker**: ``_batches/<batch_id>`` created AFTER the
      inbox write; a marker'd batch id is skipped on replay. Markers
      are never deleted, so a batch consumed by compaction still
      skips;
    - **consumed manifest**: compaction writes ``_consumed.json``
      (all batch ids folded so far) INTO the new base dir BEFORE the
      atomic base swap — readers union base + only the inbox dirs
      NOT in the manifest, so the post-swap/pre-cleanup window cannot
      double-count. The leading underscore keeps parquet readers from
      touching the manifest. Inbox cleanup is best-effort after the
      swap and retried on the next compaction.

    ``read_view(spark)`` is the consistent reader; suite st24 grades
    the drained view against the batch oracle, and the replay/crash
    windows are pytest-driven through ``process`` directly."""

    def __init__(
        self,
        out_dir: str,
        compact_every: int = 3,
        target_file_bytes: int = 128 * 1024 * 1024,
    ):
        self.out_dir = out_dir.rstrip("/")
        self.base = os.path.join(self.out_dir, "base")
        self.inbox = os.path.join(self.out_dir, "inbox")
        self.markers = os.path.join(self.out_dir, "_batches")
        self.compact_every = compact_every
        self.target_file_bytes = target_file_bytes

    # -- small FS helpers (Hadoop FS API: same code on hdfs:// paths) --
    def _fs(self, spark):
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        return jpath, jpath(self.out_dir).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def _consumed(self, spark) -> set:
        from logverzcore_spark.fsutil import read_small_json

        jpath, fs = self._fs(spark)
        mf_path = os.path.join(self.base, "_consumed.json")
        if not fs.exists(jpath(mf_path)):
            return set()
        return set(read_small_json(spark, mf_path))

    def _inbox_ids(self, spark) -> list:
        jpath, fs = self._fs(spark)
        if not fs.exists(jpath(self.inbox)):
            return []
        return sorted(
            int(st.getPath().getName())
            for st in fs.listStatus(jpath(self.inbox))
            if st.getPath().getName().isdigit()
        )

    def process(self, batch_df, batch_id: int) -> None:
        """The foreachBatch body — idempotent under Spark's replay."""
        spark = batch_df.sparkSession
        jpath, fs = self._fs(spark)
        marker = jpath(os.path.join(self.markers, str(int(batch_id))))
        if fs.exists(marker):
            return  # replayed, already committed
        batch_df.write.mode("overwrite").parquet(
            os.path.join(self.inbox, str(int(batch_id)))
        )
        fs.mkdirs(jpath(self.markers))
        fs.createNewFile(marker)
        if int(batch_id) % self.compact_every == self.compact_every - 1:
            self.compact(spark)

    def _recover_swap(self, spark) -> None:
        """Resume an interrupted base swap: a crash between
        ``rename(base, old)`` and ``rename(tmp, base)`` leaves ``old``
        holding the ONLY copy of all previously folded batches (their
        markers exist and their inbox dirs are gone, so nothing can be
        re-ingested). Roll ``old`` back to ``base`` before anything else
        reads or deletes it. When both exist the swap completed and
        ``old`` is a stale copy — leave it for compact()'s cleanup."""
        jpath, fs = self._fs(spark)
        old = jpath(self.base + ".old")
        if not fs.exists(jpath(self.base)) and fs.exists(old):
            if not fs.rename(old, jpath(self.base)):
                raise IOError(
                    "CompactedAppendSink: could not roll back interrupted swap"
                )

    def compact(self, spark) -> int:
        """Fold every committed, not-yet-consumed inbox dir into base.
        Returns how many batch dirs were folded."""
        import json
        import math

        jpath, fs = self._fs(spark)
        self._recover_swap(spark)
        consumed = self._consumed(spark)
        committed = {
            i
            for i in self._inbox_ids(spark)
            if fs.exists(jpath(os.path.join(self.markers, str(i))))
        }
        fold = sorted(set(committed) - consumed)
        if not fold:
            return 0
        parts = [os.path.join(self.inbox, str(i)) for i in fold]
        has_base = fs.exists(jpath(self.base))
        if has_base:
            parts.append(self.base)
        df = spark.read.parquet(*parts)
        total = 0
        for p in parts:
            it = fs.listFiles(jpath(p), True)
            while it.hasNext():
                st = it.next()
                if st.getPath().getName().startswith("part-"):
                    total += int(st.getLen())
        n_out = max(1, math.ceil(total / self.target_file_bytes))
        tmp = self.base + ".tmp"
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
        manifest = sorted(consumed | set(fold))
        out = fs.create(jpath(os.path.join(tmp, "_consumed.json")), True)
        try:
            out.write(bytearray(json.dumps(manifest).encode("utf-8")))
        finally:
            out.close()
        old = self.base + ".old"
        fs.delete(jpath(old), True)
        if has_base and not fs.rename(jpath(self.base), jpath(old)):
            raise IOError("CompactedAppendSink: could not stage base aside")
        if not fs.rename(jpath(tmp), jpath(self.base)):
            if has_base:
                fs.rename(jpath(old), jpath(self.base))
            raise IOError("CompactedAppendSink: could not swap base")
        fs.delete(jpath(old), True)
        # Best-effort inbox cleanup — and the RETRY the class docstring
        # promises: sweep every CONSUMED dir still on disk, not just
        # this fold's, so dirs orphaned by a crash between a prior swap
        # and its cleanup don't leak duplicate on-disk copies forever.
        for i in self._inbox_ids(spark):
            if i in consumed or i in set(fold):
                fs.delete(jpath(os.path.join(self.inbox, str(i))), True)
        return len(fold)

    def read_view(self, spark) -> DataFrame:
        """Consistent view: base + committed inbox dirs not yet folded."""
        jpath, fs = self._fs(spark)
        self._recover_swap(spark)
        consumed = self._consumed(spark)
        parts = [
            os.path.join(self.inbox, str(i))
            for i in self._inbox_ids(spark)
            if i not in consumed
            and fs.exists(jpath(os.path.join(self.markers, str(i))))
        ]
        if fs.exists(jpath(self.base)):
            parts.append(self.base)
        if not parts:
            raise FileNotFoundError(f"no committed data under {self.out_dir}")
        return spark.read.parquet(*parts)


def export_compacted_stream(
    spark,
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    compact_every: int = 3,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> "CompactedAppendSink":
    """Drain ``stream_df`` through a :class:`CompactedAppendSink` with
    availableNow semantics and return the sink (call ``read_view`` for
    the consistent result). Exactly-once composes from the sink's
    idempotent pieces + Spark's checkpointed batch ids."""
    sink = CompactedAppendSink(
        out_dir, compact_every=compact_every, target_file_bytes=target_file_bytes
    )
    q = (
        stream_df.writeStream.foreachBatch(sink.process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


def export_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    if_exists: str = "error",
) -> DataFrame:
    """WebDataset-style tar-shard export — the interchange format
    multimodal training loaders stream (one ``shard-%05d.tar`` per
    shard; each sample contributes same-key members, here
    ``{key}.txt`` + ``{key}.json``): the WRITE side of the tar story
    whose read side is ``multimodal.parse_tar_entries`` (suite m31
    round-trips one through the other).

    Determinism is the contract: shard = md5(key) mod n_shards
    (engine-portable — the same row lands in the same shard on every
    run/engine/cluster size), members within a shard are ordered by
    key, and every tar header field is pinned (USTAR format, mtime 0,
    mode 0644, uid/gid 0, empty uname/gname) so shard BYTES are
    reproducible — re-exporting an unchanged corpus yields identical
    files, which is what makes shard-level caching and resume safe.

    Plan shape: one hash exchange on the shard id, then each shard
    streams through ONE applyInPandas group whose ``tarfile`` writes
    MEMBER-BY-MEMBER straight onto the output file handle — the
    per-task memory envelope is the pandas group plus one member's
    bytes, never a buffered copy of the whole tar (the r8 BytesIO
    shape double-held ~2× shard bytes). Shards write in parallel, no
    driver collect, and at scale ``n_shards`` grows with the corpus so
    each tar stays loader-friendly (the epoch_shuffle sizing
    discipline).

    DEPLOYMENT CONTRACT — single node or shared filesystem: tasks
    write via executor-local ``open()`` into ``out_dir``, so on a
    multi-node cluster each tar lands on whichever host ran its group
    and the manifest paths are unreachable from the driver. ``out_dir``
    must be a path every executor AND the driver see identically
    (local[* ] or NFS/FUSE-mounted object store); a native object-store
    deployment swaps the open() for its FS client — the tar BYTES are
    the contract, not the transport.

    Stale-shard guard: re-exporting into a non-empty directory with a
    smaller ``n_shards`` would leave higher-numbered ``shard-*.tar``
    files from the previous run that a glob reader (m31's binaryFile
    scan) silently includes. Pre-existing ``shard-*.tar`` therefore
    FAIL FAST (``if_exists='error'``, default) or are removed first
    (``if_exists='overwrite'`` — valid exactly because of the
    shared-filesystem contract above). The guard runs when THIS
    function is called (the returned manifest is lazy, like every
    writer here): call → act → call again; re-running one returned
    plan twice, or interleaving two callers on one out_dir, is outside
    the contract the guard can check.

    Returns the manifest (shard, n_members, n_bytes, path), one row
    per shard."""
    import glob as _glob
    import io
    import json as _json
    import os as _os
    import tarfile

    import pandas as pd

    if if_exists not in ("error", "overwrite"):
        raise ValueError(f"if_exists must be 'error' or 'overwrite', got {if_exists!r}")
    _os.makedirs(out_dir, exist_ok=True)
    stale = sorted(_glob.glob(_os.path.join(out_dir, "shard-*.tar")))
    if stale:
        if if_exists == "error":
            raise FileExistsError(
                f"{out_dir} already holds {len(stale)} shard-*.tar files "
                f"(first: {stale[0]}); pass if_exists='overwrite' to replace "
                f"them — a partial overwrite with smaller n_shards leaves "
                f"stale shards a glob reader silently includes"
            )
        for p in stale:
            _os.remove(p)
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(n_shards),
    ).cast("int")

    schema = "shard int, n_members long, n_bytes long, path string"

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        sh = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key_col)
        path = _os.path.join(out_dir, f"shard-{sh:05d}.tar")
        # Stream members straight onto the file handle (no BytesIO
        # double-buffer): tarfile writes header+payload per addfile and
        # the close() writes the end-of-archive blocks, so the bytes on
        # disk are identical to the buffered form while peak memory is
        # one member, not the whole shard.
        with open(path, "wb") as fh:
            with tarfile.open(
                fileobj=fh, mode="w", format=tarfile.USTAR_FORMAT
            ) as tf:
                for key, text in zip(pdf[key_col], pdf[text_col]):
                    data = str(text).encode("utf-8")
                    meta = _json.dumps({"id": int(key), "n": len(data)}).encode()
                    for nm, payload in ((f"{key}.txt", data), (f"{key}.json", meta)):
                        ti = tarfile.TarInfo(nm)
                        ti.size = len(payload)
                        ti.mtime = 0
                        ti.mode = 0o644
                        ti.uid = ti.gid = 0
                        ti.uname = ti.gname = ""
                        tf.addfile(ti, io.BytesIO(payload))
            n_bytes = fh.tell()
        return pd.DataFrame(
            [{"shard": sh, "n_members": 2 * len(pdf), "n_bytes": n_bytes,
              "path": path}]
        )

    return (
        df.select(F.col(key_col), F.col(text_col), shard.alias("_shard"))
        .groupBy("_shard")
        .applyInPandas(write_shard, schema)
    )
