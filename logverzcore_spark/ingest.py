"""Batch collection job — the reference's whole SQS/CodeBuild/Lambda
fabric collapsed into one Spark job (SURVEY §3.1 "Spark lifecycle
mapping").

``collect()`` = plan files (Catalyst file index replaces the S3
prefix-tree walk + work batching, controller.js:233-264) → read with
per-DataType options → quarantine bad rows (ProcessingErrors,
worker.js:555-576) → coerce to the declared schema (worker.js:911-1011)
→ optional ingest-time WHERE (the per-file SQLite filter,
worker.js:258-312 — here one declarative filter Catalyst pushes into the
scan) → write the dataset table → record catalog entry + job metrics
(Invocations heartbeat rows, enginesharedv3.mjs:17-36).

Scale notes: the writer partitions by nothing by default (log tables are
append-only time series; callers pass ``partition_by`` for date-ish
columns to enable dynamic partition pruning); ``maxRecordsPerFile``
bounds output file size the way the reference's 50-files/2 MB task
batching bounded worker memory (controller.js:867-890).
"""

from __future__ import annotations

import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from logverzcore_spark.catalog import Catalog, CatalogEntry, User
from logverzcore_spark.operators.coerce import coerce
from logverzcore_spark.plans.sqlgate import rewrite_legacy_query, validate_staged_query
from logverzcore_spark.schemas import DataType, get_datatype
from logverzcore_spark.sources import readers


@dataclass
class CollectJob:
    """Job spec — the reference's Start-Job request body
    (jobproducer.js:49-60)."""

    path: str | list[str]
    datatype: str
    table_name: str
    custom_schema: str | None = None
    query_string: str | None = None  # ingest-time SQL (legacy dialect ok)
    database: str = "default"
    owners: list[str] = field(default_factory=list)
    access: list[str] = field(default_factory=list)
    zip_compressed: bool = False
    transforms: list[dict] = field(default_factory=list)
    partition_by: list[str] = field(default_factory=list)
    #: Hash-bucket the table on these columns (with ``n_buckets``): joins
    #: and aggregations on the bucket key then read pre-partitioned data
    #: and skip the shuffle entirely — the co-located-join scale path for
    #: tables joined repeatedly on the same key.
    bucket_by: list[str] = field(default_factory=list)
    n_buckets: int = 0
    #: Sort rows on these columns inside each output file so parquet
    #: row-group min/max statistics prune selective scans (data skipping
    #: on e.g. a timestamp column). With ``bucket_by`` this becomes the
    #: bucket-local sort order.
    sort_by: list[str] = field(default_factory=list)
    max_records_per_file: int = 1_000_000
    #: Drop duplicate rows on these columns before the write (empty list
    #: = off; ``["*"]`` = full-row dedup). The guard for at-least-once
    #: upstream delivery (the reference's SQS redelivery could re-insert
    #: a partially-committed batch, worker.js:885-909): dedups WITHIN
    #: the batch, and under ``mode="append"`` also anti-joins against
    #: the existing table's keys — redelivery across invocations is the
    #: common case. One shuffle on the dedup key; bucket the table on
    #: the same key to make the cross-job anti-join co-located.
    dedupe_on: list[str] = field(default_factory=list)
    #: Per-job reader options layered over the DataType's (applied last).
    #: The incremental-collection knobs: ``{"modifiedAfter":
    #: "2024-06-01T00:00:00"}`` with ``mode="append"`` re-collects only
    #: files landed since the last run — file-index-level pruning, so
    #: skipped files are never read (see readers.read_raw).
    reader_options: dict[str, str] = field(default_factory=dict)
    mode: str = "overwrite"  # reference tables are create-or-replace
    #: Record table-level statistics (row count + size) in the catalog
    #: after the write, so the cost-based optimizer and broadcast-join
    #: threshold see ACCURATE sizes instead of compressed-file guesses —
    #: a dimension table that looks 12 MB on disk but 60 MB in memory
    #: would otherwise flip in/out of broadcast plans unpredictably at
    #: scale. One extra count-shaped job per collection.
    analyze: bool = True


@dataclass
class CollectReport:
    job_id: str
    table_name: str
    rows_written: int
    rows_quarantined: int
    files_seen: int
    elapsed_sec: float


def _zorder_value(df, cols: list[str], bits: int = 16):
    """Interleaved-bit z-value over ``cols`` (numeric/timestamp) for the
    compaction rewrite. Delegates the interleave to the public,
    hash-verified ``export.zorder_key`` (suite q111) — one
    implementation of the bit math — after computing each column's
    (min, max) bounds in one agg pass and COALESCING NULLs to the
    column min: a compaction must place every row, so the export
    operator's NULL-key contract (callers order NULLs explicitly) is
    resolved here to cluster-with-the-minimum. Degenerate (constant or
    all-NULL) columns quantize to bucket 0."""
    from pyspark.sql import functions as F

    from logverzcore_spark.export import zorder_key

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()
    bounds, inputs = [], []
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        if mn is None:  # all-NULL column
            mn, mx = 0.0, 1.0
        elif mx is None or not mx > mn:  # constant column
            mx = mn + 1.0
        bounds.append((mn, mx))
        inputs.append(F.coalesce(F.col(c).cast("double"), F.lit(mn)))
    if len(cols) == 1:  # degenerate z-order = plain quantized sort key
        top = (1 << bits) - 1
        (lo, hi), col = bounds[0], inputs[0]
        q = F.floor((col - F.lit(lo)) * F.lit(top / (hi - lo))).cast("long")
        return F.greatest(F.lit(0).cast("long"), F.least(F.lit(top).cast("long"), q))
    # The 64-bit key fits bits*ncols <= 62 interleaved bits; shrink the
    # per-column grid for wide column lists (4+ cols at the default 16
    # bits) instead of surfacing zorder_key's hard cap to callers —
    # coarser quantization, same clustering contract.
    return zorder_key(inputs, bounds, bits=min(bits, 62 // len(cols)))


@contextmanager
def _bloom_filter_conf(spark: SparkSession, cols: list[str] | None, ndv: int):
    """Enable parquet bloom filters on ``cols`` for writes inside the
    block: each file's row groups then carry a membership filter that
    lets the reader skip row groups for point predicates on NON-sorted
    columns — the complement to z-order/min-max stats, which only serve
    clustered columns. At 100 TB this is what makes `WHERE request_id=X`
    touch a handful of row groups instead of every file that min/max
    can't exclude (high-cardinality ids have useless min/max ranges).
    Set via the live Hadoop configuration because ``insertInto`` ignores
    per-writer parquet options (it plans an InsertIntoHadoopFsRelation
    from the catalog table, not the DataFrameWriter — verified by file
    sizes); restored on exit so later writes don't pay the filter
    bytes."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    keys = []
    for c in cols or []:
        pairs = {
            f"parquet.bloom.filter.enabled#{c}": "true",
            f"parquet.bloom.filter.expected.ndv#{c}": str(ndv),
        }
        for k, v in pairs.items():
            hc.set(k, v)
            keys.append(k)
    try:
        yield
    finally:
        for k in keys:
            hc.unset(k)


def optimize_table(
    spark: SparkSession,
    table: str,
    target_rows_per_file: int = 1_000_000,
    partition_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    bloom_filter_cols: list[str] | None = None,
    bloom_filter_ndv: int = 1_000_000,
) -> int:
    """Compact a table's small files (the 100 TB ingest reality: streaming
    appends and per-batch commits leave thousands of small files that
    degrade scan planning). Rewrites the table with bounded file sizes via
    an overwrite that keeps the table continuously addressable; returns
    the resulting file count. The real-cluster version targets bytes via
    ``maxRecordsPerFile`` × average row width — same mechanism.

    The compacted rows are materialized via ``localCheckpoint`` (cutting
    lineage from the table's current files) and written back with
    ``INSERT OVERWRITE``, which keeps the table definition in the catalog
    throughout — there is no drop/rename window where the name is missing
    (r1 ADVICE). ``zorder_by`` clusters the rewrite on an interleaved-bit
    z-value so files carry selective min/max stats on SEVERAL columns at
    once (see ``_zorder_value``) — a filter on any of them then prunes
    most files, where a single-column sort only serves that one column.
    ``bloom_filter_cols`` additionally writes parquet bloom filters for
    point-predicate row-group skipping on high-cardinality unsorted
    columns (see ``_with_bloom_filters``); size them with
    ``bloom_filter_ndv`` ≈ distinct values per file. Changing the partition layout (``partition_by``) requires
    recreating the table and is NOT atomic: a staged copy is written to
    ``<table>__compact`` before the original is dropped and removed only
    after the rewrite completes, so a failure may strand data there (or
    leave the name briefly missing) but never loses rows."""
    from pyspark.sql import functions as F

    df = spark.table(table)
    n_rows = df.count()
    n_out = max(1, -(-n_rows // target_rows_per_file))  # ceil
    if zorder_by:
        # Multi-dimensional clustering while we're rewriting anyway:
        # range-partition on the z-value (global order → disjoint file
        # ranges) and sort within files so row groups inherit tight
        # min/max stats on every zorder column.
        import math

        z = df.withColumn("_z", _zorder_value(df, zorder_by))
        # Split on the z-value's TOP BITS, not sampled quantiles: sampled
        # boundaries land mid-quadrant and smear each quadrant over two
        # files, costing ~2× on pruning selectivity (measured). With
        # 2^nbits ≥ n_out aligned buckets, range-partitioning on the
        # bucket index merges only adjacent buckets.
        nbits = max(1, math.ceil(math.log2(n_out)))
        idx = F.shiftrightunsigned(F.col("_z"), 16 * len(zorder_by) - nbits)
        # The default 100-rows/partition boundary sample misplaces
        # boundaries between the (few, discrete) bucket values, merging
        # quadrants across files; sample harder — this is a one-off
        # rewrite job.
        prev_sample = spark.conf.get("spark.sql.execution.rangeExchange.sampleSizePerPartition")
        spark.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", "2000")
        try:
            compact = (
                z.repartitionByRange(n_out, idx, F.col("_z"))
                .sortWithinPartitions("_z")
                .drop("_z")
                .localCheckpoint(eager=True)
            )
        finally:
            spark.conf.set(
                "spark.sql.execution.rangeExchange.sampleSizePerPartition", prev_sample
            )
    else:
        compact = df.coalesce(n_out).localCheckpoint(eager=True)
    if partition_by:
        # Layout change: must recreate. Stage a durable copy FIRST, then
        # drop + rewrite the original from the checkpointed rows, then
        # drop the stage. At every instant the data exists in at least
        # one on-disk table (original or __compact) — recovery after a
        # crash is reading __compact. ALTER TABLE RENAME is deliberately
        # avoided: for managed tables its data-directory move is
        # catalog-implementation-dependent (the in-memory catalog leaves
        # the files behind → an empty renamed table).
        stage = f"{table}__compact"
        with _bloom_filter_conf(spark, bloom_filter_cols, bloom_filter_ndv):
            (
                compact.write.mode("overwrite")
                .option("maxRecordsPerFile", str(target_rows_per_file))
                .partitionBy(*partition_by)
                .saveAsTable(stage)
            )
            spark.sql(f"DROP TABLE `{table}`")
            (
                compact.write.mode("overwrite")
                .option("maxRecordsPerFile", str(target_rows_per_file))
                .partitionBy(*partition_by)
                .saveAsTable(table)
            )
        spark.sql(f"DROP TABLE IF EXISTS `{stage}`")
    else:
        with _bloom_filter_conf(spark, bloom_filter_cols, bloom_filter_ndv):
            (
                compact.write.mode("overwrite")
                .option("maxRecordsPerFile", str(target_rows_per_file))
                .insertInto(table, overwrite=True)
            )
    return (
        spark.table(table).select(F.input_file_name().alias("f")).distinct().count()
    )


@dataclass
class FilePlan:
    """What the reference's controller computed by walking S3 prefixes and
    packing SQS batches (S1-S4, controller.js:233-264, 867-890): here the
    Catalyst file index does the listing; this report exposes the same
    planning numbers (file count, bytes, resulting scan partitions) so
    operators can sanity-check parallelism before a big run."""

    n_files: int
    total_bytes: int
    scan_partitions: int
    max_partition_bytes: int


def plan_files(spark: SparkSession, job: CollectJob) -> FilePlan:
    dt = get_datatype(job.datatype, job.custom_schema)
    raw = _read(spark, job, dt)
    files = spark.createDataFrame(
        [(r[0],) for r in raw.select(readers.SOURCE_COL).distinct().collect()],
        "path string",
    )
    import os as _os
    from urllib.parse import urlparse

    sizes = [
        _os.path.getsize(urlparse(r["path"]).path)
        for r in files.collect()
        if _os.path.exists(urlparse(r["path"]).path)
    ]
    return FilePlan(
        n_files=files.count(),
        total_bytes=sum(sizes),
        scan_partitions=raw.rdd.getNumPartitions(),
        max_partition_bytes=_parse_byte_string(
            spark, spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        ),
    )


def _parse_byte_string(spark: SparkSession, value: str) -> int:
    """Parse a Spark byte-string conf value ('134217728', '128m', '1g').

    Delegates to Spark's own parser (JavaUtils.byteStringAsBytes) so unit
    handling matches whatever the user set; falls back to a local k/m/g
    parser if the JVM helper is unavailable."""
    try:
        return int(
            spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(value)
        )
    except Exception:
        m = _re.fullmatch(r"\s*(\d+)\s*([kmgtp]?)b?\s*", value.lower())
        if not m:
            raise ValueError(f"cannot parse byte string: {value!r}")
        return int(m.group(1)) * 1024 ** "_kmgtp".index(m.group(2) or "_")


import re as _re

#: The reference's default job query (`SELECT * FROM S3Object s`,
#: Logverz-EngineStart.json:71-75) — a no-op; anything else (WHERE filter
#: OR a projection list) runs through the staged-view SQL path.
_TRIVIAL_STAR_RE = _re.compile(r"(?is)^\s*select\s+\*\s+from\s+s3object\S*(\s+\w+)?\s*;?\s*$")


def _is_trivial_select_star(query: str) -> bool:
    return bool(_TRIVIAL_STAR_RE.match(query))


def _read(spark: SparkSession, job: CollectJob, dt: DataType) -> DataFrame:
    if job.zip_compressed:
        return readers.read_zip_csv(
            spark, job.path, dt, extra_options=job.reader_options
        )
    return readers.read_raw(spark, job.path, dt, extra_options=job.reader_options)


def collect(
    spark: SparkSession,
    job: CollectJob,
    catalog: Catalog | None = None,
    user: User | None = None,
    quarantine_table: str | None = None,
    metrics_table: str | None = None,
    registry=None,
) -> CollectReport:
    """Run one collection job to completion and return its report.

    ``registry`` (a ``DatabaseRegistry``) resolves ``job.database`` to a
    registered Spark database — the reference's multi-target-DB path
    (jobs carry DatabaseParameters naming which RDS instance to load,
    jobproducer.js:173-187). Without a registry, non-default database
    names are rejected rather than silently landing in the default
    warehouse."""
    from logverzcore_spark.registry import validate_table_name

    t0 = time.time()
    job_id = uuid.uuid4().hex[:12]
    dt = get_datatype(job.datatype, job.custom_schema)
    if registry is not None:
        target_table = registry.qualified(job.database, job.table_name)
    elif job.database != "default":
        raise ValueError(
            f"database {job.database!r} requires a DatabaseRegistry (pass registry=)"
        )
    else:
        target_table = validate_table_name(job.table_name)
    for sink in (quarantine_table, metrics_table):
        if sink:
            validate_table_name(sink)

    raw = _read(spark, job, dt)
    # Quarantine counter via the Observation API: the metric is computed
    # BY THE WRITE JOB as rows stream through (an Observe node above the
    # scan), so the job needs no second input pass — the previous
    # stats-agg re-read re-parsed every source file, i.e. 2x input I/O
    # on the 100 TB jobs this targets. File count comes from the file
    # index (no data pass at all).
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    raw = raw.withColumn(readers.FIELDCOUNT_COL, readers.field_count(raw))
    obs = Observation(f"ingest_{job_id}")
    raw = raw.observe(
        obs,
        F.sum(
            F.when(F.col(readers.FIELDCOUNT_COL) < 2, 1).otherwise(0)
        ).alias("n_bad"),
    )
    try:
        n_files = len(raw.inputFiles())
    except Exception:
        n_files = 0
    good, bad = readers.split_quarantine(raw)
    typed = coerce(good.drop(readers.SOURCE_COL), dt.schema)

    if job.transforms:
        from logverzcore_spark.transforms import apply_transforms

        typed = apply_transforms(typed, job.transforms)

    if job.query_string and not _is_trivial_select_star(job.query_string):
        stage_view = f"stage_{job_id}"
        typed.createOrReplaceTempView(stage_view)
        staged_sql = rewrite_legacy_query(job.query_string, stage_view)
        validate_staged_query(spark, staged_sql, stage_view)
        typed = spark.sql(staged_sql)

    obs_reliable = True
    if job.dedupe_on:
        key_cols = typed.columns if job.dedupe_on == ["*"] else job.dedupe_on
        typed = typed.dropDuplicates(key_cols)
        if job.mode == "append" and spark.catalog.tableExists(target_table):
            # Under this plan shape (null-safe anti-join over the deduped
            # batch) Spark's raw-level CollectMetrics row is never
            # delivered — even a plain count() action on the frame leaves
            # the Observation empty (observed on Spark 4.1). Fall back to
            # counting the quarantine frame directly; incremental batches
            # are small by design, so the extra raw pass is bounded.
            obs_reliable = False
            # Redelivery usually arrives in a LATER invocation (the
            # reference's SQS re-insert after a partial commit,
            # worker.js:885-909), so in-batch dedup alone is not the
            # guard — anti-join the batch against the EXISTING table's
            # keys. The existing side is pruned to the key columns; at
            # scale, bucket the table on the dedup key so this anti-join
            # reads co-located buckets instead of shuffling history.
            # NULL-SAFE key equality: dropDuplicates treats NULL keys as
            # equal, so the cross-job guard must too — a plain equi-anti-
            # join would wave through every row with a NULL in any key
            # column (log rows routinely carry NULLed '-' markers).
            from functools import reduce as _reduce

            # Materialize the existing KEYS before the write: the sink is
            # also the anti-join's right side, and a plan that reads the
            # table it is appending to is undefined. Checkpointing the
            # key frame (not the batch) also keeps the batch's Observe
            # nodes live for the write job's metrics. At scale, bucket
            # the table on the dedup key so this side reads co-located
            # key columns only.
            existing = (
                spark.table(target_table)
                .select(*key_cols)
                .distinct()
                .localCheckpoint(eager=True)
                .alias("_ex")
            )
            batch = typed.alias("_new")
            cond = _reduce(
                lambda a, b: a & b,
                [
                    F.col(f"_new.`{c}`").eqNullSafe(F.col(f"_ex.`{c}`"))
                    for c in key_cols
                ],
            )
            typed = batch.join(existing, cond, "left_anti")

    # THIS job's written-row count as an Observation on the write job
    # itself (same pattern as the quarantine counter): counting the
    # table before/after would cost two O(table) passes per incremental
    # append — the history would dominate every small batch.
    from pyspark.sql import Observation as _Obs

    obs_rows = _Obs(f"rows_{job_id}")
    typed = typed.observe(obs_rows, F.count(F.lit(1)).alias("n_rows"))

    if job.sort_by and not job.bucket_by:
        # File-local sort → tight parquet row-group min/max stats → the
        # scan skips row groups for selective predicates on sort_by.
        typed = typed.sortWithinPartitions(*job.sort_by)
    writer = (
        typed.write.mode(job.mode)
        .option("maxRecordsPerFile", str(job.max_records_per_file))
    )
    if job.partition_by:
        writer = writer.partitionBy(*job.partition_by)
    if job.bucket_by:
        if job.n_buckets <= 0:
            raise ValueError("bucket_by requires n_buckets > 0")
        writer = writer.bucketBy(job.n_buckets, *job.bucket_by)
        if job.sort_by:
            writer = writer.sortBy(*job.sort_by)
    writer.saveAsTable(target_table)

    n_rows = obs_rows.get["n_rows"] or 0
    if job.analyze:
        # CBO (enabled in get_session) and the broadcast threshold read
        # these catalog stats; see CollectJob.analyze.
        spark.sql(f"ANALYZE TABLE {target_table} COMPUTE STATISTICS")
    # The write job executed the Observe node over every raw row — the
    # quarantine count is already collected, no stats re-read (except in
    # the cross-job-dedupe branch, where metrics don't deliver; see
    # obs_reliable above).
    n_bad = (obs.get["n_bad"] or 0) if obs_reliable else bad.count()

    if n_bad and quarantine_table:
        # ProcessingErrors-shaped quarantine sink (jobid, path, error, row).
        bad.select(
            F.lit(job_id).alias("jobid"),
            F.col(readers.SOURCE_COL).alias("path"),
            F.col(readers.CORRUPT_COL).alias("errormessage"),
            F.lit(time.time()).cast("double").alias("updateunixtime"),
        ).write.mode("append").saveAsTable(quarantine_table)

    if metrics_table:
        # Invocations-style job record (enginesharedv3.mjs:17-36): one row
        # per job with status + progress counters.
        from pyspark.sql import functions as F

        spark.createDataFrame(
            [(job_id, job.table_name, "completed", n_rows, n_bad, n_files)],
            "jobid string, tablename string, status string, rows_written long, "
            "rows_quarantined long, files_seen long",
        ).withColumn("updateunixtime", F.lit(time.time())).write.mode(
            "append"
        ).saveAsTable(metrics_table)

    if catalog is not None:
        catalog.record_query(
            CatalogEntry(
                TableName=job.table_name,
                DatabaseName=job.database,
                DataType=job.datatype,
                Type="C",
                QuerySettings={
                    "QueryString": job.query_string or "",
                    "StgFolders": job.path if isinstance(job.path, list) else [job.path],
                    "JobID": job_id,
                },
                Owners=job.owners or ([user.name] if user else []),
                Access=job.access,
            )
        )

    return CollectReport(
        job_id=job_id,
        table_name=job.table_name,
        rows_written=n_rows,
        rows_quarantined=n_bad,
        files_seen=n_files,
        elapsed_sec=round(time.time() - t0, 3),
    )
