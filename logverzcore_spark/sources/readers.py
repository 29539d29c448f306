"""File readers for the ingest path (SURVEY §2.1 S5-S11).

The reference worker downloads each object, decompresses (gzip via pako,
zip via yauzl with a single-inner-file rule), parses (PapaParse CSV
variants / JSON.parse with RootElement unnest / headerless positional
zip), and coerces (worker.js:74-92, 399-523, 580-611). Spark equivalents:

- gzip        → transparent for text sources (``.gz`` extension)
- CSV         → ``spark.read.csv`` with per-DataType sep/header/quote;
                headerless files get schema names positionally
- TSV preamble→ ``comment`` option drops ``#Version/#Fields`` lines
- JSON        → ``spark.read.json(multiLine)`` + ``explode(root)``
- ZIP         → no native codec: ``binaryFile`` + ``mapInPandas`` unzip
                (single-entry archives only, mirroring worker.js:542-547),
                then ``from_csv`` per line — stays distributed, one task
                per archive batch
- bad rows    → PERMISSIVE mode + ``_corrupt_record`` → quarantine frame
                (the reference's ProcessingErrors table, worker.js:555-576)

Everything reads columns as **string** first; the coercion pass
(operators/coerce.py) produces the typed table, mirroring the
reference's parse-then-coerce pipeline.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logverzcore_spark.schemas import DataType

CORRUPT_COL = "_corrupt_record"
SOURCE_COL = "_source_file"
#: Materialized populated-field count — computed once, shared by the
#: quarantine filter and the ingest Observation metric.
FIELDCOUNT_COL = "_lvz_nset"


def field_count(df: DataFrame):
    """Populated-field count over the data columns (excludes the corrupt
    and lineage columns) — the reference's <2-fields skip rule input."""
    data_cols = [c for c in df.columns if c not in (CORRUPT_COL, SOURCE_COL, FIELDCOUNT_COL)]
    return sum(F.when(F.col(f"`{c}`").isNotNull(), 1).otherwise(0) for c in data_cols)


def _string_schema(dt: DataType, with_corrupt: bool = True) -> T.StructType:
    fields = [T.StructField(f.name, T.StringType(), True) for f in dt.schema.fields]
    if with_corrupt:
        fields.append(T.StructField(CORRUPT_COL, T.StringType(), True))
    return T.StructType(fields)


def read_raw(
    spark: SparkSession, path, dt: DataType,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Read files of ``dt`` into an all-string DataFrame with lineage
    (``_source_file``) and ``_corrupt_record`` columns.

    ``extra_options`` layers per-JOB reader options over the DataType's
    (applied last, so they win): the incremental-pickup knobs live here —
    ``modifiedAfter``/``modifiedBefore`` (re-collect only files landed
    since the last run; the file-source analog of the reference's
    continuous-collection event filter), ``pathGlobFilter``,
    ``recursiveFileLookup``. These are FILE-INDEX filters: pruned files
    are never listed into the scan, so an incremental pass over a
    10M-file prefix costs listing, not reading.
    """
    paths = path if isinstance(path, list) else [path]
    if dt.format == "csv":
        reader = (
            spark.read.format("csv")
            .schema(_string_schema(dt))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
        for k, v in dt.options.items():
            reader = reader.option(k, v)
        for k, v in (extra_options or {}).items():
            reader = reader.option(k, v)
        if dt.comment_prefix:
            reader = reader.option("comment", dt.comment_prefix)
        df = reader.load(paths)
    elif dt.format == "json":
        reader = (
            spark.read.format("json")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
        for k, v in dt.options.items():
            reader = reader.option(k, v)
        for k, v in (extra_options or {}).items():
            reader = reader.option(k, v)
        raw = reader.load(paths).withColumn(SOURCE_COL, F.input_file_name())
        # Malformed documents must reach quarantine, not vanish: under
        # PERMISSIVE a corrupt file becomes one row with CORRUPT_COL set
        # and a NULL root element, and a plain explode() would silently
        # drop it (rows_quarantined would report 0 for a lost file).
        # CORRUPT_COL rides THROUGH the explode_outer (Spark refuses
        # queries that reference only the corrupt column, so it cannot be
        # split off first): corrupt rows come out all-NULL + corrupt text,
        # which the min_fields quarantine rule catches with lineage.
        if CORRUPT_COL not in raw.columns:
            raw = raw.withColumn(CORRUPT_COL, F.lit(None).cast("string"))
        if dt.root_element and dt.root_element in raw.columns:
            # CloudTrail-style {"Records": [...]} document (worker.js:375-380).
            raw = raw.select(
                F.explode_outer(dt.root_element).alias("r"), SOURCE_COL, CORRUPT_COL
            ).select("r.*", SOURCE_COL, CORRUPT_COL)
        # JSON arrives typed-by-inference; stringify to the declared column
        # set so the shared coercion pass owns all typing. Nested structs
        # become JSON text (the reference's string-JSON columns).
        cols = []
        for f in dt.schema.fields:
            if f.name not in raw.columns:
                cols.append(F.lit(None).cast("string").alias(f.name))
                continue
            src = raw.schema[f.name].dataType
            if isinstance(src, (T.StructType, T.ArrayType, T.MapType)):
                cols.append(F.to_json(f.name).alias(f.name))
            else:
                cols.append(F.col(f"`{f.name}`").cast("string").alias(f.name))
        return raw.select(*cols, SOURCE_COL, CORRUPT_COL)
    elif dt.format == "avro":
        # Avro object container files (sources.avro_ocf.read_avro:
        # native spark-avro when present, self-contained OCF decoder
        # otherwise). Arrives typed-by-writer-schema with the quarantine
        # contract already attached; stringify to the DECLARED column
        # set (binary → base64, lossless) so the shared coercion pass
        # owns all typing — the same parse-then-coerce discipline as
        # the JSON branch.
        from logverzcore_spark.sources.avro_ocf import read_avro

        raw = read_avro(spark, paths, extra_options=extra_options or {})
        cols = []
        for f in dt.schema.fields:
            if f.name not in raw.columns:
                cols.append(F.lit(None).cast("string").alias(f.name))
                continue
            src = raw.schema[f.name].dataType
            if isinstance(src, T.BinaryType):
                cols.append(F.base64(F.col(f"`{f.name}`")).alias(f.name))
            else:
                cols.append(F.col(f"`{f.name}`").cast("string").alias(f.name))
        return raw.select(*cols, SOURCE_COL, CORRUPT_COL)
    else:
        raise ValueError(f"unsupported format {dt.format!r}")
    return df.withColumn(SOURCE_COL, F.input_file_name())


def read_zip_csv(
    spark: SparkSession, path, dt: DataType,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Read ZIP-compressed CSV files of ``dt``.

    Spark has no zip codec, so: ``binaryFile`` scan → ``mapInPandas``
    unzip + CSV parse (Arrow-batched, one task per file batch). The
    parse uses Python's quote-aware csv reader — a quoted field
    containing a newline spans records correctly, matching Spark's own
    multiLine CSV semantics (and the reference's PapaParse) where a
    naive line split would mis-parse. Python-side parsing is acceptable
    here because the ZIP path is forced off the JVM anyway; the gzip/
    plain path stays on Spark's native parser. Multi-entry archives are
    rejected per the reference's single-file rule (worker.js:542-547) —
    their rows land in quarantine with an error note.
    """
    import csv as _csv

    has_header = dt.options.get("header", "false").lower() == "true"
    sep = dt.options.get("sep", ",")
    quote = dt.options.get("quote", '"')
    comment = dt.comment_prefix
    col_names = [f.name for f in dt.schema.fields]
    ncols = len(col_names)

    out_schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in col_names]
        + [
            T.StructField(CORRUPT_COL, T.StringType(), True),
            T.StructField(SOURCE_COL, T.StringType(), True),
        ]
    )
    out_columns = col_names + [CORRUPT_COL, SOURCE_COL]

    def _error_frame(src: str, err: str) -> pd.DataFrame:
        return pd.DataFrame(
            [[None] * ncols + [err, src]], columns=out_columns, dtype=object
        )

    def unzip_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for src, blob in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(blob))
                    names = [n for n in zf.namelist() if not n.endswith("/")]
                    if len(names) != 1:
                        yield _error_frame(
                            src, f"archive has {len(names)} entries; exactly 1 required"
                        )
                        continue
                    text = zf.read(names[0]).decode("utf-8", errors="replace")
                except Exception as exc:  # corrupt archive
                    yield _error_frame(src, str(exc))
                    continue
                # newline='' keeps embedded newlines for the csv reader to
                # interpret (quoted ones join, unquoted ones split).
                reader = _csv.reader(
                    io.StringIO(text, newline=""), delimiter=sep, quotechar=quote
                )
                rows: list[list] = []
                pending_header = has_header
                for rec in reader:
                    if not rec or (len(rec) == 1 and not rec[0].strip()):
                        continue
                    if comment and rec[0].lstrip().startswith(comment):
                        continue
                    if pending_header:
                        pending_header = False
                        continue
                    # Short rows pad with NULL (schema drift the reference
                    # tolerates, worker.js:953); wrong-width rows are
                    # corrupt-marked, and split_quarantine keeps those that
                    # still carry >=2 fields — same contract as the
                    # PERMISSIVE gzip/plain path.
                    err = (
                        None
                        if len(rec) == ncols
                        else f"expected {ncols} fields, got {len(rec)}"
                    )
                    vals = [(v if v != "" else None) for v in rec[:ncols]]
                    vals += [None] * (ncols - len(vals))
                    rows.append(vals + [err, src])
                if rows:
                    yield pd.DataFrame(rows, columns=out_columns, dtype=object)

    paths = path if isinstance(path, list) else [path]
    reader = spark.read.format("binaryFile").option("pathGlobFilter", "*.zip")
    # Same per-job file-index filters as read_raw (modifiedAfter etc.);
    # binaryFile honors them, so incremental collection prunes archives
    # before a byte is downloaded.
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    blobs = reader.load(paths)
    return blobs.select("path", "content").mapInPandas(unzip_parse, out_schema)


def split_quarantine(df: DataFrame, min_fields: int = 2) -> tuple[DataFrame, DataFrame]:
    """Split raw rows into (good, quarantined).

    Quarantined: rows with fewer than ``min_fields`` populated columns
    (the reference skips rows with <2 fields — worker.js:493). Rows whose
    ``_corrupt_record`` is set but which still parsed ≥ min_fields columns
    are KEPT: Spark's PERMISSIVE mode marks short rows (fewer tokens than
    the schema) as corrupt, while the reference tolerates exactly that as
    schema drift (missing trailing columns → NULL, worker.js:953)."""
    if FIELDCOUNT_COL in df.columns:
        # Caller already materialized the populated-field count (the
        # ingest path shares it with its Observation metric) — reuse
        # instead of re-evaluating the per-column when-chain per row.
        tagged = df
    else:
        tagged = df.withColumn(FIELDCOUNT_COL, field_count(df))
    is_bad = F.col(FIELDCOUNT_COL) < min_fields
    good = tagged.where(~is_bad).drop(CORRUPT_COL, FIELDCOUNT_COL)
    bad = tagged.where(is_bad).drop(FIELDCOUNT_COL)
    return good, bad


def parse_xml_column(
    df: DataFrame,
    xml_col: str,
    schema: str,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Parse an XML-string column into typed fields — the XML sibling of
    the JSON root-unnest path (reference parity: LogverzCore ingests
    structured log payloads as embedded documents; XML is the config /
    SOAP / sitemap shape a crawl pipeline meets). Built on Spark 4's
    native ``from_xml`` (JVM-side StaxXmlParser — no Python in the
    path): PERMISSIVE mode, with rows that fail to parse carried in
    ``corrupt_col`` (NULL for clean rows) so the quarantine contract
    matches the CSV/JSON readers' (readers.py CORRUPT_COL). Entity
    escaping (&amp; &lt; &gt; &quot;) round-trips through the parser.
    Pure per-row projection — zero shuffle at any scale."""
    if corrupt_col not in schema:
        schema = f"{schema}, {corrupt_col} STRING"
    parsed = df.withColumn(
        "_p",
        F.from_xml(
            F.col(xml_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ),
    )
    inner = [f"_p.{name}" for name in parsed.select("_p.*").columns]
    return parsed.select(*df.columns, *inner).drop(xml_col)
