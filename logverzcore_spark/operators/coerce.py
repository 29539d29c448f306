"""Schema coercion — the reference's "convert to sql schema" pass.

Reference behavior (worker.js:911-1011, SURVEY §2.2 P3), re-expressed as
Catalyst column expressions (JVM-side, codegen-friendly — no Python UDFs):

- ``null`` / ``'null'`` / ``'NULL'`` / missing  → NULL (all types)
- numeric columns: ``'-'`` or ``''``            → NULL, else cast
- BOOLEAN: case-insensitive true/false text (the reference's own
  implementation is buggy — worker.js:969-978 uses indexOf truthiness;
  we implement the evident intent and document the divergence)
- STRING: CRLF / newlines replaced by spaces (worker.js:996-1000);
  ``'[]'`` → ``''`` (worker.js:1001-1005)
- columns missing from the input (schema drift, worker.js:953) → NULL

All expressions operate on string-typed input columns and produce the
declared type, so the whole pass stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: String literals the reference treats as NULL in any column.
NULL_WORDS = ("null", "NULL", "Null")
#: Extra markers treated as NULL for numeric columns only ('-' and '').
NUMERIC_NULL_MARKERS = ("-", "")

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def coerce_column(col: Column, target: T.DataType) -> Column:
    """Return ``col`` (string-typed) coerced to ``target`` with the
    reference's NULL-marker semantics."""
    is_null_word = col.isin(*NULL_WORDS)
    if isinstance(target, _NUMERIC_TYPES):
        # try_cast, not cast: under ANSI mode (Spark 4 default) a plain
        # cast THROWS on any other malformed value — one garbage field
        # would kill a whole ingest job. The reference's parseInt path
        # never threw; malformed → NULL is the total-function equivalent
        # (divergence: JS parseInt('123abc')==123, we yield NULL).
        # The NULL markers ('-', '', null-words) need no explicit branch:
        # try_cast maps each to NULL already — the guard chain was ~40%
        # of ingest CPU across a 10-numeric-column schema (measured).
        return col.try_cast(target)
    if isinstance(target, T.BooleanType):
        lowered = F.lower(F.trim(col))
        return (
            F.when(lowered == "true", F.lit(True))
            .when(lowered == "false", F.lit(False))
            .otherwise(F.lit(None))  # null words / '' / malformed → NULL
        )
    if isinstance(target, (T.TimestampType, T.DateType)):
        # Malformed datetime text (incl. all NULL markers) → NULL via
        # try_cast totality, same as the numeric path.
        return col.try_cast(target)
    if isinstance(target, T.StringType):
        # CRLF / lone newlines → space; '[]' → '' (worker.js:996-1005).
        # The regex only runs on values that CONTAIN a newline (cheap
        # contains pre-check) — regex machinery on every clean value was
        # the single hottest expression in the ingest profile.
        has_nl = col.contains("\r") | col.contains("\n")
        stripped = F.when(has_nl, F.regexp_replace(col, r"\r\n|\r|\n", " ")).otherwise(col)
        return (
            F.when(is_null_word | col.isNull(), F.lit(None))
            .when(stripped == "[]", F.lit(""))
            .otherwise(stripped)
        )
    # Struct/array targets arrive as JSON text.
    cleaned = F.when(is_null_word | col.isNull() | (col == ""), F.lit(None)).otherwise(col)
    return F.from_json(cleaned, target)


def coerce(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Coerce a raw (all-string or partially typed) DataFrame to ``schema``.

    Columns absent from ``df`` become NULL (schema drift tolerance,
    worker.js:953). Columns already at their target type pass through
    untouched so parquet-sourced frames are a no-op.
    """
    existing = {f.name: f.dataType for f in df.schema.fields}
    out = []
    for field in schema.fields:
        if field.name not in existing:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif existing[field.name] == field.dataType and not isinstance(
            field.dataType, T.StringType
        ):
            # Already typed → pass through. String→string still goes
            # through coerce_column: the CRLF/'[]' cleanup applies to every
            # string value, typed source or not.
            out.append(F.col(f"`{field.name}`"))
        elif isinstance(existing[field.name], T.StringType):
            out.append(coerce_column(F.col(f"`{field.name}`"), field.dataType).alias(field.name))
        else:
            # Typed→typed narrowing can still overflow; stay total.
            out.append(F.col(f"`{field.name}`").try_cast(field.dataType).alias(field.name))
    return df.select(*out)


def json_key_profile(df: DataFrame, json_col: str = "props") -> DataFrame:
    """Per-key shape profile of a JSON batch: (key, n, types) where
    ``types`` is the sorted comma-joined set of observed value-syntax
    classes (see json_schema_drift for the classification contract).
    The reusable half of the drift audit: persist one as the BASELINE
    and diff batches against it (streaming: schema_drift_stream)."""
    m = F.from_json(F.col(json_col), "map<string,string>")
    e = df.select(F.explode(m).alias("key", "_v"))
    cls = (
        F.when(F.col("_v").rlike(r"^-?[0-9]+(\.[0-9]+)?$"), F.lit("number"))
        .when(F.col("_v").isin("true", "false"), F.lit("boolean"))
        .when(F.col("_v").startswith("{"), F.lit("object"))
        .when(F.col("_v").startswith("["), F.lit("array"))
        .otherwise(F.lit("string"))
    )
    return e.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.array_join(F.sort_array(F.collect_set(cls)), ",").alias("types"),
    )


def json_schema_drift(
    old: DataFrame, new: DataFrame, json_col: str = "props"
) -> DataFrame:
    """Schema-drift report between two batches of semi-structured JSON —
    the ingest-side audit that catches an upstream producer silently
    adding, dropping, or re-typing a field BEFORE a week of collections
    lands wrong (the VARIANT/coercion family's monitoring complement:
    P3 makes single values total, this watches the SHAPE move).

    Per top-level key: presence and row count in each batch plus the
    sorted set of observed VALUE-SYNTAX classes (number / boolean /
    object / array / string — classified from the stringified value a
    ``map<string,string>`` cast yields, which preserves nested JSON
    verbatim; a quoted numeric string classifies as number — this is a
    syntax profile for drift detection, not a JSON type oracle), and a
    status: added / removed / type_changed / stable.

    Plan shape at scale: one explode + partial-agg'd groupBy on the key
    per side (key domains are small by construction of real telemetry),
    then a key-level full-outer join over metadata-sized frames — the
    batches themselves never join row-to-row. Returns (key, status,
    types_old, types_new, n_old, n_new)."""

    return diff_key_profiles(
        json_key_profile(old, json_col), json_key_profile(new, json_col)
    )


def diff_key_profiles(old_prof: DataFrame, new_prof: DataFrame) -> DataFrame:
    """Key-level diff of two ``json_key_profile`` frames — the reusable
    comparison half (batch drift report q131 and the streaming monitor
    both end here). Metadata-sized full-outer join; returns (key,
    status, types_old, types_new, n_old, n_new)."""
    j = old_prof.select(
        "key", F.col("n").alias("n_old"), F.col("types").alias("types_old")
    ).join(
        new_prof.select(
            "key", F.col("n").alias("n_new"), F.col("types").alias("types_new")
        ),
        "key",
        "full_outer",
    )
    status = (
        F.when(F.col("n_old").isNull(), F.lit("added"))
        .when(F.col("n_new").isNull(), F.lit("removed"))
        .when(F.col("types_old") != F.col("types_new"), F.lit("type_changed"))
        .otherwise(F.lit("stable"))
    )
    return j.select(
        "key",
        status.alias("status"),
        "types_old",
        "types_new",
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
    )
