"""Per-row transform hook — the reference's declared-but-unimplemented
"TransForms" plumbing (SURVEY §2.8: the registry threads an empty list
end-to-end, jobproducer.js:184 → worker.js:298-299 where the call site is
commented out). Here the hook is real: a registry of named column-level
transforms applied between coercion and the ingest filter, with a
Pandas-UDF escape hatch for non-expressible logic.

Built-ins cover the transforms a log pipeline actually wants; each is a
narrow projection (no shuffle), so adding transforms never changes the
ingest plan shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TransformFn = Callable[[DataFrame, dict], DataFrame]

_REGISTRY: dict[str, TransformFn] = {}


def register_transform(name: str):
    def deco(fn: TransformFn) -> TransformFn:
        _REGISTRY[name] = fn
        return fn

    return deco


def apply_transforms(df: DataFrame, specs: list[dict] | None) -> DataFrame:
    """Apply transform specs in order. Each spec: {"name": ..., **params}."""
    for spec in specs or []:
        name = spec.get("name")
        if name not in _REGISTRY:
            raise KeyError(f"unknown transform {name!r}; known: {sorted(_REGISTRY)}")
        df = _REGISTRY[name](df, {k: v for k, v in spec.items() if k != "name"})
    return df


@register_transform("mask_ip")
def mask_ip(df: DataFrame, p: dict) -> DataFrame:
    """Zero the host octet of IPv4 addresses (PII reduction)."""
    col = p["column"]
    masked = F.regexp_replace(F.col(f"`{col}`"), r"(\d+\.\d+\.\d+)\.\d+", r"$1.0")
    return df.withColumn(col, masked)


@register_transform("drop_columns")
def drop_columns(df: DataFrame, p: dict) -> DataFrame:
    return df.drop(*p["columns"])


@register_transform("add_ingest_time")
def add_ingest_time(df: DataFrame, p: dict) -> DataFrame:
    return df.withColumn(p.get("column", "ingested_at"), F.current_timestamp())


@register_transform("rename_column")
def rename_column(df: DataFrame, p: dict) -> DataFrame:
    return df.withColumnRenamed(p["from"], p["to"])


@register_transform("hash_column")
def hash_column(df: DataFrame, p: dict) -> DataFrame:
    """Pseudonymize a column (md5) — referential integrity preserved."""
    col = p["column"]
    return df.withColumn(col, F.md5(F.col(f"`{col}`").cast("string")))


@register_transform("pandas_map")
def pandas_map(df: DataFrame, p: dict) -> DataFrame:
    """Escape hatch: apply a caller-supplied Arrow-batched function
    (signature: Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) with an
    explicit output schema — the slow path, for logic column expressions
    can't say."""
    return df.mapInPandas(p["fn"], p["schema"])


#: PII patterns for redact_pii — deliberately simple, public-knowledge
#: regexes (emails, IPv4, E.164-ish phone numbers, 16-digit card runs);
#: a production pipeline swaps in its own catalog per policy.
#: Order matters and is load-bearing: email and ipv4 first (so their
#: digits aren't half-eaten by the looser numeric patterns), card before
#: phone (a spaced 16-digit card run also matches the phone regex).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "card": r"\b\d(?:[ -]?\d){14,15}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


@register_transform("redact_pii")
def redact_pii(df: DataFrame, p: dict) -> DataFrame:
    """Redact PII spans in a text column, replacing each with a typed
    token (``<EMAIL>``, ``<IPV4>``, …) — the standard scrub pass before
    text enters a training corpus. Patterns apply in a fixed order
    (email before phone, so digits inside an address aren't half-eaten);
    ``kinds`` selects a subset. Chained regexp_replace stays codegen'd —
    no UDF, no shuffle."""
    col = p["column"]
    kinds = p.get("kinds", list(PII_PATTERNS))
    out = F.col(f"`{col}`")
    for kind in kinds:
        if kind not in PII_PATTERNS:
            raise KeyError(f"unknown PII kind {kind!r}; known: {sorted(PII_PATTERNS)}")
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return df.withColumn(p.get("target", col), out)


@register_transform("normalize_text")
def normalize_text(df: DataFrame, p: dict) -> DataFrame:
    """Canonicalize a text column for dedup/training: lowercase, strip
    punctuation (keep word chars + whitespace), collapse whitespace runs,
    trim. Matches the normalization the fingerprint/dedup operators
    assume, so normalize-then-ingest and fingerprint-at-query agree."""
    col = p["column"]
    out = F.lower(F.col(f"`{col}`"))
    out = F.regexp_replace(out, r"[^\w\s]", " ")
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return df.withColumn(p.get("target", col), out)
