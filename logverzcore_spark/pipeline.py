"""The composed training-data curation pipeline — every stage is an
existing graded operator, chained the way a 100 TB pretraining corpus is
actually prepared:

    quality gate → exact dedup → fuzzy (MinHash-LSH) dedup →
    benchmark decontamination → deterministic split

Each stage's scale design is documented at its operator (SCALE.md); the
composition adds none of its own shuffles beyond what the stages own.
The whole chain is LAZY — one Spark plan, so Catalyst prunes the text
column out of every stage that only needs ids, and the corpus is read
once per stage family, not once per rule.

suite:t16 hash-verifies the full composition against a DuckDB replay
(quality rules, fingerprint keep-first, exact-Jaccard pair drop,
5-gram contamination, md5 split — end to end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logverzcore_spark.operators import dedup, text


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 1000,
    min_stopword_ratio: float = 0.05,
    max_repetition_ratio: float = 0.6,
    neardup_threshold: float = 0.7,
    contamination_n: int = 5,
) -> DataFrame:
    """Run the full curation chain and return the curated corpus as
    (doc_id, split, source, n_chars).

    Stages:
    1. **Quality gate** (t02 rules): token count in
       [min_tokens, max_tokens], stopword ratio ≥ min, repetition ≤ max.
    2. **Exact dedup** keep-first on the normalized text fingerprint
       (d01/d06 semantics — MIN(doc_id) survives per fingerprint).
    3. **Fuzzy dedup**: MinHash-LSH candidate pairs, exact-Jaccard
       verified at ``neardup_threshold`` (d03 — equal to brute-force
       pairs at these parameters); the higher id of each verified pair
       is dropped (st10's keep-first rule).
    4. **Decontamination** (d09): any doc sharing ≥1 distinct
       ``contamination_n``-gram with the benchmark corpus is dropped
       (skipped when ``benchmark`` is None).
    5. **Split** (t05): deterministic md5 train/val/test assignment.
    """
    prof = text.text_profile(docs, text_col)
    quality_ids = prof.where(
        F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("repetition_ratio") <= max_repetition_ratio)
    ).select(id_col)
    survivors = docs.join(quality_ids, id_col, "left_semi")

    fp = dedup.fingerprint_md5(F.col(text_col))
    keep_first = (
        survivors.select(F.col(id_col), fp.alias("_fp"))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    survivors = survivors.join(keep_first, id_col, "left_semi")

    pairs = dedup.minhash_lsh_pairs(
        survivors, threshold=neardup_threshold, text_col=text_col, id_col=id_col
    )
    dropped = pairs.select(F.col("id2").alias(id_col)).distinct()
    survivors = survivors.join(dropped, id_col, "left_anti")

    if benchmark is not None:
        contaminated = dedup.contamination_check(
            survivors, benchmark, n=contamination_n, text_col=text_col, id_col=id_col
        ).select(F.col("doc_id").alias(id_col))
        survivors = survivors.join(contaminated, id_col, "left_anti")

    return survivors.select(
        F.col(id_col),
        text.hash_split(F.col(id_col)).alias("split"),
        "source",
        "n_chars",
    )


def crawl_curate(
    warc: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """The m30 crawl front-end as ONE reusable lazy cascade, PRE-dedup:
    WARC container bytes → HTTP extraction (200s only, m29) → HTML
    boilerplate strip (t33) → unicode scrub/NFC (t31) → sentence
    re-lining → C4 line/page rules (t52). Returns (id, text) of the
    curated pages; callers choose the dedup fold — batch
    ``dedup_keep_first`` (suite m30) or the streaming fingerprint-state
    fold (``stream_dedup.crawl_curate_stream``, suite st36) — which is
    exactly why dedup is NOT in here: it is the one cross-doc stage,
    so its execution shape (window shuffle vs state-table anti-join)
    is the batch/streaming split point, while everything in this
    function is per-row and therefore identical in both.

    Plan shape (test_plan_quality gates it via m30): one Arrow
    mapInPandas walk for the container bytes, then codegen projections
    — ZERO exchanges; at 100 TB cost scales with bytes scanned."""
    from logverzcore_spark.operators.multimodal import extract_warc_http
    from logverzcore_spark.operators.text import (
        c4_line_filter,
        normalize_text,
        strip_html,
    )

    pages = extract_warc_http(
        warc.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    )
    ok = pages.where(F.col("status") == 200).select(
        "doc_id", F.col("body_text").alias("text")
    )
    stripped = strip_html(ok)
    normed = normalize_text(stripped.select("doc_id", F.col("clean").alias("text")))
    lined = normed.select(
        "doc_id",
        F.regexp_replace("clean", r"([.!?]) ", "$1\n").alias("text"),
    )
    c4 = c4_line_filter(lined)
    return c4.where(F.col("keep")).select(
        "doc_id", F.col("clean_text").alias("text")
    )


def curate_report(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """Per-document disposition for the curation chain: every input doc
    labeled with the FIRST stage that dropped it (``quality`` /
    ``exact_dup`` / ``near_dup`` / ``contaminated``) or ``kept`` — the
    observability layer a production pipeline needs, because "the corpus
    shrank 40%" is unactionable without stage attribution. Built from
    the same lazy stage frames as :func:`curate` (anti-join per stage,
    coalesced by precedence), so the attribution can't drift from the
    pipeline it explains."""
    prof = text.text_profile(docs, text_col)
    min_tokens = thresholds.get("min_tokens", 10)
    max_tokens = thresholds.get("max_tokens", 1000)
    min_sw = thresholds.get("min_stopword_ratio", 0.05)
    max_rep = thresholds.get("max_repetition_ratio", 0.6)
    quality_ids = prof.where(
        F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.col("stopword_ratio") >= min_sw)
        & (F.col("repetition_ratio") <= max_rep)
    ).select(id_col)
    s1 = docs.join(quality_ids, id_col, "left_semi")

    fp = dedup.fingerprint_md5(F.col(text_col))
    keep_first = (
        s1.select(F.col(id_col), fp.alias("_fp"))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    s2 = s1.join(keep_first, id_col, "left_semi")

    pairs = dedup.minhash_lsh_pairs(s2, threshold=0.7, text_col=text_col, id_col=id_col)
    near_dropped = pairs.select(F.col("id2").alias(id_col)).distinct()
    s3 = s2.join(near_dropped, id_col, "left_anti")

    if benchmark is not None:
        contaminated = dedup.contamination_check(
            s3, benchmark, text_col=text_col, id_col=id_col
        ).select(F.col("doc_id").alias(id_col))
    else:
        contaminated = s3.select(id_col).limit(0)

    def flag(ids: DataFrame, name: str) -> DataFrame:
        return ids.select(F.col(id_col), F.lit(name).alias(name))

    marked = (
        docs.select(id_col, "source")
        .join(flag(quality_ids, "_q"), id_col, "left")
        .join(flag(keep_first, "_e"), id_col, "left")
        .join(flag(near_dropped, "_n"), id_col, "left")
        .join(flag(contaminated, "_c"), id_col, "left")
    )
    reason = (
        F.when(F.col("_q").isNull(), F.lit("quality"))
        .when(F.col("_e").isNull(), F.lit("exact_dup"))
        .when(F.col("_n").isNotNull(), F.lit("near_dup"))
        .when(F.col("_c").isNotNull(), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return marked.select(F.col(id_col), "source", reason.alias("disposition"))


def curate_embeddings(
    emb: DataFrame,
    dim: int = 64,
    threshold: float = 0.25,
    n_planes: int = 4,
    per_cell: int = 5,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The embedding-side curation chain — ``curate``'s counterpart for
    vector corpora, each stage an existing graded operator:

        semantic dedup (SemDeDup cells + components, keep one rep per
        semantic family, suite:d12) → cluster-balanced subset selection
        (nearest-centroid + per-cluster hash pick, suite:s07) →
        deterministic md5 split (suite:t05's rule)

    Returns (cell, vec_id, pick_rank, split). All stages use the
    engine-portable LCG planes/centroids, so the whole composition
    replays in SQL (suite:s09 hash-verifies it end to end). Scale: the
    dedup stage bounds pair work by hyperplane cell; the selection
    stage's window sees (cell, id, hash) only; the split is a pure
    projection — no stage shuffles vectors except the cell assignments,
    which are Arrow-batched matmul projections."""
    from logverzcore_spark.operators.similarity import (
        cluster_balanced_sample,
        lcg_centroids,
    )

    sd = dedup.semantic_dedup(
        emb, dim=dim, threshold=threshold, n_planes=n_planes,
        vec_col=vec_col, id_col=id_col,
    )
    reps = sd.where(F.col("is_rep")).select(id_col)
    kept = emb.join(reps, id_col, "left_semi")
    balanced = cluster_balanced_sample(
        kept, per_cell=per_cell,
        centroids=lcg_centroids(dim, n_cells),
        vec_col=vec_col, id_col=id_col,
    )
    return balanced.withColumn("split", text.hash_split(F.col(id_col)))


def prepare_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The text-EXTRACTION front-end, composed (the stage before
    :func:`curate`'s quality/dedup chain): HTML boilerplate stripping
    (t33) → unicode NFC / zero-width / control scrub (t31) → PII
    redaction with counts (t27), handed off as ONE lazy plan — raw
    crawl bytes in, training-ready text out. Plan shape: codegen
    projections + a single Arrow map stage (the NFC rewrite); ZERO
    shuffles end to end, so the whole front-end runs at scan speed and
    parallelism at any corpus size. Returns pii_scrub's frame
    ((id, clean, n_email/n_ip/n_ssn/n_phone, n_pii)) over the fully
    extracted text. Suite t35 hash-verifies the COMPOSITION — all
    three stages and their hand-offs replayed in one SQL statement —
    mirroring t16's composition grading for the curation chain."""
    stripped = text.strip_html(df, text_col=text_col, id_col=id_col)
    normalized = text.normalize_text(
        stripped.select(F.col(id_col), F.col("clean").alias(text_col)),
        text_col=text_col, id_col=id_col,
    )
    return text.pii_scrub(
        normalized.select(F.col(id_col), F.col("clean").alias(text_col)),
        text_col=text_col, id_col=id_col,
    )
