"""Deduplication entries (d*): exact, n-gram, MinHash-LSH, SimHash, embedding.

Split from the flat suite.py (r6); entries register into the shared
SUITE/ORACLES dicts via the @query decorator from suite.common.
"""

from __future__ import annotations

from logverzcore_spark.suite.common import *  # noqa: F401,F403

@query(
    "d06_dedup_materialize",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, text,
             row_number() OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT doc_id FROM ranked WHERE rn = 1
    """,
)
def d06_dedup_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup as a pipeline stage: the corpus with exact duplicates removed
    (keep lowest doc_id per fingerprint) — the output a training-data run
    would write."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.dedup_keep_first(docs).select("doc_id")


@query(
    "d01_dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a normalized md5 fingerprint."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


@query("d02_ngram_jaccard", oracle=_JACCARD_ORACLE_TMPL.format(thr=0.5))
def d02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via inverted-index self-join."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.5)


@query("d03_minhash_lsh", oracle=_JACCARD_ORACLE_TMPL.format(thr=0.7))
def d03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification. With
    r=2/b=16 the probability of missing a 0.7-Jaccard pair is ~2e-5, so
    the verified output equals the brute-force oracle."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, threshold=0.7)


@query(
    "d15_winnow_overlap",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t)-2, 0)+1),
                    i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS hs
      FROM tok
    ), win AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                    range(1, greatest(len(hs)-4+1, 0)+1),
                    i -> list_min(hs[i:i+3])))) AS fp
      FROM sh
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM win GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM win a JOIN win b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id1, id2, ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS winnow_jaccard
    FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
    WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= 0.4
    """,
)
def d15_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap pairs (MOSS selection,
    ``dedup.winnow_overlap_pairs``): positional 3-gram md5 hashes,
    4-hash sliding-window minima, inverted-index join over the SELECTED
    fingerprints only (~2/(w+1) of the shingle volume). The oracle
    replays the exact selection in SQL — md5 is engine-portable, unlike
    the xxhash64 the speed-first operators use — so the window minima,
    dedup, and jaccard all verify hash-exact."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.winnow_overlap_pairs(docs, threshold=0.4)


@query("d04_simhash_pairs")  # xxhash64 is not reproducible in the oracle → rows-only check
def d04_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3) via banded chunk join."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs(docs, max_hamming=3)


@query(
    "d05_embedding_neardup",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ), n AS (
      SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.35
    """,
)
def d05_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label to bound the join."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs(emb, threshold=0.35, block_col="label")


@query("d07_dup_clusters", oracle=_D07_ORACLE)
def d07_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components (iterative min-label
    propagation) over the 3-gram-Jaccard≥0.5 near-dup graph — the step
    that turns pairwise evidence into keep-one-per-cluster dedup. The
    oracle replays it as a recursive transitive closure."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup.dup_clusters(docs, pairs)


@query(
    "d08_dedup_corpus",
    oracle=_DUP_GRAPH_CTE
    + """
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN labels l ON d.doc_id = l.doc_id
    WHERE l.cluster_id = d.doc_id
    """,
)
def d08_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy-dedup materialization: near-dup pair graph →
    connected components → keep each cluster's representative → the
    cleaned corpus with original columns. This is the full pipeline the
    pairwise queries (d02/d03) feed at 100 TB; transitivity means A~B~C
    collapses to one doc even when A~C misses the threshold."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    clusters = dedup.dup_clusters(docs, pairs)
    reps = clusters.where(F.col("is_rep")).select(F.col("doc_id"))
    return docs.join(reps, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "d09_contamination",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(range(1, greatest(len(t)-4, 0)+1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])))
               AS sh
      FROM tok
    ), bench AS (
      SELECT DISTINCT sh FROM sh WHERE source = 'src0'
    )
    SELECT t.doc_id, COUNT(*) AS n_shared_grams
    FROM (SELECT doc_id, sh FROM sh WHERE source <> 'src0') t
    JOIN bench b ON t.sh = b.sh
    GROUP BY t.doc_id
    """,
)
def d09_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan (dedup.contamination_check): distinct
    5-gram overlap between each training doc (source≠src0) and the
    benchmark corpus (source=src0). The benchmark gram set is broadcast,
    so the 100 TB training side never shuffles — explode, broadcast-hash
    lookup, partial-agg count."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0")
    train = docs.where(F.col("source") != "src0")
    return dedup.contamination_check(train, bench, n=5)


@query(
    "d10_simhash_portable",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      FROM documents
    ), h AS (
      SELECT doc_id, CAST('0x' || substr(md5(tkn), 1, 15) AS BIGINT) AS hv
      FROM (SELECT doc_id, unnest(ts) AS tkn FROM tok)
    ), votes AS (
      SELECT doc_id, bits.b AS b,
             SUM(CASE WHEN (hv >> bits.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h, (SELECT unnest(range(0, 60)) AS b) bits
      GROUP BY doc_id, bits.b
    ), fp AS (
      SELECT doc_id, SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS f
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= 6
    """,
)
def d10_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, HASH-VERIFIED end to end: the md5-derived
    60-bit fingerprint is engine-portable, so the whole pipeline —
    token hashing, bit votes, pigeonhole banding, hamming≤6 pairs —
    checks exactly against a SQL oracle (d04's xxhash64 variant is
    faster but Spark-only, hence rows-only). The oracle replays it
    brute-force; the Spark side still bands (7 chunks > 6 bits), so its
    plan has no cross join at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs(
        docs, max_hamming=6, n_bands=7, hash_fn="md5"
    )


@query(
    "d11_containment",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 0)+1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      FROM tok
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), directed AS (
      SELECT id1 AS src_id, id2 AS dst_id,
             ROUND(c * 1.0 / s1.n, 4) AS containment
      FROM inter JOIN sz s1 ON s1.doc_id = id1
      UNION ALL
      SELECT id2, id1, ROUND(c * 1.0 / s2.n, 4)
      FROM inter JOIN sz s2 ON s2.doc_id = id2
    )
    SELECT src_id, dst_id, containment FROM directed WHERE containment >= 0.5
    """,
)
def d11_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment pairs (dedup.containment_pairs):
    catches subset/quote duplication that symmetric Jaccard (d02)
    under-scores."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.containment_pairs(docs, threshold=0.5)


@query("d12_semantic_dedup", oracle=_d12_oracle())
def d12_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/dedup.semantic_dedup):
    deterministic hyperplane cells bound the pairwise cosine work, cos ≥
    0.25 pairs are grouped transitively (min-label propagation), one
    representative survives per semantic group. Hash-verified end to end:
    the oracle replays the literal LCG planes, the sign-bit cell ids, the
    rounded-cosine pair predicate, and the connected components as a
    recursive transitive closure."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.semantic_dedup(emb, dim=64, threshold=0.25, n_planes=4)


@query(
    "d13_incremental_dedup",
    oracle="""
    WITH fps AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             doc_id, source
      FROM documents
    ), corpus AS (
      SELECT DISTINCT fp FROM fps WHERE source <> 'src3'
    ), fresh AS (
      SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
      FROM fps WHERE source = 'src3' GROUP BY fp
    )
    SELECT f.fp, f.keep_id, f.n_copies
    FROM fresh f LEFT JOIN corpus c ON f.fp = c.fp
    WHERE c.fp IS NULL
    """,
)
def d13_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (snapshot-vs-corpus) exact dedup
    (dedup.incremental_dedup): treat source=src3 as the newly crawled
    batch and every other source as the accumulated corpus; the batch
    self-dedups map-side first, then anti-joins the corpus fingerprint
    set on fp."""
    docs = _t(spark, sf_dir, "documents")
    new_batch = docs.where(F.col("source") == "src3")
    corpus = docs.where(F.col("source") != "src3").select(
        dedup.fingerprint_md5(F.col("text")).alias("fp")
    )
    return dedup.incremental_dedup(new_batch, corpus)


@query(
    "d20_bloom_incremental_dedup",
    oracle="""
    WITH fps AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, doc_id
      FROM documents
    ), corpus AS (
      SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0
    ), fresh AS (
      SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
      FROM fps WHERE doc_id % 3 = 0 GROUP BY fp
    )
    SELECT f.fp, f.keep_id, f.n_copies
    FROM fresh f LEFT JOIN corpus c ON f.fp = c.fp
    WHERE c.fp IS NULL
    """,
)
def d20_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup through a Bloom prefilter
    (dedup.bloom_prefilter_dedup): the corpus fingerprint set is
    compressed into a persisted-shape Bloom filter (built distributed,
    only m/64 OR-folded words reach the driver), the batch probes it
    with pure codegen shift/and arithmetic, and ONLY the bloom-positive
    suspects reach the exact anti-join — the corpus-too-big-to-broadcast
    path at 100 TB. Bloom false positives are removed by the exact join
    and false negatives cannot exist, so the output is EXACTLY the
    oracle's plain anti-join answer (hash-verified here). Overlapping
    id slices (corpus = even doc_ids, batch = doc_ids % 3 == 0) force a
    real duplicate population (~half the batch) through the suspect
    branch."""
    docs = _t(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 3 == 0)
    corpus = docs.where(F.col("doc_id") % 2 == 0).select(
        dedup.fingerprint_md5(F.col("text")).alias("fp")
    )
    return dedup.bloom_prefilter_dedup(batch, corpus, fpp=0.01)


@query(
    "d14_novelty_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 0)+1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      FROM tok
    ), df_ AS (
      SELECT sh, COUNT(*) AS n_docs FROM sh GROUP BY sh
    )
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           ROUND(SUM(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS novelty
    FROM sh s JOIN df_ d ON s.sh = d.sh
    GROUP BY s.doc_id
    """,
)
def d14_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty score: per document, the fraction of its distinct
    3-grams that appear NOWHERE else in the corpus — the inverse signal
    of near-duplication, used to up-weight genuinely new content in a
    training mix (t08's within-doc dup fraction can't see cross-doc
    repetition). One inverted-index pass over shingle ROWS (the same
    d02 plan shape): shingle document-frequency, joined back, one
    partial-agg'd groupBy — never an all-pairs comparison."""
    docs = _t(spark, sf_dir, "documents")
    from logverzcore_spark.operators.dedup import _shingle_table
    from logverzcore_spark.operators.util import fan_out

    sh = _shingle_table(fan_out(docs), "text", "doc_id", 3)
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sh.join(df_counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).alias("n_unique"),
            F.round(
                F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("novelty"),
        )
    )


@query("d16_semantic_contamination", oracle=_d16_oracle())
def d16_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark contamination
    (dedup.semantic_contamination): train vectors semantically too
    close to the held-out benchmark slice (every tenth vector) — the
    paraphrase-robust complement of d09's n-gram scan, using d12's
    portable hyperplane cells so the whole operator (blocking,
    cross-corpus cell join, 6dp cosine gate, count/best-match/max
    aggregation) replays in SQL hash-exact. Plan: benchmark side
    broadcast on the cell; the train side never shuffles before the
    per-doc partial agg."""
    emb = _t(spark, sf_dir, "embeddings")
    train = emb.where(F.col("vec_id") % 10 != 0)
    bench = emb.where(F.col("vec_id") % 10 == 0)
    return dedup.semantic_contamination(
        train, bench, dim=64, threshold=0.25, n_planes=4
    )


@query(
    "d17_span_scrub",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), sh AS (
      SELECT t.doc_id, CAST(u.i AS BIGINT) AS pos,
             md5(array_to_string(t.toks[(u.i+1):(u.i+8)], ' ')) AS fp
      FROM tok t,
           UNNEST(range(CAST(greatest(len(t.toks) - 7, 0) AS BIGINT))) AS u(i)
    ), dup AS (
      SELECT fp FROM sh GROUP BY fp HAVING COUNT(*) > 1
    ), covered AS (
      SELECT DISTINCT s.doc_id, s.pos + g.j AS j
      FROM sh s JOIN dup USING (fp), UNNEST(range(8)) AS g(j)
    ), tokix AS (
      SELECT t.doc_id, CAST(u.j AS BIGINT) AS j,
             t.toks[CAST(u.j + 1 AS BIGINT)] AS tok
      FROM tok t, UNNEST(range(CAST(len(t.toks) AS BIGINT))) AS u(j)
    ), clean AS (
      SELECT x.doc_id,
             COUNT(c.j) AS n_dup_tokens,
             string_agg(CASE WHEN c.j IS NULL THEN x.tok END, ' ' ORDER BY x.j)
               AS clean_text
      FROM tokix x
      LEFT JOIN covered c ON x.doc_id = c.doc_id AND x.j = c.j
      GROUP BY x.doc_id
    )
    SELECT t.doc_id, len(t.toks) AS n_tokens,
           COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
           ROUND(CASE WHEN len(t.toks) > 0
                      THEN CAST(COALESCE(c.n_dup_tokens, 0) AS DOUBLE) / len(t.toks)
                      ELSE 0.0 END, 4) AS dup_token_frac,
           COALESCE(c.clean_text, '') AS clean_text
    FROM tok t LEFT JOIN clean c USING (doc_id)
    """,
)
def d17_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span removal (dedup.remove_duplicate_spans): every
    token covered by an 8-token shingle that occurs >1 time anywhere in
    the corpus is dropped and the clean text reconstructed — the
    ExactSubstr dedup of Lee et al. (arXiv:2107.06499) over whitespace
    tokens. Overlapping shingles (vs t14's non-overlapping segment
    stats) catch repeats at any alignment; one corpus shuffle for
    shingle counts, duplicated-fingerprint set broadcasts back."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.remove_duplicate_spans(docs, k=8)


@query(
    "d18_tfidf_cosine_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, u.t AS tok, COUNT(*) AS tf
      FROM documents,
           UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(t)
      GROUP BY doc_id, u.t
    ), freq AS (
      SELECT tok, COUNT(*) AS df_ FROM tok GROUP BY tok
    ), total AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), w AS (
      SELECT t.doc_id, t.tok,
             CAST(t.tf * floor(100 * total.n_docs / f.df_) AS BIGINT) AS w
      FROM tok t JOIN freq f USING (tok), total
      WHERE f.df_ <= 100
    ), norms AS (
      SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2 FROM w GROUP BY doc_id
    ), scores AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(SUM(a.w * b.w) AS BIGINT) AS dot_
      FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT s.id1, s.id2,
           ROUND(s.dot_ / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
    FROM scores s
    JOIN norms na ON na.doc_id = s.id1
    JOIN norms nb ON nb.doc_id = s.id2
    WHERE ROUND(s.dot_ / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= 0.3
    """,
)
def d18_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted all-pairs similarity (dedup.tfidf_cosine_pairs): exact
    TF-IDF cosine over the inverted index with integer-exact weights
    (tf x floor(100N/df) — no float anywhere until the single final
    division), df-cut at 100 bounding both skew and join fan-out. The
    oracle replays weights, dots, and norms in SQL; any drift in the
    integer arithmetic or the df-cut breaks the hash."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.tfidf_cosine_pairs(docs, threshold=0.3, max_df=100)


def _d19_oracle() -> str:
    return """
    WITH RECURSIVE tok AS (
      SELECT doc_id, u.t AS tokn, COUNT(*) AS tf
      FROM documents,
           UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(t)
      GROUP BY doc_id, u.t
    ), freq AS (
      SELECT tokn, COUNT(*) AS df_ FROM tok GROUP BY tokn
    ), total AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), w AS (
      SELECT t.doc_id, t.tokn,
             CAST(t.tf * floor(100 * total.n_docs / f.df_) AS BIGINT) AS w
      FROM tok t JOIN freq f USING (tokn), total
      WHERE f.df_ <= 100
    ), norms AS (
      SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2 FROM w GROUP BY doc_id
    ), scores AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(SUM(a.w * b.w) AS BIGINT) AS dot_
      FROM w a JOIN w b ON a.tokn = b.tokn AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
      SELECT s.id1, s.id2
      FROM scores s
      JOIN norms na ON na.doc_id = s.id1
      JOIN norms nb ON nb.doc_id = s.id2
      WHERE ROUND(s.dot_ / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= 0.5
    ), edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ), labels AS (
      SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
      GROUP BY d.doc_id
    )
    SELECT doc_id, cluster_id, doc_id = cluster_id AS is_rep FROM labels
    """


@query("d19_tfidf_dup_clusters", oracle=_d19_oracle())
def d19_tfidf_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted near-dup clustering: d18's exact TF-IDF cosine pairs
    (threshold 0.5) folded into connected components by the same
    min-label propagation d07 uses — transitivity over DISCRIMINATIVE-
    token evidence instead of raw shingle overlap. Oracle = the full
    integer-exact pair replay + recursive-CTE reachability."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.tfidf_cosine_pairs(docs, threshold=0.5, max_df=100).select(
        "id1", "id2"
    )
    return dedup.dup_clusters(docs, pairs)


@query(
    "d21_crawl_dedup_report",
    oracle=r"""
    WITH k AS (
      SELECT CASE WHEN doc_id % 25 = 0 THEN 'http://dup.example.com/page'
                  ELSE 'http://' || source || '.example.com/d/'
                       || CAST(doc_id AS VARCHAR) END AS canon,
             md5(regexp_replace(lower(trim(
               CASE WHEN doc_id % 10 < 2 THEN 'mirror content shared'
                    ELSE text END)), '\s+', ' ', 'g')) AS fp
      FROM documents
    ), u AS (
      SELECT 'same_url_diff_content' AS kind, canon AS key,
             count(*) AS n_pages, count(DISTINCT fp) AS n_variants
      FROM k GROUP BY canon HAVING count(DISTINCT fp) > 1
    ), c AS (
      SELECT 'same_content_diff_url' AS kind, fp AS key,
             count(*) AS n_pages, count(DISTINCT canon) AS n_variants
      FROM k GROUP BY fp HAVING count(DISTINCT canon) > 1
    )
    SELECT * FROM u UNION ALL SELECT * FROM c
    """,
)
def d21_crawl_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl dedup-anomaly audit (dedup.crawl_dedup_report): URLs built
    per doc with every 25th sharing one (case/slash-noisy) address and
    every 10th-or-11th-per-decade sharing MIRROR content — yielding
    both anomaly kinds: one recrawl-drift URL (distinct fingerprints
    under one canonical URL) and one mirror set (one fingerprint across
    ~91 canonical URLs). The oracle restates canonicalization
    arithmetically and replays the fingerprint normalization."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.when(d % 25 == 0, F.lit("http://Dup.Example.com//page/")).otherwise(
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/d/"),
            d.cast("string"),
        )
    )
    txt = F.when(d % 10 < 2, F.lit("mirror content shared")).otherwise(F.col("text"))
    return dedup.crawl_dedup_report(
        docs.select(url.alias("url"), txt.alias("text"))
    )


@query(
    "d22_quality_representatives",
    oracle=_DUP_GRAPH_CTE
    + """
    , q AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS quality
      FROM documents
    ), ranked AS (
      SELECT l.doc_id, l.cluster_id, q.quality,
             row_number() OVER (PARTITION BY l.cluster_id
                                ORDER BY q.quality DESC, l.doc_id ASC) AS rk
      FROM labels l JOIN q USING (doc_id)
    )
    SELECT doc_id, cluster_id, CAST(quality AS BIGINT) AS quality,
           rk = 1 AS is_rep
    FROM ranked
    """,
)
def d22_quality_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster representatives
    (dedup.select_representatives): the 3-gram-Jaccard near-dup
    clusters (d07's graph) re-keyed to keep each cluster's LONGEST
    member (token count, ties to the smaller id) — the RefinedWeb
    keep-the-best policy replacing min-id dedup. The oracle replays the
    transitive closure, then the (quality desc, id asc) argmax."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    clusters = dedup.dup_clusters(docs, pairs)
    quality = docs.select(
        "doc_id", text.token_count(F.col("text")).cast("long").alias("quality")
    )
    return dedup.select_representatives(clusters, quality)


@query(
    "d23_snapshot_diff",
    oracle="""
    WITH oldt AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents
    ), newt AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(
               CASE WHEN doc_id % 5 = 0 THEN text || ' appended drift'
                    ELSE text END)), '\\s+', ' ', 'g')) AS fp
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000,
             md5(regexp_replace(lower(trim(
               'fresh doc ' || CAST(doc_id AS VARCHAR))), '\\s+', ' ', 'g'))
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.fp IS NULL THEN 'added'
                WHEN n.fp IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.fp AS old_fp, n.fp AS new_fp
    FROM oldt o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id
    """,
)
def d23_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot drift (dedup.snapshot_diff_report): a re-crawl is
    simulated deterministically (every 7th doc removed, every surviving
    5th gets appended drift, every 11th spawns a fresh doc under a new
    id) and diffed against the original by normalized fingerprint —
    added/removed/changed/unchanged per doc. The oracle rebuilds the
    same second snapshot and replays the full-outer fingerprint diff."""
    docs = _t(spark, sf_dir, "documents")
    kept = docs.where(F.col("doc_id") % 7 != 0)
    changed = kept.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat("text", F.lit(" appended drift"))
        ).otherwise(F.col("text")).alias("text"),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("fresh doc "), F.col("doc_id").cast("string")).alias("text"),
    )
    new = changed.unionByName(added)
    return dedup.snapshot_diff_report(docs, new)


#: Shared by d24 (exact calibration arm) and d28 (scale-safe LSH tier):
#: the ORACLE is always the exhaustive sweep — d28 passing hash-exact
#: against it is the measured statement that the LSH tier's recall at
#: min(threshold) loses nothing on this corpus.
_SWEEP_ORACLE = """
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 0)+1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      FROM tok
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), scored AS (
      SELECT id1, id2, ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS j
      FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
    ), thr AS (
      SELECT unnest([0.3, 0.5, 0.7]) AS threshold
    ), hits AS (
      SELECT t.threshold, s.id1, s.id2 FROM thr t
      JOIN scored s ON s.j >= t.threshold
    ), np AS (
      SELECT threshold, COUNT(*) AS n_pairs FROM hits GROUP BY threshold
    ), dd AS (
      SELECT threshold, COUNT(DISTINCT u.did) AS n_dup_docs
      FROM hits, UNNEST([id1, id2]) AS u(did) GROUP BY threshold
    ), tot AS (
      SELECT COUNT(*) AS n FROM documents
    )
    SELECT t.threshold,
           CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(dd.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
           CAST((10000 * COALESCE(dd.n_dup_docs, 0)) // tot.n AS BIGINT)
             AS dup_frac_bp
    FROM thr t LEFT JOIN np USING (threshold) LEFT JOIN dd USING (threshold)
    CROSS JOIN tot
    """


@query("d24_threshold_sweep", oracle=_SWEEP_ORACLE)
def d24_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-knob sensitivity (dedup.dedup_threshold_sweep): pair and
    affected-document counts at Jaccard 0.3/0.5/0.7 from ONE candidate
    pass — the table that prices each threshold before a full dedup
    pass commits to one. This entry pins ``candidates='exact'`` (the
    exhaustive shingle self-join) as the CALIBRATION arm; the
    operator's default is the scale-safe LSH tier, graded separately as
    d28 against this same oracle. The oracle replays the scored pair
    CTE and the per-threshold re-aggregation, zero-hit thresholds
    included."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.dedup_threshold_sweep(docs, candidates="exact")


@query(
    "d25_dup_origin",
    oracle="""
    WITH planted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 9 < 2 THEN 'shared boilerplate page body'
                  WHEN doc_id % 9 < 4 THEN 'src-local template ' || source
                  ELSE text END AS text
      FROM documents
    ), per AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             source
      FROM planted
    ), g AS (
      SELECT fp, COUNT(*) AS n_copies,
             COUNT(DISTINCT source) AS n_sources,
             array_to_string((list_sort(list_distinct(list(source))))[1:10], ',') AS sources
      FROM per GROUP BY fp HAVING COUNT(*) > 1
    )
    SELECT fp, CAST(n_copies AS BIGINT) AS n_copies,
           CAST(n_sources AS BIGINT) AS n_sources,
           CASE WHEN n_sources > 1 THEN 'cross_source'
                ELSE 'intra_source' END AS origin,
           sources
    FROM g
    """,
)
def d25_dup_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-origin attribution (dedup.dup_origin_report): 2/9 of
    docs collapse onto one cross-source boilerplate body, another 2/9
    onto a per-source template (intra-source dups), the rest stay
    unique — the report must classify each duplicated fingerprint's
    spread correctly with sorted exemplar sources. One fingerprint
    shuffle; singles drop before the wide columns."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 9 < 2, F.lit("shared boilerplate page body"))
        .when(
            F.col("doc_id") % 9 < 4,
            F.concat(F.lit("src-local template "), F.col("source")),
        )
        .otherwise(F.col("text")).alias("text"),
    )
    return dedup.dup_origin_report(planted)


@query(
    "d26_exact_substring_scrub",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), win AS (
      SELECT doc_id, w.pos AS pos, w.wh AS wh
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                      i -> {'pos': i,
                            'wh': md5(array_to_string(t[i:i+7], ' '))})) AS w
        FROM tok
      )
    ), dups AS (
      SELECT wh FROM win GROUP BY wh HAVING COUNT(DISTINCT doc_id) > 1
    ), dwin AS (
      SELECT doc_id, pos FROM win WHERE wh IN (SELECT wh FROM dups)
    ), per AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
      FROM dwin GROUP BY doc_id
    ), cov AS (
      SELECT doc_id, CAST(COUNT(DISTINCT pos + o) AS BIGINT) AS covered_tokens
      FROM dwin, range(0, 8) r(o) GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           CAST(CASE WHEN len(t.t) > 0
                THEN (COALESCE(c.covered_tokens, 0) * 10000) // len(t.t)
                ELSE 0 END AS BIGINT) AS dup_coverage_bp
    FROM tok t LEFT JOIN per p USING (doc_id) LEFT JOIN cov c USING (doc_id)
    """,
)
def d26_exact_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication coverage
    (dedup.exact_substring_scrub): every overlapping 8-token span is
    hashed, spans recurring verbatim in another document mark their
    positions, and the per-doc coverage union (overlaps never
    double-count a token) is the ExactSubstr scrub mass — the
    any-alignment complement of t14's fixed segments. One window-hash
    shuffle (the d02 inverted-index shape); coverage explodes from dup
    windows only. The oracle replays windows, positions, and the
    coverage union exactly."""
    docs = _t(spark, sf_dir, "documents")
    from logverzcore_spark.operators.util import fan_out

    return dedup.exact_substring_scrub(fan_out(docs), window=8)


@query(
    "d27_semantic_leakage_split",
    oracle=_d12_oracle(
        final_select="""
    SELECT vec_id AS doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
           CASE WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 1) <= 'b'
                THEN 'train'
                WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 1) <= 'd'
                THEN 'val' ELSE 'test' END AS split
    FROM labels"""
    ),
)
def d27_semantic_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split on SEMANTIC clusters: t22 fences LEXICAL
    near-dups (n-gram Jaccard components) into one split, but a
    paraphrased eval twin shares no 3-grams — it only collapses in
    embedding space. Here the split key is d12's SemDeDup component
    (hyperplane cells → intra-cell cosine ≥ 0.25 → min-label closure),
    so semantically-duplicate families land on one side of the
    train/eval fence by construction; the two entries differ in the
    GRAPH being fenced (embedding components vs shingle components) —
    run both to fence both leak modes. Plan: d12's cell-bounded pair
    generation + label propagation; the split itself is a pure
    projection on the cluster hash. The oracle replays planes, cells,
    cosine closure, and the split rule exactly."""
    from logverzcore_spark.operators.text import hash_split

    emb = _t(spark, sf_dir, "embeddings")
    clusters = dedup.semantic_dedup(emb, dim=64, threshold=0.25, n_planes=4)
    return clusters.select(
        F.col("vec_id").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        hash_split(F.col("cluster_id")).alias("split"),
    )


@query(
    "d30_incremental_neardup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE source <> 'src3'
    ), newb AS (
      SELECT doc_id, text FROM documents WHERE source = 'src3'
      UNION ALL
      SELECT doc_id + 2000000, text || ' drifted crawl copy tail'
      FROM documents WHERE source <> 'src3' AND doc_id % 13 = 0
    ), tokn AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM newb
    ), tokc AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM corpus
    ), shn AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 0)+1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      FROM tokn
    ), shc AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 0)+1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      FROM tokc
    ), szn AS (SELECT doc_id, COUNT(*) AS n FROM shn GROUP BY doc_id),
    szc AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, COUNT(*) AS c
      FROM shn a JOIN shc b ON a.sh = b.sh GROUP BY 1, 2
    )
    SELECT new_id, corpus_id,
           ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS jaccard
    FROM inter JOIN szn s1 ON s1.doc_id = new_id
               JOIN szc s2 ON s2.doc_id = corpus_id
    WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= 0.7
    """,
)
def d30_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup against the banked corpus
    (dedup.incremental_neardup_pairs) — the fuzzy sibling of d13's
    exact incremental dedup and the production shape of d03 at 100 TB:
    each crawl snapshot probes the corpus's PERSISTED LSH index
    (build_neardup_index; batch band-buckets broadcast, corpus text
    touched only candidate-scoped) instead of re-banding the union.
    The batch is src3 plus drifted re-crawl copies of every 13th
    corpus doc (' drifted crawl copy tail' appended — jaccard ≈ 0.93,
    the page-edit a fingerprint misses); r=2/b=16 banding misses a
    0.7 pair with p≈2e-5, so the output hash-matches the oracle's
    exact batch×corpus Jaccard join."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("source") != "src3").select("doc_id", "text")
    batch = docs.where(F.col("source") == "src3").select("doc_id", "text")
    planted = docs.where(
        (F.col("source") != "src3") & (F.col("doc_id") % 13 == 0)
    ).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" drifted crawl copy tail")).alias("text"),
    )
    new_df = batch.unionByName(planted)
    return dedup.incremental_neardup_pairs(new_df, corpus, threshold=0.7)


@query("d29_threshold_sweep_ht")  # HT-estimated counts → rows-only; error bound measured in parity artifact
def d29_threshold_sweep_ht(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sweep's FULL-CORPUS 100 TB tier (dedup.dedup_threshold_sweep,
    estimator='ht'): selective r=2 MinHash banding (~20× fewer
    background candidates than the recall-exact r=1 tier — the no-free-
    lunch result the r8 100× probes measured: r=1's cost tracks the
    exact join, 394 s vs 612 s at 100×, while this tier runs 28.5 s,
    6.2× wall for 100× data) with the known LSH sampling divided out:
    every verified pair at exact jaccard j weights 1/p(j),
    p(j)=1-(1-j²)^16 — the Horvitz–Thompson unbiased estimate of the
    exhaustive sweep's n_pairs. Estimated counts are not SQL-replayable
    (the candidate draw depends on xxhash64 minhashes), so the entry is
    rows-only with its accuracy bound MEASURED in the parity artifact:
    max relative n_pairs error vs the exact tier (measured −1.7%/−0.09%
    /0% at 10× across 0.3/0.5/0.7). n_dup_docs is the observed lower
    bound (tight above ~0.5 where p→1)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.dedup_threshold_sweep(docs, candidates="lsh", estimator="ht")


@query("d28_threshold_sweep_lsh", oracle=_SWEEP_ORACLE)
def d28_threshold_sweep_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The threshold sweep's SCALE-SAFE default tier
    (dedup.dedup_threshold_sweep, candidates='lsh'): candidate pairs
    come from d03's MinHash banding — auto-tuned to r=1 at
    min(threshold)=0.3 (any shared minhash collides; per-pair miss
    ≤ (1-0.3)^32 ≈ 1e-5) — then exact-Jaccard verified, so candidate
    volume is bucket-bounded instead of the exact tier's df²-skewed
    shingle self-join (the suite's one super-linear 100× cell in r7).
    Graded against the SAME exhaustive oracle as d24: hash-equality
    here IS the measured claim that the LSH tier's recall loses no
    pair of this corpus at any swept threshold."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.dedup_threshold_sweep(docs, candidates="lsh")


@query(
    "d31_dup_source_matrix",
    oracle="""
    WITH planted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 9 < 2 THEN 'shared boilerplate page body'
                  WHEN doc_id % 9 < 4 THEN 'src-local template ' || source
                  WHEN doc_id % 9 = 4 THEN 'syndicated from partner '
                                           || CAST(doc_id % 4 AS VARCHAR)
                  ELSE text END AS text
      FROM documents
    ), per AS (
      SELECT DISTINCT
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             source
      FROM planted
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fps
    FROM per a JOIN per b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def d31_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix (dedup.dup_source_matrix): the
    corpus-level syndication map — per unordered source pair, how many
    exact-dup fingerprints both carry. d25's planted fixture extended
    with a partner-network body (every 9th≡4 doc shares one of 4
    'syndicated' bodies, so pair counts VARY instead of one global
    boilerplate clique): the d25 origin labels say intra-vs-cross, this
    says WHICH pairs and how much — the input to a per-pair crawl
    dedupe rule. Blow-up bounded by sources-per-fp via the DISTINCT
    (fp, source) projection, never copies-per-fp; the oracle replays
    planting, fingerprint, distinct, and the triangular join."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 9 < 2, F.lit("shared boilerplate page body"))
        .when(
            F.col("doc_id") % 9 < 4,
            F.concat(F.lit("src-local template "), F.col("source")),
        )
        .when(
            F.col("doc_id") % 9 == 4,
            F.concat(
                F.lit("syndicated from partner "),
                (F.col("doc_id") % 4).cast("string"),
            ),
        )
        .otherwise(F.col("text")).alias("text"),
    )
    return dedup.dup_source_matrix(planted)


@query(
    "d32_cluster_size_histogram",
    oracle=_DUP_GRAPH_CTE
    + """
    , sizes AS (
      SELECT cluster_id, COUNT(*) AS sz FROM labels GROUP BY cluster_id
    )
    SELECT CAST(length(bin(sz)) - 1 AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(MAX(sz) AS BIGINT) AS max_size
    FROM sizes GROUP BY 1
    """,
)
def d32_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE distribution (log2 buckets): how the dup
    mass is shaped — a long tail of pairs, or a few mega-clusters —
    which is exactly the measurement that prices the mega-bucket valve
    (minhash_lsh_pairs max_bucket_size) and predicts the verify join's
    skew BEFORE a full pass: set the cap above the histogram's knee and
    the quadratic term dies with measured, bounded recall loss. Bucket
    = bit-length of the cluster size minus one (integer-exact in both
    engines via bin(); floor(log2) on floats could hash-flip on a
    last-ulp). Per bucket: cluster count, doc mass, largest cluster.
    Plan: d07's label propagation, then two tiny partial-agg shuffles
    (cluster sizes, then ≤64 histogram rows)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    clusters = dedup.dup_clusters(docs, pairs)
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    bucket = (F.length(F.bin(F.col("sz"))) - 1).cast("int")
    return (
        sizes.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.max("sz").cast("long").alias("max_size"),
        )
    )


@query(
    "d33_threshold_sweep_auto",
    oracle="SELECT s.*, 'exact' AS tier FROM (" + _SWEEP_ORACLE + ") s",
)
def d33_threshold_sweep_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sweep's AUTO tier router (dedup.dedup_threshold_sweep,
    candidates='auto' — r9): the tier is picked from MEASURED inputs —
    banding selectivity at min(threshold), then corpus row count
    against the exact-tier boundary — and stamped on every report row
    as a ``tier`` column, so a caller never has to know the r8
    no-free-lunch result (loose thresholds degenerate recall-exact LSH
    to exact-join cost; the sub-linear full-corpus path is the HT
    estimator) to route around it. At suite scale the loose 0.3 sweep
    resolves to the exact calibration arm (500 docs ≪ the 100k
    boundary), which the oracle replays — the hash-exact grade of the
    ROUTING decision itself; past the boundary the same call routes to
    HT (pytest covers both switch points with value equality to the
    explicitly-chosen tiers)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.dedup_threshold_sweep(docs, candidates="auto")
