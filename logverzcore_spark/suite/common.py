"""The graded query suite: every entry pairs a Spark implementation with a
DuckDB oracle SQL string over the same parquet tables (TESTDATA.md).

Numeric-determinism conventions (so Spark and DuckDB hash-match exactly):
- money/metric sums go through DECIMAL(18,2/4) so addition is exact and
  order-independent (Spark's parallel partial aggregation must not change
  the result), then cast to DOUBLE for a stable output type;
- products (price * (1-discount)) are rounded to 2dp *per row* before the
  decimal cast — both engines round the same IEEE double;
- averages divide an exact decimal sum (as double) by a count;
- window ranks order by exact columns with an id tie-break;
- timestamps leave the engine as formatted strings (UTC session TZ).

Column names are aliased identically on both sides — the driver sorts
columns by name before hashing.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable
from logverzcore_spark.exprcache import registered_expr_cache

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logverzcore_spark.operators import dedup, optree, similarity, text
from logverzcore_spark.operators.coerce import coerce
from logverzcore_spark.plans.sqlgate import rewrite_legacy_query

QueryFn = Callable[[SparkSession, str], DataFrame]

SUITE: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        SUITE[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from logverzcore_spark.engine import read_table

    return read_table(spark, sf_dir, name)


def _docs_stream(spark: SparkSession, sf_dir: str):
    """File-source stream over the documents table, robust to BOTH
    layouts: the driver's single ``documents.parquet`` file (watch
    sf_dir with a basename glob — the file source wants a directory)
    and a Spark-written ``documents.parquet/`` DIRECTORY of part files
    (the scale replicas' shape), where that same glob would match ZERO
    leaf files and the stream would silently never run — watch the
    directory itself instead."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    from logverzcore_spark.engine import parquet_schema

    sch = parquet_schema(spark, docs_path)  # session-memoized (r14)
    if os.path.isdir(docs_path):
        return spark.readStream.schema(sch).parquet(docs_path)
    return (
        spark.readStream.schema(sch)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


@registered_expr_cache()
def _money_sum(col, scale: int = 2):
    """Money sum as exact integer units (floor(x*10^s + 0.5) — half-up
    toward +inf, identical IEEE ops in any engine) divided back once.
    Integer SUM is ~2x faster than DECIMAL(18,s) aggregation buffers
    (measured on the q01 agg) and immune to summation-order effects.
    Memoized (r13): a Column is an immutable template, and the ~8
    py4j-bearing calls here run up to 5× per construction of the money
    aggregations (q01 alone: ~90 ms of its 0.2 s warm build)."""
    unit = 10 ** scale
    return F.sum(F.floor(F.col(col) * unit + 0.5).cast("bigint")) / F.lit(float(unit))


# ---------------------------------------------------------------------------
# Text analysis / dedup / similarity (beyond-reference pipeline operators)
# ---------------------------------------------------------------------------

_T01_ORACLE = """
WITH tk AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks,
         list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS dtoks
  FROM documents
), feat AS (
  SELECT doc_id, text, toks,
         len(list_filter(list_transform(toks, x -> lower(x)),
             x -> x IN ('the','a','an','and','or','of','to','in','is'))) AS n_stop,
         len(list_distinct(list_transform(toks, x -> lower(x)))) AS n_distinct,
         len(list_filter(dtoks, x -> x IN ('the','and','of','to','a','in','is'))) AS s_en,
         len(list_filter(dtoks, x -> x IN ('der','die','und','das','nicht','ist'))) AS s_de,
         len(list_filter(dtoks, x -> x IN ('le','la','et','les','des','est'))) AS s_fr,
         len(list_filter(dtoks, x -> x IN ('el','la','los','que','es','una'))) AS s_es
  FROM tk
)
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_computed,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
       ROUND(n_stop / greatest(len(toks), 1), 4) AS stopword_ratio,
       ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
             / greatest(length(text), 1), 4) AS punct_ratio,
       ROUND(1.0 - n_distinct / greatest(len(toks), 1), 4) AS repetition_ratio,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            ELSE 'de' END AS lang_guess
FROM feat
"""


_T02_ORACLE = """
WITH tk AS (
  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), feat AS (
  SELECT doc_id, text, toks,
         len(list_filter(list_transform(toks, x -> lower(x)),
             x -> x IN ('the','a','an','and','or','of','to','in','is'))) AS n_stop,
         len(list_distinct(list_transform(toks, x -> lower(x)))) AS n_distinct
  FROM tk
)
SELECT doc_id
FROM feat
WHERE len(toks) BETWEEN 10 AND 1000
  AND ROUND(n_stop / greatest(len(toks), 1), 4) >= 0.05
  AND ROUND(1.0 - n_distinct / greatest(len(toks), 1), 4) <= 0.6
"""


_JACCARD_ORACLE_TMPL = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
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
)
SELECT id1, id2, ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS jaccard
FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= {thr}
"""


#: Shared transitive-closure prefix for the duplicate-cluster oracles:
#: 3-gram Jaccard≥0.5 pair graph → recursive reachability.
_DUP_GRAPH_CTE = """
WITH RECURSIVE tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
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
), pairs AS (
  SELECT id1, id2
  FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
  WHERE ROUND(c * 1.0 / (s1.n + s2.n - c), 4) >= 0.5
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
"""

_D07_ORACLE = (
    _DUP_GRAPH_CTE
    + """
SELECT doc_id, cluster_id, doc_id = cluster_id AS is_rep FROM labels
"""
)


# ---------------------------------------------------------------------------
# Portable-oracle ANN variants (VERDICT r2 #6): the LSH hyperplanes and
# IVF centroids come from the deterministic LCG stream, so the SQL oracle
# holds the SAME literal vectors and replays bucketing / cell assignment
# exactly — the ANN paths graduate from rows-only to hash-verified.
# ---------------------------------------------------------------------------


def _sql_double_array(row: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in row) + "]::DOUBLE[]"


_ANN_TOPK_TAIL = """
    ), n AS (
      SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    ), scored AS (
      SELECT cand.qid AS query_id, cand.nid AS neighbor_id,
             list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
      FROM cand JOIN n q ON q.vec_id = cand.qid
                JOIN n c ON c.vec_id = cand.nid
    ), ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
"""


def _s02b_oracle(dim: int = 64, n_planes: int = 4, n_tables: int = 12) -> str:
    planes = similarity._hyperplanes(dim, n_planes * n_tables)
    values = ",\n      ".join(
        f"({p}, {_sql_double_array(row)})" for p, row in enumerate(planes)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), planes(p, plane) AS (VALUES
      {values}
    ), b AS (
      SELECT v.vec_id, p.p // {n_planes} AS t,
             SUM(CASE WHEN list_dot_product(v.e, p.plane) >= 0
                      THEN (1 << (p.p % {n_planes})) ELSE 0 END) AS bucket
      FROM v CROSS JOIN planes p
      GROUP BY v.vec_id, p.p // {n_planes}
    ), cand AS (
      SELECT DISTINCT qb.vec_id AS qid, cb.vec_id AS nid
      FROM b qb JOIN b cb ON qb.t = cb.t AND qb.bucket = cb.bucket
                         AND qb.vec_id <> cb.vec_id
      WHERE qb.vec_id < 20
    {_ANN_TOPK_TAIL}
    """


def _s03b_oracle(dim: int = 64, n_cells: int = 16, nprobe: int = 4) -> str:
    cents = similarity.lcg_centroids(dim, n_cells)
    values = ",\n      ".join(
        f"({ci}, {_sql_double_array(row)})" for ci, row in enumerate(cents)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cents(cell, cvec) AS (VALUES
      {values}
    ), sims AS (
      SELECT v.vec_id, c.cell, list_dot_product(v.e, c.cvec) AS sim
      FROM v CROSS JOIN cents c
    ), c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims
      ) WHERE rn = 1
    ), q_probe AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims WHERE vec_id < 20
      ) WHERE rn <= {nprobe}
    ), cand AS (
      SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
      FROM q_probe q JOIN c_assign c ON q.cell = c.cell
                                    AND q.vec_id <> c.vec_id
    {_ANN_TOPK_TAIL}
    """


def _s26_oracle(dim: int = 64, n_cells: int = 16, nprobe: int = 4) -> str:
    """s03b's IVF probe oracle over a POST-DML corpus: the same literal
    LCG centroids and probe replay, but the ``v`` CTE first applies the
    exact mutations s26 commits through the snapshot layer — delete one
    vec_id band, negate another band's vectors (FP-exact both engines),
    append reversed copies of the head band under shifted ids. Bands
    are data-relative (integer arithmetic on max(vec_id)) so the
    fixture holds at every SF."""
    cents = similarity.lcg_centroids(dim, n_cells)
    values = ",\n      ".join(
        f"({ci}, {_sql_double_array(row)})" for ci, row in enumerate(cents)
    )
    return f"""
    WITH v0 AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), mx AS (
      SELECT max(vec_id) AS m FROM v0
    ), v AS (
      SELECT v0.vec_id,
             CASE WHEN v0.vec_id BETWEEN mx.m // 2 AND mx.m // 2 + mx.m // 10
                  THEN list_transform(v0.e, x -> -x) ELSE v0.e END AS e
      FROM v0, mx
      WHERE NOT (v0.vec_id BETWEEN mx.m // 5 AND mx.m // 4)
      UNION ALL
      SELECT v0.vec_id + mx.m + 1, list_reverse(v0.e)
      FROM v0, mx WHERE v0.vec_id <= mx.m // 20
    ), cents(cell, cvec) AS (VALUES
      {values}
    ), sims AS (
      SELECT v.vec_id, c.cell, list_dot_product(v.e, c.cvec) AS sim
      FROM v CROSS JOIN cents c
    ), c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims
      ) WHERE rn = 1
    ), q_probe AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims WHERE vec_id < 20
      ) WHERE rn <= {nprobe}
    ), cand AS (
      SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
      FROM q_probe q JOIN c_assign c ON q.cell = c.cell
                                    AND q.vec_id <> c.vec_id
    {_ANN_TOPK_TAIL}
    """


def _st41_oracle(dim: int = 64, n_cells: int = 16, nprobe: int = 4) -> str:
    """s26's post-DML IVF probe oracle, with the mutations arriving as
    st41's CDC stream instead: three banded micro-batches (bands at
    2/16, 6/16, 10/16 of the vec_id range) negate each band's even
    vectors (update), insert reversed copies under shifted ids, and
    tombstone the band's odd ids; a fourth batch re-inserts band 1's
    odd %5==0 ids with reversed vectors. The oracle replays the final
    corpus AND the IVF probe in SQL."""
    cents = similarity.lcg_centroids(dim, n_cells)
    values = ",\n      ".join(
        f"({ci}, {_sql_double_array(row)})" for ci, row in enumerate(cents)
    )
    inband = (
        "((v0.vec_id >= b.s1 AND v0.vec_id < b.e1) OR "
        "(v0.vec_id >= b.s2 AND v0.vec_id < b.e2) OR "
        "(v0.vec_id >= b.s3 AND v0.vec_id < b.e3))"
    )
    return f"""
    WITH v0 AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), b AS (
      SELECT max(vec_id) AS m,
             max(vec_id) * 2 // 16 AS s1, max(vec_id) * 3 // 16 AS e1,
             max(vec_id) * 6 // 16 AS s2, max(vec_id) * 7 // 16 AS e2,
             max(vec_id) * 10 // 16 AS s3, max(vec_id) * 11 // 16 AS e3
      FROM v0
    ), v AS (
      SELECT v0.vec_id,
             CASE WHEN v0.vec_id % 2 = 0 AND {inband}
                  THEN list_transform(v0.e, x -> -x) ELSE v0.e END AS e
      FROM v0, b
      WHERE NOT (v0.vec_id % 2 = 1 AND {inband})
      UNION ALL
      SELECT v0.vec_id, list_reverse(v0.e)
      FROM v0, b
      WHERE v0.vec_id >= b.s1 AND v0.vec_id < b.e1
        AND v0.vec_id % 2 = 1 AND v0.vec_id % 5 = 0
      UNION ALL
      SELECT v0.vec_id + b.m + 1, list_reverse(v0.e)
      FROM v0, b
      WHERE v0.vec_id % 2 = 0 AND {inband}
    ), cents(cell, cvec) AS (VALUES
      {values}
    ), sims AS (
      SELECT v.vec_id, c.cell, list_dot_product(v.e, c.cvec) AS sim
      FROM v CROSS JOIN cents c
    ), c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims
      ) WHERE rn = 1
    ), q_probe AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims WHERE vec_id < 20
      ) WHERE rn <= {nprobe}
    ), cand AS (
      SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
      FROM q_probe q JOIN c_assign c ON q.cell = c.cell
                                    AND q.vec_id <> c.vec_id
    {_ANN_TOPK_TAIL}
    """


def _d12_oracle(
    dim: int = 64,
    n_planes: int = 4,
    threshold: float = 0.25,
    final_select: str = "SELECT vec_id, cluster_id, vec_id = cluster_id AS is_rep FROM labels",
) -> str:
    planes = similarity._hyperplanes(dim, n_planes)
    values = ",\n      ".join(
        f"({p}, {_sql_double_array(row)})" for p, row in enumerate(planes)
    )
    return f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), planes(p, plane) AS (VALUES
      {values}
    ), b AS (
      SELECT v.vec_id, v.e,
             SUM(CASE WHEN list_dot_product(v.e, p.plane) >= 0
                      THEN (1::BIGINT << p.p) ELSE 0 END) AS cell
      FROM v CROSS JOIN planes p GROUP BY v.vec_id, v.e
    ), n AS (
      SELECT vec_id, e, cell, sqrt(list_dot_product(e, e)) AS nrm FROM b
    ), pairs AS (
      SELECT a.vec_id AS id1, c.vec_id AS id2
      FROM n a JOIN n c ON a.cell = c.cell AND a.vec_id < c.vec_id
      WHERE ROUND(list_dot_product(a.e, c.e) / (a.nrm * c.nrm), 6) >= {threshold}
    ), edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a
    ), labels AS (
      SELECT v.vec_id, LEAST(v.vec_id, COALESCE(MIN(r.dst), v.vec_id)) AS cluster_id
      FROM v LEFT JOIN reach r ON r.src = v.vec_id
      GROUP BY v.vec_id
    )
    {final_select}
    """


def _s06b_oracle(dim: int = 64, m: int = 8, n_codes: int = 16) -> str:
    import numpy as np

    sub = dim // m
    books = similarity.lcg_codebooks(dim, m, n_codes)
    C = np.array(books, dtype=np.float64)
    c2 = (C * C).sum(axis=2)
    c2i = np.floor(c2 * similarity.PQ_SCALE + 0.5).astype(np.int64)
    values = ",\n      ".join(
        f"({s}, {j}, {_sql_double_array(books[s][j])}, {c2[s, j]!r}, {int(c2i[s, j])})"
        for s in range(m)
        for j in range(n_codes)
    )
    S = similarity.PQ_SCALE
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cb(s, j, cvec, c2, c2i) AS (VALUES
      {values}
    ), codes AS (
      SELECT vec_id, s, j AS code FROM (
        SELECT v.vec_id, cb.s, cb.j,
               row_number() OVER (PARTITION BY v.vec_id, cb.s ORDER BY
                 floor((cb.c2 - 2 * list_dot_product(
                   v.e[cb.s*{sub}+1 : (cb.s+1)*{sub}], cb.cvec)) * {S} + 0.5),
                 cb.j) AS rn
        FROM v CROSS JOIN cb
      ) WHERE rn = 1
    ), recon AS (
      SELECT c.vec_id, SUM(cb.c2i) AS recon
      FROM codes c JOIN cb ON cb.s = c.s AND cb.j = c.code
      GROUP BY c.vec_id
    ), lut AS (
      SELECT q.vec_id AS qid, cb.s, cb.j,
             CAST(floor(list_dot_product(
               q.e[cb.s*{sub}+1 : (cb.s+1)*{sub}], cb.cvec) * {S} + 0.5) AS BIGINT) AS t
      FROM v q CROSS JOIN cb WHERE q.vec_id < 20
    ), scored AS (
      SELECT l.qid, c.vec_id AS nid, SUM(l.t) AS adc
      FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.code
      WHERE l.qid <> c.vec_id
      GROUP BY 1, 2
    ), qn AS (
      SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v WHERE vec_id < 20
    ), ranked AS (
      SELECT s.qid, s.nid, s.adc, r.recon,
             row_number() OVER (PARTITION BY s.qid ORDER BY
               (s.adc / {S}.0) / sqrt(r.recon / {S}.0) DESC, s.nid) AS rank
      FROM scored s JOIN recon r ON r.vec_id = s.nid
    )
    SELECT qid AS query_id, nid AS neighbor_id,
           ROUND((adc / {S}.0) / (qn.nrm * sqrt(recon / {S}.0)), 6) AS approx_cosine,
           CAST(rank AS INTEGER) AS rank
    FROM ranked JOIN qn ON qn.vec_id = ranked.qid
    WHERE rank <= 5
    """


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join battery (round 3): the join-reordering /
# decorrelation / disjunctive-pushdown shapes (Q7/Q8/Q9/Q14/Q17/Q19)
# the reference's users ran against RDS through Q1 (SURVEY §2.5). All
# money math uses the exact-integer-cents pattern so parallel partial
# aggregation cannot perturb the result.
# ---------------------------------------------------------------------------

_CENTS = "CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)"


def _cents() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")


def _s07_oracle(dim: int = 64, n_cells: int = 16, per_cell: int = 5) -> str:
    cents = similarity.lcg_centroids(dim, n_cells)
    values = ",\n      ".join(
        f"({ci}, {_sql_double_array(row)})" for ci, row in enumerate(cents)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cents(cell, cvec) AS (VALUES
      {values}
    ), sims AS (
      SELECT v.vec_id, c.cell, list_dot_product(v.e, c.cvec) AS sim
      FROM v CROSS JOIN cents c
    ), c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims
      ) WHERE rn = 1
    ), picked AS (
      SELECT cell, vec_id,
             row_number() OVER (PARTITION BY cell
                                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS pick_rank
      FROM c_assign
    )
    SELECT CAST(cell AS INTEGER) AS cell, vec_id,
           CAST(pick_rank AS INTEGER) AS pick_rank
    FROM picked WHERE pick_rank <= {per_cell}
    """


def _hex_digits_to_int_sql(expr: str, n: int) -> str:
    """SQL expression: first ``n`` hex digits of ``expr`` as an integer
    (DuckDB has no hex-parse scalar; strpos over the alphabet replays
    Spark's conv() exactly)."""
    terms = [
        f"(strpos('0123456789abcdef', substring({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + "\n               + ".join(terms) + ")"


#: The recursive core, shared verbatim by both engines; only where the
#: edge set comes from differs (oracle: inline CTE; Spark: a temp view
#: over a materialized frame — see the docstring).
_Q101_CHAIN = """chain(o_orderkey, root_key, depth) AS (
      SELECT o_orderkey, o_orderkey, 0 FROM {edges} WHERE parent IS NULL
      UNION ALL
      SELECT e.o_orderkey, c.root_key, c.depth + 1
      FROM chain c JOIN {edges} e ON e.parent = c.o_orderkey
    )
    SELECT o_orderkey, root_key, depth FROM chain
"""


def _run_recursive_chain(spark, edges):
    """Execute the q101 recursion over a MATERIALIZED edge frame with
    the runaway-guard row limit sized from the edge count: the
    recursion's total output is exactly one row per node, so
    ``max(1M, 2·|edges|)`` passes any legitimate input at any SF while
    a genuinely divergent recursion (cycle / multi-parent bug) still
    trips the guard at ~2× the expected volume. The raised limit is
    save/restored around an EAGER run (localCheckpoint pins the
    result), so later queries on the shared session keep the default
    ceiling. Pytest proves the sizing at a synthetic scale (>1M chain
    rows) that the static 1M default would reject
    (test_recursive_interp.py)."""
    prior = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    spark.conf.set(
        "spark.sql.cteRecursionRowLimit",
        str(max(1_000_000, 2 * edges.count())),
    )
    try:
        edges.createOrReplaceTempView("q101_edges")
        return spark.sql(
            "WITH RECURSIVE " + _Q101_CHAIN.format(edges="q101_edges")
        ).localCheckpoint(eager=True)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.cteRecursionRowLimit")
        else:
            spark.conf.set("spark.sql.cteRecursionRowLimit", prior)


_Q101_ORACLE = (
    """
    WITH RECURSIVE edges AS (
      SELECT o_orderkey, o_custkey,
             LAG(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS parent
      FROM orders
    ), """
    + _Q101_CHAIN.format(edges="edges")
)


_Q107_SQL = """
    WITH agg AS (
      SELECT r_name, n_name,
             SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS cents,
             GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n
      FROM {src}
      GROUP BY ROLLUP(r_name, n_name)
    )
    SELECT r_name, n_name,
           CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           g_r + g_n AS lochierarchy,
           ROW_NUMBER() OVER (
             PARTITION BY g_r + g_n,
                          CASE WHEN g_n = 0 THEN r_name END
             ORDER BY cents DESC, COALESCE(n_name, ''), COALESCE(r_name, '')
           ) AS rank_within_parent
    FROM agg
"""


_Q108_SQL = """
    WITH m AS (
      SELECT n_name,
             CAST(date_part('year', o_orderdate) AS INTEGER) AS yr,
             CAST(date_part('month', o_orderdate) AS INTEGER) AS mon,
             SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS cents
      FROM {src}
      GROUP BY 1, 2, 3
    )
    SELECT n_name, yr, mon,
           CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           ROUND(CAST(cents AS DOUBLE)
                 / (SUM(cents) OVER (PARTITION BY n_name, yr)
                    / CAST(COUNT(*) OVER (PARTITION BY n_name, yr) AS DOUBLE)),
                 6) AS vs_year_avg,
           CAST(COALESCE(LAG(cents) OVER w, 0) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS prev_rev,
           CAST(COALESCE(LEAD(cents) OVER w, 0) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS next_rev
    FROM m
    WINDOW w AS (PARTITION BY n_name ORDER BY yr, mon)
"""


_Q110_SQL = """
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS cents
      FROM {src} GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
      FROM spend
    )
    SELECT decile,
           COUNT(*) AS n_customers,
           CAST(SUM(cents) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(cents) AS DOUBLE)
                 / CAST(SUM(SUM(cents)) OVER () AS DOUBLE), 6) AS share,
           ROUND(CAST(SUM(SUM(cents)) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(SUM(SUM(cents)) OVER () AS DOUBLE), 6) AS cum_share,
           CASE
             WHEN CAST(SUM(SUM(cents)) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / CAST(SUM(SUM(cents)) OVER () AS DOUBLE) <= 0.80 THEN 'A'
             WHEN CAST(SUM(SUM(cents)) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / CAST(SUM(SUM(cents)) OVER () AS DOUBLE) <= 0.95 THEN 'B'
             ELSE 'C'
           END AS abc_class
    FROM ranked GROUP BY decile
"""



def _s11b_oracle(
    dim: int = 64, n_cells: int = 16, nprobe: int = 4,
    m: int = 8, n_codes: int = 16,
) -> str:
    """SQL replay of the COMPOSED IVF-PQ persistent index probe
    (s11b): s03b's coarse-quantizer CTEs (literal LCG centroids, cell
    argmax, nprobe probing) feeding s06b's PQ CTEs (fixed-point encode,
    LUT, integer ADC) — scored only over candidate pairs that share a
    probed cell, ranked on the adc/sqrt(recon) key. Any divergence in
    cell assignment, partition pruning, encode, or ADC breaks the
    hash."""
    import numpy as np

    sub = dim // m
    cents = similarity.lcg_centroids(dim, n_cells)
    cent_values = ",\n      ".join(
        f"({ci}, {_sql_double_array(row)})" for ci, row in enumerate(cents)
    )
    books = similarity.lcg_codebooks(dim, m, n_codes)
    C = np.array(books, dtype=np.float64)
    c2 = (C * C).sum(axis=2)
    c2i = np.floor(c2 * similarity.PQ_SCALE + 0.5).astype(np.int64)
    cb_values = ",\n      ".join(
        f"({s}, {j}, {_sql_double_array(books[s][j])}, {c2[s, j]!r}, {int(c2i[s, j])})"
        for s in range(m)
        for j in range(n_codes)
    )
    S = similarity.PQ_SCALE
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cents(cell, cvec) AS (VALUES
      {cent_values}
    ), cb(s, j, cvec, c2, c2i) AS (VALUES
      {cb_values}
    ), sims AS (
      SELECT v.vec_id, c.cell, list_dot_product(v.e, c.cvec) AS sim
      FROM v CROSS JOIN cents c
    ), c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims
      ) WHERE rn = 1
    ), q_probe AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims WHERE vec_id < 20
      ) WHERE rn <= {nprobe}
    ), codes AS (
      SELECT vec_id, s, j AS code FROM (
        SELECT v.vec_id, cb.s, cb.j,
               row_number() OVER (PARTITION BY v.vec_id, cb.s ORDER BY
                 floor((cb.c2 - 2 * list_dot_product(
                   v.e[cb.s*{sub}+1 : (cb.s+1)*{sub}], cb.cvec)) * {S} + 0.5),
                 cb.j) AS rn
        FROM v CROSS JOIN cb
      ) WHERE rn = 1
    ), recon AS (
      SELECT c.vec_id, SUM(cb.c2i) AS recon
      FROM codes c JOIN cb ON cb.s = c.s AND cb.j = c.code
      GROUP BY c.vec_id
    ), lut AS (
      SELECT q.vec_id AS qid, cb.s, cb.j,
             CAST(floor(list_dot_product(
               q.e[cb.s*{sub}+1 : (cb.s+1)*{sub}], cb.cvec) * {S} + 0.5) AS BIGINT) AS t
      FROM v q CROSS JOIN cb WHERE q.vec_id < 20
    ), cand AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid
      FROM q_probe q JOIN c_assign c ON q.cell = c.cell
                                    AND q.vec_id <> c.vec_id
    ), scored AS (
      SELECT cand.qid, cand.nid, SUM(l.t) AS adc
      FROM cand JOIN codes co ON co.vec_id = cand.nid
                JOIN lut l ON l.qid = cand.qid AND l.s = co.s
                         AND l.j = co.code
      GROUP BY 1, 2
    ), qn AS (
      SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v WHERE vec_id < 20
    ), ranked AS (
      SELECT s.qid, s.nid, s.adc, r.recon,
             row_number() OVER (PARTITION BY s.qid ORDER BY
               (s.adc / {S}.0) / sqrt(r.recon / {S}.0) DESC, s.nid) AS rank
      FROM scored s JOIN recon r ON r.vec_id = s.nid
    )
    SELECT qid AS query_id, nid AS neighbor_id,
           ROUND((adc / {S}.0) / (qn.nrm * sqrt(recon / {S}.0)), 6) AS approx_cosine,
           CAST(rank AS INTEGER) AS rank
    FROM ranked JOIN qn ON qn.vec_id = ranked.qid
    WHERE rank <= 5
    """



def _d16_oracle(dim: int = 64, n_planes: int = 4, threshold: float = 0.25) -> str:
    """SQL replay of semantic contamination (d16): the d12 hyperplane
    cell CTEs, a cross-corpus (train × benchmark) cell equi-join with
    the 6dp cosine gate, and the count/best-match/max aggregation."""
    planes = similarity._hyperplanes(dim, n_planes)
    values = ",\n      ".join(
        f"({p}, {_sql_double_array(row)})" for p, row in enumerate(planes)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), planes(p, plane) AS (VALUES
      {values}
    ), b AS (
      SELECT v.vec_id, v.e,
             SUM(CASE WHEN list_dot_product(v.e, p.plane) >= 0
                      THEN (1::BIGINT << p.p) ELSE 0 END) AS cell
      FROM v CROSS JOIN planes p GROUP BY v.vec_id, v.e
    ), n AS (
      SELECT vec_id, e, cell, sqrt(list_dot_product(e, e)) AS nrm FROM b
    ), hits AS (
      SELECT t.vec_id AS tid, bm.vec_id AS bid,
             ROUND(list_dot_product(t.e, bm.e) / (t.nrm * bm.nrm), 6) AS cos
      FROM n t JOIN n bm ON t.cell = bm.cell
      WHERE t.vec_id % 10 <> 0 AND bm.vec_id % 10 = 0
        AND ROUND(list_dot_product(t.e, bm.e) / (t.nrm * bm.nrm), 6)
            >= {threshold}
    ), agg AS (
      SELECT tid, COUNT(*) AS n_contacts, MAX(cos) AS max_cosine
      FROM hits GROUP BY tid
    ), best AS (
      SELECT tid, bid FROM (
        SELECT tid, bid,
               row_number() OVER (PARTITION BY tid
                                  ORDER BY cos DESC, bid) AS rn
        FROM hits
      ) WHERE rn = 1
    )
    SELECT a.tid AS vec_id, CAST(a.n_contacts AS INT) AS n_contacts,
           b2.bid AS best_match, a.max_cosine
    FROM agg a JOIN best b2 USING (tid)
    """



def _q111_oracle(bits: int = 16) -> str:
    """SQL replay of the Morton interleave (q111): quantize both keys
    onto the same grid with the same IEEE ops (exact-integer bounds →
    identical scale double in any engine), interleave with explicit
    shift/and/or terms, bucket by the key's top byte."""
    grid = (1 << bits) - 1
    terms = " + ".join(
        f"(((qp >> {b}) & 1) << {b * 2}) + (((qs >> {b}) & 1) << {b * 2 + 1})"
        for b in range(bits)
    )
    return f"""
    WITH b AS (
      SELECT MIN(l_partkey) AS plo, MAX(l_partkey) AS phi,
             MIN(l_suppkey) AS slo, MAX(l_suppkey) AS shi
      FROM lineitem
    ), q AS (
      SELECT l_partkey, l_suppkey,
             GREATEST(0, LEAST({grid}, CAST(floor(
               (CAST(l_partkey AS DOUBLE) - plo)
               * ({grid} / CAST(phi - plo AS DOUBLE))) AS BIGINT))) AS qp,
             GREATEST(0, LEAST({grid}, CAST(floor(
               (CAST(l_suppkey AS DOUBLE) - slo)
               * ({grid} / CAST(shi - slo AS DOUBLE))) AS BIGINT))) AS qs
      FROM lineitem, b
    ), k AS (
      SELECT l_partkey, l_suppkey, {terms} AS zkey FROM q
    )
    SELECT CAST(zkey >> {2 * bits - 8} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
           MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp,
           MIN(zkey) AS min_zkey, MAX(zkey) AS max_zkey
    FROM k GROUP BY 1
    """


def _s09_oracle(
    dim: int = 64,
    n_planes: int = 4,
    threshold: float = 0.25,
    n_cells: int = 16,
    per_cell: int = 5,
) -> str:
    planes = similarity._hyperplanes(dim, n_planes)
    plane_values = ",\n      ".join(
        f"({p}, {_sql_double_array(row)})" for p, row in enumerate(planes)
    )
    cents = similarity.lcg_centroids(dim, n_cells)
    cent_values = ",\n      ".join(
        f"({ci}, {_sql_double_array(row)})" for ci, row in enumerate(cents)
    )
    return f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), planes(p, plane) AS (VALUES
      {plane_values}
    ), b AS (
      SELECT v.vec_id, v.e,
             SUM(CASE WHEN list_dot_product(v.e, p.plane) >= 0
                      THEN (1::BIGINT << p.p) ELSE 0 END) AS cell0
      FROM v CROSS JOIN planes p GROUP BY v.vec_id, v.e
    ), nn AS (
      SELECT vec_id, e, cell0, sqrt(list_dot_product(e, e)) AS nrm FROM b
    ), pairs AS (
      SELECT a.vec_id AS id1, c.vec_id AS id2
      FROM nn a JOIN nn c ON a.cell0 = c.cell0 AND a.vec_id < c.vec_id
      WHERE ROUND(list_dot_product(a.e, c.e) / (a.nrm * c.nrm), 6)
            >= {threshold}
    ), edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a
    ), labels AS (
      SELECT v.vec_id,
             LEAST(v.vec_id, COALESCE(MIN(r.dst), v.vec_id)) AS cluster_id
      FROM v LEFT JOIN reach r ON r.src = v.vec_id
      GROUP BY v.vec_id
    ), reps AS (
      SELECT vec_id FROM labels WHERE vec_id = cluster_id
    ), rv AS (
      SELECT v.vec_id, v.e FROM v JOIN reps USING (vec_id)
    ), cents(cell, cvec) AS (VALUES
      {cent_values}
    ), sims AS (
      SELECT rv.vec_id, c.cell, list_dot_product(rv.e, c.cvec) AS sim
      FROM rv CROSS JOIN cents c
    ), c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cell) AS rn
        FROM sims
      ) WHERE rn = 1
    ), picked AS (
      SELECT cell, vec_id,
             row_number() OVER (PARTITION BY cell
                                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS pick_rank
      FROM c_assign
    )
    SELECT CAST(cell AS INTEGER) AS cell, vec_id,
           CAST(pick_rank AS INTEGER) AS pick_rank,
           CASE WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) <= 'b'
                THEN 'train'
                WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) <= 'd'
                THEN 'val' ELSE 'test' END AS split
    FROM picked WHERE pick_rank <= {per_cell}
    """


# ---------------------------------------------------------------------------


def run(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return SUITE[name](spark, sf_dir)


# Names star-exported to the family modules (underscore helpers
# included on purpose: the families were written against the flat
# pre-split namespace).
__all__ = [
    'os',
    'uuid',
    'Callable',
    'DataFrame',
    'SparkSession',
    'Window',
    'F',
    'dedup',
    'optree',
    'similarity',
    'text',
    'coerce',
    'rewrite_legacy_query',
    'QueryFn',
    'SUITE',
    'ORACLES',
    'query',
    '_t',
    '_docs_stream',
    '_money_sum',
    '_T01_ORACLE',
    '_T02_ORACLE',
    '_JACCARD_ORACLE_TMPL',
    '_DUP_GRAPH_CTE',
    '_D07_ORACLE',
    '_sql_double_array',
    '_ANN_TOPK_TAIL',
    '_s02b_oracle',
    '_s03b_oracle',
    '_s26_oracle',
    '_st41_oracle',
    '_d12_oracle',
    '_s06b_oracle',
    '_CENTS',
    '_cents',
    '_s07_oracle',
    '_hex_digits_to_int_sql',
    '_Q101_CHAIN',
    '_Q101_ORACLE',
    '_run_recursive_chain',
    '_Q107_SQL',
    '_Q108_SQL',
    '_Q110_SQL',
    '_s09_oracle',
    '_s11b_oracle',
    '_d16_oracle',
    '_q111_oracle',
    'run',
]
