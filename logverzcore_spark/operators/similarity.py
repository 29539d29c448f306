"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      exact brute-force top-k for a query set — the
                       correctness baseline. Query side is broadcast, so
                       the big corpus never shuffles.
- ``lsh_topk``         random-hyperplane LSH bucketing: corpus and queries
                       hash to sign-bit buckets; only same-bucket (or
                       probed-neighbor-bucket) pairs are scored. The
                       100 TB scale path: the join shuffles on the bucket
                       key instead of exploding n×m.
- ``ivf_topk``         IVF-style coarse quantization: k-means-ish centroid
                       assignment (centroids sampled deterministically),
                       candidates scored only within the nearest nprobe
                       cells.

Dot products run as JVM array expressions (zip_with + aggregate) —
vectorized enough at 64-dim; swap to a Pandas UDF for very wide vectors.
"""

from __future__ import annotations

from logverzcore_spark.exprcache import registered_expr_cache

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# -- single-parse expression builders (r13) ---------------------------------
#
# Same driver-side economy as operators/dedup.py's builder section: the
# hot scoring expressions are rendered as SQL and parsed by the JVM in
# one ``F.expr`` call, memoized per parameter tuple, instead of paying
# one py4j round trip per Catalyst node (the 4-slice MaxSim tree alone
# was ~1 s of driver wall per construction — half of s25's end-to-end
# time). Values are bit-identical to the Column forms above: same ops,
# same association order (float addition is NOT associative — the SQL
# strings replicate the fold/nesting order exactly), 0.0D literals where
# the Column form used F.lit(0.0) (bare 0.0 parses as DECIMAL in SQL).


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        f"(acc, x) -> acc + x)"
    )


def _l2_norm_sql(a: str) -> str:
    return f"sqrt(aggregate({a}, 0.0D, (acc, x) -> acc + x * x))"


@registered_expr_cache()
def _cosine_expr(a_attr: str, b_attr: str) -> Column:
    """cosine(a, b) over two ATTRIBUTE array<double> columns."""
    a, b = f"`{a_attr}`", f"`{b_attr}`"
    return F.expr(f"{_dot_sql(a, b)} / ({_l2_norm_sql(a)} * {_l2_norm_sql(b)})")


@registered_expr_cache()
def _slice_norm_attr(attr: str, s: int, width: int) -> Column:
    """sqrt(Σx²) over slice ``s`` of an attribute vector — the exact
    ``nrm`` term ``_maxsim_score_expr`` embeds (same CAST, same slice
    bounds, same fold), exposed so slice norms can be staged once per
    ROW instead of once per PAIR (see _maxsim_score_prenormed_expr)."""
    return F.expr(
        f"sqrt(aggregate(slice(CAST(`{attr}` AS array<double>), "
        f"{s * width + 1}, {width}), 0.0D, (acc, x) -> acc + x * x))"
    )


@registered_expr_cache()
def _maxsim_score_prenormed_expr(
    q_attr: str, n_attr: str, qn_prefix: str, nn_prefix: str,
    n_slices: int, width: int,
) -> Column:
    """``_maxsim_score_expr`` with PRE-STAGED slice norms (r14): the
    guard/divisor terms read attribute columns ``{qn_prefix}{s}`` /
    ``{nn_prefix}{c}`` (each a ``_slice_norm_attr`` value computed once
    per row) instead of re-folding every slice norm per PAIR — the
    n_slices² cells previously re-computed 2·n_slices² norm folds per
    pair where 2·n_slices per row suffice. Identical guard structure,
    greatest-nesting, and sum association order — scores bit-identical."""

    def slc(col: str, s: int) -> str:
        return f"slice(CAST(`{col}` AS array<double>), {s * width + 1}, {width})"

    total = "0.0D"
    for s in range(n_slices):
        best = None
        for c in range(n_slices):
            d = _dot_sql(slc(q_attr, s), slc(n_attr, c))
            prod = f"(`{qn_prefix}{s}` * `{nn_prefix}{c}`)"
            cos = (
                f"CASE WHEN {prod} > 0 "
                f"THEN {d} / {prod} "
                f"ELSE 0.0D END"
            )
            best = cos if best is None else f"greatest({best}, {cos})"
        total = f"({total}) + ({best})"
    return F.expr(total)


@registered_expr_cache()
def _l2_norm_attr(attr: str) -> Column:
    """sqrt(Σx²) over one ATTRIBUTE array<double> column — the same
    fold ``_l2_norm_sql`` embeds, exposed so norms can be staged ONCE
    per row before a pair join (see ``_cosine_prenormed_expr``)."""
    return F.expr(_l2_norm_sql(f"`{attr}`"))


@registered_expr_cache()
def _cosine_prenormed_expr(
    a_attr: str, b_attr: str, an_attr: str, bn_attr: str
) -> Column:
    """cosine with PRE-STAGED norms: dot(a, b) / (an * bn), where
    an/bn are attribute columns carrying ``_l2_norm_attr`` values
    computed once per input ROW (r14, guide §2.3 "shuffle fewer
    bytes"/§1.2 per-task work). In a pair join that replaces the
    per-PAIR norm folds of ``_cosine_expr`` — 2 of its 3 array
    traversals — with two column reads; values are bit-identical
    because each norm is the same sqrt-of-fold over the same array,
    and the division/multiplication order is unchanged."""
    a, b = f"`{a_attr}`", f"`{b_attr}`"
    return F.expr(f"{_dot_sql(a, b)} / (`{an_attr}` * `{bn_attr}`)")


@registered_expr_cache()
def _maxsim_score_expr(
    q_attr: str, n_attr: str, n_slices: int, width: int
) -> Column:
    """``maxsim_topk``'s Σ-of-max-slice-cosines score as one parsed
    expression. Replicates the Column form exactly: per-slice
    zero-norm guard (degenerate slice scores 0, never NULL), pairwise
    left-nested greatest over document slices, left-associated sum
    starting at 0.0D."""
    def slc(col: str, s: int) -> str:
        return f"slice(CAST(`{col}` AS array<double>), {s * width + 1}, {width})"

    def nrm(col: str, s: int) -> str:
        return f"sqrt(aggregate({slc(col, s)}, 0.0D, (acc, x) -> acc + x * x))"

    total = "0.0D"
    for s in range(n_slices):
        best = None
        for c in range(n_slices):
            d = _dot_sql(slc(q_attr, s), slc(n_attr, c))
            cos = (
                f"CASE WHEN ({nrm(q_attr, s)} * {nrm(n_attr, c)}) > 0 "
                f"THEN {d} / ({nrm(q_attr, s)} * {nrm(n_attr, c)}) "
                f"ELSE 0.0D END"
            )
            best = cos if best is None else f"greatest({best}, {cos})"
        total = f"({total}) + ({best})"
    return F.expr(total)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    The query set is broadcast (it is small by construction); the corpus
    streams through one narrow stage — no corpus shuffle, top-k via a
    window over (query, score). Scoring stays JVM-side (codegen'd HOF
    fold) — measured faster than the Arrow/numpy variant below until the
    query block is wide enough to amortize the Python round-trip (32
    worker spin-ups + Arrow serialization of batch×nq scores cost more
    than the interpreted fold at nq≲10³·64-dim; use ``cosine_topk_blas``
    past that). Output: (query_id, neighbor_id, cosine, rank),
    self-matches excluded, ties broken by neighbor id.
    """
    from logverzcore_spark.operators.util import fan_out

    # Norms staged ONCE per row on both sides of the pair join (r14):
    # the scoring expression then traverses only the zip for the dot —
    # the corpus-side norm was previously re-folded once per QUERY and
    # the query norm once per corpus row (3 64-element folds per pair
    # → 1). Values bit-identical (same fold, same op order — see
    # _cosine_prenormed_expr).
    c = fan_out(corpus).select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    ).withColumn("_nn", _l2_norm_attr("nvec"))
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("_qn", _l2_norm_attr("qvec"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            _cosine_prenormed_expr("qvec", "nvec", "_qn", "_nn").alias("cos"),
        )
    )
    return _rank_topk(scored, k)


def cosine_topk_blas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact top-k via one numpy matmul per Arrow corpus batch.

    The query block is collected driver-side (``max_queries`` guards the
    small-by-contract assumption; past that, use lsh_topk/ivf_topk) and
    closed over by a pandas UDF, so every corpus batch scores against ALL
    queries in one BLAS call — batch×dim×nq — instead of ~dim interpreted
    ops per PAIR. Worth it for wide query blocks or high dims where the
    per-pair constant dominates; for small nq the Python worker spin-up
    and Arrow transfer make the JVM ``cosine_topk`` faster (measured ~5×
    at nq=20, dim=64). Same output contract and expression order (dot
    over norms) as ``cosine_topk``, so results are hash-identical.
    """
    from pyspark.sql.functions import pandas_udf

    from logverzcore_spark.operators.util import fan_out

    qrows = (
        queries.select(F.col(id_col), _as_double(F.col(vec_col)))
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"cosine_topk_blas is the exact/verification tier — {max_queries}+ "
            "queries should go through lsh_topk/ivf_topk"
        )
    qids = [int(r[0]) for r in qrows]
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)  # (nq, dim)
    qnorm = np.sqrt((Q * Q).sum(axis=1))  # (nq,)

    @pandas_udf("array<double>")
    def all_cosines(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        xnorm = np.sqrt((X * X).sum(axis=1, keepdims=True))  # (batch, 1)
        cos = (X @ Q.T) / (xnorm * qnorm[None, :])
        return pd.Series(list(cos))

    qid_lookup = F.array(*[F.lit(q) for q in qids])
    scored = (
        fan_out(corpus)
        .select(
            F.col(id_col).alias("nid"),
            F.posexplode(all_cosines(_as_double(F.col(vec_col)))).alias("qidx", "cos"),
        )
        .select(
            F.element_at(qid_lookup, F.col("qidx") + 1).alias("qid"), "nid", "cos"
        )
        .where(F.col("qid") != F.col("nid"))
    )
    return _rank_topk(scored, k)


#: Dispatch boundary for exact cosine scoring, in nq×dim "cells" of the
#: query block. Below it the codegen'd JVM fold wins (measured ~5× at
#: nq=20, dim=64 — Python worker spin-up + Arrow transfer dominate);
#: above it one BLAS matmul per Arrow batch amortizes the round-trip
#: (the docstrings' measured ~10³-query crossover at dim 64 → 64k cells).
COSINE_BLAS_CROSSOVER_CELLS = 64_000


def cosine_topk_auto(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_queries: int = 10_000,
    crossover_cells: int = COSINE_BLAS_CROSSOVER_CELLS,
) -> DataFrame:
    """One exact-cosine entry point that picks the execution tier by the
    query block's size — the ``sql_arrow`` auto-path pattern applied to
    scoring: nq×dim below ``crossover_cells`` routes to the JVM
    codegen'd fold (``cosine_topk``), at-or-above routes to the
    Arrow/numpy matmul (``cosine_topk_blas``). The two tiers share the
    same expression order (dot over norms), so results are
    hash-identical either way — dispatch changes wall-time only.

    Sizing costs one bounded count + one row peek on the SMALL side
    (queries are small by the exact tier's contract; ``max_queries``
    still guards it — past that, use lsh_topk/ivf_topk/ivf_index_probe).
    """
    # ONE sizing job for both inputs (r13 — it was two: a bounded count
    # and a separate first-row peek, each its own scan job; merged they
    # measured 0.25 s vs 0.41 s at sf0.1): count the bounded query set
    # and peek the first NON-NULL vector in the same aggregation (a
    # nullable vec_col's first row may be NULL — len(None) would throw
    # here instead of letting the chosen tier surface the data problem);
    # no non-null vector at all → dim 0 → JVM tier, which returns
    # empty/raises with its own semantics.
    row = (
        queries.select(_as_double(F.col(vec_col)).alias("v"))
        .limit(max_queries + 1)
        .agg(
            F.count(F.lit(1)).alias("nq"),
            F.first("v", ignorenulls=True).alias("v0"),
        )
        .first()
    )
    nq = row["nq"]
    if nq > max_queries:
        raise ValueError(
            f"cosine_topk_auto is the exact/verification tier — {max_queries}+ "
            "queries should go through lsh_topk/ivf_topk"
        )
    dim = len(row["v0"]) if row["v0"] is not None else 0
    if nq * dim >= crossover_cells:
        return cosine_topk_blas(
            corpus, queries, k, vec_col=vec_col, id_col=id_col,
            max_queries=max_queries,
        )
    return cosine_topk(corpus, queries, k, vec_col=vec_col, id_col=id_col)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared (qid, nid, cos) → per-query top-k ranking."""
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.round("cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no runtime RNG so
    plans are reproducible across runs and engines)."""
    state = 0x9E3779B97F4A7C15
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes (as a long)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(vec, p) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket in
    at least one of ``n_tables`` hash tables.

    One table of b sign-bits finds a cos-θ neighbor with probability
    (1-θ/π)^b — too low for top-k recall. L independent tables lift it to
    1-(1-p^b)^L (b=4, L=12 holds ~0.8 even for moderate-similarity top-k neighbors). At scale the corpus is
    hash-partitioned by (table, bucket) once and reused across query
    batches; each query probes L buckets instead of scanning the corpus."""
    from pyspark.sql.functions import pandas_udf

    # Probing the corpus for the dimension would cost a whole Spark job
    # before planning even starts — refuse instead; the embedding width
    # is static pipeline knowledge every caller has.
    if dim is None:
        raise ValueError(
            "lsh_topk requires dim= (embedding width); inferring it would "
            "run a corpus job (.first()) before the query plan is built"
        )
    all_planes = _hyperplanes(dim, n_planes * n_tables)
    # All L·b plane dots per row as ONE numpy matmul: HOF dot-product
    # lambdas are interpreted (48 × dim ops/row); the Arrow-batched UDF
    # does batch_size × dim × 48 in a single BLAS call.
    planes_mat = np.array(all_planes, dtype=np.float64)  # (L*b, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))  # bit weights per table

    @pandas_udf("array<long>")
    def bucket_vec(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (x @ planes_mat.T >= 0).reshape(len(x), n_tables, n_planes)
        buckets = (bits * weights).sum(axis=2)  # (batch, L)
        return pd.Series(list(buckets))

    def bucketed(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        return df.select(
            idc, F.posexplode(bucket_vec(F.col(vecc))).alias("t", "b")
        )

    from logverzcore_spark.operators.util import fan_out

    c = bucketed(
        fan_out(corpus).select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")),
        "nid", "nvec",
    )
    q = bucketed(
        queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")),
        "qid", "qvec",
    )
    # Dedup candidate pairs on the two ids ONLY (a pair may collide in
    # several tables); vectors join back onto the small deduped pair set.
    cand = (
        c.join(
            F.broadcast(q),
            (c["t"] == q["t"]) & (c["b"] == q["b"]) & (F.col("qid") != F.col("nid")),
        )
        .select("qid", "nid")
        .distinct()
    )
    # Norms staged once per vector row (r14, same move as cosine_topk):
    # a doc in several candidate pairs re-folded its norm per PAIR.
    nvecs = corpus.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    ).withColumn("_nn", _l2_norm_attr("nvec"))
    qvecs = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("_qn", _l2_norm_attr("qvec"))
    scored = (
        cand.join(nvecs, "nid")
        .join(F.broadcast(qvecs), "qid")
        .select(
            "qid", "nid",
            _cosine_prenormed_expr("qvec", "nvec", "_qn", "_nn").alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.round("cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def quantize_embedding_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Int8 scalar quantization audit for an embedding column: per-vector
    symmetric scale (127/max|x|), half-up-rounded clamp to [-127, 127],
    reconstruction RMSE, and the exact integer L1 checksum of the
    quantized vector. The checksum makes the quantized payload itself
    hash-verifiable across engines (floor arithmetic, no banker's
    rounding). Pure per-row projection — at 100 TB this is the cheap
    preprocessing pass before shipping int8 vectors to an ANN index;
    4× smaller vectors also quarter the shuffle volume of every
    downstream bucket join."""
    e = _as_double(F.col(vec_col))
    absmax = F.array_max(F.transform(e, lambda x: F.abs(x)))
    scale = F.lit(127.0) / F.greatest(absmax, F.lit(1e-12))

    def quant(x: Column) -> Column:
        return F.least(F.greatest(F.floor(x * scale + 0.5), F.lit(-127.0)), F.lit(127.0))

    sq_err = F.aggregate(
        e, F.lit(0.0), lambda acc, x: acc + F.pow(x - quant(x) / scale, F.lit(2.0))
    )
    l1 = F.aggregate(e, F.lit(0.0), lambda acc, x: acc + F.abs(quant(x)))
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.round(scale, 6).alias("scale"),
        F.round(F.sqrt(sq_err), 6).alias("recon_rmse"),
        l1.cast("bigint").alias("q_l1_checksum"),
        F.size(e).alias("n_dims"),
    )


def cluster_balanced_sample(
    df: DataFrame,
    per_cell: int = 5,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Cluster-balanced subset selection — the curation counterpart of
    semantic dedup: assign every vector to its nearest centroid, then
    keep ``per_cell`` rows PER CLUSTER, picked by a deterministic content
    hash (md5 of the id). The result preserves embedding-space diversity
    where a global random sample oversamples dense modes, and its
    composition is bit-stable across engines, runs, and cluster sizes
    (``sample()`` is none of those). Pass ``centroids``
    (``lcg_centroids``) for an engine-portable assignment a SQL oracle
    can replay literally.

    Plan: one Arrow-batched matmul projection for assignment (no
    shuffle), then a single shuffle on ``cell`` for the per-cluster
    top-``per_cell`` window — at 100 TB the window input is (cell, id,
    hash), never the vectors themselves."""
    if centroids is None:
        dim = len(df.select(vec_col).first()[0])
        centroids = lcg_centroids(dim, n_cells)
    cmat = np.array(centroids, dtype=np.float64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def nearest_cell(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cmat.T
        # stable argsort → exact ties resolve to the lower cell index,
        # matching a SQL replay's ORDER BY sim DESC, cell.
        return pd.Series(np.argsort(-sims, axis=1, kind="stable")[:, 0].astype("int32"))

    assigned = df.select(
        F.col(id_col), nearest_cell(_as_double(F.col(vec_col))).alias("cell")
    )
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        assigned.withColumn("pick_rank", F.row_number().over(w))
        .where(F.col("pick_rank") <= per_cell)
        .select("cell", F.col(id_col), F.col("pick_rank").cast("int").alias("pick_rank"))
    )


def lcg_centroids(dim: int, n_cells: int) -> list[list[float]]:
    """Deterministic unit-norm centroids from the LCG stream — the
    engine-portable alternative to data-sampled centroids: any engine
    (e.g. a SQL oracle) can hold the same literal values, so cell
    assignment replays exactly. Centroid quality is lower than k-means
    (cells are random directions, not density-fitted), which costs some
    recall at equal nprobe — the price of verifiability."""
    raw = np.array(_hyperplanes(dim, n_cells), dtype=np.float64)
    raw /= np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12)
    return [[float(x) for x in row] for row in raw]


def _default_centroids(c: DataFrame, n_cells: int) -> np.ndarray:
    """Deterministic centroids SHARED by ``ivf_topk`` and
    ``ivf_index_build`` (one implementation, so an index built today
    assigns exactly like an ad-hoc query tomorrow): stride-sample the
    corpus (spread across the id range, not the first rows), then a few
    local k-means iterations over a bounded driver-side sample — numpy
    work on ≤4096 vectors, so the corpus itself never leaves the
    executors. NOTE: ``cents_mat`` is a VIEW of the normalized sample,
    so in-loop centroid updates also update those sample rows — part of
    the deterministic numerics existing indexes/tests depend on; do not
    'fix' the aliasing without re-verifying s03/s08."""
    sample = [
        [float(x) for x in r["nvec"]]
        for r in c.orderBy(F.pmod(F.xxhash64("nid"), F.lit(9973)), "nid")
        .limit(min(4096, 64 * n_cells))
        .collect()
    ]
    X = np.array(sample, dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    cents_mat = Xn[:: max(1, len(Xn) // n_cells)][:n_cells]
    for _ in range(5):
        assign = (Xn @ cents_mat.T).argmax(axis=1)
        for ci in range(len(cents_mat)):
            members = Xn[assign == ci]
            if len(members):
                m = members.mean(axis=0)
                cents_mat[ci] = m / max(np.linalg.norm(m), 1e-12)
    cmat = cents_mat
    cmat /= np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
    return cmat


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: assign corpus rows to the nearest of ``n_cells``
    centroids (sampled deterministically from the corpus), then score each
    query only against its ``nprobe`` nearest cells. Pass ``centroids``
    (pre-normalized, e.g. ``lcg_centroids``) to skip the sampling/k-means
    step entirely — fully engine-portable cell assignment."""
    c = corpus.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec"))
    if centroids is not None:
        cmat = np.array(centroids, dtype=np.float64)  # caller pre-normalized
    else:
        cmat = _default_centroids(c, n_cells)

    from pyspark.sql.functions import pandas_udf

    # Cell assignment as one numpy matmul per Arrow batch (argmax over
    # X @ C.T) — same interpreted-HOF avoidance as lsh_topk's bucketing.

    def _nearest(n: int):
        @pandas_udf("array<int>")
        def cells(vecs: pd.Series) -> pd.Series:
            x = np.array(vecs.tolist(), dtype=np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            sims = x @ cmat.T
            # stable sort: exact sim ties resolve to the LOWER cell index,
            # the same tie-break a SQL replay (ORDER BY sim DESC, cell)
            # applies — keeps portable-oracle variants exactly replayable.
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n].astype("int32")
            return pd.Series(list(top))

        return cells

    c_assigned = c.withColumn(
        "cell", F.element_at(_nearest(1)(F.col("nvec")), 1)
    ).withColumn("_nn", _l2_norm_attr("nvec"))
    q = queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec"))
    # _qn staged BEFORE the nprobe explode (once per query, not per probe).
    q_assigned = q.withColumn("_qn", _l2_norm_attr("qvec")).withColumn(
        "cell", F.explode(_nearest(nprobe)(F.col("qvec")))
    )
    scored = (
        c_assigned.join(F.broadcast(q_assigned), (c_assigned.cell == q_assigned.cell) & (F.col("qid") != F.col("nid")))
        .select(
            "qid", "nid",
            _cosine_prenormed_expr("qvec", "nvec", "_qn", "_nn").alias("cos"),
        )
        .groupBy("qid", "nid")
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.round("cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (public method — Jégou et al., "Product Quantization
# for Nearest Neighbor Search", IEEE TPAMI 2011)
# ---------------------------------------------------------------------------


def lcg_codebooks(dim: int, m: int, n_codes: int) -> list[list[list[float]]]:
    """``m`` sub-codebooks of ``n_codes`` codewords over ``dim // m``-wide
    subspaces, drawn from the LCG stream — deterministic and
    engine-portable (a SQL oracle can hold the same literals), the PQ
    analog of ``lcg_centroids``. Random codebooks quantize worse than
    k-means-trained ones (pass trained ones to ``pq_topk`` for recall);
    their value is exact cross-engine replayability."""
    sub = dim // m
    flat = _hyperplanes(sub, m * n_codes)
    return [[flat[s * n_codes + j] for j in range(n_codes)] for s in range(m)]


def trained_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks from a bounded, deterministic
    corpus sample (same stride-sample + local-iterations shape as
    ``ivf_topk``'s centroid path: numpy on ≤4096 driver-side rows, the
    corpus itself never leaves the executors)."""
    sub = dim // m
    c = corpus.select(F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec"))
    sample = [
        [float(x) for x in r["nvec"]]
        for r in c.orderBy(F.pmod(F.xxhash64("nid"), F.lit(9973)), "nid")
        .limit(min(4096, 64 * n_codes))
        .collect()
    ]
    X = np.array(sample, dtype=np.float64)
    books: list[list[list[float]]] = []
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        cents = Xs[:: max(1, len(Xs) // n_codes)][:n_codes].copy()
        for _ in range(5):
            d = ((Xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for ci in range(len(cents)):
                members = Xs[assign == ci]
                if len(members):
                    cents[ci] = members.mean(axis=0)
        books.append([[float(x) for x in row] for row in cents])
    return books


#: Fixed-point grid for PQ distances / lookup tables: coarse enough that
#: a ~1e-13 cross-engine float discrepancy (BLAS matmul vs sequential SQL
#: fold) cannot move a value across a rounding boundary (P ≈ 1e-9 per
#: value), fine enough (1e-4) to rank subspace distances of O(1)-O(10).
#: Genuinely equal quantized values tie and break on the code index —
#: identical in both engines. floor(x*S + 0.5) is half-up in both numpy
#: and SQL (the suite's money-cents pattern).
PQ_SCALE = 10_000


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: list[list[list[float]]] | None = None,
    rerank: int = 0,
) -> DataFrame:
    """PQ-compressed ANN top-k with asymmetric distance computation.

    Encode once: each corpus vector becomes ``m`` 4-bit codes (argmin
    codeword per subspace) — 64 float32 components collapse to m·log2(n_codes)
    bits, the memory lever that keeps a 100 TB embedding corpus scannable.
    Score per query: a lookup table of query-subvector × codeword dots
    (m·n_codes floats per query) replaces every full dot product; the
    corpus pass is ONE narrow Arrow-batched map (table lookups + integer
    sums — no shuffle), followed by the top-k rank shuffle on query id.

    Distances and LUT entries live on a fixed-point grid (``PQ_SCALE``)
    so encode and scoring are bit-reproducible across engines and
    summation orders — suite s06b replays this operator in SQL.

    The query side is collected driver-side to build LUTs (bounded by the
    query count — the small side by definition, same bound as the
    centroid sample). Returns (query_id, neighbor_id, approx_cosine,
    rank); approx_cosine is the ADC estimate cos(q, reconstruct(x)), not
    the exact cosine.

    ``rerank > 0`` adds the standard ADC-shortlist + exact-rescore
    stage (the re-ranking refinement of Jégou et al. §V: PQ codes
    select candidates, true distances order them): the top-``rerank``
    ADC candidates per query are re-scored with the EXACT cosine
    against the raw vectors — a candidate-scoped broadcast semi-join +
    one Arrow matmul over ≤ nq·rerank vectors, never the corpus — and
    the returned frame carries (query_id, neighbor_id, cosine, rank)
    with TRUE cosines. At 4-byte-per-vector compression ADC ordering
    alone degrades as the corpus grows (r5 measured recall@5 0.55 →
    0.25 from sf0.01 → sf0.1); rerank=64 restores it while preserving
    the memory story (raw vectors are fetched for ~64 ids per query,
    not scanned). The s06b portable sibling keeps rerank=0 — its SQL
    oracle replays the pure integer ADC ranking.
    """
    from pyspark.sql.functions import pandas_udf

    if dim is None:
        raise ValueError("pq_topk requires dim= (embedding width)")
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    if codebooks is None:
        codebooks = lcg_codebooks(dim, m, n_codes)
    C = np.array(codebooks, dtype=np.float64)  # (m, n_codes, sub)
    c2 = (C * C).sum(axis=2)  # (m, n_codes) codeword squared norms
    c2_int = np.floor(c2 * PQ_SCALE + 0.5).astype(np.int64)

    qrows = (
        queries.select(F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec"))
        .orderBy("qid")
        .collect()
    )
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)  # (nq, dim)
    qnorm = np.sqrt((Q * Q).sum(axis=1))  # (nq,)
    # LUT[i, s, j] = <query_i restricted to subspace s, codeword j>,
    # fixed-point. ADC dot = sum_s LUT[i, s, code_s] — integer-exact.
    lut = np.stack(
        [Q[:, s * sub : (s + 1) * sub] @ C[s].T for s in range(m)], axis=1
    )  # (nq, m, n_codes)
    lut_int = np.floor(lut * PQ_SCALE + 0.5).astype(np.int64)
    nq = len(qids)

    @pandas_udf("array<struct<qid:long,adc:long,recon:long>>")
    def score_vec(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        batch = len(X)
        codes = np.empty((batch, m), dtype=np.int64)
        for s in range(m):
            dist = c2[s][None, :] - 2.0 * (X[:, s * sub : (s + 1) * sub] @ C[s].T)
            dist_int = np.floor(dist * PQ_SCALE + 0.5)
            codes[:, s] = dist_int.argmin(axis=1)  # first min → lowest j
        rows = np.arange(m)
        adc = lut_int[:, rows, codes].sum(axis=2)  # (nq, batch)
        recon = c2_int[rows, codes].sum(axis=1)  # (batch,)
        out = [
            [
                {"qid": int(qids[i]), "adc": int(adc[i, b]), "recon": int(recon[b])}
                for i in range(nq)
            ]
            for b in range(batch)
        ]
        return pd.Series(out)

    from logverzcore_spark.operators.util import fan_out

    c = fan_out(corpus).select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    )
    scored = (
        c.select("nid", F.explode(score_vec(F.col("nvec"))).alias("sc"))
        .select("nid", "sc.qid", "sc.adc", "sc.recon")
        .where(F.col("qid") != F.col("nid"))
    )
    qn = F.create_map(
        *[x for i in range(nq) for x in (F.lit(int(qids[i])), F.lit(float(qnorm[i])))]
    )
    approx = (F.col("adc") / PQ_SCALE) / (
        qn[F.col("qid")] * F.sqrt(F.col("recon") / F.lit(float(PQ_SCALE)))
    )
    # Rank on adc/√recon (the query norm is constant within a partition):
    # integer inputs + correctly-rounded IEEE divide/sqrt make this key
    # bit-identical in any engine that computes the same three steps.
    rank_key = (F.col("adc") / PQ_SCALE) / F.sqrt(F.col("recon") / F.lit(float(PQ_SCALE)))
    w = Window.partitionBy("qid").orderBy(rank_key.desc(), F.col("nid"))
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                F.col("qid").alias("query_id"),
                F.col("nid").alias("neighbor_id"),
                F.round(approx, 6).alias("approx_cosine"),
                F.col("rank").cast("int").alias("rank"),
            )
        )
    # ADC shortlist → exact rescore (see docstring). The shortlist is
    # nq·rerank (qid, nid) pairs — checkpointed once, it feeds two
    # broadcast builds (the corpus prune and the pair filter) without
    # re-running the scoring pass.
    # Renamed columns (sqid/snid): ``short`` descends from ``c``, and a
    # localCheckpoint preserves attribute ids — joining back on same-id
    # columns silently resolves to a trivially-true predicate (no
    # pruning; caught via Spark's own warning in r5).
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= max(rerank, k))
        .select(F.col("qid").alias("sqid"), F.col("nid").alias("snid"))
        .localCheckpoint(eager=True)
    )

    @pandas_udf("array<struct<qid:long,cos:double>>")
    def exact_cos(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        xnorm = np.sqrt((X * X).sum(axis=1, keepdims=True))
        cos = (X @ Q.T) / (xnorm * qnorm[None, :])
        return pd.Series(
            [
                [{"qid": int(qids[i]), "cos": float(cos[b, i])} for i in range(nq)]
                for b in range(len(X))
            ]
        )

    cvec = c.join(
        F.broadcast(short), c["nid"] == F.col("snid"), "left_semi"
    )
    rescored = (
        cvec.select("nid", F.explode(exact_cos(F.col("nvec"))).alias("rc"))
        .select("nid", "rc.qid", "rc.cos")
        .join(
            F.broadcast(short),
            (F.col("qid") == F.col("sqid")) & (F.col("nid") == F.col("snid")),
        )
        .drop("sqid", "snid")
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.round("cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivf_index_build(
    corpus: DataFrame,
    index_table: str,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> None:
    """Materialize an IVF index: the build-once half of build-once /
    probe-many ANN. ``ivf_topk`` re-assigns the whole corpus per query
    batch — fine for one-off joins, wasteful for a serving corpus. This
    writes:

    - ``{index_table}`` — (id, cell, vec) PARTITIONED BY cell, so a
      probe's ``cell IN (...)`` prunes to nprobe/n_cells of the files
      before any byte is read (asserted in tests via inputFiles);
    - ``{index_table}_centroids`` — the n_cells × dim centroid matrix
      (tiny; loaded to the driver at probe time).

    Centroids default to the same deterministic stride-sample + local
    k-means path as ``ivf_topk`` (bounded driver sample); pass
    ``lcg_centroids`` for engine-portable assignments. Rebuild (or
    append a delta partition set) when drift degrades recall — the
    assignment pass is one Arrow-batched matmul over the corpus.
    """
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    )
    if centroids is not None:
        cmat = np.array(centroids, dtype=np.float64)
    else:
        cmat = _default_centroids(c, n_cells)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cmat.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, 0].astype("int32")
        return pd.Series(order)

    (
        c.withColumn("cell", nearest(F.col("nvec")))
        # Cluster by cell before the partitioned write: without this a
        # T-task corpus writes up to T files under EVERY cell directory
        # (tasks × cells tiny files — ruinous once n_cells is sized for
        # bounded-row cells at corpus scale); hash-clustered, each cell's
        # rows land in one task → one file per cell (append's pattern).
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .saveAsTable(index_table)
    )
    cent_rows = [(i, [float(x) for x in row]) for i, row in enumerate(cmat)]
    spark.createDataFrame(
        cent_rows, "cell int, centroid array<double>"
    ).write.mode("overwrite").saveAsTable(f"{index_table}_centroids")


def ivf_index_append(
    spark,
    new_vectors: DataFrame,
    index_table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dedupe: bool = True,
) -> dict:
    """Incrementally maintain a persisted IVF index: assign the NEW
    embeddings to the EXISTING centroids and append them to their cell
    partitions — the serving-corpus shape where embeddings arrive
    continuously and a full ``ivf_index_build`` per batch would re-scan
    the whole corpus.

    Cost model (the bucket-touched fold pattern of streaming/upsert.py,
    applied to cells): one Arrow-batched matmul over the BATCH for
    assignment (no shuffle), an optional anti-join against only the
    touched cells' rows (partition-pruned scan — ``cell IN (...)`` on
    the partition column), then an append write that creates files ONLY
    under the touched cell directories. Untouched cells' files are
    never read or rewritten (asserted in pytest via the on-disk file
    inventory). Per-batch cost is O(batch + touched-cell rows), not
    O(corpus).

    Because assignment uses the index's OWN stored centroids, append
    followed by probe is EXACTLY equivalent to a from-scratch rebuild
    over the union corpus with those centroids (s10 grades this against
    the same SQL oracle as the from-scratch s08). Centroids drift as the
    corpus grows — when recall degrades, ``ivf_index_recenter``
    re-fits and rebuilds once.

    ``dedupe=True`` drops batch ids already present in their target
    cells AND ids duplicated within the batch itself (a redelivered
    source can repeat a row inside one micro-batch just as easily as
    across two), making at-least-once redelivery (foreachBatch)
    idempotent per row. Returns
    {"touched_cells", "appended", "skipped_existing"}.
    """
    cent_rows = spark.table(f"{index_table}_centroids").orderBy("cell").collect()
    cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cmat.T
        return pd.Series(np.argsort(-sims, axis=1, kind="stable")[:, 0].astype("int32"))

    # Materialize the assignment once: it is consumed by the touched-cell
    # list, the dedupe anti-join, and the write (and the batch may be a
    # nondeterministic source); the checkpoint also runs the UDF once.
    assigned = (
        new_vectors.select(
            F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
        )
        .withColumn("cell", nearest(F.col("nvec")))
        .localCheckpoint(eager=True)
    )
    touched = sorted(
        r["cell"] for r in assigned.select("cell").distinct().collect()
    )
    n_batch = assigned.count()
    if dedupe:
        # In-batch duplicates would both survive the against-stored
        # anti-join (neither is stored yet) and break the per-row
        # idempotence / append-equals-rebuild claims — collapse them
        # first. Same-id rows carry the same vector, so any survivor
        # is correct.
        assigned = assigned.dropDuplicates(["nid"])
    if dedupe and touched:
        # A prior append (possibly from another fold invocation on the
        # same session) may have left a stale cached file listing; the
        # anti-join must see the CURRENT files or redelivered rows slip
        # through. Driver-side metadata refresh, not a data job.
        spark.catalog.refreshTable(index_table)
        existing = (
            spark.table(index_table)
            .where(F.col("cell").isin(touched))
            .select("nid")
        )
        assigned = assigned.join(existing, "nid", "left_anti")
    # Cluster by cell before the partitioned append (one file per touched
    # cell per batch, not tasks × cells files — see upsert.py's note).
    fresh = assigned.repartition(F.col("cell"))
    n_new = fresh.count()
    if n_new:
        fresh.select("nid", "nvec", "cell").write.mode("append").partitionBy(
            "cell"
        ).saveAsTable(index_table)
        # Refresh AFTER the write as well: under foreachBatch the write
        # runs on the cloned micro-batch session, so the OUTER session's
        # cached file listing would otherwise miss this batch — a probe
        # issued right after the stream drains would silently read a
        # pre-append snapshot (caught by st23's hash gate in r6).
        spark.catalog.refreshTable(index_table)
    return {
        "touched_cells": touched,
        "appended": n_new,
        "skipped_existing": n_batch - n_new,
    }


def ivf_index_apply_changes(
    spark,
    changes: DataFrame,
    index_table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Maintain a persisted IVF index from a snapshot table's CHANGE
    DATA FEED: the missing half of ``ivf_index_append``. Appends cover
    the arriving-corpus shape; this covers the MUTATING-corpus shape —
    a GDPR ``delete_where`` on the source embedding table, a
    ``update_where`` redaction that moves a vector to a different cell,
    a CDC merge — propagated to the serving index at touched-cell cost
    instead of a rebuild (reference parity: LogverzCore keeps derived
    query structures consistent under record deletion, db.js's
    delete-then-requery path; here the index follows the source's CDF).

    ``changes`` is a ``SnapshotTable.read_changes`` span (the table's
    columns plus ``_change_type``/``_commit_version``). The span is
    NET-RESOLVED per id before any index I/O: the latest change wins
    (update_postimage/insert ⇒ the id's final vector; delete/
    update_preimage ⇒ absent), so a span where an id is updated twice
    then deleted applies as one removal. Application is a net-state
    upsert — remove every resolved id from the index, re-add the
    present ones under their (stored-centroid) cells — which makes a
    redelivered span CONVERGE: re-applying the same changes is a no-op
    on the end state (pytest-proved), the same at-least-once contract
    as ivf_index_append's dedupe.

    Cost model (the 100 TB claim, asserted in pytest via the on-disk
    file inventory): touched cells = the cells of every vector IMAGE in
    the span — pre-images/deletes locate the rows to remove (cell
    assignment is a pure function of the vector under the index's own
    stored centroids, so the old row's cell is computed, never searched
    for), post-images/inserts locate the rows to add. Only those cell
    partitions are read (partition-pruned ``cell IN``), rewritten
    (survivors staged through an eager localCheckpoint, then landed as
    ONE dynamic partition overwrite — each kept cell's new generation
    replaces its files inside the write's own commit, so a crash at any
    point leaves every carried row either in its old file or its
    committed replacement, never dropped-but-unwritten), or — when
    deletions empty a cell — dropped afterwards (a crash before that
    drop leaves only rows the span resolved absent, which a re-apply
    removes again; kill-mid-apply pytest proves both windows).
    Untouched cells' files are never opened. Per-span cost is
    O(span + touched-cell rows), never O(index).

    Preconditions: the index must have been in sync at the span's
    ``from_version`` (its rows for the span's ids carry the vectors the
    pre-images report — true whenever the index is maintained ONLY
    through build/append/apply_changes against the same source), and
    vector images must be non-NULL (a NULL image cannot be assigned a
    cell; such source rows are not index-maintainable and raise).

    Returns {"touched_cells", "removed", "upserted",
    "dropped_cells"}.
    """
    cent_rows = spark.table(f"{index_table}_centroids").orderBy("cell").collect()
    cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cmat.T
        return pd.Series(np.argsort(-sims, axis=1, kind="stable")[:, 0].astype("int32"))

    imgs = changes.select(
        F.col(id_col).alias("nid"),
        _as_double(F.col(vec_col)).alias("nvec"),
        F.col("_change_type").alias("ct"),
        F.col("_commit_version").alias("cv"),
    )
    if imgs.where(F.col("nvec").isNull()).limit(1).count():
        raise ValueError(
            "ivf_index_apply_changes: NULL vector image in the change "
            "feed — such rows cannot be cell-assigned"
        )
    # One materialization serves the touched-cell list, the net
    # resolution, and the upsert write (the UDF runs once; the feed's
    # diff join is not re-executed per consumer).
    imgs = imgs.withColumn("cell", nearest(F.col("nvec"))).localCheckpoint(
        eager=True
    )
    touched = sorted(
        r["cell"] for r in imgs.select("cell").distinct().collect()
    )
    if not touched:
        return {"touched_cells": [], "removed": 0, "upserted": 0,
                "dropped_cells": []}

    # Net resolution: latest commit wins; within that commit the
    # present-side image wins (an update's postimage outranks its
    # preimage; a delete commit has only the absent side).
    present = F.col("ct").isin("insert", "update_postimage").cast("int")
    w = Window.partitionBy("nid").orderBy(
        F.col("cv").desc(), present.desc()
    )
    finals = (
        imgs.withColumn("present", present)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("nid", "nvec", "cell", "present")
    )

    # Survivors: touched cells' rows minus every resolved id (absent
    # ids stay out; present ids are re-added below with their final
    # vectors — the upsert). Partition-pruned read; stage BEFORE the
    # drop (a partition cannot be rebuilt from its own live files).
    spark.catalog.refreshTable(index_table)
    stored = spark.table(index_table).where(F.col("cell").isin(touched))
    out = (
        stored.join(finals.select("nid"), "nid", "left_anti")
        .select("nid", "nvec", "cell")
        .unionByName(
            finals.where(F.col("present") == 1).select("nid", "nvec", "cell")
        )
        .repartition(F.col("cell"))
        .localCheckpoint(eager=True)
    )
    n_before = stored.count()
    n_upserts = finals.where(F.col("present") == 1).count()
    n_out = out.count()
    kept_cells = {r["cell"] for r in out.select("cell").distinct().collect()}
    # CRASH-ATOMIC upsert (r13 — closes the r12 verdict's top hole):
    # the old shape dropped every touched partition, THEN appended the
    # staged survivors; a crash between the two permanently lost the
    # touched cells' carried rows (the staging was a process-local
    # localCheckpoint, and a replay's survivor source was the already-
    # emptied partitions). Now the kept cells' new generation lands as
    # ONE dynamic partition overwrite: each kept cell's
    # survivors+upserts replace that cell's files inside the write's
    # own commit, so at no point is a carried row deleted before its
    # replacement is committed. The session conf is save/restored —
    # insertInto IGNORES the per-writer option (measured r13: the
    # option-only form silently did a STATIC overwrite, wiping
    # untouched cells), and a leaked conf would change later writers'
    # semantics (parity's conf-hygiene guard). Only cells EMPTIED by
    # deletions are dropped afterwards — a crash before those drops
    # leaves rows whose ids the span resolved absent, which a re-apply
    # of the same span removes again (net-resolution removes by id
    # from current stored state), so the documented redelivery
    # convergence now holds across a crash at ANY point inside the
    # apply (kill-mid-apply pytest).
    if n_out:
        _POM = "spark.sql.sources.partitionOverwriteMode"
        prior = spark.conf.get(_POM, None)
        spark.conf.set(_POM, "dynamic")
        try:
            out.select("nid", "nvec", "cell").write.mode(
                "overwrite"
            ).insertInto(index_table)
        finally:
            if prior is None:
                spark.conf.unset(_POM)
            else:
                spark.conf.set(_POM, prior)
    for cell in sorted(set(touched) - kept_cells):
        spark.sql(
            f"ALTER TABLE {index_table} DROP IF EXISTS PARTITION (cell={cell})"
        )
    # Refresh after the DDL+write so the outer session's cached file
    # listing sees the new generation (the st23 lesson).
    spark.catalog.refreshTable(index_table)
    return {
        "touched_cells": touched,
        "removed": n_before - (n_out - n_upserts),
        "upserted": n_upserts,
        "dropped_cells": sorted(set(touched) - kept_cells),
    }


def ivf_index_recenter(
    spark,
    index_table: str,
    n_cells: int | None = None,
    centroids: list[list[float]] | None = None,
) -> None:
    """Re-fit centroids to the CURRENT indexed corpus and rebuild the
    index once — the periodic maintenance step for an append-maintained
    index whose cell balance has drifted (appends always assign to the
    original centroids, so a shifting embedding distribution slowly
    overloads some cells, costing probe selectivity).

    MAINTENANCE-WINDOW operation: the index and centroid tables are two
    separate writes, so between them a concurrent probe would select
    cells by one generation's centroids over the other generation's row
    assignment (silently wrong neighbors, no error) — drain
    probes/appends for the rebuild. The corpus is staged through an
    eager localCheckpoint before the overwrite (a table cannot be
    rebuilt from its own live files); at warehouse scale, rebuild into
    a fresh PAIR of table names and swap the catalog entry atomically
    (the ingest.optimize_table staging pattern) so readers never see a
    mixed-generation index."""
    current = spark.table(index_table).select("nid", "nvec")
    n = n_cells or spark.table(f"{index_table}_centroids").count()
    staged = current.localCheckpoint(eager=True)
    ivf_index_build(
        staged, index_table, n_cells=n, vec_col="nvec", id_col="nid",
        centroids=centroids,
    )


def ivf_index_probe(
    spark,
    queries: DataFrame,
    index_table: str,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a persisted IVF index: load the (tiny) centroid table,
    assign each query its ``nprobe`` nearest cells, and scan ONLY those
    cell partitions — partition pruning turns the corpus read into
    nprobe/n_cells of its files. Scoring and top-k ranking are identical
    to ``ivf_topk`` (exact cosine within probed cells, row_number
    ranking with id tie-break)."""
    cent_rows = spark.table(f"{index_table}_centroids").orderBy("cell").collect()
    cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cmat.T
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe].astype("int32")
        return pd.Series(list(top))

    q = (
        queries.select(
            F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
        )
        .withColumn("cell", F.explode(probe_cells(F.col("qvec"))))
        # Materialize the assignment ONCE: the frame is consumed twice
        # (cell IN-list + join side) and a nondeterministic query input
        # (e.g. .limit without order) re-executed per consumer could
        # probe one cell set and join another, silently dropping
        # neighbors. The checkpoint also runs the pandas UDF once.
        .localCheckpoint(eager=True)
    )
    # The probed cell list is tiny and known-at-plan-time once collected;
    # an IN-filter on the PARTITION column prunes the index scan itself
    # (a broadcast join alone would still read every partition).
    cells = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    # Norms staged once per stored-index row / per query row (r14):
    # the pair join re-folded both per candidate pair.
    idx = (
        spark.table(index_table)
        .where(F.col("cell").isin(cells))
        .withColumn("_nn", _l2_norm_attr("nvec"))
    )
    qn = q.withColumn("_qn", _l2_norm_attr("qvec"))
    scored = (
        idx.join(
            F.broadcast(qn), (idx.cell == qn.cell) & (F.col("qid") != F.col("nid"))
        )
        .select(
            "qid", "nid",
            _cosine_prenormed_expr("qvec", "nvec", "_qn", "_nn").alias("cos"),
        )
        .groupBy("qid", "nid")
        .agg(F.max("cos").alias("cos"))
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# IVF-PQ composed persistent index (r6) — the billion-vector serving shape
# (Jégou et al. §IV "IVFADC"): cell-partitioned PQ CODES instead of full
# float vectors. s08's full-float cells pay dim×8 bytes/vector of storage
# and scan IO; here a vector costs m codes (+1 bigint), so a 100 TB float
# corpus indexes into ~1.6 TB of codes while probes still prune to
# nprobe/n_cells of the files. Codes quantize the RAW vector (not the
# cell residual): simpler ADC, one shared codebook table, and — decisive
# here — a pure-SQL replay (suite s11b); residual encoding would buy
# recall at the cost of per-cell LUTs and a non-portable oracle.
# ---------------------------------------------------------------------------


def _load_codebooks(spark, index_table: str) -> np.ndarray:
    rows = spark.table(f"{index_table}_codebooks").orderBy("s", "j").collect()
    m = max(r["s"] for r in rows) + 1
    n_codes = max(r["j"] for r in rows) + 1
    sub = len(rows[0]["cvec"])
    C = np.empty((m, n_codes, sub), dtype=np.float64)
    for r in rows:
        C[r["s"], r["j"]] = r["cvec"]
    return C


def _ivfpq_encoder(cmat: np.ndarray, C: np.ndarray):
    """Arrow-batched (cell, codes, recon) encoder shared by build and
    append — one closure so an appended row is encoded bit-identically
    to a built row (the append≡rebuild property s11's pytest grades).
    Fixed-point argmin per subspace (pq_topk's grid) keeps encode
    replayable in SQL."""
    from pyspark.sql.functions import pandas_udf

    m, n_codes, sub = C.shape
    c2 = (C * C).sum(axis=2)
    c2i = np.floor(c2 * PQ_SCALE + 0.5).astype(np.int64)

    @pandas_udf("struct<cell:int,codes:array<int>,recon:long>")
    def encode(vecs: pd.Series) -> pd.DataFrame:
        X = np.array(vecs.tolist(), dtype=np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        cell = np.argsort(
            -(Xn @ cmat.T), axis=1, kind="stable"
        )[:, 0].astype("int32")
        codes = np.empty((len(X), m), dtype=np.int64)
        for s in range(m):
            dist = c2[s][None, :] - 2.0 * (X[:, s * sub : (s + 1) * sub] @ C[s].T)
            codes[:, s] = np.floor(dist * PQ_SCALE + 0.5).argmin(axis=1)
        recon = c2i[np.arange(m), codes].sum(axis=1)
        return pd.DataFrame(
            {
                "cell": cell,
                "codes": [[int(x) for x in row] for row in codes],
                "recon": recon,
            }
        )

    return encode


def ivfpq_index_build(
    corpus: DataFrame,
    index_table: str,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 16,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> None:
    """Materialize an IVF-PQ index. Writes three tables:

    - ``{index_table}`` — (nid, codes array<int>, recon bigint, cell)
      PARTITIONED BY cell: m small ints per vector instead of dim
      doubles. ``recon`` = fixed-point ‖reconstruction‖² (sum of stored
      codeword norms), precomputed so probes never touch the codebooks
      per row.
    - ``{index_table}_centroids`` — the coarse quantizer (s08's shape).
    - ``{index_table}_codebooks`` — (s, j, cvec, c2i): the PQ codebooks
      appends re-load to encode arriving batches identically.

    Centroids/codebooks default to the data-sampled trainers
    (``_default_centroids`` / caller passes ``trained_codebooks``);
    pass ``lcg_centroids``/``lcg_codebooks`` for the engine-portable
    variant the s11b SQL oracle replays. Build cost: ONE Arrow-batched
    encode pass over the corpus (no shuffle beyond the partitioned
    write's cell clustering)."""
    spark = corpus.sparkSession
    if dim is None:
        raise ValueError("ivfpq_index_build requires dim= (embedding width)")
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    c = corpus.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    )
    cmat = (
        np.array(centroids, dtype=np.float64)
        if centroids is not None
        else _default_centroids(c, n_cells)
    )
    books = codebooks if codebooks is not None else lcg_codebooks(dim, m, n_codes)
    C = np.array(books, dtype=np.float64)
    encode = _ivfpq_encoder(cmat, C)
    (
        c.withColumn("enc", encode(F.col("nvec")))
        .select(
            "nid", F.col("enc.codes").alias("codes"),
            F.col("enc.recon").alias("recon"), F.col("enc.cell").alias("cell"),
        )
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .saveAsTable(index_table)
    )
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(cmat)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{index_table}_centroids")
    c2i = np.floor((C * C).sum(axis=2) * PQ_SCALE + 0.5).astype(np.int64)
    spark.createDataFrame(
        [
            (s, j, [float(x) for x in C[s, j]], int(c2i[s, j]))
            for s in range(C.shape[0])
            for j in range(C.shape[1])
        ],
        "s int, j int, cvec array<double>, c2i bigint",
    ).write.mode("overwrite").saveAsTable(f"{index_table}_codebooks")


def ivfpq_index_append(
    spark,
    new_vectors: DataFrame,
    index_table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dedupe: bool = True,
) -> dict:
    """Incrementally maintain a persisted IVF-PQ index: re-load the
    STORED centroids and codebooks, encode the arriving batch with the
    exact build-time encoder, and append under the touched cell
    partitions only — ``ivf_index_append``'s cost model (O(batch +
    touched-cell rows), untouched files never read or rewritten) with
    PQ codes as the payload. Because both the cell AND the codes are
    functions of the stored tables alone, append-then-probe is exactly
    equivalent to a from-scratch rebuild over the union corpus
    (pytest-graded). ``dedupe`` semantics as in ``ivf_index_append``."""
    cent_rows = spark.table(f"{index_table}_centroids").orderBy("cell").collect()
    cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    C = _load_codebooks(spark, index_table)
    encode = _ivfpq_encoder(cmat, C)
    assigned = (
        new_vectors.select(
            F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
        )
        .withColumn("enc", encode(F.col("nvec")))
        .select(
            "nid", F.col("enc.codes").alias("codes"),
            F.col("enc.recon").alias("recon"), F.col("enc.cell").alias("cell"),
        )
        .localCheckpoint(eager=True)
    )
    touched = sorted(r["cell"] for r in assigned.select("cell").distinct().collect())
    n_batch = assigned.count()
    if dedupe:
        assigned = assigned.dropDuplicates(["nid"])
    if dedupe and touched:
        spark.catalog.refreshTable(index_table)
        existing = (
            spark.table(index_table)
            .where(F.col("cell").isin(touched))
            .select("nid")
        )
        assigned = assigned.join(existing, "nid", "left_anti")
    fresh = assigned.repartition(F.col("cell"))
    n_new = fresh.count()
    if n_new:
        fresh.select("nid", "codes", "recon", "cell").write.mode(
            "append"
        ).partitionBy("cell").saveAsTable(index_table)
        # See ivf_index_append: post-write refresh so an outer-session
        # probe right after a foreachBatch fold sees this batch's files.
        spark.catalog.refreshTable(index_table)
    return {
        "touched_cells": touched,
        "appended": n_new,
        "skipped_existing": n_batch - n_new,
    }


def ivfpq_index_probe(
    spark,
    queries: DataFrame,
    index_table: str,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rerank: int = 0,
    rerank_source: DataFrame | None = None,
) -> DataFrame:
    """Probe a persisted IVF-PQ index: partition-prune to the queries'
    ``nprobe`` nearest cells, ADC-score the pruned codes, rank top-k.

    The query side is driver-bounded by construction: vectors are
    collected once, the per-query ADC lookup table (m·n_codes
    fixed-point ints) is built in numpy and shipped INSIDE the
    broadcast query frame as a flat array column. The corpus-side scan
    is then pure JVM: one codegen'd ``aggregate`` HOF sums m array
    lookups per (query, code-row) pair — no Python worker, no Arrow
    transfer, no shuffle before the top-k rank on qid. That is the
    100 TB probe shape: nprobe/n_cells of the FILES, m integer adds
    per row scanned.

    ``rerank > 0`` adds pq_topk's ADC-shortlist + exact-rescore stage;
    the index stores no raw vectors (that's the point), so the caller
    passes ``rerank_source`` — the vector table rescore reads via a
    broadcast id semi-join (≤ nq·rerank rows fetched, never scanned).
    Returns (query_id, neighbor_id, approx_cosine|cosine, rank)."""
    S = PQ_SCALE
    cent_rows = spark.table(f"{index_table}_centroids").orderBy("cell").collect()
    cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    C = _load_codebooks(spark, index_table)
    m, n_codes, sub = C.shape
    qrows = (
        queries.select(
            F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
        )
        .orderBy("qid")
        .collect()
    )
    if not qrows:
        raise ValueError("ivfpq_index_probe: empty query frame")
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((Q * Q).sum(axis=1))
    Qn = Q / np.maximum(qnorm[:, None], 1e-12)
    probe = np.argsort(-(Qn @ cmat.T), axis=1, kind="stable")[:, :nprobe]
    lut = np.stack(
        [Q[:, s * sub : (s + 1) * sub] @ C[s].T for s in range(m)], axis=1
    )  # (nq, m, n_codes)
    lut_int = np.floor(lut * S + 0.5).astype(np.int64)
    qdf = F.broadcast(
        spark.createDataFrame(
            [
                (
                    int(qids[i]),
                    int(cell),
                    [int(x) for x in lut_int[i].ravel()],
                    float(qnorm[i]),
                )
                for i in range(len(qids))
                for cell in probe[i]
            ],
            "qid long, qcell int, lut array<long>, qnorm double",
        )
    )
    cells = sorted({int(c) for row in probe for c in row})
    idx = spark.table(index_table).where(F.col("cell").isin(cells))
    # ADC = Σ_s lut[s·n_codes + codes[s]] — all JVM-side array lookups.
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.element_at(
            F.col("lut"), (s * n_codes + F.element_at(F.col("codes"), s + 1) + 1)
        ),
    )
    scored = (
        idx.join(
            qdf, (idx.cell == qdf.qcell) & (F.col("qid") != F.col("nid"))
        )
        .select("qid", "nid", "recon", "qnorm", adc.alias("adc"))
    )
    rank_key = (F.col("adc") / S) / F.sqrt(F.col("recon") / F.lit(float(S)))
    approx = (F.col("adc") / S) / (
        F.col("qnorm") * F.sqrt(F.col("recon") / F.lit(float(S)))
    )
    w = Window.partitionBy("qid").orderBy(rank_key.desc(), F.col("nid"))
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                F.col("qid").alias("query_id"),
                F.col("nid").alias("neighbor_id"),
                F.round(approx, 6).alias("approx_cosine"),
                F.col("rank").cast("int").alias("rank"),
            )
        )
    if rerank_source is None:
        raise ValueError(
            "rerank > 0 needs rerank_source= (the index stores codes, "
            "not raw vectors)"
        )
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= max(rerank, k))
        .select(F.col("qid").alias("sqid"), F.col("nid").alias("snid"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql.functions import pandas_udf

    nq = len(qids)

    @pandas_udf("array<struct<qid:long,cos:double>>")
    def exact_cos(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        xnorm = np.sqrt((X * X).sum(axis=1, keepdims=True))
        cos = (X @ Q.T) / (np.maximum(xnorm, 1e-12) * qnorm[None, :])
        return pd.Series(
            [
                [{"qid": int(qids[i]), "cos": float(cos[b, i])} for i in range(nq)]
                for b in range(len(X))
            ]
        )

    src = rerank_source.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    )
    cvec = src.join(F.broadcast(short), src["nid"] == F.col("snid"), "left_semi")
    rescored = (
        cvec.select("nid", F.explode(exact_cos(F.col("nvec"))).alias("rc"))
        .select("nid", "rc.qid", "rc.cos")
        .join(
            F.broadcast(short),
            (F.col("qid") == F.col("sqid")) & (F.col("nid") == F.col("snid")),
        )
        .drop("sqid", "snid")
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.round("cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell & Goldstein,
    SIGIR'98): greedily pick ``k`` of the top-``n_candidates`` exact-cosine
    neighbors per query, each step maximizing
    ``lam*rel(d) - (1-lam)*max_{s in S} sim(d, s)`` — relevance traded
    against redundancy with what's already selected. The retrieval stage
    of a curation pipeline that wants coverage, not five near-copies.

    Plan shape: candidate generation is ``cosine_topk`` (broadcast query
    block, one narrow corpus pass); candidate vectors come back on one
    broadcast join (candidate set = nq x n_candidates rows, tiny by
    construction); pairwise candidate sims are a per-query self-join of
    that bounded set (nq x N^2/2 rows — never corpus-sized). The greedy
    loop itself runs IN-ROW as a JVM ``aggregate`` fold over one
    row per query carrying (ids, rel-map, sim-map) — no Python, no
    per-step shuffle, state bounded at N ids + N^2/2 map entries.

    Determinism contract (what the DuckDB oracle replays): candidate
    ranking on unrounded cosine (ties by id), rel/sim rounded to 6dp
    BEFORE selection, per-step score re-rounded to 6dp, score ties
    broken by lowest id, ``1-lam`` computed as ``1.0 - lam`` in IEEE
    double on both sides.

    Returns (query_id, neighbor_id, mmr_rank, relevance).
    """
    one_minus = F.lit(1.0) - F.lit(lam)
    cand = cosine_topk(corpus, queries, k=n_candidates, vec_col=vec_col, id_col=id_col)
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    # Candidate-vector norm staged once per (query, neighbor) row
    # (r14): the per-query self-join below re-folded both sides' norms
    # per candidate PAIR (N²/2 pairs × 2 folds → N rows × 1 fold).
    cv = vecs.join(F.broadcast(cand), "neighbor_id").select(
        "query_id", "neighbor_id", "cosine", "_v",
        _l2_norm_attr("_v").alias("_vn"),
    )
    a = cv.select(
        "query_id", F.col("neighbor_id").alias("_ida"),
        F.col("_v").alias("_va"), F.col("_vn").alias("_na"),
    )
    b = cv.select(
        "query_id", F.col("neighbor_id").alias("_idb"),
        F.col("_v").alias("_vb"), F.col("_vn").alias("_nb"),
    )
    # a.neighbor_id < b.neighbor_id, so least/greatest of the old pair
    # key resolve to (_ida, _idb) — same string, same values.
    pair_key = F.concat_ws(
        ":", F.col("_ida").cast("string"), F.col("_idb").cast("string")
    )
    pairs = (
        a.join(
            b,
            (a["query_id"] == b["query_id"]) & (F.col("_ida") < F.col("_idb")),
        )
        .select(
            a["query_id"].alias("query_id"),
            pair_key.alias("_pk"),
            F.round(
                _cosine_prenormed_expr("_va", "_vb", "_na", "_nb"), 6
            ).alias("_sim"),
        )
    )
    gsim = pairs.groupBy("query_id").agg(
        F.map_from_entries(F.collect_list(F.struct("_pk", "_sim"))).alias("_sim")
    )
    g = (
        cand.groupBy("query_id")
        .agg(
            F.collect_list(F.col("neighbor_id").cast("bigint")).alias("_ids"),
            F.map_from_entries(
                F.collect_list(F.struct(F.col("neighbor_id").cast("bigint"), "cosine"))
            ).alias("_rel"),
        )
        .join(gsim, "query_id", "left")
    )

    def _key(i: Column, s: Column) -> Column:
        return F.concat_ws(
            ":", F.least(i, s).cast("string"), F.greatest(i, s).cast("string")
        )

    def _pick(acc: Column) -> Column:
        scored = F.transform(
            F.filter(F.col("_ids"), lambda i: ~F.array_contains(acc, i)),
            lambda i: F.struct(
                F.round(
                    F.lit(lam) * F.element_at(F.col("_rel"), i)
                    - one_minus
                    * F.coalesce(
                        F.array_max(
                            F.transform(
                                acc,
                                lambda s: F.element_at(F.col("_sim"), _key(i, s)),
                            )
                        ),
                        F.lit(0.0),
                    ),
                    6,
                ).alias("s"),
                (-i).alias("negid"),
            ),
        )
        return F.array_max(scored)

    sel = F.aggregate(
        F.sequence(F.lit(1), F.lit(k)),
        F.array().cast("array<bigint>"),
        lambda acc, _: F.when(
            _pick(acc).isNotNull(),
            F.array_append(acc, -_pick(acc).getField("negid")),
        ).otherwise(acc),
    )
    return (
        g.select("query_id", "_rel", F.posexplode(sel).alias("_pos", "neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.col("_pos") + 1).cast("int").alias("mmr_rank"),
            F.element_at(F.col("_rel"), F.col("neighbor_id")).alias("relevance"),
        )
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids_grid: list[list[int]],
    iters: int = 3,
    scale: int = PQ_SCALE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[int]], DataFrame]:
    """Distributed Lloyd refinement over the FULL corpus — the step that
    turns ``trained_codebooks``/``lcg_centroids``' bounded-sample
    centroids into corpus-faithful ones at scale (a 4096-row driver
    sample cannot see the tail of 10^11 vectors; the refinement pass
    can, because each iteration is one corpus scan + a tiny aggregate).

    Everything runs on a fixed-point integer grid (``floor(x*scale +
    0.5)``), so per-cell sums are EXACT integers under any partial-
    aggregation order and the whole refinement is bit-reproducible on
    any engine — no float-summation-order caveats (suite s13's DuckDB
    oracle replays all iterations literally). Mean update is
    ``floor((2*s + n) / (2.0*n))`` — round-half-up back onto the grid,
    computed as floor over IEEE double division on both engines
    (exact while 2|s|+n < 2^53 ≈ corpus_rows*scale*|x| < 4.5e15; past
    that, refine per shard and merge). Per-row distances accumulate in
    a LONG: keep dim*(scale*max|x-c|)^2 < 2^63 (true for unit-scale
    embeddings at the default grid by ~9 orders; ANSI mode raises on
    overflow rather than wrapping).

    Per iteration: assignment is an in-row codegen'd fold over the
    broadcast centroid literals (argmin squared-L2, ties to the lowest
    cell — O(cells*dim) per row, the Arrow matmul tier of ``ivf_topk``
    is the swap-in for large cell counts); per-(cell,dim) integer sums
    flow through Spark's map-side partial aggregation (shuffle volume =
    partitions x cells x dim, never corpus-sized); only the
    cells x dim sum table is collected (bounded metadata, the s08
    centroid-table precedent). Empty cells keep their previous
    centroid.

    Returns (refined_grid, stats_df) where stats_df has one row per
    (cell, dim): the refined grid value plus that cell's member count
    and exact integer inertia from the final assignment.
    """
    import math as _math

    if iters < 1:
        raise ValueError("kmeans_refine: iters must be >= 1")
    n_cells = len(centroids_grid)
    dim = len(centroids_grid[0])
    q = corpus.select(
        F.col(id_col).alias("vid"),
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: F.floor(x * scale + F.lit(0.5)).cast("long"),
        ).alias("qv"),
    )
    cur = [list(map(int, row)) for row in centroids_grid]
    spark = corpus.sparkSession
    stats_rows = None
    for _ in range(iters):
        cmat = F.array(
            *[F.array(*[F.lit(v) for v in row]) for row in cur]
        )
        scored = F.transform(
            F.sequence(F.lit(0), F.lit(n_cells - 1)),
            lambda ci: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("qv"),
                        F.element_at(cmat, ci + 1),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                ci.alias("cell"),
            ),
        )
        best = F.array_min(scored)
        assigned = q.select(
            "qv",
            best.getField("cell").alias("cell"),
            best.getField("d").alias("d"),
        )
        sums = (
            assigned.select("cell", F.posexplode("qv").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        stats_rows = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n_members"), F.sum("d").alias("inertia")
        ).collect()
        smap = {(r["cell"], r["dim"]): int(r["s"]) for r in sums}
        cnts = {r["cell"]: int(r["n_members"]) for r in stats_rows}
        cur = [
            [
                int(_math.floor((2 * smap[(ci, di)] + cnts[ci]) / (2.0 * cnts[ci])))
                if cnts.get(ci, 0) > 0
                else cur[ci][di]
                for di in range(dim)
            ]
            for ci in range(n_cells)
        ]
    stat = {r["cell"]: (int(r["n_members"]), int(r["inertia"])) for r in stats_rows}
    out_rows = [
        (ci, di, cur[ci][di], stat.get(ci, (0, 0))[0], stat.get(ci, (0, 0))[1])
        for ci in range(n_cells)
        for di in range(dim)
    ]
    out = spark.createDataFrame(
        out_rows, "cell int, dim int, c bigint, n_members bigint, inertia bigint"
    )
    return cur, out


def retrieval_metrics(pred: DataFrame, truth: DataFrame, k: int = 5) -> DataFrame:
    """Per-query retrieval quality of an ANN result against the exact
    baseline — the eval harness that turns "recall 0.78" from a pytest
    constant into a first-class queryable table (tune nprobe/bands on
    the real corpus, monitor drift after index appends).

    ``pred`` and ``truth`` both carry (query_id, neighbor_id, rank) —
    any pair of this module's top-k outputs composes. Relevant set =
    truth's top-``k``. Both inputs are nq x k rows by construction, so
    the truth side broadcasts and the single groupBy touches nq rows —
    cost is independent of corpus size (the expensive part already
    happened inside the two retrieval runs).

    Returns (query_id, n_hits, recall_at_k, mrr): hit count against the
    relevant set, recall@k, and the reciprocal rank of the FIRST
    relevant prediction (0.0 when none hit)."""
    p = pred.select("query_id", "neighbor_id", F.col("rank").alias("_pr"))
    t = (
        truth.where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.lit(1).alias("_rel"))
    )
    j = p.join(F.broadcast(t), ["query_id", "neighbor_id"], "left")
    return j.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("_rel"), F.lit(0))).cast("int").alias("n_hits"),
        F.round(
            F.sum(F.coalesce(F.col("_rel"), F.lit(0))) / F.lit(float(k)), 6
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(
                F.lit(1.0) / F.min(F.when(F.col("_rel") == 1, F.col("_pr"))),
                F.lit(0.0),
            ),
            6,
        ).alias("mrr"),
    )


def knn_graph(
    df: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Blocked kNN-GRAPH builder — for EVERY corpus vector, its k nearest
    within-cell neighbors (directed edges), the structure SemDeDup-style
    curation, cluster pruning, and graph-based sampling consume. Distinct
    from the query-vs-corpus top-k family (cosine_topk etc.): here the
    corpus self-joins, so blocking is mandatory, not an optimization.

    Cells are the same deterministic LCG sign-bit buckets as
    semantic_dedup (dedup.py) — data-independent and replayable in plain
    SQL, which keeps the WHOLE operator hash-verifiable (suite s15
    replays the literal planes). Semantics are explicitly "kNN among
    cell-mates" (the standard blocked approximation; neighbors falling
    across a hyperplane are out of scope by definition — raise n_planes
    to trade edge recall for cell size). One shuffle on the cell id for
    the self-join, one on src for the rank window; pair expansion is
    bounded by the largest cell (2^n_planes cells — size it so cells
    stay ~10^3-10^4 vectors at 100 TB, exactly like semantic_dedup).

    Ranking uses the UNROUNDED cosine with an id tie-break (the s02b
    discipline — both engines fold the dot product left-to-right);
    output cosine is rounded 6dp. Returns (src, dst, cosine, rank)."""
    from pyspark.sql import Window

    planes = _hyperplanes(dim, n_planes)
    v = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    norm = F.sqrt(F.aggregate(F.col("vec"), F.lit(0.0), lambda acc, x: acc + x * x))
    v = v.withColumn("norm", norm).withColumn(
        "cell", lsh_bucket(F.col("vec"), planes)
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.norm") * F.col("b.norm"))
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vid") != F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("src"), F.col("b.vid").alias("dst"), cos.alias("_cos")
    )
    w = Window.partitionBy("src").orderBy(F.col("_cos").desc(), F.col("dst"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "dst", F.round("_cos", 6).alias("cosine"), "rank")
    )


def filtered_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    filter_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Metadata-FILTERED top-k — retrieval constrained to corpus rows
    sharing the query's attribute (same language / source / tenant),
    the everyday production variant the unconstrained family (cosine_
    topk, IVF/PQ tiers) doesn't express. Post-filtering an
    unconstrained top-k UNDER-RETURNS (k neighbors then filter can
    leave <k survivors); the correct shape makes the constraint the
    JOIN KEY: queries equi-join the corpus on ``filter_col`` — at scale
    that is a broadcast of the (small) query set against a corpus scan
    with the label predicate pushed down, and each query scores only
    its label's partition of the corpus, never the whole thing. Exact
    within the constraint, so hash-verifiable (suite s16). Ranking:
    unrounded cosine, id tie-break (the s02b discipline)."""
    from pyspark.sql import Window

    def prep(df, prefix):
        v = df.select(
            F.col(id_col).alias(f"{prefix}id"),
            F.col(vec_col).cast("array<double>").alias(f"{prefix}vec"),
            F.col(filter_col).alias(f"{prefix}f"),
        )
        nrm = F.sqrt(
            F.aggregate(F.col(f"{prefix}vec"), F.lit(0.0), lambda a, x: a + x * x)
        )
        return v.withColumn(f"{prefix}n", nrm)

    q, c = prep(queries, "q"), prep(corpus, "c")
    dot = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("cvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cos = dot / (F.col("qn") * F.col("cn"))
    pairs = q.join(
        c, (F.col("qf") == F.col("cf")) & (F.col("qid") != F.col("cid"))
    ).select(
        F.col("qid").alias("query_id"),
        F.col("cid").alias("neighbor_id"),
        cos.alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 6).alias("cosine"), "rank")
    )


def rrf_fuse(
    arms: list[DataFrame],
    k: int = 5,
    rrf_k: int = 60,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) —
    the standard hybrid-retrieval combiner: each arm (lexical BM25,
    dense ANN, ...) contributes ``scale div (rrf_k + rank)`` per item
    it retrieved, summed across arms; missing from an arm contributes
    0. Rank-only fusion needs NO score calibration between arms, which
    is why production hybrid search defaults to it.

    Every arm must carry (query_id, item_id, rank). Contributions are
    INTEGER (``scale`` div — the fixed-point house rule), so fused
    scores are exact BIGINTs any engine replays; ties break by item_id.
    Returns (query_id, item_id, rrf_score, n_arms, rank), rank <= k.

    Plan shape: the arm outputs are nq x k rows each — metadata-scale
    regardless of corpus size (the heavy lifting happened inside the
    arms); one union + one (query_id, item_id) partial-agg shuffle +
    one per-query top-k window."""
    if not arms:
        raise ValueError("rrf_fuse needs at least one arm")
    need = {"query_id", "item_id", "rank"}
    std = []
    for a in arms:
        missing = need - set(a.columns)
        if missing:
            raise ValueError(f"arm missing columns: {sorted(missing)}")
        std.append(a.select("query_id", "item_id", "rank"))
    u = std[0]
    for a in std[1:]:
        u = u.unionByName(a)
    contrib = F.expr(f"{int(scale)} div ({int(rrf_k)} + rank)").cast("long")
    scored = u.groupBy("query_id", "item_id").agg(
        F.sum(contrib).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_arms"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("item_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "rrf_score", "n_arms", "rank")
    )


def ivfpq_index_health(spark, index_table: str) -> DataFrame:
    """Operational health report for a persisted IVF-PQ index
    (``ivfpq_index_build``/``append``) — the monitoring read that
    decides when to ``ivf_index_recenter`` or retrain codebooks,
    computed from the INDEX ALONE (codes + precomputed recon norms;
    the raw corpus is never touched):

    - ``n_vecs`` / ``share_bp`` per cell — occupancy skew: a hot cell
      degrades probe selectivity (every nprobe hit scans it) and is
      the recenter trigger;
    - ``avg_recon`` — integer mean of the stored fixed-point
      ‖reconstruction‖² per cell: appends landing with systematically
      drifted recon norms flag stale codebooks;
    - ``n_code_patterns`` — distinct PQ code tuples per cell: pattern
      collapse (many vectors sharing one tuple) means ADC can no
      longer separate them and n_codes/m need retraining.

    All integers (the fixed-point discipline), so the report is
    engine-replayable. Plan: one groupBy over the index (partition
    column key — no wide shuffle), a 1-row total broadcast for the
    shares."""
    idx = spark.table(index_table)
    per = idx.groupBy(F.col("cell").cast("int").alias("cell")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("recon").alias("recon_sum"),
        F.countDistinct("codes").cast("long").alias("n_code_patterns"),
    )
    total = per.agg(F.sum("n_vecs").alias("total_"))
    return per.crossJoin(F.broadcast(total)).select(
        "cell",
        "n_vecs",
        F.expr("(10000 * n_vecs) div total_").cast("long").alias("share_bp"),
        F.expr("recon_sum div n_vecs").cast("long").alias("avg_recon"),
        "n_code_patterns",
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hard-negative mining for contrastive / two-tower training: each
    query's k nearest neighbors with a DIFFERENT label — the near-miss
    examples that actually move an embedding model (random negatives
    are trivially separable; in-batch negatives are whatever co-sampled).
    ``filtered_topk``'s complement: the label constraint negates, so it
    can't be the equi-join key — the exact tier broadcasts the (small)
    query block against one corpus scan with the ``label <>`` predicate
    fused into the scan stage (the s01 shape, BNLJ by design); at
    corpus scale, over-fetch an ANN tier (s02/s03/s11) and post-filter,
    keeping this exact pass as the per-block verifier. Ranking:
    unrounded cosine, id tie-break. Returns (query_id, negative_id,
    negative_label, cosine 6dp, rank)."""
    from pyspark.sql import Window

    def prep(df, prefix):
        v = df.select(
            F.col(id_col).alias(f"{prefix}id"),
            F.col(vec_col).cast("array<double>").alias(f"{prefix}vec"),
            F.col(label_col).alias(f"{prefix}l"),
        )
        nrm = F.sqrt(
            F.aggregate(F.col(f"{prefix}vec"), F.lit(0.0), lambda a, x: a + x * x)
        )
        return v.withColumn(f"{prefix}n", nrm)

    q, c = prep(queries, "q"), prep(corpus, "c")
    dot = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("cvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cos = dot / (F.col("qn") * F.col("cn"))
    pairs = F.broadcast(q).join(c, F.col("ql") != F.col("cl")).select(
        F.col("qid").alias("query_id"),
        F.col("cid").alias("negative_id"),
        F.col("cl").alias("negative_label"),
        cos.alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("negative_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "negative_id",
            "negative_label",
            F.round("_cos", 6).alias("cosine"),
            "rank",
        )
    )


def maxsim_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_slices: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Multi-vector (late-interaction / ColBERT-style) MaxSim top-k:
    each row's embedding is treated as ``n_slices`` sub-vectors, and a
    query-document score is Σ over query slices of the MAX cosine
    against any document slice — retrieval that rewards a document for
    matching EVERY aspect of the query somewhere, where single-vector
    cosine (s01) averages the aspects away. The standard shape for
    token-level or multi-aspect embeddings stored flat (slice = token
    block), graded here over the embeddings table's 64-dim vectors as
    4×16-dim slices.

    Plan: identical to the exact tier (cosine_topk) — query side
    broadcast, corpus streams one narrow stage, scoring is a fully
    codegen'd unrolled expression (n_slices² HOF dot-product folds per
    pair; no Python), window top-k on (score, id). At scale the ANN
    front (IVF cells per slice, s03/s11) generates candidates and this
    exact MaxSim re-ranks — the same two-tier discipline as s11's
    rerank. Output: (query_id, neighbor_id, maxsim 6dp, rank).

    Contract: ``dim`` must divide into ``n_slices`` equal slices and
    vectors must actually carry ``dim`` elements — a slice past the end
    of a short vector would score NULL (0/0) and corrupt the ranking
    silently, so divisibility is validated here and the width
    assumption documented. A ZERO-NORM slice (zero-padded token block)
    is guarded in the score expression: it contributes 0, never a NULL
    that would swallow the whole pair.

    ``candidates`` (columns: query_id, neighbor_id) switches from the
    exact all-pairs verifier arm to the PRODUCTION composition: the
    n_slices² MaxSim fold scores ONLY the listed pairs — the candidate
    list joins the corpus broadcast (tiny by the generator's k-per-
    query construction), so the corpus streams one narrow stage and
    the quadratic-by-definition exact arm never runs corpus-wide. This
    is the same two-tier discipline as s11/s24: a cheap single-vector
    or truncated-prefix arm generates ≤K per query, exact MaxSim
    re-ranks."""
    from logverzcore_spark.operators.util import fan_out

    if n_slices < 2:
        raise ValueError("maxsim needs >= 2 slices (else use cosine_topk)")
    if dim % n_slices != 0:
        raise ValueError(f"dim={dim} not divisible into {n_slices} slices")
    width = dim // n_slices

    # Slice norms staged ONCE per row on both sides (r14): the n_slices²
    # score cells re-folded 2·n_slices² slice norms per PAIR before.
    c = fan_out(corpus).select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"),
        *[
            _slice_norm_attr("nvec", s, width).alias(f"_nn{s}")
            for s in range(n_slices)
        ],
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"),
        *[
            _slice_norm_attr("qvec", s, width).alias(f"_qn{s}")
            for s in range(n_slices)
        ],
    )
    if candidates is not None:
        pair_list = candidates.select(
            F.col("query_id").alias("qid"), F.col("neighbor_id").alias("nid")
        )
        joined = c.join(F.broadcast(pair_list), "nid").join(
            F.broadcast(q), "qid"
        )
    else:
        joined = c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
    # The n_slices² fold is a memoized single-parse expression: same
    # per-slice zero-norm guard (a zero-padded token block scores 0,
    # never a NULL that would swallow the pair), same greatest-nesting
    # and sum association order — bit-identical scores to the per-node
    # Column form it replaced (r13), with the norm terms now reading
    # the staged per-row columns (r14).
    total = _maxsim_score_prenormed_expr("qvec", "nvec", "_qn", "_nn", n_slices, width)
    scored = joined.select("qid", "nid", total.alias("cos"))
    out = _rank_topk(scored, k)
    # _rank_topk names the score 'cosine'; MaxSim is a sum of maxima,
    # not a cosine — rename for honesty.
    return out.withColumnRenamed("cosine", "maxsim")
