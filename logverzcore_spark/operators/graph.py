"""Iterative graph algorithms on DataFrames — the loop-in-the-driver,
data-on-the-cluster pattern (each iteration is a declarative join+agg
Catalyst plans independently; no RDD/GraphX dependency).

Engine-portability discipline (same as similarity.kmeans_refine): all
per-iteration arithmetic is INTEGER fixed-point — scores are scaled
bigints, per-edge contributions use integer division, and every operand
stays positive so Spark's ``div`` (truncating) and DuckDB's ``//``
(truncating) agree — which is what lets a fixed iteration count be
replayed as UNROLLED chained CTEs in the SQL oracle and hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank with a fixed iteration count over an edge list
    (``src``/``dst`` longs), in scaled-integer arithmetic.

    Per iteration: every node sends ``score div outdeg`` along each
    out-edge (exact integer split — the truncation remainder is simply
    retained, a standard fixed-point simplification applied identically
    in the oracle), and receives ``(100-d)% * scale + (d% * inbox) div
    100``. Nodes with no out-edges keep their mass (no dangling
    redistribution — documented, mirrored in the oracle); nodes with no
    in-edges settle at the base term.

    Scale shape: each iteration is ONE join (edges ⋈ scores on src — at
    real scale store edges bucketed by src so this side never
    re-shuffles; here AQE broadcasts the score side when small) and ONE
    aggregation shuffle on dst, map-side combined. The driver loop only
    composes plans — no per-iteration collect; lineage stays linear in
    ``n_iter``. Scores fit bigint while n_nodes*scale < 2^63/100."""
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ed = e.join(outdeg, "src")
    base = scale * (100 - damping_pct) // 100
    scores = nodes.select("node", F.lit(scale).cast("long").alias("score"))
    for _ in range(n_iter):
        inbox = (
            ed.join(scores, ed["src"] == scores["node"])
            .select("dst", F.expr("score div od").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        scores = nodes.join(
            inbox, nodes["node"] == inbox["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(in_sum, 0L)) div 100")
            ).cast("long").alias("score"),
        )
    return scores


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle counting over an undirected edge list, the
    standard cohesion/clustering signal (and the motif-counting
    representative the relational family lacked).

    Input edges may carry duplicates, both directions, and self-loops;
    the first stage canonicalizes to distinct ``a < b`` pairs.

    Scale design — DEGREE-ORDERED orientation (Cohen's MapReduce
    triangle algorithm; also Latapy's compact-forward): orienting every
    edge from its lower-(degree, id) endpoint to the higher one makes
    each triangle countable exactly once AND bounds the wedge-join
    fan-out by O(m^1.5) overall — per-center out-degree is at most
    O(sqrt(m)) — where the naive id-orientation explodes on any
    high-degree hub (a celebrity vertex with degree d contributes
    C(d,2) wedges). The wedge build shuffles on the center vertex; the
    closing check is an inner join back to oriented edges on (v, w);
    the final explode+count shuffles triangle corners only.

    Output: (vertex, triangles) for every vertex in ≥1 triangle.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .union(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient each canonical edge toward the higher-(deg, id) endpoint.
    ranked = (
        e.join(deg.withColumnsRenamed({"v": "a", "deg": "da"}), "a")
        .join(deg.withColumnsRenamed({"v": "b", "deg": "db"}), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    o1 = oriented.select("u", "v", "dv")
    wedges = o1.alias("p").join(o1.alias("q"), "u").where(
        # distinct out-neighbor pair, ordered by the same (deg, id) rank
        (F.col("p.dv") < F.col("q.dv"))
        | ((F.col("p.dv") == F.col("q.dv")) & (F.col("p.v") < F.col("q.v")))
    ).select(
        F.col("u").alias("x"), F.col("p.v").alias("y"), F.col("q.v").alias("z")
    )
    closing = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tris = wedges.join(closing, ["y", "z"])
    corners = (
        tris.select(F.col("x").alias("vertex"))
        .union(tris.select(F.col("y").alias("vertex")))
        .union(tris.select(F.col("z").alias("vertex")))
    )
    return corners.groupBy("vertex").agg(F.count(F.lit(1)).alias("triangles"))
