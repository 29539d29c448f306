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
