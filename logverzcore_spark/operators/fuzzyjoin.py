"""Fuzzy string-match join (entity resolution): edit-distance pairs via
pigeonhole segment blocking + exact Levenshtein verification.

The data-cleaning counterpart of the text near-dup family: find record
pairs whose KEY STRINGS (names, SKUs, hostnames) differ by at most
``max_distance`` edits — without the all-pairs cross join. Pigeonhole:
split each string into ``max_distance + 1`` contiguous segments; two
same-length strings within ``max_distance`` substitutions must agree
EXACTLY on at least one segment (at most ``max_distance`` segments can
contain an edit). Candidates come from an equi-join on
(segment index, segment text, length); survivors are verified with
Spark's built-in ``levenshtein`` (JVM-side, codegen).

Same-length restriction: with substitution-only edits the pigeonhole is
exact. Insertions/deletions shift segment positions — supporting them
needs PassJoin-style shifted segment matching; identifier-shaped keys
(the use case) are fixed-format, so the same-length form is the 100 TB
default and the docstring is the contract.

Skew note (same caveat as LSH buckets): low-entropy segments — a shared
literal prefix like ``Supplier#`` — degenerate their block toward
all-pairs. The other segment(s) still bound the verify set, but a
production run over prefix-heavy keys should block on the high-entropy
segment range (``segment_slice``) or pre-strip the constant prefix;
dropping oversized blocks instead silently loses the pigeonhole
guarantee, so it is not a default here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """(id_a, id_b, distance) pairs with same-length ``text_col`` values
    within ``max_distance`` substitutions, id_a < id_b."""
    n_seg = max_distance + 1
    s = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_ln"),
    )
    segs = []
    for i in range(n_seg):
        # floor() (not a truncating cast): replays identically in SQL
        # engines whose double→int CAST rounds half-even.
        start = F.floor(F.col("_ln") * i / n_seg).cast("int") + 1
        end = F.floor(F.col("_ln") * (i + 1) / n_seg).cast("int")
        segs.append(
            F.struct(
                F.lit(i).alias("idx"),
                F.col("_txt").substr(start, end - start + 1).alias("seg"),
            )
        )
    seg_rows = s.select(
        "_id", "_txt", "_ln", F.explode(F.array(*segs)).alias("sg")
    ).select("_id", "_txt", "_ln", F.col("sg.idx").alias("idx"), F.col("sg.seg").alias("seg"))
    a = seg_rows.alias("a")
    b = seg_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.idx") == F.col("b.idx"))
            & (F.col("a._ln") == F.col("b._ln"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._txt").alias("txt_a"),
            F.col("b._txt").alias("txt_b"),
        )
        .distinct()
    )
    dist = F.levenshtein("txt_a", "txt_b")
    return (
        cand.select("id_a", "id_b", dist.alias("distance"))
        .where(F.col("distance") <= max_distance)
    )
