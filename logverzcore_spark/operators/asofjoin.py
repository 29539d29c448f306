"""As-of (time-series nearest-match) join — a custom operator Spark lacks.

``asof_join(left, right, on, by)`` attaches to every left row the single
right row with the greatest ``on`` value that is <= the left row's
(direction="backward"; "forward" mirrors). The reference delegated all
relational work to RDS (SURVEY §2.5; sqlproxy.mjs:68-78) where users
could emulate this with correlated subqueries — here it is a first-class
operator, built for scale:

- NOT a range join: a join on ``l.ts >= r.ts`` explodes to O(n·m) pairs
  before picking the max. Instead both sides are unioned and processed
  with ONE window pass: partition by the ``by`` key, sort by
  (on, side-marker, tie), and carry the last-seen right payload forward
  with ``last(..., ignorenulls=True)``.
- Cost at 100 TB: a single hash-partition shuffle on ``by`` plus an
  in-partition sort — the same price as any groupBy on that key. No
  state blowup: the carried payload is one struct per row.
- Skewed ``by`` keys behave like any skewed aggregation (AQE skew
  handling applies to the exchange; there is no quadratic term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_SIDE = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    direction: str = "backward",
    tie_break: str | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join. Every ``right`` column except the ``by`` key(s)
    comes back suffixed with ``suffix`` (NULL when no match exists).

    ``tie_break``: a right column ordering equal-``on`` right rows; the
    greatest wins (deterministic output — oracle-comparable).
    ``direction``: "backward" matches the latest right row with
    ``r.on <= l.on``; "forward" the earliest with ``r.on >= l.on``. At
    equal ``on`` values the right row counts as a match in both modes.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    payload_cols = [c for c in right.columns if c not in by_cols]
    if on not in payload_cols:
        raise ValueError(f"right side must carry the {on!r} column")

    l_side = left.select(
        *by_cols,
        F.col(on).alias("__asof_on"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("string").alias("__asof_tie"),
        F.lit(None)
        .cast(right.select(F.struct(*payload_cols).alias(_PAYLOAD)).schema[_PAYLOAD].dataType)
        .alias(_PAYLOAD),
        F.struct(*left.columns).alias("__asof_left"),
    )
    r_side = right.select(
        *by_cols,
        F.col(on).alias("__asof_on"),
        F.lit(0).alias(_SIDE),
        (F.col(tie_break) if tie_break else F.lit(None)).cast("string").alias("__asof_tie"),
        F.struct(*payload_cols).alias(_PAYLOAD),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("x")).schema["x"].dataType)
        .alias("__asof_left"),
    )
    merged = l_side.unionByName(r_side)

    order = [F.col("__asof_on"), F.col(_SIDE), F.col("__asof_tie")]
    if direction == "forward":
        # Mirror: scan from the future backwards; right rows still sort
        # BEFORE the left rows they may match (equal-on inclusive), and
        # the tie-break still prefers the greatest.
        # Tie stays ASCENDING: within an equal-(on, side) run the carried
        # last() sees the final row of the run, so ascending tie makes the
        # greatest tie value win in both directions.
        order = [F.col("__asof_on").desc(), F.col(_SIDE), F.col("__asof_tie")]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_PAYLOAD, ignorenulls=True).over(w)

    out = (
        merged.withColumn("__asof_match", carried)
        .where(F.col(_SIDE) == 1)
        .select("__asof_left.*", *[F.col(f"__asof_match.{c}").alias(f"{c}{suffix}") for c in payload_cols])
    )
    return out
