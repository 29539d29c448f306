"""Event-analytics operators — the log-analysis shapes LogverzCore users
ran against their RDS event tables (SURVEY §2.3 corpus: time filters,
aggregation; e.g. CloudTrail `eventTime` analysis) expressed as reusable
Spark operators, plus the classic product-analytics trio (funnel,
retention, gap-filled time series) that any 100 TB event store needs.

Scale notes common to all three:
- aggregations reduce per-user/per-key BEFORE any join, so joins move
  one row per user, not one per event;
- the per-step / per-cohort frames are tiny relative to the event table
  and broadcast cleanly; the event table itself is only ever scanned,
  never shuffled more than once per operator;
- time bucketing uses integer arithmetic on epoch days/hours (engine
  portable, no timezone-dependent truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel completion counts: one row with, per step, the
    number of users who performed that step strictly AFTER their earliest
    qualifying time for the previous step (min-time semantics — the
    standard product-analytics funnel).

    Each stage is (filter → groupBy user → min ts) then an equi-join on
    user against the previous stage's (tiny) user frame — per-step cost
    is one scan + one shuffle of per-user rows; no window over the full
    event stream, no cross-step state.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    stage = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t"))
    )
    result: DataFrame | None = None
    for i, step in enumerate(steps):
        if i:
            stage = (
                events.where(F.col(type_col) == step)
                .select(F.col(user_col).alias("user"), F.col(ts_col).alias("ev_ts"))
                .join(F.broadcast(stage), "user")
                .where(F.col("ev_ts") > F.col("t"))
                .groupBy("user")
                .agg(F.min("ev_ts").alias("t"))
            )
        c = stage.agg(F.count(F.lit(1)).alias(f"step{i + 1}_{step}_users"))
        # One lazy plan, not a count() per stage: the single-row aggregates
        # cross-join for free and shared stage subtrees are computed once
        # (reused exchange), where eager per-stage actions would rescan
        # every earlier stage k times.
        result = c if result is None else result.crossJoin(c)
    return result


def retention_cohorts(
    events: DataFrame,
    anchor_date: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted in each later week they were active.

    Week index = floor(days since ``anchor_date`` / 7) — pure integer
    arithmetic, identical in any engine (no locale-dependent week
    truncation). Returns (cohort_week, week_offset, n_users).
    """
    day = F.datediff(F.col(ts_col).cast("date"), F.lit(anchor_date).cast("date"))
    week = F.floor(day / 7).cast("bigint")
    cohorts = (
        events.groupBy(F.col(user_col).alias("user"))
        .agg(F.min(week).alias("cohort_week"))
    )
    active = events.select(F.col(user_col).alias("user"), week.alias("aw")).distinct()
    return (
        active.join(F.broadcast(cohorts), "user")
        .groupBy(
            "cohort_week", (F.col("aw") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.countDistinct("user").alias("n_users"))
    )


def hourly_spine_fill(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-filled hourly counts: a dense (key × hour) spine over the
    data's full time range, left-joined with observed counts, empty hours
    zero-filled — the time-series shape dashboards need (a groupBy alone
    silently drops empty buckets).

    The spine is generated from a one-row min/max aggregate via
    ``sequence`` + explode and cross-joined with the distinct keys — both
    sides tiny and broadcast; the event table is scanned once for the
    hourly aggregate. Returns (hour_ts string, key, n).
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    bounds = events.agg(
        F.min(hour).alias("h_min"), F.max(hour).alias("h_max")
    )
    hours = bounds.select(
        F.explode(
            F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    keys = events.select(F.col(key_col).alias("key")).distinct()
    spine = hours.crossJoin(F.broadcast(keys))
    observed = events.groupBy(
        hour.alias("hour"), F.col(key_col).alias("key")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(observed, ["hour", "key"], "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            F.col("key"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event/observation
    log — the batch warehouse sibling of the streaming CDC upsert
    (suite:st09, which keeps only the LATEST row per key; SCD2 keeps
    the full versioned history a point-in-time join needs).

    Semantics: per key, order observations by (ts, tie); consecutive
    observations with identical ``attr_cols`` collapse into one version
    (a re-assertion of the same state is not a change); each surviving
    version carries ``valid_from`` (its first observation), ``valid_to``
    (the next version's start — half-open interval), ``is_current``
    (open-ended), and a 1-based ``version``.

    Plan shape: ONE shuffle on the key; both the change-detection lag
    and the interval lead ride the same ``(key) ORDER BY (ts, tie)``
    window partitioning, so Catalyst reuses a single sort — no second
    exchange, no self-join (the naive SCD2 build joins the log to
    itself per version; at 100 TB that's a corpus² disaster). Attribute
    comparison is struct equality with null-safe ``<=>`` per field.
    """
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    same = F.lit(True)
    for a in attr_cols:
        same = same & F.col(a).eqNullSafe(F.lag(a).over(w))
    # row_number marks the first observation explicitly — an all-NULL
    # first attr state would otherwise compare null-safe-EQUAL to the
    # absent predecessor and the key would lose its opening version
    changed = df.withColumn(
        "_is_change", (F.row_number().over(w) == 1) | ~same
    ).where("_is_change")
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        changed.withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("version", F.row_number().over(w2).cast("int"))
        .select(
            F.col(key_col),
            *[F.col(a) for a in attr_cols],
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
            "version",
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str | None = None,
) -> DataFrame:
    """Time-weighted average over IRREGULARLY sampled values — the
    correct mean for gauge-style series (a value holds until the next
    observation), where the arithmetic mean over-weights bursts. Each
    observation carries its value for ``dt = next_ts - ts``; a key's
    last observation has no interval and drops out (the standard
    half-open convention); single-observation keys report NULL.

    Cross-engine exactness (the house cents pattern): values quantize
    to integer cents, intervals to integer MILLISECONDS (microsecond
    arithmetic would overflow the 2^63 product bound on month-long
    gaps), so the weighted sum is an exact BIGINT under any aggregation
    order and the one final division is identical IEEE everywhere.
    Bound: cents·ms products need value·10^2 · gap_ms · rows_per_key
    < 2^63 — safe by ~4 orders for year-long logs at these magnitudes.

    One key shuffle; the interval lead rides a single window sort.
    Returns (key, n_intervals, total_ms, twa 6dp)."""
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    dt_ms = (
        (F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col)))
        / 1000
    ).cast("long")
    staged = df.select(
        F.col(key_col), cents.alias("_c"), dt_ms.alias("_dt")
    ).where(F.col("_dt").isNotNull())
    return staged.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_intervals"),
        F.sum("_dt").alias("total_ms"),
        F.round(
            F.sum(F.col("_c") * F.col("_dt")) / (F.lit(100.0) * F.sum("_dt")), 6
        ).alias("twa"),
    )


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str | None = None,
    n_ranges: int = 16,
) -> DataFrame:
    """Pareto frontier / 2-D skyline (minimize ``x``, maximize ``y``):
    the points no other point strictly dominates. The naive shape is a
    quadratic NOT-EXISTS self-join (the DuckDB oracle, fine at oracle
    scale, fatal at 100 TB); in 2-D the frontier is exactly the points
    whose y beats the running max over everything cheaper, so this is a
    SORT + PREFIX-MAX, not a join.

    The prefix-max is two-level so no single task scans all distinct x:
    (1) collapse to one row per distinct x (hash shuffle, map-side
    combined) keeping max-y and its (count, min-id) via one struct-max;
    (2) range-partition by x into ``n_ranges`` ordered slices and take
    the strictly-previous running max INSIDE each slice (parallel window
    per slice); (3) each slice's total max — ``n_ranges`` rows, bounded
    driver metadata — prefix-folds into per-slice offsets broadcast back
    as a literal when-chain, so a row's global strict-prev max is
    ``greatest(local_prev, offset[slice])``. Output: one row per
    frontier point: (x, y, n_points[, min_id]).

    Strict dominance: duplicates of a frontier point are all kept
    (reported as one row with their count); a same-x-lower-y or
    same-y-higher-x point is dominated and dropped. NULL coordinates
    follow SQL comparison semantics (a NULL-y point is never seen as
    dominated and passes through) — filter them out first if that is
    not the intent."""
    from pyspark.sql import Window

    x, y = F.col(x_col), F.col(y_col)
    per_xy = df.groupBy(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n_points"),
        *([F.min(F.col(id_col)).alias("min_id")] if id_col else []),
    )
    tail = (["n_points"] + (["min_id"] if id_col else []))
    per_x = (
        per_xy.groupBy("x")
        .agg(F.max(F.struct("y", *tail)).alias("_s"))
        .select("x", "_s.y", *[f"_s.{c}" for c in tail])
    )
    # localCheckpoint PINS the slice assignment: the slice-max collect and
    # the final filter must see the SAME partitioning, and a lazy
    # repartitionByRange would re-sample boundaries on each evaluation.
    ranged = (
        per_x.repartitionByRange(n_ranges, "x")
        .withColumn("_slice", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_prev = (
        Window.partitionBy("_slice")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_local_prev", F.max("y").over(w_prev))
    # Slice maxima: bounded (n_ranges rows) driver metadata, like the
    # IVF centroid tables — never the data.
    slice_max = {
        r["_slice"]: r["m"]
        for r in ranged.groupBy("_slice").agg(F.max("y").alias("m")).collect()
    }
    offsets: dict[int, float] = {}
    best = None
    for s in sorted(slice_max):
        offsets[s] = best  # exclusive prefix: max over all EARLIER slices
        best = slice_max[s] if best is None else max(best, slice_max[s])
    off = None
    for s in sorted(offsets):
        if offsets[s] is None:
            continue
        cond = F.col("_slice") == s
        off = F.when(cond, F.lit(offsets[s])) if off is None else off.when(
            cond, F.lit(offsets[s])
        )
    global_prev = (
        F.greatest(F.col("_local_prev"), off)
        if off is not None
        else F.col("_local_prev")
    )
    return (
        local.where(global_prev.isNull() | (F.col("y") > global_prev))
        .select("x", "y", *tail)
    )
