"""Skew-handling utilities for hot keys at scale.

AQE's skew-join splitting (on by default in engine.get_session) covers
sort-merge joins; these helpers cover the cases AQE doesn't:

- ``salted_aggregate``  two-phase aggregation for skewed groupBy where the
  per-key state is large (collect_list/collect_set/exact distinct): phase 1
  aggregates on (key, salt) spreading one hot key over N reducers, phase 2
  merges the partials. For algebraic aggs (sum/count/min/max) Spark's
  map-side partial aggregation already does this — use salting only when
  the aggregation buffer itself is the problem.
- ``salted_broadcast_left``  replicate-and-salt pattern for joining a huge
  skewed fact against a small-but-too-big-to-broadcast dim: the dim is
  exploded N×, the fact salted deterministically, so one hot join key
  lands on N partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n: int) -> Column:
    """Deterministic salt in [0, n): a hash of the row position. The salt
    intentionally does NOT depend on any data column — its only job is to
    spread one hot key's rows over n reducers, and hashing
    monotonically_increasing_id does that reproducibly within a run
    without an RNG."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    exprs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``exprs``: output_name -> (agg, column) with agg in
    {sum, count, min, max, collect_set}. Example::

        salted_aggregate(ev, ["user_id"], {"n": ("count", "*"),
                                           "types": ("collect_set", "event_type")})
    """
    phase1_aggs = []
    phase2_aggs = []
    for out, (agg, col) in exprs.items():
        if agg == "count":
            phase1_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif agg == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif agg == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif agg == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(f"_p_{out}").alias(out))
        elif agg == "collect_set":
            phase1_aggs.append(F.collect_set(col).alias(f"_p_{out}"))
            phase2_aggs.append(
                F.array_distinct(F.flatten(F.collect_list(f"_p_{out}"))).alias(out)
            )
        else:
            raise ValueError(f"unsupported agg {agg!r}")
    salted = df.withColumn("_salt", _salt(n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed ``fact`` to ``dim`` on column ``on`` with salt
    replication: dim rows are exploded across all salts, fact rows salted
    deterministically — a hot key's rows spread over ``n_salts``
    partitions instead of one straggler task."""
    dim_rep = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    fact_s = fact.withColumn("_salt", _salt(n_salts))
    return fact_s.join(dim_rep, [on, "_salt"], how).drop("_salt")
