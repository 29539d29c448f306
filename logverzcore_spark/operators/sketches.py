"""Portable frequency sketches whose builds any engine can replay.

Spark ships HLL/theta/KLL natively (suite q30/q48/q77/q78 use them); the
count-min sketch it lacks is the standard FREQUENCY sketch — point
estimates of per-key counts in sublinear memory, the building block of
heavy-hitter monitoring over unbounded key domains (estimate ≥ truth,
overcount bounded by e·N/width with probability 1−e^−depth).

Like the d20 bloom filter, the hash is md5-derived (first 12 hex digits
as an integer) so the identical sketch can be rebuilt byte-for-byte in
DuckDB SQL — the whole build/estimate pipeline is integer-exact and
hash-verifiable, no engine-private hash, no float.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(key: Column, d: Column, width: int) -> Column:
    """Row ``d``'s cell index for ``key``: first 12 hex digits of
    md5('d:key') as an integer, mod width (operands positive, so plain
    ``%`` agrees across engines — the d20 sign-bit lesson does not
    apply)."""
    h = F.conv(
        F.substring(F.md5(F.concat(d.cast("string"), F.lit(":"), key.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    return h % width


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Build a depth×width count-min sketch as a (d, w, cnt) frame —
    ≤ depth·width rows regardless of input size.

    Plan: explode each row into ``depth`` (row, d) copies, project the
    cell index, ONE groupBy(d, w) count — map-side partial aggregation
    collapses each task's contribution to ≤ depth·width rows before the
    only shuffle, so the shuffle volume is O(tasks · depth · width),
    independent of data volume: the constant-memory aggregation shape
    that survives a key domain too large for an exact groupBy(key).
    """
    d = F.explode(F.array([F.lit(i) for i in range(depth)])).alias("d")
    return (
        df.select(F.col(key_col).alias("k"))
        .select("k", d)
        .select("d", _cell(F.col("k"), F.col("d"), width).alias("w"))
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over the sketch's
    ``depth`` cells (absent cell ⇒ 0 — the key was never seen).
    Returns (key_col, est). The sketch side is ≤ depth·width rows and
    is broadcast; estimating any number of keys never shuffles the
    sketch."""
    d = F.explode(F.array([F.lit(i) for i in range(depth)])).alias("d")
    probes = (
        keys.select(F.col(key_col).alias("k"))
        .distinct()
        .select("k", d)
        .select("k", "d", _cell(F.col("k"), F.col("d"), width).alias("w"))
    )
    return (
        probes.join(F.broadcast(cms), ["d", "w"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(F.col("k").alias(key_col), "est")
    )
