"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Ensure expensive narrow projections downstream get cluster-wide
    parallelism.

    A small parquet table arrives as one (or few) input partitions; a
    per-row-heavy projection placed on top would run on as many cores. At
    real scale inputs carry hundreds of splits and this is a no-op — the
    round-robin shuffle (of the cheap raw columns) only fires when the
    input is under-parallel."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df
