"""Shared operator utilities."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _parse_bytes(conf_val: str) -> int:
    v = conf_val.strip().lower()
    for suffix, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("b", 1)):
        if v.endswith(suffix):
            return int(v[: -len(suffix)]) * mult
    return int(v)


def fan_out(df: DataFrame) -> DataFrame:
    """Ensure expensive narrow projections downstream get cluster-wide
    parallelism.

    A small parquet table arrives as one (or few) input partitions; a
    per-row-heavy projection placed on top would run on as many cores. At
    real scale inputs carry hundreds of splits and this is a no-op — the
    round-robin shuffle (of the cheap raw columns) only fires when the
    input is under-parallel.

    The under-parallelism probe reads the leaf FILE LIST (analysis only),
    not ``df.rdd.getNumPartitions()`` — the RDD conversion forces full
    physical planning + RDD translation, which costs ~1 s of driver time
    per distinct plan (measured on the MinHash pipeline; every operator
    paid it). All call sites hand scan-rooted frames (raw corpus,
    possibly projected / broadcast-semi-joined — no upstream exchange),
    so split math from file sizes is the exact partition count Spark's
    own FilePartition packer would produce, up to small-file packing —
    which only UNDER-estimates, erring toward a repartition that real
    scale never triggers. Non-file sources (memory relations, streaming
    micro-batches) fall back to the RDD probe.
    """
    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        if len(files) >= parallelism:
            return df  # ≥1 split per file — already cluster-wide
        local = [f[5:] if f.startswith("file:") else f for f in files]
        if all(os.path.exists(f) for f in local):
            max_pb = _parse_bytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
            )
            total = sum(os.path.getsize(f) for f in local)
            if total // max_pb + 1 >= parallelism:
                return df  # size-based splits already reach parallelism
            return df.repartition(parallelism)
        # Remote paths: fall through to the physical probe.
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df
