"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's default parallelism iff
    the input has fewer partitions. CPU-heavy per-row operators (regex
    tokenization, shingling, hashing) are otherwise serialized onto
    however many splits the scan produced — a single small parquet file
    means a single task no matter how many cores exist. At real scale
    (thousands of splits) this is a metadata-only no-op; the shuffle it
    introduces on small inputs costs far less than the lost
    parallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
