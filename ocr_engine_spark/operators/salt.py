"""Explicit skew salting + deterministic bucketing (SURVEY.md §3.4,
§4.2 "custom salting").

The work unit is the **bucket**: a deterministic function of the row,
NOT of runtime task placement — that is what makes audit/resume
idempotent (a bucket's membership never depends on cluster size,
scheduling, or AQE decisions).

    bucket = pmod( xxhash64(conv_id) + pmod(xxhash64(turn_idx), S), P )

- ``S = 1`` → pure hash(conv_id): whole conversations co-located.
- ``S > 1`` → a conversation's turns spread over (at most) S
  consecutive buckets: mega-conversations (Zipf tail, FIXTURES.md §1)
  can no longer pin a single straggler partition. Extraction is
  per-turn pure, so splitting a conversation is safe; global
  ``(conv_id, turn_idx)`` order is re-imposed only at fixture-diff /
  consumer time (SURVEY.md §2.6 O3).

AQE's skew handling only splits *join/agg* shuffle partitions; a
skewed map-stage input to a Python stage is our own problem — hence
the explicit salt (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_bucket(df: DataFrame, num_buckets: int, salt_buckets: int = 1) -> DataFrame:
    """Add the deterministic ``bucket`` column."""
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    key = F.xxhash64(F.col("conv_id")) + F.pmod(
        F.xxhash64(F.col("turn_idx")), F.lit(salt_buckets)
    )
    return df.withColumn("bucket", F.pmod(key, F.lit(num_buckets)).cast("int"))


def partition_by_bucket(df: DataFrame, num_buckets: int) -> DataFrame:
    """Shuffle on the bucket column (THE one shuffle of the pipeline)
    and sort each partition by (conv_id, turn_idx) — a partition-local,
    spillable sort that gives deterministic intra-partition turn order
    without any global sort (SURVEY.md §3.4)."""
    return df.repartition(num_buckets, F.col("bucket")).sortWithinPartitions(
        "conv_id", "turn_idx"
    )
