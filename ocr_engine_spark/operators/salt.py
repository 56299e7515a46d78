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


def shuffle_by_bucket(df: DataFrame, num_buckets: int) -> DataFrame:
    """Shuffle on the bucket column — THE one shuffle of the pipeline.

    Deliberately does NOT sort here: the extraction stage is per-turn
    pure, so the Python stage can start consuming shuffle blocks as
    they stream in. A pre-extraction sortWithinPartitions would be a
    full-partition barrier in front of the Python workers (the sorter
    must drain the partition before the first Arrow batch is emitted);
    sorting *after* extraction gives the same deterministic
    (conv_id, turn_idx) order per partition while overlapping the sort
    with Python compute."""
    return df.repartition(num_buckets, F.col("bucket"))


def sort_within_buckets(df: DataFrame) -> DataFrame:
    """Partition-local, spillable (conv_id, turn_idx) sort — the
    deterministic turn order guarantee (SURVEY.md §2.6 O3), applied to
    the extraction *output* (see shuffle_by_bucket on why after)."""
    return df.sortWithinPartitions("conv_id", "turn_idx")


def partition_by_bucket(df: DataFrame, num_buckets: int) -> DataFrame:
    """Shuffle + sort in one step (pre-extraction ordering). Kept for
    callers that need sorted *input*; the extraction plan uses
    shuffle_by_bucket → extract → sort_within_buckets instead."""
    return shuffle_by_bucket(df, num_buckets).sortWithinPartitions(
        "conv_id", "turn_idx"
    )
