"""Per-bucket lineage/metrics + idempotent resume (SURVEY.md §7.1.5,
FIXTURES.md §3).

Design (scale-first):
- results are written ``partitionBy("bucket")`` with dynamic partition
  overwrite, so re-running a bucket atomically replaces exactly that
  bucket's files — re-runs are idempotent by construction;
- the audit row for a bucket is appended only AFTER its data is
  written (write-then-audit ordering): a crash between the two leaves
  an incomplete bucket *without* an audit row, and the next run redoes
  it;
- resume = anti-join of the bucket column against the completed bucket
  set for this ``run_id``. The completed set has at most ``P`` ids —
  tiny — so it travels as a broadcast/isin filter, never a shuffle;
- the checksum is ``bit_xor(xxhash64(conv_id, turn_idx,
  extracted_text))`` — order-insensitive (XOR is commutative), content
  sensitive, and overflow-free under ANSI mode (unlike SUM of hashes).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tableio


def audit_metrics(extracted: DataFrame, run_id: str) -> DataFrame:
    """Aggregate per-bucket metrics from extraction output. Partial
    (map-side) aggregation applies — the shuffle moves at most
    ``num_buckets × tasks`` pre-aggregated rows."""
    return extracted.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("turns_in"),
        F.count(F.lit(1)).alias("turns_out"),
        F.sum("blocks_kept").alias("blocks_kept"),
        F.sum("blocks_dropped").alias("blocks_dropped"),
        F.sum(F.col("parse_failed").cast("long")).alias("parse_failures"),
        F.bit_xor(
            F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.col("extracted_text"))
        ).alias("checksum"),
    ).select(
        F.lit(run_id).alias("run_id"),
        F.col("bucket"),
        "turns_in",
        "turns_out",
        "blocks_kept",
        "blocks_dropped",
        "parse_failures",
        "checksum",
    )


def completed_buckets(spark: SparkSession, audit_path: str, run_id: str) -> List[int]:
    audit = tableio.read_audit(spark, audit_path)
    if audit is None:
        return []
    rows = (
        audit.filter(F.col("run_id") == run_id)
        .select("bucket")
        .distinct()
        .collect()
    )
    return sorted(r["bucket"] for r in rows)


def resume_filter(df: DataFrame, done: Optional[List[int]]) -> DataFrame:
    """Drop rows belonging to already-completed buckets. ``done`` is at
    most P integers, pushed down as an IN-list predicate (partition
    pruning applies when the source is partitioned by bucket)."""
    if not done:
        return df
    return df.filter(~F.col("bucket").isin(done))
