"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ocr_engine_spark.catalog``; this module is a
thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full extraction pipeline (payload dispatch →
    deterministic bucket shuffle → partition-local sort → one
    mapInArrow Arrow stage) over /root/testdata/sf0.001 documents
    recast as multi-kind transcripts (text/html/tool/pdf payload
    constructors — all four kernels run in the smoke). Returns
    per-turn extracted text + ordered spans + classifier metrics."""
    from ocr_engine_spark.plans.extract_plan import build_extracted
    from ocr_engine_spark.sources.tableio import (
        transcripts_from_documents_multikind,
    )

    df = transcripts_from_documents_multikind(spark, "/root/testdata/sf0.001")
    out = build_extracted(df, num_buckets=16, salt_buckets=2)
    return out.select(
        "conv_id", "turn_idx", "kind", "extracted_text", "spans",
        "blocks_kept", "blocks_dropped", "parse_failed",
    ).orderBy("conv_id", "turn_idx")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_engine_spark.catalog import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from ocr_engine_spark.catalog import oracle_sql as _o

    return _o()
