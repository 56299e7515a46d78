"""Table IO seam (SURVEY.md §7.3.3).

Production semantics target an Iceberg catalog (``format("iceberg")``,
partitioned by ``bucket(N, conv_id)``); the local PySpark 4.1.2
distribution bundles no Iceberg runtime jar, so this seam reads/writes
plain parquet with identical schemas. Everything above this module is
storage-agnostic: swap ``FORMAT`` + table identifiers in one place.

Schemas are **fixed StructType, declared not inferred** — byte-equality
fixtures require stable types (SURVEY.md §1.2).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Input table (BASELINE.json input_hint).
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

SPAN_TYPE = T.StructType(
    [
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

# Output of the extraction stage (FIXTURES.md §2 + metrics columns).
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("blocks_kept", T.LongType()),
        T.StructField("blocks_dropped", T.LongType()),
        T.StructField("parse_failed", T.IntegerType()),
    ]
)

# Per-partition lineage/metrics (FIXTURES.md §3).
AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("turns_in", T.LongType()),
        T.StructField("turns_out", T.LongType()),
        T.StructField("blocks_kept", T.LongType()),
        T.StructField("blocks_dropped", T.LongType()),
        T.StructField("parse_failures", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Scan the transcripts table. Schema is declared, so Catalyst
    prunes to exactly the columns downstream operators reference."""
    return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)


def write_transcripts_parquet(spark: SparkSession, rows: Iterable[Dict], path: str,
                              partitions: int = 8) -> str:
    """Materialize generator rows as a transcripts parquet table."""
    df = spark.createDataFrame(list(rows), schema=TRANSCRIPTS_SCHEMA)
    df.repartition(partitions).write.mode("overwrite").parquet(path)
    return path


def generate_transcripts_distributed(spark: SparkSession, n_convs: int,
                                     seed: int = 42, mega: int = 0,
                                     mega_turns: int = 0, cap: int = 5000,
                                     partitions: int = 64) -> DataFrame:
    """Generate the synthetic transcript corpus *on the executors*:
    conversation generation is order-independent per conv_id (synth.py
    docstring), so ``spark.range(n_convs)`` → ``mapInPandas`` scales the
    generator with the cluster instead of the driver. Used by bench.py
    to build multi-million-turn inputs in seconds."""
    import pandas as pd  # local import: executors need it, driver may not

    from . import synth

    def gen(pdfs):
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        for pdf in pdfs:
            rows = []
            for ci in pdf["id"]:
                n = synth.turns_for(int(ci), seed=seed, cap=cap,
                                    mega=mega, mega_turns=mega_turns)
                rows.extend(synth.gen_conversation(seed, f"conv-{int(ci):06d}", n))
            if not rows:
                continue
            out = pd.DataFrame(rows, columns=cols)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    return spark.range(n_convs).repartition(partitions).mapInPandas(
        gen, TRANSCRIPTS_SCHEMA
    )


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recast the driver's ``documents`` table as single-turn
    transcripts (FIXTURES.md §4): conv_id = doc_id, turn_idx = 0,
    role = 'user', tool = null, fixed epoch ts."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def write_extracted(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def read_audit(spark: SparkSession, path: str) -> Optional[DataFrame]:
    try:
        return spark.read.schema(AUDIT_SCHEMA).parquet(path)
    except Exception:
        return None


def append_audit(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)
