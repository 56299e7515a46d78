"""Text-analysis operators over a document table (brief: language-ID,
quality scoring, token counting, fingerprinting). All native Catalyst
— no Python in any of these paths; each has a DuckDB oracle in
``ocr_engine_spark.oracles``."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfns as X
from .util import spread_to_parallelism


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return spread_to_parallelism(docs).select(
        F.col(id_col),
        X.ws_token_count_col(text_col).alias("ws_tokens"),
        X.bpe_ish_token_count_col(text_col).alias("bpe_tokens"),
    )


def langid(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return spread_to_parallelism(docs).select(
        F.col(id_col),
        X.langid_col(text_col).alias("lang_pred"),
        X.devanagari_char_count_col(text_col).cast("int").alias("dev_chars"),
        X.cjk_char_count_col(text_col).cast("int").alias("cjk_chars"),
    )


def quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return spread_to_parallelism(docs).select(
        F.col(id_col),
        X.ws_token_count_col(text_col).alias("n_tokens"),
        X.quality_score_col(text_col).alias("quality"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return spread_to_parallelism(docs).select(
        F.col(id_col), X.fingerprint_col(text_col).alias("fingerprint")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 60) -> DataFrame:
    """SimHash over the normalized token stream, 60-bit engine-portable
    hashes. Shape: explode tokens → per-bit ±1 vote sums (single
    partial-aggregating groupBy) → fold votes into one BIGINT.

    Scale: the shuffle moves pre-aggregated (doc, 60 ints) rows, not
    tokens — map-side combine does the heavy lifting."""
    toks = spread_to_parallelism(docs).select(
        F.col(id_col), F.explode(X.tokens_col(text_col)).alias("token")
    ).withColumn("h", X.hash60_col("token"))
    votes, finish = X.simhash_cols(F.col("h"), bits)
    return (
        toks.groupBy(id_col)
        .agg(*votes)
        .select(F.col(id_col), finish().alias("simhash"))
    )
