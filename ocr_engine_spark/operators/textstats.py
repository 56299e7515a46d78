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


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003
    shape): hash every k-char gram of the normalized text, slide a
    window of ``window`` gram-hashes, keep each window's minimum, then
    distinct — the classic rolling-hash fingerprint set for plagiarism
    / near-dup detection.

    All native, and shaped to dodge Catalyst's CollapseProject trap:
    consecutive projections are merged with alias *inlining*, so an
    array column referenced per-element inside a ``transform`` lambda
    re-evaluates its whole defining subtree per element — for windowed
    minima over gram hashes that is O(n²) md5 calls (measured as a
    multi-minute hang on 20 documents). Both stages therefore use the
    shifted-``slice`` + ``zip_with`` formulation, which evaluates the
    upstream array a constant number of times per row regardless of
    projection collapsing. Output is one row per distinct fingerprint,
    exploded for set-oriented downstream joins; shuffle-free until the
    caller aggregates."""
    norm = X.normalized_text_col(text_col)
    base = spread_to_parallelism(docs).select(F.col(id_col), norm.alias("nt"))
    n_grams = F.greatest(F.length("nt") - F.lit(k - 1), F.lit(0))
    grams = base.select(
        F.col(id_col),
        F.transform(
            F.when(n_grams > 0, F.sequence(F.lit(1), n_grams)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda i: X.hash60_col(F.col("nt").substr(i, F.lit(k))),
        ).alias("hs"),
    )
    # window minimum = fold of `least` over `window` shifted slices
    n_windows = F.greatest(F.size("hs") - F.lit(window - 1), F.lit(0))
    acc = F.slice("hs", 1, n_windows)
    for j in range(1, window):
        acc = F.zip_with(
            acc, F.slice("hs", 1 + j, n_windows), lambda a, b: F.least(a, b)
        )
    mins = grams.select(
        F.col(id_col), F.array_distinct(acc).alias("fps")
    )
    return mins.select(F.col(id_col), F.explode("fps").alias("fingerprint"))
