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


def top_terms(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", top_k: int = 3) -> DataFrame:
    """Per-document top-k keywords by a BM25-style rational idf score:

        score = tf · (N − df + 0.5) / (df + 0.5)

    deliberately log-free — every input is integer-valued, so +,−,×,÷
    are IEEE-exact-rounded and the scores are bit-identical across
    engines (a ln()-based idf is NOT correctly-rounded and could flip
    the 6-dp rounding / ranking between Spark and the oracle).

    Scale shape: tf is one partial-aggregating groupBy on
    (doc, term); df aggregates the tf table on term (vocabulary-sized
    — broadcastable at scale, AQE picks the strategy); N is a 1-row
    broadcast; the final top-k is a row_number window per doc.
    Ties rank deterministically by (score DESC, term ASC)."""
    from pyspark.sql import Window

    toks = spread_to_parallelism(docs).select(
        F.col(id_col), F.explode(X.tokens_col(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col), "term", "tf", "df",
            (
                F.col("tf")
                * (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("raw_score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("raw_score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col(id_col), "term", "tf", "df",
            F.round("raw_score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003
    shape): hash every k-char gram of the normalized text, slide a
    window of ``window`` gram-hashes, keep each window's minimum, then
    distinct — the classic rolling-hash fingerprint set for plagiarism
    / near-dup detection.

    Implemented as an Arrow-batched ``mapInPandas`` kernel — a
    deliberate exception to the all-native rule, with measurements:
    two native formulations were built first and both went
    super-linear under Catalyst's CollapseProject alias inlining (an
    aliased array referenced from a per-element ``transform`` lambda
    re-evaluates its defining subtree per element: 139 s for 5k small
    docs; a slice+zip_with refactor still multiplied nested
    re-evaluations: 25 s). The per-row rolling-hash loop is exactly
    the shape the engine's Python crossing exists for — data-local,
    stateless per row, O(n·window) — and runs the same workload in
    ~2 s. Hashes stay md5-based so the DuckDB oracle is unchanged.

    Normalization matches ``textfns.normalized_text_col`` byte-for-byte
    (lower → collapse ``[ \\t\\n\\r]+`` to one space → trim)."""
    import hashlib
    import re as _re

    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    ddl = f"{id_col} {id_type}, fingerprint long"
    ws_rx = _re.compile(r"[ \t\n\r]+")

    def run(pdfs):
        for pdf in pdfs:
            ids, fps = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                nt = ws_rx.sub(" ", (t or "").lower()).strip(" ")
                m = len(nt) - k + 1
                if m <= 0:
                    continue
                hs = [
                    int(hashlib.md5(nt[j : j + k].encode()).hexdigest()[:15], 16)
                    for j in range(m)
                ]
                seen = set()
                for j in range(len(hs) - window + 1):
                    v = min(hs[j : j + window])
                    if v not in seen:
                        seen.add(v)
                        ids.append(i)
                        fps.append(v)
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    return spread_to_parallelism(docs).select(
        F.col(id_col), F.col(text_col)
    ).mapInPandas(run, ddl)


def vocab_pair_counts(docs: DataFrame, k: int = 50, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Adjacent token-pair frequencies, top-``k`` by (count desc, pair
    asc) — the counting core of one BPE/vocab-induction merge step
    (count all adjacent symbol pairs, take the most frequent). Pairs
    keep MULTIPLICITY (unlike shingles): zip of the token array with
    its shift, exploded, counted.

    Scale: the explode fan-out is ~tokens-per-doc × docs, but the
    groupBy(pair) partial-aggregates map-side, so the exchange carries
    (pair, partial count) — vocabulary-sized, not corpus-sized. The
    top-k is ORDER BY + LIMIT, which Spark runs as TakeOrdered
    (per-partition heaps, k rows shuffled — no global sort)."""
    from ..functions import textfns as X

    toks = X.tokens_col(text_col)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition metrics (Rae et al. 2021, appendix
    A1.1 — the repetition family of quality filters every large
    text-curation pipeline applies before training):

    - ``dup_line_frac`` — fraction of non-empty (trimmed) lines that
      are repeats of an earlier line;
    - ``top_2gram`` / ``top_2gram_frac`` — the most frequent word
      2-gram (ties → lexicographically smallest) and the fraction of
      2-gram-stream characters its occurrences cover;
    - ``dup_5gram_frac`` — fraction of 5-gram-stream characters
      covered by 5-grams occurring more than once.

    Scale: ZERO shuffle — no explode, no groupBy. Per-document mode /
    duplicate counts come from sorting the per-row n-gram ARRAY
    (``array_sort``) and folding runs of equal neighbours with
    ``aggregate`` higher-order functions, so the whole operator is a
    scan-side JVM projection with per-row bounded state (HOFs execute
    as codegen'd expression trees per row, outside the whole-stage
    fusion span — still no Python, no Arrow crossing). The
    explode→count formulation shuffles the full n-gram stream —
    corpus-sized; this one moves nothing.

    The work is STAGED across three ``select``s so each expensive
    array (sorted gram arrays, trimmed lines) and each fold result is
    a named column computed exactly once per row: HOF ``aggregate``
    expressions are CodegenFallback — referencing one three times in
    a single projection re-evaluates the whole interpreted subtree
    three times (and every task re-instantiates the 3× larger tree).
    CollapseProject leaves the stages alone because the aliased
    expressions are non-cheap and multiply referenced; measured 4.8×
    faster cold / 1.2× warm at sf0.01, byte-identical output.
    """
    t = X.tokens_col(text_col)
    n = F.size(t)
    empty = F.array().cast("array<string>")
    lines = F.filter(
        F.transform(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )

    g2 = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(empty)
    g5 = F.when(
        n >= 5,
        F.transform(
            F.sequence(F.lit(1), n - 4),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i),
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
                F.element_at(t, i + 3),
                F.element_at(t, i + 4),
            ),
        ),
    ).otherwise(empty)

    # stage 1: each heavy array materialized once per row
    staged = spread_to_parallelism(docs).select(
        F.col(id_col),
        lines.alias("_lines"),
        F.array_sort(g2).alias("_g2s"),
        F.array_sort(g5).alias("_g5s"),
    )

    zero = F.lit(0).cast("long")

    def _char_sum(arr):
        return F.aggregate(arr, zero, lambda acc, x: acc + F.length(x))

    # mode of the sorted 2-gram array: fold runs of equal neighbours,
    # updating the best run eagerly (strict > keeps the FIRST — i.e.
    # lexicographically smallest — gram at the max count)
    def _top_step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["bestg"]).alias("bestg"),
        )

    top2 = F.aggregate(
        F.col("_g2s"),
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"),
            zero.alias("best"), F.lit("").alias("bestg"),
        ),
        _top_step,
    )

    # duplicate-5gram chars: a run of length r >= 2 contributes
    # r * len(gram) (charge ALL occurrences once the gram repeats)
    def _dup_step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        add = (
            F.when(run == 2, F.length(x) * 2)
            .when(run > 2, F.length(x))
            .otherwise(F.lit(0))
        ).cast("long")
        return F.struct(
            x.alias("prev"), run.alias("run"),
            (acc["dup"] + add).alias("dup"),
        )

    dup5 = F.aggregate(
        F.col("_g5s"),
        F.struct(F.lit("").alias("prev"), zero.alias("run"),
                 zero.alias("dup")),
        _dup_step,
    )

    nl = F.size(F.col("_lines"))
    dup_line = F.when(
        nl > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(F.col("_lines"))) / nl, 6
        ),
    ).otherwise(F.lit(0.0))

    # stage 2: one column per fold result (each aggregate evaluated
    # exactly once); stage 3: cheap field extraction / arithmetic
    folded = staged.select(
        F.col(id_col),
        nl.cast("int").alias("n_lines"),
        dup_line.alias("dup_line_frac"),
        top2.alias("_top2"),
        dup5.alias("_dup5"),
        _char_sum(F.col("_g2s")).alias("_den2"),
        _char_sum(F.col("_g5s")).alias("_den5"),
    )
    return folded.select(
        F.col(id_col),
        F.col("n_lines"),
        F.col("dup_line_frac"),
        F.col("_top2")["bestg"].alias("top_2gram"),
        F.when(
            F.col("_den2") > 0,
            F.round(
                F.col("_top2")["best"]
                * F.length(F.col("_top2")["bestg"])
                / F.col("_den2"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("top_2gram_frac"),
        F.when(
            F.col("_den5") > 0,
            F.round(F.col("_dup5")["dup"] / F.col("_den5"), 6),
        ).otherwise(F.lit(0.0)).alias("dup_5gram_frac"),
    )


def repetition_stats_full(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """The COMPLETE Gopher repetition-filter family (Rae et al. 2021,
    appendix A1.1, Table A1 — the full 13-metric battery, of which
    ``repetition_stats`` computes the three representatives):

    - ``dup_line_frac`` / ``dup_para_frac`` — fraction of non-empty
      trimmed lines / paragraphs that repeat an earlier one;
    - ``dup_line_char_frac`` / ``dup_para_char_frac`` — fraction of
      line/paragraph characters inside items occurring more than once
      (ALL occurrences charged once the item repeats);
    - ``top_{2,3,4}gram_frac`` — fraction of n-gram-stream characters
      covered by the most frequent word n-gram (ties break toward the
      lexicographically smallest gram);
    - ``dup_{5..10}gram_frac`` — fraction of n-gram-stream characters
      inside n-grams occurring more than once.

    Same scale contract as ``repetition_stats``: ZERO shuffle, no
    explode/groupBy — per-row sorted-array run folds. Each of the 11
    sorted arrays (lines, paragraphs, grams n=2..10) is materialized
    exactly once in a staged projection, and each fold carries its
    denominator in the accumulator struct so every array is traversed
    exactly once. Paragraphs split on a literal blank line ("\\n\\n"),
    trimmed, empties dropped — mirrored verbatim in the oracle.
    """
    t = X.tokens_col(text_col)
    n = F.size(t)
    empty = F.array().cast("array<string>")
    txt = F.coalesce(F.col(text_col), F.lit(""))

    def _items(sep: str):
        return F.filter(
            F.transform(F.split(txt, sep), lambda x: F.trim(x)),
            lambda x: x != "",
        )

    def _grams(k: int):
        if k == 2:
            return F.when(
                n >= 2,
                F.zip_with(
                    F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(empty)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j) for j in range(k)]
                ),
            ),
        ).otherwise(empty)

    lines, paras = _items("\n"), _items("\n\n")

    def _dup_item_frac(items):
        cnt = F.size(items)
        return F.when(
            cnt > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(items)) / cnt, 6),
        ).otherwise(F.lit(0.0))

    # stage 1: every sorted array once; the cheap scalar fracs inline
    staged = spread_to_parallelism(docs).select(
        F.col(id_col),
        _dup_item_frac(lines).alias("dup_line_frac"),
        _dup_item_frac(paras).alias("dup_para_frac"),
        F.array_sort(lines).alias("_ls"),
        F.array_sort(paras).alias("_ps"),
        *[F.array_sort(_grams(k)).alias(f"_g{k}s") for k in range(2, 11)],
    )

    zero = F.lit(0).cast("long")

    # one traversal per sorted array: run-length fold that also
    # accumulates the char denominator
    def _dup_fold(col):
        def step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                F.lit(1).cast("long")
            )
            add = (
                F.when(run == 2, F.length(x) * 2)
                .when(run > 2, F.length(x))
                .otherwise(F.lit(0))
            ).cast("long")
            return F.struct(
                x.alias("prev"), run.alias("run"),
                (acc["dup"] + add).alias("dup"),
                (acc["den"] + F.length(x)).alias("den"),
            )

        return F.aggregate(
            col,
            F.struct(F.lit("").alias("prev"), zero.alias("run"),
                     zero.alias("dup"), zero.alias("den")),
            step,
        )

    def _top_fold(col):
        def step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                F.lit(1).cast("long")
            )
            better = run > acc["best"]
            return F.struct(
                x.alias("prev"), run.alias("run"),
                F.when(better, run).otherwise(acc["best"]).alias("best"),
                F.when(better, x).otherwise(acc["bestg"]).alias("bestg"),
                (acc["den"] + F.length(x)).alias("den"),
            )

        return F.aggregate(
            col,
            F.struct(F.lit("").alias("prev"), zero.alias("run"),
                     zero.alias("best"), F.lit("").alias("bestg"),
                     zero.alias("den")),
            step,
        )

    # stage 2: one fold column per metric family
    folded = staged.select(
        F.col(id_col), F.col("dup_line_frac"), F.col("dup_para_frac"),
        _dup_fold(F.col("_ls")).alias("_lf"),
        _dup_fold(F.col("_ps")).alias("_pf"),
        *[_top_fold(F.col(f"_g{k}s")).alias(f"_t{k}") for k in (2, 3, 4)],
        *[_dup_fold(F.col(f"_g{k}s")).alias(f"_d{k}") for k in range(5, 11)],
    )

    def _dup_frac(name):
        s = F.col(name)
        return F.when(
            s["den"] > 0, F.round(s["dup"] / s["den"], 6)
        ).otherwise(F.lit(0.0))

    def _top_frac(name):
        s = F.col(name)
        return F.when(
            s["den"] > 0,
            F.round(s["best"] * F.length(s["bestg"]) / s["den"], 6),
        ).otherwise(F.lit(0.0))

    # stage 3: cheap field arithmetic
    return folded.select(
        F.col(id_col),
        F.col("dup_line_frac"),
        _dup_frac("_lf").alias("dup_line_char_frac"),
        F.col("dup_para_frac"),
        _dup_frac("_pf").alias("dup_para_char_frac"),
        *[_top_frac(f"_t{k}").alias(f"top_{k}gram_frac") for k in (2, 3, 4)],
        *[_dup_frac(f"_d{k}").alias(f"dup_{k}gram_frac")
          for k in range(5, 11)],
    )


GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and",
                             "that", "have", "with")


def gopher_quality_signals(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", min_words: int = 50,
                           max_words: int = 100_000) -> DataFrame:
    """The Gopher quality-signal battery (Rae et al. 2021 app. A1.1,
    Table A1 — the filters BESIDE the repetition family): word-count
    bounds, mean word length in [3, 10], '#' and '...' symbol-to-word
    ratios ≤ 0.1, ≤90% bullet-started lines, ≤30% ellipsis-ended
    lines, ≥80% words containing an alphabetic character, and ≥2 hits
    from the 8 required stopwords — plus the combined pass flag a
    Gopher-style gate would threshold on.

    Pure scan-side projection: token/line arrays are materialized once
    per row and every signal is an HOF fold or regex count over them —
    no shuffle, no UDF; at 100 TB this widens the scan and nothing
    else. The DuckDB oracle replays each signal with list functions,
    so the numbers (and the boolean) are engine-bit-identical."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    out = (
        spread_to_parallelism(docs)
        .select(
            F.col(id_col),
            c.alias("_t"),
            X.tokens_col(text_col).alias("_toks"),
            F.filter(
                F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
                lambda x: x != "",
            ).alias("_ls"),
        )
        .select(
            F.col(id_col),
            F.col("_t"),
            F.col("_ls"),
            F.col("_toks"),
            F.size("_toks").alias("n_words"),
        )
    )
    n = F.col("n_words")
    n1 = F.greatest(n, F.lit(1))
    nl1 = F.greatest(F.size("_ls"), F.lit(1))
    wordlen_sum = F.aggregate(
        "_toks", F.lit(0), lambda acc, x: acc + F.length(x)
    )
    hash_cnt = F.length("_t") - F.length(F.regexp_replace("_t", "#", ""))
    ellipsis_cnt = (
        F.length("_t") - F.length(F.regexp_replace("_t", "\\.\\.\\.", ""))
    ) / F.lit(3)
    bullet_lines = F.size(F.filter("_ls", lambda x: x.rlike("^[-*•]")))
    ellipsis_lines = F.size(F.filter("_ls", lambda x: x.rlike("\\.{3}$")))
    alpha_words = F.size(F.filter("_toks", lambda x: x.rlike("[a-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct("_toks"),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS]),
        )
    )
    sig = out.select(
        F.col(id_col),
        n.cast("int").alias("n_words"),
        F.round(wordlen_sum.cast("double") / n1, 6).alias("mean_word_len"),
        F.round(hash_cnt.cast("double") / n1, 6).alias("hash_word_ratio"),
        F.round(ellipsis_cnt.cast("double") / n1, 6).alias(
            "ellipsis_word_ratio"
        ),
        F.round(bullet_lines.cast("double") / nl1, 6).alias(
            "bullet_line_frac"
        ),
        F.round(ellipsis_lines.cast("double") / nl1, 6).alias(
            "ellipsis_line_frac"
        ),
        F.round(alpha_words.cast("double") / n1, 6).alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stop_hits"),
    )
    def gate(min_w: int, min_stops: int):
        return (
            (F.col("n_words") >= min_w)
            & (F.col("n_words") <= max_words)
            & (F.col("mean_word_len") >= 3.0)
            & (F.col("mean_word_len") <= 10.0)
            & (F.col("hash_word_ratio") <= 0.1)
            & (F.col("ellipsis_word_ratio") <= 0.1)
            & (F.col("bullet_line_frac") <= 0.9)
            & (F.col("ellipsis_line_frac") <= 0.3)
            & (F.col("alpha_word_frac") >= 0.8)
            & (F.col("stop_hits") >= min_stops)
        )

    # passes_gopher uses the PUBLISHED thresholds (≥50 words, ≥2 of
    # the 8 required stopwords) and is near-constant FALSE on the
    # synthetic corpus (it is not English prose); passes_adapted
    # relaxes only the corpus-shaped knobs (≥25 words, ≥1 stopword)
    # so the conjunction logic is exercised in BOTH directions by the
    # oracle hash — the signal columns pin the arithmetic either way.
    return sig.withColumn("passes_gopher", gate(min_words, 2)).withColumn(
        "passes_adapted", gate(min(25, min_words), 1)
    )
