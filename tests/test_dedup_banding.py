"""Completeness property for the simhash chunk-banded candidate filter
(the round-1 defect class): for any radius r and chunks >= r+1, the
banded join must find EVERY pair within hamming distance r — verified
against a brute-force all-pairs computation on synthetic hashes with
planted near-duplicates."""

import random

import pytest


def _planted_hashes(n: int, radius: int, seed: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 3 == 2 and rows:
            # plant a near-duplicate of an earlier hash: flip <= radius bits
            base = rows[rng.randrange(len(rows))][1]
            h = base
            for b in rng.sample(range(60), rng.randint(0, radius)):
                h ^= 1 << b
        else:
            h = rng.getrandbits(60)
        rows.append((i, h))
    return rows


def _brute_pairs(rows, radius):
    out = set()
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1 :]:
            if bin(ha ^ hb).count("1") <= radius:
                out.add((ia, ib))
    return out


@pytest.mark.parametrize("radius", [3, 7, 11])
def test_banded_near_pairs_complete(spark, radius):
    from ocr_engine_spark.operators.dedup import simhash_near_pairs

    rows = _planted_hashes(120, radius, seed=radius * 101)
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(df, max_hamming=radius).collect()
    }
    want = _brute_pairs(rows, radius)
    assert got == want  # complete AND exact (verify step filters > r)


def test_banding_rejects_underprovisioned_chunks(spark):
    from ocr_engine_spark.operators.dedup import simhash_near_pairs

    df = spark.createDataFrame([(0, 1)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="cannot guarantee recall"):
        simhash_near_pairs(df, max_hamming=8, chunks=4)
    with pytest.raises(ValueError, match="exceeds bits"):
        simhash_near_pairs(df, max_hamming=70)


def test_uneven_chunk_widths_cover_all_bits(spark):
    """60 bits over 8 chunks → widths 8×4 + 7×4; two hashes differing
    only in the top bit (59) must still collide on 7 identical chunks
    and be found."""
    from ocr_engine_spark.operators.dedup import simhash_near_pairs

    a = (1 << 59) | 0x5A5A5A5A5A5A5A
    rows = [(0, a), (1, a ^ (1 << 59))]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = simhash_near_pairs(df, max_hamming=7).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(0, 1, 1)]


def test_winnow_containment_finds_planted_excerpt(spark):
    """A document that is a verbatim excerpt of another must pair with
    high containment; unrelated docs must not pair at the threshold."""
    from ocr_engine_spark.operators.dedup import winnow_containment_pairs

    big = ("the quick brown fox jumps over the lazy dog while carrying "
           "a remarkably heavy basket of freshly picked strawberries "
           "down the winding mountain path toward the village market")
    excerpt = ("a remarkably heavy basket of freshly picked strawberries "
               "down the winding mountain path")
    other = ("completely different content about orbital mechanics and "
             "the numerical integration of perturbed two body systems")
    df = spark.createDataFrame(
        [(0, big), (1, excerpt), (2, other)], "doc_id long, text string"
    )
    rows = winnow_containment_pairs(df, threshold=0.5).collect()
    pairs = {(r.id_a, r.id_b): r.containment for r in rows}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.8
    assert all(2 not in p for p in pairs)


def test_top_terms_rational_idf_ranks_rare_terms(spark):
    """A term unique to one doc must outrank a corpus-wide term with
    equal tf; ranks are dense 1..k with deterministic tie-break."""
    from ocr_engine_spark.operators.textstats import top_terms

    df = spark.createDataFrame(
        [(0, "alpha shared shared"), (1, "beta shared shared"),
         (2, "gamma shared shared")],
        "doc_id long, text string",
    )
    out = top_terms(df, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tf, r.df))
    for did, uniq in ((0, "alpha"), (1, "beta"), (2, "gamma")):
        got = sorted(by_doc[did])
        # unique term (tf=1, df=1) scores 1*(3-1+.5)/1.5 = 1.667;
        # shared (tf=2, df=3) scores 2*(3-3+.5)/3.5 = 0.286
        assert got[0][1] == uniq and got[0][0] == 1
        assert got[1][1] == "shared" and got[1][2] == 2 and got[1][3] == 3


# ---------------------------------------------------------------- exact
# substring dedup (Lee et al. 2022, windowed-fingerprint form): coverage
# values are hand-computable on a planted shared span.


def test_exact_substring_coverage_planted_span(spark):
    from ocr_engine_spark.operators.dedup import exact_substring_coverage

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, run),                      # 10 toks, all 3 windows shared
            (2, "one two three " + run),   # 13 toks, windows 4..6 shared
            (3, "short text only"),        # < k tokens: no windows
            (4, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"),  # unique
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in exact_substring_coverage(docs, k=8).collect()
    }
    # doc 1: dup starts {1,2,3} -> union covers 1+1+8 = 10 of 10 tokens
    assert out[1]["n_windows"] == 3
    assert out[1]["n_dup_windows"] == 3
    assert out[1]["dup_token_coverage"] == 1.0
    # doc 2: dup starts {4,5,6} -> 10 of 13 tokens
    assert out[2]["n_windows"] == 6
    assert out[2]["n_dup_windows"] == 3
    assert out[2]["dup_token_coverage"] == round(10 / 13, 6)
    # doc 3: too short for any window
    assert out[3]["n_windows"] == 0
    assert out[3]["n_dup_windows"] == 0
    assert out[3]["dup_token_coverage"] == 0.0
    # doc 4: windows exist but none duplicated
    assert out[4]["n_windows"] == 5
    assert out[4]["n_dup_windows"] == 0
    assert out[4]["dup_token_coverage"] == 0.0


def test_exact_substring_disjoint_spans_do_not_bridge(spark):
    """Two separated duplicated spans must each contribute their own
    interval — the lead()-union must not over-count the gap."""
    from ocr_engine_spark.operators.dedup import exact_substring_coverage

    s1 = "a1 a2 a3 a4 a5 a6 a7 a8"            # 8 toks -> 1 window
    s2 = "b1 b2 b3 b4 b5 b6 b7 b8"
    gap = "g1 g2 g3 g4 g5 g6 g7 g8 g9 g10"    # unique filler
    docs = spark.createDataFrame(
        [
            (1, f"{s1} {gap} {s2}"),  # 26 toks
            (2, s1),
            (3, s2),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in exact_substring_coverage(docs, k=8).collect()
    }
    # doc 1: dup windows at starts 1 and 19 only -> 8 + 8 = 16 of 26
    assert out[1]["n_dup_windows"] == 2
    assert out[1]["dup_token_coverage"] == round(16 / 26, 6)


def test_exact_substring_rejects_degenerate_k(spark):
    from ocr_engine_spark.operators.dedup import exact_substring_coverage

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        exact_substring_coverage(docs, k=1)
