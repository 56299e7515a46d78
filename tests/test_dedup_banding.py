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
