"""Multi-probe LSH mask properties (similarity.multiprobe_masks) —
the driver gate covers the end-to-end queries; these pin the probe-set
arithmetic itself."""

from __future__ import annotations

from math import comb

from ocr_engine_spark.operators.similarity import bucket_of, multiprobe_masks


def test_mask_counts_are_binomial_sums():
    for n in (4, 8):
        for r in range(0, 3):
            masks = multiprobe_masks(n, r)
            assert len(masks) == sum(comb(n, i) for i in range(r + 1))
            assert len(set(masks)) == len(masks)


def test_masks_have_bounded_popcount_and_width():
    masks = multiprobe_masks(8, 2)
    assert 0 in masks  # radius 0 probe = the query bucket itself
    for m in masks:
        assert m < 2 ** 8
        assert bin(m).count("1") <= 2


def test_probe_sets_nest_by_radius():
    prev: set = set()
    for r in range(0, 4):
        cur = set(multiprobe_masks(8, r))
        assert prev <= cur
        prev = cur


def test_bucket_of_matches_mask_flip_semantics():
    # flipping exactly the sign of plane j moves the bucket by xor(1<<j)
    planes = [[1, -1], [-1, 1]]
    vec = [2.0, 1.0]  # plane0 dot = 1 > 0; plane1 dot = -1 < 0
    assert bucket_of(vec, planes) == 1
    flipped = [[-1, 1], [-1, 1]]  # negate plane 0
    assert bucket_of(vec, flipped) == bucket_of(vec, planes) ^ 1
