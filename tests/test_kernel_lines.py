"""Unit truth-table for the line-assembly fold (SURVEY.md §5.2.3).

Every break-type transition, the idempotent space insertion, the
empty-word skip, the tail .strip()/.rstrip() asymmetry
(/root/reference/app.py:308-310 vs 402-406), gap fill and the
page_count = page_idx-or-1 rule.
"""

from ocr_engine_spark.kernel import lines as L


def test_simple_space_breaks():
    words = [("hello", 1), ("world", 5)]
    assert L.assemble_lines(words) == ["hello world"]


def test_space_and_sure_space_idempotent():
    # word already ending in a space suppresses the extra separator
    words = [("a ", 1), ("b", 3), ("c", 2)]
    assert L.assemble_lines(words) == ["a b c"]


def test_eol_sure_flushes_line():
    words = [("one", 2), ("two", 2)]
    assert L.assemble_lines(words) == ["one", "two"]


def test_line_break_flushes_line():
    words = [("x", 5), ("y", None), ("z", 5)]
    assert L.assemble_lines(words) == ["x", "y z"]


def test_empty_word_skipped_break_ignored():
    # an empty word's break must NOT be consulted (reference `continue`)
    words = [("a", 1), ("", 5), ("b", None)]
    assert L.assemble_lines(words) == ["a b"]


def test_no_break_means_space_join_on_next_word():
    words = [("a", None), ("b", None)]
    assert L.assemble_lines(words) == ["a b"]


def test_empty_line_dropped():
    # a break-flush of a whitespace-only buffer emits nothing
    words = [(" ", 5), ("a", 2)]
    # " " word: buf=[" "], br=5 → "".join.rstrip() = "" → dropped
    assert L.assemble_lines(words) == ["a"]


def test_tail_rstrip_vs_strip_asymmetry():
    # buffer ends with leading-space content only if first word starts
    # with a space: rstrip keeps it, strip removes it
    words = [(" padded", None)]
    assert L.assemble_lines(words, L.TAIL_RSTRIP) == [" padded"]
    assert L.assemble_lines(words, L.TAIL_STRIP) == ["padded"]


def test_tail_flush_without_terminal_break():
    words = [("a", 1), ("b", None)]
    assert L.assemble_lines(words) == ["a b"]


def test_flush_line_is_rstripped():
    words = [("a", 1), ("b", 3)]  # trailing SURE_SPACE adds " ", then EOL
    assert L.assemble_lines(words + [("", None)]) == ["a b"]
    words2 = [("a", 3), ("", 2)]  # EOL on empty word ignored → tail flush
    assert L.assemble_lines(words2) == ["a"]


def test_dense_pages_gap_fill():
    per_page = {1: ["x"], 3: ["y", "z"]}
    assert L.dense_pages(per_page, 3) == [(1, "x"), (2, ""), (3, "y\nz")]


def test_dense_pages_min_one_page():
    assert L.dense_pages({}, 0) == [(1, "")]
    assert L.dense_pages({}, 1) == [(1, "")]


def test_page_blocks_skips_blank_and_strips():
    pages = [(1, "  a\nb  "), (2, "   "), (3, "")]
    assert L.page_blocks(pages) == [(1, "Page 1:\na\nb")]
