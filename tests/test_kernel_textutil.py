"""Unit tests: slugify / clamp / keep-longer / JSON probe / flatten
(SURVEY.md §5.2.3 edge-case list)."""

import math

from ocr_engine_spark.kernel import textutil as T
from ocr_engine_spark.kernel import tooljson as J


# ---- slugify (/root/reference/app.py:187-191) ----

def test_slugify_basic():
    assert T.slugify("Invoice Number") == "invoice_number"


def test_slugify_collapses_runs_and_strips():
    assert T.slugify("  --Total (USD)__ ") == "total_usd"


def test_slugify_empty_fallback():
    assert T.slugify("") == "field"
    assert T.slugify(None) == "field"
    assert T.slugify("!!!") == "field"


def test_slugify_unicode_is_non_alnum():
    assert T.slugify("नमस्ते") == "field"
    assert T.slugify("naïve plan") == "na_ve_plan"


def test_slugify_truncates_80():
    assert T.slugify("a" * 100) == "a" * 80
    # truncation happens AFTER collapse/strip
    assert len(T.slugify("x " * 100)) == 80


# ---- clamp_conf (/root/reference/app.py:226-231) ----

def test_clamp_basic():
    assert T.clamp_conf(0.7) == 0.7
    assert T.clamp_conf(-3) == 0.0
    assert T.clamp_conf(42) == 1.0
    assert T.clamp_conf("0.25") == 0.25


def test_clamp_unparseable_is_half():
    assert T.clamp_conf("high") == 0.5
    assert T.clamp_conf(None) == 0.5
    assert T.clamp_conf({}) == 0.5


def test_clamp_nan_passthrough():
    # parity quirk: NaN parses and survives both comparisons
    assert math.isnan(T.clamp_conf(float("nan")))


# ---- merge_keep_longer (/root/reference/ocr_any.py:229-235) ----

def test_keep_longer_strictly_greater():
    dst = {"k": "abc"}
    T.merge_keep_longer(dst, {"k": "xyz"})  # same length → first wins
    assert dst["k"] == "abc"
    T.merge_keep_longer(dst, {"k": "wxyz"})  # longer → replaced
    assert dst["k"] == "wxyz"


def test_keep_longer_falsy_never_overwrites():
    dst = {"k": "abc"}
    T.merge_keep_longer(dst, {"k": "", "j": 0, "i": None})
    assert dst == {"k": "abc"}


def test_keep_longer_str_rendering_length():
    dst = {"k": 5}
    T.merge_keep_longer(dst, {"k": 123})  # len("123") > len("5")
    assert dst["k"] == 123


# ---- normalize_lines ----

def test_normalize_lines():
    assert T.normalize_lines("a \nb\t\n \n\nc\r") == ["a", "b", "c"]
    assert T.normalize_lines("") == []
    assert T.normalize_lines(None) == []


# ---- minified JSON (X5 fixture-exact) ----

def test_to_min_json_default_separators_and_unicode():
    assert T.to_min_json({"a": 1, "b": "नमस्ते"}) == '{"a": 1, "b": "नमस्ते"}'


def test_has_devanagari():
    assert T.has_devanagari("abc नमस्ते")
    assert not T.has_devanagari("abc")
    assert not T.has_devanagari(None)


# ---- first_json_object (/root/reference/app.py:214-224) ----

def test_json_probe_empty_and_absent():
    assert J.first_json_object("") == {}
    assert J.first_json_object(None) == {}
    assert J.first_json_object("no braces here") == {}


def test_json_probe_greedy_first_to_last_brace():
    # DOTALL greedy: {.*} spans first "{" to LAST "}" — two valid
    # objects concatenated therefore FAIL to parse → {}
    assert J.first_json_object('{"a": 1} {"b": 2}') == {}
    assert J.first_json_object('x {"a": {"n": [1, 2]}} y') == {"a": {"n": [1, 2]}}


def test_json_probe_malformed():
    assert J.first_json_object("{broken: [}") == {}


def test_flatten_json_order_and_rendering():
    obj = {"b": 1, "a": {"x": "s"}, "l": [True, None], "e": {}, "m": []}
    assert J.flatten_json(obj) == [
        "b: 1",
        'a.x: "s"',
        "l[0]: true",
        "l[1]: null",
        "e: {}",
        "m: []",
    ]
    assert J.flatten_json({}) == []
