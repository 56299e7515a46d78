"""Failure/fallback-ladder semantics of the extraction kernels
(SURVEY.md §2.2 P9; reference parity /root/reference/ocr_any.py:199-213
and app.py:218-224) — the exact behaviors the malformed recast arm
(tableio.transcripts_from_documents_malformed) drives through the
driver hash gate in catalog.extract_fallback_malformed."""

from __future__ import annotations

from ocr_engine_spark.kernel.dispatch import extract_turn


def test_corrupt_base64_pdf_falls_back_with_parse_failed():
    payload = "JVBERi1UT0tF@@hello world"
    res = extract_turn("assistant", payload)
    assert res["kind"] == "pdf"  # magic prefix wins dispatch
    assert res["parse_failed"] == 1
    assert res["blocks_dropped"] == 0
    # deterministic raw-text fallback: the payload itself, one paragraph
    assert res["extracted_text"] == payload
    assert res["blocks_kept"] == 1
    assert [s["kind"] for s in res["spans"]] == ["text"]


def test_truncated_valid_base64_pdf_also_fails():
    # valid base64 alphabet but truncated → not decodable payload
    res = extract_turn("assistant", "JVBERi1UT0tF")
    assert res["kind"] == "pdf"
    assert res["parse_failed"] == 1


def test_unparseable_tool_json_with_braces_counts_parse_failure():
    res = extract_turn("tool", "tool-output {oops not json } [eof]")
    assert res["kind"] == "tool"
    assert res["parse_failed"] == 1
    assert res["extracted_text"] == "tool-output {oops not json } [eof]"


def test_braceless_tool_output_is_fallback_without_failure():
    # no braces at all → the {}-probe fallback is NOT a parse failure
    res = extract_turn("tool", "plain tool text")
    assert res["kind"] == "tool"
    assert res["parse_failed"] == 0
    assert res["extracted_text"] == "plain tool text"


def test_unterminated_script_swallows_interior():
    html = (
        '<h1>Doc 7</h1><p>'
        + " ".join(["word"] * 30)
        + '</p><script>var tag = "<p>never extracted</p>";'
    )
    res = extract_turn("assistant", html)
    assert res["kind"] == "html"
    assert res["parse_failed"] == 0  # tolerant parser: html never fails
    assert "never extracted" not in res["extracted_text"]
    assert res["extracted_text"].startswith("Doc 7")
    # dense 30-word <p> passes the density gate
    assert res["blocks_kept"] == 2
    assert res["blocks_dropped"] == 0


def test_unterminated_script_with_empty_paragraph():
    # empty <p> produces no data chunk at all → not even a dropped block
    res = extract_turn("assistant", "<h1>Doc 7</h1><p></p><script>x(")
    assert res["blocks_kept"] == 1
    assert res["blocks_dropped"] == 0
    assert res["extracted_text"] == "Doc 7"
