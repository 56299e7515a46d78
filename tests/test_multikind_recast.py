"""The multi-kind payload recast (tableio.transcripts_from_documents_
multikind) must construct payloads the kernels decode back to the
documented per-arm extraction — i.e. the native Catalyst constructors
and the Python kernels agree end-to-end. (The driver oracle gate
additionally pins the SQL mirror; this test catches constructor/kernel
drift without DuckDB in the loop.)"""

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver testdata not present",
)


def test_constructed_payloads_roundtrip_through_kernels(spark):
    from ocr_engine_spark.kernel.dispatch import extract_turn
    from ocr_engine_spark.sources.tableio import (
        transcripts_from_documents_multikind,
    )

    rows = transcripts_from_documents_multikind(spark, SF_DIR).collect()
    assert len(rows) == 500
    kinds = {}
    for r in rows:
        res = extract_turn(r.role, r.text)
        did = int(r.conv_id)
        want_kind = ["text", "html", "tool", "pdf"][did % 4]
        assert res["kind"] == want_kind, (did, res["kind"])
        assert res["parse_failed"] == 0, did
        kinds[res["kind"]] = kinds.get(res["kind"], 0) + 1
        if want_kind == "html":
            # h1 first, table rows last — the segments-then-tables order
            spans = res["spans"]
            assert spans[0]["text"] == f"Doc {did}"
            assert spans[-1]["text"].startswith("lang | ")
            assert spans[-2]["text"] == f"doc | {did}"
        elif want_kind == "pdf":
            # shard sort: page 1 (first half) precedes page 2
            if res["extracted_text"]:
                assert res["extracted_text"].startswith("Page ")
        elif want_kind == "tool":
            lines = res["extracted_text"].split("\n")
            assert lines[0] == f"doc: {did}"
            assert lines[-1].startswith("note: ")
    assert kinds == {"text": 125, "html": 125, "tool": 125, "pdf": 125}


def test_pdf_constructor_exercises_shard_sort(spark):
    """The pdf arm puts the first token-half in shard "s0" and the
    second in "s1" but emits them in REVERSE array order — a kernel
    that skipped the name sort would swap pages. Verify page 1 carries
    the first half and page 2 the second, with 5-token lines from the
    planted EOL breaks."""
    from ocr_engine_spark.kernel.dispatch import extract_turn
    from ocr_engine_spark.sources.tableio import (
        transcripts_from_documents_multikind,
    )

    rows = {
        int(r.conv_id): r
        for r in transcripts_from_documents_multikind(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).collect()
    texts = {int(d.doc_id): d.text or "" for d in docs}
    checked = 0
    for did, r in rows.items():
        if did % 4 != 3:
            continue
        tk = (texts[did] or "").split()
        if len(tk) < 12:
            continue
        h = (len(tk) + 1) // 2
        res = extract_turn(r.role, r.text)
        et = res["extracted_text"]
        assert et.startswith("Page 1:\n"), did
        assert "\nPage 2:\n" in et, did
        page1, page2 = et.split("\nPage 2:\n")
        page1 = page1[len("Page 1:\n"):]
        assert page1.split() == tk[:h], did
        assert page2.split() == tk[h:], did
        # planted EOL breaks: first line of each page is 5 tokens
        assert len(page1.split("\n")[0].split()) == 5, did
        checked += 1
        if checked >= 20:
            break
    assert checked >= 10
