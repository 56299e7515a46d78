"""Oracle-parity preconditions on the driver corpus (ADVICE r2/r3).

The checks themselves live in ``ocr_engine_spark.kernel.
corpus_invariants`` and are SHARED with ``scripts/check_correctness.py``
(VERDICT r3 item 7): a datagen change that breaks a corpus-coupled
oracle assumption fails loudly here AND refuses to run the gate,
instead of silently desyncing the engine and its oracle. See that
module's docstring for the full invariant rationale.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from ocr_engine_spark.kernel.corpus_invariants import violations

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "documents.parquet"))
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_corpus_oracle_preconditions(sf_dir):
    con = duckdb.connect()
    p = os.path.join(sf_dir, "documents.parquet")
    assert violations(con, p) == []


def test_violations_flags_braces(tmp_path):
    """A corpus with a JSON-object substring must be rejected — the
    malformed tool-arm oracle hardcodes parse_failed=1 (ADVICE r3)."""
    con = duckdb.connect()
    p = str(tmp_path / "documents.parquet")
    con.execute(
        "COPY (SELECT 1 AS doc_id, 'has a ' || chr(123) || 'k: 1' || chr(125)"
        " AS text) TO '" + p + "' (FORMAT PARQUET)"
    )
    out = violations(con, p)
    assert any("'{' or '}'" in v for v in out)


def test_violations_flags_entities_and_cr(tmp_path):
    con = duckdb.connect()
    p = str(tmp_path / "documents.parquet")
    con.execute(
        "COPY (SELECT * FROM (VALUES (1, 'a &amp; b'), (2, 'x' || chr(13)),"
        " (3, NULL)) t(doc_id, text)) TO '" + p + "' (FORMAT PARQUET)"
    )
    out = violations(con, p)
    assert len(out) >= 3
