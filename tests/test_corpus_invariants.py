"""Oracle-parity preconditions on the driver corpus (ADVICE r2).

The multikind/malformed flagship oracles are corpus-coupled in three
places where Spark/Python and DuckDB semantics diverge on exotic input:

- word splitting: kernels collapse with Python ``str.split()`` (any
  Unicode whitespace, incl. VT/FF) while the oracles split on
  ``[ \\t\\n\\r]+``;
- line handling: the pdf arm's oracle never rstrips ``\\r``;
- JSON escaping: the tool arm relies on DuckDB ``to_json(varchar)``
  == Python ``json.dumps(ensure_ascii=False)``, which holds for
  printable ASCII without exotic escapes;
- entity round-trip: the html constructors escape exactly ``& < >``,
  so text containing pre-escaped entities must not exist.

These tests assert the invariants those equalities rely on, so a
datagen change desyncs LOUDLY here instead of silently desyncing the
engine and its oracle.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "documents.parquet"))
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_corpus_oracle_preconditions(sf_dir):
    con = duckdb.connect()
    p = os.path.join(sf_dir, "documents.parquet")
    (n, nulls, nonascii, badws, entity_chars) = con.execute(
        f"""
        SELECT count(*),
               sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
               sum(CASE WHEN regexp_matches(text, '[^\\x20-\\x7e\\n\\t]')
                        THEN 1 ELSE 0 END),
               sum(CASE WHEN text LIKE '%' || chr(13) || '%'
                          OR text LIKE '%' || chr(11) || '%'
                          OR text LIKE '%' || chr(12) || '%'
                        THEN 1 ELSE 0 END),
               sum(CASE WHEN contains(text, '&') OR contains(text, '<')
                          OR contains(text, '>') OR contains(text, '"')
                          OR contains(text, chr(92))
                        THEN 1 ELSE 0 END)
        FROM read_parquet('{p}')
        """
    ).fetchone()
    assert n > 0
    # non-NULL text: Spark to_json drops null struct fields while
    # DuckDB '|| to_json(NULL)' nulls the whole concatenation
    assert nulls == 0
    # printable ASCII + \n + \t only: keeps Python str.split() ==
    # '[ \t\n\r]+' regex split and json.dumps == duckdb to_json
    assert nonascii == 0
    # no CR/VT/FF: the pdf-arm oracle does not model rstrip('\r') and
    # Python str.split() would treat VT/FF as word boundaries
    assert badws == 0
    # no & < > " \: entity round-trip and JSON-escape parity stay exact
    assert entity_chars == 0
