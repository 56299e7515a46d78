"""Oracle-parity preconditions on the driver corpus (ADVICE r2/r3,
VERDICT r3 item 7).

The multikind/malformed flagship oracles are corpus-coupled where
Spark/Python and DuckDB semantics diverge on exotic input:

- word splitting: kernels collapse with Python ``str.split()`` (any
  Unicode whitespace, incl. VT/FF) while the oracles split on
  ``[ \\t\\n\\r]+``;
- line handling: the pdf arm's oracle never rstrips ``\\r``;
- JSON escaping: the tool arm relies on DuckDB ``to_json(varchar)``
  == Python ``json.dumps(ensure_ascii=False)``, which holds for
  printable ASCII without exotic escapes;
- entity round-trip: the html constructors escape exactly ``& < >``,
  so text containing pre-escaped entities must not exist;
- malformed tool arm: its oracle hardcodes ``parse_failed = 1``, which
  is only true while no document text contains a JSON object substring
  — ``{``/``}`` must not appear at all (ADVICE r3).

``violations()`` renders the checks over one documents.parquet so the
pytest suite AND ``scripts/check_correctness.py`` share one source of
truth — a datagen change fails LOUDLY at both the test tier and the
gate tier instead of silently desyncing engine and oracle.
"""

from __future__ import annotations


def violations(con, documents_parquet: str) -> list:
    """Invariant violations for the documents corpus at
    ``documents_parquet``; empty list == safe to trust the
    corpus-coupled oracles. ``con`` is a DuckDB connection."""
    (n, nulls, nonascii, badws, entity_chars, braces) = con.execute(
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
                        THEN 1 ELSE 0 END),
               sum(CASE WHEN contains(text, '{{') OR contains(text, '}}')
                        THEN 1 ELSE 0 END)
        FROM read_parquet('{documents_parquet}')
        """
    ).fetchone()
    out = []
    if not n:
        out.append("documents corpus is empty")
        return out
    if nulls:
        # Spark to_json drops null struct fields while DuckDB
        # '|| to_json(NULL)' nulls the whole concatenation
        out.append(f"{nulls} NULL text rows")
    if nonascii:
        # printable ASCII + \n + \t only keeps Python str.split() ==
        # '[ \t\n\r]+' regex split and json.dumps == duckdb to_json
        out.append(f"{nonascii} rows with non-printable/non-ASCII chars")
    if badws:
        # the pdf-arm oracle does not model rstrip('\r'); Python
        # str.split() would treat VT/FF as word boundaries
        out.append(f"{badws} rows containing CR/VT/FF")
    if entity_chars:
        # entity round-trip and JSON-escape parity stay exact
        out.append(f"{entity_chars} rows containing one of & < > \" \\")
    if braces:
        # the malformed tool-arm oracle hardcodes parse_failed=1; a
        # '{...}' substring would let first_json_object succeed and
        # desync the gate (ADVICE r3)
        out.append(f"{braces} rows containing '{{' or '}}'")
    return out
