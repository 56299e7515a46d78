"""Static contract checks for the driver gate: every oracle key maps
to a registered query, and every query is callable with the documented
signature. Catches registration drift before the driver's
CORRECTNESS_r{N} run does."""

from __future__ import annotations

import inspect


def test_every_oracle_has_a_query():
    from ocr_engine_spark.catalog import oracle_sql, queries

    q, o = queries(), oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))


def test_queries_have_driver_signature():
    from ocr_engine_spark.catalog import queries

    for name, fn in queries().items():
        params = list(inspect.signature(fn).parameters)
        assert params[:2] == ["spark", "sf_dir"], name


def test_oracle_sql_mentions_only_registered_tables():
    from ocr_engine_spark.catalog import oracle_sql

    tables = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    import re

    for name, sql in oracle_sql().items():
        froms = re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", sql)
        # CTE names and derived tables are fine; real tables must be known
        ctes = set(re.findall(r"(?:WITH|,)\s*([a-z_][a-z0-9_]*)\s+AS\s*\(", sql, re.I))
        for t in froms:
            # table functions (unnest/range/generate_series) are fine
            assert t in tables or t in ctes or t in (
                "unnest", "range", "generate_series",
            ), (name, t)


def test_readme_query_count_matches_catalog():
    """ADVICE r3: the README's 'N of N' coverage claim went stale when
    queries landed after the doc edit. Pin it to the live catalog —
    and require every query to carry an oracle (zero rows-only)."""
    import os
    import re

    from ocr_engine_spark.catalog import oracle_sql, queries

    q, o = queries(), oracle_sql()
    assert set(o) == set(q), "every catalog query must be oracled"
    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    m = re.search(r"\((\d+) of (\d+), round \d+\)", readme)
    assert m, "README coverage line missing"
    assert int(m.group(1)) == int(m.group(2)) == len(q), (
        f"README claims {m.group(0)}, catalog has {len(q)}"
    )


def test_entry_returns_expected_columns():
    import __spark_entry__ as e

    src = inspect.getsource(e.entry)
    for col in ("conv_id", "turn_idx", "extracted_text", "spans"):
        assert col in src


def test_driver_priority_rotation():
    """VERDICT r4 item 2: the driver's correctness artifact caps at 50
    entries, in queries() dict order — never-driver-recorded queries
    must come FIRST so every catalog entry accumulates a driver row.
    Pins: (a) every priority name actually exists in the registry (a
    typo would silently de-prioritize it), (b) the priority block leads
    the dict, (c) it fits inside the 50-entry driver budget."""
    from ocr_engine_spark.catalog import _DRIVER_PRIORITY, queries

    q = list(queries())
    missing = [n for n in _DRIVER_PRIORITY if n not in set(q)]
    assert not missing, missing
    assert q[: len(_DRIVER_PRIORITY)] == _DRIVER_PRIORITY
    assert len(_DRIVER_PRIORITY) <= 50
