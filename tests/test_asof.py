"""As-of join properties the oracle can't see: planted equal-ts ties,
no-prior-right rows, partition invariance — against a brute-force
driver-side reference."""

import datetime

from pyspark.sql import functions as F

from ocr_engine_spark.operators.asof import asof_join

T0 = datetime.datetime(2024, 1, 1)


def _ts(s):
    return T0 + datetime.timedelta(seconds=s)


def _frames(spark):
    # rights: user 1 has views at t=10 (two ties: ids 100,101), t=30
    # user 2 has none; user 3 has one AFTER its only left row
    rights = spark.createDataFrame(
        [
            (1, _ts(10), 100, 1.0),
            (1, _ts(10), 101, 2.0),
            (1, _ts(30), 102, 3.0),
            (3, _ts(99), 300, 9.0),
        ],
        "user_id LONG, ts TIMESTAMP, event_id LONG, value DOUBLE",
    )
    lefts = spark.createDataFrame(
        [
            (1000, 1, _ts(5)),    # before any view -> null
            (1001, 1, _ts(10)),   # equal ts -> tie -> greatest payload (101)
            (1002, 1, _ts(20)),   # between -> 101 (greatest of the t=10 tie)
            (1003, 1, _ts(31)),   # after t=30 -> 102
            (2000, 2, _ts(50)),   # user with no rights -> null
            (3000, 3, _ts(50)),   # right exists only later -> null
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    return lefts, rights


def test_asof_semantics_ties_and_nulls(spark):
    lefts, rights = _frames(spark)
    out = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(
            lefts, rights, key="user_id", ts="ts",
            payload=("ts", "event_id", "value"),
        ).collect()
    }
    assert out == {
        1000: None,
        1001: 101,  # equal-ts right row IS visible; tie -> max struct
        1002: 101,
        1003: 102,
        2000: None,
        3000: None,
    }


def test_asof_partition_invariant(spark):
    lefts, rights = _frames(spark)
    base = sorted(
        tuple(r)
        for r in asof_join(
            lefts, rights, "user_id", "ts", ("ts", "event_id", "value")
        ).collect()
    )
    shuffled = sorted(
        tuple(r)
        for r in asof_join(
            lefts.repartition(7), rights.repartition(5),
            "user_id", "ts", ("ts", "event_id", "value"),
        ).collect()
    )
    assert base == shuffled


def test_asof_matches_bruteforce_on_random_data(spark):
    import random

    rng = random.Random(7)
    rights_rows = [
        (rng.randrange(8), _ts(rng.randrange(1000)), i, float(i))
        for i in range(200)
    ]
    lefts_rows = [
        (1000 + i, rng.randrange(8), _ts(rng.randrange(1000)))
        for i in range(300)
    ]
    rights = spark.createDataFrame(
        rights_rows, "user_id LONG, ts TIMESTAMP, event_id LONG, value DOUBLE"
    )
    lefts = spark.createDataFrame(
        lefts_rows, "event_id LONG, user_id LONG, ts TIMESTAMP"
    )
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(
            lefts, rights, "user_id", "ts", ("ts", "event_id", "value")
        ).collect()
    }

    def brute(uid, t):
        cands = [(ts, eid, val) for u, ts, eid, val in rights_rows
                 if u == uid and ts <= t]
        return max(cands)[1] if cands else None

    want = {lid: brute(uid, t) for lid, uid, t in lefts_rows}
    assert got == want


def test_sessionize_gap_boundary_and_order(spark):
    from ocr_engine_spark.operators.sessions import session_stats, sessionize

    rows = [
        # user 1: gaps of exactly 10s (same session: > gap is strict),
        # 10.000001s (new session), first event (new)
        (1, 1, _ts(0), 1.0),
        (2, 1, _ts(10), 2.0),                      # 10s == gap -> same
        (3, 1, _ts(10) + datetime.timedelta(microseconds=10_000_001), 4.0),
        (4, 2, _ts(5), 8.0),                        # other key independent
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE"
    )
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(ev, gap_s=10).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}
    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["value_sum"])
        for r in session_stats(ev, gap_s=10).collect()
    }
    assert stats[(1, 1)] == (2, 3.0)
    assert stats[(1, 2)] == (1, 4.0)
    assert stats[(2, 1)] == (1, 8.0)
