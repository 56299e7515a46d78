"""Sessionization — gap-based session assignment over an event
stream, the standard precursor to funnel/engagement analytics (and, in
a training-data pipeline, to conversation-boundary inference over raw
event logs).

An event starts a new session when it is its key's first event or
arrives more than ``gap`` after the previous one; the session index is
the running count of session starts. Batch shape: ONE exchange on the
key, two expressions over one running window (lag + cumulative sum) —
no self-join, no explode. (Structured Streaming's native
``session_window`` is the streaming twin; the batch form here is
oracle-checkable and drives the per-session stats.)

Scale: per-key partitions stream through WindowExec; a pathologically
hot key concentrates one task, and UNLIKE the extraction case it
cannot be salted directly (sessions span salt boundaries) — the
production mitigation is coarse time-range pre-partitioning with
boundary-session merge, noted here for honesty; at typical web scale
per-user event counts are bounded and the plain window holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(c) -> F.Column:
    return F.unix_micros(F.col(c).cast("timestamp"))


def sessionize(events: DataFrame, gap_s: int = 21600, key: str = "user_id",
               ts: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Per-event session assignment: (key, session_idx) with
    session_idx 1-based in event-time order (ties by id)."""
    w = Window.partitionBy(key).orderBy(ts, id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(_us(ts)).over(w)
    new_s = F.when(
        prev.isNull() | (_us(ts) - prev > gap_s * 1_000_000), 1
    ).otherwise(0)
    return events.select(
        F.col(id_col), F.col(key), F.col(ts),
        new_s.alias("_new"),
    ).select(
        id_col, key,
        F.sum("_new").over(run).cast("long").alias("session_idx"),
    )


def session_stats(events: DataFrame, gap_s: int = 21600,
                  key: str = "user_id", ts: str = "ts",
                  id_col: str = "event_id",
                  value_col: str = "value") -> DataFrame:
    """Per-session aggregates: event count, duration (µs), value sum.
    One additional exchange on (key, session_idx) after the window —
    partial-aggregated map-side."""
    base = events.select(
        F.col(id_col), F.col(key), F.col(value_col), _us(ts).alias("_tus")
    )
    # _tus (epoch µs) orders identically to ts at µs precision
    w = Window.partitionBy(key).orderBy("_tus", id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("_tus").over(w)
    new_s = F.when(
        prev.isNull() | (F.col("_tus") - prev > gap_s * 1_000_000), 1
    ).otherwise(0)
    tagged = base.withColumn("_new", new_s).select(
        id_col, key, value_col, "_tus",
        F.sum("_new").over(run).cast("long").alias("session_idx"),
    )
    return tagged.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("_tus") - F.min("_tus")).alias("duration_us"),
        F.round(F.sum(value_col), 6).alias("value_sum"),
    )
