"""Batch sessionization: assign gap-based session ids per entity.

The streaming twin is ``F.session_window`` (streaming/jobs.py); this is
the batch/backfill form a training-data pipeline needs when replaying a
full event log.  Semantics follow the classic gap rule: a new session
starts when the time since the previous event of the same entity exceeds
``gap``.

Scale notes
-----------
One shuffle on the entity key (the window partition), then two window
passes over entity-local sorted runs — no further exchange.  Per-entity
event counts are the skew axis: at 100 TB a celebrity-key entity is
bounded by its own event count, not table size, so the window stays
tractable; for pathological single-key logs pre-split by day first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_seq",
) -> DataFrame:
    """Add ``session_col``: 1-based session sequence number per entity.

    A row opens a new session when it is the entity's first event or
    arrives more than ``gap_seconds`` after the previous event
    (strictly greater — an event exactly at the gap continues the
    session, matching Spark's session_window close-on-exceed rule).
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_seconds)
    ).cast("int")
    # cumulative sum of session-open flags = session sequence number
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-entity session summary: session count, events in the largest
    session, and total span seconds summed over sessions."""
    s = sessionize(df, entity_col, ts_col, gap_seconds)
    per_session = s.groupBy(entity_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("span_s"),
    )
    return per_session.groupBy(entity_col).agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("span_s").alias("total_span_s"),
    )


def session_intervals(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per (entity, session): start/end timestamps and event
    count.  Same single entity-key shuffle as ``sessionize`` — the
    per-session group-by rides the window's partitioning (subset rule).
    The natural left side of ``range_join.interval_overlap_join``."""
    s = sessionize(df, entity_col, ts_col, gap_seconds)
    return s.groupBy(entity_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )
