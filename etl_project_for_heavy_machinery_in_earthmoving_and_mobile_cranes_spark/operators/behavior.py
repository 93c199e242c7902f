"""Event-behavior analytics: funnel conversion and state-transition counts.

The reference pipeline is batch customs data, but its analysis module
(key_players_table, prog.py:610-645) is exactly the "how do segments
convert / flow" question asked of event streams; these two operators
are the event-side analogs a production engine needs next to
sessionization (`operators/sessionize.py`).

Scale notes
-----------
- ``funnel_counts``: ONE hash aggregate over the events table (conditional
  mins per stage, map-side partial agg), then arithmetic on a per-user
  table that is |users| rows — no window, no self-join, no shuffle beyond
  the user-key aggregate.  At 100 TB this is the cheapest possible shape:
  stage count is a column count, not a pass count.
- ``transition_counts``: one window shuffle on the user key (same skew
  profile as sessionization — a celebrity user costs its own event count,
  nothing more), then a vocabulary-sized (|states|²) hash aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """First-touch funnel: users reaching each stage of ``stages`` in order.

    A user "reaches" stage k when every stage 0..k has at least one event
    and the *earliest* occurrences are in non-decreasing time order
    (min-ts chain).  This is the standard first-touch approximation: it
    never credits a later re-entry (a purchase before the first view does
    not count even if another purchase follows), which keeps the whole
    computation inside one aggregate pass.

    Returns one row per stage: (stage_idx, stage, users).
    """
    mins = [
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"__t{i}")
        for i, s in enumerate(stages)
    ]
    per_user = events.groupBy(user_col).agg(*mins)

    reached_prev = F.col("__t0").isNotNull()
    reach_flags = [reached_prev]
    for i in range(1, len(stages)):
        reached_prev = (
            reached_prev
            & F.col(f"__t{i}").isNotNull()
            & (F.col(f"__t{i}") >= F.col(f"__t{i-1}"))
        )
        reach_flags.append(reached_prev)

    counts = per_user.agg(
        *[
            F.sum(flag.cast("bigint")).alias(f"__s{i}")
            for i, flag in enumerate(reach_flags)
        ]
    )
    # tall shape via stack: (stage_idx, stage, users) — report-friendly and
    # trivially comparable across engines
    stack_args = ", ".join(
        f"{i}, '{s}', __s{i}" for i, s in enumerate(stages)
    )
    return counts.selectExpr(
        f"stack({len(stages)}, {stack_args}) as (stage_idx, stage, users)"
    )


def transition_counts(
    events: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """Per-key consecutive state transitions, counted corpus-wide.

    ``order_cols`` must be a deterministic total order within each key
    (pass a unique tiebreaker, e.g. ``[ts, event_id]``).  Returns
    (src, dst, n, users): global transition count and distinct keys that
    made the transition at least once.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        events.select(
            F.col(key_col),
            F.lag(F.col(state_col)).over(w).alias("src"),
            F.col(state_col).alias("dst"),
        )
        .filter(F.col("src").isNotNull())
    )
    return pairs.groupBy("src", "dst").agg(
        F.count("*").alias("n"),
        F.count_distinct(F.col(key_col)).alias("users"),
    )
