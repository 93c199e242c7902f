"""As-of (nearest-prior) joins — the temporal lookup the reference's
month-keyed FX join (J7) generalizes to: each left row takes the most
recent right row at or before its timestamp.

Two physical strategies with identical semantics:

- ``asof_join_broadcast``: theta join (right_ts <= left_ts) against a
  broadcast right side + min_by winner.  Right side must be small
  (rate tables, config changes) — the common case.
- ``asof_join_union``: the scale path when BOTH sides are large: tag
  and union the two streams, one window pass ordered by time carries
  the last right-row payload forward onto left rows.  One shuffle on
  (keys, time), no pairwise join at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    on: Sequence[str] = (),
) -> DataFrame:
    cond = F.col(right_ts) <= F.col(left_ts)
    for k in on:
        cond = (left[k] == right[k]) & cond
    lid = "__asof_id"
    lefti = left.withColumn(lid, F.monotonically_increasing_id())
    matched = lefti.join(F.broadcast(right), on=cond, how="inner")
    win = (
        matched.groupBy(lid)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]), F.col(right_ts)
            ).alias("__p")
        )
        .select(lid, "__p.*")
    )
    return lefti.join(win, on=lid, how="left").drop(lid)


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    on: Sequence[str] = (),
) -> DataFrame:
    """Union-and-carry-forward: right rows become markers; a last_value
    window (ignoring nulls) propagates the latest marker payload onto
    each left row.  Sort key breaks ties so a right row at exactly
    left_ts is visible to that left row."""
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__p_{c}") for c in payload],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    if on:
        # keep the key columns real on the right side
        r_tagged = right.select(
            *[
                (F.col(c) if c in on else F.lit(None).cast(dict(left.dtypes).get(c, "string"))).alias(c)
                for c in lcols
            ],
            F.col(right_ts).alias("__t"),
            F.lit(0).alias("__is_left"),
            *[F.col(c).alias(f"__p_{c}") for c in payload],
        )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*[F.col(k) for k in on])
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload:
        u = u.withColumn(f"__p_{c}", F.last(f"__p_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("__is_left") == 1).drop("__t", "__is_left")
    for c in payload:
        out = out.withColumnRenamed(f"__p_{c}", c)
    return out
