"""Custom stateful streaming operator via applyInPandasWithState.

Built-in operators cover windows/sessions/dedup (jobs.py); this module
is the escape hatch for semantics they can't express — here, a
per-user running profile (event count, value sum, max value) that
emits an updated row on every micro-batch touching the user and closes
the state after an inactivity timeout.

State is bounded: one small tuple per active user, dropped on timeout.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _make_update_fn(timeout_ms: int | None):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, s, m = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "sum_value": s,
                  "max_value": m, "closed": True}]
            )
            return

        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            m = max(m, float(pdf["value"].max()))
        state.update((n, s, m))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "sum_value": s,
              "max_value": m, "closed": False}]
        )

    return update


def user_profiles(events: DataFrame, timeout_minutes: int | None = None) -> DataFrame:
    """Streaming per-user running profile.

    ``timeout_minutes``: inactivity horizon after which state closes
    (ProcessingTimeTimeout) — use in continuous deployments.  Default
    None = NoTimeout: REQUIRED for availableNow/batch drains, where a
    pending processing-time timer keeps the query cycling empty
    micro-batches until the wall-clock timer expires.
    """
    conf = (
        GroupStateTimeout.NoTimeout
        if timeout_minutes is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(None if timeout_minutes is None else timeout_minutes * 60_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas twin: the successor API with typed,
# named state variables (ValueState/ListState/MapState), optional TTL,
# and explicit timers — same per-user profile semantics as
# ``user_profiles`` above, for migration parity.
# ---------------------------------------------------------------------------


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class ProfileProcessor(StatefulProcessor):
    """StatefulProcessor keeping one ValueState tuple per user."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("profile", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (user_id,) = key
        n, s, m = (
            self._state.get() if self._state.exists() else (0, 0.0, float("-inf"))
        )
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
            m = max(m, float(pdf["value"].max()))
        self._state.update((n, s, m))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "sum_value": s,
                    "max_value": m,
                    "closed": False,
                }
            ]
        )

    def close(self) -> None:
        pass


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """``user_profiles`` on the transformWithStateInPandas API (Spark 4):
    named typed state instead of a single opaque tuple, so an operator
    can grow additional state variables (lists, maps, TTLs, timers)
    without re-encoding everything — the forward path for custom
    stateful operators; applyInPandasWithState remains for back-compat.

    Requires the ``protobuf`` package (the state-server protocol is
    proto-encoded); raises ImportError upfront where it is absent so
    the failure is a clear dependency message, not a crashed worker."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package; "
            "use stateful.user_profiles (applyInPandasWithState) instead"
        ) from e
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
