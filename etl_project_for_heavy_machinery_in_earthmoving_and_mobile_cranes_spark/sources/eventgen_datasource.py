"""Spark 4 Python streaming Data Source: a deterministic synthetic
event generator for exercising/benchmarking streaming jobs without
external infrastructure:

    spark.dataSource.register(EventGenDataSource)
    spark.readStream.format("eventgen") \
        .option("rowsPerBatch", 100).option("maxRows", 1000).load()

Emits the same shape as the `events` test table (event_id, ts_s,
user_id, event_type, value), derived purely from the event index via
the md5 construction the batch operators use — so any window/agg result
over the stream can be PRE-COMPUTED in batch (or DuckDB) for the exact
same ids, which is what the streaming tests do.

Offset model: the offset is just the next event index.  Each microbatch
covers [start, min(start + rowsPerBatch, maxRows)) — contiguous,
replayable, and independent of wall-clock, so checkpoint recovery
re-produces identical batches (the Data Source contract).  A real
deployment swaps this class for a Kafka/queue source; every downstream
job is unchanged.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_s", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_TYPES = ["view", "click", "purchase", "signup", "error"]
_EPOCH0 = 1704067200  # 2024-01-01 UTC


def _h(i: int, salt: str) -> int:
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)


def _row(i: int):
    return (
        i,
        _EPOCH0 + i * 7 % 2592000,
        _h(i, "u") % 1000,
        _TYPES[_h(i, "t") % len(_TYPES)],
        round((_h(i, "v") % 100000) / 100.0, 2),
    )


class _Reader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 10**9))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        lo = start["idx"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return iter([_row(i) for i in range(lo, hi)]), {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: pure function of the index range
        return iter([_row(i) for i in range(start["idx"], end["idx"])])


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema):
        return _Reader(self.options)
