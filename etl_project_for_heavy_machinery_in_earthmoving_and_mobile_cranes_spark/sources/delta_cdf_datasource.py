"""Spark 4 Python streaming Data Source tailing a delta_lite commit
log — the incremental-consumption half of the storage story (VERDICT
r8 #2): maintainers WRITE incrementally (touched-file MERGE), and this
source lets downstream consumers READ incrementally, turning each new
commit's add/remove actions into micro-batch rows instead of
re-scanning snapshots.

    spark.dataSource.register(DeltaCdfDataSource)
    spark.readStream.format("delta_cdf") \
        .option("path", table).option("startingVersion", 0).load()

Semantics — FILE-level change feed (the same granularity real Delta
CDF has without per-row change files):
- every data file a commit ADDS with ``dataChange=true`` emits its rows
  as ``_change_type='insert'``;
- every file a commit REMOVES with ``dataChange=true`` emits its rows
  as ``_change_type='delete'``;
- a bucketed-merge rewrite therefore re-emits carried-over rows as a
  delete+insert pair; consumers wanting the row-level net diff apply
  the exceptAll algebra (``delta_lite.read_changes`` is the batch twin
  that does exactly that), while accumulate-style consumers fold
  inserts minus deletes — for ANY commit sequence, the multiset
  ``Σ inserts − Σ deletes`` over versions (v_from, v_to] equals
  ``snapshot(v_to) − snapshot(v_from)``, because the live file set is
  itself the running sum of add/remove actions.  For append-only
  tables (no removes) the feed IS the table.
- OPTIMIZE/compaction/z-order commits rewrite files with
  ``dataChange: true`` in this layer; a consumer that must skip
  layout-only churn filters on the commitInfo operation via
  ``delta_history`` (real Delta marks those ``dataChange: false``;
  delta_lite keeps the conservative marking).

Offset model: the commit VERSION — ``{"version": v}`` covers all
commits ≤ v.  Each micro-batch reads the commit files in
(start, end]; partitions are one-per-changed-file, so a wide commit
fans out across executors, and replay from a checkpoint re-reads the
same immutable commit files (exactly-once with an idempotent sink or
the maintained tables' txn guard).

Backpressure: ``.option("maxCommitsPerBatch", k)`` caps how many
commits one micro-batch spans — without it, a stream catching up on a
long-lived table folds the whole backlog into one giant batch (memory
cliff + exactly-once blast radius).  Under a repeated trigger
(processingTime) the stream drains the backlog k commits per batch,
in order, losslessly.  Under ``trigger(availableNow=True)`` the engine
captures the target offset from the FIRST latestOffset call, so one
RUN drains at most k commits — a bounded catch-up run, not a full
drain; loop runs until ``current_version`` is reached, or leave the
cap unset for full-drain semantics (what the maintainers do).  Removed files stay readable until
``vacuum`` reclaims them — retention must cover consumer lag, the
standard CDF contract.

Scale shape: the per-batch work is O(files changed by the new
commits) — never O(table).  Rows move as Arrow RecordBatches
(``read`` yields pyarrow batches, zero per-row Python), partition
columns reconstitute from the Hive path segments, and the committed
schema is pinned at stream start (files from older schema versions
fill missing columns with NULL, same rule as snapshot reads).
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_CHANGE_COL = "_change_type"
_VERSION_COL = "_commit_version"


def _table_schema(table: str) -> T.StructType:
    from . import delta_lite

    _, meta, _, _ = delta_lite._read_actions(table)
    return T.StructType.fromJson(json.loads(meta["schemaString"]))


def _cdf_schema(table: str) -> T.StructType:
    fields = list(_table_schema(table).fields)
    fields.append(T.StructField(_CHANGE_COL, T.StringType(), False))
    fields.append(T.StructField(_VERSION_COL, T.LongType(), False))
    return T.StructType(fields)


def _partition_values_from_path(rel_path: str) -> dict:
    """Hive-layout partition values encoded in a file's log-relative
    path (``col=val/…/part-….parquet``); the NULL sentinel maps to
    None.  Works for both add and remove actions — removes carry only
    the path, so the path IS the partition-value record."""
    values: dict = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" not in seg:
            continue
        col, raw = seg.split("=", 1)
        values[col] = None if raw == "__HIVE_DEFAULT_PARTITION__" else unquote(raw)
    return values


class _FileChange(InputPartition):
    def __init__(
        self,
        file_path: str,
        rel_path: str,
        change_type: str,
        version: int,
    ):
        self.file_path = file_path
        self.rel_path = rel_path
        self.change_type = change_type
        self.version = version


class _CdfStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.table = options.get("path") or options.get("table")
        if not self.table:
            raise ValueError("delta_cdf requires .option('path', <table dir>)")
        self.starting_version = int(options.get("startingVersion", 0))
        # backpressure: cap how many upstream commits one micro-batch
        # may span (the delta_cdf analog of maxFilesPerTrigger) — a
        # stream catching up on a long-lived table otherwise folds the
        # WHOLE backlog into one giant batch, which is both a memory
        # cliff and an exactly-once blast radius
        self.max_commits = int(options.get("maxCommitsPerBatch", 0)) or None
        self.schema_json = _cdf_schema(self.table).json()
        # the engine's last planned end-offset, observed via
        # partitions(start, end) — the runner keeps ONE reader instance
        # per query but never calls commit(), so partitions() is the
        # only reliable position signal for pacing
        self._planned: "int | None" = None

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        from . import delta_lite

        v = delta_lite.current_version(self.table)
        if v is None:
            raise FileNotFoundError(f"no Delta log at {self.table}")
        if self.max_commits is not None:
            floor = (
                self._planned
                if self._planned is not None
                else self.starting_version - 1
            )
            v = min(v, floor + self.max_commits)
        return {"version": v}

    def partitions(self, start: dict, end: dict):
        from . import delta_lite

        self._planned = end["version"]
        parts: list[_FileChange] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            vf = delta_lite._version_file(self.table, v)
            if not os.path.isfile(vf):
                raise FileNotFoundError(
                    f"commit {v} of {self.table} is gone (log truncated "
                    "below the stream's offset); restart the stream from "
                    "a snapshot + a fresh startingVersion"
                )
            with open(vf) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "add" in action and action["add"].get("dataChange", True):
                        rel = action["add"]["path"]
                        parts.append(
                            _FileChange(
                                os.path.join(self.table, rel), rel, "insert", v
                            )
                        )
                    elif "remove" in action and action["remove"].get(
                        "dataChange", True
                    ):
                        rel = action["remove"]["path"]
                        parts.append(
                            _FileChange(
                                os.path.join(self.table, rel), rel, "delete", v
                            )
                        )
        if not parts:
            # Spark requires ≥1 partition per batch; an empty-change
            # batch (e.g. a checkpoint-only commit) emits zero rows
            parts.append(_FileChange("", "", "insert", end["version"]))
        return parts

    def read(self, partition: _FileChange):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = T.StructType.fromJson(json.loads(self.schema_json))
        arrow_schema = to_arrow_schema(schema)
        if not partition.file_path:
            yield pa.RecordBatch.from_arrays(
                [pa.array([], type=f.type) for f in arrow_schema],
                schema=arrow_schema,
            )
            return
        tbl = pq.read_table(partition.file_path)
        n = tbl.num_rows
        pvals = _partition_values_from_path(partition.rel_path)
        arrays = []
        for field in arrow_schema:
            if field.name == _CHANGE_COL:
                col = pa.array([partition.change_type] * n).cast(field.type)
            elif field.name == _VERSION_COL:
                col = pa.array([partition.version] * n, type=pa.int64()).cast(
                    field.type
                )
            elif field.name in tbl.column_names:
                col = tbl.column(field.name).combine_chunks().cast(field.type)
            elif field.name in pvals:
                raw = pvals[field.name]
                col = pa.array([raw] * n, type=pa.string()).cast(field.type)
            else:
                # schema evolution: file predates the column
                col = pa.nulls(n, type=field.type)
            arrays.append(col)
        yield from pa.Table.from_arrays(arrays, schema=arrow_schema).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are log versions; nothing to clean up


class DeltaCdfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "delta_cdf"

    def schema(self):
        table = self.options.get("path") or self.options.get("table")
        if not table:
            raise ValueError("delta_cdf requires .option('path', <table dir>)")
        return _cdf_schema(table)

    def streamReader(self, schema):
        return _CdfStreamReader(self.options)


def stream_changes(spark, table: str, starting_version: int = 0):
    """Convenience: register the source (idempotent) and open a
    change-feed stream over ``table`` from ``starting_version``."""
    try:
        spark.dataSource.register(DeltaCdfDataSource)
    except Exception:
        pass  # already registered
    return (
        spark.readStream.format("delta_cdf")
        .option("path", table)
        .option("startingVersion", starting_version)
        .load()
    )
