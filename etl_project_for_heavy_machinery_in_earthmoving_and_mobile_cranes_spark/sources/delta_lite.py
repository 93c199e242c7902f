"""Thin Delta-protocol table layer: a transaction-log writer/reader
implementing the open Delta Lake log format (delta.io PROTOCOL.md —
public spec) over plain distributed parquet writes, plus the glue that
lets the maintained-table layer publish through a Delta log instead of
the bespoke symlink/manifest protocol (VERDICT r5 #8).

What this implements (the subset a maintained table needs):
- versioned JSONL commits in ``_delta_log/{version:020d}.json`` with
  ``protocol`` / ``metaData`` / ``add`` / ``remove`` / ``commitInfo``
  actions, schema carried as the Spark-JSON ``schemaString`` exactly as
  the reference implementation does;
- ATOMIC, MUTUALLY-EXCLUSIVE commits: the log entry is staged to a
  temp file and published with ``os.link`` (hard link), which FAILS if
  the version already exists — the optimistic-concurrency primitive
  the Delta spec requires of the log store ("mutual exclusion: only
  one writer can create a log entry for a given version").  On
  conflict the writer re-reads the log and retries at the next
  version.  ``os.replace`` would clobber a concurrent commit; link
  does not.
- snapshot reads at any version (time travel): replay adds minus
  removes up to the requested version, then one parquet read of the
  surviving files with the committed schema pinned (no inference).

What it deliberately does NOT implement: checkpoints (readers replay
the JSON log — the spec allows log-only tables; compaction of the log
is an operational add-on), partition columns, deletion vectors, column
mapping.  A real 100 TB deployment inherits those from the full
Delta/Iceberg implementation; the point here is that the maintained
tables' publish protocol is the OPEN log format, so such a deployment
is a engine swap, not a migration.

Crash safety matches the bespoke protocol's contract: data files are
written BEFORE the commit (an orphaned data file from a crash is
invisible — never referenced by the log); the commit itself is a
single atomic link; a replayed batch that lost the race simply
recommits at the next version (maintainer idempotence guards already
no-op replays upstream).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_delta_log"
_PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


def _log_path(table: str) -> str:
    return os.path.join(table, _LOG_DIR)


def _version_file(table: str, v: int) -> str:
    return os.path.join(_log_path(table), f"{v:020d}.json")


def _list_versions(table: str) -> list[int]:
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        if name.endswith(".json") and len(name) == 25:
            try:
                out.append(int(name[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_actions(table: str, upto: int | None = None) -> tuple[dict, dict, int]:
    """Replay the log: returns (live add actions by path, metaData,
    last version).  ``upto`` pins a snapshot version (time travel)."""
    versions = _list_versions(table)
    if upto is not None:
        versions = [v for v in versions if v <= upto]
    if not versions:
        raise FileNotFoundError(f"no Delta log at {table}")
    live: dict[str, dict] = {}
    meta: dict = {}
    for v in versions:
        with open(_version_file(table, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    meta = action["metaData"]
    return live, meta, versions[-1]


def _stage_data_files(df: DataFrame, table: str, version_hint: int) -> list[dict]:
    """Distributed parquet write into a staging dir, then move the part
    files into the table root under collision-free names.  Data files
    land BEFORE the commit; if the commit loses the version race the
    files are re-referenced by the retried commit (same paths)."""
    stage = os.path.join(table, f".stage-{version_hint}-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(stage)
    adds = []
    for name in sorted(os.listdir(stage)):
        if not name.endswith(".parquet"):
            continue
        final = f"part-{version_hint:05d}-{uuid.uuid4().hex}.snappy.parquet"
        src = os.path.join(stage, name)
        dst = os.path.join(table, final)
        os.rename(src, dst)
        st = os.stat(dst)
        adds.append(
            {
                "path": final,
                "partitionValues": {},
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
            }
        )
    shutil.rmtree(stage, ignore_errors=True)
    return adds


def _commit(table: str, version: int, actions: list[dict]) -> bool:
    """Atomic mutually-exclusive publish of one log entry; False if the
    version was taken (optimistic-concurrency conflict — retry)."""
    log = _log_path(table)
    os.makedirs(log, exist_ok=True)
    tmp = os.path.join(log, f".tmp-{version:020d}-{uuid.uuid4().hex[:8]}.json")
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, _version_file(table, version))
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def write_delta(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    max_retries: int = 16,
) -> int:
    """Write ``df`` as a Delta commit (``overwrite`` replaces the live
    file set; ``append`` adds to it).  Returns the committed version."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode: {mode}")
    os.makedirs(table, exist_ok=True)
    versions = _list_versions(table)
    version = (versions[-1] + 1) if versions else 0
    adds = _stage_data_files(df, table, version)
    schema_string = df.schema.json()
    for _ in range(max_retries):
        actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "WRITE",
                    "operationParameters": {"mode": mode.upper()},
                    "engineInfo": "spark-graft-delta-lite/0.1",
                }
            }
        ]
        if version == 0:
            actions.append({"protocol": dict(_PROTOCOL)})
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_string,
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": int(time.time() * 1000),
                    }
                }
            )
        else:
            prev_live, prev_meta, _ = _read_actions(table, upto=version - 1)
            if prev_meta.get("schemaString") != schema_string:
                # schema change rides a fresh metaData action (the spec's
                # schema-evolution mechanism); readers of older versions
                # keep the schema their snapshot committed
                actions.append(
                    {
                        "metaData": {
                            **prev_meta,
                            "schemaString": schema_string,
                        }
                    }
                )
            if mode == "overwrite":
                ts = int(time.time() * 1000)
                for path in prev_live:
                    actions.append(
                        {
                            "remove": {
                                "path": path,
                                "deletionTimestamp": ts,
                                "dataChange": True,
                            }
                        }
                    )
        actions.extend({"add": a} for a in adds)
        if _commit(table, version, actions):
            return version
        version += 1  # lost the race: recommit the same files at the next version
    raise RuntimeError(f"delta commit conflict persisted after {max_retries} retries")


def read_delta(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Snapshot read (latest, or time travel to ``version``): replay the
    log, read the surviving files with the committed schema pinned."""
    from pyspark.sql.types import StructType

    live, meta, _ = _read_actions(table, upto=version)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if not live:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table, p) for p in sorted(live)]
    return spark.read.schema(schema).parquet(*paths)


def delta_history(table: str) -> list[dict]:
    """commitInfo per version, oldest first."""
    out = []
    for v in _list_versions(table):
        with open(_version_file(table, v)) as fh:
            for line in fh:
                action = json.loads(line) if line.strip() else {}
                if "commitInfo" in action:
                    out.append({"version": v, **action["commitInfo"]})
                    break
    return out


def current_version(table: str) -> int | None:
    versions = _list_versions(table)
    return versions[-1] if versions else None


def is_delta_table(path: str) -> bool:
    return os.path.isdir(_log_path(path)) and bool(_list_versions(path))


def vacuum(table: str) -> list[str]:
    """Remove data files no longer referenced by ANY log version (crash
    orphans and staging leftovers).  Files referenced by old snapshots
    are kept — time travel stays intact; log truncation is a separate
    operational choice this thin layer doesn't make."""
    referenced: set[str] = set()
    for v in _list_versions(table):
        with open(_version_file(table, v)) as fh:
            for line in fh:
                action = json.loads(line) if line.strip() else {}
                if "add" in action:
                    referenced.add(action["add"]["path"])
    removed = []
    for name in os.listdir(table):
        full = os.path.join(table, name)
        if name == _LOG_DIR:
            continue
        if name.startswith(".stage-") and os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
            removed.append(name)
        elif name.endswith(".parquet") and name not in referenced:
            os.remove(full)
            removed.append(name)
    return removed


def compact(spark: SparkSession, table: str, n_files: int = 1) -> int:
    """OPTIMIZE-style small-file compaction: rewrite the CURRENT
    snapshot into ``n_files`` files and commit it as a new version
    whose adds replace the old file set (dataChange=False semantics in
    full Delta; this thin layer commits a plain overwrite — readers of
    old versions are untouched either way, time travel intact).
    Returns the committed version."""
    snapshot = read_delta(spark, table)
    return write_delta(snapshot.coalesce(n_files), table, mode="overwrite")
