"""SparkSession factory and runtime tuning.

The reference is a single-process pandas pipeline; this engine targets a
multi-executor cluster (design point: ~1000 executors / 100 TB) while
tests run on ``local[N]``.  All size-dependent knobs are parameters with
scale-aware defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

APP_NAME = "heavy-machinery-spark-engine"

# Runtime (session-scoped, safe to set on a caller-provided session).
#
# ansi.enabled=false: the reference relies on pandas
# ``to_numeric(errors='coerce')`` null-on-error semantics everywhere
# (SURVEY §1.3); non-ANSI ``cast``/``/`` reproduce that exactly.
# Spark 4 flipped the default to true, so we pin it.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.ansi.enabled": "false",
    # driver testdata events.parquet carries TIMESTAMP(NANOS) which the
    # vectorized reader rejects; read as long nanos and convert in-plan
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # dims here are 10^2..10^3 rows; raise the broadcast ceiling a bit so
    # the fuzzy-join dims and fx tables always broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # session-window / tumbling-window streaming state
    "spark.sql.session.timeZone": "UTC",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-provided ones
    included).  Idempotent; only touches session-scoped SQL confs."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # static conf on this build — leave as-is
            pass
    return spark


def get_spark(
    app_name: str = APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    ``shuffle_partitions`` defaults to the local core count for tests;
    on a real cluster leave it to AQE coalescing with a high initial
    value (e.g. 2000) set by the submitter.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
