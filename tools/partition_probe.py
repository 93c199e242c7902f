"""Partition-pruning probe (VERDICT r7 #4): evidence that a
single-partition read of a Delta-lite PARTITIONED table scans a
CONSTANT file count (and ~constant wall) as the number of partitions
grows — the property that makes an ingest-date-partitioned 100 TB
table readable one day at a time.

Protocol: tables with P ∈ {6, 24, 96} partitions, each partition
holding the SAME row count (rows-per-partition fixed, so total data
grows with P — the time-partitioned table's life story).  For each
table: read ONE partition through read_delta(predicate=...) and
record (files scanned, rows read, wall), plus the unpredicated
full-scan file count as the denominator.

Prints one JSON line for SCALE.md.

Usage: python tools/partition_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import (  # noqa: E402
    get_spark,
)
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.sources import (  # noqa: E402
    delta_lite,
)

ROWS_PER_PARTITION = 200_000
PARTITION_COUNTS = (6, 24, 96)


def build(spark, workdir: str, p: int) -> str:
    table = os.path.join(workdir, f"t{p}")
    n = ROWS_PER_PARTITION * p
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % p).cast("int").alias("pday"),
            (F.col("id") * 7 % 1000).cast("double").alias("v"),
        )
        .repartition(p, "pday")
    )
    delta_lite.write_delta(df, table, partition_by=["pday"])
    return table


def main() -> None:
    spark = get_spark(app_name="partition-probe")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="pprobe_")
    report: dict = {"rows_per_partition": ROWS_PER_PARTITION}
    try:
        # warmup (JVM/codegen) — untimed
        t0_tbl = build(spark, os.path.join(workdir, "warm"), 2)
        delta_lite.read_delta(
            spark, t0_tbl, predicate=("pday", 1, 1)
        ).write.format("noop").mode("overwrite").save()
        for p in PARTITION_COUNTS:
            table = build(spark, workdir, p)
            live, _, _, _ = delta_lite._read_actions(table)
            target = p // 2
            kept = {
                f: a
                for f, a in live.items()
                if not delta_lite._partition_prunable(
                    a, "pday", target, target, "integer"
                )
            }
            t0 = time.time()
            got = delta_lite.read_delta(
                spark, table, predicate=("pday", target, target)
            ).filter(F.col("pday") == target)
            got.write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 3)
            report[f"p{p}"] = {
                "total_files": len(live),
                "scanned_files": len(kept),
                "read_wall_s": wall,
            }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
