"""optimize_where scale probe: evidence that partition-scoped
OPTIMIZE cost rides the SCOPED partitions, not the table.

Builds a date-partitioned table with F fragments per partition across
D partitions at 1x and Nx total size (more partitions, same per-
partition mass — the way a growing table actually grows), then times:

- optimize_where on ONE day (scope = F files)   — should stay ~flat;
- compact of the whole table                    — grows with the table.

Usage: python tools/optw_probe.py [N] ; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import (
    get_spark,
    tune,
)
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.sources import (
    delta_lite,
)

ROWS_PER_DAY = 5_000
FRAGMENTS = 4
BASE_DAYS = 8


def build(spark, path: str, days: int) -> None:
    df = (
        spark.range(days * ROWS_PER_DAY)
        .withColumn(
            "day",
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % days).cast("int")),
        )
        .withColumn("v", F.rand(seed=7))
    )
    delta_lite.write_delta(df.repartition(FRAGMENTS), path, partition_by=["day"])
    for _ in range(FRAGMENTS - 1):
        delta_lite.write_delta(
            df.sample(0.25, seed=11).repartition(FRAGMENTS),
            path,
            mode="append",
        )


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="optw-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    out = {"rows_per_day": ROWS_PER_DAY, "fragments": FRAGMENTS}
    for label, days in (("1x", BASE_DAYS), (f"{n}x", BASE_DAYS * n)):
        tmp = tempfile.mkdtemp(prefix=f"optw_probe_{label}_")
        path = os.path.join(tmp, "t")
        try:
            build(spark, path, days)
            live0, _, _, _ = delta_lite._read_actions(path)
            t_scoped = timed(
                lambda: delta_lite.optimize_where(
                    spark, path, ("day", "2024-01-03", "2024-01-03")
                )
            )
            t_full = timed(lambda: delta_lite.compact(spark, path, n_files=1))
            out[label] = {
                "days": days,
                "files_before": len(live0),
                "optimize_where_1day_s": t_scoped,
                "compact_full_s": t_full,
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
