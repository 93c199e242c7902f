"""Clustered gauge-recompute probe (VERDICT r9 #3): does the gauge
maintainer's dirty-group RECOMPUTE cost ride the dirty-group files on a
group-clustered upstream, instead of the full file set?

Protocol (the SCALE.md 30x ratio decomposition): build the upstream at
1x and Nx rows with a FIXED group cardinality and a FIXED per-delete
dirty range (one group), cluster it on the group column
(delta_lite.optimize_cluster), drain the gauge maintainer, then issue
one delete_where on a single group and measure (a) the number of
upstream files the recompute actually reads and (b) the wall time of
the maintenance drain.  On a clustered layout the dirty range lives in
O(1) files regardless of table size, so files-read should be FLAT as
the table grows 30x; time should grow far slower than 30x (residual
growth = the batch-planning and commit constant).

Prints one JSON line: files read + drain seconds per scale + ratios.

Usage: python tools/cluster_recompute_probe.py [N]
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
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.streaming import (  # noqa: E402
    jobs,
)

GROUPS = 120
FILES = 24


def run_leg(spark, rows: int) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"cluster_probe_{rows}_")
    up = os.path.join(tmp, "up")
    down = os.path.join(tmp, "down")
    cp = os.path.join(tmp, "cp")
    try:
        df = spark.range(0, rows).select(
            (F.col("id") % GROUPS).alias("grp"), F.col("id").alias("val")
        )
        delta_lite.write_delta(df.repartition(FILES), up)
        delta_lite.optimize_cluster(spark, up, ["grp"], n_files=FILES)

        def drain():
            q = jobs.maintain_gauge_rollup_from_changes(
                spark, up, down, cp, group_cols=["grp"], minmax_cols=["val"]
            )
            q.awaitTermination()

        drain()  # fold the initial inserts
        # delete HALF of one group's rows (grp = id %% GROUPS pins the
        # parity of val for a given grp, so use a modulus coprime test)
        dv = delta_lite.delete_where(
            spark, up, "grp = 7 AND val % 240 = 7", predicate=("grp", 7, 7)
        )
        assert dv == delta_lite.current_version(up) and dv > 1, "delete no-oped"
        live, _, _, _ = delta_lite._read_actions(up)
        real_read = delta_lite.read_delta
        reads: list[int] = []

        def wrapped(*args, **kw):
            out = real_read(*args, **kw)
            if len(args) > 1 and args[1] == up:
                reads.append(len(out.inputFiles()))
            return out

        delta_lite.read_delta = wrapped
        t0 = time.time()
        try:
            drain()
        finally:
            delta_lite.read_delta = real_read
        drain_s = time.time() - t0
        # correctness: maintained == snapshot aggregate
        got = {
            tuple(r)
            for r in jobs.read_maintained_table(spark, down)
            .select("grp", "n", "min_val", "max_val")
            .collect()
        }
        want = {
            tuple(r)
            for r in real_read(spark, up)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("val").alias("min_val"),
                F.max("val").alias("max_val"),
            )
            .collect()
        }
        assert got == want, "maintained table diverged from snapshot"
        return {
            "rows": rows,
            "live_files": len(live),
            "recompute_files_read": max(reads) if reads else 0,
            "drain_s": round(drain_s, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base_rows = 60_000
    one = run_leg(spark, base_rows)
    big = run_leg(spark, base_rows * n)
    print(
        json.dumps(
            {
                "probe": "cluster_recompute",
                "n": n,
                "x1": one,
                "xN": big,
                "files_ratio": (
                    big["recompute_files_read"] / max(1, one["recompute_files_read"])
                ),
                "time_ratio": round(big["drain_s"] / max(0.01, one["drain_s"]), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
