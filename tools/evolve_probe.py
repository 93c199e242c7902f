"""MERGE-WITH-SCHEMA-EVOLUTION 30x probe (VERDICT r11 #7): quantifies
the O(touched) claim of delta_lite.upsert_delta_evolve — the evolving
merge's extra work over a plain upsert is a key join INSIDE the
touched buckets (matched keys keep their current values for table-only
columns), so a constant-size evolving batch must cost ~flat as the
table grows 30x, exactly like its siblings (merge_touched probe,
incremental clustering, bloom).

Method: a keyed customer table is built at 1x and Nx (key-offset
replicas) with bucket count scaled so BUCKET SIZE stays constant (the
production discipline).  Then a constant 5-key batch that ADDS a new
column (tier) and OMITS an existing one (bal) publishes through
upsert_delta_evolve; wall time is the median of 3 fresh-table runs.
Expect ratio(Nx/1x) << N.

Usage: python tools/evolve_probe.py [N]   (default 30)
Prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import (  # noqa: E402
    get_spark,
    tune,
)
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.sources import (  # noqa: E402
    delta_lite,
)

BASE = "/root/testdata/sf0.1/customer.parquet"
BASE_BUCKETS = 8
RUNS = 3


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark(app_name="evolve-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    base = spark.read.parquet(BASE).select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    n_base = base.count()

    def replicate(times: int):
        reps = [
            base.withColumn("k", F.col("k") + F.lit(i * 100_000_000))
            for i in range(times)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        return out.localCheckpoint(eager=True)

    def evolve_wall(times: int) -> "tuple[float, int]":
        df = replicate(times)
        buckets = BASE_BUCKETS * times  # constant bucket size
        batch = spark.createDataFrame(
            [(j, "MOVED", "gold") for j in range(5)],
            "k long, seg string, tier string",
        )
        walls = []
        for _ in range(RUNS):
            tmp = tempfile.mkdtemp(prefix="evolve_probe_")
            t = os.path.join(tmp, "t")
            try:
                delta_lite.upsert_delta(spark, t, df, ["k"], n_buckets=buckets)
                t0 = time.time()
                delta_lite.upsert_delta_evolve(
                    spark, t, batch, ["k"], n_buckets=buckets
                )
                walls.append(time.time() - t0)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        return statistics.median(walls), buckets

    w1, b1 = evolve_wall(1)
    wn, bn = evolve_wall(n)
    print(
        json.dumps(
            {
                "rows_1x": n_base,
                "rows_nx": n_base * n,
                "buckets_1x": b1,
                "buckets_nx": bn,
                "evolve_1x_sec": round(w1, 2),
                f"evolve_{n}x_sec": round(wn, 2),
                "ratio": round(wn / w1, 2),
                "n": n,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
