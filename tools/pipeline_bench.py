"""Scale benchmark for the domain cleaning pipeline.

Amplifies the 25-row fixture batch to N rows entirely DataFrame-side
(crossJoin with a replica range + deterministic per-replica variation),
runs the full 12-stage pipeline, forces execution with the noop sink,
and prints one JSON line.

Usage: python tools/pipeline_bench.py [n_rows]

The reference processes its 1,294-row batch with O(N·B + N·R) Python
loops; this pipeline is a constant number of Spark stages regardless of
N — the point of the rebuild.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark import (  # noqa: E402
    fixtures,
)
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.plans import (  # noqa: E402
    pipeline,
)
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import (  # noqa: E402
    get_spark,
)


def amplified_shipments(spark, n_rows: int):
    base = fixtures.shipments_df(spark)
    n_base = base.count()
    replicas = max(1, n_rows // n_base)
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    df = base.crossJoin(reps)
    # unique ids + deterministic per-replica variation so groups/medians
    # stay non-degenerate
    return (
        df.withColumn(
            "shipment_id", F.col("shipment_id") + F.col("rep") * n_base
        )
        .withColumn(
            "amount_in_usd",
            F.round(F.col("amount_in_usd") * (1 + (F.col("rep") % 7) / 100.0), 2),
        )
        .withColumn(
            "product_description",
            F.when(
                F.col("rep") % 5 == 0,
                F.concat(F.col("product_description"), F.lit(" LOT "), F.col("rep")),
            ).otherwise(F.col("product_description")),
        )
        .drop("rep")
        .repartition(32)
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    shipments = amplified_shipments(spark, n_rows)
    shipments.write.format("noop").mode("overwrite").save()  # warm input

    t0 = time.time()
    out = pipeline.run_pipeline(
        shipments,
        fixtures.model_ref_df(spark),
        fixtures.regex_kb_df(spark),
        fixtures.fx_rates_df(spark),
        datasource="bench",
    )
    out.write.format("noop").mode("overwrite").save()
    elapsed = time.time() - t0

    n_in = shipments.count()
    n_out = out.count()
    print(
        json.dumps(
            {
                "metric": "pipeline_wall_sec",
                "value": round(elapsed, 3),
                "unit": "sec",
                "rows_in": n_in,
                "rows_out": n_out,
                "rows_per_sec": round(n_in / elapsed),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
