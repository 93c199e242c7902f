"""Approximate aggregation sketches for interactive exploration at scale.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle-heavy
(exact distinct re-shuffles the full key set; exact percentile sorts).
These wrappers expose Spark's mergeable one-pass sketches — HyperLogLog++
for cardinality, Greenwald-Khanna for quantiles — which aggregate
map-side and merge in O(sketch size), making them the default for
dashboard-grade answers.  Sketch outputs are engine-specific, so they
are verified by error-bound tests against exact answers (tests/),
not by the cross-engine value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct(col: str, rsd: float = 0.015) -> Column:
    """HyperLogLog++ distinct count (mergeable, map-side combinable).
    rsd = relative standard deviation target."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(col: str, probs: list[float], accuracy: int = 10000) -> Column:
    """Greenwald-Khanna approximate quantiles as an array column.
    Error is bounded by 1/accuracy of the rank."""
    return F.percentile_approx(
        F.col(col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    )


def distinct_by_group(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.015
) -> DataFrame:
    """Per-group approximate distinct — one shuffle on the group key,
    constant-size state per group regardless of value cardinality."""
    return df.groupBy(*group_cols).agg(
        hll_distinct(value_col, rsd).alias(f"approx_distinct_{value_col}")
    )


def quantile_summary(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantile vector in one pass."""
    out = df.groupBy(*group_cols).agg(
        approx_quantiles(value_col, list(probs), accuracy).alias("__q")
    )
    for i, p in enumerate(probs):
        out = out.withColumn(f"p{int(p * 100)}", F.col("__q")[i])
    return out.drop("__q")


def cms_sketch(
    col: str, eps: float = 0.001, confidence: float = 0.99, seed: int = 42
) -> Column:
    """Count-min sketch aggregate for heavy-hitter frequency estimation.

    A depth×width counter grid (depth = ln(1/(1-confidence)), width =
    ceil(2/eps)) that aggregates map-side and merges associatively —
    at 100 TB the full token-frequency table may be billions of rows,
    but the sketch is a few KB per partition and one small merge,
    answering "how often does X occur" within eps·N overestimate.
    """
    return F.count_min_sketch(col, F.lit(eps), F.lit(confidence), F.lit(seed))


def cms_estimate(spark, sketch_bytes: bytes, items: list) -> dict:
    """Driver-side point queries against a serialized count-min sketch
    (the binary produced by ``cms_sketch``).  Estimates never
    undercount; overcount is bounded by eps·total with the sketch's
    confidence."""
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(stream)
    return {item: cms.estimateCount(item) for item in items}
