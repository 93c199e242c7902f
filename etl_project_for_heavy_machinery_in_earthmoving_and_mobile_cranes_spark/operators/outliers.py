"""X1 — price-outlier marking vs per-group median (prog.py:287-316).

Spark shape: groupBy median → broadcast join-back on the group keys →
one ``when`` cascade.  The median groupBy is the only shuffle; with AQE
the join-back of the (small) medians table broadcasts automatically.

The reference's term-variant has asymmetric bounds (prog.py:303 filters
by term for the upper bound but not the lower) — documented intent
(symmetric) is implemented; divergence recorded in COMPAT.md.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mark_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lo: float = 0.8,
    hi: float = 1.2,
    unknown_if=None,
    out_col: str = "outliers",
) -> DataFrame:
    """Label each row 'yes' / 'no' / 'UNKNOWN' vs its group median.

    ``unknown_if``: optional Column marking rows that cannot be judged
    (reference: model unknown, capacity unknown, or used machine).
    """
    med = df.groupBy(*keys).agg(F.median(F.col(value_col)).alias("__med"))
    out = df.join(F.broadcast(med), on=list(keys), how="left")
    v = F.col(value_col)
    verdict = (
        F.when(F.col("__med").isNull() | v.isNull(), "UNKNOWN")
        .when((v >= hi * F.col("__med")) | (v <= lo * F.col("__med")), "yes")
        .otherwise("no")
    )
    if unknown_if is not None:
        verdict = F.when(unknown_if, "UNKNOWN").otherwise(verdict)
    return out.withColumn(out_col, verdict).drop("__med")
