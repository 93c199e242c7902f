"""Band (±tolerance) range joins (J5/J6).

Reference: ``mark_unknown_model_with_exsisted_lifting_capacity``
(prog.py:255-276) — rows with known brand+type+capacity but unknown model
adopt the model of another row of the same brand/type whose capacity is
within ±5%.

Spark shape: equi join on (brand, type) with the band as a residual
range predicate.  For skewed/huge sides, ``bucketed=True`` adds a
log-scale bucket equi-key (each left row probes its bucket ±1), turning
the range predicate into a hash join — the standard trick when the
band join's equi prefix alone is not selective enough at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: Sequence[str],
    left_val: str,
    right_val: str,
    tol: float = 0.05,
    how: str = "inner",
    bucketed: bool = False,
) -> DataFrame:
    """left ⋈ right on equi_keys AND right_val ∈ [left_val·(1-tol), left_val·(1+tol)].

    Right-side columns must be pre-renamed to avoid collisions.
    """
    lv, rv = F.col(left_val), F.col(right_val)
    band = rv.between(lv * (1 - tol), lv * (1 + tol))
    if not bucketed:
        cond = band
        for k in equi_keys:
            cond = (left[k] == right[k]) & cond
        return left.join(right, on=cond, how=how)

    # log-bucket equi-key: bucket width ln(1+tol) guarantees any pair
    # within ±tol spans at most adjacent buckets.
    import math

    w = math.log(1.0 + tol)
    lb = F.floor(F.log(lv) / F.lit(w))
    rb = F.floor(F.log(rv) / F.lit(w))
    lx = left.withColumn("__b", F.explode(F.array(lb - 1, lb, lb + 1)))
    rx = right.withColumn("__b", rb)
    cond = lx["__b"] == rx["__b"]
    for k in equi_keys:
        cond = (lx[k] == rx[k]) & cond
    return lx.join(rx, on=cond & band, how=how).drop("__b")


def infer_unknown_models(
    df: DataFrame,
    id_col: str = "shipment_id",
    brand: str = "brand",
    type_col: str = "type",
    model: str = "model",
    capacity: str = "capacity",
    tol: float = 0.05,
) -> DataFrame:
    """J5 end-to-end: fill NULL models from same-brand/type rows with a
    capacity within ±tol.  Winner = smallest |capacity delta|, then model
    asc (deterministic; reference takes first-iterated row).
    """
    known = (
        df.filter(F.col(model).isNotNull() & F.col(capacity).isNotNull())
        .select(
            F.col(brand).alias("k_brand"),
            F.col(type_col).alias("k_type"),
            F.col(model).alias("k_model"),
            F.col(capacity).alias("k_capacity"),
        )
        .dropDuplicates(["k_brand", "k_type", "k_model", "k_capacity"])
    )
    unknown = df.filter(
        F.col(model).isNull()
        & F.col(brand).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(capacity).isNotNull()
    ).select(id_col, brand, type_col, capacity)

    cand = unknown.join(
        F.broadcast(known),
        on=(
            (F.col(brand) == F.col("k_brand"))
            & (F.col(type_col) == F.col("k_type"))
            & F.col("k_capacity").between(
                F.col(capacity) * (1 - tol), F.col(capacity) * (1 + tol)
            )
        ),
        how="inner",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.abs(F.col("k_capacity") - F.col(capacity)), F.col("k_model")
    )
    winners = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select(F.col(id_col), F.col("k_model").alias("__inferred_model"))
    )
    out = df.join(winners, on=id_col, how="left")
    return (
        out.withColumn(
            "__model_inferred",
            F.col(model).isNull() & F.col("__inferred_model").isNotNull(),
        )
        .withColumn(model, F.coalesce(F.col(model), F.col("__inferred_model")))
        .drop("__inferred_model")
    )
