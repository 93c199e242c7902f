"""Experimentation analytics: deterministic hash-bucket assignment,
two-proportion z-test, and CUPED variance reduction — the A/B-testing
primitives every product-analytics deployment runs next to the
behavioral operators (funnels, attribution) already in this engine.

Determinism contract (the cross-engine oracle discipline):
- assignment is a pure function of the unit key (md5 bucket mod
  n_arms) — rerun- and engine-stable, no RNG;
- test statistics are built from INTEGER unit-level counts; every sum
  and cross-moment is exact integer arithmetic (BIGINT here, HUGEINT
  in the DuckDB oracle), with ONE double division at the end per
  output — both engines round the same rational to the same double;
- the z / theta formulas are written in a fixed operand order mirrored
  verbatim by the oracle SQL.

Scale shape: one hash aggregate to unit level, one tiny per-arm
aggregate; CUPED's pooled theta is a 1-row moment aggregate broadcast
back.  At 100 TB the integer moments outgrow BIGINT long before the
row counts matter — swap the moment sums to DECIMAL(38,0) (still
exact) when units × per-unit-counts² approaches 2^63.

Reference scope note: the reference pipeline (prog.py) has no
experimentation surface; this module is extension surface next to
behavior.py, built on the same events table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash64


def hash_assign(unit: Column, n_arms: int = 2, seed: int = 0) -> Column:
    """Deterministic experiment-arm assignment: uniform md5 bucket of
    the unit key, mod ``n_arms``.  The same unit lands in the same arm
    in every engine, every rerun, every table."""
    return F.pmod(md5_hash64(unit.cast("string"), seed), F.lit(n_arms)).cast(
        "int"
    )


def two_proportion_ztest(
    per_unit: DataFrame, arm_col: str, conv_col: str
) -> DataFrame:
    """Two-proportion z-test over unit-level conversion flags
    (``conv_col`` ∈ {0,1}; ``arm_col`` ∈ {0,1}).  Returns ONE row:
    per-arm unit and conversion counts, conversion rates, absolute
    lift (arm 1 − arm 0), and the pooled-variance z statistic

        z = (p1 − p0) / sqrt(p·(1−p)·(1/n0 + 1/n1))

    with p the pooled rate.  Counts aggregate exactly; rates and z are
    double expressions in a fixed operand order the oracle mirrors."""
    agg = per_unit.groupBy().agg(
        F.sum(F.when(F.col(arm_col) == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col(arm_col) == 1, 1).otherwise(0)).alias("n1"),
        F.sum(
            F.when(F.col(arm_col) == 0, F.col(conv_col)).otherwise(0)
        ).alias("x0"),
        F.sum(
            F.when(F.col(arm_col) == 1, F.col(conv_col)).otherwise(0)
        ).alias("x1"),
    )
    p0 = F.col("x0") / F.col("n0")
    p1 = F.col("x1") / F.col("n1")
    pooled = (F.col("x0") + F.col("x1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return agg.select(
        "n0",
        "n1",
        "x0",
        "x1",
        p0.alias("p0"),
        p1.alias("p1"),
        (p1 - p0).alias("lift"),
        ((p1 - p0) / se).alias("z"),
    )


def cuped(
    per_unit: DataFrame, arm_col: str, x_col: str, y_col: str
) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013,
    'Improving the Sensitivity of Online Controlled Experiments'): the
    experiment metric Y is adjusted by a pre-experiment covariate X,

        Y_adj = Y − θ·(X − mean(X)),   θ = cov(X, Y) / var(X)

    with θ POOLED across arms (the standard form — X predates the
    experiment, so pooling cannot leak treatment).  ``x_col``/``y_col``
    must be integer unit-level counts: all moments (Σx, Σy, Σxy, Σx²,
    n) are then exact integers, θ is one double division of exact
    integers, and per-arm adjusted means are fixed-order double
    expressions — bit-replayable by the oracle.

    Returns one row per arm: n, mean_x, mean_y, mean_y_adj, plus the
    pooled theta (same value on both rows, kept for auditability).
    """
    g = per_unit.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(x_col).alias("sx"),
        F.sum(y_col).alias("sy"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("sxy"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("sxx"),
    )
    theta_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    theta_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    globals_df = g.select(
        (theta_num.cast("double") / theta_den.cast("double")).alias("theta"),
        (F.col("sx") / F.col("n")).alias("mean_x_all"),
    )
    arms = per_unit.groupBy(arm_col).agg(
        F.count("*").alias("n"),
        F.sum(x_col).alias("sxa"),
        F.sum(y_col).alias("sya"),
    )
    return arms.crossJoin(F.broadcast(globals_df)).select(
        F.col(arm_col).alias("arm"),
        "n",
        (F.col("sxa") / F.col("n")).alias("mean_x"),
        (F.col("sya") / F.col("n")).alias("mean_y"),
        (
            F.col("sya") / F.col("n")
            - F.col("theta")
            * (F.col("sxa") / F.col("n") - F.col("mean_x_all"))
        ).alias("mean_y_adj"),
        "theta",
    )
