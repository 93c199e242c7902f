"""Deterministic, engine-portable sampling for training-data pipelines.

``df.sample`` is seed-stable only per partitioning; re-partition the
input and membership changes.  Training-data curation needs sampling
that is a pure function of the ROW (so reruns, backfills, and other
engines agree).  These operators hash a key column with the same
md5 construction used by the dedup family (dedup.md5_hash64) and keep
rows whose bucket falls under the fraction — reproducible anywhere md5
exists, including the DuckDB oracle.

Scale notes
-----------
Pure narrow projection + filter: no shuffle, fully pushed into the scan
stage, trivially parallel at 100 TB.  The hash is uniform on the key,
so per-stratum rates concentrate tightly (Chernoff) for strata with
more than a few thousand rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash64

# md5-derived bucket space: 8 hex chars = 32 bits
_BUCKETS = 1 << 32


def hash_bucket(key: Column, seed: int = 0) -> Column:
    """Uniform bucket in [0, 2^32) as a pure function of the key."""
    return md5_hash64(key.cast("string"), seed)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership determined only by the key.

    Rows sharing a key are kept or dropped together — the right unit
    semantics for dedup-aware corpus sampling (sample documents, not
    random shards of documents).
    """
    threshold = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), seed) < threshold)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (sampleBy, but row-stable).

    ``fractions`` maps stratum value → keep fraction; strata not listed
    use ``default_fraction``.  Built as a flat CASE over the stratum so
    the whole predicate stays in whole-stage codegen.
    """
    threshold = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(key_col), seed) < threshold)


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_fraction: float = 0.05, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, holdout) split keyed on the row —
    stable across reruns and engines, unlike randomSplit."""
    cut = int(holdout_fraction * _BUCKETS)
    b = hash_bucket(F.col(key_col), seed)
    return df.filter(b >= cut), df.filter(b < cut)


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    score_col: str = "score",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES).

    Each row draws a deterministic uniform u∈(0,1) from its key; the k
    rows with the largest ``u^(1/w)`` — equivalently largest
    ``ln(u)/w`` — form the sample, giving inclusion probability ∝
    weight without replacement.  Hash-derived u keeps membership a pure
    function of the row (reruns/backfills/other engines agree), which
    ``df.sample`` cannot promise across repartitions.

    Scale: narrow projection + global top-k — Spark compiles
    ``orderBy().limit(k)`` to TakeOrderedAndProject (per-partition heap
    of k, single reduce), so no full sort at any data size.  u is exact
    in double ((h+0.5)/2^32, power-of-two divide); the score is rounded
    to 12 dp so libm ln() last-ulp differences can't reorder engines,
    and the key breaks residual ties.
    """
    u = (hash_bucket(F.col(key_col), seed) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    score = F.round(F.log(u) / F.col(weight_col), 12)
    return (
        df.withColumn(score_col, score)
        .orderBy(F.col(score_col).desc(), F.col(key_col).asc())
        .limit(k)
    )
