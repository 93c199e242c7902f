"""Approximate/exact nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the corpus, JVM-side ``zip_with``/``aggregate`` arithmetic, one
window for top-k.  Scale path: sign-random-projection LSH bucketing so
the candidate join is an equi join on bucket key instead of a full
cross product.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus rows
    (self-matches excluded).  Queries are broadcast; the corpus is
    scanned once; top-k via row_number over (query partition)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold).  Brute-force baseline; at scale swap the self cross join
    for the SRP-bucketed candidate join in ``lsh_knn`` (same scoring)."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, on=F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def _det_plane(seed: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — no RNG state, so
    any executor / any engine reproduces the same planes."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}:{plane}:{j}".encode()).hexdigest()[:8]
        out.append((int(h, 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit(2**i)).otherwise(F.lit(0)))
    return sum(bits).cast("int")


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """ANN: bucket by SRP signature, score only same-bucket candidates.
    At 100 TB the bucket join is an equi hash join; recall is tuned by
    ``num_planes`` (fewer planes → bigger buckets → higher recall)."""
    planes = [_det_plane(seed, i, dim) for i in range(num_planes)]
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        srp_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        srp_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    scored = (
        cb.join(F.broadcast(qb), on="__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
