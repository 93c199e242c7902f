"""Graph analytics over edge lists (dedup/similarity graphs).

Connected components (dedup.connected_components) answers "which docs
form one duplicate cluster"; triangle enumeration answers the next
question — how DENSE a neighborhood is (a near-dup cluster that is a
clique is a true duplicate family; a chain of borderline pairs is not).

Scale notes
-----------
``triangle_enumerate`` is two hash joins over the edge list.  With
canonical ordering (src < dst) every triangle {a,b,c} materializes
exactly once as (a,b)·(b,c)·(a,c) — no post-dedup pass.  Join fan-out
is Σ deg(v)² over wedge centers, the standard bound; at scale the skew
lever is degree-capping (drop super-node vertices above a degree cutoff
before joining — they are almost never meaningful near-dup structure,
and the cap turns the worst case into a constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_enumerate(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_degree: int | None = None
) -> DataFrame:
    """All triangles (a, b, c) with a<b<c from a canonically-ordered
    edge list (requires ``src < dst`` per row, as the pair operators
    emit).  Optional ``max_degree`` drops super-node vertices first —
    the skew cap for power-law graphs."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if max_degree is not None:
        deg = (
            e.select(F.col("u").alias("x"))
            .unionAll(e.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_degree)
        )
        e = (
            e.join(deg.select(F.col("x").alias("u")), "u")
            .join(deg.select(F.col("x").alias("v")), "v")
            .select("u", "v")
        )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select(
            F.col("a").alias("id_a"), F.col("b").alias("id_b"), F.col("c").alias("id_c")
        )
    )
