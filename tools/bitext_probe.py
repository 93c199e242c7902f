"""Bitext-margin crossover probe: evidence that the r11 ANN candidate
join is the SCALE-correct plan even though it costs more than the
exact cross join at sf0.1 (SCALE.md round-11 bench note).

Replicates the embeddings table Nx (vec_id-offset), then times
margin_bitext_pairs in both forms at a production-shaped quantizer
(n_cells scales with the corpus, as a trained quantizer would):

- exact: N x M cross join — pair mass grows quadratically;
- ANN:   cell-equi candidate join — pair mass ~ quadratic / cells,
         so with cells grown alongside the corpus it stays ~linear.

Usage: python tools/bitext_probe.py [N] ; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.operators import (
    similarity,
)
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import (
    get_spark,
    tune,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="bitext-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    # Replicas are TRANSFORMED, not cloned: an exact copy of every
    # vector makes each point's k-NN its own clones (cosine 1.0), the
    # margin denominator saturates, and BOTH plans emit zero pairs —
    # the r11 probe timed that degenerate shape; a small jitter is no
    # better (clones at cosine ~0.999 still saturate the exact side
    # while the ANN side, whose k-NN means are cell-local, emits
    # FALSE pairs).  A per-replica CIRCULAR SHIFT of the embedding
    # components keeps every within-replica dot product identical to
    # the base corpus (the shift is a rotation, applied uniformly) and
    # decorrelates cross-replica vectors, so the exact pair mass grows
    # ~linearly with n and recall measures something real: whether the
    # quantizer keeps true neighbors in probed cells.  Replica 0 is
    # the untouched original.
    dim = len(base.first()["embedding"])

    def shift(df, i):
        if i == 0:
            return df
        # rotation amount must be nonzero for EVERY replica, not just
        # i % dim != 0: at n > dim a plain `i % dim` makes replica dim
        # an exact clone of replica 0 again — the degenerate corpus
        # (cosine-1.0 neighbors, saturated margins) this probe exists
        # to avoid.  1 + (i-1) % (dim-1) cycles through 1..dim-1.
        rot = 1 + (i - 1) % (dim - 1)
        return df.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (v, j) -> "
                f"embedding[(j + {rot}) % {dim}])"
            ),
        )

    reps = [
        shift(
            base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000)),
            i,
        )
        for i in range(n)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big = big.repartition(32).localCheckpoint(eager=True)
    x = big.filter(F.col("vec_id") % 2 == 0)
    y = big.filter(F.col("vec_id") % 2 == 1)

    out: dict = {"n_replicas": n, "rows": n_base * n}

    def run(tag: str, **kw):
        t0 = time.time()
        df = similarity.margin_bitext_pairs(x, y, k=4, threshold=1.05, **kw)
        pairs = {(r["x_id"], r["y_id"]) for r in df.select("x_id", "y_id").collect()}
        out[tag] = round(time.time() - t0, 2)
        out[f"{tag}_pairs"] = len(pairs)
        spark.catalog.clearCache()
        return pairs

    # production-shaped quantizer: cells grow with the corpus (a
    # trained IVF would); nprobe stays 2
    cells = similarity.det_centroids(11, max(8, 8 * n), 64)
    ann = run("ann_sec", centroids=cells, nprobe=2)
    exact = run("exact_sec")
    out["speedup"] = round(out["exact_sec"] / out["ann_sec"], 2)
    # RECALL of the scale plan vs the exact oracle (VERDICT r11 #6):
    # the probe pins the approximation's QUALITY, not just its speed —
    # pairs the exact plan emits that the ANN candidate join misses
    # are the cost of cell-bounded neighborhoods
    out["recall"] = round(len(ann & exact) / len(exact), 4) if exact else 1.0
    # nprobe knee at this corpus size: where recall saturates.
    # nprobe=2 was already measured above — reuse it instead of
    # repeating a full ANN candidate join + collect.
    for np_ in (1, 2, 4):
        if np_ == 2:
            out["ann_np2_sec"] = out["ann_sec"]
            out["ann_np2_sec_pairs"] = out["ann_sec_pairs"]
            out["ann_np2_recall"] = out["recall"]
            continue
        p = run(f"ann_np{np_}_sec", centroids=cells, nprobe=np_)
        out[f"ann_np{np_}_recall"] = (
            round(len(p & exact) / len(exact), 4) if exact else 1.0
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
