"""Empirical scaling probe: replicate the sf0.1 tables N× (key-offset
so join cardinalities scale linearly) into a multi-file parquet layout,
then time the headline queries at both scales.

Purpose: evidence for the 100 TB design claims — a well-shaped query
should scale ~linearly in rows (ratio ≈ N after subtracting fixed
overhead), and the multi-file layout exercises real scan parallelism
that the driver's single-row-group testdata cannot.

Usage:  python tools/scale_probe.py [N] [out_dir]
Prints one JSON line: per-query seconds at sf0.1 and sf0.1×N + ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from etl_project_for_heavy_machinery_in_earthmoving_and_mobile_cranes_spark.session import get_spark

BASE = "/root/testdata/sf0.1"

# key columns to offset per replica so FK relationships scale instead of
# fanning out (each replica is a self-contained TPC-H-ish world)
OFFSET_KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],  # dims shared across replicas
    "region": [],
}

PROBE_QUERIES = [
    "pricing_summary",
    "nation_revenue",
    "top_parts_per_brand",
    "sessionized_events",
    "hash_sampled_stats",
    "dedup_exact",
    "token_frequency",
    "hourly_event_windows",
    "pii_redaction",
    "packed_chunks",
    "doc_unigram_logprob",
    "dq_audit",
    "event_funnel",
    "event_transitions",
    "cohort_retention",
    "mad_price_outliers",
    "snapshot_diff",
    "distinctive_terms",
    "minhash_pairs_fast",
    "weighted_doc_sample",
    # round-2 additions
    "containment_token",
    "session_window_stats",
    "upsert_latest",
    "boilerplate_strip",
    "weight_band_join",
    "ann_srp",
    "ngram_jaccard",
    # round-3 additions
    "export_render",
    "report_order_pos",
    "schema_guard",
    "ann_ivf",
    "tfidf_terms",
    "corpus_shuffle_rank",
    "temperature_mix",
    "salted_skew_join",
    "two_phase_distinct",
    "last_touch_attribution",
    "span_corruption",
    "near_dup_removal",
    "dup_span_detect",
    "pagerank_parts",
    "dup_span_strip",
    "token_shards",
    "bigram_logprob",
    "rollup_merge",
    "sentence_chunks",
    "order_reconcile",
    "seasonal_anomalies",
    "embedding_dim_stats",
    "bm25_search",
    "hybrid_retrieval",
    "event_trigrams",
    # round-3 continuation additions
    "source_drift",
    "source_drift_q",
    "bpe_merges",
    "bpe_encode",
    "scaled_prices",
    "quarantine_audit",
    "balanced_docs",
    "novelty_scores",
    "centroid_drift",
    "session_transcripts",
    "cross_lang_dups",
    "corpus_datacard",
    "cusum_alarms",
    "bpe_token_shards",
    "grouped_holdout",
    "cluster_safe_split",
    "dedup_cluster_histogram",
    "boilerplate_ngrams",
    "hashed_bow",
    "random_projection",
    "linear_attribution",
    "active_users",
    "key_skew",
    "target_mix",
    "lang_mix_drift",
    # round-5 additions
    "heavy_hitters_merge",
    "histogram_quantiles",
    "hll_user_count",
    "gopher_quality",
    "contamination_fraction",
    "ccnet_buckets",
    "ann_int8",
    "abandoned_clicks",
    "mixture_budget",
    "waiting_suppliers",
    "incremental_near_dup",
    "promo_revenue",
    "top_supplier",
    "small_qty_revenue",
    "large_orders",
    "c4_filters",
    "tokenizer_fertility",
    "kmeans_lloyd",
    "reservoir_sample",
    "cms_merge",
    "image_near_dup",
    "decontaminate_merge",
    "order_priority_check",
    "disjunctive_revenue",
    "idle_rich_customers",
    "hll_set_algebra",
    "min_cost_supplier",
    "nation_trade_volume",
    "product_type_profit",
    "returned_item_ranking",
    "late_shipment_priority",
    "customer_order_distribution",
    "supplier_part_counts",
    "excess_shippers",
    "important_parts",
    "orc_roundtrip",
    "length_buckets",
    "url_blocklist",
    "schema_evolution",
    "url_canonical_dedup",
    "quality_calibration",
    "compacted_upsert",
    "pca_top_component",
    "forecast_revenue",
]


def replicate(spark, n: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for table, keys in OFFSET_KEYS.items():
        src = spark.read.parquet(f"{BASE}/{table}.parquet")
        if not keys or n == 1:
            src.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
            continue
        offsets = {k: src.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        parts = []
        for i in range(n):
            rep = src
            for k, off in offsets.items():
                rep = rep.withColumn(k, F.col(k) + F.lit(i * off))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # several files per table -> real scan parallelism
        out.repartition(max(8, n)).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )


def time_queries(spark, qs, sf_dir: str, names=None) -> dict[str, float]:
    out = {}
    for name in names or PROBE_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_sf0.1x{n}"
    only = [q for q in sys.argv[3:]] or None
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # probe the bench scale path (matches how every prior round's
    # numbers were taken); explicit call since round 5 — no env var
    entrymod.set_lsh_prefilter(True)
    qs = entrymod.queries()

    if not os.path.isdir(out_dir) or not os.listdir(out_dir):
        replicate(spark, n, out_dir)

    # warm up BOTH dirs before measuring: the first query after the
    # in-session replication write otherwise pays a huge one-off GC /
    # page-cache penalty that has nothing to do with the query shape
    # (observed 108s -> 5s for the same query once warmed).
    time_queries(spark, qs, BASE, only)
    time_queries(spark, qs, out_dir, only)
    base = time_queries(spark, qs, BASE, only)
    scaled = time_queries(spark, qs, out_dir, only)
    report = {
        q: {
            "sf0.1_s": base[q],
            f"x{n}_s": scaled[q],
            "ratio": round(scaled[q] / base[q], 2) if base[q] else None,
        }
        for q in (only or PROBE_QUERIES)
    }
    print(json.dumps({"replicas": n, "queries": report}))
    spark.stop()


if __name__ == "__main__":
    main()
