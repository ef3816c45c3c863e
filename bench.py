"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + materialize counts via
a cheap action). Session startup is excluded from per-query numbers but
reported separately.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # reference-parity analytics
    "tpch_q1_pricing_summary",
    "nation_account_summary",
    "customer_order_profile",
    "order_fulfillment_workload",
    "validation_fused",
    "top_customers_by_spend",
    "tpch_q3_shipping_topk",
    "tpch_q5_region_volume",
    "running_spend_by_customer",
    # TPC-H-pattern breadth tier
    "tpch_q6_revenue_delta",
    "tpch_q18_large_orders",
    # event-time tier
    "events_tumbling_hour",
    "events_sessionize",
    "asof_purchase_click",
    "range_clicks_before_purchase",
    # text / dedup / similarity tier
    "doc_quality_score",
    "dedup_minhash_candidates",
    "dedup_ngram_jaccard",
    "knn_bruteforce_cosine",
    "knn_ivf_cosine",
    # training-data pipeline tier (added r2 so perf regressions in the
    # newest family are visible round-over-round)
    "dedup_simhash",
    "dedup_simhash_candidates",
    "knn_lsh_hyperplane",
    "dedup_clusters",
    "doc_decontaminate",
    "doc_pack_sequential",
    "user_event_sequences",
    "training_corpus_pipeline",
    # iterative-ML / corpus-card family (added late r2)
    "kmeans_embedding_clusters",
    "corpus_summary_stats",
    # LM-quality / entity-resolution family (added late r2)
    "doc_bigram_lm_score",
    "dedup_levenshtein_pairs",
    # sketch / CDC / robust-stats / corpus-card families (added late r2)
    "events_users_hll_rollup",
    "orders_merge_upsert",
    "events_debounce_kept",
    "events_robust_outliers",
    "source_overlap_matrix",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None

    t0 = time.time()
    from employee_analytics_etl_spark.plans import (  # noqa: F401
        registry,
        registry_ext,
        registry_funcs,
    )
    from employee_analytics_etl_spark.session import build_session

    spark = build_session(app_name="bench")
    # Warm the JVM: run every headline plan once at the smallest SF so
    # codegen/JIT compilation is excluded from the timed runs — the
    # timed numbers then measure data-proportional cost, which is what
    # scales. (Startup + warmup are still reported separately.)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            try:
                registry.QUERIES[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
    startup = time.time() - t0

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t1 = time.time()
        df = fn(spark, sf_dir)
        # noop sink materializes EVERY output column (count() would let
        # Catalyst prune aggregate expressions and under-measure)
        df.write.format("noop").mode("overwrite").save()
        dt_q = time.time() - t1
        per_query[name] = round(dt_q, 3)
        total += dt_q
        print(f"# {name}: {dt_q:.3f}s", file=sys.stderr)

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf_val,
        "startup_sec": round(startup, 3),
        "n_queries": len(HEADLINE),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
