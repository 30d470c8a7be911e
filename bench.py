"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per BASELINE.md: wall-clock per query, median of 3 timed runs after 1
warm-up, single local SparkSession, AQE on, fixed shuffle partitions.
Each run executes the full plan to the sink side (count/collect) so
scan→shuffle→agg costs are all inside the measurement.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_chisquare_spark.plans.registry import REGISTRY
from mapreduce_chisquare_spark.session import get_spark

# Headline set: flagship text pipeline + the heaviest operator families.
# Grown as registries widen; every name must exist in REGISTRY.
HEADLINE = [
    "topk_per_group",      # flagship chi2 end-to-end (SURVEY.md §2.9)
    "chi_square",
    "count_term_cat",
    "tokenize",
    "merged_dict",
    "json_extract",
    # relational / extension headliners (present once implemented)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_revenue",
    "window_rank",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_k128",
    "dedup_ngram_jaccard",
    "simsearch_topk",
    "simsearch_lsh_topk",
    "quality_score",
    "lang_id",
    "tfidf",
    "pipeline_curation",
    "pipeline_training_corpus",
    "decontaminate",
    "repetition_metrics",
    "window_tumbling",
    "window_session",
    "asof_join",
    "agg_cube",
    "join_salted",
    "sketch_kmv_distinct",
    "sketch_countmin",
]

WARMUP = 1
RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    results: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        fn = spec[0]
        times = []
        for i in range(WARMUP + RUNS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.collect()
            dt = time.perf_counter() - t0
            if i >= WARMUP:
                times.append(dt)
        results[name] = round(statistics.median(times), 3)
    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
