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

# Certification-window rotation: the driver's per-round correctness
# sweep certifies the FIRST 50 entries of this dict in order, so each
# round leads with entries that do not yet have a driver-green row.
# Membership here changes nothing about semantics or coverage — only
# visit order.
#
# Already driver-certified (green in CORRECTNESS_r01 and/or r02):
#   json_schema_parse map_scalars project scan_json json_extract
#   nonempty_filter casefold tokenize tokenize_positions regexp_extract
#   stopword_filter length_filter dedup_terms anti_join_stopwords
#   count_term_cat count_term count_cat count_total join_term_totals
#   join_cat_totals chi_square topk_per_group format_report
#   sink_roundtrip merged_dict sketch_countmin q1_pricing_summary
#   q3_shipping_priority q5_supplier_revenue agg_rollup
#   agg_grouping_sets sample_stratified agg_stats agg_percentile
#   agg_approx_distinct_grouped agg_approx_percentile distinct_agg
#   having_filter case_when_bucket join_semi join_anti join_outer
#   join_broadcast_dim multiway_join join_salted agg_pivot agg_cube
#   sample_hash window_rank window_ranking null_scalars
#   window_first_last sketch_kmv_distinct sketch_kmv_overlap
#
# Round-3 window (50): every remaining never-certified entry except
# the 15 in _DEFER_TO_NEXT_ROTATION, PLUS sketch_kmv_distinct /
# sketch_kmv_overlap — their r1 certification predates the round-2
# hash rewrite, so the fixed code needs a fresh green row. Fast
# entries lead and the structurally slow ones (streaming fixture
# builds, iterative propagation, wide-k signatures) close the window,
# so a time-cut sweep still certifies the maximum prefix.
_CERTIFY_WINDOW = [
    # re-certify the round-2 sketch rewrites (ADVICE.md high item)
    "sketch_kmv_distinct",
    "sketch_kmv_overlap",
    # sources / cheap aggregates
    "scan_csv",
    "agg_histogram",
    # text analysis
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "tfidf",
    # curation
    "decontaminate",
    "repetition_metrics",
    "pii_redact",
    "sample_per_source",
    "winsorize",
    "pipeline_curation",
    "pipeline_training_corpus",
    # dedup (fast forms first)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # similarity search / embeddings
    "simsearch_topk",
    "simsearch_topk_pandas",
    "simsearch_lsh",
    "simsearch_lsh_topk",
    "embed_quantize",
    "embed_label_means",
    "embed_neardup",
    "simsearch_ivf_assign",
    "simsearch_ivf_topk",
    "agg_approx_distinct",
    # time series / warehouse / layout / temporal joins
    "resample_ffill",
    "dq_profile",
    "scd2_merge",
    "zorder_values",
    "sink_partitioned",
    "asof_join",
    "asof_tolerance",
    "join_range",
    # multimodal
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frames",
    # slow tail: iterative / wide-k / streaming fixture builds
    "dedup_components",
    "dedup_minhash_lsh_k128",
    "stream_tumbling",
    "stream_dedup",
    "stream_sessionize",
    "stream_chi_square",
    "stream_interval_join",
    "stream_static_join",
]

# Never-certified entries deliberately held for the round-4 rotation
# (50-slot window; these 15 are the lowest-risk basic relational /
# window forms). Never register NEW queries ahead of these.
# ROUND-4 TODO: promote these 15 plus the round-3 tail additions
# (q4_order_priority q6_forecast_revenue q10_returned_items
# q14_promo_effect q18_large_volume window_ntile join_bucketed
# ngram_counts join_bloom_prefilter stream_quality_filter doc_chunk
# pack_sequences q7_nation_volume q19_discounted_revenue
# sink_orc_roundtrip rollup_multigrain stream_doc_chunk
# set_intersect_all set_except_all explode_outer_keywords) into
# _CERTIFY_WINDOW — 35 entries, completing
# cumulative driver-certified coverage of the whole registry.
_DEFER_TO_NEXT_ROTATION = [
    "window_lag",
    "window_moving_sum",
    "window_tumbling",
    "window_sliding",
    "window_session",
    "window_range_frame",
    "set_union",
    "set_intersect",
    "set_except",
    "date_scalars",
    "string_scalars",
    "array_scalars",
    "top_n_global",
    "sql_correlated_subquery",
    "agg_unpivot",
]

assert len(_CERTIFY_WINDOW) == 50, len(_CERTIFY_WINDOW)
_head = [k for k in _CERTIFY_WINDOW if k in REGISTRY]
_mid = [k for k in _DEFER_TO_NEXT_ROTATION if k in REGISTRY]
REGISTRY = {
    **{k: REGISTRY[k] for k in _head},
    **{k: REGISTRY[k] for k in _mid},
    **{k: v for k, v in REGISTRY.items() if k not in _head and k not in _mid},
}
