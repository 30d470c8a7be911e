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
# Round-9 window (50) = the 8 round-9 NEW entries (image_phash,
# image_neardup_pairs, similarity_join_embedding, quality_model_score,
# dq_quantiles_sketch, dq_quantiles_sketch_merge, heavy_hitters_mg,
# heavy_hitters_mg_merge — same-round promotion, local oracle-green at
# both SFs), + the 3 round-9 CHANGED entries (ts_anomaly_zscore /
# stream_anomaly_screen: the reported z's variance now derives from
# the exact 128-bit nvar per the round-8 advisor; dq_drift_psi: the
# driver collect replaced by a lazy broadcast bounds relation), + ALL
# 35 remaining r4-era stale rows (draining the round-8 verdict's #1
# item — after this window no entry's newest driver green is older
# than r5), + 4 of the oldest r5 rows led by simsearch_ivfpq (whose
# oracle twin carries this round's ORDER BY seed-CTE fix). Fast
# entries lead; streaming fixtures close the window so a time-cut
# sweep still certifies the maximum prefix.
_CERTIFY_WINDOW = [
    # round-9 new: perceptual image near-dup (dHash + banded Hamming)
    "image_phash",
    "image_neardup_pairs",
    # round-9 new: mergeable bottom-k rank sketch + merge law
    "dq_quantiles_sketch",
    "dq_quantiles_sketch_merge",
    # round-9 new: deterministic Misra-Gries heavy hitters + merge law
    "heavy_hitters_mg",
    "heavy_hitters_mg_merge",
    # round-9 new: fastText-shape hashed-ngram quality model
    "quality_model_score",
    # round-9 new: cluster-bucketed embedding similarity JOIN
    "similarity_join_embedding",
    # round-9 changed: exact-nvar z variance; lazy PSI bounds
    "ts_anomaly_zscore",
    "dq_drift_psi",
    # r4-era stale re-certs (the FULL remaining list — scalars,
    # set-ops, windows, TPC-H, joins, chunking, packing; the §2
    # contingency/join spine count_term/cat/total + join_*_totals
    # closes the group as the board's oldest greens)
    "agg_unpivot",
    "array_scalars",
    "date_scalars",
    "string_scalars",
    "set_except",
    "set_except_all",
    "set_intersect_all",
    "explode_outer_keywords",
    "embed_quantize",
    "window_ntile",
    "window_sliding",
    "window_tumbling",
    "window_lag",
    "window_session",
    "pack_sequences",
    "rollup_multigrain",
    "doc_chunk",
    "sql_correlated_subquery",
    "top_n_global",
    "ngram_counts",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_volume",
    "q19_discounted_revenue",
    "join_bucketed",
    "join_bloom_prefilter",
    "count_term",
    "count_cat",
    "count_total",
    "join_term_totals",
    "join_cat_totals",
    # oldest r5 rows: the seed-CTE-touched IVFPQ plus three fast ones
    "simsearch_ivfpq",
    "tfidf",
    "q1_pricing_summary",
    "window_moving_sum",
    # slow fixtures close the window: ORC sink round-trip, streaming
    "sink_orc_roundtrip",
    "stream_anomaly_screen",
    "stream_doc_chunk",
]

# Register NEW queries at the registry TAIL, then promote them into
# the next round's _CERTIFY_WINDOW.
#
# Round-10 window TODO: promote the round-9 SECOND-BATCH tail
# additions first (image_dedup_components, similarity_join_topk,
# stream_quality_model — registered after the round-9 window filled;
# local oracle-green at both SFs), then any round-10 tail additions,
# then the oldest r5 rows not re-certified this round (43 remain:
# agg_grouping_sets, agg_linreg, agg_mode, agg_percentile, agg_rollup,
# agg_stats, anti_join_stopwords, asof_nearest, casefold,
# corpus_composition, corpus_shard, corpus_split, decontaminate,
# dedup_incremental, dedup_keep_best, dedup_minhash_lsh,
# dedup_minhash_lsh_k128, dedup_terms, distinct_agg, events_funnel,
# having_filter, join_broadcast_dim, join_outer, join_semi,
# json_schema_parse, length_filter, lm_unigram_score, map_scalars,
# nonempty_filter, pipeline_training_corpus, project,
# q3_shipping_priority, q5_supplier_revenue, regexp_extract,
# sample_weighted, sample_weighted_per_source, simsearch_pq_encode,
# simsearch_pq_refined, simsearch_pq_topk, sink_roundtrip,
# snapshot_diff, source_temperature, tokenize_positions), then the
# oldest r6 rows (42: the round-5/6 tail — winnowing pair, splits,
# asof family, scd2, layout/bucketing, stream_neardup, ...).
_DEFER_TO_NEXT_ROTATION: list = []

assert len(_CERTIFY_WINDOW) == 50, len(_CERTIFY_WINDOW)
_head = [k for k in _CERTIFY_WINDOW if k in REGISTRY]
_mid = [k for k in _DEFER_TO_NEXT_ROTATION if k in REGISTRY]
REGISTRY = {
    **{k: REGISTRY[k] for k in _head},
    **{k: REGISTRY[k] for k in _mid},
    **{k: v for k, v in REGISTRY.items() if k not in _head and k not in _mid},
}
