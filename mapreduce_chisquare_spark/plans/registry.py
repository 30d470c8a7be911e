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
# Round-5 window (50) = the 19 round-4 tail entries never driver-
# certified in any round (all local oracle-green), + window_moving_sum
# (round 4's sole red — oracle-side DuckDB HUGEINT fixed with an
# explicit BIGINT cast this round), + the 6 load-bearing extensions
# rewritten since their r3 green rows (dedup_minhash_lsh(_k128),
# dedup_components, tfidf, decontaminate, pipeline_training_corpus),
# + 24 re-certs of entries whose newest green row dates to r2.
# Fast entries lead; the heavier pipelines close the window so a
# time-cut sweep still certifies the maximum prefix.
_CERTIFY_WINDOW = [
    # never-certified round-4 tail: cheap map-side / single-agg forms
    "agg_linreg",
    "agg_mode",
    "corpus_shard",
    "corpus_split",
    "sample_weighted",
    "sample_weighted_per_source",
    "source_temperature",
    "corpus_composition",
    "snapshot_diff",
    "events_funnel",
    "asof_nearest",
    "lm_unigram_score",
    # never-certified round-4 tail: ANN PQ/IVFPQ family
    "simsearch_pq_encode",
    "simsearch_pq_topk",
    "simsearch_pq_refined",
    "simsearch_ivfpq",
    # never-certified round-4 tail: dedup family
    "dedup_keep_best",
    "dedup_incremental",
    # round-4 red, oracle SQL cast fixed (DuckDB HUGEINT → BIGINT)
    "window_moving_sum",
    # re-certs: rewritten since their r3 green rows
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_k128",
    "dedup_components",
    "tfidf",
    "decontaminate",
    # r2-only re-certs: §2-adjacent text/scalar surface
    "project",
    "nonempty_filter",
    "casefold",
    "length_filter",
    "dedup_terms",
    "anti_join_stopwords",
    "tokenize_positions",
    "sink_roundtrip",
    "json_schema_parse",
    "map_scalars",
    "regexp_extract",
    # r2-only re-certs: relational agg/join surface
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_revenue",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_stats",
    "agg_percentile",
    "distinct_agg",
    "having_filter",
    "join_semi",
    "join_anti",
    "join_outer",
    "join_broadcast_dim",
    # slow tail: composed pipelines (never-certified + rewritten)
    "pipeline_dedup_corpus",
    "pipeline_training_corpus",
]

# Register NEW queries at the registry TAIL, then promote them into
# the next round's _CERTIFY_WINDOW.
#
# Round-6 window TODO: promote the round-5 tail additions (all local
# oracle-green, never driver-certified): simsearch_ivfpq_nprobe2,
# dedup_spans, cross_doc_repetition, vocab_topv, vocab_oov,
# decontaminate_spans, tokens_to_ids, corpus_cut_spans,
# select_token_budget, pipeline_span_surgery; re-cert
# the 14 remaining r2-only
# entries (sketch_countmin, sample_stratified,
# agg_approx_distinct_grouped, agg_approx_percentile, case_when_bucket,
# multiway_join, join_salted, agg_pivot, agg_cube, sample_hash,
# window_rank, window_ranking, window_first_last, null_scalars); then
# fill remaining slots with the oldest r3 rows (streaming, multimodal,
# asof/range-join, sketches).
_DEFER_TO_NEXT_ROTATION: list = []

assert len(_CERTIFY_WINDOW) == 50, len(_CERTIFY_WINDOW)
_head = [k for k in _CERTIFY_WINDOW if k in REGISTRY]
_mid = [k for k in _DEFER_TO_NEXT_ROTATION if k in REGISTRY]
REGISTRY = {
    **{k: REGISTRY[k] for k in _head},
    **{k: REGISTRY[k] for k in _mid},
    **{k: v for k, v in REGISTRY.items() if k not in _head and k not in _mid},
}
