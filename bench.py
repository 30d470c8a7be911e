"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Output contract (round-8 fix): the headline set has grown past what a
bounded tail-capture of stdout can hold in one line (BENCH_r07.json
recorded `"parsed": null` because the single 75-query JSON line
overflowed the driver's ~2 KB tail window, truncating the total and
the first queries). So bench now prints SEVERAL short JSON lines, each
independently parseable and each carrying the headline total:

  line 1..k: {"metric", "value", "unit", "sf", "queries_part": "i/k",
              "queries": {<=12 entries>}}
  last line: {"metric", "value", "unit", "sf", "n_queries",
              "sentinel", "detail_file"}   # compact, < ~400 bytes

Whatever suffix of stdout survives truncation, its last complete line
is the compact summary (always parseable, always has the total), and
the preceding chunk lines re-supply per-query medians. The full
single-object record (old one-line format) is additionally written to
BENCH_FULL.json beside this script.

Per BASELINE.md: wall-clock per query, median of 3 timed runs after 1
warm-up, single local SparkSession, AQE on, fixed shuffle partitions.
Each run executes the full plan to the sink side (count/collect) so
scan→shuffle→agg costs are all inside the measurement.

Load sentinel: recorded numbers on a shared box have swung up to ~70x
under external CPU contention with byte-identical code (round-2
finding), so every timed sample is preceded by a fixed tiny Spark job
whose quiet-machine cost is calibrated at startup. A sample whose
sentinel exceeds the threshold is discarded and re-run (bounded
retries); sentinel stats land in the output JSON so a recorded
regression is distinguishable from a loaded machine.

Canary control (round 12): a fixed 10-query CANARY set is timed at
session start AND end; both runs, their totals, and the end/start
drift ratio are recorded (BENCH_FULL.json `canary`, compact line
`sentinel.canary_drift_ratio`). Identical code runs twice, so a
ratio well above 1 proves the box heated during the session and the
mid-session medians inherit that discount; a ratio near 1 makes a
recorded regression structural. BENCH_FULL.json also records
`run_order` so position-in-session effects are reconstructable.

Baseline-aware rerun (round 13): any query whose median lands over
RERUN_RATIO x its BASELINE.md bound is re-measured once at session
end and the better median kept; both readings are recorded under
`reruns` so noise-vs-regression is decidable per query (see the
RERUN_RATIO comment).
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
    # round-4 additions (first measurement = their baseline)
    "pipeline_dedup_corpus",
    "lm_unigram_score",
    "source_temperature",
    "simsearch_pq_refined",
    "dedup_incremental",
    "asof_nearest",
    "agg_linreg",
    "snapshot_diff",
    "corpus_composition",
    "events_funnel",
    "simsearch_ivfpq",
    "sample_weighted_per_source",
    # round-5 additions (first measurement = their baseline)
    "simsearch_ivfpq_nprobe2",
    "dedup_spans",
    "cross_doc_repetition",
    "vocab_oov",
    "decontaminate_spans",
    "tokens_to_ids",
    "corpus_cut_spans",
    "select_token_budget",
    "pipeline_span_surgery",
    # round-6 additions (first measurement = their baseline)
    "bm25_score",
    "lm_bigram_score",
    "similarity_join_minhash",
    "dedup_jaccard_estimate",
    "split_no_leakage",
    "winnowing_fingerprint",
    "bm25_topk",
    "winnowing_pairs",
    "q13_customer_distribution",
    "q21_sole_blame_supplier",
    "q22_idle_capital",
    "normalize_text",
    "dedup_normalized",
    "skew_profile",
    "ts_paa",
    "ts_similarity_topk",
    # round-7 additions (first measurement = their baseline)
    "ts_similarity_refined",
    "ts_sax",
    "ts_sax_group",
    "dedup_semantic",
    "q8_market_share",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "ts_similarity_sax_topk",
    # round-8 additions (first measurement = their baseline)
    "ts_similarity_dtw_topk",
    "ts_motif",
    "ts_discord",
    "bpe_pair_counts",
    "bpe_merges",
    "bpe_vocab",
    "ts_changepoint",
    "ts_anomaly_zscore",
    "ts_seasonality",
    "ts_corr_topk",
    "dq_drift_psi",
    "graph_pagerank",
    "graph_triangles",
    "distinct_sketch_kmv",
    "dq_quantiles",
    "ts_forecast_ewma",
    "quality_gopher_rules",
    "c4_line_dedup",
    "dsir_importance",
    "ts_forecast_holt",
    "multimodal_av_probe",
    "resample_interpolate",
    "distinct_sketch_kmv_merge",
    "graph_ppr",
    "collocations_pmi",
    "skipgram_cooc",
    "events_retention",
    "basket_rules",
    "ts_acf",
    # round-9 additions (first measurement = their baseline)
    "image_phash",
    "image_neardup_pairs",
    "similarity_join_embedding",
    "quality_model_score",
    "dq_quantiles_sketch",
    "dq_quantiles_sketch_merge",
    "heavy_hitters_mg",
    "heavy_hitters_mg_merge",
    "image_dedup_components",
    "similarity_join_topk",
    # round-10 additions (first measurement = their baseline)
    "er_blocking_pairs",
    "er_clusters",
    "similarity_join_reranked",
    "dq_drift_psi_sketch",
    "er_survivorship",
    "er_blocking_multipass",
    "er_match_scores",
    "hybrid_search_rrf",
    "simsearch_sq_topk",
    "bpe_encode",
    "dq_anomaly_mad",
    "dedup_containment",
    # round-11 additions (first measurement = their baseline)
    "image_phash_decoded",
    "similarity_join_minhash_shuffle",
    "image_phash_gif",
    "image_phash_jpeg",
    "image_neardup_decoded",
    "audio_fingerprint",
    "video_frame_phash",
    "video_neardup",
    # round-11 fourth batch (first measurement = their baseline)
    "inverted_index",
    "audio_energy_segments",
    "video_shot_boundaries",
    "cdc_apply",
    "events_attribution",
    # round-11 fifth batch (first measurement = their baseline)
    "graph_label_propagation",
    "events_markov_transitions",
    "compaction_plan",
    "lm_heldout_score",
    # round-11 sixth batch (first measurement = their baseline)
    "dq_checks",
    "html_strip",
    "ts_forecast_holt_winters",
    "embed_power_iteration",
    "bootstrap_ci",
    "lm_kn_bigram_score",
    "graph_kcore",
    # round-11 seventh batch (first measurement = their baseline)
    "ts_decompose_classical",
    "graph_linkpred_jaccard",
    # round-12 additions (first measurement = their baseline)
    "graph_hits",
    "events_cumulative_reach",
    "lm_stupid_backoff",
    "image_thumbnail_decoded",
    # round-12 second batch (first measurement = their baseline)
    "distinct_sketch_hll",
    "distinct_sketch_hll_merge",
    "ts_lead_lag",
    "quantile_bucketize",
    "audio_downsample_decoded",
    "er_blocking_lsh",
    "er_clusters_lsh",
    "distinct_sketch_hll_intersection",
    "lm_jm_bigram_score",
    # round-13 additions (first measurement = their baseline)
    "dedup_bloom_screen",
    "quantile_bucketize_2level",
    "robots_screen",
    "image_phash_palette",
    "quality_perplexity_buckets",
    # round-14 additions (first measurement = their baseline)
    "dedup_minhash_oph",
    "zonemap_prune",
    "graph_components_largestar",
    "tfidf_topk_terms",
    "dq_drift_ks",
    # round-14 second batch (first measurement = their baseline)
    "g2_feature_scores",
    "embed_dim_variance",
    "embed_random_projection",
    # round-14 third batch (first measurement = their baseline)
    "dedup_simhash_pairs",
    "er_sorted_neighborhood",
    # round-14 fifth batch (first measurement = their baseline)
    "pipeline_feature_store",
    # round-14 promotions out of BENCH_EXCLUDED_LIGHT: the round-13
    # dominance audit measured scan_warc at 3.4x its scan_json
    # representative (WARC header parse + Content-Length framing is
    # real extra work) and doc_chunk_overlap at 1.45x doc_chunk (the
    # documented 2x window fan-out) — neither is dominated, so each
    # gets its own regression row
    "scan_warc",
    "doc_chunk_overlap",
    # round-15 first batch (first measurement = their baseline)
    "pii_screen",
    "char_entropy_screen",
    # round-15 second batch (first measurement = their baseline)
    "embed_drift_centroid",
    "simsearch_mmr_topk",
    # round-15 third batch (first measurement = their baseline)
    "ngram_novelty",
    # round-15 fourth batch (first measurement = their baseline)
    "embed_standardize",
    "source_dedup_rate",
    "dq_profile_columns",
]

# ---------------------------------------------------------------------------
# Bench exclusion policy (explicit — sync_docs.py --check proves the
# three sets below PARTITION the registry, so no entry can silently
# go unbenched):
#
# 1. HEADLINE — timed every round at $SPARK_GRAFT_SF_DIR; first
#    measurement becomes the entry's BASELINE.md row, later rounds
#    are held to the 2x bound.
# 2. stream_* — EXCLUDED from wall-clock by policy: Structured
#    Streaming micro-batch queries are trigger/harness-dominated at
#    bench SFs (availableNow micro-batch setup >> operator cost), so
#    a wall-clock number would measure the harness, not the plan.
#    Their correctness IS certified (batch-twin oracles); their plan
#    shapes are asserted in tests/test_plans.py and
#    tests/test_streaming_late.py. See BASELINE.md "Streaming
#    entries".
# 3. BENCH_EXCLUDED_LIGHT — batch entries whose execution cost is
#    dominated by a benched HEADLINE representative of the same
#    family (scalar/projection/filter one-liners, sink round-trips,
#    window/set-op variants, cheaper operating points of benched
#    operators). Listing them would add ~100 sub-second rows of
#    sentinel noise to every bench without a regression signal the
#    family representative doesn't already give. Any NEW entry must
#    be placed in exactly one of these sets or sync_docs --check
#    fails.
# ---------------------------------------------------------------------------

BENCH_EXCLUDED_LIGHT = [
    # round-13: dedup_bloom_screen is the benched family
    # representative (round-14 dominance audit: merge 0.68 vs screen
    # 0.65 — parity within sentinel noise); hard-negative mining is
    # cosine_topk + a fused filter (audit: 0.50 vs simsearch_topk
    # 0.45, parity within noise)
    "dedup_bloom_merge",
    "simsearch_hard_negatives",
    # round-14: tokenize + row-local blocklist count — cost shape
    # dominated by the benched quality_gopher_rules screen
    "toxicity_screen",
    # round-14: identical bigram skeleton to the benched
    # collocations_pmi (one checkpointed pair-count exchange), only
    # the final scoring expression differs
    "collocations_g2",
    # round-14: row-local cents-digit extraction + one 9-group agg —
    # dominated by the benched dq_drift_psi events pass
    "dq_benford",
    # round-14: one ranking window per small group key — the benched
    # window_rank representative covers the sort-window cost shape
    "window_cume_dist",
    # round-15: RANGE-frame variant of the benched window_moving_sum
    # cost shape (same one-exchange key window, different frame kind)
    "window_range_between",
    # round-15: the user-keyed ranking window is the cost, and the
    # benched events_attribution rides the identical exchange
    "events_path_topk",
    # round-15: metric aggregates over q·k shortlist rows riding the
    # benched simsearch_topk / simsearch_lsh_topk index probes
    "rank_eval_ndcg",
    "rank_eval_recall",
    # round-15: edge derivation is a strict prefix of the benched
    # graph_triangles plan (same co-order build, no orientation pass)
    "graph_degree_distribution",
    "agg_approx_distinct",
    "agg_approx_distinct_grouped",
    "agg_approx_percentile",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_mode",
    "agg_percentile",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "agg_unpivot",
    "anti_join_stopwords",
    "array_scalars",
    "asof_tolerance",
    "case_when_bucket",
    "casefold",
    "corpus_shard",
    "corpus_split",
    "count_cat",
    "count_term",
    "count_total",
    "date_scalars",
    "dedup_components",
    "dedup_url_canonical",
    "dedup_keep_best",
    "dedup_simhash",
    "dedup_terms",
    "distinct_agg",
    "doc_chunk",
    "doc_fingerprint",
    "dq_profile",
    "dq_freshness",
    "dq_referential",
    "embed_label_means",
    "embed_neardup",
    "embed_quantize",
    # round-14: exact dot-product top-k — same broadcast-query scan +
    # WindowGroupLimit shape as the benched simsearch_topk, minus the
    # two norm accumulators
    "simsearch_mips_topk",
    "explode_outer_keywords",
    "format_report",
    "having_filter",
    "join_anti",
    "join_bloom_prefilter",
    "join_broadcast_dim",
    "join_bucketed",
    "join_cat_totals",
    "join_outer",
    "join_range",
    "join_semi",
    "join_term_totals",
    "json_schema_parse",
    "length_filter",
    "map_scalars",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_meta",
    "multimodal_resize",
    "multiway_join",
    "ngram_counts",
    "nonempty_filter",
    "null_scalars",
    "pack_sequences",
    "pii_redact",
    "project",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_volume",
    "q19_discounted_revenue",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "regexp_extract",
    "resample_ffill",
    "rollup_multigrain",
    "sample_hash",
    "sample_per_source",
    "sample_stratified",
    "sample_weighted",
    "scan_csv",
    "scan_json",
    "scd2_merge",
    "sentence_stats",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union",
    "simsearch_ivf_assign",
    "simsearch_ivf_topk",
    "simsearch_lsh",
    "simsearch_pq_encode",
    "simsearch_pq_topk",
    "simsearch_topk_pandas",
    "sink_orc_roundtrip",
    "sink_partitioned",
    "sink_roundtrip",
    "sketch_kmv_overlap",
    "sql_correlated_subquery",
    "stopword_filter",
    "string_scalars",
    "token_count",
    "tokenize_positions",
    "top_n_global",
    "vocab_topv",
    # round-14: top-64 vocab (the benched vocab_oov's token-count agg)
    # + a 64-row regression — dominated by the vocab_oov representative
    "vocab_zipf_fit",
    "window_first_last",
    "window_lag",
    "window_moving_sum",
    "window_ntile",
    "window_percentiles",
    "window_range_frame",
    "window_ranking",
    "window_sliding",
    "winsorize",
    "zorder_values",
]

WARMUP = 1
RUNS = 3
# Extra attempts allowed per query when the sentinel flags contention.
MAX_HOT_RETRIES_PER_QUERY = 2

# Baseline-aware auto-rerun (round-13 addition): the per-sample
# sentinel catches load spikes it can SEE, but the round-12 board
# recorded 6 queries at 2-3x their baselines with byte-identical code
# and hot_discards 0 — contention concentrated inside the measured
# samples themselves, invisible to the probe. So any query whose
# session median exceeds RERUN_RATIO x its BASELINE.md bound is
# re-measured once at the END of the session (deferred, so a
# transient spike and any run_order adjacency effect have passed) and
# the better median is recorded. Both readings land in
# BENCH_FULL.json `reruns` so the decision is auditable — a query
# that stays slow on BOTH readings is a real regression, not noise.
#
# Sub-second baselines sit at the measurement noise floor: a 0.28 s
# query can read 1.9x without any plan change, yet never trips the
# 2.0x rerun, so the drift sticks on the board for rounds (round-13
# agg_linreg). Queries with a baseline under SMALL_BASELINE_SEC rerun
# at the tighter SMALL_RERUN_RATIO so noise self-corrects.
RERUN_RATIO = 2.0
SMALL_BASELINE_SEC = 0.5
SMALL_RERUN_RATIO = 1.3


def _rerun_trigger(baseline: float) -> float:
    return baseline * (
        SMALL_RERUN_RATIO if baseline < SMALL_BASELINE_SEC else RERUN_RATIO
    )


def _load_baselines() -> dict[str, float]:
    """Per-query regression bounds parsed from BASELINE.md rows
    (`| name | seconds | ...`, names restricted to registry
    entries); a `ROUND-N REBASE: x` note anywhere in the row
    overrides the original number — per BASELINE.md the rebase IS
    the bound future rounds are held to."""
    import re

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE.md"
    )
    out: dict[str, float] = {}
    try:
        with open(path, encoding="utf-8") as f:
            lines = f.read().splitlines()
    except OSError:
        return out
    for ln in lines:
        m = re.match(
            r"\|\s*([a-z0-9_]+)(?:\s*\([^|]*\))?\s*\|\s*([0-9]+(?:\.[0-9]+)?)",
            ln,
        )
        if not m or m.group(1) not in REGISTRY:
            continue
        reb = re.findall(r"REBASE:\s*([0-9]+(?:\.[0-9]+)?)", ln)
        out[m.group(1)] = float(reb[-1]) if reb else float(m.group(2))
    return out

# Canary control (round-12 addition): a fixed 10-query set, spanning
# the cheap-to-heavy range of benched families, timed once at session
# START and again at session END with the same sentinel discipline.
# Rationale: the r11 board drifted +18% on the common set with
# byte-identical plans; with only per-query medians there is no way
# to decide box-noise vs real regression from the record alone. The
# canary gives that decision: end/start drift >> 1 on identical code
# within one session == the box heated under us, and the mid-session
# per-query numbers inherit that discount. Both runs plus the drift
# ratio land in BENCH_FULL.json and the compact summary line.
CANARY = [
    "topk_per_group",
    "chi_square",
    "q1_pricing_summary",
    "window_rank",
    "dedup_exact",
    "simsearch_topk",
    "tfidf",
    "quality_score",
    "distinct_sketch_kmv",
    "ts_paa",
]

# Second operating point (round-12 addition): the heaviest media
# decode entries are additionally timed at a SECOND scale factor
# (default sf0.01, override $SPARK_GRAFT_SF2_DIR) so the decode cost
# model in SCALE.md (wall linear in blob bytes) rests on two measured
# points per entry instead of one. Recorded in BENCH_FULL.json under
# `second_point`; excluded from the headline total.
SECOND_POINT = [
    "image_phash_jpeg",
    "image_phash_gif",
    "audio_fingerprint",
    "video_frame_phash",
]


def _sentinel_time(spark) -> float:
    """One fixed tiny job (8 tasks, ~1M rows of codegen arithmetic):
    cheap enough to run before every sample, big enough that external
    CPU contention shows up in its wall-clock."""
    t0 = time.perf_counter()
    spark.range(0, 1_000_000, 1, 8).selectExpr("sum(id * 2) AS s").collect()
    return time.perf_counter() - t0


def _calibrate(spark) -> tuple[float, float]:
    """(quiet_cost, hot_threshold): min of 5 samples after 3 warm-ups.
    The threshold is 3x the quiet floor with a 0.25s absolute lower
    bound (scheduler jitter on a fine machine must not flag)."""
    for _ in range(3):
        _sentinel_time(spark)
    quiet = min(_sentinel_time(spark) for _ in range(5))
    return quiet, max(0.25, 3.0 * quiet)


# Max queries per chunk line: 12 entries at ~30 bytes each plus the
# repeated summary fields keeps every printed line well under 1 KB, so
# any tail-capture window >= 1 KB always contains at least one
# complete, parseable line.
CHUNK = 12


def _emit(results: dict[str, float], total: float, sf, sentinel: dict) -> list[str]:
    """Render the multi-line output contract (see module docstring).

    Every returned line is standalone-parseable JSON carrying the
    headline metric/value, so a line-oriented consumer can recover the
    total from ANY complete line; the final line is the compact
    summary that fits whole inside a bounded tail capture."""
    head = {"metric": "headline_queries_total_wall_clock", "value": total, "unit": "sec", "sf": sf}
    names = list(results)
    chunks = [names[i : i + CHUNK] for i in range(0, len(names), CHUNK)] or [[]]
    lines = [
        json.dumps(
            {**head, "queries_part": f"{i + 1}/{len(chunks)}", "queries": {n: results[n] for n in part}},
            separators=(",", ":"),
        )
        for i, part in enumerate(chunks)
    ]
    # The summary line must stay tail-capture-sized even on a hot box:
    # hot_queries can name EVERY headline query under sustained
    # contention (~2 KB of names — the very overflow this contract
    # exists to prevent), so the summary carries the count plus a few
    # exemplars; the full list lives in BENCH_FULL.json.
    sent = dict(sentinel)
    hot = list(sent.get("hot_queries", []))
    sent["n_hot_queries"] = len(hot)
    if len(hot) > 3:
        sent["hot_queries"] = hot[:3] + [f"...+{len(hot) - 3} more"]
    lines.append(
        json.dumps(
            {**head, "n_queries": len(results), "sentinel": sent, "detail_file": "BENCH_FULL.json"},
            separators=(",", ":"),
        )
    )
    return lines


class _Bench:
    """Sentinel-guarded timing state shared by canary + headline runs."""

    def __init__(self, spark, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.quiet, self.threshold = _calibrate(spark)
        self.hot_discards = 0
        self.max_seen = self.quiet
        # queries whose recorded median includes a sample admitted
        # while the sentinel still flagged contention (retries
        # exhausted) — so consumers can discount those entries
        # instead of reading a regression into load noise
        self.hot_queries: list[str] = []

    def time_query(self, name: str, track_hot: bool = True) -> float | None:
        spec = REGISTRY.get(name)
        if spec is None:
            return None
        fn = spec[0]
        times = []
        retries_left = MAX_HOT_RETRIES_PER_QUERY
        i = 0
        query_hot = False
        while i < WARMUP + RUNS:
            s = _sentinel_time(self.spark)
            self.max_seen = max(self.max_seen, s)
            if s > self.threshold:
                if retries_left > 0:
                    self.hot_discards += 1  # loaded box: skip sample
                    retries_left -= 1
                    continue
                if i >= WARMUP:
                    query_hot = True  # contended sample admitted
            t0 = time.perf_counter()
            df = fn(self.spark, self.sf_dir)
            df.collect()
            dt = time.perf_counter() - t0
            if i >= WARMUP:
                times.append(dt)
            i += 1
        if query_hot and track_hot:
            self.hot_queries.append(name)
        return round(statistics.median(times), 3)

    def run_canary(self) -> dict[str, float]:
        # canary hotness is visible in the drift ratio itself, so it
        # does not pollute the headline hot_queries list
        out = {n: self.time_query(n, track_hot=False) for n in CANARY}
        return {n: t for n, t in out.items() if t is not None}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    bench = _Bench(spark, sf_dir)
    canary_start = bench.run_canary()
    baselines = _load_baselines()
    results: dict[str, float] = {}
    for name in HEADLINE:
        t = bench.time_query(name)
        if t is not None:
            results[name] = t
    # deferred auto-rerun: queries over their rerun trigger (2x
    # baseline; 1.3x for sub-0.5s noise-floor baselines)
    # re-measure once now that the rest of the session's load (and
    # any run_order adjacency) has passed; keep the better median
    reruns: dict[str, dict] = {}
    rerun_still_slow: list[str] = []
    for name, t in list(results.items()):
        b = baselines.get(name)
        if b is None or t <= _rerun_trigger(b):
            continue
        t2 = bench.time_query(name)
        kept = min(t, t2) if t2 is not None else t
        # the rerun only CLEARS the flag when the second reading also
        # lands back under the trigger threshold — otherwise keeping
        # min() would let one lucky sample permanently mask a real
        # regression in the headline totals
        cleared = t2 is not None and t2 <= _rerun_trigger(b)
        if not cleared:
            rerun_still_slow.append(name)
        reruns[name] = {
            "first": t,
            "rerun": t2,
            "baseline": b,
            "kept": kept,
            "cleared": cleared,
        }
        results[name] = kept
    sf2_dir = os.environ.get("SPARK_GRAFT_SF2_DIR", "/root/testdata/sf0.01")
    second_point: dict[str, float] = {}
    if os.path.isdir(sf2_dir):
        bench2 = _Bench(spark, sf2_dir)
        bench2.quiet, bench2.threshold = bench.quiet, bench.threshold
        for name in SECOND_POINT:
            t = bench2.time_query(name, track_hot=False)
            if t is not None:
                second_point[name] = t
        bench.max_seen = max(bench.max_seen, bench2.max_seen)
        bench.hot_discards += bench2.hot_discards
    canary_end = bench.run_canary()
    cs, ce = sum(canary_start.values()), sum(canary_end.values())
    canary = {
        "start": canary_start,
        "end": canary_end,
        "start_total_sec": round(cs, 3),
        "end_total_sec": round(ce, 3),
        # identical code both runs: ratio >> 1 == the box heated
        # during the session; ~1 == mid-session numbers trustworthy
        "drift_ratio": round(ce / cs, 4) if cs > 0 else None,
    }
    total = round(sum(results.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    sentinel = {
        "quiet_sec": round(bench.quiet, 4),
        "threshold_sec": round(bench.threshold, 4),
        "max_seen_sec": round(bench.max_seen, 4),
        "hot_discards": bench.hot_discards,
        "hot_queries": bench.hot_queries,
        "canary_drift_ratio": canary["drift_ratio"],
        # per-query rerun decisions (count + exemplars; full detail
        # with both readings in BENCH_FULL.json `reruns`)
        "n_reruns": len(reruns),
        "rerun_queries": list(reruns)[:3],
        # reruns that did NOT land back under RERUN_RATIO x baseline:
        # min() was still recorded, but these are unmasked regressions
        "rerun_still_slow": rerun_still_slow,
    }
    full = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": results,
        "run_order": list(results),
        "sf": sf_val,
        "sentinel": sentinel,
        "canary": canary,
        "second_point": {"sf_dir": sf2_dir, "queries": second_point},
        "reruns": reruns,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"), "w") as f:
        json.dump(full, f)
        f.write("\n")
    for line in _emit(results, total, sf_val, sentinel):
        print(line)


if __name__ == "__main__":
    main()
