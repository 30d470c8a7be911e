"""Property-based tests (SURVEY.md §5.3): invariants of the χ²
pipeline over hypothesis-generated corpora.

- χ² ≥ 0 always; χ² = 0 when term ⟂ category
- contingency cells: A+B+C+D = N for every (term, category)
- duplicating every document k× leaves the top-k relation invariant
  (ranks, terms, and χ² values — χ² is scale-dependent in general,
  but duplication×k maps (A,B,C,D,N) → k·(…), and the formula is
  homogeneous: N(AD-BC)²/∏ scales by k⁴·k/k⁴ = k… verified instead
  on the *ranking* plus χ² scaled by k)
- per-category output ≤ k rows; merged dict = union of report terms
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_chisquare_spark.operators.report import merged_dict
from mapreduce_chisquare_spark.plans.chisquare import chi_square_top_terms

TERMS = ["apple", "banana", "cherry", "dates", "elder", "figs"]
CATS = ["X", "Y", "Z"]

doc = st.tuples(
    st.lists(st.sampled_from(TERMS), min_size=1, max_size=5),
    st.sampled_from(CATS),
)
corpus_strategy = st.lists(doc, min_size=2, max_size=14)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, corpus, dup=1):
    rows = []
    for rep in range(dup):
        for i, (words, cat) in enumerate(corpus):
            rows.append((rep * 10_000 + i, " ".join(words), cat))
    return spark.createDataFrame(
        rows, "doc_id long, reviewText string, category string"
    )


@given(corpus=corpus_strategy)
@settings(**_SETTINGS)
def test_chi2_nonnegative_and_bounded_topk(spark, corpus):
    out = chi_square_top_terms(_df(spark, corpus), stopwords=[], k=3).collect()
    per_cat: dict[str, int] = {}
    for r in out:
        assert r.chi2 >= 0.0
        per_cat[r.category] = per_cat.get(r.category, 0) + 1
        assert 1 <= r.rank <= 3
    assert all(n <= 3 for n in per_cat.values())


@given(corpus=corpus_strategy)
@settings(**_SETTINGS)
@pytest.mark.slow  # 20s+ property sweep; full tier
def test_duplication_invariance(spark, corpus):
    """Doubling every document doubles each contingency cell and N;
    χ² = N(AD-BC)²/((A+B)(A+C)(B+D)(C+D)) is degree-5/degree-4 in the
    counts, so every χ² scales by exactly 2 — and the ranking (with
    the (chi2 DESC, term ASC) total order) is invariant."""
    base = chi_square_top_terms(_df(spark, corpus, 1), stopwords=[], k=75)
    dup = chi_square_top_terms(_df(spark, corpus, 2), stopwords=[], k=75)
    b = {(r.category, r.term): (r.rank, r.chi2) for r in base.collect()}
    d = {(r.category, r.term): (r.rank, r.chi2) for r in dup.collect()}
    assert set(b) == set(d)
    for key, (rank, chi2) in b.items():
        assert d[key][0] == rank
        assert d[key][1] == pytest.approx(2.0 * chi2, rel=1e-9)


def test_chi2_zero_under_independence(spark):
    # Perfectly balanced: every term appears in the same fraction of
    # docs in every category → all χ² exactly 0.
    corpus = [
        (["apple"], "X"), (["banana"], "X"),
        (["apple"], "Y"), (["banana"], "Y"),
    ]
    out = chi_square_top_terms(_df(spark, corpus), stopwords=[], k=75).collect()
    assert out and all(r.chi2 == 0.0 for r in out)


@given(corpus=corpus_strategy)
@settings(**_SETTINGS)
@pytest.mark.slow  # 20s+ property sweep; full tier
def test_merged_dict_is_union_of_report_terms(spark, corpus):
    top = chi_square_top_terms(_df(spark, corpus), stopwords=[], k=2)
    terms = sorted({r.term for r in top.collect()})
    line = merged_dict(top).collect()[0].line
    assert line.split(" ") == terms


@given(corpus=corpus_strategy)
@settings(**_SETTINGS)
def test_contingency_cells_sum_to_n(spark, corpus):
    from mapreduce_chisquare_spark.functions.text import (
        nonempty_documents,
        tokens_relation,
    )
    from mapreduce_chisquare_spark.operators.contingency import (
        cat_counts,
        term_cat_counts,
    )
    from pyspark.sql import Window

    docs = _df(spark, corpus).selectExpr(
        "doc_id", "reviewText AS text", "category"
    )
    docs = nonempty_documents(docs)
    n = docs.count()
    toks = tokens_relation(docs, [])
    cells = (
        term_cat_counts(toks)
        .withColumn("df_t", F.sum("df_tc").over(Window.partitionBy("term")))
        .join(F.broadcast(cat_counts(docs)), "category")
    )
    for r in cells.collect():
        a = r.df_tc
        b = r.df_t - a
        c = r.df_c - a
        d = n - a - b - c
        assert a >= 0 and b >= 0 and c >= 0 and d >= 0
        assert a + b + c + d == n


# =========================================================================
# Curation / warehouse operator invariants
# =========================================================================

kv_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),
        st.floats(min_value=0, max_value=100, allow_nan=False),
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda t: t[0],
)


@given(base=kv_rows, updates=kv_rows)
@settings(**_SETTINGS)
def test_scd2_invariants(spark, base, updates):
    from mapreduce_chisquare_spark.operators.warehouse import scd2_merge

    b = spark.createDataFrame(base, "k long, v double") if base else (
        spark.createDataFrame([], "k long, v double")
    )
    u = spark.createDataFrame(updates, "k long, v double") if updates else (
        spark.createDataFrame([], "k long, v double")
    )
    out = scd2_merge(b, u, "k", "v").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    bd, ud = dict(base), dict(updates)
    # every key from either side appears; exactly one current row each
    assert set(by_key) == set(bd) | set(ud)
    for k, rows in by_key.items():
        cur = [r for r in rows if r.is_current]
        assert len(cur) == 1
        # the current value is the update when one exists, else base
        want = ud.get(k, bd.get(k))
        assert cur[0].v == want
        # two rows iff a genuine change happened
        changed = k in bd and k in ud and bd[k] != ud[k]
        assert len(rows) == (2 if changed else 1)
        assert cur[0].version == (2 if changed else 1)


ts_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),          # user
        st.integers(min_value=0, max_value=10_000),      # offset sec
        st.floats(min_value=-5, max_value=5, allow_nan=False),
    ),
    min_size=1,
    max_size=20,
)


@given(rows=ts_rows)
@settings(**_SETTINGS)
def test_resample_invariants(spark, rows):
    from mapreduce_chisquare_spark.operators.timeseries import resample_ffill

    base = 1_704_067_200  # 2024-01-01 UTC
    ev = spark.createDataFrame(
        [
            (i, u, (base + off) * 1_000_000, v)
            for i, (u, off, v) in enumerate(rows)
        ],
        "event_id long, user_id long, us long, value double",
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(us) AS ts", "value"
    )
    out = resample_ffill(ev, max_user=None).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    from collections import Counter

    want_counts = Counter(u for u, _, _ in rows)
    for u, rs in per_user.items():
        hours = sorted(r.hour_start for r in rs)
        # spine is contiguous with no holes and aligned to the hour
        assert all(h % 3600 == 0 for h in hours)
        assert hours == list(range(hours[0], hours[-1] + 3600, 3600))
        # event counts conserve
        assert sum(r.n_events for r in rs) == want_counts[u]
        # ffill: null never after a non-null hour
        seen = False
        for r in sorted(rs, key=lambda r: r.hour_start):
            if r.value_ffill is not None:
                seen = True
            else:
                assert not seen
    assert set(per_user) == set(want_counts)


@given(
    a=st.integers(min_value=0, max_value=65_535),
    b=st.integers(min_value=0, max_value=65_535),
    da=st.integers(min_value=1, max_value=100),
)
@settings(max_examples=30, deadline=None)
def test_zorder_monotone_per_dimension(a, b, da):
    # Fixing one dimension, the Morton key is strictly monotone in the
    # other — the property zone-map pruning relies on.
    def z(x, y, bits=16):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    if a + da <= 65_535:
        assert z(a + da, b) > z(a, b)
    if b + da <= 65_535:
        assert z(a, b + da) > z(a, b)


def test_zorder_python_matches_sql_expr(spark):
    # The generated SQL expression must equal the reference Python
    # interleave for a deterministic sample.
    from mapreduce_chisquare_spark.operators.layout import zorder_col

    def z(x, y, bits=16):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    rows = [(i * 37 % 65_536, i * 101 % 65_536) for i in range(200)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_col("a", "b").alias("z")).collect()
    }
    assert got == {(a, b): z(a, b) for a, b in rows}


# ---- as-of join vs a brute-force reference ------------------------

_asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)),  # (key, ts)
    min_size=1,
    max_size=12,
)
_asof_right = st.lists(
    st.tuples(
        st.integers(0, 3), st.integers(0, 20), st.integers(0, 9)
    ),  # (key, ts, payload)
    min_size=0,
    max_size=12,
)


@given(left=_asof_left, right=_asof_right)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    """For every left row, asof_join must return the payload of the
    latest right row with right.ts <= left.ts on the same key; with
    dedupe_right_ties, ties on (key, ts) resolve to the max payload
    struct. Checked against an exhaustive python reference, including
    duplicate keys/timestamps on both sides."""
    from mapreduce_chisquare_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts long",
    )
    rdf = spark.createDataFrame(
        [(k, t, p) for (k, t, p) in right], "k long, ts long, p long"
    )
    got = {
        r.lid: r.asof_p
        for r in asof_join(
            ldf, rdf, "k", "ts", "p", dedupe_right_ties=True
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, p) for (rk, rt, p) in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None  # latest ts, max payload
        assert got[i] == want, (i, k, t, cands)


_src_counts = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=1, max_value=40),
    ),
    min_size=1,
    max_size=5,
    unique_by=lambda t: t[0],
)


@given(counts=_src_counts, budget=st.integers(min_value=1, max_value=60))
@settings(**_SETTINGS)
@pytest.mark.slow  # 20s+ property sweep; full tier
def test_source_temperature_invariants(spark, counts, budget):
    """For any source-size profile: every source is represented, no
    source yields more docs than it has, positions are dense 1..n per
    source, the total never exceeds budget + n_sources (the min-1
    lift is the only overshoot), and the selection is deterministic."""
    from mapreduce_chisquare_spark.operators.curation import (
        source_temperature,
    )

    rows = []
    nid = 0
    for src, n in counts:
        for _ in range(n):
            rows.append((nid, src))
            nid += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_temperature(docs, budget=budget).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.pos)
    sizes = dict(counts)
    assert set(by_src) == set(sizes)
    for src, poses in by_src.items():
        assert len(poses) <= sizes[src]
        assert sorted(poses) == list(range(1, len(poses) + 1))
    assert len(out) <= budget + len(sizes)
    again = source_temperature(docs, budget=budget).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@given(left=_asof_left, right=_asof_right)
@settings(**_SETTINGS)
def test_asof_nearest_matches_bruteforce(spark, left, right):
    """asof_nearest must return, per left row, the right row with the
    minimal |right.ts - left.ts| on the key; equidistant candidates
    resolve to the earlier right row, and duplicate (key, ts) right
    rows to the max payload — checked against an exhaustive python
    reference."""
    from mapreduce_chisquare_spark.operators.asof import asof_nearest

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts long",
    )
    rdf = spark.createDataFrame(
        [(k, t, p) for (k, t, p) in right], "k long, ts long, p long"
    )
    got = {
        r.lid: (r.nearest_ts, r.nearest_p)
        for r in asof_nearest(ldf, rdf, "k", "ts", "p").collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, p) for (rk, rt, p) in right if rk == k]
        if not cands:
            assert got[i] == (None, None), (i, k, t)
            continue
        best_d = min(abs(rt - t) for rt, _ in cands)
        at_best = [(rt, p) for rt, p in cands if abs(rt - t) == best_d]
        want_ts = min(rt for rt, _ in at_best)  # equidistant -> earlier
        want_p = max(p for rt, p in at_best if rt == want_ts)  # tie -> max
        assert got[i] == (want_ts, want_p), (i, k, t, at_best)


@given(base=kv_rows, updates=kv_rows)
@settings(**_SETTINGS)
def test_snapshot_diff_matches_bruteforce(spark, base, updates):
    from mapreduce_chisquare_spark.operators.warehouse import snapshot_diff

    o = spark.createDataFrame(base, "k long, v double") if base else (
        spark.createDataFrame([], "k long, v double")
    )
    n = spark.createDataFrame(updates, "k long, v double") if updates else (
        spark.createDataFrame([], "k long, v double")
    )
    got = {
        r.row_key: r.change
        for r in snapshot_diff(o, n, "k", ["v"]).collect()
    }
    ob, nb = dict(base), dict(updates)
    want = {}
    for k in ob.keys() | nb.keys():
        if k not in ob:
            want[k] = "added"
        elif k not in nb:
            want[k] = "removed"
        elif ob[k] != nb[k]:
            want[k] = "changed"
    assert got == want


@given(corpus=corpus_strategy)
@settings(**_SETTINGS)
def test_lm_unigram_score_duplication_invariant(spark, corpus):
    """Duplicating every document k x leaves each document's unigram
    LM score unchanged: counts and the corpus total both scale by k,
    and ln(kc/kT) = ln(c/T). Guards the normalization against either
    side forgetting the total."""
    from mapreduce_chisquare_spark.operators.textstats import (
        lm_unigram_score,
    )

    rows = [
        (i, " ".join(words)) for i, (words, _cat) in enumerate(corpus)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dup_rows = [
        (rep * 10_000 + i, t) for rep in range(3) for (i, t) in rows
    ]
    dup = spark.createDataFrame(dup_rows, "doc_id long, text string")
    base = {r.doc_id: r.avg_logprob for r in lm_unigram_score(docs).collect()}
    tripled = {
        r.doc_id: r.avg_logprob for r in lm_unigram_score(dup).collect()
    }
    for i, score in base.items():
        assert abs(tripled[i] - score) < 1e-9, i


@given(left=_asof_left, right=_asof_right)
@settings(**_SETTINGS)
def test_asof_nearest_matches_pandas_merge_asof(spark, left, right):
    """asof_nearest's semantics CLAIM is pandas merge_asof
    direction='nearest' — check it against pandas itself, not just the
    python reference. Right sides are deduped to unique (key, ts)
    first (pandas resolves duplicate-ts rows by frame order, which no
    engine-side sort can reproduce; our max-payload tie rule for that
    case is covered by the bruteforce test above)."""
    import pandas as pd

    from mapreduce_chisquare_spark.operators.asof import asof_nearest

    uniq = {}
    for k, t, p in right:
        uniq[(k, t)] = max(uniq.get((k, t), -1), p)
    r_rows = [(k, t, p) for (k, t), p in uniq.items()]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts long",
    )
    rdf = (
        spark.createDataFrame(r_rows, "k long, ts long, p long")
        if r_rows
        else spark.createDataFrame([], "k long, ts long, p long")
    )
    got = {
        r.lid: (r.nearest_ts, r.nearest_p)
        for r in asof_nearest(ldf, rdf, "k", "ts", "p").collect()
    }
    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        columns=["lid", "k", "ts"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(r_rows, columns=["k", "ts", "p"]).sort_values(
        "ts", kind="stable"
    )
    if rp.empty:
        for i in got:
            assert got[i] == (None, None)
        return
    m = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="nearest", suffixes=("", "_r")
    )
    # recover the matched right ts: |p -> (k, ts)| is not invertible,
    # so rebuild from the reference rule pandas implements
    for row in m.itertuples():
        want_p = None if pd.isna(row.p) else int(row.p)
        g, gp = got[row.lid]
        assert gp == want_p, (row.lid, got[row.lid], want_p)
        if want_p is not None:
            # the matched ts must be a right ts for this key holding p
            assert (row.k, g) in uniq and uniq[(row.k, g)] == want_p


_span_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@given(corpus=_span_corpus)
@settings(**_SETTINGS)
@pytest.mark.slow  # 10s+ reference/brute-force sweep; full tier
def test_repeated_spans_match_bruteforce(spark, corpus):
    """repeated_spans must equal the exhaustive reference: mark every
    n-gram window whose gram occurs in a DIFFERENT document (intra-doc
    repeats alone do not count), then merge overlapping/touching
    windows per doc."""
    from mapreduce_chisquare_spark.operators.dedup import (
        cross_doc_repetition,
        repeated_spans,
    )

    n = 3
    docs_rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")

    # python reference
    grams = {}
    windows = {}
    for i, toks in enumerate(corpus):
        windows[i] = []
        for s in range(max(len(toks) - n + 1, 0)):
            g = " ".join(toks[s : s + n])
            windows[i].append((s, s + n, g))
            grams.setdefault(g, set()).add(i)
    cross = {g for g, ds in grams.items() if len(ds) >= 2}
    want_spans = set()
    want_dup = {}
    for i in windows:
        hits = sorted(
            (s, e) for s, e, g in windows[i] if g in cross
        )
        want_dup[i] = len(hits)
        cur = None
        for s, e in hits:
            if cur is None or s > cur[1]:
                if cur:
                    want_spans.add((i, cur[0], cur[1]))
                cur = [s, e]
            else:
                cur[1] = max(cur[1], e)
        if cur:
            want_spans.add((i, cur[0], cur[1]))

    got_spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(docs, n=n).collect()
    }
    assert got_spans == want_spans
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams)
        for r in cross_doc_repetition(docs, n=n).collect()
    }
    for i, toks in enumerate(corpus):
        assert got[i] == (len(windows[i]), want_dup[i]), (i, toks)


@given(corpus=_span_corpus)
@settings(**_SETTINGS)
@pytest.mark.slow  # 10s+ reference/brute-force sweep; full tier
def test_cut_spans_matches_bruteforce(spark, corpus):
    """cut_spans(docs, repeated_spans(docs)) must equal the python
    reference: remove every token covered by a cross-doc repeated
    window, rejoin survivors in order with single spaces."""
    from mapreduce_chisquare_spark.operators.dedup import (
        cut_spans,
        repeated_spans,
    )

    n = 3
    docs_rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")

    grams = {}
    for i, toks in enumerate(corpus):
        for s in range(max(len(toks) - n + 1, 0)):
            grams.setdefault(" ".join(toks[s : s + n]), set()).add(i)
    cross = {g for g, ds in grams.items() if len(ds) >= 2}
    want = {}
    for i, toks in enumerate(corpus):
        covered = set()
        for s in range(max(len(toks) - n + 1, 0)):
            if " ".join(toks[s : s + n]) in cross:
                covered.update(range(s, s + n))
        keep = [t for p, t in enumerate(toks) if p not in covered]
        want[i] = (" ".join(keep), len(keep), len(toks) - len(keep))

    got = {
        r.doc_id: (r.clean_text, r.n_tokens_kept, r.n_tokens_cut)
        for r in cut_spans(docs, repeated_spans(docs, n=n)).collect()
    }
    assert got == want


_budget_docs = st.lists(
    st.tuples(
        st.integers(0, 4),            # tokens in doc (0 = empty)
        st.sampled_from([0, 10, 30, 50]),  # n_chars bucket
    ),
    min_size=0,
    max_size=14,
)


@given(rows=_budget_docs, budget=st.integers(1, 30))
@settings(**_SETTINGS)
def test_select_token_budget_matches_global_window(spark, rows, budget):
    """The two-level bucket-cumsum implementation must select exactly
    the docs the naive global running-sum rule selects (before-total
    < budget over (n_chars DESC, doc_id ASC), zero-token docs out)."""
    from mapreduce_chisquare_spark.operators.curation import (
        select_token_budget,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * nt), nc)
            for i, (nt, nc) in enumerate(rows)
        ],
        "doc_id long, text string, n_chars long",
    )
    got = {r.doc_id for r in select_token_budget(docs, budget).collect()}
    ordered = sorted(
        [(i, nt, nc) for i, (nt, nc) in enumerate(rows) if nt > 0],
        key=lambda x: (-x[2], x[0]),
    )
    want, run = set(), 0
    for i, nt, _ in ordered:
        if run < budget:
            want.add(i)
        run += nt
    assert got == want, (rows, budget, got, want)


# ---------------------------------------------------------------------------
# Winnowing fingerprints vs a literal python reference (round 6)
# ---------------------------------------------------------------------------

def _py_winnow(
    text: str, gram: int = 5, window: int = 4, hash_fn: str = "poly"
) -> set:
    """Literal transcription of the operator's contract: per-gram
    hash (default: the mixed polynomial over codepoints; 'md5': the
    32-bit md5-prefix ladder), sliding-window minima, distinct."""
    import hashlib

    from mapreduce_chisquare_spark.operators.textstats import (
        WINNOW_BASE,
        WINNOW_MIX,
        WINNOW_MOD,
    )

    t = text.lower()

    if hash_fn == "md5":

        def h32(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        if len(t) < gram:
            return {h32(t)}
        hashes = [
            h32(t[i : i + gram]) for i in range(len(t) - gram + 1)
        ]
    else:
        codes = [ord(ch) for ch in t] or [0]

        def fold(cs) -> int:
            acc = 0
            for c in cs:
                acc = (acc * WINNOW_BASE + c) % WINNOW_MOD
            return acc * WINNOW_MIX % WINNOW_MOD

        if len(t) < gram:
            return {fold(codes)}
        hashes = [
            fold(codes[i : i + gram])
            for i in range(len(codes) - gram + 1)
        ]
    wins = max(len(hashes) - window + 1, 1)
    return {min(hashes[j : j + window]) for j in range(wins)}


@given(
    texts=st.lists(
        st.text(
            alphabet="ab cd", min_size=0, max_size=60
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_winnowing_matches_python_reference(spark, texts):
    from mapreduce_chisquare_spark.operators.textstats import (
        winnowing_fingerprint,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    for variant in ("poly", "md5"):
        got: dict[int, set] = {i: set() for i in range(len(texts))}
        for r in winnowing_fingerprint(docs, hash_fn=variant).collect():
            got[r.doc_id].add(r.fp)
        for i, t in enumerate(texts):
            assert got[i] == _py_winnow(t, hash_fn=variant), (
                variant,
                i,
                t,
            )


# ---------------------------------------------------------------------------
# Round-6 scorers vs literal python references
# ---------------------------------------------------------------------------

word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsil", "zeta"]
)
textdoc = st.lists(word, min_size=0, max_size=10).map(" ".join)
textcorpus = st.lists(textdoc, min_size=1, max_size=6)


@given(texts=textcorpus)
@settings(**_SETTINGS)
def test_bm25_matches_python_reference(spark, texts):
    import math

    from mapreduce_chisquare_spark.operators.textstats import bm25

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.term): r for r in bm25(docs).collect()}

    toks = {i: t.split() for i, t in enumerate(texts)}
    nonempty = {i: w for i, w in toks.items() if w}
    n = len(nonempty)
    if n == 0:
        assert not got
        return
    avgdl = sum(len(w) for w in nonempty.values()) / n
    df: dict[str, int] = {}
    for w in nonempty.values():
        for t in set(w):
            df[t] = df.get(t, 0) + 1
    want = {}
    for i, w in nonempty.items():
        for t in set(w):
            tf, d, dl = w.count(t), df[t], len(w)
            idf = math.log(1 + (n - d + 0.5) / (d + 0.5))
            want[(i, t)] = idf * tf * 2.2 / (
                tf + 1.2 * (0.25 + 0.75 * dl / avgdl)
            )
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k].bm25 - v) < 1e-9, (k, got[k].bm25, v)


@given(texts=textcorpus)
@settings(**_SETTINGS)
def test_lm_bigram_matches_python_reference(spark, texts):
    import math

    from mapreduce_chisquare_spark.operators.textstats import (
        lm_bigram_score,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in lm_bigram_score(docs).collect()}

    bigrams = {
        i: list(zip(t.split(), t.split()[1:]))
        for i, t in enumerate(texts)
    }
    c12: dict = {}
    c1: dict = {}
    for bs in bigrams.values():
        for b in bs:
            c12[b] = c12.get(b, 0) + 1
            c1[b[0]] = c1.get(b[0], 0) + 1
    v = len(c1)
    expected_docs = {i for i, bs in bigrams.items() if bs}
    assert set(got) == expected_docs
    for i in expected_docs:
        bs = bigrams[i]
        s = sum(math.log((c12[b] + 1) / (c1[b[0]] + v)) for b in bs)
        assert got[i].n_bigrams == len(bs)
        assert abs(got[i].avg_logprob - s / len(bs)) < 1e-9


@given(texts=st.lists(textdoc, min_size=2, max_size=5))
@settings(**_SETTINGS)
@pytest.mark.slow  # 10s+ reference/brute-force sweep; full tier
def test_jaccard_estimate_matches_python_reference(spark, texts):
    """The signature-agreement estimate is deterministic integer math
    — the Spark value must EQUAL the python replication, not just
    approximate it."""
    import hashlib

    from mapreduce_chisquare_spark.operators.dedup import (
        NUM_HASHES,
        _MOD,
        hash_params,
        minhash_jaccard_estimate,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    pairs = [(a, b) for a in range(len(texts)) for b in range(len(texts)) if a < b]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")

    def shingle_set(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    def sig(t):
        ss = shingle_set(t)
        if not ss:
            return None
        bases = [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
            for s in ss
        ]
        return [
            min((a * b + bb) % _MOD for b in bases)
            for a, bb in hash_params(NUM_HASHES)
        ]
    sigs = {i: sig(t) for i, t in enumerate(texts)}
    got = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_jaccard_estimate(docs, pdf).collect()
    }
    for a, b in pairs:
        sa, sb = sigs[a], sigs[b]
        if sa is None or sb is None:
            assert (a, b) not in got  # inner join drops sig-less docs
            continue
        want = sum(x == y for x, y in zip(sa, sb)) / NUM_HASHES
        assert got[(a, b)] == want, ((a, b), got[(a, b)], want)


# ---------------------------------------------------------------------------
# SAX words vs a literal python reference (round 7)
# ---------------------------------------------------------------------------

def _py_sax(series: dict[int, list[float]], segments=8, breaks=None):
    """Literal transcription of ts_sax's contract: positions in
    series order, seg = pos*segments//n, exact-cent segment sums,
    symbol = # breakpoints with sum >= b*n (cross-multiplied), word =
    digits in seg order; users with < segments points excluded.
    Cent rounding is HALF-UP like both engines (Spark F.round /
    DuckDB round) — python's round() is half-to-even and diverges on
    exact half-cents like 0.125*100 = 12.5."""
    import math

    from mapreduce_chisquare_spark.operators.timeseries import (
        SAX_BREAKS_CENTS,
    )

    breaks = breaks or SAX_BREAKS_CENTS
    words = {}
    for uid, vals in series.items():
        n = len(vals)
        if n < segments:
            continue
        segs: dict[int, list[int]] = {}
        for pos, v in enumerate(vals):
            segs.setdefault(pos * segments // n, []).append(
                int(math.floor(v * 100 + 0.5))  # values are >= 0
            )
        word = ""
        for s in sorted(segs):
            sc, np = sum(segs[s]), len(segs[s])
            word += str(sum(1 for b in breaks if sc >= b * np))
        words[uid] = word
    return words


series_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=5),
    st.lists(
        st.floats(
            min_value=0.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=24,
    ),
    min_size=1,
    max_size=4,
)


@given(series=series_strategy)
@settings(**_SETTINGS)
def test_ts_sax_matches_python_reference(spark, series):
    """The distributed SAX word equals a literal python transcription
    for every generated series, including exact-breakpoint means and
    lengths straddling the n >= segments cut."""
    import datetime as dt

    from mapreduce_chisquare_spark.operators.timeseries import ts_sax

    rows = [
        (uid * 1000 + i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), uid, "view", v, "{}")
        for uid, vals in series.items()
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    got = {r.user_id: r.sax_word for r in ts_sax(ev).collect()}
    assert got == _py_sax(series)


# ---------------------------------------------------------------------------
# SemDeDup keep-rule vs a literal python reference (round 7)
# ---------------------------------------------------------------------------

def _py_semantic_dedup(vecs: dict[int, list[float]], cents, threshold):
    """Literal keep-rule: assign each vector to its argmax-cosine
    centroid (first maximal index), then drop any id with a
    same-cluster LOWER id at cosine >= threshold; dup_of = the
    smallest such id."""
    import math

    def cos(a, b):
        num = aa = bb = 0.0
        for x, y in zip(a, b):  # left-to-right, the engines' order
            num += x * y
            aa += x * x
            bb += y * y
        return num / (math.sqrt(aa) * math.sqrt(bb))

    asg = {}
    for vid, v in vecs.items():
        scores = [cos(v, c) for c in cents]
        asg[vid] = scores.index(max(scores))
    out = {}
    for vid in vecs:
        mates = [
            a
            for a in vecs
            if a < vid
            and asg[a] == asg[vid]
            and cos(vecs[a], vecs[vid]) >= threshold
        ]
        out[vid] = (not mates, min(mates) if mates else None)
    return out


vec_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, width=32),
        min_size=4,
        max_size=4,
    ).filter(lambda v: sum(x * x for x in v) > 1e-6),
    min_size=1,
    max_size=6,
)


@given(vecs=vec_strategy)
@settings(**_SETTINGS)
@pytest.mark.slow  # 10s+ reference/brute-force sweep; full tier
def test_semantic_dedup_matches_python_reference(spark, vecs):
    """The distributed SemDeDup verdicts equal a literal python
    transcription of the keep-rule for every generated corpus (fixed
    explicit centroids so the property pins the rule, not the
    fit)."""
    from mapreduce_chisquare_spark.operators import simsearch as ss

    cents = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 1.0],
    ]
    emb = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.is_kept, r.dup_of)
        for r in ss.semantic_dedup(
            emb, threshold=0.8, cents=cents
        ).collect()
    }
    assert got == _py_semantic_dedup(
        {k: [float(x) for x in v] for k, v in vecs.items()},
        cents,
        0.8,
    )


# ---------------------------------------------------------------------------
# Round 11: codec round-trip properties (no Spark needed — these pin
# the pure-Python decoders under hypothesis-generated inputs, far
# beyond the fixture lattices the oracle gates execute)


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 18),
    ctype=st.sampled_from([0, 2, 4, 6]),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(w, h, ctype, seed, data):
    """encode_png ∘ decode_png_pixels is the identity on the
    grayscale view for EVERY pixel grid, color type, and per-row
    filter assignment — including hypothesis-chosen filters that
    change row to row."""
    import random

    from mapreduce_chisquare_spark.operators import multimodal as mm

    rng = random.Random(seed)
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    rows = [
        [
            rng.randrange(256)
            if ch == 1
            else tuple(rng.randrange(256) for _ in range(ch))
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    blob = mm.encode_png(rows, ctype, row_filter=lambda y: filters[y])
    dw, dh, gray = mm.decode_png_pixels(blob)
    assert (dw, dh) == (w, h)
    for r in range(h):
        for c in range(w):
            px = rows[r][c]
            want = (
                px
                if ch == 1
                else px[0]
                if ch == 2
                else mm._luma(px[0], px[1], px[2])
            )
            assert gray[r][c] == want


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 18),
    pal_bits=st.integers(1, 8),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_property(w, h, pal_bits, interlace, seed):
    """encode_gif ∘ decode_gif_pixels is the identity on palette luma
    for every grid size, palette size, and interlace flag — the LZW
    coder round-trips arbitrary index streams."""
    import random

    from mapreduce_chisquare_spark.operators import multimodal as mm

    rng = random.Random(seed)
    npal = 1 << pal_bits
    pal = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(npal)
    ]
    rows = [[rng.randrange(npal) for _ in range(w)] for _ in range(h)]
    blob = mm.encode_gif(rows, pal, interlace=interlace)
    dw, dh, gray = mm.decode_gif_pixels(blob)
    assert (dw, dh) == (w, h)
    for r in range(h):
        for c in range(w):
            assert gray[r][c] == mm._luma(*pal[rows[r][c]])


@given(
    w=st.integers(8, 32),
    h=st.integers(8, 24),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_unit_quant_error_bound_property(w, h, seed):
    """Baseline JPEG through the unit quantization table reconstructs
    ANY grayscale image within 2 gray levels per pixel (DCT rounding
    only) — the lossy-codec analog of a round-trip identity."""
    import random

    from mapreduce_chisquare_spark.operators import multimodal as mm

    rng = random.Random(seed)
    rows = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    blob = mm.encode_jpeg_gray(rows, qtbl=[1] * 64)
    dw, dh, gray = mm.decode_jpeg_pixels(blob)
    assert (dw, dh) == (w, h)
    assert all(
        abs(gray[r][c] - rows[r][c]) <= 2
        for r in range(h)
        for c in range(w)
    )


@given(
    n_frames=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=20, deadline=None)
def test_wav_pcm_roundtrip_property(n_frames, seed):
    """WAV PCM encode/decode is the identity on arbitrary int16
    sample streams (not just the fixture formula)."""
    import random
    import struct

    from mapreduce_chisquare_spark.operators import multimodal as mm

    rng = random.Random(seed)
    samples = [
        rng.randrange(-32768, 32768)
        for _ in range(n_frames * mm.AUDIO_FRAME)
    ]
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = (
        b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    )
    sr, ch, got = mm.decode_wav_samples(blob)
    assert (sr, ch) == (8000, 1) and got == samples


# ---------------------------------------------------------------------
# cdc_apply ≡ sequential change replay (round 11)
# ---------------------------------------------------------------------

_cdc_keys = st.integers(min_value=0, max_value=6)
_cdc_base = st.dictionaries(_cdc_keys, st.integers(0, 99), max_size=5)
_cdc_changes = st.lists(
    st.tuples(
        _cdc_keys,
        st.one_of(st.none(), st.integers(0, 99)),  # NULL upserts too
        st.sampled_from(["I", "U", "D"]),
    ),
    max_size=12,
)


@given(base=_cdc_base, changes=_cdc_changes)
@settings(**_SETTINGS)
def test_cdc_apply_equals_sequential_replay(spark, base, changes):
    """cdc_apply's latest-wins compaction must equal literally
    replaying the change stream in seq order onto a dict — for ANY
    interleaving of inserts, updates, and deletes, including deletes
    of absent keys, re-inserts after delete, and NULL-valued upserts
    (the carried NULL overwrites the prior value)."""
    from mapreduce_chisquare_spark.operators.warehouse import cdc_apply

    state = dict(base)
    for k, v, op in changes:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)],
        "k long, v long",
    ).filter(F.col("k").isNotNull())
    ch_df = spark.createDataFrame(
        [
            (k, None if op == "D" else v, op, i)
            for i, (k, v, op) in enumerate(changes)
        ]
        or [(None, None, None, None)],
        "k long, v long, op string, seq long",
    ).filter(F.col("k").isNotNull())
    got = {r.k: r.v for r in cdc_apply(base_df, ch_df).collect()}
    assert got == state


# ---------------------------------------------------------------------
# quantile_bucketize ≡ rank-arithmetic model (round 12)
# ---------------------------------------------------------------------

_qb_vals = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
)
_qb_b = st.integers(min_value=1, max_value=6)


@given(vals=_qb_vals, b=_qb_b)
@settings(**_SETTINGS)
def test_quantile_bucketize_equals_rank_model(spark, vals, b):
    """For ANY multiset (ties, negatives, singleton domains) and any
    bucket count, the operator must equal the literal rank model:
    bucket(v) = min(b-1, |{x < v}| * b // n), per-bucket counts and
    min/max from the multiset — and the buckets must partition the
    input exactly."""
    from mapreduce_chisquare_spark.operators.warehouse import (
        quantile_bucketize,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.bucket: (r.n_rows, r.lo, r.hi)
        for r in quantile_bucketize(df, "v", b=b).collect()
    }
    n = len(vals)
    model: dict = {}
    for v in vals:
        bkt = min(b - 1, sum(1 for x in vals if x < v) * b // n)
        cnt, lo, hi = model.get(bkt, (0, v, v))
        model[bkt] = (cnt + 1, min(lo, v), max(hi, v))
    assert got == model
    assert sum(c for c, _, _ in got.values()) == n


# ---------------------------------------------------------------------
# Round-13 properties: canonicalizer idempotence, Bloom soundness
# ---------------------------------------------------------------------

_URL_SEG = st.text(
    alphabet="abcXYZ019-._~%", min_size=1, max_size=8
)
_url_strategy = st.builds(
    lambda scheme, host, www, port, segs, params, frag: (
        scheme
        + "://"
        + ("WWW." if www else "")
        + host
        + ".example.com"
        + port
        + "".join("/" + s for s in segs)
        + ("?" + "&".join(params) if params else "")
        + ("#" + frag if frag else "")
    ),
    scheme=st.sampled_from(["http", "https", "HTTPS", "Http"]),
    host=_URL_SEG,
    www=st.booleans(),
    port=st.sampled_from(["", ":443", ":80", ":8080"]),
    segs=st.lists(_URL_SEG, max_size=3),
    params=st.lists(
        st.sampled_from(
            ["a=1", "b=2", "utm_source=x", "q=wh?t", "u=http://e.com/p",
             "gclid=z", "z="]
        ),
        max_size=4,
        unique=True,
    ),
    frag=st.sampled_from(["", "sec", "x?y"]),
)


@given(urls=st.lists(_url_strategy, min_size=1, max_size=12))
@settings(**_SETTINGS)
@pytest.mark.slow  # 20s+ property sweep; full tier
def test_canonicalize_url_idempotent(spark, urls):
    """canon(canon(u)) == canon(u): the canonical form is a fixed
    point — every normalization rule (case, www., default port,
    fragment, tracking params, query sort, trailing slash) has
    nothing left to do on its own output."""
    from mapreduce_chisquare_spark.operators.curation import (
        canonicalize_url,
    )

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    # two passes with a materialization between them: textually
    # nesting canonicalize_url(canonicalize_url(...)) substitutes the
    # large inner tree into every reference of the outer one and the
    # squared expression kills analysis — and a real pipeline
    # re-canonicalizes stored strings anyway
    c1 = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id", canonicalize_url("url").alias("c")
        ).collect()
    }
    df2 = spark.createDataFrame(
        [(i, c) for i, c in c1.items()], "doc_id long, url string"
    )
    c2 = {
        r.doc_id: r.c
        for r in df2.select(
            "doc_id", canonicalize_url("url").alias("c")
        ).collect()
    }
    for i, u in enumerate(urls):
        assert c1[i] is not None  # every generated URL has '://'
        assert c1[i] == c2[i], (u, c1[i], c2[i])


@given(
    stored=st.lists(st.text(min_size=1, max_size=12), min_size=1,
                    max_size=25, unique=True),
    probes=st.lists(st.text(min_size=1, max_size=12), min_size=1,
                    max_size=15, unique=True),
)
@settings(**_SETTINGS)
@pytest.mark.slow  # 10s+ reference/brute-force sweep; full tier
def test_bloom_screen_never_false_negative(spark, stored, probes):
    """Soundness law: every probe whose key IS stored must be
    flagged, whatever the corpus — false positives are allowed,
    false negatives never."""
    from mapreduce_chisquare_spark.operators.sketches import (
        bloom_screen,
    )

    c = spark.createDataFrame([(s,) for s in stored], "key string")
    q = spark.createDataFrame(
        [(i, p) for i, p in enumerate(stored + probes)],
        "doc_id long, key string",
    )
    got = {
        r.doc_id: r.maybe_dup
        for r in bloom_screen(c, q, k=3, m=128).collect()
    }
    for i in range(len(stored)):
        assert got[i], stored[i]
