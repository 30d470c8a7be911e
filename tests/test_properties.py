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
