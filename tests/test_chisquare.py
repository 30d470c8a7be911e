"""Flagship χ² correctness on the hand-verifiable micro-corpus
(FIXTURES.md fixture C) + semantics quirks Q1/Q3/Q6 (SURVEY.md §2.10).

Expected values computed by hand from the reference formula
N(AD-BC)^2 / ((A+B)(A+C)(B+D)(C+D)) (chi_square.py:68-78), which is
the uncorrected 2x2 Pearson chi-square.
"""

from __future__ import annotations

import pytest

from mapreduce_chisquare_spark.plans.chisquare import (
    chi_square_report,
    chi_square_top_terms,
)


def _reviews(spark, rows):
    return spark.createDataFrame(
        [(i, t, c) for i, (t, c) in enumerate(rows)],
        "doc_id long, reviewText string, category string",
    )


CORPUS = [
    ("apple banana", "X"),
    ("apple cherry", "X"),
    ("apple banana", "X"),
    ("banana cherry", "Y"),
    ("cherry dog", "Y"),
    ("banana dog", "Y"),
]

# (category, term) -> chi2, hand-computed (A,B,C,D in comments).
EXPECTED = {
    ("X", "apple"): 6.0,     # A=3 B=0 C=0 D=3 -> 6*9^2/81... = 6.0
    ("X", "banana"): 0.0,    # A=2 B=2 C=1 D=1 -> uniform -> 0
    ("Y", "banana"): 0.0,
    ("X", "cherry"): 2 / 3,  # A=1 B=2 C=2 D=1 -> 6*(1-4)^2/81
    ("Y", "cherry"): 2 / 3,
    ("Y", "dog"): 3.0,       # A=2 B=0 C=1 D=3
    # ("X","dog") absent: only OBSERVED (term, cat) pairs get rows,
    # matching the reference (term_cat_count holds observed keys only,
    # chi_square.py:62,67).
}


def test_chi2_golden_micro_corpus(spark):
    out = chi_square_top_terms(_reviews(spark, CORPUS), stopwords=["the"], k=75)
    got = {(r.category, r.term): r.chi2 for r in out.collect()}
    assert got == pytest.approx(EXPECTED)


def test_topk_rank_total_order(spark):
    out = chi_square_top_terms(_reviews(spark, CORPUS), stopwords=[], k=2)
    by_cat = {}
    for r in out.collect():
        by_cat.setdefault(r.category, []).append((r.rank, r.term, r.chi2))
    for cat, rows in by_cat.items():
        rows.sort()
        assert len(rows) == 2
        chi2s = [c for _, _, c in rows]
        assert chi2s == sorted(chi2s, reverse=True)
    # X: apple (6.0) then cherry (2/3); Y: dog (3.0) then cherry (2/3)
    assert [t for _, t, _ in sorted(by_cat["X"])] == ["apple", "cherry"]
    assert [t for _, t, _ in sorted(by_cat["Y"])] == ["dog", "cherry"]


def test_casefold_before_stopwords_quirk_q1(spark):
    # "The" must be removed by a lowercase stopword list (run_chi:66
    # semantics, NOT chi_square.py:37's remove-before-casefold bug),
    # and Dog/dog must count ONCE per doc (true document frequency).
    rows = [("The Dog dog barks", "X"), ("cat naps", "Y")]
    out = chi_square_top_terms(_reviews(spark, rows), stopwords=["the"], k=75)
    terms = {(r.category, r.term) for r in out.collect()}
    assert ("X", "the") not in terms
    assert ("X", "dog") in terms and ("X", "barks") in terms


def test_length_bounds_quirk_q3(spark):
    rows = [("a ab " + "x" * 50 + " " + "y" * 49, "X"), ("ab ok", "Y")]
    out = chi_square_top_terms(_reviews(spark, rows), stopwords=[], k=75)
    terms = {r.term for r in out.collect()}
    assert "a" not in terms          # len 1 dropped
    assert "x" * 50 not in terms     # len 50 dropped (run_chi:67)
    assert "y" * 49 in terms         # len 49 kept
    assert "ab" in terms


def test_empty_and_null_docs_skipped(spark):
    rows = [("apple", "X"), ("", "Y"), ("banana", ""), ("cherry", "Y")]
    df = spark.createDataFrame(
        [(i, t, c) for i, (t, c) in enumerate(rows)]
        + [(99, None, "Z"), (98, "dates", None)],
        "doc_id long, reviewText string, category string",
    )
    out = chi_square_top_terms(df, stopwords=[], k=75)
    cats = {r.category for r in out.collect()}
    assert cats == {"X", "Y"}


def test_report_shape(spark):
    rep = chi_square_report(_reviews(spark, CORPUS), stopwords=[], k=75).collect()
    lines = [r.line for r in rep]
    # one line per category (alphabetical) + merged dict line
    assert lines[0].startswith("X ") and lines[1].startswith("Y ")
    assert lines[-1] == "apple banana cherry dog"
    # X line leads with its top term apple:6.0000
    assert lines[0].split()[1] == "apple:6.0000"


def test_cat_and_total_counts_null_category_safe(spark):
    # A genuine NULL category must not be conflated with the rollup
    # grand-total row: the grouping() discriminator keeps it in df_c
    # and leaves exactly one n_docs row.
    from mapreduce_chisquare_spark.operators.contingency import (
        cat_and_total_counts,
    )

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")],
        "doc_id long, category string",
    )
    df_c, n_docs_df = cat_and_total_counts(docs)
    got = {r.category: r.df_c for r in df_c.collect()}
    assert got == {"a": 2, "b": 1, None: 1}
    rows = n_docs_df.collect()
    assert len(rows) == 1 and rows[0].n_docs == 4
