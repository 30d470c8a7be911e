"""Text scalar functions (SURVEY.md §2.2-2.3: F1-F4, X1-X3).

All pure Catalyst column expressions — no Python UDFs — so every step
stays inside whole-stage codegen and filters/projections push down to
the parquet/JSON scan.

Canonical order (quirk Q1, SURVEY.md §2.10): lowercase → tokenize →
drop empties → stopword filter → length filter → per-doc distinct.
This is the run_chi:66-68 / multi_jobs_hdfs.py:74-78 semantics (true
document frequency), not the single-job variant's dedup-before-casefold
bug (chi_square.py:37-38).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import DELIM_REGEX, MAX_TOKEN_LEN, MIN_TOKEN_LEN


def nonempty_documents(df: DataFrame, text_col: str = "text", cat_col: str = "category") -> DataFrame:
    """F4: skip records with null/empty text or category
    (multi_jobs_hdfs.py:70-71, run_chi:64-65)."""
    return df.filter(
        F.col(text_col).isNotNull()
        & (F.col(text_col) != "")
        & F.col(cat_col).isNotNull()
        & (F.col(cat_col) != "")
    )


def tokenize_expr(text: Column, stopwords: Sequence[str]) -> Column:
    """X1+X2+F2+F3+X3 fused into one array expression.

    split(lower(text)) → remove '' → remove stopwords → length bounds →
    distinct. `array_except` both removes the stopword set (F2,
    chi_square.py:37's set-minus) and dedups (X3) in one pass; the
    reference's 1 < len < 50 bound is run_chi:67 (quirks Q2/Q3).
    """
    toks = F.split(F.lower(text), DELIM_REGEX)
    toks = F.array_except(toks, F.array(*[F.lit(s) for s in stopwords]))
    return F.filter(
        toks,
        lambda t: (F.length(t) >= MIN_TOKEN_LEN) & (F.length(t) <= MAX_TOKEN_LEN),
    )


def terms_with_multiplicity(
    docs: DataFrame,
    stopwords: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    cat_col: str = "category",
) -> DataFrame:
    """X1+X2+F2+F3 WITHOUT the per-doc distinct (X3): the term stream
    with multiplicity, for tf-style scores (TF-IDF) where in-document
    counts matter. Same canonical filter order otherwise."""
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), DELIM_REGEX),
        lambda t: (F.length(t) >= MIN_TOKEN_LEN)
        & (F.length(t) <= MAX_TOKEN_LEN)
        & ~F.array_contains(stop_arr, t),
    )
    return nonempty_documents(docs, text_col, cat_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(cat_col).alias("category"),
        F.explode(toks).alias("term"),
    )


def tokens_relation(
    docs: DataFrame,
    stopwords: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    cat_col: str = "category",
) -> DataFrame:
    """Exploded tokens(doc_id, category, term) — the engine's canonical
    post-tokenization relation (SURVEY.md §1.2).

    Round-15 measurement note: a spread_for_kernel parallelism floor
    was TRIED here and reverted — tokenize+explode over the 5k-doc
    fixture costs ~0.2 s single-core, less than the added exchange +
    stage overhead, and spreading the map side multiplies the
    partial-aggregate rows every token consumer ships (32 partial
    vocabularies instead of 1). The floor stays only on paths whose
    per-row kernel cost dominates (media synth/decode, k-hash
    MinHash)."""
    return (
        nonempty_documents(docs, text_col, cat_col)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(cat_col).alias("category"),
            F.explode(tokenize_expr(F.col(text_col), stopwords)).alias("term"),
        )
    )
