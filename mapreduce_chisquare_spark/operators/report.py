"""Report formatting + merged dictionary (SURVEY.md §2.3 X6, §2.4 A6,
§2.6 T2/T3/T5, §2.7 U1).

Reference output (chi_square.py:94-103, readme:63-66):
  one line per category, categories alphabetical:
      "<category> term1:chi2 ... term75:chi2"   (terms by chi2 desc)
  one final line: all selected terms, space-joined, alphabetical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_report(top_terms: DataFrame) -> DataFrame:
    """X6+T2+T5: (category, term, chi2, rank) → one line per category.

    chi2 is rendered with a fixed %.4f (quirk Q8: the reference prints
    raw Python float repr, chi_square.py:96, which is not portable
    across engines; a pinned printf format is byte-stable everywhere).
    """
    pairs = F.array_sort(F.collect_list(F.struct("rank", "term", "chi2")))
    return (
        top_terms.groupBy("category")
        .agg(
            F.array_join(
                F.transform(
                    pairs,
                    lambda s: F.format_string("%s:%.4f", s.term, s.chi2),
                ),
                " ",
            ).alias("terms")
        )
        .select(
            F.concat_ws(" ", F.col("category"), F.col("terms")).alias("line")
        )
        .orderBy("category")
    )


def merged_dict(top_terms: DataFrame) -> DataFrame:
    """A6+T3+U1: union of selected terms across categories, dedup'd,
    alphabetical, one space-joined row (chi_square.py:99-103)."""
    return top_terms.agg(
        F.array_join(F.array_sort(F.collect_set("term")), " ").alias("line")
    )


def full_report(top_terms: DataFrame) -> DataFrame:
    """Report lines + trailing merged-dict line — the reference's exact
    sink payload (S4)."""
    return format_report(top_terms).unionAll(merged_dict(top_terms))
