"""χ² arithmetic (SURVEY.md §2.3 X4/X5).

The 2×2 Pearson chi-square without continuity correction, exactly the
reference's formula (chi_square.py:68-78; identically
multi_jobs_hdfs.py:112-130, run_chi:135-140):

    A = df(term, cat)       docs in cat containing term
    B = df(term) - A        docs outside cat containing term
    C = df(cat) - A         docs in cat without term
    D = N - A - B - C       docs outside cat without term
    chi2 = N * (A*D - B*C)^2 / ((A+B)(A+C)(B+D)(C+D)),  0 if denom == 0

Every sum (A+B etc.) stays exact in int64; each factor is cast to
double BEFORE multiplying so the 4-way product cannot overflow int64 at
large N (N^4 > 2^63 already at N ≈ 55k docs — a real 100 TB hazard).
Counts < 2^53 are exactly representable, and the oracle SQL multiplies
in the same left-to-right order, so results are bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def chi2_expr(a: Column, b: Column, c: Column, d: Column, n: Column) -> Column:
    ad_bc = a.cast("double") * d.cast("double") - b.cast("double") * c.cast("double")
    num = n.cast("double") * ad_bc * ad_bc
    denom = (
        (a + b).cast("double")
        * (a + c).cast("double")
        * (b + d).cast("double")
        * (c + d).cast("double")
    )
    return F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(num / denom)


def _g2_term(o: Column, row: Column, col: Column, n: Column) -> Column:
    # ONE ln of the o·n/(row·col) ratio per cell — not
    # ln o + ln n − ln row − ln col: four ~O(10) logs cancelling to a
    # near-zero term amplify the ≤1-ulp JVM-vs-libm ln() disagreement
    # past the oracle's 9-significant-digit gate (observed at sf0.01),
    # while ln(ratio) for ratio ≈ 1 is itself ≈ 0, so its ulp error is
    # proportional to the TERM, not to ln(count). Numerator/denominator
    # multiply exactly for counts < 2^26.5; beyond, both engines round
    # the same IEEE product identically.
    ratio = (o.cast("double") * n.cast("double")) / (
        row.cast("double") * col.cast("double")
    )
    return F.when(o > 0, o.cast("double") * F.log(ratio)).otherwise(
        F.lit(0.0)
    )


def g2_expr(a: Column, b: Column, c: Column, d: Column, n: Column) -> Column:
    """Dunning's log-likelihood ratio G² over the same 2×2 table the
    χ² uses (Dunning 1993, "Accurate Methods for the Statistics of
    Surprise and Coincidence" — the collocation/feature statistic
    that stays calibrated at the small expected counts where Pearson
    χ² overshoots): G² = 2·Σ_cells O·ln(O/E) with E = row·col/n.
    Empty cells contribute 0 (x·ln x → 0).

    Cross-engine exactness: each cell term is written as ONE
    ln of the single ratio O·n/(row·col) over exact int64 counts
    (see _g2_term above — never the sum-of-four-logs form, whose
    near-total cancellation amplifies the ≤1-ulp JVM-vs-libm ln()
    disagreement), in a fixed left-to-right order the oracle
    mirrors, so results are bit-identical doubles — same discipline
    as chi2_expr above."""
    ab, cd = a + b, c + d
    ac, bd = a + c, b + d
    return F.lit(2.0) * (
        _g2_term(a, ab, ac, n)
        + _g2_term(b, ab, bd, n)
        + _g2_term(c, cd, ac, n)
        + _g2_term(d, cd, bd, n)
    )
