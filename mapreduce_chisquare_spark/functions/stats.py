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
