"""Top-k per group (SURVEY.md §2.6 T1).

Replaces the reference's in-reducer heapq.nlargest(75)
(chi_square.py:88-89) / full-sort-slice (run_chi:158-159) with a
window row_number — a partition-local sort per group, no global sort.
Tie-break (value DESC, key ASC) is the deterministic total order of
quirk Q6 (the reference's tie order is dict-insertion nondeterminism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.asc(tiebreak_col)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
