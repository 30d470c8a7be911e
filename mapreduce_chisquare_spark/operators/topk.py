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


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_const: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of TWO bounded ranked lists — hybrid
    retrieval's standard combiner (Cormack, Clarke & Buettcher,
    SIGIR'09): each list contributes 1/(k_const + rank) for the items
    it ranked, items missing from a list contribute 0 from it, and
    the fused top-k is ordered by the summed score (ties by id).
    Returns (id, a_rank, b_rank, rrf, rank); a_rank/b_rank are NULL
    where a list did not rank the item.

    Exactness: every contribution is the one double division
    1.0/(k_const + rank) on integer inputs, and the fused score adds
    the A contribution THEN the B contribution — fixed order, so both
    engines produce identical doubles.

    Scale shape: inputs are top-N lists (bounded by construction —
    each tier's own TakeOrdered/WindowGroupLimit cut), so the
    full-outer join and the final ordering window run over <= |a|+|b|
    rows. The unpartitioned window is bounded the same way
    mg_summary's is (<= 2N rows, N the tier cut) — never
    corpus-sized."""
    fa = a.select(F.col(id_col), F.col(rank_col).alias("a_rank"))
    fb = b.select(F.col(id_col), F.col(rank_col).alias("b_rank"))
    j = fa.join(fb, id_col, "full_outer")

    def contrib(c: F.Column) -> F.Column:
        return F.when(
            c.isNotNull(),
            F.lit(1.0) / (F.lit(float(k_const)) + c.cast("double")),
        ).otherwise(F.lit(0.0))

    scored = j.select(
        id_col,
        "a_rank",
        "b_rank",
        (contrib(F.col("a_rank")) + contrib(F.col("b_rank"))).alias(
            "rrf"
        ),
    )
    # Unpartitioned window is BOUNDED: `scored` is the join of two
    # tiers each pre-cut to <= k_tier rows upstream, so this single
    # task ranks <= k_tier rows, never a corpus.
    w = Window.orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
    )
