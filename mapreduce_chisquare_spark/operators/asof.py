"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the union-merge technique: tag both sides, sort within
the key partition by (ts, side), and carry the latest right-side
timestamp forward with last(ignorenulls) over a running window. This
is a single shuffle on the join key + one partition-local sort —
O(n log n) per key, no range-join row explosion, safe at 100 TB.

Right-side rows sort before left at equal timestamps, giving inclusive
`right.ts <= left.ts` semantics (same as DuckDB's ASOF JOIN, which the
oracle uses directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: str,
) -> DataFrame:
    """For each left row: the latest right row with right.ts <= left.ts
    on the same key. Returns left's columns + `asof_<payload>`.

    `payload` must be a right-side column; left columns pass through.
    """
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_rpay", F.lit(None).cast(dict(right.dtypes)[payload])
    )
    r_tag = (
        right.select(key, ts, F.col(payload).alias("_rpay"))
        .withColumn("_side", F.lit(0))
    )
    l_cols = left.columns
    merged = l_tag.select(
        *l_cols, "_side", "_rpay"
    ).unionByName(
        r_tag.select(
            key,
            ts,
            "_side",
            "_rpay",
            *[
                F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                for c in l_cols
                if c not in (key, ts)
            ],
        ),
        allowMissingColumns=False,
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        merged.withColumn(
            f"asof_{payload}", F.last("_rpay", ignorenulls=True).over(w)
        )
        .filter(F.col("_side") == 1)
        .drop("_side", "_rpay")
    )
