"""Range (interval) join — an operator Spark lacks natively.

A naive `l.ts BETWEEN r.start AND r.end` join plans as a
BroadcastNestedLoopJoin (O(n*m) — unusable at 100 TB). This module
realizes it as an EQUI-join by time-bucketing: each interval registers
in every fixed-width bucket it overlaps, each point lives in exactly
one bucket, so joining on (key, bucket) and re-checking the exact
predicate yields each qualifying pair exactly once. With bucket width
>= the max interval length the interval fan-out is bounded by 2, and
the join is an ordinary shuffled hash/sort-merge join that AQE can
size and skew-split like any other.

Reference parity: the reference has no range join; this is part of the
extension surface (training-data pipelines join events to sessions,
spans, and rate windows constantly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    start_us: str,
    end_us: str,
    point_us: str,
    bucket_width_us: int,
) -> DataFrame:
    """Inner-join `points` to every interval (same `key`) with
    `start_us <= point_us <= end_us` (inclusive both ends).

    All three *_us columns are BIGINT epoch-microseconds. Integer
    `div` keeps bucket ids exact (no double rounding at 2^50+ us).
    Choose `bucket_width_us` >= max(end_us - start_us) so each
    interval explodes into at most 2 buckets.
    """
    w = int(bucket_width_us)
    ivl = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(F.expr(f"{start_us} div {w}"), F.expr(f"{end_us} div {w}"))
        ),
    )
    pts = points.withColumn("_bkt", F.expr(f"{point_us} div {w}"))
    return (
        ivl.join(pts, on=[key, "_bkt"])
        .filter(
            (F.col(point_us) >= F.col(start_us))
            & (F.col(point_us) <= F.col(end_us))
        )
        .drop("_bkt")
    )
