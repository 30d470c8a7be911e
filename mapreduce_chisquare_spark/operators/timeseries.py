"""Time-series resampling: regular-grid spine + forward fill.

The classic observability/feature-store operator Spark has no builtin
for: put each entity on a regular time grid from its first to its
last observation and carry the last value forward through empty
periods. Expressed as a composition — per-entity bounds, sequence()
spine explode, per-period last observation, ignorenulls window fill —
every step distributed and bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOUR = 3600


def resample_ffill(
    events: DataFrame, step: int = HOUR, max_user: int | None = 40
) -> DataFrame:
    """(user_id, hour_start, n_events, value_ffill): hourly grid per
    user spanning that user's [first, last] event hour; n_events
    counts the hour's events and value_ffill carries the latest
    observed `value` forward (ties within an hour broken by event
    time in µs, then by max value among same-µs events, so the fill
    is deterministic).

    Scale: the spine explode is per-user bounded (sequence() of that
    user's own range — no global cross join of users x grid), the
    per-hour reductions are hash aggregates, and the fill is one
    window per user ordered by hour. State per user = one row.
    `max_user` bounds the checked slice at test scale; None resamples
    everyone."""
    ev = events
    if max_user is not None:
        ev = ev.filter(F.col("user_id") < max_user)
    # Integer division end to end (`div`, not a float divide+cast):
    # epoch-µs values sit at ~1.7e15 where double rounding could move
    # a boundary, and the oracle's `//` is integer division too.
    obs = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "value",
    ).withColumn(
        "h", F.expr(f"(us div 1000000 div {step}) * {step}")
    )

    # Last-in-hour value with every aggregate hash-based: max(struct)
    # or max_by over a struct ordering falls back to SortAggregate
    # (non-fixed-width buffer), which sorts the whole event relation
    # map-side. Instead (1) collapse same-µs ties with max(value) —
    # commutative, deterministic — making `us` unique per (user, h),
    # then (2) max_by(value, us), which with a LONG ordering stays in
    # HashAggregate. Both steps are map-side combinable.
    per_us = obs.groupBy("user_id", "h", "us").agg(
        F.count("*").alias("c"), F.max("value").alias("v")
    )
    per_hour = per_us.groupBy("user_id", "h").agg(
        F.sum("c").alias("n_events"),
        F.max_by("v", "us").alias("last_value"),
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.lit(step).cast("long"))
            ).alias("h"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(per_hour, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.col("h").alias("hour_start"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.last(F.col("last_value"), ignorenulls=True)
            .over(w)
            .alias("value_ffill"),
        )
    )
