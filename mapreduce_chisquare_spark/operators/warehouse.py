"""Warehouse-maintenance operators: data-quality profiling and
SCD2 (slowly-changing-dimension) merge.

dq_profile is the schema-audit pass every ingestion pipeline runs
before accepting a drop; scd2_merge is the versioned-dimension upsert
warehouses run on every refresh — expressed table-format-agnostically
(a Delta/Iceberg MERGE would replace the final write, not the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Column-quality profile: one row per metric x column —
    (column, metric, value) with metrics row_count / null_count /
    distinct_count / min / max (min/max as doubles for numeric
    columns, null otherwise).

    ONE aggregation pass over the input computes every metric
    map-side-combined (no per-column scans, no shuffle besides the
    single global agg), then a literal unpivot lays the scalars out as
    rows. At 100 TB this is exactly one read of the table."""
    aggs = []
    for c in columns:
        dt = dict(df.dtypes)[c]
        numeric = dt in ("bigint", "int", "double", "float", "smallint")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            (
                F.min(F.col(c)).cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"{c}__min"),
            (
                F.max(F.col(c)).cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    metrics = ("rows", "nulls", "distinct", "min", "max")
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(m).alias("metric"),
                F.col(f"{c}__{m}").cast("double").alias("value"),
            )
            for c in columns
            for m in metrics
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        "r.column", "r.metric", "r.value"
    )


def scd2_merge(base: DataFrame, updates: DataFrame, key: str, attr: str) -> DataFrame:
    """Type-2 dimension merge of `updates` into `base` on `key` for
    the tracked attribute `attr`: unchanged rows keep version 1
    current; changed rows emit the old version closed (is_current
    false) plus version 2 current; new keys insert at version 1.
    Returns (key, attr, version, is_current).

    One full-outer shuffle join on the dimension key plus a map-side
    CASE expansion — no driver loop, no per-row merge; the changed
    rows' two output versions come from one array-explode, so the
    join output is read once."""
    b = base.select(F.col(key).alias("k"), F.col(attr).alias("old_v"))
    u = updates.select(F.col(key).alias("k"), F.col(attr).alias("new_v"))
    j = b.join(u, "k", "full_outer")
    versions = (
        F.when(
            F.col("old_v").isNull(),  # insert
            F.array(
                F.struct(
                    F.col("new_v").alias("v"),
                    F.lit(1).alias("version"),
                    F.lit(True).alias("is_current"),
                )
            ),
        )
        .when(
            F.col("new_v").isNull() | (F.col("new_v") == F.col("old_v")),
            F.array(  # absent from updates, or unchanged: keep v1
                F.struct(
                    F.col("old_v").alias("v"),
                    F.lit(1).alias("version"),
                    F.lit(True).alias("is_current"),
                )
            ),
        )
        .otherwise(
            F.array(  # changed: close v1, open v2
                F.struct(
                    F.col("old_v").alias("v"),
                    F.lit(1).alias("version"),
                    F.lit(False).alias("is_current"),
                ),
                F.struct(
                    F.col("new_v").alias("v"),
                    F.lit(2).alias("version"),
                    F.lit(True).alias("is_current"),
                ),
            )
        )
    )
    return j.select(F.col("k").alias(key), F.explode(versions).alias("r")).select(
        key,
        F.col("r.v").alias(attr),
        F.col("r.version").alias("version"),
        F.col("r.is_current").alias("is_current"),
    )
