"""Mergeable sketches with CROSS-ENGINE-DETERMINISTIC contracts.

Spark's own approx_count_distinct (HLL++) is the right production
sketch, but its register layout is engine-private — a DuckDB twin
cannot reproduce it bit-for-bit, so dq_profile certifies it only via
a tolerance flag. kmv_distinct closes that gap: a K-Minimum-Values
distinct sketch (Bar-Yossef et al. 2002) whose every step — the hash,
the k-smallest selection, the estimator — is expressible identically
in both engines, so the ESTIMATE itself hash-matches in the oracle
gate. That also makes it the auditable sketch: two runs, two engines,
two cluster topologies all report the same number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_HASH_BITS = 60  # 15 hex chars of md5 -> always fits BIGINT, positive
KMV_HASH_SPACE = float(2**KMV_HASH_BITS)


def kmv_hash_expr(col: F.Column) -> F.Column:
    """Deterministic 60-bit uniform hash shared with DuckDB: the
    first 15 hex chars of md5 over the value's canonical decimal
    string. Both engines render BIGINT->string identically and both
    implement md5, so the hash — unlike Spark's murmur3 `hash()` or
    `xxhash64` — has a bit-identical twin."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")


def kmv_kept(
    df: DataFrame, key_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """The sketch STATE: per group, the k smallest distinct hashes —
    (grp, h, rn). This relation is what merges: the union of two
    groups' retained sets, re-selected to the k smallest, is exactly
    the sketch of the union (any hash among the global k smallest is
    necessarily among its own group's k smallest), which is what lets
    1000 executors sketch shards independently and combine. The
    rank<=k filter compiles to WindowGroupLimit (plan-asserted)."""
    hashed = (
        df.select(
            F.col(group_col).alias("grp"),
            kmv_hash_expr(F.col(key_col)).alias("h"),
        )
        # NULL keys hash to NULL and are excluded from the sketch on
        # BOTH engines (Spark sorts NULL first, DuckDB last — left in,
        # a NULL would evict a real hash on one side only)
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    return hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= F.lit(int(k))
    )


def kmv_merge(kept: DataFrame, k: int = 64) -> DataFrame:
    """Merge per-group KMV sketch states into ONE estimate of the
    distinct count of the union: global k smallest over the union of
    retained hashes (deduped — the same key hashes identically in
    every group), same estimator. Exactly equals the sketch built
    directly on the unpartitioned stream (asserted in tests) — the
    mergeability proof. Returns one row
    (n_groups, k_used, kmv_distinct).

    Scale shape: the input is already <= k rows per group; the global
    top-k is TakeOrdered (distributed partial top-k, never a
    single-partition window), and the estimator is a 1-row
    aggregate."""
    # n_groups rides a lazy 1-row aggregate (the module's standard
    # 1-row-crossJoin attach) — an eager count here would execute the
    # whole upstream sketch twice per call
    groups = kept.agg(
        F.countDistinct("grp").cast("long").alias("n_groups")
    )
    topk = kept.select("h").distinct().orderBy("h").limit(int(k))
    per = topk.agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").alias("hk"),
    ).crossJoin(F.broadcast(groups))
    est = F.when(
        F.col("k_used") < F.lit(int(k)), F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_HASH_SPACE) / F.col("hk").cast("double")
    )
    return per.select("n_groups", "k_used", est.alias("kmv_distinct"))


def kmv_distinct(
    df: DataFrame, key_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """Per-group approximate distinct count via K-Minimum-Values:
    keep the k smallest distinct hash values; if fewer than k distinct
    hashes exist the count is exact, else estimate
    (k-1) * 2^60 / h_k where h_k is the k-th smallest hash (the
    classic unbiased KMV estimator; relative error ~ 1/sqrt(k-2)).
    Returns (group, kmv_distinct DOUBLE, k_used BIGINT) — k_used is
    the number of retained hashes (= k when saturated), so a consumer
    can see which rows are exact.

    Scale shape: the sketch state per group is k BIGINTs — mergeable
    by union+re-select, the property that lets 1000 executors sketch
    100 TB with map-side partial selection. The rank<=k filter over
    the window compiles to WindowGroupLimit (partial per-partition
    top-k BEFORE the exchange, plan-asserted in tests), so the
    shuffle carries at most k rows per (partition, group), never the
    distinct-key relation."""
    kept = kmv_kept(df, key_col, group_col, k)
    per = kept.groupBy("grp").agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").alias("hk"),
    )
    est = F.when(
        F.col("k_used") < F.lit(int(k)), F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_HASH_SPACE) / F.col("hk").cast("double")
    )
    return per.select(
        F.col("grp").alias(group_col),
        est.alias("kmv_distinct"),
        "k_used",
    )
