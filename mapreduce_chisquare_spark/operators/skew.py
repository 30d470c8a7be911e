"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
at runtime, but it can't help when the skewed side feeds a streaming
stateful op, when a single key exceeds one executor even after
splitting, or when the build side can't broadcast. Explicit salting is
the standard fallback: the big side gets a deterministic salt in
[0, S), the small side is replicated S times, and the join key becomes
(key, salt) — the hot key's rows spread over S partitions.

The salt must be DETERMINISTIC (hash of stable columns, never rand())
so retried/recomputed tasks land rows in the same partition —
rand() salts silently corrupt results under task retry at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    num_salts: int = DEFAULT_SALTS,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    num_salts times. Result equals ``big.join(small, on, how)`` for
    how in (inner, left); the small side grows by a factor of
    num_salts, so keep it to dimension-table scale.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt_src: list[Column] = [
        F.col(c) for c in (salt_cols or big.columns)
    ]
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(num_salts))
    )
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<long>")),
    )
    return big_s.join(small_s, [*keys, "__salt"], how).drop("__salt")


def decide_num_salts(
    big: DataFrame,
    on: str | list[str],
    target_rows_per_partition: int = 2_000_000,
    sample_fraction: float = 0.05,
    max_salts: int = 64,
    seed: int = 42,
) -> int:
    """Derive the salt count from OBSERVED key skew instead of a fixed
    replication factor: estimate the hottest key's row count from a
    seeded Bernoulli sample, divide by the per-partition row budget,
    clamp to [1, max_salts]. 1 means "don't salt" — for uniform keys
    the fixed-S version replicates the small side S times for nothing,
    which was the whole cost of the salted join.

    The probe is one tiny agg over a key-only sample scan and the
    decision is driver-side — the same shape as Spark's broadcast
    decision. Correctness never depends on the outcome (salting is a
    physical rewrite with identical results), so sampling noise can
    only shift performance, never answers.
    """
    import math

    keys = [on] if isinstance(on, str) else list(on)
    r = (
        big.select(*keys)
        .sample(fraction=sample_fraction, seed=seed)
        .groupBy(*keys)
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("mx"))
        .collect()[0]
    )
    if r.mx is None:
        return 1
    est_hottest = r.mx / sample_fraction
    return max(1, min(max_salts, math.ceil(est_hottest / target_rows_per_partition)))


def adaptive_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_cols: list[str] | None = None,
    **probe_kwargs,
) -> DataFrame:
    """salted_join with the salt count chosen by decide_num_salts;
    degenerates to a plain equi-join when the probe finds no key hot
    enough to overflow a partition."""
    n = decide_num_salts(big, on, **probe_kwargs)
    if n <= 1:
        return big.join(small, on, how)
    return salted_join(big, small, on, how, n, salt_cols)


def skew_profile(
    df: DataFrame, keys: str | list[str], top_n: int = 20
) -> DataFrame:
    """Join-key skew diagnostic: the top_n heaviest key values with
    row counts and corpus share — the probe to run BEFORE picking a
    join strategy (broadcast? AQE skew split? explicit salt? drop the
    key as a stop-value?). decide_num_salts automates one consumer of
    this signal; the profile itself is the human-facing report.

    Shape: one map-side-combined count aggregate on the key, the
    total attached as a 1-row broadcast (the J3 pattern — no second
    scan), and a TakeOrderedAndProject cut: top_n rows per partition
    move, never a full sort. Ties break on the key columns so the
    selection is deterministic cross-engine."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    counts = df.groupBy(*ks).agg(F.count("*").alias("n_rows"))
    tot = counts.agg(F.sum("n_rows").alias("__t"))
    return (
        counts.join(F.broadcast(tot))
        .select(
            *ks,
            "n_rows",
            (
                F.col("n_rows").cast("double")
                / F.col("__t").cast("double")
            ).alias("share"),
        )
        .orderBy(
            F.desc("n_rows"), *[F.asc(k) for k in ks]
        )
        .limit(top_n)
    )
