"""Accuracy tests for the sketch family (KMV, Count-Min).

Oracle parity alone cannot catch estimator defects: the DuckDB twin
embeds the same hash math, so a broken (order-preserving) hash passes
parity while the estimate is off by orders of magnitude — exactly the
round-1 defect. These tests pin the statistics themselves on planted
fixtures with known cardinality / Jaccard / collisions.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mapreduce_chisquare_spark.plans.registry_relational import (
    _KMV_K,
    kmv_estimate,
    kmv_jaccard,
)
from mapreduce_chisquare_spark.plans.registry_text import countmin_estimates


def test_kmv_distinct_accuracy(spark):
    # Sequential keys are the adversarial case for the round-1 affine
    # hash (order-preserving -> estimate ~8.7e8 regardless of n).
    n = 50_000
    d = spark.range(1, n + 1).withColumnRenamed("id", "key")
    r = kmv_estimate(d, "key").collect()[0]
    assert r.k_actual == _KMV_K
    rel_err = abs(r.est_distinct - n) / n
    assert rel_err < 3.0 / _KMV_K**0.5  # ~9.4% at k=1024


def test_kmv_small_set_is_exact(spark):
    d = spark.range(1, 101).withColumnRenamed("id", "key")
    r = kmv_estimate(d, "key").collect()[0]
    assert r.k_actual == 100
    assert r.est_distinct == 100.0


def test_kmv_jaccard_accuracy(spark):
    # A = 1..30000, B = 20001..50000: union 50000, inter 10000, J = 0.2.
    # The round-1 hash sampled the 1024 SMALLEST keys (all in A-only for
    # this layout), biasing J toward 0; a uniform sample lands near 0.2.
    flags = spark.range(1, 50_001).select(
        F.col("id").alias("key"),
        (F.col("id") <= 30_000).cast("int").alias("in_a"),
        (F.col("id") > 20_000).cast("int").alias("in_b"),
    )
    r = kmv_jaccard(flags, "key").collect()[0]
    assert r.k_actual == _KMV_K
    assert abs(r.jaccard_est - 0.2) < 0.05  # 4 sigma at k=1024


def _cms_bucket(term: str, row: int, w: int = 512) -> int:
    """Python twin of the engine's row hash: md5 hex slice [8r, 8r+8)."""
    h = hashlib.md5(term.encode()).hexdigest()
    return int(h[8 * row : 8 * row + 8], 16) % w


def test_countmin_min_over_rows_cancels_planted_collision(spark):
    heavy = "t0"
    # Find a term that collides with `heavy` in row 0 but in no other
    # row. Under the round-1 construction no such term existed (rows
    # collided all-or-nothing), so this search doubles as a regression
    # check on row independence.
    small = next(
        t
        for t in (f"x{i}" for i in range(100_000))
        if _cms_bucket(t, 0) == _cms_bucket(heavy, 0)
        and _cms_bucket(t, 1) != _cms_bucket(heavy, 1)
        and _cms_bucket(t, 2) != _cms_bucket(heavy, 2)
    )
    tf = spark.createDataFrame(
        [(heavy, 1000), (small, 5)], "term string, df_exact long"
    )
    out = {r.term: r for r in countmin_estimates(tf).collect()}
    # Row 0 alone would report df_est = 1005 for `small`; min-over-rows
    # uses the collision-free rows and recovers the exact count.
    assert out[small].df_est == 5
    assert out[heavy].df_est == 1000
