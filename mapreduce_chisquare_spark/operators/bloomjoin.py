"""Bloom-filter semi-join prefilter — the hand-rolled runtime-filter
pattern for 100 TB fact joins.

When a selective dimension filter leaves a small key set, the win at
scale is not the join algorithm but WHERE the fact rows die: a Bloom
filter built from the dimension keys is broadcast as a literal array
and applied map-side on the fact scan, so non-matching rows never
enter the shuffle. False positives (a few %) still flow through and
are eliminated by the real join — the result is exactly the plain
join, which is why the oracle is the plain SQL join with no Bloom
anywhere.

Spark's own runtime Bloom (spark.sql.optimizer.runtimeFilter.*) fires
only for some shapes and is opaque to the plan reader; this form is
explicit, deterministic, and testable. The filter build scans only
the (already filtered) dimension side and collects W 64-bit words to
the driver — a k-row scalar, same budget class as the stopword list.

Two correctness/robustness properties (both ADVICE-driven):
- Keys are canonicalized to STRING before hashing, so the build and
  probe sides always compute identical bit positions even when the
  two key columns have different physical types (int vs bigint would
  otherwise hash differently and silently drop true matches).
- The filter is sized from the observed dimension-key count for a
  ~1-2% FPR (TARGET_BITS_PER_KEY bits/key at k=2), capped at
  MAX_WORDS so the broadcast literal stays bounded; past the cap the
  filter stays CORRECT (false positives only) but stops cutting, so
  the build emits a warning instead of silently degrading.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

MIN_WORDS = 1024  # 1024 x 64 bits = 64 Kib floor
MAX_WORDS = 16384  # 1 Mib cap: bounds the broadcast literal array
TARGET_BITS_PER_KEY = 16  # k=2 → FPR ≈ (1 - e^(-1/8))² ≈ 1.4%
BLOOM_SEEDS = (1, 2)  # xxhash64 seed per hash function


@dataclass(frozen=True)
class Bloom:
    """W 64-bit filter words plus the modulus they were built with.
    Carrying m makes build/probe agreement structural — a probe can
    never use a different size than the build."""

    words: tuple
    m: int


def _pos_expr(key: str, seed: int, m: int) -> str:
    """Bit position of `key` under `seed`. The CAST to STRING is the
    canonicalization contract: both sides hash the same bytes no
    matter the column's physical type (int32 vs int64, etc.)."""
    return f"pmod(xxhash64(CAST({key} AS STRING), {seed}), {m})"


def _size_words(n_keys: int) -> int:
    """Power-of-two word count giving ~TARGET_BITS_PER_KEY bits/key,
    clamped to [MIN_WORDS, MAX_WORDS]."""
    need_bits = max(1, n_keys) * TARGET_BITS_PER_KEY
    words = 2 ** math.ceil(math.log2(max(MIN_WORDS, need_bits / 64)))
    return min(MAX_WORDS, words)


def build_bloom(keys: DataFrame, key: str) -> Bloom:
    """The filter: W 64-bit words, ORed per word from every key's
    BLOOM_SEEDS bit positions. One count + one explode + one hash
    aggregate; at most W rows reach the driver."""
    n_keys = keys.count()
    n_words = _size_words(n_keys)
    if n_keys * TARGET_BITS_PER_KEY > n_words * 64:
        log.warning(
            "bloom prefilter saturating: %d keys exceed the %d-word "
            "cap (effective %.1f bits/key); results stay exact but "
            "the prefilter cut weakens",
            n_keys,
            n_words,
            n_words * 64 / n_keys,
        )
    m = n_words * 64
    pos = keys.select(
        F.explode(
            F.array(*[F.expr(_pos_expr(key, s, m)) for s in BLOOM_SEEDS])
        ).alias("p")
    ).select(
        (F.col("p") / 64).cast("int").alias("w"),
        F.expr("shiftleft(1L, CAST(pmod(p, 64) AS INT))").alias("bit"),
    )
    words = [0] * n_words
    for r in pos.groupBy("w").agg(F.bit_or("bit").alias("word")).collect():
        words[r.w] = r.word
    return Bloom(words=tuple(words), m=m)


def might_contain(bloom: Bloom, key: str) -> Column:
    """Map-side membership test against the literal filter words: both
    seed bits set. Pure projection — runs inside the fact scan stage."""
    arr = F.array(*[F.lit(w).cast("long") for w in bloom.words])
    cond = None
    for s in BLOOM_SEEDS:
        p = F.expr(_pos_expr(key, s, bloom.m))
        bit = F.expr(
            f"shiftleft(1L, CAST(pmod({_pos_expr(key, s, bloom.m)}, 64) AS INT))"
        )
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else (cond & test)
    return cond


def bloom_prefiltered_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
) -> DataFrame:
    """fact ⋈ dim with the fact side Bloom-prefiltered on the dim's
    key set before the join. Result identical to the plain inner join
    (false positives die in the join); the shuffle/broadcast input is
    cut to matching-plus-epsilon rows."""
    bloom = build_bloom(dim, dim_key)
    pref = fact.filter(might_contain(bloom, fact_key))
    return pref.join(F.broadcast(dim), pref[fact_key] == dim[dim_key])
