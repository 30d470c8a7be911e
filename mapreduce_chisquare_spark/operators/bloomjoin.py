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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_WORDS = 1024  # 1024 x 64 bits = 64 Kib filter
BLOOM_SEEDS = (1, 2)  # xxhash64 seed per hash function
_M = BLOOM_WORDS * 64


def _pos_expr(key: str, seed: int) -> str:
    """Bit position of `key` under `seed`: SQL text shared by the
    build and probe sides so both compute identical positions."""
    return f"pmod(xxhash64({key}, {seed}), {_M})"


def build_bloom(keys: DataFrame, key: str) -> list[int]:
    """The filter: W 64-bit words, ORed per word from every key's
    BLOOM_SEEDS bit positions. One explode + one hash aggregate; at
    most W rows reach the driver."""
    pos = keys.select(
        F.explode(
            F.array(*[F.expr(_pos_expr(key, s)) for s in BLOOM_SEEDS])
        ).alias("p")
    ).select(
        (F.col("p") / 64).cast("int").alias("w"),
        F.expr("shiftleft(1L, CAST(pmod(p, 64) AS INT))").alias("bit"),
    )
    words = [0] * BLOOM_WORDS
    for r in pos.groupBy("w").agg(F.bit_or("bit").alias("word")).collect():
        words[r.w] = r.word
    return words


def might_contain(words: list[int], key: str) -> Column:
    """Map-side membership test against the literal filter words: both
    seed bits set. Pure projection — runs inside the fact scan stage."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = None
    for s in BLOOM_SEEDS:
        p = F.expr(_pos_expr(key, s))
        bit = F.expr(
            f"shiftleft(1L, CAST(pmod({_pos_expr(key, s)}, 64) AS INT))"
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
    words = build_bloom(dim, dim_key)
    pref = fact.filter(might_contain(words, fact_key))
    return pref.join(F.broadcast(dim), pref[fact_key] == dim[dim_key])
