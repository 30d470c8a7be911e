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
