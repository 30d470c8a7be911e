"""Scale-adaptive parallelism floor for CPU-bound kernel stages.

Problem (round-15 measurement): a parquet file is splittable only at
row-group boundaries, so a small single-row-group table scans as ONE
partition no matter how many cores the session has — and every
downstream narrow stage (Arrow mapInPandas decode/synth kernels,
heavy hash projections) inherits that single partition. At sf0.1 the
5000-row documents table scans as 1 partition on local[32]: the whole
multimodal decode family ran on 1 of 32 cores.

Fix: `spread_for_kernel(df, key)` hash-repartitions `df` to
`sparkContext.defaultParallelism` partitions — but ONLY when the
current partition count is below that target, so the operator is
self-deactivating at scale:

- 100 TB posture: a real corpus scan yields thousands of file-split
  partitions (>= defaultParallelism), the condition is false, and no
  exchange is added. The repartition never ships payload bytes at
  scale by construction.
- Local / small-input posture: the condition is true and the NARROW
  kernel input (typically just doc_id, a few KB) is exchanged once so
  the expensive per-row Python kernel runs on every core instead of
  one.

The partition key is a deterministic column hash (never rand()-derived
— retried map tasks must re-produce the same row placement, see
SPARK-38388), and the explicit numPartitions keeps AQE from
re-coalescing the tiny shuffle back to one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_for_kernel(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition `df` up to defaultParallelism partitions when (and
    only when) its current partitioning is narrower than that — the
    parallelism floor for a following CPU-bound kernel stage. `keys`
    default to the first column."""
    if df.isStreaming:
        # no partition introspection on streaming plans; micro-batch
        # parallelism is the source's concern
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    cols = [F.col(k) for k in (keys or (df.columns[0],))]
    return df.repartition(target, *cols)
