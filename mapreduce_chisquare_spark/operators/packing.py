"""Training-sequence shaping: document chunking and sequence packing.

The last mile of a training-data pipeline turns curated documents
into fixed-budget training sequences:

- `chunk_documents`: split each document into <= chunk_tokens-token
  pieces — a pure map-side array slice + explode (scan-speed at
  100 TB, no shuffle; the 1-to-N fan-out is the same Generate shape
  as the multimodal frame sampler).
- `pack_sequences`: assign documents to fixed-token-budget bins by
  running total within a partition key (lang here; date/source in
  production). The running sum is ONE window per partition key —
  packing parallelizes across keys instead of serializing on a global
  order, which is the scale-correct form (a single global packing
  order would funnel 100 TB through one partition). Documents larger
  than the budget still get their own bin(s) — the budget bounds the
  running total per bin, not a hard per-doc cap.

Both are deterministic (doc_id order) and expressible in ANSI SQL, so
they carry exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHUNK_TOKENS = 50
PACK_BUDGET = 512


def _words(text_col: str = "text"):
    return F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != ""
    )


def chunk_documents(
    docs: DataFrame, text_col: str = "text", chunk_tokens: int = CHUNK_TOKENS
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): each document split
    into consecutive <= chunk_tokens-token chunks, chunk_id 0-based.
    Empty/null documents produce no chunks."""
    n = chunk_tokens
    base = docs.select("doc_id", _words(text_col).alias("__w"))
    chunks = F.expr(
        f"CASE WHEN size(__w) > 0 THEN "
        f"transform(sequence(0, CAST(ceil(size(__w) / {n}.0) AS INT) - 1), "
        f"i -> struct(i AS chunk_id, slice(__w, i * {n} + 1, {n}) AS toks)) "
        f"ELSE array() END"
    )
    return (
        base.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").cast("long").alias("chunk_id"),
            F.size("c.toks").cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.col("c.toks")).alias("chunk_text"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    part_col: str = "lang",
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """(part, bin_id, n_docs, sum_tokens): documents packed into
    fixed-budget bins by running token total in doc_id order within
    each partition value — bin_id = floor((cumulative_inclusive - 1) /
    budget). One window + one aggregate per partition key; bins are
    reproducible under any physical row order because the window
    order (doc_id) is total."""
    base = docs.select(
        F.col(part_col).alias("part"),
        "doc_id",
        F.greatest(F.size(_words(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = base.select(
        "part",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - 1) / F.lit(budget))
        .cast("long")
        .alias("bin_id"),
    )
    return binned.groupBy("part", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


def chunk_documents_overlap(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int | None = None,
) -> DataFrame:
    """RAG-style OVERLAPPING chunking: a window of <= chunk_tokens
    tokens starts every `stride` tokens (default chunk_tokens // 2),
    so adjacent chunks share chunk_tokens - stride tokens of context
    — the retrieval-chunking shape that keeps answers spanning a
    chunk boundary findable, where chunk_documents' disjoint split
    loses them. chunk_id i covers tokens [i*stride, i*stride +
    chunk_tokens); chunks are emitted while i*stride < n_tokens, so
    every token appears in >= 1 chunk and the tail chunk may be
    short. Returns (doc_id, chunk_id, n_tokens, chunk_text).

    Scale shape: identical to chunk_documents — one row-local
    tokenize + window explode, zero exchanges; output size is
    input_tokens * (chunk_tokens / stride), the documented overlap
    amplification factor."""
    n = int(chunk_tokens)
    if n < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    s = int(stride) if stride is not None else max(1, n // 2)
    if s < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if s > n:
        # stride > chunk_tokens would silently skip the token ranges
        # between window ends and the next window start, breaking the
        # every-token-covered guarantee above
        raise ValueError(
            f"stride ({s}) must be <= chunk_tokens ({n}): larger "
            "strides leave token gaps no chunk covers"
        )
    base = docs.select("doc_id", _words(text_col).alias("__w"))
    chunks = F.expr(
        f"CASE WHEN size(__w) > 0 THEN "
        f"transform(sequence(0, CAST(ceil(size(__w) / {s}.0) AS INT) - 1), "
        f"i -> struct(i AS chunk_id, "
        f"slice(__w, i * {s} + 1, {n}) AS toks)) "
        f"ELSE array() END"
    )
    return (
        base.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").cast("long").alias("chunk_id"),
            F.size("c.toks").cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.col("c.toks")).alias("chunk_text"),
        )
    )
