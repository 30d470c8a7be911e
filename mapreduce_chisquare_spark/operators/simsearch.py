"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a random-
hyperplane LSH bucketing as the scale path (bucket first, then search
within buckets — turns O(N*Q) into O(N*Q/2^p) probes).

No Python UDFs: the dot product is F.aggregate/F.zip_with, which
Catalyst evaluates JVM-side. Summation is sequential left-to-right,
matching the oracle's expression order, so cosines are bit-identical
doubles (float32 inputs widen exactly to double).

Hyperplanes are deterministic ±1 vectors derived from md5 at import
time — identical literals are embedded in the oracle SQL.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .topk import topk_per_group

DIM = 64
NUM_PLANES = 8


def _plane(p: int, dim: int = DIM) -> list[int]:
    """Deterministic ±1 hyperplane: sign of md5 bit per (plane, dim)."""
    signs = []
    for d in range(dim):
        h = hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()
        signs.append(1 if int(h[0], 16) % 2 == 0 else -1)
    return signs


HYPERPLANES = [_plane(p) for p in range(NUM_PLANES)]


def dot(a: Column, b: Column) -> Column:
    """Sequential double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Exact top-k neighbours for each query vector (vec_id <
    n_queries): (query_id, vec_id, cos, rank). Queries are broadcast;
    the corpus is scanned once — the right shape when Q << N."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    return topk_per_group(scored, "query_id", "cos", "vec_id", k)


def cosine_topk_pandas(
    emb: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """cosine_topk with the score computed by an Arrow-vectorized
    pandas_udf (numpy batch math) instead of Catalyst expressions —
    the idiomatic escape hatch when per-element array expressions
    aren't enough (SURVEY.md §2.8). Same result relation."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos_batch(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        return pd.Series(num / den)

    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cos_batch(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    return topk_per_group(scored, "query_id", "cos", "vec_id", k)


def cosine_neardup_pairs(
    emb: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """Embedding near-dup pairs within the same label partition:
    (vec_a, vec_b, cos) with cos >= threshold. Blocking on label keeps
    the pair space linear-ish; at scale the label is any cheap
    partitioner (shard, cluster id from k-means, LSH bucket)."""
    a = emb.select(
        F.col("label").alias("lbl"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = emb.select(
        F.col("label").alias("lbl"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        a.join(b, "lbl")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            cosine(F.col("emb_a"), F.col("emb_b")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


N_CENTROIDS = 4


def ivf_assign(emb: DataFrame, n_centroids: int = N_CENTROIDS) -> DataFrame:
    """IVF coarse quantizer: (vec_id, centroid_id). Centroids are the
    first n_centroids vectors (deterministic stand-in for a k-means
    fit — the assignment/probe mechanics are what must scale);
    assignment = argmax cosine, ties to the lowest centroid id.

    Shape: corpus x tiny-broadcast join + per-vector argmax window —
    one scan, no shuffle of the corpus beyond the window's partition
    locality (vec_id partitioning)."""
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
    )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        cosine(F.col("embedding"), F.col("c_emb")).alias("cos"),
    )
    return (
        topk_per_group(scored, "vec_id", "cos", "centroid_id", 1)
        .select("vec_id", "centroid_id")
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
) -> DataFrame:
    """ANN via IVF: probe only the query's own cluster (nprobe=1), then
    exact cosine within it. Complements LSH: clusters adapt to data
    density, buckets don't."""
    asg = ivf_assign(emb, n_centroids)
    with_c = emb.join(asg, "vec_id")
    q = with_c.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "centroid_id",
    )
    scored = (
        with_c.join(F.broadcast(q), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    return topk_per_group(scored, "query_id", "cos", "vec_id", k)


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Scalar int8 quantization of the embedding column: each float
    maps to round(x·127) clamped to [-127, 127]. 4× smaller vectors
    for the ANN index; dequantize is x/127. Pure array transform —
    map-side only, no shuffle."""
    q = F.transform(
        F.col("embedding"),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.round(x.cast("double") * 127).cast("int")),
        ),
    )
    return emb.select("vec_id", q.alias("q_embedding"))


def hyperplane_bucket(emb_col: Column) -> Column:
    """LSH bucket id: sign bits of NUM_PLANES fixed hyperplane dots."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(HYPERPLANES):
        d = F.aggregate(
            F.zip_with(
                emb_col,
                F.array(*[F.lit(float(s)) for s in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """(vec_id, bucket): the ANN pre-partitioning. At scale, search
    probes only matching (or neighbouring-bit) buckets."""
    return emb.select(
        "vec_id", hyperplane_bucket(F.col("embedding")).alias("bucket")
    )


def lsh_topk(emb: DataFrame, n_queries: int = 8, k: int = 5) -> DataFrame:
    """ANN variant of cosine_topk: candidates restricted to the query's
    hyperplane bucket, then exact cosine within it."""
    with_b = emb.withColumn("bucket", hyperplane_bucket(F.col("embedding")))
    q = with_b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    scored = (
        with_b.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    return topk_per_group(scored, "query_id", "cos", "vec_id", k)
