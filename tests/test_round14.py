"""Round-14 regression tests: the four round-13 ADVICE fixes —
canonicalize_url authority boundary at first-of-'/'-or-'?',
chunk_documents_overlap stride guard, quality_perplexity_buckets
order-independent integer scoring, bench rerun still-slow flag."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_chisquare_spark.operators.curation import canonicalize_url
from mapreduce_chisquare_spark.operators.packing import (
    chunk_documents_overlap,
)
from mapreduce_chisquare_spark.operators.textstats import (
    quality_perplexity_buckets,
)


# ---------------------------------------------------------------------
# canonicalize_url: the authority ends at the FIRST of '/' or '?' — a
# query with no path must not be absorbed into the host, and a '/'
# inside a query value is not a path boundary
# ---------------------------------------------------------------------

def test_canonicalize_url_query_without_path(spark):
    cases = [
        # query, no path: '?a=1' must not join the host
        ("https://example.com?a=1", "https://example.com/?a=1"),
        # ... and must canonicalize EQUAL to the '/?a=1' spelling
        ("https://example.com/?a=1", "https://example.com/?a=1"),
        # '/' inside a query value is not the path boundary
        (
            "https://example.com?u=http://x.com/p",
            "https://example.com/?u=http://x.com/p",
        ),
        # host-normalization rules still fire on the '?'-bounded host
        ("HTTPS://WWW.EXAMPLE.COM:443?b=2&a=1", "https://example.com/?a=1&b=2"),
        # tracking-only query, no path -> bare root
        ("https://example.com?utm_source=f", "https://example.com/"),
        # plain '/'-bounded URLs unaffected
        ("https://example.com/p?a=1", "https://example.com/p?a=1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id", canonicalize_url("url").alias("c")
        ).collect()
    }
    for i, (src, want) in enumerate(cases):
        assert got[i] == want, (src, got[i], want)


# ---------------------------------------------------------------------
# chunk_documents_overlap: stride > chunk_tokens would leave token
# gaps no chunk covers — the coverage guarantee demands a loud error
# ---------------------------------------------------------------------

def test_chunk_overlap_rejects_gapping_stride(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="stride"):
        chunk_documents_overlap(docs, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents_overlap(docs, chunk_tokens=4, stride=0)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents_overlap(docs, chunk_tokens=0)
    # stride == chunk_tokens is the disjoint edge and stays legal:
    # every token still lands in exactly one chunk
    rows = chunk_documents_overlap(
        docs, chunk_tokens=4, stride=4
    ).collect()
    assert sorted(r.n_tokens for r in rows) == [4, 4]


# ---------------------------------------------------------------------
# quality_perplexity_buckets: score_fp must equal the plain-Python
# integer model exactly — per-term BIGINT contributions make the sum
# order-independent, so no partition order can move it
# ---------------------------------------------------------------------

def test_perplexity_buckets_integer_score_matches_model(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the the the the", "en"),
        (3, "zephyr quixotic jumbles", "en"),
        (4, "cat mat cat mat cat", "en"),
        (5, "on on the sat", "en"),
        (6, "der hund der hund", "de"),
        (7, "der die das", "de"),
        (8, "die das die", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    # plain-Python model of the integer score
    from collections import Counter

    tf: dict[tuple[int, str], int] = Counter()
    for doc_id, text, _ in rows:
        for w in text.lower().split():
            tf[(doc_id, w)] += 1
    c = Counter()
    for (_, w), n in tf.items():
        c[w] += n
    t_total = sum(c.values())
    lt = math.floor(math.log(t_total) * 1e6)
    want = {}
    for doc_id, _, _ in rows:
        items = [(w, n) for (d, w), n in tf.items() if d == doc_id]
        n_tokens = sum(n for _, n in items)
        s_fp = sum(n * math.floor(math.log(c[w]) * 1e6) for w, n in items)
        want[doc_id] = s_fp // n_tokens - lt

    got = {
        r.doc_id: r.score_fp
        for r in quality_perplexity_buckets(docs, k=8).collect()
    }
    assert got == want

    # repartitioning the input must not move any score by even one
    # micro-nat — the order-independence property the fix exists for
    got2 = {
        r.doc_id: r.score_fp
        for r in quality_perplexity_buckets(
            docs.repartition(7), k=8
        ).collect()
    }
    assert got2 == got


# ---------------------------------------------------------------------
# bench rerun policy: a rerun that stays over its trigger must be
# flagged, and sub-0.5s baselines use the tighter trigger
# ---------------------------------------------------------------------

def test_bench_rerun_trigger_tiers():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    # noise-floor baseline: fires at 1.3x, not 2x
    assert bench._rerun_trigger(0.28) == pytest.approx(0.28 * 1.3)
    # normal baseline: classic 2x
    assert bench._rerun_trigger(2.0) == pytest.approx(4.0)
