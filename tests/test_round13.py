"""Round-13 regression tests: the round-12 ADVICE findings, each
reproduced as a planted edge case — malformed-URL NULL collapse in
dedup_url_groups, literal second '?' in canonicalize_url, hits()
iterations guard, _messy_url column-name threading, and the
small-image placeholder contract of image_thumbnail_decoded."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_chisquare_spark.operators import multimodal as mm
from mapreduce_chisquare_spark.operators.curation import (
    canonicalize_url,
    dedup_url_groups,
)
from mapreduce_chisquare_spark.operators.graph import hits
from mapreduce_chisquare_spark.streaming.urls import _messy_url


# ---------------------------------------------------------------------
# dedup_url_groups: malformed URLs must not collapse into one group
# ---------------------------------------------------------------------

def test_dedup_url_groups_excludes_malformed(spark):
    rows = [
        (1, "not a url"),           # no '://' -> canonicalizes to NULL
        (2, "also-bad"),            # no '://' -> NULL
        (3, None),                  # NULL in -> NULL out
        (4, "https://example.com/x"),
        (5, "HTTPS://WWW.EXAMPLE.COM/x/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = dedup_url_groups(df).collect()
    # exactly the one real duplicate pair; NO NULL-keyed group of
    # the three unrelated malformed rows
    assert len(out) == 1
    assert (out[0].canon_url, out[0].n_dups, out[0].keep_id) == (
        "https://example.com/x",
        2,
        4,
    )


# ---------------------------------------------------------------------
# canonicalize_url: a literal second '?' is part of the query
# ---------------------------------------------------------------------

def test_canonicalize_url_second_question_mark_survives(spark):
    cases = [
        # literal '?' inside a param value (legal per RFC 3986)
        (
            "https://example.com/a?q=what?&b=1",
            "https://example.com/a?b=1&q=what?",
        ),
        # '?' inside the value of the only param
        (
            "https://example.com/a?redirect=/p?x=1",
            "https://example.com/a?redirect=/p?x=1",
        ),
        # tracking param still dropped even with '?' in another value
        (
            "https://example.com/a?utm_source=x&k=v?w",
            "https://example.com/a?k=v?w",
        ),
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
# hits: iterations must be >= 1
# ---------------------------------------------------------------------

def test_hits_rejects_zero_iterations(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        hits(edges, iterations=0)


# ---------------------------------------------------------------------
# _messy_url: both branches derive from the SAME named column
# ---------------------------------------------------------------------

def test_messy_url_uses_named_column(spark):
    ids = list(range(12))
    base = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    renamed = spark.createDataFrame([(i,) for i in ids], "other long")
    want = {
        r.doc_id: r.u
        for r in base.select(
            "doc_id", _messy_url("doc_id").alias("u")
        ).collect()
    }
    got = {
        r.other: r.u
        for r in renamed.select(
            "other", _messy_url("other").alias("u")
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------
# image_thumbnail_decoded: small images keep t*t field positions
# ---------------------------------------------------------------------

def _small_thumb_model(gray, t=mm.THUMB_T):
    """Placeholder-contract model: empty cells emit ''. Mirrors the
    documented mapping pixel (r, c) -> cell (r*t div h, c*t div w)."""
    h, w = len(gray), len(gray[0])
    sums = {}
    for r in range(h):
        for c in range(w):
            k = ((r * t) // h, (c * t) // w)
            s, n = sums.get(k, (0, 0))
            sums[k] = (s + gray[r][c], n + 1)
    return ",".join(
        str(sums[(i, j)][0] // sums[(i, j)][1]) if (i, j) in sums else ""
        for i in range(t)
        for j in range(t)
    )


def test_image_thumbnail_small_image_placeholder_positions(spark):
    t = mm.THUMB_T
    gray = [[10, 20], [30, 40], [50, 60]]  # 2 x 3 < t x t
    png = mm.encode_png(gray, color_type=0)
    media = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    row = mm.image_thumbnail_decoded(media).collect()[0]
    assert (row.w, row.h) == (2, 3)
    fields = row.thumb.split(",")
    assert len(fields) == t * t  # positions fixed, nothing dropped
    assert row.thumb == _small_thumb_model(gray)
    # columns 1 and 3 receive no pixels at w=2 -> '' placeholders
    for i in range(t):
        assert fields[i * t + 1] == "" and fields[i * t + 3] == ""


def test_image_thumbnail_full_size_unchanged(spark):
    # fixture-sized images (w,h >= t) must be byte-identical to the
    # pre-placeholder behavior: no '' fields anywhere
    docs = spark.createDataFrame([(0,), (7,)], "doc_id long")
    media = mm.synth_png_documents(docs)
    for r in mm.image_thumbnail_decoded(media).collect():
        fields = r.thumb.split(",")
        assert len(fields) == mm.THUMB_T * mm.THUMB_T
        assert all(f != "" for f in fields)
