"""Multimodal decode dispatch: the real-codec path (PIL, when
importable) and the deterministic fake must be drop-in
interchangeable — same schema, same batch mechanics — with the
registry query pinned to the fake so its DuckDB twin stays valid.

Reference parity note: the reference pipeline (chi_square.py) has no
media path; this family is part of the training-data-pipeline surface
the build brief adds on top of SURVEY.md §2.
"""

from __future__ import annotations

import pytest

from mapreduce_chisquare_spark.operators.multimodal import (
    DECODED_SCHEMA,
    codec_available,
    decode_documents,
    decode_media,
)


def _media(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, payload binary, kind string, n_bytes long"
    )


def test_decode_dispatch_defaults_to_environment(spark):
    """use_codec=None must select the fake in codec-less containers
    (this one) and the real decoder where PIL exists — the output
    schema is identical either way, so downstream plans never care."""
    media = _media(spark, [(1, b"hello world", "image", 11)])
    df = decode_documents(media)  # auto-detect
    assert df.schema == DECODED_SCHEMA
    if not codec_available():
        # fake metadata formulas: derived from payload bytes
        r = df.collect()[0]
        assert (r.n_bytes, r.width, r.height, r.n_frames) == (
            11,
            16 + (b"h"[0] % 16),
            16 + 11 % 16,
            1 + 1 % 8,
        )


def test_decode_media_raises_cleanly_without_codec():
    """Unsupported kinds (always) and images in codec-less
    environments fail loud with NotImplementedError — never a wrong
    answer, never a silent fake."""
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "audio")
    if not codec_available():
        with pytest.raises(NotImplementedError):
            decode_media(b"\x89PNG", "image")


@pytest.mark.skipif(not codec_available(), reason="PIL not installed")
def test_real_decoder_png_roundtrip(spark):
    """Where PIL exists, decode_documents(use_codec=True) must report
    the actual pixel dimensions of real PNG bytes through the same
    mapInPandas plumbing the fake uses."""
    import io

    from PIL import Image

    def png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, png(3, 5), "image", 0),
        (2, png(7, 2), "image", 0),
    ]
    out = {
        r.doc_id: (r.width, r.height, r.n_frames)
        for r in decode_documents(
            _media(spark, rows), use_codec=True
        ).collect()
    }
    assert out == {1: (3, 5, 1), 2: (7, 2, 1)}
