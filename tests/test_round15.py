"""Round-15 operator tests: typed PII census (Luhn, validated IPv4),
character-entropy screen."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_chisquare_spark.operators.curation import (
    luhn_valid,
    pii_screen,
)
from mapreduce_chisquare_spark.operators.textstats import char_entropy


def _screen_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii_screen(df).collect()[0]


def test_pii_screen_typed_detectors(spark):
    r = _screen_one(
        spark,
        "mail a.b+c@ex-ample.org call 555-123-4567 ssn 123-45-6789 "
        "ip 192.168.0.1 card 4111111111111111",
    )
    assert (r.n_emails, r.n_phones, r.n_ssn, r.n_ipv4, r.n_cards) == (
        1, 1, 1, 1, 1,
    )
    assert r.pii_total == 5 and r.flagged


def test_pii_screen_negative_plants(spark):
    # out-of-range octet, Luhn-failing card, and digit runs too
    # short/long for a card must all be rejected
    r = _screen_one(
        spark,
        "ip 999.1.2.3 card 4111111111111112 num 123456789012 "
        "num 12345678901234567890",
    )
    assert r.pii_total == 0 and not r.flagged


def test_pii_screen_clean_text_unflagged(spark):
    r = _screen_one(spark, "an ordinary sentence with the number 42")
    assert r.pii_total == 0 and not r.flagged


def test_luhn_model_parity(spark):
    """luhn_valid must agree with the reference mod-10 model on a
    spread of digit strings (both parities of length)."""

    def model(s: str) -> bool:
        t = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            t += d
        return t % 10 == 0

    cands = [
        "4111111111111111", "4111111111111112", "371449635398431",
        "6011000990139424", "5500005555555559", "1234567890123",
        "9999999999999999999",
    ]
    df = spark.createDataFrame([(c,) for c in cands], "s string")
    got = {
        r.s: r.ok
        for r in df.select("s", luhn_valid(F.col("s")).alias("ok")).collect()
    }
    assert got == {c: model(c) for c in cands}


def test_char_entropy_model(spark):
    """Exact micro-nat parity with the plain-Python model, plus the
    degenerate single-char doc (entropy exactly 0 -> 'low')."""
    texts = {1: "aaaaaaaa", 2: "abab", 3: "the quick brown fox"}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in char_entropy(df).collect()}

    for did, t in texts.items():
        counts: dict[str, int] = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(t)
        s_fp = sum(c * math.floor(math.log(c) * 1e6) for c in counts.values())
        ent_fp = math.floor(math.log(n) * 1e6) - s_fp // n
        r = got[did]
        assert r.n_chars == n
        assert r.ent_fp == ent_fp, (did, r.ent_fp, ent_fp)
    assert got[1].ent_fp == 0 and got[1].bucket == "low"
    assert got[3].bucket == "normal"


def test_char_entropy_empty_doc_absent(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "xy")], "doc_id long, text string"
    )
    assert [r.doc_id for r in char_entropy(df).collect()] == [3]
