"""Round-15 extension entries, first batch:

1. Typed PII census with Luhn-validated card detection + its
   streaming twin;
2. character-level entropy gibberish screen.

Registered by registry_extensions.py after the round-14 batch, so
these sit at the registry tail for the round-16 certification window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as cu
from .ext_common import _docs

EXT_ROUND15_QUERIES: dict = {}


# =========================================================================
# Typed PII census (operators/curation.py pii_screen)
# =========================================================================

def pii_screen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed PII census (operators/curation.py pii_screen) over the
    deterministic injected fixture (pii_inject_expr — includes the
    999.1.2.3 invalid-octet and Luhn-failing-card NEGATIVE plants the
    validated detectors must reject)."""
    d = _docs(spark, sf_dir)
    return cu.pii_screen(
        d.select("doc_id", cu.pii_inject_expr().alias("text"))
    )


# the SQL twin of pii_inject_expr — same residue classes, same text
_SQL_PII_TEXT = """
  text
  || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
       || '@mail.example.com' ELSE '' END
  || CASE WHEN doc_id % 11 = 0 THEN ' call 555-'
       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
  || CASE WHEN doc_id % 13 = 0 THEN ' ssn '
       || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
       || CAST(doc_id % 90 + 10 AS VARCHAR) || '-'
       || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
  || CASE WHEN doc_id % 5 = 0 THEN ' ip 10.'
       || CAST(doc_id % 256 AS VARCHAR) || '.0.'
       || CAST(doc_id % 200 + 1 AS VARCHAR) ELSE '' END
  || CASE WHEN doc_id % 6 = 0 THEN ' ip 999.1.2.3' ELSE '' END
  || CASE WHEN doc_id % 17 = 0 THEN ' card 4111111111111111' ELSE '' END
  || CASE WHEN doc_id % 19 = 0 THEN ' card 4111111111111112' ELSE '' END
  || CASE WHEN doc_id % 23 = 0 THEN ' amex 371449635398431' ELSE '' END
"""

# Luhn mod-10 over a digit string, exact integer arithmetic — the
# DuckDB twin of operators/curation.py luhn_valid
_SQL_LUHN = """list_sum(list_transform(range(0, length(s)), i ->
  CASE WHEN i % 2 = 1 THEN
    CASE WHEN (ascii(substr(s, CAST(length(s) - i AS INTEGER), 1)) - 48) * 2 > 9
         THEN (ascii(substr(s, CAST(length(s) - i AS INTEGER), 1)) - 48) * 2 - 9
         ELSE (ascii(substr(s, CAST(length(s) - i AS INTEGER), 1)) - 48) * 2 END
  ELSE ascii(substr(s, CAST(length(s) - i AS INTEGER), 1)) - 48 END)) % 10 = 0"""


def _sql_pii_screen() -> str:
    email = cu.EMAIL_REGEX
    return f"""
WITH p AS (SELECT doc_id, {_SQL_PII_TEXT} AS t FROM documents),
c AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(t, '{email}')) AS INTEGER) AS n_emails,
    CAST(len(regexp_extract_all(t, '{cu.PHONE_REGEX}')) AS INTEGER)
      AS n_phones,
    CAST(len(regexp_extract_all(t, '{cu.SSN_REGEX}')) AS INTEGER) AS n_ssn,
    CAST(len(regexp_extract_all(t, '{cu.IPV4_REGEX}')) AS INTEGER)
      AS n_ipv4,
    CAST(len(list_filter(regexp_extract_all(t, '{cu.CARD_CAND_REGEX}'),
      s -> {_SQL_LUHN})) AS INTEGER) AS n_cards
  FROM p)
SELECT doc_id, n_emails, n_phones, n_ssn, n_ipv4, n_cards,
  CAST(n_emails + n_phones + n_ssn + n_ipv4 + n_cards AS INTEGER)
    AS pii_total,
  (n_emails + n_phones + n_ssn + n_ipv4 + n_cards) > 0 AS flagged
FROM c
"""


def stream_pii_screen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PII census — identical operator function and fixture
    expression as the batch entry (streaming/curation.py
    pii_screen_stream), certified by the batch oracle."""
    from ..streaming.curation import pii_screen_stream

    return pii_screen_stream(spark, sf_dir)


# =========================================================================
# Character-entropy gibberish screen (operators/textstats.py
# char_entropy)
# =========================================================================

def char_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc character Shannon entropy in BIGINT micro-nats
    (operators/textstats.py char_entropy), low/normal/high buckets."""
    from ..operators.textstats import char_entropy

    return char_entropy(_docs(spark, sf_dir))


def _sql_char_entropy() -> str:
    from ..operators.textstats import ENTROPY_HIGH_FP, ENTROPY_LOW_FP

    return f"""
WITH ch AS (
  SELECT doc_id, u.c AS ch
  FROM documents, UNNEST(regexp_extract_all(text, '[\\s\\S]')) AS u(c)),
pc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
       FROM ch GROUP BY doc_id, ch),
d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
        CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT))
          AS BIGINT) AS s_fp
      FROM pc GROUP BY doc_id),
e AS (SELECT doc_id, n_chars,
        CAST(CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 1e6) AS BIGINT)
          - s_fp // n_chars AS BIGINT) AS ent_fp
      FROM d)
SELECT doc_id, n_chars, ent_fp,
  CAST(ent_fp AS DOUBLE) / 1e6 AS entropy,
  CASE WHEN ent_fp < {ENTROPY_LOW_FP} THEN 'low'
       WHEN ent_fp > {ENTROPY_HIGH_FP} THEN 'high'
       ELSE 'normal' END AS bucket
FROM e
"""


EXT_ROUND15_QUERIES.update(
    {
        "pii_screen": (pii_screen_q, _sql_pii_screen()),
        "stream_pii_screen": (stream_pii_screen_q, _sql_pii_screen()),
        "char_entropy_screen": (char_entropy_q, _sql_char_entropy()),
    }
)
