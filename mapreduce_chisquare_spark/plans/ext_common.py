"""Shared table loaders + imports for the ext_* registry part modules.

Split from registry_extensions.py (round 12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import DELIM_REGEX, MAX_TOKEN_LEN, MIN_TOKEN_LEN, STOPWORDS
from ..operators import curation as cu
from ..operators import dedup as dd
from ..operators import simsearch as ss
from ..operators import textstats as tx
from ..operators.asof import asof_from_tagged, asof_join
from ..operators.multimodal import (
    binarize_documents,
    decode_documents,
    sample_frames,
)
from ..operators.spread import spread_for_kernel
from ..sources.readers import scan_parquet
from ..streaming.windows import tumbling_counts_stream
from .oracle_common import CHI2_CTES, SQL_DELIM, SQL_STOPWORDS, with_text_ctes


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parquet(spark, sf_dir, "documents")


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens_relation

    d = _docs(spark, sf_dir).selectExpr("doc_id", "text", "lang AS category")
    return tokens_relation(d, STOPWORDS)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spread to the session parallelism floor (operators/spread.py,
    # no-op at cluster scale): every consumer runs per-row vector
    # math (dots/argmax/quantize) over the 64-dim embedding column,
    # and a single-row-group scan would pin all of it to one core.
    return spread_for_kernel(
        scan_parquet(spark, sf_dir, "embeddings"), "vec_id"
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parquet(spark, sf_dir, "events")

