"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Registries live in mapreduce_chisquare_spark/plans/registry_*.py;
each entry pairs the Spark builder with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_chisquare_spark.plans.registry import REGISTRY
from mapreduce_chisquare_spark.plans.chisquare import chi_square_top_terms
from mapreduce_chisquare_spark.sources.readers import (
    reviews_from_documents,
    scan_parquet,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-75 χ² discriminative terms per category over the
    sf0.001 documents table (SURVEY.md §2.9)."""
    docs = scan_parquet(spark, _SMOKE_SF_DIR, "documents")
    return chi_square_top_terms(reviews_from_documents(docs))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec[0] for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec[1] for name, spec in REGISTRY.items() if spec[1] is not None
    }
