"""Sinks (SURVEY.md §2.1 S4/S5).

The reference emits value-only text lines via mrjob's TextProtocol
(chi_square.py:19) or a sequential local-file write
(multi_jobs_hdfs.py:207-211).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_text(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S4/S5: value-only text sink. `single_file` mirrors the sequential
    variant's one local file; leave False at scale (one file per
    partition)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").text(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (beyond-reference: second columnar interchange format;
    same writer pipeline as parquet, zlib-by-default stripes)."""
    df.write.mode("overwrite").orc(path)
