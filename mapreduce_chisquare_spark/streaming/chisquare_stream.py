"""Incremental χ² over a document stream via foreachBatch
(beyond-reference: SURVEY.md §2.8 — the reference is batch-only).

Pattern: each micro-batch computes its own partial contingency counts
(a map-side-combined hash agg over just that batch's documents) and
appends them to a counts store; the final χ² relation is computed from
the merged partials. This is the standard "incremental aggregation"
shape — per-batch work is proportional to batch size, state is
pre-aggregated counts (tiny vs. raw tokens), and the merge is an
associative sum, so late re-computation never touches raw history.

At 100 TB the counts store would be a Delta/Iceberg table compacted in
the background; here it is an append-mode parquet directory per run.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import STOPWORDS
from ..functions.text import nonempty_documents, tokens_relation
from ..operators.contingency import (
    cat_counts,
    chi_square_from_counts,
    term_cat_counts,
)
from ..schemas import DOCUMENTS
from ..sources.fixtures import _CACHE, docs_multifile_dir


def incremental_chi_square(
    spark: SparkSession, sf_dir: str, parts: int = 4
) -> DataFrame:
    """Stream documents (one file per micro-batch), accumulate partial
    (term, category) and category counts per batch, and return the χ²
    relation from the merged counts — equal to the one-shot batch plan
    because count-merge is exact integer addition."""
    in_dir = docs_multifile_dir(sf_dir, parts)
    run = Path(_CACHE) / ("chi_run_" + uuid.uuid4().hex[:8])
    tc_dir, c_dir = str(run / "tc"), str(run / "c")

    stream = (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )

    def accumulate(batch_df: DataFrame, batch_id: int) -> None:
        d = batch_df.selectExpr("doc_id", "text", "lang AS category")
        toks = tokens_relation(d, STOPWORDS)
        term_cat_counts(toks).write.mode("append").parquet(tc_dir)
        cat_counts(nonempty_documents(d)).write.mode("append").parquet(
            c_dir
        )

    q = (
        stream.writeStream.foreachBatch(accumulate)
        .option("checkpointLocation", str(run / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    df_tc = (
        spark.read.parquet(tc_dir)
        .groupBy("term", "category")
        .agg(F.sum("df_tc").cast("long").alias("df_tc"))
    )
    df_c = (
        spark.read.parquet(c_dir)
        .groupBy("category")
        .agg(F.sum("df_c").cast("long").alias("df_c"))
    )
    n = df_c.agg(F.sum("df_c").cast("long").alias("n_docs"))
    return chi_square_from_counts(df_tc, df_c, n)
