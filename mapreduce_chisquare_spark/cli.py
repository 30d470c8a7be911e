"""CLI mirroring the reference's entry points (SURVEY.md §3):

    python -m mapreduce_chisquare_spark.cli INPUT --stopwords FILE \\
        --output DIR [-k 75] [--single-file]

INPUT is NDJSON reviews (one {"reviewText": ..., "category": ...} per
line — chi_square.py:31-33's native format; malformed lines skipped,
the tolerant multi_jobs_hdfs.py:92-94 semantics). Output is the
reference's report: one line per category "cat term:chi2 ...", then
the merged dictionary line (readme:63-66) — written with the text
sink (one file per partition unless --single-file).
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="NDJSON reviews path (local/hdfs/s3)")
    ap.add_argument("--stopwords", default=None, help="one word per line")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("-k", type=int, default=75, help="top-k per category")
    ap.add_argument(
        "--single-file", action="store_true",
        help="coalesce to one output file (the sequential variant's sink)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from .plans.chisquare import chi_square_report
    from .session import get_spark
    from .sources.readers import load_stopwords, scan_json_reviews
    from .sources.sinks import write_text

    spark = get_spark("chi-square-cli")
    reviews = scan_json_reviews(spark, args.input).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    stopwords = load_stopwords(spark, args.stopwords)
    report = chi_square_report(reviews, stopwords, args.k)
    write_text(report, args.output, single_file=args.single_file)


if __name__ == "__main__":
    main()
