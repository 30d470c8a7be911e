"""End-to-end CLI test: NDJSON reviews in → reference-format report
out, via the same entry shape as the reference
(`python chi_square.py <input> --stopwords f`, SURVEY.md §3.1).
"""

from __future__ import annotations

import json

from mapreduce_chisquare_spark.cli import main


def test_cli_end_to_end(spark, tmp_path):
    inp = tmp_path / "reviews.ndjson"
    rows = [
        {"reviewText": "great phone battery", "category": "electronics"},
        {"reviewText": "the battery died fast", "category": "electronics"},
        {"reviewText": "great novel plot twist", "category": "books"},
        {"reviewText": "boring plot the end", "category": "books"},
    ]
    lines = [json.dumps(r) for r in rows]
    lines.insert(2, "{not valid json")  # tolerant path must skip this
    inp.write_text("\n".join(lines) + "\n")
    stop = tmp_path / "stopwords.txt"
    stop.write_text("the\n")
    out = tmp_path / "out"

    main(
        [
            str(inp),
            "--stopwords", str(stop),
            "--output", str(out),
            "-k", "2",
            "--single-file",
        ]
    )

    got = sorted(
        r.value for r in spark.read.text(str(out)).collect()
    )
    cat_lines = [l for l in got if ":" in l]
    dict_line = [l for l in got if ":" not in l]
    assert {l.split()[0] for l in cat_lines} == {"books", "electronics"}
    for line in cat_lines:
        assert 1 <= len(line.split()) - 1 <= 2  # top-k = 2
    # merged dict: alphabetical union of report terms, no stopword "the"
    assert len(dict_line) == 1
    terms = dict_line[0].split()
    assert terms == sorted(terms) and "the" not in terms


def test_runquery_writes_parquet(spark, tmp_path):
    from mapreduce_chisquare_spark.runquery import main

    out = str(tmp_path / "q")
    rc = main(
        [
            "count_cat",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--output",
            out,
        ]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() > 0


def test_runquery_rejects_unknown(capsys):
    from mapreduce_chisquare_spark.runquery import main

    assert main(["no_such_query"]) == 2
