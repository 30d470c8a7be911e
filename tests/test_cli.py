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


def _report_model(rows, stopwords, k):
    """Plain-Python replay of the documented flagship semantics
    (constants.py order: lowercase → tokenize → stopword filter →
    length filter → per-doc distinct; stats.py chi2 with the same
    left-to-right double arithmetic; report.py %.4f formatting and
    orderings). Returns the expected report lines, unordered."""
    import re as _re

    from mapreduce_chisquare_spark.constants import (
        DELIM_REGEX,
        MAX_TOKEN_LEN,
        MIN_TOKEN_LEN,
    )

    docs = [(t, c) for t, c in rows if t and c]
    n = len(docs)
    df_tc: dict = {}
    df_c: dict = {}
    for text, cat in docs:
        df_c[cat] = df_c.get(cat, 0) + 1
        terms = {
            t
            for t in _re.split(DELIM_REGEX, text.lower())
            if t not in stopwords
            and MIN_TOKEN_LEN <= len(t) <= MAX_TOKEN_LEN
        }
        for t in terms:
            df_tc[(t, cat)] = df_tc.get((t, cat), 0) + 1
    df_t: dict = {}
    for (t, _c), v in df_tc.items():
        df_t[t] = df_t.get(t, 0) + v
    lines, selected = [], set()
    for cat in sorted(df_c):
        scored = []
        for (t, c), a in df_tc.items():
            if c != cat:
                continue
            b = df_t[t] - a
            cc = df_c[cat] - a
            d = n - a - b - cc
            ad_bc = float(a) * float(d) - float(b) * float(cc)
            num = float(n) * ad_bc * ad_bc
            den = (
                float(a + b) * float(a + cc) * float(b + d) * float(cc + d)
            )
            scored.append((t, 0.0 if den == 0.0 else num / den))
        top = sorted(scored, key=lambda x: (-x[1], x[0]))[: int(k)]
        lines.append(
            cat + " " + " ".join("%s:%.4f" % (t, v) for t, v in top)
        )
        selected.update(t for t, _v in top)
    lines.append(" ".join(sorted(selected)))
    return lines


def test_cli_report_matches_python_oracle(spark, tmp_path):
    """Byte-exact e2e: a generated NDJSON corpus (with malformed and
    empty/null rows planted) through the REAL CLI path —
    scan_json_reviews → chi_square_report → write_text single-file —
    compared line-for-line against the plain-Python oracle of the
    reference's report format (readme:63-66)."""
    cats = ["books", "electronics", "garden"]
    vocab = [
        "battery", "plot", "soil", "charger", "novel", "rose",
        "screen", "author", "seed", "cable", "chapter", "bloom",
        "great", "poor", "ok",
    ]
    rows = []
    for i in range(150):
        cat = cats[i % 3]
        # category-biased vocabulary with shared fillers, some
        # uppercase / punctuation / digits / stopwords / repeats
        words = [
            vocab[(i % 3) * 4 + (i // 3) % 4],
            vocab[(i * 7) % len(vocab)],
            vocab[12 + i % 3].upper(),
            "the" if i % 4 == 0 else "with",
            f"model{i % 5}",  # digit-split: 'model' survives, digit drops
            vocab[(i % 3) * 4 + (i // 9) % 4],  # in-doc repeat
        ]
        rows.append((" ".join(words) + ", right?", cat))
    inp = tmp_path / "corpus.ndjson"
    lines = [
        json.dumps({"reviewText": t, "category": c}) for t, c in rows
    ]
    lines.insert(10, "{broken json")          # PERMISSIVE skip
    lines.insert(40, json.dumps({"reviewText": "", "category": "books"}))
    lines.insert(70, json.dumps({"reviewText": "orphan text"}))  # null cat
    inp.write_text("\n".join(lines) + "\n")
    stop = tmp_path / "stopwords.txt"
    stopwords = ["the", "with", "ok"]
    stop.write_text("\n".join(stopwords) + "\n")
    out = tmp_path / "report"

    main(
        [
            str(inp),
            "--stopwords", str(stop),
            "--output", str(out),
            "-k", "5",
            "--single-file",
        ]
    )

    got = sorted(r.value for r in spark.read.text(str(out)).collect())
    want = sorted(_report_model(rows, set(stopwords), 5))
    assert got == want


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
