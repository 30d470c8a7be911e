"""Round-9 operator contracts: perceptual image near-dup, embedding
similarity join, mergeable rank sketch, Misra-Gries heavy hitters,
model-based quality score."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_chisquare_spark.operators import imagehash as ih
from mapreduce_chisquare_spark.operators.sketches import (
    mg_summary,
    mg_summary_sharded,
    rank_sketch_kept,
    rank_sketch_merge,
    rank_sketch_quantiles,
)


# ---------------------------------------------------------------------
# imagehash
# ---------------------------------------------------------------------

def _mk_docs(spark, texts: dict):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _py_phash(text: str):
    """Independent Python model of the dHash lattice."""
    n = len(text)
    px = [
        ord(text[(i * (n - 1)) // (ih.N_PIX - 1)])
        for i in range(ih.N_PIX)
    ]
    bands = []
    for j in range(ih.N_BANDS):
        v = 0
        for s in range(ih.BAND_BITS):
            b = j * ih.BAND_BITS + s
            r, c = divmod(b, ih.GRID_C)
            if px[r * (ih.GRID_C + 1) + c] < px[r * (ih.GRID_C + 1) + c + 1]:
                v |= 1 << s
        bands.append(v)
    return bands


def test_image_phash_matches_python_model(spark):
    texts = {
        0: "the quick brown fox jumps over the lazy dog " * 8,
        1: "aaaabbbbccccddddeeeeffffgggghhhhiiiijjjjkkkkllllmmmm"
        "nnnnooooppppqqqqrrrrssss",
        2: "z" * 72,  # constant image: all-zero hash
        3: "ab",  # shorter than the grid: positions repeat
    }
    rows = {
        r.doc_id: r
        for r in ih.image_phash(_mk_docs(spark, texts)).collect()
    }
    assert set(rows) == set(texts)
    for i, t in texts.items():
        bands = _py_phash(t)
        got = [rows[i][f"b{j}"] for j in range(ih.N_BANDS)]
        assert got == bands, (i, got, bands)
        want_hex = "".join(f"{b:04X}" for b in bands)
        assert rows[i].phash == want_hex, (i, rows[i].phash, want_hex)
    assert rows[2].phash == "0000000000000000"


def test_image_neardup_pigeonhole_recall_and_guard(spark):
    """(a) any planted pair within Hamming 3 IS found (pigeonhole:
    4 bands, d<=3 => >=1 equal band); (b) a pair beyond max_dist is
    absent; (c) a degenerate band bucket larger than max_bucket is
    excluded rather than exploding quadratically."""
    base = "the quick brown fox jumps over the lazy dog again and " * 4
    # one-char perturbation at a sampled position -> <=2 bits
    n = len(base)
    p = (20 * (n - 1)) // (ih.N_PIX - 1)
    near = base[:p] + "\x01" + base[p + 1 :]
    far = "zyxwvutsrqponmlkjihgfedcba" * 9  # unrelated content
    docs = _mk_docs(spark, {0: base, 1: near, 2: far})
    hashes = ih.image_phash(docs)
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in ih.image_neardup_pairs(hashes).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert (0, 2) not in pairs and (1, 2) not in pairs

    # guard: constant-payload docs all share the all-zero hash; with
    # max_bucket below the group size the bucket is dropped entirely
    flat = _mk_docs(spark, {i: "x" * 100 for i in range(12)})
    got = ih.image_neardup_pairs(
        ih.image_phash(flat), max_bucket=10
    ).collect()
    assert got == []
    # and with the guard above the group size, all C(12,2) pairs at
    # distance 0 appear — the quadratic cost the guard exists to cap
    got2 = ih.image_neardup_pairs(
        ih.image_phash(flat), max_bucket=20
    ).collect()
    assert len(got2) == 66 and all(r.hamming == 0 for r in got2)


# ---------------------------------------------------------------------
# rank sketch
# ---------------------------------------------------------------------

def _mk_vals(spark, n_rows: int = 2000, groups: int = 3):
    return spark.range(n_rows).select(
        F.col("id").alias("rid"),
        (F.col("id") % groups).cast("string").alias("grp"),
        # deterministic spread of values
        ((F.col("id") * 37) % 1000).cast("long").alias("v"),
    )


def test_rank_sketch_merge_equals_direct(spark):
    """Mergeability law bit-for-bit: bottom-k per (grp, shard) merged
    to bottom-k per grp == bottom-k per grp computed directly, and
    the quantile rows from either state are identical."""
    df = _mk_vals(spark)
    direct = rank_sketch_kept(df, "rid", "v", ["grp"], k=64)
    sharded = rank_sketch_kept(
        df.withColumn("sh", (F.col("rid") % 5).cast("long")),
        "rid",
        "v",
        ["grp", "sh"],
        k=64,
    )
    merged = rank_sketch_merge(sharded, ["grp"], k=64)
    d = sorted((r.grp, r.h, r.c) for r in direct.collect())
    m = sorted((r.grp, r.h, r.c) for r in merged.collect())
    assert d == m
    qd = sorted(
        tuple(r) for r in rank_sketch_quantiles(direct, ["grp"]).collect()
    )
    qm = sorted(
        tuple(r) for r in rank_sketch_quantiles(merged, ["grp"]).collect()
    )
    assert qd == qm


def test_rank_sketch_exact_when_group_fits(spark):
    """A group with <= k rows is sampled completely, so the sketch
    quantiles EQUAL the exact 'lower' quantiles."""
    df = _mk_vals(spark, n_rows=180, groups=1)  # 180 rows < k=256
    kept = rank_sketch_kept(df, "rid", "v", ["grp"], k=256)
    q = rank_sketch_quantiles(kept, ["grp"]).collect()[0]
    vals = sorted(((i * 37) % 1000) for i in range(180))
    assert q.n_sampled == 180
    for p in (50, 95, 99):
        assert q[f"q{p}"] == vals[(179 * p) // 100], p


def test_rank_sketch_rank_error_bounded(spark):
    """Quantile-of-sample rank error: with k=256 over 20k rows the
    p50/p95 estimates land within 5 rank-percent of truth (loose
    deterministic bound for this fixed hash — the statistical bound
    is ~1/sqrt(k) ≈ 6.25%)."""
    df = _mk_vals(spark, n_rows=20_000, groups=1)
    kept = rank_sketch_kept(df, "rid", "v", ["grp"], k=256)
    q = rank_sketch_quantiles(kept, ["grp"]).collect()[0]
    vals = sorted(((i * 37) % 1000) for i in range(20_000))
    for p in (50, 95):
        est = q[f"q{p}"]
        true_rank = sum(1 for v in vals if v <= est) / len(vals)
        assert abs(true_rank - p / 100) < 0.05, (p, est, true_rank)


# ---------------------------------------------------------------------
# Misra-Gries
# ---------------------------------------------------------------------

def _mk_terms(spark):
    """Zipf-ish term stream with known counts."""
    rows = []
    freqs = {f"t{i:02d}": 2 ** (10 - i) for i in range(10)}  # 1024..2
    freqs.update({f"z{i:03d}": 3 for i in range(40)})  # long tail
    rid = 0
    for t, c in freqs.items():
        for _ in range(c):
            rows.append((rid, rid % 4, t))
            rid += 1
    return (
        spark.createDataFrame(rows, "rid long, sh long, term string"),
        freqs,
    )


def test_mg_summary_contract(spark):
    df, freqs = _mk_terms(spark)
    counts = df.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    got = {r.term: (r.c_hat, r.err_bound) for r in
           mg_summary(counts, "term", k=8).collect()}
    n = sum(freqs.values())
    assert len(got) <= 8
    ts = {t for _, t in got.values()}
    assert len(ts) == 1
    t = ts.pop()
    # t is the 9th largest count; every reported c_hat = c_true - t
    true_sorted = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    assert t == true_sorted[8][1]
    assert t <= n // 9 + 1
    for term, (c_hat, _) in got.items():
        assert c_hat == freqs[term] - t
        assert c_hat <= freqs[term] <= c_hat + t
    # every term with c_true > t survives
    for term, c in freqs.items():
        if c > t:
            assert term in got, (term, c, t)


def test_mg_sharded_merge_lower_bounds_and_error(spark):
    df, freqs = _mk_terms(spark)
    n = sum(freqs.values())
    k = 8
    got = {r.term: r.c_hat for r in
           mg_summary_sharded(df, "term", "sh", k=k).collect()}
    assert 0 < len(got) <= k
    for term, c_hat in got.items():
        assert c_hat <= freqs[term], (term, c_hat, freqs[term])
        # telescoped error: per-shard + merge shrink <= 2N/(k+1)
        assert freqs[term] - c_hat <= 2 * n // (k + 1) + 2, (
            term,
            c_hat,
            freqs[term],
        )
    # the undisputed giants survive the sharded pass too
    assert "t00" in got and "t01" in got


# ---------------------------------------------------------------------
# similarity join
# ---------------------------------------------------------------------

def test_similarity_join_finds_planted_cross_corpus_clones(spark):
    import random

    from mapreduce_chisquare_spark.operators.simsearch import (
        kmeans_centroids,
        similarity_join,
    )

    rng = random.Random(7)
    dim = 64
    base = [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(120)
    ]
    left = spark.createDataFrame(
        base, "vec_id long, embedding array<double>"
    )
    clones = [
        (i + 10_000, [x + (0.001 if d == 0 else 0.0) for d, x in
                      enumerate(v)])
        for i, v in base
        if i % 10 == 0
    ]
    right = spark.createDataFrame(
        clones, "vec_id long, embedding array<double>"
    )
    cents = kmeans_centroids(left, k=8, dim=dim)
    got = {
        (r.a_id, r.b_id): r.cos
        for r in similarity_join(left, right, cents).collect()
    }
    planted = {(i, i + 10_000) for i in range(0, 120, 10)}
    assert planted <= set(got), planted - set(got)
    for p in planted:
        assert got[p] > 0.99
    # near-orthogonal gaussian background: nothing else crosses 0.92
    assert set(got) == planted


# ---------------------------------------------------------------------
# quality model
# ---------------------------------------------------------------------

def test_quality_model_score_decision_and_composition(spark):
    from mapreduce_chisquare_spark.operators.curation import (
        quality_model_score,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "one two three four five six seven eight nine ten"),
            (2, "solo"),
            (3, "...!!!..."),  # no tokens -> excluded
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_model_score(docs).collect()}
    assert set(rows) == {0, 1, 2}
    # doc 2: 1 token, 0 bigrams
    assert rows[2].n_grams == 1
    # doc 0: 6 tokens + 5 bigrams
    assert rows[0].n_grams == 11
    for r in rows.values():
        assert 0.0 < r.quality_model_score < 1.0
        # keep is the exact-integer twin of score >= 0.5
        assert r.keep == (r.quality_model_score >= 0.5), r
        assert math.isfinite(r.quality_model_score)


@pytest.mark.slow
def test_quality_model_composes_with_pipeline_curation(spark):
    """The learned filter runs downstream of the heuristic pipeline:
    scoring the curation survivors yields one row per surviving doc
    with the same exact keep decision the standalone scorer makes."""
    from mapreduce_chisquare_spark.operators.curation import (
        quality_model_score,
    )
    from mapreduce_chisquare_spark.plans.ext_common import _docs
    from mapreduce_chisquare_spark.plans.ext_media import pipeline_curation

    sf = "/root/testdata/sf0.001"
    survivors = pipeline_curation(spark, sf).select("doc_id")
    docs = _docs(spark, sf).join(survivors, "doc_id")
    scored = quality_model_score(docs)
    alone = quality_model_score(_docs(spark, sf))
    j = scored.alias("s").join(
        alone.alias("a"), "doc_id"
    ).select(
        "doc_id",
        (F.col("s.keep") == F.col("a.keep")).alias("same"),
        (F.col("s.n_grams") == F.col("a.n_grams")).alias("same_n"),
    )
    rows = j.collect()
    assert len(rows) == survivors.count()
    assert all(r.same and r.same_n for r in rows)


# ---------------------------------------------------------------------
# round-9 second batch
# ---------------------------------------------------------------------

def test_quality_model_rowlocal_is_bit_identical_to_join_form(spark):
    """The streaming-legal row-local scorer (literal-array weight
    lookup + F.aggregate fold) must equal the broadcast-join form
    column-for-column and bit-for-bit — this is what lets the
    streaming entry certify against the batch oracle."""
    from mapreduce_chisquare_spark.operators.curation import (
        quality_model_score,
        quality_model_score_rowlocal,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    a = sorted(map(tuple, quality_model_score(docs).collect()))
    b = sorted(
        map(tuple, quality_model_score_rowlocal(docs).collect())
    )
    assert a == b and len(a) > 0


def test_image_components_connect_clones_through_base(spark):
    """Two clones of one base sit <= 2 bits from the base but may sit
    beyond max_dist from EACH OTHER — the components pass must still
    put all three in one group (transitive closure), keeping only the
    min-id member."""
    from mapreduce_chisquare_spark.operators.dedup import (
        components_over_pairs,
    )
    from mapreduce_chisquare_spark.operators.imagehash import (
        image_neardup_pairs,
        image_phash,
        pixel_pos,
    )

    base = "the quick brown fox jumps over the lazy dog again and " * 4
    n = len(base)

    def perturb(sample_i, repl):
        p = (sample_i * (n - 1)) // 71
        return base[:p] + repl + base[p + 1 :]

    docs = spark.createDataFrame(
        [
            (0, base),
            (1_000_000, perturb(20, "\x01")),
            (2_000_000, perturb(30, "\x01")),
            (7, "zyxwvutsrqponmlkjihgfedcba" * 9),
        ],
        "doc_id long, text string",
    )
    pairs = image_neardup_pairs(image_phash(docs))
    from pyspark.sql import functions as FF

    comps = {
        r.doc_id: r.component_id
        for r in components_over_pairs(
            pairs.select(
                FF.col("a_id").alias("doc_a"),
                FF.col("b_id").alias("doc_b"),
            )
        ).collect()
    }
    assert comps.get(0) == 0
    assert comps.get(1_000_000) == 0
    assert comps.get(2_000_000) == 0
    assert 7 not in comps  # unrelated content joins no component
    _ = pixel_pos  # referenced for reader navigation


def test_similarity_join_topk_rank1_is_the_planted_base(spark):
    import random

    from mapreduce_chisquare_spark.operators.simsearch import (
        kmeans_centroids,
        similarity_join_topk,
    )

    rng = random.Random(11)
    dim = 64
    base = [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(100)
    ]
    left = spark.createDataFrame(
        base, "vec_id long, embedding array<double>"
    )
    right = spark.createDataFrame(
        [
            (i + 10_000, [x + (0.001 if d == 0 else 0.0)
                          for d, x in enumerate(v)])
            for i, v in base
            if i % 10 == 0
        ],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_centroids(left, k=8, dim=dim)
    rows = similarity_join_topk(left, right, cents, k=3).collect()
    got1 = {r.b_id: r.a_id for r in rows if r.rank == 1}
    assert got1 == {i + 10_000: i for i in range(0, 100, 10)}
    for r in rows:
        assert 1 <= r.rank <= 3
