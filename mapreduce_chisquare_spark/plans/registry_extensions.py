"""queries()/oracle_sql() registry — LLM-data-pipeline extensions:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search (brute-force + hyperplane LSH), text analysis, event-time
windows (tumbling/sliding/session), as-of join, multimodal plumbing,
and the Structured Streaming twin of the tumbling window.

Oracle SQL for hash-heavy operators is *generated* from the same
Python constants as the Spark plans (seeds, hyperplanes, band layout),
so both engines express byte-identical semantics.
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
    return scan_parquet(spark, sf_dir, "embeddings")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parquet(spark, sf_dir, "events")


# =========================================================================
# Deduplication
# =========================================================================

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (byte-identical) dedup. The synthetic corpus is
    duplicate-free, so the query unions in an UNMODIFIED copy of
    every 20th document under a fresh doc_id — the gate exercises
    real duplicate groups (n_dupes = 2, keep_doc_id = the original)
    instead of certifying empty == empty."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        "text",
    )
    return dd.exact_duplicates(d.unionByName(copies))


SQL_DEDUP_EXACT = """
WITH u AS (SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 10000000, text
           FROM documents WHERE doc_id % 20 = 0)
SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_dupes,
       min(doc_id) AS keep_doc_id
FROM u GROUP BY md5(text) HAVING count(*) >= 2
"""

# Shared shingle CTE chain (mirrors operators/dedup.py shingles for
# any n: start positions 1..len(arr)-n+1, 1-based).
def _sh_ctes_n(n: int) -> str:
    gram = " || ' ' || ".join(f"arr[i+{j}]" if j else "arr[i]" for j in range(n))
    return (
        "docsr AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), "
        f"'{SQL_DELIM}'), x -> x <> '') AS arr FROM documents), "
        f"sh AS (SELECT DISTINCT doc_id, {gram} AS shingle "
        f"FROM docsr, UNNEST(range(1, len(arr) - {n - 2})) AS r(i))"
    )


_SH_CTES = _sh_ctes_n(3)

# Mirror of operators/dedup.py minhash_signatures: base32 = digit-sum
# of the first 8 md5 hex chars (same construction as the SimHash
# oracle below), then the (A*base+B) mod 2^31 universal-hash family
# with the SAME constants.
_BASE32_SQL = " + ".join(
    "(strpos('0123456789abcdef', substr(md5(shingle), {i}, 1)) - 1)".format(
        i=i + 1
    )
    + f" * {16 ** (8 - i - 1)}"
    for i in range(8)
)

def _minhash_band_ctes(k: int = dd.NUM_HASHES, bands: int = dd.NUM_BANDS) -> str:
    """CTE chain documents -> shingles -> signatures -> `bands`
    (doc_id, band, key) at a chosen (k, bands) operating point,
    generated from the same hash_params(k) family as the Spark plan.
    String band keys group documents identically to the Spark side's
    packed-long array keys (injectivity argued at lsh_band_keys)."""
    sig_cols = ", ".join(
        f"min(({a} * b32 + {b}) % {dd._MOD}) AS h{s}"
        for s, (a, b) in enumerate(dd.hash_params(k))
    )
    rows = k // bands
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || '_' || ".join(
                f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return (
        _SH_CTES + ", "
        f"shb AS (SELECT doc_id, ({_BASE32_SQL}) AS b32 FROM sh), "
        f"sig AS (SELECT doc_id, {sig_cols} FROM shb GROUP BY doc_id), "
        f"bands AS ({band_selects})"
    )


def _minhash_pair_ctes(k: int = dd.NUM_HASHES, bands: int = dd.NUM_BANDS) -> str:
    """CTE chain for MinHash+LSH candidate pairs at a chosen (k, bands)
    operating point — generated from the same hash_params(k) family as
    the Spark plan, so any point the engine exposes has an exact
    oracle."""
    return (
        _minhash_band_ctes(k, bands) + ", "
        "buckets AS (SELECT band, key FROM bands GROUP BY band, key "
        f"HAVING count(*) >= 2 AND count(*) <= {dd.MAX_BUCKET}), "
        "g AS (SELECT b.doc_id, b.band, b.key FROM bands b JOIN buckets USING (band, key)), "
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(count(DISTINCT a.band) AS BIGINT) AS n_bands "
        "FROM g a JOIN g b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id)"
    )


_PAIR_CTES = _minhash_pair_ctes()


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_candidate_pairs(_docs(spark, sf_dir))


SQL_DEDUP_MINHASH = (
    "WITH " + _PAIR_CTES + " SELECT doc_a, doc_b, n_bands FROM pairs"
)


def dedup_minhash_lsh_k128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sharp operating point (k=128, 16 bands of 8 rows): capture
    probability 1-(1-s^8)^16, a soft threshold near Jaccard 0.7 —
    a near-dup DETECTOR, vs the default (16, 8) high-recall SCREEN."""
    return dd.minhash_candidate_pairs(_docs(spark, sf_dir), k=128, bands=16)


SQL_DEDUP_MINHASH_K128 = (
    "WITH " + _minhash_pair_ctes(128, 16) + " SELECT doc_a, doc_b, n_bands FROM pairs"
)


def events_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase conversion funnel with real event
    sequencing (operators/timeseries.py funnel)."""
    from ..operators.timeseries import funnel

    return funnel(_events(spark, sf_dir))


SQL_EVENTS_FUNNEL = """
WITH b AS (SELECT user_id, event_type AS et, epoch_us(ts) AS us
           FROM events WHERE event_type IN ('view', 'click', 'purchase')),
w0 AS (SELECT *, min(CASE WHEN et = 'view' THEN us END)
         OVER (PARTITION BY user_id) AS t0 FROM b),
w1 AS (SELECT *, min(CASE WHEN et = 'click' AND us >= t0 THEN us END)
         OVER (PARTITION BY user_id) AS t1 FROM w0),
w2 AS (SELECT *, min(CASE WHEN et = 'purchase' AND us >= t1 THEN us END)
         OVER (PARTITION BY user_id) AS t2 FROM w1),
pu AS (SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
       FROM w2 GROUP BY user_id),
a AS (SELECT CAST(count(t0) AS BIGINT) AS n0, CAST(count(t1) AS BIGINT) AS n1,
             CAST(count(t2) AS BIGINT) AS n2 FROM pu)
SELECT 'view' AS stage, n0 AS n_users,
  CASE WHEN n0 > 0 THEN CAST(1.0 AS DOUBLE) END AS share FROM a
UNION ALL SELECT 'click', n1,
  CASE WHEN n0 > 0 THEN CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE) END FROM a
UNION ALL SELECT 'purchase', n2,
  CASE WHEN n0 > 0 THEN CAST(n2 AS DOUBLE) / CAST(n0 AS DOUBLE) END FROM a
"""


def snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff between two deterministic snapshot views of documents:
    old = ids not divisible by 7; new = ids not divisible by 5 with
    the text of every 11th id uppercased (a planted 'changed' set)
    (operators/warehouse.py snapshot_diff)."""
    from ..operators.warehouse import snapshot_diff

    d = _docs(spark, sf_dir)
    old = d.filter(F.col("doc_id") % 7 != 0)
    new = d.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.upper(F.col("text"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new, "doc_id", ["text", "lang", "source"])


_SD_HASH = (
    "md5(concat("
    "coalesce(md5(CAST({t} AS VARCHAR)), 'N'), "
    "coalesce(md5(CAST(lang AS VARCHAR)), 'N'), "
    "coalesce(md5(CAST(source AS VARCHAR)), 'N')))"
)

SQL_SNAPSHOT_DIFF = f"""
WITH o AS (SELECT doc_id AS key, {_SD_HASH.format(t='text')} AS old_hash
           FROM documents WHERE doc_id % 7 <> 0),
n AS (SELECT doc_id AS key,
        {_SD_HASH.format(t="CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END")}
          AS new_hash
      FROM documents WHERE doc_id % 5 <> 0),
j AS (SELECT coalesce(o.key, n.key) AS row_key,
        CASE WHEN o.old_hash IS NULL THEN 'added'
             WHEN n.new_hash IS NULL THEN 'removed'
             WHEN o.old_hash <> n.new_hash THEN 'changed' END AS change
      FROM o FULL OUTER JOIN n ON o.key = n.key)
SELECT row_key, change FROM j WHERE change IS NOT NULL
"""


def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest screen: the 20% batch (doc_id % 5 == 0) probed against
    the 80% existing corpus's band index plus itself
    (operators/dedup.py incremental_dup_flags)."""
    d = _docs(spark, sf_dir)
    return dd.incremental_dup_flags(
        d.filter(F.col("doc_id") % 5 != 0), d.filter(F.col("doc_id") % 5 == 0)
    )


SQL_DEDUP_INCREMENTAL = (
    "WITH " + _SH_CTES + ", "
    f"shb AS (SELECT doc_id, ({_BASE32_SQL}) AS b32 FROM sh), "
    "sig AS (SELECT doc_id, "
    + ", ".join(
        f"min(({a} * b32 + {b}) % {dd._MOD}) AS h{s}"
        for s, (a, b) in enumerate(dd.hash_params(dd.NUM_HASHES))
    )
    + " FROM shb GROUP BY doc_id), "
    "bands AS ("
    + " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || '_' || ".join(
                f"CAST(h{b * (dd.NUM_HASHES // dd.NUM_BANDS) + r} AS VARCHAR)"
                for r in range(dd.NUM_HASHES // dd.NUM_BANDS)
            ),
        )
        for b in range(dd.NUM_BANDS)
    )
    + "), "
    "ob AS (SELECT * FROM bands WHERE doc_id % 5 <> 0), "
    "nb AS (SELECT * FROM bands WHERE doc_id % 5 = 0), "
    "obg AS (SELECT b.* FROM ob b JOIN (SELECT band, key FROM ob "
    f"GROUP BY band, key HAVING count(*) <= {dd.MAX_BUCKET}) "
    "USING (band, key)), "
    "nbg AS (SELECT b.* FROM nb b JOIN (SELECT band, key FROM nb "
    f"GROUP BY band, key HAVING count(*) <= {dd.MAX_BUCKET}) "
    "USING (band, key)), "
    "vs AS (SELECT n.doc_id, o.doc_id AS partner FROM nbg n "
    "JOIN obg o USING (band, key) "
    "UNION ALL SELECT a.doc_id, b.doc_id FROM nbg a JOIN nbg b "
    "ON a.band = b.band AND a.key = b.key AND b.doc_id < a.doc_id) "
    "SELECT doc_id, min(partner) AS dup_of, "
    "CAST(count(DISTINCT partner) AS BIGINT) AS n_partners "
    "FROM vs GROUP BY doc_id"
)


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative connected components over the near-dup pair graph;
    oracle = transitive closure via recursive CTE."""
    return dd.neardup_components(_docs(spark, sf_dir))


SQL_DEDUP_COMPONENTS = (
    "WITH RECURSIVE " + _PAIR_CTES + ", "
    "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs), "
    "reach(src, dst) AS (SELECT src, dst FROM edges "
    "UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src) "
    "SELECT src AS doc_id, least(src, min(dst)) AS component_id "
    "FROM reach GROUP BY src"
)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return dd.ngram_jaccard(docs, dd.minhash_candidate_pairs(docs))


SQL_DEDUP_JACCARD = (
    "WITH " + _PAIR_CTES + ", "
    "sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id), "
    "inter AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_inter "
    "FROM pairs p JOIN sh a ON a.doc_id = p.doc_a "
    "JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle "
    "GROUP BY p.doc_a, p.doc_b) "
    "SELECT p.doc_a, p.doc_b, "
    "CAST(coalesce(i.n_inter, 0) AS DOUBLE) / "
    "CAST(sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0) AS DOUBLE) AS jaccard "
    "FROM pairs p "
    "LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b "
    "JOIN sz sa ON sa.doc_id = p.doc_a "
    "JOIN sz sb ON sb.doc_id = p.doc_b"
)

# SimHash: 32-bit hash from md5 hex via digit arithmetic (works in
# both engines; Spark uses conv(), the oracle expands the digit sum).
_SIMHASH_BITS = 32
_HEXVAL = "(strpos('0123456789abcdef', substr(md5(term), {i}, 1)) - 1)"
_HEX_SUM = " + ".join(
    _HEXVAL.format(i=i + 1) + f" * {16 ** (8 - i - 1)}" for i in range(8)
)
_BIT_SUMS = ", ".join(
    f"sum(2 * ((h // {2 ** j}) % 2) - 1) AS s{j}" for j in range(_SIMHASH_BITS)
)
_BIT_RECOMBINE = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)"
    for j in range(_SIMHASH_BITS)
)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash(_toks(spark, sf_dir).select("doc_id", "term"))


SQL_DEDUP_SIMHASH = with_text_ctes(
    f"hh AS (SELECT doc_id, ({_HEX_SUM}) AS h FROM toks), "
    f"s AS (SELECT doc_id, {_BIT_SUMS} FROM hh GROUP BY doc_id)"
) + f" SELECT doc_id, CAST({_BIT_RECOMBINE} AS BIGINT) AS simhash FROM s"


# =========================================================================
# Similarity search
# =========================================================================

def _dot_sql(a: str, b: str, dim: int = ss.DIM) -> str:
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_dot_sql(a, b)}) / "
        f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    )


def simsearch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ss.cosine_topk(_emb(spark, sf_dir))


SQL_SIMSEARCH_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id, {_cos_sql('q.q_emb', 'e.embedding')} AS cos
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
r AS (SELECT query_id, vec_id, cos,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored)
SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5
"""


def embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ss.cosine_neardup_pairs(_emb(spark, sf_dir))


_BUCKET_SQL = " + ".join(
    "(CASE WHEN ({dot}) > 0 THEN {pw} ELSE 0 END)".format(
        dot=" + ".join(
            f"CAST(embedding[{d + 1}] AS DOUBLE) * {float(s)}"
            for d, s in enumerate(plane)
        ),
        pw=2**p,
    )
    for p, plane in enumerate(ss.HYPERPLANES)
)


# Near-dup pairs blocked on the size-guarded LSH bucket (mirrors
# operators/simsearch.py cosine_neardup_pairs).
SQL_EMBED_NEARDUP = f"""
WITH wb AS (SELECT vec_id, embedding, CAST({_BUCKET_SQL} AS BIGINT) AS bucket FROM embeddings),
g AS (SELECT wb.* FROM wb WHERE bucket IN (
  SELECT bucket FROM wb GROUP BY bucket
  HAVING count(*) >= 2 AND count(*) <= {ss.NEARDUP_MAX_BUCKET}))
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_cos_sql('a.embedding', 'b.embedding')} AS cos
FROM g a JOIN g b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.3
"""


def simsearch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ss.lsh_buckets(_emb(spark, sf_dir))


SQL_SIMSEARCH_LSH = (
    f"SELECT vec_id, CAST({_BUCKET_SQL} AS BIGINT) AS bucket FROM embeddings"
)


def simsearch_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ss.lsh_topk(_emb(spark, sf_dir))


SQL_SIMSEARCH_LSH_TOPK = f"""
WITH wb AS (SELECT vec_id, embedding, CAST({_BUCKET_SQL} AS BIGINT) AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM wb WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id, {_cos_sql('q.q_emb', 'e.embedding')} AS cos
  FROM wb e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> q.query_id),
r AS (SELECT query_id, vec_id, cos,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored)
SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5
"""


# =========================================================================
# Text analysis
# =========================================================================

def array_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar surface over the embedding column: size, element
    access, explicit element arithmetic (kept engine-portable: no
    engine-specific list aggregates)."""
    e = F.col("embedding")
    el = lambda i: F.element_at(e, i).cast("double")  # noqa: E731
    return _emb(spark, sf_dir).select(
        "vec_id",
        F.size(e).alias("dim"),
        el(1).alias("e1"),
        (el(1) + el(2) + el(3) + el(4)).alias("sum4"),
        F.sqrt(
            el(1) * el(1) + el(2) * el(2) + el(3) * el(3) + el(4) * el(4)
        ).alias("norm4"),
    )


SQL_ARRAY_SCALARS = """
SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
  CAST(embedding[1] AS DOUBLE) AS e1,
  CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
    + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS sum4,
  sqrt(CAST(embedding[1] AS DOUBLE) * CAST(embedding[1] AS DOUBLE)
    + CAST(embedding[2] AS DOUBLE) * CAST(embedding[2] AS DOUBLE)
    + CAST(embedding[3] AS DOUBLE) * CAST(embedding[3] AS DOUBLE)
    + CAST(embedding[4] AS DOUBLE) * CAST(embedding[4] AS DOUBLE)) AS norm4
FROM embeddings
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame: per event_type, sum of the last 600
    seconds of value-cents at each event (RANGE, not ROWS — frame
    bounds are value-based, deterministic under any row order)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("sec")
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "event_id", "event_type", F.sum("cents").over(w).alias("sum_600s")
    )


SQL_WINDOW_RANGE = """
SELECT event_id, event_type,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
    PARTITION BY event_type ORDER BY CAST(epoch_us(ts) // 1000000 AS BIGINT)
    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_600s
FROM events
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.lang_id(_docs(spark, sf_dir))


_PROFILE_VALUES = ", ".join(
    f"('{lang}', '{w}')"
    for lang, ws in sorted(tx.LANG_PROFILES.items())
    for w in ws
)

SQL_LANG_ID = f"""
WITH words AS (
  SELECT doc_id, u.w FROM (
    SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS arr
    FROM documents) t, UNNEST(arr) AS u(w)),
profiles AS (SELECT * FROM (VALUES {_PROFILE_VALUES}) AS t(lang, w)),
hits AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS score
         FROM words JOIN profiles USING (w) GROUP BY doc_id, lang),
best AS (SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
         FROM hits)
SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang,
       CAST(coalesce(b.score, 0) AS BIGINT) AS score
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.quality_score(_docs(spark, sf_dir))


_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

SQL_QUALITY = f"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS arr
  FROM documents),
m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        CAST(len(arr) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(arr, x -> list_contains({_STOP_LIST}, x))) AS BIGINT) AS n_stop,
        CAST(len(list_distinct(arr)) AS BIGINT) AS n_distinct
      FROM t)
SELECT doc_id, n_chars, n_tokens, n_distinct,
  CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stop_ratio,
  CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS ttr,
  (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END)
  + (CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) AS score
FROM m
"""


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_count(_docs(spark, sf_dir))


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_ws,
  CAST(len(regexp_extract_all(lower(text), '{tx.BPE_REGEX}')) AS BIGINT) AS n_bpe
FROM documents
"""


def tfidf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over the canonical term stream (with multiplicity) —
    generalizes the χ² feature-selection skeleton (same two shuffles:
    (doc,term) agg + per-term window). n_docs rides along as a 1-row
    broadcast aggregate (ONE job, no extra corpus scan)."""
    from ..functions.text import nonempty_documents, terms_with_multiplicity

    d = _docs(spark, sf_dir).selectExpr("doc_id", "text", "lang AS category")
    n_docs_df = nonempty_documents(d).agg(F.count("*").alias("n_docs"))
    return tx.tfidf(terms_with_multiplicity(d, STOPWORDS), n_docs_df)


_TOKM_CTE = (
    "tokm AS (SELECT docs.doc_id, docs.category, u.term "
    "FROM docs, UNNEST(regexp_split_to_array(docs.text, '{d}')) AS u(term) "
    "WHERE length(u.term) >= {lo} AND length(u.term) <= {hi} "
    "AND u.term NOT IN ({stops}))"
)

SQL_TFIDF = (
    "WITH docs AS (SELECT doc_id, lang AS category, lower(text) AS text "
    "FROM documents WHERE text IS NOT NULL AND text <> '' "
    "AND lang IS NOT NULL AND lang <> ''), "
    + _TOKM_CTE.format(
        d=SQL_DELIM,
        lo=MIN_TOKEN_LEN,
        hi=MAX_TOKEN_LEN,
        stops=SQL_STOPWORDS,
    )
    + ", tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
    "FROM tokm GROUP BY doc_id, term), "
    "df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term), "
    "n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs) "
    "SELECT t.doc_id, t.term, t.tf, d.df, "
    "CAST(t.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS tfidf "
    "FROM tf t JOIN df d USING (term) CROSS JOIN n"
)


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.doc_fingerprint(_docs(spark, sf_dir))


SQL_FINGERPRINT = """
WITH lt AS (SELECT doc_id, lower(text) AS t FROM documents),
g AS (SELECT doc_id, min(md5(substr(t, CAST(i AS INTEGER), 5))) AS mg
      FROM lt, UNNEST(range(1, length(t) - 3)) AS r(i) GROUP BY doc_id)
SELECT lt.doc_id, md5(t) AS content_md5, coalesce(g.mg, md5(t)) AS min_gram_hash
FROM lt LEFT JOIN g USING (doc_id)
"""


# =========================================================================
# Event-time windows (batch) + streaming twin + as-of join
# =========================================================================

def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "600 seconds"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


SQL_WINDOW_TUMBLING = """
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start, event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
"""


def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "600 seconds", "300 seconds"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


SQL_WINDOW_SLIDING = """
WITH b AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS s0 FROM events),
w AS (SELECT event_type, cents, s0 AS win_start FROM b
      UNION ALL
      SELECT event_type, cents, s0 - 300 FROM b)
SELECT win_start, event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM w GROUP BY 1, 2
"""


def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "300 seconds"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("sess_start"),
            "n_events",
        )
    )


SQL_WINDOW_SESSION = """
WITH l AS (
  SELECT user_id, ts,
    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 300000000
    THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (SELECT user_id, ts,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM l)
SELECT user_id, CAST(epoch_us(min(ts)) // 1000000 AS BIGINT) AS sess_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
"""


def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment with a multi-column payload: each
    purchase pulls the latest preceding click's timestamp AND event id.

    Both join sides live in the SAME events table, so the rows are
    tagged in one projection over ONE scan (asof_from_tagged) — no
    second scan, no union. Duplicate point-in-time keys are resolved
    to max event_id via dedupe_right_ties (the payload struct is
    (click_us, click_event); click_us is constant within a tie, so
    greatest-struct = max event_id), riding the sort the union-merge
    already pays for instead of a groupBy pre-dedup — net plan: one
    scan, one shuffle."""
    is_click = F.col("event_type") == "click"
    merged = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(is_click, F.lit(0)).otherwise(F.lit(1)).alias("_side"),
            F.when(
                is_click,
                F.struct(
                    F.unix_micros("ts").alias("click_us"),
                    F.col("event_id").alias("click_event"),
                ),
            ).alias("_rp"),
        )
    )
    return asof_from_tagged(
        merged,
        "user_id",
        "ts",
        ["click_us", "click_event"],
        ["event_id", "user_id"],
        dedupe_right_ties=True,
    )


SQL_ASOF = """
SELECT p.event_id, p.user_id, epoch_us(c.ts) AS asof_click_us,
       c.click_event AS asof_click_event
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS click_event
                FROM events WHERE event_type = 'click'
                GROUP BY user_id, ts) c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


ASOF_TOLERANCE_US = 30 * 60 * 1_000_000  # 30 min, pandas merge_asof-style


def asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (pandas merge_asof
    `tolerance`): matches older than 30 minutes are nulled out.
    Composes as a pure post-projection on the tolerance predicate —
    the matched right-side timestamp is already in the carried payload
    struct, so no second window or join is needed; both payload
    columns null together, preserving same-matched-row consistency."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.unix_micros("ts").alias("click_us"),
        F.col("event_id").alias("click_event"),
    )
    j = asof_join(
        purchases,
        clicks,
        "user_id",
        "ts",
        ["click_us", "click_event"],
        dedupe_right_ties=True,
    )
    ok = (
        F.unix_micros("ts") - F.col("asof_click_us")
    ) <= F.lit(ASOF_TOLERANCE_US)
    return j.select(
        "event_id",
        "user_id",
        F.when(ok, F.col("asof_click_us")).alias("asof_click_us"),
        F.when(ok, F.col("asof_click_event")).alias("asof_click_event"),
    )


SQL_ASOF_TOLERANCE = f"""
SELECT p.event_id, p.user_id,
  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {ASOF_TOLERANCE_US}
       THEN epoch_us(c.ts) END AS asof_click_us,
  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {ASOF_TOLERANCE_US}
       THEN c.click_event END AS asof_click_event
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS click_event
                FROM events WHERE event_type = 'click'
                GROUP BY user_id, ts) c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


def asof_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time attribution: each purchase pulls its CLOSEST
    click in either direction (ties -> the earlier one), vs asof_join's
    backward-only match. Both sides live in the events table, so rows
    are tagged in one projection over ONE scan
    (operators/asof.py asof_nearest_from_tagged)."""
    from ..operators.asof import asof_nearest_from_tagged

    is_click = F.col("event_type") == "click"
    merged = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.when(is_click, F.lit(0)).otherwise(F.lit(1)).alias("_side"),
            F.when(
                is_click,
                F.struct(
                    F.unix_micros("ts").cast("long").alias("__rts"),
                    F.col("event_id").alias("click_event"),
                ),
            ).alias("_rp"),
        )
    )
    return asof_nearest_from_tagged(
        merged, "user_id", "us", ["click_event"],
        ["event_id", "user_id", "us"],
    )


SQL_ASOF_NEAREST = """
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, epoch_us(ts) AS us, max(event_id) AS click_event
      FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)),
b AS (SELECT p.event_id, c.us AS bus, c.click_event AS bev
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.us <= p.us),
f AS (SELECT p.event_id, c.us AS fus, c.click_event AS fev
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.us >= p.us)
SELECT p.event_id, p.user_id, p.us,
  CASE WHEN fus IS NULL OR (bus IS NOT NULL AND (p.us - bus) <= (fus - p.us))
       THEN bus ELSE fus END AS nearest_ts,
  CASE WHEN fus IS NULL OR (bus IS NOT NULL AND (p.us - bus) <= (fus - p.us))
       THEN bev ELSE fev END AS nearest_click_event
FROM p JOIN b USING (event_id) JOIN f USING (event_id)
"""


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join as an equi-join: clicks landing in the 10-minute
    window before each purchase, counted per purchase. The bucketed
    rewrite (operators/rangejoin.py) keeps the plan a shuffled
    equi-join — a naive BETWEEN join would be a nested-loop product."""
    from ..operators.rangejoin import interval_point_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("end_us")
    )
    intervals = purchases.withColumn(
        "start_us", F.col("end_us") - F.lit(600_000_000)
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("c_us")
    )
    matched = interval_point_join(
        intervals, clicks, "user_id", "start_us", "end_us", "c_us",
        bucket_width_us=600_000_000,
    )
    counts = matched.groupBy("event_id").agg(
        F.count("*").alias("n_clicks_10m")
    )
    return (
        purchases.select("event_id", "user_id")
        .join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("n_clicks_10m"), F.lit(0).cast("long")).alias(
                "n_clicks_10m"
            ),
        )
    )


SQL_JOIN_RANGE = """
SELECT p.event_id, p.user_id, CAST(count(c.c_us) AS BIGINT) AS n_clicks_10m
FROM (SELECT event_id, user_id, epoch_us(ts) AS end_us FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, epoch_us(ts) AS c_us FROM events
           WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.c_us >= p.end_us - 600000000
 AND c.c_us <= p.end_us
GROUP BY p.event_id, p.user_id
"""


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts_stream(spark, sf_dir)


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark); emits
    the distinct (user_id, event_type) key set — batch DISTINCT is
    the oracle."""
    from ..streaming.windows import dedup_stream

    return dedup_stream(spark, sf_dir)


SQL_STREAM_DEDUP = "SELECT DISTINCT user_id, event_type FROM events"


def stream_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental χ²: per-micro-batch partial counts merged via
    foreachBatch — exact parity with the one-shot batch oracle."""
    from ..streaming.chisquare_stream import incremental_chi_square

    return incremental_chi_square(spark, sf_dir)


SQL_STREAM_CHI = with_text_ctes(CHI2_CTES) + (
    " SELECT category, term, chi2 FROM chi"
)


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) run to
    completion; per-user end-of-stream sentinels make it exactly equal
    to the batch session-window oracle."""
    from ..streaming.sessionize import sessionize_to_completion

    return sessionize_to_completion(spark, sf_dir)


# =========================================================================
# Multimodal plumbing
# =========================================================================

def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = binarize_documents(_docs(spark, sf_dir))
    return media.select(
        "doc_id",
        "kind",
        "n_bytes",
        F.md5(F.col("payload")).alias("content_md5"),
    )


SQL_MULTIMODAL_META = """
SELECT doc_id,
  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS content_md5
FROM documents
"""


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # use_codec=False: payloads are utf-8 text stand-ins and the
    # DuckDB twin mirrors the fake decoder's metadata formulas; the
    # real-codec path is pinned by tests/test_multimodal.py instead.
    return decode_documents(
        binarize_documents(_docs(spark, sf_dir)), use_codec=False
    )


SQL_MULTIMODAL_DECODE = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(16 + (CASE WHEN length(text) = 0 THEN 0 ELSE ascii(substr(text, 1, 1)) END) % 16 AS INTEGER) AS width,
  CAST(16 + octet_length(encode(text)) % 16 AS INTEGER) AS height,
  CAST(1 + doc_id % 8 AS INTEGER) AS n_frames
FROM documents
"""


# --- IVF with a real k-means fit -----------------------------------------
# The oracle replays the SAME seeded Lloyd iterations as
# operators/simsearch.py kmeans_centroids as a generated CTE chain:
# init c0 = embeddings of vec_id < k; per round, argmax-cosine
# assignment then per-cluster means from integer-quantized dimension
# sums (round(x*2^20) as BIGINT — exact and order-independent, so both
# engines compute bit-identical centroid doubles). Empty clusters keep
# the previous centroid (LEFT JOIN + CASE).

def _km_assign_ctes(cents_cte: str, out: str, src: str = "embeddings") -> str:
    """Assignment CTE pair: score every vector of `src` against
    `cents_cte`, keep the argmax (ties to lowest centroid_id) as
    `out`."""
    return (
        f"{out}s AS (SELECT e.vec_id, e.embedding, c.centroid_id, "
        f"{_cos_sql('e.embedding', 'c.c_emb')} AS cos "
        f"FROM {src} e CROSS JOIN {cents_cte} c), "
        f"{out} AS (SELECT vec_id, embedding, centroid_id FROM ("
        f"SELECT vec_id, embedding, centroid_id, row_number() OVER "
        f"(PARTITION BY vec_id ORDER BY cos DESC, centroid_id ASC) AS rn "
        f"FROM {out}s) WHERE rn = 1)"
    )


_KM_SUM_COLS = ", ".join(
    f"sum(CAST(round(CAST(embedding[{d + 1}] AS DOUBLE) * 1048576.0) AS BIGINT)) AS s{d}"
    for d in range(ss.DIM)
)
_KM_MEAN_LIST = (
    "["
    + ", ".join(
        f"CAST(m.s{d} AS DOUBLE) / (1048576.0 * CAST(m.n AS DOUBLE))"
        for d in range(ss.DIM)
    )
    + "]"
)


def _km_cent_ctes() -> str:
    """The Lloyd-fit CTE chain alone: c0 .. c{ITERS} centroid
    relations, no final corpus assignment — for queries that assign a
    DIFFERENT relation (e.g. a clone-augmented corpus) against the
    base-table fit."""
    parts = [
        # seed = the k SMALLEST vec_ids (ORDER BY .. LIMIT), matching
        # kmeans_centroids' TakeOrdered seed on ANY id space — the old
        # `vec_id < k` form was identical only on dense 0-based ids
        # and would silently diverge on a sparse-id fixture
        "c0 AS (SELECT vec_id AS centroid_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c_emb "
        "FROM (SELECT vec_id, embedding FROM embeddings "
        f"ORDER BY vec_id LIMIT {ss.N_CENTROIDS}))"
    ]
    for t in range(ss.KMEANS_ITERS):
        parts.append(_km_assign_ctes(f"c{t}", f"a{t + 1}"))
        parts.append(
            f"m{t + 1} AS (SELECT centroid_id, count(*) AS n, {_KM_SUM_COLS} "
            f"FROM a{t + 1} GROUP BY centroid_id)"
        )
        parts.append(
            f"c{t + 1} AS (SELECT c.centroid_id, "
            f"CASE WHEN m.n IS NULL THEN c.c_emb ELSE {_KM_MEAN_LIST} END AS c_emb "
            f"FROM c{t} c LEFT JOIN m{t + 1} m USING (centroid_id))"
        )
    return ", ".join(parts)


def _km_ctes() -> str:
    return ", ".join(
        [
            _km_cent_ctes(),
            _km_assign_ctes(f"c{ss.KMEANS_ITERS}", "asg"),
        ]
    )


_IVF_ASG_CTES = _km_ctes()


# The Lloyd fit is deterministic per dataset — cache per sf_dir so the
# assign and topk queries (and repeated runs in one session) share one
# fit instead of re-running the iteration jobs.
_KM_CACHE: dict[str, list[list[float]]] = {}


def _km_cents(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    if sf_dir not in _KM_CACHE:
        _KM_CACHE[sf_dir] = ss.kmeans_centroids(_emb(spark, sf_dir))
    return _KM_CACHE[sf_dir]


def simsearch_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ss.ivf_assign(_emb(spark, sf_dir), cents=_km_cents(spark, sf_dir))


SQL_IVF_ASSIGN = (
    "WITH " + _IVF_ASG_CTES + " SELECT vec_id, centroid_id FROM asg"
)


def simsearch_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ss.ivf_topk(_emb(spark, sf_dir), cents=_km_cents(spark, sf_dir))


SQL_IVF_TOPK = (
    "WITH " + _IVF_ASG_CTES + ", "
    "q AS (SELECT vec_id AS query_id, embedding AS q_emb, centroid_id "
    "FROM asg WHERE vec_id < 8), "
    f"scored AS (SELECT q.query_id, e.vec_id, "
    f"{_cos_sql('q.q_emb', 'e.embedding')} AS cos "
    "FROM asg e JOIN q USING (centroid_id) WHERE e.vec_id <> q.query_id), "
    "r AS (SELECT query_id, vec_id, cos, CAST(row_number() OVER "
    "(PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank "
    "FROM scored) "
    "SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5"
)


def dedup_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdicts (operators/simsearch.py semantic_dedup) over
    a clone-augmented corpus: the synthetic embeddings are near-random
    (max within-cluster cosine ~0.51, far below any semantic-dup
    threshold), so the query unions in a copy of every 20th vector
    with dimension 1 perturbed by +0.001 — the scale-stress clone
    pattern — giving 25 real planted duplicate groups the keep-rule
    must drop (is_kept = false, dup_of = the base vec_id) while every
    base row survives. Centroids come from the shared base-table
    Lloyd fit (_km_cents — the production shape: fit on the corpus,
    assign anything against it), mirrored CTE-for-CTE in the oracle;
    all clone arithmetic is CAST-to-double + one exact double add, so
    both engines see bit-identical vectors."""
    emb = _emb(spark, sf_dir)
    e = F.col("embedding")
    base = emb.select(
        "vec_id",
        F.transform(e, lambda x: x.cast("double")).alias("embedding"),
    )
    clones = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.concat(
            F.array(F.element_at(e, 1).cast("double") + F.lit(0.001)),
            F.transform(
                F.slice(e, 2, ss.DIM - 1), lambda x: x.cast("double")
            ),
        ).alias("embedding"),
    )
    return ss.semantic_dedup(
        base.unionByName(clones), cents=_km_cents(spark, sf_dir)
    )


SQL_DEDUP_SEMANTIC = (
    "WITH "
    + _km_cent_ctes()
    + ", embx AS ("
    "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) "
    "AS embedding FROM embeddings "
    "UNION ALL "
    "SELECT vec_id + 1000000, "
    "[CAST(embedding[1] AS DOUBLE) + 0.001] || "
    "list_transform(embedding[2:], x -> CAST(x AS DOUBLE)) "
    "FROM embeddings WHERE vec_id % 20 = 0), "
    + _km_assign_ctes(f"c{ss.KMEANS_ITERS}", "sda", src="embx")
    # cos projected ONCE per pair: inlining _cos_sql in both the
    # WHERE and the max() would evaluate the 64-term fold twice
    # (DuckDB does not CSE across predicate and aggregate)
    + ", sdp AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, "
    f"{_cos_sql('a.embedding', 'b.embedding')} AS cos "
    "FROM sda a JOIN sda b "
    "ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id), "
    "hits AS (SELECT b_id, min(a_id) AS dup_of, max(cos) AS max_cos "
    "FROM sdp WHERE cos >= 0.92 GROUP BY b_id) "
    "SELECT e.vec_id, e.centroid_id, h.dup_of IS NULL AS is_kept, "
    "h.dup_of, h.max_cos "
    "FROM sda e LEFT JOIN hits h ON e.vec_id = h.b_id"
)


def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization surfaced with a scalar output shape: the
    quantized vector is emitted as a comma-joined string so every
    result column is hashable/sortable by any canonicalizer (the
    round-3 driver choked sorting a raw array<int> column). The
    library operator (simsearch.quantize_int8) still returns the
    typed array; only this registry surface flattens."""
    q = ss.quantize_int8(_emb(spark, sf_dir))
    return q.select(
        "vec_id",
        F.concat_ws(",", F.col("q_embedding").cast("array<string>")).alias(
            "q_csv"
        ),
    )


SQL_EMBED_QUANTIZE = """
SELECT vec_id,
  array_to_string(list_transform(embedding,
    x -> CAST(greatest(-127, least(127, round(CAST(x AS DOUBLE) * 127))) AS INTEGER)
  ), ',') AS q_csv
FROM embeddings
"""


def simsearch_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas_udf (Arrow/numpy) variant of brute-force cosine
    top-k; same oracle as the Catalyst-expression version."""
    return ss.cosine_topk_pandas(_emb(spark, sf_dir))


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(binarize_documents(_docs(spark, sf_dir)))


SQL_MULTIMODAL_FRAMES = """
SELECT doc_id, CAST(u.i AS BIGINT) AS frame_idx,
       md5(text || ':' || CAST(u.i AS VARCHAR)) AS frame_md5
FROM documents, UNNEST(range(0, 1 + doc_id % 8)) AS u(i)
"""


def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation, operators composed in ONE
    DataFrame plan: quality gate (token count + stop ratio) → exact
    dedup (keep min doc_id per content hash) → deterministic 50%
    content-hash sample. The shape every 100 TB corpus pass takes:
    map-side metrics feed a filter, one shuffle for the dedup, no
    driver round-trips between stages. The gate is an inline scan
    predicate (tx.quality_gate) — the corpus is read ONCE; the earlier
    join-back against a quality_score relation read it twice."""
    docs = tx.quality_gate(_docs(spark, sf_dir))
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    sampled = deduped.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        < F.lit("8")
    )
    return sampled.select("doc_id", "lang", F.length("text").alias("n_chars"))


SQL_PIPELINE_CURATION = """
WITH q AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS n_tokens,
    CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) > 0
      THEN CAST(len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''),
                x -> list_contains({stops}, x))) AS DOUBLE)
         / CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS DOUBLE)
      ELSE 0.0 END AS stop_ratio
  FROM documents),
kept AS (
  SELECT d.* FROM documents d JOIN q USING (doc_id)
  WHERE q.n_tokens >= 5 AND q.stop_ratio <= 0.6),
dedup AS (
  SELECT * FROM (
    SELECT d.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept d) WHERE rn = 1)
SELECT doc_id, lang, CAST(length(text) AS INTEGER) AS n_chars
FROM dedup
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
"""

SQL_PIPELINE_CURATION = SQL_PIPELINE_CURATION.format(stops=_STOP_LIST)


# =========================================================================
# Curation: decontamination, repetition, PII, per-source quotas, CSV
# =========================================================================

def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.decontaminate(_docs(spark, sf_dir))


SQL_DECONTAMINATE = (
    "WITH " + _sh_ctes_n(cu.DECONTAM_SHINGLE_N) + ", "
    "ev AS (SELECT DISTINCT s.shingle FROM sh s "
    "JOIN documents d USING (doc_id) WHERE d.source = 'src0'), "
    "tr AS (SELECT s.doc_id, s.shingle FROM sh s "
    "JOIN documents d USING (doc_id) WHERE d.source <> 'src0') "
    "SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_overlap "
    "FROM tr JOIN ev USING (shingle) "
    f"GROUP BY tr.doc_id HAVING count(*) >= {cu.MIN_OVERLAP}"
)


def repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.repetition_metrics(_docs(spark, sf_dir))


SQL_REPETITION = """
WITH b AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS arr
  FROM documents),
g AS (
  SELECT doc_id, arr,
    CASE WHEN len(arr) >= 3
      THEN list_transform(range(1, len(arr) - 1),
             i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])
      ELSE [] END AS g3
  FROM b),
s AS (
  SELECT doc_id,
    CAST(len(arr) AS INTEGER) AS n_tokens,
    CAST(len(list_distinct(arr)) AS INTEGER) AS nd,
    CAST(len(g3) AS INTEGER) AS ng,
    CAST(len(list_distinct(g3)) AS INTEGER) AS ndg,
    u.w AS w
  FROM g, UNNEST(arr) AS u(w)),
c AS (
  SELECT doc_id, n_tokens, nd, ng, ndg, w, count(*) AS cnt
  FROM s GROUP BY doc_id, n_tokens, nd, ng, ndg, w),
m AS (
  SELECT doc_id, n_tokens, nd, ng, ndg, max(cnt) AS top
  FROM c GROUP BY doc_id, n_tokens, nd, ng, ndg)
SELECT doc_id, n_tokens,
  1.0 - CAST(nd AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_token_ratio,
  CASE WHEN ng > 0 THEN 1.0 - CAST(ndg AS DOUBLE) / CAST(ng AS DOUBLE)
       ELSE 0.0 END AS dup_3gram_ratio,
  CAST(top AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_share
FROM m
"""


def pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver corpus carries no natural PII, so inject a
    deterministic email + 10-digit id per document (mirrored in the
    oracle) and redact — the redaction expressions are the operator
    under test; the injection is visible test harness on both sides."""
    docs = _docs(spark, sf_dir)
    pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ref "),
        (F.col("doc_id") + F.lit(1234567890)).cast("string"),
    )
    return cu.redact_pii(docs.select("doc_id", pii.alias("text")))


SQL_PII_REDACT = """
WITH p AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@mail.example.com ref ' || CAST(doc_id + 1234567890 AS VARCHAR)
      AS pii
  FROM documents),
e AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(pii, '{email}')) AS INTEGER) AS n_emails,
    regexp_replace(pii, '{email}', '<EMAIL>', 'g') AS after_email
  FROM p)
SELECT doc_id,
  regexp_replace(after_email, '{digits}', '<NUM>', 'g') AS clean_text,
  n_emails,
  CAST(len(regexp_extract_all(after_email, '{digits}')) AS INTEGER) AS n_numbers
FROM e
""".format(email=cu.EMAIL_REGEX, digits=cu.LONG_DIGITS_REGEX)


def sample_per_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.sample_per_source(_docs(spark, sf_dir))


SQL_SAMPLE_PER_SOURCE = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (
      PARTITION BY source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= 5
"""


def winsorize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length clipping to the [p05, p95] exact
    interpolated percentiles — the outlier-clipping pass before
    training. Stats aggregate + broadcast join + map-side clip; the
    corpus is never shuffled."""
    return cu.winsorize(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        "n_chars",
        "lang",
    )


SQL_WINSORIZE = """
WITH s AS (
  SELECT lang,
         quantile_cont(n_chars, 0.05) AS lo,
         quantile_cont(n_chars, 0.95) AS hi
  FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars,
       greatest(s.lo, least(s.hi, CAST(d.n_chars AS DOUBLE))) AS n_chars_wins,
       (CAST(d.n_chars AS DOUBLE) < s.lo OR CAST(d.n_chars AS DOUBLE) > s.hi)
         AS was_clipped
FROM documents d JOIN s USING (lang)
"""


def scan_csv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV twin of scan_json: schema-pinned PERMISSIVE scan of real
    CSV bytes with malformed rows injected; the null filter drops
    exactly the injected rows, so parity against the parquet source
    proves the tolerant parse."""
    from ..sources.readers import scan_csv_documents

    df = scan_csv_documents(spark, sf_dir)
    return df.filter(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
        & (F.col("text") != "")
        & F.col("lang").isNotNull()
        & (F.col("lang") != "")
    )


SQL_SCAN_CSV = (
    "SELECT doc_id, text, lang FROM documents "
    "WHERE doc_id IS NOT NULL AND text IS NOT NULL AND text <> '' "
    "AND lang IS NOT NULL AND lang <> ''"
)


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import attribution_to_completion

    return attribution_to_completion(spark, sf_dir)


SQL_STREAM_INTERVAL_JOIN = """
SELECT c.event_id AS click_id, v.event_id AS view_id,
       c.user_id AS user_id,
       (epoch_us(c.ts) - epoch_us(v.ts)) AS lag_us
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND epoch_us(c.ts) >= epoch_us(v.ts)
 AND epoch_us(c.ts) < epoch_us(v.ts) + 600000000
"""


# =========================================================================
# Time series, warehouse maintenance, embedding stats, stream enrich
# =========================================================================

def resample_ffill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import resample_ffill

    return resample_ffill(_events(spark, sf_dir))


SQL_RESAMPLE_FFILL = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS us, value,
         (epoch_us(ts) // 1000000 // 3600) * 3600 AS h
  FROM events WHERE user_id < 40),
lv AS (
  SELECT user_id, h, value FROM (
    SELECT user_id, h, value,
      row_number() OVER (PARTITION BY user_id, h
                         ORDER BY us DESC, value DESC) AS rn
    FROM o) t WHERE rn = 1),
n AS (
  SELECT user_id, h, CAST(count(*) AS BIGINT) AS n_events
  FROM o GROUP BY user_id, h),
sp AS (
  SELECT user_id, unnest(generate_series(h0, h1, 3600)) AS h
  FROM (SELECT user_id, min(h) AS h0, max(h) AS h1
        FROM o GROUP BY user_id) t)
SELECT sp.user_id, sp.h AS hour_start,
  coalesce(n.n_events, 0) AS n_events,
  last_value(lv.value IGNORE NULLS) OVER (
    PARTITION BY sp.user_id ORDER BY sp.h) AS value_ffill
FROM sp
LEFT JOIN lv ON sp.user_id = lv.user_id AND sp.h = lv.h
LEFT JOIN n  ON sp.user_id = n.user_id  AND sp.h = n.h
"""


_DQ_COLUMNS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]


def dq_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.warehouse import dq_profile

    return dq_profile(
        scan_parquet(spark, sf_dir, "orders"), _DQ_COLUMNS
    )


def _dq_sql() -> str:
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    parts = []
    for c in _DQ_COLUMNS:
        # the non-numeric branch still needs an aggregate wrapper or
        # the SELECT degenerates to one row per input row
        mm_min = (
            f"CAST(min({c}) AS DOUBLE)"
            if c in numeric
            else "max(CAST(NULL AS DOUBLE))"
        )
        mm_max = (
            f"CAST(max({c}) AS DOUBLE)"
            if c in numeric
            else "max(CAST(NULL AS DOUBLE))"
        )
        # distinct_est_ok mirrors the Spark side's self-check: each
        # engine's OWN approximate-distinct estimate within 5% of its
        # OWN exact count (estimates are engine-specific, the flag is
        # the engine-independent contract).
        parts += [
            f"SELECT '{c}' AS \"column\", 'rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM orders",
            f"SELECT '{c}', 'nulls', CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM orders",
            f"SELECT '{c}', 'distinct', CAST(count(DISTINCT {c}) AS DOUBLE) FROM orders",
            f"SELECT '{c}', 'distinct_est_ok', CASE WHEN abs(CAST(approx_count_distinct({c}) AS DOUBLE) - count(DISTINCT {c})) <= 0.05 * count(DISTINCT {c}) THEN 1.0 ELSE 0.0 END FROM orders",
            f"SELECT '{c}', 'min', {mm_min} FROM orders",
            f"SELECT '{c}', 'max', {mm_max} FROM orders",
        ]
    return " UNION ALL ".join(parts)


SQL_DQ_PROFILE = _dq_sql()


def scd2_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Updates derived deterministically from the dimension itself:
    custkey % 7 == 0 -> balance change; % 13 (and not % 7) -> touched
    but unchanged; % 31 -> new key (custkey + 10000). Exercises every
    merge branch with no side fixture."""
    from ..operators.warehouse import scd2_merge

    cust = scan_parquet(spark, sf_dir, "customer")
    changed = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal")
    )
    untouched = cust.filter(
        (F.col("c_custkey") % 13 == 0) & (F.col("c_custkey") % 7 != 0)
    ).select("c_custkey", "c_acctbal")
    inserts = cust.filter(F.col("c_custkey") % 31 == 0).select(
        (F.col("c_custkey") + F.lit(10000)).alias("c_custkey"), "c_acctbal"
    )
    updates = changed.unionByName(untouched).unionByName(inserts)
    return scd2_merge(cust, updates, "c_custkey", "c_acctbal")


SQL_SCD2_MERGE = """
WITH u AS (
  SELECT c_custkey AS k, c_acctbal + 100.0 AS new_v FROM customer
  WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_custkey % 13 = 0 AND c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey + 10000, c_acctbal FROM customer
  WHERE c_custkey % 31 = 0),
b AS (SELECT c_custkey AS k, c_acctbal AS old_v FROM customer),
j AS (SELECT coalesce(b.k, u.k) AS k, old_v, new_v
      FROM b FULL OUTER JOIN u ON b.k = u.k)
SELECT k AS c_custkey, old_v AS c_acctbal,
       CAST(1 AS INTEGER) AS version,
       CASE WHEN new_v IS NOT NULL AND new_v <> old_v
            THEN false ELSE true END AS is_current
FROM j WHERE old_v IS NOT NULL
UNION ALL
SELECT k, new_v,
       CASE WHEN old_v IS NULL THEN CAST(1 AS INTEGER)
            ELSE CAST(2 AS INTEGER) END,
       true
FROM j WHERE new_v IS NOT NULL AND (old_v IS NULL OR new_v <> old_v)
"""


def embed_label_means_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, laid out as (label, d, mean)
    rows. Means from integer-quantized dimension sums (the kmeans
    pattern, simsearch.KMEANS_SCALE): exact, order-independent across
    partials, bit-identical in the oracle. One posexplode + one hash
    aggregate — map-side combined, no wide agg buffer."""
    emb = _emb(spark, sf_dir)
    e = emb.select("label", F.posexplode("embedding").alias("d", "x"))
    return e.groupBy("label", "d").agg(
        (
            F.sum(
                F.round(F.col("x").cast("double") * F.lit(ss.KMEANS_SCALE)).cast(
                    "long"
                )
            ).cast("double")
            / (F.lit(ss.KMEANS_SCALE) * F.count("*").cast("double"))
        ).alias("mean")
    )


SQL_EMBED_LABEL_MEANS = f"""
SELECT label, CAST(r.d AS INTEGER) AS d,
  CAST(sum(CAST(round(CAST(embedding[r.d + 1] AS DOUBLE) * {ss.KMEANS_SCALE})
                AS BIGINT)) AS DOUBLE)
    / ({ss.KMEANS_SCALE} * CAST(count(*) AS DOUBLE)) AS mean
FROM embeddings, UNNEST(range({ss.DIM})) AS r(d)
GROUP BY label, r.d
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pass over the binary media table: mapInPandas byte-
    stride downsample (deterministic stand-in for the per-blob codec
    call — operators/multimodal.py resize_batch), digest JVM-side.
    The oracle reproduces the stride with a pairwise regexp_replace
    on the source text (payloads are its UTF-8 bytes, ASCII here)."""
    from ..operators.multimodal import resize_media

    return resize_media(binarize_documents(_docs(spark, sf_dir)))


SQL_MULTIMODAL_RESIZE = r"""
WITH r AS (
  SELECT doc_id, text,
         regexp_replace(text, '(.)(.)', '\1', 'g') AS th
  FROM documents)
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(length(th) AS BIGINT) AS resized_bytes,
       md5(th) AS resized_md5
FROM r
"""


def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus assembly, every curation pass
    composed in ONE DataFrame plan: quality gate (token count + stop
    ratio) -> repetition gate (dup_token_ratio <= 0.65) -> benchmark
    decontamination (5-gram anti-join, eval source excluded) -> exact
    dedup (keep min doc_id per content hash) -> per-source quota (20,
    deterministic hash order). The full 100 TB corpus pass: map-side
    metric gates, one broadcast anti-join, one dedup shuffle, one
    bounded-state quota window — no driver round-trips between
    stages. Both metric gates are inline scan predicates
    (tx.quality_gate / cu.repetition_gate): the r1-r3 form joined two
    metric relations back on doc_id, reading the corpus three times
    and paying two equi-joins for what one scan's WHERE clause
    expresses."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    kept = cu.repetition_gate(
        tx.quality_gate(docs.filter(F.col("source") != "src0"))
    ).join(cu.decontaminate(docs), "doc_id", "left_anti")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    wq = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        deduped.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= 20)
        .select(
            "doc_id", "source", "lang", F.length("text").alias("n_chars")
        )
    )


SQL_PIPELINE_TRAINING_CORPUS = (
    "WITH "
    + _sh_ctes_n(cu.DECONTAM_SHINGLE_N)
    + """,
ev AS (SELECT DISTINCT s.shingle FROM sh s
       JOIN documents d USING (doc_id) WHERE d.source = 'src0'),
tr AS (SELECT s.doc_id, s.shingle FROM sh s
       JOIN documents d USING (doc_id) WHERE d.source <> 'src0'),
contam AS (SELECT tr.doc_id FROM tr JOIN ev USING (shingle)
           GROUP BY tr.doc_id HAVING count(*) >= 1),
toks AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS arr
  FROM documents),
q AS (SELECT doc_id FROM toks
  WHERE len(arr) >= 5 AND
    (CASE WHEN len(arr) > 0
      THEN CAST(len(list_filter(arr, x -> list_contains({stops}, x))) AS DOUBLE)
           / CAST(len(arr) AS DOUBLE)
      ELSE 0.0 END) <= 0.6),
rep AS (SELECT doc_id FROM toks WHERE len(arr) > 0 AND
    1.0 - CAST(len(list_distinct(arr)) AS DOUBLE) / CAST(len(arr) AS DOUBLE)
      <= 0.65),
kept AS (
  SELECT d.* FROM documents d
  JOIN q USING (doc_id) JOIN rep USING (doc_id)
  WHERE d.source <> 'src0'
    AND d.doc_id NOT IN (SELECT doc_id FROM contam)),
dedup AS (SELECT * FROM (
    SELECT d.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept d) WHERE rn = 1)
SELECT doc_id, source, lang, CAST(length(text) AS INTEGER) AS n_chars
FROM (SELECT *, row_number() OVER (
        PARTITION BY source
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM dedup) WHERE rk <= 20
"""
)
# .replace, not .format: the shingle CTE may carry regex braces
SQL_PIPELINE_TRAINING_CORPUS = SQL_PIPELINE_TRAINING_CORPUS.replace(
    "{stops}", _STOP_LIST
)


def zorder_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (l_orderkey, l_partkey) for a deterministic
    lineitem slice — the clustering key behind multi-dimensional
    zone-map pruning (operators/layout.py; layout pass itself is
    demonstrated on written files in tests/test_storage_layout.py)."""
    from ..operators.layout import zorder_col

    li = scan_parquet(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 2000
    )
    return li.select(
        "l_orderkey",
        "l_partkey",
        zorder_col("l_orderkey", "l_partkey").alias("zval"),
    )


def _zorder_sql() -> str:
    from ..operators.layout import zorder_sql

    return (
        "SELECT l_orderkey, l_partkey, "
        f"{zorder_sql('l_orderkey', 'l_partkey')} AS zval "
        "FROM lineitem WHERE l_orderkey < 2000"
    )


SQL_ZORDER_VALUES = _zorder_sql()


def sink_partitioned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-sink roundtrip: write documents partitionBy(lang),
    read back ONE partition. The read-back scan carries
    PartitionFilters (directory-level pruning — other partitions'
    files are never opened); parity against the parquet source proves
    the write+prune path end to end."""
    from pathlib import Path as _P

    from ..sources.fixtures import _CACHE
    from ..sources.sinks import write_parquet

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars", "lang")
    path = str(_CACHE / f"sink_part_{_P(sf_dir).name}")
    write_parquet(docs, path, ["lang"])
    return (
        spark.read.parquet(path)
        .filter(F.col("lang") == "de")
        .select("doc_id", "lang", "n_chars")
    )


SQL_SINK_PARTITIONED = (
    "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'de'"
)


def join_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-co-located fact join: lineitem and orders land in 8
    buckets on the order key (one-time layout cost, cached as
    metastore tables per SF), so the SortMergeJoin reads the buckets
    directly — the only Exchange in the whole plan is the final
    priority aggregation."""
    from pathlib import Path as _P

    from ..operators.layout import bucketed_join

    tag = _P(sf_dir).name.replace(".", "_")
    li = scan_parquet(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    od = scan_parquet(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    j = bucketed_join(
        li, f"li_bkt_{tag}", "l_orderkey", od, f"od_bkt_{tag}", "o_orderkey"
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        (F.sum("cents") / F.lit(100.0)).alias("sum_price"),
    )


SQL_JOIN_BUCKETED = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def join_bloom_prefilter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: urgent Q3-1996 orders' keys become a
    64 Kib Bloom applied map-side on the lineitem scan BEFORE the
    join, so ~97% of fact rows never reach it; false positives die in
    the real join, making the plain join the oracle."""
    from ..operators.bloomjoin import bloom_prefiltered_join

    od = scan_parquet(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    ).select("o_orderkey", "o_orderstatus")
    li = scan_parquet(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    j = bloom_prefiltered_join(li, "l_orderkey", od, "o_orderkey")
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        (F.sum("cents") / F.lit(100.0)).alias("sum_price"),
    )


SQL_JOIN_BLOOM = """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
  AND o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
GROUP BY o_orderstatus
"""


def ngram_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.ngram_counts(_docs(spark, sf_dir))


SQL_NGRAM_COUNTS = """
WITH w AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS arr
  FROM documents),
g AS (
  SELECT unnest(CASE WHEN len(arr) >= 3 THEN
           list_transform(range(1, len(arr) - 1),
                          i -> arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2])
         ELSE [] END) AS ngram
  FROM w)
SELECT ngram, CAST(count(*) AS BIGINT) AS n_count
FROM g GROUP BY ngram
ORDER BY n_count DESC, ngram ASC
LIMIT 50
"""


def stream_quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.curation import quality_filter_stream

    return quality_filter_stream(spark, sf_dir)


SQL_STREAM_QUALITY = f"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS arr
  FROM documents),
m AS (SELECT doc_id, lang, CAST(len(arr) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(arr, x -> list_contains({_STOP_LIST}, x))) AS BIGINT) AS n_stop
      FROM t),
r AS (SELECT doc_id, lang, n_tokens,
        CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             ELSE 0.0 END AS stop_ratio
      FROM m)
SELECT doc_id, lang, n_tokens, stop_ratio
FROM r WHERE n_tokens >= 20 AND stop_ratio <= 0.10
"""


_KEYWORDS = ("data", "model", "learning", "system")


def explode_outer_keywords_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving generate: per-document keyword matches exploded
    with explode_outer, so documents matching NOTHING survive as a
    (doc_id, NULL) row — the left-join-lateral semantics a tagging
    pipeline needs when unmatched rows must not be dropped (plain
    explode silently loses them)."""
    kw = F.array(*[F.lit(k) for k in _KEYWORDS])
    words = F.filter(
        F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != ""
    )
    matches = F.array_intersect(F.array_distinct(words), kw)
    return (
        _docs(spark, sf_dir)
        .select("doc_id", matches.alias("__m"))
        .select("doc_id", F.explode_outer("__m").alias("keyword"))
    )


_KW_LIST = "[" + ", ".join(f"'{k}'" for k in _KEYWORDS) + "]"

SQL_EXPLODE_OUTER = f"""
WITH t AS (
  SELECT doc_id,
    list_intersect(
      list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x <> '')),
      {_KW_LIST}) AS m
  FROM documents)
SELECT doc_id,
  unnest(CASE WHEN len(m) = 0 OR m IS NULL THEN [CAST(NULL AS VARCHAR)]
         ELSE m END) AS keyword
FROM t
"""


def rollup_multigrain_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern: daily totals re-aggregated FROM
    the hourly partials, not from raw events — at 100 TB the hourly
    relation is ~1/10^4 the raw size, so every coarser grain costs a
    re-aggregation of partials (sum-of-sums / sum-of-counts are exact
    under regrouping). The oracle aggregates raw directly; equality
    proves the two-level rollup is lossless."""
    ev = scan_parquet(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
        )
    )
    return (
        hourly.groupBy(
            F.to_date(F.date_trunc("day", F.col("hour_start"))).alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
        )
    )


SQL_ROLLUP_MULTIGRAIN = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY CAST(date_trunc('day', ts) AS DATE), event_type
"""


def sink_orc_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write + read-back parity: documents projected, written as
    ORC (repo cache), read back. The oracle reads the same projection
    from the parquet source — equality proves the columnar round trip
    (types, nulls, strings) through the second format."""
    from pathlib import Path as _P

    from ..sources.fixtures import _CACHE
    from ..sources.sinks import write_orc

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    path = str(_CACHE / f"sink_orc_{_P(sf_dir).name}")
    write_orc(docs, path)
    return spark.read.orc(path).select("doc_id", "lang", "n_chars")


SQL_SINK_ORC = "SELECT doc_id, lang, n_chars FROM documents"


def doc_chunk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import chunk_documents

    return chunk_documents(_docs(spark, sf_dir))


SQL_DOC_CHUNK = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS arr
  FROM documents),
c AS (
  SELECT doc_id, arr,
         unnest(range(0, CAST(ceil(len(arr) / 50.0) AS INT))) AS chunk_id
  FROM t WHERE len(arr) > 0)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
  CAST(len(list_slice(arr, chunk_id * 50 + 1, chunk_id * 50 + 50)) AS BIGINT) AS n_tokens,
  array_to_string(list_slice(arr, chunk_id * 50 + 1, chunk_id * 50 + 50), ' ') AS chunk_text
FROM c
"""


def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_sequences

    return pack_sequences(_docs(spark, sf_dir))


SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT lang AS part, doc_id,
    CAST(greatest(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')), 0) AS BIGINT) AS n_tokens
  FROM documents),
b AS (
  SELECT part, n_tokens,
    CAST(floor((sum(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) / 512.0) AS BIGINT)
      AS bin_id
  FROM t)
SELECT part, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM b GROUP BY part, bin_id
"""


def stream_doc_chunk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.curation import chunk_stream

    return chunk_stream(spark, sf_dir)


def stream_static_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import enrich_stream_static

    return enrich_stream_static(spark, sf_dir)


SQL_STREAM_STATIC_JOIN = """
SELECT e.event_id, e.user_id, n.n_name, e.value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id + 1
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE e.event_type = 'purchase'
"""


# ---- corpus organization: dedup pipeline, sharding, split ----------

# Engine-portable 32-bit id hash (mirror of curation._id_hash32):
# first 8 md5 hex digits of the decimal id string, expanded with the
# strpos digit trick DuckDB shares with the simhash/minhash oracles.
_ID_HASH32_SQL = " + ".join(
    "(strpos('0123456789abcdef', "
    "substr(md5(CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)".format(i=i + 1)
    + f" * {16 ** (8 - i - 1)}"
    for i in range(8)
)


def pipeline_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup removal over documents: candidate pairs →
    components → drop non-representatives; emits the surviving
    (doc_id, lang, source) rows. The composed form of
    dedup_minhash_lsh + dedup_components + a left-anti join — ONE
    plan, no driver round-trips (operators/dedup.py:dedup_corpus)."""
    return dd.dedup_corpus(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "source"
    )


SQL_PIPELINE_DEDUP_CORPUS = (
    "WITH RECURSIVE " + _PAIR_CTES + ", "
    "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs), "
    "reach(src, dst) AS (SELECT src, dst FROM edges "
    "UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), "
    "comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component_id "
    "FROM reach GROUP BY src), "
    "drop AS (SELECT doc_id FROM comp WHERE doc_id <> component_id) "
    "SELECT d.doc_id, d.lang, d.source FROM documents d "
    "WHERE d.doc_id NOT IN (SELECT doc_id FROM drop)"
)


def dedup_keep_best_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pipeline_dedup_corpus with the quality-ranked survivor policy:
    each near-dup component keeps its longest member (n_chars DESC,
    doc_id ASC), not the arbitrary min-id one
    (operators/dedup.py dedup_corpus_keep_best)."""
    return dd.dedup_corpus_keep_best(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "source", "n_chars"
    )


SQL_DEDUP_KEEP_BEST = (
    "WITH RECURSIVE " + _PAIR_CTES + ", "
    "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs), "
    "reach(src, dst) AS (SELECT src, dst FROM edges "
    "UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), "
    "comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component_id "
    "FROM reach GROUP BY src), "
    "rk AS (SELECT c.doc_id, row_number() OVER (PARTITION BY c.component_id "
    "ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn "
    "FROM comp c JOIN documents d USING (doc_id)), "
    "drop AS (SELECT doc_id FROM rk WHERE rn > 1) "
    "SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d "
    "WHERE d.doc_id NOT IN (SELECT doc_id FROM drop)"
)


def corpus_shard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.corpus_shard(_docs(spark, sf_dir))


SQL_CORPUS_SHARD = f"""
WITH h AS (SELECT doc_id, ({_ID_HASH32_SQL}) AS h FROM documents),
s AS (SELECT doc_id, h, CAST(h % 16 AS INTEGER) AS shard FROM h)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM s
"""


def corpus_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.train_split(_docs(spark, sf_dir))


SQL_CORPUS_SPLIT = f"""
SELECT doc_id,
  CASE WHEN ({_ID_HASH32_SQL}) % 100 < 90 THEN 'train'
       WHEN ({_ID_HASH32_SQL}) % 100 < 95 THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


def sample_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.sample_weighted(_docs(spark, sf_dir))


SQL_SAMPLE_WEIGHTED = f"""
SELECT doc_id, n_chars,
  -ln((({_ID_HASH32_SQL}) + CAST(1 AS DOUBLE)) / 4294967296.0)
    / CAST(n_chars AS DOUBLE) AS es_key
FROM documents
WHERE CAST(n_chars AS DOUBLE) > 0
ORDER BY es_key ASC, doc_id ASC
LIMIT 100
"""


def sample_weighted_per_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.sample_weighted_per_group(_docs(spark, sf_dir))


SQL_SAMPLE_WEIGHTED_PER_SOURCE = f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
    -ln((({_ID_HASH32_SQL}) + CAST(1 AS DOUBLE)) / 4294967296.0)
      / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0)
SELECT doc_id, source, n_chars, es_key, pos FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY source
             ORDER BY es_key ASC, doc_id ASC) AS BIGINT) AS pos
  FROM s) WHERE pos <= 10
"""


def source_temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cu.source_temperature(_docs(spark, sf_dir))


SQL_SOURCE_TEMPERATURE = f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
           FROM documents WHERE source IS NOT NULL GROUP BY source),
w AS (SELECT source,
        CAST(floor(sqrt(CAST(n_s AS DOUBLE)) * 1048576) AS BIGINT) AS ws
      FROM c),
t AS (SELECT sum(ws) AS wt FROM w),
tgt AS (SELECT source, greatest(CAST(1 AS BIGINT), (200 * ws) // wt)
          AS target_n FROM w CROSS JOIN t),
r AS (SELECT doc_id, source,
        CAST(row_number() OVER (PARTITION BY source
             ORDER BY ({_ID_HASH32_SQL}), doc_id) AS BIGINT) AS pos
      FROM documents WHERE source IS NOT NULL)
SELECT r.doc_id, r.source, r.pos
FROM r JOIN tgt USING (source) WHERE r.pos <= tgt.target_n
"""


# --- Product quantization oracle: the whole per-subspace Lloyd fit +
# ADC scoring replicated in DuckDB SQL (same scheme as the IVF oracle
# _km_ctes, with squared-L2 argmin and codebooks as c0..c7 scalar
# columns so every arithmetic step is an explicit left-to-right
# double expression, bit-identical to the Spark/Arrow forms).

_PQ_M, _PQ_K, _PQ_SD, _PQ_ITERS = ss.M_SUB, ss.K_SUB, ss.SUB_DIM, ss.PQ_ITERS
_PQ_MS = "[" + ", ".join(str(m) for m in range(_PQ_M)) + "]"


def _pq_l2_sql(emb: str, m: str, book: str) -> str:
    """Squared L2 of subspace `m` of list column `emb` against codebook
    alias `book` (columns c0..c{SD-1}); terms sum left-to-right."""
    terms = []
    for d in range(_PQ_SD):
        x = f"CAST(list_extract({emb}, {m}*{_PQ_SD}+{d + 1}) AS DOUBLE)"
        terms.append(f"(({x} - {book}.c{d}) * ({x} - {book}.c{d}))")
    return " + ".join(terms)


def _pq_ctes(p: str = "") -> str:
    """PQ fit + encode CTE chain; `p` prefixes every generated CTE
    name so the chain can coexist with the IVF k-means CTEs (which
    also use a1/a2 internally) in one combined oracle."""
    seed_cols = ", ".join(
        f"CAST(list_extract(e.embedding, s.m*{_PQ_SD}+{d + 1}) AS DOUBLE) AS c{d}"
        for d in range(_PQ_SD)
    )
    sum_cols = ", ".join(
        f"sum(CAST(round(CAST(list_extract(embedding, m*{_PQ_SD}+{d + 1}) "
        f"AS DOUBLE) * 1048576.0) AS BIGINT)) AS s{d}"
        for d in range(_PQ_SD)
    )
    mean_cols = ", ".join(
        f"CASE WHEN s.n IS NULL THEN b.c{d} ELSE "
        f"CAST(s.s{d} AS DOUBLE) / (1048576.0 * CAST(s.n AS DOUBLE)) END AS c{d}"
        for d in range(_PQ_SD)
    )
    parts = [
        f"{p}subm AS (SELECT e.vec_id, e.embedding, s.m "
        f"FROM embeddings e, UNNEST({_PQ_MS}) AS s(m))",
        f"{p}b0 AS (SELECT s.m, e.vec_id AS code, {seed_cols} "
        f"FROM embeddings e, UNNEST({_PQ_MS}) AS s(m) "
        f"WHERE e.vec_id < {_PQ_K})",
    ]
    for t in range(_PQ_ITERS):
        parts.append(
            f"{p}a{t + 1} AS (SELECT vec_id, embedding, m, code FROM ("
            f"SELECT x.vec_id, x.embedding, x.m, b.code, "
            f"row_number() OVER (PARTITION BY x.vec_id, x.m ORDER BY "
            f"{_pq_l2_sql('x.embedding', 'x.m', 'b')} ASC, b.code ASC) AS rn "
            f"FROM {p}subm x JOIN {p}b{t} b ON b.m = x.m) WHERE rn = 1)"
        )
        parts.append(
            f"{p}s{t + 1} AS (SELECT m, code, count(*) AS n, {sum_cols} "
            f"FROM {p}a{t + 1} GROUP BY m, code)"
        )
        parts.append(
            f"{p}b{t + 1} AS (SELECT b.m, b.code, {mean_cols} "
            f"FROM {p}b{t} b LEFT JOIN {p}s{t + 1} s "
            f"ON s.m = b.m AND s.code = b.code)"
        )
    bf = f"{p}b{_PQ_ITERS}"
    parts.append(
        f"{p}codes AS (SELECT vec_id, m, code FROM ("
        f"SELECT x.vec_id, x.m, b.code, "
        f"row_number() OVER (PARTITION BY x.vec_id, x.m ORDER BY "
        f"{_pq_l2_sql('x.embedding', 'x.m', 'b')} ASC, b.code ASC) AS rn "
        f"FROM {p}subm x JOIN {bf} b ON b.m = x.m) WHERE rn = 1)"
    )
    return ", ".join(parts)


def simsearch_pq_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codes flattened to a CSV string so every result column is
    hashable by the driver canonicalizer (the embed_quantize lesson)."""
    e = _emb(spark, sf_dir)
    enc = ss.pq_encode(e, books=_pq_books(spark, sf_dir))
    return enc.select(
        "vec_id",
        F.concat_ws(",", F.col("codes").cast("array<string>")).alias(
            "codes_csv"
        ),
    )


SQL_PQ_ENCODE = (
    "WITH " + _pq_ctes() + " "
    "SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY m) "
    "AS codes_csv FROM codes GROUP BY vec_id"
)


def _pq_adc_sql() -> str:
    terms = []
    for m in range(_PQ_M):
        for d in range(_PQ_SD):
            x = (
                f"CAST(list_extract(q.q_emb, {m}*{_PQ_SD}+{d + 1}) "
                f"AS DOUBLE)"
            )
            terms.append(f"(({x} - p{m}.c{d}) * ({x} - p{m}.c{d}))")
    return " + ".join(terms)


def simsearch_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ss.pq_adc_topk(_emb(spark, sf_dir), books=_pq_books(spark, sf_dir))


def _pq_code_cols() -> str:
    return ", ".join(
        f"max(CASE WHEN m = {m} THEN code END) AS k{m}"
        for m in range(_PQ_M)
    )


_PQ_SCORED_CTES = (
    f"codes_w AS (SELECT vec_id, {_pq_code_cols()} FROM codes "
    "GROUP BY vec_id), "
    "q AS (SELECT vec_id AS query_id, embedding AS q_emb "
    "FROM embeddings WHERE vec_id < 8), "
    "scored AS (SELECT q.query_id, v.vec_id, "
    f"{_pq_adc_sql()} AS adc_dist "
    "FROM codes_w v CROSS JOIN q "
    + " ".join(
        f"JOIN b{_PQ_ITERS} p{m} ON p{m}.m = {m} AND p{m}.code = v.k{m}"
        for m in range(_PQ_M)
    )
    + " WHERE v.vec_id <> q.query_id), "
    "r AS (SELECT query_id, vec_id, adc_dist, CAST(row_number() OVER "
    "(PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC) "
    "AS INTEGER) AS rank FROM scored)"
)

SQL_PQ_TOPK = (
    "WITH " + _pq_ctes() + ", " + _PQ_SCORED_CTES
    + " SELECT query_id, vec_id, adc_dist, rank FROM r WHERE rank <= 5"
)


def simsearch_pq_refined_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ss.pq_refined_topk(
        _emb(spark, sf_dir), books=_pq_books(spark, sf_dir)
    )


SQL_PQ_REFINED = (
    "WITH " + _pq_ctes() + ", " + _PQ_SCORED_CTES + ", "
    "cand AS (SELECT query_id, vec_id FROM r WHERE rank <= 50), "
    "rs AS (SELECT c.query_id, c.vec_id, "
    f"{_cos_sql('q.q_emb', 'e.embedding')} AS cos "
    "FROM cand c JOIN embeddings e USING (vec_id) "
    "JOIN q ON q.query_id = c.query_id), "
    "rr AS (SELECT query_id, vec_id, cos, CAST(row_number() OVER "
    "(PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) "
    "AS INTEGER) AS rank FROM rs) "
    "SELECT query_id, vec_id, cos, rank FROM rr WHERE rank <= 5"
)


def simsearch_ivfpq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVFPQ search: IVF cell probe (nprobe=1) -> ADC over PQ
    codes -> exact cosine re-rank of the shortlist
    (operators/simsearch.py ivfpq_topk); both fits cached per sf."""
    return ss.ivfpq_topk(
        _emb(spark, sf_dir),
        cents=_km_cents(spark, sf_dir),
        books=_pq_books(spark, sf_dir),
    )


SQL_IVFPQ = (
    "WITH " + _IVF_ASG_CTES + ", " + _pq_ctes("p") + ", "
    f"codes_w AS (SELECT vec_id, {_pq_code_cols()} FROM pcodes "
    "GROUP BY vec_id), "
    "vw AS (SELECT a.vec_id, a.centroid_id, w.* EXCLUDE (vec_id) "
    "FROM codes_w w JOIN asg a USING (vec_id)), "
    "q AS (SELECT vec_id AS query_id, embedding AS q_emb, centroid_id "
    "FROM asg WHERE vec_id < 8), "
    "scored AS (SELECT q.query_id, v.vec_id, "
    f"{_pq_adc_sql()} AS adc "
    "FROM vw v JOIN q ON q.centroid_id = v.centroid_id "
    + " ".join(
        f"JOIN pb{_PQ_ITERS} p{m} ON p{m}.m = {m} AND p{m}.code = v.k{m}"
        for m in range(_PQ_M)
    )
    + " WHERE v.vec_id <> q.query_id), "
    "r AS (SELECT query_id, vec_id, row_number() OVER "
    "(PARTITION BY query_id ORDER BY adc ASC, vec_id ASC) AS rn "
    "FROM scored), "
    "cand AS (SELECT query_id, vec_id FROM r WHERE rn <= 20), "
    "rs AS (SELECT c.query_id, c.vec_id, "
    f"{_cos_sql('q.q_emb', 'e.embedding')} AS cos "
    "FROM cand c JOIN embeddings e USING (vec_id) "
    "JOIN q ON q.query_id = c.query_id), "
    "rr AS (SELECT query_id, vec_id, cos, CAST(row_number() OVER "
    "(PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) "
    "AS INTEGER) AS rank FROM rs) "
    "SELECT query_id, vec_id, cos, rank FROM rr WHERE rank <= 5"
)


def vocab_topv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-V vocabulary by occurrence count, ties to the
    smaller term (operators/textstats.py vocab_topv)."""
    return tx.vocab_topv(_docs(spark, sf_dir))


_VOCAB_CTES = r"""
toks AS (SELECT doc_id, u.term FROM documents,
  UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '')) AS u(term)),
vc AS (SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences
       FROM toks GROUP BY term),
v AS (SELECT term, n_occurrences,
        CAST(row_number() OVER (ORDER BY n_occurrences DESC, term ASC)
             AS INTEGER) AS vrank
      FROM vc ORDER BY n_occurrences DESC, term ASC LIMIT {V})
""".replace("{V}", str(tx.VOCAB_SIZE))

SQL_VOCAB_TOPV = (
    "WITH " + _VOCAB_CTES + " SELECT term, n_occurrences, vrank FROM v"
)


def vocab_oov_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc OOV rate against the corpus's own top-V vocabulary
    (operators/textstats.py vocab_oov)."""
    return tx.vocab_oov(_docs(spark, sf_dir))


SQL_VOCAB_OOV = (
    "WITH " + _VOCAB_CTES + ", "
    "per AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
    "CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_oov FROM toks t LEFT JOIN v ON v.term = t.term "
    "GROUP BY t.doc_id) "
    "SELECT d.doc_id, CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens, "
    "CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov, "
    "CASE WHEN coalesce(p.n_tokens, 0) > 0 THEN "
    "CAST(p.n_oov AS DOUBLE) / CAST(p.n_tokens AS DOUBLE) END AS oov_rate "
    "FROM documents d LEFT JOIN per p USING (doc_id)"
)


def tokens_to_ids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving token->vocab-id mapping (OOV -> 0), ids as a
    CSV string (operators/textstats.py tokens_to_ids)."""
    return tx.tokens_to_ids(_docs(spark, sf_dir))


SQL_TOKENS_TO_IDS = r"""
WITH docsr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\s+'),
                x -> x <> '') AS arr FROM documents),
toks AS (SELECT doc_id, arr[i] AS term, i AS pos
         FROM docsr, UNNEST(range(1, len(arr) + 1)) AS r(i)),
vc AS (SELECT term, CAST(count(*) AS BIGINT) AS n
       FROM toks GROUP BY term),
v AS (SELECT term,
        CAST(row_number() OVER (ORDER BY n DESC, term ASC) AS INTEGER)
          AS vid
      FROM vc ORDER BY n DESC, term ASC LIMIT {V}),
j AS (SELECT t.doc_id, t.pos, coalesce(v.vid, 0) AS id
      FROM toks t LEFT JOIN v USING (term)),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          array_to_string(list(id ORDER BY pos), ',') AS ids_csv
        FROM j GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
  coalesce(p.ids_csv, '') AS ids_csv
FROM documents d LEFT JOIN per p USING (doc_id)
""".replace("{V}", str(tx.VOCAB_SIZE))


def dedup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated n-gram spans: merged token ranges whose
    5-gram windows recur in another document — substring-granularity
    dedup output (operators/dedup.py repeated_spans)."""
    return dd.repeated_spans(_docs(spark, sf_dir))


def _span_gram_ctes(n: int) -> str:
    """CTE pair (docsr, g): every n-gram window with 0-based token
    offsets, mirroring operators/dedup.py ngram_positions (same
    tokenizer as the shingle CTEs; s/e are start/end-exclusive)."""
    gram = " || ' ' || ".join(f"arr[i+{j}]" if j else "arr[i]" for j in range(n))
    return (
        "docsr AS (SELECT doc_id, list_filter(regexp_split_to_array("
        f"lower(text), '{SQL_DELIM}'), x -> x <> '') AS arr FROM documents), "
        f"g AS (SELECT doc_id, CAST(i - 1 AS INT) AS s, "
        f"CAST(i - 1 + {n} AS INT) AS e, {gram} AS gram "
        f"FROM docsr, UNNEST(range(1, len(arr) - {n - 2})) AS r(i))"
    )


SQL_DEDUP_SPANS = (
    "WITH " + _span_gram_ctes(dd.SPAN_N) + ", "
    "rep AS (SELECT gram FROM g GROUP BY gram "
    "HAVING min(doc_id) <> max(doc_id)), "
    "h AS (SELECT g.doc_id, g.s, g.e FROM g JOIN rep USING (gram)), "
    "f AS (SELECT doc_id, s, e, CASE WHEN max(e) OVER w IS NULL "
    "OR s > max(e) OVER w THEN 1 ELSE 0 END AS ni FROM h "
    "WINDOW w AS (PARTITION BY doc_id ORDER BY s "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), "
    "i AS (SELECT doc_id, s, e, sum(ni) OVER (PARTITION BY doc_id "
    "ORDER BY s ROWS UNBOUNDED PRECEDING) AS isl FROM f) "
    "SELECT doc_id, CAST(min(s) AS INT) AS span_start, "
    "CAST(max(e) AS INT) AS span_end FROM i GROUP BY doc_id, isl"
)


def decontaminate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: token ranges in training docs whose
    5-grams appear in the src0 eval slice
    (operators/curation.py decontaminate_spans)."""
    return cu.decontaminate_spans(_docs(spark, sf_dir))


_SPAN_ISLANDS_SQL = (
    "f AS (SELECT doc_id, s, e, CASE WHEN max(e) OVER w IS NULL "
    "OR s > max(e) OVER w THEN 1 ELSE 0 END AS ni FROM h "
    "WINDOW w AS (PARTITION BY doc_id ORDER BY s "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), "
    "i AS (SELECT doc_id, s, e, sum(ni) OVER (PARTITION BY doc_id "
    "ORDER BY s ROWS UNBOUNDED PRECEDING) AS isl FROM f) "
    "SELECT doc_id, CAST(min(s) AS INT) AS span_start, "
    "CAST(max(e) AS INT) AS span_end FROM i GROUP BY doc_id, isl"
)


def _decontam_span_sql(n: int, eval_source: str) -> str:
    gram = " || ' ' || ".join(
        f"arr[i+{j}]" if j else "arr[i]" for j in range(n)
    )
    return (
        "WITH docsr AS (SELECT doc_id, source, "
        "list_filter(regexp_split_to_array(lower(text), "
        f"'{SQL_DELIM}'), x -> x <> '') AS arr FROM documents), "
        f"g AS (SELECT doc_id, source, CAST(i - 1 AS INT) AS s, "
        f"CAST(i - 1 + {n} AS INT) AS e, {gram} AS gram "
        f"FROM docsr, UNNEST(range(1, len(arr) - {n - 2})) AS r(i)), "
        f"ev AS (SELECT DISTINCT gram FROM g WHERE source = '{eval_source}'), "
        "h AS (SELECT g.doc_id, g.s, g.e FROM g JOIN ev USING (gram) "
        f"WHERE g.source <> '{eval_source}'), " + _SPAN_ISLANDS_SQL
    )


SQL_DECONTAMINATE_SPANS = _decontam_span_sql(cu.DECONTAM_SHINGLE_N, "src0")


TOKEN_BUDGET = 2000


def select_token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut the corpus to a token budget in (n_chars DESC, doc_id ASC)
    priority order via the two-level bucket cumsum — no global
    single-partition window (operators/curation.py
    select_token_budget)."""
    return cu.select_token_budget(_docs(spark, sf_dir), TOKEN_BUDGET)


SQL_SELECT_TOKEN_BUDGET = r"""
WITH d AS (SELECT doc_id, n_chars,
    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
dd AS (SELECT * FROM d WHERE n_tokens > 0),
r AS (SELECT doc_id, n_chars, n_tokens,
        CAST(sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
          - n_tokens AS bef
      FROM dd)
SELECT doc_id, n_chars, n_tokens FROM r WHERE bef < {B}
""".replace("{B}", "2000")


def corpus_cut_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full substring-dedup rewrite: detect cross-document
    repeated 5-gram spans, merge them, and CUT them out of the corpus
    text (operators/dedup.py repeated_spans + cut_spans)."""
    d = _docs(spark, sf_dir)
    return dd.cut_spans(d, dd.repeated_spans(d))


SQL_CORPUS_CUT_SPANS = (
    "WITH " + _span_gram_ctes(dd.SPAN_N) + ", "
    "rep AS (SELECT gram FROM g GROUP BY gram "
    "HAVING min(doc_id) <> max(doc_id)), "
    "h AS (SELECT g.doc_id, g.s, g.e FROM g JOIN rep USING (gram)), "
    "f AS (SELECT doc_id, s, e, CASE WHEN max(e) OVER w IS NULL "
    "OR s > max(e) OVER w THEN 1 ELSE 0 END AS ni FROM h "
    "WINDOW w AS (PARTITION BY doc_id ORDER BY s "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), "
    "isl AS (SELECT doc_id, s, e, sum(ni) OVER (PARTITION BY doc_id "
    "ORDER BY s ROWS UNBOUNDED PRECEDING) AS grp FROM f), "
    "sp AS (SELECT doc_id, CAST(min(s) AS INT) AS span_start, "
    "CAST(max(e) AS INT) AS span_end FROM isl GROUP BY doc_id, grp), "
    "tk AS (SELECT doc_id, arr[i] AS tok, CAST(i - 1 AS INT) AS pos "
    "FROM docsr, UNNEST(range(1, len(arr) + 1)) AS r(i)), "
    "kept AS (SELECT t.doc_id, t.tok, t.pos FROM tk t "
    "WHERE NOT EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = t.doc_id "
    "AND t.pos >= sp.span_start AND t.pos < sp.span_end)), "
    "rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_kept, "
    "array_to_string(list(tok ORDER BY pos), ' ') AS clean_text "
    "FROM kept GROUP BY doc_id), "
    "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_all "
    "FROM tk GROUP BY doc_id) "
    "SELECT d.doc_id, coalesce(rb.clean_text, '') AS clean_text, "
    "CAST(coalesce(rb.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept, "
    "CAST(coalesce(tot.n_all, 0) - coalesce(rb.n_tokens_kept, 0) "
    "AS BIGINT) AS n_tokens_cut "
    "FROM documents d LEFT JOIN rb USING (doc_id) "
    "LEFT JOIN tot USING (doc_id)"
)


def pipeline_span_surgery_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical corpus assembly in ONE plan: cross-document repeated
    5-gram hits WITHIN the training slice and eval-contamination hits
    AGAINST the src0 slice feed a single gaps-and-islands merge, the
    combined spans are cut out of the text, and docs keeping < 5
    tokens drop. The two detectors share one training-gram relation
    (one explode); eval grams broadcast; only hit rows reach the
    merge; the rebuild is one doc aggregate. Returns (doc_id,
    clean_text, n_tokens_kept, n_tokens_cut) for surviving training
    docs."""
    d = _docs(spark, sf_dir)
    train = d.filter(F.col("source") != "src0")
    g_train = dd.ngram_positions(train)
    eval_g = (
        dd.ngram_positions(d.filter(F.col("source") == "src0"))
        .select("gram")
        .distinct()
    )
    probed = g_train.join(
        dd._cross_doc_grams(g_train).withColumn("__r", F.lit(1)),
        "gram",
        "left",
    ).join(
        F.broadcast(eval_g.withColumn("__e", F.lit(1))), "gram", "left"
    )
    hits = probed.filter(
        F.col("__r").isNotNull() | F.col("__e").isNotNull()
    ).select("doc_id", "start", "end")
    spans = dd.merge_spans(hits)
    return dd.cut_spans(train, spans).filter(F.col("n_tokens_kept") >= 5)


SQL_PIPELINE_SPAN_SURGERY = (
    "WITH docsr AS (SELECT doc_id, source, "
    "list_filter(regexp_split_to_array(lower(text), "
    f"'{SQL_DELIM}'), x -> x <> '') AS arr FROM documents), "
    "gt AS (SELECT doc_id, CAST(i - 1 AS INT) AS s, "
    f"CAST(i - 1 + {dd.SPAN_N} AS INT) AS e, "
    + " || ' ' || ".join(
        f"arr[i+{j}]" if j else "arr[i]" for j in range(dd.SPAN_N)
    )
    + " AS gram FROM docsr, "
    f"UNNEST(range(1, len(arr) - {dd.SPAN_N - 2})) AS r(i) "
    "WHERE source <> 'src0'), "
    "ev AS (SELECT DISTINCT "
    + " || ' ' || ".join(
        f"arr[i+{j}]" if j else "arr[i]" for j in range(dd.SPAN_N)
    )
    + " AS gram FROM docsr, "
    f"UNNEST(range(1, len(arr) - {dd.SPAN_N - 2})) AS r(i) "
    "WHERE source = 'src0'), "
    "rep AS (SELECT gram FROM gt GROUP BY gram "
    "HAVING min(doc_id) <> max(doc_id)), "
    "h AS (SELECT gt.doc_id, gt.s, gt.e FROM gt JOIN rep USING (gram) "
    "UNION ALL "
    "SELECT gt.doc_id, gt.s, gt.e FROM gt JOIN ev USING (gram)), "
    "f AS (SELECT doc_id, s, e, CASE WHEN max(e) OVER w IS NULL "
    "OR s > max(e) OVER w THEN 1 ELSE 0 END AS ni FROM h "
    "WINDOW w AS (PARTITION BY doc_id ORDER BY s "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), "
    "isl AS (SELECT doc_id, s, e, sum(ni) OVER (PARTITION BY doc_id "
    "ORDER BY s ROWS UNBOUNDED PRECEDING) AS grp FROM f), "
    "sp AS (SELECT doc_id, CAST(min(s) AS INT) AS span_start, "
    "CAST(max(e) AS INT) AS span_end FROM isl GROUP BY doc_id, grp), "
    "tk AS (SELECT doc_id, arr[i] AS tok, CAST(i - 1 AS INT) AS pos "
    "FROM docsr, UNNEST(range(1, len(arr) + 1)) AS r(i) "
    "WHERE source <> 'src0'), "
    "kept AS (SELECT t.doc_id, t.tok, t.pos FROM tk t "
    "WHERE NOT EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = t.doc_id "
    "AND t.pos >= sp.span_start AND t.pos < sp.span_end)), "
    "rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_kept, "
    "array_to_string(list(tok ORDER BY pos), ' ') AS clean_text "
    "FROM kept GROUP BY doc_id), "
    "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_all "
    "FROM tk GROUP BY doc_id) "
    "SELECT d.doc_id, coalesce(rb.clean_text, '') AS clean_text, "
    "CAST(coalesce(rb.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept, "
    "CAST(coalesce(tot.n_all, 0) - coalesce(rb.n_tokens_kept, 0) "
    "AS BIGINT) AS n_tokens_cut "
    "FROM documents d LEFT JOIN rb USING (doc_id) "
    "LEFT JOIN tot USING (doc_id) "
    "WHERE d.source <> 'src0' AND coalesce(rb.n_tokens_kept, 0) >= 5"
)


def cross_doc_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc share of n-gram windows that also occur in another
    document (operators/dedup.py cross_doc_repetition)."""
    return dd.cross_doc_repetition(_docs(spark, sf_dir))


SQL_CROSS_DOC_REPETITION = (
    "WITH " + _span_gram_ctes(dd.SPAN_N) + ", "
    "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams "
    "FROM g GROUP BY doc_id), "
    "rep AS (SELECT gram FROM g GROUP BY gram "
    "HAVING min(doc_id) <> max(doc_id)), "
    "dup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup "
    "FROM g JOIN rep USING (gram) GROUP BY doc_id) "
    "SELECT d.doc_id, CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams, "
    "CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_grams, "
    "CASE WHEN coalesce(t.n_grams, 0) > 0 THEN "
    "CAST(coalesce(p.n_dup, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE) END "
    "AS dup_gram_share "
    "FROM documents d LEFT JOIN tot t USING (doc_id) "
    "LEFT JOIN dup p USING (doc_id)"
)


def simsearch_ivfpq_nprobe2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ with multi-probe (nprobe=2): each query's candidates come
    from its TWO nearest IVF cells — the recall knob real IVFPQ
    deployments turn (operators/simsearch.py ivfpq_topk nprobe arg;
    recall gain pinned in tests/test_extensions.py's planted-ground-
    truth harness). Same fits, cached per sf."""
    return ss.ivfpq_topk(
        _emb(spark, sf_dir),
        cents=_km_cents(spark, sf_dir),
        books=_pq_books(spark, sf_dir),
        nprobe=2,
    )


# nprobe=2 oracle: identical to SQL_IVFPQ except the probe relation
# keeps each query's TOP-2 cells (row_number <= 2 over the same
# cos DESC, centroid_id ASC order the Spark top-cells sort uses) —
# asgs already scores every vector against the final centroids c3.
SQL_IVFPQ_NPROBE2 = (
    "WITH " + _IVF_ASG_CTES + ", " + _pq_ctes("p") + ", "
    f"codes_w AS (SELECT vec_id, {_pq_code_cols()} FROM pcodes "
    "GROUP BY vec_id), "
    "vw AS (SELECT a.vec_id, a.centroid_id, w.* EXCLUDE (vec_id) "
    "FROM codes_w w JOIN asg a USING (vec_id)), "
    "q AS (SELECT vec_id AS query_id, embedding AS q_emb, centroid_id "
    "FROM (SELECT vec_id, embedding, centroid_id, row_number() OVER "
    "(PARTITION BY vec_id ORDER BY cos DESC, centroid_id ASC) AS rn "
    "FROM asgs WHERE vec_id < 8) WHERE rn <= 2), "
    "scored AS (SELECT q.query_id, v.vec_id, "
    f"{_pq_adc_sql()} AS adc "
    "FROM vw v JOIN q ON q.centroid_id = v.centroid_id "
    + " ".join(
        f"JOIN pb{_PQ_ITERS} p{m} ON p{m}.m = {m} AND p{m}.code = v.k{m}"
        for m in range(_PQ_M)
    )
    + " WHERE v.vec_id <> q.query_id), "
    "r AS (SELECT query_id, vec_id, row_number() OVER "
    "(PARTITION BY query_id ORDER BY adc ASC, vec_id ASC) AS rn "
    "FROM scored), "
    "cand AS (SELECT query_id, vec_id FROM r WHERE rn <= 20), "
    "qb AS (SELECT vec_id AS query_id, embedding AS q_emb "
    "FROM embeddings WHERE vec_id < 8), "
    "rs AS (SELECT c.query_id, c.vec_id, "
    f"{_cos_sql('q.q_emb', 'e.embedding')} AS cos "
    "FROM cand c JOIN embeddings e USING (vec_id) "
    "JOIN qb q ON q.query_id = c.query_id), "
    "rr AS (SELECT query_id, vec_id, cos, CAST(row_number() OVER "
    "(PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) "
    "AS INTEGER) AS rank FROM rs) "
    "SELECT query_id, vec_id, cos, rank FROM rr WHERE rank <= 5"
)


# One PQ fit per sf_dir per session (same budget rationale as _KM_CACHE).
_PQ_CACHE: dict[str, list] = {}


def _pq_books(spark: SparkSession, sf_dir: str) -> list:
    if sf_dir not in _PQ_CACHE:
        _PQ_CACHE[sf_dir] = ss.pq_codebooks(_emb(spark, sf_dir))
    return _PQ_CACHE[sf_dir]


def corpus_composition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.corpus_composition(_docs(spark, sf_dir))


SQL_CORPUS_COMPOSITION = r"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN text IS NULL THEN 0 ELSE
      len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                      x -> x <> '')) END) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source),
s AS (SELECT lang, source, n_docs, n_tokens,
        CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE)
          AS token_share
      FROM cells)
SELECT lang, source, n_docs, n_tokens, token_share,
  sum(token_share) OVER (ORDER BY n_tokens DESC,
                         lang ASC NULLS FIRST, source ASC NULLS FIRST
                         ROWS UNBOUNDED PRECEDING) AS cum_share
FROM s
"""


def lm_unigram_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.lm_unigram_score(_docs(spark, sf_dir))


SQL_LM_UNIGRAM = r"""
WITH toks AS (
  SELECT doc_id, u.term FROM documents,
    UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                       x -> x <> '')) AS u(term)
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
tc AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t_total FROM tc),
pd AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         sum(CAST(tf AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS s
       FROM tf JOIN tc USING (term) GROUP BY doc_id)
SELECT doc_id, n_tokens,
  s / CAST(n_tokens AS DOUBLE) - ln(CAST(t_total AS DOUBLE)) AS avg_logprob
FROM pd CROSS JOIN tot
"""


def ts_paa_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAA sketches of each user's event-value series
    (operators/timeseries.py ts_paa)."""
    from ..operators.timeseries import ts_paa

    return ts_paa(_events(spark, sf_dir))


def _paa_ctes(segments: int, tag: str) -> str:
    """PAA sketch CTEs at a given resolution, mirroring
    operators/timeseries.py _paa_segments — the ONE segmentation
    definition on the oracle side too: {tag}s = (user_id, seg, sc
    exact-cent sum, np) is the shared base (ts_sax compares it in
    exact integers), {tag}k divides it into the sketch
    (user_id, seg, paa_value, n_points). Integer floor division for
    segment assignment, exact-cents sums before one final divide."""
    return f"""
{tag}b AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) - 1
              AS BIGINT) AS pos,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM events),
{tag}f AS (SELECT *, (pos * {segments}) // n AS seg
           FROM {tag}b WHERE n >= {segments}),
{tag}s AS (SELECT user_id, seg, CAST(sum(cents) AS BIGINT) AS sc,
                  CAST(count(*) AS BIGINT) AS np
           FROM {tag}f GROUP BY user_id, seg),
{tag}k AS (SELECT user_id, seg,
          CAST(sc AS DOUBLE) / (100.0 * CAST(np AS DOUBLE))
            AS paa_value,
          np AS n_points
        FROM {tag}s)
"""


_PAA_CTES = _paa_ctes(8, "ts")

SQL_TS_PAA = (
    "WITH " + _PAA_CTES
    + " SELECT user_id, seg, paa_value, n_points FROM tsk"
)


def ts_similarity_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most similar user series to user 0 by squared PAA
    distance (operators/timeseries.py ts_similarity_topk)."""
    from ..operators.timeseries import ts_similarity_topk

    return ts_similarity_topk(_events(spark, sf_dir))


SQL_TS_SIMILARITY = (
    "WITH " + _PAA_CTES + ", "
    "tq AS (SELECT seg, paa_value AS q_value FROM tsk WHERE user_id = 0), "
    "td AS (SELECT s.user_id, "
    "sum((s.paa_value - q_value) * (s.paa_value - q_value) "
    "    ORDER BY s.seg) AS dist2 "
    "FROM tsk s JOIN tq USING (seg) WHERE s.user_id <> 0 "
    "GROUP BY s.user_id) "
    "SELECT user_id, dist2, "
    "CAST(row_number() OVER (ORDER BY dist2 ASC, user_id ASC) "
    "     AS INTEGER) AS rank "
    "FROM td ORDER BY dist2 ASC, user_id ASC LIMIT 10"
)


def ts_similarity_refined_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAA-shortlist + grid-resolution exact re-rank: top-10 series
    nearest user 0, coarse 8-segment prune to a 40-user shortlist,
    refined at 32 cells (operators/timeseries.py
    ts_similarity_refined)."""
    from ..operators.timeseries import ts_similarity_refined

    return ts_similarity_refined(_events(spark, sf_dir))


SQL_TS_SIMILARITY_REFINED = (
    "WITH " + _PAA_CTES + ", " + _paa_ctes(32, "fg") + ", "
    "tq AS (SELECT seg, paa_value AS q_value FROM tsk WHERE user_id = 0), "
    "td AS (SELECT s.user_id, "
    "sum((s.paa_value - q_value) * (s.paa_value - q_value) "
    "    ORDER BY s.seg) AS dist2 "
    "FROM tsk s JOIN tq USING (seg) WHERE s.user_id <> 0 "
    "GROUP BY s.user_id), "
    "cand AS (SELECT user_id, dist2 AS paa_dist2 FROM td "
    "ORDER BY dist2 ASC, user_id ASC LIMIT 40), "
    "fq AS (SELECT seg, paa_value AS q_value FROM fgk WHERE user_id = 0), "
    "fd AS (SELECT f.user_id, "
    "sum((f.paa_value - q_value) * (f.paa_value - q_value) "
    "    ORDER BY f.seg) AS dist2 "
    "FROM fgk f JOIN fq USING (seg) "
    "JOIN cand c ON f.user_id = c.user_id "
    "GROUP BY f.user_id) "
    "SELECT c.user_id, c.paa_dist2, f.dist2, "
    "CAST(row_number() OVER (ORDER BY f.dist2 ASC, f.user_id ASC) "
    "     AS INTEGER) AS rank "
    "FROM fd f JOIN cand c USING (user_id) "
    "ORDER BY f.dist2 ASC, f.user_id ASC LIMIT 10"
)


def ts_sax_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX words per user series — the symbol tier of an iSAX index
    (operators/timeseries.py ts_sax)."""
    from ..operators.timeseries import ts_sax

    return ts_sax(_events(spark, sf_dir))


# The ONE symbol expression both SAX oracles share (word builder +
# symbol-tier search): the cross-multiplied-cents comparison
# (mean >= b  <=>  sc >= b_cents * n) — no float exists anywhere.
def _sax_sym_expr() -> str:
    from ..operators.timeseries import SAX_BREAKS_CENTS

    return " + ".join(
        f"(CASE WHEN sc >= {int(b)} * np THEN 1 ELSE 0 END)"
        for b in SAX_BREAKS_CENTS
    )


# SAX CTEs: built on _paa_ctes' shared exact-sums base ({tag}s — the
# one segmentation definition).
def _sax_ctes() -> str:
    sym = _sax_sym_expr()
    return (
        _paa_ctes(8, "sx")
        + f""",
sxw AS (SELECT user_id,
               string_agg(CAST(({sym}) AS VARCHAR), '' ORDER BY seg)
                 AS sax_word
        FROM sxs GROUP BY user_id)
"""
    )


def _sax_card() -> int:
    from ..operators.timeseries import SAX_BREAKS_CENTS

    return len(SAX_BREAKS_CENTS) + 1


SQL_TS_SAX = (
    "WITH "
    + _sax_ctes()
    + f" SELECT user_id, sax_word, CAST({_sax_card()} AS INTEGER)"
    " AS card FROM sxw"
)


def ts_sax_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-singleton iSAX leaves: users grouped by identical SAX word
    (operators/timeseries.py ts_sax_group)."""
    from ..operators.timeseries import ts_sax_group

    return ts_sax_group(_events(spark, sf_dir))


SQL_TS_SAX_GROUP = (
    "WITH "
    + _sax_ctes()
    + """
SELECT sax_word, CAST(count(*) AS BIGINT) AS n_users,
       min(user_id) AS min_user
FROM sxw GROUP BY sax_word HAVING count(*) >= 2
"""
)


def ts_similarity_sax_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbol-tier iSAX search: MINDIST prune + exact PAA re-rank
    (operators/timeseries.py ts_similarity_sax_topk)."""
    from ..operators.timeseries import ts_similarity_sax_topk

    return ts_similarity_sax_topk(_events(spark, sf_dir))


def _sql_ts_sax_topk() -> str:
    from ..operators.timeseries import SAX_BREAKS_CENTS

    blist = "[" + ", ".join(
        f"CAST({int(b)} AS BIGINT)" for b in SAX_BREAKS_CENTS
    ) + "]"
    return (
        "WITH "
        + _paa_ctes(8, "sx")
        + f""",
sxy AS (SELECT user_id, seg, ({_sax_sym_expr()}) AS sym FROM sxs),
sq AS (SELECT seg, sym AS q_sym FROM sxy WHERE user_id = 0),
mdc AS (SELECT s.user_id,
  CASE WHEN greatest(s.sym, q_sym) - least(s.sym, q_sym) <= 1
    THEN CAST(0 AS BIGINT)
    ELSE {blist}[greatest(s.sym, q_sym)]
         - {blist}[least(s.sym, q_sym) + 1] END AS cell
  FROM sxy s JOIN sq USING (seg) WHERE s.user_id <> 0),
md AS (SELECT user_id, CAST(sum(cell * cell) AS BIGINT) AS mindist2
       FROM mdc GROUP BY user_id),
cand AS (SELECT user_id, mindist2 FROM md
         ORDER BY mindist2 ASC, user_id ASC LIMIT 40),
pq AS (SELECT seg, paa_value AS q_value FROM sxk WHERE user_id = 0),
pd AS (SELECT s.user_id,
  sum((s.paa_value - q_value) * (s.paa_value - q_value)
      ORDER BY s.seg) AS dist2
  FROM sxk s JOIN pq USING (seg)
  JOIN cand c ON s.user_id = c.user_id
  GROUP BY s.user_id)
SELECT c.user_id, c.mindist2, d.dist2,
  CAST(row_number() OVER (ORDER BY d.dist2 ASC, d.user_id ASC)
       AS INTEGER) AS rank
FROM pd d JOIN cand c USING (user_id)
ORDER BY d.dist2 ASC, d.user_id ASC LIMIT 10
"""
    )


SQL_TS_SAX_TOPK = _sql_ts_sax_topk()


def ts_similarity_dtw_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elastic tier of the series-search ladder: LB_Keogh-pruned
    banded DTW top-10 around user 0 at 16 grid cells, band radius 2,
    40-candidate shortlist (operators/timeseries.py
    ts_similarity_dtw_topk)."""
    from ..operators.timeseries import ts_similarity_dtw_topk

    return ts_similarity_dtw_topk(_events(spark, sf_dir))


def _sql_ts_dtw_topk(
    grid: int = 16, band: int = 2, shortlist: int = 40, k: int = 10
) -> str:
    """DuckDB twin of the DTW tier. The DP runs as ONE recursive CTE
    in (i, j) lexicographic order carrying the previous and current
    DP rows as LIST(DOUBLE) — each step evaluates EXACTLY the Spark
    UDF's cell formula (cs[i]-q[j])^2 + least(prev-up, prev-diag,
    cur-left) in the same operation order, so dtw2 is bit-identical.
    Out-of-band cells stay at the same +Infinity sentinel both
    engines use; the envelope is a seg-range window min/max (picks
    existing doubles — exact); the LB fold is an ORDER BY seg sum
    (bit-stable)."""
    g1 = grid + 1
    inf = "'Infinity'::DOUBLE"
    inf_row = f"list_transform(range({g1}), x -> {inf})"
    zero_row = (
        f"list_transform(range({g1}), "
        f"x -> CASE WHEN x = 0 THEN 0.0 ELSE {inf} END)"
    )
    hi = f"LEAST({grid}, i + {band})"
    # Index map (SQL carries j = nj - 1 for the DP column nj being
    # filled): 1-based list index of 0-based DP position p is p + 1,
    # so dp[i-1][nj] = prev[j + 2], dp[i-1][nj-1] = prev[j + 1],
    # dp[i][nj-1] = cur[j + 1], and the query cell q[nj] = q[j + 1].
    cell = (
        "((cs[i] - q[j + 1]) * (cs[i] - q[j + 1]))"
        " + least(prev[j + 2], prev[j + 1], cur[j + 1])"
    )
    return (
        "WITH RECURSIVE "
        + _paa_ctes(grid, "dw")
        + f""",
qg AS (SELECT seg, paa_value FROM dwk WHERE user_id = 0),
qe AS (SELECT seg,
         max(paa_value) OVER (ORDER BY seg RANGE BETWEEN {band}
           PRECEDING AND {band} FOLLOWING) AS u,
         min(paa_value) OVER (ORDER BY seg RANGE BETWEEN {band}
           PRECEDING AND {band} FOLLOWING) AS l
       FROM qg),
lbc AS (SELECT s.user_id, s.seg,
          CASE WHEN s.paa_value > e.u
                 THEN (s.paa_value - e.u) * (s.paa_value - e.u)
               WHEN s.paa_value < e.l
                 THEN (e.l - s.paa_value) * (e.l - s.paa_value)
               ELSE 0.0 END AS c
        FROM dwk s JOIN qe e USING (seg) WHERE s.user_id <> 0),
lb AS (SELECT user_id, sum(c ORDER BY seg) AS lb2
       FROM lbc GROUP BY user_id),
cand AS (SELECT user_id, lb2 FROM lb
         ORDER BY lb2 ASC, user_id ASC LIMIT {shortlist}),
qa AS (SELECT array_agg(paa_value ORDER BY seg) AS q FROM qg),
ca AS (SELECT c.user_id, array_agg(s.paa_value ORDER BY s.seg) AS cs
       FROM dwk s JOIN cand c USING (user_id) GROUP BY c.user_id),
rec AS (
  SELECT user_id, cs, q, 1 AS i,
         GREATEST(1, 1 - {band}) - 1 AS j,
         {zero_row} AS prev, {inf_row} AS cur
  FROM ca, qa
  UNION ALL
  SELECT user_id, cs, q,
    CASE WHEN j < {hi} THEN i ELSE i + 1 END,
    CASE WHEN j < {hi} THEN j + 1
         ELSE GREATEST(1, i + 1 - {band}) - 1 END,
    CASE WHEN j < {hi} THEN prev ELSE cur END,
    CASE WHEN j < {hi} THEN
      list_transform(range({g1}),
        x -> CASE WHEN x = j + 1 THEN {cell} ELSE cur[x + 1] END)
    ELSE {inf_row} END
  FROM rec WHERE NOT (i = {grid} AND j >= {hi})
),
dtw AS (SELECT user_id, cur[{g1}] AS dtw2
        FROM rec WHERE i = {grid} AND j = {grid})
SELECT c.user_id, c.lb2, d.dtw2,
  CAST(row_number() OVER (ORDER BY d.dtw2 ASC, d.user_id ASC)
       AS INTEGER) AS rank
FROM dtw d JOIN cand c USING (user_id)
ORDER BY d.dtw2 ASC, d.user_id ASC LIMIT {k}
"""
    )


SQL_TS_DTW_TOPK = _sql_ts_dtw_topk()


def ts_motif_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series motif discovery: closest non-trivial pair of 8-cell
    subsequences within each user's 32-cell grid representation
    (operators/timeseries.py ts_motif)."""
    from ..operators.timeseries import ts_motif

    return ts_motif(_events(spark, sf_dir))


def _sql_ts_motif(grid: int = 32, m: int = 8, exclusion: int = 4) -> str:
    """DuckDB twin of ts_motif: same grid cells (_paa_ctes), candidate
    pairs from two range() laterals with the exclusion-zone filter,
    the per-pair distance as an ORDER BY o sum over the offset range
    (left-to-right — matching Spark's fold over a literal sequence
    exactly), winner per series via QUALIFY row_number."""
    s = grid - m + 1
    sq = "(cells[a + o + 1] - cells[b + o + 1])"
    return (
        "WITH "
        + _paa_ctes(grid, "mp")
        + f""",
ma AS (SELECT user_id, array_agg(paa_value ORDER BY seg) AS cells
       FROM mpk GROUP BY user_id),
pr AS (SELECT user_id, cells, r1.a, r2.b
       FROM ma, range(0, {s}) r1(a), range(0, {s}) r2(b)
       WHERE r2.b - r1.a > {exclusion}),
dv AS (SELECT user_id, a, b,
         sum({sq} * {sq} ORDER BY o) AS dist2
       FROM pr, range(0, {m}) r3(o)
       GROUP BY user_id, a, b)
SELECT user_id, CAST(a AS BIGINT) AS start_a,
       CAST(b AS BIGINT) AS start_b, dist2
FROM dv
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY dist2 ASC, a ASC, b ASC) = 1
"""
    )


SQL_TS_MOTIF = _sql_ts_motif()


def ts_discord_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series discord discovery: the 8-cell subsequence of each
    user's 32-cell grid representation whose nearest non-trivial
    neighbor is farthest (operators/timeseries.py ts_discord)."""
    from ..operators.timeseries import ts_discord

    return ts_discord(_events(spark, sf_dir))


def _sql_ts_discord(grid: int = 32, m: int = 8, exclusion: int = 4) -> str:
    """DuckDB twin of ts_discord: same grid cells (_paa_ctes),
    partner pairs from two range() laterals with the two-sided
    exclusion filter, per-pair distance as an ORDER BY o sum
    (matching Spark's inner offset fold exactly), nearest neighbor
    via a min aggregate (order-insensitive over bit-identical sums,
    so it matches Spark's running-min fold), discord per series via
    QUALIFY row_number on (nn_dist2 DESC, a ASC)."""
    s = grid - m + 1
    sq = "(cells[a + o + 1] - cells[b + o + 1])"
    return (
        "WITH "
        + _paa_ctes(grid, "dc")
        + f""",
da AS (SELECT user_id, array_agg(paa_value ORDER BY seg) AS cells
       FROM dck GROUP BY user_id),
pr AS (SELECT user_id, cells, r1.a, r2.b
       FROM da, range(0, {s}) r1(a), range(0, {s}) r2(b)
       WHERE abs(r2.b - r1.a) > {exclusion}),
dv AS (SELECT user_id, a, b,
         sum({sq} * {sq} ORDER BY o) AS d2
       FROM pr, range(0, {m}) r3(o)
       GROUP BY user_id, a, b),
nn AS (SELECT user_id, a, min(d2) AS nn_dist2
       FROM dv GROUP BY user_id, a)
SELECT user_id, CAST(a AS BIGINT) AS start, nn_dist2
FROM nn
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY nn_dist2 DESC, a ASC) = 1
"""
    )


SQL_TS_DISCORD = _sql_ts_discord()


def bpe_pair_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-character pair frequencies over the corpus
    vocabulary, word-frequency weighted — the first BPE merge
    decision's statistic (operators/textstats.py bpe_pair_counts)."""
    return tx.bpe_pair_counts(_docs(spark, sf_dir))


SQL_BPE_PAIR_COUNTS = """
WITH w AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents),
wf AS (SELECT word, CAST(count(*) AS BIGINT) AS w_count
       FROM w GROUP BY word),
p AS (SELECT unnest(list_transform(range(1, length(word)),
               i -> substring(word, CAST(i AS INTEGER), 2))) AS pair,
             w_count
      FROM wf)
SELECT pair, CAST(sum(w_count) AS BIGINT) AS pair_count
FROM p GROUP BY pair
ORDER BY pair_count DESC, pair ASC LIMIT 50
"""


def bpe_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 6 learned BPE merges as one declarative plan
    (operators/textstats.py bpe_merges)."""
    return tx.bpe_merges(_docs(spark, sf_dir))


def _bpe_ctes(n_merges: int) -> list:
    """The shared BPE CTE chain (see _sql_bpe_merges): vocabulary
    base, delimited symbol rendering, and per-round (pair count ->
    LIMIT-1 argmax -> literal replace). v{n_merges} carries the
    vocabulary with ALL merges applied (the bpe_vocab relation).
    The replace CTE is a LEFT JOIN ON TRUE with a coalesce, NOT a
    cross join: when the vocabulary exhausts its pairs before round
    n, m{r} is empty and a cross join would annihilate v{r} (and
    every later round), emptying the bpe_vocab twin while Spark's
    loop just breaks — the left join carries the vocabulary through
    merge-free rounds unchanged, matching Spark exactly."""
    ctes = ["""w AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents),
wf AS (SELECT word, CAST(count(*) AS BIGINT) AS w_count
       FROM w GROUP BY word),
v0 AS (SELECT word, ' ' || array_to_string(
         list_transform(range(1, length(word) + 1),
                        i -> substring(word, CAST(i AS INTEGER), 1)),
         '  ') || ' ' AS syms, w_count
       FROM wf)"""]
    for r in range(1, n_merges + 1):
        ctes.append(f"""t{r} AS (SELECT string_split(trim(syms), '  ') AS a, w_count
       FROM v{r - 1}),
x{r} AS (SELECT unnest(list_transform(range(1, len(a)),
           i -> struct_pack(l := a[CAST(i AS INTEGER)],
                            r := a[CAST(i AS INTEGER) + 1]))) AS pr,
                w_count
         FROM t{r}),
p{r} AS (SELECT pr.l AS l, pr.r AS r,
                CAST(sum(w_count) AS BIGINT) AS pair_count
         FROM x{r} GROUP BY 1, 2),
m{r} AS (SELECT l, r, pair_count FROM p{r}
         ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1)""")
        ctes.append(f"""v{r} AS (SELECT word, coalesce(replace(syms, ' ' || m.l || '  ' || m.r || ' ',
                           ' ' || m.l || m.r || ' '), syms) AS syms, w_count
       FROM v{r - 1} LEFT JOIN m{r} m ON TRUE)""")
    return ctes


def _sql_bpe_merges(n_merges: int = 6) -> str:
    """DuckDB twin of bpe_merges: the same vocabulary base, the same
    delimited symbol-string representation, and the same per-round
    (pair count -> LIMIT-1 argmax -> literal replace) chain unrolled
    as CTEs — literal left-to-right replace IS the greedy one-pass
    merge in both engines, so every round agrees exactly."""
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS rank, l AS \"left\", "
        f"r AS \"right\", pair_count FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(_bpe_ctes(n_merges)) + "\n" + sel


SQL_BPE_MERGES = _sql_bpe_merges()


def bpe_vocab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 subword tokens (with corpus frequencies) after applying
    the first 6 learned BPE merges (operators/textstats.py
    bpe_vocab)."""
    return tx.bpe_vocab(_docs(spark, sf_dir))


def _sql_bpe_vocab(n_merges: int = 6, k: int = 50) -> str:
    """DuckDB twin of bpe_vocab: the shared merge-chain CTEs, then
    unnest the final vocabulary's symbols weighted by word count."""
    sel = f"""tk AS (SELECT unnest(string_split(trim(syms), '  ')) AS token, w_count
       FROM v{n_merges})
SELECT token, CAST(sum(w_count) AS BIGINT) AS token_count
FROM tk GROUP BY token
ORDER BY token_count DESC, token ASC LIMIT {k}"""
    return "WITH " + ",\n".join(_bpe_ctes(n_merges)) + ",\n" + sel


SQL_BPE_VOCAB = _sql_bpe_vocab()


def ts_changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series CUSUM changepoint location
    (operators/timeseries.py ts_changepoint)."""
    from ..operators.timeseries import ts_changepoint

    return ts_changepoint(_events(spark, sf_dir))


SQL_TS_CHANGEPOINT = """
WITH b AS (
  SELECT user_id,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS pos,
         CAST(sum(CAST(round(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS csum,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id) AS BIGINT) AS sc
  FROM events),
s AS (SELECT user_id, pos, n, n * csum - pos * sc AS sv
      FROM b WHERE pos < n)
SELECT user_id, pos AS cp_pos, n AS n_points,
       CAST(sv AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)) AS cusum
FROM s
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY abs(sv) DESC, pos ASC) = 1
"""


def ts_anomaly_zscore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series exact-decision z-score anomaly flags
    (operators/timeseries.py ts_anomaly_zscore)."""
    from ..operators.timeseries import ts_anomaly_zscore

    return ts_anomaly_zscore(_events(spark, sf_dir))


SQL_TS_ANOMALY_ZSCORE = """
WITH b AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS c,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id) AS BIGINT) AS sc,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id) AS BIGINT) AS ssq
  FROM events),
f AS (SELECT user_id, event_id, c, n, sc, ssq,
        CAST(n AS HUGEINT) * CAST(c AS HUGEINT)
          - CAST(sc AS HUGEINT) AS dev,
        CAST(n AS HUGEINT) * CAST(ssq AS HUGEINT)
          - CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT) AS nvar
      FROM b)
SELECT user_id, event_id,
       (CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(nvar AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS z
FROM f
WHERE nvar > 0 AND dev * dev > 9 * nvar
"""


def ts_corr_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most correlated series pairs, SAX-word-blocked
    (operators/timeseries.py ts_corr_topk)."""
    from ..operators.timeseries import ts_corr_topk

    return ts_corr_topk(_events(spark, sf_dir))


def _sql_ts_corr_topk(
    segments: int = 8, k: int = 20, max_bucket: int = 100
) -> str:
    """DuckDB twin of ts_corr_topk: same SAX-word blocking with the
    bucket-size guard, same sketch cells, the five Pearson components
    as sum(... ORDER BY seg) (componentwise the same left-to-right
    additions as Spark's seg-ordered struct fold), one shared double
    formula for r."""
    return (
        "WITH "
        + _sax_ctes()
        + f""",
cbw AS (SELECT sax_word FROM sxw GROUP BY sax_word
        HAVING count(*) BETWEEN 2 AND {max_bucket}),
cu AS (SELECT w.user_id, w.sax_word, s.seg, s.paa_value
       FROM sxw w JOIN cbw USING (sax_word)
       JOIN sxk s ON s.user_id = w.user_id),
cp AS (SELECT a.user_id AS ua, b.user_id AS ub, a.seg,
              a.paa_value AS x, b.paa_value AS y
       FROM cu a JOIN cu b
         ON a.sax_word = b.sax_word AND a.seg = b.seg
        AND a.user_id < b.user_id),
cc AS (SELECT ua, ub,
         sum(x ORDER BY seg) AS sx, sum(y ORDER BY seg) AS sy,
         sum(x * x ORDER BY seg) AS sxx,
         sum(y * y ORDER BY seg) AS syy,
         sum(x * y ORDER BY seg) AS sxy
       FROM cp GROUP BY ua, ub)
SELECT ua AS user_a, ub AS user_b,
       ({segments} * sxy - sx * sy)
         / (sqrt({segments} * sxx - sx * sx)
            * sqrt({segments} * syy - sy * sy)) AS corr
FROM cc
WHERE {segments} * sxx - sx * sx > 0
  AND {segments} * syy - sy * sy > 0
ORDER BY corr DESC, user_a ASC, user_b ASC
LIMIT {k}
"""
    )


SQL_TS_CORR_TOPK = _sql_ts_corr_topk()


def dq_drift_psi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type PSI drift between the first and second half of
    the event log (operators/warehouse.py dq_drift_psi)."""
    from ..operators.warehouse import dq_drift_psi

    return dq_drift_psi(_events(spark, sf_dir))


def _sql_dq_drift_psi(buckets: int = 10) -> str:
    """DuckDB twin of dq_drift_psi: same exact integer midpoint
    split, same integer equal-width bucket assignment against the
    type's FULL-LOG bounds, Laplace-smoothed shares, PSI terms added
    in bucket order (left-associated, matching Spark's unrolled
    sum). Types with no reference rows drop via the n_ref > 0
    filter."""
    bb = int(buckets)
    rsum = ", ".join(
        f"CAST(sum(CASE WHEN side = 0 AND bucket = {i} THEN cnt "
        f"ELSE 0 END) AS BIGINT) AS r{i}"
        for i in range(bb)
    )
    csum = ", ".join(
        f"CAST(sum(CASE WHEN side = 1 AND bucket = {i} THEN cnt "
        f"ELSE 0 END) AS BIGINT) AS c{i}"
        for i in range(bb)
    )

    def share(col: str, n: str) -> str:
        return f"((CAST({col} AS DOUBLE) + 1.0) / (CAST({n} AS DOUBLE) + {float(bb)}))"

    terms = " + ".join(
        f"(({share(f'r{i}', 'n_ref')}) - ({share(f'c{i}', 'n_cur')})) "
        f"* ln(({share(f'r{i}', 'n_ref')}) / ({share(f'c{i}', 'n_cur')}))"
        for i in range(bb)
    )
    return f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
md AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
sd AS (SELECT event_type, c,
              CASE WHEN us < md.mid THEN 0 ELSE 1 END AS side
       FROM e, md),
bo AS (SELECT event_type, min(c) AS lo, max(c) AS hi
       FROM e GROUP BY event_type),
bk AS (SELECT s.event_type, s.side,
              least(greatest(((s.c - bo.lo) * {bb})
                             // (bo.hi - bo.lo + 1), 0), {bb - 1})
                AS bucket
       FROM sd s JOIN bo USING (event_type)),
ct AS (SELECT event_type, side, bucket,
              CAST(count(*) AS BIGINT) AS cnt
       FROM bk GROUP BY 1, 2, 3),
pv AS (SELECT event_type,
         CAST(sum(CASE WHEN side = 0 THEN cnt ELSE 0 END) AS BIGINT)
           AS n_ref,
         CAST(sum(CASE WHEN side = 1 THEN cnt ELSE 0 END) AS BIGINT)
           AS n_cur,
         {rsum}, {csum}
       FROM ct GROUP BY event_type)
SELECT event_type, 0.0 + {terms} AS psi, n_ref, n_cur
FROM pv
WHERE n_ref > 0
"""


SQL_DQ_DRIFT_PSI = _sql_dq_drift_psi()


def stream_anomaly_screen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly screen against a batch-trained profile —
    same exact flag decision as ts_anomaly_zscore, so it shares its
    oracle (streaming/diagnostics.py anomaly_screen_stream)."""
    from ..streaming.diagnostics import anomaly_screen_stream

    return anomaly_screen_stream(spark, sf_dir)


def ts_seasonality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series hour-of-day seasonality strength and peak hour
    (operators/timeseries.py ts_seasonality)."""
    from ..operators.timeseries import ts_seasonality

    return ts_seasonality(_events(spark, sf_dir))


SQL_TS_SEASONALITY = """
WITH g AS (
  SELECT user_id, CAST(hour(ts) AS INTEGER) AS h,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc_h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ssq_h
  FROM events GROUP BY user_id, CAST(hour(ts) AS INTEGER)),
u AS (SELECT user_id,
        CAST(sum(n_h) AS BIGINT) AS n,
        CAST(sum(sc_h) AS BIGINT) AS sc,
        CAST(sum(ssq_h) AS BIGINT) AS ssq,
        sum(CAST(ssq_h AS DOUBLE)
            - (CAST(sc_h AS DOUBLE) * CAST(sc_h AS DOUBLE))
              / CAST(n_h AS DOUBLE) ORDER BY h) AS sse
      FROM g GROUP BY user_id),
pk AS (SELECT user_id, h FROM g
       QUALIFY row_number() OVER (
         PARTITION BY user_id
         ORDER BY CAST(sc_h AS DOUBLE) / CAST(n_h AS DOUBLE) DESC,
                  h ASC) = 1)
SELECT u.user_id, CAST(pk.h AS INTEGER) AS peak_hour,
       1.0 - u.sse / (CAST(u.ssq AS DOUBLE)
                      - (CAST(u.sc AS DOUBLE) * CAST(u.sc AS DOUBLE))
                        / CAST(u.n AS DOUBLE)) AS strength,
       u.n AS n_points
FROM u JOIN pk USING (user_id)
WHERE CAST(u.n AS HUGEINT) * CAST(u.ssq AS HUGEINT)
      - CAST(u.sc AS HUGEINT) * CAST(u.sc AS HUGEINT) > 0
"""


def skew_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest user_id keys in events with corpus share — the
    pre-join skew probe (operators/skew.py skew_profile)."""
    from ..operators.skew import skew_profile

    return skew_profile(_events(spark, sf_dir), "user_id", top_n=20)


SQL_SKEW_PROFILE = """
WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
           FROM events GROUP BY user_id),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tt FROM c)
SELECT user_id, n_rows,
  CAST(n_rows AS DOUBLE) / CAST(tt AS DOUBLE) AS share
FROM c CROSS JOIN t
ORDER BY n_rows DESC, user_id ASC LIMIT 20
"""


def normalize_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization pass
    (operators/textstats.py normalize_text)."""
    return tx.normalize_text(_docs(spark, sf_dir))


def _norm_sql(col: str) -> str:
    from ..operators.textstats import ACCENT_DST, ACCENT_SRC

    return (
        "trim(regexp_replace(translate(lower("
        + col
        + f"), '{ACCENT_SRC}', '{ACCENT_DST}'), '[^a-z0-9]+', ' ', 'g'))"
    )


SQL_NORMALIZE_TEXT = (
    "SELECT doc_id, "
    + _norm_sql("text")
    + " AS norm_text FROM documents"
)


def dedup_normalized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over normalized text
    (operators/textstats.py dedup_normalized). The synthetic corpus
    has zero byte-identical duplicates, so the query unions in an
    UPPERCASED, punctuation-suffixed copy of every 25th document —
    exactly the variant class raw md5(text) dedup calls distinct and
    this operator collapses (n_variants = 2 per planted group)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    variants = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit(" !!")).alias("text"),
    )
    return tx.dedup_normalized(d.unionByName(variants))


SQL_DEDUP_NORMALIZED = (
    "WITH u AS (SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 10000000, upper(text) || ' !!' "
    "FROM documents WHERE doc_id % 25 = 0), "
    "n AS (SELECT doc_id, " + _norm_sql("text") + " AS norm_text "
    "FROM u) "
    "SELECT md5(norm_text) AS norm_hash, "
    "CAST(count(*) AS BIGINT) AS n_variants, min(doc_id) AS keep_doc_id "
    "FROM n WHERE norm_text <> '' GROUP BY 1 HAVING count(*) >= 2"
)


def stream_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless streaming near-dup ingest screen: row-local band keys
    probed against the existing corpus's static band index
    (streaming/dedup.py neardup_screen_stream)."""
    from ..streaming.dedup import neardup_screen_stream

    return neardup_screen_stream(spark, sf_dir)


SQL_STREAM_NEARDUP = (
    "WITH " + _minhash_band_ctes() + ", "
    "nidx AS (SELECT doc_id AS dup_of, band, key FROM bands "
    "WHERE doc_id % 10 <> 0), "
    "nn AS (SELECT doc_id, band, key FROM bands WHERE doc_id % 10 = 0) "
    "SELECT n.doc_id, n.band, i.dup_of "
    "FROM nn n JOIN nidx i USING (band, key)"
)


def bm25_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 per (doc, term) over the documents table
    (operators/textstats.py bm25)."""
    return tx.bm25(_docs(spark, sf_dir))


_BM25_CTES = r"""
toks AS (
  SELECT doc_id, u.term FROM documents,
    UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                       x -> x <> '')) AS u(term)
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
wtf AS (SELECT doc_id, term, tf,
          CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
          CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
        FROM tf),
dld AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
        FROM tf GROUP BY doc_id),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(dl) AS BIGINT) AS total_len FROM dld),
sc AS (SELECT doc_id, term, tf, df,
  ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
           / (CAST(df AS DOUBLE) + 0.5))
  * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
     / (CAST(tf AS DOUBLE)
        + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl AS DOUBLE)
                        / (CAST(total_len AS DOUBLE)
                           / CAST(n_docs AS DOUBLE))))) AS bm25
FROM wtf CROSS JOIN st)
"""

SQL_BM25 = (
    "WITH " + _BM25_CTES + " SELECT doc_id, term, tf, df, bm25 FROM sc"
)


def lm_bigram_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram log-probability per doc under the corpus's own
    add-one-smoothed bigram model (operators/textstats.py
    lm_bigram_score)."""
    return tx.lm_bigram_score(_docs(spark, sf_dir))


SQL_LM_BIGRAM = r"""
WITH b AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
                             x -> x <> '') AS arr
  FROM documents
),
pairs AS (SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
          FROM b, UNNEST(range(1, len(arr))) AS r(i)),
tfb AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf
        FROM pairs GROUP BY doc_id, w1, w2),
c12 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12
        FROM tfb GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c1),
pd AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         sum(CAST(tf AS DOUBLE)
             * ln((CAST(c12 AS DOUBLE) + 1.0)
                  / (CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE)))) AS s
       FROM tfb JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
       CROSS JOIN v GROUP BY doc_id)
SELECT doc_id, n_bigrams,
  s / CAST(n_bigrams AS DOUBLE) AS avg_logprob
FROM pd
"""


def similarity_join_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy cross-corpus decontamination screen: LSH similarity join
    of the corpus (doc_id % 10 != 0) against a benchmark stand-in
    (doc_id % 10 == 0; a tenth of the corpus, dense enough that the
    value gate sees real collisions), probe side broadcast
    (operators/dedup.py lsh_similarity_join)."""
    d = _docs(spark, sf_dir)
    return dd.lsh_similarity_join(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
    )


SQL_SIMILARITY_JOIN_MINHASH = (
    "WITH " + _minhash_band_ctes() + ", "
    "cb AS (SELECT * FROM bands WHERE doc_id % 10 <> 0), "
    "pb AS (SELECT * FROM bands WHERE doc_id % 10 = 0) "
    "SELECT c.doc_id AS corpus_doc, p.doc_id AS probe_doc, "
    "CAST(count(DISTINCT c.band) AS BIGINT) AS n_bands "
    "FROM cb c JOIN pb p ON c.band = p.band AND c.key = p.key "
    "GROUP BY c.doc_id, p.doc_id"
)


def dedup_jaccard_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature-agreement Jaccard estimate for every LSH
    candidate pair — the cheap verification tier
    (operators/dedup.py minhash_jaccard_estimate)."""
    d = _docs(spark, sf_dir)
    return dd.minhash_jaccard_estimate(d, dd.minhash_candidate_pairs(d))


_AGREE_SQL = " + ".join(
    f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)"
    for i in range(dd.NUM_HASHES)
)

SQL_DEDUP_JACCARD_ESTIMATE = (
    "WITH " + _PAIR_CTES + " "
    "SELECT p.doc_a, p.doc_b, "
    f"CAST(({_AGREE_SQL}) AS DOUBLE) / {float(dd.NUM_HASHES)} "
    "AS est_jaccard "
    "FROM pairs p JOIN sig a ON a.doc_id = p.doc_a "
    "JOIN sig b ON b.doc_id = p.doc_b"
)


def split_no_leakage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-grouped train/val/test split: near-dup clusters never
    straddle the train/test boundary
    (operators/curation.py split_no_leakage)."""
    return cu.split_no_leakage(_docs(spark, sf_dir))


def _hash32_sql(expr: str) -> str:
    """Engine-portable 32-bit hash of an integer SQL expression: digit
    value of the first 8 md5 hex chars — the DuckDB mirror of
    curation._id_hash32 for arbitrary expressions."""
    return " + ".join(
        "(strpos('0123456789abcdef', "
        f"substr(md5(CAST({expr} AS VARCHAR)), {i + 1}, 1)) - 1)"
        + f" * {16 ** (8 - i - 1)}"
        for i in range(8)
    )


SQL_SPLIT_NO_LEAKAGE = (
    "WITH RECURSIVE " + _PAIR_CTES + ", "
    "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs), "
    "reach(src, dst) AS (SELECT src, dst FROM edges "
    "UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), "
    "comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component_id "
    "FROM reach GROUP BY src) "
    "SELECT d.doc_id, CASE WHEN ("
    + _hash32_sql("coalesce(c.component_id, d.doc_id)")
    + ") % 100 < 90 THEN 'train' WHEN ("
    + _hash32_sql("coalesce(c.component_id, d.doc_id)")
    + ") % 100 < 95 THEN 'val' ELSE 'test' END AS split "
    "FROM documents d LEFT JOIN comp c USING (doc_id)"
)


def winnowing_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints over documents
    (operators/textstats.py winnowing_fingerprint)."""
    return tx.winnowing_fingerprint(_docs(spark, sf_dir))


# Polynomial gram hash mirroring winnowing_fingerprint: codepoint
# array once, then (c[i]*257^4 + ... + c[i+4]) mod 2^31, scrambled
# by the odd-constant multiply (a bijection mod 2^31 — without it
# window minima cluster on space-led grams). Unreduced sum < 2^53,
# mix product < 2^63 — exact BIGINT on both engines.
_WINNOW_POLY = " + ".join(
    f"c[i+{j}] * {257 ** (5 - 1 - j)}" if j else f"c[i] * {257 ** 4}"
    for j in range(5)
)

_WINNOW_CTES = f"""
wb AS (SELECT doc_id, lower(text) AS t FROM documents),
wc AS (SELECT doc_id, len(t) AS n,
        CASE WHEN len(t) = 0 THEN [CAST(0 AS BIGINT)]
          ELSE list_transform(range(1, len(t) + 1),
                 p -> CAST(ascii(substr(t, p, 1)) AS BIGINT)) END AS c
      FROM wb),
wh AS (SELECT doc_id,
        CASE WHEN n >= 5
          THEN list_transform(range(1, n - 3),
                 i -> ({_WINNOW_POLY}) % 2147483648
                      * 2654435761 % 2147483648)
          ELSE [list_reduce(c,
                 (acc, x) -> (acc * 257 + x) % 2147483648)
                * 2654435761 % 2147483648] END AS harr
      FROM wc),
wf AS (SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(harr) - 3, 1) + 1),
          j -> list_min(harr[j:j+3]))) AS fps
      FROM wh),
wfp AS (SELECT doc_id, u.fp FROM wf, UNNEST(fps) AS u(fp))
"""

SQL_WINNOWING = "WITH " + _WINNOW_CTES + " SELECT doc_id, fp FROM wfp"


def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed query {vector, merge, stream}
    by summed BM25 (operators/textstats.py bm25_topk)."""
    return tx.bm25_topk(
        _docs(spark, sf_dir), ["vector", "merge", "stream"], k=20
    )


SQL_BM25_TOPK = (
    "WITH " + _BM25_CTES + ", "
    "q AS (SELECT doc_id, "
    "max(CASE WHEN term = 'vector' THEN bm25 END) AS s0, "
    "max(CASE WHEN term = 'merge' THEN bm25 END) AS s1, "
    "max(CASE WHEN term = 'stream' THEN bm25 END) AS s2 "
    "FROM sc WHERE term IN ('vector', 'merge', 'stream') "
    "GROUP BY doc_id) "
    "SELECT doc_id, "
    "coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0) AS score "
    "FROM q ORDER BY score DESC, doc_id LIMIT 20"
)


def winnowing_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs from winnowing fingerprint overlap
    (operators/dedup.py winnowing_pairs). min_shared=40 is calibrated
    to this synthetic corpus: its ~30-word vocabulary makes every doc
    pair share a handful of 8-char runs (background tail reaches
    n_shared=37 under the mixed polynomial hash), while true
    near-dups sit at 48+ — a real-text corpus would use a far lower
    threshold."""
    return dd.winnowing_pairs(_docs(spark, sf_dir), min_shared=40)


SQL_WINNOWING_PAIRS = (
    "WITH " + _WINNOW_CTES + ", "
    f"wsz AS (SELECT fp FROM wfp GROUP BY fp "
    f"HAVING count(*) >= 2 AND count(*) <= {dd.MAX_BUCKET}), "
    "wg AS (SELECT w.doc_id, w.fp FROM wfp w JOIN wsz USING (fp)) "
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(count(*) AS BIGINT) AS n_shared "
    "FROM wg a JOIN wg b ON a.fp = b.fp AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 40"
)


EXTENSION_QUERIES = {
    "decontaminate": (decontaminate_q, SQL_DECONTAMINATE),
    "repetition_metrics": (repetition_q, SQL_REPETITION),
    "pii_redact": (pii_redact_q, SQL_PII_REDACT),
    "sample_per_source": (sample_per_source_q, SQL_SAMPLE_PER_SOURCE),
    "winsorize": (winsorize_q, SQL_WINSORIZE),
    "scan_csv": (scan_csv_q, SQL_SCAN_CSV),
    "stream_interval_join": (stream_interval_join, SQL_STREAM_INTERVAL_JOIN),
    "resample_ffill": (resample_ffill_q, SQL_RESAMPLE_FFILL),
    "dq_profile": (dq_profile_q, SQL_DQ_PROFILE),
    "scd2_merge": (scd2_merge_q, SQL_SCD2_MERGE),
    "embed_label_means": (embed_label_means_q, SQL_EMBED_LABEL_MEANS),
    "pipeline_training_corpus": (
        pipeline_training_corpus,
        SQL_PIPELINE_TRAINING_CORPUS,
    ),
    "zorder_values": (zorder_values_q, SQL_ZORDER_VALUES),
    "sink_partitioned": (sink_partitioned_q, SQL_SINK_PARTITIONED),
    "stream_static_join": (stream_static_join_q, SQL_STREAM_STATIC_JOIN),
    "dedup_exact": (dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (dedup_minhash_lsh, SQL_DEDUP_MINHASH),
    "dedup_minhash_lsh_k128": (dedup_minhash_lsh_k128, SQL_DEDUP_MINHASH_K128),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, SQL_DEDUP_JACCARD),
    "dedup_components": (dedup_components, SQL_DEDUP_COMPONENTS),
    "dedup_simhash": (dedup_simhash, SQL_DEDUP_SIMHASH),
    "simsearch_topk": (simsearch_topk, SQL_SIMSEARCH_TOPK),
    "simsearch_topk_pandas": (simsearch_topk_pandas, SQL_SIMSEARCH_TOPK),
    "multimodal_frames": (multimodal_frames, SQL_MULTIMODAL_FRAMES),
    "embed_neardup": (embed_neardup, SQL_EMBED_NEARDUP),
    "embed_quantize": (embed_quantize, SQL_EMBED_QUANTIZE),
    "simsearch_lsh": (simsearch_lsh, SQL_SIMSEARCH_LSH),
    "simsearch_lsh_topk": (simsearch_lsh_topk, SQL_SIMSEARCH_LSH_TOPK),
    "simsearch_ivf_assign": (simsearch_ivf_assign, SQL_IVF_ASSIGN),
    "simsearch_ivf_topk": (simsearch_ivf_topk, SQL_IVF_TOPK),
    "lang_id": (lang_id, SQL_LANG_ID),
    "quality_score": (quality_score, SQL_QUALITY),
    "token_count": (token_count, SQL_TOKEN_COUNT),
    "doc_fingerprint": (doc_fingerprint, SQL_FINGERPRINT),
    "tfidf": (tfidf_q, SQL_TFIDF),
    "window_tumbling": (window_tumbling, SQL_WINDOW_TUMBLING),
    "window_sliding": (window_sliding, SQL_WINDOW_SLIDING),
    "window_session": (window_session, SQL_WINDOW_SESSION),
    "window_range_frame": (window_range_frame, SQL_WINDOW_RANGE),
    "array_scalars": (array_scalars, SQL_ARRAY_SCALARS),
    "asof_join": (asof_purchase_click, SQL_ASOF),
    "asof_tolerance": (asof_tolerance, SQL_ASOF_TOLERANCE),
    "join_range": (join_range, SQL_JOIN_RANGE),
    "stream_tumbling": (stream_tumbling, SQL_WINDOW_TUMBLING),
    "stream_dedup": (stream_dedup, SQL_STREAM_DEDUP),
    "stream_sessionize": (stream_sessionize, SQL_WINDOW_SESSION),
    "stream_chi_square": (stream_chi_square, SQL_STREAM_CHI),
    "pipeline_curation": (pipeline_curation, SQL_PIPELINE_CURATION),
    "multimodal_meta": (multimodal_meta, SQL_MULTIMODAL_META),
    "multimodal_decode": (multimodal_decode, SQL_MULTIMODAL_DECODE),
    "multimodal_resize": (multimodal_resize, SQL_MULTIMODAL_RESIZE),
    # round-3 additions — tail-registered (certification-window rule)
    "join_bucketed": (join_bucketed_q, SQL_JOIN_BUCKETED),
    "ngram_counts": (ngram_counts_q, SQL_NGRAM_COUNTS),
    "join_bloom_prefilter": (join_bloom_prefilter_q, SQL_JOIN_BLOOM),
    "stream_quality_filter": (stream_quality_filter_q, SQL_STREAM_QUALITY),
    "doc_chunk": (doc_chunk_q, SQL_DOC_CHUNK),
    "pack_sequences": (pack_sequences_q, SQL_PACK_SEQUENCES),
    "sink_orc_roundtrip": (sink_orc_roundtrip_q, SQL_SINK_ORC),
    "rollup_multigrain": (rollup_multigrain_q, SQL_ROLLUP_MULTIGRAIN),
    "stream_doc_chunk": (stream_doc_chunk_q, SQL_DOC_CHUNK),
    "explode_outer_keywords": (explode_outer_keywords_q, SQL_EXPLODE_OUTER),
    # round-4 tail additions — queued for the round-5 certification
    # window per the registry rotation protocol (plans/registry.py)
    "pipeline_dedup_corpus": (
        pipeline_dedup_corpus,
        SQL_PIPELINE_DEDUP_CORPUS,
    ),
    "corpus_shard": (corpus_shard_q, SQL_CORPUS_SHARD),
    "corpus_split": (corpus_split_q, SQL_CORPUS_SPLIT),
    "sample_weighted": (sample_weighted_q, SQL_SAMPLE_WEIGHTED),
    "source_temperature": (source_temperature_q, SQL_SOURCE_TEMPERATURE),
    "lm_unigram_score": (lm_unigram_score_q, SQL_LM_UNIGRAM),
    "simsearch_pq_encode": (simsearch_pq_encode_q, SQL_PQ_ENCODE),
    "simsearch_pq_topk": (simsearch_pq_topk_q, SQL_PQ_TOPK),
    "simsearch_pq_refined": (simsearch_pq_refined_q, SQL_PQ_REFINED),
    "dedup_keep_best": (dedup_keep_best_q, SQL_DEDUP_KEEP_BEST),
    "dedup_incremental": (dedup_incremental_q, SQL_DEDUP_INCREMENTAL),
    "asof_nearest": (asof_nearest_q, SQL_ASOF_NEAREST),
    "snapshot_diff": (snapshot_diff_q, SQL_SNAPSHOT_DIFF),
    "corpus_composition": (corpus_composition_q, SQL_CORPUS_COMPOSITION),
    "events_funnel": (events_funnel_q, SQL_EVENTS_FUNNEL),
    "simsearch_ivfpq": (simsearch_ivfpq_q, SQL_IVFPQ),
    "sample_weighted_per_source": (
        sample_weighted_per_source_q,
        SQL_SAMPLE_WEIGHTED_PER_SOURCE,
    ),
    "simsearch_ivfpq_nprobe2": (simsearch_ivfpq_nprobe2_q, SQL_IVFPQ_NPROBE2),
    "dedup_spans": (dedup_spans_q, SQL_DEDUP_SPANS),
    "cross_doc_repetition": (cross_doc_repetition_q, SQL_CROSS_DOC_REPETITION),
    "vocab_topv": (vocab_topv_q, SQL_VOCAB_TOPV),
    "vocab_oov": (vocab_oov_q, SQL_VOCAB_OOV),
    "decontaminate_spans": (decontaminate_spans_q, SQL_DECONTAMINATE_SPANS),
    "tokens_to_ids": (tokens_to_ids_q, SQL_TOKENS_TO_IDS),
    "corpus_cut_spans": (corpus_cut_spans_q, SQL_CORPUS_CUT_SPANS),
    "select_token_budget": (select_token_budget_q, SQL_SELECT_TOKEN_BUDGET),
    "pipeline_span_surgery": (pipeline_span_surgery_q, SQL_PIPELINE_SPAN_SURGERY),
    # round-6 tail additions — queued for the round-7 certification
    # window per the registry rotation protocol (plans/registry.py)
    "bm25_score": (bm25_score_q, SQL_BM25),
    "lm_bigram_score": (lm_bigram_score_q, SQL_LM_BIGRAM),
    "similarity_join_minhash": (
        similarity_join_minhash_q,
        SQL_SIMILARITY_JOIN_MINHASH,
    ),
    "dedup_jaccard_estimate": (
        dedup_jaccard_estimate_q,
        SQL_DEDUP_JACCARD_ESTIMATE,
    ),
    "split_no_leakage": (split_no_leakage_q, SQL_SPLIT_NO_LEAKAGE),
    "winnowing_fingerprint": (winnowing_fingerprint_q, SQL_WINNOWING),
    "bm25_topk": (bm25_topk_q, SQL_BM25_TOPK),
    "winnowing_pairs": (winnowing_pairs_q, SQL_WINNOWING_PAIRS),
    "stream_neardup": (stream_neardup_q, SQL_STREAM_NEARDUP),
    "normalize_text": (normalize_text_q, SQL_NORMALIZE_TEXT),
    "dedup_normalized": (dedup_normalized_q, SQL_DEDUP_NORMALIZED),
    "skew_profile": (skew_profile_q, SQL_SKEW_PROFILE),
    "ts_paa": (ts_paa_q, SQL_TS_PAA),
    "ts_similarity_topk": (ts_similarity_topk_q, SQL_TS_SIMILARITY),
    "ts_similarity_refined": (
        ts_similarity_refined_q,
        SQL_TS_SIMILARITY_REFINED,
    ),
    # round-7 tail additions — queued for the round-8 certification
    # window per the registry rotation protocol (plans/registry.py)
    "ts_sax": (ts_sax_q, SQL_TS_SAX),
    "ts_sax_group": (ts_sax_group_q, SQL_TS_SAX_GROUP),
    "dedup_semantic": (dedup_semantic_q, SQL_DEDUP_SEMANTIC),
    "ts_similarity_sax_topk": (
        ts_similarity_sax_topk_q,
        SQL_TS_SAX_TOPK,
    ),
    # round-8 addition — certified in the round-8 window (same-round
    # promotion per the registry rotation protocol, plans/registry.py)
    "ts_similarity_dtw_topk": (
        ts_similarity_dtw_topk_q,
        SQL_TS_DTW_TOPK,
    ),
    "ts_motif": (ts_motif_q, SQL_TS_MOTIF),
    "ts_discord": (ts_discord_q, SQL_TS_DISCORD),
    "bpe_pair_counts": (bpe_pair_counts_q, SQL_BPE_PAIR_COUNTS),
    "bpe_merges": (bpe_merges_q, SQL_BPE_MERGES),
    "bpe_vocab": (bpe_vocab_q, SQL_BPE_VOCAB),
    "ts_changepoint": (ts_changepoint_q, SQL_TS_CHANGEPOINT),
    "ts_anomaly_zscore": (ts_anomaly_zscore_q, SQL_TS_ANOMALY_ZSCORE),
    "ts_seasonality": (ts_seasonality_q, SQL_TS_SEASONALITY),
    "stream_anomaly_screen": (
        stream_anomaly_screen_q,
        SQL_TS_ANOMALY_ZSCORE,
    ),
    "ts_corr_topk": (ts_corr_topk_q, SQL_TS_CORR_TOPK),
    "dq_drift_psi": (dq_drift_psi_q, SQL_DQ_DRIFT_PSI),
}


# =========================================================================
# Round-9 additions: perceptual image near-dup, embedding similarity
# join, model-based quality score
# =========================================================================

from ..operators import imagehash as ih  # noqa: E402
from ..operators.curation import (  # noqa: E402
    QM_BIAS_MILLI,
    QM_BUCKETS,
    quality_model_score,
)


def _sql_px_cols(src: str = "text") -> str:
    """DuckDB twin of imagehash.sampled_pixel_exprs: the 72 sampled
    code-point columns (same positions, `//` for Spark's `div`)."""
    n = ih.N_PIX
    return ", ".join(
        f"unicode(substr({src}, 1 + ({i} * (length({src}) - 1)) "
        f"// {n - 1}, 1)) AS px{i}"
        for i in range(n)
    )


def _sql_band_cols() -> str:
    """DuckDB twin of imagehash.band_exprs: identical bit lattice."""
    outs = []
    for j in range(ih.N_BANDS):
        terms = []
        for s in range(ih.BAND_BITS):
            b = j * ih.BAND_BITS + s
            r, c = divmod(b, ih.GRID_C)
            a_i = r * (ih.GRID_C + 1) + c
            terms.append(
                f"CASE WHEN px{a_i} < px{a_i + 1} THEN {1 << s} ELSE 0 END"
            )
        outs.append(
            "CAST(" + " + ".join(terms) + f" AS BIGINT) AS b{j}"
        )
    return ", ".join(outs)


def image_phash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit dHash fingerprint per document payload
    (operators/imagehash.py image_phash) — the content-level image
    fingerprint (LAION-style dedup methodology) over the stand-in
    decode."""
    return ih.image_phash(_docs(spark, sf_dir))


SQL_IMAGE_PHASH = f"""
WITH px AS (SELECT doc_id, {_sql_px_cols()}
            FROM documents WHERE length(text) >= 1),
h AS (SELECT doc_id, {_sql_band_cols()} FROM px)
SELECT doc_id, b0, b1, b2, b3,
       lpad(hex(b0), 4, '0') || lpad(hex(b1), 4, '0')
       || lpad(hex(b2), 4, '0') || lpad(hex(b3), 4, '0') AS phash
FROM h
"""


# the perturbed-clone corpus: every 20th payload gets ONE sampled
# pixel (sample index 20) replaced by a far-away code point — flips
# at most the 2 adjacent dHash comparisons, so every planted pair is
# within the max_dist=3 pigeonhole-recall guarantee
_PHASH_P = ih.pixel_pos(20).format(t="text")
_PHASH_P_SQL = _PHASH_P.replace(" div ", " // ")


def _phash_corpus(docs: DataFrame) -> DataFrame:
    pert = (
        f"concat(substring(text, 1, ({_PHASH_P}) - 1), "
        f"CASE WHEN ascii(substring(text, {_PHASH_P}, 1)) > 60 "
        "THEN char(1) ELSE char(120) END, "
        f"substring(text, ({_PHASH_P}) + 1))"
    )
    base = docs.select("doc_id", "text")
    clones = (
        docs.filter((F.col("doc_id") % 20 == 0) & (F.length("text") >= 1))
        .select(
            (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
            F.expr(pert).alias("text"),
        )
    )
    return base.unionByName(clones)


def image_neardup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-Hamming near-duplicate image pairs over a
    perturbed-clone corpus (operators/imagehash.py
    image_neardup_pairs): 25 planted one-pixel-perturbed clones per
    500 docs, every one within the d<=3 pigeonhole recall
    guarantee."""
    hashes = ih.image_phash(_phash_corpus(_docs(spark, sf_dir)))
    return ih.image_neardup_pairs(hashes)


def _sql_phash_clone_select(offset: int, sample_i: int) -> str:
    """One clone arm of the perturbed corpus: payloads of every 20th
    doc with the pixel at sample index `sample_i` replaced by a
    far-away code point (<= 2 dHash bits — inside the pigeonhole
    guarantee)."""
    p = ih.pixel_pos(sample_i).format(t="text").replace(" div ", " // ")
    return (
        f"SELECT doc_id + {offset}, "
        f"substr(text, 1, ({p}) - 1) "
        f"|| (CASE WHEN unicode(substr(text, {p}, 1)) > 60 "
        "THEN chr(1) ELSE chr(120) END) "
        f"|| substr(text, ({p}) + 1) "
        "FROM documents WHERE doc_id % 20 = 0 AND length(text) >= 1"
    )


def _sql_phash_pair_ctes(corpus_sql: str) -> str:
    """The px -> bands -> banded-bucket-join -> Hamming CTE chain over
    any `corpus_sql` (must yield (doc_id, text)); final CTE `d` holds
    (a_id, b_id, hamming) BEFORE the distance filter."""
    return f"""corpus AS ({corpus_sql}),
px AS (SELECT doc_id, {_sql_px_cols()} FROM corpus),
h AS (SELECT doc_id, {_sql_band_cols()} FROM px),
unp AS (SELECT doc_id, b0, b1, b2, b3, u.j AS band_idx,
               CASE u.j WHEN 0 THEN b0 WHEN 1 THEN b1
                        WHEN 2 THEN b2 ELSE b3 END AS band_val
        FROM h, (SELECT unnest([0, 1, 2, 3]) AS j) u),
sized AS (SELECT *, count(*) OVER (PARTITION BY band_idx, band_val)
                 AS sz FROM unp),
keptb AS (SELECT * FROM sized WHERE sz <= {ih.MAX_BUCKET}),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                a.b0 AS a0, a.b1 AS a1, a.b2 AS a2, a.b3 AS a3,
                b.b0 AS c0, b.b1 AS c1, b.b2 AS c2, b.b3 AS c3
         FROM keptb a JOIN keptb b
           ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          AND a.doc_id < b.doc_id),
d AS (SELECT a_id, b_id,
             CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
                  + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3))
                  AS INTEGER) AS hamming
      FROM cand)"""


_SQL_PHASH_CORPUS_1CLONE = (
    "SELECT doc_id, text FROM documents WHERE length(text) >= 1 "
    "UNION ALL " + _sql_phash_clone_select(1_000_000, 20)
)

SQL_IMAGE_NEARDUP_PAIRS = (
    "WITH "
    + _sql_phash_pair_ctes(_SQL_PHASH_CORPUS_1CLONE)
    + " SELECT a_id, b_id, hamming FROM d WHERE hamming <= 3"
)


def similarity_join_embedding_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster-bucketed similarity JOIN between the base embedding
    corpus and a clone-perturbed second corpus (operators/simsearch.py
    similarity_join) — semantic decontamination's shape: every 10th
    vector reappears with dimension 1 shifted by +0.001 (50 planted
    cross-corpus matches per 500 vectors; the synthetic background is
    near-orthogonal, max pair cosine ~0.51, so the planted matches
    are exactly the >= 0.92 hits). Shares the base-table Lloyd fit
    (_km_cents), mirrored CTE-for-CTE in the oracle."""
    emb = _emb(spark, sf_dir)
    e = F.col("embedding")
    left = emb.select(
        "vec_id",
        F.transform(e, lambda x: x.cast("double")).alias("embedding"),
    )
    right = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(2_000_000)).alias("vec_id"),
        F.concat(
            F.array(F.element_at(e, 1).cast("double") + F.lit(0.001)),
            F.transform(
                F.slice(e, 2, ss.DIM - 1), lambda x: x.cast("double")
            ),
        ).alias("embedding"),
    )
    return ss.similarity_join(
        left, right, cents=_km_cents(spark, sf_dir)
    )


SQL_SIMILARITY_JOIN_EMBEDDING = (
    "WITH "
    + _km_cent_ctes()
    + ", lefte AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding "
    "FROM embeddings), "
    "righte AS (SELECT vec_id + 2000000 AS vec_id, "
    "[CAST(embedding[1] AS DOUBLE) + 0.001] || "
    "list_transform(embedding[2:], x -> CAST(x AS DOUBLE)) AS embedding "
    "FROM embeddings WHERE vec_id % 10 = 0), "
    + _km_assign_ctes(f"c{ss.KMEANS_ITERS}", "la", src="lefte")
    + ", "
    + _km_assign_ctes(f"c{ss.KMEANS_ITERS}", "ra", src="righte")
    # cos projected once (no CSE across predicate and projection)
    + ", pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, "
    "a.centroid_id, "
    f"{_cos_sql('a.embedding', 'b.embedding')} AS cos "
    "FROM la a JOIN ra b USING (centroid_id)) "
    "SELECT a_id, b_id, centroid_id, cos FROM pairs WHERE cos >= 0.92"
)


def quality_model_score_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """fastText-architecture hashed-ngram quality score
    (operators/curation.py quality_model_score): tokens + bigrams ->
    md5 feature buckets -> broadcast weight relation -> mean-pooled
    logistic score; keep decision exact-integer."""
    return quality_model_score(_docs(spark, sf_dir))


SQL_QUALITY_MODEL_SCORE = f"""
WITH w AS (SELECT CAST(b AS BIGINT) AS bucket,
       CAST((CAST('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 15)
                 AS BIGINT) % 1001) - 500 AS BIGINT) AS w
     FROM range({QM_BUCKETS}) t(b)),
tl AS (SELECT doc_id,
       list_filter(regexp_split_to_array(lower(text), '{SQL_DELIM}'),
                   x -> x <> '') AS l
       FROM documents),
grams AS (SELECT doc_id, u.g
          FROM tl, UNNEST(l || list_transform(range(1, len(l)),
                   i -> l[i] || '_' || l[i + 1])) AS u(g)),
hit AS (SELECT doc_id,
        CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)
          % {QM_BUCKETS} AS bucket
        FROM grams),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(w.w) AS BIGINT) AS s
        FROM hit JOIN w USING (bucket) GROUP BY doc_id)
SELECT doc_id, n_grams,
  1.0 / (1.0 + exp(-(({QM_BIAS_MILLI}.0
        + CAST(s AS DOUBLE) / CAST(n_grams AS DOUBLE)) / 1000.0)))
    AS quality_model_score,
  ({QM_BIAS_MILLI} * n_grams + s) >= 0 AS keep
FROM per
"""


EXTENSION_QUERIES.update(
    {
        # round-9 additions — promoted into the round-9 certification
        # window (same-round promotion per plans/registry.py protocol)
        "image_phash": (image_phash_q, SQL_IMAGE_PHASH),
        "image_neardup_pairs": (
            image_neardup_pairs_q,
            SQL_IMAGE_NEARDUP_PAIRS,
        ),
        "similarity_join_embedding": (
            similarity_join_embedding_q,
            SQL_SIMILARITY_JOIN_EMBEDDING,
        ),
        "quality_model_score": (
            quality_model_score_q,
            SQL_QUALITY_MODEL_SCORE,
        ),
    }
)


# --- round-9 second batch: image dedup components, ranked similarity
# join, streaming learned filter ------------------------------------------


def _phash_corpus2(docs: DataFrame) -> DataFrame:
    """Base docs + TWO perturbed clones of every 20th doc (different
    sampled pixels) — each clone is <= 2 bits from its base, the two
    clones may sit up to 4 bits APART (beyond max_dist), so the
    3-member group is recovered only through the base: the
    transitivity the components pass exists to provide."""
    base = docs.select("doc_id", "text")
    arms = [base]
    for offset, sample_i in ((1_000_000, 20), (2_000_000, 30)):
        p = ih.pixel_pos(sample_i).format(t="text")
        pert = (
            f"concat(substring(text, 1, ({p}) - 1), "
            f"CASE WHEN ascii(substring(text, {p}, 1)) > 60 "
            "THEN char(1) ELSE char(120) END, "
            f"substring(text, ({p}) + 1))"
        )
        arms.append(
            docs.filter(
                (F.col("doc_id") % 20 == 0) & (F.length("text") >= 1)
            ).select(
                (F.col("doc_id") + F.lit(offset)).alias("doc_id"),
                F.expr(pert).alias("text"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


def image_dedup_components_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Connected components over the image near-dup pair graph — the
    pairs -> components -> survivors pipeline the text dedup tier
    runs, applied to perceptual hashes (operators/dedup.py
    components_over_pairs; the identical label-propagation core).
    Corpus plants 3-member clone groups whose two clones connect only
    THROUGH the base (transitivity). Returns
    (doc_id, component_id, is_kept) for docs in the pair graph."""
    from ..operators.dedup import components_over_pairs

    pairs = ih.image_neardup_pairs(
        ih.image_phash(_phash_corpus2(_docs(spark, sf_dir)))
    ).select(
        F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b")
    )
    comps = components_over_pairs(pairs)
    return comps.select(
        "doc_id",
        "component_id",
        (F.col("doc_id") == F.col("component_id")).alias("is_kept"),
    )


_SQL_PHASH_CORPUS_2CLONE = (
    "SELECT doc_id, text FROM documents WHERE length(text) >= 1 "
    "UNION ALL "
    + _sql_phash_clone_select(1_000_000, 20)
    + " UNION ALL "
    + _sql_phash_clone_select(2_000_000, 30)
)

SQL_IMAGE_DEDUP_COMPONENTS = (
    "WITH RECURSIVE "
    + _sql_phash_pair_ctes(_SQL_PHASH_CORPUS_2CLONE)
    + ", pr AS (SELECT a_id, b_id FROM d WHERE hamming <= 3), "
    "edges AS (SELECT a_id AS src, b_id AS dst FROM pr "
    "UNION SELECT b_id, a_id FROM pr), "
    "reach(src, dst) AS (SELECT src, dst FROM edges "
    "UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src) "
    "SELECT src AS doc_id, least(src, min(dst)) AS component_id, "
    "least(src, min(dst)) = src AS is_kept "
    "FROM reach GROUP BY src"
)


def similarity_join_topk_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ranked variant of the embedding similarity join
    (operators/simsearch.py similarity_join_topk): per clone-corpus
    item, the top-3 nearest base items within its cell — planted
    truth: rank 1 is always the clone's own base vector."""
    emb = _emb(spark, sf_dir)
    e = F.col("embedding")
    left = emb.select(
        "vec_id",
        F.transform(e, lambda x: x.cast("double")).alias("embedding"),
    )
    right = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(2_000_000)).alias("vec_id"),
        F.concat(
            F.array(F.element_at(e, 1).cast("double") + F.lit(0.001)),
            F.transform(
                F.slice(e, 2, ss.DIM - 1), lambda x: x.cast("double")
            ),
        ).alias("embedding"),
    )
    return ss.similarity_join_topk(
        left, right, cents=_km_cents(spark, sf_dir), k=3
    )


SQL_SIMILARITY_JOIN_TOPK = (
    "WITH "
    + _km_cent_ctes()
    + ", lefte AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding "
    "FROM embeddings), "
    "righte AS (SELECT vec_id + 2000000 AS vec_id, "
    "[CAST(embedding[1] AS DOUBLE) + 0.001] || "
    "list_transform(embedding[2:], x -> CAST(x AS DOUBLE)) AS embedding "
    "FROM embeddings WHERE vec_id % 10 = 0), "
    + _km_assign_ctes(f"c{ss.KMEANS_ITERS}", "la", src="lefte")
    + ", "
    + _km_assign_ctes(f"c{ss.KMEANS_ITERS}", "ra", src="righte")
    + ", pairs AS (SELECT b.vec_id AS b_id, a.vec_id AS a_id, "
    f"{_cos_sql('a.embedding', 'b.embedding')} AS cos "
    "FROM la a JOIN ra b USING (centroid_id)), "
    "r AS (SELECT b_id, a_id, cos, CAST(row_number() OVER ("
    "PARTITION BY b_id ORDER BY cos DESC, a_id ASC) AS INTEGER) AS rank "
    "FROM pairs) "
    "SELECT b_id, a_id, cos, rank FROM r WHERE rank <= 3"
)


def stream_quality_model_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming learned quality filter — the row-local scorer
    (streaming/curation.py quality_model_stream) whose output is
    bit-identical to the batch broadcast-join scorer, so it shares
    SQL_QUALITY_MODEL_SCORE as its oracle."""
    from ..streaming.curation import quality_model_stream

    return quality_model_stream(spark, sf_dir)


EXTENSION_QUERIES.update(
    {
        # round-9 second batch — promoted into the round-9 window tail
        # is NOT possible (window already at 50): queued for round 10.
        "image_dedup_components": (
            image_dedup_components_q,
            SQL_IMAGE_DEDUP_COMPONENTS,
        ),
        "similarity_join_topk": (
            similarity_join_topk_q,
            SQL_SIMILARITY_JOIN_TOPK,
        ),
        "stream_quality_model": (
            stream_quality_model_q,
            SQL_QUALITY_MODEL_SCORE,
        ),
    }
)


# =========================================================================
# Round-10 additions: entity resolution (operators/linkage.py),
# shortlist-then-rerank similarity join, sketch-edged PSI drift
# =========================================================================

ER_FIXTURE_MOD = 7  # every 7th customer gets a typo'd clone


def _er_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER fixture over the customer dimension: the originals plus a
    deterministically 'dirty' clone of every 7th record (last name
    character dropped — Levenshtein distance exactly 1 from its
    source). Block key = (nationkey, name digits 1..8): the clone
    shares both with its source (chopping char 18 leaves chars 10..17
    intact), so every planted match is recoverable within one block,
    and two originals collide only when they share nation AND
    custkey-div-10 — realistic blocking selectivity."""
    cust = scan_parquet(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("rid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.substring("c_name", 10, 8).alias("blk"),
    )
    dirty = cust.filter(
        F.col("c_custkey") % ER_FIXTURE_MOD == 0
    ).select(
        (F.col("c_custkey") + F.lit(10_000_000)).alias("rid"),
        F.substring("c_name", 1, 17).alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.substring("c_name", 10, 8).alias("blk"),
    )
    return base.unionByName(dirty)


def er_blocking_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity-resolution candidate pairs
    (operators/linkage.py blocking_pairs): records sharing the block
    key whose normalized names are within Levenshtein distance 1 —
    the match predicate is integer-exact and native in BOTH engines,
    so the oracle certifies every pair and every distance."""
    from ..operators.linkage import blocking_pairs

    return blocking_pairs(
        _er_records(spark, sf_dir),
        "rid",
        "name",
        ["nation", "blk"],
        max_edit=1,
    )


_SQL_ER_RECS = (
    "recs AS ("
    "SELECT c_custkey AS rid, lower(trim(c_name)) AS nm, "
    "c_name AS name, "
    "c_nationkey AS nation, substring(c_name, 10, 8) AS blk "
    "FROM customer "
    "UNION ALL "
    "SELECT c_custkey + 10000000, "
    "lower(trim(substring(c_name, 1, 17))), "
    "substring(c_name, 1, 17), c_nationkey, "
    "substring(c_name, 10, 8) "
    f"FROM customer WHERE c_custkey % {ER_FIXTURE_MOD} = 0)"
)

_SQL_ER_PAIRS = (
    "pr AS (SELECT a.rid AS id_a, b.rid AS id_b, "
    "CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist "
    "FROM recs a JOIN recs b "
    "ON a.nation = b.nation AND a.blk = b.blk AND a.rid < b.rid "
    "WHERE levenshtein(a.nm, b.nm) <= 1)"
)

SQL_ER_BLOCKING_PAIRS = (
    "WITH " + _SQL_ER_RECS + ", " + _SQL_ER_PAIRS
    + " SELECT id_a, id_b, dist FROM pr"
)


def er_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity clusters over the blocked match graph
    (operators/linkage.py match_clusters): min-label propagation, and
    — with records supplied — a TOTAL map (singletons cluster to
    themselves), so the output canonicalizes the whole dimension."""
    from ..operators.linkage import blocking_pairs, match_clusters

    recs = _er_records(spark, sf_dir)
    pairs = blocking_pairs(
        recs, "rid", "name", ["nation", "blk"], max_edit=1
    )
    return match_clusters(pairs, records=recs, id_col="rid")


SQL_ER_CLUSTERS = (
    "WITH RECURSIVE " + _SQL_ER_RECS + ", " + _SQL_ER_PAIRS + ", "
    "edges AS (SELECT id_a AS src, id_b AS dst FROM pr "
    "UNION SELECT id_b, id_a FROM pr), "
    "reach(src, dst) AS (SELECT src, dst FROM edges "
    "UNION SELECT r.src, e.dst FROM reach r JOIN edges e "
    "ON r.dst = e.src), "
    "comp AS (SELECT src AS entity_id, "
    "least(src, min(dst)) AS cluster_id FROM reach GROUP BY src) "
    "SELECT entity_id, cluster_id FROM comp "
    "UNION ALL "
    "SELECT rid, rid FROM recs "
    "WHERE rid NOT IN (SELECT entity_id FROM comp)"
)


def _wdot_sql(a: str, b: str, dim: int = ss.DIM) -> str:
    """Weighted dot with the shared (w*x)*y left-association."""
    return " + ".join(
        f"{ss.RERANK_WEIGHTS[i - 1]!r} * CAST({a}[{i}] AS DOUBLE) "
        f"* CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def _wcos_sql(a: str, b: str) -> str:
    return (
        f"({_wdot_sql(a, b)}) / "
        f"(sqrt({_wdot_sql(a, a)}) * sqrt({_wdot_sql(b, b)}))"
    )


def similarity_join_reranked_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shortlist-then-rerank similarity join (operators/simsearch.py
    similarity_join_reranked): the similarity_join_topk candidate
    structure shortlists 10 per right item by raw cosine, then a
    dimension-weighted cosine re-ranks the shortlist — the two-stage
    retrieval composition, zero extra exchanges."""
    emb = _emb(spark, sf_dir)
    e = F.col("embedding")
    left = emb.select(
        "vec_id",
        F.transform(e, lambda x: x.cast("double")).alias("embedding"),
    )
    right = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(2_000_000)).alias("vec_id"),
        F.concat(
            F.array(F.element_at(e, 1).cast("double") + F.lit(0.001)),
            F.transform(
                F.slice(e, 2, ss.DIM - 1), lambda x: x.cast("double")
            ),
        ).alias("embedding"),
    )
    return ss.similarity_join_reranked(
        left, right, cents=_km_cents(spark, sf_dir), k=3, shortlist=10
    )


SQL_SIMILARITY_JOIN_RERANKED = (
    "WITH "
    + _km_cent_ctes()
    + ", lefte AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding "
    "FROM embeddings), "
    "righte AS (SELECT vec_id + 2000000 AS vec_id, "
    "[CAST(embedding[1] AS DOUBLE) + 0.001] || "
    "list_transform(embedding[2:], x -> CAST(x AS DOUBLE)) AS embedding "
    "FROM embeddings WHERE vec_id % 10 = 0), "
    + _km_assign_ctes(f"c{ss.KMEANS_ITERS}", "la", src="lefte")
    + ", "
    + _km_assign_ctes(f"c{ss.KMEANS_ITERS}", "ra", src="righte")
    + ", pairs AS (SELECT b.vec_id AS b_id, a.vec_id AS a_id, "
    f"{_cos_sql('a.embedding', 'b.embedding')} AS cos, "
    "a.embedding AS ea, b.embedding AS eb "
    "FROM la a JOIN ra b USING (centroid_id)), "
    "s AS (SELECT b_id, a_id, cos, ea, eb, row_number() OVER ("
    "PARTITION BY b_id ORDER BY cos DESC, a_id ASC) AS srn FROM pairs), "
    "sh AS (SELECT b_id, a_id, cos, "
    f"{_wcos_sql('ea', 'eb')} AS wcos FROM s WHERE srn <= 10), "
    "r AS (SELECT b_id, a_id, cos, wcos, CAST(row_number() OVER ("
    "PARTITION BY b_id ORDER BY wcos DESC, a_id ASC) AS INTEGER) AS rank "
    "FROM sh) "
    "SELECT b_id, a_id, cos, wcos, rank FROM r WHERE rank <= 3"
)


def dq_drift_psi_sketch_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PSI drift with sketch-derived reference-quantile bin edges
    (operators/warehouse.py dq_drift_psi_sketch) — the classical PSI
    binning in its mergeable one-pass form."""
    from ..operators.warehouse import dq_drift_psi_sketch

    return dq_drift_psi_sketch(_events(spark, sf_dir))


def _sql_dq_drift_psi_sketch(buckets: int = 10, k: int = 256) -> str:
    """DuckDB twin of dq_drift_psi_sketch: same md5 bottom-k kept set
    over the reference half, same ((m-1)*j) div B edge rule, bucket =
    count of edges <= c, and the identical bucket-ordered PSI fold as
    _sql_dq_drift_psi."""
    bb = int(buckets)
    edge_cols = ", ".join(
        f"max(CASE WHEN rn - 1 = ((m - 1) * {j}) // {bb} "
        f"THEN c END) AS e{j}"
        for j in range(1, bb)
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN s.c >= ed.e{j} THEN 1 ELSE 0 END)"
        for j in range(1, bb)
    )
    rsum = ", ".join(
        f"CAST(sum(CASE WHEN side = 0 AND bucket = {i} THEN cnt "
        f"ELSE 0 END) AS BIGINT) AS r{i}"
        for i in range(bb)
    )
    csum = ", ".join(
        f"CAST(sum(CASE WHEN side = 1 AND bucket = {i} THEN cnt "
        f"ELSE 0 END) AS BIGINT) AS c{i}"
        for i in range(bb)
    )

    def share(col: str, n: str) -> str:
        return (
            f"((CAST({col} AS DOUBLE) + 1.0) / "
            f"(CAST({n} AS DOUBLE) + {float(bb)}))"
        )

    terms = " + ".join(
        f"(({share(f'r{i}', 'n_ref')}) - ({share(f'c{i}', 'n_cur')})) "
        f"* ln(({share(f'r{i}', 'n_ref')}) / ({share(f'c{i}', 'n_cur')}))"
        for i in range(bb)
    )
    return f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS c,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
  FROM events),
md AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
sd AS (SELECT event_type, c, h,
              CASE WHEN us < md.mid THEN 0 ELSE 1 END AS side
       FROM e, md),
kept AS (SELECT event_type, c, h FROM (
   SELECT event_type, c, h, row_number() OVER (
     PARTITION BY event_type ORDER BY h, c) AS rn
   FROM sd WHERE side = 0 AND h IS NOT NULL)
   WHERE rn <= {int(k)}),
ed AS (SELECT event_type, {edge_cols} FROM (
   SELECT event_type, c, row_number() OVER (
     PARTITION BY event_type ORDER BY c, h) AS rn,
     count(*) OVER (PARTITION BY event_type) AS m
   FROM kept) GROUP BY event_type),
bk AS (SELECT s.event_type, s.side, {bucket_expr} AS bucket
       FROM sd s JOIN ed USING (event_type)),
ct AS (SELECT event_type, side, bucket,
              CAST(count(*) AS BIGINT) AS cnt
       FROM bk GROUP BY 1, 2, 3),
pv AS (SELECT event_type,
         CAST(sum(CASE WHEN side = 0 THEN cnt ELSE 0 END) AS BIGINT)
           AS n_ref,
         CAST(sum(CASE WHEN side = 1 THEN cnt ELSE 0 END) AS BIGINT)
           AS n_cur,
         {rsum}, {csum}
       FROM ct GROUP BY event_type)
SELECT event_type, 0.0 + {terms} AS psi, n_ref, n_cur
FROM pv
WHERE n_ref > 0
"""


SQL_DQ_DRIFT_PSI_SKETCH = _sql_dq_drift_psi_sketch()


EXTENSION_QUERIES.update(
    {
        # round-10 additions — promoted into the round-10 window
        "er_blocking_pairs": (
            er_blocking_pairs_q,
            SQL_ER_BLOCKING_PAIRS,
        ),
        "er_clusters": (er_clusters_q, SQL_ER_CLUSTERS),
        "similarity_join_reranked": (
            similarity_join_reranked_q,
            SQL_SIMILARITY_JOIN_RERANKED,
        ),
        "dq_drift_psi_sketch": (
            dq_drift_psi_sketch_q,
            SQL_DQ_DRIFT_PSI_SKETCH,
        ),
    }
)


# --- round-10 second batch: survivorship, hybrid retrieval fusion,
# streaming ER ingest screen -----------------------------------------------


def er_survivorship_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record selection over the ER cluster map
    (operators/linkage.py survivorship): per cluster the most
    complete record survives (longest raw name, ties by min id) —
    the merge/purge canonicalization step, total over the
    dimension."""
    from ..operators.linkage import (
        blocking_pairs,
        match_clusters,
        survivorship,
    )

    recs = _er_records(spark, sf_dir)
    pairs = blocking_pairs(
        recs, "rid", "name", ["nation", "blk"], max_edit=1
    )
    clusters = match_clusters(pairs, records=recs, id_col="rid")
    return survivorship(recs, clusters, id_col="rid", name_col="name")


SQL_ER_SURVIVORSHIP = (
    "WITH RECURSIVE " + _SQL_ER_RECS + ", " + _SQL_ER_PAIRS + ", "
    "edges AS (SELECT id_a AS src, id_b AS dst FROM pr "
    "UNION SELECT id_b, id_a FROM pr), "
    "reach(src, dst) AS (SELECT src, dst FROM edges "
    "UNION SELECT r.src, e.dst FROM reach r JOIN edges e "
    "ON r.dst = e.src), "
    "comp AS (SELECT src AS entity_id, "
    "least(src, min(dst)) AS cluster_id FROM reach GROUP BY src), "
    "cl AS (SELECT entity_id, cluster_id FROM comp "
    "UNION ALL SELECT rid, rid FROM recs "
    "WHERE rid NOT IN (SELECT entity_id FROM comp)), "
    "j AS (SELECT cl.cluster_id, cl.entity_id, r.name FROM cl "
    "JOIN recs r ON r.rid = cl.entity_id), "
    "w AS (SELECT cluster_id, entity_id, name, "
    "row_number() OVER (PARTITION BY cluster_id "
    "ORDER BY length(name) DESC, entity_id ASC) AS rn, "
    "count(*) OVER (PARTITION BY cluster_id) AS nm FROM j) "
    "SELECT cluster_id, entity_id AS canonical_id, "
    "name AS canonical_name, CAST(nm AS BIGINT) AS n_members "
    "FROM w WHERE rn = 1"
)


RRF_K_CONST = 60
RRF_TIER_N = 50
RRF_TERMS = ["vector", "merge", "stream"]


def hybrid_search_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion
    (operators/topk.py rrf_fuse): the lexical tier's top-50 by summed
    BM25 for the fixed query terms fused with the vector tier's
    top-50 by cosine to query vector 0 (documents and embeddings
    share the id space) — the standard two-tower serving shape, each
    tier cut by its own bounded top-N before fusion."""
    from pyspark.sql import Window

    from ..operators.topk import rrf_fuse

    lex = tx.bm25_topk(
        _docs(spark, sf_dir), RRF_TERMS, k=RRF_TIER_N
    )
    wl = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex_r = lex.withColumn("rank", F.row_number().over(wl)).select(
        "doc_id", "rank"
    )
    vec_r = ss.cosine_topk(
        _emb(spark, sf_dir), n_queries=1, k=RRF_TIER_N
    ).select(F.col("vec_id").alias("doc_id"), "rank")
    fused = rrf_fuse(
        lex_r, vec_r, id_col="doc_id", k_const=RRF_K_CONST, k=10
    )
    return fused.select(
        "doc_id",
        F.col("a_rank").alias("lex_rank"),
        F.col("b_rank").alias("vec_rank"),
        "rrf",
        "rank",
    )


def _sql_hybrid_rrf() -> str:
    terms = RRF_TERMS
    pivots = ", ".join(
        f"max(CASE WHEN term = '{t}' THEN bm25 END) AS s{i}"
        for i, t in enumerate(terms)
    )
    ssum = " + ".join(f"coalesce(s{i}, 0.0)" for i in range(len(terms)))
    inlist = ", ".join(f"'{t}'" for t in terms)
    kc = float(RRF_K_CONST)
    return (
        "WITH " + _BM25_CTES + ", "
        f"q AS (SELECT doc_id, {pivots} FROM sc "
        f"WHERE term IN ({inlist}) GROUP BY doc_id), "
        f"lexq AS (SELECT doc_id, {ssum} AS score FROM q "
        f"ORDER BY score DESC, doc_id LIMIT {RRF_TIER_N}), "
        "lex AS (SELECT doc_id, CAST(row_number() OVER ("
        "ORDER BY score DESC, doc_id ASC) AS INTEGER) AS lex_rank "
        "FROM lexq), "
        "qv AS (SELECT embedding AS q_emb FROM embeddings "
        "WHERE vec_id = 0), "
        "vs AS (SELECT e.vec_id AS doc_id, "
        f"{_cos_sql('e.embedding', 'q_emb')} AS cos "
        "FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0), "
        "vecr AS (SELECT doc_id, CAST(row_number() OVER ("
        "ORDER BY cos DESC, doc_id ASC) AS INTEGER) AS vec_rank "
        "FROM vs), "
        f"vec AS (SELECT * FROM vecr WHERE vec_rank <= {RRF_TIER_N}), "
        "f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, "
        "l.lex_rank, v.vec_rank, "
        f"(CASE WHEN l.lex_rank IS NOT NULL THEN 1.0 / ({kc!r} "
        "+ CAST(l.lex_rank AS DOUBLE)) ELSE 0.0 END) "
        f"+ (CASE WHEN v.vec_rank IS NOT NULL THEN 1.0 / ({kc!r} "
        "+ CAST(v.vec_rank AS DOUBLE)) ELSE 0.0 END) AS rrf "
        "FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id), "
        "r AS (SELECT doc_id, lex_rank, vec_rank, rrf, "
        "CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) "
        "AS INTEGER) AS rank FROM f) "
        "SELECT doc_id, lex_rank, vec_rank, rrf, rank FROM r "
        "WHERE rank <= 10"
    )


SQL_HYBRID_SEARCH_RRF = _sql_hybrid_rrf()


def stream_er_screen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ER ingest screen (streaming/linkage.py
    er_screen_stream): arriving typo'd records block-probe the static
    customer dimension row-locally — stateless, append mode, the
    batch new x static block join is the oracle."""
    from ..streaming.linkage import er_screen_stream

    return er_screen_stream(spark, sf_dir)


SQL_STREAM_ER_SCREEN = (
    "WITH n AS (SELECT c_custkey + 10000000 AS new_id, "
    "lower(trim(substring(c_name, 1, 17))) AS nm, "
    "c_nationkey AS nation, substring(c_name, 10, 8) AS blk "
    f"FROM customer WHERE c_custkey % {ER_FIXTURE_MOD} = 0), "
    "s AS (SELECT c_custkey AS matched_id, "
    "lower(trim(c_name)) AS m_nm, c_nationkey AS nation, "
    "substring(c_name, 10, 8) AS blk FROM customer) "
    "SELECT new_id, matched_id, "
    "CAST(levenshtein(nm, m_nm) AS BIGINT) AS dist "
    "FROM n JOIN s USING (nation, blk) "
    "WHERE levenshtein(nm, m_nm) <= 1"
)


EXTENSION_QUERIES.update(
    {
        # round-10 second batch — queued for the round-11 window
        # (the round-10 window is already at 50)
        "er_survivorship": (er_survivorship_q, SQL_ER_SURVIVORSHIP),
        "hybrid_search_rrf": (
            hybrid_search_rrf_q,
            SQL_HYBRID_SEARCH_RRF,
        ),
        "stream_er_screen": (stream_er_screen_q, SQL_STREAM_ER_SCREEN),
    }
)


# --- round-10 third batch: scalar-quantized search, multi-pass
# blocking, Fellegi-Sunter match scoring ------------------------------------


def simsearch_sq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization search (operators/simsearch.py sq_topk):
    int8 index, exact-integer quantized-dot shortlist, full-precision
    cosine re-rank — the third compression rung beside PQ/IVFPQ."""
    return ss.sq_topk(_emb(spark, sf_dir), n_queries=8, k=5, shortlist=20)


def _int8_dot_sql(a: str, b: str, dim: int = ss.DIM) -> str:
    return " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, dim + 1))


SQL_SIMSEARCH_SQ_TOPK = (
    "WITH q8 AS (SELECT vec_id, list_transform(embedding, "
    "x -> CAST(greatest(-127, least(127, round(CAST(x AS DOUBLE) * 127)))"
    " AS BIGINT)) AS q FROM embeddings), "
    "qq AS (SELECT vec_id AS query_id, q AS qv FROM q8 WHERE vec_id < 8), "
    "adc AS (SELECT query_id, e.vec_id, "
    f"{_int8_dot_sql('e.q', 'qq.qv')} AS adc "
    "FROM q8 e CROSS JOIN qq WHERE e.vec_id <> qq.query_id), "
    "cand AS (SELECT query_id, vec_id FROM ("
    "SELECT query_id, vec_id, row_number() OVER ("
    "PARTITION BY query_id ORDER BY adc DESC, vec_id ASC) AS rn "
    "FROM adc) WHERE rn <= 20), "
    "qb AS (SELECT vec_id AS query_id, embedding AS q_emb "
    "FROM embeddings WHERE vec_id < 8), "
    "resc AS (SELECT c.query_id, c.vec_id, "
    f"{_cos_sql('e.embedding', 'qb.q_emb')} AS cos "
    "FROM cand c JOIN embeddings e USING (vec_id) "
    "JOIN qb USING (query_id)), "
    "r AS (SELECT query_id, vec_id, cos, CAST(row_number() OVER ("
    "PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) "
    "AS rank FROM resc) "
    "SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5"
)


ER_FIXTURE_MOD_B = 11  # every 11th customer gets a prefix-corrupted clone


def _er_records2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-clone-type ER fixture for multi-pass blocking: clone A
    (every 7th record, last char dropped) keeps the PREFIX block key
    (name digits 1-8) but breaks the SUFFIX key (digits 3-9 — one
    char short); clone B (every 11th record, first key digit
    replaced by 'x') breaks the prefix key but keeps the suffix key.
    Each pass alone misses one clone type; the union catches both —
    the merge/purge multi-pass recall argument as a fixture."""
    cust = scan_parquet(spark, sf_dir, "customer")

    def rec(idc, namec):
        return [
            idc.alias("rid"),
            namec.alias("name"),
            F.col("c_nationkey").alias("nation"),
            F.substring(namec, 10, 8).alias("blk_p"),
            F.substring(namec, 12, 7).alias("blk_s"),
        ]

    base = cust.select(*rec(F.col("c_custkey"), F.col("c_name")))
    clone_a = cust.filter(
        F.col("c_custkey") % ER_FIXTURE_MOD == 0
    ).select(
        *rec(
            F.col("c_custkey") + F.lit(10_000_000),
            F.substring("c_name", 1, 17),
        )
    )
    clone_b = cust.filter(
        F.col("c_custkey") % ER_FIXTURE_MOD_B == 0
    ).select(
        *rec(
            F.col("c_custkey") + F.lit(20_000_000),
            F.concat(
                F.substring("c_name", 1, 9),
                F.lit("x"),
                F.substring("c_name", 11, 8),
            ),
        )
    )
    return base.unionByName(clone_a).unionByName(clone_b)


def er_blocking_multipass_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-pass blocked candidates (operators/linkage.py
    blocking_pairs_multipass): prefix-key pass ∪ suffix-key pass,
    deduplicated — each planted clone type is recoverable by exactly
    one pass."""
    from ..operators.linkage import blocking_pairs_multipass

    return blocking_pairs_multipass(
        _er_records2(spark, sf_dir),
        "rid",
        "name",
        [["nation", "blk_p"], ["nation", "blk_s"]],
        max_edit=1,
    )


_SQL_ER_RECS2 = (
    "recs AS ("
    "SELECT c_custkey AS rid, lower(trim(c_name)) AS nm, "
    "c_nationkey AS nation, "
    "substring(c_name, 10, 8) AS blk_p, "
    "substring(c_name, 12, 7) AS blk_s "
    "FROM customer "
    "UNION ALL "
    "SELECT c_custkey + 10000000, "
    "lower(trim(substring(c_name, 1, 17))), c_nationkey, "
    "substring(c_name, 10, 8), substring(c_name, 12, 6) "
    f"FROM customer WHERE c_custkey % {ER_FIXTURE_MOD} = 0 "
    "UNION ALL "
    "SELECT c_custkey + 20000000, "
    "lower(trim(substring(c_name, 1, 9) || 'x' "
    "|| substring(c_name, 11, 8))), c_nationkey, "
    "'x' || substring(c_name, 11, 7), "
    "substring(c_name, 12, 7) "
    f"FROM customer WHERE c_custkey % {ER_FIXTURE_MOD_B} = 0)"
)

SQL_ER_BLOCKING_MULTIPASS = (
    "WITH " + _SQL_ER_RECS2 + ", "
    "p1 AS (SELECT a.rid AS id_a, b.rid AS id_b, "
    "CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist "
    "FROM recs a JOIN recs b ON a.nation = b.nation "
    "AND a.blk_p = b.blk_p AND a.rid < b.rid "
    "WHERE levenshtein(a.nm, b.nm) <= 1), "
    "p2 AS (SELECT a.rid AS id_a, b.rid AS id_b, "
    "CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist "
    "FROM recs a JOIN recs b ON a.nation = b.nation "
    "AND a.blk_s = b.blk_s AND a.rid < b.rid "
    "WHERE levenshtein(a.nm, b.nm) <= 1), "
    "u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2) "
    "SELECT id_a, id_b, CAST(min(dist) AS BIGINT) AS dist, "
    "CAST(count(*) AS BIGINT) AS n_passes "
    "FROM u GROUP BY id_a, id_b"
)


def er_match_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter-shaped match scoring (operators/linkage.py
    match_scores): integer agreement weights over blocked pairs,
    three-way match/possible/non_match decision."""
    from ..operators.linkage import match_scores

    return match_scores(
        _er_records(spark, sf_dir),
        "rid",
        "name",
        ["nation", "blk"],
        max_edit=2,
    )


SQL_ER_MATCH_SCORES = (
    "WITH " + _SQL_ER_RECS + ", "
    "pr AS (SELECT a.rid AS id_a, b.rid AS id_b, "
    "CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist, "
    "substring(a.nm, -1, 1) = substring(b.nm, -1, 1) AS sfx "
    "FROM recs a JOIN recs b "
    "ON a.nation = b.nation AND a.blk = b.blk AND a.rid < b.rid "
    "WHERE levenshtein(a.nm, b.nm) <= 2), "
    "sc AS (SELECT id_a, id_b, dist, "
    "CAST((3 - dist) * 300 "
    "+ (CASE WHEN sfx THEN 100 ELSE 0 END) AS BIGINT) AS score "
    "FROM pr) "
    "SELECT id_a, id_b, dist, score, "
    "CASE WHEN score >= 700 THEN 'match' "
    "WHEN score >= 400 THEN 'possible' "
    "ELSE 'non_match' END AS decision "
    "FROM sc"
)


EXTENSION_QUERIES.update(
    {
        # round-10 third batch — queued for the round-11 window
        "simsearch_sq_topk": (
            simsearch_sq_topk_q,
            SQL_SIMSEARCH_SQ_TOPK,
        ),
        "er_blocking_multipass": (
            er_blocking_multipass_q,
            SQL_ER_BLOCKING_MULTIPASS,
        ),
        "er_match_scores": (er_match_scores_q, SQL_ER_MATCH_SCORES),
    }
)


# --- round-10 fourth batch: BPE corpus encode, robust MAD anomaly
# screen, shingle containment ------------------------------------------------


def bpe_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the learned 6-merge BPE
    vocabulary (operators/textstats.py bpe_encode) — the ENCODE rung
    that completes the BPE ladder; fertility = subwords per word."""
    return tx.bpe_encode(_docs(spark, sf_dir))


def _sql_bpe_encode(n_merges: int = 6) -> str:
    sel = f"""enc AS (SELECT word,
         CAST(len(string_split(trim(syms), '  ')) AS BIGINT) AS n_sub
       FROM v{n_merges}),
dw AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS word
       FROM documents),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
        FROM dw JOIN enc USING (word) GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(per.n_words, 0) AS n_words,
  coalesce(per.n_bpe_tokens, 0) AS n_bpe_tokens,
  CASE WHEN per.n_words > 0
       THEN CAST(per.n_bpe_tokens AS DOUBLE) / CAST(per.n_words AS DOUBLE)
  END AS fertility
FROM documents d LEFT JOIN per USING (doc_id)"""
    return "WITH " + ",\n".join(_bpe_ctes(n_merges)) + ",\n" + sel


SQL_BPE_ENCODE = _sql_bpe_encode()


def dq_anomaly_mad_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type MAD anomaly screen (operators/warehouse.py
    dq_anomaly_mad): flag events beyond 3 x 1.4826 x MAD from the
    per-type median — the exact-integer cross-multiplied decision."""
    from ..operators.warehouse import dq_anomaly_mad

    return dq_anomaly_mad(_events(spark, sf_dir))


SQL_DQ_ANOMALY_MAD = """
WITH e AS (
  SELECT event_type, event_id, value,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
mr AS (SELECT event_type, event_id, value, c,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY c)
              AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       FROM e),
med AS (SELECT event_type, CAST(max(c) AS BIGINT) AS med
        FROM mr WHERE rn - 1 = ((n - 1) * 50) // 100
        GROUP BY event_type),
dv AS (SELECT e.event_type, e.event_id, e.value, e.c,
              abs(e.c - med.med) AS d, med.med
       FROM e JOIN med USING (event_type)),
dr AS (SELECT event_type, d,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       FROM dv),
mad AS (SELECT event_type, CAST(max(d) AS BIGINT) AS mad
        FROM dr WHERE rn - 1 = ((n - 1) * 50) // 100
        GROUP BY event_type)
SELECT dv.event_type, dv.event_id, dv.value,
       CAST(dv.med AS DOUBLE) / 100.0 AS median_value,
       CAST(mad.mad AS DOUBLE) / 100.0 AS mad_value
FROM dv JOIN mad USING (event_type)
WHERE dv.d * 10000 > mad.mad * 44478
"""


def dedup_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment + Jaccard for the LSH
    candidate pairs (operators/dedup.py ngram_containment) — the
    Broder containment measure substring-dedup filters on."""
    docs = _docs(spark, sf_dir)
    return dd.ngram_containment(docs, dd.minhash_candidate_pairs(docs))


SQL_DEDUP_CONTAINMENT = (
    "WITH " + _PAIR_CTES + ", "
    "sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh "
    "FROM sh GROUP BY doc_id), "
    "inter AS (SELECT p.doc_a, p.doc_b, "
    "CAST(count(*) AS BIGINT) AS n_inter "
    "FROM pairs p JOIN sh a ON a.doc_id = p.doc_a "
    "JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle "
    "GROUP BY p.doc_a, p.doc_b) "
    "SELECT p.doc_a, p.doc_b, "
    "CAST(coalesce(i.n_inter, 0) AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) "
    "AS containment_a, "
    "CAST(coalesce(i.n_inter, 0) AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) "
    "AS containment_b, "
    "CAST(coalesce(i.n_inter, 0) AS DOUBLE) / "
    "CAST(sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0) AS DOUBLE) "
    "AS jaccard "
    "FROM pairs p "
    "LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b "
    "JOIN sz sa ON sa.doc_id = p.doc_a "
    "JOIN sz sb ON sb.doc_id = p.doc_b"
)


EXTENSION_QUERIES.update(
    {
        # round-10 fourth batch — queued for the round-11 window
        "bpe_encode": (bpe_encode_q, SQL_BPE_ENCODE),
        "dq_anomaly_mad": (dq_anomaly_mad_q, SQL_DQ_ANOMALY_MAD),
        "dedup_containment": (
            dedup_containment_q,
            SQL_DEDUP_CONTAINMENT,
        ),
    }
)


# =========================================================================
# Round-11 additions: real-pixel perceptual hash, exchange-based
# cross-corpus LSH join
# =========================================================================

from ..operators import multimodal as mm  # noqa: E402


def image_phash_decoded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit dHash over REAL decoded pixels: per document, synthesize
    a real PNG (dimensions/color type/channel values are
    SQL-stateable functions of doc_id; scanline filters cycle all
    five types), then recover the grayscale grid through the
    pure-stdlib zlib-inflate + unfilter decoder and hash it
    (operators/imagehash.py image_phash_decoded). The oracle computes
    ground-truth pixels directly from the fixture formulas — it never
    sees the PNG bytes — so hash equality certifies the DECODER:
    any filter-undo, luma, CRC, or sampling defect breaks it."""
    media = mm.synth_png_documents(_docs(spark, sf_dir))
    return ih.image_phash_decoded(media)


def _sql_decoded_px_cols() -> str:
    """DuckDB twin of the decoded-pixel grid: ground-truth grayscale
    from multimodal.synth_png_pixels' channel formulas (affine mod
    256 in (doc_id, row, col); integer BT.601 luma for RGB/RGBA — the
    ctsel = 0 arm is color type 0/grayscale, 1 and 2 are RGB and
    RGBA whose luma ignores alpha), point-sampled at
    gray_grid_samples' lattice (r*(h-1) // (GRID_R-1),
    c*(w-1) // GRID_C)."""
    outs = []
    for i in range(ih.N_PIX):
        r, c = divmod(i, ih.GRID_C + 1)
        pr = f"(({r} * (h - 1)) // {ih.GRID_R - 1})"
        pc = f"(({c} * (w - 1)) // {ih.GRID_C})"
        gray = (
            f"CASE WHEN ctsel = 0 "
            f"THEN (doc_id*7 + {pr}*13 + {pc}*31) % 256 "
            f"ELSE (299*((doc_id*5 + {pr}*11 + {pc}*17) % 256) "
            f"+ 587*((doc_id*3 + {pr}*7 + {pc}*19) % 256) "
            f"+ 114*((doc_id*13 + {pr}*3 + {pc}*23) % 256)) // 1000 "
            f"END"
        )
        outs.append(f"CAST({gray} AS INTEGER) AS px{i}")
    return ", ".join(outs)


SQL_IMAGE_PHASH_DECODED = f"""
WITH dims AS (SELECT doc_id,
                     {mm.PNG_W_BASE} + doc_id % {mm.PNG_W_MOD} AS w,
                     {mm.PNG_H_BASE} + doc_id % {mm.PNG_H_MOD} AS h,
                     doc_id % 3 AS ctsel
              FROM documents),
px AS (SELECT doc_id, {_sql_decoded_px_cols()} FROM dims),
hh AS (SELECT doc_id, {_sql_band_cols()} FROM px)
SELECT doc_id, b0, b1, b2, b3,
       lpad(hex(b0), 4, '0') || lpad(hex(b1), 4, '0')
       || lpad(hex(b2), 4, '0') || lpad(hex(b3), 4, '0') AS phash
FROM hh
"""


def similarity_join_minhash_shuffle_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exchange-based cross-corpus LSH similarity join — the
    corpus-vs-corpus regime (cross-source near-dup between two
    crawls) where the probe side is too large to broadcast: both band
    relations meet on a (band, key) hash exchange, each side's
    buckets independently capped at MAX_BUCKET before the join
    (operators/dedup.py lsh_similarity_join,
    broadcast_probe=False). Plan-asserted broadcast-free in
    tests/test_plans.py."""
    d = _docs(spark, sf_dir)
    return dd.lsh_similarity_join(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
        broadcast_probe=False,
        max_bucket=dd.MAX_BUCKET,
    )


SQL_SIMILARITY_JOIN_MINHASH_SHUFFLE = (
    "WITH " + _minhash_band_ctes() + ", "
    "cb0 AS (SELECT * FROM bands WHERE doc_id % 10 <> 0), "
    "pb0 AS (SELECT * FROM bands WHERE doc_id % 10 = 0), "
    "cb AS (SELECT doc_id, band, key FROM ("
    "SELECT *, count(*) OVER (PARTITION BY band, key) AS sz FROM cb0"
    f") WHERE sz <= {dd.MAX_BUCKET}), "
    "pb AS (SELECT doc_id, band, key FROM ("
    "SELECT *, count(*) OVER (PARTITION BY band, key) AS sz FROM pb0"
    f") WHERE sz <= {dd.MAX_BUCKET}) "
    "SELECT c.doc_id AS corpus_doc, p.doc_id AS probe_doc, "
    "CAST(count(DISTINCT c.band) AS BIGINT) AS n_bands "
    "FROM cb c JOIN pb p ON c.band = p.band AND c.key = p.key "
    "GROUP BY c.doc_id, p.doc_id"
)


EXTENSION_QUERIES.update(
    {
        # round-11 first batch — in the round-11 certification window
        "image_phash_decoded": (
            image_phash_decoded_q,
            SQL_IMAGE_PHASH_DECODED,
        ),
        "similarity_join_minhash_shuffle": (
            similarity_join_minhash_shuffle_q,
            SQL_SIMILARITY_JOIN_MINHASH_SHUFFLE,
        ),
    }
)


def image_phash_gif_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit dHash over REAL GIF-decoded pixels: per document a real
    LZW-compressed GIF (grayscale-ramp palette; odd doc ids
    interlaced) is synthesized, then the pixel grid is RECOVERED
    through the pure-Python variable-width LZW decoder + de-interlace
    and hashed (operators/imagehash.py image_phash_decoded — the
    format dispatch covers GIF). As with image_phash_decoded, the
    oracle computes ground-truth pixels from the index formula
    without ever seeing the GIF bytes, so hash equality certifies the
    LZW decoder, the interlace reorder, and the palette luma."""
    media = mm.synth_gif_documents(_docs(spark, sf_dir))
    return ih.image_phash_decoded(media)


def _sql_gif_px_cols() -> str:
    """DuckDB twin of the GIF decoded-pixel grid: the grayscale ramp
    palette makes luma(index) == index, so gray is
    multimodal.synth_gif_pixels' index formula directly, sampled at
    the shared grid lattice."""
    outs = []
    for i in range(ih.N_PIX):
        r, c = divmod(i, ih.GRID_C + 1)
        pr = f"(({r} * (h - 1)) // {ih.GRID_R - 1})"
        pc = f"(({c} * (w - 1)) // {ih.GRID_C})"
        outs.append(
            f"CAST((doc_id*11 + {pr}*17 + {pc}*7) % 256 "
            f"AS INTEGER) AS px{i}"
        )
    return ", ".join(outs)


SQL_IMAGE_PHASH_GIF = f"""
WITH dims AS (SELECT doc_id,
                     {mm.PNG_W_BASE} + doc_id % {mm.PNG_W_MOD} AS w,
                     {mm.PNG_H_BASE} + doc_id % {mm.PNG_H_MOD} AS h
              FROM documents),
px AS (SELECT doc_id, {_sql_gif_px_cols()} FROM dims),
hh AS (SELECT doc_id, {_sql_band_cols()} FROM px)
SELECT doc_id, b0, b1, b2, b3,
       lpad(hex(b0), 4, '0') || lpad(hex(b1), 4, '0')
       || lpad(hex(b2), 4, '0') || lpad(hex(b3), 4, '0') AS phash
FROM hh
"""


EXTENSION_QUERIES.update(
    {
        # round-11 second batch — registry tail, queued for the
        # round-12 certification window (locally gated at all 3 SFs)
        "image_phash_gif": (image_phash_gif_q, SQL_IMAGE_PHASH_GIF),
    }
)


def image_phash_jpeg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit dHash over REAL JPEG-decoded pixels. JPEG is lossy, so
    a formula-stated oracle is normally impossible — the fixture
    exploits the one exact case: images CONSTANT on each 8x8 block
    have DC-only spectra, the Annex K DC quantum (16) divides
    8*(v-128) for even offsets, and the IDCT of a DC-only block is
    exactly flat, so encode -> decode is BIT-EXACT while the decoder
    still runs its full real path (canonical Huffman scan decode,
    dequantization, IDCT, MCU-edge crop). The oracle states the
    block formula directly (operators/multimodal.py
    synth_jpeg_pixels); hash equality certifies the JPEG decoder."""
    media = mm.synth_jpeg_documents(_docs(spark, sf_dir))
    return ih.image_phash_decoded(media)


def _sql_jpeg_px_cols() -> str:
    """DuckDB twin of the JPEG decoded-pixel grid: the blockwise-
    constant fixture formula sampled at the shared grid lattice."""
    outs = []
    for i in range(ih.N_PIX):
        r, c = divmod(i, ih.GRID_C + 1)
        pr = f"(({r} * (h - 1)) // {ih.GRID_R - 1})"
        pc = f"(({c} * (w - 1)) // {ih.GRID_C})"
        outs.append(
            f"CAST(64 + 2 * ((doc_id*3 + ({pr} // 8)*5 "
            f"+ ({pc} // 8)*7) % 64) AS INTEGER) AS px{i}"
        )
    return ", ".join(outs)


SQL_IMAGE_PHASH_JPEG = f"""
WITH dims AS (SELECT doc_id,
                     {mm.PNG_W_BASE} + doc_id % {mm.PNG_W_MOD} AS w,
                     {mm.PNG_H_BASE} + doc_id % {mm.PNG_H_MOD} AS h
              FROM documents),
px AS (SELECT doc_id, {_sql_jpeg_px_cols()} FROM dims),
hh AS (SELECT doc_id, {_sql_band_cols()} FROM px)
SELECT doc_id, b0, b1, b2, b3,
       lpad(hex(b0), 4, '0') || lpad(hex(b1), 4, '0')
       || lpad(hex(b2), 4, '0') || lpad(hex(b3), 4, '0') AS phash
FROM hh
"""


EXTENSION_QUERIES.update(
    {
        # round-11 second batch (continued) — registry tail, queued
        # for the round-12 certification window
        "image_phash_jpeg": (image_phash_jpeg_q, SQL_IMAGE_PHASH_JPEG),
    }
)


def image_neardup_decoded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-Hamming near-duplicate pairs over REAL decoded pixels:
    every 20th document gains a clone that is a GRAYSCALE re-encode
    of its base image's decoded luma (the real-world near-dup shape —
    same content, different container/color type, different scanline
    filters) with ONE sampled grid pixel pushed far away (<= 2 dHash
    bits — inside the d<=3 pigeonhole recall guarantee). The whole
    ladder runs on decoded pixels: synth -> zlib decode -> grid ->
    dHash -> band join (operators/imagehash.py image_phash_decoded +
    image_neardup_pairs)."""
    d = _docs(spark, sf_dir).select("doc_id")
    clones = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + F.lit(mm.PHASH_CLONE_OFFSET)).alias("doc_id")
    )
    media = d.unionByName(clones).mapInPandas(
        mm.synth_png_clone_batch, mm.PNG_MEDIA_SCHEMA
    )
    return ih.image_neardup_pairs(ih.image_phash_decoded(media))


def _sql_decoded_clone_px_cols() -> str:
    """Decoded-pixel grid for the clone corpus: every px is the BASE
    id's decoded-luma formula (clones re-render the same luma), and
    the clone's sample (2, 2) — grid index 20 — gets the far-away
    perturbation. `eid`/`iscl` come from the dims CTE."""
    outs = []
    for i in range(ih.N_PIX):
        r, c = divmod(i, ih.GRID_C + 1)
        pr = f"(({r} * (h - 1)) // {ih.GRID_R - 1})"
        pc = f"(({c} * (w - 1)) // {ih.GRID_C})"
        gray = (
            f"CASE WHEN ctsel = 0 "
            f"THEN (eid*7 + {pr}*13 + {pc}*31) % 256 "
            f"ELSE (299*((eid*5 + {pr}*11 + {pc}*17) % 256) "
            f"+ 587*((eid*3 + {pr}*7 + {pc}*19) % 256) "
            f"+ 114*((eid*13 + {pr}*3 + {pc}*23) % 256)) // 1000 "
            f"END"
        )
        if (r, c) == (mm.PERTURB_SAMPLE_R, mm.PERTURB_SAMPLE_C):
            gray = (
                f"CASE WHEN iscl THEN "
                f"(CASE WHEN ({gray}) > 60 THEN 1 ELSE 120 END) "
                f"ELSE ({gray}) END"
            )
        outs.append(f"CAST({gray} AS INTEGER) AS px{i}")
    return ", ".join(outs)


SQL_IMAGE_NEARDUP_DECODED = f"""
WITH ids AS (SELECT doc_id FROM documents
             UNION ALL
             SELECT doc_id + {mm.PHASH_CLONE_OFFSET} FROM documents
             WHERE doc_id % 20 = 0),
dims AS (SELECT doc_id,
                CASE WHEN doc_id >= {mm.PHASH_CLONE_OFFSET}
                     THEN doc_id - {mm.PHASH_CLONE_OFFSET}
                     ELSE doc_id END AS eid,
                doc_id >= {mm.PHASH_CLONE_OFFSET} AS iscl
         FROM ids),
dims2 AS (SELECT doc_id, iscl, eid,
                 {mm.PNG_W_BASE} + eid % {mm.PNG_W_MOD} AS w,
                 {mm.PNG_H_BASE} + eid % {mm.PNG_H_MOD} AS h,
                 eid % 3 AS ctsel
          FROM dims),
px AS (SELECT doc_id, {_sql_decoded_clone_px_cols()} FROM dims2),
h AS (SELECT doc_id, {_sql_band_cols()} FROM px),
unp AS (SELECT doc_id, b0, b1, b2, b3, u.j AS band_idx,
               CASE u.j WHEN 0 THEN b0 WHEN 1 THEN b1
                        WHEN 2 THEN b2 ELSE b3 END AS band_val
        FROM h, (SELECT unnest([0, 1, 2, 3]) AS j) u),
sized AS (SELECT *, count(*) OVER (PARTITION BY band_idx, band_val)
                 AS sz FROM unp),
keptb AS (SELECT * FROM sized WHERE sz <= {ih.MAX_BUCKET}),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                a.b0 AS a0, a.b1 AS a1, a.b2 AS a2, a.b3 AS a3,
                b.b0 AS c0, b.b1 AS c1, b.b2 AS c2, b.b3 AS c3
         FROM keptb a JOIN keptb b
           ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          AND a.doc_id < b.doc_id),
d AS (SELECT a_id, b_id,
             CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
                  + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3))
                  AS INTEGER) AS hamming
      FROM cand)
SELECT a_id, b_id, hamming FROM d WHERE hamming <= 3
"""


EXTENSION_QUERIES.update(
    {
        # round-11 second batch (continued) — registry tail, queued
        # for the round-12 certification window
        "image_neardup_decoded": (
            image_neardup_decoded_q,
            SQL_IMAGE_NEARDUP_DECODED,
        ),
    }
)


def audio_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer audio fingerprint over REAL WAV PCM decode: per doc a
    real 16-bit mono WAV is synthesized from an integer sample
    formula, the samples are RECOVERED through the RIFF walk + int16
    decode, and per-20ms-frame energy / zero-crossing counts are
    computed JVM-side over the frame arrays
    (operators/multimodal.py audio_fingerprint). The oracle computes
    the features from the sample formula without seeing the WAV
    bytes, so equality certifies the PCM decoder and framing."""
    return mm.audio_fingerprint(_docs(spark, sf_dir))


SQL_AUDIO_FINGERPRINT = f"""
WITH f AS (SELECT doc_id, u.fi AS frame_idx
           FROM documents,
                UNNEST(range(5 + doc_id % 5)) AS u(fi)),
s AS (SELECT doc_id, frame_idx,
             frame_idx * {mm.AUDIO_FRAME} + v.i AS i,
             v.i AS off
      FROM f, UNNEST(range({mm.AUDIO_FRAME})) AS v(i)),
sv AS (SELECT doc_id, frame_idx, off,
              ((doc_id*31 + i*17) % 4001) - 2000 AS s,
              ((doc_id*31 + (i+1)*17) % 4001) - 2000 AS s2
       FROM s)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(sum(abs(s)) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN off < {mm.AUDIO_FRAME - 1}
                      AND s * s2 < 0 THEN 1 ELSE 0 END)
            AS INTEGER) AS zcr
FROM sv GROUP BY doc_id, frame_idx
"""


EXTENSION_QUERIES.update(
    {
        # round-11 third batch — registry tail, queued for the
        # round-12 certification window
        "audio_fingerprint": (
            audio_fingerprint_q,
            SQL_AUDIO_FINGERPRINT,
        ),
    }
)


def video_frame_phash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame dHash over REAL extracted video frames: per doc a
    real AVI (LIST/hdrl + LIST/movi with uncompressed 24bpp BI_RGB
    DIB frames, bottom-up padded rows) is synthesized from a
    SQL-stateable frame formula, the frames are RECOVERED through the
    RIFF/movi walk + DIB decode, grid-sampled, and hashed per
    (doc_id, frame_idx) (operators/imagehash.py video_frame_phash).
    The oracle states the frame formula directly; equality certifies
    the container walk, the bottom-up BGR decode, and the per-frame
    fan-out."""
    media = _docs(spark, sf_dir).select("doc_id").mapInPandas(
        mm.synth_avi_batch, mm.PNG_MEDIA_SCHEMA
    )
    return ih.video_frame_phash(media)


def _sql_video_px_cols() -> str:
    """DuckDB twin of the video decoded-frame grid:
    multimodal.synth_avi_frames_pixels' formula (B=G=R in the DIB, so
    luma == the formula), sampled at the shared grid lattice."""
    outs = []
    for i in range(ih.N_PIX):
        r, c = divmod(i, ih.GRID_C + 1)
        pr = f"(({r} * (h - 1)) // {ih.GRID_R - 1})"
        pc = f"(({c} * (w - 1)) // {ih.GRID_C})"
        outs.append(
            f"CAST((doc_id*7 + frame_idx*29 + {pr}*13 + {pc}*31 "
            f"+ doc_id*{pc}*3 + frame_idx*{pr}*11) % 256 "
            f"AS INTEGER) AS px{i}"
        )
    return ", ".join(outs)


SQL_VIDEO_FRAME_PHASH = f"""
WITH fr AS (SELECT doc_id, u.fi AS frame_idx
            FROM documents,
                 UNNEST(range(2 + doc_id % 3)) AS u(fi)),
dims AS (SELECT doc_id, frame_idx,
                {mm.VIDEO_W_BASE} + doc_id % {mm.VIDEO_W_MOD} AS w,
                {mm.VIDEO_H_BASE} + doc_id % {mm.VIDEO_H_MOD} AS h
         FROM fr),
px AS (SELECT doc_id, frame_idx, {_sql_video_px_cols()} FROM dims),
hh AS (SELECT doc_id, frame_idx, {_sql_band_cols()} FROM px)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       b0, b1, b2, b3,
       lpad(hex(b0), 4, '0') || lpad(hex(b1), 4, '0')
       || lpad(hex(b2), 4, '0') || lpad(hex(b3), 4, '0') AS phash
FROM hh
"""


EXTENSION_QUERIES.update(
    {
        # round-11 third batch (continued) — registry tail, queued
        # for the round-12 certification window
        "video_frame_phash": (
            video_frame_phash_q,
            SQL_VIDEO_FRAME_PHASH,
        ),
    }
)


def video_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level video near-dup over REAL extracted frames: every
    20th doc gains a clone video re-rendered with one pixel of frame
    0 pushed far away, so each clone shares n_frames - 1 bit-identical
    frame hashes with its base. Pipeline: real AVI synth -> movi/DIB
    frame decode -> per-frame dHash -> guarded hash-equality join
    counting distinct shared frame hashes (operators/imagehash.py
    video_neardup_pairs)."""
    d = _docs(spark, sf_dir).select("doc_id")
    clones = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + F.lit(mm.PHASH_CLONE_OFFSET)).alias("doc_id")
    )
    media = d.unionByName(clones).mapInPandas(
        mm.synth_avi_clone_batch, mm.PNG_MEDIA_SCHEMA
    )
    return ih.video_neardup_pairs(ih.video_frame_phash(media))


def _sql_video_clone_px_cols() -> str:
    """Video decoded-frame grid over the clone corpus: the base id's
    frame formula, with the clone's frame-0 sample (2, 2) perturbed
    (the same far-away rule as the image clone fixture)."""
    outs = []
    for i in range(ih.N_PIX):
        r, c = divmod(i, ih.GRID_C + 1)
        pr = f"(({r} * (h - 1)) // {ih.GRID_R - 1})"
        pc = f"(({c} * (w - 1)) // {ih.GRID_C})"
        gray = (
            f"(eid*7 + frame_idx*29 + {pr}*13 + {pc}*31 "
            f"+ eid*{pc}*3 + frame_idx*{pr}*11) % 256"
        )
        if (r, c) == (mm.PERTURB_SAMPLE_R, mm.PERTURB_SAMPLE_C):
            gray = (
                f"CASE WHEN iscl AND frame_idx = 0 THEN "
                f"(CASE WHEN ({gray}) > 60 THEN 1 ELSE 120 END) "
                f"ELSE ({gray}) END"
            )
        outs.append(f"CAST({gray} AS INTEGER) AS px{i}")
    return ", ".join(outs)


SQL_VIDEO_NEARDUP = f"""
WITH ids AS (SELECT doc_id FROM documents
             UNION ALL
             SELECT doc_id + {mm.PHASH_CLONE_OFFSET} FROM documents
             WHERE doc_id % 20 = 0),
base AS (SELECT doc_id,
                CASE WHEN doc_id >= {mm.PHASH_CLONE_OFFSET}
                     THEN doc_id - {mm.PHASH_CLONE_OFFSET}
                     ELSE doc_id END AS eid,
                doc_id >= {mm.PHASH_CLONE_OFFSET} AS iscl
         FROM ids),
fr AS (SELECT doc_id, eid, iscl, u.fi AS frame_idx
       FROM base, UNNEST(range(2 + eid % 3)) AS u(fi)),
dims AS (SELECT doc_id, eid, iscl, frame_idx,
                {mm.VIDEO_W_BASE} + eid % {mm.VIDEO_W_MOD} AS w,
                {mm.VIDEO_H_BASE} + eid % {mm.VIDEO_H_MOD} AS h
         FROM fr),
px AS (SELECT doc_id, frame_idx, {_sql_video_clone_px_cols()}
       FROM dims),
hh AS (SELECT doc_id, frame_idx, {_sql_band_cols()} FROM px),
hv AS (SELECT doc_id,
              lpad(hex(b0), 4, '0') || lpad(hex(b1), 4, '0')
              || lpad(hex(b2), 4, '0') || lpad(hex(b3), 4, '0')
                AS phash
       FROM hh),
sized AS (SELECT *, count(*) OVER (PARTITION BY phash) AS sz FROM hv),
kept AS (SELECT doc_id, phash FROM sized WHERE sz <= {ih.MAX_BUCKET})
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(count(DISTINCT a.phash) AS BIGINT) AS n_shared
FROM kept a JOIN kept b
  ON a.phash = b.phash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(DISTINCT a.phash) >= 1
"""


EXTENSION_QUERIES.update(
    {
        # round-11 third batch (continued) — registry tail, queued
        # for the round-12 certification window
        "video_neardup": (video_neardup_q, SQL_VIDEO_NEARDUP),
    }
)


def inverted_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list construction (operators/textstats.py
    inverted_index): top-100 terms by document frequency with df, cf
    and the first 20 postings comma-joined — the bounded-collect
    form whose per-key state never exceeds max_postings ids even for
    stopword-grade terms."""
    return tx.inverted_index(_docs(spark, sf_dir))


SQL_INVERTED_INDEX = """
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS term
  FROM documents),
pd AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       FROM w GROUP BY term, doc_id),
r AS (SELECT term, doc_id, tf,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM pd),
a AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS cf,
             string_agg(CASE WHEN rn <= 20
                             THEN CAST(doc_id AS VARCHAR) END,
                        ',' ORDER BY doc_id) AS postings
      FROM r GROUP BY term)
SELECT term, df, cf, postings FROM a
ORDER BY df DESC, term ASC LIMIT 100
"""


def audio_energy_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-shape activity segmentation over REAL WAV PCM decode
    (operators/multimodal.py audio_energy_segments): per-frame energy
    from the recovered samples, threshold at the synth-fixture mean,
    islands-and-gaps merge into (seg_start, seg_end) runs. The oracle
    states the sample formula and the same islands rewrite; equality
    certifies the decode AND the run-key algebra."""
    return mm.audio_energy_segments(_docs(spark, sf_dir))


SQL_AUDIO_ENERGY_SEGMENTS = f"""
WITH f AS (SELECT doc_id, u.fi AS frame_idx
           FROM documents,
                UNNEST(range(5 + doc_id % 5)) AS u(fi)),
s AS (SELECT doc_id, frame_idx,
             frame_idx * {mm.AUDIO_FRAME} + v.i AS i
      FROM f, UNNEST(range({mm.AUDIO_FRAME})) AS v(i)),
fe AS (SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
              CAST(sum(abs(((doc_id*31 + i*17) % 4001) - 2000))
                   AS BIGINT) AS energy
       FROM s GROUP BY doc_id, frame_idx),
act AS (SELECT *,
               frame_idx - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY frame_idx)
                 AS run
        FROM fe WHERE energy >= {mm.AUDIO_ACTIVE_ENERGY})
SELECT doc_id,
       CAST(min(frame_idx) AS INTEGER) AS seg_start,
       CAST(max(frame_idx) AS INTEGER) AS seg_end,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(energy) AS BIGINT) AS total_energy
FROM act GROUP BY doc_id, run
"""


def video_shot_boundaries_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over REAL extracted video frames
    (operators/imagehash.py video_shot_boundaries): per-video lag
    window over the frame dHashes, exact popcount-of-XOR distance,
    cut where >= SHOT_THRESHOLD of 64 bits flip. The oracle restates
    the frame formula, the band hash, and the same lag algebra."""
    media = _docs(spark, sf_dir).select("doc_id").mapInPandas(
        mm.synth_avi_batch, mm.PNG_MEDIA_SCHEMA
    )
    return ih.video_shot_boundaries(media)


SQL_VIDEO_SHOT_BOUNDARIES = f"""
WITH fr AS (SELECT doc_id, u.fi AS frame_idx
            FROM documents,
                 UNNEST(range(2 + doc_id % 3)) AS u(fi)),
dims AS (SELECT doc_id, frame_idx,
                {mm.VIDEO_W_BASE} + doc_id % {mm.VIDEO_W_MOD} AS w,
                {mm.VIDEO_H_BASE} + doc_id % {mm.VIDEO_H_MOD} AS h
         FROM fr),
px AS (SELECT doc_id, frame_idx, {_sql_video_px_cols()} FROM dims),
hh AS (SELECT doc_id, frame_idx, {_sql_band_cols()} FROM px),
lg AS (SELECT doc_id, frame_idx, b0, b1, b2, b3,
              lag(b0) OVER w AS p0, lag(b1) OVER w AS p1,
              lag(b2) OVER w AS p2, lag(b3) OVER w AS p3
       FROM hh
       WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
d AS (SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             CAST(bit_count(xor(CAST(b0 AS BIGINT), CAST(p0 AS BIGINT)))
                + bit_count(xor(CAST(b1 AS BIGINT), CAST(p1 AS BIGINT)))
                + bit_count(xor(CAST(b2 AS BIGINT), CAST(p2 AS BIGINT)))
                + bit_count(xor(CAST(b3 AS BIGINT), CAST(p3 AS BIGINT)))
                AS INTEGER) AS dist
      FROM lg WHERE p0 IS NOT NULL)
SELECT doc_id, frame_idx, dist,
       dist >= {ih.SHOT_THRESHOLD} AS is_boundary
FROM d
"""


EXTENSION_QUERIES.update(
    {
        # round-11 fourth batch — registry tail, queued for the
        # round-12 certification window
        "inverted_index": (inverted_index_q, SQL_INVERTED_INDEX),
        "audio_energy_segments": (
            audio_energy_segments_q,
            SQL_AUDIO_ENERGY_SEGMENTS,
        ),
        "video_shot_boundaries": (
            video_shot_boundaries_q,
            SQL_VIDEO_SHOT_BOUNDARIES,
        ),
    }
)


def lm_heldout_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out unigram LM with add-one OOV smoothing
    (operators/textstats.py lm_heldout_score): fit on the doc_id %
    10 == 0 split, score everything — the train/apply-split scorer
    whose OOV path the corpus-self-trained LMs never exercise."""
    return tx.lm_heldout_score(_docs(spark, sf_dir))


SQL_LM_HELDOUT = """
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM w GROUP BY doc_id, term),
tc AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c
       FROM tf WHERE doc_id % 10 = 0 GROUP BY term),
tv AS (SELECT CAST(sum(c) + count(*) + 1 AS BIGINT) AS tv1 FROM tc),
pd AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
              CAST(sum(CASE WHEN c IS NULL THEN tf ELSE 0 END)
                   AS BIGINT) AS n_oov,
              sum(CAST(tf AS DOUBLE)
                  * ln(CAST(coalesce(c, 0) + 1 AS DOUBLE))) AS s
       FROM tf LEFT JOIN tc USING (term) GROUP BY doc_id)
SELECT doc_id, n_tokens, n_oov,
       s / CAST(n_tokens AS DOUBLE) - ln(CAST(tv1 AS DOUBLE))
         AS avg_logprob
FROM pd, tv
"""


EXTENSION_QUERIES.update(
    {
        # round-11 fifth batch (continued) — registry tail, queued
        # for the round-12 certification window
        "lm_heldout_score": (lm_heldout_score_q, SQL_LM_HELDOUT),
    }
)


def stream_cdc_screen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC ingest screen (streaming/cdc.py
    cdc_screen_stream): arriving change rows classify themselves
    against the static snapshot — stateless, append mode, the batch
    classification join is the oracle."""
    from ..streaming.cdc import cdc_screen_stream

    return cdc_screen_stream(spark, sf_dir)


SQL_STREAM_CDC_SCREEN = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS base_v
  FROM orders WHERE o_orderkey % 100 < 90),
ch AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 5 = 0
              THEN CAST(round(o_totalprice * 100) AS BIGINT) + 111
         END AS v,
         CASE WHEN o_orderkey % 5 = 0 THEN 'U'
              WHEN o_orderkey % 11 = 0 THEN 'D' END AS op
  FROM orders)
SELECT c.k, c.op, c.v,
       CASE WHEN c.op = 'D' AND b.base_v IS NOT NULL THEN 'delete'
            WHEN c.op = 'D' THEN 'delete_unknown'
            WHEN b.base_v IS NOT NULL THEN 'update'
            ELSE 'insert' END AS klass
FROM ch c LEFT JOIN base b ON c.k = b.k
WHERE c.op IS NOT NULL
"""


EXTENSION_QUERIES.update(
    {
        # round-11 fifth batch (continued) — registry tail, queued
        # for the round-12 certification window
        "stream_cdc_screen": (stream_cdc_screen_q, SQL_STREAM_CDC_SCREEN),
    }
)


_HTML_TAIL = (
    '</p><p>AT&amp;T says 1 &lt; 2 &quot;q&quot; &apos;a&apos;</p>'
    '<script type="text/javascript">var hidden = "LEAK";</script>'
    "</body></html>"
)


def html_strip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup-to-text extraction (operators/textstats.py html_strip)
    over a deterministic wrapping of documents.text in real page
    structure — head/style block, heading, inline tags, entity-coded
    punctuation, and a trailing script whose payload must NOT leak
    into the text. Both engines build the identical page string;
    each strips with its own regex engine, so equality certifies the
    tag/entity/whitespace chain."""
    pages = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit(
                "<html><head><style>p {color: red}</style></head>"
                "<body><h1>Doc "
            ),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"),
            F.replace(
                F.col("text"), F.lit(" data "), F.lit(" <b>data</b> ")
            ),
            F.lit(_HTML_TAIL),
        ).alias("html"),
    )
    return tx.html_strip(pages)


SQL_HTML_STRIP = f"""
WITH pages AS (
  SELECT doc_id,
         '<html><head><style>p {{color: red}}</style></head>'
         || '<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
         || replace(text, ' data ', ' <b>data</b> ')
         || '{_HTML_TAIL.replace("'", "''")}' AS html
  FROM documents),
s1 AS (SELECT doc_id,
              regexp_replace(html,
                '(?is)<script[^>]*>.*?</script\\s*>', ' ', 'g') AS h
       FROM pages),
s2 AS (SELECT doc_id,
              regexp_replace(h,
                '(?is)<style[^>]*>.*?</style\\s*>', ' ', 'g') AS h
       FROM s1),
s3 AS (SELECT doc_id, regexp_replace(h, '<[^>]*>', ' ', 'g') AS h
       FROM s2),
s4 AS (SELECT doc_id,
              replace(replace(replace(replace(replace(h,
                '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                '&apos;', ''''), '&amp;', '&') AS h
       FROM s3)
SELECT doc_id,
       trim(regexp_replace(h, '\\s+', ' ', 'g')) AS text
FROM s4
"""


EXTENSION_QUERIES.update(
    {
        # round-11 sixth batch (continued) — registry tail, queued
        # for the round-12 certification window
        "html_strip": (html_strip_q, SQL_HTML_STRIP),
    }
)


def embed_power_iteration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer power iteration (operators/simsearch.py
    embed_power_iteration): the corpus's top embedding direction as
    64 BIGINTs, bit-identical across engines — the DuckDB twin
    unrolls the same 5 integer rounds as chained CTEs."""
    return ss.embed_power_iteration(
        scan_parquet(spark, sf_dir, "embeddings")
    )


def _sql_power_iteration(iterations: int = 5) -> str:
    qs, vs = ss.PI_QSCALE, ss.PI_VSCALE
    blocks = [
        f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, r.d AS dim,
         CAST(round(CAST(embedding[r.d + 1] AS DOUBLE) * {qs}.0)
              AS BIGINT) AS x
  FROM embeddings, UNNEST(range(64)) r(d)),
v0 AS (SELECT r.d AS dim, CAST({vs} AS BIGINT) AS v
       FROM UNNEST(range(64)) r(d))"""
    ]
    for k in range(1, int(iterations) + 1):
        p = k - 1
        blocks.append(
            f"""
d{k} AS (SELECT vec_id, CAST(sum(x * v) AS BIGINT) AS dot
        FROM q JOIN v{p} USING (dim) GROUP BY vec_id),
u{k} AS (SELECT dim, CAST(sum(x * dot) AS BIGINT) AS u
        FROM q JOIN d{k} USING (vec_id) GROUP BY dim),
m{k} AS (SELECT greatest(CAST(max(abs(u)) AS BIGINT) // {vs},
                         CAST(1 AS BIGINT)) AS den FROM u{k}),
v{k} AS (SELECT dim,
                CAST(CASE WHEN u < 0 THEN -((-u) // den)
                     ELSE u // den END AS BIGINT) AS v
        FROM u{k}, m{k})"""
        )
    return (
        ",".join(blocks)
        + f"\nSELECT CAST(dim AS INTEGER) AS dim, v AS v_fp"
        f" FROM v{int(iterations)}\n"
    )


EXTENSION_QUERIES.update(
    {
        # round-11 sixth batch (continued) — registry tail, queued
        # for the round-12 certification window
        "embed_power_iteration": (
            embed_power_iteration_q,
            _sql_power_iteration(),
        ),
    }
)


from .oracle_common import sql_md5_hash32  # noqa: E402
from ..operators import warehouse as wh  # noqa: E402


def bootstrap_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for mean document length
    (operators/warehouse.py bootstrap_ci): deterministic md5-slice
    Poisson weights, exact-integer replica sums, order-statistic
    interval over B = 50 replicas."""
    return wh.bootstrap_ci(_docs(spark, sf_dir))


def _sql_bootstrap_ci(b: int = wh.BOOTSTRAP_B) -> str:
    h = sql_md5_hash32("CAST(doc_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)")
    t = wh.BOOTSTRAP_CDF_FP
    wcase = (
        f"CASE WHEN {h} < {t[0]} THEN 0 "
        + " ".join(
            f"WHEN {h} < {t[k]} THEN {k}" for k in range(1, len(t))
        )
        + " ELSE 6 END"
    )
    idx_lo = max(1, -(-5 * b // 100))
    idx_med = max(1, -(-50 * b // 100))
    idx_hi = max(1, -(-95 * b // 100))
    return f"""
WITH reps AS (
  SELECT doc_id, n_chars AS v, r.rep
  FROM documents, UNNEST(range({int(b)})) r(rep)),
wt AS (SELECT rep, {wcase} AS w, v FROM reps),
means AS (
  SELECT rep,
         CAST(sum(w * v) AS DOUBLE)
           / CAST(nullif(sum(w), 0) AS DOUBLE) AS mean_r
  FROM wt GROUP BY rep),
ranked AS (
  SELECT mean_r,
         row_number() OVER (ORDER BY mean_r, rep) AS rn
  FROM means)
SELECT CAST(count(*) AS BIGINT) AS n_replicas,
       max(CASE WHEN rn = {idx_lo} THEN mean_r END) AS ci_lo,
       max(CASE WHEN rn = {idx_med} THEN mean_r END) AS ci_median,
       max(CASE WHEN rn = {idx_hi} THEN mean_r END) AS ci_hi
FROM ranked
"""


EXTENSION_QUERIES.update(
    {
        # round-11 sixth batch (continued) — registry tail, queued
        # for the round-12 certification window
        "bootstrap_ci": (bootstrap_ci_q, _sql_bootstrap_ci()),
    }
)


def lm_kn_bigram_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram LM scoring (operators/textstats.py
    lm_kn_bigram_score): absolute discounting + continuation back-off
    with all-integer counts; the float expression is pinned
    left-to-right identically in the twin."""
    return tx.lm_kn_bigram_score(_docs(spark, sf_dir))


SQL_LM_KN_BIGRAM = rf"""
WITH b AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
                             x -> x <> '') AS arr
  FROM documents
),
pairs AS (SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
          FROM b, UNNEST(range(1, len(arr))) AS r(i)),
tfb AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf
        FROM pairs GROUP BY doc_id, w1, w2),
c12 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12
        FROM tfb GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1p_fwd
        FROM c12 GROUP BY w1),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bwd
         FROM c12 GROUP BY w2),
ty AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM c12),
pd AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         sum(CAST(tf AS DOUBLE)
             * ln(greatest(CAST(c12 AS DOUBLE) - {tx.KN_DISCOUNT},
                           0.0)
                    / CAST(c1 AS DOUBLE)
                  + {tx.KN_DISCOUNT} * CAST(n1p_fwd AS DOUBLE)
                    / CAST(c1 AS DOUBLE)
                    * (CAST(n1p_bwd AS DOUBLE)
                       / CAST(n_types AS DOUBLE)))) AS s
       FROM tfb JOIN c12 USING (w1, w2) JOIN ctx USING (w1)
       JOIN cont USING (w2) CROSS JOIN ty GROUP BY doc_id)
SELECT doc_id, n_bigrams,
  s / CAST(n_bigrams AS DOUBLE) AS avg_logprob
FROM pd
"""


EXTENSION_QUERIES.update(
    {
        # round-11 sixth batch (continued) — registry tail, queued
        # for the round-12 certification window
        "lm_kn_bigram_score": (lm_kn_bigram_score_q, SQL_LM_KN_BIGRAM),
    }
)
