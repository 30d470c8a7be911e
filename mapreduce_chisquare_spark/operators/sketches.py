"""Mergeable sketches with CROSS-ENGINE-DETERMINISTIC contracts.

Spark's own approx_count_distinct (HLL++) is the right production
sketch, but its register layout is engine-private — a DuckDB twin
cannot reproduce it bit-for-bit, so dq_profile certifies it only via
a tolerance flag. kmv_distinct closes that gap: a K-Minimum-Values
distinct sketch (Bar-Yossef et al. 2002) whose every step — the hash,
the k-smallest selection, the estimator — is expressible identically
in both engines, so the ESTIMATE itself hash-matches in the oracle
gate. That also makes it the auditable sketch: two runs, two engines,
two cluster topologies all report the same number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_HASH_BITS = 60  # 15 hex chars of md5 -> always fits BIGINT, positive
KMV_HASH_SPACE = float(2**KMV_HASH_BITS)


def kmv_hash_expr(col: F.Column) -> F.Column:
    """Deterministic 60-bit uniform hash shared with DuckDB: the
    first 15 hex chars of md5 over the value's canonical decimal
    string. Both engines render BIGINT->string identically and both
    implement md5, so the hash — unlike Spark's murmur3 `hash()` or
    `xxhash64` — has a bit-identical twin."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")


def kmv_kept(
    df: DataFrame, key_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """The sketch STATE: per group, the k smallest distinct hashes —
    (grp, h, rn). This relation is what merges: the union of two
    groups' retained sets, re-selected to the k smallest, is exactly
    the sketch of the union (any hash among the global k smallest is
    necessarily among its own group's k smallest), which is what lets
    1000 executors sketch shards independently and combine. The
    rank<=k filter compiles to WindowGroupLimit (plan-asserted)."""
    hashed = (
        df.select(
            F.col(group_col).alias("grp"),
            kmv_hash_expr(F.col(key_col)).alias("h"),
        )
        # NULL keys hash to NULL and are excluded from the sketch on
        # BOTH engines (Spark sorts NULL first, DuckDB last — left in,
        # a NULL would evict a real hash on one side only)
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    return hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= F.lit(int(k))
    )


def kmv_merge(kept: DataFrame, k: int = 64) -> DataFrame:
    """Merge per-group KMV sketch states into ONE estimate of the
    distinct count of the union: global k smallest over the union of
    retained hashes (deduped — the same key hashes identically in
    every group), same estimator. Exactly equals the sketch built
    directly on the unpartitioned stream (asserted in tests) — the
    mergeability proof. Returns one row
    (n_groups, k_used, kmv_distinct).

    Scale shape: the input is already <= k rows per group; the global
    top-k is TakeOrdered (distributed partial top-k, never a
    single-partition window), and the estimator is a 1-row
    aggregate."""
    # n_groups rides a lazy 1-row aggregate (the module's standard
    # 1-row-crossJoin attach) — an eager count here would execute the
    # whole upstream sketch twice per call
    groups = kept.agg(
        F.countDistinct("grp").cast("long").alias("n_groups")
    )
    topk = kept.select("h").distinct().orderBy("h").limit(int(k))
    per = topk.agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").alias("hk"),
    ).crossJoin(F.broadcast(groups))
    est = F.when(
        F.col("k_used") < F.lit(int(k)), F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_HASH_SPACE) / F.col("hk").cast("double")
    )
    return per.select("n_groups", "k_used", est.alias("kmv_distinct"))


def kmv_distinct(
    df: DataFrame, key_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """Per-group approximate distinct count via K-Minimum-Values:
    keep the k smallest distinct hash values; if fewer than k distinct
    hashes exist the count is exact, else estimate
    (k-1) * 2^60 / h_k where h_k is the k-th smallest hash (the
    classic unbiased KMV estimator; relative error ~ 1/sqrt(k-2)).
    Returns (group, kmv_distinct DOUBLE, k_used BIGINT) — k_used is
    the number of retained hashes (= k when saturated), so a consumer
    can see which rows are exact.

    Scale shape: the sketch state per group is k BIGINTs — mergeable
    by union+re-select, the property that lets 1000 executors sketch
    100 TB with map-side partial selection. The rank<=k filter over
    the window compiles to WindowGroupLimit (partial per-partition
    top-k BEFORE the exchange, plan-asserted in tests), so the
    shuffle carries at most k rows per (partition, group), never the
    distinct-key relation."""
    kept = kmv_kept(df, key_col, group_col, k)
    per = kept.groupBy("grp").agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").alias("hk"),
    )
    est = F.when(
        F.col("k_used") < F.lit(int(k)), F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_HASH_SPACE) / F.col("hk").cast("double")
    )
    return per.select(
        F.col("grp").alias(group_col),
        est.alias("kmv_distinct"),
        "k_used",
    )


# ---------------------------------------------------------------------
# Mergeable rank (quantile) sketch: deterministic bottom-k sample
# ---------------------------------------------------------------------

def rank_sketch_kept(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: list,
    k: int = 256,
) -> DataFrame:
    """The rank-sketch STATE: per group, the values of the k rows
    whose ROW-IDENTITY hashes are smallest — (group_cols..., h, c).
    A deterministic uniform sample (the KMV discipline applied to
    rank estimation): hashing the unique row id with the shared
    60-bit md5 hash induces one global random-but-fixed order over
    rows, and keeping the bottom-k under that order is (a) a uniform
    k-sample of the group and (b) MERGEABLE — the union of two
    shards' kept sets re-selected to the bottom-k is exactly the
    sketch of the union, since any globally-bottom-k hash is
    necessarily bottom-k within its own shard. That is what lets 1000
    executors sketch 100 TB independently and combine, with the SAME
    answer as one pass (asserted bit-for-bit in tests), and the same
    answer from DuckDB (the oracle gate certifies the ESTIMATE, not a
    tolerance band).

    The sort key is (h, c): ids are unique so h ties are ~2^-60, but
    if one ever fired the kept (h, c) MULTISET — all any consumer
    reads — is still deterministic. rank<=k compiles to
    WindowGroupLimit (partial per-partition top-k before the
    exchange), so the shuffle carries at most k rows per (partition,
    group)."""
    cols = [F.col(g) for g in group_cols]
    hashed = df.select(
        *cols,
        kmv_hash_expr(F.col(id_col)).alias("h"),
        F.col(value_col).alias("c"),
    ).filter(F.col("h").isNotNull())
    w = Window.partitionBy(*group_cols).orderBy("h", "c")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(int(k)))
        .drop("rn")
    )


def rank_sketch_quantiles(
    kept: DataFrame,
    group_cols: list,
    percentiles: tuple = (50, 95, 99),
) -> DataFrame:
    """Quantile ESTIMATES from a kept bottom-k sample: per group, the
    sampled value at 0-based sorted position ((m-1) * p) div 100 of
    the m kept values — the same exact-integer 'lower' quantile
    contract as warehouse.dq_quantiles, applied to the sample. With
    m = min(k, n) the estimate's rank error on the full group is the
    classic sampling bound ~ n/sqrt(k). Returns
    (group_cols..., n_sampled, q50, q95, q99) in the sketch's value
    units (callers restore display units).

    Scale shape: input is <= k rows per group; the ordering window
    and the count share one group-keyed exchange over that bounded
    relation."""
    w = Window.partitionBy(*group_cols).orderBy("c", "h")
    wn = Window.partitionBy(*group_cols)
    ranked = kept.withColumn(
        "__rn", F.row_number().over(w).cast("long")
    ).withColumn("__m", F.count("*").over(wn))
    aggs = [F.max("__m").cast("long").alias("n_sampled")]
    for p in percentiles:
        idx = F.expr(f"((__m - 1) * {int(p)}) div 100")
        aggs.append(
            F.max(F.when(F.col("__rn") - 1 == idx, F.col("c"))).alias(
                f"q{int(p)}"
            )
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------
# Deterministic heavy hitters: the Misra-Gries summary
# ---------------------------------------------------------------------

def mg_summary(
    counts: DataFrame, key_col: str, k: int = 10
) -> DataFrame:
    """The Misra-Gries k-counter summary as a deterministic function
    of a (key, c) count relation: subtract the (k+1)-th largest count
    t from every count and keep the (at most k) keys still positive —
    exactly the summary an MG stream pass with k counters guarantees,
    with the two-sided contract c_hat <= c_true <= c_hat + t and
    t <= N/(k+1) (Misra & Gries 1982; Agarwal et al., Mergeable
    Summaries, PODS'12 — the 'subtract the (k+1)-th largest and
    prune' formulation is their merge step applied once to exact
    counts). Ties break by key ascending so both engines select the
    identical summary. Returns (key, c_hat, err_bound=t), c_hat
    descending-deterministic.

    Scale shape: the count relation arrives map-side combined; the
    (k+1)-row head is TakeOrderedAndProject (distributed partial
    top-k, never a global sort or an unpartitioned window over the
    vocabulary); t attaches via the module's 1-row broadcast
    crossJoin; the final window runs over <= k+1 rows."""
    top = counts.orderBy(
        F.desc("c"), F.asc(key_col)
    ).limit(int(k) + 1)
    t_rel = top.agg(
        F.count("*").alias("__n_top"), F.min("c").alias("__mn")
    ).select(
        F.when(F.col("__n_top") == F.lit(int(k) + 1), F.col("__mn"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("t")
    )
    # Unpartitioned window is BOUNDED: `top` is the (k+1)-row
    # TakeOrdered head, so this single task ranks k+1 rows.
    w = Window.orderBy(F.desc("c"), F.asc(key_col))
    return (
        top.crossJoin(F.broadcast(t_rel))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") <= F.lit(int(k)))
            & (F.col("c") - F.col("t") > 0)
        )
        .select(
            key_col,
            (F.col("c") - F.col("t")).alias("c_hat"),
            F.col("t").alias("err_bound"),
        )
    )


def mg_summary_sharded(
    df: DataFrame, key_col: str, shard_col: str, k: int = 10
) -> DataFrame:
    """Per-shard MG summaries merged into one k-counter summary — the
    Agarwal et al. mergeability law executed as a plan: each shard
    builds its own MG(k) summary (counts minus its own (k+1)-th
    largest, keyed window — the per-shard truncation is what bounds
    state to k counters per shard at 100 TB), the summaries ADD
    (c_hat sums across shards), and the merged multiset shrinks again
    by ITS (k+1)-th largest. Error telescopes: c_true - c_hat <=
    sum over shards of N_s/(k+1) + t_merge <= 2N/(k+1). Returns
    (key, c_hat, err_bound = sum of subtracted thresholds folded into
    the final shrink's t) — err_bound here is the merge-stage t only;
    the full contract is pinned by the test against exact counts."""
    sc = df.groupBy(shard_col, key_col).agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.partitionBy(shard_col).orderBy(
        F.desc("c"), F.asc(key_col)
    )
    rn = sc.withColumn("__rn", F.row_number().over(w))
    head = rn.filter(F.col("__rn") <= F.lit(int(k) + 1))
    t_s = head.groupBy(shard_col).agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == int(k) + 1, F.col("c"))),
            F.lit(0).cast("long"),
        ).alias("t_s")
    )
    summaries = (
        head.join(F.broadcast(t_s), shard_col)
        .filter(
            (F.col("__rn") <= F.lit(int(k)))
            & (F.col("c") - F.col("t_s") > 0)
        )
        .select(
            key_col, (F.col("c") - F.col("t_s")).alias("c_hat_s")
        )
    )
    merged = summaries.groupBy(key_col).agg(
        F.sum("c_hat_s").cast("long").alias("c")
    )
    return mg_summary(merged, key_col, k)


def rank_sketch_merge(
    kept: DataFrame, group_cols: list, k: int = 256
) -> DataFrame:
    """Merge per-shard rank-sketch states (group_cols no longer
    include the shard): bottom-k by (h, c) over the union of retained
    rows. Exactly equals the sketch built directly on the
    unsharded stream — the mergeability proof, asserted bit-for-bit
    in tests. Input is <= k rows per (group, shard), so the window
    runs over a bounded relation."""
    w = Window.partitionBy(*group_cols).orderBy("h", "c")
    return (
        kept.select(*group_cols, "h", "c")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(int(k)))
        .drop("rn")
    )


HLL_P = 6                 # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W_BITS = 32 - HLL_P   # 26 low bits feed the rank
HLL_ALPHA = 0.709         # Flajolet's alpha_m for m = 64 (exact table value)


def hll_rho_expr(w: F.Column) -> F.Column:
    """rho(w) = leading zeros of w in HLL_W_BITS bits, plus 1 (w = 0
    maps to HLL_W_BITS + 1) — built as an integer CASE ladder, never
    a float log2, so both engines agree bit-for-bit at every power-
    of-two boundary. The DuckDB twin generates the same ladder from
    the same constants (plans/ext_round12.py _sql_hll_rho)."""
    expr = F.lit(HLL_W_BITS + 1)
    # descending thresholds: w >= 2^(W-1) -> 1, w >= 2^(W-2) -> 2, ...
    for rho in range(HLL_W_BITS, 0, -1):
        expr = F.when(
            w >= F.lit(1 << (HLL_W_BITS - rho)), F.lit(rho)
        ).otherwise(expr)
    return expr


def hll_registers(
    df: DataFrame, key_col: str, shard_col: str | None = None
) -> DataFrame:
    """HyperLogLog register relation (Flajolet et al. 2007, public):
    each key hashes to a 32-bit md5 slice; the top HLL_P bits pick a
    register, rho of the low bits is the rank, and the register
    holds the MAX rank seen. Returns (idx, m_j) — all HLL_M rows,
    absent registers at 0 — or (shard, idx, m_j) when `shard_col`
    is given (the mergeable per-shard form).

    Scale shape: ONE max aggregate, map-side combinable (max is the
    canonical commutative combiner — at 100 TB every partition
    reduces to <= HLL_M rows of (idx, rho) before the exchange);
    the register join against the literal 0..m-1 index array is
    m-row driver-side work."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    rows = df.select(
        *([F.col(shard_col).alias("shard")] if shard_col else []),
        h.alias("__h"),
    ).select(
        *(["shard"] if shard_col else []),
        F.expr(f"__h div {1 << HLL_W_BITS}").cast("int").alias("idx"),
        (F.col("__h") % F.lit(1 << HLL_W_BITS)).alias("__w"),
    )
    per = rows.select(
        *(["shard"] if shard_col else []),
        "idx",
        hll_rho_expr(F.col("__w")).cast("int").alias("__rho"),
    ).groupBy(*(["shard", "idx"] if shard_col else ["idx"])).agg(
        F.max("__rho").cast("int").alias("m_j")
    )
    full = F.explode(
        F.sequence(F.lit(0), F.lit(HLL_M - 1))
    ).alias("idx")
    if shard_col:
        shards = df.select(F.col(shard_col).alias("shard")).distinct()
        frame = shards.select("shard", full)
        return frame.join(per, ["shard", "idx"], "left").select(
            "shard",
            "idx",
            F.coalesce(F.col("m_j"), F.lit(0)).cast("int").alias("m_j"),
        )
    frame = df.sparkSession.range(1).select(full)
    return frame.join(per, "idx", "left").select(
        "idx",
        F.coalesce(F.col("m_j"), F.lit(0)).cast("int").alias("m_j"),
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """HLL cardinality estimate from a register relation (idx, m_j):
    raw = alpha * m^2 / sum(2^-m_j), with Flajolet's small-range
    linear-counting correction (raw <= 2.5m and zero registers
    exist -> m * ln(m / V)). Every 2^-m_j is 1.0 / (1 << m_j) — an
    exact binary fraction, so the 64-term sum is EXACT in double
    regardless of order and the engines cannot drift. Returns one
    row (n_registers, zero_registers, hll_raw, hll_estimate)."""
    agg = registers.agg(
        F.count("*").cast("long").alias("m"),
        F.sum((F.col("m_j") == 0).cast("long")).cast("long").alias("v"),
        F.sum(
            F.lit(1.0)
            / F.expr("CAST(CAST(1 AS BIGINT) << m_j AS DOUBLE)")
        ).alias("s"),
    )
    raw = (
        F.lit(float(HLL_ALPHA))
        * F.col("m").cast("double")
        * F.col("m").cast("double")
        / F.col("s")
    )
    lc = F.col("m").cast("double") * F.log(
        F.col("m").cast("double") / F.col("v").cast("double")
    )
    return agg.select(
        F.col("m").alias("n_registers"),
        F.col("v").alias("zero_registers"),
        raw.alias("hll_raw"),
        F.when(
            (raw <= F.lit(2.5) * F.col("m").cast("double"))
            & (F.col("v") > 0),
            lc,
        )
        .otherwise(raw)
        .alias("hll_estimate"),
    )


def hll_merge(registers: DataFrame) -> DataFrame:
    """Merge per-shard HLL registers (shard, idx, m_j) into one
    register relation by per-index MAX — the property that makes HLL
    the warehouse distinct sketch: 1000 executors each sketch their
    shard, 64 ints per shard travel, and the union's estimate equals
    the single-pass sketch EXACTLY (max is idempotent/commutative)."""
    return registers.groupBy("idx").agg(
        F.max("m_j").cast("int").alias("m_j")
    )


def hll_intersection(
    df_a: DataFrame, df_b: DataFrame, key_col: str
) -> DataFrame:
    """HLL set algebra: |A|, |B|, |A ∪ B| (union is EXACT sketch
    algebra — per-index register max), and the inclusion-exclusion
    intersection estimate |A| + |B| - |A ∪ B| — the audience-overlap
    / cross-corpus-contamination estimator. Returns one row
    (est_a, est_b, est_union, est_intersection). Intersection by
    inclusion-exclusion inherits the union's absolute error (the
    standard HLL caveat, disclosed: small true intersections can
    estimate negative — clamped at 0 on both engines).

    Scale shape: two independent register sketches (each one
    map-side-combinable max aggregate), merged by per-index max —
    3 * HLL_M rows of state total, three estimate formulas."""
    ra = hll_registers(df_a, key_col)
    rb = hll_registers(df_b, key_col)
    ru = (
        ra.select("idx", "m_j")
        .unionAll(rb.select("idx", "m_j"))
        .groupBy("idx")
        .agg(F.max("m_j").cast("int").alias("m_j"))
    )
    ea = hll_estimate(ra).select(
        F.col("hll_estimate").alias("est_a")
    )
    eb = hll_estimate(rb).select(
        F.col("hll_estimate").alias("est_b")
    )
    eu = hll_estimate(ru).select(
        F.col("hll_estimate").alias("est_union")
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0.0),
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
            ).alias("est_intersection"),
        )
    )


BLOOM_M = 1 << 14  # filter bits
BLOOM_K = 4        # hash functions (independent md5 slices)


def bloom_bits(df: DataFrame, key_col: str, k: int = BLOOM_K, m: int = BLOOM_M) -> DataFrame:
    """The k bit positions each key sets in an m-bit Bloom filter
    (Bloom 1970, public): hash j of key s is a 32-bit slice of
    md5(s || ':' || j) taken mod m — the KMV/HLL shared-hash
    discipline, so the DuckDB twin reproduces every position with
    plans/oracle_common.sql_md5_hash32 and the two engines agree on
    every bit, INCLUDING false positives. Returns the input columns
    plus (j, bit) — ONE scan, row-local k-way explode (no union of
    k passes over the input)."""

    def _bit(j: int) -> F.Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(key_col).cast("string"),
                        F.lit(":"),
                        F.lit(str(j)),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return (h % F.lit(int(m))).cast("long")

    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("j"),
                    _bit(j).alias("bit"),
                )
                for j in range(int(k))
            ]
        )
    )
    return df.select("*", pairs.alias("__jb")).select(
        "*", F.col("__jb.j").alias("j"), F.col("__jb.bit").alias("bit")
    ).drop("__jb")


def bloom_screen(
    corpus: DataFrame,
    queries: DataFrame,
    key_col: str = "key",
    id_col: str = "doc_id",
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Bloom-filter membership prescreen — the cheap first gate of
    every 100 TB exact-dedup / decontamination pipeline (test a
    candidate against a compact filter of the stored corpus BEFORE
    paying the exact hash join): per query row, maybe_dup is true
    iff ALL k of its bits are set in the corpus filter. No false
    negatives ever; false positives at the standard (1-e^{-kn/m})^k
    rate — and because both engines replay the identical md5 bit
    math, the oracle certifies the exact decision vector, false
    positives included. Returns (doc_id, maybe_dup).

    Scale shape: the corpus collapses to its DISTINCT set-bit
    relation — at most m rows (16 KiB of longs at the default m),
    the textbook broadcast side regardless of corpus size; queries
    explode to k rows each, take the broadcast hash join, and ONE
    map-side-combinable (doc_id) count-match aggregate decides
    membership. One narrow exchange on doc_id total; at a bigger m
    the same plan ships the filter as a real bitset via
    F.broadcast all the same."""
    set_bits = (
        bloom_bits(corpus.select(key_col), key_col, k, m)
        .select("bit")
        .distinct()
    )
    return _bloom_probe(set_bits, queries, key_col, id_col, k, m)


def _bloom_probe(
    set_bits: DataFrame,
    queries: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    m: int,
) -> DataFrame:
    """Probe side shared by the one-shot and merged builds: broadcast
    the (<= m row) set-bit relation, explode each query to its k bit
    probes, and decide membership with one map-side-combinable
    (doc_id) count-match aggregate."""
    marked = set_bits.withColumn("__set", F.lit(1))
    probes = bloom_bits(
        queries.select(id_col, key_col), key_col, k, m
    ).select(id_col, "bit")
    hits = probes.join(F.broadcast(marked), "bit", "left")
    return (
        hits.groupBy(id_col)
        .agg(
            (F.count("__set") == F.lit(int(k))).alias("maybe_dup"),
        )
    )


def bloom_screen_merged(
    corpus: DataFrame,
    queries: DataFrame,
    shard_col: str,
    key_col: str = "key",
    id_col: str = "doc_id",
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """The MERGEABLE build of bloom_screen — the 100 TB shape where
    each ingest shard (a day's crawl, a source partition) builds its
    own filter and the screen runs against their union: a Bloom
    filter merges by OR, which on the set-bit relation is just
    distinct-union, so per-shard (shard, bit) sketches — each <= m
    rows, buildable independently and shippable as tiny artifacts —
    collapse to the identical whole-corpus filter. Decisions are
    bit-for-bit those of the one-shot build (same oracle); the
    kmv_merge / hll_merge discipline applied to membership."""
    per_shard = (
        bloom_bits(corpus.select(shard_col, key_col), key_col, k, m)
        .select(F.col(shard_col).alias("shard"), "bit")
        .distinct()  # the per-shard sketch relation
    )
    merged = per_shard.select("bit").distinct()
    return _bloom_probe(merged, queries, key_col, id_col, k, m)
