"""Warehouse-maintenance operators: data-quality profiling and
SCD2 (slowly-changing-dimension) merge.

dq_profile is the schema-audit pass every ingestion pipeline runs
before accepting a drop; scd2_merge is the versioned-dimension upsert
warehouses run on every refresh — expressed table-format-agnostically
(a Delta/Iceberg MERGE would replace the final write, not the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dq_profile(
    df: DataFrame, columns: list[str], exact_audit: bool = True
) -> DataFrame:
    """Column-quality profile: one row per metric x column —
    (column, metric, value) with metrics rows / nulls / distinct /
    min / max (min/max as doubles for numeric columns, null
    otherwise).

    The main pass is ONE aggregation over the input — every metric
    map-side-combined, distinct counts as approx_count_distinct
    (HLL++, rsd=1%): fixed-size mergeable sketch buffers, so the plan
    has NO Expand (the exact multi-column count_distinct form
    replicates the input x columns through an Expand — the round-2
    shape, wrong at 100 TB).

    exact_audit=False (the at-scale posture) stops there: metric
    `distinct` is the HLL estimate, one read of the table, one plan.

    exact_audit=True (default; the oracle-comparable audit) adds a
    second aggregation computing exact per-column distincts via
    unpivot -> ONE grouped count_distinct (a single distinct
    aggregate, so still no Expand) and emits `distinct` = exact plus a
    `distinct_est_ok` row per column — 1.0 iff this engine's own HLL
    estimate is within 5% of its own exact count (the
    agg_approx_distinct tolerance-flag contract: estimates are
    engine-specific, the flag is not)."""
    aggs = []
    for c in columns:
        dt = dict(df.dtypes)[c]
        numeric = dt in ("bigint", "int", "double", "float", "smallint")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(F.col(c), 0.01).alias(f"{c}__est"),
            (
                F.min(F.col(c)).cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"{c}__min"),
            (
                F.max(F.col(c)).cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)

    if not exact_audit:
        rows = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit(m).alias("metric"),
                    F.col(f"{c}__{s}").cast("double").alias("value"),
                )
                for c in columns
                for m, s in (
                    ("rows", "rows"),
                    ("nulls", "nulls"),
                    ("distinct", "est"),
                    ("min", "min"),
                    ("max", "max"),
                )
            ]
        )
        return wide.select(F.explode(rows).alias("r")).select(
            "r.column", "r.metric", "r.value"
        )

    # Exact audit side: unpivot (column, value-as-string) then one
    # grouped count_distinct. Distinctness of the string image equals
    # distinctness of the value for these types (audit inputs), and
    # both engines compare the same way.
    unpivoted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in columns
                ]
            )
        ).alias("r")
    ).select("r.column", "r.v")
    exact = unpivoted.groupBy("column").agg(
        F.count_distinct("v").alias("exact_distinct")
    )

    per_col = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__rows").cast("double").alias("rows"),
                        F.col(f"{c}__nulls").cast("double").alias("nulls"),
                        F.col(f"{c}__est").cast("double").alias("est"),
                        F.col(f"{c}__min").alias("min"),
                        F.col(f"{c}__max").alias("max"),
                    )
                    for c in columns
                ]
            )
        ).alias("r")
    ).select("r.*")
    joined = exact.join(F.broadcast(per_col), "column")
    ok = (
        F.abs(F.col("est") - F.col("exact_distinct").cast("double"))
        <= 0.05 * F.col("exact_distinct").cast("double")
    ).cast("double")
    out_rows = F.array(
        F.struct(F.lit("rows").alias("metric"), F.col("rows").alias("value")),
        F.struct(F.lit("nulls").alias("metric"), F.col("nulls").alias("value")),
        F.struct(
            F.lit("distinct").alias("metric"),
            F.col("exact_distinct").cast("double").alias("value"),
        ),
        F.struct(F.lit("distinct_est_ok").alias("metric"), ok.alias("value")),
        F.struct(F.lit("min").alias("metric"), F.col("min").alias("value")),
        F.struct(F.lit("max").alias("metric"), F.col("max").alias("value")),
    )
    return joined.select(
        "column", F.explode(out_rows).alias("r")
    ).select("column", "r.metric", "r.value")


def scd2_merge(base: DataFrame, updates: DataFrame, key: str, attr: str) -> DataFrame:
    """Type-2 dimension merge of `updates` into `base` on `key` for
    the tracked attribute `attr`: unchanged rows keep version 1
    current; changed rows emit the old version closed (is_current
    false) plus version 2 current; new keys insert at version 1.
    Returns (key, attr, version, is_current).

    One full-outer shuffle join on the dimension key plus a map-side
    CASE expansion — no driver loop, no per-row merge; the changed
    rows' two output versions come from one array-explode, so the
    join output is read once."""
    b = base.select(F.col(key).alias("k"), F.col(attr).alias("old_v"))
    u = updates.select(F.col(key).alias("k"), F.col(attr).alias("new_v"))
    j = b.join(u, "k", "full_outer")
    versions = (
        F.when(
            F.col("old_v").isNull(),  # insert
            F.array(
                F.struct(
                    F.col("new_v").alias("v"),
                    F.lit(1).alias("version"),
                    F.lit(True).alias("is_current"),
                )
            ),
        )
        .when(
            F.col("new_v").isNull() | (F.col("new_v") == F.col("old_v")),
            F.array(  # absent from updates, or unchanged: keep v1
                F.struct(
                    F.col("old_v").alias("v"),
                    F.lit(1).alias("version"),
                    F.lit(True).alias("is_current"),
                )
            ),
        )
        .otherwise(
            F.array(  # changed: close v1, open v2
                F.struct(
                    F.col("old_v").alias("v"),
                    F.lit(1).alias("version"),
                    F.lit(False).alias("is_current"),
                ),
                F.struct(
                    F.col("new_v").alias("v"),
                    F.lit(2).alias("version"),
                    F.lit(True).alias("is_current"),
                ),
            )
        )
    )
    return j.select(F.col("k").alias(key), F.explode(versions).alias("r")).select(
        key,
        F.col("r.v").alias(attr),
        F.col("r.version").alias("version"),
        F.col("r.is_current").alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style diff of two table snapshots: (key, change) with
    change in ('added', 'removed', 'changed') — the primitive that
    turns full-snapshot drops into incremental pipelines (process
    only the delta, not the 100 TB table). Unchanged rows are dropped
    from the output.

    Each side collapses to (key, content-hash of compare_cols) before
    the full-outer join, so the shuffle carries two hashes per key —
    never the row payloads — and the comparison is one string
    equality. The content hash is md5 over per-column tokens, where
    each token is the column's own md5 (32 lowercase hex chars) or
    the literal 'N' for NULL: token boundaries are unambiguous ('N'
    is not a hex digit and hashes are fixed-width), so no value —
    including ones containing separator bytes or a literal NULL
    marker — can collide across column boundaries or with NULL. The
    DuckDB twin uses the identical scheme byte-for-byte."""
    def _hashed(df: DataFrame, alias: str) -> DataFrame:
        parts = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N"))
            for c in compare_cols
        ]
        return df.select(
            F.col(key).alias("key"),
            F.md5(F.concat(*parts)).alias(alias),
        )

    o = _hashed(old, "old_hash")
    n = _hashed(new, "new_hash")
    joined = o.join(n, "key", "full_outer")
    change = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(F.col("key").alias("row_key"), "change")
    )


def dq_drift_psi(
    events, buckets: int = 10, value_col: str = "value"
):
    """Distribution-drift screen between the first and second half of
    the log: per event_type, the Population Stability Index of the
    `value` distribution — the standard 'did this feed change under
    me' monitor a training-data pipeline runs between corpus
    versions (PSI = sum over buckets of (p-q)*ln(p/q); < 0.1 stable,
    0.1-0.25 moderate drift, > 0.25 action). Returns
    (event_type, psi, n_ref, n_cur). The reference window is the
    first half of the log by exact epoch-microsecond midpoint
    ((min+max) div 2, integer); types with no reference rows are
    excluded (PSI needs a reference).

    Exactness: every DECISION is exact integer arithmetic — the
    ref/cur split compares integer microseconds, and bucket
    assignment is `((c - lo) * B) div (hi - lo + 1)` over exact cents
    against the type's FULL-LOG min/max (equal-width over the
    combined range, so both halves bucket without edge-clamping
    distortion — the simple-variant trade vs classical
    reference-quantile buckets, documented as part of the contract),
    so no row can change buckets between engines. Shares use Laplace
    smoothing ((count_i + 1)/(n + B) — zero-count buckets would make
    ln blow up; the smoothing is part of the contract) and the PSI
    terms fold IN BUCKET ORDER, one shared double formula per term,
    so the float result matches bit-for-bit.

    Scale shape: TWO column-pruned passes over (ts, value,
    event_type), both LAZY: (1) one per-type aggregate producing the
    type's cent bounds and time bounds as a RELATION (never a driver
    collect — driver state stays zero even if event_type grows
    high-cardinality, and the plan stays lazy like the rest of the
    module), with the global midpoint derived from that same tiny
    relation by an unpartitioned window (bounded: one row per type,
    the module's provably-bounded-window discipline); (2) the
    (type, side, bucket) count (map-side combinable; at most
    types x 2 x B groups) against the broadcast bounds. Everything
    after runs on that tiny relation. No UDFs. The midpoint and
    bounds reflect the log as of the action that executes the plan
    (lazy semantics, unlike the pre-round-9 call-time freeze)."""
    from pyspark.sql import functions as F

    cents = F.round(F.col(value_col) * 100).cast("long")
    ev = events.select(
        "event_type",
        F.unix_micros("ts").alias("__us"),
        cents.alias("__c"),
    )
    bounds = (
        ev.groupBy("event_type")
        .agg(
            F.min("__c").alias("__lo"),
            F.max("__c").alias("__hi"),
            F.min("__us").alias("__t0"),
            F.max("__us").alias("__t1"),
        )
        # global midpoint over the per-type bounds themselves — an
        # unpartitioned window over an enum-sized relation, so no
        # second scan of events and no driver round-trip
        .withColumn(
            "__mid",
            F.expr(
                "(min(__t0) OVER () + max(__t1) OVER ()) div 2"
            ),
        )
        .select("event_type", "__lo", "__hi", "__mid")
    )
    b = F.lit(int(buckets))
    bucketed = (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            F.when(F.col("__us") < F.col("__mid"), F.lit(0))
            .otherwise(F.lit(1))
            .alias("side"),
            F.least(
                F.greatest(
                    F.expr(
                        f"((__c - __lo) * {int(buckets)}) div "
                        "(__hi - __lo + 1)"
                    ),
                    F.lit(0),
                ),
                b - 1,
            ).alias("bucket"),
        )
        .groupBy("event_type", "side", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return _psi_from_sided_counts(bucketed, buckets)


def _psi_from_sided_counts(bucketed, buckets: int):
    """Shared PSI fold over a (event_type, side, bucket, cnt) counted
    relation: Laplace-smoothed shares, terms added IN BUCKET ORDER
    (one shared double formula per term, so both the equal-width and
    the sketch-edge variants match their oracles bit-for-bit). Types
    with no reference rows drop (PSI needs a reference)."""
    from pyspark.sql import functions as F

    per = bucketed.groupBy("event_type").agg(
        F.sum(F.when(F.col("side") == 0, F.col("cnt"))).alias("n_ref"),
        F.sum(F.when(F.col("side") == 1, F.col("cnt"))).alias("n_cur"),
        F.array_sort(
            F.collect_list(F.struct("bucket", "side", "cnt"))
        ).alias("arr"),
    ).filter(F.col("n_ref").isNotNull())
    n_ref = F.coalesce(F.col("n_ref"), F.lit(0)).cast("double")
    n_cur = F.coalesce(F.col("n_cur"), F.lit(0)).cast("double")

    def share(cnts: "F.Column", n: "F.Column") -> "F.Column":
        return (cnts.cast("double") + F.lit(1.0)) / (
            n + F.lit(float(buckets))
        )

    def bucket_count(i: int, side: int) -> "F.Column":
        # exact lookup in the sorted (bucket, side, cnt) array:
        # at most one element matches (i, side)
        hits = F.filter(
            F.col("arr"),
            lambda e: (e["bucket"] == F.lit(i))
            & (e["side"] == F.lit(side)),
        )
        return F.coalesce(
            F.try_element_at(hits, F.lit(1))["cnt"], F.lit(0).cast("long")
        )

    psi = F.lit(0.0)
    for i in range(int(buckets)):
        p = share(bucket_count(i, 0), n_ref)
        q = share(bucket_count(i, 1), n_cur)
        psi = psi + (p - q) * F.log(p / q)
    return per.select(
        "event_type",
        psi.alias("psi"),
        F.coalesce(F.col("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
    )


def dq_drift_psi_sketch(
    events, buckets: int = 10, k: int = 256, value_col: str = "value"
):
    """PSI drift screen with REFERENCE-QUANTILE bin edges from the
    mergeable rank sketch — the classical PSI construction (bins =
    quantiles of the reference window, so each reference bucket holds
    ~1/B of the mass) in its 100-TB form: the edges come from the
    bottom-k rank sketch of the reference half
    (sketches.rank_sketch_kept — k rows of state per type, shard-
    mergeable), not from an exact per-type sort. Composes the two
    certified primitives: dq_quantiles_sketch's edge extraction +
    dq_drift_psi's smoothed fold. Returns (event_type, psi, n_ref,
    n_cur).

    Exactness: the ref/cur split is the same integer-microsecond
    midpoint; the kept set is the deterministic md5 bottom-k (the
    sketch's h ordering); edge j (j = 1..B-1) is the kept value at
    0-based sorted position ((m-1)*j) div B — all integer decisions —
    and a row's bucket is the COUNT of edges <= its cents value
    (0..B-1, exact integer comparisons; duplicate edges simply leave
    some buckets empty, which the Laplace smoothing already absorbs).
    The fold is the shared _psi_from_sided_counts, so the double
    result matches the DuckDB twin bit-for-bit.

    Scale shape: three-to-four column-pruned passes over (ts, value,
    event_type, event_id) — the per-type time-bounds relation for the
    midpoint (lazy, no driver state), the reference-side sketch pass,
    and the bucket-count pass (the sided projection is re-derived per
    consumer; each re-derivation is a map-side scan+broadcast-join,
    cheaper at scale than materializing the corpus-sized sided
    relation). The sketch is a WindowGroupLimit over the reference
    side (<= k rows per type survive the exchange), edges live in a
    broadcast (type, B-1 values) relation, and bucketing + the
    (type, side, bucket) count are map-side combinable. Unlike the equal-width
    variant's full-log min/max, the edges are quantile-robust: one
    outlier cannot collapse every row into one bucket."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .sketches import kmv_hash_expr

    bb = int(buckets)
    cents = F.round(F.col(value_col) * 100).cast("long")
    ev = events.select(
        "event_type",
        F.unix_micros("ts").alias("__us"),
        cents.alias("__c"),
        kmv_hash_expr(F.col("event_id")).alias("__h"),
    )
    tb = (
        ev.groupBy("event_type")
        .agg(F.min("__us").alias("__t0"), F.max("__us").alias("__t1"))
        .withColumn(
            "__mid",
            F.expr("(min(__t0) OVER () + max(__t1) OVER ()) div 2"),
        )
        .select("event_type", "__mid")
    )
    sided = ev.join(F.broadcast(tb), "event_type").select(
        "event_type",
        "__c",
        "__h",
        F.when(F.col("__us") < F.col("__mid"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("side"),
    )
    # reference-half sketch: deterministic bottom-k by (h, c) per type
    wk = Window.partitionBy("event_type").orderBy("__h", "__c")
    kept = (
        sided.filter((F.col("side") == 0) & F.col("__h").isNotNull())
        .withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= F.lit(int(k)))
        .select("event_type", "__c", "__h")
    )
    # edge j = kept value at 0-based position ((m-1)*j) div B under
    # the (c, h) sample order — the shared 'lower' quantile rule
    wq = Window.partitionBy("event_type").orderBy("__c", "__h")
    wn = Window.partitionBy("event_type")
    ranked = kept.withColumn(
        "__qrn", F.row_number().over(wq).cast("long")
    ).withColumn("__m", F.count("*").over(wn))
    edge_aggs = [
        F.max(
            F.when(
                F.col("__qrn") - 1
                == F.expr(f"((__m - 1) * {j}) div {bb}"),
                F.col("__c"),
            )
        ).alias(f"__e{j}")
        for j in range(1, bb)
    ]
    edges = ranked.groupBy("event_type").agg(*edge_aggs)
    bucket = F.lit(0)
    for j in range(1, bb):
        bucket = bucket + F.when(
            F.col("__c") >= F.col(f"__e{j}"), F.lit(1)
        ).otherwise(F.lit(0))
    bucketed = (
        sided.join(F.broadcast(edges), "event_type")
        .select("event_type", "side", bucket.alias("bucket"))
        .groupBy("event_type", "side", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return _psi_from_sided_counts(bucketed, buckets)


def dq_quantiles(
    events, percentiles: tuple = (50, 95, 99), value_col: str = "value"
):
    """EXACT per-type value quantiles — the profiling numbers a feed
    audit quotes (p50/p95/p99). Returns
    (event_type, n, p50, p95, p99) in value units.

    Contract (shared with the DuckDB twin so the doubles hash-match):
    quantile p is the cents value at 0-based sorted position
    ((n-1) * p) div 100 — an exact-integer rank decision (the
    'lower'/type-1 quantile definition; engines disagree on
    interpolation rules, so the contract pins the non-interpolating
    one), restored to units by one division. Ties in cents cannot
    perturb the result: position selection is over the sorted cents
    themselves.

    Scale shape: ONE type-keyed exchange serves the ordering window
    (row_number) and the per-type count; quantile extraction is a
    conditional max folded into the existing per-type aggregate — no
    second shuffle, no driver collect. Exact quantiles require the
    per-group sort; the approximate path at 100 TB is
    percentile_approx/t-digest (engine-private sketch, certified by
    tolerance only — this operator is the auditable exact twin)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cents = F.round(F.col(value_col) * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy("__c", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = (
        events.select("event_type", "event_id", cents.alias("__c"))
        .withColumn("__rn", F.row_number().over(w).cast("long"))
        .withColumn("__n", F.count("*").over(wn))
    )
    aggs = [F.max("__n").alias("n")]
    for p in percentiles:
        idx = F.expr(f"((__n - 1) * {int(p)}) div 100")
        aggs.append(
            (
                F.max(
                    F.when(F.col("__rn") - 1 == idx, F.col("__c"))
                ).cast("double")
                / F.lit(100.0)
            ).alias(f"p{int(p)}")
        )
    return ranked.groupBy("event_type").agg(*aggs)


def events_retention(events, week_seconds: int = 604800):
    """Cohort retention matrix — the product-analytics table behind
    every retention curve: users grouped by FIRST-activity week
    (cohort), counted in each subsequent week they return. Returns
    (cohort_week, weeks_since, n_users, retention) where cohort_week
    is the epoch-week index, weeks_since >= 0, and retention =
    n_users / cohort size (the weeks_since = 0 row is the cohort
    size, so its retention is exactly 1.0).

    Exactness: week assignment is pure integer arithmetic
    (epoch-µs div 1e6 div 604800); cohort membership and the matrix
    are integer counts; retention is one shared division per row.

    Scale shape: the (user, week) distinct is the one user-keyed
    exchange; cohort assignment is a min-window over that SAME
    partitioning (no aggregate + join-back — the audit showed that
    shape re-scanning events); then a cohort-sized aggregate and a
    broadcast of the #cohorts-row size relation. No driver state, no
    unpartitioned windows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    wk = F.expr(f"unix_micros(ts) div 1000000 div {int(week_seconds)}")
    uw = events.select(
        "user_id", wk.cast("long").alias("week")
    ).distinct()
    # cohort assignment as a window over the SAME user partitioning
    # the distinct already established — no aggregate + join-back
    # (the plan-audit finding: that shape re-scanned events)
    w = Window.partitionBy("user_id")
    cell = (
        uw.withColumn("cohort_week", F.min("week").over(w))
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        # uw is distinct on (user, week) and weeks_since is a
        # bijection of week per user, so each user appears at most
        # once per cell: a plain map-side-combinable count suffices
        # (no two-phase distinct aggregate on the hot exchange)
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    size = (
        cell.filter(F.col("weeks_since") == 0)
        .select("cohort_week", F.col("n_users").alias("cohort_size"))
    )
    return (
        cell.join(F.broadcast(size), "cohort_week")
        .select(
            "cohort_week",
            "weeks_since",
            "n_users",
            (
                F.col("n_users").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )


def _event_value_cents(events, value_col: str = "value"):
    from pyspark.sql import functions as F

    return events.select(
        "event_type",
        "event_id",
        F.round(F.col(value_col) * 100).cast("long").alias("__v"),
    )


def dq_quantiles_sketch(
    events,
    k: int = 256,
    percentiles: tuple = (50, 95, 99),
    value_col: str = "value",
):
    """Approximate per-type p50/p95/p99 from a MERGEABLE rank sketch
    (operators/sketches.py rank_sketch_*) — the 100-TB complement to
    dq_quantiles' exact per-type sort: the sketch state is k rows per
    group regardless of group size, shards combine losslessly
    (rank_sketch_merge), and — unlike t-digest/percentile_approx,
    whose internals are engine-private — every step has a
    bit-identical DuckDB twin, so the oracle certifies the ESTIMATE.
    Returns (event_type, n_sampled, p50, p95, p99) in value units;
    quantile-of-sample rank error ~ n/sqrt(k)."""
    from pyspark.sql import functions as F

    from .sketches import rank_sketch_kept, rank_sketch_quantiles

    kept = rank_sketch_kept(
        _event_value_cents(events, value_col),
        "event_id",
        "__v",
        ["event_type"],
        k=k,
    )
    q = rank_sketch_quantiles(kept, ["event_type"], percentiles)
    return q.select(
        "event_type",
        "n_sampled",
        *[
            (F.col(f"q{int(p)}").cast("double") / F.lit(100.0)).alias(
                f"p{int(p)}"
            )
            for p in percentiles
        ],
    )


def dq_quantiles_sketch_merge(
    events,
    k: int = 256,
    shards: int = 4,
    percentiles: tuple = (50, 95, 99),
    value_col: str = "value",
):
    """The merge law executed as a plan: shard the log by event_id
    mod `shards` (standing in for 1000 executors' independent
    passes), build per-(type, shard) sketch states, merge states per
    type (bottom-k over the union), and extract quantiles from the
    MERGED state. Equals dq_quantiles_sketch on the unsharded log
    bit-for-bit — the property that makes the sketch safe at 100 TB —
    asserted in tests and certified cross-engine by the oracle
    twin."""
    from pyspark.sql import functions as F

    from .sketches import (
        rank_sketch_kept,
        rank_sketch_merge,
        rank_sketch_quantiles,
    )

    base = _event_value_cents(events, value_col).withColumn(
        "__shard", (F.col("event_id") % F.lit(int(shards))).cast("long")
    )
    kept = rank_sketch_kept(
        base, "event_id", "__v", ["event_type", "__shard"], k=k
    )
    merged = rank_sketch_merge(kept, ["event_type"], k=k)
    q = rank_sketch_quantiles(merged, ["event_type"], percentiles)
    return q.select(
        "event_type",
        "n_sampled",
        *[
            (F.col(f"q{int(p)}").cast("double") / F.lit(100.0)).alias(
                f"p{int(p)}"
            )
            for p in percentiles
        ],
    )


# Scaled-integer MAD flag constant: 3 * 1.4826 (the normal-consistency
# factor) = 4.4478, carried as 44478 against deviations x 10000 so the
# flag decision is exact integer arithmetic in both engines.
MAD_K_SCALED = 44478
MAD_SCALE = 10000


def dq_anomaly_mad(events, value_col: str = "value"):
    """Robust per-type anomaly screen: flag events whose value sits
    more than 3 robust standard deviations from the per-type MEDIAN,
    with sigma estimated as 1.4826 x MAD (median absolute deviation)
    — the screen that still works when the mean/stddev themselves are
    dragged by the outliers being hunted (complements
    ts_anomaly_zscore exactly the way dq_drift_psi_sketch complements
    the equal-width PSI: quantile-robust where moments collapse).
    Returns flagged rows (event_type, event_id, value, median_value,
    mad_value).

    Exactness: values are exact cents; the median and the MAD use the
    shared 'lower' quantile rule (value at 0-based sorted position
    ((n-1)*50) div 100, ties resolved by the value-only sort since
    equal values are interchangeable); the flag decision is the
    integer cross-multiplication MAD_SCALE * |c - med| >
    MAD_K_SCALED * mad — no float ever decides membership, so both
    engines flag identical borderline events. A zero-MAD type
    (constant majority) flags every deviating row — the intended
    robust behavior.

    Scale shape: two type-keyed window passes (median of values, then
    median of deviations — the deviation relation reuses the first
    pass's broadcast medians), then a row-local flag filter. All
    windows are partitioned by event_type; per-type row counts are
    the stream's natural partition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = events.select(
        "event_type",
        "event_id",
        F.col(value_col).alias("__v"),
        F.round(F.col(value_col) * 100).cast("long").alias("__c"),
    )

    def lower_median(df, col, out):
        w = Window.partitionBy("event_type").orderBy(col)
        wn = Window.partitionBy("event_type")
        r = df.withColumn("__rn", F.row_number().over(w).cast("long"))
        r = r.withColumn("__n", F.count("*").over(wn))
        return (
            r.filter(
                F.col("__rn") - 1
                == F.expr("((__n - 1) * 50) div 100")
            )
            .groupBy("event_type")
            .agg(F.max(col).cast("long").alias(out))
        )

    med = lower_median(ev, "__c", "med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "__d", F.abs(F.col("__c") - F.col("med"))
    )
    mad = lower_median(dev, "__d", "mad")
    flagged = dev.join(F.broadcast(mad), "event_type").filter(
        F.col("__d") * F.lit(MAD_SCALE)
        > F.col("mad") * F.lit(MAD_K_SCALED)
    )
    return flagged.select(
        "event_type",
        "event_id",
        F.col("__v").alias("value"),
        (F.col("med").cast("double") / F.lit(100.0)).alias(
            "median_value"
        ),
        (F.col("mad").cast("double") / F.lit(100.0)).alias("mad_value"),
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str = "k",
    val: str = "v",
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Type-1 CDC MERGE apply — the change-stream counterpart of
    scd2_merge (which keeps history; this keeps only current state):
    given the last snapshot `base(key, val)` and a change stream
    `changes(key, val, op, seq)` with op in ('I', 'U', 'D') and a
    per-key monotone sequence number, produce the next snapshot.
    The LATEST change per key (max seq) wins — earlier changes to the
    same key are superseded, exactly Debezium/binlog compaction
    semantics; 'D' removes the key, 'I'/'U' upsert the carried value
    (a NULL-valued upsert writes NULL — the carried value is
    authoritative, never silently preserving the prior value),
    untouched base keys pass through. Returns (key, val).

    Scale shape: the change stream collapses to one row per key via a
    single max_by aggregate (map-side combinable — at 100 TB the
    stream is far larger than its key space, so partial aggregation
    does the heavy lifting BEFORE the exchange), then ONE full-outer
    shuffle join with the snapshot on the key. No windows, no driver
    state; a Delta/Iceberg MERGE INTO would replace only the final
    write, not this plan."""
    latest = changes.groupBy(F.col(key).alias("__k")).agg(
        F.max_by(
            F.struct(F.col(val).alias("v"), F.col(op_col).alias("op")),
            F.col(seq_col),
        ).alias("__c")
    )
    b = base.select(F.col(key).alias("__k"), F.col(val).alias("__bv"))
    j = b.join(latest, "__k", "full_outer")
    return (
        j.filter(
            F.col("__c").isNull() | (F.col("__c.op") != F.lit("D"))
        )
        .select(
            F.col("__k").alias(key),
            F.when(F.col("__c").isNotNull(), F.col("__c.v"))
            .otherwise(F.col("__bv"))
            .alias(val),
        )
    )


def events_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    lookback_us: int = 7 * 86400 * 1_000_000,
) -> DataFrame:
    """Last-touch attribution — for every conversion event, the most
    recent PRECEDING non-conversion event by the same user within the
    lookback window gets the credit (the standard marketing/product
    attribution primitive; funnel and retention live beside it in
    this module). Returns one row per conversion:
    (conv_id, user_id, conv_ts_us, conv_value, touch_id, touch_type)
    with NULL touch columns when no touch qualifies.

    Order is the total (ts, event_id) tuple order, so same-timestamp
    rows resolve deterministically; a conversion never credits
    another conversion (conversion rows carry NULL in the carried
    struct, and last(ignorenulls) skips them).

    Scale shape: ONE exchange on user_id; the candidate touch rides a
    running last(ignorenulls) window over that partitioning — no
    self-join of the event stream against itself (the join form
    shuffles conversions x touches; this shuffles each event once).
    The lookback test is a residual predicate on the carried
    timestamp: if the MOST RECENT touch is too old, every older one
    is too, so the window form loses nothing."""
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    touch = F.when(
        F.col("event_type") != F.lit(convert_type),
        F.struct(
            F.col("ts_us").alias("t_ts"),
            F.col("event_id").alias("t_id"),
            F.col("event_type").alias("t_type"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.withColumn(
        "__t", F.last(touch, ignorenulls=True).over(w)
    )
    conv = carried.filter(F.col("event_type") == F.lit(convert_type))
    in_window = F.col("__t").isNotNull() & (
        F.col("__t.t_ts") >= F.col("ts_us") - F.lit(int(lookback_us))
    )
    return conv.select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts_us").alias("conv_ts_us"),
        F.col("value").alias("conv_value"),
        F.when(in_window, F.col("__t.t_id")).alias("touch_id"),
        F.when(in_window, F.col("__t.t_type")).alias("touch_type"),
    )


def events_markov_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition estimates over per-user event
    sequences — the behavioral model next to funnel/retention/
    attribution: for each ordered pair of event types, how often does
    `from_type` lead directly to `to_type` within a user's timeline,
    and what share of `from_type`'s departures is that? Returns
    (from_type, to_type, n, prob) with prob = n / Σ_to n — each
    user's LAST event has no successor and contributes no row.

    Order is the total (ts, event_id) tuple, so same-timestamp rows
    resolve deterministically; prob is one division of two exact
    counts (no float accumulation).

    Scale shape: ONE exchange on user_id for the lead window, then a
    type-pair aggregate (type-cardinality², tiny) and a broadcast-
    sized per-from_type total attached via a window over the SAME
    grouped relation — no second scan of events, no join back."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    cnt = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    # per-from totals over the already-aggregated relation: bounded
    # by the type-pair cardinality, so the unpartitioned concern
    # doesn't arise (window partitions by from_type anyway)
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / tot.cast("double")).alias("prob"),
    )


def dq_checks(
    df: DataFrame,
    not_null: list[str] = (),
    unique: list[str] = (),
    non_negative: list[str] = (),
    ref: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """Expectation-suite evaluation — the acceptance gate a drop runs
    AFTER dq_profile has described it: each declared rule yields one
    row (rule, n_checked, n_failed, passed) where passed = n_failed
    == 0. Rules: not-null per column, uniqueness per column,
    non-negativity per numeric column, and referential integrity
    (`ref` = (fk_col, dim_df, pk_col): every foreign key must exist
    in the dimension).

    Scale shape: all not-null/non-negative rules fold into ONE
    map-side-combinable aggregation pass over the input (a conditional
    sum per rule — never a pass per rule). Each uniqueness rule is
    one column-pruned aggregate (count - count_distinct); the
    referential rule is one left-anti join against the dimension
    counted. The rule report is rows-per-rule tiny, assembled with a
    unioned explode — the input is scanned once plus once per
    unique/ref rule, each scan pruned to a single column."""
    reports = []
    scans = []
    for c in not_null:
        scans.append(
            F.struct(
                F.lit(f"not_null:{c}").alias("rule"),
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_failed"),
            )
        )
    for c in non_negative:
        scans.append(
            F.struct(
                F.lit(f"non_negative:{c}").alias("rule"),
                F.count(F.lit(1)).alias("n_checked"),
                F.sum((F.col(c) < 0).cast("long")).alias("n_failed"),
            )
        )
    if scans:
        wide = df.agg(F.array(*scans).alias("__rules"))
        reports.append(
            wide.select(F.explode("__rules").alias("r")).select("r.*")
        )
    for c in unique:
        reports.append(
            df.agg(
                F.lit(f"unique:{c}").alias("rule"),
                F.count(F.col(c)).alias("n_checked"),
                (F.count(F.col(c)) - F.count_distinct(F.col(c))).alias(
                    "n_failed"
                ),
            )
        )
    if ref is not None:
        fk, dim, pk = ref
        orphans = df.select(F.col(fk).alias("__fk")).join(
            dim.select(F.col(pk).alias("__fk")).distinct(),
            "__fk",
            "left_anti",
        )
        reports.append(
            df.agg(F.count(F.col(fk)).alias("n_checked"))
            .crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_failed"))
            )
            .select(
                F.lit(f"ref:{fk}").alias("rule"),
                "n_checked",
                "n_failed",
            )
        )
    if not reports:
        raise ValueError("dq_checks: no rules declared")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_failed").cast("long").alias("n_failed"),
        (F.col("n_failed") == 0).alias("passed"),
    )


# Poisson(1) CDF boundaries scaled to the 32-bit hash space
# (floor(2^32 * P(X <= k)) for k = 0..5; weights above 5 clamp to 6).
# Integer comparisons on a shared md5-slice hash make the bootstrap
# weights bit-identical across engines.
BOOTSTRAP_CDF_FP = [
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
]
BOOTSTRAP_B = 50


def bootstrap_ci(
    docs: DataFrame,
    value_col: str = "n_chars",
    b: int = BOOTSTRAP_B,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the corpus mean of
    `value_col` — the statistician's answer to "is this week's crawl
    really shorter, or is that noise?". Classic bootstrap resampling
    needs a global index (unshardable); the POISSON bootstrap
    (Chamandy et al., public) replaces it: each row enters replica r
    with weight ~ Poisson(1), drawn here DETERMINISTICALLY by
    inverse-CDF over a shared md5-slice hash of (doc_id, r), so both
    engines produce identical replicas. Returns one row:
    (n_replicas, ci_lo, ci_median, ci_hi) — the lo/median/hi order
    statistics of the B replica means.

    Exactness: each replica mean is ONE division of two exact integer
    sums (Σ w·v / Σ w), so the B doubles are bit-identical and their
    order statistics unambiguous (ties broken by replica id).

    Scale shape: the explode is B× on a TWO-COLUMN projection (id,
    value) — column-pruned before fan-out, so 100 TB of documents
    bootstraps over ~B·N·16 bytes, not B× the corpus; one map-side-
    combinable aggregate per replica, then a B-row final pass. No
    global sample index, no driver state."""
    reps = docs.select(
        "doc_id", F.col(value_col).alias("__v")
    ).select(
        "doc_id",
        "__v",
        F.explode(F.sequence(F.lit(0), F.lit(int(b) - 1))).alias("rep"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("rep").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(6)
    for k in range(len(BOOTSTRAP_CDF_FP) - 1, -1, -1):
        w = F.when(h < F.lit(BOOTSTRAP_CDF_FP[k]), F.lit(k)).otherwise(w)
    means = (
        reps.withColumn("__w", w)
        .groupBy("rep")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).cast("long").alias("sv"),
            F.sum("__w").cast("long").alias("sw"),
        )
        .select(
            "rep",
            (
                F.col("sv").cast("double")
                / F.nullif(F.col("sw"), F.lit(0)).cast("double")
            ).alias("mean_r"),
        )
    )
    # drop all-zero-weight replicas (mean_r NULL) BEFORE ranking:
    # Spark sorts NULLs first, DuckDB's ORDER BY defaults to NULLS
    # LAST, so a surviving NULL would shift the order-statistic
    # ranks differently per engine (P ≈ e^-N per replica — but the
    # tie discipline is explicit everywhere else, so close it here)
    rn = F.row_number().over(
        Window.orderBy("mean_r", "rep")  # B rows — bounded window
    )
    ranked = means.filter(F.col("mean_r").isNotNull()).withColumn(
        "__rn", rn
    )
    idx_lo = max(1, int(-(-lo * b // 1)))
    idx_med = max(1, int(-(-0.5 * b // 1)))
    idx_hi = max(1, int(-(-hi * b // 1)))
    return ranked.agg(
        F.count("*").cast("long").alias("n_replicas"),
        F.max(F.when(F.col("__rn") == idx_lo, F.col("mean_r"))).alias(
            "ci_lo"
        ),
        F.max(
            F.when(F.col("__rn") == idx_med, F.col("mean_r"))
        ).alias("ci_median"),
        F.max(F.when(F.col("__rn") == idx_hi, F.col("mean_r"))).alias(
            "ci_hi"
        ),
    )


def cumulative_reach(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Cumulative distinct-user reach per event type by day — the
    growth-analytics staple ("how many unique users has feature X
    ever touched, day over day?"). Returns one row per (event_type,
    day_us) with daily event count, daily NEW users, and the running
    cumulative distinct-user total:
    (event_type, day_us, n_events, new_users, cum_users).

    The naive form — per-day `count(DISTINCT user)` over a growing
    prefix, or a collect_set window — re-aggregates the entire
    history for every day and holds per-key state proportional to
    the user base. This plan is FIRST-TOUCH decomposition instead:
    a user contributes to distinct reach exactly once, on their
    first event of that type (row_number == 1 over (ts, event_id) —
    a total order, so ties cannot flip the attribution day), so
    cumulative reach is a running SUM of daily first-touch counts.

    Scale shape: one (type, user) exchange for the first-touch
    window, one (type, day) map-side-combinable aggregate, then a
    running-sum window over (type, day) — at 100 TB the last window
    is catalog-sized (days × types), never data-sized. Day is
    epoch-microseconds div 86400e6 (integer; epoch days) — identical
    arithmetic on both engines."""
    day = F.expr(
        f"unix_micros({ts_col}) div CAST(86400000000 AS BIGINT)"
    ).cast("long")
    w_first = Window.partitionBy(type_col, user_col).orderBy(
        ts_col, id_col
    )
    tagged = events.select(
        F.col(type_col).alias("event_type"),
        day.alias("day_us"),
        (F.row_number().over(w_first) == 1).cast("long").alias(
            "__first"
        ),
    )
    daily = tagged.groupBy("event_type", "day_us").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("__first").cast("long").alias("new_users"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day_us",
        "n_events",
        "new_users",
        F.sum("new_users").over(w_cum).cast("long").alias("cum_users"),
    )


def referential_integrity(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit — the DQ expectation dq_checks
    cannot express because it needs TWO relations: for each
    (name, child_df, fk_col, parent_df, pk_col) relationship, count
    child rows and child rows whose FK has no matching parent key
    (NULL FKs count as orphans — a dangling reference either way).
    Returns one row per relationship:
    (relationship, n_child, n_orphans, orphan_rate).

    Scale shape: each relationship is one left-anti join on the key
    (broadcast when the parent's key projection is small — the
    planner's call via AQE) feeding a 1-row aggregate, then a union
    of the per-relationship scalars — relationship count is
    catalog-sized, so the union is trivially bounded. orphan_rate is
    one double division of two exact longs, identical left-to-right
    on both engines."""
    outs = []
    for name, child, fk, parent, pk in pairs:
        c = child.select(F.col(fk).alias("__fk"))
        p = parent.select(F.col(pk).alias("__fk")).distinct()
        n_child = c.agg(
            F.count("*").cast("long").alias("n_child")
        )
        n_orph = (
            c.join(p, "__fk", "left_anti")
            .agg(F.count("*").cast("long").alias("n_orphans"))
        )
        outs.append(
            n_child.crossJoin(n_orph).select(
                F.lit(name).alias("relationship"),
                "n_child",
                "n_orphans",
                (
                    F.col("n_orphans").cast("double")
                    / F.col("n_child").cast("double")
                ).alias("orphan_rate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def quantile_bucketize(
    df: DataFrame,
    value_col: str,
    b: int = 8,
) -> DataFrame:
    """EXACT equi-depth binning of an integer-valued column into `b`
    buckets — the feature-engineering / histogram-equalization
    primitive (ntile without the data-sized global sort): a row with
    value v lands in bucket least(b-1, (rows_below_v * b) div N).
    Equal values always share a bucket (unlike ntile, which splits
    ties arbitrarily across partitions — this is the deterministic
    contract that lets two engines agree). Returns per bucket:
    (bucket, n_rows, lo, hi).

    Scale shape: the data-sized relation collapses FIRST to the
    (value, count) histogram — one map-side-combinable aggregate; the
    cumulative ranks then ride a single-partition window over the
    DISTINCT-VALUE relation, which is value-domain-sized (for
    cents-quantized money, bounded by the price range — the
    compaction_plan catalog-window posture, never data-sized), and N
    attaches as a 1-row broadcast. Bucket stats come straight off
    the histogram — the raw rows are never touched again. All
    integer arithmetic; engines cannot drift."""
    hist = df.select(F.col(value_col).alias("v")).groupBy("v").agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "v",
        "c",
        (F.sum("c").over(w) - F.col("c")).cast("long").alias("below"),
    )
    n = df.agg(F.count("*").cast("long").alias("n"))
    binned = cum.crossJoin(F.broadcast(n)).select(
        "v",
        "c",
        F.least(
            F.lit(int(b) - 1).cast("long"),
            F.expr(f"(below * {int(b)}) div n"),
        ).cast("long").alias("bucket"),
    )
    return binned.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.min("v").cast("long").alias("lo"),
        F.max("v").cast("long").alias("hi"),
    )


def quantile_bucketize_scalable(
    df: DataFrame,
    value_col: str,
    b: int = 8,
    coarse_width: int = 1 << 16,
) -> DataFrame:
    """quantile_bucketize for HIGH-CARDINALITY value domains: the
    identical exact equi-depth contract (bucket of v = least(b-1,
    (rows_below_v * b) div N); equal values share a bucket), but the
    cumulative rank never rides a single-partition window over the
    whole value domain. Two-level cumsum instead:

      1. histogram (value, count) — the same map-side-combinable
         collapse;
      2. coarse key pk = v div coarse_width; the LOCAL cumsum runs
         in a window PARTITIONED by pk (each partition holds at most
         coarse_width distinct values);
      3. per-pk totals form a relation of ceil(domain/coarse_width)
         rows; THEIR cumsum is the only unpartitioned window, over
         that provably tiny relation (row per 65k-value range — the
         catalog-window posture), and broadcast-joins back as the
         partition offset.

    rows_below(v) = offset(pk) + local_below(v). Output and oracle
    are identical to quantile_bucketize — this is the 100 TB
    operating point of the same operator; all integer arithmetic.
    The coarse key is FLOOR division (v - pmod(v, w)) div w, not
    Spark's truncating `div`, so negative values keep a
    monotonically ordered pk (with trunc, -1 and +1 would share
    pk 0 and the range offsets would interleave wrongly)."""
    cw = int(coarse_width)
    hist = df.select(F.col(value_col).alias("v")).groupBy("v").agg(
        F.count("*").cast("long").alias("c")
    ).withColumn(
        "pk",
        F.expr(
            f"(v - pmod(v, CAST({cw} AS BIGINT))) "
            f"div CAST({cw} AS BIGINT)"
        ),
    )
    w_local = Window.partitionBy("pk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = hist.withColumn(
        "local_below",
        (F.sum("c").over(w_local) - F.col("c")).cast("long"),
    )
    ptot = hist.groupBy("pk").agg(F.sum("c").cast("long").alias("pc"))
    # Unpartitioned window is BOUNDED: one row per coarse range
    # (<= domain / coarse_width rows), never value- or data-sized.
    w_pk = Window.orderBy("pk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    poff = ptot.select(
        "pk",
        (F.sum("pc").over(w_pk) - F.col("pc")).cast("long").alias(
            "offset"
        ),
    )
    n = df.agg(F.count("*").cast("long").alias("n"))
    binned = (
        local.join(F.broadcast(poff), "pk")
        .crossJoin(F.broadcast(n))
        .select(
            "v",
            "c",
            F.least(
                F.lit(int(b) - 1).cast("long"),
                F.expr(f"((offset + local_below) * {int(b)}) div n"),
            ).cast("long").alias("bucket"),
        )
    )
    return binned.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.min("v").cast("long").alias("lo"),
        F.max("v").cast("long").alias("hi"),
    )


def dq_freshness(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-stream freshness audit — the "which feeds have gone
    quiet?" monitoring table every warehouse keeps: for each event
    type, its row count, last-seen day, and staleness in days
    against the CORPUS max day (deterministic — the reference point
    is data-derived, never the wall clock, so re-runs and oracle
    twins agree). Returns (event_type, n_events, last_day,
    staleness_days).

    Scale shape: one map-side-combinable (type) aggregate (max day +
    count), then the corpus max attaches as a 1-row broadcast — the
    J3 scalar-attach pattern. Day is epoch-microseconds div 86400e6,
    identical integer arithmetic on both engines."""
    day = F.expr(
        f"unix_micros({ts_col}) div CAST(86400000000 AS BIGINT)"
    ).cast("long")
    per = events.select(
        F.col(type_col).alias("event_type"), day.alias("__d")
    ).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("__d").cast("long").alias("last_day"),
    )
    mx = per.agg(F.max("last_day").cast("long").alias("__mx"))
    return per.crossJoin(F.broadcast(mx)).select(
        "event_type",
        "n_events",
        "last_day",
        (F.col("__mx") - F.col("last_day")).cast("long").alias(
            "staleness_days"
        ),
    )


def ks_two_sample(
    df: DataFrame, value_col: str, side_col: str
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    side_col == 0 (reference) and side_col == 1 (current) slices of a
    numeric column — the distribution-drift gate PSI (dq_drift_psi)
    approximates with fixed buckets; KS is the bucket-free exact
    counterpart. Returns ONE row: (n_ref, n_cur, ks_num, ks_stat)
    where ks_stat = sup_v |F_ref(v) - F_cur(v)| and ks_num is the
    INTEGER numerator max|C_ref(v)*n_cur - C_cur(v)*n_ref| — the
    decision integer engines cannot disagree on; the double ks_stat
    is one final division.

    Scale shape: per-value counts (one map-side-combined hash agg over
    the DISTINCT-value relation), then the two cumulative count
    series via the TWO-LEVEL cumsum (quantile_bucketize_scalable's
    machinery): the only unpartitioned window runs over the
    floor(value) COARSE-BUCKET relation (bounded by the value domain,
    not the row count); per-value cumsums are partitioned by coarse
    bucket. No data-sized single-partition window. Overflow budget:
    C*n products need n_ref, n_cur < ~3e9 each to stay in int64 —
    beyond that, run the screen on the deterministic rank-sketch
    sample (sketches.rank_sketch_kept), as with the CCNet perplexity
    tiers."""
    side = F.col(side_col).cast("long")
    per_v = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(F.lit(1) - side).cast("long").alias("a"),
            F.sum(side).cast("long").alias("b"),
        )
    )
    coarse = F.floor(F.col("v")).cast("long")
    pv = per_v.select(coarse.alias("cb"), "v", "a", "b")
    bucket = pv.groupBy("cb").agg(
        F.sum("a").cast("long").alias("ba"),
        F.sum("b").cast("long").alias("bb"),
    )
    # unpartitioned window over the COARSE relation only (one row per
    # distinct floor(value) — domain-bounded, disclosed above)
    wb = Window.orderBy("cb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bpre = bucket.select(
        "cb",
        (F.sum("ba").over(wb) - F.col("ba")).cast("long").alias("pa"),
        (F.sum("bb").over(wb) - F.col("bb")).cast("long").alias("pb"),
    )
    wi = (
        Window.partitionBy("cb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # bpre is coarse-bucket-sized (domain-bounded) — broadcast it so
    # the only data-sized exchange on this path is pv's hash(cb) for
    # the in-bucket window, not a shuffle join pair
    cum = (
        pv.join(F.broadcast(bpre), "cb")
        .select(
            "cb",
            "v",
            "a",
            "b",
            (F.col("pa") + F.sum("a").over(wi)).cast("long").alias("ca"),
            (F.col("pb") + F.sum("b").over(wi)).cast("long").alias("cbm"),
        )
    )
    # totals from the already-aggregated coarse relation (tiny), not a
    # second aggregate over the distinct-value relation
    tot = bucket.agg(
        F.sum("ba").cast("long").alias("n_ref"),
        F.sum("bb").cast("long").alias("n_cur"),
    )
    mx = (
        cum.join(F.broadcast(tot))
        .select(
            F.abs(
                F.col("ca") * F.col("n_cur")
                - F.col("cbm") * F.col("n_ref")
            ).alias("d")
        )
        .agg(F.max("d").cast("long").alias("ks_num"))
    )
    return mx.join(F.broadcast(tot)).select(
        "n_ref",
        "n_cur",
        "ks_num",
        (
            F.col("ks_num").cast("double")
            / (F.col("n_ref").cast("double") * F.col("n_cur").cast("double"))
        ).alias("ks_stat"),
    )


def dq_benford(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Benford first-digit profile of a positive numeric column — the
    classic fabricated-data / unit-mixing screen: natural multi-scale
    quantities put digit d first with probability log10(1 + 1/d);
    uniform or hand-entered data flattens the curve. Returns 9 rows
    (digit, n, observed_p, expected_p).

    Cross-engine exactness: the first digit comes from the CENTS
    integer (round(value·100), the warehouse fixed-point convention)
    rendered as a string — integer-to-string is identical on both
    engines, where floor(v / 10^floor(log10 v)) flips at exact powers
    of ten (log10(100) can evaluate just under 2). observed_p is one
    division of exact counts; expected_p is ln(1+1/d)/ln(10) in the
    same fixed order both sides.

    Scale shape: row-local digit extraction + one 9-group map-side
    hash aggregate; the total attaches as a 1-row broadcast."""
    cents = F.round(F.col(value_col) * F.lit(100.0)).cast("long")
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(cents.alias("__c"))
        .filter(F.col("__c") > 0)
    )
    agg = base.select(
        F.substring(F.col("__c").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    tot = agg.agg(F.sum("n").cast("long").alias("__nt"))
    return agg.join(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("__nt").cast("double")).alias(
            "observed_p"
        ),
        (
            F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
            / F.log(F.lit(10.0))
        ).alias("expected_p"),
    )
