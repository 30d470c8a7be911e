"""Relational-surface registry (SURVEY.md §7 Phase 3): joins (inner/
semi/anti/broadcast/multiway), hash aggs, rollup, distinct aggs,
windows (rank/lag/frames), set ops, date/string scalars, global top-k
over the TPC-H-ish driver tables — each with a DuckDB oracle.

Cross-engine determinism for money sums: doubles are summed as exact
integer cents (CAST(round(x*100) AS BIGINT)) so partial-aggregation
order cannot perturb the result; one final division restores units.
At 100 TB this is also the right engine-side posture — decimal/integer
aggregation states, no float drift across 10^6 partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import scan_parquet


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return scan_parquet(spark, sf_dir, name)


def _cents(col: str | F.Column, scale: int = 100) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


# --- aggregations ----------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 flavour: one wide hash agg with map-side partials."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01")
    )
    disc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(_cents("l_extendedprice")) / F.lit(100.0)).alias("sum_base"),
            (F.sum(disc) / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
  sum(l_quantity) / count(*) AS avg_qty,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 flavour: 3-way join, agg, global top-10 (TakeOrdered)."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01")
    )
    disc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(disc) / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 flavour: 6-way join with broadcast dims, revenue per
    nation (customer and supplier co-national, classic Q5 predicate)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(disc) / F.lit(10000.0)).alias("revenue"))
    )


SQL_Q5 = """
SELECT n_name,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over (returnflag, linestatus) — subtotals + grand total
    in one pass (the A3+A4 fusion pattern, SURVEY.md §2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


SQL_ROLLUP = """
SELECT coalesce(l_returnflag, '<all>') AS returnflag,
       coalesce(l_linestatus, '<all>') AS linestatus,
       CAST(count(*) AS BIGINT) AS n,
       sum(l_quantity) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n"),
    )


SQL_DISTINCT_AGG = """
SELECT l_returnflag,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
"""


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


SQL_HAVING = """
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_custkey HAVING count(*) >= 15
"""


def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


SQL_CASE_WHEN = """
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY 1
"""


# --- joins -----------------------------------------------------------------

def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: orders having any high-quantity lineitem."""
    orders = _t(spark, sf_dir, "orders")
    big = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


SQL_JOIN_SEMI = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no URGENT order. Every customer in
    the synthetic data has orders, so the unrestricted 'customers
    with no orders' anti-join certifies on 0 rows (empty == empty —
    the q22 trap); restricting the right side to '1-URGENT' orders
    makes the gate exercise real anti-join survivors (18 rows at
    sf0.001, 203 at sf0.01) while keeping the left-anti physical
    shape."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer: every customer with order count (0 for none)."""
    cust = _t(spark, sf_dir, "customer")
    cnt = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        cust.join(cnt, cust.c_custkey == cnt.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("cnt", F.lit(0)).cast("long").alias("n_orders"),
        )
    )


SQL_JOIN_OUTER = """
SELECT c_custkey,
       CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) o
  ON c_custkey = o_custkey
"""


def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim broadcast join: lineitem enriched with part brand."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


SQL_JOIN_BROADCAST = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n, sum(l_quantity) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-chain join supplier → nation → region (all broadcast)."""
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


SQL_MULTIWAY = """
SELECT s_suppkey, s_name, n_name, r_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


# --- windows ---------------------------------------------------------------

def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — T1's pattern on relational data."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


SQL_WINDOW_RANK = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    CAST(row_number() OVER (PARTITION BY o_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
  FROM orders) t
WHERE rnk <= 3
"""


def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event delta (lag), exact in integer cents."""
    ev = _t(spark, sf_dir, "events").withColumn("cents", _cents("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("cents") - F.lag("cents").over(w)).alias("delta_cents"),
    )


SQL_WINDOW_LAG = """
SELECT event_id, user_id,
  cents - lag(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_cents
FROM (SELECT event_id, user_id, ts,
        CAST(round(value * 100) AS BIGINT) AS cents FROM events) t
"""


def window_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-row frame sum per user (rows between 2 preceding)."""
    ev = _t(spark, sf_dir, "events").withColumn("cents", _cents("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum("cents").over(w).alias("moving_cents"),
    )


SQL_WINDOW_MOVING = """
SELECT event_id, user_id,
  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       AS BIGINT) AS moving_cents
FROM (SELECT event_id, user_id, ts,
        CAST(round(value * 100) AS BIGINT) AS cents FROM events) t
"""


# --- set ops ---------------------------------------------------------------

def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 4000).select("c_custkey")
    return a.union(b).distinct()


SQL_SET_UNION = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 4000
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)


SQL_SET_INTERSECT = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    a = cust.select("c_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.exceptAll(b).distinct()


SQL_SET_EXCEPT = """
SELECT DISTINCT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
"""


# --- scalars / top-k -------------------------------------------------------

def date_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.count("*").alias("n"))
    )


SQL_DATE_SCALARS = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY 1, 2, 3
"""


def string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%red%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


SQL_STRING_SCALARS = """
SELECT p_partkey, upper(p_brand) AS brand_uc,
       substring(p_name, 1, 4) AS name4,
       CAST(length(p_name) AS INTEGER) AS name_len,
       concat(p_brand, '|', p_type) AS brand_type
FROM part WHERE p_name LIKE '%red%'
"""


def top_n_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Catalyst plans TakeOrderedAndProject (heap per
    partition + driver merge), never a full sort (SURVEY.md §4)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_TOP_N = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: lineitem quantity summed per returnflag, pivoted on
    linestatus (explicit value list so the plan is a single pass —
    unlisted pivots need an extra distinct scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(_cents("l_quantity")))
        .select(
            "l_returnflag",
            F.coalesce(F.col("F"), F.lit(0)).alias("qty_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("qty_o"),
        )
    )


SQL_AGG_PIVOT = """
SELECT l_returnflag,
  CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN CAST(round(l_quantity * 100) AS BIGINT) END), 0) AS BIGINT) AS qty_f,
  CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN CAST(round(l_quantity * 100) AS BIGINT) END), 0) AS BIGINT) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations
    in one pass (grouping-sets family, superset of agg_rollup)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
        )
    )


SQL_AGG_CUBE = """
SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-16 sample: filter on a content hash, not
    TABLESAMPLE (whose rows differ per engine/partitioning). This is
    the reproducible-sampling pattern for 100 TB pipelines — stable
    under re-partitioning, resumable, and oracle-comparable."""
    od = _t(spark, sf_dir, "orders")
    return od.filter(
        F.md5(F.col("o_orderkey").cast("string")).substr(1, 1) == "0"
    ).select("o_orderkey", "o_totalprice")


SQL_SAMPLE_HASH = (
    "SELECT o_orderkey, o_totalprice FROM orders "
    "WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'"
)


# KMV (K-Minimum-Values) distinct-count sketch (Bar-Yossef et al. 2002).
# Chosen over HLL for the oracle-paired sketch because it is exact-SQL in
# both engines: one md5-slice hash and a top-k, no bit tricks.
# At 100 TB the plan is: distinct (partial-agg shuffle on the key) →
# per-partition top-k → single k-row merge (TakeOrderedAndProject) —
# no full sort, driver sees exactly k rows.
#
# The hash MUST wrap/scramble, not just permute affinely: round 1 used
# (A*key + B) mod P with P = 2^61-1, and since A*key + B << P for real
# keys the mod never fired — the "hash" was order-preserving, so the
# k-th minimum hash was an affine image of the k-th smallest KEY and the
# estimate was off by orders of magnitude. md5 scrambles by
# construction; its first 8 hex chars are a uniform 32-bit value (same
# construction as the MinHash base, operators/dedup.py:108).
_KMV_K = 1024
_KMV_RANGE = 4294967296.0  # 2^32 — range of the md5-slice hash


def _hash32(col) -> "F.Column":
    """Uniform 32-bit hash of a key: first 8 md5 hex chars as an int."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def kmv_estimate(d: DataFrame, key: str, k: int = _KMV_K) -> DataFrame:
    """1-row (k_actual, kth_hash, est_distinct) over an already-distinct
    key relation: est = (k-1) * 2^32 / h_(k). When fewer than k distinct
    values exist the sketch IS the exact count (KMV small-set
    convention)."""
    h = d.select(_hash32(F.col(key)).alias("h"))
    kth = (
        h.orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("kth_hash"), F.count("*").alias("k_actual"))
    )
    est = F.when(
        F.col("k_actual") < F.lit(k), F.col("k_actual").cast("double")
    ).otherwise(
        (F.col("k_actual") - 1).cast("double")
        * F.lit(_KMV_RANGE)
        / F.col("kth_hash").cast("double")
    )
    return kth.select("k_actual", "kth_hash", est.alias("est_distinct"))


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate |distinct l_partkey| from the k smallest hash values;
    exact count alongside so the error is visible (bounded by the
    accuracy test at ~3/sqrt(k) relative error)."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.select("l_partkey").distinct()
    exact = d.agg(F.count("*").alias("exact_distinct"))
    return kmv_estimate(d, "l_partkey").crossJoin(F.broadcast(exact)).select(
        "k_actual", "kth_hash", "est_distinct", "exact_distinct"
    )


def _sql_kmv(key_expr: str, k: int = _KMV_K) -> str:
    from .oracle_common import sql_md5_hash32

    return sql_md5_hash32(f"CAST({key_expr} AS VARCHAR)")


SQL_SKETCH_KMV = f"""
WITH d AS (SELECT DISTINCT l_partkey FROM lineitem),
hv AS (SELECT {_sql_kmv("l_partkey")} AS h FROM d),
topk AS (SELECT h FROM hv ORDER BY h LIMIT {_KMV_K}),
kth AS (SELECT max(h) AS kth_hash, count(*) AS k_actual FROM topk),
ex AS (SELECT count(*) AS exact_distinct FROM d)
SELECT k_actual, kth_hash,
  CASE WHEN k_actual < {_KMV_K} THEN CAST(k_actual AS DOUBLE)
       ELSE CAST(k_actual - 1 AS DOUBLE) * {_KMV_RANGE!r}
            / CAST(kth_hash AS DOUBLE) END AS est_distinct,
  exact_distinct
FROM kth, ex
"""


def kmv_jaccard(flags: DataFrame, key: str, k: int = _KMV_K) -> DataFrame:
    """1-row (k_actual, n_both, jaccard_est) over a (key, in_a, in_b)
    membership-flag relation: Jaccard estimated as the both-sets
    fraction of the k minimum hashes of the union."""
    h = flags.select(
        _hash32(F.col(key)).alias("h"),
        (F.col("in_a") * F.col("in_b")).alias("both"),
    )
    return (
        h.orderBy("h")
        .limit(k)
        .agg(F.count("*").alias("k_actual"), F.sum("both").alias("n_both"))
        .select(
            "k_actual",
            "n_both",
            (
                F.col("n_both").cast("double") / F.col("k_actual").cast("double")
            ).alias("jaccard_est"),
        )
    )


def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-overlap sketch (theta-sketch intersection pattern): Jaccard
    between two customer key sets estimated as the both-sets fraction
    of the k minimum hashes of their UNION — the corpus-overlap
    primitive behind cross-dataset dedup. Exact Jaccard alongside so
    the sketch error is visible. Same universal hash as the KMV
    cardinality sketch, so per-set sketches are mergeable."""
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 4000).select("c_custkey")
    flags = (
        a.select("c_custkey", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .union(b.select("c_custkey", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
        .groupBy("c_custkey")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    kth = kmv_jaccard(flags, "c_custkey")
    exact = flags.agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter"),
        F.count("*").alias("n_union"),
    )
    return kth.crossJoin(F.broadcast(exact)).select(
        "k_actual",
        "n_both",
        "jaccard_est",
        (F.col("n_inter").cast("double") / F.col("n_union").cast("double")).alias(
            "exact_jaccard"
        ),
    )


SQL_SKETCH_KMV_OVERLAP = f"""
WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 4000),
flags AS (
  SELECT c_custkey, max(in_a) AS in_a, max(in_b) AS in_b
  FROM (SELECT c_custkey, 1 AS in_a, 0 AS in_b FROM a
        UNION ALL
        SELECT c_custkey, 0 AS in_a, 1 AS in_b FROM b) u
  GROUP BY c_custkey),
hv AS (SELECT {_sql_kmv("c_custkey")} AS h,
              in_a * in_b AS in_both FROM flags),
topk AS (SELECT in_both FROM hv ORDER BY h LIMIT {_KMV_K}),
kth AS (SELECT count(*) AS k_actual,
               CAST(sum(in_both) AS BIGINT) AS n_both FROM topk),
ex AS (SELECT CAST(sum(in_a * in_b) AS BIGINT) AS n_inter,
              count(*) AS n_union FROM flags)
SELECT k_actual, n_both,
  CAST(n_both AS DOUBLE) / CAST(k_actual AS DOUBLE) AS jaccard_est,
  CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS exact_jaccard
FROM kth, ex
"""


# Equi-width histogram: fixed data-independent bounds so the whole
# histogram is ONE map-side-combined aggregation pass (no pre-scan for
# min/max) and per-partition partial histograms merge by bucket-wise
# addition — the profiling primitive that stays a few-KB accumulator
# per executor at 100 TB.
_HIST_LO = 900.0
_HIST_HI = 105000.0
_HIST_NB = 32
_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_NB


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass equi-width histogram of l_extendedprice: bucket
    index, row count, and bucket revenue (summed as integer cents for
    cross-engine parity). Out-of-range values clamp to the edge
    buckets, so the pass never needs a min/max pre-scan."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.greatest(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.lit(_HIST_LO)) / F.lit(_HIST_W)
            ),
            F.lit(_HIST_NB - 1).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
    ).cast("int")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(
                F.round(F.col("l_extendedprice") * F.lit(100.0), 0).cast("long")
            ).alias("sum_cents"),
        )
        .select(
            "bucket",
            (F.lit(_HIST_LO) + F.col("bucket").cast("double") * F.lit(_HIST_W)).alias(
                "bucket_lo"
            ),
            "cnt",
            "sum_cents",
        )
    )


SQL_AGG_HISTOGRAM = f"""
SELECT bucket,
  {_HIST_LO} + CAST(bucket AS DOUBLE) * {_HIST_W!r} AS bucket_lo,
  CAST(count(*) AS BIGINT) AS cnt,
  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM (
  SELECT CAST(greatest(least(
    floor((l_extendedprice - {_HIST_LO}) / {_HIST_W!r}),
    {_HIST_NB - 1}), 0) AS INTEGER) AS bucket, l_extendedprice
  FROM lineitem)
GROUP BY bucket
"""


def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining SQL ranking family in one pass: ntile/percent_rank/
    cume_dist share ONE window (single sort, single Window node). The
    (ts, event_id) order is a total order, so rank-based fractions are
    tie-free and engine-independent."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


SQL_WINDOW_RANKING = """
SELECT event_id, user_id,
  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value per user over the FULL partition. The frame
    is pinned to unbounded-unbounded explicitly — Spark's default
    last_value frame stops at CURRENT ROW, so relying on defaults would
    silently diverge between engines."""
    ev = _t(spark, sf_dir, "events").withColumn("cents", _cents("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("cents").over(w).alias("first_cents"),
        F.last("cents").over(w).alias("last_cents"),
        F.nth_value("cents", 2).over(w).alias("second_cents"),
    )


SQL_WINDOW_FIRST_LAST = """
SELECT event_id, user_id,
  first_value(cents) OVER w AS first_cents,
  last_value(cents) OVER w AS last_cents,
  nth_value(cents, 2) OVER w AS second_cents
FROM (SELECT event_id, user_id, ts,
        CAST(round(value * 100) AS BIGINT) AS cents FROM events) t
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def null_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics surface: NULLIF to introduce nulls, COALESCE to
    fill them, null-safe equality (Spark `eqNullSafe` ≡ SQL IS NOT
    DISTINCT FROM), and a null-aware conditional count. All stay inside
    codegen — no UDFs."""
    ev = _t(spark, sf_dir, "events")
    nullable = F.nullif(F.col("event_type"), F.lit("click"))
    return (
        ev.select(
            "user_id",
            nullable.alias("nt"),
            F.coalesce(nullable, F.lit("<none>")).alias("filled_type"),
            nullable.eqNullSafe(F.lit(None).cast("string")).alias("is_click"),
        )
        .groupBy("filled_type", "is_click")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("nt").alias("n_nonnull"),
        )
        .drop("nt")
    )


SQL_NULL_SCALARS = """
SELECT coalesce(nullif(event_type, 'click'), '<none>') AS filled_type,
  nullif(event_type, 'click') IS NOT DISTINCT FROM NULL AS is_click,
  count(*) AS n_rows,
  count(nullif(event_type, 'click')) AS n_nonnull
FROM events
GROUP BY 1, 2
"""


def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient join: lineitem x orders per priority, with the
    salt count derived from OBSERVED key skew (operators/skew.py
    decide_num_salts) instead of a fixed 8x replication. TPC-H order
    keys are uniform (<= 7 lines/order), so the probe correctly decides
    "don't salt" and this runs as a plain equi-join — the salted
    physical rewrite kicks in only when a key would overflow a
    partition (exercised with a planted hot key in
    tests/test_extensions.py). Result is identical either way — the
    oracle proves it."""
    from ..operators.skew import adaptive_salted_join

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = adaptive_salted_join(
        li, od, on="l_orderkey",
        salt_cols=["l_orderkey", "l_linenumber"],
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000))
            / F.lit(10000.0)
        ).alias("revenue"),
    )


SQL_JOIN_SALTED = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group. avg/stddev are computed from
    exact integer moments (sum of cents, sum of squared cents) with
    identical double arithmetic on both sides — engine-native stddev
    implementations (Welford vs two-pass) differ in late bits and
    break hash comparison."""
    li = _t(spark, sf_dir, "lineitem")
    c = _cents("l_quantity")
    g = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
        F.min(c).alias("min_c"),
        F.max(c).alias("max_c"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * mean) / (
        n - F.lit(1.0)
    )
    return g.select(
        "l_returnflag",
        "n",
        (mean / 100.0).alias("avg_qty"),
        (F.sqrt(var) / 100.0).alias("stddev_qty"),
        (F.col("min_c").cast("double") / 100.0).alias("min_qty"),
        (F.col("max_c").cast("double") / 100.0).alias("max_qty"),
    )


SQL_AGG_STATS = """
WITH g AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS s1,
    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS s2,
    min(CAST(round(l_quantity * 100) AS BIGINT)) AS min_c,
    max(CAST(round(l_quantity * 100) AS BIGINT)) AS max_c
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
  (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS avg_qty,
  sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)) / 100.0 AS stddev_qty,
  CAST(min_c AS DOUBLE) / 100.0 AS min_qty,
  CAST(max_c AS DOUBLE) / 100.0 AS max_qty
FROM g
"""


def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point, exercised end to end: a correlated
    scalar subquery (orders above their customer's average), written as
    the SAME SQL text both engines run — Catalyst decorrelates it into
    an aggregate + join under the hood."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SQL_CORRELATED)


SQL_CORRELATED = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (
  SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey)
"""


def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) per group over
    integer cents — both engines use linear interpolation on sorted
    values, exact for integer inputs."""
    li = _t(spark, sf_dir, "lineitem")
    c = _cents("l_quantity")
    return li.groupBy("l_returnflag").agg(
        (F.percentile(c, F.lit(0.5)) / 100.0).alias("p50_qty"),
        (F.percentile(c, F.lit(0.9)) / 100.0).alias("p90_qty"),
    )


SQL_AGG_PERCENTILE = """
SELECT l_returnflag,
  quantile_cont(CAST(round(l_quantity * 100) AS BIGINT), 0.5) / 100.0 AS p50_qty,
  quantile_cont(CAST(round(l_quantity * 100) AS BIGINT), 0.9) / 100.0 AS p90_qty
FROM lineitem GROUP BY l_returnflag
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form that rollup/cube specialize.
    One pass expands each input row into its grouping-set combinations
    before the hash aggregate (Catalyst's Expand node), so it stays a
    single shuffle regardless of how many sets are requested. Same SQL
    text runs on both engines; grouping() disambiguates aggregated-out
    NULLs from data NULLs."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SQL_GROUPING_SETS)


SQL_GROUPING_SETS = """
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         AS gid,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS qty_cents,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly min(50, |stratum|) documents per
    language, chosen by a content-hash order so the pick is stable
    under re-partitioning and engine choice. This is the
    class-balancing primitive for training-data curation — the
    hash-ordered row_number costs one shuffle on the stratum key.
    At 100 TB scale with few strata, the per-stratum window sort is
    the bottleneck; the fix is the two-phase variant (hash-threshold
    prefilter to ~2x the quota per stratum, then exact rank), which
    keeps this exact semantics while sorting only the survivors."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "lang")
    )


SQL_SAMPLE_STRATIFIED = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) t
WHERE rn <= 50
"""


# --- built-in approximate aggregates --------------------------------------
# The estimates themselves are engine-specific (Spark HLL++ / KLL vs
# DuckDB HLL / t-digest), so the oracle-comparable relation is
# (exact value, within-tolerance flag): each engine checks ITS OWN
# estimate against the exact answer at a 5% bound with generous slack
# over the estimators' configured error. The flag is the contract a
# user of the approximate aggregate actually relies on.

def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=1%) vs exact distinct count of
    l_partkey; emits the exact count and the 5%-tolerance flag."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("est"),
        F.countDistinct("l_partkey").alias("exact_distinct"),
    )
    return agg.select(
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_tol"),
    )


SQL_AGG_APPROX_DISTINCT = """
WITH a AS (SELECT approx_count_distinct(l_partkey) AS est,
                  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
           FROM lineitem)
SELECT exact_distinct,
       abs(CAST(est AS DOUBLE) - exact_distinct) <= 0.05 * exact_distinct AS within_tol
FROM a
"""


def agg_approx_distinct_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HLL++ (the mergeable-sketch group-by shape: one hash
    aggregate whose buffer is a fixed-size sketch per group, map-side
    combinable — at 100 TB the per-group distinct table never
    materializes). Exact count + tolerance flag per group, hashed on
    the exact value and the flag like agg_approx_distinct."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("est"),
        F.countDistinct("l_partkey").alias("exact_distinct"),
    )
    return agg.select(
        "l_returnflag",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_tol"),
    )


SQL_AGG_APPROX_DISTINCT_GROUPED = """
WITH a AS (SELECT l_returnflag,
                  approx_count_distinct(l_partkey) AS est,
                  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
           FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, exact_distinct,
       abs(CAST(est AS DOUBLE) - exact_distinct) <= 0.05 * exact_distinct AS within_tol
FROM a
"""


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (accuracy 10000) vs exact interpolated
    percentiles of l_extendedprice per return flag. Exact side runs on
    integer cents at dyadic fractions (0.25/0.5/0.75), so the
    interpolation lower + (upper-lower)*frac is exact in doubles and
    engine-independent; /100.0 restores units with one shared IEEE op."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.select("l_returnflag", _cents("l_extendedprice").alias("cents"))
    g = c.groupBy("l_returnflag").agg(
        F.expr("percentile(cents, array(0.25D, 0.5D, 0.75D))").alias("ex"),
        F.expr("percentile_approx(cents, array(0.25D, 0.5D, 0.75D), 10000)").alias(
            "ap"
        ),
    )
    tol = None
    for i in (1, 2, 3):
        ok = (
            F.abs(F.element_at("ap", i) - F.element_at("ex", i))
            <= 0.05 * F.element_at("ex", i)
        )
        tol = ok if tol is None else (tol & ok)
    return g.select(
        "l_returnflag",
        (F.element_at("ex", 1) / 100.0).alias("p25"),
        (F.element_at("ex", 2) / 100.0).alias("p50"),
        (F.element_at("ex", 3) / 100.0).alias("p75"),
        tol.alias("within_tol"),
    )


SQL_AGG_APPROX_PERCENTILE = """
WITH c AS (SELECT l_returnflag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
g AS (SELECT l_returnflag,
             quantile_cont(cents, [0.25, 0.5, 0.75]) AS ex,
             approx_quantile(cents, [0.25, 0.5, 0.75]) AS ap
      FROM c GROUP BY l_returnflag)
SELECT l_returnflag,
  ex[1] / 100.0 AS p25, ex[2] / 100.0 AS p50, ex[3] / 100.0 AS p75,
  (abs(ap[1] - ex[1]) <= 0.05 * ex[1]
   AND abs(ap[2] - ex[2]) <= 0.05 * ex[2]
   AND abs(ap[3] - ex[3]) <= 0.05 * ex[3]) AS within_tol
FROM g
"""


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape with the native DataFrame.unpivot (melt):
    the inverse of agg_pivot. Map-side only — Expand produces one row
    per (input row x metric), no shuffle, no UDF."""
    li = scan_parquet(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 100
    )
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "metric",
        "value",
    )


SQL_AGG_UNPIVOT = """
SELECT l_orderkey, l_linenumber, m.metric,
       CASE m.metric
         WHEN 'quantity' THEN CAST(l_quantity AS DOUBLE)
         WHEN 'extendedprice' THEN CAST(l_extendedprice AS DOUBLE)
         ELSE CAST(l_discount AS DOUBLE) END AS value
FROM lineitem,
     (SELECT unnest(['quantity', 'extendedprice', 'discount']) AS metric) m
WHERE l_orderkey < 100
"""


# --- TPC-H-flavour round-out (adapted to the driver tables' columns:
# no commitdate/receiptdate/shipmode, so Q4/Q12 predicates are recast
# onto l_returnflag; money math is exact integer cents throughout) ----


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavour: order-priority checking — orders in a quarter
    having at least one returned lineitem (EXISTS → left-semi join;
    Spark broadcasts the dedup'd probe side under AQE when small)."""
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        od.join(li, od.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global agg — the predicate-pushdown
    showcase (every filter reaches the parquet scan; one partial-agg
    funnel, no shuffle of data rows)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = _cents(F.col("l_extendedprice") * F.col("l_discount"), 10000)
    return li.agg((F.sum(rev) / F.lit(10000.0)).alias("revenue"))


SQL_Q6 = """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT)
       / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 flavour: top-20 customers by revenue lost to returns
    in a quarter. Fact-side filters push down; customer/nation are
    broadcast; the top-20 is a TakeOrderedAndProject (no full sort),
    tie-broken on c_custkey for determinism."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(rev) / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
  / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month — conditional agg
    over a broadcast part join; one division of two exact cent sums."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    pt = _t(spark, sf_dir, "part")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    j = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("long")
    )
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


SQL_Q14 = """
SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
    THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
    ELSE 0 END) AS DOUBLE)
  / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers — a HAVING over the lineitem
    rollup feeds a broadcast semi-ish join back to orders/customer.
    Quantities are integer-valued doubles (< 2^53), so the double sum
    is exact under any aggregation order."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    return (
        od.join(F.broadcast(big), od.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )


SQL_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL: duplicates survive up to the minimum
    multiplicity on each side — the bag semantics Spark's intersectAll
    and SQL INTERSECT ALL share (the DISTINCT form is set_intersect).
    Probed on per-order lineitem return flags so both sides carry real
    multiplicities."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_orderkey").alias("k")
    )
    return a.intersectAll(b)


SQL_SET_INTERSECT_ALL = """
SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_orderkey AS k FROM lineitem WHERE l_linestatus = 'F'
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: each right-side occurrence cancels ONE
    left-side occurrence (bag difference) — exceptAll / SQL EXCEPT
    ALL."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select(
        F.col("l_orderkey").alias("k")
    )
    b = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("k")
    )
    return a.exceptAll(b)


SQL_SET_EXCEPT_ALL = """
SELECT l_orderkey AS k FROM lineitem WHERE l_quantity >= 25
EXCEPT ALL
SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'A'
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 flavour: shipping volume between two nations by year —
    a 6-table multiway join where both nation dims broadcast under
    distinct aliases, with the symmetric OR pair predicate evaluated
    after the joins and a (nation, nation, year) conditional agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg((F.sum(rev) / F.lit(10000.0)).alias("revenue"))
    )


SQL_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INTEGER) AS l_year,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
  / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 flavour: OR-of-ANDs predicate over a broadcast part
    join — the disjunctive-pushdown showcase (each disjunct pairs a
    brand with a size and quantity band; Catalyst extracts the common
    join key and leaves the disjunction as one post-join filter)."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(20, 50))
        )
    )
    return j.filter(cond).agg(
        F.count("*").alias("n_items"),
        (F.sum(rev) / F.lit(10000.0)).alias("revenue"),
    )


SQL_Q19 = """
SELECT CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
  / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank over a total order (cents, then the unique
    (l_orderkey, l_linenumber) key) so tile assignment is deterministic
    in both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    c = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        _cents("l_extendedprice").alias("cents"),
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    return c.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "cents",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


SQL_WINDOW_NTILE = """
SELECT l_orderkey, l_linenumber, l_returnflag,
  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
  percent_rank() OVER w AS pct_rank
FROM lineitem
WHERE l_orderkey < 1000
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
                      l_orderkey, l_linenumber)
"""


# Fixed epoch base for the regression x axis (2024-01-01 UTC, µs) —
# rebasing before quantization keeps xq small enough that every sum
# below stays exactly representable in 64-bit integers.
_LINREG_BASE_US = 1_704_067_200_000_000


def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend: slope and intercept of
    `value` over time per event_type — the custom-aggregate shape
    (grouped regression / trend detection) expressed as FOUR plain
    sums, no UDAF.

    Exact cross-engine arithmetic: x is quantized to integer
    milli-days since a fixed base and y to 2^20 fixed point, so every
    aggregated sum (n, Σx, Σy, Σxy, Σx²) is an exact 64-bit integer —
    order-independent under partial aggregation and bit-identical in
    the DuckDB twin. Only the final scalar slope/intercept math runs
    in doubles, as one fixed expression over exact inputs. A raw
    double-sum formulation would hash-drift across engines through
    summation order + catastrophic cancellation in n·Σxy − Σx·Σy.

    Scale: one map-side-combined hash aggregate, one shuffle on the
    (tiny) group key. Bounds: |xq| < 4·10^5 per year, |yq| < 2^27 for
    |y| < 128 → Σxy < 10^4·5·10^12 per million rows/group — integer-
    safe beyond sf100."""
    ev = scan_parquet(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr(
            f"(unix_micros(ts) - {_LINREG_BASE_US}L) div 86400000"
        ).alias("xq"),
        F.round(F.col("value") * F.lit(1048576.0)).cast("long").alias("yq"),
    )
    agg = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope_q = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    # rescale: (y·2^20) per milli-day -> y units per day
    slope = slope_q * F.lit(1e3 / 1_048_576.0)
    intercept = ((sy - slope_q * sx) / n) / F.lit(1_048_576.0)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        slope.alias("slope_per_day"),
        intercept.alias("intercept"),
    ).orderBy("event_type")


SQL_AGG_LINREG = f"""
WITH b AS (
  SELECT event_type,
    (epoch_us(ts) - {_LINREG_BASE_US}) // 86400000 AS xq,
    CAST(round(value * 1048576.0) AS BIGINT) AS yq
  FROM events),
a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    sum(xq) AS sx, sum(yq) AS sy,
    sum(xq * yq) AS sxy, sum(xq * xq) AS sxx
  FROM b GROUP BY event_type)
SELECT event_type, n AS n_rows,
  ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
  * {1e3 / 1_048_576.0} AS slope_per_day,
  ((CAST(sy AS DOUBLE)
    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
   / CAST(n AS DOUBLE)) / 1048576.0 AS intercept
FROM a ORDER BY event_type
"""


def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a DETERMINISTIC tie rule: the most frequent
    o_orderpriority per order status, ties to the lexicographically
    first value — built as count + row_number rather than a native
    mode() whose tie behaviour is engine-defined (DuckDB's mode()
    picks an arbitrary tied value; this form is reproducible
    everywhere). Two tiny hash aggregates + a per-group window; the
    input shuffles once on the (status, priority) pair."""
    od = _t(spark, sf_dir, "orders")
    counts = od.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_rows")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n_rows"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n_rows",
        )
        .orderBy("o_orderstatus")
    )


SQL_AGG_MODE = """
WITH c AS (SELECT o_orderstatus, o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_rows
           FROM orders GROUP BY o_orderstatus, o_orderpriority),
r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        ORDER BY n_rows DESC, o_orderpriority ASC) AS rn FROM c)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n_rows
FROM r WHERE rn = 1 ORDER BY o_orderstatus
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 flavour (reduced schema: no o_comment filter): the
    orders-per-customer distribution — customer LEFT OUTER orders,
    a per-customer count, then a tiny second aggregate over the count
    domain. Zero-order customers keep c_count = 0, the outer-join
    semantic an inner form silently drops; count(o_orderkey) skips
    the NULLs the outer join manufactures. One shuffle join + one
    custkey aggregate; the distribution aggregate runs over at most
    max(c_count)+1 distinct values."""
    cu = _t(spark, sf_dir, "customer").select("c_custkey")
    od = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


SQL_Q13 = """
WITH per AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per GROUP BY c_count
"""


def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 flavour (reduced schema: l_returnflag = 'R' stands in
    for the commit/receipt lateness predicate): per supplier, the
    number of multi-supplier orders where that supplier was the ONLY
    one with a returned line — Q21's EXISTS (another supplier touched
    the order) + NOT EXISTS (another supplier also failed) double
    correlation. Instead of two correlated self-join probes of the
    fact table, both tests are window aggregates over ONE l_orderkey
    exchange: per-(order, supplier) flags from a hash aggregate, then
    supplier-count and failed-supplier-count windows on the same
    partitioning (no second exchange), then a supplier-keyed count
    with the dim broadcast in."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    per_os = (
        li.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("has_ret")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.withColumn(
        "n_supp", F.count("*").over(w)
    ).withColumn("n_ret_supp", F.sum("has_ret").over(w))
    blamed = flagged.filter(
        (F.col("has_ret") == 1)
        & (F.col("n_supp") >= 2)
        & (F.col("n_ret_supp") == 1)
    )
    # group by s_name AFTER the dim join — structurally identical to
    # the oracle's GROUP BY s_name, so duplicate supplier names can
    # never split the twins (grouping by suppkey then joining would)
    return (
        blamed.join(
            F.broadcast(su.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


SQL_Q21 = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret
  FROM lineitem GROUP BY l_orderkey, l_suppkey),
flagged AS (
  SELECT *, CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_supp,
         CAST(sum(has_ret) OVER (PARTITION BY l_orderkey) AS BIGINT)
           AS n_ret_supp
  FROM per_os)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM flagged JOIN supplier ON l_suppkey = s_suppkey
WHERE has_ret = 1 AND n_supp >= 2 AND n_ret_supp = 1
GROUP BY s_name
"""


def q22_idle_capital(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 flavour (reduced schema: nation replaces the phone
    prefix bucket): customers with an above-average positive account
    balance and NO orders, per nation — (n_name, numcust,
    totacctbal_cents). The 'above average' scalar attaches as a 1-row
    broadcast (J3) holding EXACT integer sums, and the comparison
    cross-multiplies (cents * n > sum_cents) instead of dividing, so
    the threshold is integer-exact on both engines — a float average
    would flip boundary customers between engines. Q22's NOT EXISTS
    over raw orders matches nothing in this synthetic data (every
    customer orders), so the anti-join targets the derived
    frequent-customer relation (>= 6 orders) instead — same anti-join
    shape, one extra key-only aggregate of the fact table; at scale
    the fact table is touched once and contributes one slim key
    column."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").select("o_custkey")
    na = _t(spark, sf_dir, "nation")
    cents = _cents("c_acctbal")
    ap = cu.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("__s"), F.count("*").alias("__n")
    )
    rich = cu.join(F.broadcast(ap)).filter(
        cents * F.col("__n") > F.col("__s")
    )
    frequent = (
        od.groupBy("o_custkey").count().filter(F.col("count") >= 6)
    )
    idle = rich.join(
        frequent, cu.c_custkey == frequent.o_custkey, "left_anti"
    )
    return (
        idle.join(
            F.broadcast(na),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(cents).alias("totacctbal_cents"),
        )
    )


SQL_Q22 = """
WITH ap AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0)
SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
    AS totacctbal_cents
FROM customer CROSS JOIN ap
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > s
  AND NOT EXISTS (
    SELECT 1 FROM (SELECT o_custkey FROM orders
                   GROUP BY o_custkey HAVING count(*) >= 6) f
    WHERE f.o_custkey = c_custkey)
GROUP BY n_name
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 flavour (reduced schema: p_type is a single word):
    NATION_7's share of ASIA's PROMO-part import revenue by order
    year — the national-market-share ratio. All five dims broadcast
    against the one lineitem-orders shuffle join; revenue accumulates
    as exact 10^-4-dollar integers and the share is ONE BIGINT/BIGINT
    double division per year row, so the ratio column is bit-stable
    cross-engine (a sum of per-row float shares would not be)."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    pa = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    su = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_regionkey").alias("n2_region"),
    )
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cu = _t(spark, sf_dir, "customer")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(re), F.col("n2_region") == F.col("r_regionkey"))
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("__nat"),
            F.sum(rev).alias("__tot"),
        )
        .select(
            "o_year",
            (
                F.col("__nat").cast("double") / F.col("__tot").cast("double")
            ).alias("mkt_share"),
        )
    )


SQL_Q8 = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(CAST(sum(CASE WHEN n1.n_name = 'NATION_7'
    THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
    ELSE 0 END) AS BIGINT) AS DOUBLE)
  / CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS DOUBLE)
  AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY year(o_orderdate)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 flavour: the supplier(s) with the maximum revenue in
    1996 Q1 — Q15's revenue view + correlated max. The max attaches
    as a 1-row broadcast (the q22 scalar pattern, not an unpartitioned
    window), and the tie test compares exact 10^-4-dollar BIGINTs, so
    'equals the max' can never flake on float representation; revenue
    divides back to dollars only in the final projection."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    su = _t(spark, sf_dir, "supplier")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    per = li.groupBy("l_suppkey").agg(F.sum(rev).alias("__rc"))
    mx = per.agg(F.max("__rc").alias("__mx"))
    return (
        per.crossJoin(F.broadcast(mx))
        .filter(F.col("__rc") == F.col("__mx"))
        .join(
            F.broadcast(su.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            (F.col("__rc").cast("double") / F.lit(10000.0)).alias(
                "total_revenue"
            ),
        )
    )


SQL_Q15 = """
WITH per AS (
  SELECT l_suppkey,
    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS rc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey),
mx AS (SELECT max(rc) AS m FROM per)
SELECT s_suppkey, s_name, CAST(rc AS DOUBLE) / 10000.0 AS total_revenue
FROM per CROSS JOIN mx
JOIN supplier ON l_suppkey = s_suppkey
WHERE rc = m
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 flavour (reduced schema: p_type = 'SMALL' stands in
    for the brand+container pair): average yearly revenue lost if
    small-quantity orders of SMALL parts stopped shipping — Q17's
    correlated per-part average. The avg threshold is evaluated
    WITHOUT floats: q < 0.2 * avg(q) cross-multiplies to
    5*q_cents*n < sum_q_cents over exact integers (the q22 scalar
    pattern), computed by two aggregate-windows on ONE l_partkey
    exchange instead of a correlated self-join probe; the final sum
    divides once by 7*10^4 (7 years of data, cents scale)."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    qc = _cents("l_quantity")
    j = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey).select(
        "l_partkey",
        qc.alias("__qc"),
        _cents(F.col("l_extendedprice"), 10000).alias("__ec"),
    )
    w = Window.partitionBy("l_partkey")
    flt = (
        j.withColumn("__n", F.count("*").over(w))
        .withColumn("__sq", F.sum("__qc").over(w))
        .filter(F.lit(5) * F.col("__qc") * F.col("__n") < F.col("__sq"))
    )
    return flt.agg(
        (F.sum("__ec").cast("double") / F.lit(70000.0)).alias("avg_yearly")
    )


SQL_Q17 = """
WITH j AS (
  SELECT l_partkey,
    CAST(round(l_quantity * 100) AS BIGINT) AS qc,
    CAST(round(l_extendedprice * 10000) AS BIGINT) AS ec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL'),
f AS (
  SELECT qc, ec,
    CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n,
    CAST(sum(qc) OVER (PARTITION BY l_partkey) AS BIGINT) AS sq
  FROM j)
SELECT CAST(CAST(sum(ec) AS BIGINT) AS DOUBLE) / 70000.0 AS avg_yearly
FROM f WHERE 5 * qc * n < sq
"""


RELATIONAL_QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, SQL_Q1),
    "q3_shipping_priority": (q3_shipping_priority, SQL_Q3),
    "q5_supplier_revenue": (q5_supplier_revenue, SQL_Q5),
    "agg_rollup": (agg_rollup, SQL_ROLLUP),
    "agg_grouping_sets": (agg_grouping_sets, SQL_GROUPING_SETS),
    "sample_stratified": (sample_stratified, SQL_SAMPLE_STRATIFIED),
    "agg_stats": (agg_stats, SQL_AGG_STATS),
    "agg_percentile": (agg_percentile, SQL_AGG_PERCENTILE),
    "agg_approx_distinct": (agg_approx_distinct, SQL_AGG_APPROX_DISTINCT),
    "agg_approx_distinct_grouped": (
        agg_approx_distinct_grouped,
        SQL_AGG_APPROX_DISTINCT_GROUPED,
    ),
    "agg_approx_percentile": (agg_approx_percentile, SQL_AGG_APPROX_PERCENTILE),
    "distinct_agg": (distinct_agg, SQL_DISTINCT_AGG),
    "having_filter": (having_filter, SQL_HAVING),
    "case_when_bucket": (case_when_bucket, SQL_CASE_WHEN),
    "join_semi": (join_semi, SQL_JOIN_SEMI),
    "join_anti": (join_anti, SQL_JOIN_ANTI),
    "join_outer": (join_outer, SQL_JOIN_OUTER),
    "join_broadcast_dim": (join_broadcast_dim, SQL_JOIN_BROADCAST),
    "multiway_join": (multiway_join, SQL_MULTIWAY),
    "join_salted": (join_salted, SQL_JOIN_SALTED),
    "agg_pivot": (agg_pivot, SQL_AGG_PIVOT),
    "agg_cube": (agg_cube, SQL_AGG_CUBE),
    "sample_hash": (sample_hash, SQL_SAMPLE_HASH),
    "window_rank": (window_rank, SQL_WINDOW_RANK),
    "window_ranking": (window_ranking, SQL_WINDOW_RANKING),
    "window_first_last": (window_first_last, SQL_WINDOW_FIRST_LAST),
    "null_scalars": (null_scalars, SQL_NULL_SCALARS),
    "sketch_kmv_distinct": (sketch_kmv_distinct, SQL_SKETCH_KMV),
    "sketch_kmv_overlap": (sketch_kmv_overlap, SQL_SKETCH_KMV_OVERLAP),
    "agg_histogram": (agg_histogram, SQL_AGG_HISTOGRAM),
    "window_lag": (window_lag, SQL_WINDOW_LAG),
    "window_moving_sum": (window_moving_sum, SQL_WINDOW_MOVING),
    "set_union": (set_union, SQL_SET_UNION),
    "set_intersect": (set_intersect, SQL_SET_INTERSECT),
    "set_except": (set_except, SQL_SET_EXCEPT),
    "date_scalars": (date_scalars, SQL_DATE_SCALARS),
    "string_scalars": (string_scalars, SQL_STRING_SCALARS),
    "top_n_global": (top_n_global, SQL_TOP_N),
    "sql_correlated_subquery": (sql_correlated_subquery, SQL_CORRELATED),
    "agg_unpivot": (agg_unpivot, SQL_AGG_UNPIVOT),
    # round-3 additions — registered at the tail so they never displace
    # not-yet-certified entries from the certification window
    "q4_order_priority": (q4_order_priority, SQL_Q4),
    "q6_forecast_revenue": (q6_forecast_revenue, SQL_Q6),
    "q10_returned_items": (q10_returned_items, SQL_Q10),
    "q14_promo_effect": (q14_promo_effect, SQL_Q14),
    "q18_large_volume": (q18_large_volume, SQL_Q18),
    "window_ntile": (window_ntile, SQL_WINDOW_NTILE),
    "q7_nation_volume": (q7_nation_volume, SQL_Q7),
    "q19_discounted_revenue": (q19_discounted_revenue, SQL_Q19),
    "set_intersect_all": (set_intersect_all, SQL_SET_INTERSECT_ALL),
    "set_except_all": (set_except_all, SQL_SET_EXCEPT_ALL),
    # round-4 additions (tail; promote into the round-5 window)
    "agg_linreg": (agg_linreg, SQL_AGG_LINREG),
    "agg_mode": (agg_mode, SQL_AGG_MODE),
    # round-6 additions (tail; promote into the round-7 window)
    "q13_customer_distribution": (q13_customer_distribution, SQL_Q13),
    "q21_sole_blame_supplier": (q21_sole_blame_supplier, SQL_Q21),
    "q22_idle_capital": (q22_idle_capital, SQL_Q22),
    # round-7 additions (tail; promote into the round-8 window).
    # q8/q15/q17 complete the TPC-H flavours expressible on this
    # reduced schema (q2/q9/q11/q16/q20 need partsupp, q12 needs
    # l_shipmode/commit dates — neither exists in the testdata).
    "q8_market_share": (q8_market_share, SQL_Q8),
    "q15_top_supplier": (q15_top_supplier, SQL_Q15),
    "q17_small_qty_revenue": (q17_small_qty_revenue, SQL_Q17),
}
