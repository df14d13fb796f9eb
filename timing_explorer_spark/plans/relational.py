"""Relational operator inventory over the TPC-H-ish tables (SURVEY.md §2.2/§7 P3).

The reference has no SQL surface (SURVEY §2.2: no joins, sorts, set ops, UDFs
— checked absent), so this module IS the declared relational capability of the
new engine: scans, project/filter, inner/left/semi/anti joins, hash aggregation,
distinct agg, rollup/cube, window functions, sort/limit/top-k, set ops, scalar
string/date/math/JSON functions. All Catalyst built-ins — no custom rules.

Scale design notes (100 TB):
 - Dimension joins (region/nation/supplier) use explicit ``broadcast()`` —
   at any scale factor those tables are tiny and must never shuffle the fact side.
 - Fact-fact joins (lineitem⋈orders) hash-shuffle on the join key; AQE handles
   skew and coalesces post-shuffle partitions.
 - Aggregations are expressed via groupBy().agg() → Catalyst plans partial
   (map-side) aggregation automatically; no collect()-side logic anywhere.
 - Filters sit directly on the scan so parquet pushdown + column pruning apply
   (verified via .explain in tests/test_plans_scale.py).
Every query carries a DuckDB oracle; computed columns are aliased identically
on both sides (driver hash-compares by column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import (
    exact_avg,
    exact_sum,
    grouped_exact_sum,
    merge_split_sum,
    split_exact_sum,
    units,
)
from ..sources.tables import load
from .registry import register


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            SUM(l_quantity)                                       AS sum_qty,
            CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE)
                 / 10000.0                                        AS sum_base_price,
            CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                 AS BIGINT)) AS DOUBLE) / 10000.0                 AS sum_disc_price,
            CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                 * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0    AS sum_charge,
            AVG(l_quantity)                                       AS avg_qty,
            CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE)
                 / 10000.0 / COUNT(*)                             AS avg_price,
            CAST(SUM(CAST(ROUND(l_discount * 100000000) AS BIGINT)) AS DOUBLE)
                 / 100000000.0 / COUNT(*)                         AS avg_disc,
            COUNT(*)                                              AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: filtered scan -> partial+final hash agg.",
    headline=True,
    tags=("agg", "scan", "filter"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    # Single-level exact aggregation on the long fast path: each money sum is
    # a split-accumulator pair (functions/numeric.py::split_exact_sum — two
    # plain long sums per measure, exact for ~2^43 rows PER GROUP, i.e.
    # petabyte-scale lineitem), recombined in decimal once per group AFTER
    # the merge. One HashAggregate pair, ONE exchange — the round-4 plan's
    # per-(group, partition-id) pre-aggregation achieved the same overflow
    # safety but cost a second HashAggregate+Exchange level (r4 verdict
    # lever (b)); partial long sums are algebraic, so the extra level bought
    # nothing. Charge has 6 rational decimals, so its scale is 10^6
    # (units() rule: at 10^4 the scaled value lands exactly on .5 and
    # round-half mode would leak into the result).
    base_hi, base_lo = split_exact_sum(F.col("l_extendedprice"), 10000)
    dp_hi, dp_lo = split_exact_sum(disc_price, 10000)
    ch_hi, ch_lo = split_exact_sum(charge, 1000000)
    dc_hi, dc_lo = split_exact_sum(F.col("l_discount"), 100000000)
    agg = (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            base_hi.alias("__bh"),
            base_lo.alias("__bl"),
            dp_hi.alias("__dh"),
            dp_lo.alias("__dl"),
            ch_hi.alias("__ch"),
            ch_lo.alias("__cl"),
            dc_hi.alias("__sh"),
            dc_lo.alias("__sl"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    n = F.col("count_order")
    base = merge_split_sum(F.col("__bh"), F.col("__bl"), 10000)
    dp = merge_split_sum(F.col("__dh"), F.col("__dl"), 10000)
    ch = merge_split_sum(F.col("__ch"), F.col("__cl"), 1000000)
    dc = merge_split_sum(F.col("__sh"), F.col("__sl"), 100000000)
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        base.alias("sum_base_price"),
        dp.alias("sum_disc_price"),
        ch.alias("sum_charge"),
        (F.col("sum_qty") / n).alias("avg_qty"),
        (base / n).alias("avg_price"),
        (dc / n).alias("avg_disc"),
        "count_order",
    )


@register(
    "q03_shipping_priority",
    oracle="""
        SELECT
            l.l_orderkey,
            CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                 AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
            o.o_orderdate,
            o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3-style: 3-way join + agg + deterministic top-k (tie-broken).",
    headline=True,
    tags=("join", "agg", "topk"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # Single-level long-unit sum: a group is one order (<= 7 lineitems),
        # so the per-group sum is bounded ~1e10 units at ANY corpus scale —
        # no decimal accumulator needed, stays in codegen's long fast path.
        .agg(
            (F.sum(units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000))
             .cast("double") / F.lit(10000.0)).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
        SELECT
            n.n_name,
            CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                 AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey   = o.o_custkey
        JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
        JOIN supplier s ON l.l_suppkey   = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    doc=(
        "TPC-H Q5-style 6-way join. nation/region/supplier broadcast "
        "(dimension tables stay small at every SF); fact joins shuffle on key."
    ),
    headline=True,
    tags=("join", "broadcast", "agg"),
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Join order: lineitem probes the (filtered) orders side first, then
    # customer — with l and o bucketed on orderkey (deployment layout /
    # bench warm cache) the fact join is co-partitioned, and at bench SFs
    # every other side broadcasts, fusing the whole query into ONE codegen
    # pass over lineitem. The alternative (orders⋈customer first) shuffles
    # fewer bytes when nothing broadcasts, but it chains two DEPENDENT
    # broadcast builds per execution (build o, execute o⋈c, build oc) and
    # measured ~2x slower at sf0.1/sf1 (r5 A/B: 0.34 vs 0.15-0.22 s); at
    # cluster scale AQE re-plans join order from runtime stats anyway.
    # customer/orders project to their join-relevant columns so the
    # broadcast (or shuffle) side carries 2 ints per row, not the full row.
    # The three nation-chain dims are FLATTENED into one broadcast
    # (supplier⋈nation⋈region keyed on (suppkey, nationkey)) — star-schema
    # denormalization: the hot fused map stage probes 3 hash tables per
    # lineitem row instead of 5 (the fact-side work IS hash probes here;
    # q05 stage profile r5). The snr pre-join is supplier-grain, built once
    # per execution from three tiny inputs.
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem")
    snr = (
        load(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            load(spark, sf_dir, "region").select("r_regionkey"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(snr),
            (l.l_suppkey == F.col("s_suppkey"))
            & (c.c_nationkey == F.col("s_nationkey")),
        )
        .transform(
            lambda joined: grouped_exact_sum(
                joined, ["n_name"], "revenue",
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
            )
        )
    )


@register(
    "q_top_customers",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent,
               COUNT(*) AS n_orders
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY total_spent DESC, c_custkey
        LIMIT 25
    """,
    doc="Join + agg + deterministic top-k by spend.",
    tags=("join", "agg", "topk"),
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(exact_sum(F.col("o_totalprice")).alias("total_spent"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(25)
    )


@register(
    "q_distinct_agg",
    oracle="""
        SELECT n.n_name,
               COUNT(DISTINCT c.c_mktsegment) AS n_segments,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    doc="Distinct aggregate alongside plain aggregates (expand-based plan).",
    tags=("agg", "distinct"),
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count(F.lit(1)).alias("n_customers"),
            exact_sum(F.col("c_acctbal")).alias("total_balance"),
        )
    )


@register(
    "q_rollup_returns",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (grouping-set expansion).",
    tags=("agg", "rollup"),
)
def q_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "q_cube_orders",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over status x priority.",
    tags=("agg", "cube"),
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), exact_sum(F.col("o_totalprice")).alias("total_price")
    )


# ---------------------------------------------------------------------------
# Join variants
# ---------------------------------------------------------------------------
@register(
    "q_semi_join_big_spenders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    doc="Left-semi join (EXISTS): customers holding at least one 400k+ order.",
    tags=("join", "semi"),
)
def q_semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_anti_join_no_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    """,
    doc=(
        "Left-anti join (NOT EXISTS): customers with no 2001 orders. (The "
        "unfiltered variant is degenerate — every synthetic customer has "
        "orders — so the anti join is exercised against the filtered side.)"
    ),
    tags=("join", "anti"),
)
def q_anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_left_join_order_stats",
    oracle="""
        SELECT c.c_custkey,
               COUNT(o.o_orderkey)            AS n_orders,
               COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_spent
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    """,
    doc="Left outer join preserving order-less customers (NULL-aware agg).",
    tags=("join", "outer", "agg"),
)
def q_left_join_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(exact_sum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------
@register(
    "q_window_topn_orders",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= 3
    """,
    doc="Per-group top-N via ROW_NUMBER (single shuffle on the partition key).",
    tags=("window",),
)
def q_window_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        ).where(F.col("rn") <= 3)
    )


@register(
    "q_window_running_total",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running_spent
        FROM orders
    """,
    doc="Running total per customer (ROWS frame).",
    tags=("window",),
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate", F.sum("o_totalprice").over(w).alias("running_spent")
    )


@register(
    "q_window_lag_gap",
    oracle="""
        SELECT o_custkey, o_orderkey,
               DATE_DIFF('day',
                         LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS days_since_prev
        FROM orders
    """,
    doc="LAG: days between consecutive orders per customer (NULL for first).",
    tags=("window",),
)
def q_window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
    )


@register(
    "q_window_rank_price",
    oracle="""
        SELECT p_partkey, p_brand, p_retailprice,
               RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
               DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
        FROM part
    """,
    doc="RANK / DENSE_RANK within brand (ties share rank -> deterministic).",
    tags=("window",),
)
def q_window_rank_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------
@register(
    "q_setop_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics) of customer vs supplier nations.",
    tags=("setop",),
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_setop_except",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT: nations with customers but no suppliers.",
    tags=("setop",),
)
def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics, matching the SQL oracle


@register(
    "q_setop_union_tagged",
    oracle="""
        SELECT 'customer' AS side, c_nationkey AS nationkey, COUNT(*) AS n
        FROM customer GROUP BY c_nationkey
        UNION ALL
        SELECT 'supplier' AS side, s_nationkey AS nationkey, COUNT(*) AS n
        FROM supplier GROUP BY s_nationkey
    """,
    doc="UNION ALL (bag union — same semantics as the reference's DataStream.union, TimingExplorer.java:148-149).",
    tags=("setop",),
)
def q_setop_union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("customer").alias("side"), "nationkey", "n")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("supplier").alias("side"), "nationkey", "n")
    )
    return c.unionByName(s)


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------
@register(
    "q_string_functions",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name)                     AS up_name,
               LOWER(p_brand)                    AS low_brand,
               SUBSTR(p_name, 1, 8)              AS name_prefix,
               LENGTH(p_name)                    AS name_len,
               CONCAT(p_brand, ':', p_type)      AS brand_type,
               REPLACE(p_name, ' ', '_')         AS snake_name,
               CAST(p_name LIKE '%er%' AS INT)   AS has_er
        FROM part
    """,
    doc="String scalar functions (all JVM-side Catalyst expressions).",
    tags=("scalar", "string"),
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.col("p_name").like("%er%").cast("int").alias("has_er"),
    )


@register(
    "q_date_functions",
    oracle="""
        SELECT o_orderkey,
               YEAR(o_orderdate)                    AS order_year,
               MONTH(o_orderdate)                   AS order_month,
               DAY(o_orderdate)                     AS order_day,
               QUARTER(o_orderdate)                 AS order_quarter,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
               o_orderdate + INTERVAL 30 DAY        AS due_date
        FROM orders
    """,
    doc="Date/time scalar functions.",
    tags=("scalar", "date"),
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@register(
    "q_math_functions",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ABS(l_discount - 0.05)      AS disc_dev,
               SQRT(l_quantity)            AS qty_sqrt,
               LN(l_extendedprice)         AS price_ln,
               FLOOR(l_extendedprice)      AS price_floor,
               CEIL(l_quantity * 1.5)      AS qty_ceil,
               POWER(1.0 + l_tax, 2)       AS tax_sq
        FROM lineitem
    """,
    doc="Math scalar functions (whole-stage-codegen friendly).",
    tags=("scalar", "math"),
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.log(F.col("l_extendedprice")).alias("price_ln"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil(F.col("l_quantity") * 1.5).cast("double").alias("qty_ceil"),
        F.pow(F.lit(1.0) + F.col("l_tax"), 2).alias("tax_sq"),
    )


@register(
    "q_json_extract",
    oracle="""
        SELECT event_type,
               -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT (int128); Spark
               -- stays int64 — the driver's value-hash is type-sensitive.
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
    """,
    doc="JSON scalar extraction from events.props + aggregate.",
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Approximate aggregates (no exact oracle — HLL implementations differ)
# ---------------------------------------------------------------------------
@register(
    "q_approx_distinct_orders",
    oracle=None,  # approx_count_distinct values are implementation-specific
    doc=(
        "approx_count_distinct (HyperLogLog++) per order priority. No DuckDB "
        "oracle: HLL estimates are implementation-defined; accuracy vs exact "
        "COUNT(DISTINCT) is asserted in tests/test_relational_oracle.py "
        "(relative error < 5%)."
    ),
    tags=("agg", "approx"),
)
def q_approx_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_sorted_export",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
        ORDER BY l_shipdate, l_orderkey, l_linenumber
    """,
    doc=(
        "Global total-order sort (range-partitioned exchange + per-partition "
        "sort — no single-node sort): the 'write a sorted extract for "
        "downstream consumers' shape. The sort key prefix is the time "
        "column, so the output also serves as a time-ordered export."
    ),
    tags=("sort", "export"),
)
def q_sorted_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    )


@register(
    "q_null_safe_join",
    oracle="""
        WITH e AS (SELECT event_id, user_id,
                          CASE WHEN event_type = 'view' THEN NULL
                               ELSE event_type END AS etype
                   FROM events),
        d AS (SELECT DISTINCT CASE WHEN event_type = 'view' THEN NULL
                                   ELSE event_type END AS etype
              FROM events)
        SELECT e.event_id, e.etype, COUNT(*) AS n_matches
        FROM e JOIN d ON e.etype IS NOT DISTINCT FROM d.etype
        GROUP BY e.event_id, e.etype
    """,
    doc=(
        "NULL-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
        "match each other instead of vanishing — the semantics trap of "
        "normal equi-joins on nullable keys, expressed declaratively (still "
        "a hash join: the null-safe operator is a valid equi-key)."
    ),
    tags=("join", "null-semantics"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "view", None)
        .otherwise(F.col("event_type"))
        .alias("etype"),
    )
    d = e.select("etype").distinct().withColumnRenamed("etype", "d_etype")
    return (
        e.join(d, e.etype.eqNullSafe(F.col("d_etype")))
        .groupBy("event_id", "etype")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


@register(
    "q_window_range_frame",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY epoch(o_orderdate)
                   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS spent_30d
        FROM orders
    """,
    doc=(
        "RANGE window frame: per customer, rolling 30-day spend keyed on the "
        "order timestamp (value-based frame, not row-count based — rows with "
        "equal timestamps share a frame, unlike ROWS). Decimal-exact sum "
        "keeps the running values reproducible."
    ),
    tags=("window", "range-frame", "timeseries"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("spent_30d"),
    )


@register(
    "q_window_navigation",
    oracle="""
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_totalprice) OVER w AS first_order_price,
               LAST_VALUE(o_totalprice)  OVER w AS latest_order_price,
               NTH_VALUE(o_totalprice, 2) OVER w AS second_order_price,
               NTILE(4) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc=(
        "Window navigation functions: first/last/nth value over a running "
        "frame + NTILE quartiles — one shuffle on the partition key, "
        "deterministic via the (date, orderkey) tiebreak."
    ),
    tags=("window", "navigation"),
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tile = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_order_price"),
        F.last("o_totalprice").over(w).alias("latest_order_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_order_price"),
        F.ntile(4).over(w_tile).alias("order_quartile"),
    )


@register(
    "q_unpivot_metrics",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, value
        FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                     l_discount, l_tax
              FROM lineitem WHERE l_orderkey % 100 = 0)
        UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice,
                                      l_discount, l_tax))
    """,
    doc=(
        "UNPIVOT (wide->long melt): per-line metrics into (metric, value) "
        "rows — a pure projection+expand, no shuffle; the standard shape for "
        "feeding generic metric pipelines."
    ),
    tags=("reshape", "unpivot"),
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )


@register(
    "q_value_histogram",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1
    """,
    doc=(
        "Equi-width histogram (50k bins over order value): closed-form "
        "binning expression -> one hash aggregation; the distributed "
        "histogram primitive (no sort, no per-bin pass)."
    ),
    tags=("agg", "histogram"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("o_totalprice")).alias("total"),
    )


@register(
    "q_window_distribution",
    oracle="""
        SELECT o_orderkey, o_custkey,
               PERCENT_RANK() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice, o_orderkey) AS pr,
               CUME_DIST() OVER (PARTITION BY o_orderstatus
                                 ORDER BY o_totalprice, o_orderkey) AS cd
        FROM orders
    """,
    doc="Distribution window functions: percent_rank / cume_dist within status.",
    tags=("window", "distribution"),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "q_conditional_agg",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               COUNT(*) FILTER (WHERE o_totalprice > 200000)        AS n_large,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                    FILTER (WHERE YEAR(o_orderdate) = 2000) AS DOUBLE) AS total_2000,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc=(
        "Conditional aggregates (FILTER clause semantics) — several filtered "
        "measures in ONE pass over the fact table instead of N filtered "
        "scans; expressed as when()-guarded aggregates in the DataFrame API."
    ),
    tags=("agg", "conditional"),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_large"),
        F.sum(
            F.when(F.year("o_orderdate") == 2000, F.col("o_totalprice")).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("total_2000"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_regexp_extract",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_name, '^(\\w+)\\s+(\\w+)$', 1) AS adjective,
               regexp_extract(p_name, '^(\\w+)\\s+(\\w+)$', 2) AS noun,
               regexp_matches(p_name, 'w(i|o)') AS has_wi_wo
        FROM part
    """,
    doc="Regex group extraction + boolean match over part names (JVM regexp).",
    tags=("scalar", "regex"),
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    pat = r"^(\w+)\s+(\w+)$"
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", pat, 1).alias("adjective"),
        F.regexp_extract("p_name", pat, 2).alias("noun"),
        F.col("p_name").rlike("w(i|o)").alias("has_wi_wo"),
    )


@register(
    "q_full_outer_year_activity",
    oracle="""
        WITH y1998 AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev_1998
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
            GROUP BY o_custkey
        ),
        y2000 AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev_2000
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
            GROUP BY o_custkey
        )
        SELECT COALESCE(y1998.o_custkey, y2000.o_custkey) AS custkey,
               rev_1998, rev_2000
        FROM y1998 FULL OUTER JOIN y2000
          ON y1998.o_custkey = y2000.o_custkey
    """,
    doc=(
        "FULL OUTER join (the one join type the rest of the inventory lacked): "
        "per-customer revenue in 1998 vs 2000 — rows preserved from BOTH "
        "unmatched sides (customers active in only one year) plus the matched "
        "core. Both inputs pre-aggregate before the join, so the full-outer "
        "shuffle carries |active customers| rows, not orders; exact decimal "
        "sums keep the nullable revenue columns hash-stable."
    ),
    tags=("join", "full-outer", "agg"),
)
def q_full_outer_year_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")

    def year_rev(y: int, alias: str) -> DataFrame:
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .groupBy(F.col("o_custkey").alias(f"__ck_{alias}"))
            .agg(exact_sum(F.col("o_totalprice")).alias(f"rev_{alias}"))
        )

    a = year_rev(1998, "1998")
    b = year_rev(2000, "2000")
    return (
        a.join(b, a["__ck_1998"] == b["__ck_2000"], "full_outer")
        .select(
            F.coalesce(F.col("__ck_1998"), F.col("__ck_2000")).alias("custkey"),
            "rev_1998",
            "rev_2000",
        )
    )


@register(
    "q_setop_bag_semantics",
    oracle="""
        SELECT o_orderpriority FROM orders
        WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_orderpriority FROM orders
        WHERE o_orderstatus = 'F'
    """,
    doc=(
        "EXCEPT ALL (multiset difference, duplicates preserved): open-order "
        "priorities minus one occurrence per fulfilled-order priority. Bag "
        "set ops plan as an aggregated count-difference + generate — one "
        "shuffle on the row value, never a join of the raw inputs."
    ),
    tags=("setop", "bag"),
)
def q_setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    open_p = o.where(F.col("o_orderstatus") == "O").select("o_orderpriority")
    fulfilled_p = o.where(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return open_p.exceptAll(fulfilled_p)


@register(
    "q_setop_intersect_all",
    oracle="""
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
    """,
    doc=(
        "INTERSECT ALL (multiset intersection: min of per-side "
        "multiplicities) — the bag counterpart of q_setop_intersect."
    ),
    tags=("setop", "bag"),
)
def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_orderpriority")
    b = o.where(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return a.intersectAll(b)


_QTY_TIERS = [(0, 10, "XS"), (10, 20, "S"), (20, 35, "M"), (35, 51, "L")]


@register(
    "q_range_lookup_join",
    oracle="""
        SELECT t.tier,
               COUNT(*)        AS n_items,
               SUM(l_quantity) AS sum_qty
        FROM lineitem l
        JOIN (VALUES (0, 10, 'XS'), (10, 20, 'S'),
                     (20, 35, 'M'), (35, 51, 'L')) t(lo, hi, tier)
          ON l.l_quantity >= t.lo AND l.l_quantity < t.hi
        GROUP BY t.tier
    """,
    doc=(
        "Range-lookup join (a band/theta join — one of the operators Spark "
        "has no native keyword for): each fact row matched to the dimension "
        "interval [lo, hi) containing its value. The dimension is tiny at "
        "any scale, so the non-equi condition executes as a "
        "BroadcastNestedLoopJoin — fact rows never shuffle, each scans the "
        "handful of broadcast ranges; with a large range dimension the "
        "scale path is the neighbor-bucket equi-join (see "
        "operators/joins.py::interval_pairs). Quantity is integer-valued, "
        "so sums are exact."
    ),
    tags=("join", "range", "broadcast"),
)
def q_range_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    tiers = spark.createDataFrame(_QTY_TIERS, ["lo", "hi", "tier"])
    return (
        li.join(
            F.broadcast(tiers),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


@register(
    "q_revenue_share",
    oracle="""
        WITH nat AS (
            SELECT r.r_name AS region, n.n_name AS nation,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                        * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
            FROM customer c
            JOIN orders o   ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, n.n_name
        ),
        reg AS (
            SELECT region, CAST(SUM(CAST(ROUND(revenue * 10000) AS BIGINT))
                       AS DOUBLE) / 10000.0 AS region_revenue
            FROM nat GROUP BY region
        )
        SELECT nat.region, nat.nation, nat.revenue,
               nat.revenue / reg.region_revenue AS share
        FROM nat JOIN reg ON nat.region = reg.region
    """,
    doc=(
        "Ratio-to-report: each nation's share of its region's revenue. "
        "Shares are NOT computed with a floating window SUM (whose "
        "accumulation order differs between engines and partitionings) — "
        "both levels are exact fixed-point unit sums, re-aggregated "
        "nation→region (the nation totals are exact 4dp rationals, so the "
        "re-rounding is lossless), and the share is one double division of "
        "two exact values: bit-reproducible at any cluster size. The "
        "region totals table is 5 rows — broadcast back, map-side."
    ),
    tags=("agg", "window-alternative", "ratio"),
)
def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    nat = grouped_exact_sum(
        joined.withColumnRenamed("r_name", "region").withColumnRenamed("n_name", "nation"),
        ["region", "nation"],
        "revenue",
        F.col("l_extendedprice") * (1 - F.col("l_discount")),
    )
    reg = grouped_exact_sum(
        nat, ["region"], "region_revenue", F.col("revenue")
    )
    return (
        nat.join(F.broadcast(reg), "region")
        .select(
            "region", "nation", "revenue",
            (F.col("revenue") / F.col("region_revenue")).alias("share"),
        )
    )


@register(
    "q_topk_with_ties",
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_totalprice, rk
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   RANK() OVER (PARTITION BY o_orderpriority
                                ORDER BY ROUND(o_totalprice / 1000) DESC) AS rk
            FROM orders
        )
        WHERE rk <= 3
    """,
    doc=(
        "Top-k WITH TIES per group (RANK, not row_number): every order in "
        "the top-3 price bands of its priority class survives, however "
        "many tie — the SQL:2008 FETCH ... WITH TIES semantics. Contrast "
        "q_window_topn_orders (row_number = arbitrary-but-deterministic "
        "cut). Same WindowGroupLimit pushdown applies: rank <= k keeps "
        "bounded per-partition state at any scale. Banded prices (rounded "
        "to 1k) force real tie groups in the fixture data."
    ),
    tags=("window", "topk", "ties"),
)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc(F.round(F.col("o_totalprice") / 1000))
    )
    return (
        o.select(
            "o_orderpriority", "o_orderkey", "o_totalprice",
            F.rank().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "q_rfm_segmentation",
    oracle="""
        WITH anchor AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
        rfm AS (
            SELECT o_custkey AS custkey,
                   DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE),
                             CAST((SELECT max_d FROM anchor) AS DATE)) AS recency_days,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT))
                        AS DOUBLE) / 10000.0 AS monetary
            FROM orders GROUP BY o_custkey
        )
        SELECT CASE WHEN recency_days <= 180 THEN 'active'
                    WHEN recency_days <= 540 THEN 'cooling'
                    ELSE 'dormant' END AS recency_band,
               CASE WHEN frequency >= 20 THEN 'frequent'
                    WHEN frequency >= 10 THEN 'regular'
                    ELSE 'occasional' END AS frequency_band,
               CASE WHEN monetary >= 3000000 THEN 'high'
                    WHEN monetary >= 1000000 THEN 'mid'
                    ELSE 'low' END AS monetary_band,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(ROUND(monetary * 10000) AS BIGINT)) AS DOUBLE)
                    / 10000.0 AS band_revenue
        FROM rfm
        GROUP BY 1, 2, 3
    """,
    doc=(
        "RFM (recency / frequency / monetary) customer segmentation — the "
        "classic warehouse workload: one aggregation to per-customer RFM "
        "facts (recency anchored to the corpus max date — a 1-row scalar "
        "subquery, broadcast), fixed banding thresholds (deterministic at "
        "any scale, unlike global-quantile bands), then the segment "
        "rollup. Two shuffles total (custkey, then the 27-cell segment "
        "grid); money stays on exact fixed-point unit sums end to end — "
        "band_revenue re-rounds exact 4dp rationals, so the nested "
        "unit-sum is lossless."
    ),
    tags=("agg", "segmentation", "scalar-subquery"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("max_d"))
    rfm = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.max("max_d"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            (F.sum(units(F.col("o_totalprice"), 10000)).cast("double") / F.lit(10000.0)).alias("monetary"),
        )
    )
    rband = (
        F.when(F.col("recency_days") <= 180, "active")
        .when(F.col("recency_days") <= 540, "cooling")
        .otherwise("dormant")
    )
    fband = (
        F.when(F.col("frequency") >= 20, "frequent")
        .when(F.col("frequency") >= 10, "regular")
        .otherwise("occasional")
    )
    mband = (
        F.when(F.col("monetary") >= 3000000, "high")
        .when(F.col("monetary") >= 1000000, "mid")
        .otherwise("low")
    )
    return (
        rfm.groupBy(
            rband.alias("recency_band"),
            fband.alias("frequency_band"),
            mband.alias("monetary_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(units(F.col("monetary"), 10000)).cast("double") / F.lit(10000.0)).alias("band_revenue"),
        )
    )


@register(
    "q_pareto_revenue",
    oracle="""
        WITH spend AS (
            SELECT o_custkey AS custkey,
                   CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT))
                        AS BIGINT) AS units
            FROM orders GROUP BY o_custkey
        )
        SELECT custkey,
               CAST(units AS DOUBLE) / 10000.0 AS spend,
               CAST(SUM(units) OVER (ORDER BY -units, custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS DOUBLE)
                   / CAST((SELECT SUM(units) FROM spend) AS DOUBLE)
                   AS cum_share
        FROM spend
    """,
    doc=(
        "Pareto / ABC revenue-concentration curve: customers ranked by "
        "spend (descending, id tie-break), each carrying the cumulative "
        "share of total revenue — 'which fraction of customers produce "
        "80%% of revenue'. The cumulative sum runs over exact integer "
        "units via the DISTRIBUTED two-phase prefix scan "
        "(operators/prefix.py::running_total — range partition on the "
        "sort key, local scans, broadcast offsets), never a single-task "
        "global window; the share division is exact-int/exact-int, so "
        "the curve is bit-identical at any cluster size."
    ),
    tags=("agg", "pareto", "prefix-scan"),
)
def q_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import running_total

    o = load(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(units(F.col("o_totalprice"), 10000)).alias("units_")
    )
    # ascending (-units, custkey) == descending spend with id tie-break
    staged = spend.select("custkey", "units_", (-F.col("units_")).alias("neg"))
    # grand total rides the scan's own offsets table (total_alias) — it was
    # a second aggregate over spend + crossJoin before (r12, guide §2.4);
    # exact integer units, so the share values are unchanged
    run = running_total(
        staged, ["neg", "custkey"], "units_", alias="cum_units", total_alias="t"
    )
    return (
        run.select(
            "custkey",
            (F.col("units_").cast("double") / F.lit(10000.0)).alias("spend"),
            (F.col("cum_units").cast("double") / F.col("t").cast("double")).alias("cum_share"),
        )
    )


@register(
    "q_key_skew_report",
    oracle="""
        WITH b AS (
            SELECT user_id % 32 AS bucket, COUNT(*) AS n
            FROM events GROUP BY user_id % 32
        ),
        s AS (
            SELECT bucket, n,
                   MAX(n) OVER () AS max_n,
                   SUM(n) OVER () AS tot,
                   COUNT(*) OVER () AS nb
            FROM b
        )
        SELECT bucket, n,
               CAST(n AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(tot AS DOUBLE)
                   AS load_factor,
               CAST(max_n AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(tot AS DOUBLE)
                   AS skew_factor
        FROM s
    """,
    doc=(
        "Partition-skew report for a prospective shuffle key: rows per "
        "bucket (user_id mod 32 — a deterministic stand-in for the hash "
        "partitioner so both engines agree), each bucket's load factor "
        "(n/mean) and the global skew factor (max/mean) — the diagnostic "
        "an engineer reads before choosing salting (operators/skew.py) or "
        "AQE skew-join handling: skew_factor ≈ 1 means the key spreads "
        "evenly, >> 1 means the hottest task dominates the stage. One hash "
        "aggregation; the dashboard windows run on the 32-row bucket grain."
    ),
    tags=("diagnostics", "skew", "layout"),
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    b = e.groupBy((F.col("user_id") % 32).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy()
    s = b.select(
        "bucket",
        "n",
        F.max("n").over(w).alias("max_n"),
        F.sum("n").over(w).alias("tot"),
        F.count(F.lit(1)).over(w).alias("nb"),
    )
    nb_d = F.col("nb").cast("double")
    tot_d = F.col("tot").cast("double")
    return s.select(
        "bucket",
        "n",
        (F.col("n").cast("double") * nb_d / tot_d).alias("load_factor"),
        (F.col("max_n").cast("double") * nb_d / tot_d).alias("skew_factor"),
    )
