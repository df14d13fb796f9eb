"""TPC-H-derived query suite adapted to the trimmed test schema.

The reference has no relational surface at all (SURVEY.md §2.2 — no joins,
no SQL, checked absent), so this suite defines the engine's deep relational
coverage: correlated subqueries, EXISTS/NOT EXISTS, IN-subqueries, HAVING
against scalar subqueries, ratio aggregates, OR-of-ANDs join predicates, and
two-level aggregations — the TPC-H shapes expressible without partsupp /
shipmode / commitdate (absent from the driver's synthetic schema).

Scale design notes (100 TB):
 - nation/region/supplier are broadcast everywhere (bounded size at any SF).
 - part⋈lineitem stays a shuffle join (part grows with SF; AQE may still
   convert it after filters shrink the build side — exactly what we want).
 - Correlated scalar subqueries (q02/q17) are decorrelated by hand into
   window functions / pre-aggregated joins — the same rewrite Catalyst's
   RewriteCorrelatedScalarSubquery does, but explicit so the shuffle key is
   visible and shared (partkey/brand) with the main join.
 - Single-value subqueries (q11/q15/q22 thresholds) become 1-row broadcast
   cross joins — no driver collect, no second pass over the fact table
   beyond the one aggregation that computes the scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import exact_avg, exact_sum
from ..sources.tables import load
from .registry import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "q02_cheapest_part_per_brand",
    oracle="""
        SELECT p_brand, p_partkey, p_name, p_retailprice
        FROM part p
        WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                               WHERE p2.p_brand = p.p_brand)
    """,
    doc=(
        "TPC-H Q2 shape (correlated MIN subquery) without partsupp: parts at "
        "their brand's minimum retail price. Decorrelated to a window MIN "
        "over brand — one shuffle, no self-join."
    ),
    tags=("subquery", "window"),
)
def q02_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("__min_price", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("__min_price"))
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


@register(
    "q04_late_shipment_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: correlated EXISTS (any line shipped >90 days after "
        "order) as a left-semi join with an equi key + range residual."
    ),
    tags=("join", "semi", "subquery"),
)
def q04_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == l.l_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q06_forecast_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.04 AND 0.06
          AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6: pure filtered scan + global sum. The whole WHERE pushes "
        "into the parquet scan (PushedFilters) — the pushdown showcase."
    ),
    tags=("scan", "filter", "agg"),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (F.col("l_discount").between(0.04, 0.06))
            & (F.col("l_quantity") < 24)
        ).agg(exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q07_nation_volume",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   YEAR(l.l_shipdate) AS l_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey  = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey  = o.o_custkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                   AND TIMESTAMP '1997-12-31 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7: bidirectional nation-pair volume by ship year. supplier + "
        "both nation sides broadcast; only the lineitem⋈orders⋈customer "
        "chain shuffles."
    ),
    tags=("join", "broadcast", "agg"),
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(_ts("1996-01-01 00:00:00"), _ts("1997-12-31 00:00:00"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q08_market_share",
    oracle="""
        SELECT o_year,
               CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                             AS DECIMAL(18,4))) AS DOUBLE)
               / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
        FROM (
            SELECT YEAR(o.o_orderdate) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n2.n_name AS nation
            FROM part p
            JOIN lineitem l ON p.p_partkey  = l.l_partkey
            JOIN supplier s ON s.s_suppkey  = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey  = o.o_custkey
            JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
            JOIN region r   ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
        ) all_nations
        GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8: one nation's market share inside a region — conditional "
        "ratio aggregate over a 7-way join (dims broadcast)."
    ),
    tags=("join", "agg", "ratio"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")))
    r = F.broadcast(load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                exact_sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / exact_sum(vol)
            ).alias("mkt_share")
        )
    )


@register(
    "q09_product_profit",
    oracle="""
        SELECT nation, o_year,
               CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS amount
            FROM part p
            JOIN lineitem l ON p.p_partkey  = l.l_partkey
            JOIN supplier s ON s.s_suppkey  = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            WHERE p.p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
    """,
    doc=(
        "TPC-H Q9 shape: LIKE-filtered part joined through lineitem/orders, "
        "profit rolled up by supplier nation x order year."
    ),
    tags=("join", "agg", "like"),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey  = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10: lost-revenue ranking of customers who returned items (top 20).",
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q11_top_revenue_suppliers",
    oracle="""
        WITH sv AS (
            SELECT l_suppkey AS suppkey,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE) AS value
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT suppkey, value FROM sv
        WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                              * 0.011 FROM sv)
    """,
    doc=(
        "TPC-H Q11 shape: HAVING against a scalar subquery (suppliers above "
        "1.1% of global revenue). The global total is re-derived from the "
        "per-supplier aggregate (sum of sums) — one pass over lineitem, the "
        "1-row threshold broadcast back."
    ),
    tags=("agg", "having", "subquery"),
)
def q11_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    per_supp = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
    )
    # Re-aggregating the (small) per-supplier result avoids a second lineitem
    # scan; the sum-of-sums equals the global sum (same additions, same order
    # sensitivity is absorbed by the 9-sig-digit canonicalization).
    threshold = per_supp.agg((exact_sum(F.col("value")) * F.lit(0.011)).alias("__thr"))
    return (
        per_supp.crossJoin(F.broadcast(threshold))
        .where(F.col("value") > F.col("__thr"))
        .select("suppkey", "value")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13: two-level aggregation — orders per customer, then the "
        "distribution (histogram) of those counts. Second agg input is "
        "|customers| rows, so the second shuffle is negligible at any scale."
    ),
    tags=("join", "outer", "agg"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
        SELECT 100.0 *
               CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                        AS DECIMAL(18,4))) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14: promo revenue percentage — conditional ratio over one month.",
    tags=("join", "agg", "ratio"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * exact_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / exact_sum(rev)
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc=(
        "TPC-H Q15: supplier(s) with the quarter's max revenue. The MAX "
        "scalar comes from the already-aggregated revenue view (tiny), "
        "broadcast back as a 1-row cross join."
    ),
    tags=("agg", "subquery", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_part_supplier_variety",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l.l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc=(
        "TPC-H Q16 shape: supplier variety per part spec, excluding "
        "suppliers via NOT IN (→ broadcast left-anti join on the tiny "
        "negative-balance supplier list)."
    ),
    tags=("join", "anti", "distinct", "agg"),
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    l = load(spark, sf_dir, "lineitem")
    bad = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)
    """,
    doc=(
        "TPC-H Q17: correlated AVG subquery (lines far below their part's "
        "average quantity). Decorrelated into a per-part pre-aggregate "
        "joined back on partkey — the filtered part side keeps the join "
        "selective; no per-row subquery execution."
    ),
    tags=("join", "subquery", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select("p_partkey")
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((exact_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               SUM(l.l_quantity) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey  = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                               GROUP BY l_orderkey HAVING SUM(l_quantity) > 170)
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    doc=(
        "TPC-H Q18: large-volume orders via IN over a HAVING aggregate — the "
        "qualifying-orderkey set becomes a left-semi join (it is small after "
        "HAVING, so AQE can broadcast it)."
    ),
    tags=("join", "semi", "having", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 170)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(big, o.o_orderkey == big.big_orderkey, "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_special_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc=(
        "TPC-H Q19: OR-of-ANDs predicate spanning both join sides. Expressed "
        "as an equi join + residual filter so the hash join survives; the "
        "per-side conjuncts (brand/size on part) are pushed below the join "
        "by Catalyst's OR-factoring."
    ),
    tags=("join", "filter"),
)
def q19_special_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q22_idle_customers",
    oracle="""
        SELECT RIGHT(c.c_name, 2) AS cust_group,
               COUNT(*)           AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                                    / COUNT(*) FROM customer
                             WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
        GROUP BY 1
    """,
    doc=(
        "TPC-H Q22 shape: above-average-balance customers with no recent "
        "orders — 1-row AVG broadcast + left-anti join against the filtered "
        "orders, grouped by a name-suffix bucket. (Plain 'no orders at all' "
        "is degenerate on the synthetic data: every customer has orders.)"
    ),
    tags=("join", "anti", "subquery", "agg"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    recent = o.where(F.col("o_orderdate") >= _ts("2000-07-01 00:00:00"))
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(exact_avg(F.col("c_acctbal")).alias("__avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.expr("RIGHT(c_name, 2)").alias("cust_group"))
        .agg(F.count(F.lit(1)).alias("numcust"), exact_sum(F.col("c_acctbal")).alias("totacctbal"))
    )


@register(
    "q12_ship_speed_priority",
    oracle="""
        SELECT ship_bucket,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM (
            SELECT o.o_orderpriority,
                   CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                        THEN 'FAST'
                        WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
                        THEN 'MEDIUM'
                        ELSE 'SLOW' END AS ship_bucket
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        GROUP BY ship_bucket
    """,
    doc=(
        "TPC-H Q12 shape (priority counts per ship mode) with l_shipmode "
        "absent from the synthetic schema: the mode becomes a derived "
        "ship-speed bucket (days from order to ship). Same skeleton — "
        "lineitem⋈orders join, CASE-classified conditional counts, small "
        "group-by. COUNT(CASE...) not SUM(CASE...): DuckDB SUM(BIGINT) "
        "widens to HUGEINT and the driver's value-hash is type-sensitive."
    ),
    tags=("join", "agg", "conditional"),
)
def q12_ship_speed_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = (
        F.when(F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "FAST")
        .when(F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "MEDIUM")
        .otherwise("SLOW")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(bucket.alias("ship_bucket"), high.alias("__high"))
        .groupBy("ship_bucket")
        .agg(
            F.count(F.when(F.col("__high"), 1)).alias("high_line_count"),
            F.count(F.when(~F.col("__high"), 1)).alias("low_line_count"),
        )
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            WHERE l.l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'large%')
              AND l.l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING 2 * SUM(CAST(l.l_quantity AS DECIMAL(18,4))) >
                   (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,4)))
                    FROM lineitem l2
                    WHERE l2.l_partkey = l.l_partkey
                      AND l2.l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
        )
        ORDER BY s.s_suppkey
    """,
    doc=(
        "TPC-H Q20 shape (nested IN subqueries + correlated availability "
        "threshold) with partsupp absent: a supplier qualifies if it shipped "
        ">50% of some 'large%' part's total 2001+ quantity. The correlated "
        "scalar subquery decorrelates into a window SUM over partkey on the "
        "(suppkey, partkey) aggregate — one shuffle keyed by partkey, then a "
        "left-semi join into supplier. The threshold compares 2*qty > total "
        "in DECIMAL on both engines (0.5*total would compare in binary "
        "double on the Spark side and can flip exact-boundary shares)."
    ),
    tags=("subquery", "semi", "window", "agg"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    large_parts = p.where(F.col("p_name").like("large%")).select("p_partkey")
    shipped = (
        l.where(F.col("l_shipdate") >= _ts("2001-01-01 00:00:00"))
        .join(F.broadcast(large_parts), l.l_partkey == large_parts.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("__qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("__part_total", F.sum("__qty").over(w))
        .where(F.col("__qty") * 2 > F.col("__part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o    ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s.s_name
    """,
    doc=(
        "TPC-H Q21 shape (suppliers who kept orders waiting) with "
        "receiptdate/commitdate absent: 'late' = shipped >60 days after the "
        "order date. EXISTS/NOT EXISTS decorrelate into per-order distinct "
        "supplier counts — n_suppliers ≥ 2 and exactly one late supplier — "
        "computed in ONE aggregation keyed by orderkey (no three-way "
        "self-join of lineitem; at 100 TB the order-level rollup is the "
        "co-partitioned, map-combinable plan)."
    ),
    tags=("join", "subquery", "anti", "agg"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lines = (
        l.join(o.where(F.col("o_orderstatus") == "F"), l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
                "__late"
            ),
        )
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(F.when(F.col("__late"), F.col("l_suppkey"))).alias("__n_late_supp"),
    )
    waiting = (
        lines.where(F.col("__late"))
        .join(per_order, "l_orderkey")
        .where((F.col("__n_supp") >= 2) & (F.col("__n_late_supp") == 1))
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
