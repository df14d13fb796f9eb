"""Advanced operator inventory: temporal joins, statistical aggregates,
pivot, grouping sets, string aggregation, array functions, kNN classify.

These extend the declared surface beyond both the reference (which has none
of this, SURVEY §2.2) and the basic relational set — each still a Catalyst
builtin composition with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum
from ..operators.joins import asof_join, interval_pairs
from ..sources.tables import load
from .registry import register


@register(
    "q_asof_join_last_click",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               c.ts AS asof_ts, c.event_id AS asof_event_id
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    doc=(
        "As-of join (an operator Spark lacks natively): for each error event, "
        "the user's most recent prior click. Implemented as union + one "
        "carry-forward window pass per key (operators/joins.py) — single "
        "shuffle, no pair blow-up; oracle = DuckDB's native ASOF JOIN."
    ),
    headline=True,
    tags=("join", "asof", "temporal"),
)
def q_asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    return asof_join(errors, clicks, on="user_id", right_cols=("event_id",))


@register(
    "q_interval_join_close_events",
    oracle="""
        SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
               ABS(epoch_us(a.ts::TIMESTAMP) - epoch_us(b.ts::TIMESTAMP)) / 1000000.0
                   AS gap_seconds
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND ABS(epoch_us(a.ts::TIMESTAMP) - epoch_us(b.ts::TIMESTAMP)) <= 300 * 1000000
    """,
    doc=(
        "Interval (range) join: same-user event pairs within 5 minutes, via "
        "neighbor-bucket equi-join + exact filter — the linear-shuffle range "
        "join pattern (no per-key cross join)."
    ),
    tags=("join", "range", "temporal"),
)
def q_interval_join_close_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return interval_pairs(e, key="user_id", max_gap_seconds=300)


@register(
    "q_percentiles",
    oracle="""
        SELECT event_type,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.50) AS p50,
               quantile_cont(value, 0.90) AS p90
        FROM events
        GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == DuckDB quantile_cont).",
    tags=("agg", "stats"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.50).alias("p50"),
        F.percentile("value", 0.90).alias("p90"),
    )


@register(
    "q_stats_aggregates",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   COUNT(*)                          AS n,
                   SUM(l_quantity)                   AS sx,
                   SUM(l_quantity * l_quantity)      AS sxx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                          * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                          * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               SQRT((sxx - sx * sx / n) / (n - 1))        AS qty_stddev,
               (sxx - sx * sx / n) / (n - 1)              AS qty_var,
               (n * sxy - sx * sy)
                   / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
                                                          AS qty_price_corr,
               (sxy - sx * sy / n) / (n - 1)              AS qty_price_covar
        FROM m
    """,
    doc=(
        "Statistical aggregates (stddev/variance/correlation/covariance) via "
        "exact-moment formulas: integer/decimal sums are order-independent, "
        "so results are bit-reproducible under any partitioning — unlike the "
        "builtin Welford-style aggregates whose merge order varies run to "
        "run on a cluster. Same sample semantics as stddev_samp/corr/covar_samp."
    ),
    tags=("agg", "stats"),
)
def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    yd = F.col("l_extendedprice").cast("decimal(18,4)")
    xd = F.col("l_quantity").cast("decimal(18,4)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),              # integer-valued -> exact in double
        F.sum(x * x).alias("sxx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("qty_stddev"),
        ((sxx - sx * sx / n) / (n - 1)).alias("qty_var"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("qty_price_corr"),
        ((sxy - sx * sy / n) / (n - 1)).alias("qty_price_covar"),
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIASES = ["urgent", "high", "medium", "not_specified", "low"]


@register(
    "q_pivot_order_priority",
    oracle="""
        SELECT o_orderstatus,
               -- COUNT(...) not SUM(CASE...): DuckDB SUM(BIGINT) widens to
               -- HUGEINT while Spark pivot-count is int64; the driver's
               -- value-hash is type-sensitive.
               COUNT(CASE WHEN o_orderpriority = '1-URGENT'        THEN 1 END) AS urgent,
               COUNT(CASE WHEN o_orderpriority = '2-HIGH'          THEN 1 END) AS high,
               COUNT(CASE WHEN o_orderpriority = '3-MEDIUM'        THEN 1 END) AS medium,
               COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS not_specified,
               COUNT(CASE WHEN o_orderpriority = '5-LOW'           THEN 1 END) AS low
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc=(
        "Pivot (wide aggregation): order counts by status x priority. The "
        "explicit values list keeps the pivot single-pass (no extra distinct "
        "scan) — required at scale anyway."
    ),
    tags=("agg", "pivot"),
)
def q_pivot_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderstatus").pivot("o_orderpriority", _PRIORITIES).count().na.fill(0)
    )
    renamed = pivoted.select(
        "o_orderstatus",
        *[F.col(f"`{v}`").alias(a) for v, a in zip(_PRIORITIES, _PRIORITY_ALIASES)],
    )
    return renamed


@register(
    "q_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="GROUPING SETS via the engine's SQL surface (spark.sql over temp views).",
    tags=("agg", "grouping-sets", "sql-api"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_string_agg_segments",
    oracle="""
        SELECT c_nationkey AS nationkey,
               string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
        FROM customer
        GROUP BY c_nationkey
    """,
    doc="Ordered string aggregation (sort_array(collect_set) -> concat_ws).",
    tags=("agg", "string"),
)
def q_string_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias("segments")
    )


@register(
    "q_minmax_by",
    oracle="""
        SELECT c_nationkey AS nationkey,
               arg_max(c_name, c_custkey) AS newest_customer,
               arg_min(c_name, c_custkey) AS oldest_customer,
               MAX(c_acctbal)             AS max_balance
        FROM customer
        GROUP BY c_nationkey
    """,
    doc="max_by/min_by (arg_max/arg_min) keyed on the unique custkey (deterministic).",
    tags=("agg",),
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.max_by("c_name", "c_custkey").alias("newest_customer"),
        F.min_by("c_name", "c_custkey").alias("oldest_customer"),
        F.max("c_acctbal").alias("max_balance"),
    )


@register(
    "q_array_functions",
    oracle="""
        SELECT vec_id,
               LEN(embedding)                          AS dim,
               embedding[1]::DOUBLE                    AS first_val,
               list_min(embedding)::DOUBLE             AS min_val,
               list_max(embedding)::DOUBLE             AS max_val,
               list_sum(embedding[1:8]::DOUBLE[])      AS head_sum
        FROM embeddings
    """,
    doc="Array/list scalar functions over the embedding column.",
    tags=("scalar", "array"),
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    head = F.slice(F.col("embedding").cast("array<double>"), 1, 8)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.aggregate(head, F.lit(0.0), lambda acc, x: acc + x).alias("head_sum"),
    )


@register(
    "q_knn_classify",
    oracle="""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT * FROM e WHERE vec_id % 10 = 0),
        t AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
        scored AS (
            SELECT q.vec_id AS query_id, t.label,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.v, t.v) /
                                (SQRT(list_dot_product(q.v, q.v)) * SQRT(list_dot_product(t.v, t.v)))
                                DESC, t.vec_id) AS rn
            FROM q JOIN t ON TRUE
        ),
        votes AS (
            SELECT query_id, label, COUNT(*) AS n
            FROM scored WHERE rn <= 5
            GROUP BY query_id, label
        )
        SELECT query_id, label AS predicted_label FROM (
            SELECT query_id, label,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY n DESC, label) AS r
            FROM votes)
        WHERE r = 1
    """,
    doc=(
        "kNN classification: majority label of the 5 nearest neighbors "
        "(train = 90% of vectors, queries = vec_id % 10 == 0), ties to the "
        "smaller label. Broadcast-queries brute-force scoring + two windowed "
        "reductions."
    ),
    tags=("similarity", "knn", "classify"),
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine_prenormed, norm as vnorm

    e = load(spark, sf_dir, "embeddings")
    # Norms attached per side (one fold per vector) so the brute-force
    # pair grain pays one dot fold, not three (r12, cosine_prenormed).
    q = e.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        vnorm(F.col("embedding")).alias("qn"),
    )
    t = e.where(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("tid"),
        F.col("label"),
        F.col("embedding").alias("tvec"),
        vnorm(F.col("embedding")).alias("tn"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("tid")
    )
    top5 = (
        t.join(F.broadcast(q), F.lit(True))
        .select(
            "query_id",
            "tid",
            "label",
            cosine_prenormed(
                F.col("qvec"), F.col("tvec"), F.col("qn"), F.col("tn")
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= 5)
    )
    votes = top5.groupBy("query_id", "label").agg(F.count(F.lit(1)).alias("n"))
    w_vote = Window.partitionBy("query_id").orderBy(F.desc("n"), F.asc("label"))
    return (
        votes.withColumn("r", F.row_number().over(w_vote))
        .where(F.col("r") == 1)
        .select("query_id", F.col("label").alias("predicted_label"))
    )


@register(
    "q_value_tiers",
    oracle="""
        SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS tier,
               COUNT(*)          AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1
    """,
    doc="CASE WHEN bucketing + aggregate.",
    tags=("scalar", "agg"),
)
def q_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return o.groupBy(tier.alias("tier")).agg(
        F.count(F.lit(1)).alias("n_orders"), exact_sum(F.col("o_totalprice")).alias("total")
    )


@register(
    "q_approx_percentile",
    oracle=None,  # sketch-based; accuracy vs exact asserted in pytest
    doc=(
        "approx_percentile (quantile sketch) of event values per type — the "
        "single-pass, mergeable alternative to exact percentiles at scale. "
        "Rows-only driver check; tests assert |approx - exact| within the "
        "sketch's accuracy bound."
    ),
    tags=("agg", "approx", "stats"),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("p99_approx"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_salted_hot_key_agg",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS sum_value,
               CAST(MAX(value) AS DOUBLE) AS max_value,
               COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "Skew-resilient aggregation as a user query: events has only 5 "
        "event_type values (extreme key skew — every key is hot), so the "
        "rollup runs as a two-phase salted aggregation "
        "(operators/skew.py::salted_agg): phase 1 groups by (key, salt in "
        "[0,8)) spreading each hot key over 8 reducers, phase 2 merges the "
        "40-row partial set. Result is EXACTLY GROUP BY (oracle-checked): "
        "sums are fixed-point decimal (order-independent), max/count are "
        "merge-invariant. At 100 TB this bounds per-reducer state for hot "
        "keys no matter how biased the key distribution gets."
    ),
    tags=("agg", "skew", "scale"),
)
def q_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import FINE
    from ..operators.skew import salted_agg

    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast(FINE).alias("v"),
        F.col("value").alias("value"),
        "event_id",
    )
    out = salted_agg(e, ["event_type"], {"v": "sum", "value": "max", "event_id": "count"})
    return out.select(
        "event_type",
        F.col("sum_v").cast("double").alias("sum_value"),
        F.col("max_value").alias("max_value"),
        F.col("count_event_id").alias("n_events"),
    )


@register(
    "q_lateral_top_orders",
    oracle="""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc=(
        "LATERAL correlated subquery through the engine's SQL surface "
        "(Spark 4 lateral join support): top-2 orders per BUILDING-segment "
        "customer with a deterministic tie-break. Same result as the "
        "row_number window formulation (q_window_topn_orders) — registered "
        "to cover the lateral entry point end-users write."
    ),
    tags=("join", "lateral", "sql-api"),
)
def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "q_recursive_month_spine",
    oracle="""
        WITH RECURSIVE months(m) AS (
            SELECT DATE_TRUNC('MONTH', MIN(o_orderdate)) FROM orders
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM months
            WHERE m < (SELECT DATE_TRUNC('MONTH', MAX(o_orderdate)) FROM orders)
        )
        SELECT CAST(m AS DATE) AS month, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON DATE_TRUNC('MONTH', o_orderdate) = m
        GROUP BY m
    """,
    doc=(
        "Complete month spine from min to max order date — empty months "
        "included (the oracle keeps the standard-SQL WITH RECURSIVE "
        "formulation; DuckDB's recursion is an in-process loop and costs "
        "nothing there). The Spark plan materializes the spine with ONE "
        "bounds aggregate + sequence() instead of executing the recursion: "
        "Spark 4's UnionLoop runs a full distributed job PER ITERATION and "
        "re-evaluates the MAX(o_orderdate) scalar subquery inside every "
        "step (measured 10.6 s for an ~81-month spine at sf0.01, ~130 ms "
        "of fixed per-step cost for one output row each — r12 optimization "
        "guide §2.4: remove per-iteration jobs whose closed form is one "
        "expression). explode_outer keeps the recursive anchor's semantics "
        "on an empty orders table (a single NULL month). Equivalence "
        "proven against the unchanged recursive oracle at sf0.001/0.01/0.1 "
        "(driver_sim hash-MATCH) and pinned against a live WITH RECURSIVE "
        "run in tests/test_round3_ops.py."
    ),
    tags=("sql-api", "recursive", "gapfill"),
)
def q_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        WITH bounds AS (
            SELECT DATE_TRUNC('MONTH', MIN(o_orderdate)) AS lo,
                   DATE_TRUNC('MONTH', MAX(o_orderdate)) AS hi
            FROM orders
        ),
        months AS (
            SELECT explode_outer(sequence(lo, hi, INTERVAL '1' MONTH)) AS m
            FROM bounds
        )
        SELECT CAST(m AS DATE) AS month, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON DATE_TRUNC('MONTH', o_orderdate) = m
        GROUP BY m
        """
    )


@register(
    "q_zscore_outliers",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
                   CAST(SUM(CAST(value AS DECIMAL(19,4))
                          * CAST(value AS DECIMAL(19,4))) AS DOUBLE) AS svv
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               (e.value - m.sv / m.n)
                   / SQRT((m.svv - m.sv * m.sv / m.n) / (m.n - 1)) AS zscore
        FROM events e JOIN m ON e.event_type = m.event_type
        WHERE ABS((e.value - m.sv / m.n)
                   / SQRT((m.svv - m.sv * m.sv / m.n) / (m.n - 1))) > 2.5
    """,
    doc=(
        "Z-score outlier detection: per-key exact moments (decimal sums — "
        "order-independent, bit-reproducible under any partitioning), then "
        "each event scored against its group's mean/stddev via a BROADCAST "
        "join of the tiny moment table back onto the fact stream — the "
        "standard two-pass anomaly scan, one aggregation shuffle total; the "
        "score pass is map-side at any scale. Identical IEEE expression "
        "order on both engines makes the double z-scores hash-exact."
    ),
    tags=("stats", "outlier", "broadcast"),
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    vd = F.col("value").cast("decimal(18,4)")
    vq = F.col("value").cast("decimal(19,4)")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vd).cast("double").alias("sv"),
        F.sum(vq * vq).cast("double").alias("svv"),
    )
    n, sv, svv = F.col("n"), F.col("sv"), F.col("svv")
    z = (F.col("value") - sv / n) / F.sqrt((svv - sv * sv / n) / (n - 1))
    return (
        e.join(F.broadcast(m), "event_type")
        .where(F.abs(z) > 2.5)
        .select("event_id", "event_type", "value", z.alias("zscore"))
    )


@register(
    "q_stratified_sample_k",
    oracle="""
        SELECT source, doc_id, rk
        FROM (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY MD5(CAST(doc_id AS VARCHAR))) AS rk
            FROM documents
        )
        WHERE rk <= 50
    """,
    doc=(
        "Stratified fixed-k sampling: exactly k docs per stratum (source), "
        "chosen by ranking on a content-independent hash — deterministic "
        "across engines, replays, and cluster sizes (unlike rand()-based "
        "sampling), uniform because MD5 order is independent of any data "
        "attribute. One shuffle on the stratum key; at scale the rank "
        "computation is a per-partition top-k (window TopK pushdown keeps "
        "state bounded at k per stratum, no full sort). Complements "
        "q_deterministic_sample (rate-based hash sampling) with the "
        "fixed-quota-per-group shape training-data mixers need."
    ),
    tags=("sampling", "window", "corpus-prep"),
)
def q_stratified_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 50)
    )


@register(
    "q_equidepth_histogram",
    oracle="""
        WITH t AS (
            SELECT l_extendedprice AS v,
                   NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                                   l_linenumber) AS bucket
            FROM lineitem
        )
        SELECT bucket, MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n
        FROM t GROUP BY bucket
    """,
    doc=(
        "EXACT equi-depth (quantile) histogram: 10 buckets of equal row "
        "count with true boundaries — not approx_percentile. NTILE over a "
        "global order would plan as one task; instead the global row rank "
        "comes from the distributed two-phase scan "
        "(operators/prefix.py::global_rank) and NTILE's bucket assignment "
        "is applied as its closed form (first n%B buckets get one extra "
        "row), reproducing NTILE semantics bit-for-bit at any scale. "
        "Total order includes the row key as tiebreaker, so ties across "
        "bucket boundaries split deterministically on both engines."
    ),
    tags=("agg", "histogram", "prefix-scan"),
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_rank

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    # total row count rides the rank's own per-partition offsets table
    # (total_alias) — previously a SECOND full aggregate pass over the
    # ranked rows + a crossJoin attached it (r12, guide §2.4: one pass)
    ranked = global_rank(
        li, ["v", "l_orderkey", "l_linenumber"], alias="rk", total_alias="__n"
    )
    B = 10
    n, rk = F.col("__n"), F.col("rk")
    q, r = (n / B).cast("long"), n % B
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading buckets
    bucket = (
        F.when(rk <= big, ((rk - 1) / (q + 1)).cast("long") + 1)
        .otherwise(r + ((rk - big - 1) / q).cast("long") + 1)
        .cast("int")
    )
    return (
        ranked.select("v", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_kmin_distinct_sketch",
    oracle=None,  # sketch estimate — accuracy bound asserted in tests/test_sketches.py
    doc=(
        "k-min-statistic distinct-count sketch (KMV/theta family) built "
        "from 64 plain MIN aggregates over seeded uniform hashes "
        "(operators/sketches.py) — a novel sketch riding Spark's stock "
        "aggregation: map-side partial MINs, k doubles per group on the "
        "shuffle, and element-wise-min mergeability (any pre-aggregation "
        "layout gives the identical estimate). Estimates distinct "
        "customers per order priority; rows-only driver check, relative "
        "error vs exact COUNT(DISTINCT) asserted < 3/sqrt(k) in pytest."
    ),
    tags=("agg", "approx", "sketch"),
)
def q_kmin_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmin_distinct_estimate

    o = load(spark, sf_dir, "orders")
    return kmin_distinct_estimate(o, ["o_orderpriority"], "o_custkey", k=64)


@register(
    "q_weighted_sample",
    oracle="""
        WITH keyed AS (
            SELECT source, doc_id,
                   -- Efraimidis-Spirakis key: u^(1/w), u = md5-prefix
                   -- uniform in (0,1], w = n_chars (length-proportional).
                   POW(
                     (CAST(CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 13))
                                AS BIGINT) AS DOUBLE) + 1.0)
                       / 4503599627370497.0,
                     1.0 / n_chars) AS k
            FROM documents
        )
        SELECT source, doc_id, rk FROM (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY k DESC, doc_id) AS rk
            FROM keyed
        )
        WHERE rk <= 20
    """,
    doc=(
        "Weighted sampling without replacement (Efraimidis-Spirakis): each "
        "doc draws key u^(1/w) from a content-hash uniform u and weight w "
        "(n_chars — longer docs proportionally likelier), and the top-k "
        "keys per stratum are the sample. Deterministic across engines, "
        "replays and cluster sizes (hash-derived u, not rand()); one "
        "shuffle, WindowGroupLimit keeps per-stratum state at k. The "
        "training-data shape: sample proportional to quality/length score "
        "with an exactly reproducible draw. The uniform comes from a 52-bit md5 "
        "prefix — the hash both engines compute identically (DuckDB's "
        "hash() is not Spark's xxhash64)."
    ),
    tags=("sampling", "weighted", "corpus-prep"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # u from the first 13 hex digits (52 bits — exactly a double mantissa) of
    # md5: the one hash both engines spell identically. (DuckDB's hash() is
    # NOT Spark's xxhash64 — verified divergent.)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double") + 1.0
    ) / 4503599627370497.0
    key = F.pow(u, 1.0 / F.col("n_chars"))
    w = Window.partitionBy("source").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 20)
    )


@register(
    "q_asof_forward_next_purchase",
    oracle="""
        WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        nxt AS (
            SELECT c.event_id, c.user_id, c.ts, MIN(p.ts) AS asof_ts
            FROM c LEFT JOIN p
              ON c.user_id = p.user_id
             AND p.ts >= c.ts
             AND epoch_us(p.ts) - epoch_us(c.ts) <= 604800000000
            GROUP BY c.event_id, c.user_id, c.ts
        )
        SELECT event_id, user_id, ts, asof_ts,
               (epoch_us(asof_ts) - epoch_us(ts)) / 1000000.0 AS latency_s
        FROM nxt
    """,
    doc=(
        "FORWARD as-of join with tolerance (pandas merge_asof "
        "direction='forward'): for each click, the user's next purchase "
        "within 7 days — the time-to-conversion shape. Same union + keyed "
        "window implementation as the backward as-of (single shuffle, no "
        "pair blow-up); the oracle is the quadratic join+MIN formulation "
        "(slow but obviously correct)."
    ),
    tags=("join", "asof", "temporal", "forward"),
)
def q_asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = e.where(F.col("event_type") == "purchase").select("user_id", "ts")
    out = asof_join(
        clicks,
        buys,
        on="user_id",
        direction="forward",
        tolerance_us=7 * 86400 * 1_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "asof_ts",
        (
            (F.unix_micros("asof_ts") - F.unix_micros("ts")).cast("double") / F.lit(1_000_000.0)
        ).alias("latency_s"),
    )


@register(
    "q_weighted_median_price",
    oracle="""
        WITH g AS (
            SELECT l_returnflag AS flag,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pu,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS w
            FROM lineitem GROUP BY 1, 2
        ),
        cums AS (
            SELECT flag, pu, w,
                   SUM(w) OVER (PARTITION BY flag ORDER BY pu
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(w) OVER (PARTITION BY flag) AS big_w
            FROM g
        )
        SELECT flag AS l_returnflag,
               CAST(MIN(pu) AS DOUBLE) / 100.0 AS weighted_median_price,
               CAST(MAX(big_w) AS BIGINT) AS total_weight
        FROM cums
        WHERE 2 * cum >= big_w
        GROUP BY flag
    """,
    doc=(
        "Exact quantity-weighted median price per return flag — the order "
        "statistic where every row votes with its weight (plain median "
        "over-counts single-unit lines). Weights collapse onto the "
        "(flag, price) VALUE grain first — 2-dp prices in a bounded range "
        "cap the grain at ~1e7 rows at ANY fact cardinality — then one "
        "grain-sized cumulative window finds the lower weighted median as "
        "MIN(price : 2·cumw ≥ W). Exact integer cents/units throughout; "
        "the full-frame total rides the same per-flag partitioning as the "
        "cumsum (one shuffle after the grain). For value domains without a "
        "range bound, the drop-in is the distributed two-phase prefix scan "
        "(operators/prefix.py, as used by q_equidepth_histogram)."
    ),
    tags=("aggregation", "median", "weighted", "window"),
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    g = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.rint(F.col("l_extendedprice") * 100).cast("long").alias("pu"),
            F.rint(F.col("l_quantity")).cast("long").alias("wq"),
        )
        .groupBy("flag", "pu")
        .agg(F.sum("wq").alias("w"))
    )
    w_cum = (
        Window.partitionBy("flag").orderBy("pu").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("flag")
    cums = g.select(
        "flag",
        "pu",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_tot).alias("big_w"),
    )
    return (
        cums.where(2 * F.col("cum") >= F.col("big_w"))
        .groupBy("flag")
        .agg(
            (F.min("pu").cast("double") / F.lit(100.0)).alias("weighted_median_price"),
            F.max("big_w").alias("total_weight"),
        )
        .select(
            F.col("flag").alias("l_returnflag"), "weighted_median_price", "total_weight"
        )
    )
