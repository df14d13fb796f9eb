"""TSDB-style continuous analytics over the ``events`` series.

Round-3 extensions of the reference's Grafana query surface (SURVEY §2.1:
time-bucketed re-aggregation + fill(null) is all the reference's dashboards
can do — dashboard.json:295-331). These are the operators a real TSDB layers
on top of that surface, each expressed as declarative Spark and oracle-backed:

  q_m4_downsample        M4 width-preserving downsampling (Jugel et al.,
                         "M4: A Visualization-Oriented Time Series Data
                         Aggregation", VLDB 2014): per pixel-bucket emit
                         min/max/first/last — the 4 points that make a
                         line-chart render pixel-identical to the full series.
  q_time_weighted_avg    time-weighted average (the irregular-sampling-safe
                         mean): each observation weighted by its holding
                         interval, LOCF segments, day-end closed.
  q_gap_fill_interpolate linear interpolation across missing buckets
                         (InfluxQL fill(linear) / timescale interpolate()).
  q_mad_outliers         robust outlier counts via median absolute deviation
                         (modified z-score, Iglewicz-Hoaglin), using exact
                         element medians so both engines agree bit-for-bit.
  q_sensor_correlation   pairwise correlation matrix between the per-type
                         hourly series, via order-independent exact moments.

Scale notes: every query is one hash shuffle on its (series, bucket) grain
(map-side partial agg), except the interpolation spine window — the spine is
O(time-range/interval) rows, independent of fact cardinality, so its single
ordered window is driver-scale data by construction at any SF. The M4
window sort rides the same shuffle as its aggregation (partitionBy ==
groupBy keys). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import exact_avg
from ..sources.tables import load
from .registry import register

# 6-hour pixel buckets in microseconds (the "pixel width" of the downsample).
_M4_BUCKET_US = 6 * 3600 * 1_000_000

# Shared by q_m4_downsample (direct) and q_m4_rollup (merged from hourly
# partials — both must equal this ground truth).
_M4_ORACLE = f"""
        WITH pts AS (
            SELECT event_type, value, ts, event_id,
                   CAST(FLOOR(epoch_us(ts) / {_M4_BUCKET_US}) AS BIGINT) AS bkt,
                   ROW_NUMBER() OVER (PARTITION BY event_type,
                                          CAST(FLOOR(epoch_us(ts) / {_M4_BUCKET_US}) AS BIGINT)
                                      ORDER BY ts, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY event_type,
                                          CAST(FLOOR(epoch_us(ts) / {_M4_BUCKET_US}) AS BIGINT)
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        )
        SELECT event_type,
               make_timestamp(bkt * {_M4_BUCKET_US}) AS bucket,
               COUNT(*)                              AS n,
               MIN(value)                            AS v_min,
               MAX(value)                            AS v_max,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS v_first,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS v_last,
               MIN(ts)                               AS t_first,
               MAX(ts)                               AS t_last
        FROM pts
        GROUP BY event_type, bkt
    """


@register(
    "q_m4_downsample",
    oracle=_M4_ORACLE,
    doc=(
        "M4 downsampling (VLDB'14): per (series, pixel-bucket) keep "
        "min/max/first/last — error-free line-chart reduction from N points "
        "to 4×pixels. First/last are made deterministic with a (ts, event_id) "
        "total order (arg-min/max on ts alone ties on equal timestamps). One "
        "shuffle: the row_number windows sort within the same (type, bucket) "
        "hash partitioning the aggregation consumes."
    ),
    tags=("timeseries", "downsample", "m4", "window"),
)
def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    bkt = F.floor(F.unix_micros(F.col("ts")) / F.lit(_M4_BUCKET_US)).cast("bigint")
    pts = e.select("event_type", "value", "ts", "event_id", bkt.alias("bkt"))
    w_a = Window.partitionBy("event_type", "bkt").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "bkt").orderBy(F.desc("ts"), F.desc("event_id"))
    pts = pts.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return (
        pts.groupBy("event_type", "bkt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("v_first"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("v_last"),
            F.min("ts").alias("t_first"),
            F.max("ts").alias("t_last"),
        )
        .select(
            "event_type",
            F.timestamp_micros(F.col("bkt") * F.lit(_M4_BUCKET_US)).alias("bucket"),
            "n",
            "v_min",
            "v_max",
            "v_first",
            "v_last",
            "t_first",
            "t_last",
        )
    )


@register(
    "q_time_weighted_avg",
    oracle="""
        WITH seg AS (
            SELECT event_type,
                   CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                   value,
                   epoch_us(COALESCE(
                       LEAD(ts) OVER (PARTITION BY event_type, DATE_TRUNC('day', ts)
                                      ORDER BY ts, event_id),
                       DATE_TRUNC('day', ts) + INTERVAL 1 DAY)) - epoch_us(ts) AS dt_us
            FROM events
        )
        SELECT event_type, day,
               (CAST(SUM(CAST(ROUND(value * dt_us * 100) AS BIGINT)) AS DOUBLE) / 100.0)
                   / CAST(SUM(dt_us) AS DOUBLE) AS twa,
               COUNT(*) AS n
        FROM seg
        GROUP BY event_type, day
    """,
    doc=(
        "Time-weighted average per (series, day): each observation holds "
        "until the next one (LOCF), the last until day end — the correct "
        "mean under irregular sampling, where the plain AVG over-weights "
        "bursts. Weighted sum in exact fixed-point units (value is 2-dp "
        "rational, dt integer micros -> value*dt*100 is integral; Σdt per "
        "group is bounded by the day length, so the long accumulator can "
        "never overflow regardless of row count). One window + one agg on "
        "the same (type, day) grain: a single shuffle."
    ),
    tags=("timeseries", "twa", "window-agg"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # Materialize the day column BEFORE the window so the window partitioning
    # and the final groupBy reference the same attribute — Catalyst then
    # reuses the window's Exchange for the aggregation (one shuffle total;
    # partitioning by the raw date_trunc expression inside the window spec
    # planned a second Exchange on the aliased key).
    e = e.withColumn("day", F.date_trunc("day", F.col("ts")))
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    next_ts = F.coalesce(F.lead("ts").over(w), F.col("day") + F.expr("INTERVAL 1 DAY"))
    seg = e.select(
        "event_type",
        "day",
        "value",
        (F.unix_micros(next_ts) - F.unix_micros(F.col("ts"))).alias("dt_us"),
    )
    # value*dt_us*100 is exactly integral (2-dp value, integer micros) —
    # rint, not round: see functions/numeric.units.
    wsum = F.sum(F.rint(F.col("value") * F.col("dt_us") * 100).cast("long"))
    return seg.groupBy("event_type", "day").agg(
        ((wsum.cast("double") / F.lit(100.0)) / F.sum("dt_us").cast("double")).alias("twa"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_gap_fill_interpolate",
    oracle="""
        WITH spine AS (
            SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                          TIMESTAMP '2024-01-30 23:00:00',
                                          INTERVAL 1 HOUR)) AS bucket
        ),
        agg AS (
            SELECT DATE_TRUNC('hour', ts) AS bucket,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS mean_value
            FROM events WHERE event_type = 'error'
            GROUP BY DATE_TRUNC('hour', ts)
        ),
        joined AS (
            SELECT s.bucket, a.mean_value FROM spine s LEFT JOIN agg a ON s.bucket = a.bucket
        ),
        nav AS (
            SELECT bucket, mean_value,
                   last_value(mean_value IGNORE NULLS) OVER
                       (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS prev_v,
                   last_value(CASE WHEN mean_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER
                       (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS prev_b,
                   first_value(mean_value IGNORE NULLS) OVER
                       (ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
                   first_value(CASE WHEN mean_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER
                       (ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
            FROM joined
        )
        SELECT bucket,
               CASE
                   WHEN mean_value IS NOT NULL THEN mean_value
                   WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
                   ELSE prev_v + (next_v - prev_v)
                        * (CAST(epoch_us(bucket) - epoch_us(prev_b) AS DOUBLE)
                           / CAST(epoch_us(next_b) - epoch_us(prev_b) AS DOUBLE))
               END AS filled_value,
               mean_value IS NULL AS interpolated
        FROM nav
    """,
    doc=(
        "fill(linear): hourly mean over a generated spine, missing buckets "
        "linearly interpolated between the nearest observed neighbors "
        "(leading/trailing gaps stay NULL — nothing to anchor to). The "
        "navigation window is over the SPINE (O(range/interval) rows, "
        "independent of fact cardinality), so its global ordering is "
        "driver-scale by construction; the fact-side agg shuffles once."
    ),
    tags=("timeseries", "gapfill", "interpolation", "window"),
)
def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    agg = (
        e.where(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(exact_avg(F.col("value"), "decimal(27,8)").alias("mean_value"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-30 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket")
    )
    joined = F.broadcast(spine).join(agg, "bucket", "left")
    w_prev = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("bucket").rowsBetween(0, Window.unboundedFollowing)
    obs_b = F.when(F.col("mean_value").isNotNull(), F.col("bucket"))
    nav = joined.select(
        "bucket",
        "mean_value",
        F.last("mean_value", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_b, ignorenulls=True).over(w_prev).alias("prev_b"),
        F.first("mean_value", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_b, ignorenulls=True).over(w_next).alias("next_b"),
    )
    frac = (F.unix_micros(F.col("bucket")) - F.unix_micros(F.col("prev_b"))).cast("double") / (
        F.unix_micros(F.col("next_b")) - F.unix_micros(F.col("prev_b"))
    ).cast("double")
    return nav.select(
        "bucket",
        F.when(F.col("mean_value").isNotNull(), F.col("mean_value"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None).cast("double"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("filled_value"),
        F.col("mean_value").isNull().alias("interpolated"),
    )


@register(
    "q_mad_outliers",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                   COUNT(*)    OVER (PARTITION BY event_type)                 AS n
            FROM events
        ),
        med AS (
            SELECT event_type, MAX(value) AS med
            FROM ranked WHERE rn = (n + 1) // 2 GROUP BY event_type
        ),
        devs AS (
            SELECT e.event_type, e.value, ABS(e.value - m.med) AS dev, m.med
            FROM events e JOIN med m ON e.event_type = m.event_type
        ),
        dev_ranked AS (
            SELECT event_type, med, value, dev,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
                   COUNT(*)    OVER (PARTITION BY event_type)               AS n
            FROM devs
        ),
        mad AS (
            SELECT event_type, MAX(dev) AS mad
            FROM dev_ranked WHERE rn = (n + 1) // 2 GROUP BY event_type
        )
        SELECT d.event_type,
               MAX(d.med)                                            AS med,
               MAX(mad.mad)                                          AS mad,
               COUNT(*)                                              AS n,
               COUNT(CASE WHEN d.dev > 3.5 * mad.mad THEN 1 END)     AS n_outliers,
               CAST(COUNT(CASE WHEN d.dev > 3.5 * mad.mad THEN 1 END) AS DOUBLE)
                   / COUNT(*)                                        AS outlier_share
        FROM devs d JOIN mad ON d.event_type = mad.event_type
        GROUP BY d.event_type
    """,
    doc=(
        "Robust outlier profile per series: median + MAD (median absolute "
        "deviation), outlier = deviation > 3.5 MAD (Iglewicz-Hoaglin "
        "modified z-score with the 0.6745 constant folded into the "
        "threshold). Medians are exact ELEMENTS (lower median via "
        "row_number selection), not interpolated — element selection is the "
        "only median both engines reproduce bit-for-bit, which keeps the "
        "dev > 3.5*mad comparison deterministic. Medians broadcast back "
        "(5 rows); two ranking shuffles on the series key."
    ),
    tags=("timeseries", "stats", "outlier", "robust"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_type", "value")
    w_rank = Window.partitionBy("event_type").orderBy("value")
    w_all = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    med = (
        ranked.where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .groupBy("event_type")
        .agg(F.max("value").alias("med"))
    )
    devs = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    w_dev = Window.partitionBy("event_type").orderBy("dev")
    dev_ranked = devs.select(
        "event_type",
        "dev",
        F.row_number().over(w_dev).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    mad = (
        dev_ranked.where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .groupBy("event_type")
        .agg(F.max("dev").alias("mad"))
    )
    out = F.count(F.when(F.col("dev") > F.lit(3.5) * F.col("mad"), F.lit(1)))
    return (
        devs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count(F.lit(1)).alias("n"),
            out.alias("n_outliers"),
            (out.cast("double") / F.count(F.lit(1))).alias("outlier_share"),
        )
    )


@register(
    "q_sensor_correlation",
    oracle="""
        WITH hourly AS (
            SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS bucket, event_type,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS s
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b, a.s AS x, b.s AS y
            FROM hourly a JOIN hourly b
              ON a.bucket = b.bucket AND a.event_type < b.event_type
        ),
        m AS (
            SELECT type_a, type_b, COUNT(*) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(27,8))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(y AS DECIMAL(27,8))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4))) AS DOUBLE) AS syy
            FROM pairs GROUP BY type_a, type_b
        )
        SELECT type_a, type_b, n,
               (n * sxy - sx * sy)
                   / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr
        FROM m
    """,
    doc=(
        "Pairwise correlation matrix between the per-type hourly revenue "
        "series (co-observed buckets only). Hourly sums are exact fixed-point "
        "longs; moment sums are exact decimals — order-independent, so the "
        "correlation is bit-reproducible under any partitioning (the builtin "
        "corr's Welford merges are not). The self-join operates on the "
        "bucketed aggregate (O(buckets × types) rows), not the facts."
    ),
    tags=("timeseries", "stats", "correlation"),
)
def q_sensor_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(
            (F.sum(F.rint(F.col("value") * 100).cast("long")).cast("double") / F.lit(100.0)).alias(
                "s"
            )
        )
    )
    a, b = hourly.alias("a"), hourly.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.s").alias("x"),
        F.col("b.s").alias("y"),
    )
    xd = F.col("x").cast("decimal(19,4)")
    yd = F.col("y").cast("decimal(19,4)")
    m = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(27,8)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(27,8)")).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "type_a",
        "type_b",
        "n",
        ((n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))).alias(
            "corr"
        ),
    )


@register(
    "q_percentile_bands",
    oracle="""
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS bucket, event_type,
               quantile_cont(value, 0.50) AS p50,
               quantile_cont(value, 0.90) AS p90,
               quantile_cont(value, 0.99) AS p99,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
    doc=(
        "Percentile bands per (series, day) — the Grafana p50/p90/p99 chart. "
        "Spark's exact `percentile` and DuckDB's quantile_cont share the "
        "same linear-interpolation definition (verified bit-identical on "
        "this data at every SF). Exact percentiles shuffle the group's "
        "values once; at 100 TB the drop-in is approx_percentile "
        "(KLL-sketch, mergeable, map-side combinable) — registered "
        "separately as q_approx_percentile with accuracy-bound tests."
    ),
    tags=("timeseries", "stats", "percentile", "grafana"),
)
def q_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("bucket"), "event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_m4_rollup",
    oracle=_M4_ORACLE,
    doc=(
        "M4 is ALGEBRAIC (mergeable): the 6h downsample computed by merging "
        "1h M4 partials — min/max combine directly, first/last combine by "
        "arg-min/arg-max on the partials' t_first/t_last (disjoint buckets "
        "⇒ no ties) — must equal the direct 6h M4 bit-for-bit, which the "
        "shared oracle enforces. This is the hierarchical-rollup property "
        "that lets a TSDB serve any zoom level from materialized fine-grain "
        "partials instead of rescanning raw data: at 100 TB the hourly M4 "
        "table is ~6 orders of magnitude smaller than the events it "
        "summarizes."
    ),
    tags=("timeseries", "downsample", "m4", "rollup", "incremental-view"),
)
def q_m4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    hour_us = 3600 * 1_000_000
    e = load(spark, sf_dir, "events")
    hkt = F.floor(F.unix_micros(F.col("ts")) / F.lit(hour_us)).cast("bigint")
    pts = e.select("event_type", "value", "ts", "event_id", hkt.alias("hkt"))
    w_a = Window.partitionBy("event_type", "hkt").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "hkt").orderBy(F.desc("ts"), F.desc("event_id"))
    hourly = (
        pts.withColumn("rn_a", F.row_number().over(w_a))
        .withColumn("rn_d", F.row_number().over(w_d))
        .groupBy("event_type", "hkt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("v_first"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("v_last"),
            F.min("ts").alias("t_first"),
            F.max("ts").alias("t_last"),
        )
    )
    merged = (
        hourly.groupBy(
            "event_type",
            F.floor(F.col("hkt") * hour_us / F.lit(_M4_BUCKET_US)).cast("bigint").alias("bkt"),
        )
        .agg(
            F.sum("n").alias("n"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
            F.min_by("v_first", "t_first").alias("v_first"),
            F.max_by("v_last", "t_last").alias("v_last"),
            F.min("t_first").alias("t_first"),
            F.max("t_last").alias("t_last"),
        )
    )
    return merged.select(
        "event_type",
        F.timestamp_micros(F.col("bkt") * F.lit(_M4_BUCKET_US)).alias("bucket"),
        "n",
        "v_min",
        "v_max",
        "v_first",
        "v_last",
        "t_first",
        "t_last",
    )


@register(
    "q_hll_distinct_rollup",
    oracle=None,  # sketch internals are engine-specific; identity + accuracy in pytest
    doc=(
        "Mergeable distinct-count rollup (Apache DataSketches HLL, built "
        "into Spark 4): hourly hll_sketch_agg(user_id) partials union to "
        "daily via hll_union_agg — register-wise max, so merged-from-partials "
        "equals the direct daily sketch EXACTLY (asserted in pytest along "
        "with <2% error vs exact counts). The sketch analog of q_m4_rollup: "
        "distinct counts, normally non-additive, become hierarchically "
        "rollup-able in O(4KB) per cell at 100 TB. Rows-only driver check."
    ),
    tags=("timeseries", "approx", "sketch", "rollup", "incremental-view"),
)
def q_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return hourly.groupBy(F.date_trunc("day", "h").alias("day"), "event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )


@register(
    "q_subsequence_search",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS bkt,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS s
            FROM events GROUP BY 1, 2
        ),
        win AS (
            SELECT event_type, bkt,
                   list(s) OVER (PARTITION BY event_type ORDER BY bkt
                                 ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING) AS xs,
                   COUNT(*) OVER (PARTITION BY event_type ORDER BY bkt
                                  ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING) AS w
            FROM hourly
        ),
        full_win AS (SELECT * FROM win WHERE w = 24),
        pattern AS (
            SELECT xs AS q FROM full_win
            WHERE event_type = 'click'
            ORDER BY bkt LIMIT 1
        )
        SELECT event_type,
               make_timestamp(bkt * 3600000000) AS window_start,
               CAST(list_sum(list_transform(range(24),
                    i -> CAST(ROUND((xs[i+1] - q[i+1]) * 100) AS BIGINT)
                         * CAST(ROUND((xs[i+1] - q[i+1]) * 100) AS BIGINT)
               )) AS DOUBLE) / 10000.0 AS dist2
        FROM full_win CROSS JOIN pattern
        ORDER BY dist2, event_type, window_start
        LIMIT 10
    """,
    doc=(
        "Time-series subsequence similarity search (the EDBT'19 streaming "
        "TS-similarity theme): find the 10 hourly 24-point windows, across "
        "ALL series, closest in squared Euclidean distance to a query "
        "pattern (the click series' first full day). Windows materialize "
        "via a ROWS frame over the bucketed grain — O(buckets x W) work, "
        "never touching raw events twice — and the distance is computed in "
        "exact integer units (2-dp data x100), so ranking is deterministic "
        "cross-engine. At 100 TB the bucketed series table is the small "
        "derived artifact; a pattern probe is a broadcast, and candidate "
        "pruning (Matrix-Profile-style lower bounds) would slot in above "
        "this exact re-rank."
    ),
    tags=("timeseries", "similarity", "subsequence", "pattern-search"),
)
def q_subsequence_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    hour_us = 3600 * 1_000_000
    W = 24
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.floor(F.unix_micros(F.col("ts")) / F.lit(hour_us)).cast("bigint").alias("bkt"),
    ).agg((F.sum(F.rint(F.col("value") * 100).cast("long")).cast("double") / F.lit(100.0)).alias("s"))
    w = Window.partitionBy("event_type").orderBy("bkt").rowsBetween(0, W - 1)
    win = hourly.select(
        "event_type",
        "bkt",
        F.collect_list("s").over(w).alias("xs"),
        F.count(F.lit(1)).over(w).alias("w"),
    ).where(F.col("w") == W)
    pattern = (
        win.where(F.col("event_type") == "click")
        .orderBy("bkt")
        .limit(1)
        .select(F.col("xs").alias("q"))
    )
    joined = win.join(F.broadcast(pattern))

    def dist(acc, i):
        d = F.rint((F.element_at(F.col("xs"), i + 1) - F.element_at(F.col("q"), i + 1)) * 100).cast(
            "long"
        )
        return acc + d * d

    dist2 = (
        F.aggregate(F.sequence(F.lit(0), F.lit(W - 1)), F.lit(0).cast("long"), dist).cast("double")
        / F.lit(10000.0)
    ).alias("dist2")
    return (
        joined.select(
            "event_type",
            F.timestamp_micros(F.col("bkt") * F.lit(hour_us)).alias("window_start"),
            dist2,
        )
        .orderBy("dist2", "event_type", "window_start")
        .limit(10)
    )


@register(
    "q_cusum_changepoints",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS units
            FROM events GROUP BY 1, 2
        ),
        dev AS (
            SELECT event_type, day, units,
                   COUNT(*)   OVER (PARTITION BY event_type) AS n,
                   SUM(units) OVER (PARTITION BY event_type) AS tot
            FROM daily
        ),
        pref AS (
            SELECT event_type, day, units, n,
                   SUM(n * units - tot) OVER (PARTITION BY event_type ORDER BY day
                                              ROWS UNBOUNDED PRECEDING) AS p
            FROM dev
        ),
        cus AS (
            SELECT event_type, day, units, n,
                   p - LEAST(MIN(p) OVER (PARTITION BY event_type ORDER BY day
                                          ROWS UNBOUNDED PRECEDING), 0) AS cpos,
                   GREATEST(MAX(p) OVER (PARTITION BY event_type ORDER BY day
                                         ROWS UNBOUNDED PRECEDING), 0) - p AS cneg
            FROM pref
        )
        SELECT event_type, day,
               CAST(units AS DOUBLE) / 100.0                 AS daily_sum,
               CAST(cpos AS DOUBLE) / (n * 100.0)            AS cusum_pos,
               CAST(cneg AS DOUBLE) / (n * 100.0)            AS cusum_neg,
               2 * cpos > MAX(cpos) OVER (PARTITION BY event_type) AS is_shift
        FROM cus
    """,
    doc=(
        "CUSUM change-point detection over the per-(series, day) grain (Page "
        "1954). The sequential recurrence S_i = max(0, S_{i-1} + d_i) is "
        "NOT computed as a recurrence: it equals P_i - min(0, min_{j<=i} P_j) "
        "for prefix sums P of the deviations (the 0 bound is the EMPTY "
        "prefix — dropping it truncates the statistic until the running "
        "min first crosses zero; pinned by the recurrence-identity property "
        "test in tests/test_round3_ops.py), so the whole detector is two "
        "running windows (prefix sum + running min/max) on one (series) "
        "partitioning — fully declarative, no iteration, scale-bound by the "
        "bucketed grain, not the raw events. Deviations are centered on the "
        "series mean without division: d_i = n*units_i - total_units keeps "
        "everything in exact integer units, so both engines agree bit-for-bit "
        "on every S_i and on the shift flag (worst-half-of-max rule). "
        "Upward and downward drifts are tracked symmetrically."
    ),
    tags=("timeseries", "changepoint", "cusum", "window"),
)
def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.rint(F.col("value") * 100).cast("long")).alias("units"))
    w_all = Window.partitionBy("event_type")
    w_run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dev = daily.select(
        "event_type",
        "day",
        "units",
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("units").over(w_all).alias("tot"),
    )
    pref = dev.withColumn(
        "p", F.sum(F.col("n") * F.col("units") - F.col("tot")).over(w_run)
    )
    zero = F.lit(0).cast("long")
    cus = pref.select(
        "event_type",
        "day",
        "units",
        "n",
        (F.col("p") - F.least(F.min("p").over(w_run), zero)).alias("cpos"),
        (F.greatest(F.max("p").over(w_run), zero) - F.col("p")).alias("cneg"),
    )
    return cus.select(
        "event_type",
        "day",
        (F.col("units").cast("double") / F.lit(100.0)).alias("daily_sum"),
        (F.col("cpos").cast("double") / (F.col("n") * F.lit(100.0))).alias("cusum_pos"),
        (F.col("cneg").cast("double") / (F.col("n") * F.lit(100.0))).alias("cusum_neg"),
        (F.lit(2) * F.col("cpos") > F.max("cpos").over(w_all)).alias("is_shift"),
    )


@register(
    "q_lttb_downsample",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS bkt,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS units
            FROM events GROUP BY 1, 2
        ),
        ep AS (
            SELECT event_type,
                   CAST(MIN(bkt) AS DOUBLE) AS fx,
                   CAST(arg_min(units, bkt) AS DOUBLE) / 100.0 AS fy,
                   CAST(MAX(bkt) AS DOUBLE) AS lx,
                   CAST(arg_max(units, bkt) AS DOUBLE) / 100.0 AS ly
            FROM hourly GROUP BY event_type
        ),
        bm AS (
            SELECT event_type, bkt // 24 AS pb,
                   CAST(SUM(bkt) AS DOUBLE) / COUNT(*) AS ax,
                   CAST(SUM(units) AS DOUBLE) / (100.0 * COUNT(*)) AS ay
            FROM hourly GROUP BY 1, 2
        ),
        anch AS (
            SELECT b.event_type, b.pb,
                   COALESCE(LAG(ax)  OVER w, e.fx) AS pax,
                   COALESCE(LAG(ay)  OVER w, e.fy) AS pay,
                   COALESCE(LEAD(ax) OVER w, e.lx) AS nax,
                   COALESCE(LEAD(ay) OVER w, e.ly) AS nay
            FROM bm b JOIN ep e USING (event_type)
            WINDOW w AS (PARTITION BY b.event_type ORDER BY b.pb)
        ),
        scored AS (
            SELECT h.event_type, h.bkt, a.pb,
                   CAST(h.units AS DOUBLE) / 100.0 AS s,
                   ABS((a.pax - a.nax) * (CAST(h.units AS DOUBLE) / 100.0 - a.pay)
                       - (a.pax - CAST(h.bkt AS DOUBLE)) * (a.pay - a.nay)) AS area
            FROM hourly h JOIN anch a
              ON h.event_type = a.event_type AND h.bkt // 24 = a.pb
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, pb
                                         ORDER BY area DESC, bkt) AS rn
            FROM scored
        )
        SELECT event_type,
               make_timestamp(pb * 86400000000)  AS bucket,
               make_timestamp(bkt * 3600000000)  AS point_ts,
               s                                  AS value,
               area
        FROM ranked WHERE rn = 1
    """,
    doc=(
        "LTTB downsampling (Steinarsson 2013), bucket-mean-anchor variant: "
        "per (series, 24h pixel bucket) keep the ONE point of the hourly "
        "grain maximizing the triangle area spanned with the neighboring "
        "buckets' mean points — the visually-dominant point, vs M4's "
        "extremes. Canonical LTTB is sequential (each choice anchors the "
        "next bucket's triangle); anchoring on the neighbor bucket MEANS "
        "instead makes every bucket independent — embarrassingly parallel, "
        "the standard distributed relaxation. Anchor means stay exact "
        "(integer unit/index sums divided once), endpoint buckets anchor on "
        "the series' raw first/last points (arg-min/max, unique bkt ⇒ no "
        "ties), and the argmax is a (area DESC, bkt) row_number so the "
        "selection is bit-deterministic cross-engine. Cost: one shuffle to "
        "the hourly grain; the bucket-mean/anchor tables are "
        "O(buckets/24 × series) and broadcast."
    ),
    tags=("timeseries", "downsample", "lttb", "window"),
)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import track_cache

    hour_us = 3600 * 1_000_000
    e = load(spark, sf_dir, "events")
    # The hourly grain feeds three consumers (endpoints, bucket means, the
    # scored points); persist it so raw events are scanned ONCE — the same
    # role the materialized continuous aggregate plays in production
    # (q_m4_rollup), where this table would already exist.
    hourly = track_cache(
        e.groupBy(
            "event_type",
            F.floor(F.unix_micros(F.col("ts")) / F.lit(hour_us)).cast("bigint").alias("bkt"),
        ).agg(F.sum(F.rint(F.col("value") * 100).cast("long")).alias("units"))
    )
    ep = hourly.groupBy("event_type").agg(
        F.min("bkt").cast("double").alias("fx"),
        (F.min_by("units", "bkt").cast("double") / F.lit(100.0)).alias("fy"),
        F.max("bkt").cast("double").alias("lx"),
        (F.max_by("units", "bkt").cast("double") / F.lit(100.0)).alias("ly"),
    )
    bm = hourly.groupBy("event_type", F.expr("bkt DIV 24").alias("pb")).agg(
        (F.sum("bkt").cast("double") / F.count(F.lit(1))).alias("ax"),
        (F.sum("units").cast("double") / (F.lit(100.0) * F.count(F.lit(1)))).alias("ay"),
    )
    w = Window.partitionBy("event_type").orderBy("pb")
    anch = (
        bm.join(F.broadcast(ep), "event_type")
        .select(
            "event_type",
            "pb",
            F.coalesce(F.lag("ax").over(w), F.col("fx")).alias("pax"),
            F.coalesce(F.lag("ay").over(w), F.col("fy")).alias("pay"),
            F.coalesce(F.lead("ax").over(w), F.col("lx")).alias("nax"),
            F.coalesce(F.lead("ay").over(w), F.col("ly")).alias("nay"),
        )
    )
    s = F.col("units").cast("double") / F.lit(100.0)
    scored = (
        hourly.withColumn("pb", F.expr("bkt DIV 24"))
        .join(F.broadcast(anch), ["event_type", "pb"])
        .select(
            "event_type",
            "bkt",
            "pb",
            s.alias("s"),
            F.abs(
                (F.col("pax") - F.col("nax")) * (s - F.col("pay"))
                - (F.col("pax") - F.col("bkt").cast("double")) * (F.col("pay") - F.col("nay"))
            ).alias("area"),
        )
    )
    w_sel = Window.partitionBy("event_type", "pb").orderBy(F.desc("area"), "bkt")
    return (
        scored.withColumn("rn", F.row_number().over(w_sel))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.timestamp_micros(F.col("pb") * F.lit(24 * hour_us)).alias("bucket"),
            F.timestamp_micros(F.col("bkt") * F.lit(hour_us)).alias("point_ts"),
            F.col("s").alias("value"),
            "area",
        )
    )


@register(
    "q_theil_sen_trend",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(epoch_us(DATE_TRUNC('day', ts)) / 86400000000 AS BIGINT) AS d,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS y
            FROM events GROUP BY 1, 2
        ),
        slopes AS (
            SELECT a.event_type, (b.y - a.y) / CAST(b.d - a.d AS DOUBLE) AS slope
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.d < b.d
        ),
        ranked AS (
            SELECT event_type, slope,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
                   COUNT(*)    OVER (PARTITION BY event_type)                 AS n_pairs
            FROM slopes
        ),
        sen AS (
            SELECT event_type, MAX(n_pairs) AS n_pairs, MAX(slope) AS sen_slope
            FROM ranked WHERE rn = (n_pairs + 1) // 2 GROUP BY event_type
        )
        SELECT s.event_type, d.n_days, s.n_pairs, s.sen_slope
        FROM sen s JOIN (SELECT event_type, COUNT(*) AS n_days
                         FROM daily GROUP BY event_type) d
          ON s.event_type = d.event_type
    """,
    doc=(
        "Theil-Sen robust trend estimator per series: the median of all "
        "pairwise slopes between daily sums — 29.3%-breakdown-point trend, "
        "immune to the outliers that wreck least-squares. The O(n²) pair "
        "join runs on the BUCKETED daily grain (O(days²) pairs per series, "
        "independent of raw-event cardinality — the same contract as the "
        "subsequence search), never on the facts. Daily sums are exact "
        "integer units; each slope is one IEEE division of deterministic "
        "inputs, and the median is the exact lower ELEMENT (row_number "
        "selection, value-identical under slope ties), so both engines "
        "agree bit-for-bit. At 100 TB the daily table is the small derived "
        "artifact; for very long series the drop-in is the repeated-median "
        "or sampled-pairs estimator on the same shape."
    ),
    tags=("timeseries", "stats", "robust", "trend"),
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import track_cache

    day_us = 86_400_000_000
    e = load(spark, sf_dir, "events")
    # Both join legs and the n_days count read the daily grain; persist it so
    # raw events are scanned once (the materialized-aggregate contract).
    daily = track_cache(
        e.groupBy(
            "event_type",
            (F.unix_micros(F.date_trunc("day", "ts")) / F.lit(day_us)).cast("bigint").alias("d"),
        ).agg(
            (F.sum(F.rint(F.col("value") * 100).cast("long")).cast("double") / F.lit(100.0)).alias(
                "y"
            )
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        F.broadcast(b),
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.d") - F.col("a.d")).cast("double")).alias(
            "slope"
        ),
    )
    w_rank = Window.partitionBy("event_type").orderBy("slope")
    w_all = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_pairs"),
    )
    sen = (
        ranked.where(F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
        .groupBy("event_type")
        .agg(F.max("n_pairs").alias("n_pairs"), F.max("slope").alias("sen_slope"))
    )
    n_days = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    return sen.join(F.broadcast(n_days), "event_type").select(
        "event_type", "n_days", "n_pairs", "sen_slope"
    )


@register(
    "q_sax_symbols",
    oracle="""
        WITH seg AS (
            SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                   (CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) % 24) // 3 AS seg_idx,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s
            FROM events GROUP BY 1, 2, 3
        ),
        mom AS (
            SELECT event_type, day, seg_idx, s,
                   COUNT(*)                       OVER (PARTITION BY event_type, day) AS w,
                   SUM(CAST(s AS DOUBLE))         OVER (PARTITION BY event_type, day) AS s1,
                   SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                                  OVER (PARTITION BY event_type, day) AS s2
            FROM seg
        ),
        z AS (
            SELECT event_type, day, seg_idx, w,
                   CASE WHEN s2 - s1 * s1 / w <= 0.0 THEN 0.0
                        ELSE (CAST(s AS DOUBLE) - s1 / w)
                             / SQRT((s2 - s1 * s1 / w) / w) END AS zval
            FROM mom
        ),
        sym AS (
            SELECT event_type, day, seg_idx, w,
                   CASE WHEN zval < -0.6745 THEN 'a'
                        WHEN zval < 0.0     THEN 'b'
                        WHEN zval < 0.6745  THEN 'c'
                        ELSE 'd' END AS c
            FROM z
        )
        SELECT event_type, day,
               string_agg(c, '' ORDER BY seg_idx) AS sax_word,
               COUNT(*) AS w
        FROM sym
        GROUP BY event_type, day
        HAVING COUNT(*) = 8
    """,
    doc=(
        "SAX symbolic representation (Lin et al. 2003): per (series, day), "
        "the 24 hours fold to an 8-segment PAA (3h integer unit sums — no "
        "division, no fp), each segment z-normalizes against the day's "
        "exact moments, and the 4-letter Gaussian breakpoints "
        "(±0.6745, 0) yield an 8-char word — the indexable alphabet form "
        "that motif discovery / anomaly grammars (HOT SAX) build on. "
        "Constant days (zero variance) define z=0 -> 'cccccccc' rather "
        "than NaN. One shuffle to the segment grain; the moment windows "
        "and the word rollup share the (series, day) partitioning. "
        "Determinism: segment sums are integers, the moment formula is "
        "the same double expression both engines evaluate, and the word "
        "assembles in explicit seg_idx order. Segment squares stay exact "
        "below 2^53 units² — at larger magnitudes swap in decimal moments "
        "as q_stats_aggregates does."
    ),
    tags=("timeseries", "sax", "symbolic", "paa"),
)
def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    seg = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr("(CAST(FLOOR(unix_micros(ts) / 3600000000) AS BIGINT) % 24) DIV 3").alias(
            "seg_idx"
        ),
    ).agg(F.sum(F.rint(F.col("value") * 100).cast("long")).alias("s"))
    w_day = Window.partitionBy("event_type", "day")
    sd = F.col("s").cast("double")
    mom = seg.select(
        "event_type",
        "day",
        "seg_idx",
        "s",
        F.count(F.lit(1)).over(w_day).alias("w"),
        F.sum(sd).over(w_day).alias("s1"),
        F.sum(sd * sd).over(w_day).alias("s2"),
    )
    var_num = F.col("s2") - F.col("s1") * F.col("s1") / F.col("w")
    zval = F.when(var_num <= 0.0, F.lit(0.0)).otherwise(
        (F.col("s").cast("double") - F.col("s1") / F.col("w"))
        / F.sqrt(var_num / F.col("w"))
    )
    sym = mom.select(
        "event_type",
        "day",
        "seg_idx",
        "w",
        F.when(zval < -0.6745, F.lit("a"))
        .when(zval < 0.0, F.lit("b"))
        .when(zval < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("c"),
    )
    return (
        sym.groupBy("event_type", "day")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "c"))),
                    lambda x: x["c"],
                ),
            ).alias("sax_word"),
            F.count(F.lit(1)).alias("w"),
        )
        .where(F.col("w") == 8)
    )


@register(
    "q_winsorized_stats",
    oracle="""
        WITH u AS (
            SELECT event_type, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS units
            FROM events
        ),
        ranked AS (
            SELECT event_type, units,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY units, event_id) AS rn,
                   COUNT(*)    OVER (PARTITION BY event_type)   AS n
            FROM u
        ),
        agg AS (
            SELECT event_type,
                   MAX(n)                                            AS n,
                   MAX(n // 20)                                      AS k,
                   CAST(SUM(units) AS BIGINT)                        AS total,
                   CAST(SUM(CASE WHEN rn > n // 20 AND rn <= n - n // 20
                                 THEN units END) AS BIGINT)          AS mid_sum,
                   MAX(CASE WHEN rn = n // 20 + 1     THEN units END) AS lo_units,
                   MAX(CASE WHEN rn = n - n // 20     THEN units END) AS hi_units
            FROM ranked GROUP BY event_type
        )
        SELECT event_type, n, k,
               CAST(lo_units AS DOUBLE) / 100.0 AS p05_value,
               CAST(hi_units AS DOUBLE) / 100.0 AS p95_value,
               CAST(total AS DOUBLE) / (100.0 * n) AS mean,
               CAST(mid_sum + k * lo_units + k * hi_units AS DOUBLE)
                   / (100.0 * n)                   AS winsorized_mean,
               CAST(mid_sum AS DOUBLE) / (100.0 * (n - 2 * k)) AS trimmed_mean
        FROM agg
    """,
    doc=(
        "Winsorized and trimmed means per series (5% each tail): the robust "
        "location estimators between the mean (0% trim) and the median "
        "(50% trim) — standard for metrics polluted by tail outliers. "
        "Single ranking window + one aggregation on the same (series) "
        "partitioning; the winsorized sum never materializes clamped rows — "
        "it is mid_sum + k*lo + k*hi from the boundary ORDER STATISTICS "
        "(exact element selection on a (units, event_id) total order, so "
        "duplicate values tie-break identically cross-engine). All sums in "
        "exact integer units; the three means are single double divisions. "
        "At 100 TB the exact rank pass is the same distributed-ranking "
        "shape as q_equidepth_histogram; the sketch drop-in is "
        "approx_percentile clamping."
    ),
    tags=("timeseries", "stats", "robust", "winsorize"),
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    u = e.select(
        "event_type", "event_id", F.rint(F.col("value") * 100).cast("long").alias("units")
    )
    w_rank = Window.partitionBy("event_type").orderBy("units", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = u.select(
        "event_type",
        "units",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    k = F.floor(F.col("n") / 20).cast("long")
    mid = F.when((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k), F.col("units"))
    agg = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(k).alias("k"),
        F.sum("units").alias("total"),
        F.sum(mid).alias("mid_sum"),
        F.max(F.when(F.col("rn") == k + 1, F.col("units"))).alias("lo_units"),
        F.max(F.when(F.col("rn") == F.col("n") - k, F.col("units"))).alias("hi_units"),
    )
    return agg.select(
        "event_type",
        "n",
        "k",
        (F.col("lo_units").cast("double") / F.lit(100.0)).alias("p05_value"),
        (F.col("hi_units").cast("double") / F.lit(100.0)).alias("p95_value"),
        (F.col("total").cast("double") / (F.lit(100.0) * F.col("n"))).alias("mean"),
        (
            (F.col("mid_sum") + F.col("k") * F.col("lo_units") + F.col("k") * F.col("hi_units"))
            .cast("double")
            / (F.lit(100.0) * F.col("n"))
        ).alias("winsorized_mean"),
        (
            F.col("mid_sum").cast("double")
            / (F.lit(100.0) * (F.col("n") - F.lit(2) * F.col("k")))
        ).alias("trimmed_mean"),
    )


@register(
    "q_line_protocol_roundtrip",
    oracle="""
        SELECT event_type, epoch_ms(ts) AS ts_ms, value
        FROM events
    """,
    doc=(
        "InfluxDB line-protocol round trip, oracle-checked per row: encode "
        "every event with the sink's JVM column expression "
        "(streaming/influx.py::to_line_protocol — measurement, escaped tag, "
        "field, ms timestamp), parse it back with the escape-aware JVM "
        "regex/HOF source (sources/line_protocol.py::from_line_protocol), "
        "and hash-compare the decoded (tag, ts, value) against the original "
        "table. Proves encoder and parser are exact inverses on real data — "
        "Java's double->string->double round trip included. Map-only, full "
        "codegen, no Python: at 100 TB this is the shape of a line-protocol "
        "ingest scan."
    ),
    tags=("timeseries", "influx", "source", "roundtrip"),
)
def q_line_protocol_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.line_protocol import from_line_protocol
    from ..streaming.influx import to_line_protocol

    events = load(spark, sf_dir, "events")
    lines = events.select(
        to_line_protocol("events", ts="ts", value="value", key="event_type").alias(
            "value"
        )
    )
    parsed = from_line_protocol(lines)
    return parsed.where("valid").select(
        F.element_at("tags", "key").alias("event_type"),
        F.unix_millis("ts").alias("ts_ms"),
        F.element_at("fields", "value").alias("value"),
    )


@register(
    "q_line_protocol_quarantine",
    oracle="""
        SELECT event_type,
               COUNT(*) FILTER (WHERE event_id % 7 <> 0) AS n_valid,
               COUNT(*) FILTER (WHERE event_id % 7 = 0)  AS n_quarantined
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "The malformed-line quarantine contract, oracle-checked: every "
        "event is encoded as line protocol, then a deterministic subset "
        "(event_id % 7 == 0) is corrupted (field value replaced with a "
        "non-numeric token); the parser must route EXACTLY the corrupted "
        "lines to valid=false — nothing dropped, nothing leaked — so "
        "per-type (n_valid, n_quarantined) match the arithmetic oracle. "
        "This is the count-and-route ingest policy proven row-exact; the "
        "same parse runs in the streaming ingest topology "
        "(sources/line_protocol.py::line_protocol_ingest)."
    ),
    tags=("timeseries", "influx", "source", "quarantine"),
)
def q_line_protocol_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.line_protocol import from_line_protocol
    from ..streaming.influx import to_line_protocol

    events = load(spark, sf_dir, "events")
    line = to_line_protocol("events", ts="ts", value="value", key="event_type")
    corrupted = F.when(
        F.col("event_id") % 7 == 0,
        F.concat(F.lit("events,key="), F.col("event_type"), F.lit(" value=oops ")),
    ).otherwise(line)
    parsed = from_line_protocol(events.select(corrupted.alias("value")), "value")
    # group by the tag as carried in the RAW preserved line (works for both
    # valid and quarantined rows; event_type values contain no escapes)
    et = F.regexp_extract("line", r"^events,key=([^ ]+) ", 1)
    return (
        parsed.select(et.alias("event_type"), "valid")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("valid"), 1).otherwise(0)).alias("n_valid"),
            F.sum(F.when(F.col("valid"), 0).otherwise(1)).alias("n_quarantined"),
        )
    )


@register(
    "q_rollup_mergeability",
    oracle="""
        SELECT event_type,
               time_bucket(INTERVAL 1 minute, ts) AS minute,
               COUNT(*)                           AS n,
               SUM(value)                         AS sum_value,
               MIN(value)                         AS min_value,
               MAX(value)                         AS max_value,
               SUM(value) / COUNT(*)              AS avg_value
        FROM events
        GROUP BY 1, 2
    """,
    doc=(
        "Tiered-rollup MERGEABILITY, proven by the hash gate: the Spark "
        "side first materializes 1-SECOND partial aggregates (count, sum, "
        "min, max — the mergeable summaries a continuous aggregate / "
        "InfluxDB CQ stores), then re-aggregates those partials to the "
        "1-minute grain; the oracle aggregates raw rows directly to 1 "
        "minute. The two matching bit-for-bit (sums via decimal so "
        "re-association is exact) is the correctness contract every "
        "downsample-and-retain storage tier relies on: at 100 TB you keep "
        "1s rollups hot and answer any coarser grain from them without "
        "touching raw — two map-side-combinable shuffles, the second over "
        "the (tiny) 1s-grain table."
    ),
    tags=("timeseries", "rollup", "mergeable", "agg"),
)
def q_rollup_mergeability(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    second = events.groupBy(
        "event_type",
        F.date_trunc("second", "ts").alias("sec"),
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(27,8)")).alias("psum"),
        F.min("value").alias("pmin"),
        F.max("value").alias("pmax"),
    )
    return (
        second.groupBy(
            "event_type", F.date_trunc("minute", "sec").alias("minute")
        )
        .agg(
            F.sum("pn").alias("n"),
            F.sum("psum").cast("double").alias("sum_value"),
            F.min("pmin").alias("min_value"),
            F.max("pmax").alias("max_value"),
            (F.sum("psum") / F.sum("pn")).cast("double").alias("avg_value"),
        )
    )
