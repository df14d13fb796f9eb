"""Time-semantics query inventory — the reference's actual domain.

Covers the reference's end-user query surface (SURVEY.md §2.1: scan, project,
tag-equality filter, time-range filter, time-bucketed GROUP BY + mean, order
by time, gap filling) and its windowing centerpiece (PseudoWindow —
/root/reference/src/main/java/com/ververica/functions/PseudoWindow.java:33-100:
keyed tumbling count windows with end-inclusive labels), re-expressed as
declarative Spark over the ``events`` table plus the closed-form generator.

Extensions beyond the reference (it is tumbling-only, PseudoWindow.java:82):
sliding windows and session windows, both oracle-checkable.

Scale notes: all of these are single-shuffle groupBy-on-(bucket, key) plans
with map-side partial aggregation; the time-spine gap-fill uses a broadcast
range join (spine is tiny relative to facts at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.generator import sensor_stream_batch
from ..functions.numeric import exact_avg, exact_sum, merge_split_sum, split_exact_sum, units
from ..sources.tables import load
from .registry import register


@register(
    "q_sensor_scan_filter",
    oracle="""
        SELECT event_id, ts, value
        FROM events
        WHERE event_type = 'click'
          AND ts >= TIMESTAMP '2024-01-05 00:00:00'
          AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    """,
    doc=(
        "The Grafana panel query shape (dashboard.json:86-111): projection + "
        "tag equality + time range. Both predicates push down to the parquet scan."
    ),
    tags=("scan", "filter", "timeseries"),
)
def q_sensor_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.where(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
    ).select("event_id", "ts", "value")


@register(
    "q_events_per_window",
    oracle="""
        SELECT event_type,
               DATE_TRUNC('hour', ts)                                            AS window_start,
               DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR - INTERVAL 1 MILLISECOND AS window_end_label,
               COUNT(*)   AS n_events,
               CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)
                    / 10000.0 AS sum_value
        FROM events
        GROUP BY event_type, DATE_TRUNC('hour', ts)
    """,
    doc=(
        "FLAGSHIP: keyed tumbling count window = the reference's PseudoWindow "
        "in event-time mode (PseudoWindow.java:74-99), as a declarative "
        "window() aggregation. window_end_label reproduces the reference's "
        "end-inclusive label (window start + duration - 1ms, PseudoWindow.java:82)."
    ),
    headline=True,
    tags=("window-agg", "timeseries", "flagship"),
)
def q_events_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # Tumbling bucket via date_trunc (cheapest equivalent of window('1 hour')
    # for calendar-aligned durations — no struct construction in the agg key).
    # value is 2-decimal sensor data, so the exact sum runs on the long-units
    # fast path as a split-accumulator sum (functions/numeric.py::
    # split_exact_sum): two long aggregates, ONE exchange, exact decimal
    # recombine per group — identical bits at any partitioning/scale, no
    # BigDecimal in the per-row loop and no second aggregation stage.
    hi, lo = split_exact_sum(F.col("value"), 10000)
    return (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            hi.alias("__hi"),
            lo.alias("__lo"),
        )
        .withColumn("sum_value", merge_split_sum(F.col("__hi"), F.col("__lo"), 10000))
        .select(
            "event_type",
            "window_start",
            (F.col("window_start") + F.expr("INTERVAL 59 MINUTES 59 SECONDS 999 MILLISECONDS")).alias("window_end_label"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_time_bucket_avg",
    oracle="""
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS bucket, event_type,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS mean_value,
               COUNT(*) AS n
        FROM events
        GROUP BY CAST(DATE_TRUNC('day', ts) AS TIMESTAMP), event_type
    """,
    doc=(
        "Grafana re-aggregation shape: GROUP BY time($__interval) + mean(value) "
        "(dashboard.json:295-331)."
    ),
    tags=("window-agg", "timeseries"),
)
def q_time_bucket_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("bucket"), "event_type")
        .agg(exact_avg(F.col("value"), "decimal(27,8)").alias("mean_value"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_gap_fill",
    oracle="""
        WITH spine AS (
            SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                          TIMESTAMP '2024-01-30 23:00:00',
                                          INTERVAL 1 HOUR)) AS bucket
        ),
        agg AS (
            SELECT DATE_TRUNC('hour', ts) AS bucket,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS mean_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY DATE_TRUNC('hour', ts)
        )
        SELECT s.bucket, a.mean_value
        FROM spine s LEFT JOIN agg a ON s.bucket = a.bucket
    """,
    doc=(
        "Gap filling = InfluxQL fill(null) (dashboard.json:295-331): generated "
        "time spine LEFT JOIN the bucketed agg. The spine is broadcast — it is "
        "O(time range), independent of fact cardinality."
    ),
    tags=("timeseries", "gapfill"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    agg = (
        e.where(F.col("event_type") == "purchase")
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
    return F.broadcast(spine).join(agg, "bucket", "left").select("bucket", "mean_value")


@register(
    "q_sliding_window_counts",
    oracle="""
        SELECT event_type,
               DATE_TRUNC('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
               COUNT(*) AS n_events
        FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
        GROUP BY event_type, DATE_TRUNC('hour', ts) - k * INTERVAL 1 HOUR
    """,
    doc=(
        "Sliding (hopping) window: 2h length, 1h slide — an extension; the "
        "reference is tumbling-only (PseudoWindow.java:82). Each event lands "
        "in exactly 2 windows; the oracle replicates via the unnest trick."
    ),
    tags=("window-agg", "timeseries"),
)
def q_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("event_type", F.col("w.start").alias("window_start"), "n_events")
    )


@register(
    "q_session_windows",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts)                       AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE  AS session_end,
               COUNT(*)                      AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    """,
    doc=(
        "Session windows (30 min inactivity gap) per user — an extension over "
        "the reference. Spark session_window(); oracle = gaps-and-islands SQL. "
        "Session end = last event + gap, matching Spark's semantics."
    ),
    tags=("window-agg", "timeseries", "session"),
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_generator_closed_form",
    oracle="""
        WITH idx AS (SELECT range AS i FROM range(600)),
        base AS (
            SELECT i,
                   TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '100 milliseconds' * i AS ts,
                   (i % 10) / 10.0 AS phase
            FROM idx
        )
        SELECT 'temp' AS key, ts, phase AS value FROM base
        UNION ALL
        SELECT 'pressure' AS key, ts, SIN(2 * PI() * phase) AS value FROM base
    """,
    doc=(
        "The reference's entire synthetic input as a closed form "
        "(TimestampSource + SawtoothFunction + SineWaveFunction + AssignKey + "
        "union, SURVEY.md §2 rows 1-6): 600 events/key at 100 ms period. "
        "Oracle-checked golden dataset for the generator."
    ),
    tags=("generator", "reference-parity"),
)
def q_generator_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sensor_stream_batch(spark, n_events=600)


@register(
    "q_sensor_window_invariant",
    oracle="""
        WITH idx AS (SELECT range AS i FROM range(600)),
        base AS (
            SELECT i,
                   TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '100 milliseconds' * i AS ts,
                   (i % 10) / 10.0 AS phase
            FROM idx
        ),
        sensors AS (
            SELECT 'temp' AS key, ts, phase AS value FROM base
            UNION ALL
            SELECT 'pressure' AS key, ts, SIN(2 * PI() * phase) AS value FROM base
        )
        SELECT key,
               DATE_TRUNC('second', ts) + INTERVAL 999 MILLISECOND AS window_end_label,
               COUNT(*) AS n_events
        FROM sensors
        GROUP BY key, DATE_TRUNC('second', ts)
    """,
    doc=(
        "The reference's one hard correctness invariant (README.md:46-48): "
        "event-time 1 s tumbling windows over the 100 ms generator contain "
        "exactly 10 events per key. Label = end-inclusive window end "
        "(PseudoWindow.java:82,95-96). Streaming variant asserted in "
        "tests/test_streaming_pipeline.py."
    ),
    tags=("window-agg", "reference-parity", "flagship"),
)
def q_sensor_window_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    sensors = sensor_stream_batch(spark, n_events=600)
    return (
        sensors.groupBy("key", F.window("ts", "1 second").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            (F.col("w.end") - F.expr("INTERVAL 1 MILLISECOND")).alias("window_end_label"),
            "n_events",
        )
    )


@register(
    "q_event_funnel",
    oracle="""
        WITH stages AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
               COUNT(CASE WHEN t_view IS NOT NULL
                           AND t_click > t_view THEN 1 END)   AS n_view_click,
               COUNT(CASE WHEN t_view IS NOT NULL
                           AND t_click > t_view
                           AND t_purchase > t_click THEN 1 END)
                   AS n_view_click_purchase
        FROM stages
    """,
    doc=(
        "Conversion-funnel analysis (view → click → purchase, strictly "
        "ordered first-occurrence timestamps): ONE hash aggregation keyed by "
        "user computes every stage timestamp (conditional MIN — no per-stage "
        "self-joins), then a single global conditional count. At 100 TB this "
        "is a map-combinable single shuffle on user_id; the classic N-way "
        "event self-join formulation would be N shuffles of the full event "
        "log."
    ),
    tags=("events", "funnel", "agg"),
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    stages = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & (F.col("t_click") > F.col("t_view"))
    reached_purchase = reached_click & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count(F.when(reached_view, 1)).alias("n_view"),
        F.count(F.when(reached_click, 1)).alias("n_view_click"),
        F.count(F.when(reached_purchase, 1)).alias("n_view_click_purchase"),
    )


@register(
    "q_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        )
        SELECT f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        GROUP BY f.cohort_day, date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
    """,
    doc=(
        "Cohort retention: users grouped by first-activity day, activity "
        "counted per (cohort, day-offset). The first-activity table and the "
        "activity join share the user_id key — co-partitioned shuffle, and "
        "the cohort side is a per-user aggregate (bounded by |users|, "
        "broadcastable when users << events)."
    ),
    tags=("events", "retention", "agg", "join"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    return (
        e.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "q_ema_trailing",
    oracle="""
        WITH framed AS (
            SELECT event_id, user_id, ts,
                   list(CAST(value AS DOUBLE))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS l
            FROM events
        )
        SELECT event_id, user_id, ts,
               list_reduce(l, (acc, x) -> 0.2::DOUBLE * x + 0.8::DOUBLE * acc)
                   AS ema
        FROM framed
    """,
    doc=(
        "Trailing exponential moving average (alpha=0.2 over a 20-row "
        "frame) — an operator neither Spark nor classic SQL has natively, "
        "composed from builtins: collect the ordered frame with a window "
        "list aggregate, fold it with a higher-order aggregate() (left "
        "fold, init = oldest value). The bounded frame keeps the fold O(20) "
        "per row and the weights bounded (an unbounded EMA prefix trick "
        "overflows (1-a)^-n in double); one shuffle on the series key. "
        "Total order (ts, event_id) makes the result deterministic; "
        "identical IEEE fold order on both engines makes it hash-exact."
    ),
    tags=("timeseries", "window", "hof"),
)
def q_ema_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    arr = F.collect_list(F.col("value").cast("double")).over(w)
    framed = e.select("event_id", "user_id", "ts", arr.alias("__l"))
    ema = F.aggregate(
        F.slice(F.col("__l"), F.lit(2), F.greatest(F.size("__l") - 1, F.lit(0))),
        F.element_at(F.col("__l"), 1),
        lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
    )
    return framed.select("event_id", "user_id", "ts", ema.alias("ema"))


@register(
    "q_event_transitions",
    oracle="""
        WITH seq AS (
            SELECT event_type AS next_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        SELECT prev_type, next_type,
               COUNT(*) AS n_transitions,
               CAST(COUNT(*) AS DOUBLE)
                   / SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS p_transition
        FROM seq
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    """,
    doc=(
        "First-order Markov transition matrix over each user's event "
        "sequence: lag() pairs consecutive events per user (total order "
        "ts, event_id), then one count aggregation + a tiny window "
        "normalization per source state. One shuffle on user_id for the "
        "sequence pairing, one on the transition key — both co-partitioned "
        "hash exchanges at any scale; the probability division is exact "
        "integer-ratio arithmetic (bit-identical on both engines)."
    ),
    tags=("timeseries", "window", "event-analytics"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    per_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(per_prev).cast("double")
        ).alias("p_transition"),
    )


@register(
    "q_scd2_intervals",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        changes AS (
            SELECT user_id, event_type AS state, ts AS valid_from,
                   LEAD(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS valid_to
            FROM seq
            WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, state, valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM changes
    """,
    doc=(
        "Change-data-capture to SCD2 (slowly-changing-dimension type 2) "
        "validity intervals: collapse each user's event stream to the rows "
        "where the state (event_type) changes, then close each interval "
        "with the next change's timestamp (lead) — [valid_from, valid_to) "
        "half-open, open-ended current row flagged. Two window passes over "
        "the SAME (user_id ordered) shuffle — Catalyst reuses the exchange, "
        "so the whole history rebuild is one shuffle at any scale; this is "
        "the standard warehouse pattern for turning an append-only event "
        "log into a temporal dimension table."
    ),
    tags=("timeseries", "window", "scd2", "event-analytics"),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return seq.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@register(
    "q_rolling_median",
    oracle="""
        SELECT event_id, user_id,
               MEDIAN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                   AS roll_med
        FROM events
    """,
    doc=(
        "Rolling median over a trailing 10-row frame per key — an operator "
        "Spark lacks (median accepts no ordered frame), composed from "
        "builtins: collect the frame with a window list aggregate, "
        "array_sort it, take the middle element (odd) or the mean of the "
        "two middles (even) — exactly quantile_cont(0.5) interpolation "
        "semantics, matching DuckDB's native windowed MEDIAN. O(frame log "
        "frame) per row with bounded frame size; one shuffle on the series "
        "key. 2-decimal data keeps the even-count average bit-identical "
        "across engines."
    ),
    tags=("timeseries", "window", "median"),
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list(F.col("value")).over(w))
    n = F.size(arr)
    mid = (n / F.lit(2)).cast("int")
    med = (
        F.when(n % 2 == 1, F.element_at(arr, ((n + 1) / F.lit(2)).cast("int")).cast("double"))
        .otherwise((F.element_at(arr, mid) + F.element_at(arr, mid + 1)) / F.lit(2.0))
    )
    return e.select("event_id", "user_id", med.alias("roll_med"))


@register(
    "q_concurrent_events",
    oracle="""
        WITH bounds AS (
            SELECT ts AS t, 1 AS delta FROM events
            UNION ALL
            SELECT ts + INTERVAL 1 HOUR AS t, -1 AS delta FROM events
        ),
        agg AS (
            SELECT t, CAST(SUM(delta) AS BIGINT) AS d
            FROM bounds GROUP BY t
        )
        SELECT t,
               CAST(SUM(d) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS concurrent
        FROM agg
    """,
    doc=(
        "Interval-overlap concurrency via sweep-line: each event holds a "
        "1-hour validity interval [ts, ts+1h); emit +1/-1 boundary deltas, "
        "collapse per distinct boundary time (no tie ambiguity — deltas at "
        "equal t merge before the scan), then a GLOBAL running sum gives "
        "the number of concurrently-open intervals after each boundary. "
        "The running sum is the distributed two-phase parallel scan "
        "(operators/prefix.py::running_total — range partition, local "
        "scans, broadcast offsets), NOT a single-task global window: the "
        "scalable alternative to an O(n²) interval self-join."
    ),
    tags=("timeseries", "sweep-line", "prefix-scan"),
)
def q_concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import running_total

    e = load(spark, sf_dir, "events")
    # Both boundary rows come out of ONE scan via inline() — the former
    # two-projection union read the events table twice (r12, guide §2.2).
    # Same (t, delta) multiset, so the aggregate is unchanged.
    bounds = e.select(
        F.inline(
            F.array(
                F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
                F.struct(
                    (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        )
    )
    agg = bounds.groupBy("t").agg(F.sum("delta").alias("d"))
    return running_total(agg, ["t"], "d", alias="concurrent").select("t", "concurrent")


@register(
    "q_activity_islands",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day
            FROM events
        ),
        ranked AS (
            SELECT user_id, day,
                   DATE_DIFF('day', DATE '1970-01-01', CAST(day AS DATE))
                       - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                       AS anchor
            FROM days
        )
        SELECT user_id,
               MIN(day)  AS streak_start,
               MAX(day)  AS streak_end,
               COUNT(*)  AS n_days
        FROM ranked
        GROUP BY user_id, anchor
    """,
    doc=(
        "Gaps-and-islands: maximal runs of consecutive active days per "
        "user. The classic anchor trick — day-number minus per-user row "
        "rank is constant exactly within a consecutive run — turns island "
        "detection into a plain GROUP BY: one shuffle for the distinct, "
        "one user-partitioned window, one aggregation; all integer/date "
        "arithmetic (hash-exact)."
    ),
    tags=("timeseries", "window", "gaps-islands", "event-analytics"),
)
def q_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    ranked = days.select(
        "user_id",
        "day",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("anchor"),
    )
    return ranked.groupBy("user_id", "anchor").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("anchor")


@register(
    "q_rollup_reaggregate",
    oracle="""
        SELECT event_type,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)
                    / 10000.0 AS sum_value
        FROM events
        GROUP BY event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)
    """,
    doc=(
        "Continuous-aggregate rollup: the DAILY result is computed FROM the "
        "HOURLY pre-aggregate, while the oracle aggregates the raw events "
        "directly — the hash match proves the hourly partials merge "
        "losslessly (fixed-point unit sums are associative integers, so "
        "hour→day→month re-aggregation is exact at every level). This is "
        "the incremental-view-maintenance pattern: at 100 TB the hourly "
        "table is maintained per ingest batch and every coarser window is "
        "served from it without touching raw data; counts and unit sums "
        "are the algebraic aggregates that make that valid (averages are "
        "derived at read time, never stored)."
    ),
    tags=("timeseries", "rollup", "incremental-view"),
)
def q_rollup_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"),
            F.spark_partition_id().alias("__pid"),
        )
        .agg(
            F.count(F.lit(1)).alias("h_n"),
            F.sum(units(F.col("value"), 10000)).alias("h_units"),
        )
    )
    return (
        hourly.groupBy("event_type", F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.sum("h_n").alias("n_events"),
            (
                F.sum(F.col("h_units").cast("decimal(38,0)")).cast("double")
                / F.lit(10000.0)
            ).alias("sum_value"),
        )
    )


@register(
    "q_conversion_latency",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END)     AS first_view,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT user_id, first_view, first_purchase,
               CAST(DATE_DIFF('second', first_view, first_purchase) AS BIGINT)
                   AS latency_sec
        FROM firsts
        WHERE first_view IS NOT NULL
          AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
    """,
    doc=(
        "Conversion latency: per user, seconds from first 'view' to first "
        "subsequent 'purchase' — the time-to-convert metric downstream of "
        "the funnel. Single-pass conditional-MIN aggregation (one shuffle "
        "on user_id, no self-join of the event log), the same "
        "stage-timestamp trick as q_event_funnel; integer second "
        "difference is hash-exact."
    ),
    tags=("timeseries", "event-analytics", "funnel"),
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return (
        firsts.where(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .select(
            "user_id", "first_view", "first_purchase",
            (F.col("first_purchase").cast("long") - F.col("first_view").cast("long")).alias("latency_sec"),
        )
    )


@register(
    "q_window_growth",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
                   COUNT(*) AS n
            FROM events
            GROUP BY event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)
        )
        SELECT event_type, day, n,
               LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n,
               CAST(n - LAG(n) OVER (PARTITION BY event_type ORDER BY day)
                    AS DOUBLE)
                   / LAG(n) OVER (PARTITION BY event_type ORDER BY day)
                   AS growth
        FROM daily
    """,
    doc=(
        "Window-over-window delta: day-over-day growth rate per series — "
        "the KPI-trend shape (aggregate to the window grain, then lag "
        "across windows). The window function runs on the tiny aggregated "
        "table, partitioned by series key — never on raw events; growth is "
        "a single division of exact integers (hash-exact)."
    ),
    tags=("timeseries", "window", "kpi"),
)
def q_window_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("n").over(w)
    return daily.select(
        "event_type", "day", "n",
        prev.alias("prev_n"),
        ((F.col("n") - prev).cast("double") / prev).alias("growth"),
    )


@register(
    "q_data_profile",
    oracle="""
        SELECT
            COUNT(*)                                   AS n_rows,
            CAST(COUNT(*) - COUNT(user_id) AS BIGINT)  AS null_user_id,
            CAST(COUNT(*) - COUNT(value) AS BIGINT)    AS null_value,
            CAST(COUNT(*) - COUNT(props) AS BIGINT)    AS null_props,
            COUNT(DISTINCT event_type)                 AS distinct_types,
            COUNT(DISTINCT user_id)                    AS distinct_users,
            CAST(MIN(ts) AS TIMESTAMP)                 AS min_ts,
            CAST(MAX(ts) AS TIMESTAMP)                 AS max_ts,
            MIN(value)                                 AS min_value,
            MAX(value)                                 AS max_value
        FROM events
    """,
    doc=(
        "Single-pass data-quality profile: null counts, distinct counts, "
        "and ranges for the event stream — the ingest-validation audit "
        "every pipeline runs before trusting a new batch. One aggregation "
        "(multi-distinct plans as one Expand), no per-column scans; at "
        "100 TB this is a map-side-heavy single shuffle."
    ),
    tags=("profile", "quality", "agg"),
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("user_id")).alias("null_user_id"),
        (F.count(F.lit(1)) - F.count("value")).alias("null_value"),
        (F.count(F.lit(1)) - F.count("props")).alias("null_props"),
        F.countDistinct("event_type").alias("distinct_types"),
        F.countDistinct("user_id").alias("distinct_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "q_type_affinity",
    oracle="""
        WITH sets AS (
            SELECT DISTINCT user_id, event_type FROM events
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_users
        FROM sets a JOIN sets b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    """,
    doc=(
        "Market-basket affinity: for every pair of event types, how many "
        "users exhibit both. The oracle self-joins the (user, type) set; "
        "the Spark plan instead collects each user's DISTINCT type set "
        "(bounded by the type-vocabulary size, NOT by event count) and "
        "expands ordered pairs with nested array HOFs — per-user work is "
        "O(|types|²) with no join, and the pair counts aggregate map-side. "
        "The self-join-free form is the one that survives 100 TB: the "
        "event log is touched once."
    ),
    tags=("event-analytics", "affinity", "hof"),
)
def q_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sets = (
        e.groupBy("user_id").agg(
            F.array_sort(F.collect_set("event_type")).alias("types")
        )
    )
    # Ordered pairs (a < b) from the sorted set: for index i, pair with
    # every later element — flatten(transform(i -> transform(j -> struct)))
    pairs = F.flatten(
        F.transform(
            F.col("types"),
            lambda t, i: F.transform(
                F.slice(F.col("types"), i + 2, F.size(F.col("types"))),
                lambda u: F.struct(t.alias("type_a"), u.alias("type_b")),
            ),
        )
    )
    return (
        sets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.type_a"), F.col("p.type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q_snapshot_upsert",
    oracle="""
        SELECT user_id, ts, event_type, value
        FROM (
            SELECT user_id, ts, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc=(
        "SCD1 snapshot + CDC upsert (latest-wins MERGE without a table "
        "format): the standing per-user state table (latest row before the "
        "cutoff) full-outer-merged with the delta batch (latest row after), "
        "delta winning on conflict. The oracle computes the same current "
        "state directly over all events — the merge must be lossless. At "
        "scale both sides reduce map-side to one row per key before the "
        "merge join, and the standing side would be a bucketed table so the "
        "merge is co-located."
    ),
    tags=("timeseries", "cdc", "upsert", "scd1"),
)
def q_snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.select("user_id", "ts", "event_type", "value", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    base = latest(e.where(F.col("ts") < cut))
    delta = latest(e.where(F.col("ts") >= cut))
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(d, F.col("b.user_id") == F.col("d.user_id"), "full_outer")
    # Switch on delta-row PRESENCE (its join key), not per-column coalesce:
    # a delta row carrying a legitimately-NULL payload column must still win.
    take_delta = F.col("d.user_id").isNotNull()

    def pick(col: str):
        return F.when(take_delta, F.col(f"d.{col}")).otherwise(F.col(f"b.{col}")).alias(col)

    return merged.select(
        F.coalesce(F.col("d.user_id"), F.col("b.user_id")).alias("user_id"),
        pick("ts"),
        pick("event_type"),
        pick("value"),
    )


@register(
    "q_influxql_raw_series",
    oracle="""
        SELECT ts AS time, value
        FROM events
        WHERE event_type = 'click'
          AND ts >= TIMESTAMP '2024-01-05 00:00:00'
          AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    """,
    doc=(
        "The Grafana panel query (dashboard.json:86-111) run VERBATIM as "
        "InfluxQL through functions/influxql.py — the reference's end-user "
        "query language translated to a declarative plan (projection + tag "
        "equality + time range, all pushed to the scan)."
    ),
    tags=("timeseries", "influxql", "reference-parity"),
)
def q_influxql_raw_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT \"value\" FROM \"events\" WHERE \"event_type\" = 'click' "
        "AND time >= '2024-01-05 00:00:00' AND time < '2024-01-12 00:00:00' "
        "ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_groupby_fill",
    oracle="""
        WITH spine AS (
            SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                          TIMESTAMP '2024-01-30 23:00:00',
                                          INTERVAL 6 HOUR)) AS time
        ),
        agg AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 21600000000) AS BIGINT)
                                  * 21600000000) AS time,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS mean
            FROM events
            WHERE event_type = 'error'
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-30 23:00:00'
            GROUP BY 1
        )
        SELECT s.time, a.mean FROM spine s LEFT JOIN agg a ON s.time = a.time
    """,
    doc=(
        "The Grafana re-aggregation query (dashboard.json:295-331) as "
        "verbatim InfluxQL: GROUP BY time(6h) + mean + fill(null), "
        "translated to epoch bucketing + exact decimal mean + broadcast "
        "time-spine left join."
    ),
    tags=("timeseries", "influxql", "gapfill", "reference-parity"),
)
def q_influxql_groupby_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT mean(\"value\") FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-30 23:00:00' "
        "AND \"event_type\" = 'error' "
        "GROUP BY time(6h) fill(null) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_spread_series",
    oracle="""
        WITH spine AS (
            SELECT s.time, t.event_type
            FROM (SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                                TIMESTAMP '2024-01-30 23:59:59',
                                                INTERVAL 1 DAY)) AS time) s
            CROSS JOIN (SELECT DISTINCT event_type FROM events
                        WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
                          AND ts <= TIMESTAMP '2024-01-30 23:59:59') t
        ),
        agg AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                                  * 86400000000) AS time,
                   event_type,
                   MAX(value) - MIN(value) AS spread
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-30 23:59:59'
            GROUP BY 1, 2
        )
        SELECT s.time, s.event_type, COALESCE(a.spread, 0.0) AS spread
        FROM spine s LEFT JOIN agg a
          ON s.time = a.time AND s.event_type = a.event_type
    """,
    doc=(
        "InfluxQL dispersion series: SELECT spread(value) GROUP BY "
        "time(1d), tag fill(0) — a multi-series daily range chart with "
        "constant-filled holes, run VERBATIM through the translator "
        "(functions/influxql.py). spread = max − min of 2-dp values is "
        "exactly representable, and the tag-crossed spine is an O(days × "
        "#tags) broadcast — fully deterministic, unlike selector "
        "aggregates whose engine tie-breaks on equal timestamps differ."
    ),
    tags=("timeseries", "influxql", "reference-parity"),
)
def q_influxql_spread_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT spread(\"value\") FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-30 23:59:59' "
        "GROUP BY time(1d), \"event_type\" fill(0) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_moving_average",
    oracle="""
        WITH agg AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                                  * 86400000000) AS time,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS mean
            FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-30 23:59:59'
            GROUP BY 1
        ),
        w AS (
            SELECT time,
                   AVG(mean) OVER (ORDER BY time ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS moving_average,
                   COUNT(*) OVER (ORDER BY time ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS n
            FROM agg
        )
        SELECT time, moving_average FROM w WHERE n = 3
    """,
    doc=(
        "InfluxQL moving_average(mean(value), 3) GROUP BY time(1d) — the "
        "smoothed-series panel shape, run VERBATIM through the translator. "
        "The window runs on the aggregated daily grain (O(days), not fact "
        "rows) with InfluxDB's warm-up semantics (first N-1 points "
        "dropped); the mean underneath is the exact decimal aggregation, "
        "so the 3-term window average is bit-reproducible."
    ),
    tags=("timeseries", "influxql", "window", "reference-parity"),
)
def q_influxql_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT moving_average(mean(\"value\"), 3) FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-30 23:59:59' "
        "AND \"event_type\" = 'click' "
        "GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_cumulative_sum",
    oracle="""
        WITH agg AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                                  * 86400000000) AS time,
                   event_type,
                   COUNT(value) AS cnt
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-30 23:59:59'
            GROUP BY 1, 2
        )
        SELECT time, event_type,
               CAST(SUM(CAST(cnt AS DOUBLE)) OVER (
                   PARTITION BY event_type ORDER BY time
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS cumulative_sum
        FROM agg
    """,
    doc=(
        "InfluxQL cumulative_sum(count(value)) GROUP BY time(1d), tag — "
        "running per-series totals, verbatim through the translator. "
        "Per-tag window over the daily grain; counts are exactly "
        "representable as doubles, and the running sum is sequential in "
        "both engines, so values hash-match."
    ),
    tags=("timeseries", "influxql", "window", "reference-parity"),
)
def q_influxql_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT cumulative_sum(count(\"value\")) FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-30 23:59:59' "
        "GROUP BY time(1d), \"event_type\" ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_integral",
    oracle="""
        WITH pts AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                                  * 86400000000) AS time,
                   CAST(value AS DOUBLE) AS v,
                   epoch_us(ts) AS t
            FROM events
            WHERE event_type = 'view'
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-30 23:59:59'
        ),
        lagged AS (
            SELECT time, v, t,
                   LAG(v) OVER (PARTITION BY time ORDER BY t, v) AS pv,
                   LAG(t) OVER (PARTITION BY time ORDER BY t, v) AS pt
            FROM pts
        )
        SELECT time,
               CAST(SUM(CAST(ROUND((v + pv) * 10000) AS BIGINT) * (t - pt))
                    AS DOUBLE) / (2.0 * 10000.0 * 1000000.0) AS integral
        FROM lagged
        WHERE pv IS NOT NULL
        GROUP BY time
    """,
    doc=(
        "InfluxQL integral(value) GROUP BY time(1d) — trapezoidal area "
        "under consecutive points within each daily bucket (no "
        "interpolation across boundaries), the energy/consumption panel "
        "shape, verbatim through the translator. The per-pair area "
        "numerator is an exact int64 (fixed-point 1e4 x integer-µs delta) "
        "summed in decimal — order-independent, so it hash-matches DuckDB "
        "at any partitioning; lag pairing is (t, v)-ordered so duplicate "
        "timestamps pair deterministically in both engines. The window "
        "partitions on (bucket), never the whole series — bounded rows per "
        "partition at any scale."
    ),
    tags=("timeseries", "influxql", "window", "reference-parity"),
)
def q_influxql_integral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT integral(\"value\") FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-30 23:59:59' "
        "AND \"event_type\" = 'view' "
        "GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_subquery_downsample",
    oracle="""
        WITH hourly AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT)
                                  * 3600000000) AS time,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS mean
            FROM events
            WHERE event_type = 'error'
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-30 23:59:59'
            GROUP BY 1
        )
        SELECT make_timestamp(CAST(FLOOR(epoch_us(time) / 86400000000) AS BIGINT)
                              * 86400000000) AS time,
               MAX(mean) AS max
        FROM hourly
        GROUP BY 1
    """,
    doc=(
        "InfluxQL FROM-subquery — InfluxDB's downsample-then-aggregate "
        "idiom, verbatim through the translator: inner hourly exact-decimal "
        "mean, outer daily max of those means. The recursion exposes the "
        "inner statement's result as a synthetic measurement; both levels "
        "stay one declarative plan (hourly grain agg -> daily grain agg, no "
        "materialization between them)."
    ),
    tags=("timeseries", "influxql", "subquery", "reference-parity"),
)
def q_influxql_subquery_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT max(\"mean\") FROM ("
        "SELECT mean(\"value\") FROM \"events\" "
        "WHERE \"event_type\" = 'error' "
        "AND time >= '2024-01-01 00:00:00' AND time <= '2024-01-30 23:59:59' "
        "GROUP BY time(1h)"
        ") GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_multi_stat",
    oracle="""
        SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                              * 86400000000) AS time,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS mean,
               MAX(value) AS max,
               MIN(value) AS min,
               COUNT(value) AS count
        FROM events
        WHERE event_type = 'purchase'
          AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <= TIMESTAMP '2024-01-30 23:59:59'
        GROUP BY 1
    """,
    doc=(
        "InfluxQL multi-aggregate SELECT (mean, max, min, count in one "
        "statement) GROUP BY time(1d) — the multi-stat panel query, "
        "verbatim through the translator: all aggregates share ONE bucketed "
        "hash-agg pass (one shuffle for four statistics)."
    ),
    tags=("timeseries", "influxql", "agg", "reference-parity"),
)
def q_influxql_multi_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT mean(\"value\"), max(\"value\"), min(\"value\"), count(\"value\") "
        "FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-30 23:59:59' "
        "AND \"event_type\" = 'purchase' "
        "GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_top_n",
    oracle="""
        SELECT ts AS time, value AS top
        FROM (
            SELECT ts, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY make_timestamp(
                           CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                           * 86400000000)
                       ORDER BY value DESC, ts ASC) AS rn
            FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-15 00:00:00'
        )
        WHERE rn <= 3
    """,
    doc=(
        "InfluxQL selector aggregate TOP(field, N) per day bucket — the "
        "Grafana 'top N spikes per interval' idiom, run VERBATIM through "
        "the translator (functions/influxql.py::_top_bottom). Unlike max(), "
        "each returned row keeps its ORIGINAL point timestamp; ties break "
        "on earlier time, so both engines select identically. Scale: "
        "row_number over a (bucket)-partitioned window — bounded rows per "
        "partition at any fact scale, no global sort."
    ),
    tags=("timeseries", "influxql", "topk"),
)
def q_influxql_top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT top(\"value\", 3) FROM \"events\" "
        "WHERE \"event_type\" = 'click' "
        "AND time >= '2024-01-01 00:00:00' AND time <= '2024-01-15 00:00:00' "
        "GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_regex_tag",
    oracle="""
        SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                              * 86400000000) AS time,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value)
                   AS mean
        FROM events
        WHERE regexp_matches(event_type, 'click|view')
          AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <= TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1
    """,
    doc=(
        "InfluxQL regex tag predicate — WHERE \"event_type\" =~ /click|view/ "
        "— the filter Grafana renders for multi-value template variables in "
        "'All' mode, with a daily mean series. rlike and DuckDB "
        "regexp_matches share the unanchored-match contract."
    ),
    tags=("timeseries", "influxql", "filter"),
)
def q_influxql_regex_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT mean(\"value\") FROM \"events\" "
        "WHERE \"event_type\" =~ /click|view/ "
        "AND time >= '2024-01-01 00:00:00' AND time <= '2024-01-15 00:00:00' "
        "GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_elapsed",
    oracle="""
        SELECT time, elapsed FROM (
            SELECT ts AS time,
                   CAST(FLOOR((epoch_us(ts) - LAG(epoch_us(ts)) OVER (ORDER BY ts))
                        / 1000000.0) AS BIGINT) AS elapsed
            FROM events
            WHERE event_type = 'purchase'
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <  TIMESTAMP '2024-01-03 00:00:00'
        )
        WHERE elapsed IS NOT NULL
    """,
    doc=(
        "InfluxQL elapsed(field, 1s): truncated integer seconds between "
        "consecutive observed points of a series (first point dropped) — "
        "the cadence/heartbeat-gap diagnostic. The single-series window is "
        "bounded by the WHERE time range, the same contract as the raw "
        "projection path. Values depend only on the time sequence, so "
        "equal-timestamp ties cannot diverge between engines."
    ),
    tags=("timeseries", "influxql", "interarrival"),
)
def q_influxql_elapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT elapsed(\"value\", 1s) FROM \"events\" "
        "WHERE \"event_type\" = 'purchase' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-03 00:00:00' "
        "ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_percentile_series",
    oracle="""
        SELECT time, value AS percentile FROM (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                                  * 86400000000) AS time,
                   value,
                   ROW_NUMBER() OVER (
                       PARTITION BY CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                       ORDER BY value) AS rn,
                   COUNT(*) OVER (
                       PARTITION BY CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                   ) AS n
            FROM events
            WHERE event_type = 'view'
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-15 00:00:00'
        )
        WHERE rn = CAST(FLOOR(n * 95 / 100.0 + 0.5) AS BIGINT) AND rn >= 1
    """,
    doc=(
        "InfluxQL PERCENTILE(value, 95) per day — nearest-rank semantics "
        "(functions/influxql.py::_agg_column: idx = floor(n*p/100 + 0.5), "
        "an ACTUAL sample point, matching influxdb functions.go "
        "PercentileReduce — NOT interpolated like Spark percentile / DuckDB "
        "quantile_cont). The oracle reproduces the same rank selection via "
        "row_number, so both engines pick identical sample values; "
        "duplicate values at the rank boundary yield the same scalar "
        "either way."
    ),
    tags=("timeseries", "influxql", "percentile"),
)
def q_influxql_percentile_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT percentile(\"value\", 95) FROM \"events\" "
        "WHERE \"event_type\" = 'view' "
        "AND time >= '2024-01-01 00:00:00' AND time <= '2024-01-15 00:00:00' "
        "GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_holt_winters",
    oracle=None,  # optimizer-fitted forecast: no SQL equivalent exists; the
    # math is pinned by closed-form tests (tests/test_forecast.py: constant/
    # linear/seasonal series forecast exactly; deterministic across runs)
    doc=(
        "InfluxQL HOLT_WINTERS(mean(value), 7, 7): one-week daily-seasonal "
        "forecast of the daily mean — additive triple exponential smoothing "
        "with per-series Nelder-Mead-fitted parameters "
        "(functions/forecast.py). The aggregate runs declaratively; only "
        "the bounded per-series smoothing recursion runs in Python "
        "(applyInPandas over ~30 daily buckets), so raw facts never reach "
        "Python and distinct series parallelize across the cluster."
    ),
    tags=("timeseries", "influxql", "forecast"),
)
def q_influxql_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT holt_winters(mean(\"value\"), 7, 7) FROM \"events\" "
        "WHERE \"event_type\" = 'view' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-29 00:00:00' "
        "GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_mode_series",
    oracle="""
        WITH counts AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                                  * 86400000000) AS time,
                   value,
                   COUNT(*) AS cnt
            FROM events
            WHERE event_type = 'error'
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY 1, 2
        )
        SELECT time, value AS mode FROM (
            SELECT time, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY time ORDER BY cnt DESC, value ASC) AS rn
            FROM counts
        )
        WHERE rn = 1
    """,
    doc=(
        "InfluxQL MODE(value) per day — most frequent value with InfluxDB's "
        "deterministic tie rule (lowest value wins), which Spark mode() and "
        "DuckDB mode() both lack: implemented as a fold over the "
        "ascending-sorted group samples (functions/influxql.py::_agg_column)"
        ", oracle-checked against an explicit count-desc/value-asc "
        "row_number ranking so both engines break ties identically."
    ),
    tags=("timeseries", "influxql", "stats"),
)
def q_influxql_mode_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT mode(\"value\") FROM \"events\" "
        "WHERE \"event_type\" = 'error' "
        "AND time >= '2024-01-01 00:00:00' AND time <= '2024-01-15 00:00:00' "
        "GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_distinct_series",
    oracle="""
        SELECT DISTINCT
               make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                              * 86400000000) AS time,
               ROUND(value) AS distinct
        FROM events
        WHERE event_type = 'signup'
          AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <= TIMESTAMP '2024-01-08 00:00:00'
    """,
    doc=(
        "InfluxQL DISTINCT(field) per day bucket — the multi-row "
        "'aggregate' (one row per distinct value per bucket; InfluxDB "
        "semantics). Rounded to integers so the distinct set per day is "
        "small and stable. Plan: select + dropDuplicates = one map-side-"
        "combined hash-aggregate shuffle on (bucket, value)."
    ),
    tags=("timeseries", "influxql", "distinct"),
)
def q_influxql_distinct_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    # F.round = HALF_UP like DuckDB's ROUND; F.rint would round half-to-even
    # and diverge on exact .5 values (present at sf0.1: 53.5, 2.5, ...)
    e = load(spark, sf_dir, "events").withColumn("value", F.round(F.col("value"), 0))
    q = (
        "SELECT distinct(\"value\") FROM \"events\" "
        "WHERE \"event_type\" = 'signup' "
        "AND time >= '2024-01-01 00:00:00' AND time <= '2024-01-08 00:00:00' "
        "GROUP BY time(1d) ORDER BY time ASC"
    )
    return influxql(q, {"events": e})


@register(
    "q_influxql_time_offset",
    oracle="""
        SELECT make_timestamp(CAST(
                   FLOOR((epoch_us(ts) - 21600000000) / 86400000000)
                   * 86400000000 + 21600000000 AS BIGINT)) AS time,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value)
                   AS mean
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <= TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1
    """,
    doc=(
        "InfluxQL GROUP BY time(1d, 6h) — the offset_interval clause: the "
        "daily bucket grid shifted to start at 06:00 (the 'business day' "
        "alignment idiom). functions/influxql.py::_bucket_us normalizes "
        "negative offsets onto the same grid (time(1d,-18h) is identical) "
        "and the shift composes with tz(), fill() spines, and the "
        "streaming path's window(..., startTime). Plan shape is unchanged "
        "from any bucketed aggregate: map-side partial agg, one exchange."
    ),
    tags=("timeseries", "influxql", "bucket"),
)
def q_influxql_time_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT mean(\"value\") FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-15 00:00:00' "
        "GROUP BY time(1d, 6h) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_limit_offset",
    oracle="""
        SELECT time, event_type, count FROM (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000)
                       AS BIGINT) * 86400000000) AS time,
                   event_type,
                   COUNT(value) AS count,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY make_timestamp(CAST(FLOOR(epoch_us(ts)
                           / 86400000000) AS BIGINT) * 86400000000)) AS rn
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY 1, 2
        ) WHERE rn > 2 AND rn <= 5
    """,
    doc=(
        "InfluxQL LIMIT 3 OFFSET 2 on a tag-grouped bucket series — "
        "InfluxDB's point pagination: with a tag in GROUP BY the limit "
        "applies PER SERIES in time order (buckets 3..5 of every "
        "event_type series), not globally. Plan: row_number over a "
        "tag-partitioned window on the aggregate — partitions are bounded "
        "by the queried range/interval, never fact-sized; ungrouped "
        "queries instead bound the input with TakeOrdered(offset+limit) "
        "before a one-partition row_number over that LIMIT-sized set "
        "(functions/influxql.py::_points_limit)."
    ),
    tags=("timeseries", "influxql", "pagination"),
)
def q_influxql_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT count(\"value\") FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-15 00:00:00' "
        "GROUP BY time(1d), \"event_type\" ORDER BY time ASC LIMIT 3 OFFSET 2"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_slimit",
    oracle="""
        WITH series AS (
            SELECT event_type,
                   ROW_NUMBER() OVER (ORDER BY event_type) AS sn
            FROM (SELECT DISTINCT event_type FROM events
                  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
                    AND ts <= TIMESTAMP '2024-01-08 00:00:00')
        )
        SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000)
                   AS BIGINT) * 86400000000) AS time,
               e.event_type,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value)
                   AS mean
        FROM events e JOIN series s ON e.event_type = s.event_type
        WHERE s.sn > 1 AND s.sn <= 3
          AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <= TIMESTAMP '2024-01-08 00:00:00'
        GROUP BY 1, 2
    """,
    doc=(
        "InfluxQL SLIMIT 2 SOFFSET 1 — SERIES pagination (series 2..3 in "
        "lexical tag order, every point of each kept series; InfluxDB's "
        "series-key order for a single tag). Scale: only the DISTINCT tag "
        "values are ranked (series cardinality, not fact rows) and the "
        "broadcast survivor set semi-joins the aggregate — no window over "
        "data rows (functions/influxql.py::_series_filter)."
    ),
    tags=("timeseries", "influxql", "pagination"),
)
def q_influxql_slimit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT mean(\"value\") FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-08 00:00:00' "
        "GROUP BY time(1d), \"event_type\" ORDER BY time ASC SLIMIT 2 SOFFSET 1"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_now_relative",
    oracle="""
        WITH spine AS (
            SELECT UNNEST(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                          TIMESTAMP '2024-01-07 12:00:00',
                                          INTERVAL 12 HOUR)) AS time
        ),
        agg AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 43200000000) AS BIGINT)
                                  * 43200000000) AS time,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value)
                       AS mean
            FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND ts <  TIMESTAMP '2024-01-08 00:00:00'
            GROUP BY 1
        )
        SELECT s.time, a.mean FROM spine s LEFT JOIN agg a ON s.time = a.time
    """,
    doc=(
        "Grafana's live $timeFilter as actually rendered — WHERE time >= "
        "now() - 3d AND time < now() — with now() pinned to 2024-01-08 for "
        "determinism (functions/influxql.py::_resolve_time_expr). Exercises "
        "duration arithmetic on now() AND the strict-< spine contract: the "
        "bucket starting exactly at the exclusive upper bound is NOT in the "
        "fill spine (InfluxDB emits buckets whose start lies in [lo, hi))."
    ),
    tags=("timeseries", "influxql", "gapfill"),
)
def q_influxql_now_relative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT mean(\"value\") FROM \"events\" "
        "WHERE \"event_type\" = 'click' "
        "AND time >= now() - 3d AND time < now() "
        "GROUP BY time(12h) fill(null) ORDER BY time ASC"
    )
    return influxql(
        q, {"events": load(spark, sf_dir, "events")}, now="2024-01-08 00:00:00"
    )


@register(
    "q_influxql_multi_tag_fill",
    oracle="""
        WITH spine AS (
            SELECT s.time, t.event_type, t.region
            FROM (SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                                TIMESTAMP '2024-01-15 00:00:00',
                                                INTERVAL 1 DAY)) AS time) s
            CROSS JOIN (SELECT DISTINCT event_type,
                               'r' || CAST(user_id % 3 AS VARCHAR) AS region
                        FROM events
                        WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
                          AND ts <= TIMESTAMP '2024-01-15 00:00:00') t
        ),
        agg AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                                  * 86400000000) AS time,
                   event_type,
                   'r' || CAST(user_id % 3 AS VARCHAR) AS region,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE)
                       / COUNT(value) AS mean
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY 1, 2, 3
        )
        SELECT s.time, s.event_type, s.region, a.mean
        FROM spine s
        LEFT JOIN agg a
          ON s.time = a.time AND s.event_type = a.event_type
         AND s.region = a.region
    """,
    doc=(
        "Multi-tag GROUP BY time(1d), \"event_type\", \"region\" fill(null) — "
        "one series per TAG TUPLE, the spine covering every observed tuple "
        "(InfluxDB fills per existing series; functions/influxql.py "
        "_group_tags). The second tag is user-derived, the idiom of mapping "
        "a dimension onto an InfluxDB tag."
    ),
    tags=("timeseries", "influxql", "gapfill"),
)
def q_influxql_multi_tag_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    events = load(spark, sf_dir, "events").withColumn(
        "region", F.concat(F.lit("r"), (F.col("user_id") % 3).cast("string"))
    )
    q = (
        "SELECT mean(\"value\") FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-15 00:00:00' "
        "GROUP BY time(1d), \"event_type\", \"region\" fill(null) "
        "ORDER BY time ASC"
    )
    return influxql(q, {"events": events})


@register(
    "q_influxql_group_by_star",
    oracle="""
        SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 604800000000) AS BIGINT)
                              * 604800000000) AS time,
               event_type, props,
               COUNT(value) AS count
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <  TIMESTAMP '2024-01-29 00:00:00'
        GROUP BY 1, 2, 3
    """,
    doc=(
        "GROUP BY time(7d), * — star expands to every tag column "
        "(string-typed, the SHOW TAG KEYS set: event_type and props here), "
        "matching InfluxDB's GROUP BY * series explosion."
    ),
    tags=("timeseries", "influxql"),
)
def q_influxql_group_by_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT count(\"value\") FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-29 00:00:00' "
        "GROUP BY time(7d), *"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_from_regex",
    oracle="""
        SELECT 'events_click' AS measurement,
               make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                              * 86400000000) AS time,
               COUNT(value) AS count
        FROM events
        WHERE event_type = 'click'
          AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <  TIMESTAMP '2024-01-08 00:00:00'
        GROUP BY 2
        UNION ALL
        SELECT 'events_view' AS measurement,
               make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                              * 86400000000) AS time,
               COUNT(value) AS count
        FROM events
        WHERE event_type = 'view'
          AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <  TIMESTAMP '2024-01-08 00:00:00'
        GROUP BY 2
    """,
    doc=(
        "FROM /^events_/ — regex measurement selection: the statement runs "
        "against EACH matched measurement independently (InfluxDB never "
        "merges series across measurements) and stacks the per-measurement "
        "blocks under a leading measurement column. The plan is a union of "
        "independent bucketed aggregates — no cross-measurement shuffle."
    ),
    tags=("timeseries", "influxql"),
)
def q_influxql_from_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    events = load(spark, sf_dir, "events")
    tables = {
        "events_click": events.where(F.col("event_type") == "click"),
        "events_view": events.where(F.col("event_type") == "view"),
        "unrelated": events,
    }
    q = (
        "SELECT count(\"value\") FROM /^events_/ "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-08 00:00:00' "
        "GROUP BY time(1d)"
    )
    return influxql(q, tables)


@register(
    "q_influxql_select_into",
    oracle="""
        WITH daily AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                                  * 86400000000) AS time,
                   event_type,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE)
                       / COUNT(value) AS mean
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <  TIMESTAMP '2024-01-29 00:00:00'
            GROUP BY 1, 2
        )
        SELECT event_type, MAX(mean) AS max FROM daily GROUP BY event_type
    """,
    doc=(
        "SELECT ... INTO \"daily\" ... then re-query the materialized "
        "measurement — InfluxQL's continuous-query / downsampling idiom "
        "run as two statements over one tables mapping. The INTO result is "
        "a lazy DataFrame registered under the target name; the requery "
        "composes plans (downsample -> max) exactly like a CQ-fed panel."
    ),
    tags=("timeseries", "influxql"),
)
def q_influxql_select_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    tables = {"events": load(spark, sf_dir, "events")}
    influxql(
        "SELECT mean(\"value\") INTO \"daily\" FROM \"events\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-29 00:00:00' "
        "GROUP BY time(1d), \"event_type\"",
        tables,
    )
    return influxql('SELECT max("mean") FROM "daily" GROUP BY "event_type"', tables)


@register(
    "q_influxql_agg_math",
    oracle="""
        WITH spine AS (
            -- the 2-day epoch grid floors 2024-01-01 onto 2023-12-31
            SELECT UNNEST(generate_series(TIMESTAMP '2023-12-31 00:00:00',
                                          TIMESTAMP '2024-01-21 00:00:00',
                                          INTERVAL 2 DAY)) AS time
        ),
        agg AS (
            SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 172800000000) AS BIGINT)
                                  * 172800000000) AS time,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE)
                       / COUNT(value) * 100 AS mean_pct
            FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-21 00:00:00'
            GROUP BY 1
        )
        SELECT s.time, a.mean_pct FROM spine s LEFT JOIN agg a ON s.time = a.time
    """,
    doc=(
        "Projection arithmetic + AS alias: SELECT mean(\"value\") * 100 AS "
        "mean_pct — Grafana's unit-conversion idiom. The scalar math applies "
        "to the aggregate BEFORE fill() (a fill constant is emitted "
        "verbatim, never scaled — InfluxDB's order of operations); the AS "
        "alias names the output column."
    ),
    tags=("timeseries", "influxql", "gapfill"),
)
def q_influxql_agg_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT mean(\"value\") * 100 AS mean_pct FROM \"events\" "
        "WHERE \"event_type\" = 'click' "
        "AND time >= '2024-01-01 00:00:00' AND time <= '2024-01-21 00:00:00' "
        "GROUP BY time(2d) fill(null) ORDER BY time ASC"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})


@register(
    "q_influxql_field_math",
    oracle="""
        SELECT ts AS time, value / 100 AS load_ratio
        FROM events
        WHERE event_type = 'error'
          AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <  TIMESTAMP '2024-01-08 00:00:00'
    """,
    doc=(
        "Raw field arithmetic: SELECT \"value\" / 100 AS load_ratio — "
        "per-point map-side math, no shuffle; the AS alias is REQUIRED for "
        "arithmetic projections (loud contract instead of InfluxDB's "
        "generated expression names)."
    ),
    tags=("timeseries", "influxql"),
)
def q_influxql_field_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.influxql import influxql

    q = (
        "SELECT \"value\" / 100 AS load_ratio FROM \"events\" "
        "WHERE \"event_type\" = 'error' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-08 00:00:00'"
    )
    return influxql(q, {"events": load(spark, sf_dir, "events")})
