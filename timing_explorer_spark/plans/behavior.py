"""Behavioral / audience analytics over the events stream.

Builds on the event-analytics family (plans/timeseries.py: funnel, cohort
retention, Markov transitions) with the session-sequence and audience-level
queries a product-analytics stack runs, each declarative and oracle-checked:

  q_event_trigrams   most common 3-step event-type sequences within a user's
                     stream (the order-2 extension of the Markov transition
                     matrix q_event_transitions).
  q_wau_stickiness   rolling 7-day active users per day + DAU/WAU stickiness
                     — the distinct-users-over-a-sliding-window shape Spark
                     has no native window aggregate for, built as a bounded
                     contribution explode over the (user, day) grain.
  q_audience_overlap pairwise Jaccard overlap of the user audiences of each
                     event type (cross-feature cannibalization report).

Scale notes: trigrams window on (user) — millions of small partitions, no
global sort; WAU explodes the (user, day) DISTINCT grain ×7 (grain-sized,
not fact-sized) and never keeps per-window user sets in one task; audience
overlap self-joins the (type, user) distinct grain on user_id, where per-key
width is bounded by #event-types, so the pair blow-up of a generic self-join
cannot occur. All counts are integers; the two ratios are single mirrored
double divisions — bit-deterministic everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import register

_DEC = "decimal(38,0)"


@register(
    "q_event_trigrams",
    oracle="""
        WITH t AS (
            SELECT user_id,
                   LAG(event_type, 2) OVER w AS e1,
                   LAG(event_type, 1) OVER w AS e2,
                   event_type AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT e1, e2, e3, COUNT(*) AS cnt
        FROM t WHERE e1 IS NOT NULL
        GROUP BY e1, e2, e3
        ORDER BY cnt DESC, e1, e2, e3
        LIMIT 25
    """,
    doc=(
        "Top 3-step event sequences across all user streams — the order-2 "
        "sequence-mining extension of q_event_transitions (order-1 Markov). "
        "One (user)-partitioned lag window (total order (ts, event_id) — "
        "deterministic under duplicate timestamps), one hash agg on the "
        "trigram key, TakeOrderedAndProject for the deterministic "
        "(cnt DESC, lexicographic) top-25 — no global sort of the counts."
    ),
    tags=("events", "sequence", "behavior"),
)
def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        F.lag("event_type", 2).over(w).alias("e1"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.col("event_type").alias("e3"),
    ).where(F.col("e1").isNotNull())
    return (
        t.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "e1", "e2", "e3")
        .limit(25)
    )


@register(
    "q_wau_stickiness",
    oracle="""
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day
            FROM events
        ),
        dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
        contrib AS (
            SELECT user_id,
                   UNNEST(generate_series(day, day + INTERVAL 6 DAY,
                                          INTERVAL 1 DAY)) AS wday
            FROM ud
        ),
        wau AS (SELECT wday, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY wday)
        SELECT d.day, d.dau, w.wau,
               CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
        FROM dau d JOIN wau w ON d.day = w.wday
    """,
    doc=(
        "Rolling 7-day active users and DAU/WAU stickiness per day. "
        "COUNT(DISTINCT user) over a sliding window has no mergeable window "
        "aggregate (distinct is not algebraic); the scalable form explodes "
        "each (user, day) of the DISTINCT activity grain into the 7 window "
        "ends it contributes to, then counts distinct per end-day — the "
        "explode is grain-sized ×7, never fact-sized, and no task ever "
        "holds a window's full user set. Inner join to DAU keeps only "
        "observed days (windows past the last activity day drop out). The "
        "HLL-sketch drop-in for approximate WAU at extreme user counts is "
        "q_hll_distinct_rollup's union pattern."
    ),
    tags=("events", "retention", "behavior", "window"),
)
def q_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ud = e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("wday"),
    )
    wau = contrib.groupBy("wday").agg(F.count_distinct("user_id").alias("wau"))
    return dau.join(wau, dau.day == wau.wday).select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias("stickiness"),
    )


@register(
    "q_audience_overlap",
    oracle="""
        WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
        sizes AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type),
        inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_both
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        )
        SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
               CAST(i.n_both AS DOUBLE)
                   / CAST(sa.n + sb.n - i.n_both AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.event_type = i.type_a
        JOIN sizes sb ON sb.event_type = i.type_b
    """,
    doc=(
        "Audience-overlap matrix: for every pair of event types, the Jaccard "
        "similarity of their user sets — the cross-feature cannibalization / "
        "co-engagement report. The (type, user) DISTINCT grain self-joins on "
        "user_id, where per-user width is bounded by #event-types (single "
        "digits), so candidate pairs grow linearly with users — the same "
        "bounded-inverted-index argument as q_cross_source_dup. Audience "
        "sizes are a tiny broadcast. Exact integer counts; one mirrored "
        "double division."
    ),
    tags=("events", "similarity", "behavior"),
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ut = e.select("event_type", "user_id").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select(F.col("event_type").alias("type_a"), "user_id")
    b = ut.select(F.col("event_type").alias("type_b"), F.col("user_id").alias("uid_b"))
    inter = (
        a.join(b, (F.col("user_id") == F.col("uid_b")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
            ).alias("jaccard"),
        )
    )


@register(
    "q_pit_activity_state",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts, p.value,
               s.ts AS asof_ts, s.event_type AS asof_state
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events
                        WHERE event_type IN ('view', 'click', 'error')) s
          ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc=(
        "Point-in-time (temporal dimension) join: each purchase is enriched "
        "with the user's activity state AS OF the purchase instant — the "
        "warehouse PIT-lookup against an SCD2-style state history, where "
        "each state event opens a validity interval the next one closes. "
        "Rather than materializing intervals and running a range join, the "
        "lookup IS a backward as-of join against the state-change stream "
        "(operators/joins.py: union + one carry-forward window — single "
        "shuffle, no pair blow-up); DuckDB's native ASOF JOIN is the "
        "oracle. Composes q_scd2_intervals' history model with "
        "q_asof_join_last_click's join machinery."
    ),
    tags=("join", "asof", "temporal", "behavior", "scd2"),
)
def q_pit_activity_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    states = e.where(F.col("event_type").isin("view", "click", "error")).select(
        "user_id", "ts", F.col("event_type").alias("state")
    )
    return asof_join(purchases, states, on="user_id", right_cols=("state",))


@register(
    "q_cumulative_distinct_users",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS first_day
            FROM events GROUP BY user_id
        ),
        days AS (
            SELECT DISTINCT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day
            FROM events
        ),
        new_per_day AS (
            SELECT first_day AS day, COUNT(*) AS n_new FROM firsts GROUP BY first_day
        )
        SELECT d.day,
               COALESCE(n.n_new, 0) AS n_new,
               CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM days d LEFT JOIN new_per_day n ON d.day = n.day
    """,
    doc=(
        "Cumulative distinct users to date, per day — COUNT(DISTINCT) over "
        "an unbounded window, which no engine can merge incrementally, "
        "replaced by the first-seen identity: a user adds to exactly one "
        "day's 'new' count (their first activity day), so the cumulative "
        "distinct is a plain prefix sum of new-user counts over the "
        "O(#days) day grain. One shuffle to per-user first days, one "
        "grain-sized rollup — no per-day user-set state anywhere. The same "
        "identity is how a streaming job serves 'total users to date' from "
        "a tiny daily aggregate."
    ),
    tags=("events", "retention", "behavior", "window"),
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("first_day"))
    days = e.select(day.alias("day")).distinct()
    new_per_day = firsts.groupBy("first_day").agg(F.count(F.lit(1)).alias("n_new"))
    j = days.join(new_per_day, days.day == new_per_day.first_day, "left").select(
        "day", F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return j.select("day", "n_new", F.sum("n_new").over(w).alias("cum_users"))


@register(
    "q_kaplan_meier",
    oracle="""
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day
            FROM events
        ),
        us AS (
            SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day
            FROM ud GROUP BY user_id
        ),
        dur AS (
            SELECT DATEDIFF('day', first_day, last_day) AS t,
                   CASE WHEN last_day < (SELECT MAX(last_day) FROM us)
                        THEN 1 ELSE 0 END AS churn
            FROM us
        ),
        g AS (
            SELECT t, SUM(churn) AS d, COUNT(*) - SUM(churn) AS c
            FROM dur GROUP BY t
        ),
        r AS (
            SELECT t, d, c,
                   (SELECT COUNT(*) FROM dur)
                       - COALESCE(SUM(d + c) OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS n_risk
            FROM g
        ),
        s AS (
            SELECT t, d, c, n_risk,
                   SUM(CASE WHEN d = 0 THEN CAST(0 AS DECIMAL(27,8))
                            WHEN d < n_risk THEN
                                CAST(LN(n_risk - d) AS DECIMAL(27,8))
                                - CAST(LN(n_risk) AS DECIMAL(27,8))
                            ELSE CAST(-1000000 AS DECIMAL(27,8)) END)
                       OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lns
            FROM r
        )
        SELECT t AS duration_days,
               CAST(n_risk AS BIGINT) AS n_at_risk,
               CAST(d AS BIGINT) AS churned,
               CAST(c AS BIGINT) AS censored,
               CAST(lns AS DOUBLE) AS ln_survival,
               ROUND(EXP(CAST(lns AS DOUBLE)), 6) AS survival
        FROM s
    """,
    doc=(
        "Kaplan-Meier retention curve with right-censoring: each user's "
        "lifetime runs from first to last activity day; users still active "
        "on the corpus's final observed day are CENSORED, not churned — "
        "the correction naive 'retention = active/total' curves get wrong. "
        "S(t) = Π(1 − dᵢ/nᵢ) is computed in log space as a cumulative sum "
        "of per-step decimal-rounded log terms over the O(#durations) "
        "grain, so the product is order-independent (Spark has no product "
        "aggregate, and chained floating multiplies would be "
        "partition-order-sensitive anyway); an all-at-risk-churn step "
        "contributes a −1e6 sentinel whose exp underflows to exactly 0 in "
        "both engines. One shuffle to per-user lifetimes; everything after "
        "runs on the duration grain. The observation horizon attaches as a "
        "1-row broadcast."
    ),
    tags=("events", "retention", "survival", "behavior", "stats"),
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ud = e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day")).distinct()
    us = ud.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    dmax = us.agg(F.max("last_day").alias("dmax"))
    dur = us.crossJoin(F.broadcast(dmax)).select(
        F.datediff(F.col("last_day"), F.col("first_day")).alias("t"),
        F.when(F.col("last_day") < F.col("dmax"), F.lit(1)).otherwise(F.lit(0)).alias(
            "churn"
        ),
    )
    g = dur.groupBy("t").agg(
        F.sum("churn").alias("d"),
        (F.count(F.lit(1)) - F.sum("churn")).alias("c"),
    )
    total = dur.agg(F.count(F.lit(1)).alias("n_total"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    r = g.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    zero = F.lit(0).cast("decimal(27,8)")
    term = (
        F.when(F.col("d") == 0, zero)
        .when(
            F.col("d") < F.col("n_risk"),
            F.log(F.col("n_risk") - F.col("d")).cast("decimal(27,8)")
            - F.log(F.col("n_risk")).cast("decimal(27,8)"),
        )
        .otherwise(F.lit(-1000000).cast("decimal(27,8)"))
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    s = r.withColumn("lns", F.sum(term).over(w_cum))
    return s.select(
        F.col("t").alias("duration_days"),
        F.col("n_risk").alias("n_at_risk"),
        F.col("d").alias("churned"),
        F.col("c").alias("censored"),
        F.col("lns").cast("double").alias("ln_survival"),
        F.round(F.exp(F.col("lns").cast("double")), 6).alias("survival"),
    )


@register(
    "q_session_stats_daily",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                                 PARTITION BY user_id ORDER BY ts, event_id))
                             <= 1800000000 THEN 0 ELSE 1 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_id,
                   CAST(DATE_TRUNC('day', MIN(ts)) AS TIMESTAMP) AS day,
                   COUNT(*) AS n_events,
                   epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
            FROM sessions GROUP BY user_id, session_id
        )
        SELECT day,
               COUNT(*) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounces,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS bounce_rate,
               CAST(SUM(CAST(n_events AS HUGEINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS events_per_session,
               CAST(SUM(CAST(dur_us AS HUGEINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS mean_duration_sec
        FROM per_session GROUP BY day
    """,
    doc=(
        "Daily session KPIs: sessions, bounce count/rate (single-event "
        "sessions), events per session, mean active duration — the "
        "engagement rollup every product dashboard leads with, sessions "
        "defined by the same 30-minute inactivity gap as q_session_windows "
        "(gaps-and-islands with a (ts, event_id) total order so equal "
        "timestamps sessionize deterministically; a session belongs to its "
        "START day). One (user)-keyed shuffle to sessionize — the two "
        "stacked windows and the per-session rollup share it — then one "
        "grain-sized day rollup with exact integer sums."
    ),
    tags=("events", "session", "behavior", "window-agg"),
)
def q_session_stats_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        F.when(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            <= 1_800_000_000,
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("new_session"),
        "event_id",
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    sessions = flagged.select(
        "user_id", "ts", F.sum("new_session").over(w_cum).alias("session_id")
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, F.lit(1)).otherwise(F.lit(0)))
    n_d = F.count(F.lit(1)).cast("double")
    return per_session.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.alias("n_bounces"),
        (bounce.cast("double") / n_d).alias("bounce_rate"),
        (F.sum(F.col("n_events").cast(_DEC)).cast("double") / n_d).alias(
            "events_per_session"
        ),
        (
            F.sum(F.col("dur_us").cast(_DEC)).cast("double") / n_d / F.lit(1000000.0)
        ).alias("mean_duration_sec"),
    )
