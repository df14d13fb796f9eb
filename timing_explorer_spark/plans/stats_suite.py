"""Statistical analytics suite: regression, autocorrelation, seasonality,
and corpus information-theory metrics.

Extends the reference's dashboard-level analytics (SURVEY §2.1 — the
Grafana/InfluxQL surface stops at time-bucketed means) with the statistical
queries a monitoring/TSDB stack and an LLM-corpus curation pipeline layer on
top, each declarative, one-or-two-shuffle, and DuckDB-oracle-checked:

  q_ols_trend            per-series ordinary-least-squares daily trend
                         (slope/intercept/R²) from exact integer moments —
                         the parametric counterpart of q_theil_sen_trend.
  q_acf_hourly           autocorrelation of the hourly event-count series at
                         lag 1 and lag 24 (the seasonality detector).
  q_seasonal_hod_anomaly hour-of-day seasonal profile + |z|>2 anomaly counts
                         computed on the O(range) bucketed grain.
  q_token_entropy        per-document unigram Shannon entropy + type-token
                         ratio (lexical-diversity quality signals).
  q_zipf_slope           corpus Zipf law fit: log-log OLS over the top-1000
                         rank/frequency curve (corpus-health diagnostic).
  q_kl_source_divergence per-source KL divergence of the word distribution
                         vs the corpus distribution (domain-shift score).
  q_doclen_gini          per-source Gini coefficient of document lengths,
                         computed on the VALUE grain (no per-row ranking).
  q_interarrival_profile per-series exact p50/p90/p99 of user-level
                         inter-arrival gaps (cadence/bot signature).
  q_burstiness           Fano factor + Goh-Barabási burstiness of the
                         hourly-count signal (Poisson-ness test).

Determinism: every aggregate is either an exact integer/decimal sum (ordering
cannot change the bits) or a per-term decimal-rounded logarithm (the
q_bigram_surprisal trick — libm's 1-ulp ln differences vanish at 8 decimals),
and every final double expression is mirrored operation-for-operation in the
oracle SQL, so Spark and DuckDB agree bit-for-bit at any partitioning.

Scale notes: the time-series queries aggregate to the (series, day|hour)
grain first — O(time-range) rows independent of fact cardinality — so their
joins/windows touch bounded data at any SF. The corpus queries shuffle on
(doc, word)/(source, word)/word keys — the word-count shape, map-side
combinable; nothing broadcasts an unbounded side and nothing runs Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import register

_HOUR_US = 3_600_000_000
_DEC = "decimal(38,0)"
_LOG = "decimal(27,8)"


def _dlog(col) -> F.Column:
    """ln() rounded to 8 decimals — order-independent summand (see module doc)."""
    return F.log(col).cast(_LOG)


@register(
    "q_ols_trend",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   DATE_TRUNC('day', ts) AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
            FROM events
            GROUP BY event_type, DATE_TRUNC('day', ts)
        ),
        pts AS (
            SELECT event_type,
                   CAST(DATEDIFF('day', DATE '2024-01-01', CAST(day AS DATE)) AS BIGINT) AS x,
                   y
            FROM daily
        ),
        m AS (
            SELECT event_type,
                   COUNT(*)                       AS n,
                   SUM(CAST(x AS HUGEINT))        AS sx,
                   SUM(CAST(y AS HUGEINT))        AS sy,
                   SUM(CAST(x * x AS HUGEINT))    AS sxx,
                   SUM(CAST(x * y AS HUGEINT))    AS sxy,
                   SUM(CAST(y AS HUGEINT) * y)    AS syy
            FROM pts GROUP BY event_type HAVING COUNT(*) >= 2
        )
        SELECT event_type,
               n AS n_days,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS slope_per_day,
               (CAST(sy AS DOUBLE)
                    - (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) / 100.0 AS intercept,
               (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
                   / (CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
        FROM m
    """,
    doc=(
        "Per-series OLS daily trend: regress the exact daily value sum "
        "(fixed-point units) on the day index. All five regression moments "
        "are exact integer sums (decimal accumulators — overflow-safe past "
        "petabyte group sizes), so slope/intercept/R² are bit-identical "
        "under any partitioning; the closed-form slope needs no iteration. "
        "The parametric complement of q_theil_sen_trend (which resists "
        "outliers but costs O(days²) pairs — OLS is one pass). Two "
        "aggregations: fact rows -> (series, day) grain -> per-series "
        "moments; the second input is O(time-range) rows at any SF."
    ),
    tags=("timeseries", "regression", "trend", "stats"),
)
def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = (
        e.withColumn("day", F.date_trunc("day", F.col("ts")))
        .groupBy("event_type", "day")
        .agg(F.sum(F.rint(F.col("value") * 100).cast("long")).alias("y"))
    )
    pts = daily.select(
        "event_type",
        F.datediff(F.col("day").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        "y",
    )
    m = (
        pts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast(_DEC)).alias("sx"),
            F.sum(F.col("y").cast(_DEC)).alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("sxx"),
            F.sum((F.col("x") * F.col("y")).cast(_DEC)).alias("sxy"),
            F.sum(F.col("y").cast(_DEC) * F.col("y")).alias("syy"),
        )
        .where(F.col("n") >= 2)
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    n_d = F.col("n").cast("double")
    slope_units = num / den
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        (slope_units / F.lit(100.0)).alias("slope_per_day"),
        (
            (F.col("sy").cast("double") - slope_units * F.col("sx").cast("double"))
            / n_d
            / F.lit(100.0)
        ).alias("intercept"),
        ((num * num) / (den * deny)).alias("r2"),
    )


_ACF_ORACLE = f"""
        WITH h AS (
            SELECT event_type,
                   CAST(FLOOR(epoch_us(ts) / {_HOUR_US}) AS BIGINT) AS b,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        l AS (
            SELECT h.event_type, h.b, h.cnt, t.lag_h
            FROM h CROSS JOIN (SELECT 1 AS lag_h UNION ALL SELECT 24) t
        ),
        p AS (
            SELECT l.event_type, l.lag_h, l.cnt AS a, h2.cnt AS bb
            FROM l JOIN h h2
              ON h2.event_type = l.event_type AND h2.b = l.b + l.lag_h
        ),
        m AS (
            SELECT event_type, lag_h,
                   COUNT(*)                        AS n,
                   SUM(CAST(a AS HUGEINT))         AS sa,
                   SUM(CAST(bb AS HUGEINT))        AS sb,
                   SUM(CAST(a AS HUGEINT) * a)     AS saa,
                   SUM(CAST(bb AS HUGEINT) * bb)   AS sbb,
                   SUM(CAST(a AS HUGEINT) * bb)    AS sab
            FROM p GROUP BY event_type, lag_h
        )
        SELECT event_type, lag_h, n AS n_pairs,
               CAST(n * sab - sa * sb AS DOUBLE)
                   / (SQRT(CAST(n * saa - sa * sa AS DOUBLE))
                      * SQRT(CAST(n * sbb - sb * sb AS DOUBLE))) AS acf
        FROM m
    """


@register(
    "q_acf_hourly",
    oracle=_ACF_ORACLE,
    doc=(
        "Autocorrelation of each series' hourly-count signal at lag 1 "
        "(persistence) and lag 24 (daily seasonality) — the Box-Jenkins "
        "seasonality detector as a declarative plan. Facts aggregate to the "
        "O(range) hourly grain first; the lag pairing is an equi-join of "
        "that tiny grain with itself on (series, bucket+lag), and the "
        "Pearson terms are exact integer moments, so the correlation is "
        "bit-deterministic. Counts, not raw values, so the whole query is "
        "one fact-table shuffle regardless of SF."
    ),
    tags=("timeseries", "acf", "seasonality", "stats"),
)
def q_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    b = F.floor(F.unix_micros(F.col("ts")) / F.lit(_HOUR_US)).cast("long")
    # Pre-apply the join's not-null constraints BEFORE the aggregation: the
    # self-join otherwise pushes different IsNotNull filters into each side's
    # scan, the subplans stop being identical, and ReuseExchange can't kick
    # in — planning TWO full fact scans. With the filter below both sides
    # share one scan+aggregate subtree (ReusedExchange; verified in
    # PLANS.md), so the fact table is read once and only the O(range)
    # hourly grain is duplicated.
    e = e.where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull() & b.isNotNull()
    )
    h = e.groupBy("event_type", b.alias("b")).agg(F.count(F.lit(1)).alias("cnt"))
    lagged = h.select(
        "event_type",
        "b",
        F.col("cnt").alias("a"),
        F.explode(F.array(F.lit(1), F.lit(24))).alias("lag_h"),
    ).withColumn("bj", F.col("b") + F.col("lag_h"))
    h2 = h.select(
        F.col("event_type").alias("et2"), F.col("b").alias("b2"), F.col("cnt").alias("bb")
    )
    pairs = lagged.join(
        h2, (F.col("event_type") == F.col("et2")) & (F.col("bj") == F.col("b2"))
    )
    m = pairs.groupBy("event_type", "lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a").cast(_DEC)).alias("sa"),
        F.sum(F.col("bb").cast(_DEC)).alias("sb"),
        F.sum(F.col("a").cast(_DEC) * F.col("a")).alias("saa"),
        F.sum(F.col("bb").cast(_DEC) * F.col("bb")).alias("sbb"),
        F.sum(F.col("a").cast(_DEC) * F.col("bb")).alias("sab"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    dena = F.sqrt((F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double"))
    denb = F.sqrt((F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double"))
    return m.select(
        "event_type",
        "lag_h",
        F.col("n").alias("n_pairs"),
        (num / (dena * denb)).alias("acf"),
    )


@register(
    "q_seasonal_hod_anomaly",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   CAST(FLOOR(epoch_us(ts) / {_HOUR_US}) AS BIGINT) AS b,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        g AS (SELECT event_type, b % 24 AS hod, cnt FROM h),
        prof AS (
            SELECT event_type, hod,
                   COUNT(*)                     AS n,
                   SUM(CAST(cnt AS HUGEINT))    AS sa,
                   SUM(CAST(cnt AS HUGEINT) * cnt) AS saa
            FROM g GROUP BY event_type, hod
        )
        SELECT g.event_type, g.hod,
               MAX(prof.n) AS n_hours,
               CAST(MAX(prof.sa) AS DOUBLE) / CAST(MAX(prof.n) AS DOUBLE) AS mean_cnt,
               SQRT(CAST(MAX(prof.n) * MAX(prof.saa) - MAX(prof.sa) * MAX(prof.sa) AS DOUBLE))
                   / CAST(MAX(prof.n) AS DOUBLE) AS std_cnt,
               CAST(SUM(CASE WHEN (prof.n * g.cnt - prof.sa) * (prof.n * g.cnt - prof.sa)
                                  > 4 * (prof.n * prof.saa - prof.sa * prof.sa)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
        FROM g JOIN prof ON g.event_type = prof.event_type AND g.hod = prof.hod
        GROUP BY g.event_type, g.hod
    """,
    doc=(
        "Hour-of-day seasonal profile with anomaly counts: per (series, "
        "hour-of-day), the mean/std of the hourly counts plus how many "
        "individual hours deviate by more than 2 sigma FROM THEIR OWN "
        "hour-of-day's profile — the seasonality-aware complement of the "
        "row-level q_zscore_outliers (a 3am count that is normal for 3am "
        "stays unflagged even though it is far below the daily mean). The "
        "|z|>2 cut compares exact integers ((n·cnt−Σ)² vs 4(nΣ²−(Σ)²)): no "
        "floating threshold to disagree on. All work after the one fact "
        "shuffle happens on the O(range) hourly grain, so the profile "
        "join-back is grain-sized at any SF."
    ),
    tags=("timeseries", "seasonality", "anomaly", "stats"),
)
def q_seasonal_hod_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    b = F.floor(F.unix_micros(F.col("ts")) / F.lit(_HOUR_US)).cast("long")
    g = (
        e.groupBy("event_type", b.alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("event_type", (F.col("b") % 24).alias("hod"), "cnt")
    )
    prof = g.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cnt").cast(_DEC)).alias("sa"),
        F.sum(F.col("cnt").cast(_DEC) * F.col("cnt")).alias("saa"),
    )
    j = g.join(prof, ["event_type", "hod"])
    dev = F.col("n") * F.col("cnt") - F.col("sa")
    var_n2 = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    out = j.groupBy("event_type", "hod").agg(
        F.max("n").alias("n_hours"),
        F.max("sa").alias("msa"),
        F.max("saa").alias("msaa"),
        F.sum(F.when(dev * dev > 4 * var_n2, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_anomalous"
        ),
    )
    n_d = F.col("n_hours").cast("double")
    return out.select(
        "event_type",
        "hod",
        "n_hours",
        (F.col("msa").cast("double") / n_d).alias("mean_cnt"),
        (
            F.sqrt(
                (F.col("n_hours") * F.col("msaa") - F.col("msa") * F.col("msa")).cast(
                    "double"
                )
            )
            / n_d
        ).alias("std_cnt"),
        "n_anomalous",
    )


@register(
    "q_token_entropy",
    oracle="""
        WITH w AS (
            SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS word
            FROM documents
        ),
        c AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
        a AS (
            SELECT doc_id,
                   SUM(c)                                    AS n,
                   COUNT(*)                                  AS n_types,
                   SUM(CAST(c AS DECIMAL(10,0)) * CAST(LN(c) AS DECIMAL(27,8))) AS s
            FROM c GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               n_types,
               CAST(n_types AS DOUBLE) / CAST(n AS DOUBLE) AS ttr,
               CAST(CAST(LN(n) AS DECIMAL(27,8)) AS DOUBLE)
                   - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS entropy_nats
        FROM a
    """,
    doc=(
        "Per-document unigram Shannon entropy H = ln n − (Σ c·ln c)/n plus "
        "type-token ratio — the lexical-diversity quality signals "
        "(templated/repetitive docs score low, natural prose near ln V). "
        "Per-term decimal-rounded logs (the q_bigram_surprisal trick) make "
        "the Σ c·ln c order-independent, so the entropy is bit-identical "
        "under any partitioning. Two shuffles: (doc, word) counts then a "
        "doc-keyed rollup — the word-count shape, map-side combinable."
    ),
    tags=("text", "entropy", "quality", "llm-pipeline", "stats"),
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    c = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    a = c.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        # decimal(10,0) × decimal(27,8) stays within the 38-digit cap
        # (precision 10+27+1), so the product keeps all 8 log decimals exact;
        # a bare bigint multiplier would promote to precision 48 and Spark
        # would silently cut the scale to 6. Bounds the per-(doc,word) count
        # at 1e10 — comfortably above any real document.
        F.sum(F.col("c").cast("decimal(10,0)") * _dlog(F.col("c"))).alias("s"),
    )
    n_d = F.col("n").cast("double")
    return a.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_types",
        (F.col("n_types").cast("double") / n_d).alias("ttr"),
        (
            _dlog(F.col("n")).cast("double") - F.col("s").cast("double") / n_d
        ).alias("entropy_nats"),
    )


@register(
    "q_zipf_slope",
    oracle="""
        WITH wc AS (
            SELECT word, COUNT(*) AS cnt
            FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS word FROM documents)
            GROUP BY word
        ),
        top AS (
            SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank
            FROM (SELECT * FROM wc ORDER BY cnt DESC, word LIMIT 1000)
        ),
        pts AS (
            SELECT CAST(ROUND(LN(rank) * 100000000) AS BIGINT) AS xm,
                   CAST(ROUND(LN(cnt) * 100000000) AS BIGINT)  AS ym
            FROM top
        ),
        m AS (
            SELECT COUNT(*)                      AS n,
                   SUM(CAST(xm AS HUGEINT))      AS sx,
                   SUM(CAST(ym AS HUGEINT))      AS sy,
                   SUM(CAST(xm * xm AS HUGEINT)) AS sxx,
                   SUM(CAST(xm * ym AS HUGEINT)) AS sxy
            FROM pts
        )
        SELECT n AS n_words,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
               (CAST(sy AS DOUBLE) / 100000000.0
                    - (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE))
                      * (CAST(sx AS DOUBLE) / 100000000.0))
                   / CAST(n AS DOUBLE) AS intercept_ln
        FROM m
    """,
    doc=(
        "Zipf's-law fit: OLS of ln(frequency) on ln(rank) over the top-1000 "
        "vocabulary — natural corpora slope near −1; synthetic/templated "
        "ones drift far from it (a corpus-health diagnostic). The word "
        "count is the one full shuffle; the curve itself is a CAPPED 1000 "
        "rows (TakeOrderedAndProject + one bounded single-task window), so "
        "the regression input is constant-size at any SF. Logs are scaled "
        "to integer 1e-8 units before summing — exact integer moments, "
        "bit-identical across engines and partitionings."
    ),
    tags=("text", "zipf", "stats", "llm-pipeline"),
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = wc.orderBy(F.desc("cnt"), "word").limit(1000)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("cnt"), F.col("word")))
    )
    pts = ranked.select(
        F.rint(F.log(F.col("rank")) * 1e8).cast("long").alias("xm"),
        F.rint(F.log(F.col("cnt")) * 1e8).cast("long").alias("ym"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xm").cast(_DEC)).alias("sx"),
        F.sum(F.col("ym").cast(_DEC)).alias("sy"),
        F.sum((F.col("xm") * F.col("xm")).cast(_DEC)).alias("sxx"),
        F.sum((F.col("xm") * F.col("ym")).cast(_DEC)).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return m.select(
        F.col("n").alias("n_words"),
        slope.alias("slope"),
        (
            (
                F.col("sy").cast("double") / F.lit(1e8)
                - slope * (F.col("sx").cast("double") / F.lit(1e8))
            )
            / F.col("n").cast("double")
        ).alias("intercept_ln"),
    )


@register(
    "q_kl_source_divergence",
    oracle="""
        WITH w AS (
            SELECT source, UNNEST(string_split(lower(text), ' ')) AS word
            FROM documents
        ),
        sc AS (SELECT source, word, COUNT(*) AS c_sw FROM w GROUP BY source, word),
        cc AS (SELECT word, SUM(c_sw) AS c_w FROM sc GROUP BY word),
        a AS (
            SELECT sc.source,
                   SUM(sc.c_sw) AS n_s,
                   SUM(CAST(sc.c_sw AS DECIMAL(9,0))
                       * (CAST(LN(sc.c_sw) AS DECIMAL(27,8))
                          - CAST(LN(cc.c_w) AS DECIMAL(27,8)))) AS asum
            FROM sc JOIN cc ON sc.word = cc.word
            GROUP BY sc.source
        ),
        t AS (SELECT source, n_s, asum, SUM(n_s) OVER () AS big_n FROM a)
        SELECT source,
               CAST(n_s AS BIGINT) AS n_tokens,
               CAST(asum AS DOUBLE) / CAST(n_s AS DOUBLE)
                   + (CAST(CAST(LN(big_n) AS DECIMAL(27,8)) AS DOUBLE)
                      - CAST(CAST(LN(n_s) AS DECIMAL(27,8)) AS DOUBLE)) AS kl_nats
        FROM t
    """,
    doc=(
        "Per-source KL divergence of the word distribution against the "
        "whole-corpus distribution — the domain-shift score a mixture "
        "curator watches (a source drifting from the corpus mix gets a "
        "large KL). Identity: KL(P_s‖P) = Σ c_sw(ln c_sw − ln c_w)/N_s + "
        "ln N − ln N_s, so the per-word work is one token-keyed shuffle "
        "join of the source-word counts to corpus-word counts (neither "
        "side broadcasts — a 100 TB vocabulary stays distributed), and "
        "the N terms attach on the per-source grain (an unpartitioned "
        "window over ≤#sources rows). Per-term decimal-rounded logs keep "
        "the sum order-independent."
    ),
    tags=("text", "kl", "mixture", "llm-pipeline", "stats"),
)
def q_kl_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    sc = w.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c_sw"))
    cc = sc.groupBy("word").agg(F.sum("c_sw").alias("c_w"))
    a = (
        sc.join(cc, "word")
        .groupBy("source")
        .agg(
            F.sum("c_sw").alias("n_s"),
            # decimal(9,0) multiplier: the log difference is decimal(28,8),
            # and 9+28+1 = 38 hits the precision cap exactly with scale 8
            # preserved (see q_token_entropy note). Caps per-(source,word)
            # counts at 1e9 — per-word, per-source, far above natural text.
            F.sum(
                F.col("c_sw").cast("decimal(9,0)")
                * (_dlog(F.col("c_sw")) - _dlog(F.col("c_w")))
            ).alias("asum"),
        )
    )
    t = a.withColumn("big_n", F.sum("n_s").over(Window.partitionBy()))
    return t.select(
        "source",
        F.col("n_s").alias("n_tokens"),
        (
            F.col("asum").cast("double") / F.col("n_s").cast("double")
            + (_dlog(F.col("big_n")).cast("double") - _dlog(F.col("n_s")).cast("double"))
        ).alias("kl_nats"),
    )


@register(
    "q_doclen_gini",
    oracle="""
        WITH g AS (
            SELECT source, n_chars, COUNT(*) AS c
            FROM documents GROUP BY source, n_chars
        ),
        r AS (
            SELECT source, n_chars, c,
                   COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY n_chars
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS cum_before
            FROM g
        ),
        a AS (
            SELECT source,
                   SUM(c)                                   AS n,
                   SUM(CAST(n_chars AS HUGEINT) * c)        AS s,
                   SUM(CAST(n_chars AS HUGEINT)
                       * (CAST(c AS HUGEINT) * cum_before + (c * (c + 1)) // 2)) AS t
            FROM r GROUP BY source
        )
        SELECT source,
               CAST(n AS BIGINT) AS n_docs,
               (2.0 * CAST(t AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                   - (CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)) AS gini
        FROM a
    """,
    doc=(
        "Per-source Gini coefficient of document length (G = 2Σi·x₍ᵢ₎/(nΣx) "
        "− (n+1)/n) — the inequality profile of a corpus slice (a source "
        "whose token mass concentrates in a few giant docs skews training "
        "mixes). The per-document ranking the textbook formula needs is "
        "replaced by the VALUE-grain identity Σi·x₍ᵢ₎ = Σₖ xₖ(cₖ·Cₖ + "
        "cₖ(cₖ+1)/2) over grouped (length, count) rows, so the ordered "
        "window runs on O(distinct lengths) rows per source — bounded by "
        "the value range, not the corpus — and every term is an exact "
        "integer. One fact shuffle + one grain-sized window."
    ),
    tags=("text", "gini", "profile", "llm-pipeline", "stats"),
)
def q_doclen_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn("cum_before", F.coalesce(F.sum("c").over(w), F.lit(0)))
    a = r.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("n_chars").cast(_DEC) * F.col("c")).alias("s"),
        F.sum(
            F.col("n_chars").cast(_DEC)
            * (
                F.col("c").cast(_DEC) * F.col("cum_before")
                + F.shiftright(F.col("c") * (F.col("c") + 1), 1)
            )
        ).alias("t"),
    )
    n_d = F.col("n").cast("double")
    return a.select(
        "source",
        F.col("n").alias("n_docs"),
        (
            (F.lit(2.0) * F.col("t").cast("double")) / (n_d * F.col("s").cast("double"))
            - ((F.col("n") + 1).cast("double") / n_d)
        ).alias("gini"),
    )


@register(
    "q_interarrival_profile",
    oracle="""
        WITH d AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id)) AS gap_us
            FROM events
        )
        SELECT event_type,
               COUNT(gap_us) AS n_gaps,
               quantile_cont(gap_us, 0.50) AS p50_us,
               quantile_cont(gap_us, 0.90) AS p90_us,
               quantile_cont(gap_us, 0.99) AS p99_us
        FROM d
        WHERE gap_us IS NOT NULL
        GROUP BY event_type
    """,
    doc=(
        "Inter-arrival-time profile: per series, exact p50/p90/p99 of the "
        "gap between a user's consecutive events of that type — the hazard/"
        "cadence signature (bot traffic shows collapsed percentiles; organic "
        "traffic heavy tails). The lag window partitions on (user, type) — "
        "millions of small partitions, never a global sort — and gaps are "
        "exact integer micros, so Spark's `percentile` and DuckDB's "
        "quantile_cont interpolate identical doubles (the q_percentile_bands "
        "precedent). At 100 TB the drop-in is approx_percentile, mergeable "
        "map-side (q_approx_percentile pattern)."
    ),
    tags=("timeseries", "interarrival", "percentile", "stats"),
)
def q_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.percentile("gap_us", 0.5).alias("p50_us"),
        F.percentile("gap_us", 0.9).alias("p90_us"),
        F.percentile("gap_us", 0.99).alias("p99_us"),
    )


@register(
    "q_burstiness",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   CAST(FLOOR(epoch_us(ts) / {_HOUR_US}) AS BIGINT) AS b,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type,
                   COUNT(*)                        AS n,
                   SUM(CAST(cnt AS HUGEINT))       AS sa,
                   SUM(CAST(cnt AS HUGEINT) * cnt) AS saa
            FROM h GROUP BY event_type
        )
        SELECT event_type,
               n AS n_hours,
               CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) AS mean_per_hour,
               CAST(n * saa - sa * sa AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(sa AS DOUBLE)) AS fano,
               (SQRT(CAST(n * saa - sa * sa AS DOUBLE)) - CAST(sa AS DOUBLE))
                   / (SQRT(CAST(n * saa - sa * sa AS DOUBLE)) + CAST(sa AS DOUBLE))
                   AS burstiness
        FROM m
    """,
    doc=(
        "Burstiness metrics of each series' hourly-count signal: the Fano "
        "factor (variance/mean — 1 for a Poisson process, >1 over-dispersed) "
        "and the Goh-Barabási burstiness B = (σ−μ)/(σ+μ) ∈ (−1, 1). Both "
        "derive from the same two exact integer moments over the O(range) "
        "hourly grain (note nσ² = (nΣx²−(Σx)²)/n and nμ = Σx share the 1/n, "
        "so Fano = (nΣx²−(Σx)²)/(n·Σx) needs no explicit division by n² — "
        "fewer floating ops to mirror). One fact shuffle; bit-deterministic."
    ),
    tags=("timeseries", "burstiness", "stats"),
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    b = F.floor(F.unix_micros(F.col("ts")) / F.lit(_HOUR_US)).cast("long")
    h = e.groupBy("event_type", b.alias("b")).agg(F.count(F.lit(1)).alias("cnt"))
    m = h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cnt").cast(_DEC)).alias("sa"),
        F.sum(F.col("cnt").cast(_DEC) * F.col("cnt")).alias("saa"),
    )
    n_d = F.col("n").cast("double")
    sa_d = F.col("sa").cast("double")
    var_n2 = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    sig_n = F.sqrt(var_n2)  # n·σ — the shared 1/n cancels in both ratios
    return m.select(
        "event_type",
        F.col("n").alias("n_hours"),
        (sa_d / n_d).alias("mean_per_hour"),
        (var_n2 / (n_d * sa_d)).alias("fano"),
        ((sig_n - sa_d) / (sig_n + sa_d)).alias("burstiness"),
    )


@register(
    "q_ks_source_drift",
    oracle="""
        WITH g AS (
            SELECT source, n_chars, COUNT(*) AS c
            FROM documents GROUP BY source, n_chars
        ),
        vals AS (SELECT DISTINCT n_chars FROM documents),
        srcs AS (SELECT source, SUM(c) AS n_s FROM g GROUP BY source),
        tcum AS (
            SELECT n_chars,
                   SUM(t) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS t_cum
            FROM (SELECT n_chars, SUM(c) AS t FROM g GROUP BY n_chars)
        ),
        grid AS (
            SELECT s.source, s.n_s, v.n_chars FROM srcs s CROSS JOIN vals v
        ),
        scum AS (
            SELECT gr.source, gr.n_s, gr.n_chars,
                   SUM(COALESCE(g.c, 0)) OVER (PARTITION BY gr.source
                                               ORDER BY gr.n_chars
                                               ROWS UNBOUNDED PRECEDING) AS s_cum
            FROM grid gr LEFT JOIN g
              ON g.source = gr.source AND g.n_chars = gr.n_chars
        ),
        terms AS (
            SELECT sc.source, sc.n_s,
                   ABS(CAST(sc.s_cum AS DOUBLE) / CAST(sc.n_s AS DOUBLE)
                       - CAST(tc.t_cum - sc.s_cum AS DOUBLE)
                         / CAST((SELECT SUM(n_s) FROM srcs) - sc.n_s AS DOUBLE)) AS d
            FROM scum sc JOIN tcum tc ON sc.n_chars = tc.n_chars
        )
        SELECT source, CAST(n_s AS BIGINT) AS n_docs, MAX(d) AS d_stat
        FROM terms GROUP BY source, n_s
    """,
    doc=(
        "Two-sample Kolmogorov-Smirnov drift statistic per source: "
        "D_s = max_x |F_source(x) − F_rest(x)| over the document-length "
        "distribution — the distribution-shift screen a corpus monitor runs "
        "per ingest batch (a source whose shape departs from the rest of "
        "the corpus gets a large D). Both empirical CDFs live on the VALUE "
        "grain (#sources × #distinct-lengths rows — bounded by the value "
        "range, never the corpus), with the evaluation grid a deliberate "
        "#sources × #values broadcast cross join. Cumulatives are exact "
        "integers; each |·| term is one mirrored double expression, and "
        "max over identical double sets is engine-independent."
    ),
    tags=("text", "ks", "drift", "llm-pipeline", "stats"),
)
def q_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    vals = d.select("n_chars").distinct()
    srcs = g.groupBy("source").agg(F.sum("c").alias("n_s"))
    t = g.groupBy("n_chars").agg(F.sum("c").alias("t"))
    w_t = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    tcum = t.select("n_chars", F.sum("t").over(w_t).alias("t_cum"))
    grid = srcs.crossJoin(F.broadcast(vals))
    j = grid.join(g, ["source", "n_chars"], "left").select(
        "source", "n_s", "n_chars", F.coalesce(F.col("c"), F.lit(0)).alias("c0")
    )
    w_s = (
        Window.partitionBy("source").orderBy("n_chars").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    scum = j.select(
        "source", "n_s", "n_chars", F.sum("c0").over(w_s).alias("s_cum")
    )
    big_n = srcs.agg(F.sum("n_s").alias("big_n"))
    terms = (
        scum.join(tcum, "n_chars")
        .crossJoin(F.broadcast(big_n))
        .select(
            "source",
            "n_s",
            F.abs(
                F.col("s_cum").cast("double") / F.col("n_s").cast("double")
                - (F.col("t_cum") - F.col("s_cum")).cast("double")
                / (F.col("big_n") - F.col("n_s")).cast("double")
            ).alias("d"),
        )
    )
    return terms.groupBy("source", "n_s").agg(F.max("d").alias("d_stat")).select(
        "source", F.col("n_s").alias("n_docs"), "d_stat"
    )


@register(
    "q_seasonal_naive_mase",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   CAST(FLOOR(epoch_us(ts) / {_HOUR_US}) AS BIGINT) AS b,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        e AS (
            SELECT a.event_type,
                   ABS(a.cnt - s.cnt)  AS err_seasonal,
                   ABS(a.cnt - n.cnt)  AS err_naive
            FROM h a
            JOIN h s ON s.event_type = a.event_type AND s.b = a.b - 24
            JOIN h n ON n.event_type = a.event_type AND n.b = a.b - 1
        )
        SELECT event_type,
               COUNT(*) AS n_hours,
               CAST(SUM(CAST(err_seasonal AS HUGEINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mae_seasonal,
               CAST(SUM(CAST(err_naive AS HUGEINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mae_naive,
               CAST(SUM(CAST(err_seasonal AS HUGEINT)) AS DOUBLE)
                   / CAST(SUM(CAST(err_naive AS HUGEINT)) AS DOUBLE) AS mase
        FROM e GROUP BY event_type
    """,
    doc=(
        "Forecast-baseline backtest: the seasonal-naive predictor "
        "(ŷ_t = y_{t−24h}) scored against the naive predictor "
        "(ŷ_t = y_{t−1h}) on the hourly-count series, reported as MAE of "
        "each plus their ratio — MASE (Hyndman-Koehler 2006), the "
        "scale-free forecast-quality metric (<1 ⇒ the seasonal model "
        "beats last-value carry-forward, i.e. the series has exploitable "
        "daily structure — complements q_acf_hourly's lag-24 detection "
        "with an actual forecast-error reading). Hours are restricted to "
        "those where BOTH baselines have a reference point, so the two "
        "MAEs compare the same sample. Errors are exact integers on the "
        "O(range) hourly grain; both lag joins reuse the one grain "
        "aggregate (same ReusedExchange pre-filter trick as q_acf_hourly)."
    ),
    tags=("timeseries", "forecast", "mase", "stats"),
)
def q_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    b = F.floor(F.unix_micros(F.col("ts")) / F.lit(_HOUR_US)).cast("long")
    # The two shifted-key predicates ((b-24)/(b-1) not null) are no-ops on
    # values but must appear in the SHARED pre-aggregate filter: the probe
    # side otherwise pushes them into its own scan alone and the subtrees
    # stop matching (1 reused exchange instead of 2).
    e = e.where(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & b.isNotNull()
        & (b - 24).isNotNull()
        & (b - 1).isNotNull()
    )
    h = e.groupBy("event_type", b.alias("b")).agg(F.count(F.lit(1)).alias("cnt"))
    # The lag references join on PLAIN grain keys while the probe side
    # carries the shifted keys as post-aggregate computed columns — this
    # keeps all three grain subtrees syntactically identical, so the fact
    # scan + aggregate plans ONCE and the other two references are
    # ReusedExchanges (same single-scan trick as q_acf_hourly; shifting the
    # build sides instead pushes per-side isnotnull(b+k) predicates into
    # their scans and defeats the reuse — observed as 3 full scans).
    probe = h.withColumn("bs", F.col("b") - 24).withColumn("bn", F.col("b") - 1)
    s = h.select(
        F.col("event_type").alias("et_s"), F.col("b").alias("b_s"), F.col("cnt").alias("cnt_s")
    )
    n = h.select(
        F.col("event_type").alias("et_n"), F.col("b").alias("b_n"), F.col("cnt").alias("cnt_n")
    )
    joined = (
        probe.join(s, (F.col("event_type") == F.col("et_s")) & (F.col("bs") == F.col("b_s")))
        .join(n, (F.col("event_type") == F.col("et_n")) & (F.col("bn") == F.col("b_n")))
        .select(
            "event_type",
            F.abs(F.col("cnt") - F.col("cnt_s")).alias("err_seasonal"),
            F.abs(F.col("cnt") - F.col("cnt_n")).alias("err_naive"),
        )
    )
    m = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(F.col("err_seasonal").cast(_DEC)).alias("ses"),
        F.sum(F.col("err_naive").cast(_DEC)).alias("sen"),
    )
    n_d = F.col("n_hours").cast("double")
    return m.select(
        "event_type",
        "n_hours",
        (F.col("ses").cast("double") / n_d).alias("mae_seasonal"),
        (F.col("sen").cast("double") / n_d).alias("mae_naive"),
        (F.col("ses").cast("double") / F.col("sen").cast("double")).alias("mase"),
    )


@register(
    "q_heaps_law",
    oracle="""
        WITH w AS (
            SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS word
            FROM documents
        ),
        fd AS (SELECT word, MIN(doc_id) AS first_doc FROM w GROUP BY word),
        dt AS (SELECT doc_id, COUNT(*) AS n_tok FROM w GROUP BY doc_id),
        cps AS (
            SELECT CAST(POWER(2, k) AS BIGINT) AS c
            FROM (SELECT UNNEST(generate_series(1, 40)) AS k)
            WHERE POWER(2, k) <= (SELECT MAX(doc_id) + 1 FROM dt)
        ),
        v AS (
            SELECT c.c, COUNT(*) AS vocab
            FROM cps c JOIN fd ON fd.first_doc < c.c GROUP BY c.c
        ),
        n AS (
            SELECT c.c, SUM(dt.n_tok) AS toks
            FROM cps c JOIN dt ON dt.doc_id < c.c GROUP BY c.c
        ),
        pts AS (
            SELECT CAST(ROUND(LN(n.toks) * 100000000) AS BIGINT)  AS xm,
                   CAST(ROUND(LN(v.vocab) * 100000000) AS BIGINT) AS ym
            FROM v JOIN n ON v.c = n.c
        ),
        m AS (
            SELECT COUNT(*)                      AS np,
                   SUM(CAST(xm AS HUGEINT))      AS sx,
                   SUM(CAST(ym AS HUGEINT))      AS sy,
                   SUM(CAST(xm * xm AS HUGEINT)) AS sxx,
                   SUM(CAST(xm * ym AS HUGEINT)) AS sxy
            FROM pts
        )
        SELECT np AS n_checkpoints,
               CAST(np * sxy - sx * sy AS DOUBLE)
                   / CAST(np * sxx - sx * sx AS DOUBLE) AS beta,
               (CAST(sy AS DOUBLE) / 100000000.0
                    - (CAST(np * sxy - sx * sy AS DOUBLE)
                       / CAST(np * sxx - sx * sx AS DOUBLE))
                      * (CAST(sx AS DOUBLE) / 100000000.0))
                   / CAST(np AS DOUBLE) AS ln_k
        FROM m
    """,
    doc=(
        "Heaps'-law fit: vocabulary growth V(N) = k·N^β measured at "
        "log-spaced document-count checkpoints (2, 4, 8, …) and fit by "
        "log-log OLS — natural corpora give β ≈ 0.4–0.6; a β collapsing "
        "toward 0 means the tail of the corpus adds no new vocabulary "
        "(template/dup saturation — the scaling-health counterpart of "
        "q_zipf_slope). V at each checkpoint uses the first-seen identity "
        "(a word counts at the one checkpoint range its FIRST doc falls "
        "in — no cumulative distinct), evaluated by a ≤40-row broadcast "
        "checkpoint join against the word grain; token totals likewise "
        "from the doc grain. The regression input is ≤40 exact integer "
        "points (the q_zipf_slope scaled-log pattern)."
    ),
    tags=("text", "heaps", "scaling", "llm-pipeline", "stats"),
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import track_cache

    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
    fd = w.groupBy("word").agg(F.min("doc_id").alias("first_doc"))
    # dt (one narrow row per doc) feeds the checkpoint bound, cps, AND the
    # token-total leg — cached so those legs stop re-running the corpus
    # explode (3 explodes -> 2 per execution; fd's word grain is unbounded,
    # so its own explode IS the algorithm) (r12, guide §5.3).
    dt = track_cache(
        w.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    )
    mx = dt.agg((F.max("doc_id") + 1).alias("dmax"))
    cps = (
        mx.select(F.explode(F.sequence(F.lit(1), F.lit(40))).alias("k"), "dmax")
        .select(F.pow(F.lit(2.0), F.col("k")).cast("long").alias("c"), "dmax")
        .where(F.col("c") <= F.col("dmax"))
        .select("c")
    )
    v = (
        fd.join(F.broadcast(cps), fd.first_doc < F.col("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    n = (
        dt.join(F.broadcast(cps), dt.doc_id < F.col("c"))
        .groupBy("c")
        .agg(F.sum("n_tok").alias("toks"))
    )
    pts = v.join(n, "c").select(
        F.rint(F.log(F.col("toks")) * 1e8).cast("long").alias("xm"),
        F.rint(F.log(F.col("vocab")) * 1e8).cast("long").alias("ym"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum(F.col("xm").cast(_DEC)).alias("sx"),
        F.sum(F.col("ym").cast(_DEC)).alias("sy"),
        F.sum((F.col("xm") * F.col("xm")).cast(_DEC)).alias("sxx"),
        F.sum((F.col("xm") * F.col("ym")).cast(_DEC)).alias("sxy"),
    )
    num = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return m.select(
        F.col("np").alias("n_checkpoints"),
        slope.alias("beta"),
        (
            (
                F.col("sy").cast("double") / F.lit(1e8)
                - slope * (F.col("sx").cast("double") / F.lit(1e8))
            )
            / F.col("np").cast("double")
        ).alias("ln_k"),
    )
