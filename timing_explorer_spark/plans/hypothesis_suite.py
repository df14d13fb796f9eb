"""Hypothesis-testing + decomposition suite: the inferential-statistics layer.

The reference's analytics surface stops at descriptive dashboard aggregates
(SURVEY §2.1); a production monitoring/TSDB stack and an LLM data-curation
pipeline both layer *inferential* questions on top — "did the metric move?",
"are these two fields independent?", "what part of this series is seasonal?".
This module adds those as declarative, oracle-checked plans:

  q_welch_ttest        Welch two-sample t (unequal variances) on event value
                       between two event types — the A/B-test primitive.
  q_chi2_lang_source   chi-squared independence of the documents lang x
                       source contingency table (+ Cramér's V effect size) —
                       the corpus-balance audit.
  q_mann_whitney_u     Mann-Whitney U / Wilcoxon rank-sum with the tie
                       correction — the non-parametric counterpart of the
                       t-test (robust to the heavy-tailed value field).
  q_stl_decompose      classic seasonal-trend decomposition of the hourly
                       event-count signal: centered 2x24 moving-average
                       trend, hour-of-day seasonal means (centered), residual.

Determinism (the stats_suite contract): every aggregate is an exact integer /
decimal(38,0) moment — `value` carries exactly two decimals in this dataset,
so cents = floor(value*100 + 0.5) is lossless (floor+0.5, not rint: Spark
rint is half-even, DuckDB ROUND is half-away — they diverge on exact .5) —
or a per-row decimal(27,8)-rounded summand (the q_bigram_surprisal trick),
and every final double expression is mirrored operation-for-operation in the
oracle SQL. Bit-identical under any partitioning.

Scale notes: the t-test and chi-squared reduce the fact table to a handful of
group moments in ONE map-side-combinable shuffle; the contingency grid is the
cross product of two tiny dimension aggregates (broadcast). Mann-Whitney
ranks on the bounded *distinct-cents* grain (≤ ~50k rows at any SF — a value
histogram, not the fact table), and the STL series is the O(time-range)
hourly grain — both sanctioned bounded-input global windows, never raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import register

_HOUR_US = 3_600_000_000
_DEC = "decimal(38,0)"
_SUM = "decimal(27,8)"


def _cents(col) -> F.Column:
    """value -> exact integer cents (value has exactly 2 decimals; see
    module doc for why floor(x*100+0.5) and not rint/round)."""
    return F.floor(col.cast("double") * F.lit(100) + F.lit(0.5)).cast("long")


_WELCH_ORACLE = """
    WITH g AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS HUGEINT)) AS s,
               SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS HUGEINT)
                   * CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS HUGEINT)) AS q
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY event_type
    ),
    w AS (
        SELECT
            MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
            MAX(CASE WHEN event_type = 'purchase' THEN s END) AS s1,
            MAX(CASE WHEN event_type = 'purchase' THEN q END) AS q1,
            MAX(CASE WHEN event_type = 'click' THEN n END) AS n2,
            MAX(CASE WHEN event_type = 'click' THEN s END) AS s2,
            MAX(CASE WHEN event_type = 'click' THEN q END) AS q2
        FROM g
    ),
    m AS (
        SELECT n1, n2,
               CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS m1,
               CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0 AS m2,
               (CAST(q1 AS DOUBLE) / 10000.0
                   - CAST(n1 AS DOUBLE)
                     * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0)
                     * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0))
                   / CAST(n1 - 1 AS DOUBLE) AS v1,
               (CAST(q2 AS DOUBLE) / 10000.0
                   - CAST(n2 AS DOUBLE)
                     * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0)
                     * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0))
                   / CAST(n2 - 1 AS DOUBLE) AS v2
        FROM w
    ),
    se AS (
        SELECT n1, n2, m1, m2, v1, v2,
               v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS se2
        FROM m
    )
    SELECT n1 AS n_purchase, n2 AS n_click,
           m1 AS mean_purchase, m2 AS mean_click,
           (m1 - m2) / SQRT(se2) AS t_stat,
           se2 * se2
               / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
                      / CAST(n1 - 1 AS DOUBLE)
                  + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
                      / CAST(n2 - 1 AS DOUBLE)) AS welch_df
    FROM se
"""


@register(
    "q_welch_ttest",
    oracle=_WELCH_ORACLE,
    doc=(
        "Welch two-sample t-statistic (unequal variances) comparing the "
        "value field of purchase vs click events, with the "
        "Welch–Satterthwaite degrees of freedom — the A/B-test primitive "
        "over event telemetry. The fact table reduces to six exact integer "
        "moments (n, Σcents, Σcents²) in one map-side-combinable shuffle; "
        "mean/variance/t/df derive from those moments in mirrored double "
        "arithmetic, so the statistic is bit-deterministic at any "
        "partitioning and the plan cost is one scan regardless of SF."
    ),
    tags=("stats", "hypothesis", "ab-test"),
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_type").isin("purchase", "click"))
    vu = _cents(F.col("value"))
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vu.cast(_DEC)).alias("s"),
        F.sum(vu.cast(_DEC) * vu).alias("q"),
    )

    def pick(col: str, et: str) -> F.Column:
        return F.max(F.when(F.col("event_type") == et, F.col(col)))

    w = g.agg(
        pick("n", "purchase").alias("n1"),
        pick("s", "purchase").alias("s1"),
        pick("q", "purchase").alias("q1"),
        pick("n", "click").alias("n2"),
        pick("s", "click").alias("s2"),
        pick("q", "click").alias("q2"),
    )

    def mean(s: str, n: str) -> F.Column:
        return F.col(s).cast("double") / F.col(n).cast("double") / F.lit(100.0)

    def var(q: str, n: str, m: F.Column) -> F.Column:
        return (
            F.col(q).cast("double") / F.lit(10000.0) - F.col(n).cast("double") * m * m
        ) / (F.col(n) - F.lit(1)).cast("double")

    m = w.select(
        "n1",
        "n2",
        mean("s1", "n1").alias("m1"),
        mean("s2", "n2").alias("m2"),
        var("q1", "n1", mean("s1", "n1")).alias("v1"),
        var("q2", "n2", mean("s2", "n2")).alias("v2"),
    )
    se = m.select(
        "n1",
        "n2",
        "m1",
        "m2",
        "v1",
        "v2",
        (
            F.col("v1") / F.col("n1").cast("double") + F.col("v2") / F.col("n2").cast("double")
        ).alias("se2"),
    )
    v_over_n = lambda v, n: F.col(v) / F.col(n).cast("double")  # noqa: E731
    return se.select(
        F.col("n1").alias("n_purchase"),
        F.col("n2").alias("n_click"),
        F.col("m1").alias("mean_purchase"),
        F.col("m2").alias("mean_click"),
        ((F.col("m1") - F.col("m2")) / F.sqrt(F.col("se2"))).alias("t_stat"),
        (
            F.col("se2")
            * F.col("se2")
            / (
                v_over_n("v1", "n1") * v_over_n("v1", "n1")
                / (F.col("n1") - F.lit(1)).cast("double")
                + v_over_n("v2", "n2") * v_over_n("v2", "n2")
                / (F.col("n2") - F.lit(1)).cast("double")
            )
        ).alias("welch_df"),
    )


_CHI2_ORACLE = """
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
    ),
    rt AS (SELECT lang, SUM(o) AS rtot FROM cells GROUP BY lang),
    ct AS (SELECT source, SUM(o) AS ctot FROM cells GROUP BY source),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    grid AS (
        SELECT rt.lang, ct.source, rt.rtot, ct.ctot, COALESCE(cells.o, 0) AS o
        FROM rt CROSS JOIN ct
        LEFT JOIN cells ON cells.lang = rt.lang AND cells.source = ct.source
    ),
    terms AS (
        SELECT CAST(
            (CAST(o AS DOUBLE)
                - CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(o AS DOUBLE)
                - CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE))
            AS DECIMAL(27, 8)) AS term
        FROM grid CROSS JOIN tot
    ),
    dims AS (
        SELECT (SELECT COUNT(*) FROM rt) AS r, (SELECT COUNT(*) FROM ct) AS c
    )
    SELECT CAST(n AS BIGINT) AS n_docs, r AS n_langs, c AS n_sources,
           (r - 1) * (c - 1) AS dof,
           CAST(SUM(term) AS DOUBLE) AS chi2,
           SQRT(CAST(SUM(term) AS DOUBLE)
                / (CAST(n AS DOUBLE)
                   * CAST(CASE WHEN r < c THEN r - 1 ELSE c - 1 END AS DOUBLE)))
               AS cramers_v
    FROM terms CROSS JOIN tot CROSS JOIN dims
    GROUP BY n, r, c
"""


@register(
    "q_chi2_lang_source",
    oracle=_CHI2_ORACLE,
    doc=(
        "Chi-squared test of independence over the documents lang x source "
        "contingency table, with Cramér's V effect size — the corpus-balance "
        "audit (is language mix conditionally uniform across sources, or do "
        "some sources skew?). One fact shuffle produces the cell counts; the "
        "full grid (including structurally-zero cells, which a naive "
        "GROUP BY would drop but the statistic requires) is the cross "
        "product of the two tiny margin aggregates — broadcast, O(r x c). "
        "Per-cell terms are decimal(27,8)-rounded before the final sum, so "
        "the statistic is order-independent and bit-identical to the oracle."
    ),
    tags=("stats", "hypothesis", "llm-pipeline", "corpus"),
)
def q_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = cells.groupBy("lang").agg(F.sum("o").alias("rtot"))
    ct = cells.groupBy("source").agg(F.sum("o").alias("ctot"))
    tot = cells.agg(F.sum("o").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(
            F.broadcast(cells.select("lang", "source", "o")),
            on=["lang", "source"],
            how="left",
        )
        .select("lang", "source", "rtot", "ctot", F.coalesce(F.col("o"), F.lit(0)).alias("o"))
    )
    expected = F.col("rtot").cast("double") * F.col("ctot").cast("double") / F.col(
        "n"
    ).cast("double")
    diff = F.col("o").cast("double") - expected
    terms = grid.crossJoin(F.broadcast(tot)).select(
        "n", (diff * diff / expected).cast(_SUM).alias("term")
    )
    dims = rt.agg(F.count(F.lit(1)).alias("r")).crossJoin(
        ct.agg(F.count(F.lit(1)).alias("c"))
    )
    agg = terms.groupBy("n").agg(F.sum("term").alias("chi2_d")).crossJoin(F.broadcast(dims))
    min_dim = F.when(F.col("r") < F.col("c"), F.col("r") - F.lit(1)).otherwise(
        F.col("c") - F.lit(1)
    )
    return agg.select(
        F.col("n").alias("n_docs"),
        F.col("r").alias("n_langs"),
        F.col("c").alias("n_sources"),
        ((F.col("r") - F.lit(1)) * (F.col("c") - F.lit(1))).alias("dof"),
        F.col("chi2_d").cast("double").alias("chi2"),
        F.sqrt(
            F.col("chi2_d").cast("double")
            / (F.col("n").cast("double") * min_dim.cast("double"))
        ).alias("cramers_v"),
    )


_MWU_ORACLE = """
    WITH f AS (
        SELECT event_type,
               CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vu
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    byval AS (
        SELECT vu, COUNT(*) AS cnt,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1
        FROM f GROUP BY vu
    ),
    ranked AS (
        SELECT vu, cnt, c1,
               COALESCE(SUM(cnt) OVER (ORDER BY vu
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        FROM byval
    ),
    agg AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(cnt - c1) AS BIGINT) AS n2,
               SUM(CAST(c1 AS HUGEINT) * (2 * cum + cnt + 1)) AS r1x2,
               SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
        FROM ranked
    ),
    u AS (
        SELECT n1, n2, n1 + n2 AS nn,
               r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2, ties
        FROM agg
    )
    SELECT n1 AS n_purchase, n2 AS n_view,
           CAST(u1x2 AS DOUBLE) / 2.0 AS u_purchase,
           CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               - CAST(u1x2 AS DOUBLE) / 2.0 AS u_view,
           (CAST(u1x2 AS DOUBLE) / 2.0
               - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
           / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                  * (CAST(nn + 1 AS DOUBLE)
                     - CAST(ties AS DOUBLE)
                       / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)))) AS z_stat
    FROM u
"""


@register(
    "q_mann_whitney_u",
    oracle=_MWU_ORACLE,
    doc=(
        "Mann-Whitney U (Wilcoxon rank-sum) comparing purchase vs view "
        "event values, with midrank tie handling and the tie-corrected "
        "normal approximation — the distribution-free A/B test (robust "
        "where Welch's t is not). Ranking happens on the bounded "
        "distinct-cents grain (a value histogram, ≤ ~50k rows at any SF — "
        "never the fact table): doubled midranks (2·cum + cnt + 1) keep "
        "every moment an exact integer, so U and the tie term are exact and "
        "z derives in mirrored double arithmetic. One fact shuffle onto the "
        "histogram grain + one sanctioned bounded global window."
    ),
    tags=("stats", "hypothesis", "ab-test", "rank"),
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_type").isin("purchase", "view"))
    byval = e.select(
        _cents(F.col("value")).alias("vu"),
        F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0)).alias("is1"),
    ).groupBy("vu").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("is1").alias("c1"),
    )
    w = Window.orderBy("vu").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byval.select(
        "vu",
        "cnt",
        "c1",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum"),
    )
    agg = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("cnt") - F.col("c1")).alias("n2"),
        F.sum(
            F.col("c1").cast(_DEC) * (F.lit(2) * F.col("cum") + F.col("cnt") + F.lit(1))
        ).alias("r1x2"),
        F.sum(F.col("cnt").cast(_DEC) * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias(
            "ties"
        ),
    )
    u = agg.select(
        "n1",
        "n2",
        (F.col("n1") + F.col("n2")).alias("nn"),
        (F.col("r1x2") - F.col("n1").cast(_DEC) * (F.col("n1") + F.lit(1))).alias("u1x2"),
        "ties",
    )
    u1 = F.col("u1x2").cast("double") / F.lit(2.0)
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nnd = F.col("nn").cast("double")
    sigma = F.sqrt(
        n1d * n2d / F.lit(12.0)
        * (
            (F.col("nn") + F.lit(1)).cast("double")
            - F.col("ties").cast("double") / (nnd * (F.col("nn") - F.lit(1)).cast("double"))
        )
    )
    return u.select(
        F.col("n1").alias("n_purchase"),
        F.col("n2").alias("n_view"),
        u1.alias("u_purchase"),
        (n1d * n2d - u1).alias("u_view"),
        ((u1 - n1d * n2d / F.lit(2.0)) / sigma).alias("z_stat"),
    )


_STL_ORACLE = """
    WITH hourly AS (
        SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS b,
               COUNT(*) AS y
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM hourly),
    spine AS (
        SELECT UNNEST(generate_series(lo, hi)) AS b FROM bounds
    ),
    series AS (
        SELECT spine.b, COALESCE(hourly.y, 0) AS y
        FROM spine LEFT JOIN hourly ON hourly.b = spine.b
    ),
    tr AS (
        SELECT b, y,
               SUM(y) OVER (ORDER BY b ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS sa,
               COUNT(*) OVER (ORDER BY b ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS ca,
               SUM(y) OVER (ORDER BY b ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS sb,
               COUNT(*) OVER (ORDER BY b ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS cb
        FROM series
    ),
    trend AS (
        SELECT b, y, b % 24 AS hod,
               CASE WHEN ca = 24 AND cb = 24
                    THEN CAST(sa + sb AS DOUBLE) / 48.0 END AS trend
        FROM tr
    ),
    shod AS (
        SELECT hod,
               CAST(SUM(CAST(CAST(y AS DOUBLE) - trend AS DECIMAL(27, 8))) AS DOUBLE)
                   / CAST(COUNT(trend) AS DOUBLE) AS s_raw
        FROM trend WHERE trend IS NOT NULL
        GROUP BY hod
    ),
    sbar AS (
        SELECT CAST(SUM(CAST(s_raw AS DECIMAL(27, 8))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mu
        FROM shod
    ),
    seas AS (
        SELECT hod, s_raw - mu AS seasonal FROM shod CROSS JOIN sbar
    )
    SELECT t.b AS bucket_h, t.hod, t.y AS y,
           t.trend AS trend, seas.seasonal AS seasonal,
           (CAST(t.y AS DOUBLE) - t.trend) - seas.seasonal AS resid
    FROM trend t JOIN seas ON seas.hod = t.hod
"""


@register(
    "q_stl_decompose",
    oracle=_STL_ORACLE,
    doc=(
        "Classic seasonal-trend decomposition (the moving-average STL "
        "ancestor, Kendall & Stuart) of the hourly event-count signal: "
        "trend = centered 2x24 moving average (the textbook even-period "
        "form), seasonal = hour-of-day means of the detrended series, "
        "centered to sum to zero, residual = y - trend - seasonal. The fact "
        "table collapses to the O(time-range) hourly grain first and a "
        "sequence-generated spine closes count-0 hours, so the windows and "
        "the seasonal regrouping all run on bounded data at any SF; "
        "detrended summands are decimal(27,8)-rounded, making every "
        "component bit-deterministic vs the oracle."
    ),
    tags=("timeseries", "stl", "seasonality", "stats"),
)
def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    b = F.floor(F.unix_micros(F.col("ts")) / F.lit(_HOUR_US)).cast("long")
    hourly = e.where(F.col("ts").isNotNull()).groupBy(b.alias("b")).agg(
        F.count(F.lit(1)).alias("y")
    )
    bounds = hourly.agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("b"))
    series = spine.join(hourly, on="b", how="left").select(
        "b", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    wa = Window.orderBy("b").rowsBetween(-12, 11)
    wb = Window.orderBy("b").rowsBetween(-11, 12)
    tr = series.select(
        "b",
        "y",
        F.sum("y").over(wa).alias("sa"),
        F.count(F.lit(1)).over(wa).alias("ca"),
        F.sum("y").over(wb).alias("sb"),
        F.count(F.lit(1)).over(wb).alias("cb"),
    )
    trend = tr.select(
        "b",
        "y",
        (F.col("b") % F.lit(24)).alias("hod"),
        F.when(
            (F.col("ca") == 24) & (F.col("cb") == 24),
            (F.col("sa") + F.col("sb")).cast("double") / F.lit(48.0),
        ).alias("trend"),
    )
    shod = (
        trend.where(F.col("trend").isNotNull())
        .groupBy("hod")
        .agg(
            (
                F.sum((F.col("y").cast("double") - F.col("trend")).cast(_SUM)).cast("double")
                / F.count("trend").cast("double")
            ).alias("s_raw")
        )
    )
    sbar = shod.agg(
        (
            F.sum(F.col("s_raw").cast(_SUM)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mu")
    )
    seas = shod.crossJoin(F.broadcast(sbar)).select(
        "hod", (F.col("s_raw") - F.col("mu")).alias("seasonal")
    )
    return trend.join(F.broadcast(seas), on="hod").select(
        F.col("b").alias("bucket_h"),
        "hod",
        "y",
        "trend",
        "seasonal",
        ((F.col("y").cast("double") - F.col("trend")) - F.col("seasonal")).alias("resid"),
    )
