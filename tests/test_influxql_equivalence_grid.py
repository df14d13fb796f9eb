"""InfluxQL <-> DuckDB equivalence over the dialect's whole cross-product.

The registered q_influxql_* queries pin ~15 hand-picked dialect shapes; this
test sweeps a deterministic grid over the supported grammar — every aggregate
x every grouping shape (scalar, tag-only, time, time+tag), all fill modes
with an oracle analog, every transformation, and rotating predicate combos
(tag equality/negation, regex, numeric field, time ranges) — and checks each
generated statement against an INDEPENDENTLY RENDERED DuckDB oracle over the
same parquet, using the driver's own canonicalization (sorted columns,
9-sig-digit doubles, ms timestamps).

Each case is built from one tiny AST with two renderers, so the oracle is not
derived from the translator under test; a failure prints both texts. The
grid is fixed (no randomness) — reproducible, no flakes.

Excluded by design (covered by dedicated tests elsewhere): tz() local-bucket
alignment + DST (test_influxql.py property tests), fill(linear), top/bottom/
elapsed/distinct/holt_winters (own oracle-backed queries), LIMIT (row order
under canonicalization makes LIMIT-with-ties engine-defined).
"""

from __future__ import annotations

import datetime as dt

from timing_explorer_spark.functions.influxql import influxql
from timing_explorer_spark.sources.tables import load
from timing_explorer_spark.testing import (
    duckdb_canonical,
    duckdb_connection,
    spark_canonical,
)

_US = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000, "d": 86_400_000_000}
_EPOCH = dt.datetime(1970, 1, 1)


def _us(ts: str) -> int:
    return int((dt.datetime.fromisoformat(ts) - _EPOCH).total_seconds()) * 1_000_000


def _step_us(step: str) -> int:
    return int(step[:-1]) * _US[step[-1]]


# (influx predicate, duckdb predicate) — chosen so no combination empties the
# filtered set (the only equality value, 'click', survives both regexes).
PREDS = {
    "eq": ('"event_type" = \'click\'', "event_type = 'click'"),
    "ne": ('"event_type" != \'error\'', "event_type != 'error'"),
    "re": ('"event_type" =~ /cli|err/', "regexp_matches(event_type, 'cli|err')"),
    "nre": ('"event_type" !~ /^p/', "NOT regexp_matches(event_type, '^p')"),
    "gt": ('"value" > 50', "value > 50"),
    "le": ('"value" <= 200.5', "value <= 200.5"),
}

# time ranges paired with bucket steps that keep the fill spine small
RANGES = [
    ("2024-01-03 00:00:00", "2024-01-10 00:00:00", ["1h", "6h", "30m"]),
    ("2024-01-01 00:00:00", "2024-01-30 23:00:00", ["6h", "1d", "12h"]),
    ("2024-01-05 12:00:00", "2024-01-06 12:00:00", ["10m", "30m", "1h"]),
]

# alias -> (influx projection, duckdb aggregate expression over base)
_PCTL = (
    "CASE WHEN CAST(FLOOR(COUNT(value) * {p} / 100.0 + 0.5) AS BIGINT) >= 1 "
    "THEN list_sort(list(value))[CAST(FLOOR(COUNT(value) * {p} / 100.0 + 0.5) AS BIGINT)] "
    "END"
)
AGGS = {
    "mean": ('mean("value")', "CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value)"),
    "sum": ('sum("value")', "CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE)"),
    "count": ('count("value")', "COUNT(value)"),
    "min": ('min("value")', "MIN(value)"),
    "max": ('max("value")', "MAX(value)"),
    "first": ('first("value")', "arg_min(value, ts)"),
    "last": ('last("value")', "arg_max(value, ts)"),
    "median": ('median("value")', "quantile_cont(value, 0.5)"),
    "stddev": ('stddev("value")', "STDDEV_SAMP(value)"),
    "spread": ('spread("value")', "MAX(value) - MIN(value)"),
    "percentile25": ('percentile("value", 25)', _PCTL.format(p=25)),
    "percentile90": ('percentile("value", 90)', _PCTL.format(p=90)),
    # mode ties -> lowest value; needs its own query shape (see _duck_mode)
    "mode": ('mode("value")', None),
}


def _alias(agg: str) -> str:
    return "percentile" if agg.startswith("percentile") else agg


def _bucket(step: str, off: str | None = None) -> str:
    s = _step_us(step)
    o = _step_us(off) % s if off else 0
    if not o:
        return f"make_timestamp(CAST(FLOOR(epoch_us(ts) / {s}) * {s} AS BIGINT))"
    return (
        f"make_timestamp(CAST(FLOOR((epoch_us(ts) - {o}) / {s}) * {s} + {o} AS BIGINT))"
    )


def _base_sql(preds: list[str], rng, time_expr: str | None) -> str:
    conds = [
        f"ts >= TIMESTAMP '{rng[0]}'",
        f"ts <= TIMESTAMP '{rng[1]}'",
        *(PREDS[p][1] for p in preds),
    ]
    cols = ["event_type", "value", "ts"]
    if time_expr:
        cols.insert(0, f"{time_expr} AS time")
    return f"SELECT {', '.join(cols)} FROM events WHERE {' AND '.join(conds)}"


def _influx_sql(agg_key, preds, rng, group, fill, trans) -> str:
    proj = AGGS[agg_key][0] if agg_key else '"value"'
    if trans:
        name, arg = trans
        proj = f"{name}({proj}{', ' + arg if arg else ''})"
    conds = [
        f"time >= '{rng[0]}'",
        f"time <= '{rng[1]}'",
        *(PREDS[p][0] for p in preds),
    ]
    q = f'SELECT {proj} FROM "events" WHERE {" AND ".join(conds)}'
    if group == "tag":
        q += ' GROUP BY "event_type"'
    elif group:  # "time" / "time+tag", group is (kind, step)
        kind, step = group
        q += f" GROUP BY time({step})"
        if kind == "time+tag":
            q += ', "event_type"'
        if fill is not None:
            q += f" fill({fill})"
    return q


def _duck_mode(base: str, keys: list[str]) -> str:
    ks = ", ".join(keys)
    c = (
        f"WITH base AS ({base}), c AS (SELECT {ks + ', ' if ks else ''}"
        "CAST(value AS DOUBLE) AS v, COUNT(*) AS n FROM base GROUP BY ALL)"
    )
    if not keys:
        return f"{c} SELECT (SELECT v FROM c ORDER BY n DESC, v ASC LIMIT 1) AS mode"
    part = f"PARTITION BY {ks} " if ks else ""
    return (
        f"{c} SELECT {ks}, v AS mode FROM c "
        f"QUALIFY row_number() OVER ({part}ORDER BY n DESC, v ASC) = 1"
    )


def _duck_sql(agg_key, preds, rng, group, fill, trans) -> str:
    if agg_key is None:  # raw projection
        return f"SELECT ts AS time, value FROM ({_base_sql(preds, rng, None)})"
    alias = _alias(agg_key)
    if group == "tag":
        keys, base = ["event_type"], _base_sql(preds, rng, None)
    elif group:
        kind, step = group
        keys = ["time"] + (["event_type"] if kind == "time+tag" else [])
        base = _base_sql(preds, rng, _bucket(step))
    else:
        keys, base = [], _base_sql(preds, rng, None)
    if agg_key == "mode" and not (fill or trans):
        return _duck_mode(base, keys)
    ks = ", ".join(keys)
    expr = AGGS[agg_key][1]
    if not keys:
        return f"SELECT {expr} AS {alias} FROM ({base})"
    agg = f"SELECT {ks}, {expr} AS {alias} FROM ({base}) GROUP BY {ks}"
    if not (fill or trans):
        return agg
    tag = "event_type" in keys
    if trans:
        name, arg = trans
        step_us = _step_us(group[1])
        w = f"PARTITION BY event_type ORDER BY time" if tag else "ORDER BY time"
        rows = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        if name in ("derivative", "non_negative_derivative"):
            t = (
                f"(({alias} - lag({alias}) OVER ({w})) * {float(step_us)}) / "
                f"(epoch_us(time) - lag(epoch_us(time)) OVER ({w}))"
            )
        elif name in ("difference", "non_negative_difference"):
            t = f"{alias} - lag({alias}) OVER ({w})"
        elif name == "moving_average":
            n = int(arg)
            win = f"{w} ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW"
            t = f"AVG(CAST({alias} AS DOUBLE)) OVER ({win})"
            guard = f"COUNT({alias}) OVER ({win})"
            return (
                f"SELECT {ks}, {name} FROM (SELECT {ks}, {t} AS {name}, "
                f"{guard} AS __n FROM ({agg})) WHERE __n = {n}"
            )
        else:  # cumulative_sum
            t = f"SUM(CAST({alias} AS DOUBLE)) OVER ({w} {rows})"
            return f"SELECT {ks}, {t} AS {name} FROM ({agg})"
        sql = f"SELECT {ks}, {t} AS {name} FROM ({agg})"
        nn = f" AND {name} >= 0" if name.startswith("non_negative") else ""
        return f"SELECT * FROM ({sql}) WHERE {name} IS NOT NULL{nn}"
    # fill: spine (+ tag grid) LEFT JOIN the aggregate
    step_us = _step_us(group[1])
    lo = _us(rng[0]) // step_us * step_us
    spine = (
        f"SELECT make_timestamp(CAST(x AS BIGINT)) AS time "
        f"FROM generate_series({lo}, {_us(rng[1])}, {step_us}) t(x)"
    )
    grid = (
        f"SELECT s.time, d.event_type FROM ({spine}) s CROSS JOIN "
        f"(SELECT DISTINCT event_type FROM ({base})) d"
        if tag
        else spine
    )
    on = "g.time = a.time" + (" AND g.event_type = a.event_type" if tag else "")
    gks = ", ".join(f"g.{k}" for k in keys)
    if fill == "null":
        val = f"a.{alias}"
    elif fill == "previous":
        part = "PARTITION BY g.event_type " if tag else ""
        val = (
            f"last_value(a.{alias} IGNORE NULLS) OVER ({part}ORDER BY g.time "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    else:  # numeric constant, cast to the aggregate's own type
        duck_t = "BIGINT" if agg_key == "count" else "DOUBLE"
        val = f"COALESCE(a.{alias}, CAST({fill} AS {duck_t}))"
    return (
        f"SELECT {gks}, {val} AS {alias} FROM ({grid}) g "
        f"LEFT JOIN ({agg}) a ON {on}"
    )


def _grid() -> list[tuple]:
    """(case name, agg, preds, range index, group, fill, trans) tuples."""
    cases = []
    aggs = list(AGGS)
    # 1. every aggregate, time+tag grouped, rotating range/step/predicates
    pred_rot = [["eq"], ["ne", "gt"], ["re"], ["nre", "le"], [], ["gt", "le"]]
    for i, a in enumerate(aggs):
        ri = i % len(RANGES)
        step = RANGES[ri][2][i % 3]
        cases.append((f"time_tag_{a}", a, pred_rot[i % 6], ri, ("time+tag", step), None, None))
    # 2. every aggregate, time-only grouped
    for i, a in enumerate(aggs):
        ri = (i + 1) % len(RANGES)
        step = RANGES[ri][2][(i + 1) % 3]
        cases.append((f"time_{a}", a, pred_rot[(i + 3) % 6], ri, ("time", step), None, None))
    # 3. tag-only and ungrouped-scalar shapes
    for i, a in enumerate(["mean", "count", "spread", "percentile90", "mode", "first"]):
        cases.append((f"tag_{a}", a, pred_rot[i % 6], i % 3, "tag", None, None))
    for i, a in enumerate(["sum", "median", "stddev", "last", "percentile25", "mode"]):
        cases.append((f"scalar_{a}", a, pred_rot[(i + 2) % 6], i % 3, None, None, None))
    # 4. fill modes (null / constant / previous), with and without a tag
    for i, (fill, a) in enumerate(
        [("null", "mean"), ("0", "count"), ("previous", "sum"),
         ("null", "spread"), ("-1.5", "mean"), ("previous", "count")]
    ):
        kind = "time+tag" if i % 2 else "time"
        ri = i % len(RANGES)
        cases.append((f"fill_{fill}_{a}_{kind}", a, pred_rot[i % 6], ri, (kind, RANGES[ri][2][0]), fill, None))
    # 5. every transformation over the unfilled aggregate
    for i, (tname, arg, a) in enumerate(
        [("derivative", None, "mean"), ("non_negative_derivative", None, "sum"),
         ("difference", None, "count"), ("non_negative_difference", None, "mean"),
         ("moving_average", "4", "sum"), ("cumulative_sum", None, "count"),
         ("derivative", None, "count"), ("moving_average", "3", "mean")]
    ):
        kind = "time+tag" if i % 2 else "time"
        ri = i % len(RANGES)
        cases.append(
            (f"trans_{tname}_{a}_{kind}", a, pred_rot[(i + 1) % 6], ri,
             (kind, RANGES[ri][2][1]), None, (tname, arg))
        )
    # 6. raw field projection
    cases.append(("raw_eq", None, ["eq"], 0, None, None, None))
    cases.append(("raw_regex_num", None, ["re", "gt"], 2, None, None, None))
    return cases


def _pagination_grid() -> list[tuple[str, str, str]]:
    """(name, influx statement, duck oracle) for LIMIT/OFFSET/SLIMIT/SOFFSET
    and time(step, off) shifted-grid shapes — the clauses the main grid
    excludes. Oracles rendered independently (row_number / series-rank SQL),
    not derived from the translator."""
    rng = ("2024-01-01 00:00:00", "2024-01-15 00:00:00")
    t = f"ts >= TIMESTAMP '{rng[0]}' AND ts <= TIMESTAMP '{rng[1]}'"
    it = f"time >= '{rng[0]}' AND time <= '{rng[1]}'"
    cases = []
    # per-series LIMIT/OFFSET over time+tag buckets
    for name, lim, off in [("ps_limit", 3, 0), ("ps_limit_offset", 4, 2), ("ps_offset_tail", 99, 5)]:
        suffix = f" LIMIT {lim}" + (f" OFFSET {off}" if off else "")
        cases.append((
            name,
            f'SELECT count("value") FROM "events" WHERE {it} '
            f'GROUP BY time(1d), "event_type" ORDER BY time ASC{suffix}',
            f"""
            SELECT time, event_type, count FROM (
                SELECT {_bucket('1d')} AS time, event_type, COUNT(value) AS count,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY {_bucket('1d')}) AS rn
                FROM events WHERE {t} GROUP BY 1, 2
            ) WHERE rn > {off} AND rn <= {off + lim}
            """,
        ))
    # global LIMIT/OFFSET over an untagged bucket series (unique times)
    for name, lim, off in [("g_limit", 5, 0), ("g_limit_offset", 4, 3)]:
        suffix = f" LIMIT {lim}" + (f" OFFSET {off}" if off else "")
        cases.append((
            name,
            f'SELECT sum("value") FROM "events" WHERE {it} '
            f"GROUP BY time(1d) ORDER BY time ASC{suffix}",
            f"""
            SELECT time, sum FROM (
                SELECT {_bucket('1d')} AS time,
                       CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS sum,
                       ROW_NUMBER() OVER (ORDER BY {_bucket('1d')}) AS rn
                FROM events WHERE {t} GROUP BY 1
            ) WHERE rn > {off} AND rn <= {off + lim}
            """,
        ))
    # SLIMIT/SOFFSET series pagination (lexical tag order)
    for name, sl, so in [("slimit", 2, 0), ("slimit_soffset", 2, 1), ("soffset_tail", 99, 3)]:
        suffix = f" SLIMIT {sl}" + (f" SOFFSET {so}" if so else "")
        cases.append((
            name,
            f'SELECT mean("value") FROM "events" WHERE {it} '
            f'GROUP BY time(1d), "event_type"{suffix}',
            f"""
            WITH s AS (
                SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) AS sn
                FROM (SELECT DISTINCT event_type FROM events WHERE {t})
            )
            SELECT {_bucket('1d')} AS time, e.event_type,
                   CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE)
                       / COUNT(value) AS mean
            FROM events e JOIN s ON e.event_type = s.event_type
            WHERE s.sn > {so} AND s.sn <= {so + sl} AND {t}
            GROUP BY 1, 2
            """,
        ))
    # shifted bucket grids, positive and negative offsets, with a tag and
    # composed with per-series pagination
    for name, step, off in [("grid_6h", "1d", "6h"), ("grid_neg", "1d", "-6h"),
                            ("grid_90m", "6h", "90m")]:
        cases.append((
            name,
            f'SELECT max("value") FROM "events" WHERE {it} '
            f'GROUP BY time({step}, {off}), "event_type"',
            f"SELECT {_bucket(step, off)} AS time, event_type, MAX(value) AS max "
            f"FROM events WHERE {t} GROUP BY 1, 2",
        ))
    cases.append((
        "grid_plus_pagination",
        f'SELECT count("value") FROM "events" WHERE {it} '
        f'GROUP BY time(1d, 6h), "event_type" ORDER BY time ASC LIMIT 2 OFFSET 1 '
        f"SLIMIT 2 SOFFSET 2",
        f"""
        WITH s AS (
            SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) AS sn
            FROM (SELECT DISTINCT event_type FROM events WHERE {t})
        ),
        a AS (
            SELECT {_bucket('1d', '6h')} AS time, e.event_type,
                   COUNT(value) AS count
            FROM events e JOIN s ON e.event_type = s.event_type
            WHERE s.sn > 2 AND s.sn <= 4 AND {t}
            GROUP BY 1, 2
        )
        SELECT time, event_type, count FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY time) AS rn FROM a
        ) WHERE rn > 1 AND rn <= 3
        """,
    ))
    return cases


def test_influxql_pagination_offset_grid(spark, sf_smoke):
    events = load(spark, sf_smoke, "events")
    con = duckdb_connection(sf_smoke)
    failures = []
    cases = _pagination_grid()
    for name, iq, dq in cases:
        try:
            s_cols, s_rows = spark_canonical(influxql(iq, {"events": events}))
            d_cols, d_rows = duckdb_canonical(con, dq)
        except Exception as e:  # noqa: BLE001 - report with the query text
            failures.append(f"{name}: ERROR {e}\n  influx: {iq}\n  duck:   {dq}")
            continue
        if s_cols != d_cols:
            failures.append(f"{name}: columns {s_cols} != {d_cols}\n  influx: {iq}")
        elif s_rows != d_rows:
            diff_a = [r for r in s_rows if r not in d_rows][:3]
            diff_b = [r for r in d_rows if r not in s_rows][:3]
            failures.append(
                f"{name}: {len(s_rows)} vs {len(d_rows)} rows; "
                f"spark-only {diff_a} duck-only {diff_b}\n  influx: {iq}\n  duck:   {dq}"
            )
    assert not failures, f"{len(failures)}/{len(cases)} mismatches:\n" + "\n".join(failures)


def test_influxql_duckdb_equivalence_grid(spark, sf_smoke):
    events = load(spark, sf_smoke, "events")
    con = duckdb_connection(sf_smoke)
    failures = []
    cases = _grid()
    for name, agg, preds, ri, group, fill, trans in cases:
        rng = RANGES[ri][:2]
        iq = _influx_sql(agg, preds, rng, group, fill, trans)
        dq = _duck_sql(agg, preds, rng, group, fill, trans)
        try:
            s_cols, s_rows = spark_canonical(influxql(iq, {"events": events}))
            d_cols, d_rows = duckdb_canonical(con, dq)
        except Exception as e:  # noqa: BLE001 - report with the query text
            failures.append(f"{name}: ERROR {e}\n  influx: {iq}\n  duck:   {dq}")
            continue
        if s_cols != d_cols:
            failures.append(f"{name}: columns {s_cols} != {d_cols}\n  influx: {iq}")
        elif s_rows != d_rows:
            diff_a = [r for r in s_rows if r not in d_rows][:3]
            diff_b = [r for r in d_rows if r not in s_rows][:3]
            failures.append(
                f"{name}: {len(s_rows)} vs {len(d_rows)} rows; "
                f"spark-only {diff_a} duck-only {diff_b}\n  influx: {iq}\n  duck:   {dq}"
            )
    assert not failures, f"{len(failures)}/{len(cases)} mismatches:\n" + "\n".join(failures)
