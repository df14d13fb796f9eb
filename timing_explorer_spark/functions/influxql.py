"""InfluxQL-subset translator: the reference's END-USER query language.

The reference's only external query surface is InfluxQL issued by its Grafana
dashboards (SURVEY §2.1; docker/grafana_setup/dashboard.json:86-111,189-216,
295-331). This module lets those queries run verbatim against the engine's
DataFrames — closing the "a user of the reference could switch and run every
query they run today" loop for the query *language*, not just the semantics.

Supported grammar (everything the dashboards use, plus the obvious
neighbors):

    SELECT <proj> [INTO "<target>"] FROM <measurement>[, <measurement> ...]
      (FROM may also be /regex/ — the statement runs per matched measurement
       and results stack under a leading `measurement` column, mirroring
       InfluxDB's never-merged per-measurement series blocks; INTO registers
       the result as a new measurement in the tables mapping — the CQ form)
      [WHERE <tag> = '<v>' [AND ...] [AND time >= <t>] [AND time < <t>]]
      (<t> := '<ts>' | <epoch><ns|u|ms|s> | now(), each ± <N><unit> ...)
      [GROUP BY time(<N><u>[, <off><u>])[, <tag> ...] | <tag>[, <tag> ...] | *
                [fill(null | none | linear | previous | <number>)]]
      (* expands to every tag column; multiple tags = one series per tuple)
      [ORDER BY time [ASC|DESC]]
      [LIMIT <n>] [OFFSET <k>]    (points: per series when grouped by a tag,
                                   global otherwise — InfluxDB's contract)
      [SLIMIT <n>] [SOFFSET <k>]  (series pagination, lexical tag order)
      [tz('<IANA zone>')]     (bucket alignment to local wall clock)

    time(N, off) is InfluxQL's offset_interval: it shifts the bucket grid
    (time(1d, 6h) = daily buckets starting at 06:00; negative offsets
    normalize onto the same grid), composing with tz(), fill() spines, and
    the streaming path (window() startTime) identically.

    SHOW MEASUREMENTS | SHOW TAG KEYS [FROM m] | SHOW FIELD KEYS [FROM m]
      | SHOW TAG VALUES FROM m WITH KEY = "k"     (Grafana template variables)
      | SHOW TAG VALUES FROM m WITH KEY IN ("k1", "k2")
      | SHOW SERIES [FROM m]      (measurement,k=v series keys, lexical)

    proj       := "<field>" | <agg>("<field>"[, <p>])
                | <agg>(...) <op> <number>      (unit-conversion math on the
                  aggregate, applied BEFORE fill — the constant is verbatim)
                | "<field>" <op> "<field>" | "<field>" <op> <number>
                  (raw per-point arithmetic; AS alias required)
                | <any of the above> AS <name>  (output column naming;
                  multi-stat items may each carry their own AS)
                | <agg>(...), <agg>(...), ...   (multi-stat; fill(null) only)
                | <trans>(<agg>("<field>")[, <arg>])
                | top("<field>", N) | bottom("<field>", N)   (selectors:
                  N greatest/least values, original point timestamps)
                | elapsed("<field>"[, <N><u>])  (delta to previous point)
                | holt_winters[_with_fit](<agg>("<field>"), h, m)
                  (seasonal forecast; functions/forecast.py)
    agg        := mean | sum | count | min | max | first | last | median
                  | mode (ties -> lowest value) | stddev | spread
                  | percentile (arg = 0..100; NEAREST-RANK, actual sample)
                  | integral (arg = unit seconds; GROUP BY time only)
                  | distinct (multi-row: one row per distinct value)
    trans      := derivative | non_negative_derivative      (arg = <N><u>)
                | difference | non_negative_difference
                | moving_average                            (arg = <N> points)
                | cumulative_sum
    tag preds  := "<tag>" = '<v>' | != | <> | =~ /re/ | !~ /re/
    durations  := s, m, h, d

Streaming: ``influxql_streaming(query, stream)`` runs the dashboard-panel
core (single mean/sum/count/min/max + tag filters + GROUP BY time(N)[,tag])
as an incremental Structured Streaming aggregation — equivalence-tested
row-for-row against this batch translator on replayed data.

Translation notes:
  - `time` maps to the measurement's event-time column (``ts``).
  - GROUP BY time(N) buckets via date_trunc-free epoch arithmetic (works for
    any interval, not just calendar units) — same bucketing InfluxDB uses.
  - fill(null) / fill(linear) join a generated time spine over the queried
    range (the InfluxQL contract: fill requires an explicit time range) —
    the spine is O(range/interval), independent of fact cardinality.
  - mean() uses the engine's order-independent decimal aggregation, so
    translated queries hash-match a DuckDB oracle like every other
    registered query.

This is deliberately a small, regex-driven parser for the dashboard
dialect — not a general InfluxQL implementation.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .numeric import exact_avg, exact_sum

_UNIT_US = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000, "d": 86_400_000_000}

_RX = re.compile(
    r"""^\s*SELECT\s+(?P<proj>.+?)
        (?P<intoclause>\s+INTO\s+"?(?P<into>\w+)"?)?
        \s+FROM\s+(?P<meas>"?\w+"?(?:\s*,\s*"?\w+"?)*|/[^/]+/)
        (?:\s+WHERE\s+(?P<where>.+?))?
        (?:\s+GROUP\s+BY\s+(?P<group>time\(\d+[smhd](?:\s*,\s*-?\d+[smhd])?\)(?:\s*,\s*(?:"?\w+"?|\*))*|\*|"?\w+"?(?:\s*,\s*"?\w+"?)*)
            (?:\s+fill\((?P<fill>null|none|linear|previous|[-+]?\d+(?:\.\d+)?)\))?)?
        (?:\s+ORDER\s+BY\s+time(?:\s+(?P<dir>ASC|DESC))?)?
        (?:\s+LIMIT\s+(?P<limit>\d+))?
        (?:\s+OFFSET\s+(?P<offset>\d+))?
        (?:\s+SLIMIT\s+(?P<slimit>\d+))?
        (?:\s+SOFFSET\s+(?P<soffset>\d+))?
        (?:\s+tz\('(?P<tz>[^']+)'\))?\s*$""",
    re.IGNORECASE | re.VERBOSE,
)
_RX_AGG = re.compile(
    r'^(?P<fn>mean|sum|count|min|max|first|last|median|mode|stddev|spread|percentile|integral)'
    r'\(\s*"?(?P<field>\w+)"?\s*(?:,\s*(?P<agg_arg>[-+]?\d+(?:\.\d+)?))?\s*\)$',
    re.IGNORECASE,
)
# DISTINCT(field) — multi-row "aggregate": the distinct field values (per
# bucket when grouped); handled outside _agg_column like the selectors
_RX_DISTINCT = re.compile(r'^distinct\(\s*"?(?P<field>\w+)"?\s*\)$', re.IGNORECASE)
_RX_FIELD = re.compile(r'^"?(?P<field>\w+)"?$')
_RX_TRANS = re.compile(
    r"^(?P<fn>non_negative_derivative|derivative|non_negative_difference"
    r"|difference|moving_average|cumulative_sum)"
    r"\(\s*(?P<inner>.+?)(?:\s*,\s*(?P<n>\d+)(?P<u>[smhd])?)?\s*\)$",
    re.IGNORECASE,
)
_RX_TAG = re.compile(r"""^"?(?P<tag>\w+)"?\s*(?P<op>=|!=|<>)\s*'(?P<val>[^']*)'$""")
_RX_FIELD_CMP = re.compile(
    r"""^"?(?P<field>\w+)"?\s*(?P<op>>=|<=|!=|<>|>|<|=)\s*"""
    r"""(?P<num>[-+]?\d+(?:\.\d+)?)$"""
)
_RX_TIME = re.compile(r"^time\s*(?P<op>>=|<=|>|<)\s*(?P<expr>.+)$", re.IGNORECASE)
# InfluxQL duration literals (now() arithmetic) in µs; ns handled by
# integer division (our timestamps are µs-precision like the engine's).
_DUR_US = {
    "u": 1,
    "µ": 1,
    "ms": 1_000,
    "s": 1_000_000,
    "m": 60_000_000,
    "h": 3_600_000_000,
    "d": 86_400_000_000,
    "w": 604_800_000_000,
}


def _dur_to_us(n: int, unit: str) -> int:
    unit = unit.lower()
    return n // 1000 if unit == "ns" else n * _DUR_US[unit]
_RX_TIME_TERM = re.compile(
    r"^(?:'(?P<iso>[^']+)'|(?P<epoch>\d+)(?P<eunit>ns|u|µ|ms|s)?|(?P<now>now\(\)))",
    re.IGNORECASE,
)
_RX_TIME_ARITH = re.compile(r"\s*(?P<sign>[-+])\s*(?P<n>\d+)(?P<u>ns|u|µ|ms|s|m|h|d|w)")


def _resolve_time_expr(expr: str, now) -> str:
    """An InfluxQL time operand -> absolute 'YYYY-MM-DD HH:MM:SS[.ffffff]'
    string (UTC). Accepts the three forms clients actually send: a quoted
    timestamp ('2024-01-01 00:00:00' — what the reference dashboards test
    uses), a bare epoch integer with unit suffix (1610000000000ms — what
    Grafana's $timeFilter really renders), and now() — each optionally
    followed by ±duration arithmetic (now() - 90s, '2024-01-02' + 6h).
    ``now`` is the injection point for determinism (tests pass a fixed
    instant; default is the wall clock). A LIVE now() (``now is None``)
    renders with an explicit 'Z' zone designator: the result is later
    ``cast('timestamp')``, which interprets a naive string in the SESSION
    timezone — a live UTC wall-clock string in a non-UTC session would
    shift the boundary by the zone offset. Injected instants stay naive
    (they are session-relative by contract, matching the oracle)."""
    import datetime as _dt

    s = expr.strip()
    mt = _RX_TIME_TERM.match(s)
    if not mt:
        raise ValueError(f"unsupported time operand: {expr!r}")
    utc_instant = False
    if mt.group("iso"):
        base = _dt.datetime.fromisoformat(mt.group("iso"))
    elif mt.group("epoch") is not None:
        unit = (mt.group("eunit") or "ns").lower()  # bare ints are ns in InfluxQL
        us = _dur_to_us(int(mt.group("epoch")), unit)
        base = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)
    else:
        if now is None:
            base = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
            utc_instant = True
        elif isinstance(now, str):
            base = _dt.datetime.fromisoformat(now)
        else:
            base = now
    rest = s[mt.end() :]
    pos = 0
    while pos < len(rest.rstrip()):
        ma = _RX_TIME_ARITH.match(rest, pos)
        if not ma:
            raise ValueError(f"unsupported time arithmetic: {expr!r}")
        delta = _dt.timedelta(microseconds=_dur_to_us(int(ma.group("n")), ma.group("u")))
        base = base + delta if ma.group("sign") == "+" else base - delta
        pos = ma.end()
    out = base.strftime("%Y-%m-%d %H:%M:%S.%f") if base.microsecond else base.strftime("%Y-%m-%d %H:%M:%S")
    return out + "Z" if utc_instant else out
_RX_BUCKET = re.compile(
    r'^time\((?P<n>\d+)(?P<u>[smhd])'
    r'(?:\s*,\s*(?P<off>-?\d+)(?P<offu>[smhd]))?\)'
    r'(?:\s*,\s*(?P<tags>(?:"?\w+"?|\*)(?:\s*,\s*(?:"?\w+"?|\*))*))?$',
    re.IGNORECASE,
)


def _tag_columns(df: DataFrame, time_col: str) -> list[str]:
    """InfluxDB tags are always strings: the measurement's tag set is its
    string-typed columns (the same convention SHOW TAG KEYS uses)."""
    return [c for c, t in df.dtypes if c != time_col and t == "string"]


def _group_tags(raw: str | None, df: DataFrame, time_col: str) -> list[str]:
    """The tag list of a GROUP BY clause: comma-separated names (quoted or
    bare), with ``*`` expanding to every tag column (InfluxDB's GROUP BY *).
    Order is preserved; duplicates collapse to the first occurrence."""
    if not raw:
        return []
    tags: list[str] = []
    for part in raw.split(","):
        part = part.strip().strip('"')
        expanded = _tag_columns(df, time_col) if part == "*" else [part]
        for t in expanded:
            if t not in tags:
                tags.append(t)
    return tags
# regex tag predicate: "key" =~ /pattern/ or !~ /pattern/ (Grafana template
# variables in "All"/multi mode render these)
_RX_TAG_REGEX = re.compile(r'^"?(?P<tag>\w+)"?\s*(?P<op>=~|!~)\s*/(?P<rx>[^/]*)/$')
# top()/bottom() selector aggregates: N greatest/least field VALUES, each
# with its ORIGINAL point timestamp (unlike max/min which collapse to one)
_RX_TOPBOT = re.compile(
    r'^(?P<fn>top|bottom)\(\s*"?(?P<field>\w+)"?\s*,\s*(?P<n>\d+)\s*\)$', re.IGNORECASE
)
# elapsed(field[, unit]) — per-point delta to the previous point
_RX_ELAPSED = re.compile(
    r'^elapsed\(\s*"?(?P<field>\w+)"?\s*(?:,\s*(?P<n>\d+)(?P<u>[smhd]))?\s*\)$',
    re.IGNORECASE,
)
# holt_winters[_with_fit](<agg>(field), h, m) — seasonal forecast over the
# GROUP BY time() aggregate
_RX_HW = re.compile(
    r'^(?P<fn>holt_winters_with_fit|holt_winters)'
    r'\(\s*(?P<agg>\w+)\(\s*"?(?P<field>\w+)"?\s*\)\s*,'
    r'\s*(?P<h>\d+)\s*,\s*(?P<m>\d+)\s*\)$',
    re.IGNORECASE,
)
# <proj> AS <name> — user-named output column (Grafana's per-target alias)
_RX_AS = re.compile(r'^(?P<expr>.+?)\s+AS\s+"?(?P<alias>\w+)"?$', re.IGNORECASE)
# <agg>(...) <op> <number> — scalar arithmetic on an aggregate result
# (SELECT mean("value") * 8 ... — the unit-conversion idiom)
_RX_AGG_MATH = re.compile(
    r'^(?P<inner>\w+\(.*?\))\s*(?P<op>[-+*/])\s*(?P<num>[-+]?\d+(?:\.\d+)?)$'
)
# "a" <op> "b" / "a" <op> <number> — raw field arithmetic
# (SELECT "user" + "system", SELECT "bytes" / 1024)
_RX_FIELD_MATH = re.compile(
    r'^"?(?P<f1>\w+)"?\s*(?P<op>[-+*/])\s*"?(?P<f2>[\w.]+)"?$'
)


def _split_alias(p: str) -> tuple[str, str | None]:
    ma = _RX_AS.match(p.strip())
    return (ma.group("expr"), ma.group("alias")) if ma else (p.strip(), None)


def _apply_math(col: Column, op: str, num: float) -> Column:
    c = col.cast("double")
    k = F.lit(num)
    if op == "/" and num == 0:
        raise ValueError("division by zero in projection arithmetic")
    return c + k if op == "+" else c - k if op == "-" else c * k if op == "*" else c / k


def _agg_column(fn: str, field: str, time_col: str = "ts", arg: str | None = None) -> Column:
    fn = fn.lower()
    col = F.col(field)
    if fn == "integral":  # handled in the GROUP BY branch (bucketed trapezoid)
        raise ValueError("integral() requires GROUP BY time()")
    if fn == "percentile":  # PERCENTILE(field, N): InfluxDB takes 0..100
        if arg is None:
            raise ValueError("percentile() requires a second argument (0..100)")
        p = float(arg)
        if not 0 <= p <= 100:
            raise ValueError(f"percentile argument {p} outside [0, 100]")
        # InfluxDB PERCENTILE is nearest-rank and returns an ACTUAL sample
        # point, not an interpolated value (influxdb query/functions.go
        # PercentileReduce: idx = floor(n*p/100 + 0.5) - 1, nil when idx<0).
        # Reproduce that exactly: sort the group's samples, round-half-up
        # index. collect_list bounds memory by group size — the InfluxQL
        # surface always buckets by time(), so groups are bucket-sized; the
        # interpolated-percentile scale path remains q_percentile_bands /
        # approx_percentile.
        vals = F.array_sort(F.collect_list(col))
        idx = F.floor(F.size(vals) * F.lit(p) / F.lit(100.0) + F.lit(0.5)).cast("int")
        return F.when(idx >= 1, F.get(vals, idx - 1))
    if fn == "mean":
        return exact_avg(col, "decimal(27,8)")
    if fn == "sum":
        return exact_sum(col, "decimal(27,8)")
    if fn == "count":
        return F.count(col)
    if fn == "min":
        return F.min(col)
    if fn == "max":
        return F.max(col)
    if fn == "first":  # earliest value by event time (InfluxDB FIRST())
        return F.min_by(col, F.col(time_col))
    if fn == "last":  # latest value by event time (InfluxDB LAST())
        return F.max_by(col, F.col(time_col))
    if fn == "median":  # middle value; even counts average the two middles
        return F.percentile(col, F.lit(0.5))
    if fn == "mode":
        # most frequent value; ties take the LOWEST value (InfluxDB MODE()
        # contract — deterministic, unlike Spark/DuckDB mode()). Fold over
        # the ascending-sorted sample list tracking (current run, best
        # run); strictly-greater comparison keeps the first (smallest)
        # value among equal counts. Group-bounded like percentile above.
        vals = F.array_sort(F.collect_list(col.cast("double")))
        init = F.struct(
            F.lit(None).cast("double").alias("cur"),
            F.lit(0).cast("long").alias("n"),
            F.lit(None).cast("double").alias("best"),
            F.lit(0).cast("long").alias("bn"),
        )

        def _step(acc, x):
            n = F.when(acc["cur"].eqNullSafe(x), acc["n"] + 1).otherwise(F.lit(1).cast("long"))
            better = n > acc["bn"]
            return F.struct(
                x.alias("cur"),
                n.alias("n"),
                F.when(better, x).otherwise(acc["best"]).alias("best"),
                F.when(better, n).otherwise(acc["bn"]).alias("bn"),
            )

        return F.aggregate(vals, init, _step)["best"]
    if fn == "stddev":  # sample stddev (InfluxDB STDDEV())
        return F.stddev_samp(col)
    return F.max(col) - F.min(col)  # spread = max − min


_RX_SHOW = re.compile(
    r"""^\s*SHOW\s+(?:(?P<what>MEASUREMENTS|FIELD\s+KEYS|TAG\s+KEYS)
        (?:\s+FROM\s+"?(?P<meas>\w+)"?)?
        |TAG\s+VALUES\s+FROM\s+"?(?P<meas2>\w+)"?\s+WITH\s+KEY\s*
            (?:=\s*"?(?P<key>\w+)"?|IN\s*\(\s*(?P<keys>[^)]+?)\s*\))
        |(?P<series>SERIES)(?:\s+FROM\s+"?(?P<meas3>\w+)"?)?)
        \s*$""",
    re.IGNORECASE | re.VERBOSE,
)


def _show(m: re.Match, tables: dict[str, DataFrame], time_col: str) -> DataFrame:
    """Metadata commands — the queries Grafana template variables issue.
    Tag keys = string-typed columns (InfluxDB tags are always strings);
    field keys = every other non-time column."""
    import functools

    if not tables:
        raise ValueError("no measurements registered")
    some_df = next(iter(tables.values()))
    spark = some_df.sparkSession

    def _cols(meas: str | None, want_tags: bool) -> DataFrame:
        if meas is not None and meas not in tables:
            raise ValueError(f"unknown measurement {meas!r}")
        names = [meas] if meas else sorted(tables)
        frames = []
        for name in names:
            df = tables[name]
            keys = [
                c
                for c, t in df.dtypes
                if c != time_col and ((t == "string") == want_tags)
            ]
            frames.append(
                spark.createDataFrame(
                    [(name, k) for k in sorted(keys)], "measurement string, key string"
                )
            )
        return functools.reduce(lambda a, b: a.unionByName(b), frames)

    what = (m.group("what") or "").upper().replace(" ", "")
    if what == "MEASUREMENTS":
        return spark.createDataFrame(
            [(n,) for n in sorted(tables)], "name string"
        )
    if what == "TAGKEYS":
        return _cols(m.group("meas"), want_tags=True)
    if what == "FIELDKEYS":
        return _cols(m.group("meas"), want_tags=False)
    if m.group("series"):
        # SHOW SERIES [FROM m] — one row per series key: the measurement
        # name plus its tag k=v pairs, tag keys in lexical order (InfluxDB's
        # series-key rendering). One distinct per measurement over the tag
        # columns — series cardinality, never fact rows.
        names = (
            [m.group("meas3")] if m.group("meas3") else sorted(tables)
        )
        frames = []
        for name in names:
            if name not in tables:
                raise ValueError(f"unknown measurement {name!r}")
            df = tables[name]
            tag_cols = sorted(
                c for c, t in df.dtypes if c != time_col and t == "string"
            )
            parts: list = [F.lit(name)]
            for t in tag_cols:
                parts.append(F.concat(F.lit(t + "="), F.col(t)))
            frames.append(
                df.select(*tag_cols)
                .distinct()
                .select(F.concat_ws(",", *parts).alias("key"))
            )
        import functools as _ft

        return _ft.reduce(lambda a, b: a.unionByName(b), frames).orderBy("key")
    meas = m.group("meas2")
    if meas not in tables:
        raise ValueError(f"unknown measurement {meas!r}")
    if m.group("keys"):
        keys = [k.strip().strip('"').strip("'") for k in m.group("keys").split(",")]
    else:
        keys = [m.group("key")]
    frames = [
        tables[meas]
        .select(F.col(k).alias("value"))
        .distinct()
        .select(F.lit(k).alias("key"), "value")
        for k in keys
    ]
    import functools as _ft

    return _ft.reduce(lambda a, b: a.unionByName(b), frames).orderBy("key", "value")


def _bucket_us(mb: re.Match) -> tuple[int, int]:
    """(step_us, offset_us) from a GROUP BY time(N[,off]) match. The second
    argument is InfluxQL's offset_interval — it SHIFTS the bucket grid
    (time(1d, 6h) = daily buckets starting 06:00), may be negative, and
    composes with every aggregate/selector path the same way."""
    step_us = int(mb.group("n")) * _UNIT_US[mb.group("u").lower()]
    off_us = (
        int(mb.group("off")) * _UNIT_US[mb.group("offu").lower()]
        if mb.groupdict().get("off")
        else 0
    )
    # Python's % normalizes negative offsets onto the same grid
    # (time(1d,-6h) and time(1d,18h) floor to identical boundaries).
    return step_us, off_us % step_us


def _bucket_col(time_col: str, step_us: int, tz: str | None, off_us: int = 0) -> Column:
    """GROUP BY time(N[, off]) bucket start as a UTC instant. With tz(),
    buckets align to the zone's local wall clock (InfluxDB's tz() clause —
    daily buckets start at local midnight): floor in local time, convert the
    boundary back to the UTC instant. Fixed-offset exact; at a DST
    transition the boundary shifts with the wall clock, matching InfluxDB.
    A nonzero offset_interval shifts the grid: floor((t-off)/step)*step+off
    (applied in local time under tz(), like InfluxDB).
    """
    if tz is None:
        return F.timestamp_micros(
            (
                F.floor((F.unix_micros(F.col(time_col)) - F.lit(off_us)) / F.lit(step_us))
                * F.lit(step_us)
                + F.lit(off_us)
            ).cast("bigint")
        ).alias("time")
    local = F.from_utc_timestamp(F.col(time_col), tz)
    floored = F.timestamp_micros(
        (
            F.floor((F.unix_micros(local) - F.lit(off_us)) / F.lit(step_us))
            * F.lit(step_us)
            + F.lit(off_us)
        ).cast("bigint")
    )
    return F.to_utc_timestamp(floored, tz).alias("time")


def _spine_start(t_lo: str, step_us: int, tz: str | None, off_us: int = 0) -> Column:
    """First spine bucket for fill(): floor of the range start, in the same
    (UTC or tz-local, offset-shifted) alignment the bucket column uses."""
    if tz is None:
        return F.timestamp_micros(
            (
                F.floor(
                    (F.unix_micros(F.lit(t_lo).cast("timestamp")) - F.lit(off_us))
                    / F.lit(step_us)
                )
                * F.lit(step_us)
                + F.lit(off_us)
            ).cast("bigint")
        )
    local = F.from_utc_timestamp(F.lit(t_lo).cast("timestamp"), tz)
    floored = F.timestamp_micros(
        (
            F.floor((F.unix_micros(local) - F.lit(off_us)) / F.lit(step_us))
            * F.lit(step_us)
            + F.lit(off_us)
        ).cast("bigint")
    )
    return F.to_utc_timestamp(floored, tz)


def _fill_spine(spark, t_lo: str, t_hi: str, step_us: int, tz: str | None, off_us: int = 0):
    """The fill() time spine: one row per GROUP BY time() bucket start in
    [t_lo, t_hi], matching _bucket_col's alignment exactly.

    Without tz() the buckets are a fixed UTC grid, so a plain F.sequence
    works. With tz() the buckets are aligned to the zone's LOCAL wall clock
    (_bucket_col floors in local time), and local-aligned buckets are NOT
    uniformly spaced in UTC across a DST transition — a UTC-stepped sequence
    would drift off the real bucket labels after the change. So generate the
    grid in local naive time (where it IS uniform), convert each element
    back with to_utc_timestamp, and dedupe: at spring-forward the skipped
    local hour collapses onto the next bucket's UTC instant (same collapse
    _bucket_col applies to data rows), and at fall-back the repeated local
    hour maps to the single instant to_utc_timestamp picks — again matching
    the aggregate's own label image, so the left join keys line up bucket
    for bucket.
    """
    if tz is None:
        seq = F.sequence(
            _spine_start(t_lo, step_us, None, off_us),
            F.lit(t_hi).cast("timestamp"),
            F.expr(f"INTERVAL {step_us} MICROSECOND"),
        )
        return spark.range(1).select(F.explode(seq).alias("time"))
    local_lo = F.timestamp_micros(
        (
            F.floor(
                (
                    F.unix_micros(F.from_utc_timestamp(F.lit(t_lo).cast("timestamp"), tz))
                    - F.lit(off_us)
                )
                / F.lit(step_us)
            )
            * F.lit(step_us)
            + F.lit(off_us)
        ).cast("bigint")
    )
    local_hi = F.from_utc_timestamp(F.lit(t_hi).cast("timestamp"), tz)
    seq = F.transform(
        F.sequence(local_lo, local_hi, F.expr(f"INTERVAL {step_us} MICROSECOND")),
        lambda x: F.to_utc_timestamp(x, tz),
    )
    return (
        spark.range(1)
        .select(F.explode(seq).alias("time"))
        .where(F.col("time") <= F.lit(t_hi).cast("timestamp"))
        .distinct()
    )


def _no_pagination(m: re.Match, what: str) -> None:
    """OFFSET/SLIMIT/SOFFSET are implemented for the core aggregate/raw
    paths; selectors and multi-stat shapes reject them loudly rather than
    silently ignoring a matched clause."""
    if m.group("offset") or m.group("slimit") or m.group("soffset"):
        raise ValueError(f"OFFSET/SLIMIT/SOFFSET are not supported with {what}")


def _series_filter(out: DataFrame, m: re.Match, series_tags: list[str]) -> DataFrame:
    """SLIMIT/SOFFSET — paginate SERIES (InfluxDB: SLIMIT N returns every
    point from N series; SOFFSET skips series). Series order is the tag
    tuple's lexical order — InfluxDB's series-key order (tag keys appear in
    GROUP BY order here, values compared lexically).
    Scale: ranks only the DISTINCT tag tuples (series cardinality, not fact
    rows) and semi-joins the broadcast survivors back — no window over data.
    """
    slimit = int(m.group("slimit")) if m.group("slimit") else None
    soffset = int(m.group("soffset")) if m.group("soffset") else 0
    if slimit is None and not soffset:
        return out
    if not series_tags:
        raise ValueError("SLIMIT/SOFFSET require GROUP BY <tag>")
    from pyspark.sql import Window

    ranked = (
        out.select(*series_tags)
        .distinct()
        .withColumn("__sn", F.row_number().over(Window.orderBy(*series_tags)))
    )
    cond = F.col("__sn") > soffset
    if slimit is not None:
        cond &= F.col("__sn") <= soffset + slimit
    return out.join(F.broadcast(ranked.where(cond).select(*series_tags)), series_tags)


def _points_limit(
    out: DataFrame, m: re.Match, series_tags: list[str], order_dir: str
) -> DataFrame:
    """LIMIT/OFFSET — paginate POINTS in time order (InfluxDB: per SERIES
    when the query groups by a tag, global otherwise; fill()-generated rows
    count, so this runs after fill). The per-series window partitions on the
    tags (bounded by the queried time range / interval); the global OFFSET
    path first bounds the input to OFFSET+LIMIT rows via TakeOrdered, so its
    one-partition row_number scans a LIMIT-sized set, never the fact table.
    """
    limit = int(m.group("limit")) if m.group("limit") else None
    offset = int(m.group("offset")) if m.group("offset") else 0
    if limit is None and not offset:
        return out
    tcol = F.col("time").asc() if order_dir == "ASC" else F.col("time").desc()
    if series_tags:
        from pyspark.sql import Window

        w = Window.partitionBy(*series_tags).orderBy(tcol)
        cond = F.col("__rn") > offset
        if limit is not None:
            cond &= F.col("__rn") <= offset + limit
        return (
            out.withColumn("__rn", F.row_number().over(w)).where(cond).drop("__rn")
        )
    if "time" not in out.columns:
        # scalar results (single row): plain limit, no time order to take
        if offset:
            raise ValueError("OFFSET requires a time-ordered result")
        return out.limit(limit)
    if not offset:
        # TakeOrderedAndProject — the first N points in time order, never
        # an arbitrary N (this runs BEFORE the cosmetic final orderBy)
        return out.orderBy(tcol).limit(limit)
    if limit is None:
        raise ValueError("OFFSET without LIMIT is not supported")
    from pyspark.sql import Window

    bounded = out.orderBy(tcol).limit(offset + limit)
    return (
        bounded.withColumn("__rn", F.row_number().over(Window.orderBy(tcol)))
        .where(F.col("__rn") > offset)
        .drop("__rn")
    )


def _top_bottom(df: DataFrame, m: re.Match, mtb: re.Match, time_col: str) -> DataFrame:
    """TOP(field, N) / BOTTOM(field, N) — InfluxDB selector aggregates: the
    N greatest/least field values, each row keeping its ORIGINAL point
    timestamp (unlike max()/min(), which collapse to one row per bucket).

    - no GROUP BY: global top/bottom N (sort + limit — Spark plans a
      TakeOrderedAndProject, no full sort materializes);
    - GROUP BY time(i)[, tag]: N per bucket(/series) via row_number over a
      (bucket[, tag])-partitioned window — bounded rows per partition at
      any fact scale;
    - GROUP BY tag: N per series.
    Ties break on earlier timestamp (deterministic; matches InfluxDB's
    first-encountered-in-time-order behavior). The (field, tag, N) 3-arg
    form is not supported.
    """
    from pyspark.sql import Window

    _no_pagination(m, "top()/bottom()")
    fn = mtb.group("fn").lower()
    field, n = mtb.group("field"), int(mtb.group("n"))
    if n < 1:
        raise ValueError(f"{fn}() point count must be >= 1")
    if (m.group("fill") or "none").lower() != "none":
        raise ValueError(f"fill() is not supported with {fn}()")
    val = F.col(field)
    order = [val.desc() if fn == "top" else val.asc(), F.col(time_col).asc()]
    order_dir = (m.group("dir") or "ASC").upper()
    group = (m.group("group") or "").strip()
    sel_time = F.col(time_col).alias("time")
    base = df.where(val.isNotNull())
    if not group:
        series_tags: list[str] = []
        out = base.orderBy(*order).limit(n).select(sel_time, val.alias(fn))
    elif group.lower().startswith("time("):
        mb = _RX_BUCKET.match(group)
        if not mb:
            raise ValueError(f"unsupported GROUP BY: {group!r}")
        step_us, off_us = _bucket_us(mb)
        tag_cols = _group_tags(mb.group("tags"), df, time_col)
        bucket = _bucket_col(time_col, step_us, m.group("tz"), off_us)
        w = Window.partitionBy("__b", *tag_cols).orderBy(*order)
        out = (
            base.select(bucket.alias("__b"), *tag_cols, F.col(time_col), val)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n)
            .select(sel_time, *tag_cols, val.alias(fn))
        )
        series_tags = tag_cols
    else:
        tag_cols = _group_tags(group, df, time_col)
        w = Window.partitionBy(*tag_cols).orderBy(*order)
        out = (
            base.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n)
            .select(sel_time, *tag_cols, val.alias(fn))
        )
        series_tags = tag_cols
    # LIMIT paginates points PER SERIES when a tag appears in GROUP BY (same
    # semantics as the main aggregate/raw path — _points_limit), global
    # otherwise; it runs before the cosmetic final orderBy.
    out = _points_limit(out, m, series_tags, order_dir)
    return out.orderBy(F.col("time").asc() if order_dir == "ASC" else F.col("time").desc())


def _elapsed(df: DataFrame, m: re.Match, mel: re.Match, time_col: str) -> DataFrame:
    """ELAPSED(field[, unit]) — per-point delta to the previous observed
    point of the series, truncated integer units (InfluxDB semantics; the
    first point has no predecessor and is dropped). Default unit is 1ns,
    like InfluxDB — our micro-precision timestamps scale exactly by 1000.

    The lag window is unpartitioned BY DESIGN: elapsed() operates on one
    raw series, which InfluxQL usage always bounds with a WHERE time range
    (the dashboards' $timeFilter); this mirrors the raw-projection path,
    which equally returns a bounded single series.
    """
    from pyspark.sql import Window

    _no_pagination(m, "elapsed()")
    if m.group("group"):
        raise ValueError("elapsed() operates on raw points; GROUP BY is not supported")
    field = mel.group("field")
    unit_us = (
        int(mel.group("n")) * _UNIT_US[mel.group("u")] if mel.group("n") else None
    )
    order_dir = (m.group("dir") or "ASC").upper()
    w = Window.orderBy(time_col)
    t_us = F.unix_micros(F.col(time_col))
    prev = F.lag(t_us).over(w)
    delta = (
        (t_us - prev) * 1000  # default: nanoseconds
        if unit_us is None
        else F.floor((t_us - prev) / F.lit(unit_us)).cast("long")
    )
    out = (
        df.where(F.col(field).isNotNull())
        .select(F.col(time_col).alias("time"), delta.alias("elapsed"))
        .where(F.col("elapsed").isNotNull())
    )
    # no GROUP BY possible here, so _points_limit is the global (time-ordered
    # TakeOrdered) path — routed through it for one LIMIT semantics everywhere
    out = _points_limit(out, m, [], order_dir)
    return out.orderBy(F.col("time").asc() if order_dir == "ASC" else F.col("time").desc())


def _holt_winters(df: DataFrame, m: re.Match, mhw: re.Match, time_col: str) -> DataFrame:
    """HOLT_WINTERS(<agg>(field), h, m) / HOLT_WINTERS_WITH_FIT — seasonal
    forecast of the GROUP BY time() series, h buckets ahead with seasonal
    pattern length m (0 = trend-only Holt's linear).

    Spark shape: the inner aggregate runs DECLARATIVELY (same bucketed plan
    as any GROUP BY time() query — map-side partial agg, one exchange);
    only the fitted smoothing recursion runs in Python, per SERIES, via
    applyInPandas over the aggregate — series length is bounded by the
    query's time range / bucket width, distinct series parallelize across
    the cluster, and the raw fact rows never reach Python. Method +
    determinism + parity notes: functions/forecast.py.
    """
    import pandas as pd

    _no_pagination(m, "holt_winters()")
    fn = mhw.group("fn").lower()
    with_fit = fn == "holt_winters_with_fit"
    h, season = int(mhw.group("h")), int(mhw.group("m"))
    if h < 1:
        raise ValueError("holt_winters() needs a forecast horizon >= 1")
    inner = mhw.group("agg").lower()
    if inner not in ("mean", "sum", "count", "min", "max", "first", "last", "median"):
        raise ValueError(f"holt_winters() does not support inner aggregate {inner!r}")
    group = (m.group("group") or "").strip()
    mb = _RX_BUCKET.match(group) if group.lower().startswith("time(") else None
    if mb is None:
        raise ValueError("holt_winters() requires GROUP BY time()")
    if (m.group("fill") or "none").lower() != "none":
        raise ValueError("fill() is not supported with holt_winters()")
    if m.group("tz"):
        # tz-aligned buckets are not uniformly spaced in UTC across a DST
        # change, so `last + k*step` forecast instants would drift off the
        # local grid — reject rather than silently mislabel
        raise ValueError("holt_winters() does not support tz(); use UTC buckets")
    step_us, off_us = _bucket_us(mb)
    tag_cols = _group_tags(mb.group("tags"), df, time_col)
    bucket = _bucket_col(time_col, step_us, m.group("tz"), off_us)
    agg = (
        df.select(bucket, *tag_cols, mhw.group("field"), F.col(time_col))
        .groupBy("time", *tag_cols)
        .agg(
            _agg_column(mhw.group("agg"), mhw.group("field"), time_col, None)
            .cast("double")
            .alias("__v")
        )
    )

    out_fields = (
        ", ".join(f"{t} string" for t in tag_cols)
        + (", " if tag_cols else "")
        + f"time timestamp, {fn} double"
    )

    def forecast(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.forecast import holt_winters_forecast

        pdf = pdf.sort_values("time")
        vals = holt_winters_forecast(
            pdf["__v"].to_numpy(), h, season, with_fit=with_fit
        )
        last = pdf["time"].iloc[-1]
        step = pd.Timedelta(microseconds=step_us)
        future = [last + step * (k + 1) for k in range(h)]
        times = (list(pdf["time"]) + future) if with_fit else future
        out = {t: pdf[t].iloc[0] for t in tag_cols}
        out["time"] = times
        out[fn] = vals
        return pd.DataFrame(out)

    if tag_cols:
        out = agg.groupBy(*tag_cols).applyInPandas(forecast, out_fields)
    else:
        # single global series: one bounded group under a constant key
        out = (
            agg.withColumn("__g", F.lit(1))
            .groupBy("__g")
            .applyInPandas(
                lambda pdf: forecast(pdf).assign(__g=1), f"__g int, {out_fields}"
            )
            .drop("__g")
        )
    order_dir = (m.group("dir") or "ASC").upper()
    # LIMIT is per-SERIES when the forecast is tag-grouped (consistent with
    # _points_limit everywhere else), global otherwise
    out = _points_limit(out, m, tag_cols, order_dir)
    return out.orderBy(F.col("time").asc() if order_dir == "ASC" else F.col("time").desc())


def _distinct(df: DataFrame, m: re.Match, mdi: re.Match, time_col: str) -> DataFrame:
    """DISTINCT(field) — the distinct field values: per bucket(/series) when
    grouped by time(N)[, tag], else globally with InfluxDB's epoch-0
    timestamp. Multi-row output, so it dispatches like the selectors rather
    than through _agg_column. Plan: select + dropDuplicates — one
    hash-aggregate shuffle on (bucket, tag, value), map-side combined."""
    _no_pagination(m, "distinct()")
    field = mdi.group("field")
    if (m.group("fill") or "none").lower() != "none":
        raise ValueError("fill() is not supported with distinct()")
    order_dir = (m.group("dir") or "ASC").upper()
    group = (m.group("group") or "").strip()
    if not group:
        series_tags: list[str] = []
        out = df.select(
            F.to_timestamp(F.lit("1970-01-01 00:00:00")).alias("time"),
            F.col(field).alias("distinct"),
        ).distinct()
    elif group.lower().startswith("time("):
        mb = _RX_BUCKET.match(group)
        if not mb:
            raise ValueError(f"unsupported GROUP BY: {group!r}")
        step_us, off_us = _bucket_us(mb)
        tag_cols = _group_tags(mb.group("tags"), df, time_col)
        bucket = _bucket_col(time_col, step_us, m.group("tz"), off_us)
        out = df.select(bucket, *tag_cols, F.col(field).alias("distinct")).distinct()
        series_tags = tag_cols
    else:
        tag_cols = _group_tags(group, df, time_col)
        out = df.select(
            F.to_timestamp(F.lit("1970-01-01 00:00:00")).alias("time"),
            *tag_cols,
            F.col(field).alias("distinct"),
        ).distinct()
        series_tags = tag_cols
    torder = F.col("time").asc() if order_dir == "ASC" else F.col("time").desc()
    # LIMIT paginates per SERIES when tag-grouped (like _points_limit), but
    # distinct values share their bucket/epoch-0 timestamp, so the tiebreak
    # must include the value itself to stay deterministic — hence inline
    # rather than _points_limit (which orders on time alone).
    if m.group("limit"):
        n_lim = int(m.group("limit"))
        if series_tags:
            from pyspark.sql import Window

            w = Window.partitionBy(*series_tags).orderBy(torder, F.col("distinct").asc())
            out = (
                out.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= n_lim)
                .drop("__rn")
            )
        else:
            out = out.orderBy(torder, F.col("distinct").asc()).limit(n_lim)
    return out.orderBy(torder, F.col("distinct").asc())


def _split_projections(proj: str) -> list[str]:
    """Split a SELECT list on top-level commas (commas inside parentheses —
    aggregate arguments — don't split)."""
    parts, depth, cur = [], 0, []
    for ch in proj:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced parentheses in projection: {proj!r}")
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    if any(not p for p in parts):
        raise ValueError(f"empty projection item in: {proj!r}")
    return parts


def _multi_agg(m, projs, df: DataFrame, time_col: str, t_lo, t_hi) -> DataFrame:
    """SELECT agg1(f), agg2(f), ... [GROUP BY time(N)[, tag]] — each item a
    plain aggregate; fill() applies to every aggregate column."""
    _no_pagination(m, "multi-aggregate SELECT")
    aggs = []
    names: list[str] = []
    for p in projs:
        p, al = _split_alias(p)
        ma = _RX_AGG.match(p)
        if not ma:
            raise ValueError(
                f"multi-select items must all be aggregates, got {p!r}"
            )
        base = ma.group("fn").lower()
        if base == "integral":
            raise ValueError("integral() is not supported in multi-aggregate SELECT")
        if al:
            if al in names:
                raise ValueError(f"duplicate AS alias {al!r}")
            name = al
        else:
            name = base
            k = 1
            while name in names:  # InfluxDB duplicate-name suffixing
                name = f"{base}_{k}"
                k += 1
        names.append(name)
        aggs.append(
            _agg_column(base, ma.group("field"), time_col, ma.group("agg_arg")).alias(name)
        )
    order_dir = (m.group("dir") or "ASC").upper()
    if not m.group("group"):
        out = df.agg(*aggs)
        return out.limit(int(m.group("limit"))) if m.group("limit") else out
    gb = m.group("group").strip()
    if not gb.lower().startswith("time("):
        if (m.group("fill") or "none").lower() != "none":
            raise ValueError("fill() requires GROUP BY time()")
        out = df.groupBy(*_group_tags(gb, df, time_col)).agg(*aggs)
        return out.limit(int(m.group("limit"))) if m.group("limit") else out
    mb = _RX_BUCKET.match(gb)
    if not mb:
        raise ValueError(f"unsupported GROUP BY: {m.group('group')!r}")
    step_us, off_us = _bucket_us(mb)
    tags = _group_tags(mb.group("tags"), df, time_col)
    bucket = _bucket_col(time_col, step_us, m.group("tz"), off_us)
    keys = ["time"] + tags
    out = df.select(bucket, *df.columns).groupBy(*keys).agg(*aggs)
    fill = (m.group("fill") or "none").lower()
    if fill not in ("none", "null"):
        raise ValueError(
            "multi-aggregate SELECT supports fill(null) only"
        )
    if fill == "null":
        if t_lo is None or t_hi is None:
            raise ValueError("fill() requires an explicit time range in WHERE")
        spark = df.sparkSession
        spine = _fill_spine(spark, t_lo, t_hi, step_us, m.group("tz"), off_us)
        if tags:
            spine = F.broadcast(spine.join(df.select(*tags).distinct()))
        out = F.broadcast(spine).join(out, keys, "left")
    out = out.orderBy(F.col("time").asc() if order_dir == "ASC" else F.col("time").desc())
    return out.limit(int(m.group("limit"))) if m.group("limit") else out


def influxql(
    query: str, tables: dict[str, DataFrame], time_col: str = "ts", now=None
) -> DataFrame:
    """Translate one InfluxQL statement into a DataFrame plan.

    ``tables`` maps measurement name -> DataFrame with an event-time column
    ``time_col`` plus field/tag columns. ``now`` fixes the instant now()
    resolves to (str or datetime; default wall clock) — tests and replays
    inject it for determinism.
    """
    q = query.strip().rstrip(";")
    ms = _RX_SHOW.match(q)
    if ms:
        return _show(ms, tables, time_col)
    # Subquery: SELECT ... FROM ( <inner statement> ) ... — InfluxQL's
    # downsample-then-aggregate idiom. Translate the inner statement
    # recursively (arbitrary nesting falls out of the recursion), expose its
    # result as a synthetic measurement, and rewrite the outer statement to
    # read it; the inner aggregate's column name ("mean", "count", ...) is
    # the field the outer statement selects from, as in InfluxDB.
    msub = re.search(r"\bFROM\s*\(", q, re.IGNORECASE)
    if msub:
        start = q.index("(", msub.start())
        depth = 0
        end = -1
        for i in range(start, len(q)):
            if q[i] == "(":
                depth += 1
            elif q[i] == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            raise ValueError("unbalanced parentheses in FROM subquery")
        inner = influxql(q[start + 1 : end].strip(), tables, time_col, now)
        if "time" not in inner.columns:
            raise ValueError(
                "FROM-subquery must produce a time column (use GROUP BY time)"
            )
        inner = inner.withColumnRenamed("time", time_col)
        outer_sql = q[:start] + '"__subquery"' + q[end + 1 :]
        return influxql(outer_sql, {**tables, "__subquery": inner}, time_col, now)
    m = _RX.match(q)
    if not m:
        raise ValueError(f"unsupported InfluxQL: {query!r}")
    if m.group("into"):
        # SELECT ... INTO "target" FROM ... — InfluxQL's continuous-query /
        # downsampling-materialization form. Translate the SELECT without the
        # INTO clause, then REGISTER the result as a new measurement in the
        # caller's table mapping (the DataFrame analog of writing points:
        # the plan is lazy; persist/write it like any other DataFrame).
        # Deviations from InfluxDB, by design: the target is replaced, not
        # appended to, and the query returns the materialized rows rather
        # than a written-point count (more useful from a DataFrame API).
        target = m.group("into")
        stripped = q[: m.start("intoclause")] + q[m.end("intoclause") :]
        result = influxql(stripped, tables, time_col, now)
        tables[target] = (
            result.withColumnRenamed("time", time_col)
            if "time" in result.columns
            else result
        )
        return result
    meas_raw = m.group("meas").strip()
    if meas_raw.startswith("/") or "," in meas_raw:
        # FROM /regex/ or FROM "a", "b" — InfluxDB runs the statement against
        # EACH matched measurement independently and never merges series
        # across measurements. Mirror that exactly: translate per measurement
        # (WHERE/GROUP BY/fill/LIMIT all apply per measurement, so per-
        # measurement LIMIT semantics fall out for free) and union the
        # results under a leading `measurement` column — the relational
        # rendering of InfluxDB's per-measurement series blocks. The plan is
        # a union of independent subplans: no extra shuffle vs. running the
        # statements separately.
        import functools

        if meas_raw.startswith("/"):
            if not meas_raw.endswith("/"):
                raise ValueError(f"unterminated measurement regex: {meas_raw!r}")
            rx = re.compile(meas_raw[1:-1])  # unanchored, like InfluxDB
            names = sorted(n for n in tables if rx.search(n))
            if not names:
                raise ValueError(f"no measurement matches {meas_raw!r}")
        else:
            names = [p.strip().strip('"') for p in meas_raw.split(",")]
        frames = []
        for name in names:
            single = q[: m.start("meas")] + f'"{name}"' + q[m.end("meas") :]
            frames.append(
                influxql(single, tables, time_col, now).select(
                    F.lit(name).alias("measurement"), "*"
                )
            )
        out = functools.reduce(lambda a, b: a.unionByName(b), frames)
        order = [F.col("measurement").asc()]
        if "time" in out.columns:
            direction = (m.group("dir") or "ASC").upper()
            order.append(
                F.col("time").asc() if direction == "ASC" else F.col("time").desc()
            )
        return out.orderBy(*order)
    meas = meas_raw.strip('"')
    if meas not in tables:
        raise ValueError(f"unknown measurement {meas!r}")
    df = tables[meas]

    t_lo = t_hi = None
    if m.group("where"):
        for cond in re.split(r"\s+AND\s+", m.group("where"), flags=re.IGNORECASE):
            cond = cond.strip()
            mt = _RX_TIME.match(cond)
            if mt:
                resolved = _resolve_time_expr(mt.group("expr"), now)
                ts = F.lit(resolved).cast("timestamp")
                op = mt.group("op")
                df = df.where(
                    F.col(time_col) >= ts
                    if op == ">="
                    else F.col(time_col) > ts
                    if op == ">"
                    else F.col(time_col) <= ts
                    if op == "<="
                    else F.col(time_col) < ts
                )
                if op in (">=", ">"):
                    t_lo = resolved
                elif op == "<":
                    # InfluxDB spine semantics: buckets whose START lies in
                    # [floor(lo), hi) — a bucket starting exactly at a strict
                    # upper bound is excluded. The spine builder treats t_hi
                    # inclusively, so back it off by 1µs (our precision).
                    import datetime as _dt

                    t_hi = (
                        _dt.datetime.fromisoformat(resolved)
                        - _dt.timedelta(microseconds=1)
                    ).strftime("%Y-%m-%d %H:%M:%S.%f")
                else:
                    t_hi = resolved
                continue
            # Grafana parenthesizes rendered tag conditions: ("key" = 'x')
            while cond.startswith("(") and cond.endswith(")"):
                cond = cond[1:-1].strip()
            # multi-value template variable: ("key" = 'a' OR "key" = 'b' ...)
            ors = re.split(r"\s+OR\s+", cond, flags=re.IGNORECASE)
            if len(ors) > 1:
                tags_vals = []
                for part in ors:
                    mo = _RX_TAG.match(part.strip())
                    if not mo or mo.group("op") != "=":
                        raise ValueError(f"unsupported OR group: {cond!r}")
                    tags_vals.append((mo.group("tag"), mo.group("val")))
                keys_ = {k for k, _ in tags_vals}
                if len(keys_) != 1:
                    raise ValueError(f"OR group must test ONE tag: {cond!r}")
                df = df.where(F.col(keys_.pop()).isin([v for _, v in tags_vals]))
                continue
            mg = _RX_TAG.match(cond)
            if mg:
                c = F.col(mg.group("tag"))
                df = df.where(
                    c == mg.group("val")
                    if mg.group("op") == "="
                    else c != mg.group("val")
                )
                continue
            # regex tag predicate: "key" =~ /a|b/ (InfluxDB Go-RE2,
            # unanchored — rlike has the same unanchored contract; the
            # common Grafana alternation/prefix patterns behave identically)
            mrx = _RX_TAG_REGEX.match(cond)
            if mrx:
                c = F.col(mrx.group("tag")).rlike(mrx.group("rx"))
                df = df.where(c if mrx.group("op") == "=~" else ~c)
                continue
            # numeric field comparison — the alert-query shape
            # (WHERE "value" > 5 AND $timeFilter)
            mf = _RX_FIELD_CMP.match(cond)
            if not mf:
                raise ValueError(f"unsupported WHERE clause: {cond!r}")
            c, num = F.col(mf.group("field")), float(mf.group("num"))
            op = mf.group("op")
            df = df.where(
                c > num if op == ">"
                else c >= num if op == ">="
                else c < num if op == "<"
                else c <= num if op == "<="
                else c != num if op in ("!=", "<>")
                else c == num
            )

    proj = m.group("proj").strip()
    projs = _split_projections(proj)
    if len(projs) > 1:
        # Multi-aggregate SELECT (Grafana multi-stat panels): every item
        # must be a plain aggregate; duplicate names get _1/_2 suffixes
        # (InfluxDB's column naming) unless AS-aliased. Transformations
        # stay single-select.
        return _multi_agg(m, projs, df, time_col, t_lo, t_hi)
    proj, user_alias = _split_alias(proj)

    def _finish(out: DataFrame) -> DataFrame:
        # AS alias renames the VALUE column (always last: every path emits
        # time/tags first, the value last)
        if user_alias and user_alias != out.columns[-1]:
            out = out.withColumnRenamed(out.columns[-1], user_alias)
        return out

    # scalar arithmetic on a plain aggregate: mean("v") * 8 — applied to
    # the aggregate BEFORE fill() (InfluxDB: the fill constant is emitted
    # verbatim, never scaled)
    mam = _RX_AGG_MATH.match(proj)
    post_op: str | None = None
    post_num = 0.0
    if mam and _RX_AGG.match(mam.group("inner").strip()):
        proj = mam.group("inner").strip()
        post_op, post_num = mam.group("op"), float(mam.group("num"))
        if post_op == "/" and post_num == 0:
            raise ValueError("division by zero in projection arithmetic")
    mtb = _RX_TOPBOT.match(proj)
    if mtb:
        return _finish(_top_bottom(df, m, mtb, time_col))
    mel = _RX_ELAPSED.match(proj)
    if mel:
        return _finish(_elapsed(df, m, mel, time_col))
    mhw = _RX_HW.match(proj)
    if mhw:
        return _finish(_holt_winters(df, m, mhw, time_col))
    mdi = _RX_DISTINCT.match(proj)
    if mdi:
        return _finish(_distinct(df, m, mdi, time_col))
    mtrans = _RX_TRANS.match(proj)
    if mtrans:
        proj = mtrans.group("inner").strip()
    magg = _RX_AGG.match(proj)
    order_dir = (m.group("dir") or "ASC").upper()
    if mtrans and not m.group("group"):
        raise ValueError(f"{mtrans.group('fn').lower()}() requires GROUP BY time()")

    if m.group("group"):
        if not magg:
            raise ValueError("GROUP BY requires an aggregate projection")
        gb = m.group("group").strip()
        if not gb.lower().startswith("time("):
            # GROUP BY "tag" only — per-series scalars (Grafana table panels)
            if mtrans:
                raise ValueError("transformations require GROUP BY time()")
            if (m.group("fill") or "none").lower() != "none":
                raise ValueError("fill() requires GROUP BY time()")
            tags_only = _group_tags(gb, df, time_col)
            vname = magg.group("fn").lower()
            result = df.groupBy(*tags_only).agg(
                _agg_column(
                    magg.group("fn"), magg.group("field"), time_col, magg.group("agg_arg")
                ).alias(vname)
            )
            if post_op:
                result = result.withColumn(
                    vname, _apply_math(F.col(vname), post_op, post_num)
                )
            result = _series_filter(result, m, tags_only)
            # one row per series, no time column: LIMIT keeps its original
            # (global) reading here; per-series LIMIT>=1 would be a no-op
            if m.group("limit"):
                result = result.limit(int(m.group("limit")))
            return _finish(result)
        mb = _RX_BUCKET.match(gb)
        if not mb:
            raise ValueError(f"unsupported GROUP BY: {m.group('group')!r}")
        step_us, off_us = _bucket_us(mb)
        tags = _group_tags(mb.group("tags"), df, time_col)
        bucket = _bucket_col(time_col, step_us, m.group("tz"), off_us)
        alias = magg.group("fn").lower()
        keys = ["time"] + tags
        if alias == "integral":
            # INTEGRAL(field[, unit]): trapezoidal area under consecutive
            # points WITHIN each bucket (InfluxDB does not interpolate
            # across bucket boundaries), divided by the unit (default 1s).
            # The lag window partitions on (bucket, tag) — bounded rows per
            # partition at any fact scale, never a whole-series window.
            from pyspark.sql import Window

            unit_us = (
                float(magg.group("agg_arg")) * 1_000_000.0
                if magg.group("agg_arg")
                else 1_000_000.0
            )
            field = magg.group("field")
            pts = df.select(
                bucket,
                *tags,
                F.col(field).cast("double").alias("__v"),
                F.unix_micros(F.col(time_col)).alias("__t"),
            )
            # (t, v) ordering: ties on t are possible in raw data; ordering
            # by value too makes the lag pairing deterministic across
            # engines (same-t pairs contribute zero area, and the pair
            # crossing into a tie group is fixed by the v-order).
            w_i = Window.partitionBy("time", *tags).orderBy("__t", "__v")
            pv, pt = F.lag("__v").over(w_i), F.lag("__t").over(w_i)
            # Fixed-point accumulation (engine convention, functions/
            # numeric.py): per-pair area numerator rint((v+pv)*1e4)*dt_us is
            # an exact int64, summed in decimal — order-independent, so the
            # result hash-matches any engine at any partitioning. 1e4 covers
            # the fixtures' 2-decimal values with headroom.
            num = (
                F.rint((F.col("__v") + pv) * 10000.0).cast("long")
                * (F.col("__t") - pt)
            ).cast("decimal(38,0)")
            out = (
                pts.select(*keys, num.alias("__a"))
                .groupBy(*keys)
                .agg(
                    (
                        F.sum("__a").cast("double")
                        / F.lit(2.0 * 10000.0 * unit_us)
                    ).alias(alias)
                )
                .where(F.col(alias).isNotNull())
            )
        else:
            out = (
                df.select(bucket, *tags, magg.group("field"), F.col(time_col))
                .groupBy(*keys)
                .agg(
                    _agg_column(
                        magg.group("fn"), magg.group("field"), time_col, magg.group("agg_arg")
                    ).alias(alias)
                )
            )
        if mtrans:
            # InfluxDB transformations (derivative/difference/moving_average/
            # cumulative_sum) operate on the UNFILLED aggregate — observed
            # buckets only, actual time deltas across gaps — with any fill()
            # applied to the transformation OUTPUT afterwards (InfluxDB's
            # order of operations; filling first would either drop real
            # points across gaps with fill(null) or manufacture spurious
            # ones with fill(0/previous)). Output column is named after the
            # transformation, matching InfluxDB's result column.
            from pyspark.sql import Window

            name = mtrans.group("fn").lower()
            w_d = Window.partitionBy(*tags).orderBy("time")
            if name in ("derivative", "non_negative_derivative"):
                # (vₜ − vₜ₋₁) · unit / (tₜ − tₜ₋₁); default unit = interval;
                # first point of each series has no predecessor -> dropped
                if mtrans.group("n") and not mtrans.group("u"):
                    raise ValueError("derivative() unit needs a duration suffix (s/m/h/d)")
                unit_us = (
                    int(mtrans.group("n")) * _UNIT_US[mtrans.group("u")]
                    if mtrans.group("n")
                    else step_us
                )
                prev_v = F.lag(alias).over(w_d)
                prev_t = F.lag("time").over(w_d)
                expr = (
                    (F.col(alias) - prev_v).cast("double")
                    * F.lit(float(unit_us))
                    / (F.unix_micros(F.col("time")) - F.unix_micros(prev_t)).cast("double")
                )
                out = out.select(*keys, expr.alias(name)).where(F.col(name).isNotNull())
                if name.startswith("non_negative"):
                    out = out.where(F.col(name) >= 0)
            elif name in ("difference", "non_negative_difference"):
                # vₜ − vₜ₋₁ over observed points; first point dropped
                if mtrans.group("n"):
                    raise ValueError("difference() takes no second argument")
                expr = F.col(alias) - F.lag(alias).over(w_d)
                out = out.select(*keys, expr.alias(name)).where(F.col(name).isNotNull())
                if name.startswith("non_negative"):
                    out = out.where(F.col(name) >= 0)
            elif name == "moving_average":
                # mean of the last N observed points; emitted only once a
                # full N-point window exists (InfluxDB drops the warm-up)
                if not mtrans.group("n") or mtrans.group("u"):
                    raise ValueError("moving_average() needs an integer point count")
                npts = int(mtrans.group("n"))
                if npts < 2:
                    raise ValueError("moving_average() point count must be >= 2")
                w_n = w_d.rowsBetween(-(npts - 1), 0)
                out = (
                    out.select(
                        *keys,
                        F.avg(F.col(alias).cast("double")).over(w_n).alias(name),
                        F.count(alias).over(w_n).alias("__n"),
                    )
                    .where(F.col("__n") == npts)
                    .drop("__n")
                )
            else:  # cumulative_sum: running total over observed points
                if mtrans.group("n"):
                    raise ValueError("cumulative_sum() takes no second argument")
                w_c = w_d.rowsBetween(Window.unboundedPreceding, 0)
                out = out.select(
                    *keys, F.sum(F.col(alias).cast("double")).over(w_c).alias(name)
                )
            alias = name
        if post_op:
            out = out.withColumn(alias, _apply_math(F.col(alias), post_op, post_num))
        fill = (m.group("fill") or "none").lower()
        if fill != "none":
            if t_lo is None or t_hi is None:
                raise ValueError("fill() requires an explicit time range in WHERE")
            spark = df.sparkSession
            spine = _fill_spine(spark, t_lo, t_hi, step_us, m.group("tz"), off_us)
            if tags:
                spine = F.broadcast(spine.join(df.select(*tags).distinct()))
            out = F.broadcast(spine).join(out, keys, "left")
            if fill == "previous":
                from pyspark.sql import Window

                w_prev = (
                    Window.partitionBy(*tags)
                    .orderBy("time")
                    .rowsBetween(Window.unboundedPreceding, 0)
                )
                out = out.select(
                    *keys, F.last(alias, ignorenulls=True).over(w_prev).alias(alias)
                )
            elif fill not in ("null", "linear"):  # fill(<number>): constant
                # Cast the constant to the aggregate's own type so fill(0) on
                # a count stays integral (InfluxDB semantics), instead of
                # coalesce promoting the whole column to double.
                const = F.lit(float(fill)).cast(out.schema[alias].dataType)
                out = out.select(*keys, F.coalesce(F.col(alias), const).alias(alias))
            if fill == "linear":
                from pyspark.sql import Window

                w_prev = (
                    Window.partitionBy(*tags)
                    .orderBy("time")
                    .rowsBetween(Window.unboundedPreceding, 0)
                )
                w_next = (
                    Window.partitionBy(*tags)
                    .orderBy("time")
                    .rowsBetween(0, Window.unboundedFollowing)
                )
                obs_t = F.when(F.col(alias).isNotNull(), F.col("time"))
                out = out.select(
                    *keys,
                    F.col(alias),
                    F.last(alias, ignorenulls=True).over(w_prev).alias("__pv"),
                    F.last(obs_t, ignorenulls=True).over(w_prev).alias("__pb"),
                    F.first(alias, ignorenulls=True).over(w_next).alias("__nv"),
                    F.first(obs_t, ignorenulls=True).over(w_next).alias("__nb"),
                )
                frac = (F.unix_micros(F.col("time")) - F.unix_micros(F.col("__pb"))).cast(
                    "double"
                ) / (F.unix_micros(F.col("__nb")) - F.unix_micros(F.col("__pb"))).cast("double")
                out = out.select(
                    *keys,
                    F.when(F.col(alias).isNotNull(), F.col(alias))
                    .when(F.col("__pv").isNull() | F.col("__nv").isNull(), F.lit(None))
                    .otherwise(F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac)
                    .alias(alias),
                )
        result = out
    elif magg:
        vname = magg.group("fn").lower()
        result = df.agg(
            _agg_column(
                magg.group("fn"), magg.group("field"), time_col, magg.group("agg_arg")
            ).alias(vname)
        )
        if post_op:
            result = result.withColumn(
                vname, _apply_math(F.col(vname), post_op, post_num)
            )
    else:
        mfm = _RX_FIELD_MATH.match(proj)
        mf = _RX_FIELD.match(proj)
        if mfm and not mf:
            # raw field arithmetic: "a" + "b" or "a" / <number> — the output
            # name is the expression in InfluxDB; here an AS alias is
            # REQUIRED (loud contract instead of a generated name)
            if not user_alias:
                raise ValueError(
                    f"field arithmetic needs an AS alias: {proj!r}"
                )
            a = F.col(mfm.group("f1")).cast("double")
            rhs_txt = mfm.group("f2")
            rhs_num = re.fullmatch(r"[-+]?\d+(?:\.\d+)?", rhs_txt)
            op = mfm.group("op")
            if rhs_num:
                expr = _apply_math(a, op, float(rhs_txt))
            else:
                b = F.col(rhs_txt).cast("double")
                if op == "+":
                    expr = a + b
                elif op == "-":
                    expr = a - b
                elif op == "*":
                    expr = a * b
                else:
                    expr = a / b
            result = df.select(
                F.col(time_col).alias("time"), expr.alias(user_alias)
            )
        elif mf:
            result = df.select(F.col(time_col).alias("time"), mf.group("field"))
        else:
            raise ValueError(f"unsupported projection: {proj!r}")

    series_tags = tags if m.group("group") else []
    result = _series_filter(result, m, series_tags)
    result = _points_limit(result, m, series_tags, order_dir)
    if "time" in result.columns:
        result = result.orderBy(F.col("time").asc() if order_dir == "ASC" else F.col("time").desc())
    return _finish(result)


def grafana_target_to_influxql(
    target: dict,
    time_filter: str,
    interval: str = "1s",
) -> str:
    """Render a Grafana panel target (the JSON stored in dashboard.json) to
    the InfluxQL string Grafana sends to InfluxDB — covering both modes the
    reference dashboards use (docker/grafana_setup/dashboard.json):

      - raw mode: the stored ``query`` with ``$timeFilter`` / ``$__interval``
        substituted;
      - builder mode: measurement + select chains + tags + groupBy rendered
        with Grafana's rules (fields quoted, tag conditions parenthesized,
        ``GROUP BY time($__interval) fill(x)``, ``ORDER BY time``).

    ``time_filter`` is the expansion of ``$timeFilter``, e.g.
    ``time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:01:00'``.
    """
    if target.get("rawQuery") and target.get("query"):
        q = target["query"]
        return q.replace("$timeFilter", time_filter).replace("$__interval", interval)

    measurement = target["measurement"]
    sels = []
    for chain in target.get("select", [[]]):
        field = None
        wrapped = None
        for part in chain:
            if part.get("type") == "field":
                field = part["params"][0]
                wrapped = f'"{field}"'
            elif part.get("type") in (
                "mean", "sum", "count", "min", "max", "first", "last",
                "median", "stddev", "spread", "percentile",
            ):
                args = "".join(f", {p}" for p in part.get("params", []))
                wrapped = f'{part["type"]}("{field}"{args})'
        if wrapped is None:
            raise ValueError(f"unsupported select chain: {chain!r}")
        sels.append(wrapped)
    where_parts = [
        f'("{t["key"]}" {t.get("operator", "=")} \'{t["value"]}\')'
        for t in target.get("tags", [])
    ]
    where_parts.append(time_filter)
    q = f"SELECT {', '.join(sels)} FROM \"{measurement}\" WHERE {' AND '.join(where_parts)}"
    group_terms = []
    fill = None
    for g in target.get("groupBy", []):
        if g.get("type") == "time":
            p = g["params"][0]
            group_terms.append(f"time({interval if p == '$__interval' else p})")
        elif g.get("type") == "tag":
            group_terms.append(f'"{g["params"][0]}"')
        elif g.get("type") == "fill":
            fill = g["params"][0]
    if group_terms:
        q += f" GROUP BY {', '.join(group_terms)}"
        if fill is not None:
            q += f" fill({fill})"
    if target.get("orderByTime"):
        q += f" ORDER BY time {target['orderByTime']}"
    return q


_UNIT_NAME = {"s": "second", "m": "minute", "h": "hour", "d": "day"}


def influxql_streaming(
    query: str,
    stream: DataFrame,
    time_col: str = "ts",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Translate an InfluxQL panel query into a CONTINUOUS Structured
    Streaming aggregation — the reference's actual operating mode (Grafana
    polls InfluxDB while the Flink job keeps writing; here the panel query
    itself runs incrementally instead).

    Supported shape: the dashboard panel core — one aggregate
    (mean/sum/count/min/max) over WHERE tag filters, GROUP BY time(N)
    [, tag]. GROUP BY time(N) maps to an event-time ``window()`` (required:
    streaming aggregation state is evicted by watermark only through an
    event-time window), so append-mode output emits each bucket exactly
    once when it seals — identical rows to the batch translator on the
    same data (equivalence-tested). Time-range WHEREs, fill(), selectors
    and transformations are batch-only: fill needs the full spine, and
    derivative-family functions need the sealed series — run those over
    the sink table the stream maintains.

    Scale: the same single-shuffle keyed window aggregation as the
    engine's streaming pipeline (map-side partial agg into windowed state;
    watermark bounds state).
    """
    q = query.strip().rstrip(";")
    m = _RX.match(q)
    if not m:
        raise ValueError(f"unsupported InfluxQL: {query!r}")
    if (m.group("fill") or "none").lower() != "none":
        raise ValueError("fill() is batch-only (needs the full spine)")
    if m.group("tz"):
        raise ValueError("tz() is batch-only")
    if m.group("limit"):
        raise ValueError("LIMIT is not meaningful on an unbounded stream")
    if m.group("into"):
        raise ValueError(
            "INTO is batch-only; attach a writeStream sink to materialize"
        )
    if m.group("meas").strip().startswith("/") or "," in m.group("meas"):
        raise ValueError("streaming reads ONE measurement (the given stream)")
    df = stream
    if m.group("where"):
        for cond in re.split(r"\s+AND\s+", m.group("where"), flags=re.IGNORECASE):
            cond = cond.strip()
            while cond.startswith("(") and cond.endswith(")"):
                cond = cond[1:-1].strip()
            if _RX_TIME.match(cond):
                raise ValueError(
                    "time-range WHERE is batch-only; a stream is unbounded"
                )
            mg = _RX_TAG.match(cond)
            if mg:
                c = F.col(mg.group("tag"))
                df = df.where(
                    c == mg.group("val") if mg.group("op") == "=" else c != mg.group("val")
                )
                continue
            mrx = _RX_TAG_REGEX.match(cond)
            if mrx:
                c = F.col(mrx.group("tag")).rlike(mrx.group("rx"))
                df = df.where(c if mrx.group("op") == "=~" else ~c)
                continue
            raise ValueError(f"unsupported streaming WHERE clause: {cond!r}")
    proj = m.group("proj").strip()
    magg = _RX_AGG.match(proj)
    if not magg or magg.group("fn").lower() not in ("mean", "sum", "count", "min", "max"):
        raise ValueError(
            "streaming supports a single mean/sum/count/min/max aggregate"
        )
    group = (m.group("group") or "").strip()
    mb = _RX_BUCKET.match(group) if group.lower().startswith("time(") else None
    if mb is None:
        raise ValueError("streaming requires GROUP BY time(N)")
    duration = f"{mb.group('n')} {_UNIT_NAME[mb.group('u').lower()]}"
    # time(N, off) grid shift maps directly onto window()'s startTime
    # (normalized into [0, step) — same grid InfluxDB floors onto)
    _, off_us = _bucket_us(mb)
    win = (
        F.window(time_col, duration, duration, f"{off_us} microseconds")
        if off_us
        else F.window(time_col, duration)
    )
    tag_cols = _group_tags(mb.group("tags"), df, time_col)
    agg_col = _agg_column(
        magg.group("fn"), magg.group("field"), time_col, magg.group("agg_arg")
    ).alias(magg.group("fn").lower())
    return (
        df.withWatermark(time_col, watermark)
        .groupBy(win.alias("__w"), *tag_cols)
        .agg(agg_col)
        .select(F.col("__w.start").alias("time"), *tag_cols, magg.group("fn").lower())
    )
