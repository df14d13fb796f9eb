"""Oracle-comparison harness mirroring the driver's canonicalization.

Protocol (FIXTURES.md): sort by all columns, doubles to 9 significant digits,
timestamps as UTC 'yyyy-MM-dd HH:mm:ss.SSS', NULL literal, hash the CSV. We
reproduce it here so every registered query is verified locally (at
sf0.001/sf0.01) before the driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb

from .sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def duckdb_native_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Resident-engine comparator (r4 verdict task #2): the same tables
    loaded as NATIVE DuckDB tables (CREATE TABLE AS — decoded once into
    DuckDB's in-memory columnar format), the symmetric analog of the
    bench's pinned Spark cache. duckdb_connection's parquet VIEWS re-decode
    parquet on every execution, which understates DuckDB the same way a
    cold Spark scan would understate Spark."""
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE TABLE {t} AS SELECT * FROM '{path}'")
    return con


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.") + f"{v.microsecond // 1000:03d}"
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Project columns in name-sorted order, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_canonical(df) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return sorted(cols), canonical_rows(cols, rows)


def duckdb_canonical(con, sql: str) -> tuple[list[str], list[tuple[str, ...]]]:
    # Relation API, not cursor.description: the DB-API type_code is the
    # generic category ('NUMBER'), which would hide HUGEINT entirely.
    rel = con.sql(sql)
    cols = list(rel.columns)
    # HUGEINT (e.g. SUM over BIGINT) has no int64/arrow analog — the driver's
    # pandas conversion turns it into float64 and the value-hash diverges even
    # when the printed values agree. Force oracles to CAST(... AS BIGINT).
    huge = [c for c, t in zip(cols, rel.types) if "HUGEINT" in str(t).upper()]
    assert not huge, f"oracle yields HUGEINT column(s) {huge}; CAST to BIGINT"
    rows = rel.fetchall()
    return sorted(cols), canonical_rows(cols, rows)


def assert_matches_oracle(df, con, sql: str, name: str = "?") -> None:
    s_cols, s_rows = spark_canonical(df)
    d_cols, d_rows = duckdb_canonical(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, duckdb): {diffs}")
