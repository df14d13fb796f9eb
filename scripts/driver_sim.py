#!/usr/bin/env python
"""Driver simulation — the full correctness gate, runnable standalone.

Creates a deliberately FOREIGN SparkSession (non-UTC timezone, default
confs — the engine must pin its own session settings), runs
__spark_entry__.entry(), then every queries() builder against its
oracle_sql() DuckDB equivalent at the given scale factor using the same
canonicalization as the driver (timing_explorer_spark.testing).

Usage:  python scripts/driver_sim.py [sf_dir] [--json OUT] [--only a,b,c]
          sf_dir       default /root/testdata/sf0.01
          --json OUT   also write per-query results in the driver's
                       CORRECTNESS_r0N schema (rows_match/schema_match/
                       hash_match/spark_rows/oracle_rows/err per query) —
                       the machine-readable full-registry artifact
                       (CORRECTNESS_FULL_r0N.json, r4 verdict task #3)
          --only a,b   restrict to a comma-separated subset of query names
                       (targeted re-check after editing one plan)
Exit 0 iff every oracle query MATCHes and every rows-only query returns rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    only: set[str] | None = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as ent
    from timing_explorer_spark.testing import (
        duckdb_canonical,
        duckdb_connection,
        spark_canonical,
    )

    n = ent.entry(spark).count()
    assert n > 0, "entry returned 0 rows"
    print(f"entry: {n} rows OK")

    qs, oracles = ent.queries(), ent.oracle_sql()
    if only is not None:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown --only names: {sorted(unknown)}")
            return 2
        qs = {k: v for k, v in qs.items() if k in only}
    con = duckdb_connection(sf)
    fails: list[str] = []
    results: dict[str, dict] = {}
    t0 = time.time()
    for name, fn in sorted(qs.items()):
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf)
            if name in oracles:
                s_cols, s_rows = spark_canonical(sdf)
                o_cols, o_rows = duckdb_canonical(con, oracles[name])
                ok = (s_cols, s_rows) == (o_cols, o_rows)
                rec.update(
                    rows_match=len(s_rows) == len(o_rows),
                    schema_match=s_cols == o_cols,
                    hash_match=s_rows == o_rows,
                    spark_rows=len(s_rows),
                    oracle_rows=len(o_rows),
                )
                print(f"{'MATCH' if ok else 'MISMATCH'}: {name}")
                if not ok:
                    fails.append(name)
            else:
                rc = sdf.count()
                rec.update(
                    rows_match=rc > 0,
                    schema_match=True,
                    hash_match=None,  # rows-only by nature (sketch/ANN)
                    spark_rows=rc,
                )
                print(f"ROWS-ONLY: {name} -> {rc} rows")
                if rc <= 0:
                    fails.append(name)
        except Exception as e:  # noqa: BLE001
            rec["err"] = str(e)[:300]
            print(f"ERROR: {name}: {str(e)[:300]}")
            fails.append(name)
        results[name] = rec
    from timing_explorer_spark.operators.dedup import release_cached

    release_cached()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out} ({len(results)} queries)")
    print(f"total {time.time() - t0:.1f}s; {len(qs)} queries, {len(fails)} failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
