#!/usr/bin/env python
"""Driver simulation — the full correctness gate, runnable standalone.

Creates a deliberately FOREIGN SparkSession (non-UTC timezone, default
confs — the engine must pin its own session settings), runs
__spark_entry__.entry(), then every queries() builder against its
oracle_sql() DuckDB equivalent at the given scale factor using the same
canonicalization as the driver (timing_explorer_spark.testing).

Usage:  python scripts/driver_sim.py [sf_dir]     (default /root/testdata/sf0.01)
Exit 0 iff every oracle query MATCHes and every rows-only query returns rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
    con = duckdb_connection(sf)
    fails: list[str] = []
    t0 = time.time()
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, sf)
            if name in oracles:
                ok = spark_canonical(sdf) == duckdb_canonical(con, oracles[name])
                print(f"{'MATCH' if ok else 'MISMATCH'}: {name}")
                if not ok:
                    fails.append(name)
            else:
                rc = sdf.count()
                print(f"ROWS-ONLY: {name} -> {rc} rows")
                if rc <= 0:
                    fails.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR: {name}: {str(e)[:300]}")
            fails.append(name)
    from timing_explorer_spark.operators.dedup import release_cached

    release_cached()
    print(f"total {time.time() - t0:.1f}s; {len(qs)} queries, {len(fails)} failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
