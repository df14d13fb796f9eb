#!/usr/bin/env python
"""Generate the sf10 fixture for the weak-4 decider (round-6 verdict task #1).

At sf0.1/sf1 the four remaining >2x-of-DuckDB headliners (q01, q03, q05,
q_events_per_window) are partially masked by the local-mode scheduling floor
(measured 0.086-0.18 s — comparable to their whole runtime). At sf10
(lineitem 60M rows) the floor is <5% of runtime, so the Spark-vs-DuckDB
ratio measures per-row throughput cleanly: <=2x graduates a query; >2x plus
an exchange-minimal plan and a per-row CPU profile grades done-irreducible.

Same construction as make_sf1.py (key-shifted replicas preserve every join
relationship and per-key cardinality; output sizes scale linearly), but
100 replicas of sf0.1 and ONLY the tables those four queries read —
lineitem, orders, customer, supplier, events + the fixed catalogs. ~2.5 GB.

Usage: python scripts/make_sf10.py [out_dir]   (default /tmp/sf10-fixture)
Idempotent: skips any table whose tiled row count is already right.
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000
N_REPLICAS = 100

SHIFTED = {
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "events": ("event_id", "user_id"),
    # documents tile VERBATIM (like make_sf1): 500k docs, every doc in a
    # 100-copy exact-dup group — the hostile dense-cluster shape for the
    # sf10 dedup scale probe (scripts/bench_sf10_llm.py)
    "documents": ("doc_id",),
}
COPIED = ("region", "nation")


def make_sf10(out_dir: str = "/tmp/sf10-fixture") -> str:
    import duckdb

    con = duckdb.connect()

    def fresh(t: str) -> bool:
        path = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(path):
            return False
        if t in SHIFTED or t == "embeddings":
            src_n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{os.path.join(SRC, t)}.parquet')"
            ).fetchone()[0]
            out_n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{path}')"
            ).fetchone()[0]
            return out_n == src_n * N_REPLICAS
        return True

    tables = list(SHIFTED) + list(COPIED) + ["embeddings"]
    if all(fresh(t) for t in tables):
        con.close()
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for t, keys in SHIFTED.items():
        if fresh(t):
            continue
        src = os.path.join(SRC, f"{t}.parquet")
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        proj = ", ".join(
            f"({c} + r.r * {SHIFT}) AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"""
            COPY (
                SELECT {proj}
                FROM read_parquet('{src}')
                CROSS JOIN (SELECT UNNEST(range({N_REPLICAS})) AS r) r
                ORDER BY r.r
            ) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)
            """
        )
    for t in COPIED:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out_dir, f"{t}.parquet")
        )
    # embeddings tile like make_sf1: per-replica +r*0.001 perturbation ->
    # 200k vectors in dense near-dup families (the ANN scale-probe shape)
    emb_out = os.path.join(out_dir, "embeddings.parquet")
    src = os.path.join(SRC, "embeddings.parquet")
    con2 = duckdb.connect()
    src_n = con2.execute(f"SELECT COUNT(*) FROM read_parquet('{src}')").fetchone()[0]
    need = not os.path.exists(emb_out) or con2.execute(
        f"SELECT COUNT(*) FROM read_parquet('{emb_out}')"
    ).fetchone()[0] != src_n * N_REPLICAS
    if need:
        con2.execute(
            f"""
            COPY (
                SELECT (vec_id + r.r * {SHIFT}) AS vec_id,
                       list_transform(embedding,
                                      x -> CAST(x + r.r * 0.001 AS FLOAT))
                           AS embedding,
                       label
                FROM read_parquet('{src}')
                CROSS JOIN (SELECT UNNEST(range({N_REPLICAS})) AS r) r
                ORDER BY r.r
            ) TO '{emb_out}' (FORMAT PARQUET)
            """
        )
    con2.close()
    con.close()
    return out_dir


if __name__ == "__main__":
    out = make_sf10(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10-fixture")
    print(out)
