#!/usr/bin/env python
"""Generate an sf1-scale fixture by tiling the sf0.1 test data 10x.

Purpose (round-3 verdict directive #2): the five stage-floor-dominated
headline queries are sub-0.3s absolute at sf0.1 — below Spark's ~0.1s
stage-launch floor — so the per-query "within 2x of DuckDB" gate cannot be
decided at that scale. This script builds a 10x fixture (lineitem 6M rows,
orders 1.5M, events 1M) so scripts/bench_sf1.py can demonstrate where the
crossover actually lands, with BOTH engines reading the SAME parquet.

Construction: each fact/dim table is the union of 10 key-shifted replicas
(keys += replica * 10_000_000; all other columns unchanged), so every join
relationship of the original data is preserved exactly and per-key
cardinalities stay identical — output sizes scale linearly, join fan-outs do
not explode. region/nation (fixed-size catalogs) are carried over as-is;
documents tile with VERBATIM text (heavily-duplicated-crawl shape for the
dedup ops) and embeddings tile with a per-replica deterministic
perturbation (near-duplicate vectors, not exact copies — see EMB_PERTURB).

DuckDB writes the parquet (multi-row-group files, so Spark's scan
parallelizes naturally — unlike the single-row-group driver fixtures).

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/sf1-fixture)
Idempotent: skips generation if out_dir already has all tables.
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000
N_REPLICAS = 10

# table -> key columns to shift per replica
SHIFTED = {
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
    "events": ("event_id", "user_id"),
    # documents tile too (r4 verdict task #4 — scale evidence for the LLM
    # heavy ops): doc_id shifts per replica, text kept VERBATIM, so the
    # corpus models a heavily-duplicated crawl (every doc has 10 copies) —
    # the realistic adversarial shape for dedup: exact-dup groups of 10,
    # dense near-dup candidate clusters, connected components that merge
    # replicas. 50k docs / ~10x the shingle index of sf0.1.
    "documents": ("doc_id",),
}
COPIED = ("region", "nation")
# embeddings tile specially: vec_id shifts AND each replica's vector is
# deterministically perturbed (x + r*0.001 per element) so replicas are
# NEAR-duplicates in cosine space, not exact copies — the realistic shape
# for ANN at scale (exact copies would make top-k degenerate). 20k vectors.
EMB_PERTURB = 0.001


def make_sf1(out_dir: str = "/tmp/sf1-fixture") -> str:
    import duckdb

    con = duckdb.connect()

    def fresh(t: str) -> bool:
        path = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(path):
            return False
        if t in SHIFTED or t == "embeddings":  # stale pre-tiling copies rebuild
            src_n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{os.path.join(SRC, t)}.parquet')"
            ).fetchone()[0]
            out_n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{path}')").fetchone()[0]
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
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
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
        shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), os.path.join(out_dir, f"{t}.parquet"))
    if not fresh("embeddings"):
        src = os.path.join(SRC, "embeddings.parquet")
        con.execute(
            f"""
            COPY (
                SELECT (vec_id + r.r * {SHIFT}) AS vec_id,
                       list_transform(embedding,
                                      x -> CAST(x + r.r * {EMB_PERTURB} AS FLOAT))
                           AS embedding,
                       label
                FROM read_parquet('{src}')
                CROSS JOIN (SELECT UNNEST(range({N_REPLICAS})) AS r) r
                ORDER BY r.r
            ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
            """
        )
    con.close()
    return out_dir


if __name__ == "__main__":
    out = make_sf1(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1-fixture")
    print(out)
