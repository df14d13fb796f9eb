#!/usr/bin/env python
"""Cold/codegen-tail probe (r13, verdict task #8): several queries pay
multi-second FIRST executions dominated by whole-stage-codegen compilation
+ JIT, not data. This probe times the first (cold) and second (warm)
execution of each target query in a FRESH subprocess per (conf, query)
pair, under the exact bench session confs plus one conf variant:

  default  — bench confs as-is (hugeMethodLimit 65535: Spark never splits)
  huge8k   — spark.sql.codegen.hugeMethodLimit=8000: generated methods
             bigger than HotSpot's 8000-bytecode DontCompileHugeMethods
             limit fall back to interpreted Volcano instead of shipping
             janino output the JIT will refuse to compile

Prints ONE JSON line. Usage:
  python scripts/bench_cold_codegen.py [--sf DIR] [--reps N] [--queries a,b]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from bench import bench_session
from timing_explorer_spark.plans import all_queries
from timing_explorer_spark.sources.tables import warm_cache

spark = bench_session("cold-codegen-probe")
spark.sparkContext.setLogLevel("ERROR")
for k, v in json.loads({conf_json!r}).items():
    spark.conf.set(k, v)
warm_cache(
    spark, {sf_dir!r}, n_partitions=16,
    partition_counts={{"region": 1, "nation": 1, "supplier": 1,
                       "customer": 2, "part": 2, "events": 4}},
    partition_keys={{"lineitem": "l_orderkey", "orders": "o_orderkey",
                     "events": "user_id"}},
    drop_columns={{"events": ("props",)}},
)
df = all_queries()[{qname!r}].build(spark, {sf_dir!r})
t0 = time.monotonic(); df.write.mode("overwrite").format("noop").save()
cold = time.monotonic() - t0
t0 = time.monotonic(); df.write.mode("overwrite").format("noop").save()
warm = time.monotonic() - t0
print("RESULT " + json.dumps({{"cold": round(cold, 3), "warm": round(warm, 3)}}))
"""

VARIANTS = {
    "default": {},
    "huge8k": {"spark.sql.codegen.hugeMethodLimit": "8000"},
}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 2
    queries = ["q01_pricing_summary", "q_range_lookup_join", "q_vocab_heavy_hitters"]
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    if "--queries" in args:
        queries = args[args.index("--queries") + 1].split(",")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, dict] = {q: {} for q in queries}
    for q in queries:
        for vname, conf in VARIANTS.items():
            colds, warms = [], []
            for _ in range(reps):
                code = CHILD.format(
                    root=root, conf_json=json.dumps(conf), sf_dir=sf_dir, qname=q
                )
                r = subprocess.run(
                    [sys.executable, "-c", code],
                    capture_output=True, text=True, timeout=900,
                    env={**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")},
                )
                line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
                if not line:
                    colds.append(None)
                    continue
                rec = json.loads(line[-1][len("RESULT "):])
                colds.append(rec["cold"])
                warms.append(rec["warm"])
            out[q][vname] = {"cold": colds, "warm": warms}
    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
