#!/usr/bin/env python
"""Capture .explain('formatted') for the r13 FORCED-mode plan shapes — the
scale paths that the adaptive dispatches do not select at bench scale:

  - prefix_bucketed_forced: running_total(shape="bucketed") on the
    q_concurrent_events core (single data-grain exchange; the window's
    hashpartitioning(__pid) re-shuffle is gone)
  - prefix_legacy: the same plan under shape="legacy" (the r12 shape, for
    the side-by-side exchange count)
  - kn_prob_lut_forced: kn_prob(lookup="lut") over the trained sf0.001
    model (ONE tagged-LUT join + pivot vs the 9-join chain)
  - kn_prob_chain: the same queries under lookup="chain"

Writes plans/r13/<name>.txt under the exact bench confs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from bench import bench_session
    from timing_explorer_spark.operators.kneser_ney import (
        _padded_tokens,
        _spans,
        kn_prob,
        kn_train,
    )
    from timing_explorer_spark.operators.prefix import running_total
    from timing_explorer_spark.sources.tables import load

    spark = bench_session("capture-forced-plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(outdir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(F.col("ts").alias("t")).agg(F.sum(F.lit(1)).alias("d"))
    plans = {
        "prefix_bucketed_forced": running_total(
            agg, ["t"], "d", alias="concurrent", shape="bucketed"
        ),
        "prefix_legacy": running_total(
            agg, ["t"], "d", alias="concurrent", shape="legacy"
        ),
    }

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    model = kn_train(docs, order=5)
    tok = _padded_tokens(docs, 5, "text", "doc_id")
    distinct = _spans(tok, 5, 5).select("gram").distinct()
    plans["kn_prob_lut_forced"] = kn_prob(distinct, model, lookup="lut")
    plans["kn_prob_chain"] = kn_prob(distinct, model, lookup="chain")

    for name, df in plans.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
