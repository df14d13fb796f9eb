#!/usr/bin/env python
"""Same-session micro A/B for the r13 kn_prob rewrite (single tagged LUT +
pivot vs the former per-order join chain) and the kn_train collect fusion.

Builds BOTH scoring plans over ONE trained model in ONE bench session and
alternates noop executions (ABAB..), so host drift hits both sides equally.
Usage: python scripts/bench_kn_ab.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def chain_prob(queries, model):
    """The pre-r13 kn_prob implementation, verbatim (reference side)."""
    from timing_explorer_spark.operators.kneser_ney import SEP

    n = model.order
    q = queries
    for k in range(1, n + 1):
        key_ctx = (
            F.array_join(F.slice("gram", n - k + 1, k - 1), SEP)
            if k > 1
            else F.lit("")
        )
        q = q.withColumn(f"_c{k}", key_ctx).withColumn("_w", F.element_at("gram", n))
        q = q.join(
            model.parts[k].select(
                F.col("ctx").alias(f"_c{k}"),
                F.col("w").alias("_w"),
                F.col("part").alias(f"_p{k}"),
            ),
            on=[f"_c{k}", "_w"],
            how="left",
        )
        if k > 1:
            q = q.join(
                model.gammas[k].select(
                    F.col("ctx").alias(f"_c{k}"), F.col("gamma").alias(f"_g{k}")
                ),
                on=f"_c{k}",
                how="left",
            )
    p = F.coalesce(F.col("_p1"), F.lit(0.0)) + F.lit(model.gamma1 / model.vocab_size)
    for k in range(2, n + 1):
        p = F.coalesce(F.col(f"_p{k}"), F.lit(0.0)) + F.coalesce(
            F.col(f"_g{k}"), F.lit(1.0)
        ) * p
    drop = ["_w"] + [f"_c{k}" for k in range(1, n + 1)]
    drop += [f"_p{k}" for k in range(1, n + 1)]
    drop += [f"_g{k}" for k in range(2, n + 1)]
    return q.withColumn("p", p).drop(*drop)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    reps = 5
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])

    from bench import bench_session
    from timing_explorer_spark.operators.kneser_ney import (
        _padded_tokens,
        _spans,
        kn_prob,
        kn_train,
    )
    from timing_explorer_spark.sources.tables import load

    spark = bench_session("bench-kn-ab")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents")
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    t0 = time.monotonic()
    model = kn_train(docs, order=5)
    train_sec = round(time.monotonic() - t0, 3)
    train_jobs = len(tracker.getJobIdsForGroup(None) or []) - jobs_before

    tok = _padded_tokens(docs, 5, "text", "doc_id")
    distinct = _spans(tok, 5, 5).select("gram").distinct()

    def full_ppl(prob_fn):
        from timing_explorer_spark.operators.kneser_ney import SEP

        scored = prob_fn(distinct, model).select(
            F.array_join("gram", SEP).alias("_g"),
            F.log(F.greatest(F.col("p"), F.lit(1e-300)))
            .cast("decimal(38,18)")
            .alias("_logp"),
        )
        events = _spans(tok, 5, 5).select(
            "_doc", F.array_join("gram", SEP).alias("_g")
        )
        return (
            events.join(scored, on="_g")
            .groupBy("_doc")
            .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("_logp").alias("_s"))
        )

    lut_prob = lambda q, m: kn_prob(q, m, lookup="lut")  # noqa: E731
    plans = {
        "score_lut": lut_prob(distinct, model),
        "score_chain": chain_prob(distinct, model),
        "ppl_lut": full_ppl(lut_prob),
        "ppl_chain": full_ppl(chain_prob),
    }
    times: dict[str, list[float]] = {k: [] for k in plans}
    # untimed codegen pass each
    for name, df in plans.items():
        spark.sparkContext.setJobDescription(f"kn-ab warmup {name}")
        df.write.mode("overwrite").format("noop").save()
    for _ in range(reps):
        for name, df in plans.items():  # alternating ABAB
            spark.sparkContext.setJobDescription(f"kn-ab {name}")
            t0 = time.monotonic()
            df.write.mode("overwrite").format("noop").save()
            times[name].append(round(time.monotonic() - t0, 4))
    out = {
        "sf_dir": sf_dir,
        "train_sec": train_sec,
        "train_driver_jobs": train_jobs,
        "mins": {k: min(v) for k, v in times.items()},
        "all": times,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
