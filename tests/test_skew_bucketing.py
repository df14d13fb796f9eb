"""Skew salting and bucketing: result-equivalence + plan-shape proofs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timing_explorer_spark.operators.skew import (
    bucketed_join,
    salted_join,
    top_keys,
    write_bucketed,
)
from timing_explorer_spark.sources.tables import load


def test_salted_join_equals_plain_join(spark, sf_smoke):
    o = load(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf_smoke, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey").select("o_orderkey", "o_custkey", "c_name")
    salted = salted_join(o, c, on="o_custkey", n_salts=4).select(
        "o_orderkey", "o_custkey", "c_name"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_hot_keys_only(spark, sf_smoke):
    """With an explicit hot-key list, non-hot rows are NOT replicated and the
    result is still exact."""
    e = load(spark, sf_smoke, "events").select("event_id", "user_id", "value")
    users = (
        load(spark, sf_smoke, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", F.col("user_id") % 5)
    )
    hot = top_keys(e, "user_id", min_count=5)
    plain = e.join(users, "user_id").select("event_id", "segment")
    salted = salted_join(e, users, on="user_id", n_salts=4, hot_keys=hot).select(
        "event_id", "segment"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join_preserves_unmatched(spark, sf_smoke):
    c = load(spark, sf_smoke, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_smoke, "orders").where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    plain = c.join(o, "c_custkey", "left")
    salted = salted_join(c, o, on="c_custkey", n_salts=4, how="left")
    assert plain.count() == salted.count()
    assert (
        plain.where(F.col("o_orderkey").isNull()).count()
        == salted.where(F.col("o_orderkey").isNull()).count()
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke, tmp_path_factory):
    o = load(spark, sf_smoke, "orders").withColumnRenamed("o_orderkey", "orderkey")
    l = load(spark, sf_smoke, "lineitem").withColumnRenamed("l_orderkey", "orderkey")
    write_bucketed(o, "b_orders", "orderkey", n_buckets=8)
    write_bucketed(l, "b_lineitem", "orderkey", n_buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    """Identically-bucketed fact tables join without ANY Exchange — the
    pay-shuffle-once-at-write-time contract."""
    lt, rt = bucketed_tables
    df = bucketed_join(spark, lt, rt, "orderkey")
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = je.explainString(mode)
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan[:2000]


def test_bucketed_join_correct(spark, sf_smoke, bucketed_tables):
    lt, rt = bucketed_tables
    n_bucketed = bucketed_join(spark, lt, rt, "orderkey").count()
    o = load(spark, sf_smoke, "orders")
    l = load(spark, sf_smoke, "lineitem")
    n_plain = l.join(o, l.l_orderkey == o.o_orderkey).count()
    assert n_bucketed == n_plain


def test_bucketed_aggregation_shuffle_free(spark, bucketed_tables):
    """groupBy on the bucket key also skips the exchange."""
    lt, _ = bucketed_tables
    df = spark.table(lt).groupBy("orderkey").agg(F.count(F.lit(1)).alias("n"))
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = je.explainString(mode)
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan[:2000]


def test_salted_join_rejects_outer(spark, sf_smoke):
    """right/full outer would duplicate unmatched hot-key right rows once per
    salt — the API must refuse rather than return silently wrong results."""
    import pytest

    from timing_explorer_spark.operators.skew import salted_join

    o = load(spark, sf_smoke, "orders")
    c = load(spark, sf_smoke, "customer").withColumnRenamed("c_custkey", "o_custkey")
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(o, c, "o_custkey", how=how)


def test_salted_agg_equals_plain_groupby(spark, sf_smoke):
    from timing_explorer_spark.operators.skew import salted_agg

    e = load(spark, sf_smoke, "events").select(
        "event_type", F.col("value").cast("decimal(27,8)").alias("v"), "event_id"
    )
    salted = salted_agg(e, ["event_type"], {"v": "sum", "event_id": "count"})
    plain = e.groupBy("event_type").agg(
        F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("count_event_id")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_aqe_skew_join_split(spark, tmp_path):
    """AQE's runtime skew-join handling — the engine-native complement to
    manual salting: with a pathologically hot key and low split thresholds,
    the executed sort-merge join must be marked isSkew=true (partitions
    split at runtime)."""
    from pyspark.sql import functions as F

    big = str(tmp_path / "big")
    small = str(tmp_path / "small")
    # 2M rows on ONE key + a sprinkle of others; right side uniform. The hot
    # partition must exceed the byte threshold AFTER shuffle compression —
    # constant-key sequential data compresses ~10x, so size generously.
    spark.range(2_000_000).select(F.lit(0).alias("k"), F.col("id").alias("payload")).union(
        spark.range(1000).select((F.col("id") % 50 + 1).alias("k"), F.col("id"))
    ).write.mode("overwrite").parquet(big)
    spark.range(51).select(F.col("id").alias("k"), F.lit("d").alias("name")).write.mode(
        "overwrite"
    ).parquet(small)

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = (
            spark.read.parquet(big)
            .join(spark.read.parquet(small), "k")
            .select(F.sum("payload").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        row = df.collect()[0]
        assert row["n"] == 2_001_000  # correctness under the split
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
