"""Leakage-safe splitting (operators/splits.py) — the contract pinned:
cluster atomicity (no near-dup pair straddles splits), determinism across
partitionings and reruns, fraction targeting on singleton corpora, the
contrast case (row-wise splitting DOES leak on the same data), and the
report's proof column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timing_explorer_spark.operators.dedup import release_cached
from timing_explorer_spark.operators.splits import cluster_safe_split, split_report
from timing_explorer_spark.plans import all_queries

SPECS = all_queries()


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 10) for i in range(n)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")


def test_clusters_stay_together(spark):
    docs = _docs(spark, 20)
    # two chains: {0,1,2,3} and {10,11}; rest singletons
    pairs = _pairs(spark, [(0, 1), (1, 2), (2, 3), (10, 11)])
    out = cluster_safe_split(docs, pairs, seed=7).collect()
    release_cached()
    split_of = {r["doc_id"]: r["split"] for r in out}
    unit_of = {r["doc_id"]: r["unit"] for r in out}
    assert len({split_of[i] for i in (0, 1, 2, 3)}) == 1
    assert len({split_of[i] for i in (10, 11)}) == 1
    assert all(unit_of[i] == 0 for i in (0, 1, 2, 3))  # min-id rep
    assert all(unit_of[i] == i for i in range(4, 10))  # singletons = own id


def test_no_cross_split_pairs_and_report(spark):
    docs = _docs(spark, 40)
    edges = [(i, i + 1) for i in range(0, 30, 3)]  # 10 two-doc... pairs (i,i+1)
    pairs = _pairs(spark, edges)
    split_docs = cluster_safe_split(
        docs, pairs, fractions={"train": 0.5, "val": 0.25, "test": 0.25}, seed=3
    ).cache()
    rep = {r["split"]: r for r in split_report(split_docs, pairs).collect()}
    release_cached()
    assert sum(r["n_docs"] for r in rep.values()) == 40
    assert all(r["cross_split_pairs"] == 0 for r in rep.values())
    # contrast: a row-wise hash split on doc_id DOES leak on the same graph
    naive = docs.withColumn(
        "split",
        F.when(F.pmod(F.xxhash64(F.lit(3), F.col("doc_id")), F.lit(2)) == 0, "train")
        .otherwise("test"),
    ).select("doc_id", "split")
    a = naive.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa")
    b = naive.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb")
    leaks = pairs.join(a, "doc_a").join(b, "doc_b").where("sa != sb").count()
    assert leaks > 0


def test_deterministic_across_partitionings_and_reruns(spark):
    docs = _docs(spark, 30)
    pairs = _pairs(spark, [(1, 2), (5, 6), (6, 7)])
    a = {
        r["doc_id"]: (r["unit"], r["split"])
        for r in cluster_safe_split(docs.repartition(1), pairs, seed=9).collect()
    }
    release_cached()
    b = {
        r["doc_id"]: (r["unit"], r["split"])
        for r in cluster_safe_split(docs.repartition(13), pairs.repartition(5), seed=9).collect()
    }
    release_cached()
    assert a == b


def test_fractions_roughly_hit_on_singletons(spark):
    docs = _docs(spark, 2000)
    pairs = _pairs(spark, [])  # all singletons
    out = cluster_safe_split(
        docs, pairs, fractions={"train": 0.8, "val": 0.1, "test": 0.1}, seed=1
    ).groupBy("split").count().collect()
    release_cached()
    got = {r["split"]: r["count"] for r in out}
    assert abs(got.get("train", 0) / 2000 - 0.8) < 0.05
    assert abs(got.get("val", 0) / 2000 - 0.1) < 0.03
    assert abs(got.get("test", 0) / 2000 - 0.1) < 0.03


def test_bad_fractions_rejected(spark):
    docs = _docs(spark, 2)
    pairs = _pairs(spark, [])
    try:
        cluster_safe_split(docs, pairs, fractions={"train": 0.5, "test": 0.4})
    except ValueError as e:
        assert "sum" in str(e)
    else:
        raise AssertionError("fractions summing to 0.9 accepted")


def test_registered_query_on_fixture(spark, sf_smoke):
    out = SPECS["q_leakage_safe_split"].build(spark, sf_smoke).collect()
    release_cached()
    assert out
    assert all(r["cross_split_pairs"] == 0 for r in out)
    assert sum(r["n_docs"] for r in out) > 0
    for r in out:
        assert r["n_units"] <= r["n_docs"]
