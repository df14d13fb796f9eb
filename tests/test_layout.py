"""Z-order layout: Morton key correctness vs a pure-Python reference, and the
pruning property the layout exists for (bounded per-file rectangles)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from timing_explorer_spark.operators.layout import morton_key, morton_sql, spread_bits
from timing_explorer_spark.plans import all_queries


def _py_morton(x: int, y: int) -> int:
    """Bit-by-bit reference interleave (the definition, not the fast form)."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=50,
    )
)
def test_morton_key_matches_reference(spark, codes):
    df = spark.createDataFrame(codes, "x: long, y: long")
    rows = df.select("x", "y", morton_key(F.col("x"), F.col("y")).alias("z")).collect()
    for r in rows:
        assert r.z == _py_morton(r.x, r.y), (r.x, r.y, r.z)


def test_morton_sql_matches_column_expr(spark):
    """The generated oracle SQL and the Column form are the same function."""
    df = spark.range(0, 4096).select(
        (F.col("id") % 251).alias("x"), (F.col("id") % 977).alias("y")
    )
    viaexpr = df.select(morton_key(F.col("x"), F.col("y")).alias("z")).collect()
    viasql = df.selectExpr(f"{morton_sql('x', 'y')} AS z").collect()
    assert [r.z for r in viaexpr] == [r.z for r in viasql]


def test_spread_bits_inverse_density(spark):
    """Spread bits land only on even positions (odd mask must be empty)."""
    rows = (
        spark.range(0, 65536, 197)
        .select(spread_bits(F.col("id")).alias("s"))
        .collect()
    )
    for r in rows:
        assert r.s & 0xAAAAAAAA == 0


def test_zorder_buckets_are_small_rectangles(spark, sf_oracle):
    """The layout's reason to exist: every file bucket's (user x hour)
    rectangle must cover a small fraction of the full key plane, so a
    predicate on EITHER dimension prunes most files. A single-dimension
    sort would leave the other dimension's range at full width."""
    rows = all_queries()["q_zorder_layout"].build(spark, sf_oracle).collect()
    assert len(rows) > 10
    plane = 256 * 1024
    areas = [
        (r.user_max - r.user_min + 1) * (r.hour_max - r.hour_min + 1) for r in rows
    ]
    # every z-range of width 4096 covers at most a 64x64 and a 128x128
    # half-step rectangle pair -> bounded by 2 full aligned tiles
    assert max(areas) <= 2 * 4096, max(areas)
    assert sum(areas) / len(areas) <= plane / 32


def test_compact_parquet_small_files(spark, tmp_path):
    """Compaction: 64 tiny files -> byte-sized file count, rows preserved
    exactly; sort_by rewrites into disjoint key ranges (every output file's
    [min,max] intervals are non-overlapping -> parquet footer pruning works
    on the compacted layout)."""
    import pyspark.sql.functions as F

    from timing_explorer_spark.operators.layout import compact_parquet

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(20_000).select(
        F.col("id"), F.pmod(F.xxhash64("id"), 1000).alias("k")
    )
    df.repartition(64).write.parquet(src)
    before, after = compact_parquet(
        spark, src, dst, target_file_bytes=64 * 1024, sort_by=["k"]
    )
    assert before == 64 and 1 <= after < 16
    out = spark.read.parquet(dst)
    assert out.count() == 20_000
    assert out.agg(F.sum("id")).collect()[0][0] == 20_000 * 19_999 // 2
    # disjoint ranges per file: max(k) of file i < min(k) of file i+1
    ranges = sorted(
        (
            (r["mn"], r["mx"])
            for r in out.groupBy(F.input_file_name().alias("f"))
            .agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
            .collect()
        )
    )
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
