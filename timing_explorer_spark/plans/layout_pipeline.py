"""Z-order layout queries: multi-dimensional clustering for file pruning.

Companion to operators/layout.py — registers the oracle-checked demonstration
that Z-ordering the events table on (user bucket, time bucket) yields file
buckets whose per-file dimension ranges are SMALL RECTANGLES of the key
space, which is exactly the property parquet min/max footer pruning needs to
skip files for predicates on EITHER dimension. (Single-dimension sorting
gives tight ranges on one dim and full-width ranges on the other.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import morton_key, morton_sql
from ..sources.tables import load
from .registry import register

# Bucket codes: 8-bit user bucket, 10-bit hour bucket (modulo fold). The
# Spark side and the oracle share these expressions verbatim.
_USER_CODE = "user_id % 256"
_HOUR_CODE = "CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) % 1024"
_FILE_WIDTH = 4096  # z-keys per file bucket: 2^20 key space / 2^12 -> <=256 files


@register(
    "q_zorder_layout",
    oracle=f"""
        WITH coded AS (
            SELECT user_id % 256 AS user_code,
                   CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) % 1024 AS hour_code
            FROM events
        ),
        keyed AS (
            SELECT user_code, hour_code,
                   {morton_sql("user_code", "hour_code")} AS zkey
            FROM coded
        )
        SELECT zkey // {_FILE_WIDTH}        AS file_bucket,
               COUNT(*)                     AS n_rows,
               MIN(user_code)               AS user_min,
               MAX(user_code)               AS user_max,
               MIN(hour_code)               AS hour_min,
               MAX(hour_code)               AS hour_max
        FROM keyed
        GROUP BY 1
    """,
    doc=(
        "Z-order (Morton) clustering layout — the OPTIMIZE ZORDER BY "
        "analog: interleave the bits of an 8-bit user bucket and a 10-bit "
        "hour bucket into one sort key, assign fixed-width z-ranges to file "
        "buckets, and report each file's per-dimension min/max — the "
        "rectangle its parquet footer would advertise. Because the Morton "
        "curve maps each fixed z-range onto a bounded rectangle of the "
        "(user, hour) plane, BOTH single-dimension predicates prune most "
        "files (asserted quantitatively in tests/test_layout.py). The key "
        "is five shift/mask rounds per dimension of pure integer "
        "arithmetic — zero shuffle to compute, bit-identical cross-engine "
        "(the oracle's SQL is GENERATED from the same mask table). At "
        "100 TB this is the write-path sort key before file split; the "
        "one shuffle here is the demonstration's per-file stats rollup."
    ),
    tags=("layout", "zorder", "pruning", "scale"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    coded = e.select(
        F.expr(_USER_CODE).alias("user_code"),
        (F.floor(F.unix_micros(F.col("ts")) / F.lit(3_600_000_000)).cast("bigint") % 1024).alias(
            "hour_code"
        ),
    )
    keyed = coded.withColumn("zkey", morton_key(F.col("user_code"), F.col("hour_code")))
    return keyed.groupBy(F.expr(f"zkey DIV {_FILE_WIDTH}").alias("file_bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("user_code").alias("user_min"),
        F.max("user_code").alias("user_max"),
        F.min("hour_code").alias("hour_min"),
        F.max("hour_code").alias("hour_max"),
    )
