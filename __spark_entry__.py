"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (keyed tumbling event-time window counts, the
               Spark re-expression of the reference's PseudoWindow,
               /root/reference/src/main/java/com/ververica/functions/PseudoWindow.java)
               over /root/testdata/sf0.001.
queries()    — the full declared inventory from timing_explorer_spark.plans.
oracle_sql() — matching DuckDB SQL per query (omitted only for hash-sketch /
               approximate operators, which get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from timing_explorer_spark.plans import oracle_map, query_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return query_map()["q_events_per_window"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys missing here (approx/hash-sketch
    ops) get the driver's weaker rows-only check by design."""
    return oracle_map()
