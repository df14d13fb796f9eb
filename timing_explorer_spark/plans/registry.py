"""Query registry: the declared, DuckDB-checkable operator inventory.

Every implemented operator/query from SURVEY.md §2 (+ the LLM-pipeline
extension surface) registers here with:
  - a Spark builder  (spark, sf_dir) -> DataFrame
  - an oracle: equivalent ANSI SQL DuckDB runs over the same parquet tables
    (None for genuinely non-SQL-expressible ops → driver does rows-only check)

The driver consumes this via __spark_entry__.queries() / oracle_sql(); our own
pytest suite runs the identical comparison at sf0.001/sf0.01 first.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    headline: bool = False  # include in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), headline, tags)
        return fn

    return deco


_LOADED = False


def _load_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side effects.
    from . import relational  # noqa: F401
    from . import timeseries  # noqa: F401
    from . import text_pipeline  # noqa: F401
    from . import dedup_pipeline  # noqa: F401
    from . import similarity_pipeline  # noqa: F401
    from . import advanced  # noqa: F401
    from . import tpch_suite  # noqa: F401
    from . import multimodal_pipeline  # noqa: F401

    _LOADED = True


def all_queries() -> dict[str, QuerySpec]:
    _load_modules()
    return dict(QUERIES)


def query_map() -> dict[str, Builder]:
    return {name: spec.build for name, spec in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
