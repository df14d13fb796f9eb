from .registry import QUERIES, QuerySpec, all_queries, oracle_map, query_map  # noqa: F401
