from .registry import QUERIES, QuerySpec, get_query, oracle_map

__all__ = ["QUERIES", "QuerySpec", "get_query", "oracle_map"]
