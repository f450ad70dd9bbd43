from .registry import QUERIES, QuerySpec, query

__all__ = ["QUERIES", "QuerySpec", "query"]
