from .registry import REGISTRY, QuerySpec, all_queries, query  # noqa: F401
