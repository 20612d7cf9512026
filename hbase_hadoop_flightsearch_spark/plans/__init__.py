from .registry import QUERIES, Query, load_all, register

__all__ = ["QUERIES", "Query", "load_all", "register"]
