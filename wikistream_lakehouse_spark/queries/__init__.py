"""Registered query surface — see registry.py for conventions."""

from wikistream_lakehouse_spark.queries.registry import REGISTRY, Query, all_queries, register

__all__ = ["REGISTRY", "Query", "all_queries", "register"]
