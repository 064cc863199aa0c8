"""Operator library. Importing this package populates the query REGISTRY."""

from .registry import REGISTRY, QuerySpec, query

from . import relational  # noqa: E402,F401 — registers relational queries
from . import governed  # noqa: E402,F401 — registers governance queries

__all__ = ["REGISTRY", "QuerySpec", "query"]
