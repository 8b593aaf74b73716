"""Placeholder — filled in later this round."""
from . import Query

QUERIES: dict[str, Query] = {}
