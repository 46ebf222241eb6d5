"""ML pipeline queries (grouped train / predict). Filled incrementally."""
from __future__ import annotations

from . import QueryDef

QUERIES: dict[str, QueryDef] = {}
