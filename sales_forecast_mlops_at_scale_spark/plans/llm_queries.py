"""LLM-data-pipeline queries (dedup / similarity / text analysis). Filled incrementally."""
from __future__ import annotations

from . import QueryDef

QUERIES: dict[str, QueryDef] = {}
