"""Driver-side query-result cache.

Same design as the reference's per-process cache (reference
``query_engine.py:41-67``): key = MD5 of the canonical JSON encoding of
the query dict; value = the *collected* result (list of rows + column
names) — results are post-aggregation and small, so caching materialized
rows beats caching a lazy plan that would recompute on every action.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass


def query_key(q: dict) -> str:
    return hashlib.md5(json.dumps(q, sort_keys=True).encode()).hexdigest()


@dataclass
class CachedResult:
    columns: list[str]
    rows: list[tuple]


class ResultCache:
    def __init__(self, max_entries: int = 256):
        self._store: dict[str, CachedResult] = {}
        self.max_entries = max_entries
        self.hits = 0
        self.misses = 0

    def get(self, q: dict) -> CachedResult | None:
        res = self._store.get(query_key(q))
        if res is None:
            self.misses += 1
        else:
            self.hits += 1
        return res

    def put(self, q: dict, columns: list[str], rows: list[tuple]) -> None:
        if len(self._store) >= self.max_entries:
            # FIFO eviction — insertion order is good enough here.
            self._store.pop(next(iter(self._store)))
        self._store[query_key(q)] = CachedResult(columns, rows)
