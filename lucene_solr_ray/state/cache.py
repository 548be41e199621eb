"""Per-actor caches (SURVEY.md §2.4 "Solr caches").

The reference keeps per-searcher LRU caches (solr/core/src/java/org/apache/
solr/search/FastLRUCache.java / LRUCache.java: filterCache,
queryResultCache, documentCache).  Our analog lives inside each IndexShard
actor: a bounded LRU over decoded posting arrays (the expensive part of a
cold term) and optionally over (query, k) results.  Bounding matters at
scale — an unbounded decode cache is a slow memory leak across a long-lived
serving actor.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Hashable


class LRUCache:
    def __init__(self, max_items: int = 10_000):
        self.max_items = max_items
        self._d: OrderedDict[Hashable, Any] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: Hashable, default=None):
        try:
            v = self._d[key]
        except KeyError:
            self.misses += 1
            return default
        self._d.move_to_end(key)
        self.hits += 1
        return v

    def put(self, key: Hashable, value: Any) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.max_items:
            self._d.popitem(last=False)

    def clear(self) -> None:
        self._d.clear()

    def __contains__(self, key: Hashable) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    def stats(self) -> dict:
        total = self.hits + self.misses
        return {
            "items": len(self._d),
            "hits": self.hits,
            "misses": self.misses,
            "hit_rate": self.hits / total if total else 0.0,
        }
