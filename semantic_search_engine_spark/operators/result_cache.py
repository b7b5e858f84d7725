"""Snapshot-keyed query result cache — Elasticsearch's request cache
semantics: identical requests serve from memory, and the cache key
includes the INDEX VERSION, so a commit (merge, delete, rebuild)
invalidates everything stale with zero bookkeeping — no TTLs, no
explicit invalidation calls, no chance of serving a result from a
superseded snapshot.

The version is the tuple of per-table snapshot ids from the store's
manifests (one tiny JSON read per core table per lookup — the same
files every query's ``store.read`` consults anyway; an Iceberg store
would use its snapshot ids identically). Results are driver-side
top-k lists (≤ max_k tuples), so a few thousand entries cost ~MBs:
``max_entries`` LRU-bounds it.

This wraps the list-returning serve calls (``top_k``-shaped). It does
NOT wrap DataFrame-returning APIs: a DataFrame is a lazy plan, not a
result, and caching plans is the store's read-handle cache's job
(already done per snapshot)."""
from __future__ import annotations

from collections import OrderedDict

__all__ = ["CachingQueryEngine"]

_CORE_TABLES = ("doc_meta", "postings", "term_stats", "corpus_stats")


class CachingQueryEngine:
    """LRU result cache in front of a QueryEngine's list-returning
    methods. Usage::

        cqe = CachingQueryEngine(qe)
        cqe.top_k("query", k=10)          # computes
        cqe.top_k("query", k=10)          # serves from cache
        builder.delete_docs([...])        # commits a new snapshot
        cqe.top_k("query", k=10)          # version changed: recomputes
    """

    #: methods eligible for caching (list-returning, deterministic
    #: functions of (args, index version))
    CACHEABLE = ("top_k", "term_boosted_top_k", "rescore_top_k",
                 "hybrid_top_k", "prf_top_k", "phrase_top_k",
                 "boolean_top_k")

    def __init__(self, qe, max_entries: int = 1024):
        if max_entries < 1:
            raise ValueError(
                f"max_entries must be >= 1, got {max_entries}")
        self.qe = qe
        self.max_entries = max_entries
        self._cache: OrderedDict[tuple, list] = OrderedDict()
        self.hits = 0
        self.misses = 0

    # ------------------------------------------------------------ keys
    def _index_version(self) -> tuple:
        sfx = self.qe._sfx()
        reader = getattr(self.qe.store, "_read_manifest", None)
        if reader is None:          # store without manifests: no safe
            return (object(),)      # version -> every lookup misses
        out = []
        for t in _CORE_TABLES:
            m = reader(f"{t}{sfx}")
            out.append(m["snapshot"] if m else None)
        return tuple(out)

    @staticmethod
    def _freeze(v):
        if isinstance(v, dict):
            return tuple(sorted(v.items()))
        if isinstance(v, (list, set)):
            return tuple(v)
        return v

    # --------------------------------------------------------- serving
    def __getattr__(self, name):
        target = getattr(self.qe, name)  # AttributeError propagates
        if name not in self.CACHEABLE or not callable(target):
            return target

        def cached(*args, **kwargs):
            key = (name, self._index_version(),
                   tuple(self._freeze(a) for a in args),
                   tuple(sorted((k, self._freeze(v))
                                for k, v in kwargs.items())))
            try:
                hit = self._cache[key]
            except TypeError:       # unhashable arg: pass through
                self.misses += 1
                return target(*args, **kwargs)
            except KeyError:
                self.misses += 1
                result = target(*args, **kwargs)
                # store a private copy: the caller owns `result` and may
                # mutate it
                self._cache[key] = list(result)
                if len(self._cache) > self.max_entries:
                    self._cache.popitem(last=False)     # evict LRU
                return result
            self.hits += 1
            self._cache.move_to_end(key)
            return list(hit)        # callers may mutate their copy

        return cached

    def stats(self) -> dict:
        return {"hits": self.hits, "misses": self.misses,
                "entries": len(self._cache),
                "max_entries": self.max_entries}

    def clear(self) -> None:
        self._cache.clear()
