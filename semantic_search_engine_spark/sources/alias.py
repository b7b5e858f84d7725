"""Index aliases — Elasticsearch's zero-downtime reindex workflow
(`POST /_aliases` with atomic add+remove): build the new index under a
new physical root, verify it is complete, then swap the alias in ONE
atomic pointer write. Serving code resolves the alias at engine
construction; in-flight engines keep their (immutable) snapshot — the
swap changes what NEW readers see, never what existing readers hold,
the same contract the store's manifest commits already give per-table.

Layout::

    <pool>/<index-root>/...          physical indexes (one store root each)
    <pool>/aliases/<alias>.json      pointer: target + swap history

The pointer write is a temp-file + ``os.replace`` — the identical
atomicity primitive ``HadoopTableStore._commit`` uses, so an alias can
never be observed half-written. Readiness gating (``require_tables``)
refuses to point an alias at a root missing committed core tables —
the "green before swap" guard that makes reindex-then-swap safe.

At 10^12 docs nothing here touches data: an alias swap is one metadata
rename regardless of index size (Iceberg's equivalent is a catalog
pointer update; the interface maps 1:1).
"""
from __future__ import annotations

import json
import os
import time
import uuid

__all__ = ["set_alias", "resolve_alias", "list_aliases",
           "engine_for_alias", "REQUIRED_TABLES"]

# the tables a servable text index must have committed
REQUIRED_TABLES = ("doc_meta", "postings", "term_stats", "corpus_stats")


def _alias_path(pool_root: str, alias: str) -> str:
    if "/" in alias or alias.startswith("."):
        raise ValueError(f"invalid alias name {alias!r}")
    return os.path.join(pool_root, "aliases", f"{alias}.json")


def _is_ready(index_root: str, require_tables) -> list[str]:
    """Missing committed tables (empty = ready)."""
    return [t for t in require_tables
            if not os.path.exists(
                os.path.join(index_root, t, "manifest.json"))]


def set_alias(pool_root: str, alias: str, target: str,
              require_tables=REQUIRED_TABLES) -> dict:
    """Point ``alias`` at ``target`` (an index-root dir name inside the
    pool, or an absolute path). Atomic: readers see the old target or
    the new one, never a torn pointer. Refuses a target whose required
    tables lack committed manifests (pass ``require_tables=()`` to
    opt out, e.g. for a metadata-only root). Returns the pointer
    record, which keeps the previous target for audit."""
    index_root = (target if os.path.isabs(target)
                  else os.path.join(pool_root, target))
    if not os.path.isdir(index_root):
        raise FileNotFoundError(
            f"alias target {index_root!r} does not exist")
    missing = _is_ready(index_root, require_tables)
    if missing:
        raise ValueError(
            f"alias target {target!r} is not servable: no committed "
            f"manifest for {missing} (build it, then swap)")
    path = _alias_path(pool_root, alias)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    prev = None
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    record = {
        "alias": alias,
        "target": target,
        "index_root": index_root,
        "swapped_at": time.time(),
        "previous_target": prev["target"] if prev else None,
    }
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic swap
    return record


def resolve_alias(pool_root: str, alias: str) -> str:
    """The alias's current index root (absolute path)."""
    path = _alias_path(pool_root, alias)
    if not os.path.exists(path):
        raise FileNotFoundError(f"alias {alias!r} does not exist")
    with open(path) as f:
        return json.load(f)["index_root"]


def list_aliases(pool_root: str) -> dict[str, str]:
    """alias -> index_root for every alias in the pool."""
    d = os.path.join(pool_root, "aliases")
    if not os.path.isdir(d):
        return {}
    out = {}
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                rec = json.load(f)
            out[rec["alias"]] = rec["index_root"]
    return out


def engine_for_alias(spark, pool_root: str, alias: str, cfg):
    """A QueryEngine over the alias's CURRENT target. The engine holds
    that physical root for its lifetime (stable results mid-request);
    re-resolve per request/session to pick up swaps."""
    from ..plans.query import QueryEngine
    from .store import HadoopTableStore

    root = resolve_alias(pool_root, alias)
    return QueryEngine(spark, HadoopTableStore(spark, root), cfg)
