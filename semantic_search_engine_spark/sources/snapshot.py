"""Index snapshot / restore — Elasticsearch's snapshot API shape for the
Hadoop table store: a snapshot REPOSITORY holds a content-addressed data
pool shared by many named snapshots, so repeated snapshots of a mostly-
unchanged index copy only the NEW snapshot directories (ES snapshots are
incremental at the segment-file level; this store's immutable
``snap-<uuid>`` directories are the exact analogue — a partition-pruned
CoW merge (X25) carries untouched directories by reference, and a later
snapshot reuses their already-pooled copies for free).

Repository layout::

    <repo>/data/<table>/<snap-dir>/...parquet   (shared, immutable pool)
    <repo>/snap-<name>.json                     (named snapshot manifest)

The manifest records every table's current store snapshot id, its
relative data paths, its ``meta`` (fingerprints, data_uuid — the
lineage chain), and every file's size. ``restore_snapshot`` verifies
sizes BEFORE wiring manifests (torn-copy detection), rebuilds each
table's ``manifest.json`` in a fresh warehouse root, and returns a
ready ``HadoopTableStore`` — fingerprint-gated fast paths (suffix /
trigram dictionaries, resume skips) keep working because ``meta`` is
carried byte-for-byte.

Scale notes: snapshotting never reads table DATA through Spark — it is
a filesystem copy of immutable directories plus JSON bookkeeping, the
same as ES. At 10^12 docs the copy is the object-store ``cp`` of the
index artifacts (a few % of corpus size); incrementality means a daily
snapshot after incremental ingest (X20) copies only the touched doc
buckets' re-encoded directories.
"""
from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import SparkSession

from .store import HadoopTableStore

__all__ = ["create_snapshot", "restore_snapshot", "list_snapshots",
           "delete_snapshot", "retain_last", "prune_repository"]


def _walk_sizes(root: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            out[os.path.relpath(p, root)] = os.path.getsize(p)
    return out


def create_snapshot(store: HadoopTableStore, repo: str, name: str,
                    tables: list[str] | None = None) -> dict:
    """Copy the CURRENT committed snapshot of each table into the
    repository pool (skipping pool entries that already exist — the
    incremental path) and commit ``snap-<name>.json`` atomically.
    Returns {tables, dirs_copied, dirs_reused}."""
    if os.path.exists(os.path.join(repo, f"snap-{name}.json")):
        raise ValueError(f"snapshot {name!r} already exists in {repo}")
    os.makedirs(os.path.join(repo, "data"), exist_ok=True)
    if tables is None:
        tables = sorted(
            t for t in os.listdir(store.root)
            if os.path.exists(os.path.join(store.root, t,
                                           "manifest.json")))
    manifest: dict = {"name": name, "created_at": time.time(),
                      "tables": {}}
    copied = reused = 0
    for t in tables:
        m = store._read_manifest(t)
        if m is None:
            raise FileNotFoundError(f"table {t!r} has no committed "
                                    "snapshot")
        paths = m.get("paths", [m["path"]])
        rels, files = [], {}
        for p in paths:
            rel = os.path.join(t, os.path.basename(p))
            pool = os.path.join(repo, "data", rel)
            if os.path.exists(pool):
                reused += 1
            else:
                tmp = pool + f".tmp-{uuid.uuid4().hex}"
                shutil.copytree(p, tmp)
                os.replace(tmp, pool)  # atomic within the pool
                copied += 1
            rels.append(rel)
            for f, sz in _walk_sizes(pool).items():
                files[os.path.join(rel, f)] = sz
        manifest["tables"][t] = {
            "snapshot": m["snapshot"],
            "paths": rels,
            "meta": m.get("meta", {}),
            "files": files,
        }
    tmp = os.path.join(repo, f".snap-{name}.json.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(repo, f"snap-{name}.json"))
    return {"tables": sorted(manifest["tables"]),
            "dirs_copied": copied, "dirs_reused": reused}


def list_snapshots(repo: str) -> list[str]:
    if not os.path.isdir(repo):
        return []
    return sorted(fn[len("snap-"):-len(".json")]
                  for fn in os.listdir(repo)
                  if fn.startswith("snap-") and fn.endswith(".json"))


def restore_snapshot(spark: SparkSession, repo: str, name: str,
                     new_root: str) -> HadoopTableStore:
    """Verify the named snapshot's files (size check — torn-copy
    detection), materialize each table under ``new_root`` and commit
    fresh per-table manifests carrying the snapshotted ``meta``.
    Returns the restored store."""
    path = os.path.join(repo, f"snap-{name}.json")
    if not os.path.exists(path):
        have = ", ".join(list_snapshots(repo)) or "<none>"
        raise FileNotFoundError(
            f"snapshot {name!r} not in {repo} (have: {have})")
    with open(path) as f:
        manifest = json.load(f)
    # verify BEFORE touching new_root: a torn pool must not produce a
    # half-restored warehouse
    for t, tm in manifest["tables"].items():
        for rel, want in tm["files"].items():
            p = os.path.join(repo, "data", rel)
            if not os.path.exists(p):
                raise ValueError(
                    f"snapshot {name!r} is corrupt: {rel} missing")
            got = os.path.getsize(p)
            if got != want:
                raise ValueError(
                    f"snapshot {name!r} is corrupt: {rel} size "
                    f"{got} != {want}")
    store = HadoopTableStore(spark, new_root)
    for t, tm in sorted(manifest["tables"].items()):
        tdir = os.path.join(new_root, t)
        os.makedirs(tdir, exist_ok=True)
        new_paths = []
        for rel in tm["paths"]:
            dst = os.path.join(tdir, os.path.basename(rel))
            if not os.path.exists(dst):
                shutil.copytree(os.path.join(repo, "data", rel), dst)
            new_paths.append(dst)
        commit = {
            "snapshot": tm["snapshot"],
            "path": new_paths[0],
            "committed_at": time.time(),
            "meta": tm["meta"],
            "restored_from": f"{repo}::{name}",
        }
        if len(new_paths) > 1:
            commit["paths"] = new_paths
        tmp = store._manifest_path(t) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(commit, f, indent=1, sort_keys=True)
        os.replace(tmp, store._manifest_path(t))
    return store


def delete_snapshot(repo: str, name: str) -> None:
    """Drop a named snapshot (one atomic manifest unlink). Pool data it
    referenced stays until :func:`prune_repository` sweeps — the ES
    split between DELETE /_snapshot/<name> and repository cleanup."""
    p = os.path.join(repo, f"snap-{name}.json")
    if not os.path.exists(p):
        raise FileNotFoundError(f"snapshot {name!r} not in {repo}")
    os.remove(p)


def retain_last(repo: str, n: int) -> list[str]:
    """The ILM retention policy: keep the ``n`` most recent snapshots
    (by manifest created_at), delete the rest. Returns deleted names
    (pool sweep is separate — call :func:`prune_repository`)."""
    if n < 1:
        raise ValueError(f"retain_last keeps >= 1 snapshot, got {n}")
    stamped = []
    for name in list_snapshots(repo):
        with open(os.path.join(repo, f"snap-{name}.json")) as f:
            stamped.append((json.load(f)["created_at"], name))
    stamped.sort(reverse=True)
    doomed = [name for _ts, name in stamped[n:]]
    for name in doomed:
        delete_snapshot(repo, name)
    return sorted(doomed)


def prune_repository(repo: str) -> dict:
    """Garbage-collect the content-addressed pool: delete every pool
    directory no remaining snapshot references (mark from ALL current
    manifests, then sweep). Refcounting is implicit in the mark —
    shared dirs survive while ANY snapshot names them.

    Single-operator assumption, stated: a create_snapshot racing a
    prune could reference a dir mid-sweep; serialize repository
    maintenance (ES requires the same via its repository lock).
    Returns {referenced, deleted, bytes_freed}."""
    data = os.path.join(repo, "data")
    if not os.path.isdir(data):
        return {"referenced": 0, "deleted": 0, "bytes_freed": 0}
    referenced: set[str] = set()
    for name in list_snapshots(repo):
        with open(os.path.join(repo, f"snap-{name}.json")) as f:
            man = json.load(f)
        for t in man["tables"].values():
            referenced.update(os.path.normpath(r) for r in t["paths"])
    deleted, freed = 0, 0
    for table in sorted(os.listdir(data)):
        tdir = os.path.join(data, table)
        if not os.path.isdir(tdir):
            continue
        for snap in sorted(os.listdir(tdir)):
            rel = os.path.normpath(os.path.join(table, snap))
            full = os.path.join(tdir, snap)
            if rel in referenced or not os.path.isdir(full):
                continue
            freed += sum(_walk_sizes(full).values())
            shutil.rmtree(full)
            deleted += 1
        if not os.listdir(tdir):
            os.rmdir(tdir)
    return {"referenced": len(referenced), "deleted": deleted,
            "bytes_freed": freed}
