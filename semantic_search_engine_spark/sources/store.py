"""Table storage with atomic snapshot commits (Iceberg-ready abstraction).

The engine's target storage is Iceberg (BASELINE.json: "written back to
Iceberg with per-partition lineage and checkpoint-resumable stages"). This
sandbox has no Iceberg runtime jar (SURVEY.md §7.1), so all engine code
writes through :class:`TableStore`:

* :class:`HadoopTableStore` — partitioned Parquet + a JSON manifest whose
  atomic rename provides snapshot/commit semantics (the subset of Iceberg
  the engine relies on for checkpoint-resume: atomic commit, snapshot
  isolation, read-your-committed-snapshot).
* :class:`IcebergCatalogStore` — used when an Iceberg catalog is configured
  on the session (``spark-submit --packages org.apache.iceberg:...``); maps
  the same API to real Iceberg tables (``MERGE INTO`` for upsert).

Reference analogue: the DDL bootstrap + ON CONFLICT upsert path
(``data-pipeline/database.py:19-78``, ``data_ingestion.py:224-243``).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableStore:
    """Interface. All engine stages read/write through this."""

    def read(self, table: str) -> DataFrame:
        raise NotImplementedError

    def write(self, table: str, df: DataFrame, *, partition_by=None,
              sort_within_partitions=None, meta: dict | None = None) -> dict:
        raise NotImplementedError

    def merge_by_key(self, table: str, updates: DataFrame, key: str,
                     partition_by=None,
                     extra_touched: DataFrame | None = None) -> dict:
        """Upsert ``updates`` by ``key``. ``extra_touched`` (optional):
        a frame carrying the partition column, naming partitions that
        must ALSO be rewritten even though no update lands in them —
        the escape hatch for tables whose partition column is NOT a
        pure function of the key (an updated row may have MOVED out of
        one of those partitions, leaving a stale copy there). Row-level
        stores (Iceberg MERGE) ignore it — they update by key
        regardless of file layout."""
        raise NotImplementedError

    def append(self, table: str, df: DataFrame,
               meta: dict | None = None) -> dict:
        """Append rows without rewriting existing data — commit cost is
        O(new rows), independent of table history (Iceberg: a real append
        snapshot). For unpartitioned fact/log tables (lineage)."""
        raise NotImplementedError

    def compact(self, table: str) -> dict:
        """Fold accumulated append snapshots into one (Iceberg's
        ``rewrite_data_files`` compaction). MUST be content-preserving
        and keep the table's current ``data_uuid``: compaction is a
        PHYSICAL layout change, not a logical one, so checkpoint
        fingerprints chained on the data identity stay valid across it.
        No-op on a table with nothing to fold."""
        raise NotImplementedError

    def delete_by_key(self, table: str, keys: DataFrame, key: str,
                      partition_by=None) -> dict:
        """Remove all rows whose ``key`` appears in ``keys`` (the
        ``DELETE FROM ... WHERE key IN (...)`` analogue). Same layout and
        meta-carry contract as :meth:`merge_by_key`."""
        raise NotImplementedError

    def exists(self, table: str) -> bool:
        raise NotImplementedError

    def table_meta(self, table: str) -> dict | None:
        raise NotImplementedError


class HadoopTableStore(TableStore):
    """Parquet directories + manifest JSON with atomic-rename commits.

    Layout::

        <root>/<table>/snap-<uuid>/...parquet   (immutable snapshot data)
        <root>/<table>/manifest.json            (current snapshot pointer)

    A writer stages data into a fresh ``snap-*`` dir, then renames a temp
    manifest over ``manifest.json`` — readers always see a complete
    snapshot. Old snapshots are kept (time travel for resume tests).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # snapshot-keyed DataFrame handles: spark.read.parquet fires a
        # driver-side schema/footer job per call, which the serve path
        # would otherwise pay per query (measured: 2 of 5 jobs per
        # single-query top_k). A DataFrame is an immutable plan over
        # immutable snapshot files, so reuse is safe; a new commit mints
        # a new snapshot/path list and misses the cache.
        self._read_cache: dict[str, tuple[tuple, DataFrame]] = {}
        os.makedirs(root, exist_ok=True)

    # -- internals ----------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "manifest.json")

    def _read_manifest(self, table: str) -> dict | None:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _commit(self, table: str, snap_dir: str, meta: dict | None,
                paths: list[str] | None = None) -> dict:
        manifest = {
            "snapshot": os.path.basename(snap_dir),
            "path": snap_dir,
            "committed_at": time.time(),
            "meta": meta or {},
        }
        if paths is not None:
            manifest["paths"] = paths
        prev = self._read_manifest(table)
        if prev is not None:
            manifest["parent"] = prev["snapshot"]
        tmp = self._manifest_path(table) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(table))  # atomic commit
        return manifest

    # -- API ----------------------------------------------------------------
    def exists(self, table: str) -> bool:
        return self._read_manifest(table) is not None

    def table_meta(self, table: str) -> dict | None:
        m = self._read_manifest(table)
        return m["meta"] if m else None

    def read(self, table: str) -> DataFrame:
        m = self._read_manifest(table)
        if m is None:
            raise FileNotFoundError(f"table {table!r} has no committed snapshot")
        # append commits accumulate a path list; plain writes keep one path
        paths = tuple(m.get("paths", [m["path"]]))
        key = (m["snapshot"], paths)
        hit = self._read_cache.get(table)
        if hit is not None and hit[0] == key:
            return hit[1]
        df = self.spark.read.parquet(*paths)
        self._read_cache[table] = (key, df)
        return df

    def write(self, table: str, df: DataFrame, *, partition_by=None,
              sort_within_partitions=None, meta: dict | None = None) -> dict:
        # every commit gets a fresh data identity — downstream checkpoint
        # fingerprints chain on it, so a rewrite (or merge) of this table
        # invalidates exactly the stages that consume it
        meta = dict(meta or {})
        meta.setdefault("data_uuid", uuid.uuid4().hex)
        snap = os.path.join(self._tdir(table), f"snap-{uuid.uuid4().hex[:12]}")
        w = df
        if sort_within_partitions:
            w = w.sortWithinPartitions(*sort_within_partitions)
        writer = w.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(snap)
        return self._commit(table, snap, meta)

    def merge_by_key(self, table: str, updates: DataFrame, key: str,
                     partition_by=None,
                     extra_touched: DataFrame | None = None) -> dict:
        """Copy-on-write upsert — the ``INSERT ... ON CONFLICT DO UPDATE``
        analogue (``data_ingestion.py:224-243``); Iceberg path uses
        ``MERGE INTO`` instead.

        The previous commit's meta (incl. the stage ``fingerprint``) is
        carried forward with a FRESH ``data_uuid``: the merged table is the
        post-upsert truth, so a later rerun of the producing stage with an
        unchanged config/source must SKIP (preserving the merge), while
        consumers see a new data identity and rebuild.

        ``partition_by`` re-imposes a physical layout on the merged commit
        (copy-on-write loses it otherwise); Iceberg keeps the table's
        declared layout and ignores it.

        PARTITION-PRUNED CoW (VERDICT r2 #7): when both the committed
        snapshot and the merge share a single-column layout and the
        updates carry that column, only the partition directories the
        updates touch are rewritten; every untouched directory is
        HARD-LINKED from the previous snapshot into the new one (same
        inodes — mirroring Iceberg's file-level CoW, where unchanged data
        files are referenced, not copied). Incremental ingest then pays
        |touched buckets|/P of the table rewrite instead of all of it.
        Precondition (holds for every engine DOC/TERM table): the
        partition column is a pure function of ``key`` — an update can
        then never move a row between partitions, so untouched
        directories cannot hold a stale copy of an updated key. Tables
        where that does NOT hold (IVF assignments: a changed vector
        moves lists) must pass ``extra_touched`` naming the partitions
        updated keys are moving OUT of; those directories join the
        rewrite set — still ONE atomic commit, and the anti-join on
        ``key`` inside the rewrite drops the stale copies.
        """
        if not self.exists(table):
            return self.write(table, updates, partition_by=partition_by)
        prev_meta = dict(self.table_meta(table) or {})
        prev_meta.pop("data_uuid", None)  # write() mints a fresh one
        prev_meta["merged_on"] = key
        pruned = self._merge_pruned(table, updates, key, partition_by,
                                    prev_meta, extra_touched)
        if pruned is not None:
            return pruned
        current = self.read(table)
        merged = current.join(updates.select(key), on=key,
                              how="left_anti").unionByName(updates)
        # merged must be materialized before the commit flips the pointer;
        # Spark writes eagerly inside write(), reading the *old* snapshot.
        return self.write(table, merged, meta=prev_meta,
                          partition_by=partition_by)

    def _merge_pruned(self, table: str, updates: DataFrame, key: str,
                      partition_by, prev_meta: dict,
                      extra_touched: DataFrame | None = None
                      ) -> dict | None:
        """Partition-pruned CoW merge; returns None when the layout
        preconditions don't hold (caller falls back to the full rewrite).
        """
        if not partition_by or len(partition_by) != 1:
            return None
        part_col = partition_by[0]
        if part_col not in updates.columns:
            return None
        manifest = self._read_manifest(table)
        if manifest is None or len(manifest.get(
                "paths", [manifest["path"]])) != 1:
            return None  # appended tables: no single dir to link from
        old_snap = manifest["path"]
        old_dirs = [d for d in os.listdir(old_snap)
                    if d.startswith(f"{part_col}=")]
        if not old_dirs:
            return None  # previous snapshot wasn't written with this layout
        touched = {str(r[0]) for r in
                   updates.select(part_col).distinct().collect()}
        if extra_touched is not None:
            touched |= {str(r[0]) for r in extra_touched
                        .select(part_col).distinct().collect()}
        current = self.read(table)
        merged_touched = (
            current.filter(F.col(part_col).cast("string").isin(*touched))
            .join(updates.select(key), on=key, how="left_anti")
            .unionByName(updates))
        return self._pruned_cow_commit(table, merged_touched, part_col,
                                       touched, old_snap, old_dirs,
                                       prev_meta)

    def _pruned_cow_commit(self, table: str, touched_rows: DataFrame,
                           part_col: str, touched: set, old_snap: str,
                           old_dirs: list[str], prev_meta: dict) -> dict:
        """Write only the touched partitions' rows into a fresh snapshot
        and hard-link every untouched partition dir from the old one
        (same inodes, zero data copied, old snapshot stays intact)."""
        meta = dict(prev_meta)
        meta.setdefault("data_uuid", uuid.uuid4().hex)
        snap = os.path.join(self._tdir(table),
                            f"snap-{uuid.uuid4().hex[:12]}")
        # reads the old snapshot — the manifest pointer flips after
        (touched_rows.write.mode("overwrite")
         .partitionBy(part_col).parquet(snap))
        for d in old_dirs:
            if d.split("=", 1)[1] in touched:
                continue
            src_dir, dst_dir = os.path.join(old_snap, d), \
                os.path.join(snap, d)
            os.makedirs(dst_dir, exist_ok=True)
            for f in os.listdir(src_dir):
                os.link(os.path.join(src_dir, f),
                        os.path.join(dst_dir, f))
        return self._commit(table, snap, meta)

    def delete_by_key(self, table: str, keys: DataFrame, key: str,
                      partition_by=None) -> dict:
        """Copy-on-write delete. With a single-column partition layout and
        the partition column present in ``keys``, only the partition
        directories that CONTAIN deleted keys are rewritten; the rest are
        hard-linked from the previous snapshot (same pruned-CoW shape as
        :meth:`merge_by_key`, same soundness precondition: the partition
        column is a function of the key)."""
        if not self.exists(table):
            raise FileNotFoundError(f"table {table!r} does not exist")
        prev_meta = dict(self.table_meta(table) or {})
        prev_meta.pop("data_uuid", None)
        prev_meta["deleted_on"] = key
        if partition_by and len(partition_by) == 1 \
                and partition_by[0] in keys.columns:
            part_col = partition_by[0]
            manifest = self._read_manifest(table)
            old_dirs = [] if manifest is None or len(manifest.get(
                "paths", [manifest["path"]])) != 1 else \
                [d for d in os.listdir(manifest["path"])
                 if d.startswith(f"{part_col}=")]
            if old_dirs:
                touched = {str(r[0]) for r in
                           keys.select(part_col).distinct().collect()}
                kept_touched = (
                    self.read(table)
                    .filter(F.col(part_col).cast("string")
                            .isin(*touched))
                    .join(keys.select(key), on=key, how="left_anti"))
                return self._pruned_cow_commit(
                    table, kept_touched, part_col, touched,
                    manifest["path"], old_dirs, prev_meta)
        kept = self.read(table).join(keys.select(key), on=key,
                                     how="left_anti")
        return self.write(table, kept, meta=prev_meta,
                          partition_by=partition_by)

    def append(self, table: str, df: DataFrame,
               meta: dict | None = None) -> dict:
        """O(new rows) append: the new rows land in their own snap dir and
        the manifest's path LIST grows by one — nothing existing is read
        or rewritten, so committing run N+1 costs the same as run 1
        (VERDICT r2 #6: lineage commits used to rewrite full history).
        Unpartitioned tables only (partition layouts need write())."""
        meta = dict(meta or {})
        meta.setdefault("data_uuid", uuid.uuid4().hex)
        snap = os.path.join(self._tdir(table),
                            f"snap-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(snap)
        m = self._read_manifest(table)
        prev_paths = [] if m is None else m.get("paths", [m["path"]])
        return self._commit(table, snap, meta, paths=prev_paths + [snap])

    def append_accumulated_tables(self) -> list[str]:
        """Tables whose manifest carries a multi-snapshot append path
        list — the candidates :meth:`compact` would fold. Public so
        maintenance callers (``audit_index.py --compact-logs``) never
        poke the manifest format directly."""
        out = []
        for t in sorted(os.listdir(self.root)):
            m = self._read_manifest(t)
            if m and len(m.get("paths", [m["path"]])) > 1:
                out.append(t)
        return out

    def compact(self, table: str) -> dict:
        """Fold the manifest's append path LIST back to ONE snapshot.

        After N append commits every read lists and footer-reads N
        ``snap-*`` dirs — the small-file problem at 10^6 log commits
        (ingest lineage, fetch logs). Compaction reads the accumulated
        list once and rewrites it as a single snapshot. Content-identical
        by construction, so the commit CARRIES the table's existing meta
        including ``data_uuid`` (unlike write/merge, which mint a fresh
        identity) — downstream checkpoints stay valid; the superseded
        snap dirs remain on disk for snapshot GC to sweep. No-op when
        the manifest already holds one path.

        Concurrency: this store's manifest protocol is atomic for
        READERS but assumes ONE writer per table (two concurrent
        appends already race on the path list) — run compaction in the
        same maintenance schedule as the audit, not concurrently with
        ingest. As a guard, the manifest is re-read immediately before
        the commit and a snapshot that moved underneath (an append
        landing mid-compaction) raises instead of silently dropping the
        new rows; re-run the compaction after the writer quiesces."""
        m = self._read_manifest(table)
        if m is None:
            raise FileNotFoundError(
                f"table {table!r} has no committed snapshot")
        paths = m.get("paths", [m["path"]])
        if len(paths) <= 1:
            return m
        df = self.read(table)  # the one read path (and its cache key)
        snap = os.path.join(self._tdir(table),
                            f"snap-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(snap)
        cur = self._read_manifest(table)
        if cur is None or cur["snapshot"] != m["snapshot"]:
            raise RuntimeError(
                f"table {table!r} was committed concurrently during "
                "compaction (single-writer contract); re-run after the "
                "writer quiesces")
        out = self._commit(table, snap, dict(m["meta"]), paths=[snap])
        self._read_cache.pop(table, None)  # drop the pre-compaction plan
        return out


class IcebergCatalogStore(TableStore):
    """Real Iceberg tables via a configured Spark catalog.

    Requires ``iceberg-spark-runtime`` on the classpath and a catalog, e.g.::

        spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \\
          --conf spark.sql.catalog.idx=org.apache.iceberg.spark.SparkCatalog \\
          --conf spark.sql.catalog.idx.type=hadoop \\
          --conf spark.sql.catalog.idx.warehouse=<path>

    Not exercisable in this sandbox (no jar, no network) — covered by the
    interface contract tests against HadoopTableStore instead.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "engine"):
        self.spark = spark
        self.prefix = f"{catalog}.{namespace}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.prefix}")

    def _qual(self, table: str) -> str:
        return f"{self.prefix}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._qual(table))

    def table_meta(self, table: str) -> dict | None:
        if not self.exists(table):
            return None
        props = {
            r["key"]: r["value"]
            for r in self.spark.sql(
                f"SHOW TBLPROPERTIES {self._qual(table)}").collect()
        }
        raw = props.get("engine.meta")
        return json.loads(raw) if raw else {}

    def read(self, table: str) -> DataFrame:
        return self.spark.read.table(self._qual(table))

    def write(self, table: str, df: DataFrame, *, partition_by=None,
              sort_within_partitions=None, meta: dict | None = None) -> dict:
        meta = dict(meta or {})
        meta.setdefault("data_uuid", uuid.uuid4().hex)
        w = df
        if sort_within_partitions:
            w = w.sortWithinPartitions(*sort_within_partitions)
        writer = w.writeTo(self._qual(table)).using("iceberg")
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        if meta:
            self._set_meta(table, meta)
        return {"snapshot": "iceberg", "meta": meta or {}}

    def _set_meta(self, table: str, meta: dict) -> None:
        blob = json.dumps(meta).replace("'", "''")
        self.spark.sql(
            f"ALTER TABLE {self._qual(table)} "
            f"SET TBLPROPERTIES ('engine.meta'='{blob}')")

    def merge_by_key(self, table: str, updates: DataFrame, key: str,
                     partition_by=None,
                     extra_touched: DataFrame | None = None) -> dict:
        # An EXISTING Iceberg table keeps its declared partition spec, so
        # partition_by only matters on the creation branch. extra_touched
        # is a CoW-layout concern: MERGE INTO updates matched rows by key
        # wherever their files live, so moved rows can't go stale here.
        if not self.exists(table):
            return self.write(table, updates, partition_by=partition_by)
        updates.createOrReplaceTempView("_merge_updates")
        cols = updates.columns
        sets = ", ".join(f"t.{c} = u.{c}" for c in cols if c != key)
        names = ", ".join(cols)
        vals = ", ".join(f"u.{c}" for c in cols)
        self.spark.sql(
            f"MERGE INTO {self._qual(table)} t USING _merge_updates u "
            f"ON t.{key} = u.{key} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({names}) VALUES ({vals})")
        # Same contract as HadoopTableStore.merge_by_key: carry prior meta
        # (incl. the stage fingerprint) forward under a FRESH data_uuid so
        # consumers see a new data identity and rebuild — without this the
        # merged docs would silently never reach the index (downstream
        # fingerprints would all still match and skip).
        meta = dict(self.table_meta(table) or {})
        meta["data_uuid"] = uuid.uuid4().hex
        meta["merged_on"] = key
        self._set_meta(table, meta)
        return {"snapshot": "iceberg-merge", "meta": meta}

    def delete_by_key(self, table: str, keys: DataFrame, key: str,
                      partition_by=None) -> dict:
        """Real Iceberg row-level DELETE (file-pruned by the engine)."""
        keys.select(key).createOrReplaceTempView("_delete_keys")
        self.spark.sql(
            f"DELETE FROM {self._qual(table)} "
            f"WHERE {key} IN (SELECT {key} FROM _delete_keys)")
        meta = dict(self.table_meta(table) or {})
        meta["data_uuid"] = uuid.uuid4().hex
        meta["deleted_on"] = key
        self._set_meta(table, meta)
        return {"snapshot": "iceberg-delete", "meta": meta}

    def append(self, table: str, df: DataFrame,
               meta: dict | None = None) -> dict:
        """Real Iceberg append snapshot — O(new rows) by construction."""
        meta = dict(meta or {})
        meta.setdefault("data_uuid", uuid.uuid4().hex)
        if not self.exists(table):
            return self.write(table, df, meta=meta)
        df.writeTo(self._qual(table)).append()
        self._set_meta(table, meta)
        return {"snapshot": "iceberg-append", "meta": meta}

    def compact(self, table: str) -> dict:
        """Iceberg's own compaction: ``rewrite_data_files`` bin-packs
        the accumulated small files into target-sized ones. A new
        REPLACE snapshot advances the table, but the engine meta
        (including ``data_uuid``) lives in table properties and is
        untouched — the content-preserving contract holds natively."""
        catalog = self.prefix.split(".", 1)[0]
        self.spark.sql(
            f"CALL {catalog}.system.rewrite_data_files("
            f"table => '{self._qual(table)}')")
        return {"snapshot": "iceberg-compact",
                "meta": dict(self.table_meta(table) or {})}


def make_store(spark: SparkSession, root_or_catalog: str,
               kind: str = "hadoop") -> TableStore:
    if kind == "iceberg":
        return IcebergCatalogStore(spark, root_or_catalog)
    return HadoopTableStore(spark, root_or_catalog)
