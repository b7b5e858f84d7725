"""Distributed index audit — the ``fsck`` for a committed inverted index.

Verifies, in a handful of bounded Spark jobs, every structural invariant
the query engine's correctness rests on:

  counts        corpus_stats.n_docs == |doc_features| == |doc_meta|,
                doc_ids distinct, total_tokens == Σ doc_len.
  meta_sync     doc_meta rows mirror doc_features (same doc_id set, same
                doc_len per doc).
  blocks        per posting block: payloads decode, n_postings/first/last
                match the decoded ids, ids strictly increase, every id
                hashes into the block's doc bucket, cf_block == Σ tf,
                block_max_tf_norm bounds every member under the CURRENT
                corpus avgdl (the WAND pruning soundness invariant).
  block_chain   per (term, partition): consecutive blocks don't overlap
                (last_doc_id < next first_doc_id) — checked JVM-side from
                the block metadata columns alone, no decode.
  term_stats    df == Σ n_postings and cf == Σ cf_block per term, and the
                same term set on both sides.
  tf_conserve   Σ tf over a doc's postings == its doc_len (tokens are
                neither dropped nor double-counted between the tf map and
                the encoded blocks).
  config        the persisted engine_config parses (and matches the
                auditor's, when one is bound).

Why this exists: at 10^12 docs an index is maintained incrementally
(merges, deletes, carried buckets, layout migrations) — a torn write or a
buggy maintenance path corrupts SILENTLY until a query returns wrong
results. The reference stack gets this for free from Postgres page
checksums + amcheck (``btree_check``); a lakehouse index needs its own.

Scale shape: ``blocks``/``tf_conserve`` decode the postings payloads —
one O(index) Arrow-batched pass (the same ``decode_postings`` kernel the
exhaustive scorer uses), partition-pruned to ``sample_buckets`` when a
full sweep is too expensive (audit a rotating bucket subset per day).
Everything else is metadata-column aggregation: column-pruned scans that
never touch the payload bytes.

Reference parity anchor: ``database.py:19-78`` bootstraps the schema the
reference trusts Postgres to keep consistent; this module is the
explicit, distributed statement of those same invariants.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import EngineConfig
from ..functions.varbyte import decode_varbyte, delta_decode, tf_norm
from ..sources.store import TableStore

AUDIT_SCHEMA = ("check string, ok boolean, expected string, "
                "actual string, detail string")

#: violation categories counted inside the block-decode pass
_BLOCK_SCHEMA = ("bad_decode long, bad_counts long, bad_bounds long, "
                 "bad_order long, bad_bucket long, bad_cf long, "
                 "bad_blockmax long, n_blocks long")


def _make_block_checker(avgdl: float, k1: float, b: float,
                        n_doc_buckets: int):
    """mapInPandas kernel: decode every block row, count violations per
    category. Output is one tiny count row per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            c = dict(bad_decode=0, bad_counts=0, bad_bounds=0,
                     bad_order=0, bad_bucket=0, bad_cf=0,
                     bad_blockmax=0, n_blocks=len(pdf))
            for row in pdf.itertuples(index=False):
                try:
                    ids = delta_decode(decode_varbyte(row.doc_ids_vb))
                    tfs = decode_varbyte(row.tfs_vb)
                    dls = decode_varbyte(row.dls_vb)
                except Exception:
                    c["bad_decode"] += 1
                    continue
                n = int(row.n_postings)
                if not (len(ids) == len(tfs) == len(dls) == n and n > 0):
                    c["bad_counts"] += 1
                    continue
                if (int(ids[0]) != int(row.first_doc_id)
                        or int(ids[-1]) != int(row.last_doc_id)):
                    c["bad_bounds"] += 1
                if n > 1 and not (np.diff(ids.astype(np.int64)) > 0).all():
                    c["bad_order"] += 1
                # same bucketing rule as the build (doc_bucket_expr):
                # RANGE bucket over the 60-bit id space, integer div
                divisor = (1 << 60) // n_doc_buckets + 1
                buckets = ids.astype(np.int64) // divisor
                if not (buckets == int(row.partition_id)).all():
                    c["bad_bucket"] += 1
                if int(tfs.sum()) != int(row.cf_block):
                    c["bad_cf"] += 1
                tn = tf_norm(tfs.astype(np.float64),
                             dls.astype(np.float64), avgdl, k1, b)
                # soundness: the stored max must bound every member
                # (strictly required by WAND pruning); 1 ulp of slack
                if float(tn.max()) > float(row.block_max_tf_norm) * (
                        1 + 1e-12) + 1e-300:
                    c["bad_blockmax"] += 1
            yield pd.DataFrame([c])

    return run


def _decode_tf_tolerant(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
    """mapInPandas: block rows → (doc_id, tf) rows, skipping blocks that
    fail to decode or whose streams disagree in length (corruption-
    tolerant — those blocks are reported by the ``blocks`` check)."""
    for pdf in batches:
        ids_all, tfs_all = [], []
        for dvb, tvb in zip(pdf["doc_ids_vb"], pdf["tfs_vb"]):
            try:
                ids = delta_decode(decode_varbyte(bytes(dvb)))
                tfs = decode_varbyte(bytes(tvb))
            except Exception:
                continue
            if len(ids) != len(tfs):
                continue
            ids_all.append(ids.astype(np.int64))
            tfs_all.append(tfs.astype(np.int64))
        if ids_all:
            yield pd.DataFrame({"doc_id": np.concatenate(ids_all),
                                "tf": np.concatenate(tfs_all)})


def audit_index(spark: SparkSession, store: TableStore,
                cfg: EngineConfig | None = None, field: str = "text",
                sample_buckets: list[int] | None = None) -> DataFrame:
    """Run every audit check; return the report as a DataFrame
    (check, ok, expected, actual, detail). ``sample_buckets`` restricts
    the two payload-decoding checks (``blocks``, ``tf_conserve``) to a
    doc-bucket subset; metadata checks always run corpus-wide."""
    sfx = "" if field == "text" else f"_{field}"
    rows: list[tuple] = []

    def add(check: str, ok: bool, expected, actual, detail: str = ""):
        rows.append((check, bool(ok), str(expected), str(actual), detail))

    # -- config -----------------------------------------------------------
    persisted = None
    try:
        persisted = json.loads(
            store.read(f"engine_config{sfx}").collect()[0]["config_json"])
        if cfg is not None:
            import dataclasses
            mine = dataclasses.asdict(cfg)
            diff = sorted(k for k in mine if persisted.get(k) != mine[k])
            add("config", not diff, "persisted == bound config",
                "match" if not diff else f"differs on {diff}")
        else:
            add("config", True, "parses", "parses")
    except Exception as e:  # missing/corrupt config table
        add("config", False, "parses", f"error: {e}")
    eff = EngineConfig(**persisted) if persisted else (cfg
                                                       or EngineConfig())

    feats = store.read(f"doc_features{sfx}")
    meta = store.read(f"doc_meta{sfx}")
    cs = store.read(f"corpus_stats{sfx}").collect()[0]
    postings = store.read(f"postings{sfx}")

    # -- counts -----------------------------------------------------------
    agg = feats.agg(F.count(F.lit(1)).alias("n"),
                    F.countDistinct("doc_id").alias("nd"),
                    F.sum("doc_len").alias("tt")).collect()[0]
    n_meta = meta.count()
    add("counts.n_docs",
        int(cs["n_docs"]) == int(agg["n"]) == n_meta,
        f"corpus_stats.n_docs={int(cs['n_docs'])}",
        f"doc_features={int(agg['n'])}, doc_meta={n_meta}")
    add("counts.doc_id_distinct", int(agg["nd"]) == int(agg["n"]),
        int(agg["n"]), int(agg["nd"]), "doc_id hash collisions if unequal")
    add("counts.total_tokens",
        int(cs["total_tokens"] or 0) == int(agg["tt"] or 0),
        int(cs["total_tokens"] or 0), int(agg["tt"] or 0))

    # -- meta_sync ---------------------------------------------------------
    f_side = feats.select("doc_id", F.col("doc_len").alias("f_dl"))
    m_side = meta.select("doc_id", F.col("doc_len").alias("m_dl"))
    sync = (f_side.join(m_side, "doc_id", "full")
            .agg(F.sum(F.when(F.col("f_dl").isNull()
                              | F.col("m_dl").isNull()
                              | (F.col("f_dl") != F.col("m_dl")), 1)
                       .otherwise(0)).alias("bad")).collect()[0])
    add("meta_sync", int(sync["bad"] or 0) == 0, 0, int(sync["bad"] or 0),
        "docs missing from one side or with diverging doc_len")

    # -- block_chain (metadata-only, corpus-wide) --------------------------
    w = Window.partitionBy("term", "partition_id").orderBy("block_id")
    chain = (postings
             .select("term", "partition_id", "block_id",
                     "first_doc_id", "last_doc_id")
             .withColumn("prev_last", F.lag("last_doc_id").over(w))
             .withColumn("prev_bid", F.lag("block_id").over(w))
             .agg(F.sum(F.when(F.col("prev_last").isNotNull()
                               & ((F.col("first_doc_id")
                                   <= F.col("prev_last"))
                                  | (F.col("block_id")
                                     != F.col("prev_bid") + 1)), 1)
                        .otherwise(0)).alias("bad")).collect()[0])
    add("block_chain", int(chain["bad"] or 0) == 0, 0,
        int(chain["bad"] or 0),
        "overlapping doc ranges or non-contiguous block_ids")

    # -- term_stats (metadata-only, corpus-wide) ---------------------------
    from_blocks = (postings.groupBy("term")
                   .agg(F.sum("n_postings").alias("df_b"),
                        F.sum("cf_block").alias("cf_b")))
    ts = store.read(f"term_stats{sfx}").select("term", "df", "cf")
    tmis = (from_blocks.join(ts, "term", "full")
            .agg(F.sum(F.when(F.col("df").isNull()
                              | F.col("df_b").isNull()
                              | (F.col("df") != F.col("df_b"))
                              | (F.col("cf") != F.col("cf_b")), 1)
                       .otherwise(0)).alias("bad")).collect()[0])
    add("term_stats", int(tmis["bad"] or 0) == 0, 0, int(tmis["bad"] or 0),
        "terms whose df/cf disagree with the posting blocks")

    # -- blocks (payload decode; sampled) -----------------------------------
    pscan = postings
    fscan = feats
    scope = "all buckets"
    if sample_buckets is not None:
        sb = [int(x) for x in sample_buckets]
        pscan = pscan.filter(F.col("partition_id").isin(sb))
        fscan = fscan.filter(F.col("partition_id").isin(sb))
        scope = f"buckets {sb}"
    avgdl = float(cs["avg_doc_len"] or 0.0)
    checker = _make_block_checker(avgdl, float(eff.k1), float(eff.b),
                                  int(eff.n_doc_buckets))
    bc = (pscan.select("partition_id", "n_postings", "first_doc_id",
                       "last_doc_id", "doc_ids_vb", "tfs_vb", "dls_vb",
                       "cf_block", "block_max_tf_norm")
          .mapInPandas(checker, schema=_BLOCK_SCHEMA)
          .agg(*[F.sum(c).alias(c) for c in
                 ("bad_decode", "bad_counts", "bad_bounds", "bad_order",
                  "bad_bucket", "bad_cf", "bad_blockmax", "n_blocks")])
          .collect()[0])
    bad_total = sum(int(bc[c] or 0) for c in
                    ("bad_decode", "bad_counts", "bad_bounds", "bad_order",
                     "bad_bucket", "bad_cf", "bad_blockmax"))
    add("blocks", bad_total == 0, 0, bad_total,
        f"{scope}; n_blocks={int(bc['n_blocks'] or 0)}; "
        + ", ".join(f"{c}={int(bc[c] or 0)}" for c in
                    ("bad_decode", "bad_counts", "bad_bounds",
                     "bad_order", "bad_bucket", "bad_cf",
                     "bad_blockmax")))

    # -- tf_conserve (payload decode; sampled) ------------------------------
    # NOT the query path's decode_postings: an fsck must survive the very
    # corruption it reports, so undecodable/inconsistent blocks are
    # skipped here (the `blocks` check above already counts them; their
    # docs then surface as tf mismatches, which is the honest signal).
    per_doc = (pscan.select("doc_ids_vb", "tfs_vb")
               .mapInPandas(_decode_tf_tolerant, schema="doc_id long, tf long")
               .groupBy("doc_id").agg(F.sum("tf").alias("tf_sum")))
    tc = (fscan.select("doc_id", "doc_len")
          .join(per_doc, "doc_id", "full")
          .agg(F.sum(F.when(
              F.coalesce("tf_sum", F.lit(0))
              != F.coalesce("doc_len", F.lit(-1)), 1).otherwise(0))
              .alias("bad"),
              # doc_len 0 docs legitimately have no postings (they pass
              # the check above via coalesce(tf_sum, 0) == 0) — reported
              # for context only
              F.sum(F.when(F.col("tf_sum").isNull()
                           & (F.col("doc_len") == 0), 1).otherwise(0))
              .alias("empty")).collect()[0])
    bad_tc = int(tc["bad"] or 0)
    add("tf_conserve", bad_tc == 0, 0, bad_tc,
        f"{scope}; docs whose Σtf != doc_len "
        f"(docs with empty tf maps: {int(tc['empty'] or 0)})")

    return spark.createDataFrame(rows, AUDIT_SCHEMA)


def audit_report(spark: SparkSession, store: TableStore,
                 cfg: EngineConfig | None = None, field: str = "text",
                 sample_buckets: list[int] | None = None) -> dict:
    """Materialized audit: {"ok": bool, "checks": [...]} — the CLI/ops
    envelope."""
    rows = [r.asDict() for r in
            audit_index(spark, store, cfg=cfg, field=field,
                        sample_buckets=sample_buckets).collect()]
    return {"ok": all(r["ok"] for r in rows), "checks": rows}
