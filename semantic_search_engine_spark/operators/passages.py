"""Passage (chunk) indexing and retrieval — the RAG-era serving shape
(Elasticsearch ``inner_hits`` over nested chunks; Vespa's per-chunk
ranking; every retrieval-augmented pipeline chunks long documents before
indexing). A web page is split into fixed-size, optionally-overlapping
token windows; passages index as first-class documents through the
UNCHANGED build pipeline (one synthetic url per passage); query-time
doc-level results roll matching passages up to their parent url
(max-passage by default — the standard long-document scoring fix when
BM25's length normalization under-rewards long pages).

Design decisions, stated honestly:
- chunk boundaries live on the SAME raw token grid as the index
  tokenizer (the pre-analysis ``[a-z0-9]+`` grid of
  ``operators.spandup._tok_expr``), and the emitted passage ``text`` is
  the space-joined lowercased token stream, NOT original bytes:
  re-tokenizing it reproduces the token sequence exactly, so passage
  ranking is bit-equal to ranking the original span (per-token
  analyzers — stemming, stopwords — apply identically downstream).
  ``start_token``/``n_tokens`` locate the span on the parent's token
  grid for hydration from the stored parent doc.
- passage ids are ``{url}#p{idx}``. X76 canonicalization strips
  fragments, so ``#`` cannot occur in a canonical parent url and the
  parent is recoverable by dropping the suffix (``parent_url_expr``).
- splitting is ONE pure-JVM projection (``transform(sequence(...))`` +
  ``slice`` + ``posexplode``) — no Python, no shuffle; at 10^12 docs
  the passage table is just a wider scan of the same partitioning.
- doc-level top-k: ``exhaustive=True`` scores every matching passage
  (the correctness baseline — exact for every ``agg``);
  the default approximate mode retrieves ``k * oversample`` passages
  through the block-max WAND fast path and rolls those up — exact for
  ``agg="max"`` whenever every top-k doc has a passage in the
  retrieved pool (the classic oversample trade; a doc whose passages
  ALL rank below the cut is missed), and a lower bound for sum/avg.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spandup import _tok_expr

__all__ = ["split_passages", "passages_as_documents", "parent_url_expr",
           "doc_top_k_from_passages"]

_INGEST_COLS = ("url", "warc_ts", "html", "text", "lang")


def parent_url_expr(col) -> Column:
    """Parent url of a passage url (identity for non-passage urls)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"#p\d+$", "")


def split_passages(docs: DataFrame, max_tokens: int = 200,
                   stride: int | None = None, text_col: str = "text",
                   url_col: str = "url", max_token_len: int = 64,
                   min_token_len: int = 1) -> DataFrame:
    """(parent cols minus text/html) + (passage_url, passage_idx,
    start_token, n_tokens, text): length-``max_tokens`` token windows
    every ``stride`` tokens (default non-overlapping: stride =
    max_tokens). A doc with <= max_tokens tokens is one passage; docs
    with NULL/empty ``text_col`` yield no passages. ``stride`` must be
    in [1, max_tokens] — gaps between passages would silently drop
    content from the index."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    s = max_tokens if stride is None else stride
    if not 1 <= s <= max_tokens:
        raise ValueError(
            f"stride must be in [1, max_tokens], got {s}")
    m = max_tokens
    carry = [c for c in docs.columns if c not in (text_col, "html")]
    base = (docs.filter(F.col(text_col).isNotNull())
            .select(*carry, _tok_expr(text_col, max_token_len,
                                      min_token_len).alias("_t"))
            .filter(F.size("_t") > 0))
    n = F.size("_t")
    n_chunks = (F.when(n <= m, F.lit(1))
                .otherwise(F.ceil((n - F.lit(m))
                                  / F.lit(float(s))) + 1)).cast("int")

    def _chunk(i):
        # one-arg lambda: pyspark passes (element, index) to 2-arg ones
        start = i * F.lit(s)
        return F.struct(
            start.cast("int").alias("start_token"),
            F.least(F.lit(m), n - start).cast("int").alias("n_tokens"),
            F.array_join(F.slice("_t", start + 1, m), " ").alias("text"))

    chunks = F.transform(F.sequence(F.lit(0), n_chunks - 1), _chunk)
    out = (base.select(*carry, F.posexplode(chunks)
                       .alias("passage_idx", "_c"))
           .select(*carry, F.col("passage_idx").cast("int"),
                   F.col("_c.start_token").alias("start_token"),
                   F.col("_c.n_tokens").alias("n_tokens"),
                   F.col("_c.text").alias("text")))
    return out.withColumn(
        "passage_url",
        F.concat(F.col(url_col), F.lit("#p"),
                 F.col("passage_idx").cast("string")))


def passages_as_documents(passages: DataFrame) -> DataFrame:
    """Project a ``split_passages`` frame onto the engine ingest schema
    (url, warc_ts, html, text, lang) — the passage url becomes the
    document identity, parent metadata rides along, html is NULL (the
    text IS the extracted span; ``prefer_provided_text`` uses it
    as-is)."""
    cols = [F.col("passage_url").alias("url")]
    cols.append((F.col("warc_ts") if "warc_ts" in passages.columns
                 else F.lit(None).cast("timestamp")).alias("warc_ts"))
    cols.append(F.lit(None).cast("binary").alias("html"))
    cols.append(F.col("text"))
    cols.append((F.col("lang") if "lang" in passages.columns
                 else F.lit(None).cast("string")).alias("lang"))
    return passages.select(*cols)


def doc_top_k_from_passages(qe, query: str, k: int = 10,
                            agg: str = "max", oversample: int = 5,
                            exhaustive: bool = False) -> DataFrame:
    """Doc-level top-k over a passage index: roll passage scores up to
    the parent url. Returns (url, score, best_passage_idx,
    n_matching_passages) ordered by (score DESC, url ASC), k rows.

    ``qe`` is a QueryEngine over an index built from
    ``passages_as_documents``. ``agg``: 'max' (max-passage, default),
    'sum', or 'avg'. Exhaustive mode scores every matching passage
    (exact for all aggs); the default fast path retrieves
    ``k * oversample`` passages via WAND first (see module docstring
    for the recall trade)."""
    aggs = {"max": F.max, "sum": F.sum, "avg": F.avg}
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    if exhaustive:
        hits = qe.scores_df(query)
    else:
        hits = qe.wand_top_k_df(query, k=k * oversample)
    meta = qe.store.read(f"doc_meta{qe._sfx()}")
    if "partition_id" in hits.columns and \
            "partition_id" in meta.columns:
        # hydration pruning: hits carry their doc-range buckets, so the
        # (huge) doc_meta scan prunes to the hit buckets (cheap in
        # exhaustive mode too — it only widens to the candidate set)
        buckets = [r["partition_id"] for r in
                   hits.select("partition_id").distinct().collect()]
        meta = meta.filter(F.col("partition_id").isin(buckets))
    with_url = hits.join(meta.select("doc_id", "url"), "doc_id")
    rolled = (with_url
              .withColumn("parent_url", parent_url_expr("url"))
              .withColumn("_pidx", F.regexp_extract(
                  "url", r"#p(\d+)$", 1).cast("int"))
              .groupBy("parent_url")
              .agg(aggs[agg]("score").alias("score"),
                   F.max_by("_pidx", F.struct(
                       F.col("score"), -F.col("_pidx")))
                   .alias("best_passage_idx"),
                   F.count(F.lit(1)).alias("n_matching_passages")))
    return (rolled.select(F.col("parent_url").alias("url"), "score",
                          "best_passage_idx", "n_matching_passages")
            .orderBy(F.desc("score"), F.asc("url")).limit(k))
