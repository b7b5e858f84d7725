"""Seeded synthetic Common-Crawl-style webtext corpus (FIXTURES.md).

Produces the exact input-table shape from BASELINE.json ``input_hint``:

    documents(url: string, warc_ts: timestamp, html: binary,
              text: string, lang: string)

Deterministic (seed=42, fixed literal timestamps) — two runs produce
byte-identical parquet content. Mirrors the reference's golden-fixture
approach (``search-api/src/test/resources/test-data.sql:3-30``): a small
hand-checkable corpus with NULL/edge rows, plus a query corpus with
expectations (``docs/TESTING.md:388-400``).

Body text: ~2,000-term vocabulary with Zipfian frequencies (head-term skew
for the salting/WAND tests) + planted query-relevant phrases; log-normal doc
lengths 20–2,000 tokens (BM25 length normalization).
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass

import numpy as np

from .textproc import extract_text

SEED = 42
BASE_TS = _dt.datetime(2025, 1, 1, 0, 0, 0)

# --- vocabulary -------------------------------------------------------------
N_ZIPF_HEADS = 20
VOCAB_SIZE = 2000


def build_vocab() -> list[str]:
    heads = [f"zipfhead{i}" for i in range(N_ZIPF_HEADS)]
    tail = [f"w{i:04d}" for i in range(VOCAB_SIZE - N_ZIPF_HEADS)]
    return heads + tail


def zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = 1.0 / ranks**s
    return w / w.sum()


# --- query corpus (FIXTURES.md §3; shape from docs/TESTING.md:388-400) ------

@dataclass(frozen=True)
class PlantedQuery:
    query: str
    k: int
    expected_min_results: int  # holds at the `small` (20k-doc) scale
    interval: int              # planted into every `interval`-th doc (0 = never)


QUERY_CORPUS: list[PlantedQuery] = [
    PlantedQuery("wireless bluetooth headphones", 10, 50, 200),
    PlantedQuery("gaming laptop", 10, 30, 330),
    PlantedQuery("smartphone", 10, 100, 100),
    PlantedQuery("4k monitor", 10, 20, 500),
    PlantedQuery("mechanical keyboard", 10, 25, 400),
    PlantedQuery("waterproof bluetooth speaker", 10, 10, 990),
    PlantedQuery("zipfhead0 zipfhead1", 10, 100, 0),  # Zipf heads occur naturally
    PlantedQuery("raretermxq", 10, 1, 0),             # planted in exactly 3 fixed docs
    PlantedQuery("absentterm9z", 10, 0, 0),           # never occurs
]

RARE_TERM_DOCS = (11, 4242, 19777)  # docs that contain `raretermxq` (if < n_docs)

SCALES = {"tiny": 200, "small": 20_000, "bench": 200_000}


# --- HTML template -----------------------------------------------------------
# Realistic Common-Crawl page weight: real web pages are tens of KB of
# markup around a few KB of content. The filler lives entirely inside
# skip-content tags (script/style/nav) and empty attribute-heavy wrappers,
# so the *extracted text* is exactly the planted body — but the extractor
# has to chew through page-realistic byte volume (this is what makes the
# index build CPU-bound and its scaling measurement honest).

_SCRIPT_FILLER = (
    "(function(){var cfg={" +
    ",".join(f"k{j}:'v{j * 7919 % 104729:x}'" for j in range(420)) +
    "};window.__t=cfg;document.addEventListener('DOMContentLoaded',"
    "function(){for(var i=0;i<cfg.length;i++){console.log(cfg['k'+i]);}});"
    "})();")

_STYLE_FILLER = "".join(
    f".c{j}{{margin:{j % 17}px;padding:{j % 11}px;color:#{j * 2654435761 % 0xFFFFFF:06x};"
    f"display:flex;align-items:center}}" for j in range(260))

_NAV_FILLER = "".join(
    f'<a href="/section/{j}" class="nav-item c{j}">internal nav link {j}</a>'
    for j in range(130))

_WRAPPER_OPEN = "".join(
    f'<div class="c{j} wrapper" data-module="m{j}" data-track="{j * 31:x}">'
    for j in range(60))
_WRAPPER_CLOSE = "</div>" * 60

def render_page(i: int, title: str, para1: str, para2: str) -> str:
    """Deterministic page markup; extracted text == title/para1/para2 only."""
    return (
        f"<html><head><title>{title}</title>"
        '<meta charset="utf-8">'
        '<meta name="viewport" content="width=device-width">'
        "<style>body { margin: 0; color: #333; }" + _STYLE_FILLER + "</style>"
        f"<script>var tracker = 'do-not-index-{i}';" + _SCRIPT_FILLER +
        "</script></head><body>"
        "<nav>" + _NAV_FILLER + "</nav>" + _WRAPPER_OPEN +
        f"<h1>{title}</h1><p>{para1}</p>"
        "<nav>home products about contact boilerplate nav</nav>"
        f"<p>{para2}</p>" + _WRAPPER_CLOSE +
        "<script>" + _SCRIPT_FILLER + "</script>"
        "</body></html>")


def _edge_docs() -> dict[int, dict]:
    """Fixed edge-case rows, doc positions 0–9 at every scale (FIXTURES.md §1)."""
    dup_html = render_page(
        6, "duplicate content page",
        "identical twin body zipfhead0 w0042 w0043",
        "the twin paragraph repeats w0044").encode()
    e = {
        0: dict(html=b"", text=None, lang="en"),   # excluded by validity filter
        1: dict(  # boilerplate only → empty extraction, doc_len 0
            html=(b"<html><head><title></title><script>var x=1;</script>"
                  b"<style>.a{}</style></head><body><nav>only nav here</nav>"
                  b"</body></html>"),
            text=None, lang="en"),
        2: dict(  # entity decode determinism
            html=(b"<html><head><title>entities</title></head><body><p>"
                  b"fish &amp; chips &lt;tag&gt; don&#8217;t&nbsp;stop w0100"
                  b"</p></body></html>"),
            text=None, lang="en"),
        3: dict(  # non-ASCII round trip / byte identity
            html=("<html><head><title>unicode</title></head><body><p>"
                  "strße München 日本語 \U0001f600 "
                  "naïve w0101</p></body></html>").encode("utf-8"),
            text=None, lang="de"),
        5: dict(  # single-token doc
            html=b"<html><body><p>solitary</p></body></html>",
            text=None, lang="en"),
        6: dict(html=dup_html, text=None, lang="en"),   # dup pair: tie-break test
        7: dict(html=dup_html, text=None, lang="en"),
        8: dict(  # non-en lang holding English query terms (lang-filter test)
            html=(b"<html><body><p>wireless bluetooth headphones im angebot "
                  b"w0102 w0103</p></body></html>"),
            text=None, lang="de"),
        9: dict(  # NULL text; title carries the query terms (field handling)
            html=(b"<html><head><title>wireless bluetooth headphones gaming "
                  b"laptop smartphone</title></head><body><p>short body w0104"
                  b"</p></body></html>"),
            text=None, lang="en"),
    }
    # doc 4: very long doc (~50k tokens) — block splitting + length norm
    long_words = " ".join(f"w{(j * 7) % 1980:04d}" for j in range(50_000))
    e[4] = dict(
        html=render_page(4, "very long page", long_words,
                         "tail zipfhead0").encode(),
        text=None, lang="en")
    return e


#: docs per token-draw chunk in generate_rows — the peak-memory knob
#: (chunk tokens ≈ 180 × this, int64)
_TOKEN_CHUNK_DOCS = 4096


def generate_rows(n_docs: int, seed: int = SEED,
                  token_chunk_docs: int | None = None):
    """Yield document rows (url, warc_ts, html, text, lang), deterministic.

    Token indices are drawn per DOC-CHUNK (round-5 review): the old
    single ``rng.choice(size=total)`` call held ~180·n_docs int64 on
    the driver (≈0.7 GB at 500k docs, linear in corpus size) before
    the first row could stream — defeating write_corpus's chunked
    writer. ``Generator.choice(replace=True, p=...)`` draws its
    uniforms sequentially from the bit stream, so chunked calls
    consume the identical stream and the corpus is BIT-IDENTICAL at
    any ``token_chunk_docs`` (pinned by test_corpus_chunk_invariance).
    """
    vocab = np.array(build_vocab())
    probs = zipf_probs(len(vocab))
    rng = np.random.Generator(np.random.PCG64(seed))
    chunk_docs = int(token_chunk_docs or _TOKEN_CHUNK_DOCS)

    # per-doc lengths stay one vectorized draw (8 B/doc — 4 MB at 500k)
    lengths = np.clip(
        np.exp(rng.normal(np.log(120.0), 0.9, size=n_docs)).astype(np.int64),
        20, 2000)
    offsets = np.concatenate(([0], np.cumsum(lengths)))

    langs_cycle = ["de", "fr", "es", "nonsense"]
    edges = _edge_docs()
    tok_buf = np.empty(0, dtype=np.int64)
    buf_hi = 0    # docs [buf_lo, buf_hi) are covered by tok_buf
    buf_base = 0  # global token offset of tok_buf[0]

    for i in range(n_docs):
        if i >= buf_hi:
            # refill BEFORE the edge-doc skip: edge docs consumed token
            # draws in the single-call form too, so the stream position
            # (and with it every later doc's text) is unchanged
            hi = min(n_docs, i + chunk_docs)
            size = int(offsets[hi] - offsets[i])
            buf_base = int(offsets[i])
            tok_buf = rng.choice(len(vocab), size=size, p=probs)
            buf_hi = hi
        url = f"https://site{i % 97:04d}.example/page/{i:05d}"
        warc_ts = BASE_TS + _dt.timedelta(minutes=i)
        if i in edges:
            row = edges[i]
            yield dict(url=url, warc_ts=warc_ts, html=row["html"],
                       text=row["text"], lang=row["lang"])
            continue

        words = list(vocab[tok_buf[offsets[i] - buf_base:
                                   offsets[i + 1] - buf_base]])
        # plant query phrases at fixed intervals, with tf varied so ranking
        # is non-trivial (repeats cycle 1..3)
        for qi, pq in enumerate(QUERY_CORPUS):
            if pq.interval and i % pq.interval == (qi * 7) % max(pq.interval, 1):
                repeats = 1 + (i // pq.interval) % 3
                insert_at = (i * 31 + qi) % max(len(words), 1)
                for _ in range(repeats):
                    words[insert_at:insert_at] = pq.query.split()
        if i in RARE_TERM_DOCS:
            words.append("raretermxq")

        mid = len(words) // 2
        para1, para2 = " ".join(words[:mid]), " ".join(words[mid:])
        title = f"page {i:05d} {' '.join(words[:3])}"
        html = render_page(i, title, para1, para2).encode("utf-8")
        lang = "en" if i % 20 != 7 else langs_cycle[(i // 20) % 4]
        # 10% of rows arrive with pre-extracted text (FIXTURES.md §1)
        text = extract_text(html) if i % 10 == 5 else None
        yield dict(url=url, warc_ts=warc_ts, html=html, text=text, lang=lang)


def write_corpus(path: str, n_docs: int, seed: int = SEED) -> str:
    """Write the corpus as a single parquet file; returns the file path.

    Uses pyarrow directly so tests/oracle can build fixtures without a
    SparkSession. Idempotent: skips the write if the file already exists
    (content is deterministic).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    fpath = os.path.join(path, "documents.parquet")
    marker = os.path.join(path, f"_GENERATED_n{n_docs}_s{seed}")
    if os.path.exists(fpath) and os.path.exists(marker):
        return fpath

    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    # Streamed in bounded chunks (round 5): materializing all rows first
    # put the WHOLE corpus (~45 KB of HTML per doc — tens of GB at
    # 500k+ docs) in driver memory at once; ParquetWriter keeps the peak
    # at one chunk regardless of n_docs. Small row groups keep the
    # single file splittable: Spark parallelism on a parquet scan is
    # bounded by row-group boundaries, and the extract UDF is the most
    # expensive stage — one giant row group would serialize it.
    chunk = 2048
    gen = generate_rows(n_docs, seed)
    with pq.ParquetWriter(fpath, schema) as w:
        while True:
            rows = []
            for r in gen:
                rows.append(r)
                if len(rows) >= chunk:
                    break
            if not rows:
                break
            w.write_table(pa.Table.from_pydict(
                {c: [r[c] for r in rows] for c in schema.names},
                schema=schema), row_group_size=chunk)
    with open(marker, "w") as f:
        f.write("ok")
    return fpath
