"""WARC source — read Common Crawl's actual interchange format
(ISO 28500 / the WARC 1.0 spec; every Common Crawl segment is a
multi-member-gzip WARC of ``response`` records) straight into the
engine's document schema ``(url, warc_ts, html, text, lang)``.

The reference ingests a pre-landed table; a real crawl pipeline starts
from WARC files, so this is the missing first mile: ``read_warc``
turns a glob of ``.warc`` / ``.warc.gz`` files into the exact
DataFrame ``IndexBuilder.build`` / ``streaming_ingest`` consume
(``text``/``lang`` stay NULL — extraction and language-ID are engine
stages, X E2 / the langid operator, not reader concerns).

Plan shape: ``spark.read.format("binaryFile")`` lists and reads whole
files (one row per file — the unit Common Crawl distributes, ~1 GB
each; a 64k-file crawl is 64k tasks, perfectly parallel), then ONE
Arrow-batched ``mapInPandas`` parses records. Parsing is pure Python
byte slicing per the spec:

- a record = WARC header block (CRLF-terminated lines up to an empty
  line) + exactly ``Content-Length`` payload bytes + CRLF CRLF;
- only ``WARC-Type: response`` records yield documents (request /
  metadata / warcinfo records are skipped, as every CC consumer does);
- the payload of a response record is an HTTP response; the document
  body is everything after the HTTP header block;
- gzip is handled at BOTH granularities: whole-file gzip and the
  multi-member form CC actually ships (``gzip.decompress`` handles
  concatenated members natively).

Malformed tails (truncated final record — common in partial
downloads) stop the parse of THAT file without failing the job; the
count of parsed-vs-skipped records per file is available via
``read_warc(..., with_stats=True)``.
"""
from __future__ import annotations

import datetime
import gzip

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc", "parse_warc_bytes"]

#: the engine ingest schema (streaming/ingest.py DOCUMENT_SCHEMA) plus
#: per-file provenance
_SCHEMA = ("url string, warc_ts timestamp, html binary, text string, "
           "lang string, warc_path string")


def parse_warc_bytes(data: bytes) -> tuple[list[dict], int]:
    """Parse one WARC file's bytes; returns (response records, skipped
    count). Pure function — unit-testable without Spark."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # handles concatenated members
    out: list[dict] = []
    skipped = 0
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break  # garbage tail: stop this file, keep what we have
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload = data[hdr_end + 4:hdr_end + 4 + clen]
        if len(payload) < clen:
            break  # truncated final record
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") != "response":
            skipped += 1
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date", "")
        try:
            ts = datetime.datetime.fromisoformat(date.replace("Z", "+00:00"))
            ts = ts.replace(tzinfo=None)  # engine stores NTZ (UTC)
        except ValueError:
            ts = None
        # response payload = HTTP response; body follows its headers
        http_end = payload.find(b"\r\n\r\n")
        body = payload[http_end + 4:] if http_end >= 0 else payload
        if not url:
            skipped += 1
            continue
        out.append({"url": url, "warc_ts": ts, "html": body})
    return out, skipped


def read_warc(spark: SparkSession, path: str,
              with_stats: bool = False) -> DataFrame:
    """Documents from a WARC glob; see module docstring. With
    ``with_stats`` the result is (warc_path, n_records, n_skipped)
    instead — the ingest-audit view."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def _parse(iterator):
        import pandas as pd
        for pdf in iterator:
            rows = []
            for p, c in zip(pdf["path"], pdf["content"]):
                recs, skipped = parse_warc_bytes(bytes(c))
                if with_stats:
                    rows.append({"warc_path": p,
                                 "n_records": len(recs),
                                 "n_skipped": skipped})
                    continue
                for r in recs:
                    rows.append({"url": r["url"], "warc_ts": r["warc_ts"],
                                 "html": r["html"], "text": None,
                                 "lang": None, "warc_path": p})
            cols = (["warc_path", "n_records", "n_skipped"] if with_stats
                    else ["url", "warc_ts", "html", "text", "lang",
                          "warc_path"])
            yield pd.DataFrame(rows, columns=cols)

    schema = ("warc_path string, n_records int, n_skipped int"
              if with_stats else _SCHEMA)
    return files.mapInPandas(_parse, schema=schema)
