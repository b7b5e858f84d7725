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
import io
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_warc", "parse_warc_bytes", "wet_record_bytes",
           "write_wet"]

#: the engine ingest schema (streaming/ingest.py DOCUMENT_SCHEMA) plus
#: per-file provenance
_SCHEMA = ("url string, warc_ts timestamp, html binary, text string, "
           "lang string, warc_path string")


def parse_warc_bytes(data: bytes, record_types: tuple[str, ...] =
                     ("response",)) -> tuple[list[dict], int]:
    """Parse one WARC file's bytes; returns (records of the requested
    WARC-Types, skipped count). ``response`` records carry an HTTP
    payload (headers stripped); ``conversion`` records (WET extracted
    text) carry the body directly. Pure function — unit-testable
    without Spark."""
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
        rtype = headers.get("warc-type")
        if rtype not in record_types:
            skipped += 1
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date", "")
        try:
            ts = datetime.datetime.fromisoformat(date.replace("Z", "+00:00"))
            ts = ts.replace(tzinfo=None)  # engine stores NTZ (UTC)
        except ValueError:
            ts = None
        if rtype == "response":
            # response payload = HTTP response; body follows its headers
            http_end = payload.find(b"\r\n\r\n")
            body = payload[http_end + 4:] if http_end >= 0 else payload
        else:
            body = payload  # conversion/WET: payload IS the body
        if not url:
            skipped += 1
            continue
        out.append({"url": url, "warc_ts": ts, "html": body,
                    "rtype": rtype})
    return out, skipped


def read_warc(spark: SparkSession, path: str, with_stats: bool = False,
              record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Documents from a WARC glob; see module docstring. With
    ``with_stats`` the result is (warc_path, n_records, n_skipped)
    instead — the ingest-audit view. ``record_types=("conversion",)``
    reads WET files: the extracted-text payload lands in ``text``
    (utf-8) with ``html`` NULL, so a WET corpus feeds the build's
    pre-extracted path directly."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def _parse(iterator):
        import pandas as pd
        for pdf in iterator:
            rows = []
            for p, c in zip(pdf["path"], pdf["content"]):
                recs, skipped = parse_warc_bytes(bytes(c), record_types)
                if with_stats:
                    rows.append({"warc_path": p,
                                 "n_records": len(recs),
                                 "n_skipped": skipped})
                    continue
                for r in recs:
                    conv = r["rtype"] != "response"
                    rows.append({"url": r["url"], "warc_ts": r["warc_ts"],
                                 "html": None if conv else r["html"],
                                 "text": (r["html"].decode("utf-8",
                                                           "replace")
                                          if conv else None),
                                 "lang": None, "warc_path": p})
            cols = (["warc_path", "n_records", "n_skipped"] if with_stats
                    else ["url", "warc_ts", "html", "text", "lang",
                          "warc_path"])
            yield pd.DataFrame(rows, columns=cols)

    schema = ("warc_path string, n_records int, n_skipped int"
              if with_stats else _SCHEMA)
    return files.mapInPandas(_parse, schema=schema)


# ---------------------------------------------------------------------------
# WET writer — the other half of the interchange cycle: export an
# extracted-text corpus as Common-Crawl-style WET files (WARC 1.0
# ``conversion`` records, one gzip member per record exactly as CC
# ships them, so range readers and `read_warc` both consume the
# output). Deterministic: record ids are uuid5(url|ts) and gzip
# members carry mtime=0, so the same frame always serializes to the
# same bytes — the property every resume/audit story in this engine
# leans on.

_WET_NS = uuid.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 URL ns


def _gzip_member(raw: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("utf-8") for k, v in headers)
    return (head + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n")


def wet_record_bytes(url: str, ts, text: str) -> bytes:
    """One uncompressed WET ``conversion`` record. Pure function."""
    payload = (text or "").encode("utf-8")
    date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None
            else "1970-01-01T00:00:00Z")
    rid = uuid.uuid5(_WET_NS, f"{url}|{date}")
    return _record([
        ("WARC-Type", "conversion"),
        ("WARC-Target-URI", url),
        ("WARC-Date", date),
        ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
        ("Content-Type", "text/plain"),
    ], payload)


def _warcinfo_bytes(filename: str) -> bytes:
    payload = (b"software: spark-fulltext wet-writer\r\n"
               b"format: WARC File Format 1.0\r\n")
    rid = uuid.uuid5(_WET_NS, f"warcinfo|{filename}")
    return _record([
        ("WARC-Type", "warcinfo"),
        ("WARC-Filename", filename),
        ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
        ("Content-Type", "application/warc-fields"),
    ], payload)


def write_wet(df: DataFrame, out_dir: str, url_col: str = "url",
              ts_col: str = "warc_ts", text_col: str = "text"
              ) -> list[tuple[str, int]]:
    """Write ``df`` as ``part-NNNNN.warc.wet.gz`` under ``out_dir``
    (one file per partition, one warcinfo header record each). Returns
    the audit list [(file, n_records)] — one row per partition, a
    bounded driver collect. Executors write to ``out_dir`` directly,
    so at cluster scale it must be shared storage (HDFS/S3 via a
    mounted path); in local mode any directory works. Repartition the
    frame first to choose the file count/size (CC ships ~150 MB WET
    files)."""
    import glob
    import os

    os.makedirs(out_dir, exist_ok=True)
    # clear prior exports: a re-export with FEWER partitions would
    # otherwise leave stale part-NNNNN files mixed into the directory,
    # and read_warc(out_dir) round-trips the directory, not this run
    for stale in glob.glob(os.path.join(out_dir, "part-*.warc.wet.gz")):
        os.remove(stale)
    for stale in glob.glob(os.path.join(out_dir, "*.inprogress")):
        os.remove(stale)
    slim = df.select(F.col(url_col).alias("url"),
                     F.col(ts_col).alias("ts"),
                     F.col(text_col).alias("text"))

    def _write(iterator):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}.warc.wet.gz"
        path = os.path.join(out_dir, name)
        n = 0
        tmp = path + ".inprogress"
        with open(tmp, "wb") as fh:
            fh.write(_gzip_member(_warcinfo_bytes(name)))
            for pdf in iterator:
                for url, ts, text in zip(pdf["url"], pdf["ts"],
                                         pdf["text"]):
                    if url is None:
                        continue
                    ts_py = None if pd.isnull(ts) else ts.to_pydatetime()
                    fh.write(_gzip_member(
                        wet_record_bytes(url, ts_py, text)))
                    n += 1
        os.replace(tmp, path)  # atomic publish, no torn files
        yield pd.DataFrame({"wet_path": [path], "n_records": [n]})

    audit = slim.mapInPandas(_write, schema="wet_path string, "
                                            "n_records long").collect()
    return sorted((r.wet_path, r.n_records) for r in audit)
