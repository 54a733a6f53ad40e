"""WARC source/sink (ISO 28500) — the interchange format of web-scale
crawling (Common Crawl, Internet Archive). Stdlib-only: gzip + manual
record framing; the reference stores pages in SQLite+JSON, a production
deployment of this engine exchanges the same rows as WARC.

Format notes (public spec, ISO 28500 / WARC 1.1):
- a ``.warc.gz`` is a sequence of INDEPENDENTLY gzipped records
  (one gzip member per record) so readers can split on member
  boundaries; we write exactly that shape.
- each record: header block (``WARC/1.1`` + named headers), CRLF CRLF,
  payload, CRLF CRLF.
- record identity: ``WARC-Record-ID`` is a urn:uuid — derived here
  deterministically from the URL (uuid5) so round-trips and replays are
  byte-stable (no wall clock, no randomness in the data path).

Scale shape:
- **write**: one ``.warc.gz`` per partition via ``mapInPandas`` (writers
  run on executors; the driver only collects the tiny per-file manifest
  rows). Repartition upstream to size files (~1 GB is the Common Crawl
  convention).
- **read**: ``binaryFile`` source (one row per file, whole-file bytes) →
  ``mapInPandas`` member-split + parse. Per-FILE parallelism — the same
  contract as every public Spark WARC pipeline; at 100 TB the unit of
  work is the ~1 GB segment file, thousands of them.
"""

from __future__ import annotations

import gzip
import io
import uuid
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

# fixed timestamp for determinism (callers may override per write)
_WARC_DATE = "2025-07-01T00:00:00Z"
_URN_NS = uuid.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 URL ns


def record_id(url: str) -> str:
    """Deterministic urn:uuid for a URL (uuid5 in the RFC 4122 URL
    namespace) — stable across writes, so replayed exports are
    byte-identical."""
    return f"<urn:uuid:{uuid.uuid5(_URN_NS, url)}>"


def _safe_uri(url: str) -> str:
    """WARC headers are CRLF-framed: a crawled URL containing control
    characters could otherwise terminate the header line early and forge
    arbitrary WARC headers in the archive. Percent-encode ASCII controls
    (incl. CR/LF) — and ONLY those: operating on characters (not UTF-8
    bytes) keeps non-ASCII URLs intact, since the header block is UTF-8
    encoded exactly once downstream."""
    return "".join(
        f"%{ord(c):02X}" if ord(c) < 0x21 or ord(c) == 0x7F else c
        for c in url
    )


def _encode_record(url: str, payload: bytes, warc_date: str) -> bytes:
    url = _safe_uri(url)
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Record-ID: {record_id(url)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    # one gzip member per record (the .warc.gz splittability contract)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(head + payload + b"\r\n\r\n")
    return buf.getvalue()


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    payload_col: str = "html",
    warc_date: str = _WARC_DATE,
    with_index: bool = False,
) -> DataFrame:
    """Export (url, payload) rows as one ``.warc.gz`` file per partition.
    Executors write their own files (no driver funnel); returns the
    manifest DataFrame (file, n_records, n_bytes) — metadata-sized, one
    row per written file. Rows are written in (url) order within a file
    for deterministic bytes.

    ``with_index=True`` returns a CDX-style RECORD index instead — one
    row per record (url, file, offset, length): because every record is
    its own gzip member, (offset, length) is a byte range any reader can
    fetch and inflate independently (``read_warc_record``) — random
    access into petabyte archives without scanning segments, the same
    contract as Common Crawl's CDX index."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    if with_index:
        out_schema = T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("file", T.StringType()),
                T.StructField("offset", T.LongType()),
                T.StructField("length", T.LongType()),
            ]
        )
    else:
        out_schema = T.StructType(
            [
                T.StructField("file", T.StringType()),
                T.StructField("n_records", T.LongType()),
                T.StructField("n_bytes", T.LongType()),
            ]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        n = total = 0
        idx_urls: list[str] = []
        idx_off: list[int] = []
        idx_len: list[int] = []
        with open(path, "wb") as f:
            # rows arrive url-sorted across ALL Arrow batches (the
            # sortWithinPartitions below) — a per-batch sort here would
            # silently break file-level ordering (and the CDX/byte-replay
            # contract) once a partition spans >1 Arrow batch
            for pdf in batches:
                for url, payload in zip(pdf[url_col], pdf[payload_col]):
                    if payload is None:
                        continue
                    rec = _encode_record(url, bytes(payload), warc_date)
                    if with_index:
                        idx_urls.append(url)
                        idx_off.append(total)
                        idx_len.append(len(rec))
                    f.write(rec)
                    n += 1
                    total += len(rec)
        if n == 0:
            os.unlink(path)  # no empty segment files
            yield pd.DataFrame({c.name: [] for c in out_schema.fields})
            return
        if with_index:
            yield pd.DataFrame(
                {
                    "url": idx_urls,
                    "file": path,
                    "offset": idx_off,
                    "length": idx_len,
                }
            )
        else:
            yield pd.DataFrame(
                {"file": [path], "n_records": [n], "n_bytes": [total]}
            )

    return (
        df.select(url_col, payload_col)
        # partition-wide external sort (spill-aware, not per-Arrow-batch)
        # so each segment file is globally url-ordered → deterministic
        # bytes and stable CDX offsets at any partition size
        .sortWithinPartitions(url_col)
        .mapInPandas(run, out_schema)
    )


def read_warc_record(file: str, offset: int, length: int) -> tuple[str, bytes]:
    """Random access: fetch one record by its CDX (file, offset, length)
    byte range — seek, read, inflate one gzip member, parse. Never scans
    the segment."""
    with open(file, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    recs = _parse_members(blob)
    if not recs:
        raise ValueError(f"no response record at {file}:{offset}+{length}")
    url, _date, _rid, payload = recs[0]
    return url, payload


def _parse_members(blob: bytes) -> list[tuple[str, str, str, bytes]]:
    """Split a multi-member .warc.gz blob and parse each response record →
    (url, date, record_id, payload)."""
    out = []
    stream = io.BytesIO(blob)
    while True:
        start = stream.tell()
        if start >= len(blob):
            break
        try:
            with gzip.GzipFile(fileobj=stream) as gz:
                raw = gz.read()
            # GzipFile may over-read into its buffer; re-seek to the true
            # member end it reports
            stream.seek(start + _member_len(blob, start))
        except (OSError, EOFError):
            break
        sep = raw.find(b"\r\n\r\n")
        if sep < 0:
            continue
        headers = {}
        for line in raw[:sep].decode("utf-8", "replace").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "-1"))
        except ValueError:
            clen = -1
        body = raw[sep + 4 :]
        payload = body[:clen] if clen >= 0 else body.rstrip(b"\r\n")
        if headers.get("warc-type") != "response":
            continue
        out.append(
            (
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                headers.get("warc-record-id", ""),
                payload,
            )
        )
    return out


def _member_len(blob: bytes, start: int) -> int:
    """Length of the gzip member starting at ``start`` (decompress with a
    raw zlib stream to find the member boundary)."""
    import zlib

    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    d.decompress(blob[start:])
    return len(blob) - start - len(d.unused_data)


WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of ``.warc.gz`` segment files into (url, warc_date,
    record_id, html) rows. Per-file parallelism (binaryFile source); the
    member split + header parse runs in Arrow-batched executors."""
    files = spark.read.format("binaryFile").load(
        path.rstrip("/") + "/*.warc.gz"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, dates, rids, payloads = [], [], [], []
            for blob in pdf["content"]:
                for url, date, rid, payload in _parse_members(bytes(blob)):
                    urls.append(url)
                    dates.append(date)
                    rids.append(rid)
                    payloads.append(payload)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_date": dates,
                    "record_id": rids,
                    "html": payloads,
                }
            )

    return files.select("content").mapInPandas(run, WARC_SCHEMA)
