"""Web-archive (WARC/WET) ingestion — the native format of web-scale
pretraining corpora (Common Crawl ships WET text extracts as
concatenated WARC 'conversion' records, gzip members per file).

The reference engine ingests line-oriented text (`from_textfile`,
streamz/sources.py); a pretraining engine additionally needs the
record-oriented crawl format. Spark-first shape:

- `spark.read.format("binaryFile")` gives one row per archive file —
  WARC records span lines and gzip members, so the FILE is the unit
  of work (exactly how every production WARC pipeline partitions:
  Common Crawl segments are ~1 GB each, one task per file; with
  100k+ files per crawl, parallelism comes from file count, not
  intra-file splits).
- An Arrow-batched `mapInPandas` parses records out of each file:
  header block (CRLF-terminated, `Content-Length` framing) + body.
  Framing by Content-Length — never by scanning for a delimiter — so
  record bodies containing 'WARC/1.0' parse correctly.
- Malformed trailing bytes / truncated records are QUARANTINED, not
  fatal: each file yields its good records plus a per-file error row
  count (`_malformed`), the standard permissive-reader contract.

Streaming twin: the same parser over `readStream.format("binaryFile")`
(file-source semantics: new archive files become micro-batches), so a
live crawl directory feeds the same downstream operators.
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_wet", "stream_wet", "wet_bytes", "WET_SCHEMA"]

WET_SCHEMA = (
    "path string, record_seq long, warc_type string, url string, "
    "warc_date string, content_length long, text string, _malformed long"
)

_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def _parse_warc_buffer(data: bytes):
    """Parse records out of one decompressed WARC buffer. Returns
    (records, malformed_count): records as (warc_type, url, date,
    content_length, text) tuples, framed by Content-Length per the
    WARC spec (never by delimiter scanning, so bodies containing
    'WARC/1.0' parse correctly); any unparseable region quarantines
    the remaining tail and bumps the malformed count."""
    pos, malformed = 0, 0
    n = len(data)
    records = []
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            malformed += 1
            break  # cannot resync without guessing — quarantine the tail
        headers = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get(b"content-length", b""))
        except ValueError:
            malformed += 1
            break
        body_start = head_end + 4
        body_end = body_start + clen
        if body_end > n:
            malformed += 1  # truncated record
            break
        records.append(
            (
                headers.get(b"warc-type", b"").decode("ascii", "replace"),
                headers.get(b"warc-target-uri", b"").decode("ascii", "replace")
                or None,
                headers.get(b"warc-date", b"").decode("ascii", "replace") or None,
                clen,
                data[body_start:body_end].decode("utf-8", "replace"),
            )
        )
        pos = body_end
    return records, malformed


def _parse_files(iterator):
    import pandas as pd

    for pdf in iterator:
        out = []
        for path, content in zip(pdf["path"], pdf["content"]):
            data = bytes(content)
            if data[:2] == b"\x1f\x8b":
                # gzip (possibly multi-member, as Common Crawl writes
                # one member per record): GzipFile reads all members
                data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
            records, malformed = _parse_warc_buffer(data)
            for seq, (wtype, url, date, clen, text) in enumerate(records):
                out.append((path, seq, wtype, url, date, clen, text, malformed))
            if not records and malformed:
                out.append((path, -1, None, None, None, 0, None, malformed))
        yield pd.DataFrame(
            out,
            columns=[
                "path",
                "record_seq",
                "warc_type",
                "url",
                "warc_date",
                "content_length",
                "text",
                "_malformed",
            ],
        )


def read_wet(
    spark: SparkSession, path: str, conversion_only: bool = True
) -> DataFrame:
    """Parse a directory/glob of WET/WARC files into one row per
    record. `conversion_only=True` keeps only `WARC-Type: conversion`
    records (the text extracts), dropping warcinfo/request/response
    bookkeeping — what a pretraining pipeline wants.

    Malformed-file sentinel rows (``record_seq == -1``, NULL
    warc_type/url/text, ``_malformed`` set) are RETAINED even under
    ``conversion_only=True`` so an entirely-unparseable archive stays
    visible for quarantine audit; downstream consumers that want text
    rows only should also filter ``record_seq >= 0``."""
    raw = spark.read.format("binaryFile").load(path)
    out = raw.select("path", "content").mapInPandas(_parse_files, WET_SCHEMA)
    if conversion_only:
        # keep the malformed-file sentinel rows (record_seq == -1) so an
        # entirely-truncated archive stays visible for quarantine audit
        out = out.filter(
            (out.warc_type == "conversion") | (out.record_seq == -1)
        )
    return out


def stream_wet(
    spark: SparkSession, path: str, conversion_only: bool = True, **options
) -> DataFrame:
    """Streaming twin of `read_wet`: new archive files arriving in the
    directory become micro-batches (Structured Streaming file source
    over binaryFile)."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .options(**options)
        .load(path)
    )
    out = raw.select("path", "content").mapInPandas(_parse_files, WET_SCHEMA)
    if conversion_only:
        out = out.filter(
            (out.warc_type == "conversion") | (out.record_seq == -1)
        )
    return out


def wet_bytes(records, gz: bool = False) -> bytes:
    """Serialize (url, date, text) triples as a WET byte buffer —
    test/example fixture writer, matching what `read_wet` parses."""
    buf = bytearray()
    for url, date, text in records:
        body = text.encode("utf-8")
        buf += b"WARC/1.0\r\n"
        buf += b"WARC-Type: conversion\r\n"
        if url is not None:
            buf += b"WARC-Target-URI: " + url.encode("ascii") + b"\r\n"
        if date is not None:
            buf += b"WARC-Date: " + date.encode("ascii") + b"\r\n"
        buf += b"Content-Length: " + str(len(body)).encode("ascii") + b"\r\n"
        buf += b"\r\n" + body + b"\r\n\r\n"
    out = bytes(buf)
    return gzip.compress(out) if gz else out
