"""WET/WARC ingestion (streamz_spark.formats).

Round-trip strategy: serialize rows of the documents table as WET
archives (plain + gzip + multi-member gzip), read them back through
the distributed parser, and require exact text/url recovery; plus the
framing edge cases a delimiter-scanning parser gets wrong (bodies
containing 'WARC/1.0', non-conversion records, truncated tails), and
the streaming twin fed file-by-file.
"""

from __future__ import annotations

import gzip
import os

import pandas as pd
import pytest

from streamz_spark.formats import read_wet, stream_wet, wet_bytes
from streamz_spark.io import load_table
from streamz_spark.streaming.sinks import sink_to_list

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def wet_dir(spark, tmp_path_factory):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    tmp = tmp_path_factory.mktemp("wet")
    n_files = 4
    expected = []
    for i in range(n_files):
        part = docs[docs.doc_id % n_files == i]
        recs = [
            (f"http://example.test/doc/{r.doc_id}", "2026-01-01T00:00:00Z", r.text)
            for r in part.itertuples()
        ]
        expected.extend(recs)
        # file 0 plain, file 1 single-member gzip, file 2 one gzip
        # member PER RECORD (Common Crawl's actual layout), file 3 plain
        if i == 2:
            data = b"".join(wet_bytes([r], gz=True) for r in recs)
        else:
            data = wet_bytes(recs, gz=(i == 1))
        ext = ".warc.wet.gz" if i in (1, 2) else ".warc.wet"
        (tmp / f"part-{i:05d}{ext}").write_bytes(data)
    return str(tmp), pd.DataFrame(expected, columns=["url", "warc_date", "text"])


def test_wet_roundtrip_exact(spark, wet_dir):
    path, want = wet_dir
    got = (
        read_wet(spark, path)
        .select("url", "warc_date", "text")
        .toPandas()
    )
    g = got.sort_values(["url"], ignore_index=True)
    w = want.sort_values(["url"], ignore_index=True)
    assert len(g) == len(w)
    assert g["text"].tolist() == w["text"].tolist()
    assert g["warc_date"].tolist() == w["warc_date"].tolist()


def test_wet_content_length_framing(spark, tmp_path):
    # a body that CONTAINS a record header — delimiter scanning would
    # split it; Content-Length framing must not
    tricky = "prefix\r\nWARC/1.0\r\nWARC-Type: conversion\r\n\r\nfake body"
    data = wet_bytes([("http://a", None, tricky), ("http://b", None, "plain")])
    p = tmp_path / "t.warc.wet"
    p.write_bytes(data)
    got = read_wet(spark, str(p)).orderBy("record_seq").collect()
    assert [r["url"] for r in got] == ["http://a", "http://b"]
    assert got[0]["text"] == tricky
    assert all(r["_malformed"] == 0 for r in got)


def test_wet_non_conversion_filtered(spark, tmp_path):
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nmeta\r\n\r\n"
    )
    data = info + wet_bytes([("http://x", None, "body")])
    p = tmp_path / "w.warc.wet"
    p.write_bytes(data)
    got = read_wet(spark, str(p)).collect()
    assert [r["url"] for r in got] == ["http://x"]
    both = read_wet(spark, str(p), conversion_only=False).collect()
    assert sorted(r["warc_type"] for r in both) == ["conversion", "warcinfo"]


def test_wet_truncated_tail_quarantined(spark, tmp_path):
    good = wet_bytes([("http://ok", None, "fine")])
    truncated = b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 999\r\n\r\nshort"
    (tmp_path / "x.warc.wet").write_bytes(good + truncated)
    got = read_wet(spark, str(tmp_path / "x.warc.wet")).collect()
    assert [r["url"] for r in got] == ["http://ok"]
    assert got[0]["_malformed"] == 1  # quarantined, not fatal


def test_wet_garbage_only_file_yields_error_row(spark, tmp_path):
    (tmp_path / "g.warc.wet").write_bytes(b"this is not a warc file")
    got = read_wet(spark, str(tmp_path / "g.warc.wet"), conversion_only=False).collect()
    assert len(got) == 1
    assert got[0]["record_seq"] == -1 and got[0]["_malformed"] == 1


def test_wet_sentinel_survives_conversion_only(spark, tmp_path):
    # the malformed-file sentinel (record_seq == -1) must survive the
    # DEFAULT conversion_only=True path — an entirely-unparseable
    # archive stays visible for quarantine audit (ADVICE round 7)
    (tmp_path / "bad.warc.wet").write_bytes(b"not a warc file at all")
    good = wet_bytes([("http://ok", None, "fine")])
    (tmp_path / "ok.warc.wet").write_bytes(good)
    got = read_wet(spark, str(tmp_path)).collect()  # conversion_only default
    by_seq = sorted(got, key=lambda r: r["record_seq"])
    assert [r["record_seq"] for r in by_seq] == [-1, 0]
    sentinel = by_seq[0]
    assert sentinel["_malformed"] == 1
    assert sentinel["warc_type"] is None and sentinel["text"] is None
    assert by_seq[1]["url"] == "http://ok"


def test_wet_stream_equals_batch(spark, wet_dir):
    path, _ = wet_dir
    batch = (
        read_wet(spark, path)
        .select("url", "text")
        .toPandas()
        .sort_values("url", ignore_index=True)
    )
    stream = stream_wet(
        spark, os.path.join(path, "*"), maxFilesPerTrigger=1
    ).select("url", "text")
    got = (
        pd.concat(sink_to_list(stream, output_mode="append"), ignore_index=True)
        .sort_values("url", ignore_index=True)
    )
    assert got["url"].tolist() == batch["url"].tolist()
    assert got["text"].tolist() == batch["text"].tolist()
