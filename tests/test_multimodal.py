"""Multimodal plumbing tests: binary schemas, Arrow batch shapes,
stubbed decode behavior."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.operators import multimodal as mm

from .conftest import SF_DIR


def test_attach_media_schema_and_bytes(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = mm.attach_media(docs, "text")
    assert dict(out.dtypes)["media"] == "binary"
    row = out.select("text", "media", "media_meta.n_bytes").first()
    assert bytes(row["media"]) == row["text"].encode("utf-8")
    assert row["n_bytes"] == len(row["text"].encode("utf-8"))


def test_extract_features_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    out = mm.extract_features(mm.attach_media(docs, "text"), dim=8).toPandas()
    assert set(out.columns) == {"doc_id", "feature"}
    assert all(len(f) == 8 for f in out["feature"])
    # spot-check against the stand-in featurizer
    src = docs.select("doc_id", "text").toPandas().set_index("doc_id")["text"]
    for _, r in out.head(5).iterrows():
        h = hashlib.sha256(src[r.doc_id].encode()).digest()
        assert list(r.feature) == [b / 255.0 for b in h[:8]]


def test_decode_image_stub_raises_without_codec(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(2)
    out = mm.decode_image(mm.attach_media(docs, "text"))
    with pytest.raises(Exception, match="NotImplementedError|no image codec"):
        out.collect()


def test_decode_image_with_fake_codec(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(5)

    def fake_decode(blob: bytes):
        return (len(blob) % 100, len(blob) % 50, 3)

    out = mm.decode_image(mm.attach_media(docs, "text"), decode=fake_decode).toPandas()
    assert list(out.columns) == ["doc_id", "height", "width", "n_channels"]
    assert (out["n_channels"] == 3).all()


def test_sample_frames_explodes(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    out = mm.sample_frames(mm.attach_media(docs, "text"), every_n=5).toPandas()
    assert set(out.columns) == {"doc_id", "frame_idx", "frame_bytes"}
    assert (out.groupby("doc_id").size() >= 1).all()
    assert (out["frame_idx"] % 5 == 0).all()
