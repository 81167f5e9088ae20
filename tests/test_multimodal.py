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


def test_decode_image_unknown_magic_raises(spark):
    # raw text is not a supported container: the built-in sniffing
    # codec must raise naming the magic, not guess
    docs = load_table(spark, SF_DIR, "documents").limit(2)
    out = mm.decode_image(mm.attach_media(docs, "text"))
    with pytest.raises(Exception, match="NotImplementedError|no built-in codec"):
        out.collect()


def test_decode_image_with_fake_codec(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(5)

    def fake_decode(blob: bytes):
        return (len(blob) % 100, len(blob) % 50, 3)

    out = mm.decode_image(mm.attach_media(docs, "text"), decode=fake_decode).toPandas()
    assert list(out.columns) == ["doc_id", "height", "width", "n_channels", "mean_pixel"]
    assert (out["n_channels"] == 3).all()


def test_wav_codec_roundtrip():
    from streamz_spark.operators.codecs import decode_wav, encode_wav

    samples = [0, 100, -100, 32767, -32768, 7]
    blob = encode_wav(samples, sample_rate=16000)
    meta = decode_wav(blob)
    assert meta["n_channels"] == 1
    assert meta["sample_rate"] == 16000
    assert meta["n_frames"] == len(samples)
    assert meta["duration_s"] == len(samples) / 16000
    assert meta["mean_abs_amplitude"] == sum(abs(s) for s in samples) / len(samples)


def test_ppm_codec_roundtrip_and_comments():
    from streamz_spark.operators.codecs import decode_ppm, encode_ppm

    pixels = bytes(range(2 * 3 * 3))  # 2x3 image, distinct byte values
    blob = encode_ppm(2, 3, pixels)
    meta = decode_ppm(blob)
    assert (meta["height"], meta["width"], meta["n_channels"]) == (3, 2, 3)
    assert meta["mean_pixel"] == sum(pixels) / len(pixels)
    # header comments per the netpbm grammar must be skipped
    commented = b"P6\n# a comment\n2 3\n# another\n255\n" + pixels
    assert decode_ppm(commented) == meta


def test_bmp_codec_roundtrip_with_padding():
    from streamz_spark.operators.codecs import decode_bmp, encode_bmp

    # width 3 → 9-byte rows padded to 12: padding must not leak into
    # the mean
    pixels = bytes([200] * (3 * 2 * 3))
    blob = encode_bmp(3, 2, pixels)
    meta = decode_bmp(blob)
    assert (meta["height"], meta["width"], meta["n_channels"]) == (2, 3, 3)
    assert meta["mean_pixel"] == 200.0


def test_decode_image_builtin_sniffs_ppm_and_bmp(spark):
    from streamz_spark.operators.codecs import encode_bmp, encode_ppm

    rows = [
        (1, encode_ppm(4, 2, bytes([10]) * 24)),
        (2, encode_bmp(5, 3, bytes([30]) * 45)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = mm.decode_image(df).toPandas().set_index("doc_id")
    assert tuple(out.loc[1, ["height", "width", "mean_pixel"]]) == (2, 4, 10.0)
    assert tuple(out.loc[2, ["height", "width", "mean_pixel"]]) == (3, 5, 30.0)


def test_decode_audio_builtin(spark):
    from streamz_spark.operators.codecs import encode_wav

    rows = [(1, encode_wav([50] * 400, sample_rate=8000))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = mm.decode_audio(df).toPandas()
    assert out.loc[0, "n_frames"] == 400
    assert out.loc[0, "duration_s"] == 0.05
    assert out.loc[0, "mean_abs_amplitude"] == 50.0


def test_sample_frames_explodes(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    out = mm.sample_frames(mm.attach_media(docs, "text"), every_n=5).toPandas()
    assert set(out.columns) == {"doc_id", "frame_idx", "frame_bytes"}
    assert (out.groupby("doc_id").size() >= 1).all()
    assert (out["frame_idx"] % 5 == 0).all()
