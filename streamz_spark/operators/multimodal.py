"""Multimodal (image/audio/video) column operators.

Media rides as an opaque ``binary`` column plus a typed metadata
struct — the layout a 100 TB training-data lake uses (parquet binary
chunks, partition-pruned by metadata, lazily decoded). The Spark-side
plumbing (schemas, mapInPandas batch iteration, Arrow transfer,
partition sizing) is real and tested. Decode is real too for the
formats stdlib can parse — WAV/PPM/BMP via ``operators.codecs``
(sniffed by magic bytes); compressed codecs (JPEG/PNG/MP3) still go
through the ``decode=`` hooks (swap in PIL/torchaudio/decord in
production — none ship in this container).

Batch-shape contract for the decode path: mapInPandas yields one
pandas frame per Arrow batch; keep ``spark.sql.execution.arrow.
maxRecordsPerBatch`` small for large blobs so executor memory holds
(batch_bytes ≈ records × avg_blob).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "attach_media",
    "media_stats",
    "extract_features",
    "decode_image",
    "decode_audio",
    "sample_frames",
]


def attach_media(df: DataFrame, payload_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a payload column into the media layout:
    (media binary, media_meta struct<mime,n_bytes>). For tests the
    payload is derived from text — deterministic, library-free."""
    media = F.encode(F.col(payload_col), "UTF-8")
    return df.withColumn("media", media).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(media).cast("long").alias("n_bytes"),
        ),
    )


def media_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cheap metadata pass: no decode, pure JVM expressions — the scan
    you run to partition/prune before any expensive decode."""
    return df.select(
        F.col(id_col),
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.sha2(F.col("media"), 256).alias("sha256"),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id", dim: int = 8) -> DataFrame:
    """Feature extraction over binary media via mapInPandas — the real
    Arrow-batched plumbing with a deterministic stand-in featurizer
    (bytes → hash-derived float vector). Replace ``_featurize`` with a
    model forward pass in production."""
    schema = f"{id_col} long, feature array<double>"

    def _featurize(blob: bytes) -> list[float]:
        h = hashlib.sha256(blob).digest()
        return [b / 255.0 for b in h[:dim]]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feature": [_featurize(bytes(b)) for b in pdf["media"]],
                }
            )

    return df.select(id_col, "media").mapInPandas(gen, schema=schema)


def decode_image(df: DataFrame, id_col: str = "doc_id", decode=None) -> DataFrame:
    """Image decode → (height, width, n_channels, mean_pixel).

    ``decode=None`` uses the built-in pure-stdlib codecs
    (``operators.codecs.sniff_image``: P6 PPM and 24-bit BMP by magic
    bytes); other formats raise NotImplementedError naming the magic.
    Pass a hook (e.g. a PIL adapter returning ``(h, w, c)`` or a dict
    with those keys) for compressed codecs in production."""
    schema = f"{id_col} long, height int, width int, n_channels int, mean_pixel double"

    def gen(batches):
        import pandas as pd

        from streamz_spark.operators.codecs import sniff_image

        codec = decode or sniff_image
        for pdf in batches:
            out = []
            for b in pdf["media"]:
                d = codec(bytes(b))
                if not isinstance(d, dict):  # (h, w, c) tuple hooks
                    d = {"height": d[0], "width": d[1], "n_channels": d[2]}
                out.append(d)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "height": [o["height"] for o in out],
                    "width": [o["width"] for o in out],
                    "n_channels": [o["n_channels"] for o in out],
                    "mean_pixel": [o.get("mean_pixel") for o in out],
                }
            )

    return df.select(id_col, "media").mapInPandas(gen, schema=schema)


def decode_audio(df: DataFrame, id_col: str = "doc_id", decode=None) -> DataFrame:
    """Audio decode → (n_channels, sample_rate, n_frames, duration_s,
    mean_abs_amplitude). Built-in codec handles RIFF/WAVE PCM
    (``operators.codecs.decode_wav``); pass ``decode=`` for compressed
    formats."""
    schema = (
        f"{id_col} long, n_channels int, sample_rate int, n_frames long, "
        "duration_s double, mean_abs_amplitude double"
    )

    def gen(batches):
        import pandas as pd

        from streamz_spark.operators.codecs import sniff_audio

        codec = decode or sniff_audio
        for pdf in batches:
            out = [codec(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_channels": [o["n_channels"] for o in out],
                    "sample_rate": [o["sample_rate"] for o in out],
                    "n_frames": [o["n_frames"] for o in out],
                    "duration_s": [o["duration_s"] for o in out],
                    "mean_abs_amplitude": [o["mean_abs_amplitude"] for o in out],
                }
            )

    return df.select(id_col, "media").mapInPandas(gen, schema=schema)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", every_n: int = 10, extract=None
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index.
    ``extract(blob, idx)`` is the codec hook; the deterministic default
    derives frame count from blob length so the explode plumbing is
    testable without a codec."""
    schema = f"{id_col} long, frame_idx long, frame_bytes binary"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for i, b in zip(pdf[id_col], pdf["media"]):
                blob = bytes(b)
                n_frames = max(len(blob) // 100, 1)  # stand-in for container metadata
                for k in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(k)
                    blobs.append(extract(blob, k) if extract else blob[k * 100 : (k + 1) * 100])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_bytes": blobs})

    return df.select(id_col, "media").mapInPandas(gen, schema=schema)
