"""Multimodal (image/audio/video) column operators.

Media rides as an opaque ``binary`` column plus a typed metadata
struct — the layout a 100 TB training-data lake uses (parquet binary
chunks, partition-pruned by metadata, lazily decoded). The Spark-side
plumbing (schemas, mapInPandas batch iteration, Arrow transfer,
partition sizing) is real and tested; the actual codec calls are
stubbed behind ``decode=`` hooks because no image/audio libraries ship
in this container — swap in PIL/torchaudio/decord in production.

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
    """Image decode → (height, width, n_channels). ``decode`` is the
    codec hook (e.g. PIL.Image.open); absent a real codec this raises
    NotImplementedError at execution time — the plumbing (schema,
    batching, null passthrough) is what this engine owns."""
    schema = f"{id_col} long, height int, width int, n_channels int"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if decode is None:
                raise NotImplementedError(
                    "no image codec in this environment; pass decode=PIL.Image.open-like hook"
                )
            out = [decode(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "height": [o[0] for o in out],
                    "width": [o[1] for o in out],
                    "n_channels": [o[2] for o in out],
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
