"""Multimodal-column query: binary media plumbing over documents.

One pipeline entry: the metadata-only scan (mime/bytes/sha256 — the
prune-before-decode pass, pure JVM expressions) joined with the
Arrow-batched mapInPandas featurizer. The stand-in featurizer derives
features from the sha256 digest bytes, so the whole pipeline —
including the mapInPandas plumbing — is reproducible in the DuckDB
oracle; swap the featurizer for a model forward pass in production
(decode hooks live in operators/multimodal.py, tested in
tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table
from streamz_spark.operators import multimodal as mm


@register(
    "media_pipeline",
    # feature[i] = digest_byte[i] / 255.0; feature_sum folds the 8
    # doubles left-to-right on both engines → bit-exact, no rounding
    oracle="""
        SELECT doc_id,
               'application/octet-stream' AS mime,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha256,
               list_sum(list_transform(range(0, 8),
                   i -> ('0x' || substr(sha256(text), 2*i + 1, 2))::INT / 255.0)) AS feature_sum,
               8 AS dim
        FROM documents
    """,
    doc="multimodal binary-column pipeline: metadata scan (mime/bytes/"
        "sha256, no decode — the partition-prune pass) + Arrow-batched "
        "mapInPandas feature extraction with a deterministic digest-derived "
        "stand-in featurizer (decode/frame-sample hooks in "
        "operators/multimodal.py)",
)
def media_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with_media = mm.attach_media(docs, "text")
    stats = mm.media_stats(with_media)
    feats = mm.extract_features(with_media, dim=8).select(
        "doc_id",
        F.aggregate("feature", F.lit(0.0), lambda a, x: a + x).alias("feature_sum"),
        F.size("feature").alias("dim"),
    )
    return stats.join(feats, "doc_id")
