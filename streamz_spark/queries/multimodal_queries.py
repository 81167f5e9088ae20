"""Multimodal-column queries: binary media plumbing over documents.

``media_metadata_stats`` is fully oracled (sha256/octet_length exist in
both engines); the decode/featurize paths are rows-only (mapInPandas
with stand-in codecs) and tested in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table
from streamz_spark.operators import multimodal as mm


@register(
    "media_metadata_stats",
    oracle="""
        SELECT doc_id,
               'application/octet-stream' AS mime,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha256
        FROM documents
    """,
    doc="metadata-only media pass (no decode): mime/bytes/sha256 — the prune-before-decode scan",
)
def media_metadata_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with_media = mm.attach_media(docs, "text")
    return mm.media_stats(with_media)


@register(
    "media_feature_extract",
    oracle=None,  # mapInPandas featurizer (hash stand-in); plumbing tested in tests/test_multimodal.py
    doc="Arrow-batched binary→feature extraction via mapInPandas (decode hook stubbed)",
)
def media_feature_extract(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with_media = mm.attach_media(docs, "text")
    feats = mm.extract_features(with_media, dim=8)
    return feats.select(
        "doc_id",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6).alias("feature_sum"),
        F.size("feature").alias("dim"),
    )
