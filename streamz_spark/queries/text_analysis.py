"""Text-analysis queries over the documents table (training-data ops).

No streamz precedent (reference users call pandas string methods via
map_partitions); semantics are defined by this engine and mirrored
expression-for-expression in the duckdb oracles: identical IEEE ops on
identical inputs → raw doubles compare bit-exact, no rounding games.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table
from streamz_spark.operators import text as ops


@register(
    "text_quality_profile",
    oracle="""
        WITH q AS (
            SELECT doc_id, n_chars,
                   length(text)::DOUBLE AS n,
                   length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g'))::DOUBLE AS punct,
                   length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS digits,
                   length(regexp_replace(text, '[^ \t\n]', '', 'g'))::DOUBLE AS spaces,
                   CASE WHEN length(trim(lower(text))) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                   END AS n_tokens
            FROM documents
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_chars_computed,
               n_chars AS n_chars_declared,
               CASE WHEN n > 0 THEN punct / n ELSE 0.0 END  AS punct_ratio,
               CASE WHEN n > 0 THEN digits / n ELSE 0.0 END AS digit_ratio,
               CASE WHEN n > 0 THEN spaces / n ELSE 0.0 END AS space_ratio,
               n_tokens,
               CASE WHEN n_tokens > 0 THEN (n - spaces) / n_tokens ELSE 0.0 END AS mean_word_len
        FROM q
    """,
    doc="per-document text profile: token counting (whitespace tokenizer) "
        "+ quality scoring (length/punct/digit/whitespace ratios, mean "
        "word length — the standard cheap corpus pre-filter)",
)
def text_quality_profile(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = ops.quality_features(docs, "text")
    return out.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_computed"),
        F.col("n_chars").alias("n_chars_declared"),
        "punct_ratio", "digit_ratio", "space_ratio",
        "n_tokens", "mean_word_len",
    )


@register(
    "text_language_id",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w
            FROM documents
        ), hits AS (
            SELECT doc_id, lang,
                   len(list_filter(['der','die','und','das','ist','nicht','mit','ein','von','zu'],  s -> list_contains(w, s))) AS h_de,
                   len(list_filter(['the','and','of','to','in','is','that','for','with','was'],     s -> list_contains(w, s))) AS h_en,
                   len(list_filter(['el','la','de','que','los','es','en','por','con','para'],       s -> list_contains(w, s))) AS h_es,
                   len(list_filter(['le','la','et','les','des','est','dans','que','pour','une'],    s -> list_contains(w, s))) AS h_fr
            FROM toks
        )
        SELECT doc_id, lang,
               CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                    WHEN h_de = GREATEST(h_de, h_en, h_es, h_fr) THEN 'de'
                    WHEN h_en = GREATEST(h_de, h_en, h_es, h_fr) THEN 'en'
                    WHEN h_es = GREATEST(h_de, h_en, h_es, h_fr) THEN 'es'
                    ELSE 'fr'
               END AS lang_pred
        FROM hits
    """,
    doc="heuristic n-gram/stopword language id; argmax with deterministic tie-break",
)
def text_language_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return ops.language_id(docs, "text").select("doc_id", "lang", "lang_pred")


@register(
    "doc_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents
    """,
    doc="document fingerprinting: md5 of whitespace-normalized text",
)
def doc_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", ops.fingerprint("text", "fingerprint"))
