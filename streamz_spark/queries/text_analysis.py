"""Text-analysis queries over the documents table (training-data ops).

No streamz precedent (reference users call pandas string methods via
map_partitions); semantics are defined by this engine and mirrored
expression-for-expression in the duckdb oracles: identical IEEE ops on
identical inputs → raw doubles compare bit-exact, no rounding games.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import ensure_scan_parallelism, load_table
from streamz_spark.operators import text as ops


@register(
    "text_quality_profile",
    # Extended round 2 with the repetition/PII family (operators/quality):
    # duplicate-line fractions and the top-bigram char fraction are the
    # Gopher §A1.1 signals re-derived in SQL (unnest → GROUP BY gram →
    # MAX(c·len)/SUM(c·len)); PII counts/scrub mirror the exact regex
    # chain with RE2-safe, backreference-free patterns.
    oracle="""
        WITH q AS (
            SELECT doc_id, n_chars, text,
                   length(text)::DOUBLE AS n,
                   length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g'))::DOUBLE AS punct,
                   length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS digits,
                   length(regexp_replace(text, '[^ \t\n]', '', 'g'))::DOUBLE AS spaces,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w,
                   list_filter(list_transform(regexp_split_to_array(text, '\n'), x -> trim(x)),
                               x -> length(x) > 0) AS lines
            FROM documents
        ), gr AS (
            SELECT doc_id, unnest(
                CASE WHEN len(w) >= 2
                     THEN list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
                     ELSE []::VARCHAR[] END) AS g
            FROM q
        ), cnt AS (
            SELECT doc_id, g, COUNT(*) AS c FROM gr GROUP BY 1, 2
        ), topg AS (
            SELECT doc_id,
                   CAST(MAX(c * length(g)) AS BIGINT) AS topc,
                   CAST(SUM(c * length(g)) AS BIGINT) AS allc
            FROM cnt GROUP BY 1
        )
        SELECT q.doc_id,
               CAST(n AS BIGINT) AS n_chars_computed,
               n_chars AS n_chars_declared,
               CASE WHEN n > 0 THEN punct / n ELSE 0.0 END  AS punct_ratio,
               CASE WHEN n > 0 THEN digits / n ELSE 0.0 END AS digit_ratio,
               CASE WHEN n > 0 THEN spaces / n ELSE 0.0 END AS space_ratio,
               len(w) AS n_tokens,
               CASE WHEN len(w) > 0 THEN (n - spaces) / len(w) ELSE 0.0 END AS mean_word_len,
               CASE WHEN len(lines) > 0
                    THEN (len(lines) - len(list_distinct(lines))) / len(lines)
                    ELSE 0.0 END AS dup_line_frac,
               CASE WHEN COALESCE(CAST(list_sum(list_transform(lines, x -> length(x))) AS BIGINT), 0) > 0
                    THEN (CAST(list_sum(list_transform(lines, x -> length(x))) AS BIGINT)
                          - CAST(list_sum(list_transform(list_distinct(lines), x -> length(x))) AS BIGINT))
                         / CAST(list_sum(list_transform(lines, x -> length(x))) AS BIGINT)
                    ELSE 0.0 END AS dup_line_char_frac,
               COALESCE(CASE WHEN t.allc > 0 THEN t.topc / t.allc END, 0.0) AS top_2gram_char_frac,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
               regexp_replace(regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g'),
                   '(\\+?\\d{1,3}[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}', '<PHONE>', 'g') AS text_scrubbed
        FROM q LEFT JOIN topg t ON q.doc_id = t.doc_id
    """,
    doc="per-document text profile: token counting + quality ratios + "
        "Gopher repetition signals (dup-line fractions, top-bigram char "
        "fraction) + PII counts and scrubbed text — the cheap narrow "
        "pre-filter pass of a corpus pipeline, zero shuffle",
)
def text_quality_profile(spark, sf_dir):
    from streamz_spark.operators import quality as qual

    # fan the single-row-group local scan out to all cores; no-op on
    # any input with natural split parallelism
    docs = ensure_scan_parallelism(load_table(spark, sf_dir, "documents"))
    out = ops.quality_features(docs, "text")
    out = qual.repetition_signals(out, "text", top_ngram_ns=(2,), dup_ngram_ns=())
    out = qual.pii_signals(out, "text")
    out = qual.pii_scrub(out, "text", out_col="text_scrubbed")
    return out.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_computed"),
        F.col("n_chars").alias("n_chars_declared"),
        "punct_ratio", "digit_ratio", "space_ratio",
        "n_tokens", "mean_word_len",
        "dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
        "n_email", "n_ipv4",
        "text_scrubbed",
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
               END AS lang_pred,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM hits JOIN documents USING (doc_id, lang)
    """,
    doc="heuristic n-gram/stopword language id (argmax, deterministic "
        "tie-break) + md5 document fingerprint — both per-doc text "
        "signals in one narrow scan",
)
def text_language_id(spark, sf_dir):
    docs = ensure_scan_parallelism(load_table(spark, sf_dir, "documents"))
    return ops.language_id(docs, "text").select(
        "doc_id", "lang", "lang_pred", ops.fingerprint("text", "fingerprint")
    )


@register(
    "contamination_check",
    # k=7 shingles at this corpus size (docs avg ~54 words); published
    # decontamination pipelines use k=13 on web-scale text — same op,
    # different knob. Benchmark stand-in: the deterministic doc_id%97
    # sample (both engines compute the identical set).
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w
            FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - 6, 0)),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                            w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
                   )) AS sh
            FROM w
        ),
        bench AS (
            SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % 97 = 0
        ),
        posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_hits
            FROM posting JOIN bench USING (shingle)
            GROUP BY doc_id
        )
        SELECT s.doc_id,
               len(s.sh)::BIGINT AS n_shingles,
               COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
               CASE WHEN len(s.sh) > 0
                    THEN COALESCE(h.n_hits, 0) / len(s.sh) ELSE 0.0 END AS overlap,
               (CASE WHEN len(s.sh) > 0
                     THEN COALESCE(h.n_hits, 0) / len(s.sh) ELSE 0.0 END) >= 0.5
                   AS contaminated
        FROM sh s LEFT JOIN hits h USING (doc_id)
    """,
    doc="benchmark decontamination (GPT-3 appx C / Gopher A.1 recipe): "
        "per-doc fraction of distinct k-gram shingles hitting the "
        "benchmark shingle set; corpus scanned once, benchmark side "
        "collapsed to a distinct-shingle join (AQE broadcasts when small)",
)
def contamination_check(spark, sf_dir):
    from streamz_spark.operators.contamination import contamination_check as cc

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = cc(docs, bench, k=7, threshold=0.5)
    return out.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        "n_hits", "overlap", "contaminated",
    )


@register(
    "train_val_split",
    # hash-bucket split + exact stratified sample in one output. md5-
    # derived buckets are bit-identical across engines, so the oracle
    # recomputes the identical assignment (portability is the point:
    # the same rows land in the same split on any engine).
    oracle="""
        WITH h AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5('42:' || doc_id), 1, 8))::BIGINT % 10000 AS bucket,
                   ('0x' || substr(md5('42#' || doc_id), 1, 12))::BIGINT AS ord
            FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END AS split,
               (ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ord, doc_id)) <= 10
                   AS eval_sampled
        FROM h
    """,
    doc="deterministic train/val/test hash split (map-side, no shuffle, "
        "stable under corpus growth) + exact per-language stratified "
        "sample flag (seeded-hash rank); both md5-portable across engines",
)
def train_val_split(spark, sf_dir):
    from streamz_spark.operators.sampling import hash_split, stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = hash_split(docs, "doc_id")
    out = stratified_sample(out, ["lang"], 10, "doc_id", flag_col="eval_sampled")
    return out.select("doc_id", "lang", "split", "eval_sampled")


@register(
    "tfidf_top_terms",
    # score = tf * (ln((N+1)/(df+1)) + 1): both engines evaluate the
    # identical double expression (StrictMath/libm ln agree on these
    # inputs); only integer columns + the rank are output, with a
    # lexicographic tie-break so ordering is total.
    oracle="""
        WITH toks AS (
            SELECT doc_id AS id, unnest(
                CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                     ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                END) AS term
            FROM documents
        ),
        tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfq AS (SELECT term, COUNT(*) AS df_count FROM tf GROUP BY 1),
        nd AS (SELECT COUNT(DISTINCT id) AS n_docs FROM toks)
        SELECT id AS doc_id, term, tf, df_count, rank FROM (
            SELECT id, term, tf, df_count,
                   ROW_NUMBER() OVER (
                       PARTITION BY id
                       ORDER BY tf * (ln((n_docs + 1) / (df_count + 1)) + 1) DESC,
                                term ASC) AS rank
            FROM tf JOIN dfq USING (term) CROSS JOIN nd
        ) WHERE rank <= 5
    """,
    doc="per-doc top-5 terms by smoothed TF-IDF: one (doc,term) groupBy, "
        "one term groupBy, term join, per-doc top-n window; the corpus "
        "doc count rides in as a broadcast cross-join, never a collect",
)
def tfidf_top_terms(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = ops.tfidf_top_terms(docs, top_n=5)
    return out.select(
        "doc_id", "term", "tf", "df_count", F.col("rank").cast("long").alias("rank")
    )
