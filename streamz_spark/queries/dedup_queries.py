"""Deduplication + similarity-search queries (training-data ops).

Oracle strategy: hash-independent outputs (exact fingerprint groups,
exact n-gram Jaccard, exact cosine) get full duckdb oracles; the
hash-dependent accelerators (MinHash signatures, LSH buckets, SimHash)
are rows-only here and property-tested against their exact
counterparts in tests/test_dedup.py (candidate recall ⊇ true pairs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_spark.catalog import register
from streamz_spark.io import load_table
from streamz_spark.operators import dedup as dd
from streamz_spark.operators import similarity as sim

_SHINGLE_SQL = """
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM (
            SELECT doc_id,
                   CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS w
            FROM documents
        )
"""


@register(
    "dedup_exact_groups",
    oracle="""
        SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
               COUNT(*) AS n_dups,
               MIN(doc_id) AS keep_id
        FROM documents
        GROUP BY 1
        HAVING COUNT(*) > 1
    """,
    doc="exact dedup: fingerprint → hash-groupBy → duplicate groups (one shuffle on md5 key)",
)
def dedup_exact_groups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_duplicates(docs)


@register(
    "dedup_exact_keep",
    oracle="""
        WITH fp AS (
            SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
            FROM documents
        )
        SELECT doc_id FROM fp
        WHERE doc_id = (SELECT MIN(doc_id) FROM fp f2 WHERE f2.f = fp.f)
    """,
    doc="exact dedup transform: keep min-id representative per fingerprint group",
)
def dedup_exact_keep(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.dedup_exact(docs).select("doc_id")


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
        WITH sh AS ({_SHINGLE_SQL}),
        sized AS (SELECT id, len(sh) AS n_sh FROM sh WHERE len(sh) > 0),
        posting AS (SELECT id, unnest(sh) AS shingle FROM sh),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
            FROM posting a JOIN posting b
              ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, n_common,
               n_common / (na.n_sh + nb.n_sh - n_common) AS jaccard
        FROM inter
        JOIN sized na ON na.id = id_a
        JOIN sized nb ON nb.id = id_b
        WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
    """,
    doc="exact 3-gram Jaccard near-dup pairs via shingle posting lists (SPJA only, no UDF)",
)
def ngram_jaccard_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, k=3, threshold=0.5)


@register(
    "minhash_near_duplicates",
    oracle=None,  # LSH candidate set is hash-dependent; recall vs exact pairs property-tested in tests/test_dedup.py
    doc="MinHash(64) + LSH(16 bands) near-dup: signatures in codegen, shuffle on (band, hash), exact-Jaccard verify",
)
def minhash_near_duplicates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_near_duplicates(docs, num_perm=64, bands=16, threshold=0.5)


@register(
    "simhash_fingerprints",
    oracle=None,  # xxhash64 has no duckdb equivalent; determinism tested in tests/test_dedup.py
    doc="SimHash 64-bit fingerprints, bit-plane majority votes in pure expressions",
)
def simhash_fingerprints(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash(docs, bits=16)


@register(
    "embedding_near_dups",
    oracle="""
        WITH v AS (
            SELECT vec_id AS id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), n AS (
            SELECT id, v, sqrt(list_dot_product(v, v)) AS norm FROM v
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CASE WHEN a.norm * b.norm > 0
                    THEN list_dot_product(a.v, b.v) / (a.norm * b.norm)
                    ELSE 0.0 END AS cosine
        FROM n a JOIN n b ON a.id < b.id
        WHERE CASE WHEN a.norm * b.norm > 0
                   THEN list_dot_product(a.v, b.v) / (a.norm * b.norm)
                   ELSE 0.0 END >= 0.5
    """,
    doc="embedding-cosine near-dup pairs ≥0.5: BLAS prefilter (broadcast matrix) + exact-expression verify — bit-matches the duckdb brute force",
)
def embedding_near_dups(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return dd.embedding_near_duplicates(emb, threshold=0.5)


@register(
    "ann_brute_force_topk",
    oracle="""
        WITH v AS (
            SELECT vec_id AS id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), n AS (
            SELECT id, v, sqrt(list_dot_product(v, v)) AS norm FROM v
        ), scored AS (
            SELECT q.id AS qid, c.id AS cid,
                   CASE WHEN q.norm * c.norm > 0
                        THEN list_dot_product(q.v, c.v) / (q.norm * c.norm)
                        ELSE 0.0 END AS cosine
            FROM n q JOIN n c ON q.id != c.id
            WHERE q.id < 20
        )
        SELECT qid, cid, cosine,
               CAST(rnk AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, cid ASC) AS rnk
            FROM scored
        ) WHERE rnk <= 5
    """,
    doc="exact cosine top-5 per query vector (first 20 ids); corpus streams, queries broadcast",
)
def ann_brute_force_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    out = sim.brute_force_topk(emb, queries, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "ann_lsh_topk",
    oracle=None,  # bucket assignment is hash-dependent; recall vs brute force tested in tests/test_dedup.py
    doc="hyperplane-LSH bucketed ANN top-k: shuffle on (table, bucket), exact-cosine verify of candidates",
)
def ann_lsh_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.hyperplane_lsh_ann(emb, k=5, planes=10, tables=4, dim=64)


@register(
    "ann_ivf_topk",
    oracle=None,  # KMeans cell assignment is model-dependent; planted-dup recall tested in tests/test_dedup.py
    doc="IVF (inverted-file) ANN top-k: KMeans coarse quantization, n_probe nearest cells, exact-cosine verify — the FAISS-style path when the matrix no longer broadcasts",
)
def ann_ivf_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ivf_ann(emb, k=5, n_cells=8, n_probe=3)
