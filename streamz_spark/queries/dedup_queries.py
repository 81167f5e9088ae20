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
    "dedup_exact",
    # one entry for both halves of exact dedup: the kept (min-id)
    # representative per fingerprint group + that group's size. A
    # group_size > 1 row is the duplicate-groups report; group_size = 1
    # rows are the pass-through docs — the actual dedup transform output.
    oracle="""
        WITH fp AS (
            SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
            FROM documents
        )
        SELECT doc_id, group_size FROM (
            SELECT doc_id,
                   COUNT(*) OVER (PARTITION BY f) AS group_size,
                   MIN(doc_id) OVER (PARTITION BY f) AS keep
            FROM fp
        ) WHERE doc_id = keep
    """,
    doc="exact dedup: fingerprint → hash-groupBy on md5 key (one shuffle) "
        "→ keep min-id representative per group, with the group size "
        "(duplicate-groups report and dedup transform in one output)",
)
def dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    groups = dd.exact_duplicates(docs, min_group=1)
    return groups.select(
        F.col("keep_id").alias("doc_id"), F.col("n_dups").alias("group_size")
    )


@register(
    "ngram_jaccard_pairs",
    # max_df=50 mirrors the operator's posting-list cutoff: shingles in
    # more than 50 docs are dropped from candidate generation (not from
    # the Jaccard denominators) — the cap that stops a hot shingle from
    # fanning out quadratically at scale
    oracle=f"""
        WITH sh AS ({_SHINGLE_SQL}),
        sized AS (SELECT id, len(sh) AS n_sh FROM sh WHERE len(sh) > 0),
        posting0 AS (SELECT id, unnest(sh) AS shingle FROM sh),
        hot AS (SELECT shingle FROM posting0 GROUP BY shingle HAVING COUNT(*) > 50),
        posting AS (SELECT * FROM posting0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
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
    doc="exact 3-gram Jaccard near-dup pairs via shingle posting lists "
        "(SPJA only, no UDF) with the max_df hot-shingle cutoff engaged",
)
def ngram_jaccard_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=50)


@register(
    "minhash_near_duplicates",
    # The pipeline's *output* is hash-independent: LSH only proposes
    # candidates, and the exact-Jaccard verify keeps pairs >= threshold,
    # so with full recall the result equals the exact pair set — which
    # is what this oracle computes independently (same k=3, same 0.5
    # threshold, no max_df: LSH has no posting-list cutoff). A recall
    # drop (bad banding, broken signatures) shows up as missing rows.
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
        SELECT id_a, id_b,
               n_common / (na.n_sh + nb.n_sh - n_common) AS jaccard
        FROM inter
        JOIN sized na ON na.id = id_a
        JOIN sized nb ON nb.id = id_b
        WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
    """,
    doc="MinHash(64) + LSH(16 bands) near-dup: signatures in codegen, "
        "shuffle on (band, hash), exact-Jaccard verify; scored against "
        "the independent exact pair set (recall check with teeth)",
)
def minhash_near_duplicates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_near_duplicates(docs, num_perm=64, bands=16, threshold=0.5)


# transitive closure over the exact n-gram pair set (same k=3,
# threshold=0.5, max_df=50 as ngram_jaccard_pairs, so edge sets are
# identical on both engines). The oracle walks reachability with a
# recursive CTE; the Spark side runs alternating large-star/small-
# star rounds — different algorithms, same fixpoint.
_DEDUP_CLUSTERS_ORACLE = f"""
        WITH RECURSIVE sh AS ({_SHINGLE_SQL}),
        sized AS (SELECT id, len(sh) AS n_sh FROM sh WHERE len(sh) > 0),
        posting0 AS (SELECT id, unnest(sh) AS shingle FROM sh),
        hot AS (SELECT shingle FROM posting0 GROUP BY shingle HAVING COUNT(*) > 50),
        posting AS (SELECT * FROM posting0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
            FROM posting a JOIN posting b
              ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT id_a, id_b
            FROM inter
            JOIN sized na ON na.id = id_a
            JOIN sized nb ON nb.id = id_b
            WHERE n_common / (na.n_sh + nb.n_sh - n_common) >= 0.5
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            SELECT DISTINCT u AS id, u AS r FROM edges
            UNION
            SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id
        ),
        comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
        sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
                  FROM comp GROUP BY cluster_id)
        SELECT comp.id AS doc_id, comp.cluster_id, sizes.cluster_size,
               comp.id = comp.cluster_id AS keep
        FROM comp JOIN sizes USING (cluster_id)
    """


@register(
    "dedup_clusters",
    oracle=_DEDUP_CLUSTERS_ORACLE,
    doc="duplicate-cluster resolution: connected components over the "
        "near-dup pair graph (alternating large-star/small-star rounds, "
        "O(log^2 n) convergence, localCheckpoint-truncated lineage) with "
        "per-cluster size and kept min-id representative",
)
def dedup_clusters(spark, sf_dir):
    from streamz_spark.operators.components import dedup_clusters as dc

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=50)
    return dc(docs, pairs)


# dedup_clusters_distributed lives in queries/extra.py: the driver
# evaluates at most 50 registry entries, so bench-and-test-only
# variants must not occupy a slot in this registry.


@register(
    "simhash_fingerprints",
    # md5-derived 60-bit token hashes (dedup.md5_hash60) are bit-identical
    # in DuckDB, so the full bit-plane majority vote is reproducible in
    # SQL; xxhash64 stays the production default in operators.simhash
    oracle="""
        WITH th AS (
            SELECT doc_id,
                   list_transform(
                       list_distinct(
                           CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
                                ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END),
                       t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
            FROM documents
        )
        SELECT doc_id,
               CAST(COALESCE(list_sum(list_transform(range(0, 16), i ->
                   CASE WHEN COALESCE(list_sum(list_transform(hs, h ->
                              CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END)), 0) > 0
                        THEN (1::BIGINT << i) ELSE 0 END)), 0) AS BIGINT) AS simhash
        FROM th
    """,
    doc="SimHash fingerprints (16 bit planes), bit-plane majority votes "
        "in pure expressions; md5-derived token hashes make the whole "
        "pipeline oracle-reproducible",
)
def simhash_fingerprints(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash(docs, bits=16, hash_fn="md5")


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
    # Rademacher (±1) hyperplanes from md5 hex-digit parity: the plane
    # components, the ±x dot folds (exact in IEEE), the bucket bits, and
    # the final exact-cosine ranking all reproduce bit-identically in
    # DuckDB — the whole approximate index is oracle-checked, not just
    # its recall. planes=10, tables=4, dim=64, k=5.
    oracle="""
        WITH v AS (
            SELECT vec_id AS id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), n AS (
            SELECT id, v, sqrt(list_dot_product(v, v)) AS norm FROM v
        ), b AS (
            SELECT id, v, norm, t.tbl,
                   CAST(COALESCE(list_sum(list_transform(range(0, 10), p ->
                       CASE WHEN list_dot_product(v, list_transform(range(0, 64), d ->
                                 CASE WHEN ('0x' || substr(md5((t.tbl*10 + p)::VARCHAR || ':' || d::VARCHAR), 32, 1))::INT % 2 = 0
                                      THEN 1.0 ELSE -1.0 END)) >= 0
                            THEN (1::BIGINT << p) ELSE 0 END)), 0) AS BIGINT) AS bucket
            FROM n CROSS JOIN (SELECT unnest(range(0, 4)) AS tbl) t
        ), cand AS (
            SELECT DISTINCT a.id AS qid, c.id AS cid,
                   CASE WHEN a.norm * c.norm > 0
                        THEN list_dot_product(a.v, c.v) / (a.norm * c.norm)
                        ELSE 0.0 END AS cosine
            FROM b a JOIN b c
              ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.id != c.id
        )
        SELECT qid, cid, cosine, CAST(rnk AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, cid ASC) AS rnk
            FROM cand
        ) WHERE rnk <= 5
    """,
    doc="hyperplane-LSH bucketed ANN top-k: shuffle on (table, bucket), "
        "exact-cosine verify of candidates; Rademacher planes make every "
        "stage (bucketing included) oracle-reproducible",
)
def ann_lsh_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.hyperplane_lsh_ann(
        emb, k=5, planes=10, tables=4, dim=64, plane_style="rademacher"
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "ann_ivf_topk",
    # seed-centroid IVF (n_cells lowest-id vectors as fixed centroids):
    # the L2 cell assignment, n_probe probing, and exact-cosine rank are
    # plain arithmetic — fully reproducible in SQL. The KMeans-trained
    # variant (centroids="kmeans") is the production default and is
    # recall-tested in tests/test_dedup.py. n_cells=64, n_probe=3, k=5
    # (64 ~ sqrt-sizing for the sf0.1 corpus: a fixed-8 cell count made
    # the candidate join quadratic — ~230M dot products at 25k vectors).
    oracle="""
        WITH v AS (
            SELECT vec_id AS id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), n AS (
            SELECT id, v, sqrt(list_dot_product(v, v)) AS norm FROM v
        ), cent AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT) AS cell, v AS cvec
            FROM (SELECT * FROM n ORDER BY id LIMIT 64)
        ), scored AS (
            SELECT n.id, n.v, n.norm, c.cell,
                   list_sum(list_transform(range(1, len(n.v) + 1),
                       i -> (n.v[i] - c.cvec[i]) * (n.v[i] - c.cvec[i]))) AS d2
            FROM n CROSS JOIN cent c
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                         ORDER BY d2 ASC, cell ASC) AS rnk
            FROM scored
        ), cand AS (
            SELECT DISTINCT a.id AS qid, m.id AS cid,
                   CASE WHEN a.norm * m.norm > 0
                        THEN list_dot_product(a.v, m.v) / (a.norm * m.norm)
                        ELSE 0.0 END AS cosine
            FROM (SELECT * FROM ranked WHERE rnk <= 3) a
            JOIN (SELECT * FROM ranked WHERE rnk = 1) m
              ON a.cell = m.cell AND a.id != m.id
        )
        SELECT qid, cid, cosine, CAST(rnk AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, cid ASC) AS rnk
            FROM cand
        ) WHERE rnk <= 5
    """,
    doc="IVF (inverted-file) ANN top-k: coarse quantization to centroid "
        "cells, n_probe nearest cells, exact-cosine verify — the "
        "FAISS-style path when the matrix no longer broadcasts; scored "
        "with deterministic seed centroids, production default is KMeans",
)
def ann_ivf_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.ivf_ann(emb, k=5, n_cells=64, n_probe=3, centroids="seed")
    return out.withColumn("rank", F.col("rank").cast("long"))
