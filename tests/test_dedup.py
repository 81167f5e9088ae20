"""Property tests for hash-dependent operators (no SQL oracle possible).

Mirrors the reference's differential strategy where an oracle exists
(exact Jaccard), and uses planted-duplicate / determinism properties
where results depend on hash functions (MinHash, LSH, SimHash).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.operators import dedup as dd
from streamz_spark.operators import similarity as sim

from .conftest import SF_DIR


def test_minhash_pairs_subset_of_exact_with_high_recall(spark):
    """Every MinHash-reported pair is exactly verified (precision 1.0 by
    construction); LSH recall vs the exact posting-list pairs ≥ 0.8."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = {(r.id_a, r.id_b) for r in dd.ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()}
    mh = {(r.id_a, r.id_b) for r in dd.minhash_near_duplicates(docs, num_perm=64, bands=16, threshold=0.5).collect()}
    assert mh <= exact, f"false positives: {mh - exact}"
    if exact:
        assert len(mh & exact) / len(exact) >= 0.8


def test_ngram_jaccard_approx_keys_matches_exact(spark):
    """approx_keys=True (int64 posting key) must reproduce the exact
    pair set on collision-free data — i.e. everywhere below the
    documented ~10⁹-distinct-gram birthday bound."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        tuple(r)
        for r in dd.ngram_jaccard_pairs(
            docs, k=3, threshold=0.5, max_df=50
        ).collect()
    }
    approx = {
        tuple(r)
        for r in dd.ngram_jaccard_pairs(
            docs, k=3, threshold=0.5, max_df=50, approx_keys=True
        ).collect()
    }
    assert approx == exact


def test_ngram_jaccard_approx_posting_key_is_hashed(spark):
    """The approx arm's posting aggregate must key on xxhash64, not
    gram text (the whole point: 8-byte shuffle keys)."""
    from streamz_spark.plans.inspect import explain_string

    docs = load_table(spark, SF_DIR, "documents")
    plan = explain_string(
        dd.ngram_jaccard_pairs(docs, k=3, threshold=0.5, approx_keys=True)
    )
    assert "xxhash64" in plan
    # the exact arm never hashes the posting key
    plan_exact = explain_string(dd.ngram_jaccard_pairs(docs, k=3, threshold=0.5))
    assert "xxhash64" not in plan_exact


def test_common_shingle_stats_approx_keys_matches_exact(spark):
    from streamz_spark.operators.quality import common_shingle_stats

    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        tuple(r) for r in common_shingle_stats(docs, k=5, min_docs=3).collect()
    }
    approx = {
        tuple(r)
        for r in common_shingle_stats(
            docs, k=5, min_docs=3, approx_keys=True
        ).collect()
    }
    assert approx == exact


def test_simhash_identical_docs_same_hash(spark):
    """Byte-identical texts must collide; simhash is deterministic."""
    docs = load_table(spark, SF_DIR, "documents")
    fp = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("exact_fp")
    )
    sh = dd.simhash(docs, bits=16)
    joined = sh.join(fp, "doc_id")
    groups = (
        joined.groupBy("exact_fp")
        .agg(F.countDistinct("simhash").alias("n_hashes"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    bad = groups.filter(F.col("n_hashes") > 1).count()
    assert bad == 0

    # deterministic across runs
    a = sorted((r.doc_id, r.simhash) for r in sh.collect())
    b = sorted((r.doc_id, r.simhash) for r in dd.simhash(docs, bits=16).collect())
    assert a == b


def test_lsh_ann_finds_planted_near_duplicates(spark):
    """Vectors duplicated with tiny noise (cosine ≈ 1) must be retrieved
    by the hyperplane-LSH path — the property LSH actually guarantees."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in (v + 0.001 * rng.randn(16).astype("float32"))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.hyperplane_lsh_ann(df, k=1, planes=8, tables=6, dim=16)
    got = {(r.qid, r.cid) for r in out.filter(F.col("rank") == 1).collect()}
    expected = {(i, 1000 + i) for i in range(40)} | {(1000 + i, i) for i in range(40)}
    recall = len(got & expected) / len(expected)
    assert recall >= 0.9, f"planted-pair recall {recall}"


def test_lsh_ann_cosines_match_brute_force(spark):
    """Candidate cosines reported by LSH must equal the exact cosine
    (verify step is exact); checked against brute force on the overlap."""
    emb = load_table(spark, SF_DIR, "embeddings").limit(100)
    bf = {(r.qid, r.cid): r.cosine for r in sim.brute_force_topk(emb, emb, k=99).collect()}
    lsh = sim.hyperplane_lsh_ann(emb, k=5, planes=8, tables=4, dim=64)
    for r in lsh.collect():
        if (r.qid, r.cid) in bf:
            assert r.cosine == pytest.approx(bf[(r.qid, r.cid)], abs=0, rel=0), (r.qid, r.cid)


def test_dedup_exact_removes_only_duplicates(spark):
    """Row count after dedup = distinct fingerprints; kept ids minimal."""
    docs = load_table(spark, SF_DIR, "documents")
    from streamz_spark.operators.text import fingerprint

    n_fp = docs.select(fingerprint("text", "f")).distinct().count()
    kept = dd.dedup_exact(docs)
    assert kept.count() == n_fp


def test_ivf_ann_finds_planted_near_duplicates(spark):
    """IVF cells must place near-identical vectors together (their
    centroids coincide), so planted duplicates are retrieved at rank 1."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    base = rng.randn(30, 16).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in (v + 0.001 * rng.randn(16).astype("float32"))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.ivf_ann(df, k=1, n_cells=4, n_probe=2)
    got = {(r.qid, r.cid) for r in out.filter(F.col("rank") == 1).collect()}
    expected = {(i, 1000 + i) for i in range(30)} | {(1000 + i, i) for i in range(30)}
    recall = len(got & expected) / len(expected)
    assert recall >= 0.9, f"planted-pair recall {recall}"


def test_ivf_ann_serving_queries_equal_self_query_slice(spark):
    """ivf_ann(queries=subset) — the serving shape (index corpus once,
    probe with a fixed workload) — must return exactly the self-query
    output restricted to those query ids: the dispatch changes the
    probe-side cost (n_probe·√n per query instead of n^1.5 total),
    never the semantics."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") < 20)
    served = sim.ivf_ann(emb, k=5, n_cells=16, n_probe=3,
                         centroids="seed", queries=qs)
    full = sim.ivf_ann(emb, k=5, n_cells=16, n_probe=3,
                       centroids="seed").filter(F.col("qid") < 20)
    got = sorted(tuple(r) for r in served.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want and len(got) > 0


def test_fuzzy_pairs_block_not_function_of_name(spark):
    # ADVICE r5: when the caller's block key is NOT a pure function of
    # the name, (a) a pair sharing several blocks must emit ONE row,
    # and (b) identical names in different blocks must NOT pair
    from streamz_spark.operators.dedup import fuzzy_levenshtein_pairs

    rows = [
        # same name, different blocks: must not pair (strict blocking)
        (1, "alpha", "b1"),
        (2, "alpha", "b2"),
        # near-dup names inside one block: exactly one pair row
        (3, "gamma", "b3"),
        (4, "gamm", "b3"),
        # same name-pair repeated across two blocks via extra rows:
        # each in-block id pair once, never a cross-block pair
        (5, "delta", "b4"),
        (6, "delt", "b4"),
        (7, "delta", "b5"),
        (8, "delt", "b5"),
    ]
    df = spark.createDataFrame(rows, "pk long, name string, blk string")
    out = fuzzy_levenshtein_pairs(
        df, id_col="pk", name_col="name", block="blk", max_dist=2
    ).collect()
    got = [(r.id_a, r.id_b) for r in out]
    assert sorted(got) == [(3, 4), (5, 6), (7, 8)]  # no dups, no cross-block


def test_semdedup_drops_planted_semantic_duplicates(spark):
    """SemDeDup (kmeans arm): near-identical vectors must land in the
    same cluster and the larger-id copy must get keep=False; distinct
    base vectors survive."""
    import numpy as np

    rng = np.random.RandomState(13)
    base = rng.randn(30, 16).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in (v + 0.001 * rng.randn(16).astype("float32"))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.keep for r in dd.semdedup(
        df, n_clusters=6, threshold=0.9, centroids="kmeans"
    ).collect()}
    assert len(out) == 60  # one verdict row per input vector
    # every base vector kept (random 16-d gaussians are far apart)
    assert all(out[i] for i in range(30))
    # planted copies dropped when co-clustered (kmeans puts cosine~1
    # pairs together essentially always; allow a small miss margin)
    dropped = sum(1 for i in range(30) if not out[1000 + i])
    assert dropped >= 27, f"only {dropped}/30 planted duplicates dropped"


def test_dedup_paragraphs_planted_boilerplate(spark):
    """A shared 5-token block at an aligned window position survives
    only in the lowest-id doc; a fully duplicated doc empties; empty
    docs vanish; unique content is untouched."""
    boiler = "one two three four five"
    rows = [
        (1, boiler + " alpha beta gamma delta epsilon"),
        (2, boiler + " zeta eta theta iota kappa"),
        (3, boiler),          # nothing but the boilerplate: empties
        (4, "wholly unique words here"),
        (5, ""),              # no tokens: no output row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in dd.dedup_paragraphs(df, window=5).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1].text_deduped == boiler + " alpha beta gamma delta epsilon"
    assert out[1].n_paras_dropped == 0
    assert out[2].text_deduped == "zeta eta theta iota kappa"
    assert out[2].n_paras_dropped == 1
    assert out[3].text_deduped == ""
    assert (out[3].n_paras, out[3].n_paras_dropped) == (1, 1)
    assert out[4].text_deduped == "wholly unique words here"
    assert out[4].n_paras_dropped == 0


class TestIncrementalDedup:
    """incoming-vs-index screening: exact drop, fuzzy drop, and the
    kept-by-contract within-incoming duplicate."""

    BASE = "the quick brown fox jumps over the lazy dog again and again today"

    def _frames(self, spark):
        index = spark.createDataFrame(
            [
                (100, self.BASE),
                (101, "completely different historical content about ships"),
                (102, "another indexed doc with its own distinct words"),
            ],
            "doc_id long, text string",
        )
        near = self.BASE.replace("lazy", "sleepy")  # high-jaccard variant
        incoming = spark.createDataFrame(
            [
                (1, "  THE quick   brown fox jumps over the lazy dog again and again today "),  # exact dup of 100 after normalization
                (2, near),  # near-dup of 100
                (3, "fresh unseen incoming text that matches nothing at all"),
                (4, "fresh unseen incoming text that matches nothing at all"),  # dup WITHIN incoming -> kept
                (5, ""),  # empty: no shingles, survives fuzzy, no exact match
            ],
            "doc_id long, text string",
        )
        return incoming, index

    def test_screens_and_contract(self, spark):
        incoming, index = self._frames(spark)
        kept = sorted(
            r.doc_id
            for r in dd.incremental_dedup(
                incoming, index, num_perm=64, k=3, bands=16, threshold=0.5
            ).collect()
        )
        # 1 dropped (exact vs index), 2 dropped (fuzzy vs index),
        # 3 and 4 kept (within-incoming dup is NOT screened), 5 kept
        assert kept == [3, 4, 5]

    def test_output_keeps_all_columns(self, spark):
        incoming, index = self._frames(spark)
        out = dd.incremental_dedup(incoming, index)
        assert out.columns == incoming.columns

    def test_plan_no_cartesian(self, spark):
        from streamz_spark.plans import explain_string

        incoming, index = self._frames(spark)
        plan = explain_string(dd.incremental_dedup(incoming, index))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestIndexArtifacts:
    def test_precomputed_artifacts_identical(self, spark, tmp_path):
        # the production deployment: artifacts built once, persisted as
        # parquet, reloaded, and joined against — kept-set must be
        # identical to the lazy in-call derivation
        docs = load_table(spark, SF_DIR, "documents")
        inc = docs.where(F.col("doc_id") % 10 < 2)
        idx = docs.where(F.col("doc_id") % 10 >= 2)

        lazy = {
            r.doc_id for r in dd.incremental_dedup(inc, idx).collect()
        }

        fp, sh, band = dd.dedup_index_artifacts(idx)
        base = str(tmp_path / "index_artifacts")
        fp.write.mode("overwrite").parquet(base + "/fp")
        sh.write.mode("overwrite").parquet(base + "/sh")
        band.write.mode("overwrite").parquet(base + "/band")
        arts = (
            spark.read.parquet(base + "/fp"),
            spark.read.parquet(base + "/sh"),
            spark.read.parquet(base + "/band"),
        )
        stored = {
            r.doc_id
            for r in dd.incremental_dedup(inc, index_artifacts=arts).collect()
        }
        assert stored == lazy

    def test_requires_exactly_one_source(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        with pytest.raises(ValueError):
            dd.incremental_dedup(docs)
        with pytest.raises(ValueError):
            dd.incremental_dedup(docs, docs, index_artifacts=(1, 2, 3))


def test_ivf_ann_arrow_kernel_bit_equal(spark):
    """kernel='arrow' (vectorized cell assignment) must reproduce the
    SQL kernel's output BIT-exactly — same sequential fold order, same
    (d2, cell) tie ranking — on both the self-query and serving
    shapes."""
    emb = load_table(spark, SF_DIR, "embeddings")
    a = sim.ivf_ann(
        emb, k=5, n_cells=64, n_probe=3, centroids="seed", kernel="sql"
    ).collect()
    b = sim.ivf_ann(
        emb, k=5, n_cells=64, n_probe=3, centroids="seed", kernel="arrow"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    q = emb.filter(F.col("vec_id") < 50)
    a2 = sim.ivf_ann(
        emb, k=5, n_cells=64, n_probe=3, centroids="seed", queries=q,
        kernel="sql",
    ).collect()
    b2 = sim.ivf_ann(
        emb, k=5, n_cells=64, n_probe=3, centroids="seed", queries=q,
        kernel="arrow",
    ).collect()
    assert sorted(map(tuple, a2)) == sorted(map(tuple, b2))


def test_ann_kernel_auto_dispatch(spark, monkeypatch):
    """kernel='auto' size-dispatches on the plan-only row estimate:
    sql below _KERNEL_AUTO_ROWS (the test SF), arrow at/above (forced
    here by shrinking the threshold) — visible as the MapInArrow node
    in the plan."""
    from streamz_spark.plans.inspect import explain_string

    emb = load_table(spark, SF_DIR, "embeddings")
    plan_small = explain_string(
        sim.ivf_ann(emb, k=5, n_cells=16, n_probe=2, centroids="seed")
    )
    assert "MapInArrow" not in plan_small
    monkeypatch.setattr(sim, "_KERNEL_AUTO_ROWS", 1)
    plan_big = explain_string(
        sim.ivf_ann(emb, k=5, n_cells=16, n_probe=2, centroids="seed")
    )
    assert "MapInArrow" in plan_big
    plan_pq = explain_string(sim.pq_ann(emb, k=5, codebooks="seed"))
    assert "MapInArrow" in plan_pq


def test_pq_ann_arrow_kernel_bit_equal(spark):
    """kernel='arrow' (vectorized encode) must reproduce the SQL
    kernel's output BIT-exactly — same fold order, argmin-first ==
    (d2, j) struct-sort tie order."""
    emb = load_table(spark, SF_DIR, "embeddings")
    a = sim.pq_ann(emb, k=5, codebooks="seed", kernel="sql").collect()
    b = sim.pq_ann(emb, k=5, codebooks="seed", kernel="arrow").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pq_ann_finds_planted_near_duplicates(spark):
    """A near-identical vector quantizes to (almost) the same codes, so
    its ADC distance is minimal and the exact re-rank puts it at rank 1
    — the property PQ actually guarantees (kmeans production arm)."""
    import numpy as np

    rng = np.random.RandomState(13)
    base = rng.randn(30, 16).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in (v + 0.001 * rng.randn(16).astype("float32"))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.pq_ann(df, k=1, m=4, ks=8, rerank=10, query_limit=30, codebooks="kmeans")
    got = {(r.qid, r.cid) for r in out.filter(F.col("rank") == 1).collect()}
    expected = {(i, 1000 + i) for i in range(30)}
    recall = len(got & expected) / len(expected)
    assert recall >= 0.9, f"planted-pair recall {recall}"


def test_pq_ann_recall_rises_with_rerank_depth(spark):
    """ADC is a lossy scorer; the exact re-rank recovers what the
    shortlist kept, so recall@5 vs brute force must rise with the
    shortlist size (the PQ operating knob) and reach ≥0.85 at
    rerank=300 on the near-uniform synthetic embeddings (the hard
    case: no cluster structure for the codebooks to exploit)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    bf = {(r.qid, r.cid) for r in sim.brute_force_topk(emb, q, k=5).collect()}
    recalls = []
    for rr in (10, 100, 300):
        pq = sim.pq_ann(emb, k=5, rerank=rr, codebooks="kmeans")
        got = {(r.qid, r.cid) for r in pq.collect()}
        recalls.append(len(bf & got) / len(bf))
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    assert recalls[2] >= 0.85, recalls


def test_pq_ann_cosines_are_exact(spark):
    """The re-rank stage reports EXACT cosines (full-precision vectors,
    same fold as brute force) — PQ approximates the shortlist, never
    the reported distances."""
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    bf = {(r.qid, r.cid): r.cosine for r in sim.brute_force_topk(emb, q, k=999).collect()}
    for r in sim.pq_ann(emb, k=5, codebooks="seed").collect():
        assert r.cosine == bf[(r.qid, r.cid)], (r.qid, r.cid)


# --------------------------------------------------------------------------
# LSH parameter planner
# --------------------------------------------------------------------------

def test_plan_lsh_params_matches_repo_default():
    # the repo's production default (threshold 0.5, 64 perms, bands=16)
    # must be what the planner derives — the default isn't arbitrary
    from streamz_spark.operators.dedup import plan_lsh_params

    assert plan_lsh_params(0.5, 64) == (16, 4)


def test_plan_lsh_params_monotone_rows_in_threshold():
    # higher similarity targets need steeper S-curves: rows per band
    # must be non-decreasing in the threshold
    from streamz_spark.operators.dedup import plan_lsh_params

    rows = [plan_lsh_params(t, 128)[1] for t in (0.2, 0.4, 0.6, 0.8, 0.95)]
    assert rows == sorted(rows), rows


def test_plan_lsh_params_scurve_midpoint_near_threshold():
    # the chosen banding's S-curve midpoint (1/b)^(1/r) — where
    # candidate probability is ~0.5 — should land near the target
    from streamz_spark.operators.dedup import plan_lsh_params

    for t in (0.3, 0.5, 0.7):
        b, r = plan_lsh_params(t, 256)
        mid = (1.0 / b) ** (1.0 / r)
        assert abs(mid - t) < 0.15, (t, b, r, mid)


def test_plan_lsh_params_weights_shift_the_choice():
    # upweighting false negatives (recall-critical crawl dedup) must
    # never yield a steeper curve (more rows) than upweighting FPs
    from streamz_spark.operators.dedup import plan_lsh_params

    _, r_fn = plan_lsh_params(0.5, 128, fp_weight=0.1, fn_weight=0.9)
    _, r_fp = plan_lsh_params(0.5, 128, fp_weight=0.9, fn_weight=0.1)
    assert r_fn <= r_fp, (r_fn, r_fp)


def test_plan_lsh_params_validation():
    import pytest as _pytest

    from streamz_spark.operators.dedup import plan_lsh_params

    with _pytest.raises(ValueError):
        plan_lsh_params(0.0, 64)
    with _pytest.raises(ValueError):
        plan_lsh_params(1.0, 64)
    with _pytest.raises(ValueError):
        plan_lsh_params(0.5, 1)


def test_minhash_bands_auto_matches_default_at_defaults(spark):
    # bands="auto" routes through the planner; at (threshold=0.5,
    # num_perm=64) the planner derives the fixed default 16, so the
    # two calls must produce the identical pair set
    from streamz_spark.io import load_table as lt
    from streamz_spark.operators.dedup import minhash_near_duplicates

    docs = lt(spark, SF_DIR, "documents")
    fixed = {(r.id_a, r.id_b) for r in minhash_near_duplicates(docs).collect()}
    auto = {(r.id_a, r.id_b) for r in
            minhash_near_duplicates(docs, bands="auto").collect()}
    assert fixed == auto and len(fixed) > 0


def test_incremental_dedup_bands_auto(spark):
    # bands="auto" in the incremental path must match the fixed
    # default's kept set at the default (threshold, num_perm)
    from pyspark.sql import functions as F

    from streamz_spark.io import load_table as lt
    from streamz_spark.operators.dedup import incremental_dedup

    docs = lt(spark, SF_DIR, "documents").select("doc_id", "text")
    index = docs.where(F.col("doc_id") % 10 >= 5)
    incoming = docs.where(F.col("doc_id") % 10 < 5)
    fixed = {r.doc_id for r in incremental_dedup(incoming, index=index).collect()}
    auto = {r.doc_id for r in
            incremental_dedup(incoming, index=index, bands="auto").collect()}
    assert fixed == auto and len(fixed) > 0


def test_quality_funnel_rejects_empty_stages(spark):
    import pytest as _pytest

    from streamz_spark.operators.quality import quality_funnel

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        quality_funnel(df, [])
