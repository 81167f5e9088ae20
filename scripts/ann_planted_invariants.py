"""Planted-pair ANN/near-dup correctness invariants at 100x.

The synthetic embeddings carry no true near-dups above cosine 0.7
(measured: 14 pairs at 0.5, zero at 0.7+), so the main replica's
sharding invariants have no teeth for the similarity family. This
harness PLANTS them: the base corpus is the real embeddings table plus
one partner per query vector at cosine ~0.997, then the whole planted
corpus is replicated Nx through make_scale_replica's signed-permutation
transform (within-replica cosines preserved to the last ulp,
cross-replica cosines scrambled to the independent ~N(0,1/d) regime —
zero spurious pairs above 0.95 at any N that fits this machine).

Invariants (each with teeth):
1. near-dup pairs at the 0.95 default threshold == N x base EXACTLY,
   and the pair SET is exactly the planted set shifted per replica —
   a banding miss shows as a shortfall, a cross-replica leak as an
   extra pair (the isolation proof), a broken verify as a wrong set.
2. brute-force top-1 for every replica-0 query == its planted partner
   with the BASE cosine (to 1e-9): 100x more candidates must not
   displace a 0.997 partner when the next-best true cosine is <0.5
   and the cross-replica extreme is ~0.6.
3. IVF (serving shape: corpus indexed with sqrt-n cells, fixed query
   workload) recall of the planted partner in top-5 at Nx, reported
   against the base recall — the coarse quantizer must keep a 0.997
   pair co-located as cells shrink relative to the corpus.

Usage: python scripts/ann_planted_invariants.py [N] [base_sf_dir]
Defaults: N=100, base=/root/testdata/sf0.1. Writes planted parquet
under <repo>/.scale/planted_base and <repo>/.scale/planted<N>x.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PLANT = 20  # partners for the 20 lowest vec_ids (the ANN query set)
NOISE = 0.08  # relative perturbation -> cos ~ 1/sqrt(1+NOISE^2) ~ 0.9968


def build_planted_base(spark, base_dir: str, out_dir: str) -> None:
    """Write embeddings.parquet = base table + N_PLANT planted partners
    (partner id = original + id_stride, vector = unit-deterministic
    md5 perturbation of the original)."""
    import numpy as np
    import pandas as pd

    from streamz_spark.io import load_table

    emb = load_table(spark, base_dir, "embeddings").toPandas()
    emb = emb.sort_values("vec_id", ignore_index=True)
    stride = int(emb.vec_id.max()) + 1
    planted = []
    for _, row in emb.head(N_PLANT).iterrows():
        v = np.asarray(row.embedding, dtype=np.float64)
        d = len(v)
        # deterministic unit direction from md5 (engine-independent)
        u = np.array([
            int.from_bytes(
                hashlib.md5(f"plant|{row.vec_id}|{j}".encode()).digest()[:8],
                "big",
            ) / 2**63 - 1.0
            for j in range(d)
        ])
        u /= np.linalg.norm(u)
        w = v + NOISE * np.linalg.norm(v) * u
        planted.append({
            "vec_id": int(row.vec_id) + stride,
            "embedding": [float(x) for x in w],
            "label": row.label,
        })
    out = pd.concat([emb, pd.DataFrame(planted)], ignore_index=True)
    os.makedirs(out_dir, exist_ok=True)
    sdf = spark.createDataFrame(out[["vec_id", "embedding", "label"]])
    from pyspark.sql import functions as F

    sdf = sdf.withColumn("embedding", F.col("embedding").cast("array<float>"))
    sdf.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base_sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    planted_base = os.path.join(repo, ".scale", "planted_base")
    planted_rep = os.path.join(repo, ".scale", f"planted{n}x")

    from make_scale_replica import replicate

    from streamz_spark.io import load_table
    from streamz_spark.operators import similarity as sim
    from streamz_spark.operators.dedup import embedding_near_duplicates
    from streamz_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark("ann-planted-invariants")
    build_planted_base(spark, base_sf, planted_base)
    replicate(spark, planted_base, planted_rep, n, tables=["embeddings"])

    base = load_table(spark, planted_base, "embeddings")
    rep = load_table(spark, planted_rep, "embeddings")
    # planted-partner id stride (max vec_id of the ORIGINAL table + 1)
    stride = int(
        load_table(spark, base_sf, "embeddings").agg(F.max("vec_id")).first()[0]
    ) + 1
    # replica key offset: make_scale_replica shifts by max(vec_id)+1 of
    # the PLANTED base
    rep_off = int(base.agg(F.max("vec_id")).first()[0]) + 1

    results = []

    def check(name, ok, detail):
        results.append(ok)
        print(f"| {name} | {'PASS' if ok else 'FAIL'} | {detail} |", flush=True)

    print("| invariant | status | detail |")
    print("|---|---|---|")

    want_base_pairs = {(i, i + stride) for i in range(N_PLANT)}

    # 1a. base: blas arm (n <= 20k), margin guarantees no false negative
    got_base = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(base, threshold=0.95).collect()
    }
    check(
        "base near-dup pairs == planted set exactly",
        got_base == want_base_pairs,
        f"got {len(got_base)}, want {len(want_base_pairs)}, "
        f"sym-diff {len(got_base ^ want_base_pairs)}",
    )

    # 1b. Nx: lsh arm (n > 20k). Bucketing is a deterministic function
    # of the data, so recall is a fixed property, not a flaky sample;
    # the ISOLATION claim (zero cross-replica pairs) is exact.
    want_rep_pairs = {
        (i + r * rep_off, i + stride + r * rep_off)
        for i in range(N_PLANT)
        for r in range(n)
    }
    got_rep = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(rep, threshold=0.95).collect()
    }
    spurious = got_rep - want_rep_pairs
    recall = len(got_rep & want_rep_pairs) / len(want_rep_pairs)
    check(
        f"{n}x near-dup: zero spurious cross-replica pairs",
        not spurious,
        f"{len(spurious)} spurious of {len(got_rep)}",
    )
    check(
        f"{n}x near-dup: planted recall == 1.0 ({n}x base pair set)",
        recall == 1.0,
        f"recall {recall:.4f} ({len(got_rep & want_rep_pairs)}/{len(want_rep_pairs)})",
    )

    # 2. brute-force: replica-0 queries' top-1 == planted partner at
    # the base cosine despite 100x more candidates
    queries = base.filter(F.col("vec_id") < N_PLANT)
    bf_base = {
        r.qid: (r.cid, r.cosine)
        for r in sim.brute_force_topk(base, queries, k=1).collect()
    }
    bf_rep = {
        r.qid: (r.cid, r.cosine)
        for r in sim.brute_force_topk(rep, queries, k=1).collect()
    }
    top1_ok = all(
        bf_rep[q][0] == q + stride
        and abs(bf_rep[q][1] - bf_base[q][1]) < 1e-9
        for q in bf_base
    )
    check(
        f"{n}x brute-force top-1 == planted partner at base cosine",
        len(bf_rep) == N_PLANT and top1_ok,
        f"{sum(bf_rep[q][0] == q + stride for q in bf_rep)}/{N_PLANT} "
        f"top-1 hits",
    )

    # 3. IVF serving shape: sqrt-n cells over the Nx corpus, fixed
    # 20-query workload; partner must stay in top-5
    def ivf_recall(corpus):
        out = sim.ivf_ann(
            corpus, k=5, centroids="seed", queries=queries,
        ).filter(F.col("cid") == F.col("qid") + stride)
        return out.count() / N_PLANT

    r_base = ivf_recall(base)
    r_rep = ivf_recall(rep)
    check(
        f"{n}x IVF(sqrt-n cells) planted recall holds",
        r_rep >= max(0.8, r_base - 0.1),
        f"base recall {r_base:.2f}, {n}x recall {r_rep:.2f}",
    )

    n_fail = sum(1 for ok in results if not ok)
    print(f"\n{len(results) - n_fail}/{len(results)} invariants PASS", flush=True)
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
