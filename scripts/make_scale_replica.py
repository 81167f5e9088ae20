"""Synthesize an N× scale replica of a testdata SF directory.

Deterministic, seed-free: replica i of a table shifts every key column
by ``i * (max_key + 1)`` and token-salts text columns (every token of
replica i > 0 gets an ``_i`` suffix). Salting keeps the duplicate
*rate* realistic while scaling the true pair set exactly N× — replicas
share no shingles, so each is an isolated shard of content and every
dedup/contamination relation (exact dups, near-dup pairs, duplicated
spans, benchmark hits) is exactly N copies of the base relation. This
is the protocol behind SCALE.md's measured-scaling tables.

Key consistency across tables is preserved (l_orderkey and o_orderkey
shift by the same offset, etc.), so TPC-H joins shard cleanly. Pure
dimension tables (region, nation) are copied once, unshifted.

Usage: python scripts/make_scale_replica.py [N] [src_sf_dir] [out_dir] [tables...]
Defaults: N=10, src=/root/testdata/sf0.1, out=<repo>/.scale/sf1,
tables=all. Passing an explicit table list (e.g. just ``documents``)
builds a partial replica — enough for the documents-only operator
family at 100× without writing 100×-replicated fact tables.

Partial-replica caveat: key-domain offsets are computed from the
INCLUDED tables only, so a partial replica is self-consistent but NOT
key-compatible with a full replica built at the same N — e.g. a
domain whose max key lives in an excluded table gets a smaller offset.
Never mix a partial replica's table into a previously built full
replica; rebuild the full set (or the same subset) instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.session import get_spark

# key columns shifted per replica, grouped by shared key domain so
# joins stay consistent (same offset on both sides of every equi-join)
KEY_DOMAINS = {
    "order": {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
    "supp": {"supplier": ["s_suppkey"], "lineitem": ["l_suppkey"]},
    "part": {"part": ["p_partkey"], "lineitem": ["l_partkey"]},
    "cust": {"customer": ["c_custkey"], "orders": ["o_custkey"]},
    "doc": {"documents": ["doc_id"]},
    "emb": {"embeddings": ["vec_id"]},
    "event": {"events": ["event_id"]},
    "user": {"events": ["user_id"]},
}
# text columns token-salted per replica (replica 0 is verbatim).
# documents.text uses STOPWORD-PRESERVING salting: the language-id
# stopword hits must survive so the quality/lang gate keeps replica
# docs (plain whole-token salting turned every replica doc into
# lang='und' and silently cut language-gated pipelines back to 1x);
# consecutive-stopword shingles are the only cross-replica overlap —
# far below any near-dup threshold.
SALTED = {"documents": ["text"], "part": ["p_name"]}
LANG_PRESERVING = {"documents"}
# embedding columns get a per-replica SIGNED-PERMUTATION (orthogonal)
# transform: replica i>0 maps component j to ±old[π_i(j)], with the
# permutation and signs drawn deterministically from md5(i, j) on the
# driver. A signed permutation is orthogonal and exact in IEEE floats
# (±1 multiplication and element reordering introduce no rounding), so
# every WITHIN-replica dot product / cosine equals the base value to
# the last ulp of summation order — the true near-dup pair set and
# per-query ANN ranking are exactly N copies — while CROSS-replica
# cosines scramble to the independent-vector regime ~N(0, 1/d): each
# replica is an isolated shard of embedding space, the
# similarity-family analogue of token salting. (Pure sign flips leave
# same-base-vector cross pairs at σ=sqrt(3/d) — measured |cos| up to
# 0.44 at d=64 — too heavy-tailed for clean pair invariants; verbatim
# copies would make every vector a 100-way exact duplicate and measure
# the pathological dup-heavy regime, not data scaling.)
SIGN_PERMUTED = {"embeddings": ["embedding"]}


def _signed_perm(i: int, d: int):
    """Deterministic signed permutation for replica i over d dims:
    π = argsort of md5(i, j), signs = md5 parity. Python-side so the
    randomness source is engine-independent and stable across runs."""
    import hashlib

    def h(*parts) -> int:
        return int.from_bytes(
            hashlib.md5("|".join(map(str, parts)).encode()).digest()[:8], "big"
        )

    perm = sorted(range(d), key=lambda j: h("perm", i, j))
    signs = [1 if h("sign", i, j) % 2 == 0 else -1 for j in range(d)]
    return perm, signs
# pure dimensions: copied once, never replicated
DIMENSIONS = ("region", "nation")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def replicate(spark, src: str, out: str, n: int, tables=None) -> None:
    os.makedirs(out, exist_ok=True)
    tables = tuple(tables) if tables else TABLES
    # one offset per key domain: max over every column in the domain
    offsets: dict[str, int] = {}
    for dom, tabs in KEY_DOMAINS.items():
        if not any(t in tables for t in tabs):
            continue
        hi = 0
        for tab, cols in tabs.items():
            if tab not in tables:
                continue
            df = load_table(spark, src, tab)
            for c in cols:
                hi = max(hi, int(df.agg(F.max(c)).first()[0]))
        offsets[dom] = hi + 1
    for tab in tables:
        base = load_table(spark, src, tab)
        dst = os.path.join(out, f"{tab}.parquet")
        if tab in DIMENSIONS:
            base.write.mode("overwrite").parquet(dst)
            continue
        copies = []
        for i in range(n):
            c = base
            for dom, tabs in KEY_DOMAINS.items():
                if dom not in offsets:
                    continue
                for col in tabs.get(tab, []):
                    c = c.withColumn(col, F.col(col) + F.lit(i * offsets[dom]))
            if i > 0:
                for col in SALTED.get(tab, []):
                    if tab in LANG_PRESERVING:
                        from streamz_spark.operators.text import STOPWORDS

                        stop = sorted(
                            {w for ws in STOPWORDS.values() for w in ws}
                        )
                        sw = F.array(*[F.lit(w) for w in stop])
                        toks = F.split(F.col(col), r"\s+")
                        c = c.withColumn(
                            col,
                            F.array_join(
                                F.transform(
                                    toks,
                                    lambda t: F.when(
                                        F.array_contains(sw, F.lower(t)), t
                                    ).otherwise(F.concat(t, F.lit(f"_{i}"))),
                                ),
                                " ",
                            ),
                        )
                    else:
                        c = c.withColumn(
                            col, F.regexp_replace(F.col(col), r"(\S+)", f"$1_{i}")
                        )
                for col in SIGN_PERMUTED.get(tab, []):
                    d = len(base.select(col).first()[0])
                    perm, signs = _signed_perm(i, d)
                    src_el = [
                        F.element_at(F.col(col), perm[j] + 1) for j in range(d)
                    ]
                    c = c.withColumn(
                        col,
                        F.array(*[
                            src_el[j] if signs[j] > 0 else -src_el[j]
                            for j in range(d)
                        ]),
                    )
            copies.append(c)
        u = copies[0]
        for c in copies[1:]:
            u = u.unionByName(c)
        u.write.mode("overwrite").parquet(dst)
        print(f"{tab}: {base.count()} -> {spark.read.parquet(dst).count()} rows", flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(repo, ".scale", "sf1")
    tables = sys.argv[4:] or None
    spark = get_spark("scale-replica")
    replicate(spark, src, out, n, tables=tables)
    spark.stop()


if __name__ == "__main__":
    main()
