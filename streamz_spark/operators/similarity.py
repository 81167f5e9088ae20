"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(n·m), fine for reranking
and for small query sets against broadcastable corpora. Scale path:
random-hyperplane LSH bucketing (Charikar's SimHash for cosine) so
candidate generation shuffles on bucket keys instead of cross-joining;
verify step is exact cosine on candidates only.

All vector math is F.zip_with / F.aggregate over double-cast arrays —
JVM-side, codegen'd, no Python in the loop. The hyperplanes are
deterministic pseudo-random values derived from xxhash64(dim, plane),
so results are reproducible without shipping a random matrix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = [
    "with_norm",
    "cosine_expr",
    "brute_force_topk",
    "hyperplane_lsh_ann",
    "ivf_ann",
    "pq_ann",
    "hybrid_rrf_topk",
]


def with_norm(df: DataFrame, vec_col: str = "v", norm_col: str = "norm") -> DataFrame:
    """Attach the L2 norm (double) of a vector column."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(vec_col, v).withColumn(
        norm_col, F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    )


def cosine_expr(a: str, b: str, norm_a: str, norm_b: str) -> Column:
    """cosine(a, b) given precomputed norms; 0.0 for zero vectors."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col(norm_a) * F.col(norm_b)
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def paired_cosine(
    df: DataFrame, va: str, vb: str, na: str, nb: str, out: str = "cosine"
) -> DataFrame:
    """Append cosine(va, vb) to each row — the vectorized verify for
    candidate-pair frames (millions of pairs after LSH bucketing).

    Bit-identical to :func:`cosine_expr` (and the DuckDB oracles): the
    dot accumulates dimension-by-dimension left-to-right like
    ``aggregate(zip_with(...))``, the denominator is the same
    ``na*nb`` product, zero-norm pairs get 0.0. Per-pair the numpy fold
    is ~100x the interpreted expression fold, which is what makes the
    LSH verify cheaper than the O(n²) BLAS prefilter past ~20k vectors.
    """
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out, DoubleType())])
    names = df.columns
    ia, ib = names.index(va), names.index(vb)
    ina, inb = names.index(na), names.index(nb)

    def gen(batches):
        # mapInArrow: list<double> columns flatten to one contiguous
        # float64 buffer (zero-copy) — no per-row Python conversion,
        # which dominated a mapInPandas version by ~10x at 600k pairs
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            if rb.column(ia).null_count or rb.column(ib).null_count:
                # flatten() drops null slots -> rows would misalign
                raise ValueError(
                    "paired_cosine requires non-null vectors; filter nulls upstream"
                )
            A = rb.column(ia).flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
            B = rb.column(ib).flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
            acc = np.zeros(n, dtype=np.float64)
            for d in range(A.shape[1]):  # sequential fold == SQL order
                acc += A[:, d] * B[:, d]
            denom = (
                rb.column(ina).to_numpy(zero_copy_only=False)
                * rb.column(inb).to_numpy(zero_copy_only=False)
            )
            cos = np.where(denom > 0, acc / np.where(denom > 0, denom, 1.0), 0.0)
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [pa.array(cos, type=pa.float64())],
                names=names + [out],
            )

    return df.mapInArrow(gen, schema)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-matches).

    The query side is broadcast (small by construction); the corpus
    streams through — no shuffle of the big side, ranking is a window
    partitioned by query id. Deterministic tie-break on corpus id.
    """
    from streamz_spark.io import ensure_scan_parallelism

    # the big side streams through narrowly; fan a low-split scan out
    # so the per-row cosine work uses every core (no-op at scale)
    corpus = ensure_scan_parallelism(corpus)
    c = with_norm(corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")), "cv", "cnorm")
    q = with_norm(queries.select(F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv")), "qv", "qnorm")
    scored = (
        c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            cosine_expr("qv", "cv", "qnorm", "cnorm").alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def _hyperplane_sign(vec_col: str, plane: int, dim: int, style: str = "gaussianish") -> Column:
    """Sign bit of <v, r_plane> for a deterministic pseudo-random plane.

    ``style="gaussianish"`` (default): r_plane[d] in [-1, 1) from
    xxhash64(d, plane) — the production path.
    ``style="rademacher"``: r_plane[d] ∈ {+1, -1} from the parity of an
    md5 hex digit of "plane:d". Rademacher vectors are a valid
    sign-random-projection family for cosine LSH (Achlioptas-style
    sparse projections), and — unlike float hyperplanes — the same
    component values are reproducible in DuckDB SQL, so the whole LSH
    pipeline is oracle-checkable: ±x folds are exact in IEEE, leaving
    no cross-engine float divergence in the bucket assignment.
    """
    r = F.lit(_plane_components(plane, dim, style))
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), r, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (dot >= 0).cast("int")


def _plane_components(plane: int, dim: int, style: str) -> list[float]:
    """Deterministic pseudo-random plane, computed DRIVER-side: the
    components depend only on (plane, d) — per-row hashing expressions
    cost more than the dot product itself.

    ``rademacher``: exact analogue of the DuckDB oracle's
    ``('0x' || substr(md5(plane || ':' || d), 32, 1))::INT % 2`` —
    python md5 == Spark md5 == DuckDB md5, so the values are
    bit-identical to what the SQL recomputes.
    ``gaussianish``: floats in [-1, 1) from md5 bytes — deterministic,
    library-free, a valid sign-random-projection family.
    """
    import hashlib

    if style == "rademacher":
        return [
            1.0 if int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[31], 16) % 2 == 0
            else -1.0
            for d in range(dim)
        ]
    return [
        int.from_bytes(hashlib.md5(f"g:{plane}:{d}".encode()).digest()[:8], "big", signed=True)
        / float(2**63)
        for d in range(dim)
    ]


def lsh_buckets(
    v: DataFrame, planes: int, tables: int, dim: int, plane_style: str = "gaussianish"
) -> DataFrame:
    """(id, v, norm) → one row per (id, table) with the `planes`-bit
    bucket signature. The shared candidate-generation core for LSH ANN
    and LSH near-dup pairing.

    Vectorized Arrow pass, not expressions: tables*planes higher-order
    aggregate folds cost ~2s of codegen PER PLAN BUILD (re-paid on
    every query invocation — measured at planes=10, tables=4), dwarfing
    execution. The numpy path folds dimension-by-dimension in the SAME
    left-to-right order as the SQL ``aggregate(zip_with(...))`` and the
    DuckDB oracle's ``list_sum(list_transform(...))``, so bucket bits
    stay bit-identical (float64 add/mul are IEEE-identical everywhere).
    Scales: plane matrix is a closure constant (~tables*planes*dim*8
    bytes), partition-parallel, no shuffle.
    """
    import numpy as np

    P = np.array(
        [_plane_components(t * planes + p, dim, plane_style)
         for t in range(tables) for p in range(planes)],
        dtype=np.float64,
    )  # (tables*planes, dim)
    pow2 = 2 ** np.arange(planes, dtype=np.int64)
    in_schema = v.schema
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    out_schema = StructType(
        list(in_schema.fields)
        + [StructField("tbl", IntegerType()), StructField("bucket", LongType())]
    )

    def bucketize(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            acc = np.zeros((len(pdf), P.shape[0]), dtype=np.float64)
            # sequential per-dimension fold == SQL aggregate order
            for d in range(dim):
                acc += V[:, d : d + 1] * P[:, d]
            bits = (acc >= 0).astype(np.int64).reshape(len(pdf), tables, planes)
            buckets = (bits * pow2).sum(axis=2)  # (n, tables)
            for t in range(tables):
                out = pdf.copy()
                out["tbl"] = np.int32(t)
                out["bucket"] = buckets[:, t]
                yield out

    return v.mapInPandas(bucketize, schema=out_schema)


# kernel="auto" crossover: the Arrow kernels carry a fixed ~0.5-1 s of
# Python-worker spin-up per query on local[32] (measured: the three
# ANN bench entries ran 0.2-0.9 s slower walls at sf0.1's 2k vectors
# despite 25-89% less executor CPU), while the Catalyst kernels' CPU
# grows ~rows * n_cells * dim. At ~20k vectors the SQL assignment
# already burns seconds of CPU and the spin-up amortizes; at the 100x
# replica (200k vectors) arrow measured 1.2-5.4x wall and 1.5-127x
# CPU ahead (OPTIMIZATION_r09.md). Estimated plan-only from parquet
# footers; unknown sizes keep the SQL arm (safe locally, and a real
# 100 TB corpus always has file scans underneath).
_KERNEL_AUTO_ROWS = 20_000


def _resolve_kernel(kernel: str, corpus: DataFrame) -> str:
    if kernel == "auto":
        from streamz_spark.io import estimate_scan_rows

        n = estimate_scan_rows(corpus)
        return "arrow" if n is not None and n >= _KERNEL_AUTO_ROWS else "sql"
    if kernel not in ("sql", "arrow"):
        raise ValueError(f"kernel must be auto|sql|arrow, got {kernel!r}")
    return kernel


def _assign_cells_arrow(frame: DataFrame, cent_rows, probe_n: int) -> DataFrame:
    """Arrow kernel for IVF cell assignment: per input row emit the
    ``probe_n`` nearest cells as ``(id, v, norm, cell, rnk)``.

    Bit-identical to the Catalyst ``scored_cells`` projection in
    :func:`ivf_ann`: the squared L2 fold accumulates
    dimension-by-dimension left-to-right (each ``acc += (x-c)²`` step
    is the same IEEE add the ``aggregate(zip_with(...))`` fold
    performs, in the same order), and ties rank by lowest cell id via
    a stable argsort over cells packed in ascending order — the same
    total order as ``array_sort`` on ``(d2, cell)`` structs. Per-row
    cost is ~dim numpy ops instead of n_cells·dim interpreted lambda
    steps (n_cells=√n grows with the corpus, which is what makes the
    Catalyst form the CPU wall at scale)."""
    import numpy as np

    cents = np.asarray([c for _, c in cent_rows], dtype=np.float64)
    cell_ids = np.asarray([ci for ci, _ in cent_rows], dtype=np.int32)

    def gen(batches):
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            x = rb.column(1).flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
            acc = np.zeros((n, cents.shape[0]), dtype=np.float64)
            for t in range(x.shape[1]):  # sequential fold == SQL order
                d = x[:, t, None] - cents[None, :, t]
                acc += d * d
            # stable sort on d2: equal keys keep ascending cell order,
            # matching array_sort on (d2, cell)
            order = np.argsort(acc, axis=1, kind="stable")[:, :probe_n]
            reps = order.shape[1]
            idx = np.repeat(np.arange(n), reps)
            cells = cell_ids[order.ravel()]
            rnk = np.tile(np.arange(1, reps + 1, dtype=np.int64), n)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0).take(pa.array(idx)),
                    rb.column(1).take(pa.array(idx)),
                    rb.column(2).take(pa.array(idx)),
                    pa.array(cells, type=pa.int32()),
                    pa.array(rnk, type=pa.int64()),
                ],
                names=["id", "v", "norm", "cell", "rnk"],
            )

    return frame.select("id", "v", "norm").mapInArrow(
        gen, "id bigint, v array<double>, norm double, cell int, rnk bigint"
    )


def ivf_ann(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    n_probe: int = 3,
    seed: int = 42,
    centroids: str = "kmeans",
    queries: DataFrame | None = None,
    query_id_col: str = "vec_id",
    kernel: str = "auto",
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize vectors to their nearest
    centroid cell; candidates = pairs whose cells overlap within each
    query's ``n_probe`` closest cells. Assignment and probing are
    broadcast joins against the tiny centroid table, and the candidate
    join shuffles on cell id — the FAISS-style scale path when the full
    matrix no longer broadcasts (cells shard independently).

    ``centroids="kmeans"`` (default) trains MLlib KMeans on the corpus
    (deterministic seed, best cell balance). ``centroids="seed"`` uses
    the ``n_cells`` lowest-id corpus vectors as fixed centroids —
    coarser cells, but the whole pipeline becomes reproducible in plain
    SQL (the oracle-checkable variant; FAISS's random-seed init without
    the Lloyd iterations).

    ``n_cells=None`` (default) picks ``ceil(sqrt(n))``, the standard
    IVF sizing: candidate work per query scales with the cell size
    n/n_cells, so a fixed cell count degrades quadratically as the
    corpus grows (measured: 8 cells on a 25k corpus = ~230M candidate
    dot products; sqrt-sizing keeps it at ~n^1.5 total).

    ``queries=None`` (default) self-queries the corpus (every vector is
    both index entry and query — the all-pairs audit shape; total work
    ~n^1.5 with sqrt cells). Passing ``queries`` is the SERVING shape:
    the corpus is indexed once and only the query workload probes it —
    per-query cost is n_probe·(n/n_cells) ≈ n_probe·√n, so a fixed
    workload over a 100× corpus costs ~10×, not 1000× (this is how an
    ANN index is actually consumed at 100 TB). Self-matches (same id)
    are excluded either way.

    ``kernel`` selects the cell-assignment implementation: the
    Catalyst projection (``"sql"``) or a vectorized mapInArrow kernel
    (``"arrow"``) — bit-identical by construction (sequential
    per-dimension fold, stable tie order; differential-tested and
    checksum-verified at sf0.1 and 100×). Per-row assignment cost
    drops from n_cells·dim interpreted lambda steps to ~dim numpy
    ops, which matters more as n_cells=√n grows with the corpus.
    ``"auto"`` (default) size-dispatches on a plan-only corpus row
    estimate: arrow at ≥ ``_KERNEL_AUTO_ROWS`` vectors, sql below
    (the Arrow kernel's fixed worker spin-up dominates tiny inputs) —
    the same dispatch contract as ``unigram_nll_quality(lm_join=
    "auto")``; measured A/B at both scales in OPTIMIZATION_r09.md.
    """
    import math

    spark = corpus.sparkSession
    from streamz_spark.io import ensure_scan_parallelism

    kernel = _resolve_kernel(kernel, corpus)
    corpus = ensure_scan_parallelism(corpus)
    v = with_norm(corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v", "norm")
    if n_cells is None:
        n_cells = max(4, math.ceil(math.sqrt(v.count())))

    if centroids == "seed":
        seed_rows = v.orderBy("id").limit(n_cells).select("id", "v").collect()
        cent_rows = [(ci, [float(x) for x in r["v"]]) for ci, r in enumerate(seed_rows)]
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        # Train on a bounded sample: Lloyd iterations over the full
        # corpus are pointless (centroid quality saturates long before
        # 100k vectors) and a full-corpus fit is a scale hazard at the
        # 100 TB target. Assignment below still covers every vector.
        max_train = 100_000
        n = v.count()
        train_src = (
            v.sample(fraction=min(1.0, max_train / n), seed=seed) if n > max_train else v
        )
        train = train_src.select("id", array_to_vector(F.col("v")).alias("features"))
        model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(train)
        cent_rows = [
            (ci, [float(x) for x in c]) for ci, c in enumerate(model.clusterCenters())
        ]
    # probe cells per vector WITHOUT a shuffle: all centroids ride in
    # ONE broadcast row (array<struct<cell,cvec>>), every cell distance
    # is scored inside a single projection, and the n_probe nearest
    # fall out of array_sort on (d2, cell) structs. The previous
    # row_number-window formulation shuffled corpus_size x n_cells rows
    # EACH carrying the full vector (~800 MB at 25k x 64d), which
    # dominated the query; this path is narrow end-to-end and the only
    # shuffle left in ivf_ann is the candidate join on cell id.
    cent_packed = F.broadcast(
        spark.createDataFrame(
            [(cent_rows,)], "cents array<struct<cell:int,cvec:array<double>>>"
        )
    )
    scored_cells = F.array_sort(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(F.col("v"), c["cvec"], lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d2"),
                c["cell"].alias("cell"),
            ),
        )
    )
    def _probed(frame, probe_n):
        if kernel == "arrow":
            return _assign_cells_arrow(frame, cent_rows, probe_n)
        return (
            frame.crossJoin(cent_packed)
            .select(
                "id", "v", "norm",
                F.posexplode(F.slice(scored_cells, 1, probe_n)).alias("pos", "sc"),
            )
            .select(
                "id", "v", "norm",
                F.col("sc.cell").alias("cell"),
                (F.col("pos") + 1).alias("rnk"),
            )
        )

    if queries is None:
        # self-query: both candidate sides (probed queries, primary-cell
        # corpus) read the probe subtree — persist so the centroid
        # scoring runs once
        probes = _probed(v, n_probe).persist()
        q_probes = probes
    else:
        # serving shape: the corpus side only needs its PRIMARY cell
        # (the inverted file); only the query workload probes n_probe
        # cells. Each subtree has a single consumer — no persist.
        probes = _probed(v, 1)
        qv = with_norm(
            queries.select(
                F.col(query_id_col).alias("id"), F.col(vec_col).alias("v")
            ),
            "v", "norm",
        )
        q_probes = _probed(qv, n_probe)

    a = q_probes.select(F.col("id").alias("qid"), F.col("v").alias("qv"),
                        F.col("norm").alias("qnorm"), "cell")
    b = probes.filter(F.col("rnk") == 1).select(
        F.col("id").alias("cid"), F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"), "cell",
    )
    cand = (
        a.join(b, "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine_expr("qv", "cv", "qnorm", "cnorm").alias("cosine"))
        .distinct()
    )
    wr = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return cand.withColumn("rank", F.row_number().over(wr)).filter(F.col("rank") <= k)


def lsh_auto_planes(n: int, bucket_target: int = 50,
                    lo: int = 8, hi: int = 20) -> int:
    """Scale the signature width with the corpus: planes =
    ceil(log2(n / bucket_target)) clamped to [lo, hi], holding the
    EXPECTED bucket occupancy (and so per-table candidate work
    ~n·bucket_target) constant as n grows. Fixed planes are the
    classic LSH scale trap — candidate pairs grow ~n²/2^planes, i.e.
    quadratically (measured: ann_lsh_topk at planes=10 went from 2 s
    at 2k vectors to >15 min at 200k before this round's rewrite);
    log-scaled planes keep the candidate volume linear in n. The
    recall cost of wider signatures is the standard trade: collision
    probability per table is (1−θ/π)^planes, so hold recall by raising
    ``tables`` (S-curve: recall = 1−(1−p^planes)^tables) — at cosine
    0.9 and planes 12, 8 tables give ~0.74, 16 give ~0.93."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(2.0, n / bucket_target)))))


def hyperplane_lsh_ann(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = 12,
    tables: int = 4,
    dim: int | None = None,
    plane_style: str = "gaussianish",
) -> DataFrame:
    """Approximate all-pairs top-k via random-hyperplane LSH.

    Each of `tables` hash tables buckets vectors by a `planes`-bit
    signature; candidates = same-bucket pairs in any table; verify =
    exact cosine. Shuffle key = (table, bucket) — bounded fan-out,
    no cross join. Recall rises with `tables`, cost with
    `tables · planes`. ``planes=None`` auto-scales the signature with
    the corpus (see :func:`lsh_auto_planes` — constant bucket
    occupancy, linear candidate work; REQUIRED at scale: fixed planes
    are quadratic). ``plane_style="rademacher"`` uses ±1 planes
    reproducible in SQL oracles (see _hyperplane_sign).

    Verify shape (round-8 rewrite): the exact cosine is computed
    INSIDE the bucket self-join, where both vectors are already
    collocated by the (table, bucket) exchange, and multi-table
    duplicate pairs are collapsed by a groupBy over NARROW
    (qid, cid, cosine) tuples. The previous shape deduped bare id
    pairs first and then re-attached both vectors via two more
    shuffle joins — at 200k vectors × 1.6e8 candidates that re-attach
    moved ~160 GB of vector payload and dominated the query by
    minutes; re-scoring a multi-table duplicate costs one 64-FLOP
    expression instead. Same results bit-for-bit: the cosine is a
    deterministic expression of the pair, so max() over duplicate
    collisions returns the single value the old verify computed.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    # no scan fan-out: the bucketed frame is persisted and both join
    # sides shuffle on (table, bucket) right away — measured +80% from
    # the extra exchange + tiny-partition persist at sf0.1
    v = with_norm(corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v", "norm")
    if planes is None:
        planes = lsh_auto_planes(v.count())
    # persist: both self-join sides read the bucketed frame; without it
    # the hyperplane-signature expression tree (planes*tables*dim terms)
    # evaluates twice
    buckets = lsh_buckets(v, planes, tables, dim, plane_style).persist()

    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("qid"),
            F.col("b.id").alias("cid"),
            cosine_expr("a.v", "b.v", "a.norm", "b.norm").alias("cosine"),
        )
        # collapse multi-table collisions: every duplicate carries the
        # SAME deterministic cosine, so max == the unique verify value
        .groupBy("qid", "cid")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _pq_encode_arrow(v: DataFrame, cw, m: int, dsub: int) -> DataFrame:
    """Arrow kernel for PQ corpus encoding: ``(cid, codes)`` per row.

    Bit-identical to the Catalyst ``_code`` projection in
    :func:`pq_ann`: each subspace's squared-distance fold accumulates
    element-by-element left-to-right (same IEEE add sequence as
    ``aggregate(zip_with(...))``), and ``np.argmin`` returns the FIRST
    minimal index — lowest codeword j on ties, the same total order as
    ``array_sort`` on ``(d2, j)``. Per-row cost ~m·dsub numpy ops
    instead of m·ks·dsub interpreted lambda steps."""
    import numpy as np

    cw_np = [np.asarray(cw[s], dtype=np.float64) for s in range(m)]

    def gen(batches):
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            x = rb.column(1).flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * dsub:(s + 1) * dsub]
                acc = np.zeros((n, cw_np[s].shape[0]), dtype=np.float64)
                for t in range(dsub):  # sequential fold == SQL order
                    d = xs[:, t, None] - cw_np[s][None, :, t]
                    acc += d * d
                codes[:, s] = np.argmin(acc, axis=1)
            offsets = pa.array(
                np.arange(0, (n + 1) * m, m, dtype=np.int32), type=pa.int32()
            )
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    pa.ListArray.from_arrays(
                        offsets, pa.array(codes.ravel(), type=pa.int32())
                    ),
                ],
                names=["cid", "codes"],
            )

    return v.select("id", "v").mapInArrow(gen, "cid bigint, codes array<int>")


def pq_ann(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    ks: int = 16,
    rerank: int = 30,
    query_limit: int = 20,
    seed: int = 42,
    codebooks: str = "seed",
    kernel: str = "auto",
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): split each vector
    into ``m`` subspaces, quantize each sub-vector to one of ``ks``
    codewords, score candidates by asymmetric distance (ADC — the
    query stays full-precision, the corpus is looked up through its
    codes), then exact-cosine re-rank the top ``rerank`` candidates.

    This is the memory arm of the ANN family: IVF (`ivf_ann`) bounds
    the *candidate count*, PQ bounds the *bytes per candidate* — an
    ``m``-byte code replaces the full vector in the scan, so at the
    100 TB target the ADC pass moves ``m + 8`` bytes per corpus row
    instead of ``8·dim`` (a 64-d float64 corpus shrinks 128×; FAISS's
    IVFADC composes both, and the two operators here compose the same
    way: run `ivf_ann`'s cell assignment first, then this scan inside
    probed cells). Encoding is a NARROW projection (argmin over the
    packed broadcast codebook inside one expression — no shuffle, no
    UDF); the only exchange is the rerank-candidate window, which sees
    ``(qid, cid, adc)`` triples, never vectors. Full vectors are
    touched again only for the ``queries × rerank`` winners.

    ``codebooks="seed"`` uses the ``ks`` lowest-id corpus vectors'
    sub-vectors as codewords — every stage (encode, ADC, re-rank)
    reproduces in plain SQL, so the whole index is oracle-checkable
    (same bar as `ivf_ann(centroids="seed")` / the Rademacher LSH).
    ``codebooks="kmeans"`` trains one KMeans per subspace on a bounded
    sample (the production default; recall-tested in
    tests/test_dedup.py). Determinism: every fold is sequential
    left-to-right (= SQL order), ADC adds the m partial distances in
    explicit subspace order, ties break on lowest codeword / lowest
    candidate id.

    ``kernel="arrow"`` runs the corpus ENCODE stage as a vectorized
    mapInArrow kernel (bit-identical: sequential per-element fold,
    argmin-first tie order == the (d2, j) struct sort;
    differential-tested) — per-row cost ~m·dsub numpy ops instead of
    m·ks·dsub interpreted lambda steps. ``"auto"`` (default)
    size-dispatches like :func:`ivf_ann`: arrow at ≥
    ``_KERNEL_AUTO_ROWS`` estimated corpus rows, sql below. See
    OPTIMIZATION_r09.md for the sf0.1 / 100× A/B governing the
    crossover.

    No reference equivalent (streamz has no vector search); the
    capability-superset entry alongside brute/LSH/IVF.
    """
    spark = corpus.sparkSession
    from streamz_spark.io import ensure_scan_parallelism

    kernel = _resolve_kernel(kernel, corpus)
    corpus = ensure_scan_parallelism(corpus)
    v = with_norm(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v", "norm"
    )
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m

    if codebooks == "seed":
        seed_rows = v.orderBy("id").limit(ks).select("v").collect()
        cw = [
            [[float(x) for x in r["v"][s * dsub:(s + 1) * dsub]] for r in seed_rows]
            for s in range(m)
        ]
    elif codebooks == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        max_train = 100_000
        n = v.count()
        train_src = (
            v.sample(fraction=min(1.0, max_train / n), seed=seed) if n > max_train else v
        )
        train_src = train_src.select(
            *[F.slice("v", s * dsub + 1, dsub).alias(f"s{s}") for s in range(m)]
        ).persist()
        cw = []
        for s in range(m):
            train = train_src.select(array_to_vector(F.col(f"s{s}")).alias("features"))
            model = KMeans(k=ks, seed=seed + s, maxIter=10).fit(train)
            cw.append([[float(x) for x in c] for c in model.clusterCenters()])
        train_src.unpersist()
    else:
        raise ValueError(f"unknown codebooks mode: {codebooks!r}")

    # all m*ks codewords ride in ONE broadcast row, (s, j) ascending —
    # encoding and query-table construction are then narrow projections
    packed = F.broadcast(
        spark.createDataFrame(
            [([(s, j, cw[s][j]) for s in range(m) for j in range(ks)],)],
            "cbs array<struct<s:int,j:int,cw:array<double>>>",
        )
    )

    def _sub_d2(s: int, c):
        # sequential fold == SQL order (see paired_cosine)
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("v"), s * dsub + 1, dsub),
                c["cw"],
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def _code(s: int):
        # argmin_j d2: struct sort on (d2, j) — ties to lowest codeword
        scored = F.array_sort(
            F.transform(
                F.filter(F.col("cbs"), lambda c: c["s"] == F.lit(s)),
                lambda c: F.struct(_sub_d2(s, c).alias("d2"), c["j"].alias("j")),
            )
        )
        return F.element_at(scored, 1)["j"]

    if kernel == "arrow":
        codes = _pq_encode_arrow(v, cw, m, dsub)
    else:
        codes = (
            v.crossJoin(packed)
            .select(
                F.col("id").alias("cid"),
                F.array(*[_code(s) for s in range(m)]).alias("codes"),
            )
        )

    # per-query distance table: qdt[s][j] = d2(q_sub_s, cw[s,j]);
    # F.filter preserves the packed (s, j) order, so qdt[s] is j-asc
    def _qdt_s(s: int):
        # nested closures, NOT default-arg lambdas: pyspark counts a
        # `lambda c, s=s` as a two-arg (element, index) lambda and
        # binds s to the array index
        return F.transform(
            F.filter(F.col("cbs"), lambda c: c["s"] == F.lit(s)),
            lambda c: _sub_d2(s, c),
        )

    qdt = F.array(*[_qdt_s(s) for s in range(m)])
    q = (
        v.filter(F.col("id") < query_limit)
        .crossJoin(packed)
        .select(F.col("id").alias("qid"), qdt.alias("qdt"))
    )

    # ADC: explicit subspace-order addition (deterministic, = oracle's
    # pivoted t0+t1+...); rows are (qid, cid, adc) triples — no vectors
    adc = F.element_at(F.element_at("qdt", 1), F.element_at("codes", 1) + 1)
    for s in range(1, m):
        adc = adc + F.element_at(
            F.element_at("qdt", s + 1), F.element_at("codes", s + 1) + 1
        )
    cand = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", adc.alias("adc_d2"))
    )
    wa = W.partitionBy("qid").orderBy(F.col("adc_d2").asc(), F.col("cid").asc())
    shortlist = (
        cand.withColumn("arnk", F.row_number().over(wa))
        .filter(F.col("arnk") <= rerank)
        .select("qid", "cid")
    )

    # exact re-rank: only queries × rerank rows ever touch full vectors
    qa = v.filter(F.col("id") < query_limit).select(
        F.col("id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    ca = v.select(F.col("id").alias("cid"), F.col("v").alias("cv"), F.col("norm").alias("cn"))
    scored = (
        F.broadcast(shortlist)
        .join(qa, "qid")
        .join(ca, "cid")
        .select("qid", "cid", cosine_expr("qv", "cv", "qn", "cn").alias("cosine"))
    )
    wr = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    embs: DataFrame,
    terms: list[str],
    query_vec_id: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    arm_n: int = 50,
    k: int = 20,
    k0: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Hybrid ranked retrieval: a BM25 keyword arm and a cosine vector
    arm fused by Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009)
    — the standard production recipe for combining a lexical index with
    an embedding index, which neither `bm25_term_topk` nor the ANN
    operators cover alone.

    RRF(d) = Σ_arms 1/(k0 + rank_arm(d)) over each arm's top-``arm_n``
    list; a document absent from an arm contributes 0 from it. The
    reciprocal is computed as integer nano-units (``1e9 div (k0+rank)``)
    so the fused score is an exact integer — engine-identical, no float
    association anywhere in the fusion.

    Determinism: the text arm floors each per-term BM25 contribution to
    integer micro-units BEFORE the per-doc sum (same contract as
    `text.unigram_nll_quality` — integer SUM is associative, the only
    residual exposure is one ln landing within ulps of a floor
    boundary); the vector arm orders by the same left-to-right cosine
    fold the ANN oracles reproduce bit-exactly. Both arms tie-break on
    id, so every rank is total-ordered.

    Scale shape: the query-term filter lands before any shuffle (only
    postings for |terms| query terms shuffle); the 1-row query vector
    and corpus scalars broadcast; each arm ends in a TakeOrdered
    (orderBy+limit — no full sort); the fusion join and final ranking
    window touch ≤ 2·arm_n rows. No corpus-sized window exists in the
    plan.

    Output: ``(doc_id, text_rank, vec_rank, rrf_nanos, rank)`` —
    integer columns only (arm ranks are NULL where the doc missed that
    arm's top-n).
    """
    from streamz_spark.operators.text import token_count, tokenize

    # ---- text arm: per-doc BM25 over the query terms ------------------
    toks = tokenize(text_col)
    d = docs.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        F.size(toks).cast("long").alias("doc_len"),
    )
    scalars = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("total_tokens"),
    )
    term_lits = F.array(*[F.lit(t) for t in terms])
    postings = (
        d.select(
            "id",
            "doc_len",
            "toks",
            F.explode(F.array_intersect("toks", term_lits)).alias("term"),
        )
        .withColumn(
            "tf",
            F.size(F.filter("toks", lambda x: x == F.col("term"))).cast("long"),
        )
        .drop("toks")
    )
    # same barrier as bm25_term_topk: postings is query-term-bounded
    # (tiny), while its two consumers (df aggregate, contrib join)
    # would each re-run the corpus tokenize + array_intersect without it
    postings = postings.localCheckpoint(eager=False)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    contrib = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(scalars))
        .withColumn("avgdl", F.col("total_tokens") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df_count") + 0.5)
                / (F.col("df_count") + 0.5)
            ),
        )
        .withColumn(
            "bm25_micros",
            F.floor(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("doc_len") / F.col("avgdl")
                    )
                )
                * F.lit(1000000.0)
            ).cast("long"),
        )
    )
    text_scores = contrib.groupBy("id").agg(
        F.sum("bm25_micros").alias("bm25_micros")
    )
    # TakeOrdered (no full sort); the rank window runs over <= arm_n rows
    text_top = text_scores.orderBy(
        F.col("bm25_micros").desc(), F.col("id").asc()
    ).limit(arm_n)
    wt = W.orderBy(F.col("bm25_micros").desc(), F.col("id").asc())
    text_ranked = text_top.select(
        "id", F.row_number().over(wt).cast("long").alias("text_rank")
    )

    # ---- vector arm: cosine vs the broadcast 1-row query vector -------
    base = with_norm(
        embs.select(F.col(vec_id_col).alias("id"), F.col(vec_col).alias("v")),
        "v",
        "norm",
    )
    qrow = with_norm(
        embs.filter(F.col(vec_id_col) == query_vec_id).select(
            F.col(vec_col).alias("qv")
        ),
        "qv",
        "qnorm",
    )
    scored = base.crossJoin(F.broadcast(qrow)).select(
        "id", cosine_expr("v", "qv", "norm", "qnorm").alias("cosine")
    )
    vec_top = scored.orderBy(F.col("cosine").desc(), F.col("id").asc()).limit(
        arm_n
    )
    wv = W.orderBy(F.col("cosine").desc(), F.col("id").asc())
    vec_ranked = vec_top.select(
        "id", F.row_number().over(wv).cast("long").alias("vec_rank")
    )

    # ---- fusion: exact integer RRF over the union of the two lists ----
    rrf_scale = 1_000_000_000
    fused = (
        text_ranked.join(vec_ranked, "id", "full_outer")
        .withColumn(
            "rrf_nanos",
            (
                F.coalesce(
                    F.expr(f"{rrf_scale} div ({k0} + text_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"{rrf_scale} div ({k0} + vec_rank)"), F.lit(0)
                )
            ).cast("long"),
        )
    )
    wf = W.orderBy(F.col("rrf_nanos").desc(), F.col("id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "text_rank",
            "vec_rank",
            "rrf_nanos",
            "rank",
        )
    )
