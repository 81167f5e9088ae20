"""Property-based differential tests (hypothesis): random small frames
through the StreamingFrame expression surface vs pandas — randomized
coverage the reference's fixed fixtures don't give.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from streamz_spark.frame import StreamingFrame

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@st.composite
def xy_frame(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    xs = draw(st.lists(finite, min_size=n, max_size=n))
    ys = draw(st.lists(finite, min_size=n, max_size=n))
    ks = draw(st.lists(st.integers(min_value=0, max_value=3), min_size=n, max_size=n))
    return pd.DataFrame({"id": range(n), "k": ks, "x": xs, "y": ys})


@given(pdf=xy_frame())
@settings(max_examples=12, deadline=None)
def test_arithmetic_and_mask_match_pandas(spark, pdf):
    sf = StreamingFrame(
        spark.createDataFrame(pdf, "id long, k long, x double, y double"),
        order_col="id",
    )
    expr = (sf["x"] * 2 - sf["y"] / 3 + 1).to_frame()
    got = expr.to_pandas()["x"].to_numpy()
    want = (pdf["x"] * 2 - pdf["y"] / 3 + 1).to_numpy()
    np.testing.assert_allclose(np.sort(got), np.sort(want), rtol=1e-12)

    mask = sf[(sf["x"] > 0) & (sf["y"] <= 100)]
    want_n = len(pdf[(pdf.x > 0) & (pdf.y <= 100)])
    assert mask.to_pandas().shape[0] == want_n


@given(pdf=xy_frame())
@settings(max_examples=10, deadline=None)
def test_grouped_sum_matches_pandas(spark, pdf):
    sf = StreamingFrame(
        spark.createDataFrame(pdf, "id long, k long, x double, y double"),
        order_col="id",
    )
    got = (
        sf.groupby("k")["x"].sum().to_pandas().set_index("k")["x_sum"].sort_index()
    )
    want = pdf.groupby("k")["x"].sum().sort_index()
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-9, atol=1e-9)


@given(pdf=xy_frame(), n=st.integers(min_value=1, max_value=5))
@settings(max_examples=10, deadline=None)
def test_rolling_sum_matches_pandas(spark, pdf, n):
    from streamz_spark.operators.windows import rolling_count_window

    df = spark.createDataFrame(pdf, "id long, k long, x double, y double")
    got = (
        rolling_count_window(df, "id", {"r": ("x", "sum")}, n=n)
        .toPandas().sort_values("id", ignore_index=True)["r"]
    )
    want = pdf.sort_values("id")["x"].rolling(n, min_periods=1).sum()
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-9, atol=1e-9)


@st.composite
def asof_frames(draw):
    n_left = draw(st.integers(min_value=1, max_value=15))
    n_right = draw(st.integers(min_value=1, max_value=15))
    ts = st.integers(min_value=0, max_value=100)
    ks = st.integers(min_value=0, max_value=2)
    left = pd.DataFrame({
        "k": draw(st.lists(ks, min_size=n_left, max_size=n_left)),
        "t": draw(st.lists(ts, min_size=n_left, max_size=n_left, unique=True)),
    })
    right = pd.DataFrame({
        "k": draw(st.lists(ks, min_size=n_right, max_size=n_right)),
        "t": draw(st.lists(ts, min_size=n_right, max_size=n_right, unique=True)),
        "rv": [float(i) for i in range(n_right)],
    })
    return left, right


@given(frames=asof_frames())
@settings(max_examples=10, deadline=None)
def test_asof_join_matches_merge_asof(spark, frames):
    """Homegrown union-carry as-of join vs pandas.merge_asof (backward,
    per-key) — randomized differential over the tricky operator."""
    from streamz_spark.operators.joins import asof_join

    left, right = frames
    ldf = spark.createDataFrame(left, "k long, t long")
    rdf = spark.createDataFrame(right, "k long, t long, rv double")
    got = (
        asof_join(ldf, rdf, on="t", by=["k"], right_cols=["rv"])
        .toPandas().sort_values(["k", "t"], ignore_index=True)
    )
    want = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"),
        on="t", by="k", direction="backward",
    ).sort_values(["k", "t"], ignore_index=True)
    assert got["rv_right"].where(got["rv_right"].notna(), -1).tolist() == \
        want["rv"].where(want["rv"].notna(), -1).tolist()


@given(data=st.data())
@settings(max_examples=5, deadline=None)
def test_paired_cosine_bit_exact_vs_expression(spark, data):
    """The Arrow-vectorized pair verify must be BIT-identical to the
    aggregate(zip_with(...)) expression (same IEEE fold order) — the
    invariant the ANN/near-dup oracles rely on."""
    from pyspark.sql import functions as F

    from streamz_spark.operators.similarity import paired_cosine, with_norm

    n = data.draw(st.integers(min_value=1, max_value=8))
    dim = data.draw(st.integers(min_value=1, max_value=16))
    vals = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32)
    rows = [
        (i, [data.draw(vals) for _ in range(dim)], [data.draw(vals) for _ in range(dim)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, a array<float>, b array<float>")
    va = with_norm(df.select("id", F.col("a").alias("v")), "v", "norm") \
        .select("id", F.col("v").alias("va"), F.col("norm").alias("na"))
    vb = with_norm(df.select("id", F.col("b").alias("v")), "v", "norm") \
        .select("id", F.col("v").alias("vb"), F.col("norm").alias("nb"))
    j = va.join(vb, "id")

    from streamz_spark.operators.similarity import cosine_expr

    expr_out = j.select("id", cosine_expr("va", "vb", "na", "nb").alias("cosine")) \
        .toPandas().set_index("id")["cosine"].sort_index()
    arrow_out = paired_cosine(j, "va", "vb", "na", "nb") \
        .select("id", "cosine").toPandas().set_index("id")["cosine"].sort_index()
    # bit-exact: no tolerance
    assert expr_out.tolist() == arrow_out.tolist()


@st.composite
def event_frame(draw):
    """Random keyed event-time data: timestamps cluster so sessions of
    every shape (singleton, chains, exact-boundary-adjacent) appear."""
    n = draw(st.integers(min_value=1, max_value=40))
    keys = draw(st.lists(st.integers(min_value=0, max_value=3), min_size=n, max_size=n))
    # offsets in seconds; gaps straddle the 600s session gap used below
    offs = draw(st.lists(st.integers(min_value=0, max_value=5000), min_size=n, max_size=n))
    vals = draw(st.lists(finite, min_size=n, max_size=n))
    return pd.DataFrame({
        "event_id": range(n),
        "user_id": keys,
        "ts": pd.to_datetime(1_700_000_000 + np.array(offs), unit="s"),
        "value": vals,
    })


@given(pdf=event_frame())
@settings(max_examples=10, deadline=None)
def test_session_window_equals_cumsum_on_random_events(spark, pdf):
    """The F.session_window aggregation and the lag-gap-cumsum
    construction must carve identical sessions on ARBITRARY event data
    (per-user multisets of (n_events, session_value) agree)."""
    from pyspark.sql import Window as W, functions as F

    from streamz_spark.operators.windows import session_window_agg

    gap_s = 600
    df = spark.createDataFrame(pdf, "event_id long, user_id long, ts timestamp, value double")

    got = session_window_agg(
        df, "ts", f"{gap_s} seconds",
        aggs={"n_events": F.count(F.lit(1)),
              "session_value": F.round(F.sum("value"), 4)},
        keys=["user_id"],
    ).toPandas()

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1).otherwise(0)
    wc = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    want = (
        df.withColumn("session_id", F.sum(new_sess).over(wc))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("session_value"))
        .toPandas()
    )
    cols = ["user_id", "n_events", "session_value"]
    g = got[cols].sort_values(cols, ignore_index=True)
    x = want[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(g, x)


@st.composite
def corpus_and_bench(draw):
    words = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
    n = draw(st.integers(min_value=1, max_value=20))
    docs = [
        " ".join(draw(st.lists(words, min_size=0, max_size=12))) for _ in range(n)
    ]
    bench_ids = draw(st.lists(st.integers(min_value=0, max_value=n - 1),
                              min_size=0, max_size=max(1, n // 2), unique=True))
    return docs, bench_ids


@given(data=corpus_and_bench())
@settings(max_examples=8, deadline=None)
def test_bloom_contamination_equals_exact_on_random_corpora(spark, data):
    """bloom_prefilter=True must return EXACTLY the exact path's output
    on arbitrary corpora/benchmarks (no false negatives by construction;
    false positives eliminated by the verify join)."""
    from streamz_spark.operators.contamination import contamination_check

    docs_txt, bench_ids = data
    pdf = pd.DataFrame({"doc_id": range(len(docs_txt)), "text": docs_txt})
    docs = spark.createDataFrame(pdf, "doc_id long, text string")
    bench = docs.filter(docs.doc_id.isin([int(i) for i in bench_ids]) if bench_ids else "false")

    kw = dict(k=2, threshold=0.5)
    exact = contamination_check(docs, bench, **kw).toPandas()
    bloom = contamination_check(
        docs, bench, bloom_prefilter=True, bloom_expected_items=1000, **kw
    ).toPandas()
    cols = sorted(exact.columns)
    e = exact.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    b = bloom.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(e, b)


# ---------------------------------------------------------------- codecs
# pure-Python roundtrips (no Spark): any (dims, payload) the encoder
# accepts must decode back to exact dims and exact mean — stride
# padding, header grammar, and sample packing can't drift

@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    data=st.data(),
)
@settings(max_examples=50, deadline=None)
def test_ppm_bmp_roundtrip_random(w, h, data):
    from streamz_spark.operators.codecs import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * 3, max_size=w * h * 3,
            )
        )
    )
    want_mean = sum(pixels) / len(pixels)
    for enc, dec in ((encode_ppm, decode_ppm), (encode_bmp, decode_bmp)):
        meta = dec(enc(w, h, pixels))
        assert (meta["height"], meta["width"], meta["n_channels"]) == (h, w, 3)
        assert meta["mean_pixel"] == want_mean


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=500
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(min_value=1, max_value=2),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_random(samples, rate, channels):
    from streamz_spark.operators.codecs import decode_wav, encode_wav

    if channels == 2 and len(samples) % 2:
        samples = samples + [0]  # interleaved stereo needs even count
    meta = decode_wav(encode_wav(samples, sample_rate=rate, n_channels=channels))
    assert meta["n_channels"] == channels
    assert meta["sample_rate"] == rate
    assert meta["n_frames"] == len(samples) // channels
    assert meta["duration_s"] == (len(samples) // channels) / rate
    assert meta["mean_abs_amplitude"] == sum(abs(s) for s in samples) / len(samples)


# ------------------------------------------------- boilerplate shingles
@st.composite
def boiler_corpus(draw):
    # small vocabulary forces genuine cross-doc shingle collisions
    vocab = ["aa", "bb", "cc", "dd"]
    n_docs = draw(st.integers(min_value=1, max_value=8))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(min_value=0, max_value=12))
        docs.append((i, " ".join(draw(st.sampled_from(vocab)) for _ in range(n_words))))
    return docs


@given(docs=boiler_corpus(), k=st.integers(min_value=2, max_value=3),
       min_docs=st.integers(min_value=2, max_value=3))
@settings(max_examples=15, deadline=None)
def test_common_shingle_stats_matches_python(spark, docs, k, min_docs):
    from streamz_spark.operators.quality import common_shingle_stats

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = (
        common_shingle_stats(df, k=k, min_docs=min_docs)
        .toPandas().sort_values("doc_id", ignore_index=True)
    )
    # pure-Python reference
    shingles = {}
    for i, text in docs:
        toks = text.lower().split()
        shingles[i] = {
            " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
        }
    from collections import Counter

    df_count = Counter(s for ss in shingles.values() for s in ss)
    for _, r in got.iterrows():
        ss = shingles[r.doc_id]
        n_common = sum(1 for s in ss if df_count[s] >= min_docs)
        assert r.n_shingles == len(ss), (r.doc_id, r.n_shingles, len(ss))
        assert r.n_common == n_common
        want_frac = n_common / len(ss) if ss else 0.0
        assert r.common_frac == want_frac
    assert len(got) == len(docs)


# --------------------------------------------------------------------------
# ngram_jaccard_pairs differential: the posting-array pair expansion
# (operators/dedup.py) vs a brute-force pure-Python Jaccard over every
# pair — guards the transform/slice/flatten rewrite on random corpora,
# including the max_df cutoff semantics.
# --------------------------------------------------------------------------

@st.composite
def random_corpus(draw):
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    n_docs = draw(st.integers(min_value=2, max_value=10))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(min_value=0, max_value=12))
        docs.append(
            (i, " ".join(draw(st.lists(st.sampled_from(words), min_size=n_words,
                                       max_size=n_words))))
        )
    max_df = draw(st.one_of(st.none(), st.integers(min_value=2, max_value=6)))
    return docs, max_df


@given(data=random_corpus())
@settings(max_examples=10, deadline=None)
def test_ngram_jaccard_pairs_match_bruteforce(spark, data):
    from streamz_spark.operators import dedup as dd

    docs, max_df = data
    k = 2

    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    sets = {i: shingles(t) for i, t in docs}
    if max_df is not None:
        from collections import Counter

        df_count = Counter(s for sh in sets.values() for s in sh)
        sets = {i: {s for s in sh if df_count[s] <= max_df} for i, sh in sets.items()}
        # per-doc sizes in the operator are PRE-cutoff (full shingle set)
        full_sets = {i: shingles(t) for i, t in docs}
    else:
        full_sets = sets
    want = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(full_sets[a]) + len(full_sets[b]) - inter
            if inter > 0 and union > 0 and inter / union >= 0.3:
                want.add((a, b, inter))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.n_common)
        for r in dd.ngram_jaccard_pairs(
            sdf, k=k, threshold=0.3, max_df=max_df
        ).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# duplicated_spans differential: k-gram anchors + gaps-and-islands
# interval merge (operators/dedup.py) vs a brute-force pure-Python
# reference, on corpora with PLANTED duplicated spans (the operator's
# reason to exist) plus random noise.
# --------------------------------------------------------------------------

def _brute_spans(docs, k, min_count=2):
    from collections import Counter

    grams = Counter()
    per_doc = {}
    for i, text in docs:
        toks = text.lower().split()
        gs = [" ".join(toks[p:p + k]) for p in range(len(toks) - k + 1)]
        per_doc[i] = gs
        grams.update(gs)
    want = set()
    for i, gs in per_doc.items():
        anchors = [p for p, g in enumerate(gs) if grams[g] >= min_count]
        cur = None  # (start, last_anchor, n_anchors)
        for p in anchors:
            if cur is not None and p <= cur[1] + k:
                cur = (cur[0], p, cur[2] + 1)
            else:
                if cur is not None:
                    want.add((i, cur[0], cur[1] + k - 1, cur[1] - cur[0] + k, cur[2]))
                cur = (p, p, 1)
        if cur is not None:
            want.add((i, cur[0], cur[1] + k - 1, cur[1] - cur[0] + k, cur[2]))
    return want


@st.composite
def span_corpus(draw):
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    k = draw(st.integers(min_value=2, max_value=3))
    n_docs = draw(st.integers(min_value=2, max_value=8))
    phrase_len = draw(st.integers(min_value=k, max_value=k + 3))
    phrase = draw(st.lists(st.sampled_from(words), min_size=phrase_len,
                           max_size=phrase_len))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(min_value=0, max_value=10))
        toks = draw(st.lists(st.sampled_from(words), min_size=n_words,
                             max_size=n_words))
        if draw(st.booleans()):  # plant the shared phrase in ~half the docs
            at = draw(st.integers(min_value=0, max_value=len(toks)))
            toks = toks[:at] + phrase + toks[at:]
        docs.append((i, " ".join(toks)))
    return docs, k


@given(data=span_corpus())
@settings(max_examples=10, deadline=None)
def test_duplicated_spans_match_bruteforce(spark, data):
    from streamz_spark.operators import dedup as dd

    docs, k = data
    want = _brute_spans(docs, k)
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_anchors)
        for r in dd.duplicated_spans(sdf, k=k).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# Skew-adversarial differentials: the pair generators were rewritten
# for skew (posting arrays + max_df; distinct-name levenshtein) but
# the random corpora above are benign. These generators PLANT one hot
# shingle / blocking key in 30-50% of rows and assert (a) exactness
# vs brute force and (b) that the fan-out bound actually engages.
# --------------------------------------------------------------------------

@st.composite
def hot_shingle_corpus(draw):
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    n_docs = draw(st.integers(min_value=10, max_value=20))
    hot_frac = draw(st.floats(min_value=0.3, max_value=0.5))
    n_hot = max(2, int(n_docs * hot_frac))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(min_value=2, max_value=8))
        toks = draw(st.lists(st.sampled_from(words), min_size=n_words,
                             max_size=n_words))
        if i < n_hot:  # plant the hot boilerplate shingle
            toks = ["hotkey", "hotkey"] + toks
        docs.append((i, " ".join(toks)))
    max_df = draw(st.integers(min_value=2, max_value=n_hot - 1))
    return docs, max_df, n_hot


@given(data=hot_shingle_corpus())
@settings(max_examples=10, deadline=None)
def test_ngram_jaccard_exact_under_planted_hot_shingle(spark, data):
    from collections import Counter

    from streamz_spark.operators import dedup as dd

    docs, max_df, n_hot = data
    k = 2

    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    full = {i: shingles(t) for i, t in docs}
    df_count = Counter(s for sh in full.values() for s in sh)
    # the planted shingle must actually be hot AND actually cut
    assert df_count["hotkey hotkey"] == n_hot > max_df
    kept = {i: {s for s in sh if df_count[s] <= max_df} for i, sh in full.items()}
    want = set()
    ids = sorted(kept)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(kept[a] & kept[b])
            union = len(full[a]) + len(full[b]) - inter
            if inter > 0 and union > 0 and inter / union >= 0.2:
                want.add((a, b, inter))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.n_common)
        for r in dd.ngram_jaccard_pairs(
            sdf, k=k, threshold=0.2, max_df=max_df
        ).collect()
    }
    assert got == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@st.composite
def hot_block_rows(draw):
    stems = ["brass", "steel", "nickl", "coper", "zincc"]
    n_rows = draw(st.integers(min_value=10, max_value=24))
    hot_frac = draw(st.floats(min_value=0.3, max_value=0.5))
    n_hot = max(2, int(n_rows * hot_frac))
    rows = []
    for i in range(n_rows):
        blk = "hotblock" if i < n_hot else draw(st.sampled_from(stems))
        stem = draw(st.sampled_from(stems))
        mut = draw(st.integers(min_value=0, max_value=2))
        name = stem[:len(stem) - mut] + "x" * mut
        rows.append((i, f"{name} {blk}", blk))
    return rows, n_hot


@given(data=hot_block_rows())
@settings(max_examples=10, deadline=None)
def test_fuzzy_pairs_exact_under_planted_hot_block(spark, data):
    from streamz_spark.operators import dedup as dd

    rows, n_hot = data
    # brute force INSIDE blocks only (independent python levenshtein)
    want = set()
    for ia, na_, ba in rows:
        for ib, nb_, bb in rows:
            if ia < ib and ba == bb and _lev(na_, nb_) <= 2:
                want.add((ia, ib, na_, nb_, _lev(na_, nb_)))
    # the hot block must dominate: 30-50% of rows share one key
    assert sum(1 for _, _, b in rows if b == "hotblock") == n_hot
    sdf = spark.createDataFrame(rows, "pk long, name string, blk string")
    got = {
        (r.id_a, r.id_b, r.name_a, r.name_b, r.dist)
        for r in dd.fuzzy_levenshtein_pairs(
            sdf, id_col="pk", name_col="name", block="blk", max_dist=2
        ).collect()
    }
    assert got == want


@st.composite
def labeled_corpus(draw):
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    n = draw(st.integers(min_value=4, max_value=24))
    rows = []
    has = {True: False, False: False}
    for i in range(n):
        y = draw(st.booleans())
        k = draw(st.integers(min_value=1, max_value=8))
        toks = [draw(st.sampled_from(vocab)) for _ in range(k)]
        rows.append((i, " ".join(toks), y))
        has[y] = True
    # both classes non-empty (operator contract)
    if not has[True]:
        rows.append((n, "alpha beta", True))
    if not has[False]:
        rows.append((n + 1, "gamma delta", False))
    return rows


@given(rows=labeled_corpus(), vlim=st.one_of(st.none(), st.integers(2, 6)))
@settings(max_examples=15, deadline=None)
def test_nb_classifier_matches_independent_python_nb(spark, rows, vlim):
    # differential vs a from-scratch Python multinomial NB with the
    # same top-V/OOV/Laplace construction — the Spark plan's integer
    # micro-nat scores must floor the identical real-valued model
    import math

    from streamz_spark.operators.text import nb_quality_classifier

    alpha = 1.0
    toks = {i: t.lower().split() for i, t, _ in rows}
    labels = {i: y for i, _, y in rows}
    cnt_pos, cnt_neg = {}, {}
    for i, ts in toks.items():
        for t in ts:
            d = cnt_pos if labels[i] else cnt_neg
            d[t] = d.get(t, 0) + 1
    vocab = sorted(
        set(cnt_pos) | set(cnt_neg),
        key=lambda t: (-(cnt_pos.get(t, 0) + cnt_neg.get(t, 0)), t),
    )
    lm = set(vocab[:vlim]) if vlim is not None else set(vocab)
    n_pos, n_neg = sum(cnt_pos.values()), sum(cnt_neg.values())
    in_pos = sum(cnt_pos.get(t, 0) for t in lm)
    in_neg = sum(cnt_neg.get(t, 0) for t in lm)
    v = len(lm)
    dpos = float(n_pos) + alpha * (v + 1)
    dneg = float(n_neg) + alpha * (v + 1)
    d_pos = sum(1 for y in labels.values() if y)
    d_neg = sum(1 for y in labels.values() if not y)
    prior = math.floor((math.log(float(d_pos)) - math.log(float(d_neg))) * 1e6)

    def llr(t):
        cp = cnt_pos.get(t, 0) if t in lm else n_pos - in_pos
        cn = cnt_neg.get(t, 0) if t in lm else n_neg - in_neg
        return math.floor(
            (math.log((float(cp) + alpha) / dpos)
             - math.log((float(cn) + alpha) / dneg)) * 1e6
        )

    want = {
        i: sum(llr(t) for t in ts) + prior for i, ts in toks.items() if ts
    }
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    got = {
        r.doc_id: r.score_micro
        for r in nb_quality_classifier(df, "y", vocab_limit=vlim).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# Targeted decontamination: both implementations (relational semi-join
# + inline expression fold) vs a brute-force python reference on
# random corpora with a planted benchmark phrase
# --------------------------------------------------------------------------

def _brute_contam_spans(docs, bench_texts, k):
    bench_grams = set()
    for t in bench_texts:
        w = t.lower().split()
        for i in range(len(w) - k + 1):
            bench_grams.add(" ".join(w[i:i + k]))
    want = set()
    for i, text in docs:
        toks = text.lower().split()
        pos = [p for p in range(len(toks) - k + 1)
               if " ".join(toks[p:p + k]) in bench_grams]
        cur = None
        for p in pos:
            if cur is not None and p <= cur[1] + k:
                cur = (cur[0], p, cur[2] + 1)
            else:
                if cur is not None:
                    want.add((i, cur[0], cur[1] + k - 1, cur[1] - cur[0] + k, cur[2]))
                cur = (p, p, 1)
        if cur is not None:
            want.add((i, cur[0], cur[1] + k - 1, cur[1] - cur[0] + k, cur[2]))
    return want


@st.composite
def contam_corpus(draw):
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    k = draw(st.integers(min_value=2, max_value=3))
    phrase_len = draw(st.integers(min_value=k, max_value=k + 3))
    phrase = draw(st.lists(st.sampled_from(words), min_size=phrase_len,
                           max_size=phrase_len))
    bench_texts = [" ".join(phrase)]
    n_docs = draw(st.integers(min_value=2, max_value=8))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(min_value=0, max_value=10))
        toks = draw(st.lists(st.sampled_from(words), min_size=n_words,
                             max_size=n_words))
        if draw(st.booleans()):  # plant the benchmark phrase in ~half
            at = draw(st.integers(min_value=0, max_value=len(toks)))
            toks = toks[:at] + phrase + toks[at:]
        docs.append((i, " ".join(toks)))
    return docs, bench_texts, k


@given(data=contam_corpus())
@settings(max_examples=10, deadline=None)
def test_contamination_spans_both_impls_match_bruteforce(spark, data):
    from pyspark.sql import functions as F

    from streamz_spark.operators.contamination import (
        contamination_spans,
        contamination_spans_inline,
    )
    from streamz_spark.operators.text import word_kgrams

    docs, bench_texts, k = data
    want = _brute_contam_spans(docs, bench_texts, k)
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(j, t) for j, t in enumerate(bench_texts)], "doc_id long, text string"
    )
    got_rel = {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_anchors)
        for r in contamination_spans(sdf, bench, k=k).collect()
    }
    assert got_rel == want
    gh = [
        r["gh"]
        for r in bench.select(F.explode(word_kgrams("text", k)).alias("g"))
        .select(F.xxhash64("g").alias("gh")).distinct().collect()
    ]
    got_inline = {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_anchors)
        for r in contamination_spans_inline(sdf, gh, k=k).collect()
    }
    assert got_inline == want
