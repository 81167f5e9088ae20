"""Skew tests at 10x the bench corpus: one blocking key planted in
40% of 50,000 documents (sf0.1 documents is 5,000 rows — the pair
generators must stay exact AND bounded when a hot key covers a large
corpus fraction, the regime where a naive posting self-join explodes
quadratically (20k docs sharing one shingle = 2x10^8 pairs).

Brute-force references use an inverted index (never all-pairs), so
they are independent implementations of the same spec, fast enough at
this size.
"""

from __future__ import annotations

import hashlib


def _h(i: int, j: int) -> int:
    return int.from_bytes(
        hashlib.md5(f"{i}:{j}".encode()).digest()[:4], "big"
    )


WORDS = [f"w{n:02d}" for n in range(50)]
N_DOCS = 50_000
HOT_EVERY = 5  # 2 of every 5 docs carry the hot boilerplate => 40%


def _corpus():
    docs = []
    for i in range(N_DOCS):
        toks = [WORDS[_h(i, j) % 50] for j in range(8)]
        if i % HOT_EVERY < 2:  # 40% of docs carry the hot shingle
            toks = ["hotkey", "hotkey", "hotkey"] + toks
        if i % 100 == 3:  # planted near-dup of the previous doc (i%5==3: not hot)
            toks = [WORDS[_h(i - 1, j) % 50] for j in range(8)] + [WORDS[_h(i, 99) % 50]]
        docs.append((i, " ".join(toks)))
    return docs


def test_ngram_jaccard_bounded_and_exact_at_10x_bench(spark):
    from collections import Counter, defaultdict

    from streamz_spark.operators import dedup as dd

    docs = _corpus()
    k, max_df, threshold = 3, 1_000, 0.5

    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    full = {i: shingles(t) for i, t in docs}
    df_count = Counter(s for sh in full.values() for s in sh)
    # the planted shingle is hot (covers 40% of the corpus) and is cut
    assert df_count["hotkey hotkey hotkey"] == N_DOCS * 2 // HOT_EVERY > max_df
    # inverted-index brute force over the POST-cutoff posting lists
    posting = defaultdict(list)
    for i, sh in full.items():
        for s in sh:
            if df_count[s] <= max_df:
                posting[s].append(i)
    inter = Counter()
    for ids in posting.values():
        if len(ids) < 2:
            continue
        ids.sort()
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                inter[(ids[ai], ids[bi])] += 1
    want = set()
    for (a, b), n_common in inter.items():
        union = len(full[a]) + len(full[b]) - n_common
        if union > 0 and n_common / union >= threshold:
            want.add((a, b, n_common))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.n_common)
        for r in dd.ngram_jaccard_pairs(
            sdf, k=k, threshold=threshold, max_df=max_df
        ).collect()
    }
    assert got == want
    assert len(want) >= N_DOCS // 100 - 1  # the planted near-dups surfaced


def test_duplicated_spans_bounded_and_exact_at_10x_bench(spark):
    from streamz_spark.operators import dedup as dd

    from .test_property import _brute_spans

    docs = _corpus()
    k = 3
    want = _brute_spans(docs, k)
    # the hot boilerplate alone guarantees a span in 40% of docs
    assert len({i for i, *_ in want}) >= N_DOCS * 2 // HOT_EVERY
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_anchors)
        for r in dd.duplicated_spans(sdf, k=k).collect()
    }
    assert got == want
