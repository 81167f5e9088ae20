"""Differential tests: quality/PII/export operators vs pure-Python
reference implementations (the operators are expression-only, so any
divergence is a semantics bug, not float noise)."""

import re

import pytest
from pyspark.sql import Row, functions as F

from streamz_spark.operators import export as ex
from streamz_spark.operators import sampling as sa
from streamz_spark.operators import quality as q

DOCS = [
    # id, text
    (1, "the cat sat on the mat\nthe cat sat on the mat\nunique line here"),
    (2, "alpha beta gamma delta epsilon zeta eta theta"),
    (3, "spam spam spam spam spam spam spam spam spam spam"),
    (4, ""),
    (5, "   \n  \n "),
    (6, "one two three four five six seven eight nine ten " * 12),
    (7, "a b a b a b a b a b a b a b a b"),
    (8, "Line one\nline one\nLINE ONE\ndistinct"),
    # 40 distinct words, no repetition: the only doc the Gopher caps keep
    (9, " ".join(f"word{i:02d}" for i in range(40))),
]


def _tokens(text):
    # mirror Spark/DuckDB trim (ASCII-space only, NOT \n/\t) and split
    # semantics (leading/trailing empty fields kept with limit -1)
    t = text.strip(" ").lower()
    return re.split(r"\s+", t) if t else []


def _lines(text):
    return [ln.strip(" ") for ln in text.split("\n") if ln.strip(" ")]


def _grams(toks, n):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _dup_line_fracs(text):
    lines = _lines(text)
    if not lines:
        return 0.0, 0.0
    total, distinct = len(lines), len(set(lines))
    tc = sum(map(len, lines))
    dc = sum(map(len, set(lines)))
    return (total - distinct) / total, (tc - dc) / tc if tc else 0.0


def _top_frac(text, n):
    grams = _grams(_tokens(text), n)
    if not grams:
        return 0.0
    allc = sum(map(len, grams))
    from collections import Counter

    top = max(c * len(g) for g, c in Counter(grams).items())
    return top / allc if allc else 0.0


def _dup_frac(text, n):
    grams = _grams(_tokens(text), n)
    if not grams:
        return 0.0
    from collections import Counter

    allc = sum(map(len, grams))
    dup = sum(c * len(g) for g, c in Counter(grams).items() if c > 1)
    return dup / allc if allc else 0.0


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_repetition_signals_differential(docs_df):
    out = {
        r["doc_id"]: r
        for r in q.repetition_signals(docs_df).collect()
    }
    for doc_id, text in DOCS:
        r = out[doc_id]
        dlf, dlcf = _dup_line_fracs(text)
        assert r["dup_line_frac"] == pytest.approx(dlf, abs=0), (doc_id, "dup_line_frac")
        assert r["dup_line_char_frac"] == pytest.approx(dlcf, abs=0)
        for n in (2, 3, 4):
            assert r[f"top_{n}gram_char_frac"] == pytest.approx(_top_frac(text, n), abs=0), (
                doc_id,
                n,
            )
        for n in (5, 10):
            assert r[f"dup_{n}gram_char_frac"] == pytest.approx(_dup_frac(text, n), abs=0)


def test_gopher_filter_flags(docs_df):
    out = {r["doc_id"]: r for r in q.gopher_quality_filter(docs_df, min_words=5).collect()}
    # doc 3: one word repeated -> top_2gram_char_frac = 1.0 -> removed
    assert out[3]["keep"] is False
    # doc 7: alternating bigram repetition -> removed
    assert out[7]["keep"] is False
    # doc 9: 40 distinct words, no repetition -> kept
    assert out[9]["keep"] is True
    # empty docs removed by word count
    assert out[4]["keep"] is False and out[5]["keep"] is False


PII_DOCS = [
    (1, "contact me at john.doe+spam@example.co.uk or jane@x.io thanks"),
    (2, "server at 192.168.001.1 port 80; also 8.8.8.8"),
    (3, "call +1 (555) 123-4567 or 555.987.6543 now"),
    (4, "no pii here, just 3.14 and v1.2.3 strings"),
]


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    scrubbed = {r["doc_id"]: r["text"] for r in q.pii_scrub(df).collect()}
    for doc_id, text in PII_DOCS:
        expect = re.sub(q.PII_PATTERNS["email"], "<EMAIL>", text)
        expect = re.sub(q.PII_PATTERNS["ipv4"], "<IPV4>", expect)
        expect = re.sub(q.PII_PATTERNS["phone"], "<PHONE>", expect)
        assert scrubbed[doc_id] == expect, doc_id
    assert "<EMAIL>" in scrubbed[1] and "@" not in scrubbed[1]
    assert scrubbed[4] == PII_DOCS[3][1]  # untouched

    counts = {r["doc_id"]: r for r in q.pii_signals(df).collect()}
    assert counts[1]["n_email"] == 2
    assert counts[2]["n_ipv4"] == 2
    assert counts[3]["n_phone"] == 2
    assert counts[4]["n_email"] == counts[4]["n_ipv4"] == 0


def test_hash_split_deterministic(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in sa.hash_split_fast(df, "doc_id", 0.2, seed=7).collect()}
    # same assignment regardless of partitioning
    s2 = {
        r["doc_id"]: r["split"]
        for r in sa.hash_split_fast(df.repartition(13), "doc_id", 0.2, seed=7).collect()
    }
    assert s1 == s2
    frac = sum(1 for v in s1.values() if v == "test") / len(s1)
    assert 0.15 < frac < 0.25
    # different seed -> different assignment
    s3 = {r["doc_id"]: r["split"] for r in sa.hash_split_fast(df, "doc_id", 0.2, seed=8).collect()}
    assert s3 != s1


def test_deterministic_shuffle_order_stable(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    o1 = [r["doc_id"] for r in ex.deterministic_shuffle(df, "doc_id", seed=3, num_partitions=8).collect()]
    o2 = [
        r["doc_id"]
        for r in ex.deterministic_shuffle(df.repartition(11), "doc_id", seed=3, num_partitions=8).collect()
    ]
    assert o1 == o2
    assert sorted(o1) == list(range(500))
    assert o1 != list(range(500))  # actually shuffled


def test_pack_sequences(spark):
    rows = [Row(doc_id=i, n_tokens=(i * 37) % 900 + 10) for i in range(400)]
    df = spark.createDataFrame(rows)
    out = ex.pack_sequences(df, budget=2048, num_shards=4).collect()
    assert len(out) == 400
    assert sorted(r["id"] for r in out) == list(range(400))
    # pack invariants: fill = sum of members, fill <= budget unless singleton oversize
    from collections import defaultdict

    packs = defaultdict(list)
    for r in out:
        packs[r["pack_id"]].append(r)
    for pid, members in packs.items():
        fill = sum(m["n_tokens"] for m in members)
        assert all(m["pack_tokens"] == fill for m in members)
        if fill > 2048:
            assert len(members) == 1  # oversized doc -> singleton pack
    # determinism
    out2 = ex.pack_sequences(df, budget=2048, num_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # efficiency sanity: next-fit on sorted-desc shouldn't be pathological
    n_packs = len(packs)
    total = sum(r["n_tokens"] for r in rows)
    assert n_packs <= total // 2048 * 2 + 4


def test_oversized_doc_singleton(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, n_tokens=5000), Row(doc_id=2, n_tokens=100), Row(doc_id=3, n_tokens=200)]
    )
    out = ex.pack_sequences(df, budget=1024, num_shards=1).collect()
    big = [r for r in out if r["id"] == 1][0]
    assert big["pack_tokens"] == 5000
    small = [r for r in out if r["id"] != 1]
    assert {r["pack_id"] for r in small} != {big["pack_id"]}


def test_stratified_sample(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 10 < 8 else "de") for i in range(5000)], ["doc_id", "lang"]
    )
    out = sa.sample_fractions(df, "lang", {"en": 0.1, "de": 1.0}, seed=1).groupBy("lang").count()
    counts = {r["lang"]: r["count"] for r in out.collect()}
    assert counts["de"] == 1000
    assert 250 < counts["en"] < 550


def test_bpe_pretoken_cross_engine_agreement(spark):
    # the BPE pre-tokenizer pattern must produce identical counts in
    # Java regex (Spark), RE2 (DuckDB) and Python re — all
    # leftmost-first alternation; adversarial strings cover
    # contractions, unicode, digit/punct runs and whitespace edges
    import re

    import duckdb
    from pyspark.sql import functions as F

    from streamz_spark.operators.text import BPE_PRETOKEN_PATTERN, bpe_token_count

    texts = [
        "it's Tom's   can't we'll they'd I'm you've we're",
        "abc123def  45.6% -- $7,890!!",
        "  leading and trailing   ",
        "",
        "no-punct words only here",
        "UPPER lower MiXeD 000 111",
        "a'x b''y '' 's standalone",
        "tabs\tand\nnewlines\r\nmix",
        "!!!???...,,,;;;:::",
        "word",
    ]
    py = [len(re.findall(BPE_PRETOKEN_PATTERN, t)) for t in texts]
    sdf = spark.createDataFrame([(t,) for t in texts], ["text"])
    sp = [
        r["n_bpe_tokens"]
        for r in sdf.select(bpe_token_count("text")).collect()
    ]
    con = duckdb.connect()
    pat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    dk = [
        con.execute(
            f"SELECT len(regexp_extract_all(?, '{pat}'))", [t]
        ).fetchone()[0]
        for t in texts
    ]
    con.close()
    assert sp == py, (sp, py)
    assert dk == py, (dk, py)


def test_nb_classifier_separates_disjoint_vocab(spark):
    # classifier sanity with a known answer: two classes with disjoint
    # vocabularies must be perfectly separated on the training docs,
    # and an unlabeled-style mixed doc scores toward its dominant class
    from pyspark.sql import functions as F

    from streamz_spark.operators.text import nb_quality_classifier

    rows = [
        (1, "good clean prose text here", True),
        (2, "clean good text prose indeed", True),
        (3, "spam junk noise garbage stuff", False),
        (4, "junk spam garbage noise words", False),
        (5, "good clean prose junk text", True),  # majority-positive tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    out = {r.doc_id: r.pred for r in nb_quality_classifier(df, "y").collect()}
    assert out[1] and out[2] and out[5]
    assert not out[3] and not out[4]


def test_nb_train_apply_equals_monolithic(spark):
    # the split train/apply path must be value-identical to
    # nb_quality_classifier (per-term LLRs pre-collapsed to micro-nats
    # at train time — same floors, same sums)
    from pyspark.sql import functions as F

    from streamz_spark.io import load_table
    from streamz_spark.operators.text import (
        nb_quality_apply,
        nb_quality_classifier,
        nb_quality_train,
    )

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "__y", F.col("lang") == "en"
    )
    mono = nb_quality_classifier(docs, "__y", vocab_limit=20).toPandas()
    model = nb_quality_train(docs, "__y", vocab_limit=20)
    split = nb_quality_apply(docs, model).toPandas()
    a = mono.sort_values("doc_id", ignore_index=True)
    b = split.sort_values("doc_id", ignore_index=True)
    assert a.equals(b)


def test_chunk_documents_then_pack_fits_budget(spark):
    # chunking is the documented upstream fix for over-budget docs:
    # after chunk_documents(max_tokens=B) every pack_sequences(budget=B)
    # pack fits the budget exactly — no singleton overflow packs —
    # and chunk coverage reconstructs every token with the right
    # stride/overlap structure
    from pyspark.sql import functions as F

    from streamz_spark.io import load_table
    from streamz_spark.operators import export as ex

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    chunks = ex.chunk_documents(docs, max_tokens=32, overlap=8)
    rows = chunks.collect()
    assert rows and all(r.n_chunk_tokens <= 32 for r in rows)
    # chunk 0 starts at token 0; consecutive chunks advance by stride
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_chunk_tokens))
    for doc_id, cs in per_doc.items():
        idxs = sorted(i for i, _ in cs)
        assert idxs == list(range(len(idxs))), doc_id  # dense 0..k
        # every chunk but the last is full
        full = [n for i, n in sorted(cs)][:-1]
        assert all(n == 32 for n in full), (doc_id, cs)
    # total coverage: sum of (stride for all but last) + last chunk len
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n")
        ).collect()
    }
    for doc_id, cs in per_doc.items():
        last_n = sorted(cs)[-1][1]
        assert 24 * (len(cs) - 1) + last_n == n_tokens[doc_id], doc_id
    # packing chunks with the same budget: every pack fits
    ch_ids = chunks.select(
        F.concat_ws("#", "doc_id", "chunk_idx").alias("cid"),
        F.col("n_chunk_tokens").alias("n_tokens"),
    )
    packed = ex.pack_sequences(ch_ids, id_col="cid", budget=32, num_shards=4)
    assert packed.filter(F.col("pack_tokens") > 32).count() == 0


class TestStupidBackoff:
    """Bigram stupid-backoff NLL (Brants et al. 2007) vs a pure-Python
    reference — exercises all four scoring paths: first-token unigram,
    observed-bigram, backoff (unseen pair), and OOV-through-residual."""

    CORPUS = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "a dog sat"),
        (4, "the mat the cat"),
        (5, ""),
        (6, "zzz"),  # singleton -> OOV under a small vocab cap
    ]

    @staticmethod
    def _reference(rows, vocab_limit=None, bigram_limit=None, alpha=0.4):
        import math
        from collections import Counter

        pc, first = Counter(), Counter()
        docs = {}
        for i, text in rows:
            toks = _tokens(text)
            docs[i] = toks
            for p, w in enumerate(toks):
                pc[(toks[p - 1] if p else None, w)] += 1
        cnt1 = Counter()
        for (prev, cur), c in pc.items():
            cnt1[cur] += c
        n_total = sum(cnt1.values())
        lm1 = dict(
            sorted(cnt1.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_limit]
            if vocab_limit is not None
            else cnt1.items()
        )
        oov = n_total - sum(lm1.values()) if vocab_limit is not None else None
        lm2 = {
            k: c for k, c in pc.items() if k[0] is not None
        }
        if bigram_limit is not None:
            lm2 = dict(
                sorted(lm2.items(), key=lambda kv: (-kv[1], kv[0]))[:bigram_limit]
            )
        out = {}
        for i, toks in docs.items():
            if not toks:
                continue
            s = 0
            for p, w in enumerate(toks):
                prev = toks[p - 1] if p else None
                if (
                    prev is not None
                    and (prev, w) in lm2
                    and prev in lm1
                    and w in lm1
                ):
                    nll = -math.log(lm2[(prev, w)] / lm1[prev])
                else:
                    a = 1.0 if prev is None else alpha
                    c = lm1.get(w, oov)
                    nll = -math.log(a * c / n_total)
                s += math.floor(nll * 1e6)
            out[i] = (len(toks), s // len(toks))
        return out

    def _run(self, spark, **kw):
        from streamz_spark.operators.text import stupid_backoff_nll_quality

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["nll_mean_micro"])
            for r in stupid_backoff_nll_quality(df, **kw).collect()
        }
        return got

    def test_uncapped_matches_reference(self, spark):
        assert self._run(spark) == self._reference(self.CORPUS)

    def test_capped_matches_reference(self, spark):
        # vocab cap of 4 makes 'zzz' (and other tail terms) OOV; bigram
        # cap of 3 forces backoff on real observed pairs
        kw = dict(vocab_limit=4, bigram_limit=3)
        assert self._run(spark, **kw) == self._reference(self.CORPUS, **kw)

    def test_empty_doc_dropped(self, spark):
        assert 5 not in self._run(spark)

    def test_rejects_bad_args(self, spark):
        from streamz_spark.operators.text import stupid_backoff_nll_quality

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        with pytest.raises(ValueError):
            stupid_backoff_nll_quality(df, vocab_limit=0)
        with pytest.raises(ValueError):
            stupid_backoff_nll_quality(df, alpha=0.0)
        with pytest.raises(ValueError):
            stupid_backoff_nll_quality(df, lm_join="nope")


class TestStupidBackoffProperty:
    """Hypothesis: random small corpora over a tiny alphabet (high
    collision pressure on bigrams and ties in both top-V cuts) must
    match the pure-Python reference exactly — integer micro-nats make
    the comparison exact, not tolerance-based."""

    @staticmethod
    def _assert_matches(spark, rows, vocab_limit, bigram_limit):
        ref = TestStupidBackoff._reference(
            rows, vocab_limit=vocab_limit, bigram_limit=bigram_limit
        )
        from streamz_spark.operators.text import stupid_backoff_nll_quality

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["nll_mean_micro"])
            for r in stupid_backoff_nll_quality(
                df, vocab_limit=vocab_limit, bigram_limit=bigram_limit
            ).collect()
        }
        assert got == ref

    def test_random_corpora(self, spark):
        from hypothesis import given, settings, strategies as st

        words = st.sampled_from(["aa", "ab", "ba", "bb", "a", "b", "cc"])
        doc = st.lists(words, min_size=0, max_size=12).map(" ".join)
        corpus = st.lists(doc, min_size=1, max_size=8)
        caps = st.sampled_from([(None, None), (3, 4), (5, None), (None, 2)])

        @given(docs=corpus, cap=caps)
        @settings(max_examples=15, deadline=None)
        def run(docs, cap):
            rows = [(i, t) for i, t in enumerate(docs)]
            self._assert_matches(spark, rows, cap[0], cap[1])

        run()


class TestUnicodeNormalization:
    CASES = [
        (1, "café society"),            # composed é
        (2, "café society"),           # decomposed e + combining acute
        (3, "ﬁsh and chips"),           # fi ligature
        (4, "ｆｕｌｌwidth"),  # fullwidth letters
        (5, "plain ascii"),
        (6, None),
        (7, ""),
    ]

    def test_nfc_matches_python_and_duckdb(self, spark):
        import unicodedata

        import duckdb

        from streamz_spark.operators.text import normalize_unicode

        df = spark.createDataFrame(self.CASES, "doc_id long, text string")
        got = {
            r["doc_id"]: r["n"]
            for r in df.select(
                "doc_id", normalize_unicode("text", "NFC").alias("n")
            ).collect()
        }
        for i, t in self.CASES:
            want = unicodedata.normalize("NFC", t) if t is not None else None
            assert got[i] == want, (i, got[i], want)
            if t is not None:
                d = duckdb.sql(
                    "SELECT nfc_normalize(?)", params=[t]
                ).fetchone()[0]
                assert got[i] == d, (i, got[i], d)

    def test_nfc_fingerprint_collapses_encodings(self, spark):
        from streamz_spark.operators.text import fingerprint

        df = spark.createDataFrame(self.CASES[:2], "doc_id long, text string")
        raw = df.select(fingerprint("text", "fp")).distinct().count()
        nfc = df.select(
            fingerprint("text", "fp", unicode_form="NFC")
        ).distinct().count()
        # composed and decomposed é differ raw, collapse under NFC
        assert raw == 2 and nfc == 1

    def test_nfkc_collapses_compat_forms(self, spark):
        from streamz_spark.operators.text import normalize_unicode

        df = spark.createDataFrame(
            [(1, "ﬁsh"), (2, "fish")], "doc_id long, text string"
        )
        out = df.select(
            normalize_unicode("text", "NFKC").alias("n")
        ).distinct().count()
        assert out == 1

    def test_rejects_bad_form(self, spark):
        from streamz_spark.operators.text import normalize_unicode

        with pytest.raises(ValueError):
            normalize_unicode("text", "NFX")


class TestCorpusDiff:
    def test_all_four_statuses(self, spark):
        from streamz_spark.operators.export import corpus_diff

        old = spark.createDataFrame(
            [(1, "same text"), (2, "will change"), (3, "will be removed")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "  SAME   text "), (2, "changed text"), (4, "brand new")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
        # id 1: whitespace/case normalize -> unchanged
        assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


class TestC4Clean:
    """C4 line rules (Raffel et al. 2020 §2.2) on handcrafted pages."""

    def test_line_rules(self, spark):
        page = "\n".join(
            [
                "a good long sentence here.",   # kept
                "no terminal punctuation",       # dropped: no punct
                "too short.",                    # dropped: < 3 words
                "uses the word javascript here.",  # dropped: badword
                'he said "stop right there!"',   # kept: ends in quote
                "another fine closing line?",    # kept: ends in ?
            ]
        )
        from streamz_spark.operators.quality import c4_clean

        df = spark.createDataFrame([(1, page)], "doc_id long, text string")
        row = c4_clean(df, min_lines=3).collect()[0]
        assert row["lines_total"] == 6
        assert row["lines_kept"] == 3
        assert row["kept"] is True
        assert row["text_clean"].splitlines() == [
            "a good long sentence here.",
            'he said "stop right there!"',
            "another fine closing line?",
        ]

    def test_doc_rules(self, spark):
        from streamz_spark.operators.quality import c4_clean

        ok = "\n".join(["this line is fine."] * 5)
        few = "\n".join(["this line is fine."] * 4)
        lorem = ok + "\nLorem Ipsum dolor sit."
        brace = ok + "\nint main() { return 0; }"
        df = spark.createDataFrame(
            [(1, ok), (2, few), (3, lorem), (4, brace)],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["kept"] for r in c4_clean(df).collect()}
        assert got == {1: True, 2: False, 3: False, 4: False}

    def test_zero_shuffle_plan(self, spark):
        from streamz_spark.operators.quality import c4_clean
        from streamz_spark.plans import exchange_count
        from streamz_spark.io import load_table

        from .conftest import SF_DIR

        df = c4_clean(load_table(spark, SF_DIR, "documents"))
        assert exchange_count(df) == 0  # map-only cleaning phase


def test_source_overlap_planted(spark):
    # two sources share exactly one 3-shingle ("the quick fox"); the
    # third shares nothing. overlap_ppm = 1e6 * shared / min(|A|,|B|)
    from streamz_spark.operators.quality import source_overlap

    rows = [
        (1, "a", "the quick fox jumps high"),     # shingles: 3
        (2, "b", "said the quick fox today ok"),  # shingles: 4
        (3, "c", "completely different words here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {
        (r.source_a, r.source_b): (r.shared_shingles, r.overlap_ppm)
        for r in source_overlap(df, k=3).collect()
    }
    assert got == {("a", "b"): (1, 1000000 // 3)}


def test_source_overlap_max_sources_cap(spark):
    # a shingle in ALL sources is boilerplate: with max_sources=2 it
    # must stop contributing to every pair, while the pairwise shingle
    # survives; totals (ppm denominators) stay PRE-cut
    from streamz_spark.operators.quality import source_overlap

    rows = [
        (1, "a", "common boiler plate here now"),
        (2, "b", "common boiler plate also present"),
        (3, "c", "common boiler plate third copy"),
        (4, "a", "the quick fox jumps high"),
        (5, "b", "said the quick fox today"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    uncapped = {
        (r.source_a, r.source_b): r.shared_shingles
        for r in source_overlap(df, k=3).collect()
    }
    assert uncapped[("a", "c")] >= 1  # boilerplate shingle pairs a-c
    capped_rows = source_overlap(df, k=3, max_sources=2).collect()
    capped = {(r.source_a, r.source_b): r for r in capped_rows}
    assert ("a", "c") not in capped and ("b", "c") not in capped
    r = capped[("a", "b")]
    assert r.shared_shingles == 1  # only 'the quick fox'
    # denominators unchanged by the cut: a has 3+3 distinct shingles
    assert r.shingles_a == 6


def test_source_overlap_high_fanout_many_sources(spark):
    # 10^4 sources all sharing one boilerplate text: uncapped, the
    # shared shingles would each contribute C(10^4, 2) ≈ 5e7 join rows
    # — the melt case. With max_sources the boilerplate is cut by the
    # broadcast anti-join and only the two planted genuine overlaps
    # survive, in seconds not hours.
    from streamz_spark.operators.quality import source_overlap

    n = 10_000
    rows = [(i, f"src{i:05d}", f"common boiler plate here now u{i} v{i} w{i}")
            for i in range(n)]
    # planted genuine overlap between src00000 and src00001 only
    rows.append((n, "src00000", "the quick fox jumps high"))
    rows.append((n + 1, "src00001", "said the quick fox today"))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {(r.source_a, r.source_b): r.shared_shingles
           for r in source_overlap(df, k=3, max_sources=10).collect()}
    assert got == {("src00000", "src00001"): 1}


def test_source_overlap_auto_dispatch_forces_shuffle_arm(spark):
    # high-boilerplate frame with hot_broadcast_limit=0: auto must
    # degrade the hot-set anti-join to the shuffle arm — and the
    # results must be IDENTICAL to the broadcast arm (the dispatch is
    # an execution-strategy choice, never a semantics choice)
    from streamz_spark.operators.quality import source_overlap

    rows = [
        (1, "a", "common boiler plate here now"),
        (2, "b", "common boiler plate also present"),
        (3, "c", "common boiler plate third copy"),
        (4, "a", "the quick fox jumps high"),
        (5, "b", "said the quick fox today"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    want = sorted(
        tuple(r) for r in
        source_overlap(df, k=3, max_sources=2, hot_join="broadcast").collect()
    )
    got = sorted(
        tuple(r) for r in
        source_overlap(
            df, k=3, max_sources=2, hot_join="auto", hot_broadcast_limit=0
        ).collect()
    )
    assert got == want
    assert {(r[0], r[1]) for r in got} == {("a", "b")}
    with pytest.raises(ValueError):
        source_overlap(df, k=3, max_sources=2, hot_join="bogus").collect()


def test_data_card_sketch_arm_matches_exact_within_tolerance(spark):
    # the KLL arm's p50 must track the exact arm's interpolated median
    # within the sketch's rank-error bound, with every other column
    # bit-identical (the sketch only replaces the percentile aggregate)
    from streamz_spark.io import load_table
    from streamz_spark.operators.export import corpus_data_card

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    exact = {r["source"]: r.asDict()
             for r in corpus_data_card(docs, p50="exact").collect()}
    sketch = {r["source"]: r.asDict()
              for r in corpus_data_card(docs, p50="sketch").collect()}
    assert set(exact) == set(sketch)
    for src, e in exact.items():
        s = sketch[src]
        for col in ("n_docs", "n_tokens", "n_chars", "mean_word_len_micro",
                    "n_langs", "top_lang", "top_lang_docs",
                    "tokens_per_doc_mean"):
            assert s[col] == e[col], (src, col)
        # approx picks an actual value (no interpolation): allow the
        # half-step plus the 1/accuracy rank error on this distribution
        assert abs(s["tokens_per_doc_p50"] - e["tokens_per_doc_p50"]) <= max(
            1.0, 0.02 * e["tokens_per_doc_p50"]
        ), src


def test_data_card_sketch_arm_plan_contract(spark):
    # the doc-level shuffle payload is gone in the sketch arm: the
    # percentile aggregate's map-side partial is a bounded
    # ApproximatePercentile sketch (partial_percentile_approx), where
    # the exact arm's partial buffer is the full per-group value list —
    # at 100 TB that exchange carries |sources| x sketch bytes vs one
    # value per document
    from streamz_spark.io import load_table
    from streamz_spark.operators.export import corpus_data_card
    from streamz_spark.plans import explain_string

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    exact_plan = explain_string(corpus_data_card(docs, p50="exact"))
    sketch_plan = explain_string(corpus_data_card(docs, p50="sketch"))
    assert "percentile_approx" not in exact_plan
    assert "partial_percentile" in exact_plan
    assert "percentile_approx" in sketch_plan
    # the sketch arm must not regress to the exact aggregate
    import re
    assert not re.search(r"partial_percentile\(", sketch_plan)


def test_data_card_p50_arg_validated(spark):
    import pytest

    from streamz_spark.io import load_table
    from streamz_spark.operators.export import corpus_data_card

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="p50"):
        corpus_data_card(docs, p50="bogus")


def test_ngram_helper_bit_equal(spark):
    # add_word_kgrams (compiled ml.NGram path, used by the shingle-family
    # operators since r08) must stay bit-identical INCLUDING element
    # order to the word_kgrams/word_shingles Column forms — nulls,
    # empties, unicode whitespace that Java \s does NOT match (NBSP,
    # U+3000), case folding, duplicate grams, and sub-k docs.
    from pyspark.sql import functions as F, types as T

    from streamz_spark.operators.text import (
        add_word_kgrams,
        word_kgrams,
        word_shingles,
    )

    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "\t\n\x0b\f\r"),
        (5, "a"),
        (6, "a b c"),
        (7, "a  b\tc\nd"),
        (8, "A B C a b c"),
        (9, "x y z w"),
        (10, "café CAFÉ café x"),
        (11, "a b a b a b"),
        (12, " lead and trail "),
        (13, "　ideographic　x y z"),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    for k in (1, 2, 3, 5, 7):
        ref = {
            r["id"]: (r["kg"], r["sh"])
            for r in df.select(
                "id",
                word_kgrams("text", k).alias("kg"),
                word_shingles("text", k).alias("sh"),
            ).collect()
        }
        got_kg = {
            r["id"]: r["kg"]
            for r in add_word_kgrams(df, "text", k, "kg")
            .select("id", "kg")
            .collect()
        }
        got_sh = {
            r["id"]: r["sh"]
            for r in add_word_kgrams(df, "text", k, "sh", distinct=True)
            .select("id", "sh")
            .collect()
        }
        for i, (kg, sh) in ref.items():
            assert got_kg[i] == kg, (k, i, kg, got_kg[i])
            assert got_sh[i] == sh, (k, i, sh, got_sh[i])
