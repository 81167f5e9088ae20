"""Learned-BPE tokenizer (operators/tokenizer.py): training arms,
segmentation, corpus metering."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.operators.tokenizer import (
    apply_merges,
    bpe_learned_token_meter,
    bpe_segment_types,
    bpe_train,
    bpe_word_types,
    learn_merges,
)

from .conftest import SF_DIR


class TestPurePython:
    def test_textbook_merges(self):
        # Sennrich et al. §3.2 shape: 'est' forms from the two -est
        # words (9 occurrences) before 'lo'/'low'
        types = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        m = learn_merges(types, 6)
        assert m[:2] == [("e", "s"), ("es", "t")]
        assert ("l", "o") in m and ("lo", "w") in m
        assert apply_merges("newest", m) == ["n", "ewest"]
        assert apply_merges("lowest", m) == ["low", "est"]

    def test_tiebreak_is_lexicographic(self):
        # both pairs occur once → smallest (left, right) wins
        m = learn_merges([("ba", 1), ("ab", 1)], 1)
        assert m == [("a", "b")]

    def test_single_char_and_empty_words(self):
        assert learn_merges([("a", 10), ("", 3)], 4) == []
        assert apply_merges("a", [("a", "b")]) == ["a"]
        assert apply_merges("", [("a", "b")]) == []

    def test_left_to_right_non_overlapping(self):
        # aaa under merge (a,a): L2R gives [aa, a], never [a, aa]
        assert apply_merges("aaa", [("a", "a")]) == ["aa", "a"]
        assert apply_merges("aaaa", [("a", "a")]) == ["aa", "aa"]

    @given(
        st.lists(
            st.tuples(st.text(alphabet="abc ", min_size=0, max_size=8),
                      st.integers(min_value=1, max_value=50)),
            min_size=1, max_size=12,
        ),
        st.integers(min_value=0, max_value=10),
    )
    @settings(max_examples=60, deadline=None)
    def test_segmentation_reconstructs_word(self, types, num_merges):
        m = learn_merges(types, num_merges)
        for w, _ in types:
            assert "".join(apply_merges(w, m)) == w


class TestSparkArms:
    def test_distributed_arm_matches_driver(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        d = bpe_train(docs, num_merges=12, mode="driver")
        x = bpe_train(docs, num_merges=12, mode="distributed")
        assert [tuple(r) for r in d.collect()] == [tuple(r) for r in x.collect()]

    def test_distributed_arm_driver_boundary_is_o1_rows_per_round(
        self, spark, monkeypatch
    ):
        # r08 VERDICT #2 (bound the BPE driver boundary): the
        # distributed arm must never pull the type vocabulary to the
        # driver — each merge round collects exactly the ONE argmax
        # row, so driver-side data is O(rounds) regardless of vocab
        # size. Pinned by counting every DataFrame.collect() row batch
        # during a distributed training run.
        from pyspark.sql.classic.dataframe import DataFrame as CDF

        sizes: list[int] = []
        orig = CDF.collect

        def counting(self):
            rows = orig(self)
            sizes.append(len(rows))
            return rows

        monkeypatch.setattr(CDF, "collect", counting)
        docs = load_table(spark, SF_DIR, "documents")
        bpe_train(docs, num_merges=6, mode="distributed")
        assert sizes, "distributed arm should collect per-round argmax rows"
        assert max(sizes) <= 1

    def test_auto_dispatches_driver_below_limit(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        a = bpe_train(docs, num_merges=6, mode="auto")
        d = bpe_train(docs, num_merges=6, mode="driver")
        assert [tuple(r) for r in a.collect()] == [tuple(r) for r in d.collect()]

    def test_word_types_map_side_combine(self, spark):
        from streamz_spark.plans.inspect import explain_string

        docs = load_table(spark, SF_DIR, "documents")
        plan = explain_string(bpe_word_types(docs))
        assert "partial_count" in plan

    def test_segment_types_matches_python(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        merges_df = bpe_train(docs, num_merges=10)
        merges = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
        types = bpe_word_types(docs)
        seg = bpe_segment_types(types, merges)
        for r in seg.collect():
            assert list(r["pieces"]) == apply_merges(r["word"], merges)
            assert r["n_pieces"] == len(r["pieces"])

    def test_meter_matches_python(self, spark):
        import re

        from streamz_spark.operators.text import BPE_PRETOKEN_PATTERN

        docs = load_table(spark, SF_DIR, "documents")
        merges_df = bpe_train(docs, num_merges=16)
        merges = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
        got = {
            r["doc_id"]: (r["n_words"], r["n_pieces"])
            for r in bpe_learned_token_meter(docs, merges_df).collect()
        }
        for row in docs.select("doc_id", "text").collect():
            toks = re.findall(BPE_PRETOKEN_PATTERN, row["text"])
            want = (len(toks), sum(len(apply_merges(t, merges)) for t in toks))
            assert got[row["doc_id"]] == want, row["doc_id"]

    def test_meter_unseen_word_falls_back_to_chars(self, spark):
        df = spark.createDataFrame([(1, "zzzz qq")], "doc_id long, text string")
        out = bpe_learned_token_meter(df, [("q", "q")]).collect()[0]
        # 'zzzz' unseen by any merge pair → still segmented (4 chars by
        # fallback is NOT hit here: segmentation runs per corpus type,
        # so zzzz segments to 4 single chars; ' qq' → [' ', 'qq']
        assert out["n_words"] == 2
        assert out["n_pieces"] == 4 + 2

    def test_meter_join_dispatch(self, spark):
        from streamz_spark.plans.inspect import explain_string

        docs = load_table(spark, SF_DIR, "documents")
        merges = [("e", "r")]
        b = bpe_learned_token_meter(docs, merges, seg_join="broadcast")
        assert "BroadcastHashJoin" in explain_string(b)
        s = bpe_learned_token_meter(docs, merges, seg_join="shuffle")
        assert "BroadcastHashJoin" not in explain_string(s)
        with pytest.raises(ValueError):
            bpe_learned_token_meter(docs, merges, seg_join="nope")


class TestDistributedArmScale:
    def test_arms_agree_on_synthetic_rich_vocab(self, spark):
        # 61 corpus types is a soft workout; force a 2k-type vocabulary
        # with collision-prone prefixes so merge ranks genuinely contend
        import random

        rng = random.Random(7)
        syll = ["ab", "ba", "ca", "ad", "da", "be", "eb", "ce", "ec", "fa"]
        words = {
            " " + "".join(rng.choice(syll) for _ in range(rng.randint(1, 4)))
            for _ in range(2500)
        }
        rows = [(i, w) for i, w in enumerate(sorted(words))]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        d = bpe_train(df, num_merges=20, mode="driver")
        x = bpe_train(df, num_merges=20, mode="distributed")
        assert [tuple(r) for r in d.collect()] == [tuple(r) for r in x.collect()]
