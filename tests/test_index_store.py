"""DedupIndexStore lifecycle: the daily-crawl loop over a stored
parquet index — initialize / screen / append / compact — with the
claims tested as behavior: cross-day dedup after append, screening
invariance under compaction, bounded file counts, fp distinct."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from streamz_spark.io import load_table
from streamz_spark.operators.index_store import DedupIndexStore

from .conftest import SF_DIR


@pytest.fixture()
def store(spark, tmp_path):
    return DedupIndexStore(spark, str(tmp_path / "idx"))


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_screen_equals_direct_incremental_dedup(spark, store):
    # the stored-artifact path must be result-identical to passing the
    # index corpus directly (same operator, lazily derived artifacts)
    from streamz_spark.operators.dedup import incremental_dedup

    docs = _docs(spark)
    index = docs.where(F.col("doc_id") % 10 >= 2)
    incoming = docs.where(F.col("doc_id") % 10 < 2)
    store.initialize(index)
    got = _ids(store.screen(incoming))
    want = _ids(incremental_dedup(incoming, index=index))
    assert got == want


def test_append_makes_next_day_see_todays_docs(spark, store):
    # day 1's kept docs must screen day 2: replay day 1's exact docs
    # as day 2 — all must drop as exact duplicates of the appended index
    docs = _docs(spark)
    index = docs.where(F.col("doc_id") % 10 >= 5)
    day1 = docs.where(F.col("doc_id") % 10 < 5)
    store.initialize(index)
    kept1 = store.screen(day1)
    n_kept1 = kept1.count()
    assert n_kept1 > 0
    store.append(kept1)
    # day 2 arrives from storage (the production shape — and required:
    # a frame derived lazily from day 1's screen would embed PRE-append
    # scans of the store paths, which Spark plan-reuse would unify with
    # the fresh screen's scans, serving the stale listing; see
    # DedupIndexStore.screen docstring)
    day2 = spark.createDataFrame(
        kept1.toPandas().assign(doc_id=lambda d: d.doc_id + 1_000_000)
    )
    # same texts, shifted ids — the exact fingerprint screen is
    # id-independent, so every one of day 1's kept texts must drop
    kept2 = store.screen(day2)
    assert kept2.count() == 0


def test_append_lineage_barrier_keeps_artifacts_consistent(spark, store):
    # the three appended relations must describe the SAME kept set —
    # without append()'s lineage cut, fp would append before sh/band
    # re-execute the screen and the sets diverge
    docs = _docs(spark)
    index = docs.where(F.col("doc_id") % 10 >= 5)
    day1 = docs.where(F.col("doc_id") % 10 < 5)
    store.initialize(index)
    kept1 = store.screen(day1)
    n_index = index.count()
    n_kept = kept1.count()
    store.append(kept1)
    fp, sh, band = store.artifacts()
    assert fp.count() == n_index + n_kept
    assert sh.count() == n_index + n_kept
    assert band.count() == (n_index + n_kept) * store.bands


def test_compact_preserves_screening_and_bounds_files(spark, store):
    docs = _docs(spark)
    index = docs.where(F.col("doc_id") % 10 >= 6)
    store.initialize(index)
    # simulate a week of small appends (disjoint day slices)
    for day in range(3):
        slice_ = docs.where(F.col("doc_id") % 10 == day * 2)
        kept = store.screen(slice_)
        store.append(kept)
    probe = docs.where(F.col("doc_id") % 10 == 1)
    before_kept = _ids(store.screen(probe))
    before_files = store.file_counts()
    fp_rows_before = store.artifacts()[0].count()

    after_files = store.compact()

    assert _ids(store.screen(probe)) == before_kept
    # bounded: the band table (hot join side) lands at <= bands files
    assert after_files["band"] <= store.bands
    assert after_files["fp"] <= 4 and after_files["sh"] <= 4
    # appends strictly grew the file count; compaction must shrink it
    assert sum(after_files.values()) < sum(before_files.values())
    # fp is DISTINCT'd — never more rows than before
    assert store.artifacts()[0].count() <= fp_rows_before


def test_compact_distincts_duplicate_fingerprints(spark, store):
    # appending the same text twice (different ids, e.g. two mirrors
    # both kept before cross-mirror dedup) duplicates the fp row;
    # compaction collapses it without touching sh/band cardinality
    docs = _docs(spark).limit(50)
    store.initialize(docs)
    dup = docs.select((F.col("doc_id") + 777_000).alias("doc_id"), "text")
    store.append(dup)  # raw append models an out-of-band ingest
    fp, sh, band = store.artifacts()
    assert fp.count() == 100  # duplicated fingerprints present
    assert fp.distinct().count() == 50
    store.compact()
    fp2, sh2, band2 = store.artifacts()
    assert fp2.count() == 50
    assert sh2.count() == 100  # per-id relations untouched
    assert band2.count() == 100 * store.bands


def test_ingest_stream_dedups_across_batches_via_the_store(spark, tmp_path):
    # the daily-crawl loop AS a stream: batch 1's kept docs must screen
    # batch 2 (which replays batch 1's texts under new ids, plus fresh
    # docs) — cross-batch state lives in the persistent store, and a
    # checkpointed continuation run processes ONLY newly arrived chunks
    from streamz_spark.streaming.sources import from_directory

    store = DedupIndexStore(spark, str(tmp_path / "idx"))
    docs = _docs(spark)
    store.initialize(docs.where(F.col("doc_id") % 10 >= 8))

    chunk0 = docs.where(F.col("doc_id") % 10 < 2)           # fresh
    chunk1_dup = chunk0.select(                             # replays chunk0
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    chunk1_new = docs.where(F.col("doc_id") % 10 == 2)      # fresh
    chunk1 = chunk1_dup.unionByName(chunk1_new)

    src = tmp_path / "chunks"
    chunk0.coalesce(1).write.parquet(str(src / "c=00000"))
    chunk1.coalesce(1).write.parquet(str(src / "c=00001"))
    stream = from_directory(
        spark, str(src / "c=*"), chunk0.schema,
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )
    kept_sink = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    store.ingest_stream(stream, kept_sink, checkpoint=ckpt)

    kept = spark.read.parquet(kept_sink)
    kept_ids = _ids(kept)
    # every chunk0 keep is present; NO replayed chunk1 id survived
    assert not any(i >= 500_000 for i in kept_ids)
    n_kept0 = kept.where(F.col("doc_id") % 10 < 2).count()
    assert n_kept0 > 0
    n_after_first = kept.count()

    # continuation: a third chunk arrives; the checkpoint must skip the
    # processed chunks, and the new chunk screens against EVERYTHING
    # kept so far (it replays chunk1_new's texts -> all drop)
    chunk2 = chunk1_new.select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    chunk2.coalesce(1).write.parquet(str(src / "c=00002"))
    stream2 = from_directory(
        spark, str(src / "c=*"), chunk0.schema,
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )
    store.ingest_stream(stream2, kept_sink, checkpoint=ckpt)
    kept2 = spark.read.parquet(kept_sink)
    assert kept2.count() == n_after_first  # nothing new kept, nothing re-landed


def _crash_harness(spark, tmp_path, *, crash_after_append: bool):
    """Shared chaos rig: one chunk streams in, the first ingest attempt
    is killed at a chosen point inside the foreachBatch (via a patched
    `append`), then an unpatched restart from the same checkpoint
    replays the uncommitted batch. Returns (store, kept_sink, chunk)."""
    from streamz_spark.streaming.sources import from_directory

    store = DedupIndexStore(spark, str(tmp_path / "idx"))
    docs = _docs(spark)
    store.initialize(docs.where(F.col("doc_id") % 10 >= 8))
    chunk = docs.where(F.col("doc_id") % 10 < 2)
    src = tmp_path / "chunks"
    chunk.coalesce(1).write.parquet(str(src / "c=00000"))

    kept_sink = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    real_append = store.append

    def crashing_append(kept):
        if crash_after_append:
            real_append(kept)  # index mutated, THEN the process dies
        raise RuntimeError("injected crash")

    store.append = crashing_append
    stream = from_directory(
        spark, str(src / "c=*"), chunk.schema,
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )
    with pytest.raises(Exception, match="injected crash"):
        store.ingest_stream(stream, kept_sink, checkpoint=ckpt)
    store.append = real_append

    # restart from the same checkpoint: the failed batch replays
    stream2 = from_directory(
        spark, str(src / "c=*"), chunk.schema,
        one_file_per_trigger=True, pathGlobFilter="*.parquet",
    )
    store.ingest_stream(stream2, kept_sink, checkpoint=ckpt)
    return store, kept_sink, chunk


def test_ingest_stream_crash_before_append_replays_at_least_once(spark, tmp_path):
    # kill point 1: after the kept_sink write, BEFORE the index append.
    # The replayed batch is not yet indexed, so it re-screens as kept
    # and lands twice — the documented at-least-once contract on
    # kept_sink — while the index admits each document exactly once
    # (no duplicate admissions: the crashed attempt appended nothing).
    store, kept_sink, chunk = _crash_harness(
        spark, tmp_path, crash_after_append=False
    )
    kept = spark.read.parquet(kept_sink)
    n_unique = chunk.select("text").distinct().count()
    # no lost appends: every unique text admitted to the index once
    fp, sh, band = store.artifacts()
    init_fp = store._artifacts_for(
        _docs(spark).where(F.col("doc_id") % 10 >= 8)
    )[0].count()
    assert fp.count() - init_fp == kept.select("text").distinct().count()
    assert fp.count() == fp.distinct().count()  # exactly once each
    # at-least-once on the sink: duplicates by fingerprint are allowed
    # and expected here, but the DEDUPED content equals one clean pass
    assert kept.select("text").distinct().count() == kept.count() // 2
    # re-screening the same texts now drops everything (fully indexed)
    probe = chunk.select((F.col("doc_id") + 700_000).alias("doc_id"), "text")
    assert store.screen(probe).count() == 0


def test_ingest_stream_crash_after_append_is_exactly_once(spark, tmp_path):
    # kill point 2: after the index append, BEFORE the checkpoint
    # commit. The replayed batch screens against an index that already
    # contains it, so nothing re-lands and nothing re-appends —
    # exactly-once on BOTH the sink and the store in this failure mode.
    store, kept_sink, chunk = _crash_harness(
        spark, tmp_path, crash_after_append=True
    )
    kept = spark.read.parquet(kept_sink)
    # exactly once on the sink: no row duplicated by the replay
    assert kept.count() == kept.select("text").distinct().count()
    # exactly once in the store: replay appended an empty survivor set
    fp, _, _ = store.artifacts()
    assert fp.count() == fp.distinct().count()
    probe = chunk.select((F.col("doc_id") + 700_000).alias("doc_id"), "text")
    assert store.screen(probe).count() == 0


def _fault_compact(store, crash_at: str):
    """Run compact()'s exact sequence but crash at a named point for
    the FIRST table, by monkeypatching os.rename — simulating a kill
    at each window of the staged swap."""
    import os as _os

    real_rename = _os.rename
    state = {"renames": 0}

    def crashing_rename(a, b):
        if crash_at == "before_any_rename":
            raise RuntimeError("injected crash")
        state["renames"] += 1
        if crash_at == "between_renames" and state["renames"] == 1:
            real_rename(a, b)
            raise RuntimeError("injected crash")
        real_rename(a, b)
        if crash_at == "after_swap" and state["renames"] == 2:
            raise RuntimeError("injected crash")

    _os.rename = crashing_rename
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            store.compact()
    finally:
        _os.rename = real_rename


@pytest.mark.parametrize(
    "crash_at", ["before_any_rename", "between_renames", "after_swap"]
)
def test_compact_crash_recovery(spark, store, crash_at):
    # chaos per crash window of the staged swap: recover() must return
    # the store to a state where screening gives the SAME answer as
    # before the interrupted compaction, with no orphan directories
    import os as _os

    docs = _docs(spark).limit(60)
    store.initialize(docs)
    probe = docs.select((F.col("doc_id") + 900_000).alias("doc_id"), "text")
    want = _ids(store.screen(probe))  # all dups -> empty set expected
    assert want == set()

    _fault_compact(store, crash_at)
    if crash_at == "between_renames":
        # the fp table directory is genuinely missing in this window
        assert not _os.path.isdir(store._path("fp"))

    actions = store.recover()
    assert actions, f"recover() took no action after {crash_at}"
    # all three tables present, no orphan stage/old dirs left behind
    base_dir = _os.path.dirname(store._path("fp"))
    leftovers = [
        e for e in _os.listdir(base_dir)
        if "__compact_" in e or "__old_" in e
    ]
    assert leftovers == []
    assert _ids(store.screen(probe)) == want
    # recover is idempotent and the store compacts cleanly afterwards
    assert store.recover() == {}
    store.compact()
    assert _ids(store.screen(probe)) == want


def test_recover_refuses_to_mint_empty_table(spark, store, tmp_path):
    # a missing table with NO old copy is data loss, not a repair case
    import shutil as _shutil

    store.initialize(_docs(spark).limit(20))
    _shutil.rmtree(store._path("sh"))
    with pytest.raises(RuntimeError, match="missing"):
        store.recover()
