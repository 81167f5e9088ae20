"""Parquet-backed lifecycle for the incremental-dedup index artifact.

`dedup.incremental_dedup(index_artifacts=...)` makes each daily batch
incoming-sized — but only if someone maintains the stored artifact.
This module owns that lifecycle, the part a real daily-crawl
deployment runs every day for years:

* **initialize(index)** — build the three artifact relations
  (fingerprints / shingles / LSH band table) once and persist them.
* **screen(incoming)** — today's batch vs the stored index.
* **append(kept)** — fold the day's survivors INTO the index, so
  tomorrow's batch is screened against everything kept today
  (plain parquet append: one new file set per day, cheap).
* **compact()** — the append path's read-amplification fix: after N
  days the band table is N file-sets deep and every screen pays N
  footer reads per partition. Compaction rewrites each table into a
  bounded file count (and `DISTINCT`s the fingerprint relation, which
  appends can only grow) without changing any screening result.

Atomicity note: compaction stages the rewrite in a sibling directory
and swaps it in with a filesystem rename — safe for the single-writer
daily-batch cadence this models. A multi-writer production deployment
would put a transactional table format (manifest/log) under the same
three relations; the relational shape and join keys are unchanged.

Reference parity: the reference engine has no persistent-index dedup
(its `unique`/`RefCounter` state dies with the stream —
streamz/core.py); this is part of the 100 TB capability superset.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["DedupIndexStore"]

_TABLES = ("fp", "sh", "band")
# compaction targets ~this many bytes per output file — the partition
# count SCALES with the table (a fixed count would write 4 pathological
# multi-GB files for a 100 TB index's fp relation, or cap the band
# table's parallelism); floors keep tiny test corpora sane
_TARGET_FILE_BYTES = 128 << 20
_MIN_PARTITIONS = {"fp": 4, "sh": 4, "band": 16}


class DedupIndexStore:
    """Stored-index lifecycle for :func:`dedup.incremental_dedup`.

    All three relations live as parquet under ``base``:
    ``fp/`` (``__fp`` normalized-md5 keys), ``sh/`` (``(id, sh)``
    shingle sets), ``band/`` (``(id, band, bhash)`` LSH buckets).
    MinHash/shingle parameters are fixed at store creation — mixing
    signatures produced under different parameters would silently
    break recall, so they are pinned here and every append reuses
    them.
    """

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_perm: int = 64,
        k: int = 3,
        bands: int = 16,
        threshold: float = 0.5,
    ):
        # compact()/file_counts() manipulate files with os.walk/os.rename,
        # so the store is local-filesystem-only; fail fast on object-store
        # URIs before any rewrite could be staged halfway
        scheme = base.split("://", 1)[0] if "://" in base else ""
        if scheme and scheme != "file":
            raise ValueError(
                "DedupIndexStore requires a local filesystem base "
                f"(got scheme {scheme!r}); compact()/file_counts() use "
                "os-level file operations"
            )
        self.spark = spark
        self.base = base[len("file://"):] if base.startswith("file://") else base
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.k = k
        self.bands = bands
        self.threshold = threshold

    # -- paths ----------------------------------------------------------
    def _path(self, table: str) -> str:
        return os.path.join(self.base, table)

    def file_counts(self) -> dict[str, int]:
        """Parquet data files per table — the read-amplification
        metric compaction bounds."""
        out = {}
        for t in _TABLES:
            p = self._path(t)
            out[t] = sum(
                1
                for root, _, files in os.walk(p)
                for f in files
                if f.endswith(".parquet")
            ) if os.path.isdir(p) else 0
        return out

    # -- build ----------------------------------------------------------
    def _artifacts_for(self, docs: DataFrame):
        from streamz_spark.operators.dedup import dedup_index_artifacts

        return dedup_index_artifacts(
            docs,
            id_col=self.id_col,
            text_col=self.text_col,
            num_perm=self.num_perm,
            k=self.k,
            bands=self.bands,
        )

    def initialize(self, index: DataFrame) -> None:
        """Build the artifact from the historical corpus and persist
        it (overwrite). The one index-sized pass; everything after is
        incoming-sized."""
        fp, sh, band = self._artifacts_for(index)
        fp.write.mode("overwrite").parquet(self._path("fp"))
        sh.write.mode("overwrite").parquet(self._path("sh"))
        # lay the hot join side out on its FULL join key (band, bhash)
        # — partitioning on band alone hashes a |bands|-value key and
        # caps both write parallelism and join co-location at |bands|
        # buckets regardless of data size
        band.repartition(
            max(self.bands, 2 * (self.spark.sparkContext.defaultParallelism or 1)),
            "band", "bhash",
        ).write.mode("overwrite").parquet(self._path("band"))

    def artifacts(self):
        """The three stored relations, as `incremental_dedup` expects."""
        r = self.spark.read
        return (
            r.parquet(self._path("fp")),
            r.parquet(self._path("sh")),
            r.parquet(self._path("band")),
        )

    # -- daily loop ------------------------------------------------------
    def screen(self, incoming: DataFrame) -> DataFrame:
        """Incoming rows that survive exact + near-dup screening
        against the stored index (incoming-sized work).

        Contract: the result is LAZY and reads the store's files as of
        this call. Do not re-execute it — and especially do not feed
        it back into another :meth:`screen` — after :meth:`append` /
        :meth:`compact` mutate the store: Spark canonicalizes
        identical path scans within a plan, so a pre-mutation scan
        embedded in the frame's lineage can serve its stale file
        listing to the fresh screen's scan of the same path (verified:
        a screen of a frame derived from a pre-append screen drops
        NOTHING, because the unified fp scan only lists pre-append
        files). Materialize first — write to the corpus store and
        re-read, which is the production shape anyway; `append()`
        cuts its own input's lineage for exactly this reason."""
        from streamz_spark.operators.dedup import incremental_dedup

        return incremental_dedup(
            incoming,
            id_col=self.id_col,
            text_col=self.text_col,
            num_perm=self.num_perm,
            k=self.k,
            bands=self.bands,
            threshold=self.threshold,
            index_artifacts=self.artifacts(),
        )

    def append(self, kept: DataFrame) -> None:
        """Fold the day's kept docs into the index (parquet append —
        one new file set, no rewrite of history). Screening tomorrow's
        batch then sees today's docs; run :meth:`compact` when
        `file_counts` says the append depth costs more than a
        rewrite.

        The kept frame's lineage is cut (localCheckpoint) before the
        first write: `screen()` output still READS the index paths,
        and the three appends are separate actions — without the
        barrier the second append would re-execute the screen against
        the fingerprints the first append just added and silently
        shrink the kept set mid-append. (A deployment that lands the
        kept docs in its corpus store first and passes a re-read frame
        pays nothing here.)"""
        kept = kept.localCheckpoint(eager=True)
        fp, sh, band = self._artifacts_for(kept)
        fp.write.mode("append").parquet(self._path("fp"))
        sh.write.mode("append").parquet(self._path("sh"))
        band.write.mode("append").parquet(self._path("band"))

    # -- maintenance ------------------------------------------------------
    def compact(self) -> dict[str, int]:
        """Rewrite each table into a bounded file count; fingerprints
        are DISTINCT'd (appends can only add duplicate ``__fp`` rows —
        e.g. two near-identical days both kept — and every duplicate
        inflates the anti-join build side for no information).

        Screening results are IDENTICAL before and after: `sh`/`band`
        rows are per-id unique by construction (appends carry disjoint
        kept ids), and the exact screen is an anti-join — set
        semantics, immune to the fp DISTINCT.

        The partition count is SIZE-BASED (on-disk bytes /
        ``_TARGET_FILE_BYTES``, floored per table) so it scales with
        the index — a fixed count would write pathological multi-GB
        files for a 100 TB index, and the band table repartitions on
        its full (band, bhash) join key (band alone caps parallelism
        at |bands| buckets).

        Returns the post-compaction file counts.
        """
        def _n_parts(table: str) -> int:
            p = self._path(table)
            nbytes = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(p)
                for f in files
                if f.endswith(".parquet")
            )
            return max(
                _MIN_PARTITIONS[table],
                -(-nbytes // _TARGET_FILE_BYTES),  # ceil
            )

        specs = {
            "fp": lambda df: df.distinct().repartition(_n_parts("fp")),
            "sh": lambda df: df.repartition(_n_parts("sh")),
            "band": lambda df: df.repartition(_n_parts("band"), "band", "bhash"),
        }
        for t, fix in specs.items():
            src = self._path(t)
            stage = src + "__compact_" + uuid.uuid4().hex[:8]
            fix(self.spark.read.parquet(src)).write.mode("overwrite").parquet(stage)
            old = src + "__old_" + uuid.uuid4().hex[:8]
            # the swap has a crash window: between these two renames
            # the table directory does not exist. recover() repairs it
            # (rename old back) — chaos-tested per crash point.
            os.rename(src, old)
            os.rename(stage, src)
            shutil.rmtree(old)
        return self.file_counts()

    def recover(self) -> dict[str, str]:
        """Repair an interrupted :meth:`compact` — idempotent, run it
        before using a store whose last compaction may have crashed.

        Per table, by crash point:

        * crash after the stage write (``<t>__compact_*`` orphan, table
          intact): the staged rewrite is DISCARDED — the live table is
          the source of truth and the next compact() re-derives it.
        * crash between the two renames (table directory MISSING, one
          ``<t>__old_*`` present): the old directory is renamed back —
          no data was lost, the compaction simply never happened.
        * crash after the swap (``<t>__old_*`` orphan, table intact):
          the old copy is deleted, finishing what compact() started.

        Returns {table_or_orphan: action}. Raises if a table is missing
        and no old copy exists to restore (real data loss — a repair
        must not silently mint an empty table).
        """
        actions: dict[str, str] = {}
        base_dir = os.path.dirname(self._path(_TABLES[0])) or "."
        entries = os.listdir(base_dir) if os.path.isdir(base_dir) else []
        for t in _TABLES:
            src = self._path(t)
            olds = sorted(
                os.path.join(base_dir, e) for e in entries
                if e.startswith(f"{t}__old_")
            )
            stages = sorted(
                os.path.join(base_dir, e) for e in entries
                if e.startswith(f"{t}__compact_")
            )
            if not os.path.isdir(src):
                if len(olds) == 1:
                    os.rename(olds[0], src)
                    actions[t] = "restored from old copy"
                    olds = []
                elif olds:
                    raise RuntimeError(
                        f"{t}: table missing with {len(olds)} old copies — "
                        "ambiguous, refusing to pick one automatically"
                    )
                else:
                    raise RuntimeError(
                        f"{t}: table missing with no old copy to restore"
                        + (
                            " — only a staged rewrite exists; the stage "
                            "may be mid-write, restore from backup rather "
                            "than promoting it blindly"
                            if stages else ""
                        )
                    )
            for o in olds:
                shutil.rmtree(o)
                actions[os.path.basename(o)] = "removed superseded old copy"
            for s in stages:
                shutil.rmtree(s)
                actions[os.path.basename(s)] = "discarded incomplete stage"
        return actions

    # -- streaming ---------------------------------------------------------
    def ingest_stream(
        self,
        stream: DataFrame,
        kept_sink: str,
        *,
        checkpoint: str | None = None,
        append_survivors: bool = True,
        timeout: int = 300,
    ):
        """The daily-crawl loop AS a stream: per micro-batch, screen
        the arriving docs against the store, land the survivors in
        ``kept_sink`` (parquet), and — when ``append_survivors`` —
        fold them into the index so the NEXT micro-batch is screened
        against them too.

        Cross-batch dedup state lives in the PERSISTENT STORE, not a
        Spark state store: the query is restartable from any point
        (checkpoint replays unprocessed source batches; re-screening a
        replayed batch is idempotent — its duplicates are already
        indexed, its unique docs already landed by fingerprint), and a
        fleet of independent ingest jobs can share one index. This is
        the complement of `streaming.stateful.streaming_minhash_neardup`
        (in-memory/RocksDB state, lowest latency, single query owns
        the state) — here latency is a micro-batch and the state is
        the same artifact batch jobs and tomorrow's runs read.

        The per-batch screen is incoming-sized (the stored artifact is
        pre-paid); `append` re-derives artifacts for survivors only.
        The batch frame arrives already materialized by the engine, so
        the mixed-listing hazard on :meth:`screen` does not apply —
        but append() still cuts lineage defensively.
        """
        from streamz_spark.streaming.sinks import run_available_now

        def _screen_and_fold(batch_df, batch_id):
            # one screen execution, materialized BEFORE any store
            # mutation (screen()'s mixed-listing contract)
            kept = self.screen(batch_df).localCheckpoint(eager=True)
            kept.write.mode("append").parquet(kept_sink)
            if append_survivors:
                self.append(kept)
            # failure between the two writes replays the batch: its
            # docs are not yet indexed, so they re-screen as kept and
            # land twice — at-least-once on kept_sink; downstream
            # consumers dedup by fingerprint (dedup_exact), or swap
            # kept_sink for a transactional table for exactly-once.
            # Failure AFTER append (before checkpoint commit) is
            # exactly-once on both sides: the replay screens against
            # an index that already holds the batch, keeps nothing,
            # re-lands nothing, and appends an empty survivor set.
            # Both kill points are pinned by chaos tests
            # (tests/test_index_store.py::test_ingest_stream_crash_*).

        writer = stream.writeStream.outputMode("append").foreachBatch(
            _screen_and_fold
        )
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        return run_available_now(writer, timeout)
