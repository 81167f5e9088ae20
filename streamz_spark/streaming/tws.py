"""Stateful operators on Spark 4's transformWithStateInPandas API.

The `streaming.stateful` module targets ``applyInPandasWithState`` —
the API available since 3.4 and the engine's default. This module
provides the same operator semantics on the NEXT-generation stateful
API (``transformWithStateInPandas``, SPARK-40434): typed state
variables (ValueState/ListState/MapState), per-state TTL handled by
the engine instead of hand-rolled timestamp arrays, and timers.

Differences that matter at 100 TB:

- state is addressed per variable, not as one serialized tuple — a
  hot path that touches only the running total doesn't deserialize
  the whole buffer;
- TTL is declarative (``TTLConfig``) and enforced inside the state
  store, so eviction doesn't cost a Python roundtrip;
- requires the RocksDB state-store provider (the engine checks and
  raises otherwise) — which is the production configuration anyway
  (SCALE.md 'streaming state').

Kept alongside (not replacing) the applyInPandasWithState operators:
both run against the same differential tests, and the classic API
remains the default because it works on any state-store provider.

Environment gate (same policy as the Kafka connector): the TWS Python
worker speaks a protobuf protocol to the JVM state server, and this
container has no ``protobuf`` package in site-packages —
``ensure_protobuf_runtime()`` recovers one from known OFFLINE bundles
(the gcloud SDK vendors a full pure-Python ``google.protobuf`` under
``platform/google_appengine``), wiring it into both the driver
``sys.path`` and the worker-inherited ``PYTHONPATH``;
``tws_runtime_available()`` probes through it, the operators raise an
actionable error when nothing is found, and the differential tests in
tests/test_rocksdb_state.py skip with the probe as the reason.
``scripts/probe_tws.py`` records the per-round probe result.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pandas as pd
from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# sys.path roots known to carry a complete offline google.protobuf
# runtime in common container images (probed, never assumed)
BUNDLED_PROTOBUF_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _protobuf_shim_dir(root: str) -> str | None:
    """Build (or reuse) a shim directory exposing ONLY
    ``google/protobuf`` from a vendored bundle root.

    The gcloud bundle's top-level ``google`` package also carries
    appengine/auth/oauth2/pyglib — putting the raw root on sys.path
    would shadow any installed google-namespace packages (google-auth,
    googleapis-common-protos) for the driver AND every Python worker.
    The shim is a namespace-package portion (``shim/google/`` with no
    ``__init__.py``) holding one symlink ``protobuf`` into the bundle,
    so the import system composes it with existing ``google``
    namespace portions and resolves exactly one subpackage from it.
    """
    import tempfile

    src = os.path.join(root, "google", "protobuf")
    if not os.path.isfile(os.path.join(src, "__init__.py")):
        return None
    shim = os.path.join(
        tempfile.gettempdir(), f"streamz_spark_pb_shim_{os.getuid()}"
    )
    link = os.path.join(shim, "google", "protobuf")
    try:
        os.makedirs(os.path.join(shim, "google"), exist_ok=True)
        if os.path.islink(link):
            if os.readlink(link) != src:
                os.remove(link)
                os.symlink(src, link)
        elif not os.path.exists(link):
            os.symlink(src, link)
        return shim
    except OSError:
        return None


def ensure_protobuf_runtime() -> str | None:
    """Make ``google.protobuf`` importable for BOTH the driver and
    Spark's Python workers without installing anything.

    Resolution order: (1) already importable (site-packages); (2)
    ``$SPARK_GRAFT_PROTOBUF_PATH``; (3) known offline bundles
    (``BUNDLED_PROTOBUF_ROOTS``). Rather than exposing a bundle root
    wholesale, a scoped shim (see ``_protobuf_shim_dir``) exporting
    only ``google.protobuf`` is APPENDED to ``sys.path`` and to
    ``os.environ['PYTHONPATH']`` — appended, so anything actually
    installed always wins, and scoped, so the bundle's other vendored
    packages (appengine/auth/oauth2) can never shadow real ones.
    Local-mode Python workers inherit the driver process environment,
    so they resolve the same runtime. Protobuf's own
    ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` flag is set only
    when a bundle is actually used: pyspark 4.1 ships gencode 6.33
    while the gcloud bundle is runtime 6.32 — same major version,
    wire-compatible per protobuf's cross-version guarantee; only the
    advisory minor-version check needs relaxing. Must run before the
    JVM starts for workers to see the env (``session.get_spark``
    calls it).

    Returns the source used ("site-packages" or the bundle root), or
    None when no runtime exists.
    """
    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            return "site-packages"
    except ModuleNotFoundError:
        pass
    candidates = []
    env_root = os.environ.get("SPARK_GRAFT_PROTOBUF_PATH")
    if env_root:
        candidates.append(env_root)
    candidates.extend(BUNDLED_PROTOBUF_ROOTS)
    for root in candidates:
        if not os.path.isfile(os.path.join(root, "google", "protobuf", "__init__.py")):
            continue
        # prefer the scoped shim; fall back to the raw root (still
        # appended) only if symlinks are unavailable
        entry = _protobuf_shim_dir(root) or root
        if entry not in sys.path:
            sys.path.append(entry)
        importlib.invalidate_caches()
        try:
            if importlib.util.find_spec("google.protobuf") is None:
                continue
        except ModuleNotFoundError:
            continue
        pythonpath = os.environ.get("PYTHONPATH", "")
        if entry not in pythonpath.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                (pythonpath + os.pathsep if pythonpath else "") + entry
            )
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        return root
    return None


def tws_runtime_available() -> bool:
    """The TWS Python worker talks to the JVM state server over a
    protobuf protocol; probe (and if needed, recover — see
    ``ensure_protobuf_runtime``) the runtime so callers fail or skip
    up front with the real reason."""
    if ensure_protobuf_runtime() is None:
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def require_rocksdb(spark) -> None:
    """transformWithState only runs on the RocksDB provider; fail with
    an actionable message instead of a mid-stream Py4J error."""
    conf = "spark.sql.streaming.stateStore.providerClass"
    current = spark.conf.get(conf, "")
    if "RocksDB" not in (current or ""):
        raise RuntimeError(
            f"transformWithStateInPandas requires the RocksDB state store: "
            f"spark.conf.set('{conf}', '{ROCKSDB_PROVIDER}')"
        )
    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its Python worker speaks a protobuf state-server protocol); "
            "not installed in this environment"
        )


def running_sum_tws(sdf: DataFrame, key: str, value_col: str = "value") -> DataFrame:
    """Keyed running total on a ValueState variable — the TWS analogue
    of ``stateful.running_sum`` (same output schema, differential-tested
    equal). One emit per key per micro-batch."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningSum(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total double")

        def handleInputRows(self, key_, rows, timerValues):
            total = self._total.get()[0] if self._total.exists() else 0.0
            emitted = False
            for pdf in rows:
                total += float(pdf[value_col].sum())
                emitted = True
            self._total.update((total,))
            if emitted:
                yield pd.DataFrame({key: [key_[0]], "running_sum": [total]})

        def close(self) -> None:
            pass

    require_rocksdb(sdf.sparkSession)
    return (
        sdf.select(key, value_col)
        .groupBy(key)
        .transformWithStateInPandas(
            RunningSum(),
            outputStructType=f"{key} long, running_sum double",
            outputMode="Update",
            timeMode="None",
        )
    )


def count_window_sum_tws(
    sdf: DataFrame, key: str, n: int, value_col: str = "value"
) -> DataFrame:
    """Sliding count-window sum per key on a ListState tail — the TWS
    analogue of ``stateful.count_window_sum`` (reference window(n=),
    streamz dataframe/core.py:129-169). The last-n buffer lives in a
    ListState variable: appends don't rewrite the whole buffer the way
    a single serialized tuple does."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CountWindow(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tail = handle.getListState("tail", "v double")

        def handleInputRows(self, key_, rows, timerValues):
            tail = [r[0] for r in self._tail.get()] if self._tail.exists() else []
            emitted = False
            for pdf in rows:
                tail.extend(float(v) for v in pdf[value_col])
                emitted = True
            tail = tail[-n:]
            self._tail.put([(v,) for v in tail])
            if emitted:
                yield pd.DataFrame(
                    {
                        key: [key_[0]],
                        "window_sum": [sum(tail)],
                        "window_len": [len(tail)],
                    }
                )

        def close(self) -> None:
            pass

    require_rocksdb(sdf.sparkSession)
    return (
        sdf.select(key, value_col)
        .groupBy(key)
        .transformWithStateInPandas(
            CountWindow(),
            outputStructType=f"{key} long, window_sum double, window_len int",
            outputMode="Update",
            timeMode="None",
        )
    )


def latest_value_ttl_tws(
    sdf: DataFrame, key: str, value_col: str = "value", ttl_ms: int = 60_000
) -> DataFrame:
    """Latest value per key with DECLARATIVE state TTL — the TWS
    feature the classic API cannot express: ``getValueState(...,
    ttlDurationMs=...)`` lets the state store itself expire idle
    entries, so eviction costs no Python roundtrip and no hand-rolled
    timestamp arrays (contrast ``stateful.streaming_minhash_neardup``,
    which carries per-member seen-times and sweeps on
    ProcessingTimeTimeout). A key silent for a full TTL reads as
    absent on its next event: the emitted ``had_state`` flag makes
    expiry observable (and testable) from the output alone.

    Requires ``timeMode="ProcessingTime"`` — TTL clocks are engine
    time. One emit per key per micro-batch.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LatestWithTTL(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._latest = handle.getValueState(
                "latest", "v double", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key_, rows, timerValues):
            had = self._latest.exists()
            latest = None
            for pdf in rows:
                if len(pdf):
                    latest = float(pdf[value_col].iloc[-1])
            if latest is not None:
                self._latest.update((latest,))
                yield pd.DataFrame(
                    {key: [key_[0]], "latest": [latest], "had_state": [had]}
                )

        def close(self) -> None:
            pass

    require_rocksdb(sdf.sparkSession)
    return (
        sdf.select(key, value_col)
        .groupBy(key)
        .transformWithStateInPandas(
            LatestWithTTL(),
            outputStructType=f"{key} long, latest double, had_state boolean",
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )


def frequencies_tws(
    sdf: DataFrame, key: str, value_col: str = "event_type"
) -> DataFrame:
    """Per-key categorical value counts on a MapState variable — the
    TWS analogue of ``Stream.frequencies`` kept incrementally per
    group key (reference ``frequencies``, streamz core.py, via
    accumulate). MapState is the third typed state variable (after
    Value/List): each category's count is addressed individually, so
    updating one category neither deserializes nor rewrites the rest
    of the map — the structural win over a dict pickled into a single
    applyInPandasWithState tuple. Emits the key's full current
    histogram (one row per category) each micro-batch it receives
    input — update-mode semantics, like ``value_counts``.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Frequencies(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("counts", "cat string", "n long")

        def handleInputRows(self, key_, rows, timerValues):
            delta: dict = {}
            for pdf in rows:
                for v in pdf[value_col]:
                    delta[str(v)] = delta.get(str(v), 0) + 1
            if not delta:
                return
            for cat, n in delta.items():
                prev = (
                    self._counts.getValue((cat,))[0]
                    if self._counts.containsKey((cat,))
                    else 0
                )
                self._counts.updateValue((cat,), (prev + n,))
            cats, counts = [], []
            for k_, v_ in self._counts.iterator():
                cats.append(k_[0])
                counts.append(int(v_[0]))
            yield pd.DataFrame(
                {key: [key_[0]] * len(cats), "category": cats, "count": counts}
            )

        def close(self) -> None:
            pass

    require_rocksdb(sdf.sparkSession)
    return (
        sdf.select(key, value_col)
        .groupBy(key)
        .transformWithStateInPandas(
            Frequencies(),
            outputStructType=f"{key} long, category string, count long",
            outputMode="Update",
            timeMode="None",
        )
    )


def session_gap_tws(
    sdf: DataFrame, key: str, value_col: str = "value", gap_ms: int = 5_000
) -> DataFrame:
    """Processing-time session windows driven by TWS TIMERS: events
    accumulate per key; when a key goes silent for ``gap_ms`` the
    registered timer fires and the engine calls ``handleExpiredTimer``
    — the session summary is emitted WITHOUT any new input arriving
    for that key. That event-driven emit is the capability timers add
    over applyInPandasWithState's coarse per-key timeout (which this
    engine's ``stateful`` module uses for TTL sweeps): each input
    reschedules a single per-key timer (delete + register), state
    clears on fire, and an idle key costs nothing until its one timer
    expires.

    Emits ``(key, n_events, total, closed_at_ms)`` per closed session.
    Requires ``timeMode="ProcessingTime"`` (timer clock) and the
    RocksDB provider.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_col = key

    class SessionGap(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._acc = handle.getValueState("acc", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                (self._acc.get()[0], self._acc.get()[1])
                if self._acc.exists()
                else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._acc.update((n, total))
            # slide the single per-key timer to now + gap
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + gap_ms
            )
            return iter(())

        # the worker invokes this by KEYWORD (key=..., timerValues=...,
        # expiredTimerInfo=...), so parameter names must match the
        # StatefulProcessor base signature exactly
        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._acc.exists():
                n, total = self._acc.get()
                self._acc.clear()
                yield pd.DataFrame(
                    {
                        key_col: [key[0]],
                        "n_events": [int(n)],
                        "total": [float(total)],
                        "closed_at_ms": [int(expiredTimerInfo.getExpiryTimeInMs())],
                    }
                )

        def close(self) -> None:
            pass

    require_rocksdb(sdf.sparkSession)
    return (
        sdf.select(key, value_col)
        .groupBy(key)
        .transformWithStateInPandas(
            SessionGap(),
            outputStructType=(
                f"{key} long, n_events long, total double, closed_at_ms long"
            ),
            outputMode="Append",
            timeMode="ProcessingTime",
        )
    )
