"""Table loading with schema normalization.

The reference engine types streams via a required ``example`` frame
(streamz/collection.py:176-181); here the parquet footer *is* the
schema and Catalyst's analyzer propagates it. The one wrinkle is
TIMESTAMP(NANOS) columns, which Spark reads only as raw int64 under
``spark.sql.legacy.parquet.nanosAsLong`` — we detect them from the
parquet footer (pyarrow) and convert to timestamp_ntz losslessly.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["load_table", "load_tables", "register_views", "ensure_scan_parallelism", "TABLES"]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Column names stored as timestamp[ns] in the parquet footer."""
    try:
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
    except Exception:
        return ()
    import pyarrow as pa

    return tuple(
        f.name for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table, normalizing ns-timestamp columns.

    Works on any caller-supplied SparkSession: reading TIMESTAMP(NANOS)
    parquet requires ``spark.sql.legacy.parquet.nanosAsLong`` (a runtime
    SQL conf), so we set it here rather than relying on the session
    factory in :mod:`streamz_spark.session`.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in nanos_cols:
        # ns int64 -> µs by *truncating* integer division (`div`), matching
        # how DuckDB reads the same file as TIMESTAMP(us). Float division
        # would round and diverge on rows with sub-µs bits (~99% of rows).
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# schema-metadata key marking a frame already fanned out by
# ensure_scan_parallelism (compose-guard against double repartition)
_FANOUT_TAG = "streamz_spark.fanout"

_BYTE_CONF_RE = None


def _parse_byte_conf(s: str) -> int:
    """Parse a Spark byte conf value, mirroring JavaUtils.byteStringAs:
    bare digits, one-letter ('128m', '1g'), and two-letter ('128mb',
    '1gb', '64kb', '2tb') suffixes are all Spark-legal.
    """
    global _BYTE_CONF_RE
    if _BYTE_CONF_RE is None:
        import re

        _BYTE_CONF_RE = re.compile(r"^(\d+)\s*([kmgtp]?)b?$")
    m = _BYTE_CONF_RE.match(s.strip().lower())
    if not m:
        raise ValueError(f"unparseable byte conf: {s!r}")
    mult = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3,
            "t": 1024**4, "p": 1024**5}[m.group(2)]
    return int(m.group(1)) * mult


# text compression codecs Spark cannot split: the whole file is one
# task regardless of byte ranges (parquet's internal compression is
# fine — splits happen at row-group boundaries above the codec)
_NON_SPLITTABLE_EXTS = (".gz", ".zst", ".bz2", ".lz4", ".snappy", ".deflate", ".xz")


@lru_cache(maxsize=4096)
def _file_scan_splits(path: str, size: int, mtime_ns: int, max_partition_bytes: int) -> int:
    """Scan splits for ONE file; cached on (path, size, mtime) so an
    overwritten/appended file at the same path re-estimates instead of
    serving a stale process-lifetime count."""
    import math

    byte_splits = max(1, math.ceil(size / max_partition_bytes))
    if byte_splits > 1:
        if path.endswith(".parquet"):
            try:
                import pyarrow.parquet as pq

                byte_splits = min(
                    byte_splits, max(1, pq.ParquetFile(path).metadata.num_row_groups)
                )
            except Exception:
                pass  # unreadable footer: keep the byte-range estimate
        elif path.endswith(_NON_SPLITTABLE_EXTS):
            # compressed text (.json.gz, .csv.zst, ...): Spark reads the
            # whole file in one task — byte ranges don't apply
            byte_splits = 1
    return byte_splits


def _effective_scan_splits(files: tuple[str, ...], max_partition_bytes: int) -> int:
    """Estimated count of NON-EMPTY scan splits Spark will plan for
    these files: byte-range splits per file, capped by the parquet
    row-group count when the file is big enough to matter (a
    single-row-group file yields one non-empty split no matter how
    many byte ranges cover it — each row group is read by the split
    containing its midpoint), and forced to 1 for non-splittable
    compressed text. Files under max_partition_bytes never need a
    footer read; unreadable/remote files count as one split
    (conservative: at 100 TB the file count alone clears any target).
    """
    total = 0
    for uri in files:
        path = uri
        if path.startswith("file://"):
            path = path[7:]
        elif path.startswith("file:"):
            path = path[5:]
        try:
            st = os.stat(path)
        except OSError:
            total += 1
            continue
        total += _file_scan_splits(path, st.st_size, st.st_mtime_ns, max_partition_bytes)
    return total


def estimate_scan_rows(df: DataFrame) -> int | None:
    """PLAN-ONLY row-count estimate from the parquet footers of the
    frame's input files — no action, no physical planning. ``None``
    when there is no file scan underneath (in-memory relations,
    ``spark.range``), any input is non-parquet, or a footer is
    unreadable. Upstream filters are not accounted, so this
    OVERESTIMATES filtered frames — callers dispatching on it (e.g.
    ``similarity.*(kernel="auto")``) get the at-scale arm at worst.
    """
    try:
        files = tuple(df.inputFiles())
        if not files:
            return None
        import pyarrow.parquet as pq

        total = 0
        for uri in files:
            path = uri
            if path.startswith("file://"):
                path = path[7:]
            elif path.startswith("file:"):
                path = path[5:]
            if not path.endswith(".parquet"):
                return None
            total += pq.ParquetFile(path).metadata.num_rows
        return total
    except Exception:
        return None


def ensure_scan_parallelism(
    df: DataFrame,
    min_partitions: int | None = None,
    keys: tuple[str, ...] | None = None,
) -> DataFrame:
    """Fan a low-split scan out to the cluster's parallelism before
    compute-heavy narrow work (per-row regex, shingling, array folds).

    Parquet is only splittable at row-group boundaries, so a file
    written as one row group scans as ONE task no matter how many cores
    exist — the classic small-input serialization trap (the local
    testdata is exactly this shape, and real pipelines hit it on
    re-compacted or operator-written inputs). The round-robin
    repartition costs one shuffle of the input bytes, which is only
    paid when the scan has fewer splits than cores — i.e. when the
    input is at most ~cores x 128 MB. At 100 TB the scan arrives with
    thousands of natural splits and this is a plan-unchanged no-op; it
    never *reduces* partitioning.

    The split count is estimated PLAN-ONLY from ``df.inputFiles()``
    plus file sizes / parquet row-group counts — never via ``df.rdd``,
    which would force full physical planning and a Python↔JVM RDD
    bridge on every operator invocation (and is unsupported under
    Spark Connect). Frames with no file scan underneath (in-memory
    relations, ``spark.range``) and frames that already carry an
    explicit repartition are returned unchanged: their partitioning is
    the planner's (or the caller's) choice, and post-shuffle frames
    already arrive with ``spark.sql.shuffle.partitions`` tasks.

    ``keys``: optional column names for a *keyed* (hash) fan-out instead
    of round-robin. Two wins when a downstream aggregate dedupes or
    partially aggregates on those keys: the keyless round-robin path
    pays a per-task sort of its input (sortBeforeRepartition, needed for
    deterministic retries) which hash partitioning does not, and hash
    collocation keeps each key's partial-aggregation state in exactly
    one partition instead of duplicating it across all of them. Callers
    must pick keys with far more distinct values than partitions
    (guide-style: 20-100x) or the hash will skew the fan-out.
    """
    if df.isStreaming:
        # micro-batch parallelism is the source's concern
        # (maxFilesPerTrigger / partition count)
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        files = tuple(df.inputFiles())
        if not files:
            return df
        # guard against double-fanning when operators compose: frames
        # downstream of a previous fan-out carry a schema-metadata tag
        # (public API — no private JVM-handle plan inspection, works on
        # Connect-style sessions); metadata survives projections and
        # renames of the tagged columns, so the common compose shape
        # (narrow transforms between two operators) is caught
        if any(f.metadata.get(_FANOUT_TAG) for f in df.schema.fields):
            return df
        mpb = _parse_byte_conf(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
        if _effective_scan_splits(files, mpb) >= target:
            return df
    except Exception:
        # capability probe failed: never let the fan-out helper break
        # the query
        return df
    out = df.repartition(target, *keys) if keys else df.repartition(target)
    try:
        for f in out.schema.fields:
            out = out.withMetadata(f.name, {**f.metadata, _FANOUT_TAG: True})
    except Exception:
        pass  # tagging is best-effort; worst case is one extra shuffle
    return out
