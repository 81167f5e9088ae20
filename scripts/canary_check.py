"""Quick host-quietness probe: run the pinned bench canary (tpch_q6,
min-of-3 under bench hygiene) at sf0.1 and print the ratio vs the
quiet-window reference. Use before taking an official bench artifact —
ratio <= 1.2 means the canary gate will accept the run.

Usage: python scripts/canary_check.py
Exit code 0 when quiet, 1 when noisy.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    CANARY_NOISY_RATIO,
    CANARY_NOISY_RATIO_BEFORE,
    CANARY_QUERY,
    CANARY_REF_SEC,
)


def main() -> None:
    from streamz_spark.catalog import load_all
    from streamz_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # derive the SF from the dir (as bench.py does) and look up the
    # reference by SF — comparing another scale factor's time against
    # the sf0.1 reference would produce a meaningless ratio
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    ref = CANARY_REF_SEC.get(sf_val)
    # this probe boots a FRESH session (one warm query), which is the
    # bench canary's BEFORE context: use the before-end reference and
    # its wider band (fresh-session JIT spread — see bench.py note)
    threshold = CANARY_NOISY_RATIO
    if isinstance(ref, dict):
        ref = ref.get("before")
        threshold = CANARY_NOISY_RATIO_BEFORE
    if ref is None:
        print(
            f"canary: no pinned quiet reference for sf={sf_val!r} "
            f"(have {sorted(CANARY_REF_SEC)}); refusing a meaningless ratio",
            file=sys.stderr,
        )
        sys.exit(2)
    spark = get_spark("canary-check")
    fn = load_all()[CANARY_QUERY].fn
    # warm once (JVM + parquet footers), then measure
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(3):
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    best = min(times)
    ratio = best / ref
    quiet = ratio <= threshold
    print(
        f"canary {CANARY_QUERY}: {best:.3f} s (ref {ref} s) "
        f"ratio {ratio:.3f} -> {'QUIET' if quiet else 'NOISY'}",
        flush=True,
    )
    spark.stop()
    sys.exit(0 if quiet else 1)


if __name__ == "__main__":
    main()
