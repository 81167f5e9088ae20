"""Capture .explain("formatted") output for named catalog queries.

Usage:
    python scripts/capture_plans.py OUTDIR SUFFIX query [query ...]
    python scripts/capture_plans.py OUTDIR SUFFIX --all

Writes OUTDIR/<query>_<SUFFIX>.txt per query. SF dir from
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Barrier-free capture: queries built around ``localCheckpoint``
barriers (q2, dsir, the fused LM family, ...) hide their construction
behind ExistingRDD nodes in a plain capture. Set
``SPARK_GRAFT_CAPTURE_NOBARRIER=1`` to patch
``pyspark.sql.classic.dataframe.DataFrame.localCheckpoint`` (the
classic class — the base ``pyspark.sql.DataFrame`` is not the one
dispatched) to identity for the capture, exposing the full logical
shape. NOTE: a barrier-free plan shows each shared subtree once PER
CONSUMER (that duplication is exactly what the barrier removes at
runtime), so read it for construction shape, and the barrier capture
+ exec-metrics for the dedup evidence. The capture header records
which mode produced it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamz_spark.catalog import load_all
from streamz_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    header = ""
    if os.environ.get("SPARK_GRAFT_CAPTURE_NOBARRIER"):
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        _CDF.localCheckpoint = lambda self, eager=True: self
        header = (
            "-- captured with SPARK_GRAFT_CAPTURE_NOBARRIER=1: "
            "localCheckpoint patched to identity so the construction "
            "behind every barrier is visible; shared subtrees appear "
            "once per consumer (the runtime barrier evaluates them "
            "once)\n"
        )
    spark = get_spark("plan_capture")
    registry = dict(load_all())
    try:
        from streamz_spark.queries.extra import EXTRA_REGISTRY

        registry.update(EXTRA_REGISTRY)
    except Exception:
        pass
    if names == ["--all"]:
        names = sorted(registry)
    for name in names:
        if name not in registry:
            print(f"SKIP (not registered): {name}", file=sys.stderr)
            continue
        try:
            import contextlib
            import io

            df = registry[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:
            plan = f"PLAN CAPTURE FAILED: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(header + plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
