"""Capture .explain("formatted") output for named catalog queries.

Usage:
    python scripts/capture_plans.py OUTDIR SUFFIX query [query ...]
    python scripts/capture_plans.py OUTDIR SUFFIX --all

Writes OUTDIR/<query>_<SUFFIX>.txt per query. SF dir from
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
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
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
