"""Vacuity audit: find catalog queries whose correctness check has no
teeth at the test SFs — zero-row results, or single-row aggregates
that are entirely NULL (an aggregate over an empty filter set matches
its oracle trivially: both engines return NULL).

Found the round-8 q6 case: the standard TPC-H 1994 ship-date window
matches ZERO lineitem rows in this synthetic data (l_shipdate spans
1995-2001), so q6 passed rows+schema+hash for seven rounds while
summing nothing. The oracle gate is still sound (any non-vacuous bug
class in the plan would surface elsewhere), but vacuous entries
overstate coverage — this audit makes them visible and pins them.

Usage: python scripts/vacuity_audit.py [sf_dir]
Prints one row per flagged query; exits 0 always (report, not gate).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamz_spark.catalog import load_all
from streamz_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("vacuity-audit")
    from streamz_spark.queries.extra import EXTRA_REGISTRY

    registry = {**load_all(), **EXTRA_REGISTRY}
    flagged = []
    print("| query | rows | issue |")
    print("|---|---|---|")
    for name in sorted(registry):
        try:
            pdf = registry[name].fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"| {name} | - | ERROR: {exc} |", flush=True)
            flagged.append(name)
            continue
        issue = None
        if len(pdf) == 0:
            issue = "ZERO ROWS"
        elif pdf.isna().all(axis=None):
            issue = "ALL-NULL result"
        elif len(pdf) <= 2:
            # tiny results: flag if any column is entirely NULL
            null_cols = [c for c in pdf.columns if pdf[c].isna().all()]
            if null_cols:
                issue = f"all-NULL columns {null_cols}"
        if issue:
            flagged.append(name)
            print(f"| {name} | {len(pdf)} | {issue} |", flush=True)
    print(f"\n{len(flagged)} flagged of {len(registry)}: {flagged}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
