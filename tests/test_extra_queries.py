"""Extra-catalog correctness: the driver's registry is capped at 50
entries, so the queries in streamz_spark/queries/extra.py are held to
the SAME rows+schema+hash bar here instead — DuckDB oracle on the same
parquet, order-insensitive compare, exact equality after sorting."""

from __future__ import annotations

import duckdb
import pytest

from streamz_spark.queries.extra import EXTRA_REGISTRY

from .conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_driver_registry_is_exactly_50():
    # the driver evaluates at most 50 entries; a 51st would silently
    # push the last one off the correctness gate. Extras must go to
    # EXTRA_REGISTRY, never the main one.
    from streamz_spark.catalog import load_all

    assert len(load_all()) == 50


@pytest.mark.parametrize("name", sorted(EXTRA_REGISTRY))
def test_extra_query_matches_oracle(name, spark, duck):
    qd = EXTRA_REGISTRY[name]
    spdf = qd.fn(spark, SF_DIR).toPandas()
    if qd.oracle is None:
        # genuinely iterative ops (global argmax per training round)
        # can't be one SQL query — same carve-out the driver contract
        # gives oracle-less entries, held to an explicit weaker bar:
        # the doc must declare it, the result must be non-trivial and
        # bit-deterministic across runs (pytest owns deep correctness)
        assert qd.doc.startswith("ITERATIVE"), f"{name}: oracle-less extras must declare ITERATIVE"
        assert len(spdf) > 0
        again = qd.fn(spark, SF_DIR).toPandas()
        cols = sorted(spdf.columns)
        s = spdf.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
        a = again.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
        assert s.equals(a), f"{name}: nondeterministic result"
        return
    odf = duck.execute(qd.oracle).df()
    assert len(spdf) == len(odf), f"{name}: rows {len(spdf)} vs {len(odf)}"
    cols = sorted(spdf.columns)
    assert cols == sorted(odf.columns), f"{name}: schema {cols} vs {sorted(odf.columns)}"
    s = spdf.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    o = odf.reindex(cols, axis=1).sort_values(cols, ignore_index=True)
    # align representation dtypes (e.g. datetime64[ns] vs [us]) — the
    # driver compares value hashes, not physical dtypes
    o = o.astype(s.dtypes.to_dict())
    if not s.equals(o):
        diff = (s != o) & ~(s.isna() & o.isna())
        raise AssertionError(f"{name}: value mismatch\n{s[diff.any(axis=1)].head()}\n"
                             f"{o[diff.any(axis=1)].head()}")


def test_extra_catalog_count_matches_readme():
    # README drifted from the registry once (said 15 when 19 existed);
    # pin the documented count to the code
    import pathlib
    import re

    readme = pathlib.Path(__file__).parent.parent / "README.md"
    m = re.search(r"second oracle-checked catalog — (\d+) entries", readme.read_text())
    assert m, "README no longer documents the extra-catalog count"
    assert int(m.group(1)) == len(EXTRA_REGISTRY), (
        f"README says {m.group(1)} extra entries, registry has {len(EXTRA_REGISTRY)}"
    )
