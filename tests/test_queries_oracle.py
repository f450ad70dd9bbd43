"""Regression net: every registered query vs its DuckDB oracle at
sf0.001 (the driver's gate runs the same comparison at sf0.01 —
tools/oracle_check.py replicates that; this is the fast CI version).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tools.oracle_check import compare, duck_connect

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duck_connect(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_smoke):
    spdf = QUERIES[name](spark, sf_smoke).toPandas()
    if name not in ORACLES:
        assert len(spdf) >= 0  # rows-only contract: runs and has a schema
        assert len(spdf.columns) > 0
        return
    dpdf = duck.execute(ORACLES[name]).df()
    ok, msg = compare(spdf, dpdf)
    assert ok, f"{name}: {msg}"
    assert msg == "exact", f"{name} not bit-exact: {msg}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"c_custkey", "avg_top6_er", "n_top"}
