"""Local replica of the driver's t2 correctness gate: run every
registered Spark query AND its DuckDB oracle SQL over the same parquet
tables, then compare row count, sorted column names, and the full
value multiset EXACTLY (bit-exact doubles — stricter than any hash
scheme the driver might apply).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb
import pytest

from reverse_etl_homebrew_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Canonical comparison form for one cell."""
    if isinstance(v, float):
        if math.isnan(v):
            # own tag, not ("f", "nan"): a mixed NaN/finite column
            # would otherwise compare str-vs-float inside sorted()
            return ("fnan",)
        return ("f", v)
    if isinstance(v, decimal.Decimal):
        # DuckDB returns DECIMAL columns as decimal.Decimal; under
        # same-family type drift (double -> decimal(12,2), an r12
        # TOLERATED class) the engine reads double while the oracle
        # reads Decimal of the SAME value — normalize to the float
        # tag so the harness compares values, not wire types
        return ("f", float(v))
    if isinstance(v, dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if v is None:
        return ("n",)
    return ("s", str(v))


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = _duck(SF_DIR)
    yield con
    con.close()


ORACLE_KEYS = sorted(Q.ORACLE)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, name, duck):
    sdf = Q.QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(Q.ORACLE[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_all_queries_have_unique_names():
    assert len(Q.QUERIES) == len(set(Q.QUERIES))
    missing = set(Q.ORACLE) - set(Q.QUERIES)
    assert not missing
