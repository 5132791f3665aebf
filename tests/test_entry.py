"""Smoke tests for the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    outcomes = {r["outcome"] for r in rows}
    # every branch of the reference ladder is populated
    assert {"update", "adopt", "create"} <= outcomes
    assert "dlq_ambiguous" in outcomes or "dlq_no_email" in outcomes


def test_queries_and_oracle_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "no queries registered"
    assert set(o) <= set(q)


def test_queries_run_and_match_declared_columns(spark, sf_dir):
    q = entrymod.queries()
    for name, fn in q.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
