"""Non-finite-value robustness gate (r11 probe, fifth poison class):
NaN/±Infinity planted in events.value and orders.o_totalprice — the
corrupt-measurement reality of any float-bearing ingest.

The probe found the two engines splitting into silent-vs-loud on
every exact-decimal path: DuckDB's CAST(double AS DECIMAL) refuses
NaN/Inf loudly while Spark's non-ANSI cast silently NULLs the value —
dropping the row from the exact sum, a silent wrong answer. Policies,
by operator family:

- ACCOUNTING aggregations (exact decimal sums: groupBy revenue,
  tumbling/sliding windows, running totals, conditional aggs, the IVM
  rollup, json money coercion): exact-or-loud — Spark now raises the
  same way DuckDB does (operators/aggregates.finite_dec /
  finite_dec_typed, plus the SQL-text twin in grouping-sets). A
  corrupt amount fails the batch; it never silently vanishes from a
  sum.
- Statistical DETECTORS (anomaly-zscore, mad-outliers, window-median,
  ewma-smooth): their domain is finite measurements — non-finite
  values are scoped out explicitly on BOTH sides
  (aggregates.is_finite / SQL isfinite), because a NaN inside a
  median frame makes Spark's percentile and DuckDB's quantile_cont
  silently disagree on every median it touches.
- Pure double pipelines (rank-funcs ordering, NaN-keyed grouping):
  already agree engine-to-engine (both sort NaN last) — left as-is,
  verified by the probe.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pytest

from reverse_etl_homebrew_spark import queries as Q

from test_oracle_parity import _duck, _rowset

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# keys whose exact-decimal ingress must RAISE on both engines
RAISING = [
    "equi-inner-join", "tumbling-window", "sliding-window",
    "json-coerce", "grouping-sets", "running-window",
    "skew-salted-join", "conditional-agg", "incremental-agg-merge",
]

# detector keys that must agree by finite-measurement scoping
SCOPED = ["anomaly-zscore", "mad-outliers", "window-median", "ewma-smooth"]

# engine-agreeing double pipelines, pinned so that stays true
NATURAL = ["rank-funcs", "lag-lead", "gap-fill", "stats-agg"]


@pytest.fixture(scope="module")
def poisoned():
    out = tempfile.mkdtemp(prefix="sg-nonfinite-gate-")
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "events":
            con.execute(f"""COPY (
              SELECT event_id, ts, user_id, event_type,
                     CASE WHEN event_id % 61 = 0 THEN 'nan'::DOUBLE
                          WHEN event_id % 67 = 0 THEN 'infinity'::DOUBLE
                          WHEN event_id % 71 = 0 THEN '-infinity'::DOUBLE
                          ELSE value END AS value, props
              FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""")
        elif t == "orders":
            con.execute(f"""COPY (
              SELECT o_orderkey, o_custkey, o_orderstatus,
                     CASE WHEN o_orderkey % 61 = 0 THEN 'nan'::DOUBLE
                          WHEN o_orderkey % 67 = 0 THEN 'infinity'::DOUBLE
                          ELSE o_totalprice END AS o_totalprice,
                     o_orderdate, o_orderpriority
              FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)""")
        else:
            shutil.copyfile(src, dst)
    con.close()
    return out


@pytest.fixture(scope="module")
def duck(poisoned):
    return _duck(poisoned)


@pytest.mark.parametrize("name", RAISING)
def test_exact_decimal_raises_on_both_engines(spark, name, duck, poisoned):
    with pytest.raises(Exception):
        Q.QUERIES[name](spark, poisoned).collect()
    with pytest.raises(Exception):
        duck.execute(Q.ORACLE[name]).fetchall()


def test_streaming_tumbling_raises_on_nonfinite(spark, tmp_path, poisoned):
    """stream ≡ batch for the accounting contract: a NaN amount must
    fail the STREAMING tumbling query loudly too (the batch twin
    raises), never silently drop money from a running total. Contrast
    the NULL-ts streaming policy, which drops rows — an unstamped
    event has defined semantics (no window), a NaN amount does not."""
    import shutil

    from reverse_etl_homebrew_spark.streaming.structured import (
        stream_events_tumbling,
    )

    events_dir = str(tmp_path / "ev")
    os.makedirs(events_dir)
    shutil.copy(os.path.join(poisoned, "events.parquet"), events_dir)
    with pytest.raises(Exception, match="non-finite|USER_RAISED"):
        stream_events_tumbling(
            spark, events_dir, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )


@pytest.mark.parametrize("name", SCOPED + NATURAL)
def test_nonfinite_parity(spark, name, duck, poisoned):
    sdf = Q.QUERIES[name](spark, poisoned)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(Q.ORACLE[name])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert _rowset(s_cols, s_rows) == _rowset(d_cols, d_rows)
