"""Duplicate-key / ordering-tie poison class (twelfth, r14 —
fixtures/dupkey_tie_probe.py). Pins:

1. upsert_merge's window ordering is TOTAL under in-batch duplicate
   keys with tied order_col: the winner is decided by the payload
   arbitration (remaining columns DESC NULLS LAST), identically at
   any shuffle width and identically in the DuckDB oracle's mirrored
   ORDER BY. Before the r14 fix the ordering was
   (order_col DESC, __src DESC) — the probe read a different winner
   per DuckDB run on the planted ties.
2. read_high_watermark resolves tied finished_at instants to the MAX
   watermark among the tied successes — deterministic and monotone.
3. The planted boundary ties (topk-sort price tie at rank 10/11,
   duplicated vectors tying topk-similarity at the k boundary,
   duplicated texts tying bm25 at ranks 9-12) are decided by the id
   tie-break IDENTICALLY by engine and oracle.
4. The parity + width-stability sweep stays clean on the poisoned
   dir for the representative tie-sensitive keys (full-registry
   adjudication recorded in the probe docstring / SCALE.md).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from reverse_etl_homebrew_spark import queries as Q
from reverse_etl_homebrew_spark.operators import merge as MG

from test_oracle_parity import _duck, _rowset

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "fixtures"))
from dupkey_tie_probe import build_dup_dir  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# Tie-sensitive representatives: last-writer-wins, ranking boundary,
# score-tie boundary, per-group latest, and a fan-out join family.
TIE_KEYS = [
    "merge-upsert",
    "topk-sort",
    "latest-per-group",
    "dedup-lastwin",
    "window-rank",
    "topk-similarity",
    "knn-join",
    "bm25-topk",
    "equi-inner-join",
    "email-match-join",
]


@pytest.fixture(scope="module")
def dup_dir():
    d = build_dup_dir(SF_DIR)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def duck(dup_dir):
    con = _duck(dup_dir)
    yield con
    con.close()


def _engine_rowset(spark, name, data_dir, width):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        sdf = Q.QUERIES[name](spark, data_dir)
        return sdf.columns, _rowset(
            sdf.columns, [tuple(r) for r in sdf.collect()]
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


@pytest.mark.parametrize("name", TIE_KEYS)
def test_tie_keys_stable_and_match_oracle(spark, name, duck, dup_dir):
    cols7, rows7 = _engine_rowset(spark, name, dup_dir, 7)
    cols32, rows32 = _engine_rowset(spark, name, dup_dir, 32)
    assert rows7 == rows32, f"{name}: engine winner depends on shuffle width"
    d1 = duck.execute(Q.ORACLE[name])
    dcols = [c[0] for c in d1.description]
    drows1 = _rowset(dcols, d1.fetchall())
    drows2 = _rowset(dcols, duck.execute(Q.ORACLE[name]).fetchall())
    assert drows1 == drows2, f"{name}: oracle ordering is not total"
    assert sorted(cols32) == sorted(dcols), name
    assert rows32 == drows1, f"{name}: engine/oracle disagree under ties"


def test_upsert_merge_in_batch_tie_is_deterministic(spark):
    """Two same-batch writers with equal (key, updated_at) resolve by
    payload arbitration — val DESC — at every width, never by
    partition merge order."""
    ts = dt.datetime(2024, 5, 5, 12, 0, 0)
    existing = spark.createDataFrame(
        [(1, 10.0, ts), (2, 20.0, ts)], "key long, val double, updated_at timestamp"
    )
    incoming = spark.createDataFrame(
        [(1, 77.0, ts), (1, 33.0, ts), (3, 5.0, ts)],
        "key long, val double, updated_at timestamp",
    )
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    for width in (2, 16):
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        try:
            out = {
                r["key"]: r["val"]
                for r in MG.upsert_merge(
                    existing, incoming.repartition(width), ["key"], "updated_at"
                ).collect()
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
        assert out == {1: 77.0, 2: 20.0, 3: 5.0}


def test_upsert_merge_null_payload_loses_arbitration(spark):
    """DESC NULLS LAST: a NULL payload ties below any concrete value,
    so the concrete writer wins deterministically on both engines'
    semantics."""
    ts = dt.datetime(2024, 5, 5, 12, 0, 0)
    existing = spark.createDataFrame([], "key long, val double, updated_at timestamp")
    incoming = spark.createDataFrame(
        [(1, None, ts), (1, 3.0, ts)], "key long, val double, updated_at timestamp"
    )
    out = MG.upsert_merge(existing, incoming, ["key"], "updated_at").collect()
    assert [(r["key"], r["val"]) for r in out] == [(1, 3.0)]


def test_read_high_watermark_tied_finish_takes_max(spark, tmp_path):
    """Two success rows with the same finished_at instant: the max
    high_watermark wins (monotone), not the partition-merge winner.
    (Rows written directly — append_ledger_row stamps finished_at
    itself, so ties can't be planted through the API.)"""
    from reverse_etl_homebrew_spark.sinks.control import (
        LEDGER_SCHEMA,
        ControlTables,
    )

    ct = ControlTables(spark, str(tmp_path / "ctl"))
    ct.ensure()
    fin = dt.datetime(2024, 6, 1, 0, 0, 0)
    rows = [
        {
            "run_id": f"r{i}",
            "started_at": fin,
            "finished_at": fin,
            "job_type": "sync",
            "high_watermark": hw,
            "read_count": 1,
            "updated_count": 0,
            "created_count": 0,
            "skipped_count": 0,
            "error_count": 0,
            "status": "success",
        }
        for i, hw in enumerate(
            (dt.datetime(2024, 5, 30), dt.datetime(2024, 5, 31))
        )
    ]
    spark.createDataFrame(rows, LEDGER_SCHEMA).write.mode("append").parquet(
        ct.paths["run_ledger"]
    )
    assert ct.read_high_watermark("sync") == dt.datetime(2024, 5, 31)


def test_planted_boundary_ties_decided_by_id(spark, dup_dir, duck):
    """The planted topk-sort boundary row ties the rank-10 price
    exactly; both engines must include the LOWER orderkey of the tied
    pair (ORDER BY o_totalprice DESC, o_orderkey)."""
    rows = Q.QUERIES["topk-sort"](spark, dup_dir).collect()
    prices = [r["o_totalprice"] for r in rows]
    assert len(prices) == 10
    tied = [r["o_orderkey"] for r in rows if r["o_totalprice"] == prices[-1]]
    import duckdb  # noqa: F401

    d = duck.execute(Q.ORACLE["topk-sort"]).fetchall()
    assert [(r["o_orderkey"], r["o_totalprice"]) for r in rows] == [
        (k, p) for k, p in d
    ]
    # the boundary price exists on BOTH the kept and the excluded row
    # in the poisoned table — i.e. the tie is real, not vacuous
    n_at_boundary = duck.execute(
        "SELECT count(*) FROM orders WHERE o_totalprice = ?", [prices[-1]]
    ).fetchone()[0]
    assert n_at_boundary >= 2
    assert tied == sorted(tied)
