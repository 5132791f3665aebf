#!/usr/bin/env python
"""Re-delivery probe: duplicate a deterministic slice of rows in a
COPY of the testdata — the at-least-once ingest reality (a 100 TB
pipeline WILL see re-delivered batches) — and run every oracle-backed
key through the parity compare.

This is the third poison class after NULL values (r10) and NULL keys
(r11): EXACT duplicate rows with the same primary key. It exposes a
divergence family the other arms can't: any place one engine
aggregates per id while the other computes per physical row, any
window that assumes id uniqueness for a total order, and any count
that silently doubles.

Arms (deterministic, exact re-delivery — same id, same content):
- documents: rows with doc_id   % 37 == 0 appended once more
- events:    rows with event_id % 53 == 0 appended once more
- orders:    rows with o_orderkey % 59 == 0 appended once more

Verdicts are the same OK/MISMATCH taxonomy as the NULL probe. A
MISMATCH here means the two engines disagree about what a re-delivered
row does to the answer — a silent wrong answer the first time a batch
is retried in production.

Usage:
    python fixtures/redelivery_probe.py [sf_dir] [key ...]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

DUP = {
    "documents": "doc_id % 37 = 0",
    "events": "event_id % 53 = 0",
    "orders": "o_orderkey % 59 = 0",
}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_redelivered_dir(sf_dir: str) -> str:
    out = tempfile.mkdtemp(prefix="sg-redeliver-")
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t in DUP:
            con.execute(
                f"""COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT * FROM read_parquet('{src}') WHERE {DUP[t]}
                ) TO '{dst}' (FORMAT PARQUET)"""
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    poisoned = build_redelivered_dir(sf_dir)
    print(f"redelivered dir: {poisoned}")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_oracle_parity import _duck, _rowset

    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("redelivery-probe")
    duck = _duck(poisoned)

    counts = {"OK": 0, "MISMATCH": 0, "SPARK_ERR": 0, "DUCK_ERR": 0, "BOTH_RAISE": 0}
    for name, sql in Q.ORACLE.items():
        if only and name not in only:
            continue
        s_err = d_err = None
        try:
            sdf = Q.QUERIES[name](spark, poisoned)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            s_err = str(e)[:160]
        try:
            cur = duck.execute(sql)
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            d_err = str(e)[:160]
        if s_err and d_err:
            verdict = "BOTH_RAISE"
        elif s_err:
            verdict = "SPARK_ERR"
        elif d_err:
            verdict = "DUCK_ERR"
        elif sorted(s_cols) != sorted(d_cols):
            verdict = "MISMATCH"
        elif _rowset(s_cols, s_rows) != _rowset(d_cols, d_rows):
            verdict = "MISMATCH"
        else:
            verdict = "OK"
        counts[verdict] += 1
        if verdict != "OK":
            print(f"{verdict:10s} {name} {s_err or d_err or ''}")
    print("summary:", counts)
    spark.stop()


if __name__ == "__main__":
    main()
