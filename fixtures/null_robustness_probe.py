#!/usr/bin/env python
"""NULL-robustness probe: plant NULLs in the nullable columns of a
COPY of the testdata, then run every oracle-backed registry key
through the same Spark-vs-DuckDB comparison the parity gate uses.

The clean testdata has no NULL timestamps/dates/texts, so a whole
class of wrong-answer divergences is structurally invisible to the
parity sweeps — the r10 asof_join NULL-ts/NULL-payload holes and the
ADVICE-r9 IAM null-watermark row loss were all of this class. This
probe makes the class visible: any key whose two engines disagree
ONLY under planted NULLs is a latent 100 TB wrong answer (real
corpora have NULLs everywhere).

Poisoning (deterministic):
- events.ts          -> NULL where event_id   % 11 == 0
- events.value       -> NULL where event_id   % 23 == 0
- events.event_type  -> NULL where event_id   % 29 == 0
- events.user_id     -> NULL where event_id   % 43 == 0
- orders.o_orderdate -> NULL where o_orderkey % 13 == 0
- orders.o_totalprice-> NULL where o_orderkey % 31 == 0
- orders.o_custkey   -> NULL where o_orderkey % 47 == 0
- documents.text     -> NULL where doc_id     % 17 == 0
- documents.doc_id   -> NULL where doc_id     % 53 == 0
- customer.c_acctbal -> NULL where c_custkey  % 19 == 0
- customer.c_mktsegment -> NULL where c_custkey % 23 == 0
- lineitem.l_quantity -> NULL where l_orderkey % 37 == 0
- embeddings.label   -> NULL where vec_id     % 41 == 0
(embedding vectors themselves stay non-NULL here: bulk NULL vectors
are a schema-contract violation for the ANN tier. NULL vectors in the
SEED positions — query vec_id 0, centroid ids < 8 — are separately
covered by tests/test_advisor_r12.py, which pins the r12 degrade
contract: seed readers skip NULL vectors and fence to empty exactly
like a missing seed. Label NULL exercises the grouping arm.
The join/grouping-key arms — user_id, o_custkey, doc_id — exist
because the r11 advisor showed the divergence class they expose is
structurally invisible to value-column poison: Spark window
partitionBy groups NULL keys into ONE partition while SQL equality
never matches NULL keys, so any operator implemented as a window on
one engine and a join on the other can silently hand a NULL-key row
another NULL-key row's payload, exactly as asof_join did.)

Usage:
    python fixtures/null_robustness_probe.py [sf_dir] [key ...]
Prints one line per key: OK / MISMATCH / SPARK_ERR / DUCK_ERR /
BOTH_RAISE (guards tripping identically on both engines count as
agreement).
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

POISON = {
    "events": "SELECT event_id, CASE WHEN event_id % 11 = 0 THEN NULL ELSE ts END AS ts, "
    "CASE WHEN event_id % 43 = 0 THEN NULL ELSE user_id END AS user_id, "
    "CASE WHEN event_id % 29 = 0 THEN NULL ELSE event_type END AS event_type, "
    "CASE WHEN event_id % 23 = 0 THEN NULL ELSE value END AS value, props "
    "FROM read_parquet('{src}')",
    "orders": "SELECT o_orderkey, "
    "CASE WHEN o_orderkey % 47 = 0 THEN NULL ELSE o_custkey END AS o_custkey, "
    "o_orderstatus, "
    "CASE WHEN o_orderkey % 31 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice, "
    "CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate, "
    "o_orderpriority FROM read_parquet('{src}')",
    "documents": "SELECT CASE WHEN doc_id % 53 = 0 THEN NULL ELSE doc_id END AS doc_id, "
    "CASE WHEN doc_id % 17 = 0 THEN NULL ELSE text END AS text, "
    "lang, source, n_chars FROM read_parquet('{src}')",
    "customer": "SELECT c_custkey, c_name, c_nationkey, "
    "CASE WHEN c_custkey % 19 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal, "
    "CASE WHEN c_custkey % 23 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment "
    "FROM read_parquet('{src}')",
    "lineitem": "SELECT * REPLACE (CASE WHEN l_orderkey % 37 = 0 THEN NULL "
    "ELSE l_quantity END AS l_quantity) FROM read_parquet('{src}')",
    "embeddings": "SELECT vec_id, embedding, "
    "CASE WHEN vec_id % 41 = 0 THEN NULL ELSE label END AS label "
    "FROM read_parquet('{src}')",
}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_poisoned_dir(sf_dir: str) -> str:
    out = tempfile.mkdtemp(prefix="sg-nullprobe-")
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t in POISON:
            con.execute(
                f"COPY ({POISON[t].format(src=src)}) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    poisoned = build_poisoned_dir(sf_dir)
    print(f"poisoned dir: {poisoned}")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_oracle_parity import _duck, _rowset  # same compare as the gate

    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("null-probe")
    duck = _duck(poisoned)

    counts = {"OK": 0, "MISMATCH": 0, "SPARK_ERR": 0, "DUCK_ERR": 0, "BOTH_RAISE": 0}
    bad = []
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
            bad.append((name, verdict, s_err or d_err or ""))
            print(f"{verdict:10s} {name} {s_err or d_err or ''}")
    print("summary:", counts)
    spark.stop()


if __name__ == "__main__":
    main()
