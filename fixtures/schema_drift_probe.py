#!/usr/bin/env python
"""Schema-drift probe (r12, the sixth poison class after NULL values,
NULL keys, re-delivery, non-finite floats, and empty input): rewrite a
COPY of the testdata with drifted schemas — dropped columns,
alias-spelled twins, cross-family type widening, additive columns —
and run every oracle-backed key through a THREE-WAY compare.

The reference's defining tolerance is spelling/presence drift
(``row.get("Patient Name") or row.get("Patient_Name")``,
main.py:645,736-737,569); the engine's policy taxonomy
(sources/catalog.py CANONICAL_TYPES + functions/scalars.col_or_null):

- PRESENCE drift: loud per-key (Spark unresolved column ≡ DuckDB
  binder error — BOTH_RAISE is agreement); invisible to keys that
  never read the column (column pruning); TOLERATED via col_or_null
  alias chains at the sync-pipeline ingest surface.
- SAME-FAMILY type drift (int32↔int64, double↔decimal): tolerated —
  both engines read the same file and agree.
- CROSS-FAMILY type drift (key/measure → VARCHAR, naive → tz-adjusted
  timestamp): REFUSED at ingress (SchemaContractError), before Spark's
  silent string→double casts can split from DuckDB's binder errors.
- ADDITIVE drift (extra columns): always tolerated, never read.

Per-key verdicts:
- NOOP            Spark ran and matches Spark-on-CLEAN bit-for-bit
                  (key never reads the drifted column, or alias
                  tolerance reproduced the canonical values).
- AGREE_DRIFTED   Spark ran, differs from clean, but matches the
                  DuckDB oracle over the SAME drifted dir — both
                  engines agree on what the new data means.
- TOLERATED       Spark ran (col_or_null degrade); the oracle — which
                  models the canonical catalog — raises. Must be one
                  of the DOCUMENTED degrade paths (sync pipelines).
- BOTH_RAISE      loud agreement (presence drift at a reading key).
- CONTRACT_LOUD   Spark refused at ingress with SchemaContractError
                  (the widen arms' REQUIRED outcome for every key
                  touching the table).
- SPARK_ERR / DUCK_ERR / MISMATCH  findings to fix.

First-run adjudication (r12, sf0.001, 11 arms x 156 keys): 4 findings,
all fixed two-sided and pinned in tests/test_schema_drift.py —
protected-drop's denylist leaked an alias-renamed protected column
(now an allowlist projection); the roi tier-0 balance filter crashed
on alias drift while its oracle ran (now the same col_or_null chain
as the row builders); SQLite staging bypassed the ingress contract
(VARCHAR measure staged silently into TEXT>REAL comparison order,
decimal crashing arrow staging — now contract-checked + canonical
cast via the correctly-rounded string parse); the DuckDB external
source passed untouched VARCHAR-widened keys (contract now uniform
across connectors). Plus one HARNESS fix: the comparator tagged
DuckDB Decimal cells as strings. End state re-run: **findings 0** —
drop arms ~148 NOOP + the readers BOTH_RAISE; alias arms 137/127
NOOP (sync pipelines bit-identical to clean) + readers BOTH_RAISE;
cross-family widen arms 34-43 CONTRACT_LOUD + rest NOOP; same-family
and additive arms 156/156 NOOP.

Usage:
    python fixtures/schema_drift_probe.py [sf_dir] [arm ...]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# arm -> {table: SELECT rewriting that table}; untouched tables copy.
ARMS: dict[str, dict[str, str]] = {
    # -- presence drift: optional descriptor columns dropped --
    "drop_documents_lang": {
        "documents": "SELECT doc_id, text, source, n_chars FROM read_parquet('{src}')",
    },
    "drop_customer_mktsegment": {
        "customer": "SELECT c_custkey, c_name, c_nationkey, c_acctbal "
        "FROM read_parquet('{src}')",
    },
    "drop_orders_priority": {
        "orders": "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        "o_orderdate FROM read_parquet('{src}')",
    },
    # -- presence drift: alias-spelled twins (canonical name ABSENT) --
    "alias_customer": {
        "customer": "SELECT c_custkey, c_name AS patient_name, c_nationkey, "
        "c_acctbal AS acctbal, c_mktsegment AS mktsegment "
        "FROM read_parquet('{src}')",
    },
    "alias_orders": {
        "orders": "SELECT o_orderkey, o_custkey AS patient_key, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority AS orderpriority "
        "FROM read_parquet('{src}')",
    },
    # -- cross-family type drift: must be CONTRACT_LOUD at ingress --
    "widen_documents_docid": {
        "documents": "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, lang, "
        "source, n_chars FROM read_parquet('{src}')",
    },
    "widen_orders_custkey": {
        "orders": "SELECT o_orderkey, CAST(o_custkey AS VARCHAR) AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        "FROM read_parquet('{src}')",
    },
    "widen_customer_acctbal_varchar": {
        "customer": "SELECT c_custkey, c_name, c_nationkey, "
        "CAST(c_acctbal AS VARCHAR) AS c_acctbal, c_mktsegment "
        "FROM read_parquet('{src}')",
    },
    # -- same-family drift: tolerated, engines must agree on it --
    "widen_nation_key_bigint": {
        "nation": "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, "
        "CAST(n_regionkey AS BIGINT) AS n_regionkey FROM read_parquet('{src}')",
    },
    "widen_customer_acctbal_decimal": {
        "customer": "SELECT c_custkey, c_name, c_nationkey, "
        "CAST(c_acctbal AS DECIMAL(12,2)) AS c_acctbal, c_mktsegment "
        "FROM read_parquet('{src}')",
    },
    # -- additive drift: always invisible --
    "additive_documents": {
        "documents": "SELECT doc_id, text, lang, source, n_chars, "
        "'extra' AS pipeline_tag, 42 AS export_version "
        "FROM read_parquet('{src}')",
    },
}

# Documented TOLERATED keys per arm: engine runs via col_or_null
# degrade while the canonical-catalog oracle raises AND the result
# differs from clean. In the end state nothing lands here — the sync
# pipelines' alias tolerance reproduces the CLEAN result bit-for-bit
# (alias columns carry the same values), which the verdict logic
# classifies as the stronger NOOP. Kept as the adjudication channel
# for future arms whose degrade genuinely changes values (e.g. a
# dropped name column flowing rows to the no-email DLQ branch).
# (the sync keys aggregate OUTCOME counts, which no tolerated
# descriptor feeds, so even the drop arms land NOOP for them)
EXPECTED_TOLERATED: dict[str, set] = {}


def build_drifted_dir(sf_dir: str, arm: str) -> str:
    out = tempfile.mkdtemp(prefix=f"sg-drift-{arm}-")
    con = duckdb.connect()
    rewrites = ARMS[arm]
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t in rewrites:
            con.execute(
                f"COPY ({rewrites[t].format(src=src)}) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only_arms = [a for a in sys.argv[2:] if a in ARMS] or list(ARMS)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_oracle_parity import _duck, _rowset

    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark.sources.catalog import SchemaContractError

    spark = get_spark("schema-drift-probe")

    # clean baseline once per key (rowset + columns)
    clean_duck = _duck(sf_dir)
    clean = {}
    for name in Q.ORACLE:
        sdf = Q.QUERIES[name](spark, sf_dir)
        clean[name] = (sdf.columns, _rowset(sdf.columns, [tuple(r) for r in sdf.collect()]))

    grand = {}
    findings = []
    for arm in only_arms:
        drifted = build_drifted_dir(sf_dir, arm)
        duck = _duck(drifted)
        counts: dict[str, int] = {}
        for name in Q.ORACLE:
            s_err = d_err = None
            s_contract = False
            try:
                sdf = Q.QUERIES[name](spark, drifted)
                s_cols = sdf.columns
                s_set = _rowset(s_cols, [tuple(r) for r in sdf.collect()])
            except SchemaContractError as e:
                s_err, s_contract = str(e)[:200], True
            except Exception as e:  # noqa: BLE001
                s_err = str(e)[:200]
            try:
                cur = duck.execute(Q.ORACLE[name])
                d_cols = [c[0] for c in cur.description]
                d_set = _rowset(d_cols, cur.fetchall())
            except Exception as e:  # noqa: BLE001
                d_err = str(e)[:200]

            if s_contract:
                verdict = "CONTRACT_LOUD"
            elif s_err and d_err:
                verdict = "BOTH_RAISE"
            elif s_err:
                verdict = "SPARK_ERR"
            elif d_err:
                c_cols, c_set = clean[name]
                same_as_clean = sorted(s_cols) == sorted(c_cols) and s_set == c_set
                verdict = "NOOP" if same_as_clean else "TOLERATED"
            else:
                c_cols, c_set = clean[name]
                if sorted(s_cols) == sorted(c_cols) and s_set == clean[name][1]:
                    verdict = "NOOP"
                elif sorted(s_cols) == sorted(d_cols) and s_set == d_set:
                    verdict = "AGREE_DRIFTED"
                else:
                    verdict = "MISMATCH"

            counts[verdict] = counts.get(verdict, 0) + 1
            bad = verdict in ("SPARK_ERR", "MISMATCH") or (
                verdict == "TOLERATED"
                and name not in EXPECTED_TOLERATED.get(arm, set())
            )
            if bad:
                findings.append((arm, name, verdict, s_err or d_err or ""))
                print(f"!! {arm:32s} {verdict:12s} {name} {s_err or d_err or ''}")
        print(f"{arm}: {dict(sorted(counts.items()))}")
        grand[arm] = counts
    print("findings:", len(findings))
    spark.stop()


if __name__ == "__main__":
    main()
