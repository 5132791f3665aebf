#!/usr/bin/env python
"""Duplicate-key / ordering-tie probe (twelfth poison class).

Every ranking, last-writer-wins, and top-k surface in the engine
depends on an ORDER BY being a TOTAL order over the rows that can
actually tie. On clean synthetic data ties are rare enough that a
non-total ordering passes every hash compare by luck; at 100 TB exact
ties are a certainty (equal timestamps from second-granularity
sources, equal scores after 6-decimal rounding, duplicated vectors
from upstream re-ingestion, duplicate natural keys from concurrent
writers — the reference's own id-map lookup is `LIMIT 1` with NO
ORDER BY, main.py:374-388, i.e. nondeterministic under exactly this
corruption). A non-total order is the classic distributed-engine
wrong-answer class: the winner depends on which partition merged
first, so re-runs, cluster widths, and AQE re-plans each give a
different "deterministic" result.

Lanes (appended rows in a COPY of the testdata; all deterministic —
boundary rows are computed from the SOURCE dir, which is fixed):

  orders   - for 8 existing orderkeys divisible by 6 (so the twin
             lands in BOTH sides of merge-upsert's existing/incoming
             split): a twin with the SAME o_orderkey and SAME
             o_orderdate but different o_totalprice/o_orderpriority —
             an in-batch duplicate key whose (key, updated_at) TIES
             exactly, making the lastwin winner visible in `val`.
             Plus one boundary row: a NEW orderkey whose o_totalprice
             EQUALS the current rank-10 price of topk-sort, so the
             top-10 boundary itself is decided purely by the id
             tie-break.
  events   - for 10 user_ids: a twin of that user's LATEST event
             (same user_id, same ts, fresh unique event_id, different
             value/event_type) — every latest-per-group / window /
             sessionization surface sees an exact (user, ts) tie.
  embeddings - exact-duplicate VECTORS under fresh vec_ids for
             [0, 1, 2, 7, 19, 33] plus the current rank-10 vector of
             topk-similarity: scores round to 6 decimals, so a
             duplicated vector ties EXACTLY at whatever rank it holds,
             including the k boundary; selection must fall to the id
             tie-break on both engines.
  documents - the texts of the current bm25-topk ranks 9 and 10
             duplicated under fresh doc_ids: identical text -> tied
             bm25/tfidf at the k boundary.
  customer - 4 duplicate c_custkey twins with different
             c_acctbal/c_name: duplicate natural keys in a dimension
             side; equi-joins must fan out IDENTICALLY two-sided and
             the sync pipelines' ambiguity tier must classify, not
             crash or pick silently.

Arms:
  1. PARITY: every oracle-backed key, engine vs DuckDB on the
     poisoned dir (the standard probe compare).
  2. WIDTH STABILITY: every key run twice engine-side at
     spark.sql.shuffle.partitions = 7 and 32 — different partial
     merge orders — and compared engine-vs-engine; a non-total
     ordering shows up as run-to-run instability even where the
     parity arm agrees by luck. The oracle is likewise run twice
     (DuckDB is multithreaded; its ties are unstable too).

Adjudication (r14, sf0.001, full 163-key registry — recorded in
SCALE.md "Duplicate-key / ordering-tie" section). Final state
161 OK / 0 MISMATCH / 0 UNSTABLE after three two-sided fixes; the
instability detector that actually fired was the ORACLE arm — DuckDB
is multithreaded, so its row_number over a non-total ORDER BY gave a
different winner per run, while Spark's local sort happened to be
stable run-to-run on this data (the non-totality is identical by
construction; at cluster widths the engine side is the one that
flickers). The finds:
  1. merge-upsert (UNSTABLE_ORACLE): upsert_merge's ordering
     (order_col DESC, __src DESC) is not total under IN-BATCH
     duplicate keys with tied order_col — the operator docstring's
     determinism claim was FALSE for ties. Fixed two-sided: the
     window now arbitrates by the remaining payload columns
     (DESC NULLS LAST, schema order) after (order_col, __src), and
     the oracle mirrors the same ORDER BY verbatim; pinned in
     tests/test_dupkey_ties.py.
  2. running-window + lag-lead (UNSTABLE_ORACLE): both ordered by
     (o_orderdate, o_orderkey), silently assuming o_orderkey is a
     unique PK — duplicate-PK rows tie on BOTH columns, so the
     running sum accumulated (and lag/lead neighbors swapped) in
     partition-merge order. Fixed two-sided with o_totalprice as the
     final tie-break — the only window-visible differing column, so
     the output MULTISET is deterministic even for full-duplicate
     rows.
  3. read_high_watermark (sinks/control.py, found by the same-shape
     code audit, not registry-visible): tied finished_at instants
     picked a partition-merge watermark; fixed with
     (finished_at DESC, high_watermark DESC) — the max watermark
     among simultaneous successes, the monotone choice.
  - Every other key stayed green on all arms: the engine's standing
    id-tie-break discipline (desc(score), id on every top-k surface)
    is total, and the planted boundary ties — the rank-10/11 price
    tie, the duplicated-vector score ties, the duplicated-text bm25
    ties, the (user, ts) latest-event ties, the duplicate-custkey
    dimension fan-out — were decided identically by both engines.

Usage:
    python fixtures/dupkey_tie_probe.py [sf_dir] [key ...]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

ORDER_TWIN_PRICE_BUMP = 1111.11
EVENT_TWIN_VALUE = 777.77
N_ORDER_TWINS = 8
N_EVENT_TWINS = 10
VEC_TWIN_IDS = [0, 1, 2, 7, 19, 33]
N_CUST_TWINS = 4


def build_dup_dir(sf_dir: str) -> str:
    """Poisoned copy of ``sf_dir`` with the duplicate-key/tie lanes
    appended. Deterministic for a fixed source dir: every planted row
    is derived from source rows by fixed rules."""
    out = tempfile.mkdtemp(prefix="sg-dupkey-")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )

    # -- orders: in-batch duplicate-PK ties + a topk-sort boundary tie
    rank10 = con.execute(
        "SELECT o_totalprice, o_custkey FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 9"
    ).fetchone()
    con.execute(
        f"""COPY (
          SELECT * FROM orders
          UNION ALL
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice + {ORDER_TWIN_PRICE_BUMP},
                 o_orderdate, 'TIE-PROBE'
          FROM (SELECT * FROM orders WHERE o_orderkey % 6 = 0
                ORDER BY o_orderkey LIMIT {N_ORDER_TWINS})
          UNION ALL
          SELECT (SELECT max(o_orderkey) + 1 FROM orders),
                 {rank10[1]}, 'O', {rank10[0]},
                 TIMESTAMP '1997-07-07 00:00:00', 'TIE-BOUNDARY'
        ) TO '{os.path.join(out, "orders.parquet")}' (FORMAT PARQUET)"""
    )

    # -- events: exact (user_id, ts) ties on each user's LATEST event
    con.execute(
        f"""COPY (
          SELECT * FROM events
          UNION ALL
          SELECT (SELECT max(event_id) FROM events)
                   + row_number() OVER (ORDER BY user_id),
                 ts, user_id, 'tie_probe', {EVENT_TWIN_VALUE},
                 NULL
          FROM (
            SELECT user_id, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
          ) WHERE rn = 1 AND user_id < {N_EVENT_TWINS}
        ) TO '{os.path.join(out, "events.parquet")}' (FORMAT PARQUET)"""
    )

    # -- embeddings: exact-duplicate vectors (fresh vec_ids), incl.
    #    the current rank-10 vector of the registered topk-similarity
    ids = list(VEC_TWIN_IDS)
    r10 = con.execute(
        """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
           s AS (
             SELECT e.vec_id,
                    list_sum(list_transform(list_zip(e.embedding, q.qv),
                      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dp
             FROM embeddings e, q)
           SELECT vec_id FROM s ORDER BY dp DESC, vec_id LIMIT 1 OFFSET 9"""
    ).fetchone()
    if r10 and r10[0] not in ids:
        ids.append(r10[0])
    id_list = ", ".join(str(i) for i in ids)
    con.execute(
        f"""COPY (
          SELECT * FROM embeddings
          UNION ALL
          SELECT (SELECT max(vec_id) FROM embeddings)
                   + row_number() OVER (ORDER BY vec_id),
                 embedding, 999
          FROM embeddings WHERE vec_id IN ({id_list})
        ) TO '{os.path.join(out, "embeddings.parquet")}' (FORMAT PARQUET)"""
    )

    # -- documents: duplicate the texts of the CURRENT bm25-topk
    #    ranks 9-10 (the registered oracle, run on the source views),
    #    so the k boundary itself carries an exact score tie
    from reverse_etl_homebrew_spark import queries as Q

    bm = con.execute(Q.ORACLE["bm25-topk"]).fetchall()
    bm_ids = ", ".join(str(r[0]) for r in bm[8:10]) or "-1"
    con.execute(
        f"""COPY (
          SELECT * FROM documents
          UNION ALL
          SELECT (SELECT max(doc_id) FROM documents)
                   + row_number() OVER (ORDER BY doc_id),
                 text, lang, source, n_chars
          FROM documents WHERE doc_id IN ({bm_ids})
        ) TO '{os.path.join(out, "documents.parquet")}' (FORMAT PARQUET)"""
    )

    # -- customer: duplicate natural keys in the dimension side
    con.execute(
        f"""COPY (
          SELECT * FROM customer
          UNION ALL
          SELECT c_custkey,
                 'Tie Probe #' || CAST(c_custkey AS VARCHAR),
                 c_nationkey, c_acctbal + 1000.5, c_mktsegment
          FROM (SELECT * FROM customer ORDER BY c_custkey
                LIMIT {N_CUST_TWINS})
        ) TO '{os.path.join(out, "customer.parquet")}' (FORMAT PARQUET)"""
    )

    for t in TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(sf_dir, f"{t}.parquet"), dst)
    con.close()
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    adv = build_dup_dir(sf_dir)
    print(f"dupkey-tie dir: {adv}")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_oracle_parity import _duck, _rowset

    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("dupkey-tie-probe")
    duck = _duck(adv)

    counts = {"OK": 0, "MISMATCH": 0, "UNSTABLE_ENGINE": 0,
              "UNSTABLE_ORACLE": 0, "SPARK_ERR": 0, "DUCK_ERR": 0,
              "BOTH_RAISE": 0}
    t_suite = time.monotonic()
    for name, sql in Q.ORACLE.items():
        if only and name not in only:
            continue
        s_err = d_err = None
        t0 = time.monotonic()
        runs = []
        try:
            for width in ("7", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", width)
                sdf = Q.QUERIES[name](spark, adv)
                runs.append(_rowset(sdf.columns,
                                    [tuple(r) for r in sdf.collect()]))
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            s_err = str(e)[:200]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        d_runs = []
        try:
            for _ in range(2):
                cur = duck.execute(sql)
                d_cols = [c[0] for c in cur.description]
                d_runs.append(_rowset(d_cols, cur.fetchall()))
        except Exception as e:  # noqa: BLE001
            d_err = str(e)[:200]
        dt = time.monotonic() - t0
        if s_err and d_err:
            verdict = "BOTH_RAISE"
        elif s_err:
            verdict = "SPARK_ERR"
        elif d_err:
            verdict = "DUCK_ERR"
        elif runs[0] != runs[1]:
            verdict = "UNSTABLE_ENGINE"
        elif d_runs[0] != d_runs[1]:
            verdict = "UNSTABLE_ORACLE"
        elif sorted(s_cols) != sorted(d_cols) or runs[0] != d_runs[0]:
            verdict = "MISMATCH"
        else:
            verdict = "OK"
        counts[verdict] += 1
        flag = "" if verdict == "OK" else f"  << {verdict}"
        print(f"[{name}] {dt:.1f}s{flag}", flush=True)
        if verdict not in ("OK", "UNSTABLE_ENGINE", "UNSTABLE_ORACLE") \
                and (s_err or d_err):
            print(f"   {s_err or d_err}")
    print("summary:", counts)
    print(f"suite wall: {time.monotonic() - t_suite:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
