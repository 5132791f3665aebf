"""NULL-robustness regression gate: the r10 probe
(fixtures/null_robustness_probe.py) planted NULLs in every nullable
driver column and found 22 registry keys whose two engines silently
DISAGREED — implicit NULL ordering in windows (Spark ASC is NULLS
FIRST, DuckDB's is NULLS LAST), time buckets of NULL timestamps,
NULL-text docs degenerating into mutual jaccard-1.0 dedup pairs,
DuckDB's native ASOF matching NULL timestamps, and a branch ladder
whose oracle skipped the completion-stamp condition. All were fixed
by making the NULL policy EXPLICIT on both sides; this test pins every
formerly-divergent key (plus the neighbors sharing their CTEs) against
the same poisoned data so the class can't regress.

The full-registry probe stays available as the fixture script; this
gate runs the affected subset to keep suite time bounded.

Round 11 added the NULL-JOIN-KEY poison arms (events.user_id,
orders.o_custkey, documents.doc_id — the advisor's blind spot:
value-column poison can never expose divergences in how the two
engines treat NULL *keys*) and caught 11 more silent wrong-answer
keys: the NOT IN NULL trap in anti-join oracles (engine left_anti is
NOT EXISTS), window partitionBy grouping NULL keys where the oracle
joins on equality (asof-join), oracles that GROUP BY a non-unique
doc_id where the engine is per-row map-side (lang-id,
repetition-metrics), NULL-id survivor election (exact-dedup NULLS
LAST), NULL-id docs at every quota head (quota-sample md5(NULL)),
per-doc report scope (dup-span-rate), packing-order determinism
(pack-sequences), the IVM merge's equality join never merging the
NULL group (incremental-agg-merge), and the resolution ladder's
NULL-parent DLQ branch (roi-sync-pipeline). All fixed with explicit
two-sided policies; their keys are pinned below.
"""

from __future__ import annotations

import pytest

from reverse_etl_homebrew_spark import queries as Q

from test_oracle_parity import _rowset

SF_DIR = "/root/testdata/sf0.001"

# the 22 keys the probe caught, plus CTE/universe neighbors
KEYS = [
    # implicit window NULL-ordering (Spark NULLS FIRST vs DuckDB LAST)
    "lag-lead", "running-window",
    # event-time policy: unstamped events excluded on both sides
    "tumbling-window", "sliding-window", "session-window",
    "window-median", "ewma-smooth", "merge-intervals",
    "markov-transitions", "attribution-last-touch",
    "scd2-history", "scd2-lookup",
    # exact-ASOF NULL semantics (oracle aligned to the operator)
    "asof-join",
    # dedup universe: NULL text excluded on both sides
    "fuzzy-dedup", "ngram-jaccard", "fuzzy-dedup-clusters",
    "dedup-survivorship", "decontaminate", "incremental-dedup",
    "containment-dedup", "containment-dedup-capped",
    "repetition-metrics", "trigram-lm-score",
    # branch ladder: completion stamp condition in the oracle
    "roi-sync-pipeline",
    # to_json must keep null struct fields (ignoreNullFields=false)
    "struct-json-ops",
    # naturally consistent under NULLs — pinned so that stays true
    "dup-span-detect", "dup-span-rate", "exact-dedup",
    # --- r11 NULL-key arms (user_id / o_custkey / doc_id) ---
    # NOT IN -> NOT EXISTS oracle fixes (engine left_anti semantics)
    "anti-join", "roi-patient-anti-join",
    # oracle assumed doc_id uniqueness (GROUP BY / QUALIFY collapse)
    "lang-id",
    # NULL-id policies: survivor NULLS LAST / quota NULLS LAST /
    # report scope / packing scope
    "quota-sample", "pack-sequences",
    # NULL group must merge like GROUP BY groups it
    "incremental-agg-merge",
    # new span op, NULL-key-consistent from birth
    "incremental-dup-spans",
]


@pytest.fixture(scope="module")
def poisoned(tmp_path_factory):
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "fixtures")
    )
    from null_robustness_probe import build_poisoned_dir

    return build_poisoned_dir(SF_DIR)


@pytest.fixture(scope="module")
def duck(poisoned):
    from test_oracle_parity import _duck

    return _duck(poisoned)


@pytest.mark.parametrize("name", KEYS)
def test_null_poisoned_parity(spark, name, duck, poisoned):
    sdf = Q.QUERIES[name](spark, poisoned)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(Q.ORACLE[name])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert _rowset(s_cols, s_rows) == _rowset(d_cols, d_rows)
