"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query smoke check at sf0.001.
- ``queries()``: one entry per implemented operator from SURVEY.md §2,
  each ``(spark, sf_dir) -> DataFrame``.
- ``oracle_sql()``: matching ANSI SQL per key for the DuckDB oracle
  (keys without SQL get the weaker rows-only check).

Implementation lives in ``reverse_etl_homebrew_spark``; this module is
a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reverse_etl_homebrew_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference-shaped sync *plan*: scan → projection +
    natural-key derivation → tiered identity resolution → outcome
    labeling → per-outcome counts (SURVEY.md §7 minimum slice).
    """
    from reverse_etl_homebrew_spark.plans.patients import patient_sync_outcomes

    return patient_sync_outcomes(spark, "/root/testdata/sf0.001")


# Registry emission order. The driver evaluates queries in dict order
# and caps CORRECTNESS at ~50 entries per round, so rounds rotate which
# keys lead. Round 8 (cap counted, asserted by
# tests/test_entry_rotation.py): (a) the 6 evidence-gapped keys — the
# 5 never-driver-checked r7 additions plus embedding-centroid (r7 row
# errored on its array column; output reshaped this round); (b) the 2
# keys ADDED this round (containment-dedup-capped,
# sqlite-scan-pushdown); (c) the 6 ANN keys whose bucketer kernel
# changed this round (matmul → guaranteed-fold-equal hybrid, per
# ADVICE) plus containment-dedup (gained the lineage cut); (d) 35 of
# the 49 round-5-evidenced keys — all but the 14 keys named below the
# boundary (bool-normalize, identifier-canon, email-normalize,
# phi-redact, epoch-millis, eastern-date, json-payload, natural-key,
# next-birthday, patient-projection, roi-projection, remote-search,
# remote-get, retry-threshold), which roll to round 9 and must LEAD
# its rotation TOGETHER WITH heavy-hitters (added after the r8 cap
# filled — never driver-checked) and vocab-stats + dedup-rate-report
# (code changed late in r8 — exact-integer ratio rounding — after the
# cap was already full; both 3-SF parity-green locally). Keys not
# listed keep registry order after these.
_PRIORITY = [
    # -- (a) evidence-gapped: never driver-checked / errored r7 --
    "mix-weights", "markov-transitions", "kmeans-iterate",
    "scd2-lookup", "attribution-last-touch", "embedding-centroid",
    # -- (b) added this round --
    "containment-dedup-capped", "sqlite-scan-pushdown",
    # -- (c) code changed this round --
    "topk-similarity-lsh", "knn-join", "knn-join-lsh",
    "knn-join-tables", "similarity-join", "embedding-near-dup",
    "containment-dedup",
    # -- (d) round-5 cohort: stalest driver evidence (35 of 49) --
    "full-scan", "delta-scan", "point-lookup", "topk-sort",
    "latest-per-group", "groupby-agg", "max-ifnull-agg",
    "run-counters", "ambiguity-count", "approx-distinct",
    "equi-inner-join", "idmap-join", "email-match-join",
    "tiered-match-join", "anti-join", "semi-join", "dlq-attempt-join",
    "window-rank", "dedup-lastwin", "union-all", "tumbling-window",
    "sliding-window", "session-window", "text-analysis",
    "set-intersect", "set-except", "token-count", "quality-score",
    "doc-fingerprint", "lang-id", "simhash-dedup", "ngram-jaccard",
    "ledger-watermark-read", "dlq-attempt-read", "processed-skip",
    # ---- 50-cap boundary: the 14 r5-evidenced keys below roll to
    # round 9 and lead its rotation ----
    "bool-normalize", "identifier-canon", "email-normalize",
    "phi-redact", "epoch-millis", "eastern-date", "json-payload",
    "natural-key", "next-birthday", "patient-projection",
    "roi-projection", "remote-search", "remote-get",
    "retry-threshold",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(Q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(Q.ORACLE))
