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
# keys lead. Round 7: the cap is COUNTED (asserted by
# tests/test_entry_rotation.py). Order: (a) the 13 keys whose latest
# driver evidence is round 4 — the planned round-6 overflow, now the
# stalest cohort; (b) keys whose code changed this round
# (multimodal-decode: numpy-vectorized MJPEG DC decode) plus the two
# perf-audited heavy operators so the post-A/B code gets fresh rows;
# (c) 34 of the 49 round-5-evidenced keys, so no key's evidence is
# older than r5 after this round. 15 simple scalar-projection r5 keys
# (bool-normalize, email-normalize, patient-projection, ...) overflow
# to round 8 — pure Column expressions, least likely to regress. Keys
# not listed keep registry order after these.
_PRIORITY = [
    # -- (a) round-4 cohort: stalest driver evidence --
    "pivot-agg", "running-window", "lag-lead", "unpivot-melt",
    "gap-fill", "quantiles", "string-funcs", "null-safe-join",
    "distinct-agg", "array-ops", "struct-json-ops",
    "explode-posexplode", "conditional-agg",
    # -- (b) code changed / perf-audited this round --
    "multimodal-decode", "fuzzy-dedup", "fuzzy-dedup-clusters",
    # -- (c) round-5 cohort, 34 of 49 --
    "full-scan", "delta-scan", "point-lookup", "topk-sort",
    "latest-per-group", "groupby-agg", "max-ifnull-agg", "run-counters",
    "ambiguity-count", "approx-distinct", "equi-inner-join",
    "idmap-join", "email-match-join", "tiered-match-join", "anti-join",
    "semi-join", "dlq-attempt-join", "window-rank", "dedup-lastwin",
    "union-all", "set-intersect", "set-except", "tumbling-window",
    "sliding-window", "session-window", "token-count", "text-analysis",
    "quality-score", "doc-fingerprint", "lang-id", "simhash-dedup",
    "ngram-jaccard", "ledger-watermark-read", "dlq-attempt-read",
    # ---- 50-cap boundary: everything below rolls to round 8 ----
    "bool-normalize", "identifier-canon", "email-normalize",
    "phi-redact", "epoch-millis", "eastern-date", "json-payload",
    "natural-key", "next-birthday", "patient-projection",
    "roi-projection", "processed-skip", "retry-threshold",
    "remote-search", "remote-get",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(Q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(Q.ORACLE))
