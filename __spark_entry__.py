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
# keys lead. Round 5: refresh stale driver evidence — the rounds-3/4
# cap re-certified the same 50 keys twice, leaving 62 keys whose latest
# driver row is r1/r2 (or none). Order: never-checked first
# (video-frame-index; ngram-jaccard's oracle SQL postdates its last
# driver run), then the 18 keys last seen in r1, then the r2 cohort,
# then keys whose code is touched this round. Keys not listed keep
# registry order after these.
_PRIORITY = [
    # -- no usable driver evidence at all --
    "video-frame-index",   # registered r3, never inside the cap
    "ngram-jaccard",       # oracle SQL added after its last driver run
    # -- latest driver row is round 1 --
    "anti-join", "semi-join", "bool-normalize", "identifier-canon",
    "email-normalize", "phi-redact", "epoch-millis", "eastern-date",
    "json-payload", "natural-key", "next-birthday", "roi-projection",
    "token-count", "quality-score", "doc-fingerprint", "lang-id",
    "simhash-dedup",
    # -- latest driver row is round 2 --
    "full-scan", "delta-scan", "point-lookup", "topk-sort",
    "latest-per-group", "groupby-agg", "max-ifnull-agg", "run-counters",
    "ambiguity-count", "approx-distinct", "equi-inner-join", "idmap-join",
    "email-match-join", "tiered-match-join", "dlq-attempt-join",
    "window-rank", "dedup-lastwin", "union-all", "set-intersect",
    "set-except", "patient-projection", "processed-skip",
    "retry-threshold", "tumbling-window", "sliding-window",
    "session-window", "text-analysis", "remote-search", "remote-get",
    "ledger-watermark-read", "dlq-attempt-read", "coalesce-chain",
    # -- keep-fresh: code touched in round 5 --
    "topk-similarity-pandas", "multimodal-decode", "fuzzy-dedup-clusters",
    # -- remaining r2 cohort (overflow past the ~50 cap rolls to r6) --
    "json-coerce", "drop-null-props", "protected-drop", "const-columns",
    "watermark-filter", "override-skip", "lock-projection",
    "ambiguity-no-key", "ambiguity-multi", "roi-patient-anti-join",
    "threetier-composite",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(Q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(Q.ORACLE))
