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
# (and may cap how many it checks per round), so the SURVEY.md §2
# operator inventory comes first: branch/filter semantics that had no
# driver row in round 1, then the core relational tier, then the
# extension/analytic tier. Keys not listed keep registry order after
# these.
_PRIORITY = [
    # §2.1/2.4/2.5 keys without a round-1 driver row
    "ledger-watermark-read", "dlq-attempt-read", "remote-search", "remote-get",
    "coalesce-chain", "json-coerce", "drop-null-props", "protected-drop",
    "const-columns", "watermark-filter", "override-skip", "lock-projection",
    "ambiguity-no-key", "ambiguity-multi", "roi-patient-anti-join",
    "threetier-composite", "multimodal-cols", "similarity-join",
    # round-1 hash-fails fixed this round (oracle BIGINT casts)
    "run-counters", "text-analysis",
    # external-engine connector with real pushFilters pushdown (r2)
    "external-scan-pushdown",
    # §2 core relational tier (round-1 green; keep rows fresh)
    "full-scan", "delta-scan", "point-lookup", "topk-sort", "latest-per-group",
    "groupby-agg", "max-ifnull-agg", "ambiguity-count", "approx-distinct",
    "equi-inner-join", "idmap-join", "email-match-join", "tiered-match-join",
    "dlq-attempt-join", "window-rank", "dedup-lastwin", "union-all",
    "set-intersect", "set-except", "merge-upsert",
    # §2 filters / event-time windows / extension headliners
    "processed-skip", "retry-threshold", "tumbling-window", "sliding-window",
    "session-window", "exact-dedup", "fuzzy-dedup", "topk-similarity",
    "patient-projection", "roi-projection",
    # end-to-end sync plans + remaining §2.3 scalars
    "patient-sync-pipeline", "roi-sync-pipeline",
    "natural-key", "email-normalize", "bool-normalize", "epoch-millis",
    "eastern-date", "next-birthday", "identifier-canon", "json-payload",
    "phi-redact",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(Q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(Q.ORACLE))
