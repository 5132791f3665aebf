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
# stalest cohort; (b) the 28 keys ADDED this round (mix-weights, markov-transitions, kmeans-iterate, scd2-lookup, attribution-last-touch — added after the cap filled — lead the r8 rotation) (never had a driver
# row) and the keys whose code changed (multimodal-decode: numpy
# MJPEG DC; similarity-join/embedding-near-dup/knn family: pair-
# scoring rewrite) plus the two perf-audited heavy operators; (c) 0
# of the 49 round-5-evidenced keys. All 49 r5 keys (simple
# scalar projections and small variants) roll to round 8 still
# satisfying "no evidence older than r5". Keys not listed keep
# registry order after these.
_PRIORITY = [
    # -- (a) round-4 cohort: stalest driver evidence --
    "pivot-agg", "running-window", "lag-lead", "unpivot-melt",
    "gap-fill", "quantiles", "string-funcs", "null-safe-join",
    "distinct-agg", "array-ops", "struct-json-ops",
    "explode-posexplode", "conditional-agg",
    # -- (b) new this round (no driver row yet, 28 keys) --
    "tfidf-topterms", "trigram-lm-score", "weighted-sample",
    "pii-scrub", "dedup-rate-report", "length-histogram",
    "image-resize", "audio-resample",
    "ngram-topk", "vocab-stats", "domain-stats", "embedding-centroid",
    "anomaly-zscore", "scd2-history", "bucketed-join",
    "entropy-quality", "containment-dedup", "mad-outliers",
    "shard-assign", "kmeans-assign",
    "ewma-smooth", "window-median", "merge-intervals",
    "funnel-steps", "retention-cohorts", "rank-funcs", "stats-agg",
    "dedup-survivorship",
    # -- (b) code changed / perf-audited this round --
    "multimodal-decode", "fuzzy-dedup", "fuzzy-dedup-clusters",
    "similarity-join", "embedding-near-dup", "knn-join",
    "knn-join-tables", "knn-join-lsh", "topk-similarity-lsh",
    # ---- 50-cap boundary: everything below rolls to round 8.
    # mix-weights (added last, after the cap filled) leads the r8
    # new-key cohort ----
    "mix-weights", "markov-transitions", "kmeans-iterate", "scd2-lookup",
    "attribution-last-touch",
    "full-scan", "delta-scan", "point-lookup", "topk-sort",
    "latest-per-group", "groupby-agg", "max-ifnull-agg", "run-counters",
    "ambiguity-count", "approx-distinct", "equi-inner-join",
    "idmap-join", "email-match-join",
    "tiered-match-join", "anti-join",
    "semi-join", "dlq-attempt-join", "window-rank", "dedup-lastwin",
    "union-all",
    "tumbling-window",
    "sliding-window", "session-window", "text-analysis",
    "set-intersect", "set-except", "token-count", "quality-score",
    "doc-fingerprint", "lang-id", "simhash-dedup", "ngram-jaccard",
    "ledger-watermark-read", "dlq-attempt-read",
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
