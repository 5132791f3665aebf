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
# keys lead. Round 3: the 36 keys that had no driver row in rounds 1-2
# (end-to-end sync plans, the analytic tier, training-mix ops, text
# retrieval, dq ops) come first, then 14 keep-fresh §2 rows whose code
# is touched this round. Keys not listed keep registry order after
# these.
_PRIORITY = [
    # -- never driver-checked through round 2 (evidence capture) --
    # end-to-end sync plans
    "patient-sync-pipeline", "roi-sync-pipeline",
    # temporal / range joins
    "asof-join", "range-join",
    # multi-dimensional aggregation tier
    "cube-agg", "rollup-agg", "grouping-sets", "pivot-agg",
    # windowed analytics
    "running-window", "lag-lead", "quantiles",
    # aggregation / expression variety
    "distinct-agg", "conditional-agg", "string-funcs", "null-safe-join",
    "unpivot-melt", "gap-fill", "array-ops", "struct-json-ops",
    "explode-posexplode",
    # training-data pipeline ops
    "pack-sequences", "stratified-sample", "split-assign", "quota-sample",
    # text retrieval + data quality
    "bm25-topk", "hybrid-rrf", "fk-orphans", "dq-audit", "hll-sketch-merge",
    "skew-salted-join",
    # rows-only extension ops that have never had a driver row
    "embedding-near-dup", "fuzzy-dedup-clusters", "topk-similarity-lsh",
    "topk-similarity-pandas", "topk-similarity-ivf", "multimodal-decode",
    # -- new in round 3 (no driver row yet) --
    "decontaminate", "repetition-metrics", "incremental-dedup", "knn-join-lsh",
    "knn-join-tables", "simhash-dedup-md5",
    # -- keep-fresh §2 rows (code touched in round 3) --
    "knn-join", "fuzzy-dedup", "external-scan-pushdown", "multimodal-cols",
    "similarity-join", "exact-dedup", "topk-similarity", "merge-upsert",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(Q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(Q.ORACLE))
