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
# keys lead. Round 6: the cap is COUNTED, not guessed — the first 50
# entries below are exactly the intended 50 (asserted by
# tests/test_entry_rotation.py). Order: (a) fuzzy-dedup-clusters,
# whose round-5 rewrite has no post-change driver row; (b) the 12
# keys whose latest driver evidence is round 2; (c) keys whose code
# or oracle changes this round (video-frame-index gains a parquet
# sample-table oracle, topk-similarity-pandas gains a rounded-score
# oracle, multimodal-decode gains real MJPEG decode AND a
# generation-time feature-fixture oracle); (d) round-4
# evidenced keys, complex operators first. 13 simple Catalyst
# built-in r4 keys (string-funcs, array-ops, ...) overflow to r7 —
# they are the least likely to regress. Keys not listed keep registry
# order after these.
_PRIORITY = [
    # -- (a) code rewritten in r5, no driver row since --
    "fuzzy-dedup-clusters",
    # -- (b) latest driver row is round 2 --
    "coalesce-chain", "json-coerce", "drop-null-props", "protected-drop",
    "const-columns", "watermark-filter", "override-skip",
    "lock-projection", "ambiguity-no-key", "ambiguity-multi",
    "roi-patient-anti-join", "threetier-composite",
    # -- (c) oracle or code changes this round --
    "video-frame-index", "topk-similarity-pandas", "multimodal-decode",
    # -- (d) round-4 cohort, complex operators first (34 of 47) --
    "fuzzy-dedup", "exact-dedup", "merge-upsert", "incremental-dedup",
    "decontaminate", "simhash-dedup-md5", "embedding-near-dup",
    "similarity-join", "topk-similarity", "topk-similarity-lsh",
    "topk-similarity-ivf", "knn-join", "knn-join-tables", "knn-join-lsh",
    "bm25-topk", "hybrid-rrf", "repetition-metrics", "pack-sequences",
    "stratified-sample", "split-assign", "quota-sample",
    "patient-sync-pipeline", "roi-sync-pipeline", "multimodal-cols",
    "asof-join", "range-join", "skew-salted-join",
    "external-scan-pushdown", "hll-sketch-merge", "fk-orphans",
    "dq-audit", "cube-agg", "rollup-agg", "grouping-sets",
    # ---- 50-cap boundary: everything below rolls to round 7 ----
    "pivot-agg", "running-window", "lag-lead", "unpivot-melt",
    "gap-fill", "quantiles", "string-funcs", "null-safe-join",
    "distinct-agg", "array-ops", "struct-json-ops",
    "explode-posexplode", "conditional-agg",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(Q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(Q.ORACLE))
