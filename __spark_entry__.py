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
# keys lead. Round 9 (cap counted, asserted by
# tests/test_entry_rotation.py): (a) the 3 evidence-gapped keys —
# heavy-hitters (added after the r8 cap filled, never driver-checked)
# and vocab-stats + dedup-rate-report (exact-integer rounding code
# changed late in r8, after the cap was full, so their green r7 rows
# predate the shipped code); (b) the 14 keys whose driver evidence is
# r5 (rolled past the r8 cap by explicit plan — the scalar-projection
# cohort); (c) the keys ADDED or code-changed this round
# (ngram-topk-sketch — new two-phase sketch path; mix-weights +
# bucketed-join — gained the guard_den envelope guard on their
# product denominator); (d) the stalest of the r6-evidenced cohort
# fills the remaining cap slots. Keys not listed keep registry order
# after these; the r6 keys below the boundary roll to round 10.
_PRIORITY = [
    # -- (a) evidence-gapped --
    "heavy-hitters", "vocab-stats", "dedup-rate-report",
    # -- (b) r5-evidenced cohort (stalest driver evidence) --
    "bool-normalize", "identifier-canon", "email-normalize",
    "phi-redact", "epoch-millis", "eastern-date", "json-payload",
    "natural-key", "next-birthday", "patient-projection",
    "roi-projection", "remote-search", "remote-get",
    "retry-threshold",
    # -- (c) added / code changed this round --
    "ngram-topk-sketch", "bigram-lift-topk", "mix-weights",
    "bucketed-join", "ewma-smooth", "trigram-lm-score",
    "markov-transitions", "incremental-agg-merge", "zorder-layout",
    "heavy-hitters-by-group",
    # -- (d) r6-evidenced cohort: 23 of 41 fit the cap --
    "ambiguity-multi", "ambiguity-no-key", "asof-join", "bm25-topk",
    "coalesce-chain", "const-columns", "cube-agg", "decontaminate",
    "dq-audit", "drop-null-props", "exact-dedup",
    "external-scan-pushdown", "fk-orphans", "grouping-sets",
    "hll-sketch-merge", "hybrid-rrf", "incremental-dedup",
    "json-coerce", "lock-projection", "merge-upsert",
    "multimodal-cols", "override-skip", "pack-sequences",
    # ---- 50-cap boundary: the 18 r6-evidenced keys below roll to
    # round 10 and lead its rotation ----
    "patient-sync-pipeline", "protected-drop", "quota-sample",
    "range-join", "repetition-metrics", "roi-patient-anti-join", "roi-sync-pipeline",
    "rollup-agg", "simhash-dedup-md5", "skew-salted-join",
    "split-assign", "stratified-sample", "threetier-composite",
    "topk-similarity", "topk-similarity-ivf", "topk-similarity-pandas",
    "video-frame-index", "watermark-filter",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(Q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(Q.ORACLE))
