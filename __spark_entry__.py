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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE)
