"""Skew-mitigation join: explicit key salting (SURVEY.md §4.3).

AQE's skew-join splitting handles most hot-key cases at runtime; this
operator is the *static* fallback for pathological producers (one key
= 30% of a 100 TB fact table), and for engines/configs where AQE is
off. Semantics are exactly an inner equi join — the oracle for the
salted query is the PLAIN SQL join, which proves salting is
transparent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_inner_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
) -> DataFrame:
    """Inner equi join with the fact side salted into ``salt``
    sub-keys and the dim side replicated ``salt``× — hot fact keys
    spread over ``salt`` reducers instead of one straggler.

    Cost model: dim-side rows × salt extra shuffle volume buys
    fact-side parallelism on the hottest key; use only when dim ≪
    fact (which is when skew hurts anyway)."""
    fact_salted = fact.withColumn(
        "__salt", (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt).cast("int")
    )
    dim_replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = fact_salted.join(dim_replicated, [on, "__salt"])
    return out.drop("__salt")
