"""Aggregation operators (SURVEY.md §2.6).

Catalyst plans every groupBy here as partial (map-side) + final hash
aggregation automatically, so shuffled bytes are proportional to the
number of groups, not input rows — the property that keeps these
viable at 100 TB. Sums over monetary doubles are computed in
decimal(38,6): order-independent exact arithmetic, so results are
deterministic under any partitioning (and bit-comparable to any other
engine).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def finite_dec(col: Column, scale: int = 6) -> Column:
    """Exact-decimal INGRESS guard (r11 non-finite probe): a NaN or
    ±Infinity double cannot be represented in DECIMAL — DuckDB's CAST
    raises loudly, while Spark's non-ANSI cast silently NULLs the
    value, dropping the row from the exact sum. Exact-or-loud: raise
    on BOTH engines rather than silently disagree. The check is two
    cheap codegen predicates per row; NULL flows through untouched
    (NULL-in → NULL-out, the sum's identity)."""
    c = col if isinstance(col, Column) else F.col(col)
    guarded = F.when(
        F.isnan(c) | (F.abs(c) == F.lit(float("inf"))),
        F.raise_error(
            F.lit("exactmath: non-finite value in exact decimal aggregation")
        ),
    ).otherwise(c)
    return guarded.cast(f"decimal(38,{scale})")


def is_finite(col: Column) -> Column:
    """Finite-measurement predicate (non-NULL, not NaN, not ±Inf) —
    the domain of the statistical DETECTOR family (z-score, MAD,
    moving median): a detector's universe is finite measurements, so
    non-finite corruption is scoped out EXPLICITLY on both engines
    (oracles use DuckDB's isfinite). Accounting aggregations take the
    opposite policy — ``finite_dec`` raises — because silently
    dropping a corrupt amount from a sum is a wrong answer, while a
    detector excluding a non-measurement is its definition."""
    c = col if isinstance(col, Column) else F.col(col)
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def finite_dec_typed(col: Column, typ: str) -> Column:
    """``finite_dec`` for an explicit DECIMAL type string (e.g. the
    json-coerce ``decimal(18,2)`` money coercion) — same exact-or-loud
    non-finite contract."""
    c = col if isinstance(col, Column) else F.col(col)
    return (
        F.when(
            F.isnan(c) | (F.abs(c) == F.lit(float("inf"))),
            F.raise_error(
                F.lit("exactmath: non-finite value in exact decimal cast")
            ),
        )
        .otherwise(c)
        .cast(typ)
    )


def dec_sum(col: Column, alias: str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double expression: the per-row
    double is rounded once to decimal(38,scale) (deterministic — no
    representable double sits exactly on a half-ulp tie at this scale),
    then summed exactly. Output cast back to double. Non-finite input
    raises on both engines (``finite_dec``)."""
    return F.sum(finite_dec(col, scale)).cast("double").alias(alias)


def dec_avg(col: Column, alias: str, scale: int = 6) -> Column:
    """Exact-sum / exact-count average, emitted as double."""
    return (
        F.sum(finite_dec(col, scale)).cast("double")
        / F.count(col)
    ).alias(alias)


def max_ifnull(df: DataFrame, keys: Sequence[str], col: str, alias: str) -> DataFrame:
    """IFNULL(MAX(col), 0) per key (read_failure_attempts SQL,
    main.py:405-411)."""
    return df.groupBy(*keys).agg(
        F.coalesce(F.max(col), F.lit(0)).alias(alias)
    )


def run_counters(df: DataFrame, outcome_col: str, outcomes: Sequence[str]) -> DataFrame:
    """Run-summary tallies (main.py:846-856): one row with a count per
    outcome label, computed as conditional sums in a single pass over
    the outcome-labeled plan DataFrame."""
    aggs = [
        F.sum(F.when(F.col(outcome_col) == o, 1).otherwise(0)).alias(f"{o}_count")
        for o in outcomes
    ]
    aggs.append(F.count(F.lit(1)).alias("read_count"))
    return df.agg(*aggs)


def ambiguity_count(df: DataFrame, key: str) -> DataFrame:
    """Matches per key — the set-oriented form of the reference's
    len(search_results) branch (main.py:700-704)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("match_count"))


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ approximate count-distinct (PODS 2021 anchor,
    PAPERS.md): fixed-size sketch per partition, merged on the driver —
    constant memory at any scale, vs a full shuffle for exact
    countDistinct."""
    return df.agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct"),
        F.countDistinct(col).alias("exact_distinct"),
    )
