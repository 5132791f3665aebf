"""Scan-shaped operators (SURVEY.md §2.1).

The reference compiles these as SQL strings shipped to BigQuery
(full/delta scans main.py:534-549, point lookup main.py:373-389,
watermark read main.py:330-345, DLQ attempt read main.py:404-420).
Here each is a lazy DataFrame; Catalyst pushes the predicates and the
column projection down into the parquet scan — `.explain` shows
PushedFilters/ReadSchema, so at 100 TB only the needed row groups and
columns are read.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def full_scan(df: DataFrame, columns: Optional[Sequence[str]] = None) -> DataFrame:
    """SELECT <cols|*> FROM t (main.py:539-541). Unlike the reference's
    SELECT *, callers pass the consumed column list so the parquet
    reader prunes — at 100 TB a projection miss is a 10× I/O bug."""
    return df.select(*columns) if columns else df


def delta_scan(df: DataFrame, updated_col: str, watermark) -> DataFrame:
    """Incremental scan: rows with updated_col >= watermark
    (main.py:537-538). The filter lands in PushedFilters, and on a
    date-partitioned layout it also prunes partitions."""
    return df.filter(F.col(updated_col) >= F.lit(watermark))


def point_lookup(df: DataFrame, *predicates: Column) -> DataFrame:
    """Keyed single-row lookup ... LIMIT 1 (main.py:373-389). In set
    terms this is the degenerate form of a broadcast join build side;
    kept for API parity."""
    out = df
    for p in predicates:
        out = out.filter(p)
    return out.limit(1)


def topk_sort(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k (main.py:336-337). Catalyst plans
    TakeOrderedAndProject: per-partition heaps + a single k-row merge
    on the driver — no global sort shuffle, O(k) driver memory."""
    return df.orderBy(*order).limit(k)


def latest_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Most-recent row per key (the generalized watermark read,
    main.py:330-345): row_number over (partition keys, order desc) == 1.
    One shuffle on the group keys; AQE handles skewed keys."""
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
