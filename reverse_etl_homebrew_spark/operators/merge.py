"""Upsert / MERGE semantics without a transactional table format
(SURVEY.md §2.2 `idmap-merge`, §2.5 `merge-join`).

The reference MERGEs one row at a time into the BigQuery ID map
(main.py:354-371): matched → update hubspot_id/updated_at, not matched
→ insert. Set-oriented equivalent: last-writer-wins per key across
(existing ∪ incoming), implemented as a key-grouped window — one
shuffle on the merge key, no driver involvement.

On a Delta/Iceberg deployment the same call sites swap to a native
``MERGE INTO`` (the storage format is injected at the sink layer);
this pure-DataFrame fallback keeps the engine dependency-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def upsert_merge(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    order_col: str = "updated_at",
) -> DataFrame:
    """Last-writer-wins merge of ``incoming`` over ``existing`` on
    ``keys`` (MERGE semantics, main.py:356-363).

    Ties on ``order_col`` break toward the incoming batch (__src=1),
    matching MERGE's matched-update-wins behavior; duplicate keys
    *within* the incoming batch also converge deterministically
    (main.py FIXTURES branch 12 — last writer by order_col wins)."""
    cols = existing.columns
    tagged = existing.select(*cols).withColumn("__src", F.lit(0)).unionByName(
        incoming.select(*cols).withColumn("__src", F.lit(1))
    )
    w = W.partitionBy(*keys).orderBy(F.desc(order_col), F.desc("__src"))
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
