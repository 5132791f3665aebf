"""Event-time window operators over the ``events`` stream table
(SURVEY.md §2.8 extension tier: tumbling / sliding / session).

The reference's only "windowing" is daily micro-batching by watermark;
these operators add the standard event-time aggregations. All three
are single-shuffle group-bys (window key + group key); in Structured
Streaming the identical expressions run under ``withWatermark`` (see
streaming/incremental.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _finish(grouped, aggs: Sequence[Column]) -> DataFrame:
    out = grouped.agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Fixed non-overlapping windows: F.window(ts, duration), emitted
    as plain window_start/window_end columns.

    NULL ``ts`` rows are dropped by Spark's window() itself (batch AND
    streaming twins — same engine primitive), which matches the
    event-time policy: an unstamped event belongs to no time bucket.
    SQL oracles must state the equivalent WHERE ts IS NOT NULL, since
    a portable GROUP BY would otherwise keep a NULL bucket (r10
    NULL-robustness probe)."""
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("n")]
    return _finish(df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys), aggs)


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Overlapping hop windows: each event expands map-side into
    duration/slide windows; still one shuffle for the group-by."""
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("n")]
    return _finish(
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"), *keys), aggs
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Session windows (dynamic extent, closed after ``gap`` of
    inactivity) via F.session_window — Catalyst merges overlapping
    per-key sessions after one shuffle on the keys."""
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("n")]
    return _finish(
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys), aggs
    )
