"""Event-time window operator queries over ``events``
(SURVEY.md §2.8 extension tier)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import aggregates as AG, windows as WIN
from .sources.catalog import load_table
from .queries import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "tumbling-window",
    sql="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def q_tumbling_window(spark, sf_dir):
    """Fixed 1-hour event-time windows per event type; windows align
    to the epoch hour in both engines. Event-time policy (r10 NULL-
    robustness probe): an unstamped event belongs to no time bucket —
    Spark's window() already drops NULL ts, the filter makes the same
    rule explicit on both sides."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return WIN.tumbling(
        ev,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            AG.dec_sum(F.col("value"), "total_value"),
        ],
    )


@register(
    "sliding-window",
    sql="""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - j * INTERVAL '30 minutes' AS window_start,
             event_type, value
      FROM events, (VALUES (0), (1)) t(j)
      WHERE ts IS NOT NULL
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY 1, 2, 3
    """,
)
def q_sliding_window(spark, sf_dir):
    """1-hour windows sliding every 30 minutes: each event expands
    into exactly two windows (duration/slide), map-side, then one
    group-by shuffle. Event-time policy: ts IS NOT NULL on both sides
    (see q_tumbling_window)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return WIN.sliding(
        ev,
        "ts",
        "1 hour",
        "30 minutes",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            AG.dec_sum(F.col("value"), "total_value"),
        ],
    )


@register(
    "session-window",
    sql="""
    WITH lagged AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events WHERE ts IS NOT NULL
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM lagged
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS window_start,
           MAX(ts) + INTERVAL 10 MINUTE AS window_end,
           COUNT(*) AS n
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_session_window(spark, sf_dir):
    """Per-user session windows with a 10-minute inactivity gap
    (F.session_window); the oracle derives identical sessions via the
    gaps-and-islands construction. A new session starts when the gap
    is >= 10 minutes (Spark sessions are half-open [start, last+gap)).
    Event-time policy: ts IS NOT NULL on both sides (see
    q_tumbling_window)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return WIN.session(
        ev, "ts", "10 minutes", keys=["user_id"], aggs=[F.count(F.lit(1)).alias("n")]
    )
