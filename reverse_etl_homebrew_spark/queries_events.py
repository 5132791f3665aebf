"""Event-analytics operators (round 7 extension tier, SURVEY.md
§2.11): EWMA smoothing, trailing window median, interval
merge (gaps-and-islands), funnel analysis, and retention cohorts —
the product-analytics tier a warehouse engine serves over the
`events` stream.

Determinism rules from queries.py apply: per-term decimal(38,6)
casts before double sums, 6-decimal rounding on emitted floats, and
(ts, event_id) as the total event order everywhere."""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from .functions.exactmath import (
    guard_dec_units,
    guard_den,
    sql_guard_den,
    round6_dec6_over_int,
    round6_int_ratio,
    sql_guard_dec_units,
    sql_round6_dec6_over_int,
    sql_round6_int_ratio,
)
from .operators import aggregates as AG
from .queries import register
from .sources.catalog import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_EWMA_DEPTH = 10  # truncate the tail: 0.7^10 ≈ 0.028 of the mass

# Weight for lag k is 0.7^k = 7^k / 10^k. Scaling every weight by
# 10^(depth-1) makes them EXACT integers (7^k * 10^(9-k)) — the whole
# weighted sum then runs in decimal/integer arithmetic with no pow()
# and no float rounding until one final division. This matters for the
# oracle: 2-decimal values × finite-decimal 0.7^k land EXACTLY on
# .5e-7 rounding boundaries, where a 1-ulp libm pow() difference
# between the JVM and C flips the 6th decimal (observed in testing).
_EWMA_COEFFS = [7**k * 10 ** (_EWMA_DEPTH - 1 - k) for k in range(_EWMA_DEPTH)]

_EWMA_COEFF_SQL = "[" + ", ".join(str(c) for c in _EWMA_COEFFS) + "]"

@register(
    "ewma-smooth",
    sql=f"""
    WITH v AS (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE isfinite(value) AND ts IS NOT NULL
    ), terms AS (
      SELECT a.user_id, a.event_id, a.ts,
             CAST(b.value AS DECIMAL(38,6))
               * ({_EWMA_COEFF_SQL}[a.rn - b.rn + 1]) AS wx,
             {_EWMA_COEFF_SQL}[a.rn - b.rn + 1] AS w
      FROM v a JOIN v b
        ON a.user_id = b.user_id
       AND b.rn BETWEEN a.rn - {_EWMA_DEPTH - 1} AND a.rn
    )
    SELECT user_id, event_id, ts,
           {sql_round6_dec6_over_int(
               sql_guard_dec_units('SUM(wx)', 1_000_000, 'SUM(w)'),
               'SUM(w)',
           )} AS ewma
    FROM terms GROUP BY user_id, event_id, ts
    """,
)
def q_ewma_smooth(spark, sf_dir):
    """Per-user EWMA smoothing of the event value series (α = 0.3,
    truncated at depth 10 — the untruncated tail holds < 3% of the
    weight mass and truncation is what makes the operator a bounded
    window instead of an unbounded recurrence, i.e. expressible
    without numeric blowup in BOTH engines). The monitoring-tier
    smoother that feeds anomaly thresholds.

    Plan: row_number once per user (one shuffle), then a self-join on
    the rn band — an equi-join on user_id with a 10-wide range
    predicate, so matched rows ∝ events × depth, never quadratic. The
    weights are exact scaled integers and the terms exact decimals
    (see _EWMA_COEFFS), so the per-event sum is order-independent and
    engine-independent down to one final double division. At 100 TB
    both legs reuse the same user_id hash partitioning — one shuffle
    total.

    Event-time policy (r10 NULL-robustness probe): an unstamped event
    has no position in a decay series — ts IS NOT NULL on both sides
    (implicit NULL ordering would otherwise diverge the engines:
    Spark sorts NULLS FIRST, DuckDB NULLS LAST)."""
    ev = _t(spark, sf_dir, "events").filter(
        AG.is_finite(F.col("value")) & F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.select(
        "user_id", "event_id", "ts", "value",
        F.row_number().over(w).alias("rn"),
    )
    a, b = v.alias("a"), v.alias("b")
    k = (F.col("a.rn") - F.col("b.rn")).cast("int")
    coeff = F.element_at(
        F.array(*[F.lit(c).cast("long") for c in _EWMA_COEFFS]), k + F.lit(1)
    )
    terms = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.rn") >= F.col("a.rn") - (_EWMA_DEPTH - 1))
        & (F.col("b.rn") <= F.col("a.rn")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("event_id"),
        F.col("a.ts").alias("ts"),
        (AG.finite_dec(F.col("b.value")) * coeff).alias("wx"),
        coeff.alias("w"),
    )
    # r9: exact-integer rounding replaced the double ROUND — the sf0.1
    # margin probe measured a pre-round value only 9.2e-7 (in 1e6-
    # scaled units) from a .5e-7 cut, inside the shortest-repr-vs-
    # binary divergence slack at 10x data. The weighted sum in 1e-6
    # units fits int64 up to |value| ~ 2.8e3 (coeff mass 3.24e9 x 1e6
    # per unit of value); guard_dec_units makes BOTH engines raise
    # past that envelope instead of Spark's silent NULL cast.
    return (
        terms.groupBy("user_id", "event_id", "ts")
        .agg(
            F.sum("wx").alias("wx_sum"), F.sum("w").alias("w_sum")
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            round6_dec6_over_int(
                guard_dec_units("wx_sum", 1_000_000, "w_sum"), "w_sum"
            ).alias("ewma"),
        )
    )


@register(
    "window-median",
    sql="""
    WITH v AS (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med
      FROM events WHERE isfinite(value) AND ts IS NOT NULL
    )
    SELECT user_id, event_id, ts, value, med
    FROM v WHERE rn >= 5
    """,
)
def q_window_median(spark, sf_dir):
    """Trailing 5-event median of the value series per user — the
    robust moving filter (spikes shift a moving average, never a
    moving median). Restricted to full frames (rn ≥ 5): the median of
    exactly 5 values is the 3rd order statistic — selected, never
    interpolated — so Spark `percentile` and DuckDB `quantile_cont`
    agree bit-for-bit with no rounding needed.

    Plan: ONE window shuffle on user_id computes rn and the frame
    median together; at 100 TB this is the same single-shuffle shape
    as any ranked window (`running-window`), with O(frame) state per
    row. Event-time policy: ts IS NOT NULL on both sides (see
    q_ewma_smooth); finite-measurement scope on value (r11 non-finite
    probe — a NaN in the frame makes Spark's percentile and DuckDB's
    quantile_cont silently disagree on every median it touches)."""
    ev = _t(spark, sf_dir, "events").filter(
        AG.is_finite(F.col("value")) & F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.select(
        "user_id", "event_id", "ts", "value",
        F.row_number().over(w).alias("rn"),
        F.expr("percentile(value, 0.5)").over(w.rowsBetween(-4, 0)).alias("med"),
    )
    return v.filter(F.col("rn") >= 5).drop("rn")


@register(
    "merge-intervals",
    sql="""
    WITH iv AS (
      SELECT user_id, event_id, ts,
             ts + INTERVAL 5 MINUTE AS te
      FROM events WHERE ts IS NOT NULL
    ), flagged AS (
      SELECT user_id, event_id, ts, te,
             CASE WHEN ts > MAX(te) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(te) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, ts, te,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           MIN(ts) AS start_ts, MAX(te) AS end_ts,
           COUNT(*) AS n_events
    FROM islands GROUP BY user_id, island
    """,
)
def q_merge_intervals(spark, sf_dir):
    """Gaps-and-islands interval merge: each event opens a 5-minute
    activity interval; overlapping/touching intervals per user merge
    into maximal islands (the batch sessionization that `session-window`
    expresses with Spark's built-in session window — this is the
    portable windowed-SQL form that also yields the island *extent*).

    Classic two-window algorithm: running max of prior interval ends
    marks island starts; a running sum of the start flags numbers the
    islands; one aggregation emits extents. All three steps share ONE
    user_id sort-shuffle — Catalyst collapses the window pair into a
    single Window node, so 100 TB cost = one shuffle + per-user linear
    scan. Timestamp comparisons are exact (microsecond integers), so
    both engines agree on every island boundary. Event-time policy:
    an unstamped event opens no interval — ts IS NOT NULL on both
    sides (see q_ewma_smooth)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    iv = ev.select(
        "user_id", "event_id", "ts",
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("te"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_max = F.max("te").over(w.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.select(
        "user_id", "event_id", "ts", "te",
        F.when(prev_max.isNull() | (F.col("ts") > prev_max), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "ts", "te",
        F.sum("new_island")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("island"),
    )
    return islands.groupBy("user_id", F.col("island").cast("long").alias("island")).agg(
        F.min("ts").alias("start_ts"),
        F.max("te").alias("end_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "funnel-steps",
    sql="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' AND user_id IS NOT NULL
      GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT 1 AS step, 'view' AS event_type,
           (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    """,
)
def q_funnel_steps(spark, sf_dir):
    """Ordered funnel analysis (view → click → purchase): a user
    counts for step N only with a step-N event strictly AFTER their
    earliest step-(N-1) completion — the sequencing constraint that
    separates funnel analysis from three independent counts.

    Plan: each stage is a per-user MIN aggregation joined to the
    previous stage's (user, ts) frontier; every shuffle is keyed on
    user_id so AQE reuses one exchange across stages, and each stage's
    frontier is orders of magnitude smaller than the event scan. The
    integer-only output makes the oracle comparison exact by
    construction."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())

    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def count_row(step, name, df):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step).cast("int").alias("step"),
            F.lit(name).alias("event_type"),
            "n_users",
        )

    return (
        count_row(1, "view", s1)
        .unionAll(count_row(2, "click", s2))
        .unionAll(count_row(3, "purchase", s3))
    )


@register(
    "retention-cohorts",
    sql="""
    WITH f AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INTEGER)
             AS week_offset,
           COUNT(*) AS n_users
    FROM act a JOIN f USING (user_id)
    GROUP BY f.cohort_week, week_offset
    """,
)
def q_retention_cohorts(spark, sf_dir):
    """Weekly retention-cohort triangle: users grouped by first-seen
    (Monday-truncated) week, counted in every later week they remain
    active — the canonical product-retention rollup.

    Plan: per-user first-seen aggregation + distinct (user, week)
    activity set, joined on user_id — both sides pre-aggregated, so
    the join input is user-cardinality, not event-cardinality; the
    final rollup is cohorts × offsets (tiny). Both engines truncate
    weeks to Monday and difference whole days / 7 on DATE values —
    integer arithmetic, exact by construction. 100 TB: all three
    shuffles key on user_id and the planner reuses the exchange."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    return (
        act.join(f, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "markov-transitions",
    sql=f"""
    WITH o AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), t AS (
      SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
      FROM o WHERE prev IS NOT NULL
      GROUP BY prev, event_type
    ), tot AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM t
      GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           {sql_round6_int_ratio('t.n', sql_guard_den('tot.n_from'))} AS p
    FROM t JOIN tot USING (from_type)
    """,
)
def q_markov_transitions(spark, sf_dir):
    """First-order event-transition matrix: per-user consecutive
    event-type pairs, counted and normalized into transition
    probabilities — the path-analysis primitive behind next-action
    prediction and funnel discovery (funnels test a HYPOTHESIZED
    path; this surfaces the empirical ones).

    One user_id window (LAG) shares its shuffle with the pair count's
    map-side partial; the transition matrix is |event types|² rows —
    tiny — so the normalizing totals broadcast back. The 6-decimal
    probability uses exact integer half-away division ((2n·1e6 +
    n_from) // (2·n_from), then one exact /1e6): integer/integer
    ratios can land on .5e-7 boundaries where the two engines' double
    ROUND disagree by 1 ulp (the embedding-centroid sf0.1 lesson).
    Event-time policy: an unstamped event has no position in a
    transition sequence — ts IS NOT NULL on both sides (see
    q_ewma_smooth)."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    t = o.groupBy(
        F.col("prev").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = t.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_from"))
    return t.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        # n_from is a CORPUS-wide per-state transition count — past the
        # 4.6e12 envelope at 100 TB, so guard it (both engines raise)
        round6_int_ratio("n", guard_den("n_from")).alias("p"),
    )


@register(
    "attribution-last-touch",
    sql="""
    WITH o AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN ts END IGNORE NULLS) OVER w AS touch_ts,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_id END IGNORE NULLS) OVER w
               AS touch_event_id,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS) OVER w
               AS touch_type
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts,
           touch_event_id, touch_type, touch_ts
    FROM o WHERE event_type = 'purchase'
    """,
)
def q_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase credited to the user's
    most recent preceding marketing touch (view/click) — the
    conversion-attribution primitive. A purchase with no prior touch
    keeps NULL attribution (organic).

    One user_id window with an IGNORE NULLS last-value carry over the
    preceding frame — the running "most recent qualifying row" device
    (no self-join, no as-of merge). The three carried columns are
    null on exactly the same rows, so one total (ts, event_id) order
    makes them provably consistent. Single shuffle; timestamps and
    integers only — exact by construction.

    Event-time policy: ts IS NOT NULL on both sides. Besides the
    engine NULL-ordering divergence (see q_ewma_smooth), a NULL-ts
    touch would DESYNCHRONIZE the three per-column carries — its
    touch_ts is NULL (skipped by IGNORE NULLS) while its event_id/type
    are not — breaking the consistency claim above; the probe caught
    exactly that triple."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")

    def carry(col):
        return F.last(F.when(is_touch, F.col(col)), ignorenulls=True).over(w)

    return (
        ev.select(
            "event_id", "user_id", "ts", "event_type",
            carry("ts").alias("touch_ts"),
            carry("event_id").alias("touch_event_id"),
            carry("event_type").alias("touch_type"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", "ts",
            "touch_event_id", "touch_type", "touch_ts",
        )
    )
