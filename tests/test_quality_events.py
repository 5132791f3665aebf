"""Invariant tests for the round-7 quality/event-analytics operators
(queries_quality.py, queries_events.py) — properties the oracle-parity
check can't express (parity proves Spark == DuckDB; these prove both
are computing the *right thing*)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from reverse_etl_homebrew_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, key):
    return Q.QUERIES[key](spark, SF_DIR).collect()


def test_entropy_bounds(spark):
    """0 <= H <= log2(alphabet); single-char docs would score 0."""
    rows = _rows(spark, "entropy-quality")
    assert rows
    for r in rows:
        assert r["n_chars_alnum"] > 0
        # 36-symbol alphabet (a-z0-9) bounds the entropy above.
        assert -1e-9 <= r["entropy"] <= math.log2(36) + 1e-9


def test_containment_bounds_and_orientation(spark):
    rows = _rows(spark, "containment-dedup")
    for r in rows:
        assert 0.8 <= r["containment"] <= 1.0 + 1e-9
        assert r["inner_id"] != r["outer_id"]


def test_containment_catches_what_jaccard_misses(spark):
    """Containment >= Jaccard always; the operator exists for pairs
    where the gap is real (subset docs)."""
    cont = {(r["inner_id"], r["outer_id"]) for r in _rows(spark, "containment-dedup")}
    assert cont, "corpus has planted near-dups; containment must fire"


def test_mad_outliers_are_extreme(spark):
    """Every flagged row sits > 3 robust sigmas from its metric median."""
    rows = _rows(spark, "mad-outliers")
    for r in rows:
        assert r["robust_z"] > 3.0 - 1e-6


def test_shard_assign_partitions_the_corpus(spark):
    rows = _rows(spark, "shard-assign")
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(0 <= r["shard"] < 16 for r in rows)


def test_kmeans_assign_is_nearest(spark):
    """Spot-check: each seed vector assigns to itself at distance 0."""
    rows = {r["vec_id"]: r for r in _rows(spark, "kmeans-assign")}
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    n = load_table(spark, SF_DIR, "embeddings").count()
    assert len(rows) == n
    for cid in range(8):
        assert rows[cid]["centroid_id"] == cid
        assert rows[cid]["dist"] == 0.0


def test_ewma_is_a_convex_combination(spark):
    """The smoothed value lies within [min, max] of the contributing
    window — weights are positive and normalized."""
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    vmin, vmax = ev.agg(F.min("value"), F.max("value")).first()
    for r in _rows(spark, "ewma-smooth"):
        assert vmin - 1e-6 <= r["ewma"] <= vmax + 1e-6


def test_window_median_within_range(spark):
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    vmin, vmax = ev.agg(F.min("value"), F.max("value")).first()
    rows = _rows(spark, "window-median")
    assert rows
    for r in rows:
        assert vmin <= r["med"] <= vmax


def test_merge_intervals_disjoint_per_user(spark):
    """Post-merge islands for one user must be strictly disjoint and
    ordered — the defining property of the merge."""
    rows = _rows(spark, "merge-intervals")
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["start_ts"], r["end_ts"]))
    for user, ivs in by_user.items():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert e1 < s2, f"user {user}: islands overlap"
        for s, e in ivs:
            assert s < e


def test_funnel_is_monotone(spark):
    rows = {r["step"]: r["n_users"] for r in _rows(spark, "funnel-steps")}
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3]
    assert rows[1] > 0


def test_retention_cohort_zero_offset_counts_everyone(spark):
    """Week-0 activity per cohort equals the cohort's size: every user
    is active in their own first week by definition."""
    rows = _rows(spark, "retention-cohorts")
    week0 = {r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0}
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id").isNotNull())
    cohort_sizes = {
        r["cohort_week"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
        .groupBy("cohort_week")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert week0 == cohort_sizes
    for r in rows:
        assert r["week_offset"] >= 0


def test_kmeans_assign_plan_is_shuffle_free(spark):
    """The assignment is ONE map-side projection: no Exchange, no Join
    in the physical plan (the scale property claimed in the docstring)."""
    df = Q.QUERIES["kmeans-assign"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def _plan(spark, key):
    return Q.QUERIES[key](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_anywhere_in_new_tier(spark):
    """None of the pair-producing operators may degenerate to an
    all-pairs join — the 100 TB death sentence."""
    for key in [
        "containment-dedup", "containment-dedup-capped", "ewma-smooth",
        "mad-outliers", "funnel-steps", "retention-cohorts",
        "heavy-hitters",
    ]:
        plan = _plan(spark, key)
        assert "CartesianProduct" not in plan, key
        if key == "heavy-hitters":
            # its single BroadcastNestedLoop is the 1-row total-count
            # crossJoin (the repo's standard stats-broadcast shape) —
            # allowed, but never more than one and never row-on-row
            assert plan.count("BroadcastNestedLoopJoin") <= 1, key
        else:
            assert "BroadcastNestedLoop" not in plan, key


def test_merge_intervals_single_shuffle(spark):
    """Both windows and the final aggregation share ONE user_id
    exchange: the running-max/running-sum pair needs the same sort,
    and hash(user_id) already clusters the (user_id, island) grouping
    keys."""
    plan = _plan(spark, "merge-intervals")
    assert plan.count("Exchange") == 1


def test_entropy_quality_two_aggregations_only(spark):
    plan = _plan(spark, "entropy-quality")
    assert plan.count("Exchange") <= 2


def test_mad_outliers_broadcasts_stats(spark):
    """The per-metric stats must come BACK to the scan as broadcasts —
    a sort-merge join here would shuffle the full event scan twice."""
    plan = _plan(spark, "mad-outliers")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_survivorship_partitions_the_corpus(spark):
    """Every doc belongs to exactly one cluster; exactly one survivor
    per cluster; cluster sizes sum to the corpus size."""
    rows = _rows(spark, "dedup-survivorship")
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    clusters = [r["cluster_id"] for r in rows]
    assert len(clusters) == len(set(clusters)), "two survivors in one cluster"
    assert sum(r["cluster_size"] for r in rows) == n_docs


def test_survivorship_picks_at_least_min_id_quality(spark):
    """The chosen survivor's quality must be >= the min-id policy's
    pick (it is the argmax) — and cluster ids are always the min id."""
    rows = _rows(spark, "dedup-survivorship")
    for r in rows:
        assert r["survivor_id"] >= r["cluster_id"]
        assert 0.0 <= r["quality"] <= 1.0 + 1e-9


def test_markov_rows_are_probabilities(spark):
    rows = _rows(spark, "markov-transitions")
    assert rows
    by_from: dict = {}
    for r in rows:
        assert 0.0 < r["p"] <= 1.0 + 1e-9
        by_from.setdefault(r["from_type"], 0.0)
        by_from[r["from_type"]] += r["p"]
    for f, total in by_from.items():
        # rows are rounded to 6 decimals; the sum can drift by the
        # rounding of at most |to_types| terms
        assert abs(total - 1.0) < 1e-4, (f, total)


def test_stats_agg_correlation_bounds(spark):
    for r in _rows(spark, "stats-agg"):
        assert -1.0 - 1e-9 <= r["qty_price_corr"] <= 1.0 + 1e-9
        assert r["qty_stddev"] >= 0.0
        assert r["n"] > 1


def test_kmeans_iterate_descends(spark):
    """Lloyd's guarantee: total inertia after (update, re-assign) is
    no higher than after the seed assignment."""
    from reverse_etl_homebrew_spark import queries_quality as QQ
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    seeds = QQ._seed_centroids(e)
    before = sum(
        r["dist"] for r in QQ._assign_embeddings(e, seeds).collect()
    )
    after = sum(r["dist"] for r in _rows(spark, "kmeans-iterate"))
    # 6-decimal per-row rounding can drift the totals a hair
    assert after <= before + 1e-3, (after, before)
    assert after < before, "update step did nothing — suspicious seeds"


def test_scd2_lookup_covers_every_probe_exactly_once(spark):
    """The SCD2 intervals partition each user's timeline from their
    first event, so every purchase probe matches exactly one state."""
    rows = _rows(spark, "scd2-lookup")
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    n_probes = ev.filter(
        F.col("user_id").isNotNull() & (F.col("event_type") == "purchase")
    ).count()
    assert len(rows) == n_probes
    assert len({r["event_id"] for r in rows}) == n_probes
    for r in rows:
        assert r["state_since"] <= r["ts"]
