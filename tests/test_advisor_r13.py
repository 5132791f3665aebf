"""Pins for the three r13 advisor findings (ADVICE.md round 12).

1. ``snapshot_diff`` digest injectivity: each fingerprint VALUE is
   md5-hashed before the sorted-set comma-join, so caller fingerprints
   containing ``','`` or equal to the literal ``'null'`` can no longer
   make DISTINCT version sets digest identically and misreport changed
   keys as unchanged.

2. ``exact_quantiles_twophase``'s phase-2 bound is documented as
   distribution-dependent (docstring) — and the adversarial shape the
   advisor described (a point mass plus range-stretching outliers
   packing the located bin) still returns EXACT answers.

3. ``bloom_candidate_grams`` validates ``m``: each lane
   force-broadcasts up to ``m`` longs, so an unbounded ``m`` is a
   silent driver-OOM knob — now refused loudly past 2^24.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.operators import dedup as DD
from reverse_etl_homebrew_spark.operators.aggregates import (
    exact_quantiles_twophase,
)
from reverse_etl_homebrew_spark.operators.merge import snapshot_diff


# ---------------------------------------------------------------------------
# 1. snapshot_diff digest injectivity
# ---------------------------------------------------------------------------

def _diff_statuses(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "doc_id long, v string")
    new = spark.createDataFrame(new_rows, "doc_id long, v string")
    out = snapshot_diff(old, new, "doc_id", F.col("v")).collect()
    return {r["doc_id"]: r["status"] for r in out}


def test_comma_bearing_fingerprints_cannot_alias_version_sets(spark):
    # the advisor's exact case: {'a,b'} vs {'a', 'b'} joined to the
    # same comma string before the fix — must now read as 'changed'
    st = _diff_statuses(
        spark,
        [(1, "a,b")],
        [(1, "a"), (1, "b")],
    )
    assert st == {1: "changed"}


def test_literal_null_fingerprint_is_not_the_null_sentinel(spark):
    # a VALUE equal to the string 'null' must compare different from
    # an actual NULL payload (which digests to the sentinel)
    st = _diff_statuses(
        spark,
        [(1, "null")],
        [(1, None)],
    )
    assert st == {1: "changed"}
    # and identical literal-'null' sets still compare unchanged
    st2 = _diff_statuses(spark, [(2, "null")], [(2, "null")])
    assert st2 == {}


def test_hex_fingerprints_unaffected(spark):
    # the normal md5-hex caller path: same set → unchanged, real
    # version change → changed (the pre-fix behavior, preserved)
    st = _diff_statuses(
        spark,
        [(1, "d41d8cd98f00b204e9800998ecf8427e"), (2, "aa"), (2, "bb")],
        [(1, "d41d8cd98f00b204e9800998ecf8427e"), (2, "bb"), (2, "aa"),
         (3, "cc")],
    )
    assert st == {3: "added"}


# ---------------------------------------------------------------------------
# 2. quantiles-twophase adversarial bin packing stays exact
# ---------------------------------------------------------------------------

def test_point_mass_plus_outlier_bin_packing_is_exact(spark):
    # 999 copies of 1.0 plus one outlier at 1e9: the outlier stretches
    # the range so every 1.0 lands in bin 0 — the advisor's
    # degraded-bound shape. Exactness must hold regardless.
    rows = [("g", 1.0)] * 999 + [("g", 1e9)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = exact_quantiles_twophase(df, "g", "v").collect()[0]
    # rank ceil(0.5*1000)=500 → 1.0; ceil(0.99*1000)=990 → 1.0
    assert out["p50"] == 1.0 and out["p90"] == 1.0 and out["p99"] == 1.0
    assert out["n"] == 1000


def test_distribution_caveat_documented():
    doc = exact_quantiles_twophase.__doc__
    assert "DISTRIBUTION-DEPENDENT" in doc


# ---------------------------------------------------------------------------
# 3. bloom m guard
# ---------------------------------------------------------------------------

def _gram_frames(spark):
    tg = spark.createDataFrame([(1, "a b c"), (2, "x y z")], "id long, g string")
    bg = spark.createDataFrame([("a b c",)], "g string")
    return tg, bg


@pytest.mark.parametrize("bad_m", [0, -1, (1 << 24) + 1, 1 << 30])
def test_bloom_m_out_of_range_refused(spark, bad_m):
    tg, bg = _gram_frames(spark)
    with pytest.raises(ValueError, match="broadcast-size budget"):
        DD.bloom_candidate_grams(tg, bg, bad_m)


def test_bloom_m_at_cap_accepted(spark):
    tg, bg = _gram_frames(spark)
    out = DD.bloom_candidate_grams(tg, bg, 1 << 24).collect()
    assert {r["g"] for r in out} >= {"a b c"}


# ---------------------------------------------------------------------------
# r13 judge #4: the exact-vs-prefiltered auto-selector
# ---------------------------------------------------------------------------

def _corpus(spark):
    train = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota " + str(i))
         for i in range(20)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota 3")],
        "doc_id long, text string",
    )
    return train, bench


def test_auto_selector_branches_agree(spark):
    train, bench = _corpus(spark)
    exact = DD.contamination_flags_auto(train, bench, route="exact")
    pre = DD.contamination_flags_auto(train, bench, route="prefiltered")
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, pre.collect())
    )
    auto = DD.contamination_flags_auto(train, bench)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_route_crossover_decision(spark):
    # below the broadcast threshold the exact join broadcasts anyway →
    # lanes are overhead; past it the lanes win (SCALE.md r12 pricing)
    thresh = DD._conf_bytes(
        spark, "spark.sql.autoBroadcastJoinThreshold", 10 * 1024 * 1024
    )
    assert DD.decontaminate_route(spark, 100, n=8) == "exact"
    assert (
        DD.decontaminate_route(spark, thresh, n=8) == "prefiltered"
    )  # 8x expansion pushes it over
    assert DD.decontaminate_route(spark, thresh * 2, n=8) == "prefiltered"


def test_route_broadcast_disabled_prefilters():
    class _FakeConf:
        def get(self, key, default=None):
            return "-1"

    class _FakeSpark:
        conf = _FakeConf()

    assert DD.decontaminate_route(_FakeSpark(), 1, n=8) == "prefiltered"


def test_conf_bytes_parses_units():
    class _S:
        class conf:  # noqa: N801
            @staticmethod
            def get(key, default=None):
                return _S.val

    for raw, want in [
        ("10485760", 10485760),
        ("10485760b", 10485760),
        ("10m", 10 << 20),
        ("10MB", 10 << 20),
        ("1g", 1 << 30),
        ("garbage", 77),
    ]:
        _S.val = raw
        assert DD._conf_bytes(_S, "k", 77) == want


def test_small_benchmark_routes_exact_on_real_session(spark):
    # a parquet-backed benchmark carries REAL Catalyst size stats (an
    # in-memory LocalRelation reports unknown = Long.MaxValue and
    # routes conservatively to prefiltered — also asserted here); the
    # sf0.001 eval split is tiny, so the estimate lands under the
    # default 10 MiB threshold and the selector picks the exact join
    bench = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    est = DD.estimated_plan_bytes(bench)
    assert 0 < est < (1 << 40)
    assert DD.decontaminate_route(spark, est, n=8) == "exact"
    train, mem_bench = _corpus(spark)
    assert DD.estimated_plan_bytes(mem_bench) == (1 << 63) - 1
    assert (
        DD.decontaminate_route(spark, DD.estimated_plan_bytes(mem_bench))
        == "prefiltered"
    )
