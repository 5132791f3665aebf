"""Partition-invariance: the engine claims its float-producing
aggregations are ORDER-INDEPENDENT (decimal-cast sums, exact integer
weights, selected-not-interpolated medians), which is what makes
results reproducible across cluster sizes and AQE re-plans. Pin it:
run each key under different shuffle widths — different partial-agg
merge orders — and require bit-identical results.

A plain double-sum implementation fails this test (the r2 lesson that
introduced dec_sum); any future operator that sneaks a raw float fold
into an aggregate fails it here instead of in a 1000-executor run."""

from __future__ import annotations

import math

import pytest

from reverse_etl_homebrew_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"

# Float-producing keys spanning every summation device in the engine:
# decimal-cast sums, exact-integer weights, percentile selection,
# moment algebra, per-dim centroid sums, LSH+exact-verify pipelines.
KEYS = [
    "groupby-agg",
    "stats-agg",
    "quantiles",
    "embedding-centroid",
    "entropy-quality",
    "ewma-smooth",
    "window-median",
    "mad-outliers",
    "anomaly-zscore",
    "trigram-lm-score",
    "fuzzy-dedup",
    "mix-weights",
    "containment-dedup-capped",
    # r9 additions: the two-phase sketch paths (candidate sets are
    # partition-DEPENDENT; the exact recount must erase that) and the
    # guarded-integer lift score
    "heavy-hitters",
    "ngram-topk-sketch",
    "bigram-lift-topk",
    # r9 continuation: the IVM merge (decimal partial-sum addition
    # must be width-independent) and the z-order layout (two-phase
    # rank must give the same global order at any width)
    "incremental-agg-merge",
    "zorder-layout",
    # per-group sketch: candidate sets are partition-dependent per
    # group; the per-group recount must erase that
    "heavy-hitters-by-group",
    # r10: span-level dup fraction — the exact integer ratio must be
    # width-independent like every other round6 site
    "dup-span-rate",
    # r12: incremental ANN — Arrow pair-cosine over bucket-join
    # candidates; candidate arrival order must not leak into top-k
    "incremental-knn",
    # late r12: two-phase rank selection — bin histograms and in-bin
    # cumulatives must pick the same order statistic at any width
    "quantiles-twophase",
]


def _norm_cell(v):
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", v)
    if isinstance(v, list):
        return ("l", tuple(_norm_cell(x) for x in v))
    return (type(v).__name__, str(v))


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_norm_cell(r[c]) for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("key", KEYS)
def test_result_invariant_under_shuffle_width(spark, key):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _rowset(Q.QUERIES[key](spark, SF_DIR))
        # 3 partitions: radically different partial-agg merge order and
        # task interleaving than 32.
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _rowset(Q.QUERIES[key](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert wide == narrow, f"{key}: result depends on shuffle width"
