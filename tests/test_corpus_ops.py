"""Semantic tests for the round-7 corpus-profiling operators
(queries_corpus.py). Value-level correctness against DuckDB is covered
by test_oracle_parity.py; these tests pin the semantic invariants and
the physical-plan properties the oracles can't see.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from reverse_etl_homebrew_spark import queries as Q


def _run(spark, sf_dir, key):
    return Q.QUERIES[key](spark, sf_dir)


def test_ngram_topk_shape_and_tiebreak(spark, sf_dir):
    rows = _run(spark, sf_dir, "ngram-topk").collect()
    assert len(rows) == 50
    # emitted in (n DESC, bigram ASC) order with every bigram two tokens
    pairs = [(r["n"], r["bigram"]) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
    assert all(len(b.split(" ")) == 2 for _, b in pairs)


def test_vocab_stats_ttr_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "vocab-stats").collect()
    assert rows
    for r in rows:
        assert 0 < r["vocab_size"] <= r["n_tokens"]
        assert 0.0 < r["type_token_ratio"] <= 1.0


def test_domain_stats_planted_recall(spark, sf_dir):
    rows = _run(spark, sf_dir, "domain-stats").collect()
    doms = {r["domain"] for r in rows}
    # every extracted domain is one of the two planted host families
    pat = re.compile(r"^(site[0-9]+\.example\.org|cdn[0-9]+\.example\.net)$")
    assert doms and all(pat.match(d) for d in doms)
    # planted every 5th doc with doc_id%97 / doc_id%13 hosts: both
    # families must appear
    assert any(d.startswith("site") for d in doms)
    assert any(d.startswith("cdn") for d in doms)


def test_embedding_centroid_dims(spark, sf_dir):
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    dim = len(
        load_table(spark, sf_dir, "embeddings").select("embedding").first()[0]
    )
    rows = _run(spark, sf_dir, "embedding-centroid").collect()
    assert rows
    # dim-exploded shape: every label carries exactly `dim` rows,
    # one per dimension 0..dim-1, all with the same positive n_vecs
    by_label: dict = {}
    for r in rows:
        assert r["n_vecs"] > 0
        by_label.setdefault(r["label"], []).append(r["dim"])
    for dims in by_label.values():
        assert sorted(dims) == list(range(dim))


def test_anomaly_zscore_all_outliers(spark, sf_dir):
    rows = _run(spark, sf_dir, "anomaly-zscore").collect()
    assert all(abs(r["z"]) > 3 for r in rows)


def test_scd2_history_intervals(spark, sf_dir):
    df = _run(spark, sf_dir, "scd2-history")
    rows = df.collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r["valid_from"])
        # exactly one open (current) interval per user, and it is the last
        assert sum(1 for r in hist if r["is_current"]) == 1
        assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
        for a, b in zip(hist, hist[1:]):
            # intervals chain: each valid_to is the next valid_from
            assert a["valid_to"] == b["valid_from"]
            # consecutive intervals never carry the same tracked value
            assert a["event_type"] != b["event_type"]


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """The point of the bucketed layout: with broadcast off (as it
    would be for a fact-to-fact join at 100 TB), the join runs as a
    SortMergeJoin over co-located buckets with NO Exchange on either
    join input."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = _run(spark, sf_dir, "bucketed-join")
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "hashpartitioning(l_orderkey" not in plan
        assert "hashpartitioning(o_orderkey" not in plan
        # the only shuffle is the small post-join re-agg on o_orderpriority
        assert plan.count("Exchange") <= 2
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    got = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in _run(spark, sf_dir, "bucketed-join").collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    want = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(rev).cast("double"), 6).alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_heavy_hitters_exact_and_partition_invariant(spark):
    """The Misra-Gries candidate sketch is partition-dependent (each
    partitioning's summaries may retain different extras), but the
    exact-recount phase must make the final answer identical under any
    partitioning — and equal to the brute-force groupBy."""
    from reverse_etl_homebrew_spark.operators.vectorized import (
        heavy_hitters_exact,
        misra_gries_candidates,
    )

    # planted skew: ids 0..6 hot (1000 each), 7000 cold singletons
    rows = [(f"hot_{i % 7}",) for i in range(7000)] + [
        (f"cold_{i}",) for i in range(7000)
    ]
    df = spark.createDataFrame(rows, "item string")
    k = 100

    brute = {
        (r["item"], r["cnt"])
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") > len(rows) / k)
        .collect()
    }
    assert len(brute) == 7  # the 7 hot items, 1000 > 14000/100

    for parts in (3, 32):
        got = {
            (r["item"], r["cnt"])
            for r in heavy_hitters_exact(df.repartition(parts), "item", k).collect()
        }
        assert got == brute, f"parts={parts}"
        # sketch bound: each partition emits at most k candidates
        n_cands = misra_gries_candidates(
            df.repartition(parts), "item", k
        ).count()
        assert n_cands <= parts * k


def test_heavy_hitters_null_policy_and_item_types(spark):
    """NULL items are excluded by declared semantics (they neither
    appear as a hitter nor inflate n), and non-string item columns
    work — the output schema is derived from the input column."""
    from reverse_etl_homebrew_spark.operators.vectorized import heavy_hitters_exact

    # 400 NULLs + 60 of item 7 + 20 of item 8 + 20 singletons: with
    # NULLs excluded n = 100 (threshold 10) and BOTH items are heavy;
    # if NULLs leaked into n (n = 500, threshold 50), item 8 (20)
    # would vanish — so the presence of item 8 pins the "NULLs don't
    # inflate n" half of the declared semantics, not just the counts.
    rows = (
        [(None,)] * 400
        + [(7,)] * 60
        + [(8,)] * 20
        + [(1000 + i,) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "item long").repartition(5)
    got = sorted(
        (r["item"], r["cnt"]) for r in heavy_hitters_exact(df, "item", 10).collect()
    )
    assert got == [(7, 60), (8, 20)]
