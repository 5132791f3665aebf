"""Algebraic invariants of the incremental-agg-merge state
(operators/merge.py): the driver oracle proves ONE merge lossless vs
full recompute; these tests pin the full mergeable-summaries claim —
batches fold in INDEFINITELY, in any grouping and any order, to the
byte-identical state (associativity + commutativity of
merge_rollup_state), plus the null-inclusive watermark split.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.operators.merge import (
    merge_rollup_state,
    rollup_partial,
)
from reverse_etl_homebrew_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _state_rows(df):
    return sorted(
        (r["o_custkey"], r["n"], r["s6"], r["lo"], r["hi"])
        for r in df.collect()
    )


def test_multi_batch_fold_is_associative_and_order_invariant(spark):
    """4 delta batches folded in three different groupings and a
    shuffled order all produce the byte-identical state, equal to the
    single-pass recompute — the algebra that lets a maintenance job
    fold deltas forever without rescanning history."""
    o = load_table(spark, SF, "orders")
    batches = [
        rollup_partial(
            o.filter(F.col("o_orderkey") % 4 == i),
            "o_custkey", "o_totalprice", "o_orderdate",
        )
        for i in range(4)
    ]
    full = _state_rows(
        rollup_partial(o, "o_custkey", "o_totalprice", "o_orderdate")
    )
    assert full  # non-trivial input

    def fold(seq):
        acc = seq[0]
        for b in seq[1:]:
            acc = merge_rollup_state(acc, b, "o_custkey")
        return _state_rows(acc)

    b0, b1, b2, b3 = batches
    left_assoc = fold([b0, b1, b2, b3])
    balanced = _state_rows(
        merge_rollup_state(
            merge_rollup_state(b0, b1, "o_custkey"),
            merge_rollup_state(b2, b3, "o_custkey"),
            "o_custkey",
        )
    )
    permuted = fold([b2, b0, b3, b1])

    assert left_assoc == full
    assert balanced == full
    assert permuted == full


def test_merge_handles_one_sided_keys_and_null_bounds(spark):
    """A key present on only one side keeps that side's state
    verbatim; NULL bounds on one side never poison least/greatest
    (Spark's least/greatest skip NULLs)."""
    state = spark.createDataFrame(
        [(1, 2, "10.500000", "2020-01-01", "2020-06-01"),
         (2, 1, "3.000000", None, None)],
        "o_custkey long, n long, s6 string, lo string, hi string",
    ).select(
        "o_custkey", "n",
        F.col("s6").cast("decimal(38,6)").alias("s6"),
        F.col("lo").cast("date").alias("lo"),
        F.col("hi").cast("date").alias("hi"),
    )
    delta = spark.createDataFrame(
        [(2, 3, "7.250000", "2021-02-02", "2021-03-03"),
         (9, 1, "1.000000", "2019-05-05", "2019-05-05")],
        "o_custkey long, n long, s6 string, lo string, hi string",
    ).select(
        "o_custkey", "n",
        F.col("s6").cast("decimal(38,6)").alias("s6"),
        F.col("lo").cast("date").alias("lo"),
        F.col("hi").cast("date").alias("hi"),
    )
    got = {r["o_custkey"]: r for r in
           merge_rollup_state(state, delta, "o_custkey").collect()}
    assert set(got) == {1, 2, 9}
    # state-only key: carried verbatim
    assert (got[1]["n"], str(got[1]["s6"])) == (2, "10.500000")
    # merged key with NULL state bounds: delta's bounds win, sums add
    assert got[2]["n"] == 4
    assert str(got[2]["s6"]) == "10.250000"
    assert str(got[2]["lo"]) == "2021-02-02"
    assert str(got[2]["hi"]) == "2021-03-03"
    # delta-only key: carried verbatim
    assert got[9]["n"] == 1


def test_iam_query_keeps_null_watermark_rows(spark, tmp_path):
    """The ADVICE r9 regression: a NULL o_orderdate fails BOTH sides
    of a plain watermark split and silently vanishes while the oracle
    (plain GROUP BY) counts it. The delta side is now null-inclusive,
    so the merged result must cover every input row."""
    from reverse_etl_homebrew_spark import queries as Q

    o = load_table(spark, SF, "orders").limit(20).cache()
    with_nulls = o.withColumn(
        "o_orderdate",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
            F.col("o_orderdate")
        ),
    )
    n_null = with_nulls.filter(F.col("o_orderdate").isNull()).count()
    assert n_null > 0
    sf_dir = str(tmp_path)
    with_nulls.write.parquet(f"{sf_dir}/orders.parquet")

    merged = Q.QUERIES["incremental-agg-merge"](spark, sf_dir)
    total = merged.agg(F.sum("n_orders")).collect()[0][0]
    assert total == 20  # every row counted, NULL dates included


# --- randomized fold property: merge(partials) ≡ partial(union) ---
# Random keys, NULL-able values and timestamps, random batch
# assignment (empty batches included), checked against a plain Python
# model AND the single-pass recompute. This property found a real
# algebra hole on first run: coalescing both NULL sums to 0 made
# merge(NULL ⊕ NULL) = 0.000000 where the recompute keeps SUM = NULL
# for a key whose every value is NULL — fixed by making NULL the sum's
# identity in merge_rollup_state.
ROWS = st.lists(
    st.tuples(
        st.integers(0, 4),  # key
        st.one_of(st.none(), st.integers(-10**9, 10**9)),  # value, 1e-2 units
        st.one_of(st.none(), st.integers(1, 28)),  # day of 2020-01 or NULL
        st.integers(0, 3),  # batch assignment
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ROWS)
def test_random_fold_matches_recompute_and_model(spark, rows):
    data = [
        (
            k,
            None if v is None else str(Decimal(v).scaleb(-2)),
            None if d is None else f"2020-01-{d:02d}",
            b,
        )
        for k, v, d, b in rows
    ]
    df = spark.createDataFrame(
        data, "k long, v string, ts string, batch long"
    ).cache()

    # Python model
    exp = {}
    for k, v, d, b in rows:
        n, s, lo, hi = exp.get(k, (0, None, None, None))
        n += 1
        if v is not None:
            s = (Decimal(0) if s is None else s) + Decimal(v).scaleb(-2)
        if d is not None:
            ts = f"2020-01-{d:02d}"
            lo = ts if lo is None or ts < lo else lo
            hi = ts if hi is None or ts > hi else hi
        exp[k] = (n, s, lo, hi)
    expected = {
        k: (n, None if s is None else s.quantize(Decimal("0.000001")), lo, hi)
        for k, (n, s, lo, hi) in exp.items()
    }

    def rowmap(state):
        return {
            r["k"]: (r["n"], r["s6"], r["lo"], r["hi"]) for r in state.collect()
        }

    recompute = rowmap(rollup_partial(df, "k", "v", "ts"))
    assert recompute == expected

    acc = None
    for b in range(4):
        part = rollup_partial(df.filter(F.col("batch") == b), "k", "v", "ts")
        acc = part if acc is None else merge_rollup_state(acc, part, "k")
    assert rowmap(acc) == expected
