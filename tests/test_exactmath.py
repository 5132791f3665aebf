"""Cross-engine property test for functions/exactmath: the Spark
Column form and the DuckDB SQL twin must both equal the mathematical
half-away-from-zero 6-decimal rounding (computed with exact Fractions)
for the same operands — including numerators far past the naive
2·|a|·1e6 int64 overflow point, which the divmod decomposition must
survive."""

from __future__ import annotations

import random
from fractions import Fraction

import duckdb
import pytest
from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.functions.exactmath import (
    INT_RATIO_DEN_MAX,
    SCALE,
    guard_den,
    round6_dec6_over_int,
    round6_int_ratio,
    sql_guard_den,
    sql_round6_dec6_over_int,
    sql_round6_int_ratio,
)


def _ref_round6(num: int, den: int) -> float:
    """Half-away-from-zero rounding of num/den to 6 decimals, exact."""
    x = Fraction(num, den) * SCALE
    q = abs(x)
    units = q.numerator // q.denominator
    rem = q - units
    if rem * 2 >= 1:
        units += 1
    if x < 0:
        units = -units
    return float(units) / SCALE


def _cases():
    rng = random.Random(8)
    cases = []
    for _ in range(300):
        b = rng.choice([1, 2, 3, 7, 192, 500, 9973, 10**6, 4 * 10**12])
        # the representable envelope is |a/b| <= ~9.2e12 (the rounded
        # value in 1e-6 units must itself fit int64)
        hi = min(8 * 10**18, 4 * 10**12 * b)
        a = rng.choice(
            [
                rng.randrange(0, 100),
                rng.randrange(0, min(hi, 10**9) + 1),
                rng.randrange(0, hi),  # huge, past the naive 2a·1e6 wrap
                b * rng.randrange(0, 10**6) + b // 2,  # near .5 cuts
            ]
        )
        sign = rng.choice([1, -1])
        cases.append((sign * a, b))
    # pinned boundary cases: exactly-on-the-cut rationals
    cases += [(1, 2 * 10**6 // 2), (3, 2), (-3, 2), (32135, 10**7 // 1)]
    # the naive-overflow regime: |a| > 4.6e12 (where 2·|a|·1e6 wraps
    # int64) with modest denominators, ratio still in-envelope
    cases += [(5 * 10**12, 3), (-7 * 10**15, 9973), (8 * 10**18, 4 * 10**12)]
    return cases


@pytest.fixture(scope="module")
def evald(spark):
    """Evaluate all cases through BOTH engines in one pass each."""
    cases = _cases()
    sdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)], "i long, a long, b long"
    )
    spark_int = {
        r["i"]: r["v"]
        for r in sdf.select(
            "i", round6_int_ratio("a", "b").alias("v")
        ).collect()
    }
    spark_dec = {
        r["i"]: r["v"]
        for r in sdf.select(
            "i", round6_dec6_over_int("a", "b").alias("v")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, a BIGINT, b BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, a, b) for i, (a, b) in enumerate(cases)],
    )
    duck_int = dict(
        con.execute(
            f"SELECT i, {sql_round6_int_ratio('a', 'b')} FROM t"
        ).fetchall()
    )
    duck_dec = dict(
        con.execute(
            f"SELECT i, {sql_round6_dec6_over_int('a', 'b')} FROM t"
        ).fetchall()
    )
    con.close()
    return cases, spark_int, spark_dec, duck_int, duck_dec


def test_int_ratio_matches_exact_reference_in_both_engines(evald):
    cases, spark_int, _, duck_int, _ = evald
    for i, (a, b) in enumerate(cases):
        want = _ref_round6(a, b)  # round6(a/b)
        assert spark_int[i] == want, (a, b, spark_int[i], want)
        assert duck_int[i] == want, (a, b, duck_int[i], want)


def test_den_max_is_the_exact_int64_envelope():
    # the remainder-side intermediate 2·(b−1)·1e6 + b must fit int64 at
    # the cap and overflow one past it
    b = INT_RATIO_DEN_MAX
    assert 2 * (b - 1) * SCALE + b <= 2**63 - 1
    assert 2 * b * SCALE + (b + 1) > 2**63 - 1


def test_guarded_den_passes_through_in_envelope(spark):
    sdf = spark.createDataFrame(
        [(10, 4), (5 * 10**12, 3)], "a long, b long"
    )
    vals = [
        r["v"]
        for r in sdf.select(
            round6_int_ratio("a", guard_den("b")).alias("v")
        ).collect()
    ]
    assert vals == [_ref_round6(10, 4), _ref_round6(5 * 10**12, 3)]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {sql_round6_int_ratio('a', sql_guard_den('b'))} "
        "FROM (VALUES (10, 4), (5000000000000, 3)) t(a, b) ORDER BY b"
    ).fetchall()
    con.close()
    assert [g[0] for g in got] == [
        _ref_round6(5 * 10**12, 3), _ref_round6(10, 4)
    ]


def test_guarded_den_raises_past_envelope_in_both_engines(spark):
    # past the envelope Spark would WRAP silently (non-ANSI) while
    # DuckDB raises — the guard makes BOTH raise at the same cut
    over = INT_RATIO_DEN_MAX + 1
    sdf = spark.createDataFrame([(1, over)], "a long, b long")
    with pytest.raises(Exception, match="exactmath"):
        sdf.select(round6_int_ratio("a", guard_den("b")).alias("v")).collect()
    con = duckdb.connect()
    with pytest.raises(Exception, match="exactmath"):
        con.execute(
            f"SELECT {sql_round6_int_ratio('a', sql_guard_den('b'))} "
            f"FROM (VALUES (1, {over})) t(a, b)"
        ).fetchall()
    con.close()


def test_dec6_over_int_matches_exact_reference_in_both_engines(evald):
    cases, _, spark_dec, _, duck_dec = evald
    for i, (s6, b) in enumerate(cases):
        # s6 is already in 1e-6 units: result = halfaway(s6/b) / 1e6,
        # which _ref_round6 yields for the pre-scaled denominator
        want = _ref_round6(s6, b * SCALE)
        assert spark_dec[i] == want, (s6, b, spark_dec[i], want)
        assert duck_dec[i] == want, (s6, b, duck_dec[i], want)


def test_guard_dec_units_passthrough_and_raise(spark):
    """In-envelope decimal sums cast to exact units in both engines;
    past the envelope BOTH engines raise (Spark would otherwise NULL
    the overflowing decimal->bigint cast silently while DuckDB
    raises — the numerator-side twin of the guard_den divergence)."""
    from reverse_etl_homebrew_spark.functions.exactmath import (
        guard_dec_units,
        sql_guard_dec_units,
    )

    # passthrough: 123.456789 at 1e6 units over den 4
    sdf = spark.createDataFrame([("123.456789", 4)], "a string, b long").select(
        F.col("a").cast("decimal(38,6)").alias("a"), "b"
    )
    got = sdf.select(
        F.expr(guard_dec_units("a", 1_000_000, "b")).alias("u")
    ).collect()[0]["u"]
    assert got == 123456789
    con = duckdb.connect()
    dgot = con.execute(
        "SELECT "
        + sql_guard_dec_units("CAST('123.456789' AS DECIMAL(38,6))", 1_000_000, "4")
    ).fetchone()[0]
    assert dgot == 123456789

    # raise: a decimal whose units exceed int64max - 3*den
    big = "9223372036854.775808"  # units = 2^63 exactly
    sdf2 = spark.createDataFrame([(big, 4)], "a string, b long").select(
        F.col("a").cast("decimal(38,6)").alias("a"), "b"
    )
    with pytest.raises(Exception, match="exactmath"):
        sdf2.select(
            F.expr(guard_dec_units("a", 1_000_000, "b")).alias("u")
        ).collect()
    with pytest.raises(Exception, match="exactmath"):
        con.execute(
            "SELECT "
            + sql_guard_dec_units(
                f"CAST('{big}' AS DECIMAL(38,6))", 1_000_000, "4"
            )
        ).fetchone()
    con.close()


def test_guard_mul_passthrough_and_raise(spark):
    """In-envelope products pass through exactly; past int64 BOTH
    engines raise (Spark's non-ANSI `*` would wrap silently)."""
    from reverse_etl_homebrew_spark.functions.exactmath import (
        guard_mul,
        sql_guard_mul,
    )

    sdf = spark.createDataFrame(
        [(3_000_000_000, 3)], "a long, b long"
    )
    got = sdf.select(F.expr(guard_mul("a", "b")).alias("p")).collect()[0]["p"]
    assert got == 9_000_000_000
    con = duckdb.connect()
    assert con.execute(
        "SELECT " + sql_guard_mul("3000000000", "3")
    ).fetchone()[0] == 9_000_000_000

    over = spark.createDataFrame(
        [(3_100_000_000, 3_000_000_000)], "a long, b long"
    )
    with pytest.raises(Exception, match="exactmath"):
        over.select(F.expr(guard_mul("a", "b")).alias("p")).collect()
    with pytest.raises(Exception, match="exactmath"):
        con.execute(
            "SELECT " + sql_guard_mul("3100000000", "3000000000")
        ).fetchone()
    con.close()


def test_guard_den_mul_passthrough_and_raise(spark):
    """Product denominators must be guarded in DECIMAL: guard_den
    alone evaluates its argument in int64 first, so a past-int64
    product wraps BEFORE the compare and can land back inside the
    accepted range (2^32 * 2^32 wraps to 0) — failing open where
    DuckDB raises. guard_den_mul checks the decimal product first."""
    from reverse_etl_homebrew_spark.functions.exactmath import (
        guard_den_mul,
        sql_guard_den_mul,
    )

    # passthrough: in-envelope product
    sdf = spark.createDataFrame([(100, 2_000_000, 2_000)], "a long, x long, y long")
    got = sdf.select(
        round6_int_ratio("a", guard_den_mul("x", "y")).alias("v")
    ).collect()[0]["v"]
    assert got == _ref_round6(100, 2_000_000 * 2_000)
    con = duckdb.connect()
    dgot = con.execute(
        f"SELECT {sql_round6_int_ratio('a', sql_guard_den_mul('x', 'y'))} "
        "FROM (VALUES (100, 2000000, 2000)) t(a, x, y)"
    ).fetchone()[0]
    assert dgot == _ref_round6(100, 2_000_000 * 2_000)

    # the ADVICE wrap case: 2^32 * 2^32 wraps int64 to 0 — a plain
    # guard_den would accept it (0 < envelope); the decimal-checked
    # product raises in BOTH engines
    w = 1 << 32
    over = spark.createDataFrame([(1, w, w)], "a long, x long, y long")
    with pytest.raises(Exception, match="exactmath"):
        over.select(
            round6_int_ratio("a", guard_den_mul("x", "y")).alias("v")
        ).collect()
    with pytest.raises(Exception, match="exactmath"):
        con.execute(
            f"SELECT {sql_round6_int_ratio('a', sql_guard_den_mul('x', 'y'))} "
            f"FROM (VALUES (1, {w}, {w})) t(a, x, y)"
        ).fetchall()

    # past the 4.6e12 envelope but still inside int64: same raise
    # (the cut point is INT_RATIO_DEN_MAX, identical to guard_den)
    mid = spark.createDataFrame(
        [(1, INT_RATIO_DEN_MAX + 1, 1)], "a long, x long, y long"
    )
    with pytest.raises(Exception, match="exactmath"):
        mid.select(
            round6_int_ratio("a", guard_den_mul("x", "y")).alias("v")
        ).collect()
    con.close()


def test_guard_dec_units_null_regimes(spark):
    """Two NULL regimes pinned: (a) a NULL decimal input stays
    NULL-in -> NULL-out (no spurious raise); (b) a decimal so large
    the guard COMPARISON itself overflows precision 38 to NULL raises
    via IS NOT TRUE instead of falling through to a silent NULL
    cast (the ADVICE residual)."""
    from reverse_etl_homebrew_spark.functions.exactmath import (
        guard_dec_units,
    )

    # (a) NULL input passes through as NULL
    sdf = spark.createDataFrame([("x", 4)], "s string, b long").select(
        F.lit(None).cast("decimal(38,6)").alias("a"), "b"
    )
    got = sdf.select(
        F.expr(guard_dec_units("a", 1_000_000, "b")).alias("u")
    ).collect()[0]["u"]
    assert got is None

    # (b) |a| ~ 1e31 at scale 6: a*1e6 needs precision > 38. Under
    # ANSI (this session's mode) Spark raises on the decimal multiply
    # itself; under non-ANSI the multiply NULLs and the IS NOT TRUE
    # comparison fires the guard's raise. Either way the invariant
    # holds: this regime RAISES, it never silently NULL-casts.
    big = "1" + "0" * 31
    sdf2 = spark.createDataFrame([(big, 4)], "a string, b long").select(
        F.col("a").cast("decimal(38,6)").alias("a"), "b"
    )
    assert sdf2.collect()[0]["a"] is not None  # the cast itself fits
    with pytest.raises(Exception):
        sdf2.select(
            F.expr(guard_dec_units("a", 1_000_000, "b")).alias("u")
        ).collect()
