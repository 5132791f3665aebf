"""Property-based tests (hypothesis) for the trickiest scalar
semantics, checked against straightforward Python models of the
reference behavior (SURVEY.md §5.2). Inputs are generated, batched
into ONE DataFrame per property, and evaluated through the real
Column expressions."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from reverse_etl_homebrew_spark.functions import scalars as SC

SET = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _bool_model(s):
    """to_hubspot_bool string-branch model (main.py:121-131)."""
    if s is None:
        return None
    n = s.strip().lower()
    if not n:
        return None
    if n in {"true", "false"}:
        return n
    if n in {"1", "y", "yes", "t"}:
        return "true"
    if n in {"0", "n", "no", "f"}:
        return "false"
    return n


@SET
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.sampled_from(["true", "FALSE", "1", "0", "y", "N", "t", "f", "", " "]),
            st.text(
                alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_bool_normalize_property(spark, values):
    schema = T.StructType([T.StructField("v", T.StringType(), True)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    out = [r["o"] for r in df.select(SC.bool_normalize(F.col("v")).alias("o")).collect()]
    assert out == [_bool_model(v) for v in values]


def _ident_model(d):
    """format_identifier Decimal-branch model (main.py:208-212)."""
    if d is None:
        return None
    if d == d.to_integral_value():
        return str(int(d))
    return format(d.normalize(), "f").rstrip("0").rstrip(".")


@SET
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.decimals(
                min_value=Decimal("-999999999"),
                max_value=Decimal("999999999"),
                places=3,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_identifier_canon_property(spark, values):
    schema = T.StructType([T.StructField("v", T.DecimalType(18, 3), True)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    out = [r["o"] for r in df.select(SC.identifier_canon(F.col("v")).alias("o")).collect()]
    assert out == [_ident_model(v) for v in values]


def _next_bday_model(d, today):
    """compute_next_birthday model (main.py:199-203) with the Feb-29
    raise→None edge."""
    if d is None:
        return None

    def safe_replace(year):
        try:
            return d.replace(year=year)
        except ValueError:
            return None

    nb = safe_replace(today.year)
    if nb is not None and nb < today:
        nb = safe_replace(today.year + 1)
    # reference: if this-year replace raised, except returns None
    if safe_replace(today.year) is None:
        return None
    return nb


@SET
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.dates(min_value=dt.date(1930, 1, 1), max_value=dt.date(2010, 12, 31)),
        ),
        min_size=1,
        max_size=30,
    ),
    st.dates(min_value=dt.date(2024, 1, 1), max_value=dt.date(2030, 12, 31)),
)
def test_next_birthday_property(spark, dobs, today):
    schema = T.StructType([T.StructField("v", T.DateType(), True)])
    df = spark.createDataFrame([(v,) for v in dobs], schema)
    out = [
        r["o"]
        for r in df.select(
            SC.next_birthday(F.col("v"), F.lit(today)).alias("o")
        ).collect()
    ]
    expected = [_next_bday_model(v, today) for v in dobs]
    assert out == expected


@SET
@given(st.lists(st.one_of(st.none(), st.text(max_size=20)), min_size=1, max_size=30))
def test_email_normalize_property(spark, values):
    schema = T.StructType([T.StructField("v", T.StringType(), True)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    out = [r["o"] for r in df.select(SC.email_normalize(F.col("v")).alias("o")).collect()]
    for got, v in zip(out, values):
        if v is None or not v.strip():
            assert got is None
        else:
            assert got == v.strip().lower()
