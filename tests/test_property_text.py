"""Property-based tests (hypothesis) for the text-analysis column
functions, checked against straightforward Python models. Same
batching pattern as test_property_scalars: one DataFrame per
property, real Column expressions."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from reverse_etl_homebrew_spark.functions import text as TX

SET = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Mixed corpus-ish text: words, punctuation, digits, odd whitespace.
# ASCII whitespace only: Java regex \s is ASCII while Python's \s and
# str.split() are unicode-aware, so U+00A0-style Zs characters are a
# genuine (documented) engine difference, not an operator bug.
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Po"),
            whitelist_characters=" \t\n",
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=25,
)


def _norm_model(s: str) -> str:
    s = re.sub(r"[^a-z0-9\s]", " ", s.lower())
    s = re.sub(r"\s+", " ", s)
    return s.strip()


def _df(spark, values):
    schema = T.StructType([T.StructField("v", T.StringType(), True)])
    return spark.createDataFrame([(v,) for v in values], schema)


@SET
@given(TEXTS)
def test_normalized_text_matches_model_and_is_idempotent(spark, values):
    df = _df(spark, values)
    out = [
        tuple(r)
        for r in df.select(
            TX.normalized_text(F.col("v")).alias("n1"),
            TX.normalized_text(TX.normalized_text(F.col("v"))).alias("n2"),
        ).collect()
    ]
    for v, (n1, n2) in zip(values, out):
        # Python's re and Java's regex agree on this ASCII-class subset
        # only after lower(); the model IS the operator contract.
        assert n1 == _norm_model(v), repr(v)
        assert n2 == n1, "normalization must be idempotent"


@SET
@given(TEXTS)
def test_token_count_matches_whitespace_model(spark, values):
    df = _df(spark, values)
    out = [r["c"] for r in df.select(TX.token_count(F.col("v")).alias("c")).collect()]
    for v, c in zip(values, out):
        assert c == len(v.split()), repr(v)


@SET
@given(TEXTS)
def test_quality_score_lands_on_weight_lattice(spark, values):
    """The score is a sum of fixed {0.4, 0.3, 0.3} gate weights — its
    value set is the 8-point lattice, nothing in between."""
    lattice = set()
    for a in (0.0, 0.4):
        for b in (0.0, 0.3):
            for c in (0.0, 0.3):
                lattice.add(round(0.4 / 0.4 * a + b + c, 10))
    df = _df(spark, values)
    out = [r["q"] for r in df.select(TX.quality_score(F.col("v")).alias("q")).collect()]
    for v, q in zip(values, out):
        assert round(q, 10) in lattice, (repr(v), q)


@SET
@given(st.lists(st.text(alphabet="ab ", max_size=30), min_size=1, max_size=20))
def test_word_ngrams_count(spark, values):
    """n-gram count = max(len(tokens) - n + 1, 1) (short docs emit one
    partial gram) — the contract the dedup oracles mirror in SQL."""
    df = _df(spark, values)
    toks = df.select(
        F.col("v"), F.split(TX.normalized_text(F.col("v")), " ").alias("w")
    )
    out = toks.select(
        "v", F.size(TX.word_ngrams_from(F.col("w"), 3)).alias("n")
    ).collect()
    for r in out:
        n_tok = len(_norm_model(r["v"]).split(" "))
        assert r["n"] == max(n_tok - 2, 1), repr(r["v"])
