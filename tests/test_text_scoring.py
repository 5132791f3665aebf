"""Planted-input tests for the round-7 text-scoring operators:
tf-idf top terms, char-trigram LM cross-entropy, quality-weighted
sampling. The sf0.01 cross-engine checks live in test_oracle_parity;
these pin the operator semantics on corpora where the right answer is
known by construction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.operators import similarity as SIM


@pytest.fixture()
def docs(spark):
    rows = [
        # 'zebra' appears only in doc 1 and is its most repeated term;
        # 'the' appears in every doc (idf = ln(1) = 0).
        (1, "the zebra zebra zebra runs the plain"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the fox and the dog nap in the sun"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_rare_repeated_term_wins(spark, docs):
    top = SIM.tfidf_topterms(docs, k=1).collect()
    by_doc = {r["doc_id"]: r for r in top}
    assert by_doc[1]["term"] == "zebra"
    assert by_doc[1]["tfidf"] == round(3 * math.log(3 / 1), 6)
    # every doc emits exactly k rows, rank starts at 1
    assert sorted(r["rank"] for r in top) == [1, 1, 1]


def test_tfidf_ubiquitous_term_scores_zero(spark, docs):
    all_terms = SIM.tfidf_topterms(docs, k=100).collect()
    the_rows = [r for r in all_terms if r["term"] == "the"]
    assert len(the_rows) == 3  # in every doc
    assert all(r["tfidf"] == 0.0 for r in the_rows)
    # and zero-score terms rank below any positive-score term
    for r in the_rows:
        better = [
            x
            for x in all_terms
            if x["doc_id"] == r["doc_id"] and x["tfidf"] > 0.0
        ]
        assert all(x["rank"] < r["rank"] for x in better)


def test_trigram_lm_outlier_scores_highest(spark):
    # nine templated docs + one with alien character statistics
    rows = [(i, f"the common template text number {i} repeats here") for i in range(9)]
    rows.append((99, "zzqxv jjkkw qqvvz xjzzq wvkjq"))
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    scored = {r["doc_id"]: r["xent_nats"] for r in SIM.trigram_lm_score(d).collect()}
    outlier = scored.pop(99)
    assert outlier > max(scored.values()), (outlier, scored)


def test_trigram_lm_identical_docs_identical_scores(spark):
    d = spark.createDataFrame(
        [(1, "same text body"), (2, "same text body"), (3, "different words entirely")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["n_trigrams"], r["xent_nats"]) for r in SIM.trigram_lm_score(d).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_weighted_sample_rate_tracks_quality(spark, sf_dir):
    from reverse_etl_homebrew_spark import queries as Q

    kept = Q.QUERIES["weighted-sample"](spark, sf_dir)
    rows = kept.collect()
    assert rows, "sampler kept nothing"
    # kept set contains no zero-quality docs (acceptance u < q/2 = 0)
    assert all(r["quality"] > 0.0 for r in rows)
    # determinism: fresh plan, same rows
    again = sorted(
        (r["doc_id"], r["quality"])
        for r in Q.QUERIES["weighted-sample"](spark, sf_dir).collect()
    )
    assert again == sorted((r["doc_id"], r["quality"]) for r in rows)


def test_weighted_sample_acceptance_matches_formula(spark, sf_dir):
    """Row-level check: membership is exactly u16 < quality * 32768."""
    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.functions import text as TX
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    u16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    expected = {
        r["doc_id"]
        for r in d.select(
            "doc_id", u16.alias("u"), TX.quality_score(F.col("text")).alias("q")
        ).collect()
        if r["u"] < r["q"] * 32768.0
    }
    got = {r["doc_id"] for r in Q.QUERIES["weighted-sample"](spark, sf_dir).collect()}
    assert got == expected


def _explain(spark, df):
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scoring_ops_plan_shapes(spark, sf_dir):
    """Scale gates: the documents scan is column-pruned to the two
    columns the operators read, and the only nested-loop joins are the
    broadcast 1-row stats joins — never a CartesianProduct."""
    from reverse_etl_homebrew_spark import queries as Q

    for key in ["tfidf-topterms", "trigram-lm-score", "weighted-sample"]:
        plan = _explain(spark, Q.QUERIES[key](spark, sf_dir))
        assert "CartesianProduct" not in plan, key
        scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert scan, key
        for ln in scan:
            assert "lang" not in ln and "source" not in ln, (
                f"{key}: documents scan reads unused columns: {ln}"
            )


def test_pii_scrub_planted_docs_detected_and_masked(spark, sf_dir):
    from reverse_etl_homebrew_spark import queries as Q

    rows = Q.QUERIES["pii-scrub"](spark, sf_dir).collect()
    planted = [r for r in rows if r["doc_id"] % 7 == 0]
    clean = [r for r in rows if r["doc_id"] % 7 != 0]
    assert planted and clean
    # every planted doc: exactly the one planted email/phone/ip
    assert all(
        r["n_emails"] >= 1 and r["n_phones"] >= 1 and r["n_ips"] >= 1
        for r in planted
    )
    # corpus text itself carries no PII-shaped spans
    assert all(
        r["n_emails"] == 0 and r["n_phones"] == 0 and r["n_ips"] == 0
        for r in clean
    )
    # masking removed every detected span: re-scrubbing the scrubbed
    # text must find nothing (round-trip through the same operator)
    from reverse_etl_homebrew_spark.queries_text import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
    )
    import re

    # rebuild one planted doc's scrubbed text locally and check md5
    import hashlib

    from reverse_etl_homebrew_spark.sources.catalog import load_table

    d = {r["doc_id"]: r["text"] for r in load_table(spark, sf_dir, "documents").collect()}
    r0 = planted[0]
    t = (
        d[r0["doc_id"]]
        + f" Contact user{r0['doc_id']}@example.com or 555-"
        + str(r0["doc_id"] % 10000).rjust(4, "0")
        + f" from 10.0.{r0['doc_id'] % 256}.1"
    )
    scrubbed = re.sub(_PII_IP, "[IP]", re.sub(_PII_PHONE, "[PHONE]", re.sub(_PII_EMAIL, "[EMAIL]", t)))
    assert hashlib.md5(scrubbed.encode()).hexdigest() == r0["scrubbed_md5"]
    assert not re.search(_PII_EMAIL, scrubbed)


def test_dedup_rate_report_consistency(spark, sf_dir):
    from reverse_etl_homebrew_spark import queries as Q

    rows = Q.QUERIES["dedup-rate-report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_unique"] <= r["n_docs"]
        assert r["dup_rate"] == round(1.0 - r["n_unique"] / r["n_docs"], 6)


def test_length_histogram_covers_corpus(spark, sf_dir):
    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    rows = Q.QUERIES["length-histogram"](spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == load_table(spark, sf_dir, "documents").count()
    assert all(0 <= r["bucket"] <= 20 for r in rows)
