"""Pin the MEASURED adversarial-text knob settings (r10 probe,
SCALE.md: the five non-OK keys were documented operator boundaries,
not silent divergences) so the boundaries can't silently widen:

- The Misra-Gries sketch keys' in-plan exactness guard must stay LOUD
  on the adversarial corpus at the default ``sketch_k=255`` (the
  adversarial grams flatten the trigram distribution past the
  pigeonhole bound), and ``sketch_k=1023`` must return the EXACT
  top-k again — both measured on the probe corpus in r10.
- The MinHash family's 4x8 banding misses true pairs on the
  adversarial corpus (snippets degrade planted clones into the
  0.6-0.8 jaccard gray zone below the S-curve midpoint), and
  ``bands=16`` restores pair-for-pair equality with the exact
  brute-force Jaccard set.

All comparisons are Spark-vs-Spark (sketch path vs exact path on the
SAME session and corpus) — the exactness claim, isolated from any
oracle dialect concerns.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import Window as W, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "fixtures"))

from adversarial_text_probe import build_adversarial_dir

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def adv_dir():
    return build_adversarial_dir(SF_DIR)


def _grams(spark, adv_dir):
    """The exact gram stream of ngram-topk-sketch (queries_corpus)."""
    from reverse_etl_homebrew_spark.functions import text as TX
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    d = load_table(spark, adv_dir, "documents")
    t = F.lower(F.trim(F.col("text")))
    return (
        d.select(t.alias("t"))
        .filter(F.length("t") >= 3)
        .select(TX.char_array(F.col("t")).alias("ch"))
        .select(F.explode(TX.char_ngrams_from(F.col("ch"), 3)).alias("gram"))
    )


def _lang_grams(spark, adv_dir):
    from reverse_etl_homebrew_spark.functions import text as TX
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    d = load_table(spark, adv_dir, "documents")
    t = F.lower(F.trim(F.col("text")))
    return (
        d.select("lang", t.alias("t"))
        .filter(F.length("t") >= 3)
        .select("lang", TX.char_array(F.col("t")).alias("ch"))
        .select("lang", F.explode(TX.char_ngrams_from(F.col("ch"), 3)).alias("gram"))
    )


def test_sketch_default_k_raises_loud_on_adversarial_corpus(spark, adv_dir):
    """sketch_k=255 must RAISE the provable-regime guard here — never
    silently truncate (the exact-or-loud contract)."""
    from reverse_etl_homebrew_spark.operators.vectorized import (
        topk_frequent_sketch,
    )

    with pytest.raises(Exception):
        topk_frequent_sketch(
            _grams(spark, adv_dir), "gram", k=50, sketch_k=255
        ).collect()


def test_sketch_k_1023_restores_exact_topk(spark, adv_dir):
    """The measured knob: sketch_k=1023 returns the exact top-50."""
    from reverse_etl_homebrew_spark.operators.vectorized import (
        topk_frequent_sketch,
    )

    grams = _grams(spark, adv_dir)
    exact = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(50)
        .collect()
    )
    got = (
        topk_frequent_sketch(grams, "gram", k=50, sketch_k=1023)
        .select("gram", "cnt")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]


def test_grouped_sketch_k_1023_restores_exact_topk(spark, adv_dir):
    from reverse_etl_homebrew_spark.operators.vectorized import (
        topk_frequent_by_group,
    )

    lg = _lang_grams(spark, adv_dir)
    w = W.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("gram"))
    exact = (
        lg.groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select("lang", "gram", "cnt")
        .collect()
    )
    got = (
        topk_frequent_by_group(lg, "lang", "gram", k=15, sketch_k=1023)
        .select("lang", "gram", "cnt")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exact))


def test_minhash_bands_16_restores_exact_recall(spark, adv_dir):
    """bands=4 loses gray-zone pairs on this corpus (the S-curve
    boundary is REAL); bands=16 equals the brute-force exact Jaccard
    pair set pair-for-pair — both halves pinned."""
    from reverse_etl_homebrew_spark.operators import dedup as DD

    d = (
        spark.read.parquet(f"{adv_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    exact = sorted(
        (r["a_id"], r["b_id"])
        for r in DD.ngram_jaccard_pairs(d, threshold=0.5).collect()
    )
    b16 = sorted(
        (r["a_id"], r["b_id"])
        for r in DD.minhash_verified_pairs(
            d, num_hashes=32, bands=16
        ).collect()
    )
    assert b16 == exact
    b4 = sorted(
        (r["a_id"], r["b_id"])
        for r in DD.minhash_verified_pairs(d, num_hashes=32, bands=4).collect()
    )
    assert len(b4) < len(exact), "bands=4 should miss gray-zone pairs here"
    assert set(b4) <= set(exact), "precision must stay 1.0 (exact verify)"


def test_minhash_bands_16_exact_on_encoding_corpus(spark):
    """The r12 ENCODING arm (astral/NFD/zalgo/fullwidth/direction-mark
    snippets) hit the SAME banding boundary and nothing else: the
    probe's only 3 non-OK keys were the fuzzy-dedup family, and
    bands=16 is pair-for-pair exact there too (measured: bands=4
    missed 9/28, bands=8 missed 2, bands=16 missed 0 with 0 extras).
    Gram-extraction parity on unicode poison is separately proven by
    ngram-jaccard staying OK — both engines count codepoints."""
    from reverse_etl_homebrew_spark.operators import dedup as DD

    enc_dir = build_adversarial_dir(SF_DIR, "encoding")
    d = (
        spark.read.parquet(f"{enc_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    exact = sorted(
        (r["a_id"], r["b_id"])
        for r in DD.ngram_jaccard_pairs(d, threshold=0.5).collect()
    )
    b16 = sorted(
        (r["a_id"], r["b_id"])
        for r in DD.minhash_verified_pairs(
            d, num_hashes=32, bands=16
        ).collect()
    )
    assert b16 == exact
    b4 = set(
        (r["a_id"], r["b_id"])
        for r in DD.minhash_verified_pairs(d, num_hashes=32, bands=4).collect()
    )
    assert len(b4) < len(exact), "the boundary must stay REAL"
    assert b4 <= set(exact), "precision must stay 1.0 (exact verify)"
