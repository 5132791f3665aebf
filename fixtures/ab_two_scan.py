#!/usr/bin/env python
"""Interleaved A/B for the r14 two-scan rewrites (optimization round
1): `trigram-lm-score` and `bm25-topk`.

- trigram-lm-score: B = the pre-r14 spelling — un-pinned c3 (its
  three consumers each re-ran the normalize→char-split→explode corpus
  scan: FOUR Generate passes in one plan) and an un-hinted model
  join-back (Catalyst broadcast the EXPLODED GRAM STREAM locally —
  the small-file estimate — and would shuffle every gram occurrence
  by trigram at scale). A = pinned vocabulary-bounded c3 + explicit
  broadcast(model): exactly two corpus scans, occurrence stream never
  shuffles.
- bm25-topk: B = the pre-r14 spelling — `toks` consumed twice (doc
  lengths + query-term tf), i.e. two full tokenize passes. A = one
  masked (id, term∈query) aggregation feeding dl/tf/stats from a
  pinned ≤(|query|+1)-rows-per-doc table.

Interleaved A/B/A/B, 3 discarded warmups, medians of 5, noop sink,
loadavg + steal%% recorded (this host shows heavy CPU steal; see
OPTIMIZATION_r14.md "Baseline").

Usage: python fixtures/ab_two_scan.py [sf_dir]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _steal() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def b_trigram(spark, sf_dir):
    """trigram-lm-score pre-r14: no c3 pin, no model broadcast hint."""
    from reverse_etl_homebrew_spark.functions import text as TX
    from reverse_etl_homebrew_spark.functions.exactmath import (
        guard_dec_units,
        round6_dec6_over_int,
    )
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        F.col("doc_id").alias("id"),
        TX.char_array(TX.normalized_text(F.col("text"))).alias("__ch"),
    ).select("id", F.explode(TX.char_ngrams_from(F.col("__ch"), 3)).alias("g"))
    c3 = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c3"))
    ctx = c3.groupBy(F.substring("g", 1, 2).alias("pfx")).agg(
        F.sum("c3").alias("c2")
    )
    vocab = c3.agg(F.countDistinct(F.substring("g", 3, 1)).alias("v_next"))
    model = (
        c3.withColumn("pfx", F.substring("g", 1, 2))
        .join(ctx, ["pfx"])
        .crossJoin(vocab)
        .select(
            "g",
            (
                -F.log(
                    (F.col("c3") + F.lit(1).cast("double"))
                    / (F.col("c2") + F.col("v_next"))
                )
            ).alias("nll"),
        )
    )
    return (
        grams.join(model, ["g"])
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(F.col("nll").cast("decimal(38,12)")).alias("s12"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "n_trigrams",
            round6_dec6_over_int(
                guard_dec_units("s12", 10**12, "n_trigrams * 1000000"),
                "n_trigrams * 1000000",
            ).alias("xent_nats"),
        )
    )


def b_bm25(spark, sf_dir):
    """bm25-topk pre-r14: toks consumed twice (two tokenize passes)."""
    from reverse_etl_homebrew_spark.functions import text as TX
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    k, k1, b = 10, 1.2, 0.75
    terms = ["vector", "hash", "merge"]
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.split(TX.normalized_text(F.col("text")), " ")).alias("term"),
    )
    doclen = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, ["term"])
        .join(doclen, ["id"])
        .crossJoin(stats)
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("id")
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.col("id"))
        .limit(k)
        .select(F.col("id").alias("doc_id"), "bm25")
    )


def b_bigram_lift(spark, sf_dir):
    """bigram-lift-topk pre-r14: un-pinned unigram table — its three
    consumers (total, x-join, y-join) each re-ran the corpus explode
    (four Generate passes)."""
    from reverse_etl_homebrew_spark.functions import text as TX
    from reverse_etl_homebrew_spark.functions.exactmath import (
        guard_den_mul,
        guard_mul,
        round6_int_ratio,
    )
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(TX.tokens(F.lower(F.col("text"))).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").cast("long").alias("n"))
    t = F.col("t")
    pairs = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cxy"))
        .withColumn("x", F.element_at(F.split("bigram", " "), 1))
        .withColumn("y", F.element_at(F.split("bigram", " "), 2))
    )
    ux = uni.select(F.col("w").alias("x"), F.col("c1").alias("cx"))
    uy = uni.select(F.col("w").alias("y"), F.col("c1").alias("cy"))
    return (
        bi.filter(F.col("cxy") >= 5)
        .join(ux, ["x"])
        .join(uy, ["y"])
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            "cxy",
            round6_int_ratio(
                guard_mul("cxy", "n"), guard_den_mul("cx", "cy")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "bigram")
        .limit(50)
    )


B_ARMS = {
    "trigram-lm-score": b_trigram,
    "bm25-topk": b_bm25,
    "bigram-lift-topk": b_bigram_lift,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("ab-two-scan")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for key, b_fn in B_ARMS.items():
        a_fn = Q.QUERIES[key]
        load0 = [round(x, 2) for x in os.getloadavg()]
        s0 = _steal()
        t_start = time.time()
        for _ in range(3):
            run(a_fn(spark, sf_dir))
            run(b_fn(spark, sf_dir))
            gc.collect()
            spark.catalog.clearCache()
        a_s, b_s = [], []
        for _ in range(5):
            a_s.append(run(a_fn(spark, sf_dir)))
            b_s.append(run(b_fn(spark, sf_dir)))
            gc.collect()
            spark.catalog.clearCache()
        wall = time.time() - t_start
        steal_pct = 100.0 * (_steal() - s0) / (32 * 100 * wall)
        print(
            {
                "key": key,
                "a_current_median": round(statistics.median(a_s), 3),
                "b_pre_r14_median": round(statistics.median(b_s), 3),
                "ratio_b_over_a": round(
                    statistics.median(b_s) / statistics.median(a_s), 3
                ),
                "a_samples": [round(x, 3) for x in a_s],
                "b_samples": [round(x, 3) for x in b_s],
                "loadavg_start": load0,
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "steal_pct_of_capacity": round(steal_pct, 1),
            },
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
