#!/usr/bin/env python
"""Scaling honesty for `corpus-refresh-pipeline` (r13): what happens
to the composite's wall when the CORPUS grows 10x while the DELTA
stays fixed?

The production claim is per-refresh cost O(delta): the fingerprint
set, span index, ANN index, and rollup state are PERSISTED bucketed
tables, so only the probe stages run nightly — and each probe stage's
delta-proportionality is already measured by its own fixture
(tenx_incremental_dup_spans, tenx_incremental_knn, tenx_ivm_merge).
This fixture measures the LOCAL composite, which rebuilds all four
artifacts inline per run — so its wall is EXPECTED to grow with the
corpus (the builds are corpus-proportional by design), and the
honest number to extract is the ratio's decomposition, not a flat
curve: the 10x cell's extra wall is the artifact-build cost a real
deployment pays ONCE at bootstrap (then amortizes via maintenance
appends), never per refresh.

Construction: corpus copies prefix-rewrite every token (the
tenx_dup_spans trick — copies share no fingerprints/windows), ids
shift per copy; embeddings replicate under the same shifted ids with
a deterministic per-copy rotation-free scale (bucket-preserving, so
index bucket counts scale ~10x). The DELTA is the same fixed
perturbation of copy 0 in both cells (drop %13, revise %7, re-add
%11) — candidates and admissions are IDENTICAL across cells, so any
wall growth is corpus-side.

Usage: python fixtures/tenx_refresh.py [sf_dir]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def doc_corpus(d, copies: int):
    from reverse_etl_homebrew_spark.functions import text as TX

    parts = []
    for c in range(copies):
        parts.append(
            d.select(
                (F.col("doc_id") + F.lit(c * 1_000_000)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        TX.tokens(F.col("text")),
                        lambda t: F.concat(F.lit(f"x{c}"), t),
                    ),
                    " ",
                ).alias("text"),
                "lang",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def vec_corpus(e, copies: int):
    parts = []
    for c in range(copies):
        scale = 1.0 + 0.01 * c  # scalar multiple: bucket-preserving
        parts.append(
            e.select(
                (F.col("vec_id") + F.lit(c * 1_000_000)).alias("vec_id"),
                F.transform(
                    F.col("embedding"), lambda v: (v * scale).cast("float")
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def delta_of(old):
    revised = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
    ).otherwise(F.col("text"))
    base = old.filter(F.col("doc_id") < 1_000_000)  # copy 0 only
    return (
        old.filter(F.col("doc_id") >= 1_000_000)  # other copies unchanged
        .unionByName(
            base.filter(F.col("doc_id") % 13 != 0).select(
                "doc_id", revised.alias("text"), "lang"
            )
        )
        .unionByName(
            base.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 100_000_000).alias("doc_id"), "text", "lang"
            )
        )
    )


def timed(build, reps=3, warm=2):
    for _ in range(warm):
        build().write.format("noop").mode("overwrite").save()
        gc.collect()
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        gc.collect()
    return round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from reverse_etl_homebrew_spark.operators.refresh import (
        corpus_refresh_report,
    )
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    spark = get_spark("tenx-refresh")
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    e = load_table(spark, sf_dir, "embeddings")
    print("loadavg_start", [round(x, 2) for x in os.getloadavg()])
    for copies in (1, 10):
        old = doc_corpus(d, copies)
        vecs = vec_corpus(e, copies)
        new = delta_of(old)
        wall = timed(lambda: corpus_refresh_report(old, new, vecs))
        rep = corpus_refresh_report(old, new, vecs)
        tot = rep.agg(
            F.sum("n_candidates"), F.sum("n_admitted"), F.sum("n_docs_total")
        ).first()
        print(
            f"copies={copies}: wall {wall}s, candidates {tot[0]}, "
            f"admitted {tot[1]}, corpus after {tot[2]}"
        )
    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
