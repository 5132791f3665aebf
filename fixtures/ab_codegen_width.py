#!/usr/bin/env python
"""Interleaved A/B for the r14 codegen-width fixes (optimization
round 1): the three registry keys whose candidate-scoring stage
crossed janino's 64 KB method limit and silently ran INTERPRETED
(ERROR CodeGenerator + whole-stage fallback, present since the
masking-kernel rounds; found by sweeping every registry key for
codegen failures — fallback keys: topk-similarity-lsh,
topk-similarity-ivf, hybrid-rrf).

A = the CURRENT registered query (compiled: pre_scoped candidate
scoring for lsh/ivf — the masking kernel already applied the
finite-geometry scope, so the redundant second fold is dropped; the
kernel-norm spelling for the un-scoped brute leg of hybrid-rrf).
B = the fa46bc3 spelling reconstructed verbatim: finite_geometry
fold filter + cosine_literal (three inlined dim-term folds in one
stage → janino overflow → interpreted).

Interleaved A/B/A/B (the ewma-smooth discharge method): both arms
share each minute's host weather — this sandbox shows cumulative CPU
steal of the same order as user time, so sequential medians are
meaningless. 3 discarded warmups per arm, medians of 5, noop sink,
loadavg + steal recorded.

Usage: python fixtures/ab_codegen_width.py [sf_dir]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W, functions as F


def _steal() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def b_topk_lsh(spark, sf_dir):
    """topk-similarity-lsh at fa46bc3: topk_lsh candidates re-scoped
    with the finite_geometry fold + cosine_literal (the overflowing
    stage), reconstructed verbatim."""
    from reverse_etl_homebrew_spark.functions import vectors as VEC
    from reverse_etl_homebrew_spark.operators.dedup import _deterministic_planes
    from reverse_etl_homebrew_spark.operators.vectorized import table_buckets_pandas
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    query, found = VEC.query_vector(emb)
    planes, k = 6, 10
    dim = len(query)
    hp = _deterministic_planes(planes, dim)

    def bucket_of(vec):
        return sum(
            (1 if sum(a * b for a, b in zip(p, vec)) >= 0 else 0) << (planes - 1 - i)
            for i, p in enumerate(hp)
        )

    qb = bucket_of([float(x) for x in query])
    probe_buckets = (
        [qb]
        + [qb ^ (1 << i) for i in range(planes)]
        + [qb ^ (1 << i) ^ (1 << j) for i in range(planes) for j in range(i)]
    )
    bucketer = table_buckets_pandas(hp, planes, tables=1)
    cand = (
        emb.where(F.col("embedding").isNotNull())
        .withColumn("__bucket", F.element_at(bucketer(F.col("embedding")), 1))
        .filter(F.col("__bucket").isin(probe_buckets))
    )
    score = VEC.cosine_literal(F.col("embedding"), query)
    out = (
        cand.where(VEC.finite_geometry(F.col("embedding"), dim))
        .select(F.col("vec_id"), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(k)
    )
    return out if found else out.where(F.lit(False))


def b_topk_ivf(spark, sf_dir):
    """topk-similarity-ivf at fa46bc3: candidates re-scoped with the
    finite_geometry fold + cosine_literal."""
    import numpy as np

    from reverse_etl_homebrew_spark.functions import vectors as VEC
    from reverse_etl_homebrew_spark.operators.vectorized import ivf_assign_pandas
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id") < 8)
        .filter(VEC.finite_vector(F.col("embedding")))
        .orderBy("vec_id")
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in cent_rows]
    query, found = VEC.query_vector(emb)
    if not cents:
        cents = [[0.0] * len(query)]
        found = False
    C = np.asarray(cents)
    probe_cells = [int(i) for i in (C @ np.asarray(query)).argsort()[::-1][:3]]
    assigned = ivf_assign_pandas(emb, cents)
    cand = assigned.filter(F.col("ivf_cell").isin(probe_cells)).select(
        "vec_id", "embedding"
    )
    score = VEC.cosine_literal(F.col("embedding"), query)
    out = (
        cand.where(VEC.finite_geometry(F.col("embedding"), len(query)))
        .select(F.col("vec_id"), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(10)
    )
    return out if found else out.where(F.lit(False))


def b_hybrid_rrf(spark, sf_dir):
    """hybrid-rrf at fa46bc3: the vector leg's brute top-50 with the
    finite_geometry fold filter + cosine_literal (the overflowing
    stage); lexical leg unchanged (shared with A)."""
    from reverse_etl_homebrew_spark.functions import vectors as VEC
    from reverse_etl_homebrew_spark.operators import similarity as SIM
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    query, found = VEC.query_vector(emb)
    lex = SIM.bm25_topk(d, ["vector", "hash", "merge"], k=50).select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), F.col("doc_id")))
        .alias("lr"),
    )
    score = VEC.cosine_literal(F.col("embedding"), query)
    vec_base = (
        emb.where(VEC.finite_geometry(F.col("embedding"), len(query)))
        .select(F.col("vec_id"), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(50)
    )
    if not found:
        vec_base = vec_base.where(F.lit(False))
    vec = vec_base.select(
        F.col("vec_id").alias("id"),
        F.row_number().over(W.orderBy(F.desc("score"), F.col("vec_id"))).alias("vr"),
    )
    fused = lex.join(vec, ["id"], "full_outer").select(
        F.col("id").alias("doc_id"),
        F.round(
            F.coalesce(1.0 / (60 + F.col("lr")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("vr")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.col("doc_id")).limit(10)


B_ARMS = {
    "topk-similarity-lsh": b_topk_lsh,
    "topk-similarity-ivf": b_topk_ivf,
    "hybrid-rrf": b_hybrid_rrf,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("ab-codegen-width")
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
                "b_fa46bc3_median": round(statistics.median(b_s), 3),
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
