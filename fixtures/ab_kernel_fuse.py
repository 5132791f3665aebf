#!/usr/bin/env python
"""Interleaved A/B for the r15 kernel-fusion change (VERDICT r14 #1):
cut the fixed Arrow round-trip cost in the knn/vector family.

A = HEAD: fused kernels — the exact knn branch scores pairs in ONE
    ArrowEvalPython (pair_cosine_flags_pandas computes both norms +
    the finite-geometry flag in-kernel; 3 Python round-trips → 1),
    and the bucketed paths compute bucket+norm in one fused pass
    (bucket_norm_pandas) instead of an Arrow bucketer next to a
    dim-unrolled codegen norm fold.
B = the r14-end spelling reconstructed verbatim (commit 068dacf):
    per-side norm_fold_pandas kernels + scalar filters on the exact
    branch; table_buckets_pandas + VEC.l2_norm codegen folds on the
    bucketed branches.

Method: the ab_r14_ledger discharge protocol — interleaved A/B/A/B
per sample (both arms inside the same weather window), 3 discarded
warmups per arm, medians of N, noop sink, loadavg + /proc/stat steal
recorded. Usage: python fixtures/ab_kernel_fuse.py [sf_dir] [samples]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W, functions as F


def _cpu_snap():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _steal_pct(before, after) -> float:
    """Steal as % of total cpu time inside the window (delta form —
    the cumulative-since-boot number hides window weather)."""
    ds = after[0] - before[0]
    dt = after[1] - before[1]
    return ds / max(dt, 1) * 100.0


# --- B arm: the r14-end spellings, verbatim -------------------------------


def b_knn_join_exact(spark, sf_dir):
    """knn-join at 068dacf: norm_fold_pandas per side + scalar norm
    filters + pair_cosine_pandas over precomputed norms."""
    from reverse_etl_homebrew_spark.operators.vectorized import (
        norm_fold_pandas,
        pair_cosine_pandas,
    )
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    left = emb.filter(F.col("vec_id") < 20)
    right = emb
    _nrm = norm_fold_pandas()
    _cos = pair_cosine_pandas()
    le = left.where(F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("l_id"),
        F.col("embedding").alias("l_v"),
        _nrm(F.col("embedding")).alias("l_nrm"),
    ).where(F.col("l_nrm").isNotNull() & (F.col("l_nrm") < F.lit(float("inf"))))
    re = right.where(F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("r_id"),
        F.col("embedding").alias("r_v"),
        _nrm(F.col("embedding")).alias("r_nrm"),
    ).where(F.col("r_nrm").isNotNull() & (F.col("r_nrm") < F.lit(float("inf"))))
    scored = le.join(re).withColumn(
        "score",
        F.round(_cos(F.col("l_v"), F.col("r_v"), F.col("l_nrm"), F.col("r_nrm")), 6),
    )
    w = W.partitionBy("l_id").orderBy(F.desc("score"), F.col("r_id"))
    return (
        scored.select("l_id", "r_id", "score")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("l_id", "r_id", "score")
    )


def _b_bucketed_side(df, idc, pfx, bucketer, dim):
    from reverse_etl_homebrew_spark.functions import vectors as VEC

    return df.where(F.col("embedding").isNotNull()).select(
        F.col(idc).alias(f"{pfx}_id"),
        F.col("embedding").alias(f"{pfx}_v"),
        VEC.l2_norm(F.col("embedding"), dim).alias(f"{pfx}_nrm"),
    )


def b_knn_join_lsh(spark, sf_dir):
    """knn-join-lsh at 068dacf: table_buckets_pandas + codegen
    l2_norm folds on both sides."""
    from reverse_etl_homebrew_spark.operators.dedup import _deterministic_planes
    from reverse_etl_homebrew_spark.operators.vectorized import (
        pair_cosine_pandas,
        table_buckets_pandas,
    )
    from reverse_etl_homebrew_spark.functions import vectors as VEC
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    left = emb.filter(F.col("vec_id") < 200)
    right = emb
    dim = VEC.infer_dim(right, "embedding")
    planes, k = 6, 3
    hp = _deterministic_planes(planes, dim)
    bucketer = table_buckets_pandas(hp, planes, tables=1)
    _cos = pair_cosine_pandas()
    l = _b_bucketed_side(left, "vec_id", "l", bucketer, dim)
    r = _b_bucketed_side(right, "vec_id", "r", bucketer, dim)
    r = r.withColumn("__bucket", F.element_at(bucketer(F.col("r_v")), 1))
    probes = [F.col("__b0")]
    probes += [F.col("__b0").bitwiseXOR(F.lit(1 << i)) for i in range(planes)]
    probes += [
        F.col("__b0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
        for i in range(planes)
        for j in range(i)
    ]
    l = (
        l.withColumn("__b0", F.element_at(bucketer(F.col("l_v")), 1))
        .withColumn("__bucket", F.explode(F.array_distinct(F.array(*probes))))
        .drop("__b0")
    )
    scored = l.join(r, "__bucket").withColumn(
        "score",
        F.round(_cos(F.col("l_v"), F.col("r_v"), F.col("l_nrm"), F.col("r_nrm")), 6),
    )
    w = W.partitionBy("l_id").orderBy(F.desc("score"), F.col("r_id"))
    return (
        scored.select("l_id", "r_id", "score")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("l_id", "r_id", "score")
    )


def b_incremental_knn(spark, sf_dir):
    """incremental-knn at 068dacf: build_ann_index with codegen
    l2_norm + bucketer kernel; batch side the same."""
    from reverse_etl_homebrew_spark.operators.dedup import _deterministic_planes
    from reverse_etl_homebrew_spark.operators.vectorized import (
        pair_cosine_pandas,
        table_buckets_pandas,
    )
    from reverse_etl_homebrew_spark.functions import vectors as VEC
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    accepted = emb.filter(F.col("vec_id") % 10 != 0)
    planes, k = 6, 3
    dim = VEC.infer_dim(accepted, "embedding")
    hp = _deterministic_planes(planes, dim)
    bucketer = table_buckets_pandas(hp, planes, tables=1)
    idx = (
        accepted.where(F.col("embedding").isNotNull())
        .select(
            F.col("vec_id").alias("r_id"),
            F.col("embedding").alias("r_v"),
            VEC.l2_norm(F.col("embedding"), dim).alias("r_nrm"),
        )
        .withColumn("bucket", F.element_at(bucketer(F.col("r_v")), 1))
        .where(F.col("bucket").isNotNull())
    )
    l = (
        batch.where(F.col("embedding").isNotNull())
        .select(
            F.col("vec_id").alias("l_id"),
            F.col("embedding").alias("l_v"),
            VEC.l2_norm(F.col("embedding"), dim).alias("l_nrm"),
        )
        .withColumn("__b0", F.element_at(bucketer(F.col("l_v")), 1))
        .where(F.col("__b0").isNotNull())
    )
    probes = [F.col("__b0")]
    probes += [F.col("__b0").bitwiseXOR(F.lit(1 << i)) for i in range(planes)]
    probes += [
        F.col("__b0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
        for i in range(planes)
        for j in range(i)
    ]
    l = l.withColumn(
        "bucket", F.explode(F.array_distinct(F.array(*probes)))
    ).drop("__b0")
    _cos = pair_cosine_pandas()
    scored = l.join(idx, "bucket").withColumn(
        "score",
        F.round(_cos(F.col("l_v"), F.col("r_v"), F.col("l_nrm"), F.col("r_nrm")), 6),
    )
    w = W.partitionBy("l_id").orderBy(F.desc("score"), F.col("r_id"))
    return (
        scored.select("l_id", "r_id", "score")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("l_id", "r_id", "score")
    )


def b_topk_lsh(spark, sf_dir):
    """topk-similarity-lsh at 068dacf: bucketer kernel + probe isin +
    cosine_literal scoring (pre_scoped, two inlined norm folds)."""
    from reverse_etl_homebrew_spark.operators.dedup import _deterministic_planes
    from reverse_etl_homebrew_spark.operators.vectorized import table_buckets_pandas
    from reverse_etl_homebrew_spark.functions import vectors as VEC
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
        cand.select(F.col("vec_id"), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(k)
    )
    return out if found else out.where(F.lit(False))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark import queries as Q

    spark = get_spark("ab-kernel-fuse")

    pairs = {
        "knn-join": (lambda: Q.QUERIES["knn-join"](spark, sf_dir),
                     lambda: b_knn_join_exact(spark, sf_dir)),
        "knn-join-lsh": (lambda: Q.QUERIES["knn-join-lsh"](spark, sf_dir),
                         lambda: b_knn_join_lsh(spark, sf_dir)),
        "incremental-knn": (lambda: Q.QUERIES["incremental-knn"](spark, sf_dir),
                            lambda: b_incremental_knn(spark, sf_dir)),
        "topk-similarity-lsh": (
            lambda: Q.QUERIES["topk-similarity-lsh"](spark, sf_dir),
            lambda: b_topk_lsh(spark, sf_dir)),
    }

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.catalog.clearCache()
        return dt

    for key, (a_fn, b_fn) in pairs.items():
        # parity gate first: both arms must emit the same rows
        a_rows = sorted(map(tuple, a_fn().collect()))
        b_rows = sorted(map(tuple, b_fn().collect()))
        assert a_rows == b_rows, f"{key}: arms diverge"
        for _ in range(3):  # discarded warmups, both arms
            run(a_fn)
            run(b_fn)
        snap0 = _cpu_snap()
        a_s, b_s = [], []
        for _ in range(n):
            a_s.append(run(a_fn))
            b_s.append(run(b_fn))
        steal = _steal_pct(snap0, _cpu_snap())
        am, bm = statistics.median(a_s), statistics.median(b_s)
        print(
            f"{key}: A(fused)={am:.3f}s B(r14)={bm:.3f}s B/A={bm/am:.2f}x "
            f"load1={os.getloadavg()[0]:.2f} steal={steal:.1f}%"
        )
    spark.stop()


if __name__ == "__main__":
    main()
