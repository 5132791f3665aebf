#!/usr/bin/env python
"""Hot-bucket skew probe for `incremental-knn` (r12): LSH bucketing's
Zipf head is DIRECTIONAL — a corpus where 30% of vectors point the
same way (boilerplate embeddings: templated pages, near-empty docs,
dead-pixel images) puts 30% of the index in ONE bucket, and every
probe near that direction scores the whole hot bucket.

Cells (sf0.1 embeddings, 10% batch / 90% accepted split, planes=6):
- clean: the driver corpus as-is;
- skew30: 30% of the ACCEPTED vectors replaced by tiny deterministic
  perturbations of one fixed direction (same bucket by construction),
  batch unchanged;
- skew30_hotbatch: same index, plus the BATCH also 30% in the hot
  direction — the worst case (hot queries × hot bucket).

The lever adjudication lands in SCALE.md: per-pair scoring is an
Arrow matmul, so a hot bucket costs linear-in-candidates wall, and
the production levers are (a) near-dup collapse BEFORE indexing —
`embedding_near_dup_pairs` exists precisely to dedup boilerplate
vectors — and (b) the per-bucket candidate cap precedent (df_cap)
if collapse is not allowed. Measured, not assumed.

Usage: python fixtures/skew_ann_probe.py [sf_dir]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


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
    from reverse_etl_homebrew_spark.operators.similarity import (
        build_ann_index,
        incremental_knn,
    )
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    spark = get_spark("skew-ann-probe")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(e.first()["embedding"])

    # the hot direction: a fixed unit-ish vector, perturbed per row by
    # a deterministic hash-scaled epsilon (same hyperplane signs for
    # all copies -> one bucket)
    hot = F.array(*[F.lit(1.0 + 0.001 * i) for i in range(dim)])
    eps = (F.xxhash64("vec_id") % 1000).cast("double") / 1e7
    hot_pert = F.transform(hot, lambda v: (v * (1.0 + eps)).cast("float"))

    def skewed(df):
        return df.select(
            "vec_id",
            F.when(F.col("vec_id") % 10 < 3, hot_pert)
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )

    batch = e.filter(F.col("vec_id") % 10 == 0)
    accepted = e.filter(F.col("vec_id") % 10 != 0)

    cells = {
        "clean": (batch, accepted),
        "skew30_index": (batch, skewed(accepted)),
        "skew30_both": (skewed(batch), skewed(accepted)),
    }
    print("loadavg_start", [round(x, 2) for x in os.getloadavg()])
    import tempfile

    tmp = tempfile.mkdtemp(prefix="sg-annskew-")
    for label, (b, a) in cells.items():
        # PERSIST the index (the production shape — and what the
        # tenx fixture does): timing an unpersisted index DataFrame
        # re-runs the bucketer every rep, burying the probe-side skew
        # delta under a constant rebuild cost (r12 review finding)
        path = os.path.join(tmp, label)
        build_ann_index(a, planes=6).write.parquet(path)
        idx = spark.read.parquet(path)
        hotsize = (
            idx.groupBy("bucket").count().orderBy(F.desc("count")).first()
        )
        rows = incremental_knn(b, idx, k=3, planes=6).count()
        wall = timed(lambda: incremental_knn(b, idx, k=3, planes=6))
        print(
            f"{label}: hottest bucket {hotsize['count']} rows, "
            f"result {rows} rows, wall {wall}s"
        )
    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
