#!/usr/bin/env python
"""Scaling measurement for the `incremental-dup-spans` SCALE.md row,
which claims per-ingest cost O(batch tokens), independent of the
accepted corpus' size (the index side is a persisted narrow table the
probe join reads in place when bucketed).

Two dimensions, measured separately against a PERSISTED index (the
production shape — the index is maintained, never derived per
ingest):

1. BATCH 1x -> 10x with the index fixed: wall must track batch rows
   (the window explode + window-key agg are batch-sized; the join's
   streamed side is the batch's distinct-window vocabulary).
2. INDEX 1x -> 10x with the batch fixed: wall growth must be bounded
   by the index SCAN (one narrow string column read), never by the
   join — the probe's shuffled volume stays batch-vocabulary-sized.
   On a bucketed production layout even the scan-side shuffle
   disappears; the parquet index here upper-bounds what a cluster
   would pay.

Same copy-construction trick as fixtures/tenx_dup_spans.py: each copy
prefix-rewrites every token, so copies share no windows and 10x data
means ~10x distinct windows with every per-window frequency EXACTLY
preserved. Cross-batch hits are preserved too: the batch and corpus
splits of each copy come from the same rewritten corpus, so the
planted near-dup structure that makes index hits non-trivial scales
with it.

Method: alone on an idle host, 2 warmups discarded per cell, median
of 3, loadavg recorded. Usage:
    python fixtures/tenx_incremental_dup_spans.py [sf_dir]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def corpus(d, copies: int):
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
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    from reverse_etl_homebrew_spark.operators.dedup import (
        build_span_index,
        incremental_dup_spans,
    )
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    spark = get_spark("tenx-incr-dup-spans")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="sg-spanidx-")

    def split(c):
        base = corpus(d, c)
        return (
            base.filter(F.col("doc_id") % 10 == 0),
            base.filter(F.col("doc_id") % 10 != 0),
        )

    # persist the 1x and 10x indexes once (maintenance cost, paid at
    # accept time in production — NOT per probe)
    idx_paths = {}
    for c in (1, 10):
        _, accepted = split(c)
        path = os.path.join(tmp, f"idx{c}")
        build_span_index(accepted).write.parquet(path)
        idx_paths[c] = path

    print("loadavg_start", [round(x, 2) for x in os.getloadavg()])

    def probe(batch_c, idx_c):
        batch, _ = split(batch_c)
        idx = spark.read.parquet(idx_paths[idx_c])
        return incremental_dup_spans(batch, idx)

    cells = {}
    for label, (bc, ic) in {
        "batch1x_idx1x": (1, 1),
        "batch10x_idx1x": (10, 1),
        "batch1x_idx10x": (1, 10),
        "batch10x_idx10x": (10, 10),
    }.items():
        rows = probe(bc, ic).count()
        wall = timed(lambda: probe(bc, ic))
        cells[label] = wall
        print(f"{label}: rows={rows} wall={wall}s")

    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])
    print(
        f"batch-scaling (idx fixed): "
        f"{cells['batch10x_idx1x'] / cells['batch1x_idx1x']:.2f}x wall at 10x batch; "
        f"index-sensitivity (batch fixed): "
        f"{cells['batch1x_idx10x'] / cells['batch1x_idx1x']:.2f}x wall at 10x index"
    )


if __name__ == "__main__":
    main()
