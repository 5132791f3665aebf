#!/usr/bin/env python
"""Interleaved A/B for the r14 fingerprint-index pin in the local
`incremental_dedup` composite: the registered incremental-dedup key's
anti-join is pushed through its 3-branch batch union, and the
survivor election consumes the anti-join output twice — without the
pin the seen-corpus scan→sha256→distinct subtree executed SIX times
in one query (12 parquet scans total; AQE exchange reuse did not fire
on the post-pushdown subtrees). A = pinned index (current; 6 scans —
the remaining ones are the delta-sized batch side, deliberately
unpinned: tests/test_refresh_pipeline.py's differential plan pins
count Exchanges through that subtree). B = the pre-r14 unpinned
spelling.

Usage: python fixtures/ab_pin_fp_index.py [sf_dir]
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


def b_incremental_dedup(spark, sf_dir):
    """incremental-dedup pre-r14: inline index, no pin."""
    from reverse_etl_homebrew_spark.operators.dedup import (
        build_fingerprint_index,
        incremental_dedup_against_index,
    )
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    batch = (
        d.filter(F.col("doc_id") >= 400)
        .select("doc_id", "text")
        .unionByName(
            d.filter(F.col("doc_id") < 50).select(
                (F.col("doc_id") + 10000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            d.filter(F.col("doc_id").between(400, 409)).select(
                (F.col("doc_id") + 20000).alias("doc_id"), "text"
            )
        )
    )
    seen = d.filter(F.col("doc_id") < 400)
    return incremental_dedup_against_index(
        batch,
        build_fingerprint_index(seen, "text", fp_col="__fp"),
        "text",
        "doc_id",
        fp_col="__fp",
    ).select("doc_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("ab-pin-fp-index")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    a_fn = lambda: Q.QUERIES["incremental-dedup"](spark, sf_dir)
    b_fn = lambda: b_incremental_dedup(spark, sf_dir)
    load0 = [round(x, 2) for x in os.getloadavg()]
    s0 = _steal()
    t_start = time.time()
    for _ in range(3):
        run(a_fn())
        run(b_fn())
        gc.collect()
        spark.catalog.clearCache()
    a_s, b_s = [], []
    for _ in range(5):
        a_s.append(run(a_fn()))
        b_s.append(run(b_fn()))
        gc.collect()
        spark.catalog.clearCache()
    wall = time.time() - t_start
    steal_pct = 100.0 * (_steal() - s0) / (32 * 100 * wall)
    print(
        {
            "key": "incremental-dedup (A=pinned fp index, B=unpinned)",
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
