#!/usr/bin/env python
"""Interleaved A/B for the r15 pre-explode parallelism guard
(operators/scans.spread_for_fanout).

Finding: the sf test corpus is ONE parquet split, and Spark sizes scan
tasks by INPUT bytes — so every explode-heavy text path (char
shingling ~10³×, token windows ~10²×) ran its whole fan-out on one
core, while the cluster story has the same shape whenever a 128 MB
text split explodes into ~100 GB of gram work inside one task. The
guard round-robins the narrow pre-explode rows across the session's
parallelism and NO-OPS when the scan already carries enough
partitions (scale-adaptive, not a local constant).

A = HEAD (guard active) · B = guard monkeypatched to identity (the
r14 spelling — every call site resolves scans.spread_for_fanout at
call time, so the patch reconstructs the old plan exactly).
Interleaved A/B/A/B, 2 discarded warmups per arm, medians of N,
noop sink, parity-gated (both arms must emit identical rows).

Usage: python fixtures/ab_spread_fanout.py [sf_dir] [samples]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = [
    "trigram-lm-score",
    "heavy-hitters-by-group",
    "ngram-topk-sketch",
    "dup-span-rate",
    "dup-span-detect",
    "incremental-dup-spans",
    "bigram-lift-topk",
    "bm25-topk",
    "ngram-topk",
]


def _cpu_snap():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark import queries as Q
    import reverse_etl_homebrew_spark.operators.scans as SC

    spark = get_spark("ab-spread-fanout")
    guard = SC.spread_for_fanout
    identity = lambda df: df

    def run(key: str, arm: str) -> float:
        SC.spread_for_fanout = guard if arm == "A" else identity
        try:
            t0 = time.perf_counter()
            Q.QUERIES[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
        finally:
            SC.spread_for_fanout = guard
        gc.collect()
        spark.catalog.clearCache()
        return dt

    for key in KEYS:
        # parity gate: identical rows either way
        SC.spread_for_fanout = guard
        a_rows = sorted(map(tuple, Q.QUERIES[key](spark, sf_dir).collect()))
        SC.spread_for_fanout = identity
        b_rows = sorted(map(tuple, Q.QUERIES[key](spark, sf_dir).collect()))
        SC.spread_for_fanout = guard
        assert a_rows == b_rows, f"{key}: arms diverge"
        for _ in range(2):
            run(key, "A")
            run(key, "B")
        snap0 = _cpu_snap()
        a_s = []
        b_s = []
        for _ in range(n):
            a_s.append(run(key, "A"))
            b_s.append(run(key, "B"))
        snap1 = _cpu_snap()
        steal = (snap1[0] - snap0[0]) / max(snap1[1] - snap0[1], 1) * 100.0
        am, bm = statistics.median(a_s), statistics.median(b_s)
        print(
            f"{key}: A(spread)={am:.3f}s B(serial)={bm:.3f}s B/A={bm/am:.2f}x "
            f"load1={os.getloadavg()[0]:.2f} steal={steal:.1f}%"
        )
    spark.stop()


if __name__ == "__main__":
    main()
