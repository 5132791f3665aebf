#!/usr/bin/env python
"""Isolated A/B for trigram-lm-score (VERDICT r9 #6): the most
expensive single bench key (4.57 s on the contended r9 driver host,
4.9 s cold after the r9 quadratic-explode fix). A pinned idle-host
baseline makes a future regression near the 2x line attributable:
without it, drift is maskable as contention (the cube-agg lesson).
Method = the standing A/B protocol: run ALONE on an idle host,
discard the first 4 executions (JIT tiering + page cache on this VM
class), report the median of the next 5, record loadavg before/after.

Usage: python fixtures/ab_trigram_lm.py [sf_dir]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    load0 = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark("ab-trigram-lm")

    def run_once() -> float:
        t0 = time.perf_counter()
        Q.QUERIES["trigram-lm-score"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    warm = [run_once() for _ in range(4)]
    samples = []
    for _ in range(5):
        gc.collect()
        spark.catalog.clearCache()
        samples.append(run_once())
    print(
        {
            "query": "trigram-lm-score",
            "sf_dir": sf_dir,
            "warmup_discarded": [round(x, 3) for x in warm],
            "samples": [round(x, 3) for x in samples],
            "median": round(statistics.median(samples), 3),
            "loadavg_start": load0,
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
