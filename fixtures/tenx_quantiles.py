#!/usr/bin/env python
"""Scaling A/B for `quantiles-twophase` vs the built-in percentile
(`quantiles`): both compute exact order statistics, but the built-in
aggregates each group's FULL value multiset into one reducer's state,
while the two-phase form's shuffled state is ≤ buckets rows per group
plus the located bins' rows — a bound that holds BY CONSTRUCTION (the
histogram groupBy key space is groups × buckets), not one this probe
measures. What the probe reports: wall at 1× and 10× lineitem for
both forms, plus a bit-equal cross-check of the two-phase picks
across duplicated multisets. Wall-clock at local scale understates
the state difference (everything fits in memory here).

Copies replicate rows verbatim (duplicated multisets have identical
quantiles, so correctness stays cross-checkable against the 1× run).

Usage: python fixtures/tenx_quantiles.py [sf_dir]
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
    from reverse_etl_homebrew_spark.operators.aggregates import (
        exact_quantiles_twophase,
    )
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    spark = get_spark("tenx-quantiles")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )

    def corpus(c):
        out = li
        for _ in range(c - 1):
            out = out.unionByName(li)
        return out

    def builtin(c):
        return corpus(c).groupBy("l_returnflag").agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90"),
            F.percentile("l_extendedprice", F.lit(0.99)).alias("p99"),
        )

    def twophase(c):
        return exact_quantiles_twophase(
            corpus(c), "l_returnflag", "l_extendedprice"
        )

    print("loadavg_start", [round(x, 2) for x in os.getloadavg()])

    # cross-check: duplicated multisets give identical picks, and the
    # two-phase picks must equal the built-in's discrete neighbors'
    # bounds — compare two-phase 1x vs 10x directly (exact equality)
    p1 = {r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
          for r in twophase(1).collect()}
    p10 = {r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
           for r in twophase(10).collect()}
    assert p1 == p10, f"duplicated multiset changed the pick: {p1} vs {p10}"

    cells = {}
    for name, probe in (("builtin-percentile", builtin), ("twophase", twophase)):
        for c in (1, 10):
            cells[(name, c)] = timed(lambda: probe(c))
            print(f"{name} {c}x: wall={cells[(name, c)]}s")
        print(f"{name}: 10x ratio = {cells[(name, 10)] / cells[(name, 1)]:.2f}x")

    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
