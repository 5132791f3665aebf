#!/usr/bin/env python
"""10x scaling-linearity measurement for the heavy-hitters SCALE.md
row (VERDICT r8 brief #2): the two-phase Misra-Gries + exact-recount
operator claims its shuffle carries candidates (<= partitions x k),
never the vocabulary — so wall-clock must track DATA volume even when
the DISTINCT-item space grows 10x alongside it.

Corpus construction (deterministic, from the sf events table):

- 1x: the registered heavy-hitters item stream — 2/3 of events on 7
  shared hot items, the rest across ~10k cold items (event_id % 9973).
- 10x: ten copies of the event stream; the 7 HOT items stay GLOBAL
  (un-prefixed, so their absolute counts grow 10x and they remain
  heavy at the same k=100), while every copy's COLD items carry a
  copy prefix (c0_..c9_) — 10x rows AND ~10x distinct items. A
  vocabulary-shuffling implementation (plain groupBy) pays the 10x
  item space in its exchange; the sketch path must pay only ~data.

Method: alone on an idle host, 2 warmups discarded per cell, median
of 3, loadavg recorded. Usage:
    python fixtures/tenx_heavy_hitters.py [sf_dir]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def item_stream(ev, copies: int):
    parts = []
    for c in range(copies):
        pfx = f"c{c}_" if copies > 1 else ""
        parts.append(
            ev.select(
                F.when(
                    F.col("event_id") % 3 != 0,
                    F.concat(
                        F.lit("item_"), (F.col("event_id") % 7).cast("string")
                    ),
                )
                .otherwise(
                    F.concat(
                        F.lit(f"{pfx}item_"),
                        (F.col("event_id") % 9973).cast("string"),
                    )
                )
                .alias("item")
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
    import reverse_etl_homebrew_spark.queries  # noqa: F401 (registry init)
    from reverse_etl_homebrew_spark.operators.vectorized import (
        heavy_hitters_exact,
        misra_gries_candidates,
    )
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    spark = get_spark("tenx-heavy-hitters")
    ev = load_table(spark, sf_dir, "events")
    k = 100

    print("loadavg_start", [round(x, 2) for x in os.getloadavg()])
    results = {}
    for copies in (1, 10):
        items = item_stream(ev, copies)
        n_rows = items.count()
        n_distinct = items.distinct().count()
        cands = misra_gries_candidates(items, "item", k).distinct().count()
        hh = heavy_hitters_exact(items, "item", k)
        out_rows = hh.count()
        wall = timed(lambda: heavy_hitters_exact(item_stream(ev, copies), "item", k))
        results[copies] = wall
        print(
            f"copies={copies} rows={n_rows} distinct={n_distinct} "
            f"candidates={cands} hitters={out_rows} wall={wall}s"
        )
    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])
    print(f"scaling: {results[10] / results[1]:.2f}x wall at 10x rows + ~10x vocabulary")


if __name__ == "__main__":
    main()
