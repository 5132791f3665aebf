#!/usr/bin/env python
"""History-independence measurement for the incremental-agg-merge
SCALE.md row: the IVM merge claims cost O(delta + touched groups),
INDEPENDENT of history size — a full recompute pays the whole history
every batch, the merge pays only the delta plus a read of the stored
state (whose row count is the GROUP space, not the history).

Construction (deterministic, from the sf orders table):

- history(c): the pre-cutoff orders replicated c times (orderkeys
  offset per copy; the o_custkey group space stays FIXED, which is
  the realistic shape — history grows in rows, not in entities).
- delta: the post-cutoff orders, identical in every cell.
- state(c): rollup_partial(history(c)) materialized to parquet once,
  untimed — in production this is the stored rollup table.

Cells: full-recompute(history ∪ delta) vs merge(stored-state, delta)
at c=1 and c=10. Expected: recompute tracks history ~linearly; merge
stays ~flat because its inputs (delta rows + group-space state rows)
do not grow. Method: alone on an idle host, 2 warmups discarded per
cell, median of 3, loadavg recorded. Usage:
    python fixtures/tenx_ivm_merge.py [sf_dir]
"""
from __future__ import annotations

import gc
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CUTOFF = "2000-01-01 00:00:00"
STATE_BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", "ab_ivm_state",
)


def history(o, copies: int):
    pre = o.filter(F.col("o_orderdate") < F.lit(CUTOFF))
    parts = [
        pre.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(c * 10_000_000)
        )
        for c in range(copies)
    ]
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
    from reverse_etl_homebrew_spark.operators.merge import (
        merge_rollup_state,
        rollup_partial,
    )
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    spark = get_spark("tenx-ivm-merge")
    o = load_table(spark, sf_dir, "orders")
    delta = o.filter(F.col("o_orderdate") >= F.lit(CUTOFF))
    d_rows = delta.count()

    print("loadavg_start", [round(x, 2) for x in os.getloadavg()])
    recompute, merge = {}, {}
    for copies in (1, 10):
        hist = history(o, copies)
        h_rows = hist.count()
        state_path = f"{STATE_BASE}_{copies}"
        shutil.rmtree(state_path, ignore_errors=True)
        # untimed: the stored rollup table a maintenance job reads
        rollup_partial(hist, "o_custkey", "o_totalprice", "o_orderdate") \
            .write.mode("overwrite").parquet(state_path)
        state_rows = spark.read.parquet(state_path).count()

        recompute[copies] = timed(
            lambda: rollup_partial(
                history(o, copies).unionByName(delta),
                "o_custkey", "o_totalprice", "o_orderdate",
            )
        )
        merge[copies] = timed(
            lambda: merge_rollup_state(
                spark.read.parquet(state_path),
                rollup_partial(
                    delta, "o_custkey", "o_totalprice", "o_orderdate"
                ),
                "o_custkey",
            )
        )
        print(
            f"copies={copies} history_rows={h_rows} delta_rows={d_rows} "
            f"state_rows={state_rows} recompute={recompute[copies]}s "
            f"merge={merge[copies]}s"
        )
    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])
    print(
        f"scaling at 10x history: recompute "
        f"{recompute[10] / recompute[1]:.2f}x, merge "
        f"{merge[10] / merge[1]:.2f}x (flat == history-independent)"
    )


if __name__ == "__main__":
    main()
