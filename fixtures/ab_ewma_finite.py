#!/usr/bin/env python
"""Interleaved A/B for ewma-smooth (VERDICT r12 #7): the one key the
judge's idle r12 bench read above 1.05x (1.09x vs its r11 ledger row,
also the r11 rotation's slip key). Question: did the r11 non-finite
scoping (isNotNull → is_finite filter + finite_dec term cast,
commit f5d280d) cost real time, or is 1.09x host noise on a
sub-2-second key?

Method: A = the CURRENT registered query; B = the r10 plan
reconstructed verbatim (isNotNull filter + plain decimal cast —
byte-for-byte the pre-f5d280d form). Interleaved A/B/A/B... on an
idle host, 4 discarded warmups per arm, medians of 5, noop sink.

r13 first-run verdict (recorded in SCALE.md): see the SCALE.md ledger
line — the conclusion belongs there, this fixture is the method.
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
    from pyspark.sql import Window as W, functions as F

    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.queries_events import (
        _EWMA_COEFFS,
        _EWMA_DEPTH,
    )
    from reverse_etl_homebrew_spark.functions.exactmath import (
        guard_dec_units,
        round6_dec6_over_int,
    )
    from reverse_etl_homebrew_spark.session import get_spark
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    load0 = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark("ab-ewma-finite")

    def r10_plan():
        # pre-f5d280d form: isNotNull scope, plain decimal term cast
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull() & F.col("ts").isNotNull()
        )
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        v = ev.select(
            "user_id", "event_id", "ts", "value",
            F.row_number().over(w).alias("rn"),
        )
        a, b = v.alias("a"), v.alias("b")
        k = (F.col("a.rn") - F.col("b.rn")).cast("int")
        coeff = F.element_at(
            F.array(*[F.lit(c).cast("long") for c in _EWMA_COEFFS]),
            k + F.lit(1),
        )
        terms = a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.rn") >= F.col("a.rn") - (_EWMA_DEPTH - 1))
            & (F.col("b.rn") <= F.col("a.rn")),
        ).select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("event_id"),
            F.col("a.ts").alias("ts"),
            (F.col("b.value").cast("decimal(38,6)") * coeff).alias("wx"),
            coeff.alias("w"),
        )
        g = terms.groupBy("user_id", "event_id", "ts").agg(
            F.sum("wx").alias("swx"), F.sum("w").alias("sw")
        )
        return g.select(
            "user_id", "event_id", "ts",
            round6_dec6_over_int(
                guard_dec_units("swx", 1_000_000, "sw"), "sw"
            ).alias("ewma"),
        )

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    current = lambda: Q.QUERIES["ewma-smooth"](spark, sf_dir)
    for _ in range(4):
        run(current()); run(r10_plan())
    a_samples, b_samples = [], []
    for _ in range(5):
        gc.collect()
        a_samples.append(run(current()))
        b_samples.append(run(r10_plan()))
    print(
        {
            "query": "ewma-smooth A/B (current vs r10 plan)",
            "sf_dir": sf_dir,
            "a_current_samples": [round(x, 3) for x in a_samples],
            "b_r10_samples": [round(x, 3) for x in b_samples],
            "a_median": round(statistics.median(a_samples), 3),
            "b_median": round(statistics.median(b_samples), 3),
            "ratio_a_over_b": round(
                statistics.median(a_samples) / statistics.median(b_samples), 3
            ),
            "loadavg_start": load0,
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
