#!/usr/bin/env python
"""Skewed-key scale probe for the span/dedup family (r12, the judge's
#3): every 10x fixture so far preserves per-key frequencies by
construction (copy-prefixing), so per-key fan-in stays flat — but real
corpora have a Zipf head: one boilerplate window in 30% of docs, one
hot gram flooding the containment postings, one mega-cluster in
fuzzy-dedup.

This probe plants that head: a fixed {BOILER_TOKENS}-token boilerplate
sentence appended to every doc_id % 10 < 3 (30% of the corpus), which
creates ~{BOILER_TOKENS}-{SPAN_N}+1 identical hot span windows shared
by 30% of docs and a set of word-3-grams with document frequency
0.3·N (far past the containment df_cap of 100).

Measured cells per key: CLEAN corpus vs SKEWED corpus wall (median of
3 after 2 warmups), both at the same row count — the ratio isolates
what the hot keys cost. Adjudication lands in SCALE.md ("Skewed-key
scale" section) with the lever per key:
- span family: hot `win` keys collapse in the PARTIAL (map-side)
  aggregation — the per-window count shuffles one row per distinct
  window regardless of its occurrence count; the join-back is
  duplicated-set-only. Expected near-flat.
- containment-dedup (uncapped): hot grams enter the gram-keyed
  pair join quadratically — this is the documented df-explosion
  shape; the LEVER is the df_cap (containment-dedup-capped), which
  prunes df>100 grams before the join.
- fuzzy-dedup: the boilerplate gram lifts every poisoned pair's
  candidate chance; band verification bounds the damage (verify is
  pair-exact on pruned grams — the boilerplate grams are ALSO pruned
  there by the shared _pruned_grams df_cap).

Usage:
    python fixtures/skew_spans_probe.py [sf_dir]
"""
from __future__ import annotations

import gc
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SPAN_N = 8
BOILER_TOKENS = 16
BOILERPLATE = " ".join(f"boiler{i}" for i in range(BOILER_TOKENS))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

KEYS = [
    "dup-span-detect",
    "dup-span-rate",
    "incremental-dup-spans",
    "containment-dedup",
    "containment-dedup-capped",
    "fuzzy-dedup",
]


def build_skewed_dir(sf_dir: str) -> str:
    out = tempfile.mkdtemp(prefix="sg-skewspan-")
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "documents":
            con.execute(
                f"""COPY (
                  SELECT doc_id,
                         CASE WHEN doc_id % 10 < 3
                              THEN text || ' ' || ?
                              ELSE text END AS text,
                         lang, source, n_chars
                  FROM read_parquet('{src}')
                ) TO '{dst}' (FORMAT PARQUET)""",
                [BOILERPLATE],
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
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
    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("skew-spans-probe")
    skewed = build_skewed_dir(sf_dir)
    print("loadavg_start", [round(x, 2) for x in os.getloadavg()])

    for key in KEYS:
        fn = Q.QUERIES[key]
        rows_clean = fn(spark, sf_dir).count()
        wall_clean = timed(lambda: fn(spark, sf_dir))
        rows_skew = fn(spark, skewed).count()
        wall_skew = timed(lambda: fn(spark, skewed))
        ratio = wall_skew / wall_clean if wall_clean else float("inf")
        print(
            f"{key}: clean {wall_clean}s ({rows_clean} rows) -> "
            f"skew30 {wall_skew}s ({rows_skew} rows) = {ratio:.2f}x"
        )
    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])
    spark.stop()


if __name__ == "__main__":
    main()
