#!/usr/bin/env python
"""File-skipping measurement for the zorder-layout SCALE.md row: a
z-ordered layout claims BOTH dimensions' per-file (min, max) ranges
are ~√-tight, so range predicates on EITHER column prune most files —
where a linear sort leaves the secondary column spanning the full
domain in every file (zero pruning).

Method: write lineitem (sf0.1) twice into 16 sorted parquet files —
(a) linear: repartitionByRange + sort on l_partkey alone;
(b) z-order: the same on the 12-bit Morton z of (l_partkey,
l_suppkey) (identical grid/interleave to the zorder-layout query).
Then, for ten disjoint 10%-wide bands on EACH dimension, read every
file's parquet footer stats (pyarrow) and count the files whose
[min, max] interval overlaps the band — the exact test a pruning
scan performs. Also wall-times a Spark filter+agg over each layout
for one suppkey band (row-group pruning happens in the parquet
reader; 2 discarded warmups, median of 3). Usage:
    python fixtures/ab_zorder_prune.py [sf_dir]
"""
from __future__ import annotations

import gc
import glob
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", "ab_zorder",
)
N_FILES = 16


def write_layouts(spark, sf_dir):
    from reverse_etl_homebrew_spark.queries_misc import (
        _ZBITS,
        _z_interleave_sql,
    )
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    mx = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    )
    g = li.crossJoin(F.broadcast(mx)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.expr(f"(l_partkey * {1 << _ZBITS}) div (mp + 1)").alias("gx"),
        F.expr(f"(l_suppkey * {1 << _ZBITS}) div (ms + 1)").alias("gy"),
    )
    z = g.withColumn("z", F.expr(_z_interleave_sql("gx", "gy", _ZBITS, "div")))
    layouts = {
        "linear": z.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .drop("gx", "gy", "z"),
        "zorder": z.repartitionByRange(N_FILES, "z")
        .sortWithinPartitions("z")
        .drop("gx", "gy", "z"),
    }
    for name, df in layouts.items():
        path = os.path.join(BASE, name)
        shutil.rmtree(path, ignore_errors=True)
        df.write.mode("overwrite").parquet(path)
    return {n: os.path.join(BASE, n) for n in layouts}


def file_stats(path, col):
    """Per-file (min, max) of ``col`` from the parquet footers —
    union over row groups, the granule a file-pruning scan tests."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def overlap_fraction(stats, domain_max, n_bands=10):
    """Mean fraction of files a 10%-wide band predicate must read."""
    width = (domain_max + 1) / n_bands
    fracs = []
    for b in range(n_bands):
        lo, hi = b * width, (b + 1) * width - 1
        hit = sum(1 for (mn, mx) in stats if not (mx < lo or mn > hi))
        fracs.append(hit / len(stats))
    return round(statistics.mean(fracs), 3)


def timed_scan(spark, path, reps=3, warm=2):
    def run():
        (
            spark.read.parquet(path)
            .filter((F.col("l_suppkey") >= 40) & (F.col("l_suppkey") <= 49))
            .agg(F.count(F.lit(1)), F.sum("l_partkey"))
            .write.format("noop").mode("overwrite").save()
        )

    for _ in range(warm):
        run()
        gc.collect()
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
        gc.collect()
    return round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import reverse_etl_homebrew_spark.queries  # noqa: F401 (registry init)
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("ab-zorder-prune")
    print("loadavg_start", [round(x, 2) for x in os.getloadavg()])
    paths = write_layouts(spark, sf_dir)

    maxes = {}
    for col in ("l_partkey", "l_suppkey"):
        row = (
            spark.read.parquet(paths["linear"]).agg(F.max(col)).collect()[0]
        )
        maxes[col] = row[0]

    for name, path in paths.items():
        for col in ("l_partkey", "l_suppkey"):
            frac = overlap_fraction(file_stats(path, col), maxes[col])
            print(f"layout={name} band_col={col} files_read_frac={frac}")
    for name, path in paths.items():
        print(f"layout={name} suppkey-band scan wall={timed_scan(spark, path)}s")
    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
