#!/usr/bin/env python
"""Ad-hoc single-key Spark-vs-DuckDB row diff over an arbitrary data
dir (typically a poisoned copy from null_robustness_probe). Prints the
rows each engine has that the other lacks, capped.

Usage: python fixtures/probe_diff.py <data_dir> <key> [cap]
"""
from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> None:
    data_dir, key = sys.argv[1], sys.argv[2]
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from test_oracle_parity import _duck

    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("probe-diff")
    duck = _duck(data_dir)

    sdf = Q.QUERIES[key](spark, data_dir)
    s_cols = sdf.columns
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_rows = Counter(
        tuple(str(t[i]) for i in order) for t in (tuple(r) for r in sdf.collect())
    )
    cur = duck.execute(Q.ORACLE[key])
    d_cols = [c[0] for c in cur.description]
    dorder = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    d_rows = Counter(tuple(str(t[i]) for i in dorder) for t in cur.fetchall())

    print(f"spark cols: {sorted(s_cols)}  rows={sum(s_rows.values())}")
    print(f"duck  cols: {sorted(d_cols)}  rows={sum(d_rows.values())}")
    only_s = list((s_rows - d_rows).items())[:cap]
    only_d = list((d_rows - s_rows).items())[:cap]
    print(f"-- spark-only ({sum((s_rows - d_rows).values())} total) --")
    for r, c in only_s:
        print(" ", r, f"x{c}" if c > 1 else "")
    print(f"-- duck-only ({sum((d_rows - s_rows).values())} total) --")
    for r, c in only_d:
        print(" ", r, f"x{c}" if c > 1 else "")
    spark.stop()


if __name__ == "__main__":
    main()
