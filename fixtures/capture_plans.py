#!/usr/bin/env python
"""Capture .explain('formatted') for every bench query into
plans/<round>/<query>_<tag>.txt (optimization-round evidence: the
judge checks plan claims against these files).

Usage: python fixtures/capture_plans.py <tag> [query ...]
  tag    = e.g. 'before' / 'after'
  query  = optional subset; default is every bench query
           (HEADLINE + HEAVY_ADDITIONS).
  round  = $SPARK_GRAFT_PLAN_ROUND (default 'r15').
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    subset = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    import bench
    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("capture-plans")
    names = subset or [
        n for n in bench.HEADLINE + bench.HEAVY_ADDITIONS if n in Q.QUERIES
    ]
    for name in names:
        df = Q.QUERIES[name](spark, sf_dir)
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name.replace('/', '_')}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('ArrowEvalPython')} ArrowEval, "
              f"{plan.count('BatchEvalPython')} BatchEval -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
