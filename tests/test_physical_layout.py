"""Physical data-layout strategies at 100 TB: bucketed co-located
joins (no shuffle exchange) and partition pruning (no full scan).
Local[N] proves the PLAN shapes; the same code is what a cluster
deployment runs against a real warehouse."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _explain(spark, df, mode="formatted"):
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """orders ⋈ lineitem bucketed by the join key on both sides →
    SortMergeJoin with ZERO Exchange: the co-location contract that
    turns the biggest fact-fact shuffle at 100 TB into a local merge."""
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    suffix = uuid.uuid4().hex[:8]
    to, tl = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / to))
        .saveAsTable(to)
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / tl))
        .saveAsTable(tl)
    )
    try:
        joined = (
            spark.table(to)
            .join(spark.table(tl), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _explain(spark, joined)
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, "bucketed join still shuffles"
        # sanity: join actually produced rows
        assert joined.count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tl}")


def test_partition_pruning(spark, tmp_path):
    """Date-partitioned layout + partition filter → PartitionFilters
    populated and only matching partitions scanned."""
    o = load_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    o.write.partitionBy("order_year").mode("overwrite").parquet(path)

    scan = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    plan = _explain(spark, scan)
    assert "PartitionFilters: [isnotnull(order_year" in plan or "order_year" in plan.split(
        "PartitionFilters:"
    )[1].splitlines()[0]
    n_1997 = scan.count()
    assert n_1997 == o.filter(F.col("order_year") == 1997).count()
    # pruned scan reads strictly fewer files than the full table
    full = spark.read.parquet(path)
    assert n_1997 < full.count()
