"""External DuckDB-backed Python DataSource: pushdown contract, SQL
compilation, per-file partitioning, and unsupported-filter fallback
(VERDICT r1 #8 / reference fetch_rows main.py:534-549)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    Not,
    StringStartsWith,
)
from pyspark.sql.types import StructType

from reverse_etl_homebrew_spark.sources.duckdb_source import (
    DuckDBParquetReader,
    external_table,
    filter_to_sql,
)

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_sql_compilation():
    assert filter_to_sql(EqualTo(("k",), 5)) == '"k" = 5'
    assert filter_to_sql(GreaterThanOrEqual(("ts",), dt.datetime(1997, 6, 1))) == (
        "\"ts\" >= TIMESTAMP '1997-06-01 00:00:00.000000'"
    )
    assert filter_to_sql(EqualTo(("s",), "o'brien")) == "\"s\" = 'o''brien'"
    assert filter_to_sql(In(("k",), (1, 2))) == '"k" IN (1, 2)'
    assert filter_to_sql(IsNotNull(("k",))) == '"k" IS NOT NULL'
    assert filter_to_sql(StringStartsWith(("s",), "ab")) == "\"s\" LIKE 'ab%'"
    # unsupported: negation and nested columns stay Spark-side
    assert filter_to_sql(Not(EqualTo(("k",), 1))) is None
    assert filter_to_sql(EqualTo(("a", "b"), 1)) is None


def test_reader_accepts_and_rejects_filters(spark):
    schema = StructType.fromDDL("k int, s string")
    r = DuckDBParquetReader(schema, {"path": "/tmp/x.parquet"})
    residual = list(r.pushFilters([EqualTo(("k",), 1), Not(IsNotNull(("s",)))]))
    assert len(residual) == 1 and isinstance(residual[0], Not)
    assert r.pushed_sql == ['"k" = 1']
    assert r.remote_sql("/tmp/x.parquet") == (
        'SELECT "k", "s" FROM read_parquet(\'/tmp/x.parquet\') WHERE "k" = 1'
    )


def test_pushed_predicates_leave_no_spark_filter(spark):
    df = (
        external_table(spark, SF, "orders")
        .filter(F.col("o_orderdate") >= "1997-06-01")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_totalprice")
    )
    plan = _executed(df)
    assert "BatchScan duckdb_parquet" in plan
    # "RuntimeFilters: []" always prints; a residual Filter NODE shows
    # as " Filter <expr>" in the executed plan
    assert " Filter " not in plan, "pushed predicates must not be re-evaluated"


def test_unsupported_predicate_stays_as_spark_filter(spark):
    df = external_table(spark, SF, "orders").filter(
        F.col("o_orderpriority").contains("URGENT")
    )
    plan = _executed(df)
    assert "BatchScan duckdb_parquet" in plan
    assert " Filter " in plan, "non-pushable predicate must remain post-scan"


def test_results_match_native_parquet_scan(spark):
    ext = (
        external_table(spark, SF, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select("o_orderkey", "o_custkey")
    )
    native = (
        spark.read.parquet(os.path.join(SF, "orders.parquet"))
        .filter(F.col("o_totalprice") > 200000)
        .select("o_orderkey", "o_custkey")
    )
    assert sorted(map(tuple, ext.collect())) == sorted(map(tuple, native.collect()))


def test_partition_per_file(spark, tmp_path):
    src = spark.range(100).withColumn("part", F.col("id") % 2)
    for p in (0, 1):
        src.filter(F.col("part") == p).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"f{p}")
        )
    import glob as g
    import shutil

    merged = tmp_path / "merged"
    merged.mkdir()
    for i, f in enumerate(sorted(g.glob(str(tmp_path / "f*" / "*.parquet")))):
        shutil.copy(f, merged / f"part-{i}.parquet")

    from reverse_etl_homebrew_spark.sources.duckdb_source import register

    register(spark)
    df = (
        spark.read.format("duckdb_parquet")
        .option("path", str(merged / "*.parquet"))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 100


# --- external writer: v2 two-phase commit over an external engine ----------

def test_external_write_roundtrip(spark, tmp_path):
    from reverse_etl_homebrew_spark.sources.duckdb_source import register

    register(spark)
    target = str(tmp_path / "out")
    src = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.concat(F.lit("s"), F.col("id")).alias("s")
    )
    src.repartition(4).write.format("duckdb_parquet").option("path", target).mode("append").save()

    back = spark.read.format("duckdb_parquet").option("path", target + "/*.parquet").load()
    assert back.count() == 1000
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # no staging residue
    import glob as g
    assert not g.glob(str(tmp_path / ".out.staging-*"))


def test_external_write_overwrite_replaces(spark, tmp_path):
    from reverse_etl_homebrew_spark.sources.duckdb_source import register

    register(spark)
    target = str(tmp_path / "out")
    spark.range(10).write.format("duckdb_parquet").option("path", target).mode("append").save()
    spark.range(5).write.format("duckdb_parquet").option("path", target).mode(
        "overwrite"
    ).save()
    back = spark.read.format("duckdb_parquet").option("path", target + "/*.parquet").load()
    assert back.count() == 5


def test_external_write_abort_leaves_no_partial_output(spark, tmp_path):
    """A failing task must abort the job with the target untouched and
    staging cleaned — the commit protocol's whole point."""
    from reverse_etl_homebrew_spark.sources.duckdb_source import register

    register(spark)
    target = str(tmp_path / "out")
    poisoned = spark.range(100).select(
        F.expr("assert_true(id < 90, 'poisoned row')"), F.col("id")
    )
    with pytest.raises(Exception):
        poisoned.repartition(4).write.format("duckdb_parquet").option(
            "path", target
        ).mode("append").save()
    import glob as g
    assert not g.glob(target + "/*.parquet"), "no partial files may be visible"
    assert not g.glob(str(tmp_path / ".out.staging-*")), "staging must be cleaned"


# --- column-projection pushdown (VERDICT r2 #2) -----------------------------

def test_columns_option_prunes_remote_select(spark):
    """The remote SQL must name ONLY the consumed columns — the 'columns'
    option is the projection-pushdown path the Python DS API lacks."""
    df = external_table(spark, SF, "customer", columns=["c_custkey", "c_name"])
    assert df.columns == ["c_custkey", "c_name"]
    plan = _executed(df)
    assert "BatchScan duckdb_parquet[c_custkey" in plan
    assert "c_acctbal" not in plan

    # and the compiled remote SQL itself is pruned
    from reverse_etl_homebrew_spark.sources.duckdb_source import (
        DuckDBParquetDataSource,
    )

    path = os.path.join(SF, "customer.parquet")
    ds = DuckDBParquetDataSource({"path": path, "columns": "c_custkey,c_name"})
    r = DuckDBParquetReader(ds.schema(), {"path": path})
    sql = r.remote_sql(path)
    assert '"c_custkey", "c_name"' in sql
    assert "c_acctbal" not in sql and "*" not in sql


def test_columns_option_values_match_native(spark):
    ext = external_table(
        spark, SF, "orders", columns=["o_orderkey", "o_totalprice"]
    ).filter(F.col("o_totalprice") > 200000)
    native = (
        spark.read.parquet(os.path.join(SF, "orders.parquet"))
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_totalprice") > 200000)
    )
    assert sorted(map(tuple, ext.collect())) == sorted(map(tuple, native.collect()))


def test_unknown_column_raises(spark):
    from reverse_etl_homebrew_spark.sources.duckdb_source import (
        DuckDBParquetDataSource,
    )

    ds = DuckDBParquetDataSource(
        {"path": os.path.join(SF, "customer.parquet"), "columns": "c_custkey,nope"}
    )
    with pytest.raises(ValueError, match="nope"):
        ds.schema()


# --- remote-SQL safety (ADVICE r2) ------------------------------------------

def test_tz_aware_datetime_not_pushed():
    """A tz-aware instant formatted as wall-clock encodes the wrong moment
    remotely and the pushed filter is gone Spark-side — must refuse."""
    from pyspark.sql.datasource import GreaterThanOrEqual

    aware = dt.datetime(1997, 6, 1, tzinfo=dt.timezone.utc)
    assert filter_to_sql(GreaterThanOrEqual(("ts",), aware)) is None
    naive = dt.datetime(1997, 6, 1)
    assert filter_to_sql(GreaterThanOrEqual(("ts",), naive)) is not None


def test_path_with_quote_is_escaped(spark, tmp_path):
    qdir = tmp_path / "o'brien"
    qdir.mkdir()
    src = os.path.join(SF, "region.parquet")
    import shutil

    shutil.copy(src, qdir / "region.parquet")
    from reverse_etl_homebrew_spark.sources.duckdb_source import register

    register(spark)
    df = (
        spark.read.format("duckdb_parquet")
        .option("path", str(qdir / "region.parquet"))
        .load()
    )
    assert df.count() == 5


def test_empty_glob_raises_filenotfound(spark):
    from reverse_etl_homebrew_spark.sources.duckdb_source import (
        DuckDBParquetDataSource,
    )

    ds = DuckDBParquetDataSource({"path": "/tmp/does-not-exist-*.parquet"})
    with pytest.raises(FileNotFoundError):
        ds.schema()


def test_overwrite_leaves_no_backup_residue(spark, tmp_path):
    """Overwrite displaces old files to a .bak dir during promotion
    (crash-safe window) and cleans it up on success."""
    from reverse_etl_homebrew_spark.sources.duckdb_source import register

    register(spark)
    target = str(tmp_path / "out")
    spark.range(10).write.format("duckdb_parquet").option("path", target).mode("append").save()
    spark.range(7).write.format("duckdb_parquet").option("path", target).mode("overwrite").save()
    back = spark.read.format("duckdb_parquet").option("path", target + "/*.parquet").load()
    assert back.count() == 7
    import glob as g

    assert not g.glob(target + "/.bak-*"), "backup dir must be cleaned on success"


def test_like_metachars_and_nonfinite_stay_spark_side(spark):
    """Prefixes containing LIKE metacharacters and non-finite float
    literals must NOT be pushed (they would change semantics / break
    the remote SQL) — they stay as Spark-side filters."""
    from pyspark.sql.datasource import GreaterThan

    assert filter_to_sql(StringStartsWith(("s",), "a_b")) is None
    assert filter_to_sql(StringStartsWith(("s",), "50%")) is None
    assert filter_to_sql(GreaterThan(("v",), float("nan"))) is None
    assert filter_to_sql(GreaterThan(("v",), float("inf"))) is None

    df = external_table(spark, SF, "customer").filter(
        F.col("c_name").startswith("Customer#0000001")
    )
    native = spark.read.parquet(os.path.join(SF, "customer.parquet")).filter(
        F.col("c_name").startswith("Customer#0000001")
    )
    assert df.count() == native.count() > 0


def test_watermark_stream_reader_incremental(spark, tmp_path):
    """The streaming face of the external source: offset = high
    watermark. New files with later updated_col values arrive as new
    micro-batch rows; rows at or below a committed watermark are not
    re-read (the reference's incremental-read semantics, natively
    checkpointed by Spark)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from reverse_etl_homebrew_spark.sources.duckdb_source import register

    register(spark)
    src = tmp_path / "remote"
    src.mkdir()

    def write_file(name, ids, base_day):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "updated_at": pa.array(
                        [
                            dt.datetime(2024, 1, base_day, 12, 0, k)
                            for k in range(len(ids))
                        ],
                        pa.timestamp("us"),
                    ),
                }
            ),
            str(src / name),
        )

    write_file("f1.parquet", [1, 2, 3], base_day=1)

    stream = (
        spark.readStream.format("duckdb_parquet")
        .option("path", str(src / "*.parquet"))
        .option("updated_col", "updated_at")
        .load()
    )
    import uuid

    name = f"wmstream_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["id"] for r in spark.sql(f"SELECT id FROM {name}").collect()}
        assert got == {1, 2, 3}

        # later watermark → picked up; duplicate of id 2 with an OLD
        # timestamp → correctly skipped (watermark-read semantics)
        write_file("f2.parquet", [4, 5], base_day=2)
        q.processAllAvailable()
        got = sorted(r["id"] for r in spark.sql(f"SELECT id FROM {name}").collect())
        assert got == [1, 2, 3, 4, 5]
    finally:
        q.stop()


def test_watermark_stream_reader_restart_resumes_offset(spark, tmp_path):
    """Kill-and-restart recovery: a NEW query instance over the SAME
    checkpointLocation resumes from the committed watermark offset and
    does not re-emit rows the dead query already delivered — the
    property that lets Spark's checkpoint replace the reference's
    hand-rolled run ledger (main.py:330-345 read, 838 advance). Uses
    the exactly-once parquet file sink (the memory sink refuses
    checkpoint recovery), so the output dir after restart is also the
    end-to-end exactly-once witness: no duplicates, no gaps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from reverse_etl_homebrew_spark.sources.duckdb_source import register

    register(spark)
    src = tmp_path / "remote"
    src.mkdir()

    def write_file(name, ids, base_day):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "updated_at": pa.array(
                        [
                            dt.datetime(2024, 2, base_day, 9, 0, k)
                            for k in range(len(ids))
                        ],
                        pa.timestamp("us"),
                    ),
                }
            ),
            str(src / name),
        )

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start_query():
        stream = (
            spark.readStream.format("duckdb_parquet")
            .option("path", str(src / "*.parquet"))
            .option("updated_col", "updated_at")
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    def sink_ids():
        return sorted(r["id"] for r in spark.read.parquet(out).collect())

    write_file("f1.parquet", [1, 2, 3], base_day=1)
    q1 = start_query()
    try:
        q1.processAllAvailable()
        assert sink_ids() == [1, 2, 3]
    finally:
        q1.stop()  # simulated crash/shutdown after the commit

    # new data lands while no query is running
    write_file("f2.parquet", [4, 5], base_day=2)

    # restart: fresh query instance, same checkpoint. Ids 1-3 appearing
    # twice in the sink would mean the committed offset was not resumed.
    q2 = start_query()
    try:
        q2.processAllAvailable()
        assert sink_ids() == [1, 2, 3, 4, 5], "restart re-emitted or dropped rows"

        # and the resumed query keeps advancing normally
        write_file("f3.parquet", [6], base_day=3)
        q2.processAllAvailable()
        assert sink_ids() == [1, 2, 3, 4, 5, 6]
    finally:
        q2.stop()
