"""SQLite external connector (sources/sqlite_source.py): schema from
declared affinities, JDBC-style rowid-range partitioning, predicate
pushdown (with the temporal refusal), and column pruning."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.sources import sqlite_source as SS


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "warehouse.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE patients (pid INTEGER, name TEXT, score REAL, payload BLOB)"
    )
    rows = [
        (i, f"name-{i}", i * 0.5 if i % 7 else None, bytes([i % 256]))
        for i in range(1, 1001)
    ]
    con.executemany("INSERT INTO patients VALUES (?,?,?,?)", rows)
    con.commit()
    con.close()
    return path


def _read(spark, path, **opts):
    SS.register(spark)
    r = spark.read.format("sqlite_table").option("path", path).option(
        "table", "patients"
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_roundtrip_and_schema(spark, db):
    df = _read(spark, db)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "double", "binary",
    ]
    assert df.count() == 1000
    got = {r["pid"]: r for r in df.collect()}
    assert got[3]["name"] == "name-3" and got[3]["score"] == 1.5
    assert got[7]["score"] is None
    assert got[255]["payload"] == bytes([255])


def test_range_partitioning(spark, db):
    df = _read(spark, db, numpartitions="5")
    assert df.rdd.getNumPartitions() == 5
    # No row lost or duplicated at the range seams.
    assert df.count() == 1000
    assert df.select("pid").distinct().count() == 1000


def test_pushdown_removes_spark_side_filter(spark, db):
    df = _read(spark, db).filter(F.col("pid") <= 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The predicate was accepted by pushFilters, so no Filter NODE
    # survives in the Spark plan — the WHERE ran remotely. (The plan
    # string always mentions "RuntimeFilters: []", hence the spaced
    # match on the operator name.)
    assert " Filter " not in plan, plan
    assert df.count() == 10


def test_unsupported_filter_stays_spark_side(spark, db):
    # endswith has no pushdown compilation — it must stay in the plan
    # as a Spark-side Filter node AND produce correct results.
    df = _read(spark, db).filter(F.col("name").endswith("-42"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert " Filter " in plan, plan
    assert {r["pid"] for r in df.collect()} == {42}


def test_column_pruning_option(spark, db):
    df = _read(spark, db, columns="pid,score")
    assert df.columns == ["pid", "score"]
    assert df.count() == 1000


def test_startswith_pushdown_is_case_sensitive(spark, db):
    # SQLite LIKE is case-insensitive for ASCII, so startswith must
    # NOT compile to LIKE: with mixed-case rows present, a pushed
    # 'Name-' prefix filter has to return zero rows, exactly like
    # Spark's case-sensitive startswith would.
    con = sqlite3.connect(db)
    con.execute("INSERT INTO patients VALUES (2001, 'Name-2001', 1.0, x'00')")
    con.commit()
    con.close()
    upper = _read(spark, db).filter(F.col("name").startswith("Name-"))
    plan = upper._jdf.queryExecution().executedPlan().toString()
    assert " Filter " not in plan, plan  # pushed, not re-checked by Spark
    assert {r["pid"] for r in upper.collect()} == {2001}
    lower = _read(spark, db).filter(F.col("name").startswith("name-1"))
    got = {r["pid"] for r in lower.collect()}
    assert 2001 not in got
    assert 1 in got and 1000 in got


def test_user_partition_column_keeps_nulls_and_unbounded_ends(spark, db):
    # JDBC partitionColumn semantics: NULL partition-column rows land
    # in the (NULL-inclusive) first slice, and values outside the
    # planning-time [min, max] are still read via the unbounded ends.
    con = sqlite3.connect(db)
    con.execute("INSERT INTO patients VALUES (NULL, 'null-pid', 9.9, x'00')")
    con.commit()
    con.close()
    df = _read(spark, db, partitioncolumn="pid", numpartitions="4")
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1001
    assert df.filter(F.col("pid").isNull()).count() == 1
    assert df.select("name").filter(F.col("name") == "null-pid").count() == 1


def test_staged_parquet_scan_pushes_filters(spark):
    # The driver-facing sqlite-scan-pushdown key: stage a testdata
    # parquet table into SQLite, read through the range reader, and
    # verify both predicates ran remotely (no Spark-side Filter node).
    from reverse_etl_homebrew_spark.queries import QUERIES

    df = QUERIES["sqlite-scan-pushdown"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert " Filter " not in plan, plan
    rows = df.collect()
    assert rows
    assert all(
        r["c_mktsegment"] == "BUILDING" and r["c_acctbal"] > 1000.0 for r in rows
    )


def test_empty_table(spark, tmp_path):
    path = str(tmp_path / "empty.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE patients (pid INTEGER, name TEXT)")
    con.commit()
    con.close()
    assert _read(spark, path).count() == 0
