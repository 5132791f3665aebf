"""File-ingest tier (sources/files.py): JSONL/CSV corrupt-record DLQ
routing, partitioned writes with bounded file counts, and small-file
compaction."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from reverse_etl_homebrew_spark.sources import files as FS

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("name", StringType(), True),
    ]
)


def test_jsonl_good_and_dlq_split(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        "this is not json\n"
        '{"id": 2, "name": "b"}\n'
        '{"id": "not-an-int", "name": "c"}\n'
    )
    good, dlq = FS.read_jsonl(spark, str(p), SCHEMA)
    good_rows = {(r["id"], r["name"]) for r in good.collect()}
    dlq_rows = dlq.collect()

    assert (1, "a") in good_rows and (2, "b") in good_rows
    # Both the unparseable line and the type-mismatch line are captured
    # losslessly — nothing silently dropped.
    raws = [r["raw_record"] for r in dlq_rows]
    assert any("not json" in raw for raw in raws)
    assert any("not-an-int" in raw for raw in raws)
    assert all(r["reason"] == "parse_error" for r in dlq_rows)
    assert all(r["source"] == str(p) for r in dlq_rows)
    # Ingest is lossless: every input line is exactly one good or DLQ row.
    assert good.count() + len(dlq_rows) == 4


def test_csv_good_and_dlq_split(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text("id,name\n1,a\nnot-an-int,b\n2,c\n")
    good, dlq = FS.read_csv(spark, str(p), SCHEMA)
    assert {(r["id"], r["name"]) for r in good.collect()} == {(1, "a"), (2, "c")}
    [bad] = dlq.collect()
    assert "not-an-int" in bad["raw_record"]


def test_jsonl_empty_dlq_when_clean(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text('{"id": 1, "name": "a"}\n')
    good, dlq = FS.read_jsonl(spark, str(p), SCHEMA)
    assert good.count() == 1
    assert dlq.count() == 0


def test_write_partitioned_bounds_file_count(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"),
        F.concat(F.lit("p"), F.col("id") % 4).alias("part"),
    )
    out = str(tmp_path / "table")
    FS.write_partitioned(df, out, ["part"])
    for d in glob.glob(os.path.join(out, "part=*")):
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, f"{d}: {len(files)} files (expected 1)"
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert set(back.select("part").distinct().toPandas()["part"]) == {
        "p0", "p1", "p2", "p3",
    }


def test_write_partitioned_salted_spread(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), F.lit("hot").alias("part")
    )
    out = str(tmp_path / "skewed")
    FS.write_partitioned(df, out, ["part"], files_per_partition=4)
    files = glob.glob(os.path.join(out, "part=hot", "*.parquet"))
    assert 2 <= len(files) <= 4
    assert spark.read.parquet(out).count() == 1000


def test_compact_small_files(spark, tmp_path):
    out = str(tmp_path / "fragged")
    # 64 tiny files.
    spark.range(10_000).repartition(64).write.parquet(out)
    assert len(glob.glob(os.path.join(out, "*.parquet"))) == 64
    n = FS.compact_small_files(spark, out, target_file_bytes=10**9)
    assert n == 1
    assert len(glob.glob(os.path.join(out, "*.parquet"))) == 1
    assert spark.read.parquet(out).count() == 10_000


def test_compact_preserves_hive_partitioning(spark, tmp_path):
    # Compacting the layout write_partitioned produces must keep the
    # key=value directory structure (and report files recursively),
    # not silently flatten the table.
    out = str(tmp_path / "ptable")
    df = spark.range(2000).select(
        F.col("id"), F.concat(F.lit("p"), F.col("id") % 3).alias("part")
    )
    df.repartition(16).write.partitionBy("part").parquet(out)
    assert len(glob.glob(os.path.join(out, "part=*/*.parquet"))) > 3
    n = FS.compact_small_files(spark, out, target_file_bytes=10**9)
    dirs = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(out, "part=*"))
    )
    assert dirs == ["part=p0", "part=p1", "part=p2"]
    files = glob.glob(os.path.join(out, "part=*/*.parquet"))
    assert n == len(files) == 3
    back = spark.read.parquet(out)
    assert back.count() == 2000
    assert set(r["part"] for r in back.select("part").distinct().collect()) == {
        "p0", "p1", "p2",
    }


def test_compact_preserves_partition_values_verbatim(spark, tmp_path):
    # Zero-padded string partition values (part=01) must survive
    # compaction byte-for-byte: with partition-column type inference
    # on, the read re-parses "01" as int 1 and the rewrite renames the
    # directory to part=1 with a changed column type — a silent
    # layout/schema change for externally-written tables.
    out = str(tmp_path / "padded")
    df = spark.range(300).select(
        F.col("id"),
        F.lpad((F.col("id") % 3).cast("string"), 2, "0").alias("part"),
    )
    df.repartition(8).write.partitionBy("part").parquet(out)
    FS.compact_small_files(spark, out, target_file_bytes=10**9)
    dirs = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(out, "part=*"))
    )
    assert dirs == ["part=00", "part=01", "part=02"]
    # and the session conf the fix toggles is restored afterward
    assert (
        spark.conf.get(
            "spark.sql.sources.partitionColumnTypeInference.enabled"
        )
        == "true"
    )


def test_salted_write_deterministic_under_reshuffle(spark, tmp_path):
    # The salt must be a pure function of row content (xxhash64), so
    # writing the same rows arriving through different upstream
    # partitionings produces identical row→file-count routing and no
    # loss/duplication — the retry-safety property behind SPARK-23207.
    base = spark.range(1000).select(
        F.col("id"), F.lit("hot").alias("part")
    )
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    FS.write_partitioned(base.repartition(3), out_a, ["part"], files_per_partition=4)
    FS.write_partitioned(base.repartition(17), out_b, ["part"], files_per_partition=4)
    a = spark.read.parquet(out_a)
    b = spark.read.parquet(out_b)
    assert a.count() == b.count() == 1000
    assert a.select("id").distinct().count() == 1000
    assert b.select("id").distinct().count() == 1000
