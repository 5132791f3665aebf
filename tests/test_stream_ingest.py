"""Streaming JSONL ingest with DLQ routing
(streaming/structured.stream_ingest_jsonl): drain-incremental
semantics, lossless corrupt-line capture, and exactly-once appends
across restarts via the file sink's transaction log."""

from __future__ import annotations

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from reverse_etl_homebrew_spark.streaming.structured import stream_ingest_jsonl

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("name", StringType(), True),
    ]
)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": tmp_path / "in",
        "out": str(tmp_path / "out"),
        "dlq": str(tmp_path / "dlq"),
        "cp": str(tmp_path / "cp"),
    }
    d["in"].mkdir()
    return d


def _run(spark, dirs):
    stream_ingest_jsonl(
        spark, str(dirs["in"]), SCHEMA, dirs["out"], dirs["dlq"], dirs["cp"]
    )


def test_ingest_splits_good_and_dlq(spark, dirs):
    (dirs["in"] / "drop1.jsonl").write_text(
        '{"id": 1, "name": "a"}\nGARBAGE\n{"id": 2, "name": "b"}\n'
    )
    _run(spark, dirs)
    good = {(r["id"], r["name"]) for r in spark.read.parquet(dirs["out"]).collect()}
    assert good == {(1, "a"), (2, "b")}
    [bad] = spark.read.parquet(dirs["dlq"]).collect()
    assert bad["raw_record"] == "GARBAGE"
    assert bad["reason"] == "parse_error"
    assert bad["source"].endswith("drop1.jsonl")


def test_second_run_drains_only_new_files(spark, dirs):
    (dirs["in"] / "drop1.jsonl").write_text('{"id": 1, "name": "a"}\n')
    _run(spark, dirs)
    # Re-run with NO new input: the checkpoint must prevent re-ingest.
    _run(spark, dirs)
    assert spark.read.parquet(dirs["out"]).count() == 1

    (dirs["in"] / "drop2.jsonl").write_text('{"id": 2, "name": "b"}\nbad\n')
    _run(spark, dirs)
    rows = spark.read.parquet(dirs["out"]).collect()
    assert {(r["id"], r["name"]) for r in rows} == {(1, "a"), (2, "b")}
    assert len(rows) == 2  # drop1 not re-emitted
    assert spark.read.parquet(dirs["dlq"]).count() == 1


def test_type_mismatch_lands_in_dlq_not_as_null(spark, dirs):
    (dirs["in"] / "drop.jsonl").write_text('{"id": "NaN-ish", "name": "x"}\n')
    _run(spark, dirs)
    assert spark.read.parquet(dirs["out"]).count() == 0
    [bad] = spark.read.parquet(dirs["dlq"]).collect()
    assert "NaN-ish" in bad["raw_record"]
