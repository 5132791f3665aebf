"""Eighth poison class: FILE-level ingest poison.

The row-level taxonomy (NULLs, re-delivery, non-finite, encoding,
drift, disorder) assumed every parquet FILE is readable. Real landing
zones also contain zero-row files (empty producer flushes), stray
_SUCCESS / hidden markers, and truncated or garbage files from
interrupted uploads. The policy pinned here:

- ZERO-ROW parquet files are benign everywhere (batch and stream):
  schema-correct no-ops, never a crash, never a phantom row.
- HIDDEN / underscore marker files are invisible to every reader
  (Spark's file index convention — and the streaming reader's
  pathGlobFilter keeps non-parquet droppings out too).
- A CORRUPT parquet file is a LOUD, named failure — never a silent
  skip. `spark.sql.files.ignoreCorruptFiles` stays at its false
  default: silently dropping an entire file of rows is the
  worst-case silent-wrong-answer (the media tier DLQs corrupt
  PAYLOADS per row because the row is still addressable; a corrupt
  FILE has no rows to route, so the only honest outcome is failure
  that names the file).
- The JSONL text ingest is the designed corruption route: file-level
  garbage arrives as unparseable LINES and lands in the DLQ with
  provenance, so a binary dropping in a text landing zone degrades
  to DLQ rows, not data loss.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F, types as T


def _write_rows(spark, path, rows, schema="k long, v string"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_zero_row_parquet_file_is_benign_in_batch_and_stream(spark, tmp_path):
    d = str(tmp_path / "in")
    _write_rows(spark, d, [(1, "a"), (2, "b")])
    _write_rows(spark, d, [])  # zero-row producer flush

    batch = spark.read.parquet(d)
    assert batch.count() == 2

    out = str(tmp_path / "out")
    q = (
        spark.readStream.schema(batch.schema)
        .parquet(d)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2


def test_marker_and_hidden_files_are_invisible(spark, tmp_path):
    d = str(tmp_path / "in")
    _write_rows(spark, d, [(1, "a")])
    # droppings a real landing zone accumulates
    for name in ("_SUCCESS", "_committed_1", ".hidden.parquet.crc", ".DS_Store"):
        with open(os.path.join(d, name), "wb") as f:
            f.write(b"not parquet at all")
    assert spark.read.parquet(d).count() == 1


def test_corrupt_parquet_file_fails_loudly_not_silently(spark, tmp_path):
    """A garbage .parquet file must kill the read with a named error —
    under the false-default ignoreCorruptFiles, never a silent skip of
    a whole file of rows."""
    d = str(tmp_path / "in")
    _write_rows(spark, d, [(1, "a"), (2, "b")])
    with open(os.path.join(d, "999.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a parquet footer" * 40)

    assert spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "false"
    with pytest.raises(Exception) as exc:
        spark.read.parquet(d).count()
    msg = str(exc.value)
    assert "999.parquet" in msg or "Parquet" in msg or "footer" in msg.lower()


def test_truncated_parquet_file_fails_loudly(spark, tmp_path):
    """Truncation (interrupted upload) — a structurally plausible
    prefix of a real file — must also fail loudly."""
    d = str(tmp_path / "in")
    _write_rows(spark, d, [(i, "x" * 50) for i in range(500)])
    part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
    src = os.path.join(d, part)
    data = open(src, "rb").read()
    with open(os.path.join(d, "998.parquet"), "wb") as f:
        f.write(data[: len(data) // 2])

    with pytest.raises(Exception):
        spark.read.parquet(d).count()


def test_binary_dropping_in_text_landing_zone_routes_to_dlq(spark, tmp_path):
    """The JSONL ingest's corruption story holds at file level: a
    binary file in the text landing zone degrades to DLQ rows with
    provenance — zero data loss, zero query failure."""
    from reverse_etl_homebrew_spark.streaming.structured import stream_ingest_jsonl

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "good.jsonl"), "w") as f:
        f.write('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    with open(os.path.join(in_dir, "garbage.jsonl"), "wb") as f:
        f.write(bytes(range(1, 128)) + b"\xc3\x28 not json \xf0")

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    out, dlq = str(tmp_path / "out"), str(tmp_path / "dlq")
    stream_ingest_jsonl(
        spark, in_dir, schema, out, dlq, str(tmp_path / "ckpt")
    )
    good = spark.read.parquet(out)
    bad = spark.read.parquet(dlq)
    assert {(r["k"], r["v"]) for r in good.collect()} == {(1, "a"), (2, "b")}
    assert bad.count() >= 1
    assert all("garbage.jsonl" in r["source"] for r in bad.collect())
