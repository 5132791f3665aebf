"""Semi-structured file ingest (JSONL / CSV) with corrupt-record DLQ
routing, plus partitioned-write and small-file-compaction helpers.

The reference engine ingests only warehouse tables; a training-data
pipeline's raw inputs arrive as JSONL/CSV drops, where *some lines are
garbage* and dropping them silently is unacceptable. The pattern here
mirrors the engine's API-writer DLQ (sinks/control.py): every
malformed input row becomes a dead-letter row carrying the raw line,
so ingest is lossless and auditable.

Spark mechanics worth noting:

- PERMISSIVE mode + ``columnNameOfCorruptRecord`` gives per-row error
  capture without failing the scan (FAILFAST dies on line 1, DROPMALFORMED
  loses data silently — neither is acceptable at 100 TB).
- The parse runs as ``spark.read.text`` + ``from_json``/``from_csv``
  rather than the format readers: Spark's JSON/CSV sources refuse any
  query whose projection touches only the corrupt-record column
  (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the scan
  would skip parsing and lie), which is exactly what a DLQ leg is.
  Parsing as an expression over a text scan has no such restriction,
  keeps the raw line available for free, and still runs JVM-side
  inside whole-stage codegen.
- At 100 TB these readers parallelize per input split exactly like
  parquet scans; nothing runs in Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructField, StructType, StringType

#: Column that receives the raw text of unparseable rows.
CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def _split_good_dlq(
    parsed: DataFrame, schema: StructType, source: str
) -> tuple[DataFrame, DataFrame]:
    """Split a text-scan + parse-expression frame into (good, dlq).

    ``parsed`` must carry the raw line as ``value`` and the parse
    result as struct column ``rec`` (with the corrupt field inside).
    A row is dead-lettered when the parser captured raw text in the
    corrupt field OR produced no struct at all. The DLQ frame mirrors
    the API-writer dead-letter shape: raw payload + reason, keyed by
    source path."""
    data_cols = [f.name for f in schema.fields]
    bad = F.col("rec").isNull() | F.col(f"rec.{CORRUPT_COL}").isNotNull()
    good = parsed.filter(~bad).select(
        *[F.col(f"rec.{c}").alias(c) for c in data_cols]
    )
    dlq = parsed.filter(bad).select(
        F.lit(source).alias("source"),
        F.col("value").alias("raw_record"),
        F.lit("parse_error").alias("reason"),
    )
    return good, dlq


_PARSE_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with lossless corrupt-line routing.

    Returns ``(good, dlq)``: rows matching ``schema``, and a
    dead-letter frame of unparseable lines. Type mismatches null the
    offending field AND capture the raw line (PERMISSIVE semantics),
    so a too-strict schema shows up in the DLQ instead of as silent
    nulls."""
    full = _with_corrupt_field(schema)
    parsed = spark.read.text(path).select(
        "value", F.from_json("value", full, _PARSE_OPTS).alias("rec")
    )
    return _split_good_dlq(parsed, schema, path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV with an explicit schema and corrupt-row DLQ routing.

    Never infer schema in production ingest: inference costs an extra
    full pass and produces drifting types between drops; an explicit
    schema makes bad rows *visible* (they land in the DLQ) instead of
    reshaping the table. The header line (when present) is dropped by
    value — Spark's text source has no per-file "skip first line", so
    ingest filters exact header matches (a data row that byte-equals
    the header is indistinguishable anyway)."""
    full = _with_corrupt_field(schema)
    opts = dict(_PARSE_OPTS, sep=sep)
    txt = spark.read.text(path)
    if header:
        header_line = sep.join(f.name for f in schema.fields)
        txt = txt.filter(F.col("value") != header_line)
    parsed = txt.select(
        "value", F.from_csv("value", full.simpleString(), opts).alias("rec")
    )
    return _split_good_dlq(parsed, schema, path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Write a hive-partitioned parquet layout with bounded file
    counts.

    Hash-repartitioning on the partition columns puts all rows of one
    partition value in one task, so each output directory gets at most
    ``files_per_partition`` files — without it, every one of the N
    shuffle tasks can write a sliver into every partition directory
    (N × partitions small files, the classic layout bug that makes
    downstream scans seek-bound). ``files_per_partition > 1`` salts
    the shuffle key to spread one huge partition value over several
    writers (the skew escape hatch)."""
    if files_per_partition <= 1:
        reparted = df.repartition(*partition_cols)
    else:
        # Row-varying salt (file placement only — never a data column).
        # Trade-off, documented: byte-identical duplicate rows hash to
        # the SAME salt, so a hot partition value dominated by exact
        # duplicates spreads by distinct-row count, not row count —
        # acceptable for file placement (dedup upstream is this repo's
        # whole business), and the price of retry safety below. Also
        # requires xxhash64-hashable column types (no maps).
        # It must be a pure function of ROW CONTENT, not of row order:
        # an order-dependent salt (monotonically_increasing_id) changes
        # value when a fetch failure recomputes an upstream shuffle
        # partition, so retried map tasks would route rows to different
        # reducers — the SPARK-23207 silent loss/duplication class that
        # made Spark sort before round-robin repartition. xxhash64 over
        # every column reproduces identical shuffle keys on any retry.
        # The partition count must be EXPLICIT: AQE otherwise coalesces
        # the salted shuffle's small outputs back into one task,
        # silently undoing the spread.
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition))
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        reparted = df.repartition(n, *[F.col(c) for c in partition_cols] + [salt])
    reparted.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns
    the output file count.

    Small-file proliferation is the dominant degradation mode of
    long-lived ingest tables (every micro-batch appends a sliver; scan
    cost becomes per-file overhead). Compaction = read, coalesce to
    ceil(bytes/target), rewrite. ``coalesce`` (not ``repartition``)
    avoids a shuffle — it only merges read splits. The rewrite stages
    through a temp dir because Spark cannot overwrite a path it is
    reading.

    Hive-partitioned inputs (the layout ``write_partitioned`` in this
    module produces) are detected from the ``key=value`` directory
    chain and re-written with the SAME ``partitionBy``, so compaction
    never flattens a partitioned table; the returned file count is
    recursive either way.

    Partition VALUES are preserved verbatim: the read runs with
    ``spark.sql.sources.partitionColumnTypeInference.enabled=false``,
    because type inference re-parses directory names and rewrites
    zero-padded or date-like string values under a different name and
    type (``part=01`` read as int 1 is rewritten as ``part=1``) — a
    silent layout/schema change for tables this repo did not write.
    Compaction must be a byte-layout operation only."""
    import glob
    import os
    import shutil

    # Detect hive partition columns from one key=value directory chain.
    part_cols: list[str] = []
    level = path
    while True:
        subs = [
            d for d in os.listdir(level)
            if "=" in d and os.path.isdir(os.path.join(level, d))
        ]
        if not subs:
            break
        part_cols.append(subs[0].split("=", 1)[0])
        level = os.path.join(level, subs[0])

    in_bytes = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(path, "**/*.parquet"), recursive=True)
    )
    n_out = max(1, math.ceil(in_bytes / target_file_bytes))
    tmp = path.rstrip("/") + "._compact_tmp"
    # For a partitioned table the coalesce target applies per write
    # task, and partitionBy re-splits by value — each partition
    # directory ends up with at most n_out files, usually 1.
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    infer_prev = spark.conf.get(infer_key, "true")
    spark.conf.set(infer_key, "false")
    try:
        # partition discovery (and with it the conf read) happens
        # eagerly at DataFrame creation, but the conf is restored only
        # after the write so a lazy re-analysis can't see the old value
        writer = spark.read.parquet(path).coalesce(n_out).write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(tmp)
    finally:
        spark.conf.set(infer_key, infer_prev)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(glob.glob(os.path.join(path, "**/*.parquet"), recursive=True))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 6,
) -> int:
    """Write ``df`` as a z-ordered parquet layout clustered on two
    nonnegative-integer ``cols`` — the writable form of the
    ``zorder-layout`` stats query (queries_misc.py), i.e. what Delta
    ``OPTIMIZE ZORDER BY`` / an Iceberg sort order produce: per-file
    (min, max) footer stats that are ~√-tight on BOTH dimensions, so
    a range predicate on EITHER column prunes most files. Returns the
    output file count.

    Plan shape (one data shuffle, no global sort, no driver rows):
    grid bounds are a 1-row agg broadcast back; the z-value is pure
    JVM integer arithmetic (functions/zcurve.py); the physical
    placement is ``repartitionByRange(n_files, z, tiebreak)`` +
    ``sortWithinPartitions`` — the form the stats query's docstring
    names as the 100 TB deployment shape. The query's two-phase
    global rank stays the ORACLE twin (deterministic file_id for the
    cross-engine stats comparison); the sink uses range partitioning
    because it reaches the same layout with one shuffle instead of
    three (rank needs a per-cell window shuffle plus the placement
    shuffle) and file-size evenness by sampling is sufficient for a
    layout whose contract is pruning, not byte-exact file sizes.

    The tiebreak inside equal z-values is ``xxhash64`` over every
    column — a pure function of ROW CONTENT, the same retry-safety
    device as ``write_partitioned``'s salt: an order-dependent
    tiebreak would re-place rows when a fetch failure recomputes an
    upstream partition (the SPARK-23207 loss/duplication class).
    ``n_files`` is explicit so AQE cannot coalesce the layout."""
    import glob as _glob
    import os

    from ..functions.zcurve import z_interleave_sql

    if len(cols) != 2:
        raise ValueError("write_zordered clusters on exactly two columns")
    cx, cy = cols
    mx = df.agg(
        F.max(cx).alias("__mx"), F.max(cy).alias("__my")
    )
    z = (
        df.join(F.broadcast(mx))
        .withColumn("__gx", F.expr(f"({cx} * {1 << bits}) div (__mx + 1)"))
        .withColumn("__gy", F.expr(f"({cy} * {1 << bits}) div (__my + 1)"))
        .withColumn(
            "__z", F.expr(z_interleave_sql("__gx", "__gy", bits, "div"))
        )
        .withColumn("__tb", F.xxhash64(*df.columns))
    )
    (
        z.repartitionByRange(n_files, "__z", "__tb")
        .sortWithinPartitions("__z", "__tb")
        .drop("__mx", "__my", "__gx", "__gy", "__z", "__tb")
        .write.mode("overwrite")
        .parquet(path)
    )
    return len(_glob.glob(os.path.join(path, "*.parquet")))
