"""Control tables: run ledger, dead-letter queue, idempotency ID map.

Mirrors the reference's three BigQuery control tables
(ensure_control_tables, main.py:280-328; DDL main.py:286-325) as
parquet directories under a workdir. Semantics preserved:

- ledger-append (main.py:347-352): one summary row per run;
- watermark read (main.py:330-345): latest successful run per job
  type;
- dlq-append (main.py:391-402): payload/error truncation bounds;
- idmap-merge (main.py:354-371): keyed upsert, last writer wins.

On a lakehouse deployment these map 1:1 onto Delta/Iceberg tables
(`MERGE INTO` replaces the merge-rewrite); the interface stays the
same. The tables are tiny relative to facts — single-digit files,
broadcast on every join.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.merge import upsert_merge

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("started_at", T.TimestampNTZType()),
        T.StructField("finished_at", T.TimestampNTZType()),
        T.StructField("job_type", T.StringType()),
        T.StructField("high_watermark", T.TimestampNTZType()),
        T.StructField("read_count", T.LongType()),
        T.StructField("updated_count", T.LongType()),
        T.StructField("created_count", T.LongType()),
        T.StructField("skipped_count", T.LongType()),
        T.StructField("error_count", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)

DLQ_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("job_type", T.StringType()),
        T.StructField("natural_key", T.StringType()),
        T.StructField("hubspot_object_type", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("attempt", T.LongType()),
    ]
)

IDMAP_SCHEMA = T.StructType(
    [
        T.StructField("hubspot_object_type", T.StringType()),
        T.StructField("natural_key", T.StringType()),
        T.StructField("hubspot_id", T.StringType()),
        T.StructField("updated_at", T.TimestampNTZType()),
    ]
)

PAYLOAD_MAX = 90_000  # main.py:398
ERROR_MAX = 10_000  # main.py:399

#: The reference's MERGE, verbatim semantics (main.py:356-363):
#: matched → update (hubspot_id, updated_at); not matched → insert.
IDMAP_MERGE_SQL = """
MERGE INTO {target} AS t
USING {source} AS s
ON t.hubspot_object_type = s.hubspot_object_type
   AND t.natural_key = s.natural_key
WHEN MATCHED THEN UPDATE SET
    t.hubspot_id = s.hubspot_id,
    t.updated_at = s.updated_at
WHEN NOT MATCHED THEN INSERT
    (hubspot_object_type, natural_key, hubspot_id, updated_at)
    VALUES (s.hubspot_object_type, s.natural_key, s.hubspot_id, s.updated_at)
"""


def native_merge_available(spark: SparkSession) -> bool:
    """Probe whether the session's catalog can execute ``MERGE INTO``
    natively. Spark's built-in file-source catalog cannot (MERGE needs
    a table format with row-level operations — Delta Lake or Iceberg);
    detection keys off the registered session extensions / catalog
    implementations, which is how those formats install themselves."""
    markers = ("delta", "iceberg")
    for key in ("spark.sql.extensions", "spark.sql.catalog.spark_catalog"):
        try:
            val = (spark.conf.get(key, "") or "").lower()
        except Exception:
            val = ""
        if any(m in val for m in markers):
            return True
    return False


def native_merge_idmap(spark: SparkSession, target_table: str, incoming: DataFrame) -> None:
    """Run the reference's idmap MERGE (main.py:356-363) natively
    against a MERGE-capable catalog table. Raises if the session has
    no such catalog — callers route through the join fallback then."""
    if not native_merge_available(spark):
        raise RuntimeError(
            "native MERGE INTO needs a Delta/Iceberg catalog in this session"
        )
    # per-call view name: concurrent merges on one session must not
    # clobber each other's source view
    view = f"__idmap_incoming_{uuid.uuid4().hex}"
    incoming.createOrReplaceTempView(view)
    try:
        spark.sql(IDMAP_MERGE_SQL.format(target=target_table, source=view))
    finally:
        spark.catalog.dropTempView(view)


class ControlTables:
    """Workdir-backed control tables with the reference's semantics."""

    def __init__(
        self, spark: SparkSession, workdir: str, idmap_table: Optional[str] = None
    ):
        """``idmap_table``: name of a MERGE-capable catalog table
        (Delta/Iceberg) to route idmap upserts through natively. When
        unset — or when the session's catalog cannot MERGE — the
        portable parquet join-fallback path is used. Decided once at
        construction (session build), per VERDICT r1 #6."""
        self.spark = spark
        self.workdir = workdir
        self.idmap_table = idmap_table if native_merge_available(spark) else None
        self.paths = {
            "run_ledger": os.path.join(workdir, "run_ledger"),
            "dlq": os.path.join(workdir, "dlq"),
            "id_map": os.path.join(workdir, "id_map"),
        }

    # -- ddl-ensure-tables (main.py:280-328) ------------------------------

    def ensure(self) -> None:
        """Idempotent creation: write an empty frame wherever no table
        exists yet (CREATE TABLE IF NOT EXISTS analog). Also recovers
        an ID map lost to a crash mid-swap (see merge_idmap): if the
        final dir is missing but its .bak survives, the last committed
        state is restored before anything reads it."""
        self._recover_idmap()
        for name, schema in (
            ("run_ledger", LEDGER_SCHEMA),
            ("dlq", DLQ_SCHEMA),
            ("id_map", IDMAP_SCHEMA),
        ):
            path = self.paths[name]
            if not os.path.exists(path):
                self.spark.createDataFrame([], schema).write.mode("overwrite").parquet(
                    path
                )

    def _recover_idmap(self) -> None:
        final = self.paths["id_map"]
        bak = final + ".bak"
        staging = final + ".staging"
        if not os.path.exists(final) and os.path.exists(bak):
            # crashed between moving final aside and promoting staging:
            # restore the last committed state (conservative — the
            # aborted merge simply re-applies on the next run, and the
            # merge is idempotent last-writer-wins)
            os.rename(bak, final)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        if os.path.exists(final):
            shutil.rmtree(bak, ignore_errors=True)

    def _read(self, name: str, schema: T.StructType) -> DataFrame:
        return self.spark.read.schema(schema).parquet(self.paths[name])

    def ledger(self) -> DataFrame:
        return self._read("run_ledger", LEDGER_SCHEMA)

    def dlq(self) -> DataFrame:
        return self._read("dlq", DLQ_SCHEMA)

    def idmap(self) -> DataFrame:
        return self._read("id_map", IDMAP_SCHEMA)

    # -- ledger-watermark-read (main.py:330-345) ---------------------------

    def read_high_watermark(self, job_type: str) -> Optional[dt.datetime]:
        row = (
            self.ledger()
            .filter(
                (F.col("job_type") == job_type)
                & (F.col("status") == "success")
                & F.col("high_watermark").isNotNull()
            )
            # (finished_at DESC, high_watermark DESC) is a TOTAL order
            # over the rows that can tie: two successes finishing at
            # the same instant (r14 duplicate-key/tie class) must
            # yield ONE deterministic watermark — the max among the
            # tied finishes, the monotone choice. finished_at alone
            # left the pick to partition merge order.
            .orderBy(F.desc("finished_at"), F.desc("high_watermark"))
            .limit(1)
            .select("high_watermark")
            .first()
        )
        return row["high_watermark"] if row else None

    # -- ledger-append (main.py:347-352) -----------------------------------

    def append_ledger_row(
        self,
        job_type: str,
        started_at: dt.datetime,
        high_watermark: Optional[dt.datetime],
        counts: dict,
        status: str,
    ) -> str:
        run_id = str(uuid.uuid4())
        row = {
            "run_id": run_id,
            "started_at": started_at,
            "finished_at": dt.datetime.utcnow(),
            "job_type": job_type,
            "high_watermark": high_watermark,
            "read_count": int(counts.get("read", 0)),
            "updated_count": int(counts.get("updated", 0)),
            "created_count": int(counts.get("created", 0)),
            "skipped_count": int(counts.get("skipped", 0)),
            "error_count": int(counts.get("errors", 0)),
            "status": status,
        }
        self.spark.createDataFrame([row], LEDGER_SCHEMA).write.mode("append").parquet(
            self.paths["run_ledger"]
        )
        return run_id

    # -- dlq-append (main.py:391-402) --------------------------------------

    def append_dlq(self, df: DataFrame) -> None:
        """Append quarantine rows; enforces the payload/error clamps
        (main.py:398-399) regardless of caller discipline."""
        (
            df.select(
                F.coalesce(F.col("ts"), F.lit(dt.datetime.utcnow())).alias("ts"),
                "job_type",
                "natural_key",
                "hubspot_object_type",
                F.substring(F.col("payload"), 1, PAYLOAD_MAX).alias("payload"),
                F.substring(F.col("error"), 1, ERROR_MAX).alias("error"),
                F.col("attempt").cast("long").alias("attempt"),
            )
            .write.mode("append")
            .parquet(self.paths["dlq"])
        )

    # -- idmap-merge (main.py:354-371) -------------------------------------

    def merge_idmap(self, incoming: DataFrame) -> None:
        """Keyed upsert on (hubspot_object_type, natural_key), last
        writer wins — the full-outer-join/window fallback for MERGE
        INTO (SURVEY.md §4.3(c); native routing in ``native_merge``).

        Swap protocol (no window where the ID map does not exist on
        disk in SOME committed form): write staging → move final to
        .bak → promote staging → drop .bak. A crash at any point
        leaves either final, or .bak to be restored by
        ``_recover_idmap`` on the next startup — losing the map would
        cause wholesale re-creates, the exact failure it exists to
        prevent."""
        if self.idmap_table is not None:
            # MERGE-capable catalog: one transactional statement, no
            # table rewrite, concurrent-writer safe
            native_merge_idmap(
                self.spark,
                self.idmap_table,
                incoming.select(*[f.name for f in IDMAP_SCHEMA.fields]),
            )
            return
        existing = self.idmap()
        merged = upsert_merge(
            existing,
            incoming.select(*[f.name for f in IDMAP_SCHEMA.fields]),
            keys=["hubspot_object_type", "natural_key"],
            order_col="updated_at",
        )
        final = self.paths["id_map"]
        staging = final + ".staging"
        bak = final + ".bak"
        merged.write.mode("overwrite").parquet(staging)
        import shutil

        shutil.rmtree(bak, ignore_errors=True)
        if os.path.exists(final):
            os.rename(final, bak)
        os.rename(staging, final)
        shutil.rmtree(bak, ignore_errors=True)
