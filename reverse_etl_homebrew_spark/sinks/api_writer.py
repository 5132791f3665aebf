"""Partition-parallel external-API writer (SURVEY.md §2.9 `api-writer`).

The reference writes serially, one record at a time, inside the
transform loop (upsert_contacts main.py:667-729). The engine keeps the
*plan* (create vs update decision) a pure DataFrame and isolates the
side effect in a single ``foreachPartition`` action:

- plan rows carry (natural_key, hubspot_id?, outcome, properties-json);
- each partition gets its own transport (session reuse ≈ the
  reference's shared requests.Session, main.py:428-432);
- records are written in BATCH_SIZE chunks (main.py:51,670) with the
  exact retry contract: statuses {429,500,502,503,504} retried up to
  MAX_RETRIES with capped exponential backoff, then surfaced as
  failures (→ DLQ) with the synthetic 599 sentinel (main.py:434-457);
- results (created / updated / failed per key) come back through a
  spool directory, never through the lazy plan — so Spark task
  retries can never double-fire a partial batch invisibly.

Scale: parallelism = number of plan partitions; ``repartition(n)``
upstream controls the concurrent-connection budget against the
external API (each partition is one session, rate-limited by its own
backoff loop).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable

from pyspark.sql import DataFrame

from .transport import (
    BATCH_SIZE,
    EXHAUSTED_STATUS,
    MAX_RETRIES,
    RETRY_STATUSES,
    Transport,
    compute_backoff,
)


def _chunks(it, size):
    buf = []
    for x in it:
        buf.append(x)
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def _send_with_retry(
    transport: Transport,
    object_type: str,
    row,
    sleeper: Callable[[float], None],
):
    """One record through the create-or-update + retry ladder.
    Returns (op, status, object_id)."""
    props = json.loads(row["properties_json"]) if row["properties_json"] else {}
    props["natural_key"] = row["natural_key"]
    for attempt in range(1, MAX_RETRIES + 1):
        if row["hubspot_id"]:
            status = transport.update(object_type, row["hubspot_id"], props)
            op, oid = "update", row["hubspot_id"]
        else:
            status, oid = transport.create(object_type, props)
            op = "create"
        if status not in RETRY_STATUSES:
            return op, status, oid
        if attempt < MAX_RETRIES:
            sleeper(compute_backoff(attempt))
    return op, EXHAUSTED_STATUS, None


def write_plan(
    plan: DataFrame,
    object_type: str,
    transport_factory: Callable[[], Transport],
    results_dir: str,
    sleeper: Callable[[float], None] = time.sleep,
) -> None:
    """Execute the write plan. ``plan`` must have columns
    (natural_key, hubspot_id nullable, properties_json). Outcomes are
    spooled as JSON lines under ``results_dir`` (one file per
    partition/attempt), keyed by natural_key for idempotent
    reconciliation."""
    os.makedirs(results_dir, exist_ok=True)
    cols = plan.select("natural_key", "hubspot_id", "properties_json")

    def handle_partition(rows: Iterable) -> None:
        import uuid as _uuid

        transport = transport_factory()
        out_path = os.path.join(results_dir, f"results-{_uuid.uuid4().hex}.jsonl")
        records = []
        for batch in _chunks(rows, BATCH_SIZE):
            for row in batch:
                op, status, oid = _send_with_retry(transport, object_type, row, sleeper)
                records.append(
                    {
                        "natural_key": row["natural_key"],
                        "op": op,
                        "status": status,
                        "hubspot_id": oid,
                        "ok": status in (200, 201),
                    }
                )
        if records:
            with open(out_path, "w") as f:
                for r in records:
                    f.write(json.dumps(r) + "\n")

    cols.foreachPartition(handle_partition)


def read_results(spark, results_dir: str) -> DataFrame:
    """Writer outcomes as a DataFrame for ledger/idmap/DLQ updates."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("natural_key", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("status", T.LongType()),
            T.StructField("hubspot_id", T.StringType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )
    return spark.read.schema(schema).json(os.path.join(results_dir, "results-*.jsonl"))
