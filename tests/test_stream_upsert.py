"""foreachBatch bridge test: micro-batches flow through the same
batch-side machinery (here: a merge into a control table), with
checkpointed exactly-once batch tracking."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.sinks.control import ControlTables
from reverse_etl_homebrew_spark.streaming.structured import stream_upsert_sync

SF = "/root/testdata/sf0.001"


def test_stream_upsert_sync_applies_batches(spark, tmp_path):
    events_dir = str(tmp_path / "ev")
    os.makedirs(events_dir)
    shutil.copy(os.path.join(SF, "events.parquet"), events_dir)
    ctl = ControlTables(spark, str(tmp_path / "ctl"))
    ctl.ensure()

    def handler(batch_df, batch_id: int):
        # the per-batch plan: latest event per user → idmap upsert
        from reverse_etl_homebrew_spark.operators.scans import latest_per_group

        latest = latest_per_group(
            batch_df.select("user_id", "event_id", "ts"),
            ["user_id"],
            [F.desc("ts"), F.desc("event_id")],
        )
        ctl.merge_idmap(
            latest.select(
                F.lit("contact").alias("hubspot_object_type"),
                F.col("user_id").cast("string").alias("natural_key"),
                F.concat(F.lit("EV-"), F.col("event_id").cast("string")).alias(
                    "hubspot_id"
                ),
                F.col("ts").cast("timestamp_ntz").alias("updated_at"),
            )
        )

    stream_upsert_sync(spark, events_dir, str(tmp_path / "ckpt"), handler)
    idmap = ctl.idmap()
    assert idmap.count() == 15  # one row per user at sf0.001
    # re-running over the same checkpoint processes nothing new
    stream_upsert_sync(spark, events_dir, str(tmp_path / "ckpt"), handler)
    assert ctl.idmap().count() == 15
