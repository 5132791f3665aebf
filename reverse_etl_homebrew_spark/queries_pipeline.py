"""Pipeline-level operator queries: the full patient and ROI sync
plans' outcome distributions, oracle-checked end-to-end.

These replicate the complete branch ladders of the reference's
upsert_contacts (main.py:667-729) and upsert_rois (main.py:731-794)
in DuckDB SQL — the strongest single check in the suite, because a
mistake anywhere in projection, idmap join, email-ambiguity handling,
processed/override skips, or tier resolution shifts at least one
outcome count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .plans.patients import patient_sync_plan
from .plans.rois import roi_sync_plan
from .queries import register


@register(
    "patient-sync-pipeline",
    sql="""
    WITH rows AS (
      SELECT CAST(c_custkey AS VARCHAR) AS natural_key,
             NULLIF(LOWER(TRIM(
               CASE WHEN c_custkey % 17 = 0 THEN ''
                    ELSE CONCAT(UPPER(c_name), '@example.com ') END)), '') AS email
      FROM customer
    ), idmap AS (
      SELECT CAST(c_custkey AS VARCHAR) AS natural_key
      FROM customer WHERE c_custkey % 5 = 0
    ), snapshot AS (
      SELECT CONCAT(LOWER(c_name), '@example.com') AS email
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT CONCAT(LOWER(c_name), '@example.com')
      FROM customer WHERE c_custkey % 21 = 0
    ), per_email AS (
      SELECT email, COUNT(*) AS cnt FROM snapshot GROUP BY email
    )
    SELECT outcome, COUNT(*) AS n FROM (
      SELECT CASE WHEN i.natural_key IS NOT NULL THEN 'update'
                  WHEN r.email IS NULL THEN 'dlq_no_email'
                  WHEN p.cnt >= 2 THEN 'dlq_ambiguous'
                  WHEN p.cnt = 1 THEN 'adopt'
                  ELSE 'create' END AS outcome
      FROM rows r
      LEFT JOIN idmap i ON r.natural_key = i.natural_key
      LEFT JOIN per_email p ON r.email = p.email
    ) GROUP BY outcome
    """,
)
def q_patient_sync_pipeline(spark, sf_dir):
    """Outcome counts of the complete patient sync plan
    (scan → projection → idmap join → email-ambiguity match →
    branch ladder, main.py:667-729)."""
    return (
        patient_sync_plan(spark, sf_dir)
        .groupBy("outcome")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "roi-sync-pipeline",
    sql="""
    SELECT outcome, COUNT(*) AS n FROM (
      -- processed-skip needs BOTH the status AND the completion stamp
      -- (the plan's processing_datetime is o_orderdate for % 11 keys;
      -- reference main.py:736-742 checks both) — a NULL stamp falls
      -- through to the next branch, which the simplified one-condition
      -- CASE missed (r10 NULL-robustness probe)
      SELECT CASE WHEN o_orderkey % 11 = 0 AND o_orderdate IS NOT NULL
                    THEN 'skip_processed'
                  WHEN o_orderkey % 13 = 0 THEN 'skip_override'
                  -- a NULL parent key cannot resolve through the
                  -- equality tier cascade -> DLQ (r11 NULL-key probe;
                  -- every NON-NULL o_custkey resolves by FK integrity)
                  WHEN o_custkey IS NULL THEN 'dlq_unresolved'
                  WHEN o_orderkey % 7 = 0 THEN 'update'
                  ELSE 'create' END AS outcome
      FROM orders
    ) GROUP BY outcome
    """,
)
def q_roi_sync_pipeline(spark, sf_dir):
    """Outcome counts of the complete ROI sync plan (processed-skip →
    tier resolution → override-skip → create/update decision,
    main.py:731-794)."""
    return (
        roi_sync_plan(spark, sf_dir)
        .groupBy("outcome")
        .agg(F.count(F.lit(1)).alias("n"))
    )
