"""reverse_etl_homebrew_spark — a PySpark-native analytics engine.

Re-expresses the query semantics of the reference reverse-ETL job
(Lumin-Health/Reverse-ETL-Homebrew, surveyed in SURVEY.md) as idiomatic
Spark DataFrame operators: declared-schema scans, incremental
watermark reads, tiered match joins, upsert merges, dedup/quarantine
branches, scalar transform library — plus the large-scale
training-data-pipeline operators (dedup families, similarity search,
text analysis, multimodal column plumbing).

Design rules (SURVEY.md §4.3):
- DataFrame/SQL only; no RDDs on any hot path.
- Every reference scalar transform compiles to native Column
  expressions (JVM-side, whole-stage-codegen) — no Python UDFs in
  relational operators.
- Small dimensions broadcast; fact-to-fact joins shuffle on keys with
  AQE enabled; external side effects isolated in foreachPartition
  actions, never inside the lazy plan.
"""

__version__ = "0.1.0"
