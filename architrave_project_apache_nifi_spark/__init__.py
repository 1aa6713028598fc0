"""PySpark-native analytics engine with the capabilities of
``mojtaba-peyrovi/architrave-project-apache-nifi``.

The reference is an Apache NiFi 1.23.2 dataflow implementing MySQL-binlog
CDC + an SCD2 (slowly-changing-dimension type 2) merge into a history
table (see SURVEY.md). This package re-expresses that surface Spark-first:

- ``operators/``  — SCD2 merge, routing, lookup join, flatten, dedup,
  similarity search, text analysis, multimodal plumbing.
- ``functions/``  — NiFi Expression-Language and Jolt equivalents as
  native Column expressions (JVM-side, codegen-friendly).
- ``sources/``    — CDC envelope schema + parsers, parquet/JSON readers,
  sinks (parquet history store, JDBC upsert).
- ``streaming/``  — Structured Streaming SCD2 (foreachBatch merge,
  checkpointed = the reference's DistributedMapCache binlog state).
- ``plans/``      — plan-inspection helpers (pushdown / broadcast /
  codegen assertions used by tests).

Everything is built on the public PySpark DataFrame API; no RDD hot
paths, no row-at-a-time Python UDFs in query paths.
"""

__version__ = "0.1.0"
