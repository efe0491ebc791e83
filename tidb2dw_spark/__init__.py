"""tidb2dw_spark — a PySpark-native re-expression of pingcap-inc/tidb2dw.

The reference is a CDC replication / incremental-merge engine (TiDB →
warehouse via CSV staging).  This package rebuilds its query and
data-processing capabilities Spark-first:

- ``sources``    — snapshot CSV / changelog file discovery (SURVEY §2.1)
- ``operators``  — dedup / merge / projections (SURVEY §2.2-2.7)
- ``schema``     — type map, table definitions, column-diff engine (§1.2, §2.9)
- ``table``      — a versioned Parquet managed table (the "warehouse")
- ``streaming``  — ordered incremental consumer loop (§2.10)
- ``functions``  — scalar surface + training-data-pipeline ops
  (dedup families, similarity search, text analysis, multimodal plumbing)

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join strategy and AQE; Python UDFs appear only where semantics require
(Arrow-batched, never row-at-a-time in a hot path).
"""

__version__ = "0.1.0"
