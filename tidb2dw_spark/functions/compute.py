"""Compute-layout helper for CPU-bound per-row operators.

Parquet split planning sizes partitions by *bytes*
(``spark.sql.files.maxPartitionBytes``), which is right for IO-bound scans
but wrong for compute-bound ones: a 10 MB documents file arrives as one
partition, so a shingle/minhash/simhash pipeline — thousands of md5 calls
per row — runs on 1 of N cores.  ``spread_for_compute`` round-robins such
an input across the cluster's cores *only when it is under-partitioned*:

- small SF / few files  → repartition to ``defaultParallelism`` (the
  shuffle moves megabytes; the compute speedup is ~N×)
- 100 TB corpus          → thousands of input splits already ≥ cores,
  so this is a no-op and adds no shuffle

This keeps the adaptive decision in one place instead of sprinkling
``repartition()`` calls that would shuffle a full-scale corpus for nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition *df* to ``defaultParallelism × min_factor`` if it has
    fewer partitions than that; otherwise return it unchanged."""
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
