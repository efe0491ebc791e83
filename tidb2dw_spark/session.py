"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]`` single-JVM; the configs below are the ones
that also matter on a 1000-executor cluster: AQE (runtime re-planning,
skew-join splitting, partition coalescing), shuffle partition sizing,
Arrow for any pandas exchange, and UTC session time so timestamp semantics
are stable across engines (the DuckDB oracle runs UTC too).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tidb2dw_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime Bloom-filter pushdown: when one join side is selective but
        # above the broadcast threshold, inject a bloom filter into the big
        # side's scan — at 100 TB this prunes shuffle input for the
        # fact-side of dim joins that AQE can't broadcast
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # cap in-flight parquet footer/file memory at wide-scan scale
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    return builder.getOrCreate()
