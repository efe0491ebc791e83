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
    jar = mysql_driver_jar()
    if jar:
        # auto-enable the live-MySQL source path the moment the
        # environment provides a driver jar (the gated e2e in
        # tests/test_replicate.py un-skips itself off the same probe).
        # Extra user jars ride along via $SPARK_GRAFT_EXTRA_JARS (this
        # builder.config overrides spark-defaults.conf's spark.jars, so
        # that env var is the supported way to combine them).  Note
        # spark.jars only takes effect for the session that starts the
        # JVM — getOrCreate() against an already-running session ignores
        # it, so the driver jar must be present when the FIRST session
        # of the process is built (true here: this factory is the
        # process's session entry point).
        existing = os.environ.get("SPARK_GRAFT_EXTRA_JARS", "")
        jars = ",".join(j for j in (existing, jar) if j)
        builder = builder.config("spark.jars", jars)
    return builder.getOrCreate()


def mysql_driver_jar() -> str | None:
    """Probe the environment for a MySQL/MariaDB JDBC driver jar.

    The container ships no MySQL driver, which is the one thing gating
    the live source-attached replicate (S1) from running end-to-end
    against a real wire.  Search order: $SPARK_GRAFT_JDBC_JAR (explicit),
    then the conventional system/Spark jar directories.  Returns the
    first match or None — callers treat None as "environment-gated",
    never an error."""
    import glob

    explicit = os.environ.get("SPARK_GRAFT_JDBC_JAR")
    if explicit and os.path.exists(explicit):
        return explicit
    roots = [
        os.path.join(os.environ.get("SPARK_HOME", ""), "jars"),
        "/usr/share/java",
        "/opt/jars",
    ]
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except Exception:
        pass
    for root in roots:
        if not root or not os.path.isdir(root):
            continue
        for pat in ("mysql-connector*.jar", "mariadb-java-client*.jar"):
            hits = sorted(glob.glob(os.path.join(root, pat)))
            if hits:
                return hits[0]
    return None
