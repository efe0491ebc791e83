"""S1 — source-attached snapshot read over JDBC (gated: no MySQL driver in
this container; the option-building logic is real and unit-tested, the
actual read raises a clear error until a driver jar is provided).

Reference parity: pkg/dumpling/dump.go:84-147 (consistent dump at a TSO)
and §4's parallel-dump strategy.  Spark-side:

- consistency fence: ``SET SESSION tidb_snapshot = <tso>`` applied via the
  JDBC ``sessionInitStatement`` — every partition's connection reads the
  same snapshot version (dump.go:75-79 does the same per-connection).
- parallelism: ``partitionColumn/lowerBound/upperBound/numPartitions``
  splits the PK range across executors — the built-in equivalent of
  Dumpling's ``Rows=1`` chunking (dump.go:40-41); far better than the
  reference's fixed 8 threads because it scales with the cluster.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TidbSource:
    host: str
    port: int
    database: str
    user: str
    password: str = ""

    @property
    def url(self) -> str:
        return f"jdbc:mysql://{self.host}:{self.port}/{self.database}"


def snapshot_read_options(
    source: TidbSource,
    table: str,
    snapshot_tso: int | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str = "com.mysql.cj.jdbc.Driver",
    url: str | None = None,
) -> dict[str, str]:
    """Build the JDBC reader options for a TSO-pinned parallel snapshot.

    *driver*/*url* overrides let the same option shape run against any
    JDBC database — tests/test_introspection.py executes the partitioned
    read for real against embedded Derby (the one JDBC engine on Spark's
    default classpath), so the S1 read path is smoke-tested end-to-end
    even though the MySQL driver jar is absent here."""
    opts: dict[str, str] = {
        "url": url or source.url,
        "dbtable": table,
        "user": source.user,
        "password": source.password,
        "driver": driver,
        "fetchsize": "10000",
    }
    if snapshot_tso is not None:
        # the consistency fence — applied on every partition's connection
        opts["sessionInitStatement"] = f"SET SESSION tidb_snapshot = {snapshot_tso}"
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def snapshot_read(spark: SparkSession, **kwargs) -> DataFrame:
    """Execute the snapshot read.  Raises with guidance when no MySQL JDBC
    driver is on the Spark classpath (this container ships none)."""
    opts = snapshot_read_options(**kwargs)
    try:
        return spark.read.format("jdbc").options(**opts).load()
    except Exception as exc:  # surface a clear, actionable error
        if "ClassNotFoundException" in str(exc) or "No suitable driver" in str(exc):
            raise RuntimeError(
                "MySQL JDBC driver not on classpath; add e.g. "
                "--packages com.mysql:mysql-connector-j:8.4.0 (source-attached "
                "mode only — staged-file mode needs no driver)"
            ) from exc
        raise


def current_tso_query() -> str:
    """The TSO fetch the reference issues (tidbsql/tso.go:9-23)."""
    return "SELECT @@tidb_current_ts"
