"""Snapshot CSV source/sink (S1/S3/S6 parity).

The reference stages a consistent full-table export as header-less CSV with
``,`` separator, ``"`` quote, NULL encoded ``\\N`` and empty-string distinct
from NULL, split into ≤5 GiB files named ``<db>.<table>.<n>.csv``
(pkg/dumpling/dump.go:33-51; null marker pkg/snowsql/sql.go:23,55;
quoted newlines allowed, pkg/bigquerysql/operation.go:38).

Spark-first mapping: ``spark.read.csv`` with an explicit schema — Spark
lists and parallelizes the file set natively (the reference's
16-way bounded load loop, replicate/snapshot.go:24, is subsumed by the
task scheduler), and an explicit schema keeps the scan single-pass
(no inference job) with column pruning intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# CSV conventions of the staging contract (FIXTURES.md §2)
CSV_OPTIONS = {
    "header": "false",
    "sep": ",",
    "quote": '"',
    "escape": '"',
    "nullValue": "\\N",
    "emptyValue": "",
    "multiLine": "true",  # quoted newlines allowed
    "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    "dateFormat": "yyyy-MM-dd",
}


def snapshot_glob(snapshot_dir: str, schema_name: str, table: str) -> str:
    """Path glob for one table's snapshot file set (snapshot.go:152 parity)."""
    return f"{snapshot_dir}/{schema_name}.{table}.*.csv"


def read_snapshot_csv(
    spark: SparkSession, path: str | list[str], schema: T.StructType
) -> DataFrame:
    """Read staged snapshot CSVs with the dialect's conventions."""
    reader = spark.read.schema(schema)
    for k, v in CSV_OPTIONS.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_snapshot_csv(df: DataFrame, path: str, max_records_per_file: int | None = None) -> None:
    """Write a DataFrame in the staging CSV convention (test harness / S2
    stand-in — we don't run TiCDC; fixtures emit its layout)."""
    writer = df.write.mode("overwrite")
    for k, v in CSV_OPTIONS.items():
        if k in ("header", "sep", "quote", "escape", "nullValue", "emptyValue",
                 "timestampFormat", "dateFormat"):
            writer = writer.option(k, v)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.csv(path)


def read_changelog_json(
    spark: SparkSession, path: str | list[str], schema: T.StructType
) -> DataFrame:
    """Read a JSON-lines changelog with the same envelope contract as the
    CSV layout (one object per line: flag/tablename/schemaname/commit_ts +
    payload fields).  The explicit schema keeps semantics identical to the
    CSV path — no inference, missing fields become typed nulls, binary
    columns arrive base64 (Spark's JSON binary convention).  TiCDC emits
    canal-json alongside CSV in production; this reader lets the consumer
    ingest either format into the identical merge pipeline."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", CSV_OPTIONS.get("timestampFormat", "yyyy-MM-dd HH:mm:ss"))
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_changelog_json(df: DataFrame, path: str) -> None:
    """Test-harness twin of :func:`read_changelog_json` (S2 stand-in)."""
    df.write.mode("overwrite").option(
        "timestampFormat", CSV_OPTIONS.get("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    ).json(path)
