"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`tidb2dw_spark.entry_queries` — the registry pairs
each implemented SURVEY.md §2 operator with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tidb2dw_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core I/U/D changelog merge on orders."""
    return entry_queries.QUERIES["merge_orders"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Curated driver surface (≤50 entries, each with a verdict): §2
    operators + pipeline replay + training-data ops, with the analytics,
    sampling, similarity and legacy-multimodal families verified
    per-member through checksum-suite rows (entry_queries.DRIVER_QUERIES
    docstring has the exclusion map; the full registry stays in
    entry_queries.QUERIES for bench/local tests)."""
    return dict(entry_queries.DRIVER_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.DRIVER_ORACLES)
