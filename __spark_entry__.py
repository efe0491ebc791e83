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
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.ORACLES)
