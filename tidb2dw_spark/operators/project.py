"""Projection / filter operators P1-P6 (SURVEY §2.2).

All of these are generated SQL in the reference; here they are plain
narrow transformations — no shuffle, fully inside whole-stage codegen,
and column pruning propagates to the scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.envelope import TABLENAME_COL


def positional_projection(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """P1 — CSV ordinal → named columns ($5 AS col1 …, snowsql/sql.go:116-124;
    Databricks ``_c{i}`` rename, databrickssql/sql.go:184-195)."""
    if len(names) != len(df.columns):
        raise ValueError(f"positional projection arity {len(names)} != {len(df.columns)}")
    return df.toDF(*names)


def cast_projection(df: DataFrame, casts: Mapping[str, T.DataType | str]) -> DataFrame:
    """P2 — per-column cast (databrickssql/sql.go:184-195)."""
    return df.select(
        *[F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c) for c in df.columns]
    )


def decode_binary_columns(
    df: DataFrame, binary_cols: Sequence[str], encoding: str = "hex"
) -> DataFrame:
    """P3 — staged binary text → bytes.  Hex for snowflake/redshift dialects
    (TO_BINARY($n,'HEX'), snowsql/sql.go:119-121), base64 for bigquery
    (cmd/core.go:67-73)."""
    if encoding == "hex":
        dec = F.unhex
    elif encoding == "base64":
        dec = F.unbase64
    else:
        raise ValueError(f"unknown binary encoding {encoding!r}")
    out = df
    for c in binary_cols:
        out = out.withColumn(c, dec(F.col(c)))
    return out


def metadata_row_filter(df: DataFrame, col: str = TABLENAME_COL) -> DataFrame:
    """P4 — drop stray/metadata rows (WHERE tablename IS NOT NULL,
    redshiftsql/sql.go:143,179)."""
    return df.filter(F.col(col).isNotNull())


def pk_projection(df: DataFrame, pk_cols: Sequence[str]) -> DataFrame:
    """P6 — delete-phase column pruning to PK columns only
    (redshiftsql/sql.go:139-148)."""
    return df.select(*pk_cols)
