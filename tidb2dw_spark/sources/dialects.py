"""Per-warehouse CSV dialect variants (cmd/core.go:59-73 parity).

The reference exports with a dialect-specific CSV convention selected by
``--csv-output-dialect``; the differences that matter to a consumer:

| dialect   | binary encoding | notes                                       |
|-----------|-----------------|---------------------------------------------|
| default   | hex             | Dumpling default                            |
| snowflake | hex             | TO_BINARY($n,'HEX') on load (snowsql)       |
| redshift  | hex             | same                                        |
| bigquery  | base64          | GCS load; AllowQuotedNewlines               |
| databricks| none (string)   | no BINARY over CSV external tables          |

All share: no header, ',' sep, '"' quote, NULL = '\\N', empty field kept
as empty string (EMPTY_FIELD_AS_NULL=FALSE, snowsql/sql.go:23).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CsvDialect:
    name: str
    binary_encoding: str | None  # "hex" | "base64" | None (leave as text)


DIALECTS = {
    "default": CsvDialect("default", "hex"),
    "snowflake": CsvDialect("snowflake", "hex"),
    "redshift": CsvDialect("redshift", "hex"),
    "bigquery": CsvDialect("bigquery", "base64"),
    "databricks": CsvDialect("databricks", None),
}


def decode_staged_binary(
    df: DataFrame, binary_cols: Sequence[str], dialect: str
) -> DataFrame:
    """Decode staged binary text columns per the export dialect (P3)."""
    d = DIALECTS[dialect]
    if d.binary_encoding is None:
        return df  # databricks: blobs stay strings (types.go:13-23)
    dec = F.unhex if d.binary_encoding == "hex" else F.unbase64
    out = df
    for c in binary_cols:
        out = out.withColumn(c, dec(F.col(c)))
    return out


def encode_staged_binary(
    df: DataFrame, binary_cols: Sequence[str], dialect: str
) -> DataFrame:
    """Inverse of decode — used by the fixture writer / export parity."""
    d = DIALECTS[dialect]
    if d.binary_encoding is None:
        return df
    enc = F.hex if d.binary_encoding == "hex" else F.base64
    out = df
    for c in binary_cols:
        out = out.withColumn(c, enc(F.col(c)))
    return out
