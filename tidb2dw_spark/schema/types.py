"""TiDB/MySQL scalar type → Spark type mapping.

Union of the reference's four per-dialect maps (SURVEY §1.2; reference
pkg/snowsql/types.go:12-48, pkg/redshiftsql/types.go:12-48,
pkg/bigquerysql/types.go:12-46, pkg/databrickssql/types.go:15-41).
The reference supports scalar MySQL types only — no nested types.

Notable choices, mirroring reference precedent:
- ``bigint unsigned`` → Decimal(20,0)  (redshiftsql/types.go:35)
- ``datetime``/``timestamp`` → TimestampType (Databricks uses TIMESTAMP_NTZ,
  databrickssql/types.go:38-40; session TZ is pinned UTC so semantics agree)
- ``time`` → StringType (no direct warehouse-agnostic time-of-day type)
- binary family → BinaryType, decoded from hex/base64 text on ingest (P3).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

from pyspark.sql import types as T

if TYPE_CHECKING:
    from .table_def import TableDefinition

_INT_TYPES = {"tinyint", "smallint", "mediumint", "int", "integer", "year"}
_TEXT_TYPES = {
    "char", "varchar", "tinytext", "text", "mediumtext", "longtext",
    "json", "enum", "set", "time",
}
_BINARY_TYPES = {"binary", "varbinary", "tinyblob", "blob", "mediumblob", "longblob"}

# Warehouse binary cap (reference snowsql/types.go:19-21,57-58: mediumblob/
# longblob are rejected beyond Snowflake's 8 MiB BINARY limit).  Intrinsic
# MySQL maxima — used when the catalog supplies no explicit length.
MAX_BLOB_BYTES = 8 * 1024 * 1024
_BLOB_INTRINSIC_MAX = {"mediumblob": 16_777_215, "longblob": 4_294_967_295}


class UnsupportedTypeError(ValueError):
    pass


def tidb_type_to_spark(
    tp: str,
    precision: str | None = None,
    scale: str | None = None,
    allow_large_blobs: bool = False,
) -> T.DataType:
    """Map a TiDB ``information_schema``-style type name to a Spark type.

    mediumblob/longblob columns whose (declared or intrinsic) size exceeds
    8 MiB are rejected like the reference's Snowflake dialect
    (snowsql/types.go:19-21,57-58) unless *allow_large_blobs* — Spark
    itself has no such cap, but silently accepting a column the reference
    refuses would desync replication contracts."""
    base = tp.strip().lower()
    unsigned = "unsigned" in base
    # strip parenthesised precision "int(11)" and attribute words
    m = re.match(r"([a-z0-9_]+)", base)
    name = m.group(1) if m else base

    if name in _BLOB_INTRINSIC_MAX and not allow_large_blobs:
        declared = int(precision) if precision not in (None, "") else _BLOB_INTRINSIC_MAX[name]
        if declared > MAX_BLOB_BYTES:
            raise UnsupportedTypeError(
                f"{name} of {declared} bytes exceeds the {MAX_BLOB_BYTES}-byte "
                "warehouse binary cap (snowsql/types.go:19-21 parity); pass "
                "allow_large_blobs=True to map it to BinaryType anyway"
            )

    if name == "bigint":
        return T.DecimalType(20, 0) if unsigned else T.LongType()
    if name in _INT_TYPES:
        # unsigned int fits in LongType; signed fits IntegerType
        return T.LongType() if (unsigned and name in ("int", "integer")) else T.IntegerType()
    if name == "float":
        return T.FloatType()
    if name in ("double", "real"):
        return T.DoubleType()
    if name in ("decimal", "numeric"):
        p = int(precision) if precision not in (None, "") else 10
        s = int(scale) if scale not in (None, "") else 0
        return T.DecimalType(min(p, 38), min(s, 38))
    if name in ("bool", "boolean", "bit"):
        return T.BooleanType()
    if name == "date":
        return T.DateType()
    if name in ("datetime", "timestamp"):
        return T.TimestampType()
    if name in _BINARY_TYPES:
        return T.BinaryType()
    if name in _TEXT_TYPES:
        return T.StringType()
    # default: string (the reference's maps also fall back to text-ish)
    return T.StringType()


def table_def_to_struct(table_def: "TableDefinition") -> T.StructType:
    """Render a TableDefinition's column list as a Spark StructType."""
    fields = []
    for col in table_def.columns:
        dtype = tidb_type_to_spark(col.tp, col.precision, col.scale)
        nullable = col.nullable != "false"
        fields.append(T.StructField(col.name, dtype, nullable, metadata={"tidb_col_id": col.id}))
    return T.StructType(fields)
