"""Change-event envelope (SURVEY §1.1 / FIXTURES §2).

Every CDC row carries 4 leading metadata columns then the payload
(reference pkg/utils/incr_table.go:5-31; Snowflake reads them positionally
as $1..$4 with data from $5, pkg/snowsql/sql.go:117-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FLAG_COL = "flag"
TABLENAME_COL = "tablename"
SCHEMANAME_COL = "schemaname"
COMMIT_TS_COL = "commit_ts"

ENVELOPE_COLUMNS = [FLAG_COL, TABLENAME_COL, SCHEMANAME_COL, COMMIT_TS_COL]

# Consumer-added batch column: position of the source file in application
# order when several CDC files are merged as one batch.  Used as the
# commit_ts tiebreaker (later file wins — reference applies files serially,
# so a same-ts row in a later file overwrites the earlier one).
FILE_SEQ_COL = "__file_seq"

_ENVELOPE_FIELDS = [
    T.StructField(FLAG_COL, T.StringType(), False),
    T.StructField(TABLENAME_COL, T.StringType(), True),
    T.StructField(SCHEMANAME_COL, T.StringType(), True),
    T.StructField(COMMIT_TS_COL, T.LongType(), False),
]


def envelope_schema(payload: T.StructType) -> T.StructType:
    """Prepend the 4 envelope fields to a payload schema."""
    return T.StructType(list(_ENVELOPE_FIELDS) + list(payload.fields))


def strip_envelope(df: DataFrame) -> DataFrame:
    """Drop the 4 metadata columns, leaving the payload row image."""
    return df.drop(*ENVELOPE_COLUMNS)
