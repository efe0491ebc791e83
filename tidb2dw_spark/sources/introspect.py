"""D1/D2 — live schema introspection (information_schema + SHOW INDEX).

Reference parity: pkg/tidbsql/ddl.go:115-195 reads ten fields from
``information_schema.columns``, folds the three precision columns into
one string (ddl.go:155-162), skips virtual generated columns
(ddl.go:187-191); pkg/tidbsql/ddl.go:197-222 orders PRIMARY-key columns
via ``SHOW INDEX`` (O2).

The conversion is a pure function over plain row dicts so it runs against
any source of rows: a live JDBC read (gated — no MySQL driver jar ships
in this container), or an embedded database's own ``information_schema``
as the test double (DuckDB exposes the same catalog shape, which is what
tests/test_introspection.py drives end-to-end).
"""

from __future__ import annotations

from ..schema.table_def import TableCol, TableDefinition, pk_columns_from_index_rows

# ddl.go:115-130 — the introspection query (ten fields; TiDB also exposes
# column ids but information_schema ordinal_position is the portable key)
INFORMATION_SCHEMA_COLUMNS_QUERY = """
SELECT column_name, ordinal_position, column_default, is_nullable,
       data_type, character_maximum_length, numeric_precision,
       numeric_scale, datetime_precision
FROM information_schema.columns
WHERE table_schema = '{schema}' AND table_name = '{table}'
ORDER BY ordinal_position
"""

SHOW_INDEX_QUERY = "SHOW INDEX FROM `{schema}`.`{table}`"


def fold_precision(row: dict) -> str:
    """ddl.go:155-162 parity: char length, numeric precision and datetime
    precision fold into ONE precision string (first non-null wins)."""
    for key in ("character_maximum_length", "numeric_precision", "datetime_precision"):
        v = row.get(key)
        if v is not None and v != "":
            return str(v)
    return ""


def _is_virtual_generated(row: dict) -> bool:
    """ddl.go:187-191: TiDB marks these 'VIRTUAL GENERATED' in the
    ``extra`` column; they never appear in the changefeed, so replicating
    them would desync the column lists."""
    return "virtual generated" in str(row.get("extra", "")).lower()


def table_def_from_introspection(
    schema: str,
    table: str,
    column_rows: list[dict],
    index_rows: list[dict],
    version: int = 1,
) -> TableDefinition:
    """Fold catalog rows into a versioned TableDefinition (D1+D2)."""
    pk = set(pk_columns_from_index_rows(index_rows))
    cols: list[TableCol] = []
    for row in sorted(column_rows, key=lambda r: int(r.get("ordinal_position", 0))):
        if _is_virtual_generated(row):
            continue
        name = row["column_name"]
        default = row.get("column_default")
        cols.append(
            TableCol(
                id=str(row.get("ordinal_position", "")),
                name=name,
                tp=str(row.get("data_type", "")).lower(),
                default=None if default is None else str(default),
                precision=fold_precision(row),
                scale=str(row.get("numeric_scale") or ""),
                nullable="true" if str(row.get("is_nullable", "YES")).upper() in ("YES", "TRUE") else "false",
                is_pk="true" if name in pk else "false",
            )
        )
    return TableDefinition(schema=schema, table=table, version=version, columns=cols)


def introspect_options(source, schema: str, table: str) -> dict[str, str]:
    """JDBC reader options for the live D1 read (same gating story as
    jdbc.snapshot_read: the option dict is real and tested; execution
    needs a MySQL driver jar on the classpath)."""
    query = INFORMATION_SCHEMA_COLUMNS_QUERY.format(schema=schema, table=table)
    return {
        "url": source.url,
        "dbtable": f"({query}) AS __introspect",
        "user": source.user,
        "password": source.password,
        "driver": "com.mysql.cj.jdbc.Driver",
    }


def introspect_table_jdbc(spark, source, schema: str, table: str, version: int = 1) -> TableDefinition:
    """Live D1/D2 over JDBC.  ``SHOW INDEX`` is not expressible as a JDBC
    dbtable subquery, so PK discovery uses TiDB's catalog twin
    (information_schema.key_column_usage, same ordered shape)."""
    opts = introspect_options(source, schema, table)
    col_rows = [r.asDict() for r in spark.read.format("jdbc").options(**opts).load().collect()]
    pk_query = (
        "SELECT constraint_name AS Key_name, ordinal_position AS Seq_in_index, "
        "column_name AS Column_name FROM information_schema.key_column_usage "
        f"WHERE table_schema = '{schema}' AND table_name = '{table}' "
        "AND constraint_name = 'PRIMARY'"
    )
    pk_opts = dict(opts, dbtable=f"({pk_query}) AS __pk")
    pk_rows = [r.asDict() for r in spark.read.format("jdbc").options(**pk_opts).load().collect()]
    col_rows = [{k.lower(): v for k, v in r.items()} for r in col_rows]
    pk_rows = [
        {"Key_name": r.get("Key_name") or r.get("key_name"),
         "Seq_in_index": r.get("Seq_in_index") or r.get("seq_in_index"),
         "Column_name": r.get("Column_name") or r.get("column_name")}
        for r in pk_rows
    ]
    return table_def_from_introspection(schema, table, col_rows, pk_rows, version=version)
