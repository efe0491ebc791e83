"""D1/D2 live-introspection path (reference pkg/tidbsql/ddl.go:115-222)
driven end-to-end against an embedded database's information_schema
(DuckDB exposes the same catalog shape the JDBC read would return), plus
the 8 MiB blob cap (snowsql/types.go:19-21) and S1 option building."""

from __future__ import annotations

import duckdb
import pytest

from tidb2dw_spark.schema.types import (
    MAX_BLOB_BYTES,
    UnsupportedTypeError,
    table_def_to_struct,
    tidb_type_to_spark,
)
from tidb2dw_spark.sources.introspect import (
    INFORMATION_SCHEMA_COLUMNS_QUERY,
    fold_precision,
    introspect_options,
    table_def_from_introspection,
)
from tidb2dw_spark.sources.jdbc import TidbSource, snapshot_read_options


def _fetch_columns(con, schema: str, table: str) -> list[dict]:
    q = INFORMATION_SCHEMA_COLUMNS_QUERY.format(schema=schema, table=table)
    cur = con.execute(q)
    names = [d[0] for d in cur.description]
    return [dict(zip(names, row)) for row in cur.fetchall()]


INDEX_ROWS = [
    {"Key_name": "PRIMARY", "Seq_in_index": 2, "Column_name": "sub_id"},
    {"Key_name": "PRIMARY", "Seq_in_index": 1, "Column_name": "id"},
    {"Key_name": "idx_other", "Seq_in_index": 1, "Column_name": "name"},
]


def test_introspection_from_embedded_catalog():
    con = duckdb.connect()
    con.execute("CREATE SCHEMA tpch")
    con.execute(
        "CREATE TABLE tpch.users ("
        " id BIGINT NOT NULL, sub_id INTEGER NOT NULL,"
        " name VARCHAR(255), bal DECIMAL(12, 2), born DATE,"
        " note VARCHAR DEFAULT 'x')"
    )
    rows = _fetch_columns(con, "tpch", "users")
    td = table_def_from_introspection("tpch", "users", rows, INDEX_ROWS)

    assert [c.name for c in td.columns] == ["id", "sub_id", "name", "bal", "born", "note"]
    # D2: PK order comes from (Key_name, Seq_in_index), not catalog order
    assert td.pk_columns == ["id", "sub_id"]
    by_name = {c.name: c for c in td.columns}
    assert by_name["id"].nullable == "false" and by_name["name"].nullable == "true"
    # ddl.go:155-162 precision folding: numeric precision/scale (DuckDB's
    # catalog stores VARCHAR unbounded, so char length stays empty here;
    # the MySQL-shaped fold path is covered in test_fold_precision_*)
    assert by_name["bal"].precision == "12" and by_name["bal"].scale == "2"
    assert by_name["note"].default is not None
    # the folded definition renders to a usable Spark schema
    struct = table_def_to_struct(td)
    assert struct["bal"].dataType.simpleString() == "decimal(12,2)"
    # round-trips through the schema-file contract (S5)
    td2 = type(td).from_json_dict(td.to_json_dict())
    assert td2.pk_columns == ["id", "sub_id"]


def test_virtual_generated_columns_skipped():
    rows = [
        {"column_name": "id", "ordinal_position": 1, "data_type": "bigint",
         "is_nullable": "NO", "numeric_precision": 19},
        {"column_name": "v", "ordinal_position": 2, "data_type": "varchar",
         "is_nullable": "YES", "extra": "VIRTUAL GENERATED",
         "character_maximum_length": 10},
    ]
    td = table_def_from_introspection("s", "t", rows, [])
    assert [c.name for c in td.columns] == ["id"]


def test_fold_precision_first_nonnull_wins():
    assert fold_precision({"character_maximum_length": 255, "numeric_precision": 10}) == "255"
    assert fold_precision({"numeric_precision": 12, "datetime_precision": 6}) == "12"
    assert fold_precision({"datetime_precision": 6}) == "6"
    assert fold_precision({}) == ""


def test_blob_size_cap():
    # within cap / unspecified small types: fine
    assert tidb_type_to_spark("blob").simpleString() == "binary"
    assert tidb_type_to_spark("mediumblob", precision=str(MAX_BLOB_BYTES)).simpleString() == "binary"
    # over cap (declared or intrinsic): rejected like snowsql/types.go:19-21
    with pytest.raises(UnsupportedTypeError):
        tidb_type_to_spark("mediumblob")
    with pytest.raises(UnsupportedTypeError):
        tidb_type_to_spark("longblob", precision=str(MAX_BLOB_BYTES + 1))
    # escape hatch for engines without the cap
    assert tidb_type_to_spark("longblob", allow_large_blobs=True).simpleString() == "binary"


def test_jdbc_option_builders():
    src = TidbSource(host="h", port=4000, database="tpch", user="u", password="p")
    opts = snapshot_read_options(
        src, "orders", snapshot_tso=449348, partition_column="o_orderkey",
        lower_bound=0, upper_bound=1000, num_partitions=16,
    )
    assert opts["sessionInitStatement"] == "SET SESSION tidb_snapshot = 449348"
    assert opts["numPartitions"] == "16" and opts["partitionColumn"] == "o_orderkey"
    iopts = introspect_options(src, "tpch", "orders")
    assert iopts["url"].endswith("/tpch")
    assert "information_schema.columns" in iopts["dbtable"]
    assert "table_name = 'orders'" in iopts["dbtable"]


def test_jdbc_partitioned_snapshot_read_executes(spark):
    """S1 smoke: the snapshot_read_options shape drives a REAL
    spark.read.format('jdbc') partitioned read against embedded Derby
    (on Spark's default classpath).  Proves the JDBC plumbing end-to-end —
    url/driver/dbtable/partitionColumn/bounds — minus only the
    MySQL-specific sessionInitStatement fence (option-built and asserted
    separately in test_jdbc_option_builders)."""
    jvm = spark.sparkContext._jvm
    url = "jdbc:derby:memory:tidb2dw_smoke;create=true"
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    try:
        st.execute("CREATE TABLE orders (o_orderkey BIGINT, o_status VARCHAR(2))")
        for k in range(20):
            st.execute(f"INSERT INTO orders VALUES ({k}, 'S{k % 2}')")
    finally:
        st.close()
        conn.close()

    src = TidbSource(host="ignored", port=0, database="ignored", user="app", password="")
    opts = snapshot_read_options(
        src,
        "orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        url=url,
    )
    df = spark.read.format("jdbc").options(**opts).load()
    assert df.rdd.getNumPartitions() == 4  # parallel read, not single-split
    rows = {r["O_ORDERKEY"]: r["O_STATUS"] for r in df.collect()}
    assert len(rows) == 20 and rows[3] == "S1" and rows[4] == "S0"
