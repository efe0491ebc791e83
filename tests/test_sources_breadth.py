"""Dialect CSV variants, JDBC option builder, DDL reject semantics, O2."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.schema.evolve import (
    UnsupportedDDLError,
    guard_ddl_action,
)
from tidb2dw_spark.schema.table_def import pk_columns_from_index_rows
from tidb2dw_spark.sources.dialects import (
    DIALECTS,
    decode_staged_binary,
    encode_staged_binary,
)
from tidb2dw_spark.sources.jdbc import TidbSource, current_tso_query, snapshot_read_options


@pytest.mark.parametrize("dialect,enc", [
    ("default", "hex"), ("snowflake", "hex"), ("redshift", "hex"),
    ("bigquery", "base64"), ("databricks", None),
])
def test_dialect_binary_roundtrip(spark, dialect, enc):
    df = spark.createDataFrame([(1, bytearray(b"\x00\xffhi"))], ["id", "blob"])
    staged = encode_staged_binary(df, ["blob"], dialect)
    if enc is None:
        assert staged.collect()[0]["blob"] == bytearray(b"\x00\xffhi")
        return
    staged_val = staged.collect()[0]["blob"]
    assert isinstance(staged_val, str)
    back = decode_staged_binary(staged, ["blob"], dialect).collect()[0]["blob"]
    assert bytes(back) == b"\x00\xffhi"
    assert DIALECTS[dialect].binary_encoding == enc


def test_jdbc_snapshot_options_tso_fence():
    src = TidbSource("tidb.example", 4000, "tpch", "root")
    opts = snapshot_read_options(
        src, "orders", snapshot_tso=449348000000000000,
        partition_column="o_orderkey", num_partitions=16,
        lower_bound=1, upper_bound=1_500_000,
    )
    assert opts["url"] == "jdbc:mysql://tidb.example:4000/tpch"
    assert opts["sessionInitStatement"] == "SET SESSION tidb_snapshot = 449348000000000000"
    assert opts["numPartitions"] == "16"
    assert current_tso_query() == "SELECT @@tidb_current_ts"


def test_jdbc_partition_bounds_required():
    src = TidbSource("h", 4000, "d", "u")
    with pytest.raises(ValueError, match="lower_bound"):
        snapshot_read_options(src, "t", partition_column="id")


@pytest.mark.parametrize("action", ["create-table", "rename-table"])
def test_ddl_rejects(action):
    with pytest.raises(UnsupportedDDLError, match="cannot be replicated"):
        guard_ddl_action(action)


@pytest.mark.parametrize("action", ["add-column", "truncate-table", "drop-table"])
def test_ddl_supported(action):
    guard_ddl_action(action)  # no raise


def test_pk_columns_from_index_rows():
    rows = [
        {"Key_name": "idx_name", "Seq_in_index": 1, "Column_name": "name"},
        {"Key_name": "PRIMARY", "Seq_in_index": 2, "Column_name": "l_linenumber"},
        {"Key_name": "PRIMARY", "Seq_in_index": 1, "Column_name": "l_orderkey"},
    ]
    assert pk_columns_from_index_rows(rows) == ["l_orderkey", "l_linenumber"]


def test_csv_null_vs_empty_vs_quoted_newline(spark, tmp_path):
    """Staging-contract edge semantics (SURVEY §7 hard-part 4): \\N is NULL,
    an empty field is the empty string (EMPTY_FIELD_AS_NULL=FALSE parity,
    snowsql/sql.go:23), and quoted embedded newlines survive
    (AllowQuotedNewlines parity, bigquerysql/operation.go:38)."""
    from pyspark.sql import types as T

    from tidb2dw_spark.sources.snapshot import read_snapshot_csv

    p = tmp_path / "tpch.t.000000001.csv"
    p.write_text('1,\\N\n2,""\n3,"line1\nline2"\n4,plain\n')
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("s", T.StringType()),
        ]
    )
    rows = {r["id"]: r["s"] for r in read_snapshot_csv(spark, str(p), schema).collect()}
    assert rows[1] is None          # \N → NULL
    assert rows[2] == ""            # quoted empty → empty string, NOT null
    assert rows[3] == "line1\nline2"  # quoted newline preserved
    assert rows[4] == "plain"
    assert len(rows) == 4           # the embedded newline did not split a row


def test_json_changelog_equals_csv_path(spark, tmp_path):
    """The JSON-lines changelog reader must feed the merge pipeline with a
    frame identical to the CSV reader's (same envelope schema, nulls,
    timestamps) — format is a transport detail, not a semantics change."""
    from tidb2dw_spark.operators.merge import apply_changelog
    from tidb2dw_spark.schema.types import table_def_to_struct
    from tidb2dw_spark.sources.envelope import envelope_schema
    from tidb2dw_spark.sources.snapshot import (
        read_changelog_json,
        write_changelog_json,
    )

    from .test_consumer import users_def_v1

    payload = table_def_to_struct(users_def_v1())
    env = envelope_schema(payload)
    rows = [
        ("U", "users", "tpch", 100, 1, "alice2", 31, None),
        ("I", "users", "tpch", 101, 4, "dave", None, None),
        ("D", "users", "tpch", 200, 2, "bob", None, None),
    ]
    batch = spark.createDataFrame(rows, env)
    write_changelog_json(batch, str(tmp_path / "cdc_json"))
    back = read_changelog_json(spark, str(tmp_path / "cdc_json"), env)
    # JSON sources mark every field nullable; names and types must match
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in env.fields
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, batch.collect()))

    target = spark.createDataFrame(
        [(1, "alice", 30, None), (2, "bob", None, None), (3, "carol", 41, None)],
        payload,
    )
    merged = {r["id"]: r for r in apply_changelog(target, back, ["id"]).collect()}
    assert set(merged) == {1, 3, 4}
    assert merged[1]["name"] == "alice2" and merged[4]["name"] == "dave"
