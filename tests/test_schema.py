"""Schema engine: type map, CRC'd schema files, the D4 column-diff fixture.

The diff fixture is the reference's own (pkg/tidbsql/ddl_test.go:11-88) —
the only unit-test data the reference has, ported as our regression anchor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tidb2dw_spark.schema import (
    DiffAction,
    TableCol,
    TableDefinition,
    diff_columns,
    load_schema_file,
    tidb_type_to_spark,
    table_def_to_struct,
)


def users_v1() -> list[TableCol]:
    return [
        TableCol(id="1", name="id", tp="int", precision="11", is_pk="true"),
        TableCol(id="2", name="name", tp="varchar", precision="255"),
        TableCol(id="3", name="age", tp="int"),
        TableCol(id="4", name="birth", tp="date"),
    ]


def users_v2() -> list[TableCol]:
    return [
        TableCol(id="5", name="id", tp="char", precision="10", is_pk="true"),
        TableCol(id="2", name="color", tp="varchar", precision="255"),
        TableCol(id="4", name="birth", tp="date"),
        TableCol(id="6", name="gender", tp="varchar", precision="10"),
    ]


def test_diff_fixture_actions():
    actions = {
        (d.prev.name if d.prev else None, d.curr.name if d.curr else None): d.action
        for d in diff_columns(users_v1(), users_v2())
    }
    assert actions == {
        ("id", "id"): DiffAction.MODIFY,       # type change via new column ID
        ("name", "color"): DiffAction.RENAME,  # same ID, same attrs
        ("birth", "birth"): DiffAction.UNCHANGE,
        (None, "gender"): DiffAction.ADD,
        ("age", None): DiffAction.DROP,
    }


def test_diff_is_symmetric_on_identity():
    cols = users_v1()
    assert all(d.action == DiffAction.UNCHANGE for d in diff_columns(cols, cols))


@pytest.mark.parametrize(
    "tp,precision,scale,expected",
    [
        ("int", "11", "", T.IntegerType()),
        ("bigint", "", "", T.LongType()),
        ("bigint unsigned", "", "", T.DecimalType(20, 0)),
        ("int unsigned", "", "", T.LongType()),
        ("tinyint", "", "", T.IntegerType()),
        ("year", "", "", T.IntegerType()),
        ("float", "", "", T.FloatType()),
        ("double", "", "", T.DoubleType()),
        ("decimal", "12", "3", T.DecimalType(12, 3)),
        ("bit", "", "", T.BooleanType()),
        ("varchar", "255", "", T.StringType()),
        ("json", "", "", T.StringType()),
        ("enum", "", "", T.StringType()),
        ("set", "", "", T.StringType()),
        ("time", "", "", T.StringType()),
        ("date", "", "", T.DateType()),
        ("datetime", "", "", T.TimestampType()),
        ("timestamp", "", "", T.TimestampType()),
        ("varbinary", "", "", T.BinaryType()),
        # longblob exceeds the 8 MiB warehouse binary cap → rejected unless
        # allow_large_blobs (snowsql/types.go:19-21 parity; see
        # tests/test_introspection.py::test_blob_size_cap)
        ("blob", "", "", T.BinaryType()),
    ],
)
def test_type_map(tp, precision, scale, expected):
    assert tidb_type_to_spark(tp, precision, scale) == expected


def test_schema_file_roundtrip(tmp_path):
    td = TableDefinition(schema="tpch", table="users", version=7, columns=users_v1())
    path = td.dump(tmp_path)
    assert path.name == f"schema_7_{td.checksum()}.json"
    loaded = load_schema_file(path)
    assert loaded.version == 7
    assert loaded.pk_columns == ["id"]
    assert [c.name for c in loaded.columns] == ["id", "name", "age", "birth"]


def test_schema_file_checksum_rejects_tamper(tmp_path):
    td = TableDefinition(schema="tpch", table="users", version=7, columns=users_v1())
    path = td.dump(tmp_path)
    text = path.read_text().replace('"name"', '"nom"')
    path.write_text(text)
    with pytest.raises(ValueError, match="checksum"):
        load_schema_file(path)


def test_table_def_to_struct():
    td = TableDefinition(schema="tpch", table="users", version=1, columns=users_v1())
    st = table_def_to_struct(td)
    assert [f.dataType for f in st.fields] == [
        T.IntegerType(), T.StringType(), T.IntegerType(), T.DateType(),
    ]


def test_apply_diffs_modify_add_default_and_pk_rename(spark, tmp_path):
    """MODIFY casts in place, ADD backfills the declared default, and a
    PK-column RENAME updates the manifest key list so merges keep working."""
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol
    from tidb2dw_spark.table.managed import ManagedTable

    prev = [
        TableCol(id="1", name="id", tp="int", precision="11", is_pk="true"),
        TableCol(id="2", name="score", tp="int"),
    ]
    # rename id->uid keeps id/attrs; modify score int->varchar via new col ID;
    # add flag with default
    curr = [
        TableCol(id="1", name="uid", tp="int", precision="11", is_pk="true"),
        TableCol(id="4", name="score", tp="varchar", precision="10"),
        TableCol(id="5", name="flag", tp="int", default="7"),
    ]
    df = spark.createDataFrame([(1, 10), (2, 20)], "id int, score int")
    t = ManagedTable(tmp_path / "t").create(df, ["id"])
    diffs = diff_columns(prev, curr)
    apply_column_diffs(spark, t, diffs)
    assert t.pk_cols() == ["uid"]
    out = t.read(spark)
    assert out.columns == ["uid", "score", "flag"]
    assert dict(out.dtypes)["score"] == "string"
    rows = {r["uid"]: r for r in out.collect()}
    assert rows[1]["score"] == "10" and rows[1]["flag"] == 7


def test_add_after_metadata_only_drop_does_not_resurrect(spark, tmp_path):
    """Metadata-only DROP leaves the column physically present in old
    version dirs; a later ADD of the SAME name must not resurrect the
    stale cells — the tombstone forces the rewrite path, so every row
    reads the new column's default."""
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol
    from tidb2dw_spark.table.managed import ManagedTable

    v1 = [
        TableCol(id="1", name="id", tp="int", precision="11", is_pk="true"),
        TableCol(id="2", name="note", tp="varchar", precision="10"),
    ]
    v2 = [v1[0]]  # DROP note
    v3 = [  # ADD note back with a default (new column identity)
        v1[0],
        TableCol(id="3", name="note", tp="varchar", precision="10", default="fresh"),
    ]
    df = spark.createDataFrame([(1, "stale1"), (2, "stale2")], "id int, note string")
    t = ManagedTable(tmp_path / "t").create(df, ["id"], pk_buckets=2)
    v_before = t.version()

    apply_column_diffs(spark, t, diff_columns(v1, v2))
    assert t.version() == v_before  # metadata-only: no data rewrite
    assert t.manifest().get("dropped_columns") == ["note"]
    assert t.read(spark).columns == ["id"]

    apply_column_diffs(spark, t, diff_columns(v2, v3))
    assert t.version() > v_before  # tombstone collision forced a rewrite
    assert t.manifest().get("dropped_columns") == []
    rows = {r["id"]: r["note"] for r in t.read(spark).collect()}
    assert rows == {1: "fresh", 2: "fresh"}  # stale1/stale2 must NOT return


def test_drop_of_pk_column_is_rejected(spark, tmp_path):
    """A DROP targeting a primary-key column must fail at the barrier
    (manifest 'pk' would otherwise dangle and break every later merge)."""
    import pytest

    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import UnsupportedDDLError, apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol
    from tidb2dw_spark.table.managed import ManagedTable

    v1 = [
        TableCol(id="1", name="id", tp="int", precision="11", is_pk="true"),
        TableCol(id="2", name="x", tp="int"),
    ]
    v2 = [TableCol(id="2", name="x", tp="int")]  # drops the PK column
    df = spark.createDataFrame([(1, 10)], "id int, x int")
    t = ManagedTable(tmp_path / "t").create(df, ["id"])
    with pytest.raises(UnsupportedDDLError, match="primary-key"):
        apply_column_diffs(spark, t, diff_columns(v1, v2))


def test_widening_modify_is_metadata_only(spark, tmp_path):
    """MODIFY int→bigint on a non-PK column commits as a pure manifest
    swap (warehouse ALTER COLUMN TYPE parity): no rewrite, old files cast
    up on read, and a post-DDL merge carrying the wide type lands
    correctly against pre-DDL rows."""
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol
    from tidb2dw_spark.table.managed import ManagedTable

    v1 = [
        TableCol(id="1", name="id", tp="int", precision="11", is_pk="true"),
        TableCol(id="2", name="qty", tp="int"),
    ]
    v2 = [v1[0], TableCol(id="4", name="qty", tp="bigint")]
    df = spark.createDataFrame([(1, 10), (2, 20)], "id int, qty int")
    t = ManagedTable(tmp_path / "t").create(df, ["id"], pk_buckets=2)
    v_before = t.version()

    apply_column_diffs(spark, t, diff_columns(v1, v2))
    assert t.version() == v_before  # no rewrite
    assert t.history()[-1]["action"] == "evolve"
    out = t.read(spark)
    assert dict(out.dtypes)["qty"] == "bigint"
    assert {r["id"]: r["qty"] for r in out.collect()} == {1: 10, 2: 20}

    batch = spark.createDataFrame(
        [("U", "t", "s", 5, 2, 9_999_999_999)],
        "flag string, tablename string, schemaname string, commit_ts long, "
        "id int, qty long",
    )
    t.merge(spark, batch)
    assert {r["id"]: r["qty"] for r in t.read(spark).collect()} == {
        1: 10, 2: 9_999_999_999,
    }


def test_widening_modify_of_bucketed_pk_rewrites(spark, tmp_path):
    """Widening a BUCKET KEY's type cannot be metadata-only: Spark hashes
    int32 and int64 renderings of the same value differently, so new
    batches would land in different buckets than the rows they must merge
    with.  The rewrite path re-buckets under the new type, after which a
    wide-typed merge still finds its row (no silent duplicates)."""
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol
    from tidb2dw_spark.table.managed import ManagedTable

    v1 = [
        TableCol(id="1", name="id", tp="int", precision="11", is_pk="true"),
        TableCol(id="2", name="qty", tp="int"),
    ]
    v2 = [TableCol(id="4", name="id", tp="bigint", is_pk="true"), v1[1]]
    df = spark.createDataFrame([(1, 10), (2, 20)], "id int, qty int")
    t = ManagedTable(tmp_path / "t").create(df, ["id"], pk_buckets=2)
    v_before = t.version()

    apply_column_diffs(spark, t, diff_columns(v1, v2))
    assert t.version() == v_before + 1  # rewrite: re-bucketed under bigint
    assert dict(t.read(spark).dtypes)["id"] == "bigint"

    batch = spark.createDataFrame(
        [("U", "t", "s", 5, 2, 99)],
        "flag string, tablename string, schemaname string, commit_ts long, "
        "id long, qty int",
    )
    t.merge(spark, batch)
    rows = t.read(spark).collect()
    assert len(rows) == 2  # the update merged, it did not duplicate
    assert {r["id"]: r["qty"] for r in rows} == {1: 10, 2: 99}


def test_narrowing_modify_still_rewrites(spark, tmp_path):
    """A lossy MODIFY (bigint→int) must take the rewrite path — a
    metadata-only cast-on-read could silently truncate old cells."""
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol
    from tidb2dw_spark.table.managed import ManagedTable

    v1 = [
        TableCol(id="1", name="id", tp="int", precision="11", is_pk="true"),
        TableCol(id="2", name="qty", tp="bigint"),
    ]
    v2 = [v1[0], TableCol(id="4", name="qty", tp="int")]
    df = spark.createDataFrame([(1, 10)], "id int, qty long")
    t = ManagedTable(tmp_path / "t").create(df, ["id"], pk_buckets=2)
    v_before = t.version()
    apply_column_diffs(spark, t, diff_columns(v1, v2))
    assert t.version() == v_before + 1
    assert dict(t.read(spark).dtypes)["qty"] == "int"
