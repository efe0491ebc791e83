"""CLI surface: discovery, table listing, replicate modes, error paths.

Reference parity: main.go subcommands + cmd/core.go run modes — exercised
against the same staging layout the consumer tests use.
"""

from __future__ import annotations

import json

import pytest

from tidb2dw_spark.cli import discover_table_defs, main

from .test_consumer import users_def_v1, write
from .test_replicate import _layout, pets_def


def test_discover_table_defs(tmp_path):
    _layout(tmp_path)
    defs = discover_table_defs(tmp_path / "increment")
    assert sorted(defs) == ["tpch.pets", "tpch.users"]
    assert defs["tpch.users"].pk_columns == ["id"]


def test_discover_picks_lowest_version(tmp_path):
    incr = tmp_path / "increment"
    d1 = users_def_v1()
    d2 = users_def_v1()
    d2.version = 7
    d2.dump(incr / "tpch/users/7/meta")
    d1.dump(incr / "tpch/users/1/meta")
    defs = discover_table_defs(incr)
    assert defs["tpch.users"].version == 1


def test_tables_command(tmp_path, capsys):
    _layout(tmp_path)
    assert main(["tables", "--storage-dir", str(tmp_path)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert [t["table"] for t in out] == ["tpch.pets", "tpch.users"]
    assert out[1]["pk"] == ["id"]


def test_replicate_full(spark, tmp_path, capsys):
    _layout(tmp_path)
    wh = tmp_path / "wh"
    rc = main(
        [
            "replicate",
            "--storage-dir",
            str(tmp_path),
            "--warehouse-dir",
            str(wh),
        ]
    )
    assert rc == 0
    status = json.loads(capsys.readouterr().out)
    assert status["tables"]["tpch.users"]["stage"] == "incremental"
    # users: snapshot (1,2) then D of 2 → {1}; pets: 3 + insert → 4 rows
    from tidb2dw_spark.table.managed import ManagedTable

    assert {r["id"] for r in ManagedTable(wh / "users").read(spark).collect()} == {1}
    assert ManagedTable(wh / "pets").read(spark).count() == 4


def test_replicate_snapshot_only(spark, tmp_path, capsys):
    _layout(tmp_path)
    wh = tmp_path / "wh"
    rc = main(
        [
            "replicate",
            "--storage-dir",
            str(tmp_path),
            "--warehouse-dir",
            str(wh),
            "--mode",
            "snapshot-only",
            "--tables",
            "tpch.users",
        ]
    )
    assert rc == 0
    from tidb2dw_spark.table.managed import ManagedTable

    # snapshot only: the delete in the changelog is NOT applied
    assert {r["id"] for r in ManagedTable(wh / "users").read(spark).collect()} == {1, 2}
    assert not (wh / "pets").exists()  # --tables filter respected


def test_replicate_incremental_only_after_snapshot(spark, tmp_path, capsys):
    _layout(tmp_path)
    wh = tmp_path / "wh"
    assert main(
        ["replicate", "--storage-dir", str(tmp_path), "--warehouse-dir", str(wh),
         "--mode", "snapshot-only"]
    ) == 0
    capsys.readouterr()
    assert main(
        ["replicate", "--storage-dir", str(tmp_path), "--warehouse-dir", str(wh),
         "--mode", "incremental-only"]
    ) == 0
    from tidb2dw_spark.table.managed import ManagedTable

    assert {r["id"] for r in ManagedTable(wh / "users").read(spark).collect()} == {1}


def test_replicate_loop_incremental_only(spark, tmp_path, capsys):
    _layout(tmp_path)
    wh = tmp_path / "wh"
    assert main(
        ["replicate", "--storage-dir", str(tmp_path), "--warehouse-dir", str(wh),
         "--mode", "snapshot-only"]
    ) == 0
    capsys.readouterr()
    rc = main(
        ["replicate", "--storage-dir", str(tmp_path), "--warehouse-dir", str(wh),
         "--mode", "incremental-only", "--loop", "--max-polls", "2",
         "--poll-interval", "0.05"]
    )
    assert rc == 0
    from tidb2dw_spark.table.managed import ManagedTable

    # two polls, same file: checkpoint markers make the merge idempotent
    assert {r["id"] for r in ManagedTable(wh / "users").read(spark).collect()} == {1}


def test_optimize_command(spark, tmp_path, capsys):
    """optimize compacts fragmented managed tables and vacuums the
    versions compaction orphaned."""
    from pyspark.sql import functions as F

    from tidb2dw_spark.table.managed import ManagedTable

    wh = tmp_path / "wh"
    base = spark.range(100).select(F.col("id").alias("k"), F.lit("v").alias("val"))
    ManagedTable(wh / "tpch.users").create(base.repartition(8), ["k"], pk_buckets=2)
    rc = main(
        ["optimize", "--warehouse-dir", str(wh), "--max-files-per-bucket", "1"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report == [
        {
            "table": "tpch.users",
            "compacted_to_version": 2,
            "vacuumed_versions": [1],
            "version": 2,
        }
    ]
    assert ManagedTable(wh / "tpch.users").read(spark).count() == 100


def test_unknown_table_filter_fails(tmp_path):
    _layout(tmp_path)
    with pytest.raises(SystemExit):
        main(
            ["replicate", "--storage-dir", str(tmp_path), "--warehouse-dir",
             str(tmp_path / "wh"), "--tables", "tpch.nope"]
        )


def test_empty_layout_returns_error(tmp_path, capsys):
    assert main(
        ["replicate", "--storage-dir", str(tmp_path), "--warehouse-dir",
         str(tmp_path / "wh")]
    ) == 1


def test_optimize_cluster_by_collects_zone_maps(spark, tmp_path, capsys):
    """--cluster-by on a plain table range-clusters it and stores per-file
    zone maps; bucketed tables in the same run are untouched by it."""
    from pyspark.sql import functions as F

    from tidb2dw_spark.table.managed import ManagedTable

    wh = tmp_path / "whz"
    base = spark.range(5000).select(F.col("id").alias("k"), F.col("id").alias("ts_k"))
    ManagedTable(wh / "tpch.plain").create(base.repartition(6), ["k"])
    rc = main(
        ["optimize", "--warehouse-dir", str(wh),
         "--max-files-per-bucket", "64",      # don't compact — cluster only
         "--cluster-by", "ts_k",
         "--target-bytes", str(8 << 10)]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report[0]["clustered_to_version"] == 2
    t = ManagedTable(wh / "tpch.plain")
    stats = t.manifest()["file_stats"]
    assert stats["version"] == t.version() and stats["cols"] == ["ts_k"]
    assert len(stats["files"]) > 1
    pruned = t.read_range(spark, "ts_k", 0, 100)
    assert pruned.count() == 101
    scanned = pruned.select(F.input_file_name().alias("f")).distinct().count()
    assert scanned < len(stats["files"])


def test_replicate_source_attached_jdbc(spark, tmp_path, capsys):
    """`replicate --jdbc-url ...` runs the source-attached lifecycle: the
    snapshot reads live from a JDBC database (embedded Derby), split
    bounds are derived by the min/max probe over the integer PK, and the
    CDC increments merge on top — no snapshot/ directory at all."""
    url = "jdbc:derby:memory:tidb2dw_cli_e2e;create=true"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    try:
        st.execute(
            "CREATE TABLE users (id INT PRIMARY KEY, name VARCHAR(255),"
            " age INT, birth DATE)"
        )
        for k in range(1, 7):
            st.execute(
                f"INSERT INTO users VALUES ({k}, 'u{k}', {20 + k}, '1990-01-01')"
            )
    finally:
        st.close()
        conn.close()

    incr = tmp_path / "increment"
    users_def_v1().dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"u1x",31,1990-01-01\n'
          '"D","users","tpch",101,2,"u2",22,1990-01-01\n')

    rc = main([
        "replicate",
        "--storage-dir", str(tmp_path),
        "--warehouse-dir", str(tmp_path / "wh"),
        "--jdbc-url", url,
        "--jdbc-driver", "org.apache.derby.jdbc.EmbeddedDriver",
        "--jdbc-user", "app",
        "--jdbc-num-partitions", "3",
    ])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["tables"]["tpch.users"]["stage"] == "incremental"

    from tidb2dw_spark.table.managed import ManagedTable

    rows = {
        r["id"]: r
        for r in ManagedTable(tmp_path / "wh" / "users").read(spark).collect()
    }
    assert set(rows) == {1, 3, 4, 5, 6}
    assert rows[1]["name"] == "u1x" and rows[3]["name"] == "u3"


def test_replicate_full_mor(spark, tmp_path, capsys):
    """--merge-mode mor --pk-buckets N: the whole replicate lifecycle on
    merge-on-read tables — CDC polls commit deltas, reads resolve LWW."""
    _layout(tmp_path)
    wh = tmp_path / "wh_mor"
    rc = main(
        [
            "replicate",
            "--storage-dir", str(tmp_path),
            "--warehouse-dir", str(wh),
            "--pk-buckets", "4",
            "--merge-mode", "mor",
        ]
    )
    assert rc == 0
    from tidb2dw_spark.table.managed import ManagedTable

    users = ManagedTable(wh / "users")
    assert users.manifest()["merge_mode"] == "mor"
    assert users.manifest()["delta_seq"] >= 1  # CDC landed as deltas
    assert {r["id"] for r in users.read(spark).collect()} == {1}
    assert ManagedTable(wh / "pets").read(spark).count() == 4


def test_optimize_zorder_and_bloom_flags(spark, tmp_path, capsys):
    """optimize --cluster-by a,b --zorder --bloom-cols a collects both
    stat kinds and read_eq prunes through them."""
    import json as _json

    from pyspark.sql import functions as F

    from tidb2dw_spark.table.managed import ManagedTable

    wh = tmp_path / "wh"
    df = spark.range(2000).select(
        F.col("id").alias("pk"),
        (F.col("id") % 40).alias("x"),
        (F.col("id") / 40).cast("long").alias("y"),
    )
    ManagedTable(wh / "grid").create(df, pk_cols=["pk"])
    rc = main(
        [
            "optimize",
            "--warehouse-dir", str(wh),
            "--cluster-by", "x,y",
            "--zorder",
            "--target-bytes", str(4 << 10),
            "--bloom-cols", "x",
        ]
    )
    assert rc == 0
    report = _json.loads(capsys.readouterr().out)
    assert report[0]["clustered_to_version"] is not None
    t = ManagedTable(wh / "grid")
    assert t.manifest()["file_stats"]["cols"] == ["x", "y"]
    assert "x" in t.manifest()["bloom_stats"]["cols"]
    got = t.read_eq(spark, "x", 7)
    assert got.count() == 50
