"""End-to-end incremental consumer: snapshot load → ordered CDC merge →
DDL barrier (schema evolution) → post-DDL merge → resume idempotence.

Exercises the full SURVEY §3.1 lifecycle on the staging layout the
reference's exporter produces (FIXTURES.md §2)."""

from __future__ import annotations

from pathlib import Path

from tidb2dw_spark.schema.table_def import TableCol, TableDefinition
from tidb2dw_spark.schema.types import table_def_to_struct
from tidb2dw_spark.sources.snapshot import read_snapshot_csv
from tidb2dw_spark.streaming.consumer import IncrementConsumer
from tidb2dw_spark.table.managed import ManagedTable


def users_def_v1() -> TableDefinition:
    return TableDefinition(
        schema="tpch",
        table="users",
        version=1,
        columns=[
            TableCol(id="1", name="id", tp="int", precision="11", is_pk="true"),
            TableCol(id="2", name="name", tp="varchar", precision="255"),
            TableCol(id="3", name="age", tp="int"),
            TableCol(id="4", name="birth", tp="date"),
        ],
    )


def users_def_v2() -> TableDefinition:
    return TableDefinition(
        schema="tpch",
        table="users",
        version=2,
        query="ALTER TABLE users ...",
        columns=[
            TableCol(id="1", name="id", tp="int", precision="11", is_pk="true"),
            TableCol(id="2", name="color", tp="varchar", precision="255"),
            TableCol(id="4", name="birth", tp="date"),
            TableCol(id="6", name="gender", tp="varchar", precision="10"),
        ],
    )


def write(p: Path, text: str) -> None:
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)


def test_full_lifecycle(spark, tmp_path):
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    # snapshot: 4 rows, dumpling layout <db>.<table>.<n>.csv, \N null
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",\\N,1991-02-02\n')
    write(snap / "tpch.users.000000002.csv",
          '3,"carol",41,1992-03-03\n4,"dan",52,1993-04-04\n')

    v1 = users_def_v1()
    snap_df = read_snapshot_csv(
        spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)
    )
    table = ManagedTable(tmp_path / "warehouse" / "users").create(
        snap_df, v1.pk_columns
    )
    assert table.read(spark).count() == 4

    # increment stream, version 1
    v1.dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"alice2",31,1990-01-01\n'
          '"I","users","tpch",101,5,"eve",25,1995-05-05\n')
    write(incr / "tpch/users/1/2024-01-01/CDC000002.csv",
          '"D","users","tpch",200,2,"bob",\\N,1991-02-02\n'
          '"U","users","tpch",201,5,"eve2",26,1995-05-05\n')

    consumer = IncrementConsumer(spark, incr, table)
    report = consumer.poll_once()
    assert report.files_processed == 2
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert set(rows) == {1, 3, 4, 5}
    assert rows[1]["name"] == "alice2"
    assert rows[5]["name"] == "eve2" and rows[5]["age"] == 26

    # checkpoint markers written next to each merged file
    assert (incr / "tpch/users/1/2024-01-01/CDC000001.csv.checkpoint").exists()

    # DDL barrier: v2 renames name→color, drops age, adds gender
    v2 = users_def_v2()
    v2.dump(incr / "tpch/users/2/meta")
    write(incr / "tpch/users/2/2024-01-02/CDC000001.csv",
          '"U","users","tpch",300,3,"red",1992-03-03,"f"\n')
    report = consumer.poll_once()
    assert report.ddl_applied == 1
    assert report.files_processed == 1
    df = table.read(spark)
    assert df.columns == ["id", "color", "birth", "gender"]
    rows = {r["id"]: r for r in df.collect()}
    assert rows[3]["color"] == "red" and rows[3]["gender"] == "f"
    assert rows[1]["color"] == "alice2" and rows[1]["gender"] is None

    # resume: a fresh consumer skips checkpointed files, applies only new ones
    write(incr / "tpch/users/2/2024-01-02/CDC000002.csv",
          '"D","users","tpch",400,4,"dan",1993-04-04,\\N\n')
    consumer2 = IncrementConsumer(spark, incr, table)
    report = consumer2.poll_once()
    assert report.files_skipped == 3
    assert report.files_processed == 1
    assert report.ddl_applied == 0  # applied version persisted in manifest
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert set(rows) == {1, 3, 5}
    assert rows[3]["gender"] == "f"  # DDL not re-applied on restart

    # idempotent: nothing new → no-op
    report = consumer2.poll_once()
    assert report.files_processed == 0


def test_bucketed_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """pk_buckets>0: merge() must rewrite only buckets containing batch PKs,
    leave other buckets' files at their old version, and read back the union
    correctly — the O(touched-data) merge path for 100 TB tables."""
    from pyspark.sql import functions as F

    base = spark.range(100).select(
        F.col("id").cast("long").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    t = ManagedTable(tmp_path / "bt").create(base, ["k"], pk_buckets=8)

    batch = spark.createDataFrame(
        [("U", "t", "s", 10, 3, "updated3"),
         ("I", "t", "s", 11, 200, "new200"),
         ("D", "t", "s", 12, 7, None)],
        "flag string, tablename string, schemaname string, commit_ts long, k long, val string",
    )
    v = t.merge(spark, batch)
    assert v == 2
    bv = t.manifest()["bucket_versions"]
    assert set(bv.values()) == {1, 2}  # some buckets untouched at v1
    rows = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert len(rows) == 100  # 100 - 1 delete + 1 insert
    assert rows[3] == "updated3" and rows[200] == "new200" and 7 not in rows

    # replay the same batch: idempotent (same end state)
    t.merge(spark, batch)
    rows2 = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert rows2 == rows

    # delete every key in one bucket → that bucket reads back empty, not error
    all_keys = [r["k"] for r in t.read(spark).collect()]
    wipe = spark.createDataFrame(
        [("D", "t", "s", 20, k, None) for k in all_keys],
        "flag string, tablename string, schemaname string, commit_ts long, k long, val string",
    )
    t.merge(spark, wipe)
    assert t.read(spark).count() == 0


def test_bucketed_key_lookup_prunes_buckets(spark, tmp_path):
    """read_for_keys on a bucketed table must scan only the buckets the
    requested keys hash to, and return exactly the matching rows."""
    from pyspark.sql import functions as F

    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    t = ManagedTable(tmp_path / "bt").create(base, ["k"], pk_buckets=16)
    keys = spark.createDataFrame([(7,), (8,), (9,)], "k long")
    got = {r["k"]: r["val"] for r in t.read_for_keys(spark, keys).collect()}
    assert got == {7: 14, 8: 16, 9: 18}
    # pruning: 3 keys hash to ≤3 of 16 buckets
    m = t.manifest()
    touched = {
        r["b"]
        for r in keys.select(
            t._bucket_expr(["k"], 16).alias("b")
        ).distinct().collect()
    }
    assert len(touched) <= 3 < 16
    # missing keys return nothing
    none = t.read_for_keys(spark, spark.createDataFrame([(5000,)], "k long"))
    assert none.count() == 0


def test_managed_table_versions_and_vacuum(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "k")
    t = ManagedTable(tmp_path / "t").create(df, ["k"], pk_buckets=4)
    assert t.version() == 1
    t.overwrite(t.read(spark).filter("k < 3"))
    assert t.version() == 2
    assert t.read(spark).count() == 3
    assert t.read(spark, version=1).count() == 5  # time travel
    removed = t.vacuum(keep_last=1)
    assert removed == [1]


def test_partitioned_table_changelog_lifecycle(spark, tmp_path):
    """Reference layout for PARTITIONED source tables inserts a partition
    dir between version and date (increment.go:143-151).  Files from
    different partitions carry disjoint-or-overlapping PKs; correctness is
    last-writer-wins by commit_ts ACROSS partitions, and checkpoints are
    per-file as usual."""
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",\\N,1991-02-02\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns,
    )
    v1.dump(incr / "tpch/users/1/meta")
    # partition 17: older update to pk 1; new pk 7
    write(incr / "tpch/users/1/17/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"alice_p17",31,1990-01-01\n'
          '"I","users","tpch",110,7,"grace",27,1997-07-07\n')
    # partition 23: NEWER update to pk 1 (must win), delete pk 2
    write(incr / "tpch/users/1/23/2024-01-01/CDC000001.csv",
          '"U","users","tpch",150,1,"alice_p23",32,1990-01-01\n'
          '"D","users","tpch",160,2,"bob",\\N,1991-02-02\n')

    consumer = IncrementConsumer(spark, incr, table)
    report = consumer.poll_once()
    assert report.files_processed == 2
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert set(rows) == {1, 7}
    assert rows[1]["name"] == "alice_p23"  # cross-partition LWW by commit_ts
    assert (incr / "tpch/users/1/17/2024-01-01/CDC000001.csv.checkpoint").exists()
    assert (incr / "tpch/users/1/23/2024-01-01/CDC000001.csv.checkpoint").exists()

    # resume skips both partitions' checkpointed files
    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 0 and report.files_skipped == 2


def test_consumer_merge_is_bucket_pruned(spark, tmp_path):
    """The consumer's DML path must go through ManagedTable.merge: a CDC
    file touching PKs of ONE bucket rewrites exactly that bucket directory,
    leaving every other bucket's files at the previous version (the
    O(touched-data) commit the reference gets from warehouse MERGE,
    increment.go:249-281)."""
    from pyspark.sql import functions as F

    from tidb2dw_spark.table.managed import BUCKET_COL

    incr = tmp_path / "increment"
    base = spark.range(64).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("n"), F.col("id")).cast("string").alias("name"),
        F.lit(1).alias("age"),
        F.to_date(F.lit("1990-01-01")).alias("birth"),
    )
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        base, v1.pk_columns, pk_buckets=8
    )
    v1.dump(incr / "tpch/users/1/meta")

    # pick two PKs that hash to the SAME bucket so the batch touches one
    n_buckets = 8
    by_bucket: dict[int, list[int]] = {}
    for r in base.select(
        "id", table._bucket_expr(["id"], n_buckets).alias("b")
    ).collect():
        by_bucket.setdefault(r["b"], []).append(r["id"])
    bucket, ids = next((b, v) for b, v in by_bucket.items() if len(v) >= 2)
    write(
        incr / "tpch/users/1/2024-01-01/CDC000001.csv",
        f'"U","users","tpch",100,{ids[0]},"upd",2,1990-01-01\n'
        f'"D","users","tpch",101,{ids[1]},"n",1,1990-01-01\n',
    )

    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 1
    m = table.manifest()
    assert m["version"] == 2
    touched = {b for b, v in m["bucket_versions"].items() if v == 2}
    assert touched == {str(bucket)}  # exactly one bucket rewritten
    v2_dirs = sorted(p.name for p in (tmp_path / "wh" / "users" / "v=2").glob(f"{BUCKET_COL}=*"))
    assert v2_dirs == [f"{BUCKET_COL}={bucket}"]
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert rows[ids[0]]["name"] == "upd" and ids[1] not in rows
    assert len(rows) == 63


def test_cross_partition_lww_stale_ts_in_higher_partition_loses(spark, tmp_path):
    """Adversarial ordering for cross-partition last-writer-wins: the
    HIGHER-numbered partition directory carries the OLDER commit_ts.  With
    per-file blind replacement the stale row would win (applied last); the
    consumer must instead decide by commit_ts across the whole poll batch."""
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv", '1,"alice",30,1990-01-01\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns,
    )
    v1.dump(incr / "tpch/users/1/meta")
    # partition 5: NEWER update (ts 200)
    write(incr / "tpch/users/1/5/2024-01-01/CDC000001.csv",
          '"U","users","tpch",200,1,"newer",31,1990-01-01\n')
    # partition 9 (applied later in path order): STALE update (ts 100)
    write(incr / "tpch/users/1/9/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"stale",30,1990-01-01\n')

    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 2
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert rows[1]["name"] == "newer"  # stale ts in higher partition lost


def test_json_changelog_file_merges(spark, tmp_path):
    """CDC*.json staged files (canal-json stand-in: one envelope object per
    line) must be read as JSON, not decoded as CSV garbage."""
    import json as _json

    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv", '1,"alice",30,1990-01-01\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns,
    )
    v1.dump(incr / "tpch/users/1/meta")
    events = [
        {"flag": "U", "tablename": "users", "schemaname": "tpch",
         "commit_ts": 100, "id": 1, "name": "alice_json", "age": 31,
         "birth": "1990-01-01"},
        {"flag": "I", "tablename": "users", "schemaname": "tpch",
         "commit_ts": 101, "id": 9, "name": "iris", "age": 22,
         "birth": "2000-09-09"},
    ]
    write(incr / "tpch/users/1/2024-01-01/CDC000001.json",
          "\n".join(_json.dumps(e) for e in events) + "\n")

    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 1
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert set(rows) == {1, 9}
    assert rows[1]["name"] == "alice_json" and rows[1]["age"] == 31
    assert rows[9]["name"] == "iris" and str(rows[9]["birth"]) == "2000-09-09"
    assert (incr / "tpch/users/1/2024-01-01/CDC000001.json.checkpoint").exists()


def test_schema_file_gc_after_ddl(spark, tmp_path):
    """increment.go:283-329 parity: applying a DDL barrier deletes schema
    files of older versions and rewrites the current one with Query cleared
    (new checksum, filename updated) — and a restarted consumer still
    resumes correctly from the GC'd state."""
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv", '1,"alice",30,1990-01-01\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns,
    )
    v1.dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"alice2",31,1990-01-01\n')
    consumer = IncrementConsumer(spark, incr, table)
    consumer.poll_once()
    assert len(list((incr / "tpch/users/1/meta").glob("schema_*.json"))) == 1

    v2 = users_def_v2()
    assert v2.query  # fixture carries a DDL statement
    v2.dump(incr / "tpch/users/2/meta")
    write(incr / "tpch/users/2/2024-01-02/CDC000001.csv",
          '"U","users","tpch",300,1,"red",1990-01-01,"f"\n')
    report = consumer.poll_once()
    assert report.ddl_applied == 1

    # older version's schema file GC'd; current rewritten with Query == ""
    assert list((incr / "tpch/users/1/meta").glob("schema_*.json")) == []
    current = list((incr / "tpch/users/2/meta").glob("schema_*.json"))
    assert len(current) == 1
    from tidb2dw_spark.schema.table_def import load_schema_file

    td = load_schema_file(current[0])  # checksum must verify post-rewrite
    assert td.query == "" and td.version == 2

    # restart from the GC'd layout: resumes, no re-applied DDL, no errors
    write(incr / "tpch/users/2/2024-01-02/CDC000002.csv",
          '"I","users","tpch",400,5,"eve","1995-05-05","x"\n')
    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.ddl_applied == 0 and report.files_processed == 1
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert rows[1]["color"] == "red" and rows[5]["color"] == "eve"


def test_read_range_type_mismatch_falls_back_to_scan(spark, tmp_path):
    """Zone-map pruning with a probe type that can't compare against the
    stored stats (Decimal vs JSON float) must degrade to a full scan, not
    raise TypeError on the driver."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("val")
    )
    t = ManagedTable(tmp_path / "t").create(df, ["k"])
    t.analyze(spark, ["val"])
    got = t.read_range(spark, "val", Decimal("10"), Decimal("20")).count()
    assert got == 6  # val in {10,12,14,16,18,20}


def test_consumer_auto_compaction(spark, tmp_path):
    """Opt-in auto-compaction: after the configured number of merge
    commits the consumer bin-packs decayed buckets (one file each) while
    preserving the table contents — the maintenance hook a long-running
    CDC stream needs (every merge writes one file per shuffle task)."""
    from pyspark.sql import functions as F

    from tidb2dw_spark.table.managed import BUCKET_COL

    incr = tmp_path / "increment"
    base = spark.range(32).select(
        F.col("id").cast("int").alias("id"),
        F.lit("x").alias("name"),
        F.lit(1).alias("age"),
        F.to_date(F.lit("1990-01-01")).alias("birth"),
    )
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        base, v1.pk_columns, pk_buckets=4
    )
    v1.dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"u1",2,1990-01-01\n'
          '"U","users","tpch",100,2,"u2",2,1990-01-01\n')

    consumer = IncrementConsumer(
        spark, incr, table, compact_after_merges=1, compact_max_files=0
    )
    report = consumer.poll_once()
    assert report.files_processed == 1
    m = table.manifest()
    # merge bumped to v2, compaction to v3
    assert m["version"] == 3
    for b, v in m["bucket_versions"].items():
        bdir = tmp_path / "wh" / "users" / f"v={v}" / f"{BUCKET_COL}={b}"
        if bdir.exists():
            assert len(list(bdir.glob("*.parquet"))) == 1
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert len(rows) == 32 and rows[1]["name"] == "u1" and rows[2]["name"] == "u2"


def test_same_commit_ts_later_file_wins(spark, tmp_path):
    """TiCDC can emit the same commit_ts for one key across consecutive
    files; the reference applies files serially so the later file's image
    survives.  The grouped merge must reproduce that via the file-sequence
    tiebreaker (envelope.FILE_SEQ_COL) attached by the multi-path scan."""
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv", '1,"alice",30,1990-01-01\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns,
    )
    v1.dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"first",31,1990-01-01\n')
    write(incr / "tpch/users/1/2024-01-01/CDC000002.csv",
          '"U","users","tpch",100,1,"second",32,1990-01-01\n')

    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 2 and report.merge_commits == 1
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert rows[1]["name"] == "second"  # same ts → later file wins


def test_add_column_ddl_is_metadata_only(spark, tmp_path):
    """An ADD-column DDL barrier on a bucketed table must NOT rewrite any
    bucket (O(1) manifest commit, Delta-style): bucket_versions stay
    untouched, reads materialize the rendered default for old files, and
    the next merge writes the new column physically only into the buckets
    it touches."""
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",31,1991-02-02\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns, pk_buckets=4,
    )
    v1.dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"alice2",31,1990-01-01\n')
    consumer = IncrementConsumer(spark, incr, table)
    consumer.poll_once()
    bv_before = dict(table.manifest()["bucket_versions"])

    # v2 = v1 + ADD gender with a default (pure ADD → metadata-only)
    v2 = users_def_v1()
    v2.version = 2
    v2.query = "ALTER TABLE users ADD COLUMN gender varchar(10) DEFAULT 'u'"
    v2.columns = v2.columns + [
        TableCol(id="6", name="gender", tp="varchar", precision="10", default="u")
    ]
    v2.dump(incr / "tpch/users/2/meta")
    report = consumer.poll_once()
    assert report.ddl_applied == 1
    m = table.manifest()
    assert m["bucket_versions"] == bv_before  # NO bucket rewritten by DDL
    assert m["columns"][-1] == "gender" and m["column_defaults"]["gender"] == "u"
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert rows[1]["gender"] == "u" and rows[2]["gender"] == "u"  # default fill

    # post-DDL merge carries the column physically for touched buckets only
    write(incr / "tpch/users/2/2024-01-02/CDC000001.csv",
          '"U","users","tpch",200,2,"bob2",32,1991-02-02,"f"\n')
    consumer.poll_once()
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert rows[2]["gender"] == "f" and rows[1]["gender"] == "u"
    # restart reads the same state
    rows2 = {r["id"]: r for r in
             IncrementConsumer(spark, incr, table).table.read(spark).collect()}
    assert rows2[1]["gender"] == "u" and rows2[2]["name"] == "bob2"


def test_crash_replay_idempotence(spark, tmp_path):
    """Exactly-once = at-least-once replay + idempotent merge: a crash
    after the combined commit but BEFORE (some or all) markers are written
    re-merges those files on restart, and the table state must not change
    (increment.go:256-275 semantics under our grouped commit)."""
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",31,1991-02-02\n3,"carol",32,1992-03-03\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns, pk_buckets=4,
    )
    v1.dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"a2",31,1990-01-01\n'
          '"D","users","tpch",110,2,"bob",31,1991-02-02\n')
    write(incr / "tpch/users/1/2024-01-01/CDC000002.csv",
          '"I","users","tpch",120,9,"ida",20,2000-01-01\n'
          '"U","users","tpch",130,3,"c2",33,1992-03-03\n')

    IncrementConsumer(spark, incr, table).poll_once()
    state = sorted(map(tuple, table.read(spark).collect()))

    # crash scenario A: ALL markers lost after commit → full group replays
    for p in incr.rglob("*.checkpoint"):
        p.unlink()
    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 2 and report.files_skipped == 0
    assert sorted(map(tuple, table.read(spark).collect())) == state

    # crash scenario B: only the last marker lost → that file replays alone
    (incr / "tpch/users/1/2024-01-01/CDC000002.csv.checkpoint").unlink()
    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 1 and report.files_skipped == 1
    assert sorted(map(tuple, table.read(spark).collect())) == state

    # steady state: nothing new
    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 0 and report.files_skipped == 2


def test_late_old_version_file_after_add_column(spark, tmp_path):
    """A v1 CDC file that lands AFTER the v2 ADD-column barrier was applied
    (late flush) must still merge: its rows get the added column's rendered
    default, exactly what the reference's warehouse INSERT of the v1 column
    list would produce."""
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv", '1,"alice",30,1990-01-01\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns,
    )
    v1.dump(incr / "tpch/users/1/meta")
    v2 = users_def_v1()
    v2.version = 2
    v2.query = "ALTER TABLE users ADD COLUMN gender varchar(10) DEFAULT 'u'"
    v2.columns = v2.columns + [
        TableCol(id="6", name="gender", tp="varchar", precision="10", default="u")
    ]
    v2.dump(incr / "tpch/users/2/meta")
    consumer = IncrementConsumer(spark, incr, table)
    report = consumer.poll_once()
    assert report.ddl_applied == 1

    # late v1 file arrives after the barrier
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"late",31,1990-01-01\n'
          '"I","users","tpch",110,7,"new7",27,1997-07-07\n')
    report = consumer.poll_once()
    assert report.files_processed == 1
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert rows[1]["name"] == "late" and rows[1]["gender"] == "u"
    assert rows[7]["name"] == "new7" and rows[7]["gender"] == "u"


def test_large_backlog_single_scan_merge(spark, tmp_path):
    """A catch-up backlog of many CDC files (mixed CSV and JSON) must merge
    as ONE commit via the multi-path scan, with last-writer-wins decided
    across the whole backlog."""
    import json as _json

    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv",
          "".join(f'{k},"u{k}",20,1990-01-01\n' for k in range(40)))
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns, pk_buckets=8,
    )
    v1.dump(incr / "tpch/users/1/meta")
    # 30 files; each file i updates key (i % 40) at ts 1000+i — for keys
    # hit multiple times, the HIGHEST ts must win regardless of file count
    for i in range(1, 31):
        k = i % 40
        if i % 3 == 0:  # every third file is canal-json
            write(incr / f"tpch/users/1/2024-01-01/CDC{i:06d}.json",
                  _json.dumps({"flag": "U", "tablename": "users",
                               "schemaname": "tpch", "commit_ts": 1000 + i,
                               "id": k, "name": f"f{i}", "age": 21,
                               "birth": "1990-01-01"}) + "\n")
        else:
            write(incr / f"tpch/users/1/2024-01-01/CDC{i:06d}.csv",
                  f'"U","users","tpch",{1000 + i},{k},"f{i}",21,1990-01-01\n')

    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 30
    assert report.merge_commits == 1  # ONE combined commit for the backlog
    rows = {r["id"]: r["name"] for r in table.read(spark).collect()}
    assert len(rows) == 40
    # keys 1..30 each updated by exactly one file; 31..39 and 0 untouched
    for i in range(1, 31):
        assert rows[i % 40] == f"f{i}"
    for k in [0, *range(31, 40)]:
        assert rows[k] == f"u{k}"


def test_compact_and_vacuum_after_metadata_only_add(spark, tmp_path):
    """Compaction over buckets with MIXED physical schemas (some written
    before a metadata-only ADD, some after) must rewrite them conformed to
    the current schema — defaults materialized for pre-DDL rows — and
    vacuum must then drop the unreferenced old versions."""
    from pyspark.sql import functions as F

    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs

    v1 = users_def_v1()
    base = spark.range(24).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
        F.lit(20).alias("age"),
        F.to_date(F.lit("1990-01-01")).alias("birth"),
    )
    t = ManagedTable(tmp_path / "t").create(base, ["id"], pk_buckets=4)

    v2 = users_def_v1()
    v2.columns = v2.columns + [
        TableCol(id="6", name="gender", tp="varchar", precision="10", default="x")
    ]
    apply_column_diffs(spark, t, diff_columns(v1.columns, v2.columns))
    assert t.version() == 1  # metadata-only: no data version bump

    # one merge writes SOME buckets with the new column physically
    batch = spark.createDataFrame(
        [("U", "t", "s", 10, 1, "upd1", 21, None, "f")],
        "flag string, tablename string, schemaname string, commit_ts long, "
        "id int, name string, age int, birth date, gender string",
    )
    t.merge(spark, batch)

    v = t.compact(spark, max_files_per_bucket=0)
    assert v is not None
    removed = t.vacuum(keep_last=1)
    assert removed  # old versions dropped once unreferenced
    rows = {r["id"]: r for r in t.read(spark).collect()}
    assert len(rows) == 24
    assert rows[1]["gender"] == "f"      # explicit value survives compaction
    assert rows[2]["gender"] == "x"      # pre-DDL row keeps its default


def test_backlog_past_threshold_drops_broadcast_hint(spark, tmp_path, monkeypatch):
    """Adaptive merge-join strategy: when a poll's group exceeds the
    consumer's broadcast byte threshold, the merge must run WITHOUT the
    key-set broadcast hint (AQE then picks the strategy — a shuffle join
    for a genuinely large key set), and the result must be identical to
    the hinted path."""
    from tidb2dw_spark.operators.merge import merge_changelog
    from tidb2dw_spark.table.managed import ManagedTable as MT

    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv",
          "".join(f'{k},"u{k}",20,1990-01-01\n' for k in range(20)))
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns, pk_buckets=4,
    )
    v1.dump(incr / "tpch/users/1/meta")
    for i in range(1, 6):
        write(incr / f"tpch/users/1/2024-01-01/CDC{i:06d}.csv",
              f'"U","users","tpch",{1000 + i},{i},"f{i}",21,1990-01-01\n')

    seen = {}
    orig = MT.merge

    def spy(self, spark_, batch, extra_meta=None, broadcast_batch=True):
        seen["broadcast_batch"] = broadcast_batch
        return orig(self, spark_, batch,
                    extra_meta=extra_meta, broadcast_batch=broadcast_batch)

    monkeypatch.setattr(MT, "merge", spy)
    # threshold of 1 byte: any real group counts as a backlog
    consumer = IncrementConsumer(spark, incr, table, broadcast_batch_max_bytes=1)
    report = consumer.poll_once()
    assert report.merge_commits == 1
    assert seen["broadcast_batch"] is False
    rows = {r["id"]: r["name"] for r in table.read(spark).collect()}
    assert all(rows[i] == f"f{i}" for i in range(1, 6))

    # the contract at the plan level: hinted merge carries a broadcast
    # ResolvedHint on the key side; unhinted merge carries none (the join
    # strategy is then Catalyst/AQE's call, which is the point)
    target = table.read(spark)
    batch = target.limit(3).selectExpr(
        "'U' AS flag", "'users' AS tablename", "'tpch' AS schemaname",
        "CAST(1 AS BIGINT) AS commit_ts", "id", "name", "age", "birth"
    )
    hinted = merge_changelog(target, batch, ["id"], broadcast_batch=True)
    unhinted = merge_changelog(target, batch, ["id"], broadcast_batch=False)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in unhinted._jdf.queryExecution().analyzed().toString()


def test_symlinked_increment_root_keeps_file_seq(spark, tmp_path):
    """The __file_seq tag must survive an increment root reached through a
    symlink: input_file_name() does not resolve symlinks while the staged
    paths may, so the seq lookup joins on every plausible rendering — and
    raises (instead of silently dropping the tiebreaker) if a scanned file
    matches none."""
    import os

    snap = tmp_path / "snapshot"
    real = tmp_path / "real_increment"
    link = tmp_path / "linked_increment"
    write(snap / "tpch.users.000000001.csv", '1,"alice",30,1990-01-01\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns,
    )
    v1.dump(real / "tpch/users/1/meta")
    # same key updated in two files with the SAME commit_ts: only the
    # file-seq tiebreaker makes the later file win deterministically
    write(real / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"first",31,1990-01-01\n')
    write(real / "tpch/users/1/2024-01-01/CDC000002.csv",
          '"U","users","tpch",100,1,"second",32,1990-01-01\n')
    os.symlink(real, link)

    report = IncrementConsumer(spark, link, table).poll_once()
    assert report.files_processed == 2
    rows = {r["id"]: r["name"] for r in table.read(spark).collect()}
    assert rows[1] == "second"  # seq tiebreaker present and correct


def test_late_pre_ddl_file_after_restart_and_schema_gc(spark, tmp_path):
    """ADVICE fix: schema-file GC deletes older-version schema files after
    a barrier; a RESTARTED consumer must still be able to read a LATE
    DML file of the GC'd version — the applied table definitions are
    persisted in the managed-table manifest."""
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",40,1991-02-02\n')
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns,
    )
    v1.dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"alice2",31,1990-01-01\n')
    # v2 adds a column with a default
    v2 = users_def_v1()
    v2.version = 2
    v2.query = "ALTER TABLE users ADD COLUMN tier varchar(8)"
    from tidb2dw_spark.schema.table_def import TableCol

    v2.columns = v2.columns + [
        TableCol(id="9", name="tier", tp="varchar", precision="8", default="basic")
    ]
    v2.dump(incr / "tpch/users/2/meta")
    write(incr / "tpch/users/2/2024-01-02/CDC000001.csv",
          '"U","users","tpch",200,2,"bob2",41,1991-02-02,"gold"\n')

    c1 = IncrementConsumer(spark, incr, table)
    r1 = c1.poll_once()
    assert r1.ddl_applied == 1 and r1.files_processed == 2
    # GC removed the v1 schema file
    assert not list((incr / "tpch/users/1/meta").glob("schema_*.json"))
    assert "1" in table.manifest().get("applied_table_defs", {})

    # late v1-shaped file lands AFTER a restart (fresh consumer, no
    # in-memory defs): must conform (tier -> default) instead of raising
    write(incr / "tpch/users/1/2024-01-01/CDC000002.csv",
          '"U","users","tpch",300,1,"alice3",32,1990-01-01\n')
    c2 = IncrementConsumer(spark, incr, table)
    r2 = c2.poll_once()
    assert r2.files_processed == 1 and not r2.errors
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert rows[1]["name"] == "alice3" and rows[1]["tier"] == "basic"
    assert rows[2]["name"] == "bob2" and rows[2]["tier"] == "gold"


def test_backlog_soak_three_versions(spark, tmp_path):
    """Soak: a 110-file catch-up backlog spanning THREE schema versions
    with interleaved DDL barriers (ADD at v2, DROP at v3 — both
    metadata-only) must consume in one poll as exactly one merge commit
    per version group, bump only the buckets the touched keys hash to,
    and come back to a flat file count after compact + vacuum.
    Reference cadence: replicate/increment.go:331-371 (version-grouped
    apply loop)."""
    snap = tmp_path / "snapshot"
    incr = tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv",
          "".join(f'{k},"u{k}",20,1990-01-01\n' for k in range(60)))
    v1 = users_def_v1()
    table = ManagedTable(tmp_path / "wh" / "users").create(
        read_snapshot_csv(spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)),
        v1.pk_columns, pk_buckets=8,
    )
    files_after_snapshot = len(list((tmp_path / "wh" / "users").rglob("*.parquet")))

    v2 = users_def_v1()
    v2.version = 2
    v2.columns = v2.columns + [
        TableCol(id="6", name="gender", tp="varchar", precision="10", default="x")
    ]
    v3 = users_def_v1()
    v3.version = 3
    v3.columns = [c for c in v2.columns if c.name != "age"]
    v1.dump(incr / "tpch/users/1/meta")
    v2.dump(incr / "tpch/users/2/meta")
    v3.dump(incr / "tpch/users/3/meta")

    # every file updates one of keys {1,2,3} — ≤3 of the 8 buckets
    for i in range(1, 111):
        k = (i % 3) + 1
        ts = 1000 + i
        if i <= 40:
            write(incr / f"tpch/users/1/2024-01-01/CDC{i:06d}.csv",
                  f'"U","users","tpch",{ts},{k},"f{i}",21,1990-01-01\n')
        elif i <= 80:
            write(incr / f"tpch/users/2/2024-01-02/CDC{i:06d}.csv",
                  f'"U","users","tpch",{ts},{k},"f{i}",22,1990-01-01,"g{i}"\n')
        else:
            write(incr / f"tpch/users/3/2024-01-03/CDC{i:06d}.csv",
                  f'"U","users","tpch",{ts},{k},"f{i}",1990-01-01,"g{i}"\n')

    report = IncrementConsumer(spark, incr, table).poll_once()
    assert report.files_processed == 110
    assert report.ddl_applied == 2
    assert report.merge_commits == 3  # ONE commit per version group
    assert not report.errors

    # bounded rewrites: only the buckets keys {1,2,3} hash to ever bump
    bv = table.manifest()["bucket_versions"]
    bumped = {b for b, v in bv.items() if int(v) > 1}
    assert 1 <= len(bumped) <= 3, bv

    df = table.read(spark)
    assert df.columns == ["id", "name", "birth", "gender"]  # v3 shape
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 60
    # last writer per key: i=108→key 1, i=109→key 2, i=110→key 3
    assert rows[1]["name"] == "f108" and rows[1]["gender"] == "g108"
    assert rows[2]["name"] == "f109" and rows[2]["gender"] == "g109"
    assert rows[3]["name"] == "f110" and rows[3]["gender"] == "g110"
    assert rows[7]["name"] == "u7" and rows[7]["gender"] == "x"  # untouched + default

    # compaction + vacuum bring the layout back to a flat file count
    assert table.compact(spark, max_files_per_bucket=0) is not None
    table.vacuum(keep_last=1)
    files_after = len(list((tmp_path / "wh" / "users").rglob("*.parquet")))
    assert files_after <= files_after_snapshot + 8
    rows2 = {r["id"]: r["name"] for r in table.read(spark).collect()}
    assert rows2 == {k: r["name"] for k, r in rows.items()}
