"""Structured Streaming surface: foreachBatch changelog merge equals the
batch consumer's result; stateful sessionization equals its batch twin;
windowed agg with watermark runs on a stream."""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import functions as F

from tidb2dw_spark.fixtures import read_table
from tidb2dw_spark.schema.types import table_def_to_struct
from tidb2dw_spark.sources.snapshot import read_snapshot_csv
from tidb2dw_spark.streaming.stream import (
    sessionize_events_batch,
    sessionize_events_stream,
    stream_changelog_files,
    windowed_event_counts,
)
from tidb2dw_spark.table.managed import ManagedTable

from .test_consumer import users_def_v1, write


def test_stream_changelog_merge_matches_batch(spark, tmp_path):
    v1 = users_def_v1()
    snap = tmp_path / "snapshot"
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",\\N,1991-02-02\n3,"carol",41,1992-03-03\n')
    snap_df = read_snapshot_csv(
        spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)
    )
    table = ManagedTable(tmp_path / "wh" / "users").create(snap_df, v1.pk_columns)

    cdc = tmp_path / "cdc"
    write(cdc / "CDC000001.csv",
          '"U","users","tpch",100,1,"alice2",31,1990-01-01\n'
          '"I","users","tpch",101,4,"dave",22,1994-04-04\n')
    write(cdc / "CDC000002.csv",
          '"D","users","tpch",200,2,"bob",\\N,1991-02-02\n'
          '"U","users","tpch",201,4,"dave2",23,1994-04-04\n')

    q = stream_changelog_files(
        spark,
        f"{cdc}/*.csv",
        table,
        table_def_to_struct(v1),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert set(rows) == {1, 3, 4}
    assert rows[1]["name"] == "alice2"
    assert rows[4]["name"] == "dave2" and rows[4]["age"] == 23

    # restart with a new file: checkpoint prevents reprocessing old ones
    write(cdc / "CDC000003.csv", '"D","users","tpch",300,3,"carol",41,1992-03-03\n')
    q2 = stream_changelog_files(
        spark, f"{cdc}/*.csv", table, table_def_to_struct(v1),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert {r["id"] for r in table.read(spark).collect()} == {1, 4}


def test_stream_sessionization_matches_batch_twin(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    # batch twin result: closed+open sessions; the stream (availableNow, one
    # batch) emits only sessions closed WITHIN the batch → compare those
    batch = sessionize_events_batch(events, gap_seconds=1800)
    per_user_total = {
        r["user_id"]: r["n"] for r in batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }

    src = tmp_path / "events_stream"
    events.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    out = sessionize_events_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("sessions_out").collect()
    # every emitted closed session must agree with a batch session exactly
    batch_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    assert len(got) > 0
    for r in got:
        key = (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        assert key in batch_keys, f"stream session {key} not in batch result"
    # stream emits strictly fewer or equal sessions per user (open ones held)
    from collections import Counter

    emitted = Counter(r["user_id"] for r in got)
    assert all(emitted[u] <= per_user_total[u] for u in emitted)


def test_windowed_agg_on_stream_with_watermark(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    src = tmp_path / "events_src"
    events.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    agg = windowed_event_counts(stream, "1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("win_out")
    batch = windowed_event_counts(events, "1 hour")
    # append mode emits only windows finalized past the watermark — compare
    # the finalized subset against the batch result on shared keys
    bkeys = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()
    }
    emitted = got.collect()
    assert len(emitted) > 0
    for r in emitted:
        assert bkeys[(r["window_start"], r["event_type"])] == r["n_events"]


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    from tidb2dw_spark.streaming.stream import interval_join_clicks_before_errors

    events = read_table(spark, sf_dir, "events")
    errors_b = events.filter(F.col("event_type") == "error")
    clicks_b = events.filter(F.col("event_type") == "click")
    batch = interval_join_clicks_before_errors(errors_b, clicks_b).collect()
    batch_keys = {(r["error_id"], r["click_ts"]) for r in batch}

    src = tmp_path / "events_join_src"
    events.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    joined = interval_join_clicks_before_errors(
        stream.filter(F.col("event_type") == "error"),
        stream.filter(F.col("event_type") == "click"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ssj_out").collect()
    # inner stream-stream join over a fully-drained source = the batch join
    assert {(r["error_id"], r["click_ts"]) for r in got} == batch_keys
    assert len(got) == len(batch)

    # cross-check vs the bucketed batch range join: total pair count agrees
    from tidb2dw_spark.operators.rangejoin import range_count_join

    counted = range_count_join(
        errors_b.select("event_id", "user_id", "ts"),
        clicks_b.select("user_id", "ts"),
        on=["user_id"], left_ts="ts", right_ts="ts",
        window_seconds=600, count_alias="n",
    )
    total = counted.agg(F.sum("n")).collect()[0][0]
    assert total == len(batch)


def test_stream_dedup_within_watermark_drops_redeliveries(spark, sf_dir, tmp_path):
    from tidb2dw_spark.streaming.stream import dedup_events_stream

    events = read_table(spark, sf_dir, "events").limit(2000)
    # at-least-once upstream: re-deliver a third of the events
    dup = events.filter(F.col("event_id") % 3 == 0)
    delivered = events.unionByName(dup)
    src = tmp_path / "events_dedup_src"
    delivered.coalesce(2).write.parquet(str(src))

    n_distinct = events.select("event_id").distinct().count()
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        dedup_events_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_out")
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct
    # batch twin agrees
    assert dedup_events_stream(delivered).count() == n_distinct


def test_lww_dedup_stream_cross_batch(spark, tmp_path):
    """Stateful cross-batch W1: newer events replace the state winner and
    are emitted; stale and replayed events emit NOTHING; the final winner
    per key matches the batch last_writer_wins over the unioned batches."""
    from pyspark.sql import types as T

    from tidb2dw_spark.operators.dedup import last_writer_wins
    from tidb2dw_spark.streaming.stream import lww_dedup_stream

    schema = T.StructType(
        [
            T.StructField("flag", T.StringType()),
            T.StructField("id", T.LongType()),
            T.StructField("commit_ts", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    b1 = [("I", 1, 10, "a"), ("U", 1, 20, "b"), ("I", 2, 5, "x"), ("D", 3, 7, None)]
    b2 = [
        ("U", 1, 15, "stale-loses"),   # older than state ts 20 → no emission
        ("U", 2, 5, "tie-flag"),       # same ts, U > I flag → wins
        ("I", 4, 1, "new"),
        ("U", 1, 20, "b"),             # exact replay of the winner → no emission
    ]
    src = tmp_path / "lww_src"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = (
        lww_dedup_stream(stream, ["id"])
        .writeStream.format("memory")
        .queryName("lww_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "lww_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.table("lww_out").collect()

    # winners only improve, so max-by-(ts, flag) of emissions == final state
    final = {}
    for r in emitted:
        cur = final.get(r["id"])
        if cur is None or (r["commit_ts"], r["flag"]) > (cur["commit_ts"], cur["flag"]):
            final[r["id"]] = r
    batch = spark.createDataFrame(b1 + b2, schema)
    expected = {
        r["id"]: r for r in last_writer_wins(batch, ["id"]).collect()
    }
    assert {k: (v["flag"], v["commit_ts"], v["val"]) for k, v in final.items()} == {
        k: (v["flag"], v["commit_ts"], v["val"]) for k, v in expected.items()
    }
    # per-key emission counts prove the no-change suppression:
    # key 1: batch-1 winner only (stale + replay suppressed); key 2: both
    # batches (tie-flag upgrade); keys 3, 4: one each
    counts = {}
    for r in emitted:
        counts[r["id"]] = counts.get(r["id"], 0) + 1
    assert counts == {1: 1, 2: 2, 3: 1, 4: 1}


def test_stream_changelog_merge_into_bucketed_mor(spark, tmp_path):
    """The streaming sink goes through ManagedTable.merge: on a bucketed
    MoR table each micro-batch commits per-bucket deltas (no base
    rewrite), and the streamed end state matches the batch semantics."""
    v1 = users_def_v1()
    snap = tmp_path / "snapshot"
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",\\N,1991-02-02\n3,"carol",41,1992-03-03\n')
    snap_df = read_snapshot_csv(
        spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)
    )
    table = ManagedTable(tmp_path / "wh" / "users").create(
        snap_df, v1.pk_columns, pk_buckets=4, merge_mode="mor"
    )
    base_before = {str(p) for p in table.root.rglob("v=*/**/*.parquet")}

    cdc = tmp_path / "cdc"
    write(cdc / "CDC000001.csv",
          '"U","users","tpch",100,1,"alice2",31,1990-01-01\n'
          '"D","users","tpch",101,2,"bob",\\N,1991-02-02\n')
    q = stream_changelog_files(
        spark, f"{cdc}/*.csv", table, table_def_to_struct(v1),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert {str(p) for p in table.root.rglob("v=*/**/*.parquet")} == base_before
    assert table.manifest()["delta_seq"] >= 1
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert set(rows) == {1, 3} and rows[1]["name"] == "alice2"
