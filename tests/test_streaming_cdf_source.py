"""Commit-log streaming CDF source (streaming/cdf_source.py): the
streaming twin of ManagedTable.changes().

Pins the contract the raw file-source subscription cannot deliver:

- offsets are COMMIT SEQS gated by the manifest (not filesystem listing);
- a drain is bit-equal to the equivalent changes() slice;
- RENAME / widening / ADD barriers that predate the query start conform
  BY FIELD ID — the checkpoint survives the barrier and downstream state
  is NEVER re-seeded (the reference consumer's in-stream DDL semantic,
  increment.go:141-167, 283-329);
- a barrier landing MID-RUN raises SchemaEvolvedError (restart with the
  SAME checkpoint — the Delta-CDF-style contract under Structured
  Streaming's fixed-schema model);
- a vacuumed seq behind the checkpoint fails loudly (re-seed required,
  silently skipping changes is the one unforgivable outcome).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_cdf import BASE, ENV, _batch, _mk, _rename_grp_to_category
from tidb2dw_spark.streaming.cdf_source import (
    CDFStreamReader,
    SchemaEvolvedError,
    stream_changes_commitlog,
)


def _drain(spark, t, checkpoint, cols):
    """One availableNow drain of the commit-log stream through a
    foreachBatch sink (the memory sink cannot recover from a checkpoint,
    which is exactly the contract under test); returns the drained rows
    projected to *cols*, sorted."""
    rows: list = []

    def sink(df, _bid):
        rows.extend(df.collect())

    q = (
        stream_changes_commitlog(spark, t)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    return sorted(tuple(r[c] for c in cols) for r in rows)


def _changes_rows(spark, t, cols, **kw):
    return sorted(
        tuple(r[c] for c in cols) for r in t.changes(spark, **kw).collect()
    )


def test_commitlog_stream_drains_bit_equal_to_changes(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11), ("I", 9, 5, "c", 90)]))
    t.merge(spark, _batch(spark, [("D", 2, 6, None, None)]))
    cols = ["k", "grp", "val", "_change_type", "_commit_seq", "_commit_version"]
    got = _drain(spark, t, tmp_path / "ckpt", cols)
    assert got == _changes_rows(spark, t, cols)
    # a second drain from the SAME checkpoint picks up only new commits
    t.merge(spark, _batch(spark, [("U", 3, 7, "z", 33)]))
    got2 = _drain(spark, t, tmp_path / "ckpt", cols)
    assert got2 == _changes_rows(spark, t, cols, since=2)


def test_commitlog_stream_rides_rename_and_widening_unreseeded(spark, tmp_path):
    """The streaming twin of pipeline_rename_continuity: merges, a
    rewrite-path RENAME barrier, a post-rename merge — all drained
    ACROSS the barrier from one checkpoint, never re-seeded.  Drain 1
    happens BEFORE the barrier; drain 2 (same checkpoint) consumes the
    post-barrier commits; the union of both drains must equal the full
    field-id-conformed changes() feed, and the pre-barrier rows keep
    their checkpointed seqs (no replay = no re-seed)."""
    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11), ("I", 9, 5, "c", 90)]))
    cols = ["k", "category", "val", "_change_type", "_commit_seq"]
    pre_cols = ["k", "grp", "val", "_change_type", "_commit_seq"]
    drained_pre = _drain(spark, t, tmp_path / "ckpt", pre_cols)
    assert drained_pre == _changes_rows(spark, t, pre_cols)

    # the barrier: rewrite-path RENAME grp -> category (field id 2)
    _rename_grp_to_category(spark, t)
    env2 = ENV.replace("grp string", "category string")
    t.merge(
        spark, spark.createDataFrame([("U", "t", "s", 6, 9, "d", 91)], env2)
    )
    # SAME checkpoint, fresh query start (the post-barrier run pins the
    # renamed schema): only the post-barrier commit drains — the
    # checkpointed seq rode the barrier, nothing replays
    drained_post = _drain(spark, t, tmp_path / "ckpt", cols)
    assert drained_post == _changes_rows(spark, t, cols, since=1)
    assert {r[4] for r in drained_post} == {2}
    # union of drains = the full field-id-conformed feed (pre-rows were
    # drained under the old name, same position/field id)
    union = sorted(list(drained_pre) + list(drained_post))
    assert union == _changes_rows(spark, t, cols)

    # and a WIDENING barrier on val (bigint stays bigint for grp table;
    # use a fresh int-typed table to exercise the physical-type split)
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol

    from tidb2dw_spark.table.managed import ManagedTable as _MT

    t2 = _MT(tmp_path / "t2")
    t2.create(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, qty int"),
        ["k"], pk_buckets=2, cdf=True,
    )
    env_i = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, qty int"
    )
    t2.merge(spark, spark.createDataFrame([("U", "t", "s", 5, 1, 11)], env_i))
    wcols = ["k", "qty", "_change_type", "_commit_seq"]
    _drain(spark, t2, tmp_path / "ckpt2", wcols)
    v1 = [
        TableCol(id="1", name="k", tp="bigint", is_pk="true"),
        TableCol(id="2", name="qty", tp="int"),
    ]
    v2 = [v1[0], TableCol(id="4", name="qty", tp="bigint")]
    apply_column_diffs(spark, t2, diff_columns(v1, v2))
    env_l = env_i.replace("qty int", "qty long")
    t2.merge(
        spark,
        spark.createDataFrame([("U", "t", "s", 6, 2, 9_999_999_999)], env_l),
    )
    got_post = _drain(spark, t2, tmp_path / "ckpt2", wcols)
    assert got_post == _changes_rows(spark, t2, wcols, since=1)
    # a FRESH stream (new checkpoint) reads the pre-widening int files
    # through the widened schema — the per-commit conformance spec, not
    # one pinned parquet scan, is what makes this work
    got_all = _drain(spark, t2, tmp_path / "ckpt2_fresh", wcols)
    assert got_all == _changes_rows(spark, t2, wcols)
    got = {r[0]: r[1] for r in got_all if r[2] == "update_postimage"}
    assert got == {1: 11, 2: 9_999_999_999}


def test_commitlog_stream_mid_run_ddl_raises_schema_evolved(spark, tmp_path):
    """A commit bearing a post-pin schema (rename landed after the reader
    pinned) must raise SchemaEvolvedError from partitions() — never
    silently misread the renamed column."""
    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11)]))
    reader = CDFStreamReader({"path": str(t.root)})  # pins pre-rename
    assert reader.latestOffset() == {"seq": 1}
    _rename_grp_to_category(spark, t)
    env2 = ENV.replace("grp string", "category string")
    t.merge(
        spark, spark.createDataFrame([("U", "t", "s", 6, 9, "d", 91)], env2)
    )
    # pre-pin commits still plan fine
    assert reader.partitions({"seq": 0}, {"seq": 1})
    with pytest.raises(SchemaEvolvedError, match="SAME checkpoint"):
        reader.partitions({"seq": 1}, {"seq": 2})


def test_commitlog_stream_mid_run_widening_raises_schema_evolved(spark, tmp_path):
    """A metadata-only widening MODIFY changes no column NAMES — the
    post-pin drift check must catch it by TYPE, or read() would down-cast
    the widened data to the stale pinned type (ArrowInvalid on overflow,
    silent narrowing otherwise)."""
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol
    from tidb2dw_spark.table.managed import ManagedTable as _MT

    t = _MT(tmp_path / "t")
    t.create(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, qty int"),
        ["k"], pk_buckets=2, cdf=True,
    )
    env_i = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, qty int"
    )
    t.merge(spark, spark.createDataFrame([("U", "t", "s", 5, 1, 11)], env_i))
    reader = CDFStreamReader({"path": str(t.root)})  # pins qty:int
    v1 = [
        TableCol(id="1", name="k", tp="bigint", is_pk="true"),
        TableCol(id="2", name="qty", tp="int"),
    ]
    v2 = [v1[0], TableCol(id="4", name="qty", tp="bigint")]
    apply_column_diffs(spark, t, diff_columns(v1, v2))
    t.merge(
        spark,
        spark.createDataFrame(
            [("U", "t", "s", 6, 2, 9_999_999_999)],
            env_i.replace("qty int", "qty long"),
        ),
    )
    assert reader.partitions({"seq": 0}, {"seq": 1})  # pre-pin fine
    with pytest.raises(SchemaEvolvedError, match="wider type"):
        reader.partitions({"seq": 1}, {"seq": 2})


def test_commitlog_stream_vacuumed_checkpoint_fails_loudly(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11)]))
    t.merge(spark, _batch(spark, [("U", 2, 6, "b", 22)]))
    t.vacuum_changes(keep_since=2)
    reader = CDFStreamReader({"path": str(t.root)})
    with pytest.raises(ValueError, match="re-seed"):
        reader.partitions({"seq": 0}, {"seq": 2})


def test_commitlog_stream_add_default_backfill(spark, tmp_path):
    """Change files written before a metadata-only ADD surface the added
    column as its RENDERED DEFAULT (not NULL) — parity with changes()'
    _conform, which the raw file source could never deliver."""
    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11)]))
    m = t.manifest()
    import json as _json

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType.fromJson(_json.loads(m["schema_json"])).add(
        StructField("bonus", LongType())
    )
    t.evolve_schema_metadata_only(
        [*m["columns"], "bonus"],
        _json.dumps(schema.jsonValue()),
        column_defaults={"bonus": 7},
    )
    env2 = ENV + ", bonus long"
    t.merge(
        spark,
        spark.createDataFrame([("U", "t", "s", 6, 2, "a", 21, 99)], env2),
    )
    cols = ["k", "grp", "val", "bonus", "_change_type", "_commit_seq"]
    got = _drain(spark, t, tmp_path / "ckpt", cols)
    assert got == _changes_rows(spark, t, cols)
    by_seq = {(r[0], r[4]): r[3] for r in got}
    assert by_seq[(1, "update_postimage")] == 7  # pre-ADD file: default
    assert by_seq[(2, "update_postimage")] == 99  # post-ADD: stored value


def test_stream_derived_refresh_bootstraps_unbuilt_index(spark, tmp_path):
    """stream_derived_refresh advertises index support, but an UNBUILT
    SecondaryIndex attached to the stream used to die with a missing
    _meta.json on the first microbatch — the wake must mirror the
    replicator's exists()/build() bootstrap (ADVICE round-6 low)."""
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex
    from tidb2dw_spark.streaming.stream import stream_derived_refresh

    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11), ("I", 9, 5, "c", 90)]))
    ix = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=4)
    assert not ix.exists()
    q = stream_derived_refresh(
        spark, t, ix, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    assert not q.isActive
    assert ix.exists()
    got = sorted(r["k"] for r in ix.lookup(spark, t, "b").collect())
    assert got == [1, 3]
    # and the NEXT drain refreshes (covers the post-build branch)
    t.merge(spark, _batch(spark, [("U", 2, 7, "b", 22)]))
    q2 = stream_derived_refresh(
        spark, t, ix, str(tmp_path / "ckpt"), available_now=True
    )
    q2.awaitTermination(120)
    got2 = sorted(r["k"] for r in ix.lookup(spark, t, "b").collect())
    assert got2 == [1, 2, 3]
