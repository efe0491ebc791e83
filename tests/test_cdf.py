"""Change data feed, incremental aggregate maintenance, and time travel.

The CDF contract (Delta-CDF shape): every merge commit writes its
row-level change set classified by PRE-IMAGE PRESENCE, not CDC flag —
an 'I' on an existing key is an update, a 'U' on an absent key is an
insert, a 'D' on an absent key emits nothing.  Downstream: a maintained
aggregate fed only by the feed must equal a full recompute after any
merge sequence (including updates that move rows between groups and
NULL group keys).  Time travel: ``read_at(commit)`` reconstructs
bucket-pruned state from the commit log's bucket_versions snapshot,
and vacuum's keep_last window bounds how far back it works.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.operators.matview import apply_changes_to_agg, init_agg
from tidb2dw_spark.table.managed import ManagedTable

SCHEMA = "k long, grp string, val long"
ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, grp string, val long"
)


def _mk(spark, tmp_path, name, rows, buckets=4, merge_mode="cow", cdf=True):
    t = ManagedTable(tmp_path / name)
    t.create(
        spark.createDataFrame(rows, SCHEMA),
        pk_cols=["k"],
        pk_buckets=buckets,
        merge_mode=merge_mode,
        cdf=cdf,
    )
    return t


def _batch(spark, events):
    return spark.createDataFrame(
        [(f, "t", "s", ts, k, g, v) for f, k, ts, g, v in events], ENV
    )


def _changes(spark, t, **kw):
    return sorted(
        (r["k"], r["_change_type"], r["grp"], r["val"], r["_commit_seq"])
        for r in t.changes(spark, **kw).collect()
    )


BASE = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, None, 40)]


def test_cdf_classification_by_preimage(spark, tmp_path):
    """insert/update/delete classified by pre-image presence: 'I' on an
    existing key → update pair; 'U' on an absent key → insert; 'D' on an
    absent key → nothing."""
    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(
        spark,
        _batch(
            spark,
            [
                ("I", 1, 5, "a", 11),     # upsert onto existing → update
                ("U", 9, 5, "c", 90),     # update of absent key → insert
                ("D", 2, 5, None, None),  # delete existing
                ("D", 77, 5, None, None), # delete absent → no-op
            ],
        ),
    )
    assert _changes(spark, t) == [
        (1, "update_postimage", "a", 11, 1),
        (1, "update_preimage", "a", 10, 1),
        (2, "delete", "a", 20, 1),
        (9, "insert", "c", 90, 1),
    ]
    # feed applies back onto the seed: base minus deletes/pre plus post/ins
    assert {r["k"]: r["val"] for r in t.read(spark).collect()} == {
        1: 11, 3: 30, 4: 40, 9: 90,
    }


def test_cdf_seq_slicing_and_versions(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "a", 11)]))
    t.merge(spark, _batch(spark, [("U", 1, 6, "a", 12)]))
    assert t.manifest()["cdf_seq"] == 2
    all_rows = t.changes(spark).collect()
    assert {r["_commit_seq"] for r in all_rows} == {1, 2}
    # CoW merges bump the version with each commit
    assert {r["_commit_version"] for r in all_rows} == {2, 3}
    assert _changes(spark, t, since=1) == [
        (1, "update_postimage", "a", 12, 2),
        (1, "update_preimage", "a", 11, 2),
    ]
    assert _changes(spark, t, since=0, until=1) == [
        (1, "update_postimage", "a", 11, 1),
        (1, "update_preimage", "a", 10, 1),
    ]
    assert t.changes(spark, since=2).count() == 0


def test_cdf_disabled_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", BASE, cdf=False)
    with pytest.raises(ValueError, match="change data feed"):
        t.changes(spark)


@pytest.mark.parametrize("mode", ["plain", "mor"])
def test_cdf_plain_and_mor_paths(spark, tmp_path, mode):
    """The unbucketed-overwrite and merge-on-read merge paths emit the
    same change set as the bucketed CoW path."""
    kw = {"buckets": 0} if mode == "plain" else {"merge_mode": "mor"}
    t = _mk(spark, tmp_path, mode, BASE, **kw)
    cow = _mk(spark, tmp_path, "cow_twin", BASE)
    ev = [("U", 1, 5, "b", 99), ("D", 3, 5, None, None), ("I", 8, 5, "a", 80)]
    t.merge(spark, _batch(spark, ev))
    cow.merge(spark, _batch(spark, ev))

    def key(rows):
        return sorted((k, c, g, v) for k, c, g, v, _ in rows)

    assert key(_changes(spark, t)) == key(_changes(spark, cow))
    # second MoR merge sees the FIRST batch's pending deltas as pre-image
    if mode == "mor":
        t.merge(spark, _batch(spark, [("U", 8, 6, "a", 81)]))
        assert _changes(spark, t, since=1) == [
            (8, "update_postimage", "a", 81, 2),
            (8, "update_preimage", "a", 80, 2),
        ]


def test_matview_matches_recompute_with_group_moves(spark, tmp_path):
    """Incremental aggregate == full recompute after every merge, with
    group-moving updates and a NULL group key in play."""
    t = _mk(spark, tmp_path, "t", BASE)
    sums = {"total": "val"}
    agg = init_agg(t.read(spark), ["grp"], sums)
    batches = [
        [("U", 1, 5, "b", 15), ("I", 5, 5, None, 50)],   # a→b move; NULL grp
        [("D", 4, 6, None, None), ("U", 5, 6, "a", 51)], # NULL grp shrinks/moves
        [("D", 1, 7, None, None), ("D", 2, 7, None, None)],  # empty a group? (3 stays b)
    ]
    last = 0
    for ev in batches:
        t.merge(spark, _batch(spark, ev))
        agg = apply_changes_to_agg(
            agg, t.changes(spark, since=last), ["grp"], sums
        )
        last = t.manifest()["cdf_seq"]
        got = {r["grp"]: (r["n_rows"], r["total"]) for r in agg.collect()}
        want = {
            r["grp"]: (r["n_rows"], r["total"])
            for r in init_agg(t.read(spark), ["grp"], sums).collect()
        }
        assert got == want
    # groups whose count reached zero are dropped entirely
    assert "a" not in {r["grp"] for r in agg.collect()} or want.get("a", (1,))[0] > 0


def test_time_travel_read_at_each_commit(spark, tmp_path):
    """read_at(c) reproduces the state after each commit on a bucket-pruned
    table — v=N alone holds only the buckets commit N rewrote."""
    t = _mk(spark, tmp_path, "t", BASE, buckets=4)
    states = [{r[0]: (r[1], r[2]) for r in BASE}]
    for ev in (
        [("U", 1, 5, "a", 11)],
        [("D", 2, 6, None, None), ("I", 9, 6, "c", 90)],
        [("U", 9, 7, "c", 91)],
    ):
        t.merge(spark, _batch(spark, ev))
        states.append(
            {r["k"]: (r["grp"], r["val"]) for r in t.read(spark).collect()}
        )
    h = t.history()
    assert [e["action"] for e in h] == ["create", "merge", "merge", "merge"]
    for i, want in enumerate(states):
        got = {r["k"]: (r["grp"], r["val"]) for r in t.read_at(spark, i).collect()}
        assert got == want, f"commit {i}"
    # version-addressed travel resolves through the commit log too
    v2 = {r["k"]: r["val"] for r in t.read(spark, version=2).collect()}
    assert v2 == {k: v for k, (_, v) in states[1].items()}


def test_time_travel_vacuum_retention(spark, tmp_path):
    """keep_last bounds time travel.  Every merge touches ALL buckets so
    old versions actually become unreferenced (an untouched bucket pins
    its version in bucket_versions forever — by design)."""
    t = _mk(spark, tmp_path, "t", BASE, buckets=2)
    for ts in (5, 6, 7):
        t.merge(
            spark,
            _batch(spark, [("U", k, ts, g, v + ts) for k, g, v in BASE]),
        )
    # versions: create=1, merges=2,3,4.  keep_last=2 retains v3/v4 (and
    # anything commits at those versions reference): commits 2,3 readable
    t.vacuum(keep_last=2)
    for c in (2, 3):
        assert t.read_at(spark, c).count() == 4
    # v=1 and v=2 are gone → the create and first-merge commits are not
    with pytest.raises(Exception):
        t.read_at(spark, 0).count()


def test_cdf_survives_metadata_only_add(spark, tmp_path):
    """Change files written before a metadata-only ADD conform to the
    evolved schema on read (added column materializes as its default)."""
    import json

    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "a", 11)]))
    m = t.manifest()
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType.fromJson(json.loads(m["schema_json"])).add(
        StructField("extra", LongType())
    )
    t.evolve_schema_metadata_only(
        m["columns"] + ["extra"], schema.json(), column_defaults={"extra": 7}
    )
    rows = t.changes(spark).collect()
    assert all(r["extra"] == 7 for r in rows)
    assert {r["_change_type"] for r in rows} == {
        "update_preimage", "update_postimage",
    }


def test_maintained_aggregate_restart_and_retention(spark, tmp_path):
    """MaintainedAggregate: seed → merge/refresh cycles with a FRESH object
    each round (restart safety — state lives in _meta.json), equal to a
    full recompute after every refresh; processed feed dirs vacuum away
    without breaking later refreshes."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate, init_agg

    t = _mk(spark, tmp_path, "t", BASE)
    sums = {"total": "val"}
    mv_root = tmp_path / "mv"
    seq = MaintainedAggregate(mv_root, ["grp"], sums).refresh(spark, t)
    assert seq == 0  # seeded at the pre-merge state
    for ev in (
        [("U", 1, 5, "b", 15), ("I", 7, 5, "c", 70)],
        [("D", 3, 6, None, None), ("U", 7, 6, "a", 71)],
    ):
        t.merge(spark, _batch(spark, ev))
        mv = MaintainedAggregate(mv_root, ["grp"], sums)  # restart
        applied = mv.refresh(spark, t)
        assert applied == t.manifest()["cdf_seq"]
        got = {r["grp"]: (r["n_rows"], r["total"]) for r in mv.read(spark).collect()}
        want = {
            r["grp"]: (r["n_rows"], r["total"])
            for r in init_agg(t.read(spark), ["grp"], sums).collect()
        }
        assert got == want
        # idempotent: nothing new → same checkpoint, same state
        assert mv.refresh(spark, t) == applied
    # retention: drop processed feed dirs, then keep going
    assert t.vacuum_changes(keep_since=applied) == [1, 2]
    t.merge(spark, _batch(spark, [("U", 7, 7, "a", 72)]))
    mv = MaintainedAggregate(mv_root, ["grp"], sums)
    mv.refresh(spark, t)
    got = {r["grp"]: (r["n_rows"], r["total"]) for r in mv.read(spark).collect()}
    want = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in init_agg(t.read(spark), ["grp"], sums).collect()
    }
    assert got == want


def test_maintained_aggregate_where_boundary_crossing(spark, tmp_path):
    """WHERE-filtered maintained view: change rows contribute iff they
    satisfy the row-local predicate, so an update whose only effect is
    crossing the boundary folds as a one-sided remove/add.  Covers: out→in,
    in→out, in-slice insert outside the filter, delete of an in-filter
    row, and min/max dirty rescan against the FILTERED base — always
    equal to a recompute of σ_where(table)."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate, init_agg

    t = _mk(spark, tmp_path, "t", BASE)  # vals 10,20,30,40
    mv = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"total": "val"},
        min_cols={"lo": "val"}, max_cols={"hi": "val"},
        where="val <= 25", where_cols=["val"],
    )
    mv.refresh(spark, t)

    def want():
        return {
            r["grp"]: (r["n_rows"], r["total"], r["lo"], r["hi"])
            for r in init_agg(
                t.read(spark).filter("val <= 25"), ["grp"],
                {"total": "val"}, {"lo": "val"}, {"hi": "val"},
            ).collect()
        }

    def got():
        return {
            r["grp"]: (r["n_rows"], r["total"], r["lo"], r["hi"])
            for r in mv.read(spark).collect()
        }

    assert got() == want()
    assert got()["a"] == (2, 30, 10, 20)
    steps = [
        # in→out (k1: 10→99 leaves), out→in (k3: 30→25 joins as b's only)
        [("U", 1, 5, "a", 99), ("U", 3, 5, "b", 25)],
        # delete the filtered group's max (k2=20 → dirty rescan on σ(base));
        # insert outside the filter (invisible)
        [("D", 2, 6, None, None), ("I", 7, 6, "a", 50)],
        # out→in revival of k1 at a new low
        [("U", 1, 7, "a", 1)],
    ]
    for ev in steps:
        t.merge(spark, _batch(spark, ev))
        mv = MaintainedAggregate(  # restart each round: state in meta
            tmp_path / "mv", ["grp"], {"total": "val"},
            min_cols={"lo": "val"}, max_cols={"hi": "val"},
            where="val <= 25", where_cols=["val"],
        )
        mv.refresh(spark, t)
        assert got() == want()
    # guard: a different predicate on the same state fails loudly
    with pytest.raises(ValueError, match="seeded with where"):
        MaintainedAggregate(
            tmp_path / "mv", ["grp"], {"total": "val"},
            where="val <= 30", where_cols=["val"],
        ).refresh(spark, t)


def test_consumer_cdf_two_polls_with_maintained_agg(spark, tmp_path):
    """Full consumer loop with the feed on: poll 1 merges the v1 group,
    poll 2 merges a late v1 file, applies the ADD barrier, and merges the
    v2 group — the maintained aggregate refreshes after each poll purely
    from the feed (reading v1-era change files through the evolved
    schema) and matches a recompute of the table every time."""
    from tidb2dw_spark.entry_pipeline import _def_v1, _stage_v1, _stage_v2
    from tidb2dw_spark.operators.matview import MaintainedAggregate, init_agg
    from tidb2dw_spark.schema.types import table_def_to_struct
    from tidb2dw_spark.sources.snapshot import read_snapshot_csv
    from tidb2dw_spark.streaming.consumer import IncrementConsumer

    root = tmp_path / "staging"
    base = [(k, k % 7, f"S{k % 3}", k * 10) for k in range(3, 1000, 21)]
    _stage_v1(root, base, extra_p1_file=False)
    v1 = _def_v1()
    snap = read_snapshot_csv(
        spark, f"{root}/snapshot/*.csv", table_def_to_struct(v1)
    )
    t = ManagedTable(tmp_path / "wh").create(
        snap, v1.pk_columns, pk_buckets=4, cdf=True
    )
    mv = MaintainedAggregate(
        tmp_path / "mv", ["o_orderstatus"], {"total": "o_total_cents"}
    )
    mv.refresh(spark, t)  # seed at snapshot

    def assert_fresh():
        got = {
            r["o_orderstatus"]: (r["n_rows"], r["total"])
            for r in mv.read(spark).collect()
        }
        want = {
            r["o_orderstatus"]: (r["n_rows"], r["total"])
            for r in init_agg(
                t.read(spark), ["o_orderstatus"], {"total": "o_total_cents"}
            ).collect()
        }
        assert got == want

    c = IncrementConsumer(spark, root / "increment", t)
    r1 = c.poll_once()
    assert r1.files_processed == 3
    mv.refresh(spark, t)
    assert_fresh()

    _stage_v1(root, base, extra_p1_file=True)
    _stage_v2(root, base)
    r2 = c.poll_once()
    assert r2.files_processed == 2 and r2.ddl_applied == 1
    assert t.manifest()["cdf_seq"] >= 2
    mv.refresh(spark, t)
    assert_fresh()


# ---------------------------------------------------------------------------
# Property test: the feed IS the derivative of the table
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st  # noqa: E402

_KEYS = list(range(6))
_event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(_KEYS),
    st.integers(0, 30),
    st.integers(0, 99),
)


def _fold_feed(state: dict, rows) -> dict:
    """Apply change rows to a dict: the feed's defining property."""
    out = dict(state)
    for r in sorted(rows, key=lambda r: r["_commit_seq"]):
        if r["_change_type"] == "insert" or r["_change_type"] == "update_postimage":
            out[r["k"]] = r["val"]
        elif r["_change_type"] == "delete":
            out.pop(r["k"], None)
        # update_preimage carries no new state (its postimage twin does)
    return out


@settings(max_examples=8, deadline=None)
@given(
    batches=st.lists(st.lists(_event, min_size=1, max_size=8), min_size=1, max_size=3),
    present=st.sets(st.sampled_from(_KEYS)),
)
def test_cdf_feed_is_table_derivative(spark, tmp_path_factory, batches, present):
    """For ANY merge sequence: folding the change feed over the initial
    state reproduces the table exactly, and every update row has a
    pre/post twin.  This is the contract downstream consumers rely on —
    if it holds, any change-driven derivation (matview, audit, replica)
    converges to the table."""
    tmp = tmp_path_factory.mktemp("cdfprop")
    initial = {k: -k for k in sorted(present)}
    t = ManagedTable(tmp / "t")
    t.create(
        spark.createDataFrame(
            [(k, None, v) for k, v in initial.items()] or [(None, None, None)],
            SCHEMA,
        ).filter("k IS NOT NULL"),
        pk_cols=["k"],
        pk_buckets=2,
        cdf=True,
    )
    for ev in batches:
        # de-conflict (key, ts, flag) duplicates like the merge model test
        seen, uniq = set(), []
        for f, k, ts, v in ev:
            if (f, k, ts) not in seen:
                seen.add((f, k, ts))
                uniq.append((f, k, ts, None, v))
        t.merge(spark, _batch(spark, uniq))
    rows = t.changes(spark).collect()
    folded = _fold_feed(initial, rows)
    table = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert folded == table
    pre = sorted((r["_commit_seq"], r["k"]) for r in rows if r["_change_type"] == "update_preimage")
    post = sorted((r["_commit_seq"], r["k"]) for r in rows if r["_change_type"] == "update_postimage")
    assert pre == post


def test_secondary_index_lookup_and_refresh(spark, tmp_path):
    """Value→PK secondary index maintained from the feed: after every
    merge+refresh, an index lookup equals a full-scan filter — including
    updates that MOVE the indexed value (entry must leave the old value
    bucket and appear in the new one), deletes, and inserts."""
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    t = _mk(spark, tmp_path, "t", BASE)
    ix = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=4)
    ix.build(spark, t)

    def assert_lookup(value):
        got = sorted(
            (r["k"], r["val"]) for r in ix.lookup(spark, t, value).collect()
        )
        want = sorted(
            (r["k"], r["val"])
            for r in t.read(spark).filter(F.col("grp") == value).collect()
        )
        assert got == want, (value, got, want)

    for v in ("a", "b", "zzz"):
        assert_lookup(v)

    batches = [
        [("U", 1, 5, "b", 11), ("I", 9, 5, "c", 90)],   # a→b move; new value c
        [("D", 3, 6, None, None), ("U", 9, 6, "a", 91)], # delete; c→a move
    ]
    for ev in batches:
        t.merge(spark, _batch(spark, ev))
        ix2 = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=4)  # restart
        applied = ix2.refresh(spark, t)
        assert applied == t.manifest()["cdf_seq"]
        for v in ("a", "b", "c", "zzz"):
            assert_lookup(v)
    # idempotent: nothing new
    assert ix.refresh(spark, t) == t.manifest()["cdf_seq"]


def test_secondary_index_rejects_unportable_type(spark, tmp_path):
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    t = _mk(spark, tmp_path, "t", BASE)
    with pytest.raises(ValueError, match="probes reproduce"):
        SecondaryIndex(tmp_path / "ix", col="nope", pk_cols=["k"]).build(spark, t)


def test_secondary_index_semi_probe_equals_literal_probe(spark, tmp_path):
    """lookup_pks_semi (the over-cap fallback: broadcast semi against
    the whole index, no driver-side value list) returns the same PK set
    as lookup_pks_in, scans ONLY index paths (never the base table),
    and broadcasts the key side."""
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex
    from tidb2dw_spark.plans import audit

    t = _mk(spark, tmp_path, "t", BASE)
    ix = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=4)
    ix.build(spark, t)
    keys = spark.createDataFrame([("a",), ("b",), ("zzz",)], "grp string")
    got = ix.lookup_pks_semi(spark, keys)
    want = sorted(
        r["k"] for r in ix.lookup_pks_in(spark, ["a", "b", "zzz"]).collect()
    )
    assert sorted(r["k"] for r in got.collect()) == want
    a = audit(got)
    assert "BroadcastHashJoin" in a.plan and "LeftSemi" in a.plan
    # every parquet scan in the plan reads the INDEX, not the base table
    for line in a.plan.splitlines():
        if "InMemoryFileIndex" in line:
            assert "/ix/" in line and "/t/" not in line, line


def test_stream_changes_and_streaming_refresh(spark, tmp_path):
    """The feed as a Structured Streaming source: an availableNow drain
    yields exactly the manifest-gated changes() rows, and the streaming
    refresh keeps a maintained aggregate equal to a recompute — including
    across a second drain with new commits (file-source checkpoint picks
    up only the new seq dirs)."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate, init_agg
    from tidb2dw_spark.streaming.stream import stream_changes, stream_refresh_aggregate

    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11), ("D", 2, 5, None, None)]))

    q = (
        stream_changes(spark, t)
        .writeStream.format("memory")
        .queryName("cdf_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_mem"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(
        (r["k"], r["_change_type"], r["val"], r["_commit_seq"])
        for r in spark.table("cdf_stream").collect()
    )
    want = sorted(
        (r["k"], r["_change_type"], r["val"], r["_commit_seq"])
        for r in t.changes(spark).collect()
    )
    assert got == want

    mv = MaintainedAggregate(tmp_path / "mv", ["grp"], {"total": "val"})
    mv.refresh(spark, t)  # seed at current state

    def assert_fresh():
        got = {r["grp"]: (r["n_rows"], r["total"]) for r in mv.read(spark).collect()}
        want = {
            r["grp"]: (r["n_rows"], r["total"])
            for r in init_agg(t.read(spark), ["grp"], {"total": "val"}).collect()
        }
        assert got == want

    for ev in ([("I", 8, 6, "c", 80)], [("U", 8, 7, "a", 81)]):
        t.merge(spark, _batch(spark, ev))
        q = stream_refresh_aggregate(
            spark, t, mv, checkpoint_dir=str(tmp_path / "ckpt_mv")
        )
        q.awaitTermination(60)
        assert_fresh()


def test_streaming_refresh_maintains_minmax(spark, tmp_path):
    """The streaming wake-up path drives MIN/MAX maintenance too: a
    batch that deletes a group's extremum arrives through the feed
    stream, and the foreachBatch refresh (idempotent by applied_seq)
    leaves the aggregate equal to a recompute."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate
    from tidb2dw_spark.streaming.stream import stream_refresh_aggregate

    t = _mk(spark, tmp_path, "t", BASE)
    mv = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"total": "val"},
        min_cols={"min_val": "val"}, max_cols={"max_val": "val"},
    )
    mv.refresh(spark, t)  # seed
    # delete group a's max (k=2, val=20) and move b's row to a new value
    t.merge(spark, _batch(spark, [("D", 2, 5, None, None), ("U", 3, 5, "b", 7)]))
    q = stream_refresh_aggregate(
        spark, t, mv, checkpoint_dir=str(tmp_path / "ckpt_mm")
    )
    q.awaitTermination(60)
    key = lambda x: (x[0] is None, x)  # noqa: E731
    got = sorted(
        (
            (r["grp"], r["n_rows"], r["total"], r["min_val"], r["max_val"])
            for r in mv.read(spark).collect()
        ),
        key=key,
    )
    want = sorted(
        (
            (r["grp"], r["n_rows"], r["total"], r["min_val"], r["max_val"])
            for r in t.read(spark)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("val"), F.lit(0)).alias("total"),
                F.min("val").alias("min_val"),
                F.max("val").alias("max_val"),
            )
            .collect()
        ),
        key=key,
    )
    assert got == want


def test_cascade_replication_via_export(spark, tmp_path):
    """A → warehouse₁ → (export) → warehouse₂: snapshot exported at seq S,
    changelog exported since S, consumed by a second IncrementConsumer —
    the chained table equals the source after every export round,
    including NULLs, deletes, inserts and value moves."""
    from tidb2dw_spark.schema.types import table_def_to_struct
    from tidb2dw_spark.sources.export import (
        export_changelog,
        export_snapshot,
        table_def_from_manifest,
    )
    from tidb2dw_spark.sources.snapshot import read_snapshot_csv, snapshot_glob
    from tidb2dw_spark.streaming.consumer import IncrementConsumer

    t1 = _mk(spark, tmp_path, "t1", BASE)
    stage = tmp_path / "stage2"
    s = export_snapshot(spark, t1, stage, "tpch", "chained")
    assert s == 0

    t1.merge(spark, _batch(spark, [
        ("U", 1, 5, "b", 11), ("D", 2, 5, None, None), ("I", 9, 5, None, 90),
    ]))
    t1.merge(spark, _batch(spark, [("U", 9, 6, "c", 91), ("I", 2, 6, "a", 22)]))
    last = export_changelog(spark, t1, stage, "tpch", "chained", since=s)
    assert last == 2

    td = table_def_from_manifest(t1, "tpch", "chained")
    snap = read_snapshot_csv(
        spark,
        snapshot_glob(str(stage / "snapshot"), "tpch", "chained"),
        table_def_to_struct(td),
    )
    t2 = ManagedTable(tmp_path / "wh2" / "chained").create(
        snap, td.pk_columns, pk_buckets=2
    )
    c = IncrementConsumer(spark, stage / "increment", t2).poll_once()
    assert c.files_processed >= 2

    def state(t):
        return {r["k"]: (r["grp"], r["val"]) for r in t.read(spark).collect()}

    assert state(t2) == state(t1)

    # continuation: new commits on the source export into the same layout
    t1.merge(spark, _batch(spark, [("D", 9, 7, None, None), ("U", 1, 7, "a", 12)]))
    export_changelog(spark, t1, stage, "tpch", "chained", since=last)
    IncrementConsumer(spark, stage / "increment", t2).poll_once()
    assert state(t2) == state(t1)


def test_delete_where_update_where(spark, tmp_path):
    """Engine-originated DML routes through merge: bucket-pruned commits,
    feed rows with pre-images, MoR parity, and a PK-assignment guard."""
    t = _mk(spark, tmp_path, "t", BASE)
    t.update_where(spark, F.col("grp") == "a", {"val": F.col("val") + 1})
    assert {r["k"]: r["val"] for r in t.read(spark).collect()} == {
        1: 11, 2: 21, 3: 30, 4: 40,
    }
    t.delete_where(spark, F.col("val") > 25)
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2]
    ch = _changes(spark, t)
    assert (3, "delete", "b", 30, 2) in ch and (4, "delete", None, 40, 2) in ch
    assert (1, "update_preimage", "a", 10, 1) in ch
    with pytest.raises(ValueError, match="primary-key"):
        t.update_where(spark, F.col("grp") == "a", {"k": F.lit(99)})
    # MoR twin: same DML, same final state, no base rewrite
    m = _mk(spark, tmp_path, "m", BASE, merge_mode="mor")
    v0 = m.version()
    m.update_where(spark, F.col("grp") == "a", {"val": F.col("val") + 1})
    m.delete_where(spark, F.col("val") > 25)
    assert m.version() == v0
    assert {r["k"]: r["val"] for r in m.read(spark).collect()} == {1: 11, 2: 21}


def test_restore_rolls_back_metadata_only(spark, tmp_path):
    """restore(commit) re-points the manifest at the historical state as
    a new auditable commit — no data rewrite — and the table keeps
    merging (and feeding the CDF without seq collisions) on top."""
    import os

    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "a", 11)]))
    after_m1 = {r["k"]: r["val"] for r in t.read(spark).collect()}
    t.merge(spark, _batch(spark, [("D", 3, 6, None, None), ("I", 9, 6, "c", 90)]))
    n_files_before = sum(len(fs) for _, _, fs in os.walk(tmp_path / "t"))

    t.restore(1)  # back to the first merge's state
    # metadata-only: only the manifest + commit log changed
    n_files_after = sum(len(fs) for _, _, fs in os.walk(tmp_path / "t"))
    assert n_files_after == n_files_before
    assert {r["k"]: r["val"] for r in t.read(spark).collect()} == after_m1
    assert t.history()[-1]["action"] == "restore"

    # merges continue from the restored state; feed seq keeps advancing
    t.merge(spark, _batch(spark, [("U", 4, 7, None, 44)]))
    assert t.manifest()["cdf_seq"] == 3
    got = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert got == {**after_m1, 4: 44}
    # restore FORWARD to the pre-restore state works the same way
    t.restore(2)
    assert {r["k"]: r["val"] for r in t.read(spark).collect()} == {
        1: 11, 2: 20, 4: 40, 9: 90,
    }


def test_restore_refuses_vacuumed_state(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", BASE, buckets=2)
    for ts in (5, 6, 7):
        t.merge(
            spark, _batch(spark, [("U", k, ts, g, v + ts) for k, g, v in BASE])
        )
    t.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="vacuum"):
        t.restore(0)


def test_rebucket_preserves_state_and_merges(spark, tmp_path):
    """rebucket: full rewrite under a new bucket count — state identical,
    point lookups prune under the new layout, merges keep working."""
    t = _mk(spark, tmp_path, "t", BASE, buckets=2)
    t.merge(spark, _batch(spark, [("U", 1, 5, "a", 11)]))
    before = {r["k"]: (r["grp"], r["val"]) for r in t.read(spark).collect()}
    t.rebucket(spark, 8)
    assert t.manifest()["pk_buckets"] == 8
    assert t.history()[-1]["action"] == "rebucket"
    assert {r["k"]: (r["grp"], r["val"]) for r in t.read(spark).collect()} == before
    keys = spark.createDataFrame([(1,), (4,)], "k long")
    got = {r["k"] for r in t.read_for_keys(spark, keys).collect()}
    assert got == {1, 4}
    t.merge(spark, _batch(spark, [("I", 7, 6, "d", 70)]))
    assert {r["k"] for r in t.read(spark).collect()} == {1, 2, 3, 4, 7}


def test_read_for_keys_collects_keys_once_under_cap(spark, tmp_path, monkeypatch):
    """read_for_keys materializes the key set with ONE capped collect and
    semi-joins against the resulting LocalRelation — the lazy keys
    lineage must not re-execute inside the final plan.  Past
    READ_PROBE_CAP the keys frame stays distributed (lazy lineage in the
    plan) and the result is identical."""
    import tidb2dw_spark.table.managed as mg

    t = _mk(spark, tmp_path, "t", BASE, buckets=2)
    # a keys frame with a recognizable lazy lineage (Range scan)
    keys = spark.range(1, 3).select(F.col("id").alias("k"))

    under = t.read_for_keys(spark, keys)
    assert {r["k"] for r in under.collect()} == {1, 2}
    assert "Range" not in under._jdf.queryExecution().toString(), (
        "under the cap the keys lineage must be replaced by the "
        "collected LocalRelation, not re-executed in the semi-join"
    )

    monkeypatch.setattr(mg, "READ_PROBE_CAP", 1)
    over = t.read_for_keys(spark, keys)
    assert {r["k"] for r in over.collect()} == {1, 2}
    assert "Range" in over._jdf.queryExecution().toString(), (
        "past the cap the keys frame must stay distributed"
    )


def test_count_rows_metadata_fast_path(spark, tmp_path):
    """count_rows(): parquet-footer sum equals a real count for CoW state
    at every stage; MoR with pending deltas resolves through the read."""
    t = _mk(spark, tmp_path, "t", BASE, buckets=2)
    assert t.count_rows() == 4
    t.merge(spark, _batch(spark, [("D", 1, 5, None, None), ("I", 9, 5, "c", 90)]))
    assert t.count_rows() == t.read(spark).count() == 4
    m = _mk(spark, tmp_path, "m", BASE, merge_mode="mor")
    m.merge(spark, _batch(spark, [("D", 1, 5, None, None)]))
    with pytest.raises(ValueError, match="pending MoR"):
        m.count_rows()
    assert m.count_rows(spark) == 3
    m.compact(spark, max_files_per_bucket=1000)
    assert m.count_rows() == 3  # deltas folded: footer path exact again


def test_vacuumed_feed_fails_loudly_not_silently(spark, tmp_path):
    """A consumer whose checkpoint lags vacuum_changes retention must get
    an error, not a silent gap in the feed."""
    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "a", 11)]))
    t.merge(spark, _batch(spark, [("U", 1, 6, "a", 12)]))
    t.vacuum_changes(keep_since=1)
    with pytest.raises(ValueError, match="re-seed"):
        t.changes(spark, since=0)
    # a checkpoint at/after the retention mark still reads fine
    assert t.changes(spark, since=1).count() == 2


def test_mor_time_travel_refuses_vacuumed_deltas(spark, tmp_path):
    """read_at/restore of a MoR commit whose pending deltas were folded
    and vacuumed must refuse — a silent skip would read rows as never
    merged."""
    m = _mk(spark, tmp_path, "m", BASE, merge_mode="mor")
    m.merge(spark, _batch(spark, [("U", 1, 5, "a", 11)]))
    # the delta-bearing commit is readable while its delta files live
    assert {r["k"]: r["val"] for r in m.read_at(spark, 1).collect()}[1] == 11
    m.compact(spark, max_files_per_bucket=1000)
    m.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="delta seq"):
        m.read_at(spark, 1).count()
    with pytest.raises(ValueError, match="delta seq"):
        m.restore(1)
    # current state unaffected
    assert {r["k"]: r["val"] for r in m.read(spark).collect()}[1] == 11


def test_restore_plain_table_restores_data(spark, tmp_path):
    """Plain tables roll back through the data_version pointer — restore
    must move the DATA, not just the schema manifest."""
    t = _mk(spark, tmp_path, "t", BASE, buckets=0)
    t.merge(spark, _batch(spark, [("U", 1, 5, "a", 11), ("D", 2, 5, None, None)]))
    after_m1 = {r["k"]: r["val"] for r in t.read(spark).collect()}
    t.merge(spark, _batch(spark, [("I", 9, 6, "c", 90)]))
    t.restore(1)
    assert {r["k"]: r["val"] for r in t.read(spark).collect()} == after_m1
    # and vacuum must protect the restored-to data dir
    t.vacuum(keep_last=1)
    assert {r["k"]: r["val"] for r in t.read(spark).collect()} == after_m1
    # merging on top continues from the restored state
    t.merge(spark, _batch(spark, [("U", 3, 7, "b", 33)]))
    assert {r["k"]: r["val"] for r in t.read(spark).collect()} == {
        **after_m1, 3: 33,
    }


def test_read_current_version_explicitly_is_full_table(spark, tmp_path):
    """read(version=current) on a bucketed table must equal read(): the
    raw v=N dir holds only the buckets the last commit rewrote."""
    t = _mk(spark, tmp_path, "t", BASE, buckets=4)
    t.merge(spark, _batch(spark, [("U", 1, 5, "a", 11)]))  # touches 1 bucket
    full = {r["k"] for r in t.read(spark).collect()}
    assert {r["k"] for r in t.read(spark, version=t.version()).collect()} == full
    assert len(full) == 4


def test_changes_across_widening_modify(spark, tmp_path):
    """Feed commits straddling a metadata-only int→bigint widening have
    same-named, differently-typed files — the grouped read must not merge
    them into one scan (parquet type conversion would fail)."""
    import json as _json

    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol

    t = ManagedTable(tmp_path / "t")
    t.create(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, qty int"),
        ["k"], pk_buckets=2, cdf=True,
    )
    env = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, qty int"
    )
    t.merge(spark, spark.createDataFrame([("U", "t", "s", 5, 1, 11)], env))
    v1 = [
        TableCol(id="1", name="k", tp="bigint", is_pk="true"),
        TableCol(id="2", name="qty", tp="int"),
    ]
    v2 = [v1[0], TableCol(id="4", name="qty", tp="bigint")]
    apply_column_diffs(spark, t, diff_columns(v1, v2))
    env2 = env.replace("qty int", "qty long")
    t.merge(
        spark,
        spark.createDataFrame([("U", "t", "s", 6, 2, 9_999_999_999)], env2),
    )
    rows = sorted(
        (r["k"], r["qty"], r["_change_type"], r["_commit_seq"])
        for r in t.changes(spark).collect()
    )
    assert (2, 9_999_999_999, "update_postimage", 2) in rows
    assert (1, 11, "update_postimage", 1) in rows
    assert all(isinstance(q, int) for _, q, _, _ in rows)


def _rename_grp_to_category(spark, t):
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol

    prev = [
        TableCol(id="1", name="k", tp="bigint", is_pk="true", nullable="false"),
        TableCol(id="2", name="grp", tp="varchar", precision="10"),
        TableCol(id="3", name="val", tp="bigint"),
    ]
    curr = [
        prev[0],
        TableCol(id="2", name="category", tp="varchar", precision="10"),
        prev[2],
    ]
    apply_column_diffs(spark, t, diff_columns(prev, curr))


def test_changes_span_rename_barrier_by_field_id(spark, tmp_path):
    """changes() conforms across a rewrite-path RENAME by field id: a
    slice spanning the barrier surfaces pre-rename change files under the
    CURRENT name with their true values (not defaults) — the rename
    re-seed caveat is retired for field-id tables."""
    t = _mk(spark, tmp_path, "t", BASE)
    assert t.manifest()["field_ids"] == {"k": 1, "grp": 2, "val": 3}
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11), ("I", 9, 5, "c", 90)]))
    _rename_grp_to_category(spark, t)
    m = t.manifest()
    assert m["field_ids"] == {"k": 1, "category": 2, "val": 3}
    assert m["field_epochs"] == [{"upto_seq": 1, "ids": {"k": 1, "grp": 2, "val": 3}}]
    env2 = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, category string, val long"
    )
    t.merge(
        spark,
        spark.createDataFrame([("U", "t", "s", 6, 9, "d", 91)], env2),
    )
    ch = t.changes(spark)  # spans the barrier, since=0
    assert "category" in ch.columns and "grp" not in ch.columns
    rows = sorted(
        (r["_commit_seq"], r["k"], r["_change_type"], r["category"], r["val"])
        for r in ch.collect()
    )
    assert rows == [
        (1, 1, "update_postimage", "b", 11),
        (1, 1, "update_preimage", "a", 10),
        (1, 9, "insert", "c", 90),
        (2, 9, "update_postimage", "d", 91),
        (2, 9, "update_preimage", "c", 90),
    ]
    # base read reflects the rename + both merges
    assert sorted((r["k"], r["category"]) for r in t.read(spark).collect()) == sorted(
        [(1, "b"), (2, "a"), (3, "b"), (4, None), (9, "d")]
    )


def test_changes_never_resurrect_dropped_field_into_readded_name(spark, tmp_path):
    """DROP then ADD of the same name: change files written before the
    DROP physically carry the DEAD field's cells under that name (the
    feed is never rewritten by DDL).  The drop-time field epoch + id
    conformance must surface the re-added column as NULL for pre-DROP
    commits — not the old field's values."""
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol

    t = _mk(spark, tmp_path, "t", BASE)
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11)]))  # seq 1: grp cells
    k = TableCol(id="1", name="k", tp="bigint", is_pk="true", nullable="false")
    grp = TableCol(id="2", name="grp", tp="varchar", precision="10")
    val = TableCol(id="3", name="val", tp="bigint")
    grp2 = TableCol(id="9", name="grp", tp="varchar", precision="10")
    apply_column_diffs(spark, t, diff_columns([k, grp, val], [k, val]))  # DROP
    assert t.manifest()["field_epochs"], "DROP recorded no field epoch"
    apply_column_diffs(spark, t, diff_columns([k, val], [k, grp2, val]))  # re-ADD
    env2 = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, grp string, val long"
    )
    t.merge(spark, spark.createDataFrame([("U", "t", "s", 6, 1, "new", 12)], env2))
    rows = sorted(
        (r["_commit_seq"], r["_change_type"], r["grp"], r["val"])
        for r in t.changes(spark).filter(F.col("k") == 1).collect()
    )
    # seq-1 rows: the re-added grp did NOT exist — NULL, never 'a'/'b'
    assert rows == [
        (1, "update_postimage", None, 11),
        (1, "update_preimage", None, 10),
        (2, "update_postimage", "new", 12),
        (2, "update_preimage", None, 11),
    ], rows


def test_maintained_aggregate_survives_rename_barrier(spark, tmp_path):
    """A MaintainedAggregate seeded before a base-table RENAME of its
    group column keeps folding the feed across the barrier (field-id
    translation), its output schema pinned to the seed names — and stays
    bit-equal to a full recompute of the renamed base."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate

    t = _mk(spark, tmp_path, "t", BASE)
    mv = MaintainedAggregate(tmp_path / "mv", ["grp"], {"sum_val": "val"})
    mv.refresh(spark, t)  # seed
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11), ("I", 9, 5, "c", 90)]))
    _rename_grp_to_category(spark, t)
    env2 = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, category string, val long"
    )
    t.merge(
        spark,
        spark.createDataFrame(
            [("U", "t", "s", 6, 9, "a", 91), ("D", "t", "s", 6, 3, None, None)],
            env2,
        ),
    )
    mv.refresh(spark, t)  # ONE refresh spanning the rename barrier
    key = lambda x: (x[0] is None, x)  # noqa: E731 — NULL group sorts last
    got = sorted(
        ((r["grp"], r["n_rows"], r["sum_val"]) for r in mv.read(spark).collect()),
        key=key,
    )
    want = sorted(
        (
            (r["category"], r["n_rows"], r["sum_val"])
            for r in t.read(spark)
            .groupBy("category")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("val").alias("sum_val"))
            .collect()
        ),
        key=key,
    )
    assert got == want


def test_maintained_distinct_survives_rename_barrier(spark, tmp_path):
    """A MaintainedDistinctAggregate seeded before a base RENAME of its
    group column keeps folding across the barrier (field-id translation
    of both the feed and the support-pair deltas), output schema pinned
    to seed names, bit-equal to a COUNT(DISTINCT) recompute."""
    from tidb2dw_spark.operators.distinct_matview import (
        MaintainedDistinctAggregate,
    )

    t = _mk(spark, tmp_path, "t", BASE)
    mv = MaintainedDistinctAggregate(
        tmp_path / "mv", ["grp"], {"n_val": "val"}, n_buckets=2
    )
    mv.refresh(spark, t)  # seed
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 20), ("I", 9, 5, "c", 90)]))
    _rename_grp_to_category(spark, t)
    env2 = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, category string, val long"
    )
    t.merge(
        spark,
        spark.createDataFrame(
            # k=2 moves its val onto k=1's (20 in 'b'? no: k=1 moved to
            # 'b' with val 20); delete k=3 removes 'b''s last 30
            [("U", "t", "s", 6, 2, "b", 20), ("D", "t", "s", 6, 3, None, None)],
            env2,
        ),
    )
    mv.refresh(spark, t)  # ONE refresh spanning the rename barrier
    key = lambda x: (x[0] is None, x)  # noqa: E731
    got = sorted(
        ((r["grp"], r["n_rows"], r["n_val"]) for r in mv.read(spark).collect()),
        key=key,
    )
    want = sorted(
        (
            (r["category"], r["n_rows"], r["n_val"])
            for r in t.read(spark)
            .groupBy("category")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(F.col("val")).alias("n_val"),
            )
            .collect()
        ),
        key=key,
    )
    assert got == want


def test_secondary_index_survives_rename_barrier(spark, tmp_path):
    """An index built on 'grp' before the base renames it to 'category'
    refreshes across the barrier un-re-seeded (feed translated by field
    id), and the object may be reconstructed under EITHER name."""
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    t = _mk(spark, tmp_path, "t", BASE)
    ix = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=4)
    ix.build(spark, t)
    t.merge(spark, _batch(spark, [("U", 1, 5, "b", 11), ("I", 9, 5, "c", 90)]))
    _rename_grp_to_category(spark, t)
    env2 = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, category string, val long"
    )
    t.merge(
        spark,
        spark.createDataFrame([("U", "t", "s", 6, 9, "a", 91)], env2),
    )
    # reconstructed under the CURRENT base name — field ids reconcile
    ix2 = SecondaryIndex(tmp_path / "ix", col="category", pk_cols=["k"], n_buckets=4)
    assert ix2.refresh(spark, t) == t.manifest()["cdf_seq"]
    for probe in ("a", "b", "c", "zzz"):
        got = sorted(r["k"] for r in ix2.lookup(spark, t, probe).collect())
        want = sorted(
            r["k"] for r in t.read(spark).filter(F.col("category") == probe).collect()
        )
        assert got == want, (probe, got, want)
    # the build-time name keeps working too (stored names are authoritative)
    ix3 = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=4)
    assert sorted(r["k"] for r in ix3.lookup(spark, t, "a").collect()) == want_or(
        t, spark, "a"
    )


def want_or(t, spark, probe):
    return sorted(
        r["k"] for r in t.read(spark).filter(F.col("category") == probe).collect()
    )


def test_maintained_minmax_survives_extremum_deletes(spark, tmp_path):
    """MIN/MAX maintenance: inserts tighten in the fold; a delete (or
    update-away) of a group's CURRENT extremum marks the group dirty and
    re-derives min/max from ONLY that group's base rows.  Adversarial
    sequence: delete the max, delete the min, move a row's value across
    groups, delete down to duplicates at the extremum — after every
    refresh the aggregate must be bit-equal to a full recompute."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate

    rows = [
        (1, "a", 10), (2, "a", 50), (3, "a", 50), (4, "a", 5),
        (5, "b", 7), (6, "b", 9), (7, None, 3), (8, None, 100),
    ]
    t = _mk(spark, tmp_path, "t", rows)
    mv = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"sum_val": "val"},
        min_cols={"min_val": "val"}, max_cols={"max_val": "val"},
    )
    mv.refresh(spark, t)  # seed

    def check():
        key = lambda x: (x[0] is None, x)  # noqa: E731
        got = sorted(
            (
                (r["grp"], r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
                for r in mv.read(spark).collect()
            ),
            key=key,
        )
        want = sorted(
            (
                (r["grp"], r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
                for r in t.read(spark)
                .groupBy("grp")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.coalesce(F.sum("val"), F.lit(0)).alias("sum_val"),
                    F.min("val").alias("min_val"),
                    F.max("val").alias("max_val"),
                )
                .collect()
            ),
            key=key,
        )
        assert got == want, (got, want)

    batches = [
        # delete one of the duplicate maxes in 'a' (max must STAY 50)
        [("D", 2, 5, None, None)],
        # delete the remaining max in 'a' (max falls to 10)
        [("D", 3, 6, None, None)],
        # delete the NULL-group max; update moves b's max into group 'a'
        [("D", 8, 7, None, None), ("U", 6, 7, "a", 9)],
        # insert new global max + delete a's min in one batch
        [("I", 9, 8, "a", 999), ("D", 4, 8, None, None)],
        # update the max's VALUE downward in place (pre=999 removes max)
        [("U", 9, 9, "a", 11)],
    ]
    for ev in batches:
        t.merge(spark, _batch(spark, ev))
        mv.refresh(spark, t)
        check()
    # and a single refresh spanning several extremum-removing commits
    mv2 = MaintainedAggregate(
        tmp_path / "mv2", ["grp"], {"sum_val": "val"},
        min_cols={"min_val": "val"}, max_cols={"max_val": "val"},
    )
    t2 = _mk(spark, tmp_path, "t2", rows)
    mv2.refresh(spark, t2)
    for ev in batches:
        t2.merge(spark, _batch(spark, ev))
    mv2.refresh(spark, t2)  # one spanning fold
    key = lambda x: (x[0] is None, x)  # noqa: E731
    got = sorted(
        (
            (r["grp"], r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
            for r in mv2.read(spark).collect()
        ),
        key=key,
    )
    want = sorted(
        (
            (r["grp"], r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
            for r in t2.read(spark)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("val"), F.lit(0)).alias("sum_val"),
                F.min("val").alias("min_val"),
                F.max("val").alias("max_val"),
            )
            .collect()
        ),
        key=key,
    )
    assert got == want


def test_secondary_index_composite_key(spark, tmp_path):
    """Composite (grp, val) index: tuple probes equal a full-scan filter
    across build, merge (value moves, deletes, inserts, NULL members),
    and refresh."""
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    t = _mk(spark, tmp_path, "t", BASE)
    ix = SecondaryIndex(
        tmp_path / "ix", col=["grp", "val"], pk_cols=["k"], n_buckets=4
    )
    ix.build(spark, t)

    def assert_lookup(g, v):
        got = sorted(r["k"] for r in ix.lookup(spark, t, (g, v)).collect())
        want = sorted(
            r["k"]
            for r in t.read(spark)
            .filter((F.col("grp") == g) & (F.col("val") == v))
            .collect()
        )
        assert got == want, ((g, v), got, want)

    assert_lookup("a", 10)
    assert_lookup("a", 20)
    assert_lookup("b", 30)
    assert_lookup("zzz", 1)
    t.merge(
        spark,
        _batch(
            spark,
            [
                ("U", 1, 5, "a", 99),     # value member moves
                ("I", 9, 5, "b", 30),     # duplicate composite value
                ("D", 2, 5, None, None),  # delete
                ("I", 10, 5, None, 7),    # NULL member: not indexed
            ],
        ),
    )
    ix.refresh(spark, t)
    for g, v in [("a", 10), ("a", 99), ("a", 20), ("b", 30), ("zzz", 1)]:
        assert_lookup(g, v)
    # NULL-member row is not indexed; equality probes can't match it anyway
    assert ix.lookup_pks(spark, (None, 7)).count() == 0


def test_secondary_index_range_layout(spark, tmp_path):
    """Range layout: value-sorted buckets + per-bucket zone maps; range
    probes read ONLY intersecting buckets and equal a full-scan BETWEEN
    across merges that move values between buckets."""
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    rows = [(k, "g", k * 10) for k in range(1, 41)]  # val 10..400
    t = _mk(spark, tmp_path, "t", rows, buckets=4)
    ix = SecondaryIndex(
        tmp_path / "ix", col="val", pk_cols=["k"], n_buckets=4, layout="range"
    )
    ix.build(spark, t)
    m = ix.meta()
    assert m["layout"] == "range" and m["boundaries"] and m["zone"]

    def assert_range(lo, hi):
        got = sorted(r["k"] for r in ix.lookup_range(spark, t, lo, hi).collect())
        want = sorted(
            r["k"]
            for r in t.read(spark)
            .filter((F.col("val") >= lo) & (F.col("val") <= hi))
            .collect()
        )
        assert got == want, ((lo, hi), got, want)

    # a narrow probe must touch a strict subset of buckets
    narrow = ix._range_buckets(10, 30)
    assert len(narrow) < len(ix.meta()["zone"])
    for lo, hi in [(10, 30), (95, 205), (390, 500), (401, 999), (0, 9)]:
        assert_range(lo, hi)
    # moves: min value jumps to the top bucket; a delete; an insert
    t.merge(
        spark,
        _batch(
            spark,
            [("U", 1, 5, "g", 999), ("D", 40, 5, None, None), ("I", 41, 5, "g", 5)],
        ),
    )
    ix.refresh(spark, t)
    for lo, hi in [(0, 9), (10, 30), (95, 205), (390, 1000), (5, 5)]:
        assert_range(lo, hi)
    # equality probes work on the range layout too (bisect twin)
    got = sorted(r["k"] for r in ix.lookup(spark, t, 999).collect())
    assert got == [1]
    # BOUNDARY values: approxQuantile boundaries ARE data values, and the
    # writer keeps a boundary-equal value in the LOWER bucket — the
    # driver-side bisect must mirror that exactly (regression: bucket 0's
    # boundary probed into bucket 1 and silently returned empty)
    for (b,) in ix.boundaries:
        got = sorted(r["k"] for r in ix.lookup(spark, t, b).collect())
        want = sorted(
            r["k"] for r in t.read(spark).filter(F.col("val") == b).collect()
        )
        assert got == want, (b, got, want)
        assert_range(b, b)


def test_secondary_index_range_layout_date_string_composite(spark, tmp_path):
    """Range layout over (string, date) COMPOSITE keys: boundaries are
    typed tuples compared lexicographically (struct ordering Spark-side,
    tuple bisect driver-side), zone maps carry encoded tuples through the
    JSON meta, and a date-BETWEEN probe under a status prefix — the
    reference warehouses' SORTKEY pattern (redshiftsql/sql.go:52-92) —
    reads only zone-intersecting buckets and equals a full-scan filter,
    across refreshes that move keys between buckets."""
    import datetime as dt

    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    d0 = dt.date(2024, 1, 1)
    rows = [
        (k, "F" if k % 3 else "O", d0 + dt.timedelta(days=k), k)
        for k in range(1, 61)
    ]
    schema = "k long, status string, d date, val long"
    env = ("flag string, tablename string, schemaname string, commit_ts long, "
           "k long, status string, d date, val long")
    t = ManagedTable(tmp_path / "t")
    t.create(
        spark.createDataFrame(rows, schema), pk_cols=["k"], pk_buckets=4,
        cdf=True,
    )
    ix = SecondaryIndex(
        tmp_path / "ix", col=["status", "d"], pk_cols=["k"], n_buckets=4,
        layout="range",
    )
    ix.build(spark, t)
    m = ix.meta()
    assert m["key_types"] == ["string", "date"]
    assert m["boundaries"] and all(isinstance(b, list) for b in m["boundaries"])
    # meta survives a JSON round trip via a fresh object (dates re-typed)
    ix2 = SecondaryIndex(
        tmp_path / "ix", col=["status", "d"], pk_cols=["k"], n_buckets=4,
        layout="range",
    )

    def assert_range(index, lo, hi):
        got = sorted(r["k"] for r in index.lookup_range(spark, t, lo, hi).collect())
        key_ge = (F.col("status") > lo[0]) | (
            (F.col("status") == lo[0]) & (F.col("d") >= F.lit(lo[1]))
        )
        key_le = (F.col("status") < hi[0]) | (
            (F.col("status") == hi[0]) & (F.col("d") <= F.lit(hi[1]))
        )
        want = sorted(
            r["k"] for r in t.read(spark).filter(key_ge & key_le).collect()
        )
        assert got == want, ((lo, hi), got, want)

    probes = [
        (("F", d0 + dt.timedelta(days=5)), ("F", d0 + dt.timedelta(days=20))),
        (("F", d0), ("F", d0 + dt.timedelta(days=365))),  # all of status F
        (("A", d0), ("Z", d0 + dt.timedelta(days=365))),  # everything
        (("O", d0 + dt.timedelta(days=3)), ("O", d0 + dt.timedelta(days=3))),
        (("G", d0), ("N", d0)),  # empty band between statuses
    ]
    for lo, hi in probes:
        assert_range(ix, lo, hi)
        assert_range(ix2, lo, hi)  # reconstructed object, decoded meta
    # a status-F-only probe must not read every bucket (zones separate
    # the lexicographically-later O keys)
    f_buckets = ix._range_buckets(
        ("F", d0), ("F", d0 + dt.timedelta(days=365))
    )
    assert len(f_buckets) < len(ix.meta()["zone"])
    # ISO-string date probes decode for convenience
    got_iso = sorted(
        r["k"]
        for r in ix.lookup_range(
            spark, t, ("F", "2024-01-06"), ("F", "2024-01-21")
        ).collect()
    )
    assert got_iso == sorted(
        r["k"] for r in ix.lookup_range(spark, t, probes[0][0], probes[0][1]).collect()
    )
    # refresh: moves across buckets, a delete, an insert, a NULL member
    t.merge(
        spark,
        spark.createDataFrame(
            [
                ("U", "t", "s", 5, 1, "Z", d0 + dt.timedelta(days=400), 99),
                ("D", "t", "s", 5, 2, None, None, None),
                ("I", "t", "s", 5, 100, "F", d0 - dt.timedelta(days=1), 7),
                ("I", "t", "s", 5, 101, None, d0, 8),
            ],
            env,
        ),
    )
    ix.refresh(spark, t)
    for lo, hi in probes + [
        (("Z", d0), ("Z", dt.date(2026, 1, 1))),
        (("F", d0 - dt.timedelta(days=2)), ("F", d0)),
    ]:
        assert_range(ix, lo, hi)
    # single-column STRING range key also admitted now
    ixs = SecondaryIndex(
        tmp_path / "ixs", col="status", pk_cols=["k"], n_buckets=2,
        layout="range",
    )
    ixs.build(spark, t)
    got = sorted(
        r["k"] for r in ixs.lookup_range(spark, t, "F", "F").collect()
    )
    want = sorted(
        r["k"] for r in t.read(spark).filter(F.col("status") == "F").collect()
    )
    assert got == want


def test_maintained_minmax_group_born_and_shrunk_inside_one_slice(spark, tmp_path):
    """A group that did not exist before the slice, whose intra-slice
    delete removes the add-side extremum, must still rescan (regression:
    dirty detection required a stored extremum, so least(NULL, add_min)
    reported the deleted value)."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate

    t = _mk(spark, tmp_path, "t", [(1, "z", 0)])
    mv = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"sum_val": "val"},
        min_cols={"min_val": "val"}, max_cols={"max_val": "val"},
    )
    mv.refresh(spark, t)  # seed: only group 'z'
    # commit 1: group 'g' born with values 1 and 5; commit 2: delete the
    # min (1) and the max (5) survivors... delete 1 only — true min is 5
    t.merge(spark, _batch(spark, [("I", 10, 5, "g", 1), ("I", 11, 5, "g", 5)]))
    t.merge(spark, _batch(spark, [("D", 10, 6, None, None)]))
    mv.refresh(spark, t)  # ONE refresh spans birth and shrink
    rows = {r["grp"]: (r["n_rows"], r["min_val"], r["max_val"])
            for r in mv.read(spark).collect()}
    assert rows["g"] == (1, 5, 5), rows
    # and the max-side twin: delete the intra-slice max
    t2 = _mk(spark, tmp_path, "t2", [(1, "z", 0)])
    mv2 = MaintainedAggregate(
        tmp_path / "mv2", ["grp"], {"sum_val": "val"},
        min_cols={"min_val": "val"}, max_cols={"max_val": "val"},
    )
    mv2.refresh(spark, t2)
    t2.merge(spark, _batch(spark, [("I", 10, 5, "g", 1), ("I", 11, 5, "g", 5)]))
    t2.merge(spark, _batch(spark, [("D", 11, 6, None, None)]))
    mv2.refresh(spark, t2)
    rows2 = {r["grp"]: (r["n_rows"], r["min_val"], r["max_val"])
             for r in mv2.read(spark).collect()}
    assert rows2["g"] == (1, 1, 1), rows2


def test_rebucket_plain_table_unpins_data_version(spark, tmp_path):
    """rebucket() on a previously-PLAIN table drops the stale
    data_version key: bucketed tables resolve data through
    bucket_versions only, and vacuum() unconditionally pins data_version
    into the referenced set — without the pop, the old full-copy v=
    directory would never be collectable."""
    t = _mk(spark, tmp_path, "t", BASE, buckets=0)
    assert "data_version" in t.manifest()
    t.rebucket(spark, 4)
    m = t.manifest()
    assert "data_version" not in m
    assert m["pk_buckets"] == 4
    # the old plain v=1 directory is now unreferenced outside the
    # retention window and collectable
    t.merge(spark, _batch(spark, [("I", 9, 5, "c", 90)]))
    removed = t.vacuum(keep_last=1)
    assert 1 in removed
    assert sorted((r["k"], r["grp"]) for r in t.read(spark).collect()) == sorted(
        [(1, "a"), (2, "a"), (3, "b"), (4, None), (9, "c")]
    )


def test_secondary_index_refresh_spanning_multiple_commits(spark, tmp_path):
    """ONE refresh over a slice where a PK's indexed value changes more
    than once must not leave stale intermediate entries: commit 1 inserts
    value 'c', commit 2 moves it c→'x', commit 3 moves it x→'b' — the
    (c, pk) and (x, pk) additions from the earlier commits must be dead
    after the single spanning refresh (regression: the pairwise fold
    anti-joined removals against the pre-refresh base only, so
    intermediate additions survived the union and lookup served rows
    whose current value no longer matched the probe)."""
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    t = _mk(spark, tmp_path, "t", BASE)
    ix = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=4)
    ix.build(spark, t)
    t.merge(spark, _batch(spark, [("I", 9, 5, "c", 90)]))
    t.merge(spark, _batch(spark, [("U", 9, 6, "x", 91)]))
    t.merge(spark, _batch(spark, [("U", 9, 7, "b", 92)]))
    # also: a pre-existing key deleted after an intermediate move
    t.merge(spark, _batch(spark, [("U", 1, 8, "q", 11)]))
    t.merge(spark, _batch(spark, [("D", 1, 9, None, None)]))
    assert ix.refresh(spark, t) == t.manifest()["cdf_seq"]
    for probe in ("a", "b", "c", "x", "q"):
        got = sorted(r["k"] for r in ix.lookup(spark, t, probe).collect())
        want = sorted(
            r["k"] for r in t.read(spark).filter(F.col("grp") == probe).collect()
        )
        assert got == want, (probe, got, want)
    # and the index itself carries no stale entries (not masked by the
    # defensive lookup filter): probe the raw PK sets
    assert sorted(r["k"] for r in ix.lookup_pks(spark, "c").collect()) == []
    assert sorted(r["k"] for r in ix.lookup_pks(spark, "x").collect()) == []
    assert sorted(r["k"] for r in ix.lookup_pks(spark, "q").collect()) == []
    assert 9 in {r["k"] for r in ix.lookup_pks(spark, "b").collect()}


def test_secondary_index_lookup_reverifies_against_base(spark, tmp_path):
    """A STALE index (base merged, refresh not yet run) must surface a
    probe on the old value as a miss, not as a row whose current value
    differs from the probe: lookup() re-filters the base read."""
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    t = _mk(spark, tmp_path, "t", BASE)
    ix = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=4)
    ix.build(spark, t)
    t.merge(spark, _batch(spark, [("U", 1, 5, "moved", 11)]))  # a→moved, no refresh
    got = [r["k"] for r in ix.lookup(spark, t, "a").collect()]
    assert 1 not in got  # k=1's current value is 'moved', not 'a'


def test_secondary_index_meta_is_authoritative(spark, tmp_path):
    """A reconstructed index object adopts the persisted n_buckets (a
    different constructor value would silently mis-hash probes) and a
    col/pk mismatch is an error."""
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    t = _mk(spark, tmp_path, "t", BASE)
    SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=8).build(spark, t)
    # wrong constructor bucket count: adopted from disk, lookups stay right
    ix = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"], n_buckets=32)
    got = sorted(r["k"] for r in ix.lookup(spark, t, "a").collect())
    assert got == [1, 2]
    assert ix.n_buckets == 8
    with pytest.raises(ValueError, match="is over"):
        SecondaryIndex(tmp_path / "ix", col="val", pk_cols=["k"]).lookup_pks(spark, 1)


def test_update_where_swap_uses_preimage(spark, tmp_path):
    """SQL UPDATE semantics: all SET expressions read the PRE-update row,
    so swapping two columns must actually swap."""
    t = ManagedTable(tmp_path / "t")
    t.create(
        spark.createDataFrame([(1, 10, 100)], "k long, a long, b long"),
        ["k"], pk_buckets=2,
    )
    t.update_where(spark, F.col("k") == 1, {"a": F.col("b"), "b": F.col("a")})
    row = t.read(spark).collect()[0]
    assert (row["a"], row["b"]) == (100, 10)


from hypothesis import given, settings, strategies as st  # noqa: E402

_mm_event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 5),                          # key
    st.sampled_from(["a", "b", None]),          # group (NULL included)
    st.integers(0, 20),                         # value
)


@settings(max_examples=6, deadline=None)
@given(
    batches=st.lists(
        st.lists(_mm_event, min_size=1, max_size=6), min_size=1, max_size=3
    ),
    present=st.sets(st.integers(0, 5)),
)
def test_maintained_minmax_matches_recompute_on_random_feeds(
    spark, batches, present
):
    """Property: for ANY random I/U/D batch sequence (group moves, NULL
    groups, extremum deletes, births and deaths inside one slice), the
    maintained SUM/COUNT/MIN/MAX aggregate equals a full recompute —
    both when refreshed per batch and when ONE refresh spans the whole
    sequence."""
    import tempfile
    from pathlib import Path

    from tidb2dw_spark.operators.matview import MaintainedAggregate

    root = Path(tempfile.mkdtemp(prefix="mmprop_"))
    rows = [(k, "a" if k % 2 else None, -k) for k in sorted(present)] or [
        (99, "z", 0)
    ]
    t = _mk(spark, root, "t", rows)
    mv_each = MaintainedAggregate(
        root / "mv1", ["grp"], {"sum_val": "val"},
        min_cols={"min_val": "val"}, max_cols={"max_val": "val"},
    )
    mv_span = MaintainedAggregate(
        root / "mv2", ["grp"], {"sum_val": "val"},
        min_cols={"min_val": "val"}, max_cols={"max_val": "val"},
    )
    mv_each.refresh(spark, t)
    mv_span.refresh(spark, t)

    ts = 100
    for ev in batches:
        batch = []
        for flag, k, g, v in ev:
            batch.append((flag, k, ts, None if flag == "D" else g,
                          None if flag == "D" else v))
            ts += 1
        t.merge(spark, _batch(spark, batch))
        mv_each.refresh(spark, t)

    mv_span.refresh(spark, t)  # one spanning fold

    key = lambda x: (x[0] is None, x)  # noqa: E731
    want = sorted(
        (
            (r["grp"], r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
            for r in t.read(spark)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("val"), F.lit(0)).alias("sum_val"),
                F.min("val").alias("min_val"),
                F.max("val").alias("max_val"),
            )
            .collect()
        ),
        key=key,
    )
    for mv in (mv_each, mv_span):
        got = sorted(
            (
                (r["grp"], r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
                for r in mv.read(spark).collect()
            ),
            key=key,
        )
        assert got == want, (got, want)


def test_stream_derived_refresh_list_across_rename(spark, tmp_path):
    """The streaming wake-up path generalizes to a LIST of derived
    objects and, riding the commit-log source, its checkpoint SURVIVES a
    rewrite-path RENAME barrier between drains: the second drain (same
    checkpoint) wakes the refreshes, which conform by field id — index
    probes answer under the new column name and the aggregate equals a
    recompute, with no re-seed anywhere."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate, init_agg
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex
    from tidb2dw_spark.streaming.stream import stream_derived_refresh

    t = _mk(spark, tmp_path, "t", BASE)
    mv = MaintainedAggregate(tmp_path / "mv", ["grp"], {"total": "val"})
    ix = SecondaryIndex(tmp_path / "ix", col="grp", pk_cols=["k"])
    mv.refresh(spark, t)
    ix.build(spark, t)

    t.merge(spark, _batch(spark, [("I", 8, 5, "c", 80), ("U", 1, 5, "b", 11)]))
    ck = str(tmp_path / "ck")
    q = stream_derived_refresh(spark, t, [ix, mv], checkpoint_dir=ck)
    assert q.awaitTermination(120)
    assert sorted(
        r["k"] for r in ix.lookup(spark, t, "b").collect()
    ) == [1, 3]

    _rename_grp_to_category(spark, t)
    env2 = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, category string, val long"
    )
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", "t", "s", 6, 9, "c", 90), ("D", "t", "s", 6, 8, None, None)],
            env2,
        ),
    )
    # SAME checkpoint: the commit-log offsets span the barrier
    q = stream_derived_refresh(spark, t, [ix, mv], checkpoint_dir=ck)
    assert q.awaitTermination(120)
    assert sorted(
        r["k"] for r in ix.lookup(spark, t, "c").collect()
    ) == [9]
    got = {
        r[0]: (r[1], r[2])
        for r in (
            (r["grp"], r["n_rows"], r["total"]) for r in mv.read(spark).collect()
        )
    }
    want = {
        r["category"]: (r["n_rows"], r["total"])
        for r in init_agg(
            t.read(spark).withColumnRenamed("category", "grp"), ["grp"],
            {"total": "val"},
        ).withColumnRenamed("grp", "category").collect()
    }
    assert got == want


def test_range_index_timestamp_keys_non_utc_driver(spark, tmp_path):
    """A TIMESTAMP range key must answer correctly when the DRIVER's OS
    zone is not UTC: classic PySpark converts collected timestamps and
    datetime literals through the OS-LOCAL zone (fromtimestamp/mktime)
    even though the session zone is pinned UTC — without explicit
    normalization, zone maps shift and probe literals land 5h off.
    Regression for the round-6 review finding; on a UTC host the
    normalization is a no-op, so this test forces TZ."""
    import datetime as dt
    import os
    import time as _time

    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        # fixture timestamps from SQL string casts: parsed in the SESSION
        # zone (UTC), no Python datetime conversion involved
        rows = spark.sql(
            "SELECT id AS k, CAST(ts AS TIMESTAMP) AS o_ts, id * 10 AS val "
            "FROM VALUES "
            + ", ".join(
                f"({i}, '1995-{m:02d}-{d:02d} {h:02d}:00:00')"
                for i, (m, d, h) in enumerate(
                    [(mm, dd, hh) for mm in (1, 3, 5, 7) for dd in (2, 17)
                     for hh in (1, 13)]
                )
            )
            + " AS v(id, ts)"
        )
        t = ManagedTable(tmp_path / "t")
        t.create(rows, pk_cols=["k"], pk_buckets=2, cdf=True)
        ix = SecondaryIndex(
            tmp_path / "ix", col="o_ts", pk_cols=["k"], n_buckets=4,
            layout="range",
        )
        ix.build(spark, t)
        lo, hi = dt.datetime(1995, 3, 1), dt.datetime(1995, 5, 31)
        got = sorted(
            r["k"] for r in ix.lookup_range(spark, t, lo, hi).collect()
        )
        want = sorted(
            r["k"]
            for r in t.read(spark).filter(
                "o_ts BETWEEN TIMESTAMP'1995-03-01 00:00:00' "
                "AND TIMESTAMP'1995-05-31 00:00:00'"
            ).collect()
        )
        assert got == want and got  # non-trivial interval
        # a plain DATE probe against the timestamp key coerces to
        # midnight instead of raising (review finding #3)
        got_d = sorted(
            r["k"]
            for r in ix.lookup_range(
                spark, t, dt.date(1995, 3, 1), dt.date(1995, 5, 31)
            ).collect()
        )
        assert got_d == want
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        _time.tzset()


def test_matview_timestamp_group_box_non_utc_driver(spark, tmp_path):
    """A TIMESTAMP group key's dirty-group literal box must select the
    right groups on a NON-UTC driver, including DST FOLD hours: classic
    PySpark collects timestamps via OS-local fromtimestamp and rebuilds
    literals via mktime, which collapses the fold's two UTC instants
    onto one — so the dirty rescan silently skipped one group and its
    stale (tightened-only) min survived.  The fix routes collected
    datetimes local→UTC (fold-aware astimezone) and builds ISO-string
    cast literals parsed in the session zone (ADVICE round-6 medium)."""
    import os
    import time as _time

    from tidb2dw_spark.operators.matview import (
        apply_changes_to_agg,
        init_agg,
    )

    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        # two group keys that are DIFFERENT UTC instants but the SAME
        # naive local wall time in New York (the 2024-11-03 fold hour):
        # 05:30Z = 01:30 EDT (fold 0), 06:30Z = 01:30 EST (fold 1)
        base = spark.sql(
            "SELECT CAST(ts AS TIMESTAMP) AS g, k, val FROM VALUES "
            "('2024-11-03 05:30:00', 1, 10), ('2024-11-03 05:30:00', 2, 20),"
            "('2024-11-03 06:30:00', 3, 11), ('2024-11-03 06:30:00', 4, 21) "
            "AS v(ts, k, val)"
        )
        agg = init_agg(base, ["g"], {}, min_cols={"min_val": "val"})
        # delete EACH group's current minimum -> both groups go dirty and
        # must be re-derived from the base through the literal box
        changes = spark.sql(
            "SELECT CAST(ts AS TIMESTAMP) AS g, k, val, "
            "'delete' AS _change_type FROM VALUES "
            "('2024-11-03 05:30:00', 1, 10), "
            "('2024-11-03 06:30:00', 3, 11) AS v(ts, k, val)"
        )
        new_base = base.filter(~F.col("k").isin(1, 3))
        got = {
            (r["g"], r["min_val"], r["n_rows"])
            for r in apply_changes_to_agg(
                agg, changes, ["g"], {}, min_cols={"min_val": "val"},
                base=new_base,
            ).collect()
        }
        want = {
            (r["g"], r["min_val"], r["n_rows"])
            for r in init_agg(
                new_base, ["g"], {}, min_cols={"min_val": "val"}
            ).collect()
        }
        assert got == want
        assert {r[1] for r in got} == {20, 21}  # both rescans landed
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        _time.tzset()


def test_matview_legacy_meta_without_mm_outs_refreshes(spark, tmp_path):
    """A min/max view whose _meta.json predates the round-6 'mm_outs' key
    (legacy seed) must keep refreshing — its persisted state is valid —
    and the refresh backfills the key so the strict mismatch check
    applies from then on (ADVICE round-6 low)."""
    import json as _json

    from tidb2dw_spark.operators.matview import MaintainedAggregate

    t = _mk(spark, tmp_path, "t", BASE)
    mv = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"total": "val"}, min_cols={"lo": "val"}
    )
    mv.refresh(spark, t)
    meta = _json.loads((tmp_path / "mv" / "_meta.json").read_text())
    del meta["mm_outs"]  # simulate the pre-round-6 layout
    (tmp_path / "mv" / "_meta.json").write_text(_json.dumps(meta))
    t.merge(spark, _batch(spark, [("D", 1, 5, None, None), ("I", 9, 5, "b", 5)]))
    mv2 = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"total": "val"}, min_cols={"lo": "val"}
    )
    mv2.refresh(spark, t)
    got = {
        (r["grp"], r["total"], r["lo"], r["n_rows"])
        for r in mv2.read(spark).collect()
    }
    want = {
        (r["grp"], r["total"], r["lo"], r["n_rows"])
        for r in t.read(spark)
        .groupBy("grp")
        .agg(
            F.coalesce(F.sum("val"), F.lit(0)).alias("total"),
            F.min("val").alias("lo"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert got == want
    assert _json.loads((tmp_path / "mv" / "_meta.json").read_text())[
        "mm_outs"
    ] == ["lo"]
    # a legacy meta whose stored state LACKS the constructed extrema
    # still fails loudly (it genuinely needs a rebuild)
    meta = _json.loads((tmp_path / "mv" / "_meta.json").read_text())
    del meta["mm_outs"]
    (tmp_path / "mv" / "_meta.json").write_text(_json.dumps(meta))
    bad = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"total": "val"},
        min_cols={"lo": "val"}, max_cols={"hi": "val"},
    )
    t.merge(spark, _batch(spark, [("U", 2, 9, "a", 23)]))
    with pytest.raises(ValueError, match="lacks extrema"):
        bad.refresh(spark, t)


def test_matview_legacy_meta_idle_feed_backfills_and_guards_extrema(
    spark, tmp_path
):
    """Round-7 ADVICE (both low items): (a) a legacy meta on an IDLE
    table persists the mm_outs backfill immediately (not only with the
    next data commit), so the strict mismatch check applies from the very
    next construction; (b) a constructor with NO min/max opening a legacy
    meta whose store carries extrema refuses instead of silently dropping
    the persisted columns on the next fold."""
    import json as _json

    from tidb2dw_spark.operators.matview import MaintainedAggregate

    t = _mk(spark, tmp_path, "t", BASE)
    mv = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"total": "val"}, min_cols={"lo": "val"}
    )
    mv.refresh(spark, t)
    meta_p = tmp_path / "mv" / "_meta.json"
    meta = _json.loads(meta_p.read_text())
    del meta["mm_outs"]
    meta_p.write_text(_json.dumps(meta))
    # (b) no-min/max constructor vs a store carrying 'lo' → loud refusal
    dropper = MaintainedAggregate(tmp_path / "mv", ["grp"], {"total": "val"})
    with pytest.raises(ValueError, match="does not maintain"):
        dropper.refresh(spark, t)
    # (a) matching constructor, feed IDLE (no merges since seed): the
    # refresh no-ops but the meta upgrade must still land on disk
    mv2 = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"total": "val"}, min_cols={"lo": "val"}
    )
    before = mv2.meta()["version"]
    mv2.refresh(spark, t)
    upgraded = _json.loads(meta_p.read_text())
    assert upgraded["mm_outs"] == ["lo"]
    assert upgraded["version"] == before  # metadata-only rewrite
    # and the strict check now fires without any data commit in between
    strict = MaintainedAggregate(
        tmp_path / "mv", ["grp"], {"total": "val"}, max_cols={"hi": "val"}
    )
    with pytest.raises(ValueError, match="seeded with min/max"):
        strict.refresh(spark, t)


# ---------------------------------------------------------------------------
# Round 8: expression measures + derived grain keys on the SINGLE-table
# maintained aggregate (the symmetry of the join view's algebra — a
# row-local expression commutes with ± folding exactly as a column).
# ---------------------------------------------------------------------------
def test_matview_expr_measures_and_derived_group(spark, tmp_path):
    """Sum-of-squares (second moment) and a conditional count maintained
    as expression measures; the group key is a DERIVED band the rollup
    never stores the dependency of.  Churn moves rows across derived
    bands and flips the CASE arm — always bit-equal to a recompute."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate

    t = _mk(spark, tmp_path, "t", BASE)
    mv = MaintainedAggregate(
        tmp_path / "mv",
        ["band"],
        sum_cols={
            "total": "val",
            "total_sq": "val * val",
            "n_a": "CASE WHEN grp = 'a' THEN 1 ELSE 0 END",
        },
        measure_cols=["grp"],
        derived_cols={"band": ("CAST(val / 25 AS INT)", ["val"])},
    )
    mv.refresh(spark, t)

    def recompute():
        df = (
            t.read(spark)
            .withColumn("band", F.expr("CAST(val / 25 AS INT)"))
            .groupBy("band")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("val").alias("total"),
                F.sum(F.expr("val * val")).alias("total_sq"),
                F.sum(F.expr("CASE WHEN grp = 'a' THEN 1 ELSE 0 END")).alias("n_a"),
            )
        )
        return {
            r["band"]: (r["n_rows"], r["total"], r["total_sq"], r["n_a"])
            for r in df.collect()
        }

    def state():
        return {
            r["band"]: (r["n_rows"], r["total"], r["total_sq"], r["n_a"])
            for r in mv.read(spark).collect()
        }

    assert state() == recompute()
    assert "val" not in mv.read(spark).columns  # dependency never stored
    # val 10→60 crosses band 0→2; grp flip moves the CASE; delete + insert
    t.merge(spark, _batch(spark, [
        ("U", 1, 5, "b", 60),
        ("U", 3, 5, "a", 30),
        ("D", 4, 5, None, None),
        ("I", 9, 5, "a", 77),
    ]))
    mv.refresh(spark, t)
    assert state() == recompute()


def test_matview_derived_minmax_rescan(spark, tmp_path):
    """MIN/MAX over an expression measure: removing a group's extremum
    routes through the dirty rescan, which must evaluate the SAME
    expression over the (derived-injected) base."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate

    t = _mk(spark, tmp_path, "t", BASE)
    mv = MaintainedAggregate(
        tmp_path / "mv",
        ["grp"],
        sum_cols={"total": "val"},
        max_cols={"max_neg": "0 - val"},
        measure_cols=["val"],
    )
    mv.refresh(spark, t)
    got = {r["grp"]: r["max_neg"] for r in mv.read(spark).collect()}
    assert got["a"] == -10  # max(-10, -20)
    t.merge(spark, _batch(spark, [("D", 1, 5, None, None)]))  # removes -10
    mv.refresh(spark, t)
    got = {r["grp"]: r["max_neg"] for r in mv.read(spark).collect()}
    assert got["a"] == -20


def test_matview_derived_definition_drift_rejected(spark, tmp_path):
    from tidb2dw_spark.operators.matview import MaintainedAggregate

    t = _mk(spark, tmp_path, "t", BASE)

    def mk(expr):
        return MaintainedAggregate(
            tmp_path / "mv", ["band"], {"total": "val"},
            derived_cols={"band": (expr, ["val"])},
        )

    mk("CAST(val / 25 AS INT)").refresh(spark, t)
    t.merge(spark, _batch(spark, [("U", 1, 5, "a", 11)]))
    with pytest.raises(ValueError, match="derived columns"):
        mk("CAST(val / 10 AS INT)").refresh(spark, t)
    # shadowing a physical column is refused at seed
    with pytest.raises(ValueError, match="shadow"):
        MaintainedAggregate(
            tmp_path / "mv2", ["grp"], {"total": "val"},
            derived_cols={"val": ("val + 1", ["val"])},
        ).refresh(spark, t)


def test_stream_wake_shares_one_feed_slice(spark, tmp_path):
    """The streaming wake-up with N derived objects folds from ONE real
    feed read per drain (SliceSharingTable inside foreachBatch) — same
    amortization as the replicator poll loop — and both views still
    equal recomputes."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate, init_agg
    from tidb2dw_spark.operators.sketch import MaintainedCountMinSketch
    from tidb2dw_spark.streaming.stream import stream_derived_refresh
    from tidb2dw_spark.table.managed import ManagedTable as MT

    t = _mk(spark, tmp_path, "t", BASE)
    mv = MaintainedAggregate(tmp_path / "mv", ["grp"], {"total": "val"})
    cms = MaintainedCountMinSketch(
        tmp_path / "cms", ["grp"], "val", depth=2, width=32
    )
    mv.refresh(spark, t)
    cms.refresh(spark, t)

    t.merge(spark, _batch(spark, [
        ("I", 8, 5, "c", 80), ("U", 1, 5, "b", 11), ("D", 2, 5, None, None),
    ]))
    calls = []
    orig = MT.changes

    def counting(self, spark_, since=0, until=None):
        calls.append((since, until))
        return orig(self, spark_, since=since, until=until)

    MT.changes = counting
    try:
        q = stream_derived_refresh(
            spark, t, [mv, cms], checkpoint_dir=str(tmp_path / "ck")
        )
        assert q.awaitTermination(120)
    finally:
        MT.changes = orig
    # the commit-log SOURCE reads no change rows itself (offsets come
    # from the manifest); the two refreshes shared ONE slice read
    assert len(calls) == 1, calls

    key = lambda r: tuple(("" if x is None else str(x)) for x in r)  # noqa: E731
    want_mv = sorted(
        map(tuple, init_agg(t.read(spark), ["grp"], {"total": "val"}).collect()),
        key=key,
    )
    assert sorted(map(tuple, mv.read(spark).collect()), key=key) == want_mv
    ref = MaintainedCountMinSketch(
        tmp_path / "ref", ["grp"], "val", depth=2, width=32
    )
    ref.refresh(spark, t)
    assert sorted(map(tuple, cms.read(spark).collect()), key=key) == sorted(
        map(tuple, ref.read(spark).collect()), key=key
    )
