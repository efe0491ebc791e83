"""Merge-on-read mode for ManagedTable.

CoW rewrites every touched ~25 GB bucket to apply one row; MoR lands a
CDC batch as per-bucket delta files (O(batch) write) and resolves
last-writer-wins at read.  These tests pin the contract:

- differential equivalence: any sequence of merges on a MoR table reads
  identically to the same sequence on a CoW twin (the CoW path IS the
  oracle — it is itself oracle-checked by the driver gate);
- write amplification: a merge must not rewrite base files;
- point lookups, compaction folding, vacuum of folded deltas, restart
  (state lives in the manifest, not the object);
- property test: random I/U/D batches vs the dictionary model.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tidb2dw_spark.table.managed import ManagedTable

SCHEMA = "k long, val long"
ENV = "flag string, tablename string, schemaname string, commit_ts long, k long, val long"


def _mk(spark, tmp_path, mode, rows, buckets=4):
    t = ManagedTable(tmp_path / mode)
    t.create(
        spark.createDataFrame(rows, SCHEMA), pk_cols=["k"],
        pk_buckets=buckets, merge_mode=mode if mode == "mor" else "cow",
    )
    return t


def _batch(spark, events):
    return spark.createDataFrame(
        [(f, "t", "s", ts, k, v) for f, k, ts, v in events] or
        [("D", "t", "s", 0, None, None)],
        ENV,
    ).filter("k IS NOT NULL")


def _state(spark, t: ManagedTable) -> dict:
    return {r["k"]: r["val"] for r in t.read(spark).collect()}


BATCHES = [
    [("I", 10, 1, 100), ("U", 2, 1, 201)],
    [("D", 2, 2, 0), ("I", 11, 2, 110), ("U", 10, 2, 101)],
    [("U", 11, 3, 111), ("D", 10, 3, 0), ("I", 2, 3, 222)],
]


@pytest.fixture()
def twins(spark, tmp_path):
    rows = [(k, -k) for k in range(8)]
    return (
        _mk(spark, tmp_path, "cow", rows),
        _mk(spark, tmp_path, "mor", rows),
    )


def test_mor_requires_buckets(spark, tmp_path):
    t = ManagedTable(tmp_path / "bad")
    with pytest.raises(ValueError, match="bucketed"):
        t.create(spark.createDataFrame([(1, 1)], SCHEMA), ["k"],
                 pk_buckets=0, merge_mode="mor")


def test_mor_reads_equal_cow_after_each_merge(spark, tmp_path, twins):
    cow, mor = twins
    for ev in BATCHES:
        cow.merge(spark, _batch(spark, ev))
        mor.merge(spark, _batch(spark, ev))
        assert _state(spark, mor) == _state(spark, cow)


def test_mor_merge_writes_no_base_files(spark, tmp_path, twins):
    _, mor = twins
    before = {str(p) for p in mor.root.rglob("v=*/**/*.parquet")}
    mor.merge(spark, _batch(spark, BATCHES[0]))
    after = {str(p) for p in mor.root.rglob("v=*/**/*.parquet")}
    assert after == before  # zero base rewrite — the point of MoR
    assert list(mor.root.glob("delta/seq=1/*")), "delta commit missing"
    assert mor.manifest()["bucket_deltas"]  # referenced in the manifest


def test_mor_point_lookup_sees_deltas(spark, twins):
    _, mor = twins
    for ev in BATCHES:
        mor.merge(spark, _batch(spark, ev))
    keys = spark.createDataFrame([(2,), (10,), (11,)], "k long")
    got = {r["k"]: r["val"] for r in mor.read_for_keys(spark, keys).collect()}
    assert got == {2: 222, 11: 111}  # 10 deleted in the last batch


def test_mor_compact_folds_and_vacuum_collects(spark, twins):
    cow, mor = twins
    for ev in BATCHES:
        cow.merge(spark, _batch(spark, ev))
        mor.merge(spark, _batch(spark, ev))
    v = mor.compact(spark, max_files_per_bucket=1000)  # only deltas trigger
    assert v is not None
    assert mor.manifest()["bucket_deltas"] == {}
    assert _state(spark, mor) == _state(spark, cow)
    mor.vacuum(keep_last=1)
    assert not list(mor.root.glob("delta/seq=*")), "folded deltas not collected"
    assert _state(spark, mor) == _state(spark, cow)


def test_mor_survives_restart(spark, twins):
    cow, mor = twins
    for ev in BATCHES[:2]:
        cow.merge(spark, _batch(spark, ev))
        mor.merge(spark, _batch(spark, ev))
    reopened = ManagedTable(mor.root)  # state is all manifest
    reopened.merge(spark, _batch(spark, BATCHES[2]))
    cow.merge(spark, _batch(spark, BATCHES[2]))
    assert _state(spark, reopened) == _state(spark, cow)


def test_mor_delete_only_batch(spark, twins):
    cow, mor = twins
    ev = [("D", 1, 1, 0), ("D", 3, 1, 0)]
    cow.merge(spark, _batch(spark, ev))
    mor.merge(spark, _batch(spark, ev))
    assert _state(spark, mor) == _state(spark, cow)
    assert 1 not in _state(spark, mor)


event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 9),
    st.integers(0, 30),
    st.integers(0, 99),
)


@settings(max_examples=6, deadline=None)
@given(batches=st.lists(st.lists(event, min_size=1, max_size=10), min_size=1, max_size=3))
def test_mor_random_batches_match_cow(spark, tmp_path_factory, batches):
    tmp = tmp_path_factory.mktemp("mor_prop")
    # drop same-key same-ts conflicts per batch (either winner is legal)
    clean = []
    for ev in batches:
        seen, u = set(), []
        for e in ev:
            if (e[1], e[2]) not in seen:
                seen.add((e[1], e[2]))
                u.append(e)
        clean.append(u)
    rows = [(k, -k) for k in range(5)]
    cow = _mk(spark, tmp, "cow", rows, buckets=2)
    mor = _mk(spark, tmp, "mor", rows, buckets=2)
    for ev in clean:
        cow.merge(spark, _batch(spark, ev))
        mor.merge(spark, _batch(spark, ev))
    assert _state(spark, mor) == _state(spark, cow)


def test_consumer_full_lifecycle_on_mor_table(spark, tmp_path):
    """The incremental consumer is mode-agnostic: pointed at a MoR table,
    every poll commits deltas (no base rewrite), a DDL rewrite barrier
    resolves pending deltas into the evolved base, and the end state
    matches the CoW lifecycle test's semantics."""
    from tests.test_consumer import users_def_v1, users_def_v2, write
    from tidb2dw_spark.schema.types import table_def_to_struct
    from tidb2dw_spark.sources.snapshot import read_snapshot_csv
    from tidb2dw_spark.streaming.consumer import IncrementConsumer

    snap, incr = tmp_path / "snapshot", tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",\\N,1991-02-02\n'
          '3,"carol",41,1992-03-03\n4,"dan",52,1993-04-04\n')
    v1 = users_def_v1()
    snap_df = read_snapshot_csv(
        spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)
    )
    table = ManagedTable(tmp_path / "wh" / "users").create(
        snap_df, v1.pk_columns, pk_buckets=4, merge_mode="mor"
    )

    v1.dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"alice2",31,1990-01-01\n'
          '"I","users","tpch",101,5,"eve",25,1995-05-05\n')
    write(incr / "tpch/users/1/2024-01-01/CDC000002.csv",
          '"D","users","tpch",200,2,"bob",\\N,1991-02-02\n'
          '"U","users","tpch",201,5,"eve2",26,1995-05-05\n')
    consumer = IncrementConsumer(spark, incr, table)
    base_before = {str(p) for p in table.root.rglob("v=*/**/*.parquet")}
    report = consumer.poll_once()
    assert report.files_processed == 2 and report.merge_commits == 1
    assert {str(p) for p in table.root.rglob("v=*/**/*.parquet")} == base_before
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert set(rows) == {1, 3, 4, 5}
    assert rows[1]["name"] == "alice2" and rows[5]["age"] == 26

    # DDL barrier (rename+drop+add => rewrite path) folds the pending
    # deltas into the evolved base and clears them
    v2 = users_def_v2()
    v2.dump(incr / "tpch/users/2/meta")
    write(incr / "tpch/users/2/2024-01-02/CDC000001.csv",
          '"U","users","tpch",300,3,"red",1992-03-03,"f"\n')
    report = consumer.poll_once()
    assert report.ddl_applied == 1
    rows = {r["id"]: r for r in table.read(spark).collect()}
    assert set(rows) == {1, 3, 4, 5}
    assert rows[3]["color"] == "red" and rows[3]["gender"] == "f"
    assert rows[1]["color"] == "alice2" and rows[1]["gender"] is None
    # the post-DDL merge landed as a fresh delta on the evolved base
    m = table.manifest()
    assert m["merge_mode"] == "mor"


def test_mor_backlog_soak_bounded_deltas(spark, tmp_path):
    """Soak on a MoR table: a 40-file single-version backlog consumed
    with auto-compaction every 2 merges keeps the pending delta count
    bounded, never rewrites base outside compaction, and converges to
    the same state as a CoW twin fed the same files."""
    from tests.test_consumer import users_def_v1, write
    from tidb2dw_spark.schema.types import table_def_to_struct
    from tidb2dw_spark.sources.snapshot import read_snapshot_csv
    from tidb2dw_spark.streaming.consumer import IncrementConsumer

    snap, incr = tmp_path / "snapshot", tmp_path / "increment"
    write(snap / "tpch.users.000000001.csv",
          "".join(f'{k},"u{k}",20,1990-01-01\n' for k in range(30)))
    v1 = users_def_v1()
    snap_df = read_snapshot_csv(
        spark, f"{snap}/tpch.users.*.csv", table_def_to_struct(v1)
    )
    cow = ManagedTable(tmp_path / "wh" / "cow").create(
        snap_df, v1.pk_columns, pk_buckets=8)
    mor = ManagedTable(tmp_path / "wh" / "mor").create(
        snap_df, v1.pk_columns, pk_buckets=8, merge_mode="mor")
    v1.dump(incr / "tpch/users/1/meta")
    for i in range(1, 41):
        k = (i % 5) + 1
        write(incr / f"tpch/users/1/2024-01-01/CDC{i:06d}.csv",
              f'"U","users","tpch",{1000 + i},{k},"f{i}",21,1990-01-01\n')

    # both consumers share one increment root: the CoW twin goes first
    # with write_markers=False (markers written by the MoR consumer would
    # otherwise hide the files from it)
    mc = IncrementConsumer(spark, incr, mor, compact_after_merges=2)
    cc = IncrementConsumer(spark, incr, cow, write_markers=False)
    r2 = cc.poll_once()
    r1 = mc.poll_once()
    assert r1.files_processed == 40 and r2.files_processed == 40

    # grouped consume = ONE merge commit = one delta seq, then compaction
    # cadence keeps pending deltas below the threshold at all times
    pending = sum(len(v) for v in mor.manifest().get("bucket_deltas", {}).values())
    assert pending <= 2 * 8  # ≤ compact_after_merges × touched buckets

    s_mor = {r["id"]: r["name"] for r in mor.read(spark).collect()}
    s_cow = {r["id"]: r["name"] for r in cow.read(spark).collect()}
    assert s_mor == s_cow
    assert s_mor[1] == "f40"  # i=40 → key 1

    # steady state: compact + vacuum flatten the delta dirs away
    mor.compact(spark, max_files_per_bucket=0)
    mor.vacuum(keep_last=1)
    assert not list(mor.root.glob("delta/seq=*"))
    assert {r["id"]: r["name"] for r in mor.read(spark).collect()} == s_cow


def test_mor_delta_stats_prune_point_lookups(spark, tmp_path):
    """Delta key-range stats bound MoR read amplification: each merge
    records per-(seq, bucket) min/max of the leading pk; a point lookup
    resolves ONLY the pending deltas whose range overlaps the probed
    keys — non-overlapping deltas are dropped from the resolve window
    (asserted on _prune_delta_seqs), and results stay exact (asserted
    vs a full filter) including deletes recorded in skipped deltas."""
    rows = [(k, -k) for k in range(0, 400)]
    t = _mk(spark, tmp_path, "mor", rows, buckets=2)
    # three disjoint key neighborhoods, one delta seq each
    t.merge(spark, _batch(spark, [("U", k, 1, k * 10) for k in range(0, 20)]))
    t.merge(spark, _batch(spark, [("U", k, 2, k * 10) for k in range(100, 120)]))
    t.merge(
        spark,
        _batch(
            spark,
            [("U", k, 3, k * 10) for k in range(300, 310)]
            + [("D", 310, 3, 0)],
        ),
    )
    m = t.manifest()
    assert m.get("delta_stats"), "MoR merges recorded no delta stats"
    # probe key 105: only seq 2's range [100,120) can contain it
    probes = {
        r["b"]: {(105,)}
        for r in spark.createDataFrame([(105,)], "k long")
        .select(t._bucket_expr(["k"], 2).alias("b"))
        .collect()
    }
    pruned = t._prune_delta_seqs(m, probes)
    for b, vals in probes.items():
        kept = pruned["bucket_deltas"][str(b)]
        assert kept == [2], kept  # seqs 1 and 3 cannot contain key 105
    # correctness of the actual pruned reads, including a deleted key
    for k in (5, 105, 305, 310, 399):
        got = {
            r["k"]: r["val"]
            for r in t.read_for_keys(
                spark, spark.createDataFrame([(k,)], "k long")
            ).collect()
        }
        want = {
            r["k"]: r["val"]
            for r in t.read(spark).filter(F.col("k") == k).collect()
        }
        assert got == want, (k, got, want)
    # compaction folds deltas and GCs their stats
    t.compact(spark, max_files_per_bucket=10_000)
    assert not t.manifest().get("delta_stats")


def test_mor_delta_stats_composite_pk_conjunction(spark, tmp_path):
    """Composite-PK delta stats: footer harvesting records ranges for
    EVERY pk column, and probe pruning takes the conjunction — a delta
    whose leading-column range contains the probe but whose second
    column's range cannot is skipped.  A probe constraining only the
    later column (leading matches broadly) still prunes."""
    schema = "k long, sub string, val long"
    env = ("flag string, tablename string, schemaname string, "
           "commit_ts long, k long, sub string, val long")
    t = ManagedTable(tmp_path / "cmor")
    t.create(
        spark.createDataFrame(
            [(k, s, k) for k in range(50) for s in ("a", "b")], schema
        ),
        pk_cols=["k", "sub"], pk_buckets=1, merge_mode="mor",
    )

    def batch(events):
        return spark.createDataFrame(
            [("U", "t", "s", ts, k, s, v) for k, s, ts, v in events], env
        )

    # same leading-key neighborhood, disjoint second-column ranges
    t.merge(spark, batch([(k, "a", 1, k * 10) for k in range(0, 20)]))
    t.merge(spark, batch([(k, "b", 2, k * 100) for k in range(0, 20)]))
    m = t.manifest()
    ds = m.get("delta_stats", {})
    assert ds, "no delta stats harvested"
    # stats carry BOTH pk columns, as dict col -> [lo, hi]
    some = next(iter(ds.values()))
    rng = next(iter(some.values()))
    assert set(rng) == {"k", "sub"}, rng
    # probe (5, "b"): leading range of BOTH deltas contains 5, but only
    # seq 2's sub-range contains "b"
    pruned = t._prune_delta_seqs(m, {0: {(5, "b")}})
    assert pruned["bucket_deltas"]["0"] == [2], pruned["bucket_deltas"]
    # and the pruned read stays exact for keys resolved via either delta
    for k, s in ((5, "a"), (5, "b"), (40, "a")):
        got = {
            (r["k"], r["sub"]): r["val"]
            for r in t.read_for_keys(
                spark, spark.createDataFrame([(k, s)], "k long, sub string")
            ).collect()
        }
        want = {
            (r["k"], r["sub"]): r["val"]
            for r in t.read(spark)
            .filter((F.col("k") == k) & (F.col("sub") == s))
            .collect()
        }
        assert got == want, (k, s, got, want)


def test_history_commit_log(spark, tmp_path):
    """history(): one entry per manifest swap, labeled by action, with
    the MoR delta seq tracked."""
    rows = [(k, -k) for k in range(6)]
    t = _mk(spark, tmp_path, "mor", rows, buckets=2)
    t.merge(spark, _batch(spark, BATCHES[0]))
    t.merge(spark, _batch(spark, BATCHES[1]))
    t.compact(spark, max_files_per_bucket=1000)
    h = t.history()
    assert [e["action"] for e in h] == ["create", "merge-mor", "merge-mor", "compact"]
    assert h[1]["delta_seq"] == 1 and h[2]["delta_seq"] == 2
    assert h[-1]["version"] == t.version()
    cow = _mk(spark, tmp_path, "cow", rows, buckets=2)
    cow.merge(spark, _batch(spark, BATCHES[0]))
    assert [e["action"] for e in cow.history()] == ["create", "merge"]
