"""TSO-consistent cross-table snapshots (table/consistent.py +
ManagedTable.source_ts_high / read_as_of_source_ts).

Invariants: (1) merges advance the fence monotonically to the batch's
max commit_ts, on CoW, MoR, and plain tables alike, and metadata-only
commits inherit it; (2) a fence read returns the table state as of the
last commit within the fence; (3) a ConsistentSnapshot over two tables
churned with interleaved fences yields a join with NO torn read —
both tables' ≤ts changes visible, both >ts changes invisible; (4) the
pin is immutable: merges after construction don't move it; (5) a fence
earlier than the initial load is refused.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.table.consistent import ConsistentSnapshot
from tidb2dw_spark.table.managed import ManagedTable

SCHEMA = "k long, v long"
ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, v long"
)


def _t(spark, path, n=40, **kw):
    t = ManagedTable(path)
    t.create(
        spark.createDataFrame([(i, i * 10) for i in range(n)], SCHEMA),
        pk_cols=["k"], **kw,
    )
    return t


def _batch(spark, events):
    return spark.createDataFrame(
        [(f, "t", "s", ts, k, v) for f, k, ts, v in events], ENV
    )


@pytest.mark.parametrize(
    "kw", [{"pk_buckets": 4}, {"pk_buckets": 0}, {"pk_buckets": 4, "merge_mode": "mor"}],
    ids=["cow-bucketed", "plain", "mor"],
)
def test_merge_advances_source_ts_fence(spark, tmp_path, kw):
    t = _t(spark, tmp_path / "t", **kw)
    assert t.source_ts_high() == 0
    t.merge(spark, _batch(spark, [("I", 100, 7, 1), ("U", 0, 5, 2)]))
    assert t.source_ts_high() == 7
    # a batch entirely below the fence cannot move it backwards
    t.merge(spark, _batch(spark, [("I", 101, 3, 3)]))
    assert t.source_ts_high() == 7
    # the fence snapshots into the commit log
    assert [e.get("source_ts_high") for e in t.history()] == [0, 7, 7]


def test_fence_survives_metadata_commits(spark, tmp_path):
    t = _t(spark, tmp_path / "t", pk_buckets=4)
    t.merge(spark, _batch(spark, [("I", 100, 9, 1)]))
    t.update_meta(note="x")
    assert t.source_ts_high() == 9
    assert int(t.history()[-1]["source_ts_high"]) == 9


def test_read_as_of_source_ts_resolves_commits(spark, tmp_path):
    t = _t(spark, tmp_path / "t", pk_buckets=4)
    t.merge(spark, _batch(spark, [("I", 100, 10, 1)]))
    t.merge(spark, _batch(spark, [("D", 0, 20, None), ("I", 101, 20, 2)]))
    # fence 10: the ts=10 insert is in, the ts=20 delete/insert are not
    ks = {r["k"] for r in t.read_as_of_source_ts(spark, 10).collect()}
    assert 100 in ks and 0 in ks and 101 not in ks
    # fence 15 (between batches): last complete fence is 10
    assert t.commit_for_source_ts(15) == t.commit_for_source_ts(10)
    # fence 20: everything
    ks20 = {r["k"] for r in t.read_as_of_source_ts(spark, 20).collect()}
    assert 101 in ks20 and 0 not in ks20
    # a fence before the initial load is refused
    with pytest.raises(ValueError, match="past the fence"):
        t.commit_for_source_ts(-1)


def test_consistent_snapshot_prevents_torn_reads(spark, tmp_path):
    """orders+items churned with interleaved fences: the ts=10 changes
    land on BOTH tables; the snapshot at 15 sees both tables' ts=10
    state and neither's ts=20 state — the join is transactionally
    whole."""
    orders = _t(spark, tmp_path / "orders", n=10, pk_buckets=4)
    items = ManagedTable(tmp_path / "items")
    items.create(
        spark.createDataFrame(
            [(i, i % 10) for i in range(30)], "ik long, k long"
        ),
        pk_cols=["ik"], pk_buckets=4,
    )

    def ibatch(events):
        return spark.createDataFrame(
            [(f, "i", "s", ts, ik, k) for f, ik, ts, k in events],
            "flag string, tablename string, schemaname string, "
            "commit_ts long, ik long, k long",
        )

    # ts=10: order 100 arrives WITH its three items
    orders.merge(spark, _batch(spark, [("I", 100, 10, 1)]))
    items.merge(spark, ibatch([("I", 100 + j, 10, 100) for j in range(3)]))
    # ts=20: order 0 deleted WITH its items; order 101 inserted
    orders.merge(spark, _batch(spark, [("D", 0, 20, None), ("I", 101, 20, 2)]))
    items.merge(spark, ibatch([("D", ik, 20, None) for ik in (0, 10, 20)]))

    snap = ConsistentSnapshot({"orders": orders, "items": items}, 15)
    assert snap.fences() == {"orders": 10, "items": 10}
    views = snap.register_views(spark)
    assert sorted(views) == ["snap_items", "snap_orders"]
    joined = spark.sql(
        "SELECT o.k, COUNT(i.ik) AS n FROM snap_orders o "
        "LEFT JOIN snap_items i ON o.k = i.k GROUP BY o.k"
    ).collect()
    by_k = {r["k"]: r["n"] for r in joined}
    assert by_k[100] == 3      # the new order and ALL its items
    assert by_k[0] == 3        # ts=20 deletes invisible on BOTH sides
    assert 101 not in by_k     # ts=20 insert invisible
    # no orphaned items: every item's order exists at the fence
    orphans = spark.sql(
        "SELECT COUNT(*) c FROM snap_items i LEFT ANTI JOIN snap_orders o "
        "ON i.k = o.k"
    ).collect()[0]["c"]
    assert orphans == 0


def test_snapshot_pin_is_immutable(spark, tmp_path):
    t = _t(spark, tmp_path / "t", pk_buckets=4)
    t.merge(spark, _batch(spark, [("I", 100, 10, 1)]))
    snap = ConsistentSnapshot({"t": t}, 10)
    t.merge(spark, _batch(spark, [("I", 200, 30, 2)]))
    ks = {r["k"] for r in snap.read(spark, "t").collect()}
    assert 100 in ks and 200 not in ks
    with pytest.raises(KeyError):
        snap.read(spark, "nope")
    with pytest.raises(ValueError, match="negative"):
        ConsistentSnapshot({"t": t}, -5)


def test_fence_read_on_mor_resolves_pinned_deltas(spark, tmp_path):
    """MoR: the fence read resolves the PINNED commit's pending delta
    lists — a later compact()+merge doesn't leak into the snapshot."""
    t = _t(spark, tmp_path / "t", pk_buckets=4, merge_mode="mor")
    t.merge(spark, _batch(spark, [("U", 1, 10, 111)]))
    snap = ConsistentSnapshot({"t": t}, 10)
    t.merge(spark, _batch(spark, [("U", 1, 20, 222), ("D", 2, 20, None)]))
    rows = {r["k"]: r["v"] for r in snap.read(spark, "t").collect()}
    assert rows[1] == 111 and 2 in rows


def test_fleet_consistent_snapshot_uses_min_fence(spark, tmp_path):
    """consistent_snapshot_all over two replicated tables: the default
    fence is the min applied source_ts_high, and a table whose only
    incremental batch is PAST that fence resolves to its snapshot load
    — lag drags the fence back, it never tears the join."""
    from tidb2dw_spark.replicate import TableReplicator, consistent_snapshot_all
    from tidb2dw_spark.schema.table_def import TableCol, TableDefinition

    from .test_consumer import users_def_v1, write

    def items_def():
        return TableDefinition(
            schema="tpch", table="items", version=1,
            columns=[
                TableCol(id="1", name="ik", tp="int", precision="11",
                         is_pk="true"),
                TableCol(id="2", name="uid", tp="int"),
            ],
        )

    snap, incr, wh = tmp_path / "snap", tmp_path / "incr", tmp_path / "wh"
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",30,1991-02-02\n')
    users_def_v1().dump(incr / "tpch/users/1/meta")
    # users applies up to ts=101
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"I","users","tpch",101,5,"eve",30,1995-05-05\n')
    write(snap / "tpch.items.000000001.csv", '10,1\n11,2\n')
    items_def().dump(incr / "tpch/items/1/meta")
    # items' only batch is at ts=200 — PAST users' fence
    write(incr / "tpch/items/1/2024-01-01/CDC000001.csv",
          '"I","items","tpch",200,12,5\n')

    ru = TableReplicator(spark, snap, incr, wh, users_def_v1(), pk_buckets=4)
    ri = TableReplicator(spark, snap, incr, wh, items_def(), pk_buckets=4)
    ru.run_once()
    ri.run_once()
    assert ru.table.source_ts_high() == 101
    assert ri.table.source_ts_high() == 200

    snapshot = consistent_snapshot_all([ru, ri])  # min fence = 101
    assert snapshot.source_ts == 101
    users = {r["id"] for r in snapshot.read(spark, "tpch.users").collect()}
    items = {r["ik"] for r in snapshot.read(spark, "tpch.items").collect()}
    assert users == {1, 2, 5}        # the ts=101 insert is in
    assert items == {10, 11}         # the ts=200 insert is NOT
    # explicit fence past both: everything visible
    snap200 = consistent_snapshot_all([ru, ri], source_ts=200)
    assert {
        r["ik"] for r in snap200.read(spark, "tpch.items").collect()
    } == {10, 11, 12}

@pytest.mark.parametrize(
    "kw", [{"pk_buckets": 4}, {"pk_buckets": 0},
           {"pk_buckets": 4, "merge_mode": "mor"}],
    ids=["cow-bucketed", "plain", "mor"],
)
def test_fence_incomplete_refuses_fenced_reads(spark, tmp_path, kw):
    """A merge whose batch carries no commit_ts POSITION (all-NULL —
    a column-less batch already fails loudly in last_writer_wins)
    changes data without moving the fence — from then on the table's
    fence is INCOMPLETE and fenced resolution must refuse (resolving
    would claim consistency over a commit that may hide
    newer-than-fence changes).  Normal reads and further merges keep
    working; ConsistentSnapshot refuses any set containing the
    poisoned table."""
    t = _t(spark, tmp_path / "t", **kw)
    t.merge(spark, _batch(spark, [("I", 100, 10, 1)]))
    assert t.commit_for_source_ts(10) is not None  # fence healthy
    t.merge(spark, _batch(spark, [("I", 200, None, 5)]))
    assert t.manifest().get("fence_incomplete") is True
    ks = {r["k"] for r in t.read(spark).collect()}
    assert 200 in ks  # the merge itself applied
    with pytest.raises(ValueError, match="fence is incomplete"):
        t.commit_for_source_ts(10)
    with pytest.raises(ValueError, match="fence is incomplete"):
        t.read_as_of_source_ts(spark, 10)
    # the flag is sticky across later (fenced) merges
    t.merge(spark, _batch(spark, [("I", 101, 20, 2)]))
    with pytest.raises(ValueError, match="fence is incomplete"):
        t.commit_for_source_ts(20)
    # a snapshot spanning the poisoned table refuses at construction
    other = _t(spark, tmp_path / "other", pk_buckets=4)
    other.merge(spark, _batch(spark, [("I", 100, 10, 1)]))
    with pytest.raises(ValueError, match="fence is incomplete"):
        ConsistentSnapshot({"t": t, "other": other}, 10)


def test_consistent_snapshot_covers_maintained_views(spark, tmp_path):
    """The fence extends to DERIVED state: a snapshot pinning a table
    commit serves the maintained view whose fold covers EXACTLY that
    commit's cdf_seq — so table ⋈ view inside the snapshot cannot tear
    even after both sides advance.  A view that skipped the pinned seq
    (batched refresh) refuses at construction; so does a view source
    missing from the snapshot."""
    from tidb2dw_spark.operators.matview import MaintainedAggregate

    t = ManagedTable(tmp_path / "t")
    t.create(
        spark.createDataFrame([(i, i * 10) for i in range(20)], SCHEMA),
        pk_cols=["k"], pk_buckets=4, cdf=True,
    )
    view = MaintainedAggregate(
        tmp_path / "view", [], sum_cols={"sum_v": "v"}, keep_versions=8
    )
    view.refresh(spark, t)

    def snap_state(ts):
        return {
            (r["n_rows"], r["sum_v"])
            for r in ConsistentSnapshot(
                {"t": t}, ts, views={"agg": (view, "t")}
            ).read(spark, "agg").collect()
        }

    t.merge(spark, _batch(spark, [("I", 100, 10, 7)]))
    view.refresh(spark, t)
    want_at_10 = {(21, sum(i * 10 for i in range(20)) + 7)}
    assert snap_state(10) == want_at_10

    # both sides advance; the pin still serves the ts=10 state, and the
    # view at the pin matches a recompute over the PINNED table read
    t.merge(spark, _batch(spark, [("D", 0, 20, None), ("I", 101, 20, 9)]))
    view.refresh(spark, t)
    assert snap_state(10) == want_at_10
    snap = ConsistentSnapshot({"t": t}, 10, views={"agg": (view, "t")})
    pinned_table = snap.read(spark, "t")
    recomputed = pinned_table.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    ).collect()[0]
    got = snap.read(spark, "agg").collect()[0]
    assert (got["n_rows"], got["sum_v"]) == (
        recomputed["n_rows"], recomputed["sum_v"],
    )
    # and the CURRENT (ts=20) snapshot sees the advanced pair
    assert snap_state(20) == {(21, sum(i * 10 for i in range(1, 20)) + 7 + 9)}
    # register_views exposes the view under the same fence
    snap.register_views(spark, prefix="s10_")
    assert spark.sql("SELECT sum_v FROM s10_agg").collect()[0][0] == (
        sum(i * 10 for i in range(20)) + 7
    )

    # a view that SKIPPED the pinned seq refuses at construction
    lazy = MaintainedAggregate(
        tmp_path / "lazy", [], sum_cols={"sum_v": "v"}, keep_versions=8
    )
    lazy.refresh(spark, t)  # folds seeds→current in one hop
    with pytest.raises(ValueError, match="no state at source seq"):
        ConsistentSnapshot({"t": t}, 10, views={"lazy": (lazy, "t")})
    # a view whose source is not pinned refuses
    with pytest.raises(KeyError, match="not in this snapshot"):
        ConsistentSnapshot({"t": t}, 10, views={"agg": (view, "other")})


def test_consistent_snapshot_covers_sketches(spark, tmp_path):
    """The derived-seq protocol extends to the sketch tier
    (SeqVersionedState): a CM sketch with keep_versions retains the
    per-commit states, and a snapshot pins the one matching the pinned
    table commit — frequency estimates inside the snapshot reflect
    exactly the fenced rows.  Default keep_versions=1 keeps the
    newest-only GC."""
    from tidb2dw_spark.operators.sketch import MaintainedCountMinSketch

    t = _t(spark, tmp_path / "t", n=30, pk_buckets=4, cdf=True)
    sk = MaintainedCountMinSketch(
        tmp_path / "sk", [], "v", depth=2, width=64, keep_versions=8
    )
    sk.refresh(spark, t)
    t.merge(spark, _batch(spark, [("I", 100, 10, 70), ("I", 101, 10, 70)]))
    sk.refresh(spark, t)
    t.merge(spark, _batch(spark, [("D", 100, 20, None), ("I", 102, 20, 70)]))
    sk.refresh(spark, t)

    snap = ConsistentSnapshot({"t": t}, 10, views={"freq": (sk, "t")})
    pinned = snap.read(spark, "freq")
    probe_est = (
        pinned.filter(
            "depth = 0"
        ).count()  # sanity: the pinned state is the seq-10 version
    )
    assert probe_est > 0
    # the pinned counters equal a rebuild over the fenced table read
    ref = MaintainedCountMinSketch(
        tmp_path / "ref", [], "v", depth=2, width=64
    )
    fenced = ManagedTable(tmp_path / "fenced")
    fenced.create(snap.read(spark, "t"), pk_cols=["k"], pk_buckets=2,
                  cdf=True)
    ref.refresh(spark, fenced)
    assert sorted(
        (r["depth"], r["bucket"], r["cnt"]) for r in pinned.collect()
    ) == sorted(
        (r["depth"], r["bucket"], r["cnt"])
        for r in ref.read(spark).collect()
    )
    # default retention: only the newest version dir survives
    lone = MaintainedCountMinSketch(
        tmp_path / "lone", [], "v", depth=2, width=64
    )
    lone.refresh(spark, t)
    t.merge(spark, _batch(spark, [("I", 200, 30, 5)]))
    lone.refresh(spark, t)
    vs = sorted(p.name for p in (tmp_path / "lone").glob("v=*"))
    assert len(vs) == 1
    with pytest.raises(ValueError, match="no version at source seq"):
        lone.version_for_seq(1)


def test_empty_ts_less_batch_never_poisons_fence(spark, tmp_path):
    """An EMPTY batch that lacks the commit_ts column changes nothing
    and must not set fence_incomplete — the bucketed layout already
    no-ops (`if not touched:`); the plain layout must agree instead of
    permanently refusing fenced reads over a no-op input."""
    no_ts = spark.createDataFrame(
        [], "flag string, tablename string, schemaname string, "
        "k long, v long"
    )
    for name, kw in [("plain", {"pk_buckets": 0}),
                     ("bucketed", {"pk_buckets": 4})]:
        t = _t(spark, tmp_path / name, **kw)
        t.merge(spark, _batch(spark, [("I", 100, 10, 1)]))
        v_before = t.manifest()["version"]
        assert t.merge(spark, no_ts) == v_before  # clean no-op
        assert t.manifest().get("fence_incomplete") is not True
        assert t.commit_for_source_ts(10) is not None  # fence healthy


class _Rep:
    """Minimal replicator surface for consistent_snapshot_all (the
    TableReplicator integration is covered above; this isolates the
    fence-walk resolver)."""

    def __init__(self, fqn, table):
        self.fqn, self.table = fqn, table


def test_fleet_snapshot_walks_back_to_view_served_fence(spark, tmp_path):
    """View-aware fleet pins: with views attached and no explicit
    source_ts, consistent_snapshot_all walks BACK through the fleet's
    recorded fences to the freshest one EVERY member — tables and
    views — holds: a lagging view drags the fence like a lagging table
    instead of failing the snapshot.  An explicit fresher fence still
    refuses (strict mode), and a fleet with no common fence raises with
    the freshest refusal."""
    from pyspark.sql import functions as F

    from tidb2dw_spark.operators.matview import MaintainedAggregate
    from tidb2dw_spark.replicate import consistent_snapshot_all

    orders = _t(spark, tmp_path / "orders", n=10, cdf=True)
    items = _t(spark, tmp_path / "items", n=10, cdf=True)
    view = MaintainedAggregate(
        tmp_path / "view", [], sum_cols={"sum_v": "v"}, keep_versions=8
    )

    orders.merge(spark, _batch(spark, [("I", 100, 10, 1)]))
    view.refresh(spark, orders)          # holds the ts=10 checkpoint
    orders.merge(spark, _batch(spark, [("I", 101, 20, 2)]))
    view.refresh(spark, orders)          # holds the ts=20 checkpoint
    orders.merge(spark, _batch(spark, [("I", 102, 30, 3)]))
    # view NOT refreshed at ts=30 — it lags the freshest fleet fence
    items.merge(spark, _batch(spark, [("I", 200, 30, 9)]))

    fleet = [_Rep("orders", orders), _Rep("items", items)]
    # without views: freshest common fence (min source_ts_high) = 30
    assert consistent_snapshot_all(fleet).source_ts == 30
    # with the lagging view: walks back to 20, the freshest fence the
    # view holds, and serves table + view consistently there
    snap = consistent_snapshot_all(fleet, views={"agg": (view, "orders")})
    assert snap.source_ts == 20
    got = snap.read(spark, "agg").collect()[0]
    rec = snap.read(spark, "orders").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    assert (got["n_rows"], got["sum_v"]) == (rec["n"], rec["s"])
    # explicit fresher fence stays strict
    with pytest.raises(ValueError, match="no state at source seq"):
        consistent_snapshot_all(
            fleet, source_ts=30, views={"agg": (view, "orders")}
        )

    # exhaustion: a thin-retention view that batch-folded past every
    # fence ≤ the fleet minimum leaves NO common fence
    thin = MaintainedAggregate(
        tmp_path / "thin", [], sum_cols={"sum_v": "v"}, keep_versions=1
    )
    thin.refresh(spark, orders)  # only the ts=30 checkpoint retained
    lag = _t(spark, tmp_path / "lag", n=5, cdf=True)
    lag.merge(spark, _batch(spark, [("I", 300, 20, 4)]))  # fence 20
    with pytest.raises(ValueError, match="no fence every fleet member"):
        consistent_snapshot_all(
            [_Rep("orders", orders), _Rep("lag", lag)],
            views={"agg": (thin, "orders")},
        )
