"""MaintainedJoinAggregate: incremental join-rollup maintenance from two
change feeds (operators/join_matview.py).

Invariant under test: after ANY interleaving of CDC merges on the fact
and dim tables, the maintained rollup equals ``init_join_agg`` recomputed
over the two tables' current states — bit-for-bit (integer measures).
The delta algebra (ΔF⋈D_old ∪ F_new⋈ΔD with signed rows) must absorb
fk moves, dim attribute moves, dim deletes (danglings), same-slice
insert pairs, and multi-commit slices folded by one refresh.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.operators.join_matview import (
    MaintainedJoinAggregate,
    init_join_agg,
)
from tidb2dw_spark.table.managed import ManagedTable

FACT_SCHEMA = "k long, fk long, pri string, cents long"
FACT_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, fk long, pri string, cents long"
)
DIM_SCHEMA = "d long, seg string"
DIM_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "d long, seg string"
)


def _mk_pair(spark, tmp_path, fact_rows, dim_rows):
    fact = ManagedTable(tmp_path / "fact")
    fact.create(
        spark.createDataFrame(fact_rows, FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=4, cdf=True,
    )
    dim = ManagedTable(tmp_path / "dim")
    dim.create(
        spark.createDataFrame(dim_rows, DIM_SCHEMA),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    return fact, dim


def _fb(spark, events):
    """fact batch: (flag, k, ts, fk, pri, cents)."""
    return spark.createDataFrame(
        [(f, "t", "s", ts, k, fk, p, c) for f, k, ts, fk, p, c in events],
        FACT_ENV,
    )


def _db(spark, events):
    """dim batch: (flag, d, ts, seg)."""
    return spark.createDataFrame(
        [(f, "t", "s", ts, d, s) for f, d, ts, s in events], DIM_ENV
    )


def _mk_view(tmp_path):
    return MaintainedJoinAggregate(
        tmp_path / "mv",
        fk_col="fk",
        fact_group_cols=["pri"],
        dim_group_cols=["seg"],
        sum_cols={"total_cents": "cents"},
    )


def _state(spark, df):
    return {
        (r["pri"], r["seg"]): (r["n_rows"], r["total_cents"])
        for r in df.collect()
    }


def _recompute(spark, fact, dim):
    return _state(
        spark,
        init_join_agg(
            fact.read(spark), dim.read(spark), "fk", "d",
            ["pri", "seg"], {"total_cents": "cents"},
        ),
    )


BASE_FACT = [
    (1, 10, "HI", 100), (2, 10, "LO", 200), (3, 20, "HI", 300),
    (4, 20, "HI", 400), (5, 30, "LO", 500), (6, None, "HI", 600),
    (7, 99, "LO", 700),  # dangling: no dim row 99
]
BASE_DIM = [(10, "A"), (20, "B"), (30, "A")]


def test_seed_equals_recompute(spark, tmp_path):
    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    mv.refresh(spark, fact, dim)
    got = _state(spark, mv.read(spark))
    assert got == _recompute(spark, fact, dim)
    # NULL fk and dangling fk rows are excluded by the inner join
    assert sum(n for n, _ in got.values()) == 5


def test_adversarial_churn_both_sides(spark, tmp_path):
    """fk moves, dim attribute moves, dim delete (danglings appear), dim
    insert (danglings attach), same-slice fact+dim inserts, fact deletes
    — one refresh folding multi-commit slices on BOTH feeds."""
    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    mv.refresh(spark, fact, dim)  # seed

    # commit F1: move k=1 from dim 10 to 20; delete k=2; insert k=8 on a
    # dim key that will arrive in the SAME refresh window (40)
    fact.merge(spark, _fb(spark, [
        ("U", 1, 5, 20, "HI", 110),
        ("D", 2, 5, None, None, None),
        ("I", 8, 5, 40, "LO", 800),
    ]))
    # commit D1: move dim 20's segment B->C; delete dim 30 (k=5 dangles);
    # insert dim 40 (k=8 attaches) and dim 99 (k=7 un-dangles!)
    dim.merge(spark, _db(spark, [
        ("U", 20, 6, "C"),
        ("D", 30, 6, None),
        ("I", 40, 6, "D"),
        ("I", 99, 6, "A"),
    ]))
    # commit F2: update k=3's measure in place
    fact.merge(spark, _fb(spark, [("U", 3, 7, 20, "HI", 333)]))

    mv.refresh(spark, fact, dim)
    assert _state(spark, mv.read(spark)) == _recompute(spark, fact, dim)


def test_refresh_cadence_invariance(spark, tmp_path):
    """Per-merge refreshes and one spanning refresh converge to the same
    rollup (each feed slice applied exactly once, any grouping)."""
    fact1, dim1 = _mk_pair(spark, tmp_path / "a", BASE_FACT, BASE_DIM)
    fact2, dim2 = _mk_pair(spark, tmp_path / "b", BASE_FACT, BASE_DIM)
    mv1, mv2 = _mk_view(tmp_path / "a"), _mk_view(tmp_path / "b")
    mv1.refresh(spark, fact1, dim1)
    mv2.refresh(spark, fact2, dim2)

    steps = [
        ("F", [("U", 1, 5, 30, "LO", 101)]),
        ("D", [("U", 10, 6, "Z"), ("D", 20, 6, None)]),
        ("F", [("I", 9, 7, 10, "HI", 900), ("D", 5, 7, None, None, None)]),
        ("D", [("I", 20, 8, "B2")]),
        ("F", [("U", 9, 9, 20, "HI", 901)]),
    ]
    for side, ev in steps:
        if side == "F":
            fact1.merge(spark, _fb(spark, ev))
            fact2.merge(spark, _fb(spark, ev))
        else:
            dim1.merge(spark, _db(spark, ev))
            dim2.merge(spark, _db(spark, ev))
        mv1.refresh(spark, fact1, dim1)  # per-step cadence
    mv2.refresh(spark, fact2, dim2)      # one spanning slice

    want = _recompute(spark, fact1, dim1)
    assert _state(spark, mv1.read(spark)) == want
    assert _state(spark, mv2.read(spark)) == want


def test_pseudo_random_interleaving(spark, tmp_path):
    """Deterministic pseudo-random op stream over both tables, refreshed
    every other step: maintained == recompute at every checkpoint."""
    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    mv.refresh(spark, fact, dim)
    segs = ["A", "B", "C"]
    pris = ["HI", "LO"]
    next_k = 100
    for step in range(1, 9):
        h = (step * 2654435761) % 97
        if h % 3 == 0:  # dim op
            d = [10, 20, 30, 40][h % 4]
            if h % 2:
                dim.merge(spark, _db(spark, [("U", d, step, segs[h % 3])]))
            else:
                dim.merge(spark, _db(spark, [
                    ("D", d, step, None), ("I", d + 100, step, segs[h % 3]),
                ]))
        else:  # fact op
            k = [1, 3, 4, 5, 7][h % 5]
            if h % 2:
                fact.merge(spark, _fb(spark, [
                    ("U", k, step, [10, 20, 30][h % 3], pris[h % 2], h * 7),
                ]))
            else:
                fact.merge(spark, _fb(spark, [
                    ("D", k, step, None, None, None),
                    ("I", next_k, step, [10, 20, 30][(h // 2) % 3],
                     pris[(h // 2) % 2], h * 11),
                ]))
                next_k += 1
        if step % 2 == 0:
            mv.refresh(spark, fact, dim)
            assert _state(spark, mv.read(spark)) == _recompute(
                spark, fact, dim
            ), f"diverged at step {step}"
    mv.refresh(spark, fact, dim)
    assert _state(spark, mv.read(spark)) == _recompute(spark, fact, dim)


def test_bound_adapter_rides_the_poll_loop(spark, tmp_path):
    """`mv.bind(fact, dim)` fits the single-table derived protocol, so the
    join view rides `TableReplicator(derived=[…])` like any index or
    single-table matview: seeded on the first poll, folded from BOTH
    feeds on every later one — including after a replicator RESTART —
    always equal to a recompute over the two replicas."""
    from tidb2dw_spark.replicate import TableReplicator
    from tidb2dw_spark.schema.table_def import TableCol, TableDefinition

    from .test_consumer import users_def_v1, write

    def fact_def():
        return TableDefinition(
            schema="tpch", table="fo", version=1,
            columns=[
                TableCol(id="1", name="oid", tp="int", precision="11",
                         is_pk="true"),
                TableCol(id="2", name="uid", tp="int"),
                TableCol(id="3", name="amount", tp="int"),
            ],
        )

    snap, incr, wh = tmp_path / "snapshot", tmp_path / "increment", tmp_path / "wh"
    write(snap / "tpch.users.000000001.csv",
          '1,"alice",30,1990-01-01\n2,"bob",30,1991-02-02\n'
          '3,"carol",41,1992-03-03\n')
    write(snap / "tpch.fo.000000001.csv",
          '1,1,100\n2,1,200\n3,2,300\n4,3,400\n5,9,500\n')  # oid 5 dangles
    users_def_v1().dump(incr / "tpch/users/1/meta")
    fact_def().dump(incr / "tpch/fo/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"U","users","tpch",100,1,"alice",31,1990-01-01\n')
    write(incr / "tpch/fo/1/2024-01-01/CDC000001.csv",
          '"U","fo","tpch",100,3,3,301\n'      # uid move 2 -> 3
          '"D","fo","tpch",101,4,\\N,\\N\n')

    def mk():
        rep_d = TableReplicator(spark, snap, incr, wh, users_def_v1(),
                                pk_buckets=4, cdf=True)
        rep_f = TableReplicator(spark, snap, incr, wh, fact_def(),
                                pk_buckets=4, cdf=True)
        mv = MaintainedJoinAggregate(
            tmp_path / "mv", fk_col="uid", fact_group_cols=[],
            dim_group_cols=["age"], sum_cols={"total_amount": "amount"},
        )
        bound = mv.bind(rep_f.table, rep_d.table)
        rep_f.derived.append(bound)
        return rep_d, rep_f, mv, bound

    def check(rep_d, rep_f, mv):
        got = {
            r["age"]: (r["n_rows"], r["total_amount"])
            for r in mv.read(spark).collect()
        }
        want = {
            r["age"]: (r["n_rows"], r["total_amount"])
            for r in rep_f.table.read(spark)
            .join(rep_d.table.read(spark),
                  F.col("uid") == F.col("id"), "inner")
            .groupBy("age")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("amount").alias("total_amount"))
            .collect()
        }
        assert got == want, (got, want)

    rep_d, rep_f, mv, bound = mk()
    rep_d.run_once()
    rep_f.run_once()  # seeds the join view on the fact's poll
    check(rep_d, rep_f, mv)

    # second slice on EACH feed; the fact poll's single refresh must fold
    # the DIM slice too (the wake-up source doesn't bound what's folded)
    write(incr / "tpch/users/1/2024-01-01/CDC000002.csv",
          '"I","users","tpch",200,4,"dan",30,1995-05-05\n'  # oid 5 attaches? no: uid 9
          '"U","users","tpch",201,3,"carol",30,1992-03-03\n')
    write(incr / "tpch/fo/1/2024-01-01/CDC000002.csv",
          '"I","fo","tpch",200,6,4,600\n')
    rep_d2, rep_f2, mv2, bound2 = mk()  # RESTART: fresh objects, state on disk
    rep_d2.run_once()
    rep_f2.run_once()
    check(rep_d2, rep_f2, mv2)

    # a mis-wired attachment fails loudly
    other = ManagedTable(tmp_path / "other")
    other.create(
        spark.createDataFrame([(1, 10, "HI", 5)], FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=2, cdf=True,
    )
    with pytest.raises(ValueError, match="bound to"):
        bound2.refresh(spark, other)


def test_bound_adapter_rides_streaming_wakeup(spark, tmp_path):
    """The bound join view also rides `stream_derived_refresh`: a drain
    of the FACT table's commit-log stream wakes ONE refresh that folds
    BOTH feeds (the wake-up source doesn't bound what's folded), and a
    dim-only churn is picked up by a drain on the DIM table's stream —
    the two wake signals share the view's own (fact_seq, dim_seq)
    checkpoint, so no slice ever double-applies."""
    from tidb2dw_spark.streaming.stream import stream_derived_refresh

    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    bound = mv.bind(fact, dim)
    bound.refresh(spark)  # seed

    fact.merge(spark, _fb(spark, [
        ("U", 1, 5, 20, "HI", 110), ("D", 5, 5, None, None, None),
    ]))
    dim.merge(spark, _db(spark, [("U", 20, 6, "C"), ("I", 99, 6, "A")]))
    q = stream_derived_refresh(
        spark, fact, bound, checkpoint_dir=str(tmp_path / "ck_f")
    )
    assert q.awaitTermination(120)
    assert _state(spark, mv.read(spark)) == _recompute(spark, fact, dim)

    # dim-ONLY churn: the fact stream has nothing new, so the dim
    # table's own wake signal drives the fold
    dim.merge(spark, _db(spark, [("D", 10, 7, None)]))
    q = stream_derived_refresh(
        spark, dim, bound, checkpoint_dir=str(tmp_path / "ck_d")
    )
    assert q.awaitTermination(120)
    assert _state(spark, mv.read(spark)) == _recompute(spark, fact, dim)


STAR_FACT_SCHEMA = "k long, fk1 long, fk2 long, cents long"
STAR_FACT_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, fk1 long, fk2 long, cents long"
)
D2_SCHEMA = "d2 long, region string"
D2_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "d2 long, region string"
)

STAR_FACT = [
    (1, 10, 100, 11), (2, 10, 200, 22), (3, 20, 100, 33),
    (4, 20, 200, 44), (5, 30, 100, 55), (6, None, 100, 66),
    (7, 10, None, 77), (8, 99, 300, 88),  # dangling on dim1
]
STAR_D1 = [(10, "A"), (20, "B"), (30, "A")]
STAR_D2 = [(100, "E"), (200, "W"), (300, "E")]


def _mk_star(spark, tmp_path):
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact = ManagedTable(tmp_path / "sfact")
    fact.create(
        spark.createDataFrame(STAR_FACT, STAR_FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=4, cdf=True,
    )
    d1 = ManagedTable(tmp_path / "sd1")
    d1.create(
        spark.createDataFrame(STAR_D1, DIM_SCHEMA.replace("d long", "d long")),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    d2 = ManagedTable(tmp_path / "sd2")
    d2.create(
        spark.createDataFrame(STAR_D2, D2_SCHEMA),
        pk_cols=["d2"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedStarAggregate(
        tmp_path / "smv",
        dims=[("fk1", ["seg"]), ("fk2", ["region"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
    )
    return fact, d1, d2, mv


def _sfb(spark, events):
    """star fact batch: (flag, k, ts, fk1, fk2, cents)."""
    return spark.createDataFrame(
        [(f, "t", "s", ts, k, a, b, c) for f, k, ts, a, b, c in events],
        STAR_FACT_ENV,
    )


def _d2b(spark, events):
    return spark.createDataFrame(
        [(f, "t", "s", ts, d, r) for f, d, ts, r in events], D2_ENV
    )


def _star_state(df):
    return {
        (r["seg"], r["region"]): (r["n_rows"], r["total_cents"])
        for r in df.collect()
    }


def _star_recompute(spark, fact, d1, d2):
    from tidb2dw_spark.operators.join_matview import init_star_agg

    return _star_state(
        init_star_agg(
            fact.read(spark),
            [(d1.read(spark), "fk1", "d"), (d2.read(spark), "fk2", "d2")],
            ["seg", "region"],
            {"total_cents": "cents"},
        )
    )


def test_star_seed_and_churn_all_three_tables(spark, tmp_path):
    """Two-dim star: seed equals recompute (NULL/dangling fks excluded),
    then ONE refresh folds adversarial churn on ALL THREE feeds — fact
    fk moves across both dims, dim1 delete (danglings) + re-insert on a
    key the fact slice also adopts, dim2 attribute move — bit-equal to
    a full recompute."""
    fact, d1, d2, mv = _mk_star(spark, tmp_path)
    mv.refresh_star(spark, fact, [d1, d2])
    got = _star_state(mv.read(spark))
    assert got == _star_recompute(spark, fact, d1, d2)
    assert sum(n for n, _ in got.values()) == 5  # k6/k7/k8 excluded

    fact.merge(spark, _sfb(spark, [
        ("U", 1, 5, 20, 200, 12),    # moves across BOTH dims
        ("D", 4, 5, None, None, None),
        ("I", 9, 5, 30, 300, 99),
        ("U", 8, 5, 40, 300, 88),    # adopts a dim1 key inserted this slice
    ]))
    d1.merge(spark, _db(spark, [
        ("D", 30, 6, None),          # k5 (and new k9) dangle
        ("U", 10, 6, "Z"),
        ("I", 40, 6, "C"),           # k8 attaches
    ]))
    d2.merge(spark, _d2b(spark, [
        ("U", 100, 7, "N"),
        ("D", 200, 7, None),         # k1 (just moved onto 200) dangles
    ]))
    mv.refresh_star(spark, fact, [d1, d2])
    assert _star_state(mv.read(spark)) == _star_recompute(spark, fact, d1, d2)


def test_star_cadence_invariance(spark, tmp_path):
    """Per-merge refreshes and one spanning refresh converge (every feed
    slice applied exactly once at any grouping)."""
    fa, da1, da2, mva = _mk_star(spark, tmp_path / "a")
    fb, db1, db2, mvb = _mk_star(spark, tmp_path / "b")
    mva.refresh_star(spark, fa, [da1, da2])
    mvb.refresh_star(spark, fb, [db1, db2])
    steps = [
        ("F", [("U", 2, 5, 20, 100, 23)]),
        ("D1", [("U", 20, 6, "Y"), ("D", 10, 6, None)]),
        ("D2", [("I", 400, 7, "S"), ("U", 300, 7, "W")]),
        ("F", [("I", 10, 8, 20, 400, 10), ("D", 3, 8, None, None, None)]),
        ("D1", [("I", 10, 9, "A2")]),
    ]
    for side, ev in steps:
        for f_, d1_, d2_, mv_ in ((fa, da1, da2, mva), (fb, db1, db2, mvb)):
            if side == "F":
                f_.merge(spark, _sfb(spark, ev))
            elif side == "D1":
                d1_.merge(spark, _db(spark, ev))
            else:
                d2_.merge(spark, _d2b(spark, ev))
        mva.refresh_star(spark, fa, [da1, da2])  # per-step cadence
    mvb.refresh_star(spark, fb, [db1, db2])      # one spanning slice
    want = _star_recompute(spark, fa, da1, da2)
    assert _star_state(mva.read(spark)) == want
    assert _star_state(mvb.read(spark)) == want


def test_snowflake_chain_dim_joins_earlier_dim(spark, tmp_path):
    """SNOWFLAKE chain: the second dim joins on the FIRST dim's attribute
    (customer→nation shape), resolved by schema ownership.  One refresh
    folds churn on all three feeds — including ΔD1 re-pointing rows to a
    different D2 key (the chain-hop delta: fact rows change their D2
    group without ANY fact or D2 change) and a D2 delete dangling a whole
    chain — bit-equal to a full recompute, at both cadences."""
    from tidb2dw_spark.operators.join_matview import (
        MaintainedStarAggregate,
        init_star_agg,
    )

    def mk(base):
        fact = ManagedTable(base / "f")
        fact.create(
            spark.createDataFrame(
                [(1, 10, 11), (2, 10, 22), (3, 20, 33), (4, 30, 44),
                 (5, None, 55), (6, 99, 66)],
                "k long, fk1 long, cents long",
            ),
            pk_cols=["k"], pk_buckets=4, cdf=True,
        )
        d1 = ManagedTable(base / "d1")
        d1.create(
            spark.createDataFrame(
                [(10, "A", 100), (20, "B", 200), (30, "A", None)],
                "d long, seg string, nk long",
            ),
            pk_cols=["d"], pk_buckets=2, cdf=True,
        )
        d2 = ManagedTable(base / "d2")
        d2.create(
            spark.createDataFrame(
                [(100, "E"), (200, "W"), (300, "E")], "nid long, region string"
            ),
            pk_cols=["nid"], pk_buckets=2, cdf=True,
        )
        mv = MaintainedStarAggregate(
            base / "mv",
            dims=[("fk1", ["seg"]), ("nk", ["region"])],  # nk lives on d1
            fact_group_cols=[],
            sum_cols={"total_cents": "cents"},
        )
        return fact, d1, d2, mv

    def recompute(fact, d1, d2):
        return {
            (r["seg"], r["region"]): (r["n_rows"], r["total_cents"])
            for r in init_star_agg(
                fact.read(spark),
                [(d1.read(spark), "fk1", "d"), (d2.read(spark), "nk", "nid")],
                ["seg", "region"],
                {"total_cents": "cents"},
            ).collect()
        }

    def state(mv):
        return {
            (r["seg"], r["region"]): (r["n_rows"], r["total_cents"])
            for r in mv.read(spark).collect()
        }

    fa, da1, da2, mva = mk(tmp_path / "a")   # per-step cadence
    fb, db1, db2, mvb = mk(tmp_path / "b")   # one spanning refresh
    mva.refresh_star(spark, fa, [da1, da2])
    mvb.refresh_star(spark, fb, [db1, db2])
    assert state(mva) == recompute(fa, da1, da2)
    # NULL fk (k5), dangling fk (k6), NULL chain key (d30) all excluded
    assert sum(n for n, _ in state(mva).values()) == 3

    f_env = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, fk1 long, cents long"
    )
    d1_env = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "d long, seg string, nk long"
    )
    d2_env = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "nid long, region string"
    )
    steps = [
        # ΔD1 re-points d=10 to nation 300: k1/k2 change D2 group with no
        # fact or D2 event at all (the chain-hop delta)
        ("D1", [("U", 10, 5, "A", 300)]),
        # fact churn: fk move onto d=20, delete, insert onto d=30 (whose
        # nk is NULL → stays excluded)
        ("F", [("U", 1, 6, 20, 12), ("D", 3, 6, None, None),
               ("I", 7, 6, 30, 77)]),
        # D2 delete dangles every chain through nation 200; D2 insert
        # revives nation for a later D1 re-point
        ("D2", [("D", 200, 7, None), ("I", 400, 7, "S")]),
        # ΔD1: d=20 re-points onto the just-inserted nation 400 and
        # changes segment in the same event; d=30 gains a real nk
        ("D1", [("U", 20, 8, "C", 400), ("U", 30, 8, "A", 100)]),
    ]
    for tbl, ev in steps:
        for f_, d1_, d2_, mv_ in ((fa, da1, da2, mva), (fb, db1, db2, mvb)):
            if tbl == "F":
                f_.merge(spark, spark.createDataFrame(
                    [(e[0], "t", "s", e[2], e[1], e[3], e[4]) for e in ev],
                    f_env,
                ))
            elif tbl == "D1":
                d1_.merge(spark, spark.createDataFrame(
                    [(e[0], "t", "s", e[2], e[1], e[3], e[4]) for e in ev],
                    d1_env,
                ))
            else:
                d2_.merge(spark, spark.createDataFrame(
                    [(e[0], "t", "s", e[2], e[1], e[3]) for e in ev],
                    d2_env,
                ))
        mva.refresh_star(spark, fa, [da1, da2])
        assert state(mva) == recompute(fa, da1, da2), f"diverged at {tbl}"
    mvb.refresh_star(spark, fb, [db1, db2])
    assert state(mvb) == recompute(fb, db1, db2)
    assert state(mvb) == state(mva)


def test_snowflake_chain_hop_probes_reverse_index(spark, tmp_path, monkeypatch):
    """Round-7 task: the chain-hop key resolution must probe a reverse
    (attribute → pk) SecondaryIndex maintained under the view root
    instead of scanning the owning dim per hop.  Pins: (a) a refresh with
    ΔD2 activity resolves the hop via SecondaryIndex.lookup_pks_in; (b)
    the index exists on disk under the view root and is maintained (its
    applied_seq advances with the dim feed); (c) results stay bit-equal
    to recompute — including a D1 attribute move folded in the SAME slice
    (stale-index hazard: the index must be refreshed to the view's pinned
    manifest BEFORE the probe)."""
    from tidb2dw_spark.operators import secondary_index as si_mod
    from tidb2dw_spark.operators.join_matview import (
        MaintainedStarAggregate,
        init_star_agg,
    )

    fact = ManagedTable(tmp_path / "f")
    fact.create(
        spark.createDataFrame(
            [(1, 10, 11), (2, 10, 22), (3, 20, 33), (4, 30, 44)],
            "k long, fk1 long, cents long",
        ),
        pk_cols=["k"], pk_buckets=4, cdf=True,
    )
    d1 = ManagedTable(tmp_path / "d1")
    d1.create(
        spark.createDataFrame(
            [(10, "A", 100), (20, "B", 200), (30, "A", 300)],
            "d long, seg string, nk long",
        ),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    d2 = ManagedTable(tmp_path / "d2")
    d2.create(
        spark.createDataFrame(
            [(100, "E"), (200, "W"), (300, "E")], "nid long, region string"
        ),
        pk_cols=["nid"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedStarAggregate(
        tmp_path / "mv",
        dims=[("fk1", ["seg"]), ("nk", ["region"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
    )
    mv.refresh_star(spark, fact, [d1, d2])

    probes = []
    orig = si_mod.SecondaryIndex.lookup_pks_in

    def spy(self, spark_, values):
        probes.append((str(self.root), sorted(values)))
        return orig(self, spark_, values)

    monkeypatch.setattr(si_mod.SecondaryIndex, "lookup_pks_in", spy)

    # ΔD2 (region move + delete) makes term-2 resolve the nk chain hop;
    # ΔD1 in the SAME slice re-points d=10 → nation 300 (index must see
    # the pinned post-slice attribute, not the build-time one)
    d1.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 5, 10, "A", 300)],
        "flag string, tablename string, schemaname string, commit_ts long, "
        "d long, seg string, nk long",
    ))
    d2.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 6, 300, "N"), ("D", "t", "s", 6, 200, None)],
        "flag string, tablename string, schemaname string, commit_ts long, "
        "nid long, region string",
    ))
    mv.refresh_star(spark, fact, [d1, d2])

    assert probes, "chain hop did not go through the reverse index"
    assert all("_hopidx1" in r for r, _ in probes)
    idx_meta_p = tmp_path / "mv" / "_hopidx1" / "_meta.json"
    assert idx_meta_p.exists()
    import json as _json

    assert _json.loads(idx_meta_p.read_text())["applied_seq"] == \
        d1.manifest()["cdf_seq"]
    got = {
        (r["seg"], r["region"]): (r["n_rows"], r["total_cents"])
        for r in mv.read(spark).collect()
    }
    want = {
        (r["seg"], r["region"]): (r["n_rows"], r["total_cents"])
        for r in init_star_agg(
            fact.read(spark),
            [(d1.read(spark), "fk1", "d"), (d2.read(spark), "nk", "nid")],
            ["seg", "region"],
            {"total_cents": "cents"},
        ).collect()
    }
    assert got == want
    # a second round of chained churn keeps the SAME index fresh
    # (refresh path, not rebuild) and stays exact
    probes.clear()
    d2.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 7, 100, "S")],
        "flag string, tablename string, schemaname string, commit_ts long, "
        "nid long, region string",
    ))
    mv.refresh_star(spark, fact, [d1, d2])
    assert probes
    got2 = {
        (r["seg"], r["region"]): (r["n_rows"], r["total_cents"])
        for r in mv.read(spark).collect()
    }
    want2 = {
        (r["seg"], r["region"]): (r["n_rows"], r["total_cents"])
        for r in init_star_agg(
            fact.read(spark),
            [(d1.read(spark), "fk1", "d"), (d2.read(spark), "nk", "nid")],
            ["seg", "region"],
            {"total_cents": "cents"},
        ).collect()
    }
    assert got2 == want2


def _mk_star_mm(spark, tmp_path):
    """Star tables + a view that also maintains MIN/MAX of cents."""
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact, d1, d2, _ = _mk_star(spark, tmp_path)
    mv = MaintainedStarAggregate(
        tmp_path / "smv_mm",
        dims=[("fk1", ["seg"]), ("fk2", ["region"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        min_cols={"min_cents": "cents"},
        max_cols={"max_cents": "cents"},
    )
    return fact, d1, d2, mv


def _star_state_mm(df):
    return {
        (r["seg"], r["region"]): (
            r["n_rows"], r["total_cents"], r["min_cents"], r["max_cents"]
        )
        for r in df.collect()
    }


def _star_recompute_mm(spark, fact, d1, d2):
    from tidb2dw_spark.operators.join_matview import init_star_agg

    return _star_state_mm(
        init_star_agg(
            fact.read(spark),
            [(d1.read(spark), "fk1", "d"), (d2.read(spark), "fk2", "d2")],
            ["seg", "region"],
            {"total_cents": "cents"},
            {"min_cents": "cents"},
            {"max_cents": "cents"},
        )
    )


def test_star_minmax_dirty_rescan(spark, tmp_path):
    """MIN/MAX over the JOIN: adds tighten inside the fold; removals that
    hit a group's stored extremum (fact deletes of a group's argmin AND
    argmax, a fact fk move carrying a group's min away, a dim attribute
    move relocating a whole key's rows, a dim delete dangling them) mark
    groups dirty, and the join-restricted rescan re-derives exactly those
    — bit-equal to a full recompute at per-step AND spanning cadences."""
    fa, da1, da2, mva = _mk_star_mm(spark, tmp_path / "a")
    fb, db1, db2, mvb = _mk_star_mm(spark, tmp_path / "b")
    mva.refresh_star(spark, fa, [da1, da2])
    mvb.refresh_star(spark, fb, [db1, db2])
    assert _star_state_mm(mva.read(spark)) == _star_recompute_mm(
        spark, fa, da1, da2
    )

    steps = [
        # k2 is (A,W)'s only row (min==max): delete → group gone;
        # k1 (A,E min=11) moves to (B,W) → old group dirty, new tightens
        ("F", [("D", 2, 5, None, None, None), ("U", 1, 5, 20, 200, 12)]),
        # d1=30 A→B: k5 (cents 55) leaves (A,*) and joins (B,*);
        # d1=20 deleted: its fact rows dangle (every (B,*) group dirty)
        ("D1", [("U", 30, 6, "B"), ("D", 20, 6, None)]),
        # insert that only TIGHTENS (no dirty): new max for (B,E)
        ("F", [("I", 9, 7, 30, 100, 999), ("I", 10, 7, 30, 100, 1)]),
        # d2 attribute move relocates (…,E) rows under a new region name
        ("D2", [("U", 100, 8, "N")]),
    ]
    for side, ev in steps:
        for f_, d1_, d2_, mv_ in ((fa, da1, da2, mva), (fb, db1, db2, mvb)):
            if side == "F":
                f_.merge(spark, _sfb(spark, ev))
            elif side == "D1":
                d1_.merge(spark, _db(spark, ev))
            else:
                d2_.merge(spark, _d2b(spark, ev))
        mva.refresh_star(spark, fa, [da1, da2])  # per-step cadence
    mvb.refresh_star(spark, fb, [db1, db2])      # one spanning slice
    want = _star_recompute_mm(spark, fa, da1, da2)
    assert _star_state_mm(mva.read(spark)) == want
    assert _star_state_mm(mvb.read(spark)) == want


def test_snowflake_minmax_chain_rescan(spark, tmp_path):
    """MIN/MAX through a SNOWFLAKE chain: a ΔD1 re-point moves fact rows
    between D2 groups with no fact/D2 event — the removal side must mark
    the OLD chain group dirty and the rescan walks the ownership chain
    back to a literal fact predicate."""
    from tidb2dw_spark.operators.join_matview import (
        MaintainedStarAggregate,
        init_star_agg,
    )

    fact = ManagedTable(tmp_path / "f")
    fact.create(
        spark.createDataFrame(
            [(1, 10, 5), (2, 10, 9), (3, 20, 3), (4, 30, 8)],
            "k long, fk1 long, m long",
        ),
        pk_cols=["k"], pk_buckets=4, cdf=True,
    )
    d1 = ManagedTable(tmp_path / "d1")
    d1.create(
        spark.createDataFrame(
            [(10, 100), (20, 100), (30, 200)], "d long, nk long"
        ),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    d2 = ManagedTable(tmp_path / "d2")
    d2.create(
        spark.createDataFrame([(100, "E"), (200, "W")], "nid long, region string"),
        pk_cols=["nid"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedStarAggregate(
        tmp_path / "mv",
        dims=[("fk1", []), ("nk", ["region"])],
        fact_group_cols=[],
        sum_cols={"s": "m"},
        min_cols={"mn": "m"},
        max_cols={"mx": "m"},
    )
    mv.refresh_star(spark, fact, [d1, d2])

    def recompute():
        return {
            r["region"]: (r["n_rows"], r["s"], r["mn"], r["mx"])
            for r in init_star_agg(
                fact.read(spark),
                [(d1.read(spark), "fk1", "d"), (d2.read(spark), "nk", "nid")],
                ["region"],
                {"s": "m"}, {"mn": "m"}, {"mx": "m"},
            ).collect()
        }

    def state():
        return {
            r["region"]: (r["n_rows"], r["s"], r["mn"], r["mx"])
            for r in mv.read(spark).collect()
        }

    assert state() == recompute()
    # chain-hop delta alone: d=10 re-points 100→200.  E loses its max (9)
    # AND min (5) with no fact or D2 event; W gains rows (tighten only on
    # the add side, dirty on the remove side).
    d1.merge(
        spark,
        spark.createDataFrame(
            [("U", "d1", "s", 5, 10, 200)],
            "flag string, tablename string, schemaname string, "
            "commit_ts long, d long, nk long",
        ),
    )
    mv.refresh_star(spark, fact, [d1, d2])
    assert state() == recompute()
    # and a fact delete of W's new max (k2, m=9) → chain-walked rescan
    fact.merge(
        spark,
        spark.createDataFrame(
            [("D", "f", "s", 6, 2, None, None)],
            "flag string, tablename string, schemaname string, "
            "commit_ts long, k long, fk1 long, m long",
        ),
    )
    mv.refresh_star(spark, fact, [d1, d2])
    assert state() == recompute()


def test_join_view_fact_where(spark, tmp_path):
    """fact_where on the join view: σ commutes with Δ for a row-local
    fact predicate — boundary-crossing fact updates fold one-sided, dim
    churn folds against the FILTERED fact (including the min/max rescan),
    and the seed guard rejects a predicate mismatch."""
    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = MaintainedJoinAggregate(
        tmp_path / "mvw", fk_col="fk",
        fact_group_cols=[], dim_group_cols=["seg"],
        sum_cols={"total_cents": "cents"},
        min_cols={"lo": "cents"}, max_cols={"hi": "cents"},
        fact_where="cents <= 400", fact_where_cols=["cents"],
    )
    mv.refresh(spark, fact, dim)

    def want():
        return {
            r["seg"]: (r["n_rows"], r["total_cents"], r["lo"], r["hi"])
            for r in init_join_agg(
                fact.read(spark).filter("cents <= 400"), dim.read(spark),
                "fk", "d", ["seg"], {"total_cents": "cents"},
                {"lo": "cents"}, {"hi": "cents"},
            ).collect()
        }

    def got():
        return {
            r["seg"]: (r["n_rows"], r["total_cents"], r["lo"], r["hi"])
            for r in mv.read(spark).collect()
        }

    assert got() == want()
    assert got() == {"A": (2, 300, 100, 200), "B": (2, 700, 300, 400)}
    # fact churn crosses the boundary both ways; dim churn moves a seg
    fact.merge(spark, _fb(spark, [
        ("U", 1, 5, 10, "HI", 999),   # in→out (was A's min, 100)
        ("U", 5, 5, 30, "LO", 150),   # out→in (500 → 150, joins A)
        ("D", 4, 5, None, None, None),  # removes B's max → dirty rescan
        ("I", 9, 5, 30, "HI", 350),
    ]))
    dim.merge(spark, _db(spark, [("U", 30, 6, "B")]))
    mv.refresh(spark, fact, dim)
    assert got() == want()
    with pytest.raises(ValueError, match="fact_where"):
        MaintainedJoinAggregate(
            tmp_path / "mvw", fk_col="fk",
            fact_group_cols=[], dim_group_cols=["seg"],
            sum_cols={"total_cents": "cents"},
        ).refresh(spark, fact, dim)


def test_dim_where_boundary_and_chain(spark, tmp_path):
    """dim_wheres: each dim's σ applies to its seed, slice, and every
    reconstructed state.  Covers a dim attribute move across its own
    predicate boundary (folds as one-sided dim remove/add), combined
    fact_where crossings, min/max rescan against the filtered join, and
    a chain whose OWNER dim is filtered — a custkey re-point on a
    σ-excluded order must stay invisible."""
    from tidb2dw_spark.operators.join_matview import (
        MaintainedStarAggregate,
        init_star_agg,
    )

    fact = ManagedTable(tmp_path / "f")
    fact.create(
        spark.createDataFrame(
            [(1, 10, 5), (2, 10, 9), (3, 20, 3), (4, 30, 8), (5, 20, 4)],
            "k long, fk long, m long",
        ),
        pk_cols=["k"], pk_buckets=4, cdf=True,
    )
    d1 = ManagedTable(tmp_path / "d1")
    d1.create(
        spark.createDataFrame(
            [(10, "A", 1, 100), (20, "B", 0, 100), (30, "A", 1, 200)],
            "d long, seg string, act long, ck long",
        ),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    d2 = ManagedTable(tmp_path / "d2")
    d2.create(
        spark.createDataFrame(
            [(100, "E", 1), (200, "W", 0)], "cid long, region string, vip long"
        ),
        pk_cols=["cid"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedStarAggregate(
        tmp_path / "mv",
        dims=[("fk", ["seg"]), ("ck", ["region"])],  # ck owned by d1
        fact_group_cols=[],
        sum_cols={"s": "m"},
        min_cols={"mn": "m"},
        fact_where="m >= 4", fact_where_cols=[],
        dim_wheres=["act = 1", "vip = 1"],
        dim_where_cols=[["act"], ["vip"]],
    )
    mv.refresh_star(spark, fact, [d1, d2])

    def rec():
        return sorted(
            tuple(r)
            for r in init_star_agg(
                fact.read(spark).filter("m >= 4"),
                [
                    (d1.read(spark).filter("act = 1"), "fk", "d"),
                    (d2.read(spark).filter("vip = 1"), "ck", "cid"),
                ],
                ["seg", "region"], {"s": "m"}, {"mn": "m"},
            ).collect()
        )

    def st_():
        return sorted(tuple(r) for r in mv.read(spark).collect())

    assert st_() == rec()

    d1_env = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "d long, seg string, act long, ck long"
    )
    d2_env = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "cid long, region string, vip long"
    )
    f_env = (
        "flag string, tablename string, schemaname string, commit_ts long, "
        "k long, fk long, m long"
    )
    # d1: 20 activates (B enters), 10 deactivates (A shrinks) AND its ck
    # re-points to 200 in the SAME event — invisible while inactive
    d1.merge(spark, spark.createDataFrame(
        [("U", "d", "s", 2, 20, "B", 1, 100),
         ("U", "d", "s", 2, 10, "A", 0, 200)], d1_env))
    # d2: 200 becomes vip (W enters for rows chained through ck=200)
    d2.merge(spark, spark.createDataFrame(
        [("U", "d", "s", 2, 200, "W", 1)], d2_env))
    # fact: k3 crosses in (3→7), k2 crosses out (9→2, was a max)
    fact.merge(spark, spark.createDataFrame(
        [("U", "f", "s", 2, 3, 20, 7), ("U", "f", "s", 2, 2, 10, 2)], f_env))
    mv.refresh_star(spark, fact, [d1, d2])
    assert st_() == rec()
    # reactivate d=10: its rows resurface under the re-pointed chain
    d1.merge(spark, spark.createDataFrame(
        [("U", "d", "s", 3, 10, "A", 1, 200)], d1_env))
    mv.refresh_star(spark, fact, [d1, d2])
    assert st_() == rec()
    with pytest.raises(ValueError, match="dim_wheres"):
        MaintainedStarAggregate(
            tmp_path / "mv",
            dims=[("fk", ["seg"]), ("ck", ["region"])],
            fact_group_cols=[], sum_cols={"s": "m"}, min_cols={"mn": "m"},
            fact_where="m >= 4",
        ).refresh_star(spark, fact, [d1, d2])


from hypothesis import given, settings, strategies as st  # noqa: E402

_pf_ev = st.tuples(
    st.just("F"), st.sampled_from(["I", "U", "D"]), st.integers(0, 7),
    st.sampled_from([10, 20, 30, 40, None]),
    st.sampled_from([100, 200, 300, None]), st.integers(0, 20),
)
_pd1_ev = st.tuples(
    st.just("D1"), st.sampled_from(["I", "U", "D"]),
    st.sampled_from([10, 20, 30, 40]), st.sampled_from(["A", "B", "C"]),
)
_pd2_ev = st.tuples(
    st.just("D2"), st.sampled_from(["I", "U", "D"]),
    st.sampled_from([100, 200, 300]), st.sampled_from(["E", "W"]),
)


@settings(max_examples=4, deadline=None)
@given(
    batches=st.lists(
        st.lists(
            st.one_of(_pf_ev, _pd1_ev, _pd2_ev), min_size=1, max_size=4
        ),
        min_size=1,
        max_size=2,
    )
)
def test_star_matches_recompute_on_random_feeds(spark, batches):
    """Property: for ANY random cross-table I/U/D sequence (fk moves,
    NULL fks, dim deletes/revivals, same-slice interactions), the
    maintained star rollup equals a full three-way recompute — both
    refreshed per batch and with ONE refresh spanning everything."""
    import tempfile as _tf
    from pathlib import Path as _P

    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    root = _P(_tf.mkdtemp(prefix="starprop_"))
    fact, d1, d2, _ = _mk_star(spark, root)
    mm = dict(min_cols={"min_cents": "cents"}, max_cols={"max_cents": "cents"})
    mv_each = MaintainedStarAggregate(
        root / "mv_each", dims=[("fk1", ["seg"]), ("fk2", ["region"])],
        fact_group_cols=[], sum_cols={"total_cents": "cents"}, **mm,
    )
    mv_span = MaintainedStarAggregate(
        root / "mv_span", dims=[("fk1", ["seg"]), ("fk2", ["region"])],
        fact_group_cols=[], sum_cols={"total_cents": "cents"}, **mm,
    )
    mv_each.refresh_star(spark, fact, [d1, d2])
    mv_span.refresh_star(spark, fact, [d1, d2])

    ts = 100
    for batch in batches:
        per = {"F": [], "D1": [], "D2": []}
        for ev in batch:
            per[ev[0]].append(ev[1:])
        if per["F"]:
            fact.merge(spark, _sfb(spark, [
                (f, k, ts + i,
                 None if f == "D" else a, None if f == "D" else b,
                 None if f == "D" else c)
                for i, (f, k, a, b, c) in enumerate(per["F"])
            ]))
        if per["D1"]:
            d1.merge(spark, _db(spark, [
                (f, d, ts + 50 + i, None if f == "D" else s)
                for i, (f, d, s) in enumerate(per["D1"])
            ]))
        if per["D2"]:
            d2.merge(spark, _d2b(spark, [
                (f, d, ts + 80 + i, None if f == "D" else r)
                for i, (f, d, r) in enumerate(per["D2"])
            ]))
        ts += 100
        mv_each.refresh_star(spark, fact, [d1, d2])

    mv_span.refresh_star(spark, fact, [d1, d2])
    want = _star_recompute_mm(spark, fact, d1, d2)
    assert _star_state_mm(mv_each.read(spark)) == want
    assert _star_state_mm(mv_span.read(spark)) == want


# --- composite-PK dims (partsupp shape: dim keyed by a two-column PK) ---

CPK_FACT_SCHEMA = "k long, pfk long, sfk long, pri string, qty long"
CPK_FACT_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, pfk long, sfk long, pri string, qty long"
)
CPK_DIM_SCHEMA = "pd long, sd long, band string, cost long"
CPK_DIM_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "pd long, sd long, band string, cost long"
)

CPK_FACT = [
    (1, 10, 1, "HI", 5), (2, 10, 2, "LO", 6), (3, 20, 1, "HI", 7),
    (4, 20, 2, "LO", 8), (5, 10, 1, "LO", 9), (6, None, 1, "HI", 10),
    (7, 10, None, "HI", 11), (8, 30, 3, "LO", 12),  # dangling pair
]
CPK_DIM = [
    (10, 1, "CHEAP", 100), (10, 2, "DEAR", 200),
    (20, 1, "DEAR", 300), (20, 2, "CHEAP", 400),
]


def _mk_cpk(spark, tmp_path, min_cols=None):
    fact = ManagedTable(tmp_path / "cfact")
    fact.create(
        spark.createDataFrame(CPK_FACT, CPK_FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=4, cdf=True,
    )
    dim = ManagedTable(tmp_path / "cdim")
    dim.create(
        spark.createDataFrame(CPK_DIM, CPK_DIM_SCHEMA),
        pk_cols=["pd", "sd"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedJoinAggregate(
        tmp_path / "cmv",
        fk_col=["pfk", "sfk"],
        fact_group_cols=["pri"],
        dim_group_cols=["band"],
        sum_cols={"total_qty": "qty"},
        min_cols=min_cols,
    )
    return fact, dim, mv


def _cfb(spark, events):
    """composite fact batch: (flag, k, ts, pfk, sfk, pri, qty)."""
    return spark.createDataFrame(
        [(f, "t", "s", ts, k, p, s, pr, q) for f, k, ts, p, s, pr, q in events],
        CPK_FACT_ENV,
    )


def _cdb(spark, events):
    """composite dim batch: (flag, (pd, sd), ts, band, cost)."""
    return spark.createDataFrame(
        [(f, "t", "s", ts, pd, sd, b, c) for f, (pd, sd), ts, b, c in events],
        CPK_DIM_ENV,
    )


def _cpk_recompute(spark, fact, dim, min_cols=None):
    agg = init_join_agg(
        fact.read(spark), dim.read(spark), ["pfk", "sfk"], ["pd", "sd"],
        ["pri", "band"], {"total_qty": "qty"}, min_cols=min_cols,
    )
    cols = ["n_rows", "total_qty"] + list(min_cols or {})
    return {
        (r["pri"], r["band"]): tuple(r[c] for c in cols)
        for r in agg.collect()
    }


def _cpk_state(df, min_cols=None):
    cols = ["n_rows", "total_qty"] + list(min_cols or {})
    return {
        (r["pri"], r["band"]): tuple(r[c] for c in cols)
        for r in df.collect()
    }


def test_composite_pk_dim_seed_and_churn(spark, tmp_path):
    """A dim keyed by a TWO-column PK (partsupp shape): seed equals
    recompute (NULL-member and dangling fk pairs excluded), then one
    refresh folds adversarial churn on BOTH feeds — fact key-pair moves,
    dim attribute moves, a dim delete (danglings appear), a dim insert
    the fact slice adopts — bit-equal to a full recompute."""
    fact, dim, mv = _mk_cpk(spark, tmp_path)
    mv.refresh(spark, fact, dim)
    got = _cpk_state(mv.read(spark))
    assert got == _cpk_recompute(spark, fact, dim)
    assert sum(v[0] for v in got.values()) == 5  # k6/k7/k8 excluded

    fact.merge(spark, _cfb(spark, [
        ("U", 1, 5, 20, 2, "HI", 50),   # moves to another key PAIR
        ("D", 4, 5, None, None, None, None),
        ("I", 9, 5, 30, 3, "LO", 60),   # adopts the pair inserted below
        ("U", 5, 5, 10, 2, "LO", 9),    # second member flips only
    ]))
    dim.merge(spark, _cdb(spark, [
        ("D", (10, 1), 6, None, None),      # k3-era rows dangle
        ("U", (20, 2), 6, "MID", 400),      # attribute move
        ("I", (30, 3), 6, "CHEAP", 500),    # k8 + new k9 attach
    ]))
    mv.refresh(spark, fact, dim)
    assert _cpk_state(mv.read(spark)) == _cpk_recompute(spark, fact, dim)


def test_composite_pk_dim_minmax_dirty_rescan(spark, tmp_path):
    """MIN through a composite-keyed join: deleting a group's current
    minimum forces the dirty rescan, whose fact restriction walks the
    composite fk as a per-column literal box (superset; the inner join
    re-tightens) — result bit-equal to recompute."""
    fact, dim, mv = _mk_cpk(spark, tmp_path, min_cols={"min_qty": "qty"})
    mv.refresh(spark, fact, dim)
    # k2 is (LO, DEAR)'s minimum (qty 6); delete it → dirty rescan
    fact.merge(spark, _cfb(spark, [
        ("D", 2, 5, None, None, None, None),
        ("I", 10, 5, 20, 1, "HI", 1),   # new minimum for (HI, DEAR)
    ]))
    dim.merge(spark, _cdb(spark, [
        ("U", (20, 1), 6, "DEAR", 333),  # same band, cost move (no-op grp)
    ]))
    mv.refresh(spark, fact, dim)
    assert _cpk_state(
        mv.read(spark), {"min_qty": "qty"}
    ) == _cpk_recompute(spark, fact, dim, min_cols={"min_qty": "qty"})


def test_composite_pk_arity_mismatch_rejected(spark, tmp_path):
    """fk tuple arity must match the dim's PK arity — a single-column fk
    against a two-column-PK dim fails loudly at seed."""
    fact = ManagedTable(tmp_path / "f")
    fact.create(
        spark.createDataFrame(CPK_FACT, CPK_FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=2, cdf=True,
    )
    dim = ManagedTable(tmp_path / "d")
    dim.create(
        spark.createDataFrame(CPK_DIM, CPK_DIM_SCHEMA),
        pk_cols=["pd", "sd"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedJoinAggregate(
        tmp_path / "mv", fk_col="pfk", fact_group_cols=["pri"],
        dim_group_cols=["band"], sum_cols={"total_qty": "qty"},
    )
    with pytest.raises(ValueError, match="arity"):
        mv.refresh(spark, fact, dim)


def test_overlapping_names_rejected(spark, tmp_path):
    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = MaintainedJoinAggregate(
        tmp_path / "mv2", fk_col="fk",
        fact_group_cols=["seg"],  # claims a dim-named column on the fact side
        dim_group_cols=["seg"],
        sum_cols={"total_cents": "cents"},
    )
    # since round 8 the misdeclared fact group col is caught by the
    # schema-membership check (more pointed than the downstream
    # consumed-columns overlap it used to fall through to)
    with pytest.raises(ValueError, match="neither fact columns"):
        mv.refresh(spark, fact, dim)


# ---------------------------------------------------------------------------
# join_where: a row-local predicate over the JOINED row (the cross-dim
# equality TPC-H Q5 needs).  σ_J commutes with the delta decomposition,
# so maintained == σ_J applied to a full recompute — under churn that
# flips the equality from EITHER side.
# ---------------------------------------------------------------------------
JW_FACT_SCHEMA = "k long, fk1 long, fk2 long, cents long"
JW_FACT_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, fk1 long, fk2 long, cents long"
)
JW_D1_SCHEMA = "d long, seg string, a long"
JW_D1_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "d long, seg string, a long"
)
JW_D2_SCHEMA = "d2 long, region string, b long"
JW_D2_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "d2 long, region string, b long"
)

JW_FACT = [
    (1, 10, 100, 11), (2, 10, 200, 22), (3, 20, 100, 33),
    (4, 20, 300, 44), (5, 30, 200, 55),
]
JW_D1 = [(10, "A", 1), (20, "B", 2), (30, "A", 3)]
JW_D2 = [(100, "E", 1), (200, "W", 2), (300, "E", 9)]


def _mk_jw(spark, tmp_path):
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact = ManagedTable(tmp_path / "jwf").create(
        spark.createDataFrame(JW_FACT, JW_FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=2, cdf=True,
    )
    d1 = ManagedTable(tmp_path / "jwd1").create(
        spark.createDataFrame(JW_D1, JW_D1_SCHEMA),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    d2 = ManagedTable(tmp_path / "jwd2").create(
        spark.createDataFrame(JW_D2, JW_D2_SCHEMA),
        pk_cols=["d2"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedStarAggregate(
        tmp_path / "jwmv",
        dims=[("fk1", ["seg"]), ("fk2", ["region"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        # a/b consumed via the per-dim extra-columns channel (legal
        # without a dim_where)
        dim_where_cols=[["a"], ["b"]],
        join_where="a = b",
    )
    return fact, d1, d2, mv


def _jw_recompute(spark, fact, d1, d2):
    j = (
        fact.read(spark)
        .join(d1.read(spark), F.col("fk1") == F.col("d"), "inner")
        .join(d2.read(spark), F.col("fk2") == F.col("d2"), "inner")
        .filter(F.col("a") == F.col("b"))
        .groupBy("seg", "region")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
    )
    return {
        (r["seg"], r["region"]): (r["n_rows"], r["total_cents"])
        for r in j.collect()
    }


def _jw_state(df):
    return {
        (r["seg"], r["region"]): (r["n_rows"], r["total_cents"])
        for r in df.collect()
    }


def test_join_where_seed_and_churn_flips_both_sides(spark, tmp_path):
    fact, d1, d2, mv = _mk_jw(spark, tmp_path)
    mv.refresh_star(spark, fact, [d1, d2])
    got = _jw_state(mv.read(spark))
    assert got == _jw_recompute(spark, fact, d1, d2)
    # only k=1 (a=1,b=1) and k=5 (a=3? no — a=3,b=2) … verify k1 + k2? a(10)=1
    # matches b(100)=1 → k1; a(10)=1 vs b(200)=2 → k2 out; a(20)=2 vs b(100)=1
    # → k3 out; a(20)=2 vs b(300)=9 → k4 out; a(30)=3 vs b(200)=2 → k5 out.
    assert sum(n for n, _ in got.values()) == 1

    # flip the equality from the d1 side (a move makes k3 match), the d2
    # side (b move makes k4 match and breaks k1), and churn the fact too
    d1.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 5, 20, "B", 1)], JW_D1_ENV
    ))
    d2.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 6, 100, "E", 1), ("U", "t", "s", 6, 300, "E", 2)],
        JW_D2_ENV,
    ))
    fact.merge(spark, spark.createDataFrame(
        [("I", "t", "s", 7, 6, 30, 200, 66),
         ("D", "t", "s", 7, 2, None, None, None)],
        JW_FACT_ENV,
    ))
    mv.refresh_star(spark, fact, [d1, d2])
    assert _jw_state(mv.read(spark)) == _jw_recompute(spark, fact, d1, d2)

    # mismatched reconstruction is refused
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    other = MaintainedStarAggregate(
        tmp_path / "jwmv",
        dims=[("fk1", ["seg"]), ("fk2", ["region"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        dim_where_cols=[["a"], ["b"]],
    )
    fact.merge(spark, spark.createDataFrame(
        [("D", "t", "s", 9, 5, None, None, None)], JW_FACT_ENV
    ))
    with pytest.raises(ValueError, match="join_where"):
        other.refresh_star(spark, fact, [d1, d2])


def test_join_where_distinct_star(spark, tmp_path):
    """join_where composes with the distinct-through-join view: the
    equality flip must add/remove SUPPORT, not just counts."""
    from tidb2dw_spark.operators.join_matview import (
        MaintainedDistinctStarAggregate,
    )

    fact = ManagedTable(tmp_path / "jdf").create(
        spark.createDataFrame(JW_FACT, JW_FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=2, cdf=True,
    )
    d1 = ManagedTable(tmp_path / "jdd1").create(
        spark.createDataFrame(JW_D1, JW_D1_SCHEMA),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    d2 = ManagedTable(tmp_path / "jdd2").create(
        spark.createDataFrame(JW_D2, JW_D2_SCHEMA),
        pk_cols=["d2"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedDistinctStarAggregate(
        tmp_path / "jdmv",
        dims=[("fk1", ["seg"]), ("fk2", [])],
        fact_group_cols=[],
        sum_cols={},
        distinct_cols={"n_fk2": "fk2"},
        dim_where_cols=[["a"], ["b"]],
        join_where="a = b",
        n_buckets=4,
    )

    def recompute():
        j = (
            fact.read(spark)
            .join(d1.read(spark), F.col("fk1") == F.col("d"), "inner")
            .join(d2.read(spark), F.col("fk2") == F.col("d2"), "inner")
            .filter(F.col("a") == F.col("b"))
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(F.col("fk2")).alias("n_fk2"),
            )
        )
        return {r["seg"]: (r["n_rows"], r["n_fk2"]) for r in j.collect()}

    mv.refresh_star(spark, fact, [d1, d2])
    assert {
        r["seg"]: (r["n_rows"], r["n_fk2"]) for r in mv.read(spark).collect()
    } == recompute()
    d2.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 5, 200, "W", 1), ("U", "t", "s", 5, 100, "E", 7)],
        JW_D2_ENV,
    ))
    d1.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 6, 30, "A", 2)], JW_D1_ENV
    ))
    mv.refresh_star(spark, fact, [d1, d2])
    assert {
        r["seg"]: (r["n_rows"], r["n_fk2"]) for r in mv.read(spark).collect()
    } == recompute()


def test_join_where_minmax_dirty_rescan(spark, tmp_path):
    """join_where composes with maintained MIN/MAX: the dirty-group
    rescan re-derives extrema from the CURRENT join WITH the cross-dim
    predicate applied — a removal of the stored extremum row via an
    equality flip must re-derive from the σ_J-filtered join, not the
    raw one."""
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact = ManagedTable(tmp_path / "mmf").create(
        spark.createDataFrame(JW_FACT, JW_FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=2, cdf=True,
    )
    d1 = ManagedTable(tmp_path / "mmd1").create(
        spark.createDataFrame(JW_D1, JW_D1_SCHEMA),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    d2 = ManagedTable(tmp_path / "mmd2").create(
        spark.createDataFrame(JW_D2, JW_D2_SCHEMA),
        pk_cols=["d2"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedStarAggregate(
        tmp_path / "mmmv",
        dims=[("fk1", ["seg"]), ("fk2", [])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        max_cols={"max_cents": "cents"},
        dim_where_cols=[["a"], ["b"]],
        join_where="a = b",
    )

    def recompute():
        j = (
            fact.read(spark)
            .join(d1.read(spark), F.col("fk1") == F.col("d"), "inner")
            .join(d2.read(spark), F.col("fk2") == F.col("d2"), "inner")
            .filter(F.col("a") == F.col("b"))
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("cents").alias("total_cents"),
                F.max("cents").alias("max_cents"),
            )
        )
        return {
            r["seg"]: (r["n_rows"], r["total_cents"], r["max_cents"])
            for r in j.collect()
        }

    def state():
        return {
            r["seg"]: (r["n_rows"], r["total_cents"], r["max_cents"])
            for r in mv.read(spark).collect()
        }

    # widen the matching set first so group A has two rows (k1 cents=11,
    # k5 via a(30)=3→2? no — make b(200)=3 so k5 (a=3,b=3) matches)
    d2.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 4, 200, "W", 3)], JW_D2_ENV
    ))
    mv.refresh_star(spark, fact, [d1, d2])
    assert state() == recompute()
    assert state()["A"] == (2, 66, 55)  # k1 (11) + k5 (55)

    # k5 is A's stored max; flip its equality OFF from the d1 side
    # (a(30): 3 → 9) — the dirty rescan must rebuild A's max from the
    # σ_J-filtered join (leaving only k1 → max 11)
    d1.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 5, 30, "A", 9)], JW_D1_ENV
    ))
    mv.refresh_star(spark, fact, [d1, d2])
    assert state() == recompute()
    assert state()["A"] == (1, 11, 11)


# ---------------------------------------------------------------------------
# Expression measures + fact-derived columns.  sum/min/max sources are
# row-local SQL expressions over the JOINED row (CASE over a dim
# attribute = TPC-H Q12's conditional count through the join), and
# fact_derived_cols synthesizes fact-side columns (year()-style grain
# keys, quantized measures) at every fact materialization point.
# ---------------------------------------------------------------------------
def _mk_expr_view(tmp_path):
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    return MaintainedStarAggregate(
        tmp_path / "mv",
        dims=[("fk", [])],            # dim supplies NO group key
        fact_group_cols=["pri"],
        sum_cols={
            "total_cents": "cents",
            # conditional sum over the DIM attribute — rides measure_cols
            "b_cents": "CASE WHEN seg = 'B' THEN cents ELSE 0 END",
            # conditional count over a FACT attribute already consumed
            "n_hi": "CASE WHEN pri = 'HI' THEN 1 ELSE 0 END",
        },
        measure_cols=["seg"],
    )


def _expr_recompute(spark, fact, dim):
    j = fact.read(spark).join(
        dim.read(spark), F.col("fk") == F.col("d"), "inner"
    )
    rows = j.groupBy("pri").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.expr("CASE WHEN seg = 'B' THEN cents ELSE 0 END")).alias("b_cents"),
        F.sum(F.expr("CASE WHEN pri = 'HI' THEN 1 ELSE 0 END")).alias("n_hi"),
    ).collect()
    return {
        r["pri"]: (r["n_rows"], r["total_cents"], r["b_cents"], r["n_hi"])
        for r in rows
    }


def _expr_state(mv, spark):
    return {
        r["pri"]: (r["n_rows"], r["total_cents"], r["b_cents"], r["n_hi"])
        for r in mv.read(spark).collect()
    }


def test_expr_measures_through_join(spark, tmp_path):
    """Conditional SUMs over dim and fact attributes stay exact under
    churn on both feeds — measure columns resolve by schema membership
    and the CASE rides the signed delta rows."""
    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_expr_view(tmp_path)
    mv.refresh_star(spark, fact, [dim])
    assert _expr_state(mv, spark) == _expr_recompute(spark, fact, dim)

    # dim attribute move flips the CASE arm for every joined row on d=20;
    # fact churn moves rows across the fact-side CASE and the join
    dim.merge(spark, _db(spark, [("U", 20, 5, "B2"), ("U", 10, 5, "B")]))
    fact.merge(spark, _fb(spark, [
        ("U", 1, 6, 20, "LO", 150),
        ("D", 3, 6, None, None, None),
        ("I", 8, 6, 30, "HI", 800),
    ]))
    mv.refresh_star(spark, fact, [dim])
    assert _expr_state(mv, spark) == _expr_recompute(spark, fact, dim)


def test_fact_derived_group_and_measure(spark, tmp_path):
    """A derived column is a first-class group key AND measure source:
    the rollup never stores the dependency column, and churn that moves
    rows across derived-group boundaries folds exactly."""
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = MaintainedStarAggregate(
        tmp_path / "mv",
        dims=[("fk", ["seg"])],
        fact_group_cols=["band"],
        sum_cols={"half_total": "half_cents"},
        fact_derived_cols={
            "band": ("CAST(cents / 300 AS INT)", ["cents"]),
            "half_cents": ("CAST(cents / 2 AS LONG)", ["cents"]),
        },
    )
    mv.refresh_star(spark, fact, [dim])

    def recompute():
        j = (
            fact.read(spark)
            .withColumn("band", F.expr("CAST(cents / 300 AS INT)"))
            .withColumn("half_cents", F.expr("CAST(cents / 2 AS LONG)"))
            .join(dim.read(spark), F.col("fk") == F.col("d"), "inner")
        )
        return {
            (r["band"], r["seg"]): (r["n_rows"], r["half_total"])
            for r in j.groupBy("band", "seg").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("half_cents").alias("half_total"),
            ).collect()
        }

    def state():
        return {
            (r["band"], r["seg"]): (r["n_rows"], r["half_total"])
            for r in mv.read(spark).collect()
        }

    assert state() == recompute()
    # cents updates move rows ACROSS derived bands (100→950 crosses
    # band 0→3); dim churn relabels a segment under a derived group
    fact.merge(spark, _fb(spark, [
        ("U", 1, 5, 10, "HI", 950),
        ("U", 5, 5, 30, "LO", 10),
        ("I", 8, 5, 20, "HI", 601),
    ]))
    dim.merge(spark, _db(spark, [("U", 20, 6, "B9")]))
    mv.refresh_star(spark, fact, [dim])
    assert state() == recompute()
    # the persisted rollup must NOT carry the dependency column
    assert "cents" not in mv.read(spark).columns


def test_expr_minmax_dirty_rescan(spark, tmp_path):
    """MIN/MAX over an expression measure: deleting the stored extremum
    row forces the dirty-group rescan, which must re-derive the group's
    extremum by evaluating the SAME expression over the current join."""
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = MaintainedStarAggregate(
        tmp_path / "mv",
        dims=[("fk", ["seg"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        max_cols={"max_eff": "cents + CASE WHEN seg = 'A' THEN 0 ELSE 1000 END"},
        measure_cols=["seg"],
    )
    mv.refresh_star(spark, fact, [dim])

    def recompute():
        j = fact.read(spark).join(
            dim.read(spark), F.col("fk") == F.col("d"), "inner"
        )
        return {
            r["seg"]: (r["n_rows"], r["max_eff"])
            for r in j.groupBy("seg").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.max(
                    F.expr("cents + CASE WHEN seg = 'A' THEN 0 ELSE 1000 END")
                ).alias("max_eff"),
            ).collect()
        }

    def state():
        return {
            r["seg"]: (r["n_rows"], r["max_eff"])
            for r in mv.read(spark).collect()
        }

    assert state() == recompute()
    assert state()["B"] == (2, 1400)  # k4: 400 + 1000
    # delete the extremum row — group B goes dirty, rescan re-evaluates
    fact.merge(spark, _fb(spark, [("D", 4, 5, None, None, None)]))
    mv.refresh_star(spark, fact, [dim])
    assert state() == recompute()
    assert state()["B"] == (1, 1300)  # k3: 300 + 1000


def test_expr_measure_unknown_column_rejected(spark, tmp_path):
    """A bare-name measure source on neither table fails at seed with a
    pointed error, not at plan time."""
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = MaintainedStarAggregate(
        tmp_path / "mv",
        dims=[("fk", ["seg"])],
        fact_group_cols=[],
        sum_cols={"t": "no_such_col"},
    )
    with pytest.raises(ValueError, match="neither the fact nor any dim"):
        mv.refresh_star(spark, fact, [dim])


def test_derived_definition_drift_rejected(spark, tmp_path):
    """Refreshing a view whose fact_derived_cols differ from the seeded
    definition is refused (silent definition mixing would corrupt the
    fold)."""
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)

    def mk(expr):
        return MaintainedStarAggregate(
            tmp_path / "mv",
            dims=[("fk", ["seg"])],
            fact_group_cols=["band"],
            sum_cols={"total_cents": "cents"},
            fact_derived_cols={"band": (expr, ["cents"])},
        )

    mk("CAST(cents / 300 AS INT)").refresh_star(spark, fact, [dim])
    fact.merge(spark, _fb(spark, [("U", 1, 5, 10, "HI", 950)]))
    with pytest.raises(ValueError, match="derived columns"):
        mk("CAST(cents / 100 AS INT)").refresh_star(spark, fact, [dim])


# ---------------------------------------------------------------------------
# Role-playing dims: the SAME dim table joined under two roles with
# per-role renames (nation as supp_nation / cust_nation — the classic
# date-dim pattern).  One churn on the shared feed fires BOTH roles'
# delta terms; the telescoped identity holds slot-wise regardless of
# two slots sharing one relation.
# ---------------------------------------------------------------------------
RP_FACT_SCHEMA = "k long, fk1 long, fk2 long, cents long"
RP_FACT_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, fk1 long, fk2 long, cents long"
)
RP_DIM_SCHEMA = "d long, nm string"
RP_DIM_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "d long, nm string"
)

RP_FACT = [
    (1, 10, 20, 11), (2, 10, 10, 22), (3, 20, 30, 33),
    (4, 30, 10, 44), (5, 20, 20, 55), (6, 99, 10, 66),  # 99 dangles
]
RP_DIM = [(10, "A"), (20, "B"), (30, "C")]


def _mk_roleplay(spark, tmp_path):
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact = ManagedTable(tmp_path / "rpf").create(
        spark.createDataFrame(RP_FACT, RP_FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=2, cdf=True,
    )
    dim = ManagedTable(tmp_path / "rpd").create(
        spark.createDataFrame(RP_DIM, RP_DIM_SCHEMA),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    mv = MaintainedStarAggregate(
        tmp_path / "rpmv",
        dims=[("fk1", ["supp_nm"]), ("fk2", ["cust_nm"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        dim_renames=[
            {"d": "d1", "nm": "supp_nm"},
            {"d": "d2", "nm": "cust_nm"},
        ],
    )
    return fact, dim, mv


def _rp_recompute(spark, fact, dim):
    d1 = dim.read(spark).select(
        F.col("d").alias("d1"), F.col("nm").alias("supp_nm")
    )
    d2 = dim.read(spark).select(
        F.col("d").alias("d2"), F.col("nm").alias("cust_nm")
    )
    j = (
        fact.read(spark)
        .join(d1, F.col("fk1") == F.col("d1"), "inner")
        .join(d2, F.col("fk2") == F.col("d2"), "inner")
        .groupBy("supp_nm", "cust_nm")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
    )
    return {
        (r["supp_nm"], r["cust_nm"]): (r["n_rows"], r["total_cents"])
        for r in j.collect()
    }


def _rp_state(mv, spark):
    return {
        (r["supp_nm"], r["cust_nm"]): (r["n_rows"], r["total_cents"])
        for r in mv.read(spark).collect()
    }


def test_roleplay_seed_and_shared_feed_churn(spark, tmp_path):
    """One dim churn must rewrite joined rows through BOTH roles: a
    rename of nm on d=10 moves groups on the supp side for fk1=10 rows
    AND on the cust side for fk2=10 rows; a delete dangles both."""
    fact, dim, mv = _mk_roleplay(spark, tmp_path)
    mv.refresh_star(spark, fact, [dim, dim])
    assert _rp_state(mv, spark) == _rp_recompute(spark, fact, dim)

    dim.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 5, 10, "A2"), ("D", "t", "s", 5, 30, None)],
        RP_DIM_ENV,
    ))
    fact.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 6, 1, 20, 10, 111),   # both fks move
         ("I", "t", "s", 6, 9, 10, 20, 99),
         ("D", "t", "s", 6, 5, None, None, None)],
        RP_FACT_ENV,
    ))
    mv.refresh_star(spark, fact, [dim, dim])
    assert _rp_state(mv, spark) == _rp_recompute(spark, fact, dim)


def test_roleplay_cadence_invariance(spark, tmp_path):
    fa, da, mva = _mk_roleplay(spark, tmp_path / "a")
    fb, db, mvb = _mk_roleplay(spark, tmp_path / "b")
    mva.refresh_star(spark, fa, [da, da])
    mvb.refresh_star(spark, fb, [db, db])
    steps = [
        ("D", [("U", "t", "s", 5, 20, "B2")]),
        ("F", [("U", "t", "s", 6, 2, 30, 30, 23)]),
        ("D", [("I", "t", "s", 7, 99, "Z"), ("D", "t", "s", 7, 10, None)]),
        ("F", [("I", "t", "s", 8, 10, 99, 99, 10)]),
    ]
    for side, ev in steps:
        for f_, d_, mv_ in ((fa, da, mva), (fb, db, mvb)):
            if side == "F":
                f_.merge(spark, spark.createDataFrame(ev, RP_FACT_ENV))
            else:
                d_.merge(spark, spark.createDataFrame(ev, RP_DIM_ENV))
        mva.refresh_star(spark, fa, [da, da])  # per-step cadence
    mvb.refresh_star(spark, fb, [db, db])      # one spanning slice
    want = _rp_recompute(spark, fa, da)
    assert _rp_state(mva, spark) == want
    assert _rp_state(mvb, spark) == want


def test_roleplay_rename_layout_drift_rejected(spark, tmp_path):
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact, dim, mv = _mk_roleplay(spark, tmp_path)
    mv.refresh_star(spark, fact, [dim, dim])
    dim.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 5, 10, "A2")], RP_DIM_ENV,
    ))
    other = MaintainedStarAggregate(
        tmp_path / "rpmv",
        dims=[("fk1", ["supp_nm"]), ("fk2", ["cust_nm"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        dim_renames=[
            {"d": "d1", "nm": "supp_nm"},
            {"d": "dX", "nm": "cust_nm"},  # drifted role layout
        ],
    )
    with pytest.raises(ValueError, match="dim_renames"):
        other.refresh_star(spark, fact, [dim, dim])


def test_roleplay_unknown_physical_column_rejected(spark, tmp_path):
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact, dim, _ = _mk_roleplay(spark, tmp_path)
    mv = MaintainedStarAggregate(
        tmp_path / "bad",
        dims=[("fk1", ["supp_nm"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        dim_renames=[{"no_such": "x", "nm": "supp_nm", "d": "d1"}],
    )
    with pytest.raises(ValueError, match="not.*columns of"):
        mv.refresh_star(spark, fact, [dim])


def test_roleplay_rename_target_colliding_with_physical_col_rejected(
    spark, tmp_path
):
    """A rename TARGET equal to an un-renamed physical column of the
    same dim would collapse silently in the view-schema set and invert
    to the wrong physical column — must fail loudly.  Renaming onto a
    column that is itself renamed AWAY (a swap) stays legal."""
    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    fact, dim, _ = _mk_roleplay(spark, tmp_path)
    bad = MaintainedStarAggregate(
        tmp_path / "bad",
        dims=[("fk1", ["d"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        dim_renames=[{"nm": "d"}],  # 'd' is a physical dim column
    )
    with pytest.raises(ValueError, match="collide with physical"):
        bad.refresh_star(spark, fact, [dim])
    # the swap case: both columns renamed away → no collision
    ok = MaintainedStarAggregate(
        tmp_path / "ok",
        dims=[("fk1", ["nm"])],
        fact_group_cols=[],
        sum_cols={"total_cents": "cents"},
        dim_renames=[{"nm": "d", "d": "nm"}],
    )
    ok.refresh_star(spark, fact, [dim])


# --- property: role-playing + expression measures under random feeds ---

_rp_f_ev = st.tuples(
    st.just("F"), st.sampled_from(["I", "U", "D"]), st.integers(0, 7),
    st.sampled_from([10, 20, 30, None]),
    st.sampled_from([10, 20, 30, None]), st.integers(0, 50),
)
_rp_d_ev = st.tuples(
    st.just("D"), st.sampled_from(["I", "U", "D"]),
    st.sampled_from([10, 20, 30]), st.sampled_from(["A", "B", "C"]),
)


@settings(max_examples=4, deadline=None)
@given(
    batches=st.lists(
        st.lists(
            st.one_of(_rp_f_ev, _rp_d_ev), min_size=1, max_size=4
        ),
        min_size=1,
        max_size=2,
    )
)
def test_roleplay_expr_matches_recompute_on_random_feeds(spark, batches):
    """Property: with the SAME dim in two renamed roles and a
    conditional expression measure over a role attribute, ANY random
    I/U/D interleaving on the fact and the shared dim feed keeps the
    maintained rollup equal to a full recompute — per-batch cadence
    and one spanning refresh alike."""
    import tempfile as _tf
    from pathlib import Path as _P

    from tidb2dw_spark.operators.join_matview import MaintainedStarAggregate

    root = _P(_tf.mkdtemp(prefix="rpprop_"))
    fact = ManagedTable(root / "f").create(
        spark.createDataFrame(RP_FACT, RP_FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=2, cdf=True,
    )
    dim = ManagedTable(root / "d").create(
        spark.createDataFrame(RP_DIM, RP_DIM_SCHEMA),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )

    def mk(name):
        return MaintainedStarAggregate(
            root / name,
            dims=[("fk1", ["supp_nm"]), ("fk2", [])],
            fact_group_cols=[],
            sum_cols={
                "total_cents": "cents",
                # conditional over ROLE B's renamed attribute
                "b_cents": "CASE WHEN cust_nm = 'B' THEN cents ELSE 0 END",
            },
            measure_cols=["cust_nm"],
            dim_renames=[
                {"d": "d1", "nm": "supp_nm"},
                {"d": "d2", "nm": "cust_nm"},
            ],
        )

    mv_each, mv_span = mk("mv_each"), mk("mv_span")
    mv_each.refresh_star(spark, fact, [dim, dim])
    mv_span.refresh_star(spark, fact, [dim, dim])

    ts = 100
    for batch in batches:
        fe = [e[1:] for e in batch if e[0] == "F"]
        de = [e[1:] for e in batch if e[0] == "D"]
        if fe:
            fact.merge(spark, spark.createDataFrame(
                [
                    (f, "t", "s", ts + i, k,
                     None if f == "D" else a,
                     None if f == "D" else b,
                     None if f == "D" else c)
                    for i, (f, k, a, b, c) in enumerate(fe)
                ],
                RP_FACT_ENV,
            ))
        if de:
            dim.merge(spark, spark.createDataFrame(
                [
                    (f, "t", "s", ts + 50 + i, d,
                     None if f == "D" else nm)
                    for i, (f, d, nm) in enumerate(de)
                ],
                RP_DIM_ENV,
            ))
        ts += 100
        mv_each.refresh_star(spark, fact, [dim, dim])
    mv_span.refresh_star(spark, fact, [dim, dim])

    d1 = dim.read(spark).select(
        F.col("d").alias("d1"), F.col("nm").alias("supp_nm")
    )
    d2 = dim.read(spark).select(
        F.col("d").alias("d2"), F.col("nm").alias("cust_nm")
    )
    want = {
        r["supp_nm"]: (r["n_rows"], r["total_cents"], r["b_cents"])
        for r in fact.read(spark)
        .join(d1, F.col("fk1") == F.col("d1"), "inner")
        .join(d2, F.col("fk2") == F.col("d2"), "inner")
        .groupBy("supp_nm")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("total_cents"),
            F.sum(
                F.expr("CASE WHEN cust_nm = 'B' THEN cents ELSE 0 END")
            ).alias("b_cents"),
        )
        .collect()
    }

    def state(mv):
        return {
            r["supp_nm"]: (r["n_rows"], r["total_cents"], r["b_cents"])
            for r in mv.read(spark).collect()
        }

    assert state(mv_each) == want
    assert state(mv_span) == want


def test_join_view_pins_at_multi_source_checkpoint(spark, tmp_path):
    """ConsistentSnapshot covers a MULTI-SOURCE join view: the pin
    resolves the (fact_seq, dim_seq) vector the two pinned table
    commits record, and serves the retained version folded at EXACTLY
    that checkpoint — equal to a recompute over the two fenced table
    reads even after both feeds advance past the fence.  A checkpoint
    the view never materialized refuses."""
    from tidb2dw_spark.table.consistent import ConsistentSnapshot

    fact, dim = _mk_pair(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    mv.keep_versions = 8
    mv.refresh(spark, fact, dim)  # seed checkpoint

    # fence 10 on both feeds, view folds the pair
    fact.merge(spark, _fb(spark, [("I", 50, 10, 10, "HI", 111)]))
    dim.merge(spark, _db(spark, [("U", 20, 10, "C")]))
    mv.refresh(spark, fact, dim)
    want_at_10 = _recompute(spark, fact, dim)

    # fence 20 on both feeds — the live view advances PAST the pin
    fact.merge(spark, _fb(spark, [("D", 3, 20, None, None, None)]))
    dim.merge(spark, _db(spark, [("I", 99, 20, "Z")]))
    mv.refresh(spark, fact, dim)
    assert _state(spark, mv.read(spark)) != want_at_10  # really moved

    snap = ConsistentSnapshot(
        {"fact": fact, "dim": dim}, 15,
        views={"mv": (mv, ["fact", "dim"])},
    )
    assert _state(spark, snap.read(spark, "mv")) == want_at_10
    # and the pinned view matches a recompute over the PINNED tables
    pinned = _state(
        spark,
        init_join_agg(
            snap.read(spark, "fact"), snap.read(spark, "dim"), "fk", "d",
            ["pri", "seg"], {"total_cents": "cents"},
        ),
    )
    assert _state(spark, snap.read(spark, "mv")) == pinned

    # a view that SKIPPED the checkpoint (refreshed only after both
    # fences) refuses at construction
    lazy = MaintainedJoinAggregate(
        tmp_path / "lazy", fk_col="fk", fact_group_cols=["pri"],
        dim_group_cols=["seg"], sum_cols={"total_cents": "cents"},
    )
    lazy.keep_versions = 8
    lazy.refresh(spark, fact, dim)
    with pytest.raises(ValueError, match="no state at feed checkpoint"):
        ConsistentSnapshot(
            {"fact": fact, "dim": dim}, 15,
            views={"lazy": (lazy, ["fact", "dim"])},
        )
    # a missing source name refuses
    with pytest.raises(KeyError, match="not in this snapshot"):
        ConsistentSnapshot(
            {"fact": fact}, 15, views={"mv": (mv, ["fact", "dim"])}
        )
