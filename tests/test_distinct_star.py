"""MaintainedDistinctStarAggregate: exact COUNT(DISTINCT) maintained
THROUGH the join (operators/join_matview.py + the shared SupportStore of
operators/distinct_matview.py).

Invariant under test: after ANY interleaving of CDC merges on the fact
and dim feeds, the maintained rollup — including the distinct counts —
equals a full recompute (join current states, count_distinct) bit-for-bit.
The composition must absorb the cases neither parent view sees alone:
a fact delete removing a value's LAST supporting row in its group, a dim
attribute move RELOCATING support between groups, a σ-dim flip adding /
removing a whole supplier's rows (the Q16 denylist shape), and NULL
distinct values (never counted).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb2dw_spark.operators.join_matview import (
    MaintainedDistinctStarAggregate,
)
from tidb2dw_spark.table.managed import ManagedTable

FACT_SCHEMA = "k long, fk long, sup long, pri string, cents long"
FACT_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, fk long, sup long, pri string, cents long"
)
DIM_SCHEMA = "d long, seg string"
DIM_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "d long, seg string"
)
SUPD_SCHEMA = "s long, ok string"
SUPD_ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "s long, ok string"
)


def _mk_tables(spark, tmp_path, fact_rows, dim_rows, supd_rows=None):
    fact = ManagedTable(tmp_path / "fact").create(
        spark.createDataFrame(fact_rows, FACT_SCHEMA),
        pk_cols=["k"], pk_buckets=4, cdf=True,
    )
    dim = ManagedTable(tmp_path / "dim").create(
        spark.createDataFrame(dim_rows, DIM_SCHEMA),
        pk_cols=["d"], pk_buckets=2, cdf=True,
    )
    if supd_rows is None:
        return fact, dim
    supd = ManagedTable(tmp_path / "supd").create(
        spark.createDataFrame(supd_rows, SUPD_SCHEMA),
        pk_cols=["s"], pk_buckets=2, cdf=True,
    )
    return fact, dim, supd


def _fb(spark, events):
    """fact batch: (flag, k, ts, fk, sup, pri, cents)."""
    return spark.createDataFrame(
        [(f, "t", "s", ts, k, fk, sp, p, c) for f, k, ts, fk, sp, p, c in events],
        FACT_ENV,
    )


def _db(spark, events):
    return spark.createDataFrame(
        [(f, "t", "s", ts, d, s) for f, d, ts, s in events], DIM_ENV
    )


def _sb(spark, events):
    return spark.createDataFrame(
        [(f, "t", "s", ts, s, ok) for f, s, ts, ok in events], SUPD_ENV
    )


def _mk_view(tmp_path, n_buckets=4):
    return MaintainedDistinctStarAggregate(
        tmp_path / "mv",
        dims=[("fk", ["seg"])],
        fact_group_cols=["pri"],
        sum_cols={"total_cents": "cents"},
        distinct_cols={"n_sup": "sup"},
        n_buckets=n_buckets,
    )


def _state(df):
    return {
        (r["pri"], r["seg"]): (r["n_rows"], r["total_cents"], r["n_sup"])
        for r in df.collect()
    }


def _recompute(spark, fact, dim):
    j = fact.read(spark).join(
        dim.read(spark), F.col("fk") == F.col("d"), "inner"
    )
    return _state(
        j.groupBy("pri", "seg").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("total_cents"),
            F.count_distinct(F.col("sup")).alias("n_sup"),
        )
    )


BASE_FACT = [
    # (k, fk, sup, pri, cents) — sup 7 supports (HI, A) twice, so one
    # delete must NOT drop it and the second must
    (1, 10, 7, "HI", 100),
    (2, 10, 7, "HI", 200),
    (3, 10, 8, "HI", 300),
    (4, 20, 7, "HI", 400),
    (5, 20, 9, "LO", 500),
    (6, 30, None, "LO", 600),  # NULL distinct value: never counted
    (7, 99, 5, "LO", 700),  # dangling fk: outside the join
]
BASE_DIM = [(10, "A"), (20, "B"), (30, "A")]


def test_distinct_star_seed_equals_recompute(spark, tmp_path):
    fact, dim = _mk_tables(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    mv.refresh_star(spark, fact, [dim])
    got = _state(mv.read(spark))
    assert got == _recompute(spark, fact, dim)
    # (HI, A) counts sup {7, 8}; (LO, A) has only the NULL-sup row → 0
    assert got[("HI", "A")][2] == 2
    assert got[("LO", "A")][2] == 0


def test_distinct_star_last_support_row_and_reinsert(spark, tmp_path):
    """The hard distinct cases: removing ONE of two supporting rows keeps
    the value; removing the LAST drops it; re-inserting a dropped value
    revives it — all through the join."""
    fact, dim = _mk_tables(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    mv.refresh_star(spark, fact, [dim])

    fact.merge(spark, _fb(spark, [("D", 1, 5, None, None, None, None)]))
    mv.refresh_star(spark, fact, [dim])
    got = _state(mv.read(spark))
    assert got == _recompute(spark, fact, dim)
    assert got[("HI", "A")][2] == 2  # sup 7 still supported by k=2

    fact.merge(spark, _fb(spark, [("D", 2, 6, None, None, None, None)]))
    mv.refresh_star(spark, fact, [dim])
    got = _state(mv.read(spark))
    assert got == _recompute(spark, fact, dim)
    assert got[("HI", "A")][2] == 1  # sup 7's LAST row gone

    fact.merge(spark, _fb(spark, [("I", 11, 7, 10, 7, "HI", 150)]))
    mv.refresh_star(spark, fact, [dim])
    got = _state(mv.read(spark))
    assert got == _recompute(spark, fact, dim)
    assert got[("HI", "A")][2] == 2  # revived


def test_distinct_star_dim_move_relocates_support(spark, tmp_path):
    """A dim attribute move rewrites every joined row of that dim key as
    remove+add pairs — the support multiset must relocate wholesale, and
    a value supported in BOTH the old and new group must survive in the
    new one only if other rows still carry it in the old."""
    fact, dim = _mk_tables(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    mv.refresh_star(spark, fact, [dim])

    # dim 10: A -> B.  (HI, A) loses sup {7, 8} entirely (all its rows
    # rode dim 10); (HI, B) gains them, merging with sup 7 already there
    # via k=4 — distinct must NOT double-count 7.
    dim.merge(spark, _db(spark, [("U", 10, 5, "B")]))
    mv.refresh_star(spark, fact, [dim])
    got = _state(mv.read(spark))
    assert got == _recompute(spark, fact, dim)
    assert ("HI", "A") not in got
    assert got[("HI", "B")][2] == 2  # {7, 8}

    # dim delete: dim 20's rows dangle out of the join
    dim.merge(spark, _db(spark, [("D", 20, 6, None)]))
    mv.refresh_star(spark, fact, [dim])
    assert _state(mv.read(spark)) == _recompute(spark, fact, dim)


def test_distinct_star_cadence_invariance(spark, tmp_path):
    """Per-merge refreshes and one spanning refresh land on the same
    rollup AND the same support store answers (probed via a follow-up
    churn whose correctness depends on the stored multiset)."""
    batches = [
        ("F", [("U", 1, 5, 20, 7, "HI", 110), ("D", 3, 5, None, None, None, None)]),
        ("D", [("U", 10, 6, "B"), ("I", 40, 6, "C")]),
        ("F", [("I", 8, 7, 40, 8, "LO", 800), ("D", 4, 7, None, None, None, None)]),
        ("D", [("D", 30, 8, None)]),
        ("F", [("U", 5, 9, 20, 7, "LO", 550)]),
    ]
    for mode, root in [("per", "a"), ("span", "b")]:
        base = tmp_path / root
        base.mkdir()
        fact, dim = _mk_tables(spark, base, BASE_FACT, BASE_DIM)
        mv = _mk_view(base)
        mv.refresh_star(spark, fact, [dim])
        for kind, evs in batches:
            (fact.merge(spark, _fb(spark, evs)) if kind == "F"
             else dim.merge(spark, _db(spark, evs)))
            if mode == "per":
                mv.refresh_star(spark, fact, [dim])
        mv.refresh_star(spark, fact, [dim])
        got = _state(mv.read(spark))
        assert got == _recompute(spark, fact, dim), mode
        # follow-up churn exercises the persisted support store
        fact.merge(spark, _fb(spark, [("D", 5, 20, None, None, None, None)]))
        mv.refresh_star(spark, fact, [dim])
        assert _state(mv.read(spark)) == _recompute(spark, fact, dim), mode


def test_distinct_star_sigma_dim_denylist_flip(spark, tmp_path):
    """The Q16 shape: a second σ-dim (supplier allowlist via dim_where)
    with churn FLIPPING membership — flipping a supplier out must remove
    its support everywhere; flipping in must add it."""
    supd_rows = [(5, "Y"), (7, "Y"), (8, "Y"), (9, "N")]
    fact, dim, supd = _mk_tables(
        spark, tmp_path, BASE_FACT, BASE_DIM, supd_rows
    )
    mv = MaintainedDistinctStarAggregate(
        tmp_path / "mv",
        dims=[("fk", ["seg"]), ("sup", [])],
        fact_group_cols=["pri"],
        sum_cols={"total_cents": "cents"},
        distinct_cols={"n_sup": "sup"},
        dim_wheres=[None, "ok = 'Y'"],
        dim_where_cols=[[], ["ok"]],
        n_buckets=4,
    )

    def recompute():
        j = (
            fact.read(spark)
            .join(dim.read(spark), F.col("fk") == F.col("d"), "inner")
            .join(
                supd.read(spark).filter(F.col("ok") == "Y"),
                F.col("sup") == F.col("s"),
                "inner",
            )
        )
        return _state(
            j.groupBy("pri", "seg").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("cents"), F.lit(0)).alias("total_cents"),
                F.count_distinct(F.col("sup")).alias("n_sup"),
            )
        )

    mv.refresh_star(spark, fact, [dim, supd])
    got = _state(mv.read(spark))
    assert got == recompute()
    assert got[("LO", "B")][0] == 0 if ("LO", "B") in got else True  # sup 9 denied

    # flip sup 7 OUT (denylist) and sup 9 IN, then churn the fact too
    supd.merge(spark, _sb(spark, [("U", 7, 5, "N"), ("U", 9, 5, "Y")]))
    fact.merge(spark, _fb(spark, [("I", 12, 6, 20, 8, "LO", 120)]))
    mv.refresh_star(spark, fact, [dim, supd])
    got = _state(mv.read(spark))
    assert got == recompute()
    assert ("HI", "B") not in got  # only row k=4 rode sup 7 — now denied
    assert got[("LO", "B")][2] == 2  # sup 9 admitted + sup 8 inserted


def test_distinct_star_rejects_mismatched_construction(spark, tmp_path):
    fact, dim = _mk_tables(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    mv.refresh_star(spark, fact, [dim])
    fact.merge(spark, _fb(spark, [("D", 1, 5, None, None, None, None)]))

    import pytest

    other = MaintainedDistinctStarAggregate(
        tmp_path / "mv",
        dims=[("fk", ["seg"])],
        fact_group_cols=["pri"],
        sum_cols={"total_cents": "cents"},
        distinct_cols={"n_other": "sup"},
        n_buckets=4,
    )
    with pytest.raises(ValueError, match="distinct_outs"):
        other.refresh_star(spark, fact, [dim])
    rebucketed = _mk_view(tmp_path, n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        rebucketed.refresh_star(spark, fact, [dim])


def test_distinct_star_store_probes(spark, tmp_path):
    """top_values / quantile_values answer THROUGH the join from the
    maintained support store — equal to a window over the joined
    current state, with no base scan, after churn on both feeds."""
    import pytest
    from pyspark.sql import Window

    fact, dim = _mk_tables(spark, tmp_path, BASE_FACT, BASE_DIM)
    mv = _mk_view(tmp_path)
    mv.refresh_star(spark, fact, [dim])
    fact.merge(spark, _fb(spark, [
        ("I", 20, 5, 10, 7, "HI", 10), ("I", 21, 5, 10, 7, "HI", 10),
        ("I", 22, 5, 10, 8, "HI", 10), ("D", 4, 5, None, None, None, None),
    ]))
    dim.merge(spark, _db(spark, [("U", 30, 6, "B")]))
    mv.refresh_star(spark, fact, [dim])

    joined = (
        fact.read(spark)
        .join(dim.read(spark), F.col("fk") == F.col("d"), "inner")
        .filter(F.col("sup").isNotNull())
        .groupBy("pri", "seg", "sup")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("pri", "seg").orderBy(
        F.col("n").desc(), F.col("sup").asc()
    )
    want_top = {
        (r["pri"], r["seg"], r["sup"], r["n"], r["rk"])
        for r in joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2).collect()
    }
    got_top = {
        (r["pri"], r["seg"], r["__v"], r["__cnt"], r["rank"])
        for r in mv.top_values(spark, "n_sup", 2).collect()
    }
    assert got_top == want_top

    # exact p50 of the support-weighted value multiset per group
    got_q = {
        (r["pri"], r["seg"], r["q_label"]): r["__v"]
        for r in mv.quantile_values(spark, "n_sup", {"p50": (1, 2)}).collect()
    }
    rows = joined.collect()
    import math
    groups = {}
    for r in rows:
        groups.setdefault((r["pri"], r["seg"]), []).extend([r["sup"]] * r["n"])
    want_q = {}
    for g, vals in groups.items():
        vals.sort()
        want_q[(g[0], g[1], "p50")] = vals[math.ceil(len(vals) / 2) - 1]
    assert got_q == want_q

    with pytest.raises(KeyError, match="not a maintained"):
        mv.top_values(spark, "nope", 2)
