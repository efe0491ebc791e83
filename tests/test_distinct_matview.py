"""MaintainedDistinctAggregate: exact COUNT(DISTINCT) maintenance from
the change feed via a bucket-partitioned support multiset
(operators/distinct_matview.py).

Invariant: after ANY churn sequence at ANY refresh cadence, the
maintained rollup equals ``COUNT(DISTINCT)`` recomputed over the current
base state — bit-for-bit.  The adversarial cases are exactly the ones
signed folding cannot express without the support store: removing ONE of
several occurrences (count must NOT drop), removing the LAST occurrence
(count must drop), re-inserting a removed value, and NULL transitions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.operators.distinct_matview import (
    MaintainedDistinctAggregate,
    init_distinct_agg,
)
from tidb2dw_spark.table.managed import ManagedTable

SCHEMA = "k long, g string, v long, w string"
ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, g string, v long, w string"
)

BASE = [
    (1, "a", 10, "x"), (2, "a", 10, "y"), (3, "a", 20, "x"),
    (4, "b", 10, None), (5, "b", None, "z"), (6, None, 30, "x"),
]


def _mk(spark, tmp_path, rows=BASE, n_buckets=4):
    t = ManagedTable(tmp_path / "t")
    t.create(
        spark.createDataFrame(rows, SCHEMA), pk_cols=["k"], pk_buckets=4,
        cdf=True,
    )
    mv = MaintainedDistinctAggregate(
        tmp_path / "mv", ["g"], {"n_v": "v", "n_w": "w"}, n_buckets=n_buckets
    )
    return t, mv


def _b(spark, events):
    """(flag, k, ts, g, v, w) envelope batch."""
    return spark.createDataFrame(
        [(f, "t", "s", ts, k, g, v, w) for f, k, ts, g, v, w in events], ENV
    )


def _state(df):
    return {r["g"]: (r["n_rows"], r["n_v"], r["n_w"]) for r in df.collect()}


def _recompute(spark, t):
    return _state(
        init_distinct_agg(t.read(spark), ["g"], {"n_v": "v", "n_w": "w"})
    )


def test_seed_equals_recompute(spark, tmp_path):
    t, mv = _mk(spark, tmp_path)
    mv.refresh(spark, t)
    got = _state(mv.read(spark))
    assert got == _recompute(spark, t)
    # NULL values don't count; NULL group keys do exist
    assert got["a"] == (3, 2, 2)
    assert got["b"] == (2, 1, 1)
    assert got[None] == (1, 1, 1)


def test_support_semantics_under_churn(spark, tmp_path):
    """The four cases plain signed folding gets wrong."""
    t, mv = _mk(spark, tmp_path)
    mv.refresh(spark, t)

    # remove ONE of two rows carrying (a, v=10): distinct must NOT drop
    t.merge(spark, _b(spark, [("D", 2, 5, None, None, None)]))
    mv.refresh(spark, t)
    assert _state(mv.read(spark)) == _recompute(spark, t)
    assert _state(mv.read(spark))["a"][1] == 2

    # remove the LAST (a, v=10) row: distinct drops to 1
    t.merge(spark, _b(spark, [("D", 1, 6, None, None, None)]))
    mv.refresh(spark, t)
    assert _state(mv.read(spark))["a"][1] == 1

    # re-insert the removed value; NULL→value on (b, v); value→NULL on (a, w)
    t.merge(spark, _b(spark, [
        ("I", 7, 7, "a", 10, "q"),
        ("U", 5, 7, "b", 40, "z"),
        ("U", 3, 7, "a", 20, None),
    ]))
    mv.refresh(spark, t)
    got = _state(mv.read(spark))
    assert got == _recompute(spark, t)
    # b = {k4: (10, NULL), k5: (40, "z")} → distinct w counts only "z"
    assert got["a"] == (2, 2, 1) and got["b"] == (2, 2, 1)

    # group move: k=7 a→b carries its values across groups
    t.merge(spark, _b(spark, [("U", 7, 8, "b", 10, "q")]))
    # new group with only-NULL values: distinct 0, n_rows 1
    t.merge(spark, _b(spark, [("I", 8, 8, "c", None, None)]))
    mv.refresh(spark, t)
    got = _state(mv.read(spark))
    assert got == _recompute(spark, t)
    assert got["c"] == (1, 0, 0)


def test_refresh_cadence_invariance(spark, tmp_path):
    t1, mv1 = _mk(spark, tmp_path / "p1")
    t2, mv2 = _mk(spark, tmp_path / "p2")
    mv1.refresh(spark, t1)
    mv2.refresh(spark, t2)
    steps = [
        [("D", 2, 5, None, None, None), ("I", 9, 5, "a", 10, "y")],
        [("U", 9, 6, "b", 10, "y"), ("D", 4, 6, None, None, None)],
        [("U", 6, 7, None, 30, "w"), ("I", 10, 7, None, 30, "x")],
        [("D", 9, 8, None, None, None), ("I", 11, 8, "a", 99, None)],
    ]
    for ev in steps:
        t1.merge(spark, _b(spark, ev))
        t2.merge(spark, _b(spark, ev))
        mv1.refresh(spark, t1)  # per-merge cadence
    mv2.refresh(spark, t2)      # one spanning refresh
    want = _recompute(spark, t1)
    assert _state(mv1.read(spark)) == want
    assert _state(mv2.read(spark)) == want


def test_restart_from_disk_and_bucket_gc(spark, tmp_path):
    t, mv = _mk(spark, tmp_path, n_buckets=2)
    mv.refresh(spark, t)
    t.merge(spark, _b(spark, [("U", 1, 5, "a", 77, "x")]))
    mv.refresh(spark, t)
    # RESTART: fresh object, state from disk
    mv2 = MaintainedDistinctAggregate(
        tmp_path / "mv", ["g"], {"n_v": "v", "n_w": "w"}, n_buckets=2
    )
    t.merge(spark, _b(spark, [("D", 3, 6, None, None, None)]))
    mv2.refresh(spark, t)
    assert _state(mv2.read(spark)) == _recompute(spark, t)
    # superseded support dirs and rollup versions are GC'd: only LIVE
    # refresh dirs referenced by bucket pointers remain
    meta = mv2.meta()
    for out in ("n_v", "n_w"):
        live = {int(v) for v in meta["bucket_versions"][out].values()}
        on_disk = {
            int(p.name.split("=", 1)[1])
            for p in (tmp_path / "mv" / "support" / out).glob("r=*")
        }
        assert on_disk <= live | {meta["version"]}
    assert [p.name for p in (tmp_path / "mv").glob("v=*")] == [
        f"v={meta['version']}"
    ]


def test_pseudo_random_interleaving(spark, tmp_path):
    t, mv = _mk(spark, tmp_path)
    mv.refresh(spark, t)
    groups = ["a", "b", "c", None]
    next_k = 100
    live = {r[0] for r in BASE}
    for step in range(1, 11):
        h = (step * 2654435761) % 101
        ev = []
        if h % 3 == 0 and live:
            k = sorted(live)[h % len(live)]
            ev.append(("D", k, step, None, None, None))
            live.discard(k)
        elif h % 3 == 1 and live:
            k = sorted(live)[h % len(live)]
            ev.append(
                ("U", k, step, groups[h % 4],
                 None if h % 5 == 0 else (h % 4) * 10, f"w{h % 3}")
            )
        else:
            ev.append(
                ("I", next_k, step, groups[(h // 2) % 4],
                 None if h % 7 == 0 else (h % 6) * 10, None)
            )
            live.add(next_k)
            next_k += 1
        t.merge(spark, _b(spark, ev))
        if step % 2 == 0:
            mv.refresh(spark, t)
            assert _state(mv.read(spark)) == _recompute(spark, t), (
                f"diverged at step {step}"
            )
    mv.refresh(spark, t)
    assert _state(mv.read(spark)) == _recompute(spark, t)


def test_top_values_probe(spark, tmp_path):
    """Heavy hitters from the support store match a recompute over the
    base — after churn, with deterministic (cnt DESC, value ASC) ties —
    and no base-table scan is involved (the store alone answers)."""
    from pyspark.sql import Window

    t, mv = _mk(spark, tmp_path)
    mv.refresh(spark, t)
    t.merge(spark, _b(spark, [
        ("I", 20, 5, "a", 10, "x"), ("I", 21, 5, "a", 20, "x"),
        ("I", 22, 5, "b", 10, "q"), ("D", 3, 5, None, None, None),
        ("U", 4, 5, "b", 10, "z"),
    ]))
    mv.refresh(spark, t)

    got = {
        (r["g"], r["rank"]): (r["__v"], r["__cnt"])
        for r in mv.top_values(spark, "n_v", 2).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("c").desc(), F.col("v").asc())
    want = {
        (r["g"], r["rank"]): (r["v"], r["c"])
        for r in t.read(spark)
        .filter(F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .collect()
    }
    assert got == want
    with pytest.raises(KeyError):
        mv.top_values(spark, "nope", 2)


def test_quantile_values_probe(spark, tmp_path):
    """Weighted lower quantiles from the support store == plain per-group
    quantiles of the source column (the store is the row multiset
    projected onto v), checked against the index formula
    ``sorted(rows)[ceil(p·n) − 1]`` with exact integer thresholds."""
    t, mv = _mk(spark, tmp_path)
    mv.refresh(spark, t)
    t.merge(spark, _b(spark, [
        ("I", 30, 5, "a", 77, None), ("U", 3, 5, "a", 10, "x"),
    ]))
    mv.refresh(spark, t)
    rows = sorted(
        (r["v"]) for r in t.read(spark).filter(
            (F.col("g") == "a") & F.col("v").isNotNull()
        ).collect()
    )
    got = {
        (r["g"], r["q_label"]): r["__v"]
        for r in mv.quantile_values(
            spark, "n_v", {"p50": (1, 2), "p75": (3, 4), "p100": (1, 1)}
        ).collect()
    }
    for lbl, (n, d) in {"p50": (1, 2), "p75": (3, 4), "p100": (1, 1)}.items():
        th = -(-len(rows) * n // d)  # ceil
        assert got[("a", lbl)] == rows[th - 1], (lbl, rows, got)


def test_refresh_touches_only_dirty_buckets(spark, tmp_path):
    """The O(touched buckets) claim, pinned structurally (no timing): a
    churn batch confined to one group advances EXACTLY that group's
    bucket pointer in the touched column's store, leaves every other
    bucket pointer alone, and doesn't touch the other column's store at
    all (the batch carries NULL for it)."""
    t, mv = _mk(spark, tmp_path, n_buckets=8)
    mv.refresh(spark, t)
    before = mv.meta()["bucket_versions"]
    t.merge(spark, _b(spark, [("I", 40, 5, "a", 123, None)]))
    mv.refresh(spark, t)
    after = mv.meta()["bucket_versions"]
    assert after["n_w"] == before["n_w"]          # w untouched: no IO at all
    moved = {
        b
        for b in set(before["n_v"]) | set(after["n_v"])
        if before["n_v"].get(b) != after["n_v"].get(b)
    }
    assert len(moved) == 1                         # exactly group a's bucket
    assert _state(mv.read(spark)) == _recompute(spark, t)


def test_requires_cdf_and_nonempty_spec(spark, tmp_path):
    t = ManagedTable(tmp_path / "nocdf")
    t.create(
        spark.createDataFrame(BASE, SCHEMA), pk_cols=["k"], pk_buckets=2,
        cdf=False,
    )
    mv = MaintainedDistinctAggregate(tmp_path / "mv", ["g"], {"n_v": "v"})
    with pytest.raises(ValueError, match="cdf"):
        mv.refresh(spark, t)
    with pytest.raises(ValueError, match="distinct_cols"):
        MaintainedDistinctAggregate(tmp_path / "mv2", ["g"], {})


def test_where_filtered_distinct_view(spark, tmp_path):
    """Round 8: a row-local σ on the distinct view — boundary-crossing
    updates fold as one-sided ± support deltas, and the maintained
    counts equal COUNT(DISTINCT) over σ(base) at every step.  Also pins
    the drift refusal (σ is part of the seeded definition)."""
    t = ManagedTable(tmp_path / "t")
    t.create(
        spark.createDataFrame(BASE, SCHEMA), pk_cols=["k"], pk_buckets=4,
        cdf=True,
    )
    mv = MaintainedDistinctAggregate(
        tmp_path / "mv", ["g"], {"n_v": "v"},
        where="w = 'x'", where_cols=["w"],
    )
    mv.refresh(spark, t)

    def recompute():
        df = (
            t.read(spark)
            .filter(F.col("w") == "x")
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct("v").alias("n_v"),
            )
        )
        return {r["g"]: (r["n_rows"], r["n_v"]) for r in df.collect()}

    def state():
        return {
            r["g"]: (r["n_rows"], r["n_v"]) for r in mv.read(spark).collect()
        }

    assert state() == recompute()
    # w flips cross the σ in BOTH directions; one crossing removes a
    # value's LAST in-σ support row (the count must drop), another
    # brings a previously-excluded value in (the count must rise)
    t.merge(spark, _b(spark, [
        ("U", 1, 5, "a", 10, "q"),   # leaves σ; v=10 still backed by k3? no — k3 has v=20; 'a' loses 10
        ("U", 2, 5, "a", 10, "x"),   # enters σ; restores 10's support
        ("U", 3, 5, "a", 20, "q"),   # leaves σ; 'a' loses 20 entirely
        ("I", 9, 5, "b", 77, "x"),   # new in-σ value for 'b'
        ("D", 6, 5, None, None, None),
    ]))
    mv.refresh(spark, t)
    assert state() == recompute()
    assert state()["a"] == (1, 1)   # only k2 (v=10) remains in σ
    # σ drift is refused
    t.merge(spark, _b(spark, [("U", 9, 6, "b", 78, "x")]))
    with pytest.raises(ValueError, match="where"):
        MaintainedDistinctAggregate(
            tmp_path / "mv", ["g"], {"n_v": "v"},
        ).refresh(spark, t)
