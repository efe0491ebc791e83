"""IvfVectorIndex: ANN index as derived state (operators/ann_index.py).

The maintained-index invariant under test: after ANY sequence of CDC
merges (inserts, vector-moving updates, deletes), the index CONTENTS
equal ``build()`` on the current table state with the SAME frozen
centroids — which implies every probe result equals a from-scratch
rebuild's.  Centroid freezing is what makes that exact (assignment is a
pure function of vector × centroids).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb2dw_spark.operators.ann_index import IvfVectorIndex
from tidb2dw_spark.table.managed import ManagedTable

DIM = 8
SCHEMA = "vec_id long, embedding array<float>"
ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "vec_id long, embedding array<float>"
)


def _vec(i: int, bump: int = 0) -> list[float]:
    return [float((i * 7 + j * 3 + bump) % 13 - 6) for j in range(DIM)]


def _mk(spark, tmp_path, n=60):
    t = ManagedTable(tmp_path / "emb")
    t.create(
        spark.createDataFrame([(i, _vec(i)) for i in range(n)], SCHEMA),
        pk_cols=["vec_id"], pk_buckets=4, cdf=True,
    )
    return t


def _batch(spark, events):
    """events: (flag, vec_id, ts, vec-or-None)."""
    return spark.createDataFrame(
        [(f, "t", "s", ts, k, v) for f, k, ts, v in events], ENV
    )


def _contents(spark, ix: IvfVectorIndex) -> set:
    m = ix._load_meta()
    rows = ix._read_cells(spark, m, range(len(m["centroids"])))
    if rows is None:
        return set()
    return {
        (r["neighbor_id"], tuple(r["qv"]), r["cell"]) for r in rows.collect()
    }


def _rebuilt(spark, tmp_path, t, ix: IvfVectorIndex, name: str) -> IvfVectorIndex:
    """From-scratch index over t's CURRENT state with ix's centroids."""
    fresh = IvfVectorIndex(
        tmp_path / name, id_col="vec_id", vec_col="embedding",
        n_centroids=ix.n_centroids,
    )
    fresh.build(spark, t, centroids=ix._load_meta()["centroids"])
    return fresh


def _topk(spark, ix, queries, k=3, n_probe=2):
    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["score"], 9))
        for r in ix.topk(spark, queries, k=k, n_probe=n_probe).collect()
    )


def test_refresh_equals_rebuild_through_churn(spark, tmp_path):
    """Insert + vector-moving update + delete, refreshed per merge; at
    every step contents == rebuild-with-same-centroids, and a probe over
    the surviving corpus returns identical top-k."""
    t = _mk(spark, tmp_path)
    ix = IvfVectorIndex(
        tmp_path / "ivf", id_col="vec_id", vec_col="embedding", n_centroids=4
    )
    ix.build(spark, t)
    assert _contents(spark, ix) == _contents(
        spark, _rebuilt(spark, tmp_path, t, ix, "rb0")
    )
    # churn: new ids, moved vectors (bump changes the cell), deletes
    t.merge(spark, _batch(spark, [
        ("I", 100 + i, 5, _vec(100 + i)) for i in range(6)
    ]))
    ix.refresh(spark, t)
    t.merge(spark, _batch(spark, [
        ("U", i, 6, _vec(i, bump=7)) for i in range(0, 20, 3)
    ] + [
        # ts 7: the id-9 overlap with the updates resolves to the DELETE
        ("D", i, 7, None) for i in range(1, 20, 4)
    ]))
    ix.refresh(spark, t)
    assert _contents(spark, ix) == _contents(
        spark, _rebuilt(spark, tmp_path, t, ix, "rb1")
    )
    queries = t.read(spark).filter(F.col("vec_id") % 10 == 0)
    fresh = _rebuilt(spark, tmp_path, t, ix, "rb2")
    assert _topk(spark, ix, queries) == _topk(spark, fresh, queries)
    # deleted ids are really gone from the index
    gone = {r[0] for r in _contents(spark, ix)}
    assert not gone & set(range(1, 20, 4))


def test_one_refresh_spans_multi_change_ids(spark, tmp_path):
    """An id updated twice then deleted across three commits, folded by
    ONE refresh: no stale intermediate entry may survive (the removal
    side covers every preimage cell, the addition side only the final
    image)."""
    t = _mk(spark, tmp_path, n=20)
    ix = IvfVectorIndex(
        tmp_path / "ivf", id_col="vec_id", vec_col="embedding", n_centroids=4
    )
    ix.build(spark, t)
    t.merge(spark, _batch(spark, [("U", 3, 5, _vec(3, bump=1))]))
    t.merge(spark, _batch(spark, [("U", 3, 6, _vec(3, bump=9))]))
    t.merge(spark, _batch(spark, [("D", 3, 7, None), ("I", 50, 7, _vec(50))]))
    ix.refresh(spark, t)  # ONE slice spanning all three commits
    assert _contents(spark, ix) == _contents(
        spark, _rebuilt(spark, tmp_path, t, ix, "rb")
    )
    ids = {r[0] for r in _contents(spark, ix)}
    assert 3 not in ids and 50 in ids


def test_replicator_derived_protocol_poll_cadence(spark, tmp_path):
    """The exact duck-typed hook TableReplicator.consume_increments runs
    per poll (build-or-refresh seeding), driven by engine-originated DML
    between polls — delete_where/update_where land in the same CDF the
    CSV consumer's merges do, so this is the poll loop minus the CSV
    staging (TiDB has no array columns, so an embedding table cannot
    arrive via the changelog CSVs; it reaches the warehouse as a derived
    / source-attached table instead)."""
    t = _mk(spark, tmp_path, n=30)
    ix = IvfVectorIndex(
        tmp_path / "ivf", id_col="vec_id", vec_col="embedding", n_centroids=4
    )

    def poll():
        # verbatim shape of replicate.py's derived-state hook
        if not ix.exists() and hasattr(ix, "build"):
            ix.build(spark, t)
        else:
            ix.refresh(spark, t)

    poll()  # seed
    t.delete_where(spark, F.col("vec_id") % 7 == 0)
    t.update_where(
        spark,
        F.col("vec_id") % 5 == 1,
        {"embedding": F.transform("embedding", lambda x: -x)},
    )
    poll()  # steady-state refresh
    assert _contents(spark, ix) == _contents(
        spark, _rebuilt(spark, tmp_path, t, ix, "rb")
    )
    # a crash between merge and refresh self-repairs: refresh again is a
    # no-op (idempotent slice fold)
    before = _contents(spark, ix)
    poll()
    assert _contents(spark, ix) == before


def test_null_embeddings_not_indexed(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10)
    ix = IvfVectorIndex(
        tmp_path / "ivf", id_col="vec_id", vec_col="embedding", n_centroids=2
    )
    ix.build(spark, t)
    # NULL insert never lands; value->NULL update leaves the index
    t.merge(spark, _batch(spark, [("I", 90, 5, None), ("U", 2, 5, None)]))
    ix.refresh(spark, t)
    ids = {r[0] for r in _contents(spark, ix)}
    assert 90 not in ids and 2 not in ids
    assert _contents(spark, ix) == _contents(
        spark, _rebuilt(spark, tmp_path, t, ix, "rb")
    )


def _pq_contents(spark, ix) -> set:
    m = ix._load_meta()
    rows = ix._read_cells(spark, m, range(len(m["centroids"])))
    if rows is None:
        return set()
    return {
        (r["neighbor_id"], tuple(r["codes"]), r["cell"]) for r in rows.collect()
    }


def test_pq_refresh_equals_rebuild_through_churn(spark, tmp_path):
    """IvfPqVectorIndex: same maintenance invariant as the raw IVF index
    — after churn, the maintained CODES equal a from-scratch build over
    the current state with the SAME frozen centroids AND codebooks, and
    ADC top-k matches the rebuild's.  Codebook freezing is what makes
    this exact (encoding is a pure function of vector × frozen params)."""
    from tidb2dw_spark.operators.ann_index import IvfPqVectorIndex

    t = _mk(spark, tmp_path)
    ix = IvfPqVectorIndex(
        tmp_path / "ivfpq", id_col="vec_id", vec_col="embedding",
        n_centroids=4, n_sub=2, k_codes=8, iters=1, residual=True,
    )
    ix.build(spark, t)
    t.merge(spark, _batch(spark, [
        ("I", 100 + i, 5, _vec(100 + i)) for i in range(6)
    ] ))
    t.merge(spark, _batch(spark, [
        ("U", i, 6, _vec(i, bump=7)) for i in range(0, 20, 3)
    ] + [
        ("D", i, 7, None) for i in range(1, 20, 4)
    ]))
    ix.refresh(spark, t)  # one slice spanning both commits
    m = ix._load_meta()
    fresh = IvfPqVectorIndex(
        tmp_path / "rbpq", id_col="vec_id", vec_col="embedding",
        n_centroids=4, n_sub=2, k_codes=8, iters=1, residual=True,
    )
    # pin BOTH frozen parameter sets to the maintained index's
    fresh.build(spark, t, centroids=m["centroids"])
    fm = fresh.meta()
    fm["codebooks"] = m["codebooks"]
    fresh._commit(fm)
    # re-encode fresh under the pinned codebooks for a fair comparison:
    # codebooks retrained on the churned state may differ, so rebuild
    # the payload with the maintained params instead
    src_df = t.read(spark).filter(F.col("embedding").isNotNull())
    from tidb2dw_spark.functions.similarity import _assign_cells

    assigned = _assign_cells(
        src_df, m["centroids"], "vec_id", "embedding", "arrow"
    )
    fresh._encode(assigned, m).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(str(fresh.root / "v=1"))
    assert _pq_contents(spark, ix) == _pq_contents(spark, fresh)
    ids = {r[0] for r in _pq_contents(spark, ix)}
    assert not ids & set(range(1, 20, 4)) and 100 in ids
    queries = t.read(spark).filter(F.col("vec_id") % 10 == 0)
    def tk(i):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["dist"])
            for r in i.topk(spark, queries, k=3, n_probe=2).collect()
        )
    assert tk(ix) == tk(fresh)


def test_drift_monitor_flips_on_distribution_shift(spark, tmp_path):
    """Round-7 task: the index meta tracks cell-size skew + assignment
    -distance drift vs build-time baselines; a distribution-shifted
    churn (every updated vector collapses toward one far-off direction)
    flips needs_rebuild() — while maintenance itself STAYS exact
    (contents still equal rebuild-with-same-centroids, the recall-blind
    oracle invariant)."""
    t = _mk(spark, tmp_path, n=80)
    ix = IvfVectorIndex(
        tmp_path / "ivf", id_col="vec_id", vec_col="embedding", n_centroids=4
    )
    ix.build(spark, t)
    s0 = ix.drift_stats()
    assert s0 and s0["churn_ratio"] == 0.0 and s0["skew_factor"] == 1.0
    assert abs(s0["assign_sim_drop"]) < 1e-9
    assert not ix.needs_rebuild()
    g0 = ix.health_gauges()
    assert g0["needs_rebuild"] == 0.0

    # distribution shift: move most of the corpus onto ONE far-off
    # direction none of the frozen centroids represents — the shifted
    # vectors all hash to the same nearest cell (skew) and sit far from
    # its centroid (assignment-sim drop)
    far = [1000.0] * DIM
    t.merge(spark, _batch(spark, [
        ("U", i, 9, [v + f for v, f in zip(_vec(i), far)])
        for i in range(0, 80, 2)
    ]))
    ix.refresh(spark, t)
    s1 = ix.drift_stats()
    assert s1["cell_max_share"] > s0["cell_max_share"]
    assert s1["assign_sim_drop"] > 0.01
    assert s1["churn_ratio"] > 0.9  # 40 removals + 40 additions / 80
    assert ix.needs_rebuild()
    assert ix.health_gauges()["needs_rebuild"] == 1.0
    # exactness is untouched by the monitor: maintained == rebuilt
    assert _contents(spark, ix) == _contents(
        spark, _rebuilt(spark, tmp_path, t, ix, "rb_drift")
    )


def test_drift_gauges_ride_replicator_registry(spark, tmp_path):
    """The drift gauges surface through TableReplicator's metrics
    registry as derived_<class>_<gauge> — needs_rebuild is alertable
    without touching the index."""
    from tidb2dw_spark.operators.ann_index import IvfVectorIndex as IVI

    t = _mk(spark, tmp_path, n=40)
    ix = IVI(tmp_path / "ivf", id_col="vec_id", vec_col="embedding",
             n_centroids=4)
    ix.build(spark, t)

    class _Reg:
        def __init__(self):
            self.gauges = {}

        def add(self, *a, **k):
            pass

        def set_gauge(self, fqn, name, val):
            self.gauges[name] = val

        def set_stage(self, *a, **k):
            pass

    reg = _Reg()
    # drive the replicator's derived-upkeep block directly (the poll
    # loop's fixture surface is exercised elsewhere; here the contract
    # is gauge naming + propagation)
    import time as _t
    t0 = _t.monotonic()
    ix.refresh(spark, t)
    kind = type(ix).__name__.lower()
    reg.add("fqn", f"derived_{kind}_seconds", _t.monotonic() - t0)
    gauges = getattr(ix, "health_gauges", None)
    assert callable(gauges)
    for gname, gval in gauges().items():
        reg.set_gauge("fqn", f"derived_{kind}_{gname}", round(gval, 6))
    assert f"derived_{kind}_needs_rebuild" in reg.gauges
    assert f"derived_{kind}_skew_factor" in reg.gauges


def test_auto_rebuild_closes_the_drift_loop(spark, tmp_path):
    """auto_rebuild=True turns the drift signal into self-repair on the
    poll loop: the trip re-trains centroids IN the poll, the fresh
    baseline un-trips the signal (bounded — one build per trip), and
    subsequent maintenance is exact under the new centroids."""
    t = _mk(spark, tmp_path, n=80)
    ix = IvfVectorIndex(
        tmp_path / "ivf", id_col="vec_id", vec_col="embedding",
        n_centroids=4, auto_rebuild=True,
    )

    def poll() -> bool:
        # verbatim shape of replicate.py's derived hook incl. the
        # opt-in self-repair branch
        if not ix.exists() and hasattr(ix, "build"):
            ix.build(spark, t)
        else:
            ix.refresh(spark, t)
        if (
            getattr(ix, "auto_rebuild", False)
            and callable(getattr(ix, "needs_rebuild", None))
            and hasattr(ix, "build")
            and ix.needs_rebuild()
        ):
            ix.build(spark, t)
            return True
        return False

    assert poll() is False  # seed: fresh baseline, no drift

    far = [1000.0] * DIM
    t.merge(spark, _batch(spark, [
        ("U", i, 9, [v + f for v, f in zip(_vec(i), far)])
        for i in range(0, 80, 2)
    ]))
    assert poll() is True  # drift tripped → rebuilt within the poll
    assert not ix.needs_rebuild()  # new baseline un-trips
    s = ix.drift_stats()
    assert s["churn_ratio"] == 0.0 and s["skew_factor"] == 1.0

    # steady state under the NEW centroids: normal churn refreshes
    # exactly and does not re-trip
    t.merge(spark, _batch(spark, [
        ("U", 1, 11, _vec(1, bump=2)),
        ("D", 4, 11, None),
        ("I", 99, 11, _vec(99)),
    ]))
    assert poll() is False
    assert _contents(spark, ix) == _contents(
        spark, _rebuilt(spark, tmp_path, t, ix, "rb_auto")
    )

def test_auto_sized_cells_rescale_on_growth(spark, tmp_path):
    """n_centroids=None (the default) sizes cells to max(16, ceil(√N))
    at every build: the drift monitor's cell_growth_factor gauge tracks
    the corpus outgrowing the layout, needs_rebuild trips on it (auto
    indexes only), and the rebuild the trip schedules RESCALES cells —
    killing the fixed-cell-count super-linear serving path SCALE.md
    measured.  A pinned index surfaces the gauge but never trips on
    growth alone (explicit layout = operator's choice)."""
    from tidb2dw_spark.functions.similarity import auto_n_centroids

    # integer-exact ceil(sqrt) with the 16-cell floor
    assert auto_n_centroids(0) == 16
    assert auto_n_centroids(256) == 16
    assert auto_n_centroids(257) == 17
    assert auto_n_centroids(1_000_000) == 1000
    assert auto_n_centroids(1_000_001) == 1001

    t = _mk(spark, tmp_path, n=60)
    ix = IvfVectorIndex(
        tmp_path / "ivf", id_col="vec_id", vec_col="embedding",
        auto_rebuild=True,
    )
    ix.build(spark, t)
    m = ix.meta()
    assert m["n_centroids"] == 16 and m["auto_cells"] is True
    assert len(m["centroids"]) == 16
    assert ix.drift_stats()["cell_growth_factor"] <= 1.0

    # grow 20×: the corpus outgrows the 16-cell layout
    t.merge(spark, _batch(spark, [
        ("I", 10_000 + i, 5, _vec(10_000 + i)) for i in range(1140)
    ]))
    ix.refresh(spark, t)
    s = ix.drift_stats()
    assert s["cur_n"] == 1200.0
    assert s["cell_growth_factor"] >= 2.0
    # the GROWTH trigger alone trips (other thresholds parked at ∞)
    assert ix.needs_rebuild(
        skew_factor=1e9, sim_drop=1e9, churn_ratio=1e9, cell_growth=2.0
    )

    # the rebuild rescales: 1200 rows → ceil(√1200) = 35 cells
    ix.build(spark, t)
    m2 = ix.meta()
    assert m2["n_centroids"] == auto_n_centroids(1200) == 35
    assert len(m2["centroids"]) == 35
    assert not ix.needs_rebuild()  # fresh baseline, factor ≈ 1

    # maintenance stays exact under the rescaled layout
    t.merge(spark, _batch(spark, [
        ("U", 2, 21, _vec(2, bump=3)),
        ("D", 6, 21, None),
        ("I", 20_000, 21, _vec(20_000)),
    ]))
    ix.refresh(spark, t)
    assert _contents(spark, ix) == _contents(
        spark, _rebuilt(spark, tmp_path, t, ix, "rb_auto_scale")
    )

    # a PINNED index surfaces the gauge but never trips on growth alone
    pinned = IvfVectorIndex(
        tmp_path / "pin", id_col="vec_id", vec_col="embedding",
        n_centroids=16,
    )
    pinned.build(spark, t)
    sp = pinned.drift_stats()
    assert sp["cell_growth_factor"] >= 2.0
    assert pinned.meta()["auto_cells"] is False
    assert not pinned.needs_rebuild(
        skew_factor=1e9, sim_drop=1e9, churn_ratio=1e9, cell_growth=2.0
    )


def test_pq_subclass_inherits_auto_sizing(spark, tmp_path):
    """IvfPqVectorIndex (the compressed layout) inherits the auto
    cell sizing: default constructor auto-sizes at build and records
    auto_cells in the meta."""
    from tidb2dw_spark.operators.ann_index import IvfPqVectorIndex

    t = _mk(spark, tmp_path, n=40)
    ix = IvfPqVectorIndex(
        tmp_path / "pq", id_col="vec_id", vec_col="embedding",
        n_sub=2, k_codes=8, iters=1,
    )
    ix.build(spark, t)
    m = ix.meta()
    assert m["auto_cells"] is True and m["n_centroids"] == 16
    assert "codebooks" in m  # PQ payload still trained


def test_reattach_preserves_pinned_sizing_policy(spark, tmp_path):
    """A fresh DEFAULT-constructed handle over an index built with an
    explicitly pinned cell count adopts the STORED sizing policy on
    attach: needs_rebuild must not trip on cell_growth (the pin is the
    operator's layout choice, and a tripped auto-rebuild would rescale
    it), and a rebuild through the attached handle keeps the pinned
    count.  A handle that explicitly pins keeps pinning; a default
    handle over an auto index stays auto."""
    t = _mk(spark, tmp_path, n=60)
    pinned = IvfVectorIndex(
        tmp_path / "pin", id_col="vec_id", vec_col="embedding",
        n_centroids=16,
    )
    pinned.build(spark, t)

    # grow the corpus well past the 16-cell layout
    t.merge(spark, _batch(spark, [
        ("I", 10_000 + i, 5, _vec(10_000 + i)) for i in range(1140)
    ]))

    attached = IvfVectorIndex(
        tmp_path / "pin", id_col="vec_id", vec_col="embedding",
    )
    attached.refresh(spark, t)
    assert attached.meta()["auto_cells"] is False  # policy survived
    assert attached.drift_stats()["cell_growth_factor"] >= 2.0
    assert not attached.needs_rebuild(
        skew_factor=1e9, sim_drop=1e9, churn_ratio=1e9, cell_growth=2.0
    )
    attached.build(spark, t)  # an explicit rebuild keeps the pin
    assert attached.meta()["n_centroids"] == 16
    assert attached.meta()["auto_cells"] is False

    # and the converse: a default handle over an AUTO index stays auto
    auto = IvfVectorIndex(
        tmp_path / "auto", id_col="vec_id", vec_col="embedding",
    )
    auto.build(spark, t)
    re_auto = IvfVectorIndex(
        tmp_path / "auto", id_col="vec_id", vec_col="embedding",
    )
    re_auto._load_meta()
    assert re_auto._auto_cells is True
    # while an explicitly pinning handle over an auto index pins
    re_pin = IvfVectorIndex(
        tmp_path / "auto", id_col="vec_id", vec_col="embedding",
        n_centroids=len(auto.meta()["centroids"]),
    )
    re_pin._load_meta()
    assert re_pin._auto_cells is False
