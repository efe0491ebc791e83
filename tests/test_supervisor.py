"""Self-healing stream supervision (streaming/supervisor.py).

The round-7/8 frontier item: a DDL barrier landing WHILE a commit-log
stream runs kills the query with SchemaEvolvedError by design; the
supervisor must restart it from the SAME checkpoint against the evolved
manifest with no manual intervention and no re-seed (reference:
increment.go:283-329 rides DDL in-loop; cmd/core.go:258-291 isolates
per-table failures).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.operators.matview import MaintainedAggregate
from tidb2dw_spark.schema.diff import diff_columns
from tidb2dw_spark.schema.evolve import apply_column_diffs
from tidb2dw_spark.schema.table_def import TableCol
from tidb2dw_spark.streaming.cdf_source import SchemaEvolvedError
from tidb2dw_spark.streaming.supervisor import (
    StreamSupervisor,
    is_schema_evolved_error,
    supervise_all,
)
from tidb2dw_spark.table.managed import ManagedTable

ENV_I = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "k long, grp string, qty int"
)


def _mk(spark, root):
    t = ManagedTable(root)
    t.create(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
            "k long, grp string, qty int",
        ),
        ["k"], pk_buckets=2, cdf=True,
    )
    return t


def _wait(cond, timeout=180, what=""):
    end = time.time() + timeout
    while time.time() < end:
        if cond():
            return
        time.sleep(0.5)
    raise AssertionError(f"timed out waiting for {what}")


def test_is_schema_evolved_error_classification():
    assert is_schema_evolved_error(SchemaEvolvedError("x"))
    # the cross-JVM surface: class name embedded in the message
    assert is_schema_evolved_error(
        RuntimeError("... tidb2dw_spark.streaming.cdf_source."
                     "SchemaEvolvedError: restart with the SAME checkpoint")
    )
    inner = SchemaEvolvedError("mid-run barrier")
    outer = RuntimeError("query died")
    outer.__cause__ = inner
    assert is_schema_evolved_error(outer)
    assert not is_schema_evolved_error(ValueError("schema mismatch"))


def test_supervisor_heals_mid_run_rename_and_widening(spark, tmp_path):
    """RENAME and then a widening MODIFY land WHILE the stream runs; the
    supervisor restarts from the same checkpoint each time, the
    maintained aggregate drains to the exact recompute, and nothing
    re-seeds (applied_seq only ever advances)."""
    t = _mk(spark, tmp_path / "t")
    t.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 5, 1, "a", 11), ("I", "t", "s", 5, 9, "c", 90)],
        ENV_I,
    ))
    mv = MaintainedAggregate(tmp_path / "mv", ["grp"], {"total": "qty"})
    sup = StreamSupervisor(
        spark, t, mv, tmp_path / "ckpt", processing_interval="1 second"
    )
    sup.start()
    try:
        _wait(
            lambda: mv.exists()
            and mv.meta()["applied_seq"] == t.manifest()["cdf_seq"],
            what="initial catch-up",
        )
        seeded_seq = mv.meta()["applied_seq"]

        # ---- RENAME grp -> category lands while the stream is live
        v1 = [
            TableCol(id="1", name="k", tp="bigint", is_pk="true"),
            TableCol(id="2", name="grp", tp="varchar", precision="10"),
            TableCol(id="3", name="qty", tp="int"),
        ]
        v2 = [v1[0], TableCol(id="2", name="category", tp="varchar",
                              precision="10"), v1[2]]
        apply_column_diffs(spark, t, diff_columns(v1, v2))
        env_r = ENV_I.replace("grp", "category")
        t.merge(spark, spark.createDataFrame(
            [("U", "t", "s", 6, 2, "b", 21)], env_r
        ))
        _wait(
            lambda: mv.meta()["applied_seq"] == t.manifest()["cdf_seq"],
            what="heal after rename",
        )
        assert sup.restarts >= 1, "rename barrier did not exercise the heal"
        heals_after_rename = sup.restarts

        # ---- widening qty int -> bigint lands while the stream is live
        v3 = [v1[0], v2[1], TableCol(id="4", name="qty", tp="bigint")]
        apply_column_diffs(spark, t, diff_columns(v2, v3))
        t.merge(spark, spark.createDataFrame(
            [("U", "t", "s", 7, 3, "b", 9_999_999_999)],
            env_r.replace("qty int", "qty long"),
        ))
        _wait(
            lambda: mv.meta()["applied_seq"] == t.manifest()["cdf_seq"],
            what="heal after widening",
        )
        assert sup.restarts > heals_after_rename
        assert mv.meta()["applied_seq"] >= seeded_seq  # no re-seed
    finally:
        stats = sup.stop()
    assert stats["restarts"] >= 2

    got = {
        (r["grp"], r["total"], r["n_rows"])
        for r in mv.read(spark).collect()
    }
    want = {
        (r["category"], r["total"], r["n_rows"])
        for r in t.read(spark)
        .groupBy("category")
        .agg(
            F.coalesce(F.sum("qty"), F.lit(0)).alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert got == want


def test_drain_mode_rides_pre_start_barriers_without_restart(spark, tmp_path):
    """Drain mode: barriers landing BETWEEN drains are pre-start
    barriers — they conform by field id with zero restarts (the heal
    path is only for genuinely mid-run DDL)."""
    t = _mk(spark, tmp_path / "t")
    t.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 5, 1, "a", 11)], ENV_I
    ))
    mv = MaintainedAggregate(tmp_path / "mv", ["grp"], {"total": "qty"})
    sup = StreamSupervisor(spark, t, mv, tmp_path / "ckpt")
    out = sup.drain()
    assert out["restarts"] == 0 and out["drains"] >= 1
    assert mv.meta()["applied_seq"] == t.manifest()["cdf_seq"]

    v1 = [
        TableCol(id="1", name="k", tp="bigint", is_pk="true"),
        TableCol(id="2", name="grp", tp="varchar", precision="10"),
        TableCol(id="3", name="qty", tp="int"),
    ]
    v2 = [v1[0], TableCol(id="2", name="category", tp="varchar",
                          precision="10"), v1[2]]
    apply_column_diffs(spark, t, diff_columns(v1, v2))
    t.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 6, 2, "b", 21)],
        ENV_I.replace("grp", "category"),
    ))
    out2 = sup.drain()
    assert out2["restarts"] == 0
    assert mv.meta()["applied_seq"] == t.manifest()["cdf_seq"]
    got = {
        (r["grp"], r["total"]) for r in mv.read(spark).collect()
    }
    want = {
        (r["category"], r["total"])
        for r in t.read(spark)
        .groupBy("category")
        .agg(F.coalesce(F.sum("qty"), F.lit(0)).alias("total"))
        .collect()
    }
    assert got == want


def test_drain_restart_budget_is_bounded(spark, tmp_path, monkeypatch):
    """An evolution-error storm (e.g. a checkpoint aimed at the wrong
    table) must surface after max_restarts instead of looping forever."""
    from tidb2dw_spark.streaming import supervisor as sup_mod

    t = _mk(spark, tmp_path / "t")
    mv = MaintainedAggregate(tmp_path / "mv", ["grp"], {"total": "qty"})

    calls = []

    def always_evolved(*a, **k):
        calls.append(1)
        raise SchemaEvolvedError("synthetic storm")

    monkeypatch.setattr(sup_mod, "stream_derived_refresh", always_evolved)
    sup = StreamSupervisor(spark, t, mv, tmp_path / "ckpt", max_restarts=3)
    with pytest.raises(SchemaEvolvedError):
        sup.drain()
    assert len(calls) == 4  # the initial try + 3 budgeted heals
    assert sup.restarts == 4  # the 4th failure breaches the budget


def test_supervise_all_isolates_per_table_failures(spark, tmp_path):
    """One table's terminal failure (no CDF) is collected as a string;
    the healthy table drains to quiescence regardless — the reference's
    per-table isolation contract."""
    good = _mk(spark, tmp_path / "good")
    good.merge(spark, spark.createDataFrame(
        [("U", "t", "s", 5, 1, "a", 11)], ENV_I
    ))
    bad = ManagedTable(tmp_path / "bad")
    bad.create(
        spark.createDataFrame([(1, "a", 10)], "k long, grp string, qty int"),
        ["k"], pk_buckets=2, cdf=False,   # no feed -> terminal plan error
    )
    mv_g = MaintainedAggregate(tmp_path / "mv_g", ["grp"], {"total": "qty"})
    mv_b = MaintainedAggregate(tmp_path / "mv_b", ["grp"], {"total": "qty"})
    sups = [
        StreamSupervisor(spark, good, mv_g, tmp_path / "ck_g", name="good"),
        StreamSupervisor(spark, bad, mv_b, tmp_path / "ck_b", name="bad"),
    ]
    results = supervise_all(sups)
    assert results["good"] is None
    assert results["bad"] is not None and "change data feed" in results["bad"]
    assert mv_g.meta()["applied_seq"] == good.manifest()["cdf_seq"]


def test_supervisor_continuous_soak_under_concurrent_churn(spark, tmp_path):
    """SOAK of the unattended loop (reference: increment.go:373-390 —
    the poll loop nobody babysits): a continuous-mode supervisor runs
    for minutes while a WRITER THREAD lands a steady stream of merges
    with THREE live DDL barriers interleaved (RENAME, widening MODIFY,
    RENAME back) — barriers land between merges with the query live, so
    each must surface mid-run and heal from the same checkpoint.
    Asserts: the writer never errored, ≥2 heals actually happened,
    restarts stayed within budget, the supervisor stayed healthy, the
    view caught up to the final seq with no re-seed, and the maintained
    state equals a from-scratch recompute of the churned table."""
    import threading

    t = _mk(spark, tmp_path / "t")
    mv = MaintainedAggregate(tmp_path / "mv", ["grp"], {"total": "qty"})
    sup = StreamSupervisor(
        spark, t, mv, tmp_path / "ckpt",
        processing_interval="1 second", max_restarts=8,
    )
    v1 = [
        TableCol(id="1", name="k", tp="bigint", is_pk="true"),
        TableCol(id="2", name="grp", tp="varchar", precision="10"),
        TableCol(id="3", name="qty", tp="int"),
    ]
    v2 = [v1[0], TableCol(id="2", name="category", tp="varchar",
                          precision="10"), v1[2]]
    v3 = [v1[0], v2[1], TableCol(id="4", name="qty", tp="bigint")]
    v4 = [v1[0], TableCol(id="2", name="grp", tp="varchar",
                          precision="10"), v3[2]]
    env_r = ENV_I.replace("grp", "category")
    env_w = env_r.replace("qty int", "qty long")
    env_b = ENV_I.replace("qty int", "qty long")
    pump_errors: list[BaseException] = []

    def merge_rows(env, rows):
        t.merge(spark, spark.createDataFrame(rows, env))

    def pump():
        try:
            k = 100
            for i in range(6):  # steady pre-barrier churn
                merge_rows(ENV_I, [("I", "t", "s", 5, k + i,
                                    "ab"[i % 2], 7 + i)])
                time.sleep(0.4)
            apply_column_diffs(spark, t, diff_columns(v1, v2))  # barrier 1
            for i in range(6):
                merge_rows(env_r, [("U", "t", "s", 6, 100 + i,
                                    "c", 50 + i)])
                time.sleep(0.4)
            apply_column_diffs(spark, t, diff_columns(v2, v3))  # barrier 2
            for i in range(6):
                merge_rows(env_w, [("I", "t", "s", 7, 200 + i, "d",
                                    9_999_999_990 + i)])
                time.sleep(0.4)
            apply_column_diffs(spark, t, diff_columns(v3, v4))  # barrier 3
            for i in range(6):
                merge_rows(env_b, [("D", "t", "s", 8, 100 + i, None, None)]
                           if i % 2 else
                           [("U", "t", "s", 8, 200 + i, "e", 3 + i)])
                time.sleep(0.4)
        except BaseException as e:  # noqa: BLE001 — surfaced to the test
            pump_errors.append(e)

    sup.start()
    try:
        writer = threading.Thread(target=pump, daemon=True)
        writer.start()
        writer.join(timeout=300)
        assert not writer.is_alive(), "writer thread hung"
        assert not pump_errors, pump_errors
        assert sup.healthy(), sup.error
        _wait(
            lambda: mv.exists()
            and mv.meta()["applied_seq"] == t.manifest()["cdf_seq"],
            what="post-soak catch-up",
        )
    finally:
        stats = sup.stop()
    # ≥2 of the 3 barriers must have landed mid-run (a barrier falling
    # exactly between micro-batches can conform without a restart, but
    # with 1s triggers and 0.4s merge cadence not all three can)
    assert 2 <= stats["restarts"] <= 8, stats
    got = {
        (r["grp"], r["total"], r["n_rows"])
        for r in mv.read(spark).collect()
    }
    want = {
        (r["grp"], r["total"], r["n_rows"])
        for r in t.read(spark)
        .groupBy("grp")
        .agg(
            F.coalesce(F.sum("qty"), F.lit(0)).alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert got == want


def test_quantile_histogram_rides_supervised_stream(spark, tmp_path):
    """MaintainedQuantileHistogram speaks the derived protocol
    (exists/meta/refresh), so it rides the supervised commit-log stream
    like any maintained object — including a delete-bearing commit
    (the histogram's signed fold needs no recount) and a live RENAME
    barrier healed mid-run."""
    from tidb2dw_spark.operators.sketch import MaintainedQuantileHistogram

    t = _mk(spark, tmp_path / "t")
    qh = MaintainedQuantileHistogram(tmp_path / "qh", ["grp"], "qty",
                                     bin_width=10)
    sup = StreamSupervisor(spark, t, qh, tmp_path / "ckpt")
    t.merge(spark, spark.createDataFrame(
        [("I", "t", "s", 5, 9, "b", 95), ("D", "t", "s", 5, 1, None, None)],
        ENV_I,
    ))
    out = sup.drain()
    assert out["drains"] >= 1
    assert qh.meta()["applied_seq"] == t.manifest()["cdf_seq"]
    ref = MaintainedQuantileHistogram(tmp_path / "ref", ["grp"], "qty",
                                      bin_width=10)
    ref.refresh(spark, t)
    key = lambda df: sorted(  # noqa: E731
        (r["grp"], r["__bin"], r["n_rows"]) for r in df.collect()
    )
    assert key(qh.read(spark)) == key(ref.read(spark))
