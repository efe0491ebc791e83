"""Run every registered query against its DuckDB oracle — pre-verifies the
driver's correctness gate (CORRECTNESS_r{N}.json) locally."""

from __future__ import annotations

import pytest

from tidb2dw_spark.entry_queries import ORACLES, QUERIES

from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        assert_matches_oracle(df, ORACLES[name], sf_dir)
    else:
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops


def test_q17_overcap_sigma_falls_back_semi_join(spark, sf_dir, monkeypatch):
    """Past _Q17_SIGMA_CAP σ-part keys the Q17 serving path stops
    collecting σ driver-side: the index is probed by DISTRIBUTED
    semi-join (lookup_pks_semi — never a giant literal IN over
    p_partkey) and the row stays oracle-green.  The fact probe still
    rides read_for_keys, whose own key collect is READ_PROBE_CAP-bounded
    (at this fixture scale the post-index PK set fits under the cap, so
    the serving plan's semi-join keys side is the capped LocalRelation —
    the index lineage executes exactly once, in the capped collect)."""
    import tidb2dw_spark.entry_pipeline as ep
    from tidb2dw_spark.operators.secondary_index import SecondaryIndex

    want = sorted(
        map(tuple, ep.QUERIES["pipeline_maintained_q17"](spark, sf_dir).collect())
    )
    monkeypatch.setattr(ep, "_Q17_SIGMA_CAP", 1)
    # spy on the broadcast hint: past the cap the σ frame
    # (p_partkey, p_brand) was just declared unbounded, so the serving
    # path must NOT pin a broadcast on it — AQE picks the strategy
    bc_cols: list[set] = []
    real_bc = ep.F.broadcast

    def _spy(df):
        bc_cols.append(set(df.columns))
        return real_bc(df)

    monkeypatch.setattr(ep.F, "broadcast", _spy)
    # spy on the index probe: the over-cap arm must resolve σ→PKs
    # through the distributed semi probe, never via literal lookups
    semi_calls: list[int] = []
    real_semi = SecondaryIndex.lookup_pks_semi

    def _semi_spy(self, spark_, keys_df):
        semi_calls.append(1)
        return real_semi(self, spark_, keys_df)

    monkeypatch.setattr(SecondaryIndex, "lookup_pks_semi", _semi_spy)
    got_df = ep.QUERIES["pipeline_maintained_q17"](spark, sf_dir)
    assert {"p_partkey", "p_brand"} not in bc_cols
    assert semi_calls, "over-cap arm must probe the index via lookup_pks_semi"
    monkeypatch.setattr(ep.F, "broadcast", real_bc)
    assert sorted(map(tuple, got_df.collect())) == want
    from tidb2dw_spark.plans import audit

    plan = audit(got_df).plan
    # the fact probe is a semi-join against the capped key relation
    assert "LeftSemi" in plan
    # and NO fact scan: every lineitem read in the plan is a
    # bucket-pruned read_for_keys path, never the table root
    li_scans = [
        line
        for line in plan.splitlines()
        if "InMemoryFileIndex" in line and "/lineitem/" in line
    ]
    assert li_scans, "expected a bucket-pruned lineitem probe in the plan"
    for line in li_scans:
        assert "__pk_bucket=" in line, line


def test_cdfstream_root_cleans_up_dead_pid_dirs(tmp_path):
    """The per-pid stream roots are garbage once their pid exits:
    _cdfstream_root sweeps dead-pid siblings on first use and registers
    its own root for atexit removal (no dir leak per process)."""
    import os
    from pathlib import Path

    import tidb2dw_spark.entry_pipeline as ep

    dead = Path("/tmp") / "tidb2dw_cdfstream_999999999"  # beyond pid_max
    dead.mkdir(parents=True, exist_ok=True)
    (dead / "marker").write_text("x")
    ep._cdfstream_root._registered = False  # force the first-use sweep
    root = ep._cdfstream_root()
    assert root == Path("/tmp") / f"tidb2dw_cdfstream_{os.getpid()}"
    assert not dead.exists()
    # our own (live) root is never swept by a second call
    root.mkdir(parents=True, exist_ok=True)
    assert ep._cdfstream_root() == root and root.exists()
