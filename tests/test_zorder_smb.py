"""Z-order clustering (multi-column zone-map pruning) and bucketed
co-located joins — the two layout-level scale levers.

Correctness of both registered queries is covered by test_oracle_parity;
these tests assert the SCALE properties: z-order prunes files on every
clustered column (and beats a lexicographic sort on the trailing column),
and a join between co-bucketed tables runs with zero exchanges.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.entry_analytics import _bucketed_tables
from tidb2dw_spark.table.managed import ManagedTable
from tidb2dw_spark.table.zorder import quantile_boundaries, zorder_value


def _grid_df(spark, n=64):
    """Deterministic n×n grid of (x, y) points — every (x, y) cell once."""
    return (
        spark.range(n * n)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
    )


def _files_of(table: ManagedTable) -> int:
    m = table.manifest()
    vdir = table.root / f"v={m['version']}"
    return sum(1 for _ in vdir.rglob("*.parquet"))


def _kept_files(df) -> int:
    return len(df.inputFiles())


@pytest.fixture(scope="module")
def grid_tables(spark):
    """The same grid clustered two ways: z-order vs lexicographic (x, y)."""
    out = {}
    for mode in ("zorder", "lex"):
        t = ManagedTable(tempfile.mkdtemp(prefix=f"t2dw_{mode}_") + "/grid")
        t.create(_grid_df(spark), pk_cols=["pk"])
        t.cluster_by(
            spark, ["x", "y"], target_bytes=2 << 10,
            zorder=(mode == "zorder"), zorder_bits=6,
        )
        t.analyze(spark, ["x", "y"])
        out[mode] = t
    return out


def test_zorder_value_is_morton_interleave(spark):
    # boundaries at every integer ⇒ cell == value; z of (x, y) must be the
    # exact bit interleave with x owning the higher bit of each pair
    df = _grid_df(spark, n=8)
    bounds = {"x": [float(i) for i in range(1, 8)], "y": [float(i) for i in range(1, 8)]}
    rows = df.select("x", "y", zorder_value(df, ["x", "y"], bounds, bits=3)).collect()
    for r in rows:
        expect = 0
        for b in range(3):
            expect |= ((int(r["x"]) >> b & 1) << (2 * b + 1)) | (int(r["y"]) >> b & 1) << (2 * b)
        assert r["__zvalue"] == expect, (r["x"], r["y"], r["__zvalue"], expect)


def test_quantile_boundaries_shapes(spark):
    df = _grid_df(spark)
    b = quantile_boundaries(df, ["x", "y"], bits=4)
    assert set(b) == {"x", "y"} and all(len(v) == 15 for v in b.values())
    assert b["x"] == sorted(b["x"])


def test_zorder_rejects_string_columns(spark):
    df = _grid_df(spark).withColumn("s", F.lit("a"))
    with pytest.raises(ValueError, match="non-rangeable"):
        quantile_boundaries(df, ["s"], bits=3)


def test_multi_range_correct_and_pruned(spark, grid_tables):
    t = grid_tables["zorder"]
    total = _files_of(t)
    assert total >= 8, "grid did not split into enough files to show pruning"
    got = t.read_multi_range(spark, {"x": (0, 7), "y": (0, 7)})
    # exact result: the 8×8 corner
    assert got.count() == 64
    assert got.agg(F.max("x"), F.max("y")).first() == (7, 7)
    assert _kept_files(got) < total / 2


def test_zorder_prunes_trailing_column_lex_cannot(spark, grid_tables):
    """The design point: a y-only range prunes files on the z-ordered
    layout but keeps (nearly) every file on the lexicographic (x, y) sort,
    whose zones span the full y domain."""
    zt, lt = grid_tables["zorder"], grid_tables["lex"]
    z_kept = _kept_files(zt.read_multi_range(spark, {"y": (0, 7)}))
    l_kept = _kept_files(lt.read_multi_range(spark, {"y": (0, 7)}))
    # a y-range selects Morton runs spread across the curve, so the skip
    # ratio is softer than for the leading column — but it must skip a
    # meaningful share of files, which the lexicographic layout cannot
    assert z_kept <= 0.6 * _files_of(zt)
    assert z_kept < l_kept
    assert l_kept >= 0.9 * _files_of(lt)
    # and the leading column prunes on BOTH layouts
    assert _kept_files(lt.read_multi_range(spark, {"x": (0, 7)})) < _files_of(lt) / 2


def test_multi_range_empty_intersection(spark, grid_tables):
    t = grid_tables["zorder"]
    got = t.read_multi_range(spark, {"x": (1000, 2000)})
    assert got.count() == 0


def test_multi_range_falls_back_without_stats(spark):
    t = ManagedTable(tempfile.mkdtemp(prefix="t2dw_nostat_") + "/grid")
    t.create(_grid_df(spark, n=16), pk_cols=["pk"])
    got = t.read_multi_range(spark, {"x": (0, 3), "y": (0, 3)})
    assert got.count() == 16  # correct, just unpruned


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    on, ln = _bucketed_tables(spark, sf_dir)
    o = spark.table(on).select("o_orderkey", "o_orderpriority")
    li = spark.table(ln)
    joined = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # sortBy at write time also pre-sorts the buckets: the SMJ needs no
    # per-task Sort of the big side beyond what the bucket files provide
    n = joined.count()
    assert n == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
