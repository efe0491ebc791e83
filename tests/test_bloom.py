"""Per-file bloom filters for equality-probe file skipping.

Zone maps prune ranges on clustered columns; blooms prune point probes on
any file-localized column, no ordering required.  Correctness of the
registered q_bloom_point_lookup is covered by test_oracle_parity; here:
the skip itself, the no-false-negative guarantee, fallbacks, and guards.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.table.managed import ManagedTable


@pytest.fixture(scope="module")
def bloom_table(spark):
    """1000 rows over 50 group keys, clustered so each file holds few
    groups — the locality blooms exploit."""
    df = spark.range(1000).select(
        F.col("id").alias("pk"),
        (F.col("id") % 50).alias("grp"),
        F.concat(F.lit("g"), (F.col("id") % 50).cast("string")).alias("tag"),
    )
    t = ManagedTable(tempfile.mkdtemp(prefix="t2dw_bloom_") + "/t")
    t.create(df, pk_cols=["pk"])
    t.cluster_by(spark, ["grp"], target_bytes=2 << 10)
    t.analyze_bloom(spark, ["grp", "tag"], m_bits=4096)
    return t


def test_bloom_exact_and_pruned(spark, bloom_table):
    t = bloom_table
    total = len(list((t.root / f"v={t.version()}").rglob("*.parquet")))
    assert total >= 6
    got = t.read_eq(spark, "grp", 7)
    assert got.count() == 20
    assert got.agg(F.min("pk"), F.max("pk")).first() == (7, 957)
    assert len(got.inputFiles()) < total / 2


def test_bloom_string_column(spark, bloom_table):
    got = bloom_table.read_eq(spark, "tag", "g13")
    assert got.count() == 20
    assert len(got.inputFiles()) < len(
        list((bloom_table.root / f"v={bloom_table.version()}").rglob("*.parquet"))
    )


def test_bloom_no_false_negatives(spark, bloom_table):
    """Every group must be fully recovered through the pruned read."""
    for g in range(0, 50, 11):
        assert bloom_table.read_eq(spark, "grp", g).count() == 20


def test_bloom_absent_value_reads_nothing_or_empty(spark, bloom_table):
    got = bloom_table.read_eq(spark, "grp", 9999)
    assert got.count() == 0


def test_bloom_stale_after_new_version_falls_back(spark, bloom_table):
    t = ManagedTable(tempfile.mkdtemp(prefix="t2dw_bloomstale_") + "/t")
    df = spark.range(100).select(F.col("id").alias("pk"), (F.col("id") % 5).alias("grp"))
    t.create(df, pk_cols=["pk"])
    t.analyze_bloom(spark, ["grp"])
    t.overwrite(t.read(spark))  # version bump → stats stale
    got = t.read_eq(spark, "grp", 3)
    assert got.count() == 20  # correct via full scan


def test_bloom_rejects_float_and_bucketed(spark):
    t = ManagedTable(tempfile.mkdtemp(prefix="t2dw_bloomrej_") + "/t")
    df = spark.range(10).select(
        F.col("id").alias("pk"), (F.col("id") * 1.5).alias("x")
    )
    t.create(df, pk_cols=["pk"])
    with pytest.raises(ValueError, match="string/integer"):
        t.analyze_bloom(spark, ["x"])
    tb = ManagedTable(tempfile.mkdtemp(prefix="t2dw_bloomrej2_") + "/t")
    tb.create(spark.range(10).select(F.col("id").alias("pk")), ["pk"], pk_buckets=2)
    with pytest.raises(ValueError, match="plain tables"):
        tb.analyze_bloom(spark, ["pk"])


def test_bloom_intersects_with_zone_maps(spark):
    """read_eq uses BOTH pruners: with zone maps analyzed on the same
    clustered column, the kept set is the intersection — never larger
    than either alone."""
    df = spark.range(1000).select(F.col("id").alias("pk"), (F.col("id") % 50).alias("grp"))
    t = ManagedTable(tempfile.mkdtemp(prefix="t2dw_bloomzone_") + "/t")
    t.create(df, pk_cols=["pk"])
    t.cluster_by(spark, ["grp"], target_bytes=2 << 10)
    t.analyze(spark, ["grp"])
    t.analyze_bloom(spark, ["grp"])
    got = t.read_eq(spark, "grp", 25)
    assert got.count() == 20
    zone_only = t.read_range(spark, "grp", 25, 25)
    assert len(got.inputFiles()) <= len(zone_only.inputFiles())


from hypothesis import given, settings, strategies as st


@settings(max_examples=5, deadline=None)
@given(
    vals=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=8, unique=True,
    )
)
def test_bloom_probe_matches_spark_hash_for_any_string(spark, tmp_path_factory, vals):
    """The driver-side probe (hashlib md5 of the utf-8 value) must agree
    with the Spark-side position derivation for arbitrary unicode —
    disagreement would silently false-negative and drop rows."""
    tmp = tmp_path_factory.mktemp("bloom_prop")
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "pk long, s string")
    t = ManagedTable(tmp / "t")
    t.create(df, pk_cols=["pk"])
    t.analyze_bloom(spark, ["s"], m_bits=512)
    for v in vals:
        got = t.read_eq(spark, "s", v).collect()
        assert len(got) == 1 and got[0]["s"] == v
