"""Scale-robustness operators: skew salting, continuous poll loop, and
crash-recovery atomicity of the managed table."""

from __future__ import annotations

import shutil
import threading

from pyspark.sql import functions as F

from tidb2dw_spark.operators.skew import salted_join
from tidb2dw_spark.replicate import TableReplicator
from tidb2dw_spark.table.managed import ManagedTable

from .test_consumer import users_def_v1, write


def test_salted_join_equivalent_to_plain_join(spark):
    """90% of the fact side shares one hot key; the salted join must return
    exactly the plain join's rows while spreading the hot key."""
    facts = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dims = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dim_val")
    )
    plain = {(r["fact_id"], r["dim_val"])
             for r in facts.join(dims, on="k").collect()}
    salted = {(r["fact_id"], r["dim_val"])
              for r in salted_join(facts, dims, on=["k"], num_salts=8).collect()}
    assert salted == plain and len(plain) == 1000


def test_run_loop_consumes_across_polls(spark, tmp_path):
    """The ticker loop picks up files that arrive between polls."""
    snap, incr, wh = tmp_path / "snapshot", tmp_path / "increment", tmp_path / "wh"
    write(snap / "tpch.users.000000001.csv", '1,"alice",30,1990-01-01\n')
    users_def_v1().dump(incr / "tpch/users/1/meta")
    write(incr / "tpch/users/1/2024-01-01/CDC000001.csv",
          '"I","users","tpch",100,2,"bob",20,1992-02-02\n')

    rep = TableReplicator(spark, snap, incr, wh, users_def_v1())
    stop = threading.Event()
    polls_done = []

    def run():
        polls_done.append(rep.run_loop(poll_interval_s=0.3, stop_event=stop))

    t = threading.Thread(target=run)
    t.start()
    import time

    def wait_for(ids, timeout=60):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if rep.table.exists() and {
                r["id"] for r in rep.table.read(spark).collect()
            } == ids:
                return True
            time.sleep(0.3)
        return False

    # first poll applies CDC000001, then a second file arrives mid-loop
    assert wait_for({1, 2}), "first poll never applied"
    write(incr / "tpch/users/1/2024-01-01/CDC000002.csv",
          '"I","users","tpch",200,3,"carol",40,1993-03-03\n')
    assert wait_for({1, 2, 3}), "second file never picked up"
    stop.set()
    t.join(60)
    assert not t.is_alive()
    assert polls_done and polls_done[0] >= 2


def _bucket_file_counts(t: ManagedTable) -> dict[int, int]:
    m = t.manifest()
    return {
        b: len(
            list(
                (t.root / f"v={m['bucket_versions'][str(b)]}" / f"__pk_bucket={b}").glob(
                    "*.parquet"
                )
            )
        )
        for b in range(m["pk_buckets"])
    }


def test_compact_bucketed_rewrites_only_fragmented_buckets(spark, tmp_path):
    """After fragmented writes, compact() packs each over-threshold bucket
    to one file, preserves contents exactly, leaves already-tight buckets
    on their old version, and is a no-op when re-run."""
    base = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    # 8-way input → up to 8 files per bucket partition
    t = ManagedTable(tmp_path / "t").create(base.repartition(8), ["k"], pk_buckets=4)
    before = t.read(spark).orderBy("k").collect()
    frag = _bucket_file_counts(t)
    assert max(frag.values()) > 1  # the premise: creation fragmented

    v = t.compact(spark, max_files_per_bucket=1)
    assert v == 2 and t.version() == 2
    after_counts = _bucket_file_counts(t)
    assert all(c == 1 for c in after_counts.values())
    assert t.read(spark).orderBy("k").collect() == before
    # already-compact → no version churn
    assert t.compact(spark, max_files_per_bucket=1) is None
    assert t.version() == 2

    # vacuum keeps nothing stale: v1 is unreferenced once all buckets moved
    assert t.vacuum(keep_last=1) == [1]
    assert t.read(spark).orderBy("k").collect() == before


def test_compact_plain_table(spark, tmp_path):
    base = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("val"))
    t = ManagedTable(tmp_path / "p").create(base.repartition(8), ["k"])
    assert len(list((t.root / "v=1").rglob("*.parquet"))) > 2
    v = t.compact(spark, max_files_per_bucket=2)
    assert v == 2
    assert len(list((t.root / "v=2").rglob("*.parquet"))) == 1
    assert t.read(spark).count() == 100
    assert t.compact(spark, max_files_per_bucket=2) is None


def test_incremental_dedup_across_batches(spark, tmp_path):
    """Cross-batch dedup via persisted fingerprint state: batch 2 drops
    texts already registered by batch 1, keeps novel ones, and a replayed
    (same-id) row stays novel — idempotent for at-least-once upstreams."""
    from tidb2dw_spark.functions.text import doc_fingerprint
    from tidb2dw_spark.operators.incremental import IncrementalDeduper

    d = IncrementalDeduper(tmp_path / "state", pk_buckets=4)
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha  beta")],  # 3 dups 1
        "doc_id long, text string",
    )
    out1 = d.dedup_batch(
        spark, b1, "doc_id", doc_fingerprint(F.col("text")), commit_ts=1
    )
    assert sorted(r["doc_id"] for r in out1.collect()) == [1, 2]
    assert d.state_count(spark) == 2

    b2 = spark.createDataFrame(
        [
            (10, "ALPHA beta"),   # dup of fp(1) after normalization
            (11, "epsilon zeta"),  # novel
            (1, "alpha beta"),     # replay of the registering doc
        ],
        "doc_id long, text string",
    )
    out2 = d.dedup_batch(
        spark, b2, "doc_id", doc_fingerprint(F.col("text")), commit_ts=2
    )
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 11]
    assert d.state_count(spark) == 3  # only epsilon registered new state

    # replaying batch 2 reproduces its survivors exactly (11 registered
    # the fingerprint, so its replay is novel again; 10 stays a dup), and
    # a NEW id with a seen text is dropped
    b3 = b2.filter("doc_id != 1").union(
        spark.createDataFrame([(20, "epsilon  zeta")], "doc_id long, text string")
    )
    out3 = d.dedup_batch(
        spark, b3, "doc_id", doc_fingerprint(F.col("text")), commit_ts=3
    )
    assert sorted(r["doc_id"] for r in out3.collect()) == [11]
    assert d.state_count(spark) == 3


def test_crashed_merge_leaves_previous_version_readable(spark, tmp_path):
    """Atomicity: data files written but manifest not swapped (crash between
    the two) must leave readers on the old version, and a rerun of the same
    merge must converge to the correct state."""
    base = spark.range(10).select(F.col("id").alias("k"), F.lit("v").alias("val"))
    t = ManagedTable(tmp_path / "t").create(base, ["k"])
    batch = spark.createDataFrame(
        [("U", "t", "s", 1, 0, "updated")],
        "flag string, tablename string, schemaname string, commit_ts long, k long, val string",
    )
    # simulate the crash: write the next version's data directory by hand
    # (as merge would), but never commit the manifest
    merged_preview = t.read(spark)
    merged_preview.write.mode("overwrite").parquet(str(t.root / "v=2"))
    assert t.version() == 1  # manifest untouched
    assert t.read(spark).count() == 10  # readers see v1 only

    # recovery: the real merge just runs again (idempotent), overwriting the
    # orphaned v=2 directory and committing atomically
    v = t.merge(spark, batch)
    assert v == 2 and t.version() == 2
    rows = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert rows[0] == "updated" and len(rows) == 10


def test_cluster_analyze_prunes_range_reads(spark, tmp_path):
    """cluster_by + analyze + read_range: a narrow range on a clustered
    table opens a strict subset of files; results always equal the exact
    full-scan filter; stale stats fall back to scanning everything."""
    base = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"), F.col("id").alias("ts_k")
    )
    t = ManagedTable(tmp_path / "z").create(base.repartition(8), ["k"])
    # force several files when clustering so pruning has something to skip
    t.cluster_by(spark, ["ts_k"], target_bytes=16 << 10)
    n_files = len(list((t.root / f"v={t.version()}").rglob("*.parquet")))
    assert n_files > 3
    stats = t.analyze(spark, ["ts_k"])
    assert len(stats["files"]) == n_files

    expected = sorted(
        r["k"] for r in t.read(spark).filter("ts_k between 100 and 300").collect()
    )
    pruned = t.read_range(spark, "ts_k", 100, 300)
    assert sorted(r["k"] for r in pruned.collect()) == expected
    # the plan's file list must be smaller than the table's
    scanned = pruned.select(F.input_file_name().alias("f")).distinct().count()
    assert scanned < n_files
    # empty range → empty frame with the table schema
    assert t.read_range(spark, "ts_k", 1_000_000, 2_000_000).count() == 0

    # a write moves the version: stats go stale, reads stay correct
    t.overwrite(t.read(spark))
    again = t.read_range(spark, "ts_k", 100, 300)
    assert sorted(r["k"] for r in again.collect()) == expected


def test_cluster_by_rejects_bucketed(spark, tmp_path):
    base = spark.range(50).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    t = ManagedTable(tmp_path / "zb").create(base, ["k"], pk_buckets=4)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.cluster_by(spark, ["v"])


def test_new_ops_handle_empty_input(spark):
    """Every new operator must return an empty, correctly-typed frame on
    an empty corpus — no div-by-zero, no collect of nothing, no crash."""
    from tidb2dw_spark.functions.dedup import (
        contamination_hits,
        dup_ngram_stats,
    )
    from tidb2dw_spark.functions.multimodal import image_phash, phash_dup_pairs
    from tidb2dw_spark.functions.sampling import chunk_documents, token_budget_per_key
    from tidb2dw_spark.functions.text import token_count

    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    media = spark.createDataFrame([], "doc_id long, media binary")
    assert contamination_hits(docs, "doc_id", "text", F.col("doc_id") % 2 == 0).count() == 0
    assert dup_ngram_stats(docs, "doc_id", "text").count() == 0
    assert chunk_documents(docs, "doc_id", "text").count() == 0
    assert token_budget_per_key(
        docs, "source", "doc_id", token_count(F.col("text")), budget=10
    ).count() == 0
    ph = image_phash(media)
    assert ph.count() == 0
    assert phash_dup_pairs(ph).count() == 0


def test_sketch_aggregates_track_exact(spark, sf_dir):
    """Approximate sketches (the 100 TB path for distinct counts and
    quantiles) must land within their documented error of the exact
    answers on real data: HLL++ rsd 5%, percentile_approx err ≤ 1/acc."""
    from tidb2dw_spark.fixtures import read_table

    ev = read_table(spark, sf_dir, "events")
    exact = ev.agg(
        F.countDistinct("user_id").alias("d"),
        F.expr("percentile(value, 0.5)").alias("p50"),
    ).collect()[0]
    approx = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("d"),
        F.percentile_approx("value", 0.5, 10_000).alias("p50"),
    ).collect()[0]
    assert abs(approx["d"] - exact["d"]) <= max(3, 0.15 * exact["d"])
    # percentile_approx guarantees a value whose rank is within n/accuracy
    n = ev.count()
    rank_of_approx = ev.filter(F.col("value") <= approx["p50"]).count()
    assert abs(rank_of_approx - n / 2) <= n / 10_000 + 1
