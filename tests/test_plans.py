"""Physical-plan assertions: the plans Catalyst picks must be the plans we
designed for at scale — filters pushed to the scan, columns pruned, small
sides broadcast, narrow ops shuffle-free.  These are the properties that
decide whether an operator survives a 100× scale-up; regressing one is a
perf bug even while results stay correct."""

from __future__ import annotations

from tidb2dw_spark.entry_queries import QUERIES
from tidb2dw_spark.plans import (
    assert_broadcast_join,
    assert_no_shuffle,
    assert_pushed_filter,
    assert_read_columns_only,
    assert_single_shuffle,
    audit,
)


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = QUERIES["q1_lineitem_agg"](spark, sf_dir)
    assert_pushed_filter(df, "IsNotNull(l_shipdate)")
    assert_pushed_filter(df, "LessThanOrEqual(l_shipdate")
    # scan must read only the 5 referenced columns, not all 11
    assert_read_columns_only(
        df,
        required=["l_returnflag", "l_linestatus", "l_quantity",
                  "l_extendedprice", "l_discount"],
        forbidden=["l_partkey", "l_suppkey", "l_comment", "l_orderkey"],
    )
    # partial aggregation before the exchange (map-side combine)
    p = audit(df).plan
    assert p.index("HashAggregate") < p.index("Exchange")


def test_revenue_join_broadcasts_dim_side(spark, sf_dir):
    assert_broadcast_join(QUERIES["q_revenue_by_segment"](spark, sf_dir))


def test_merge_broadcasts_batch_keys(spark, sf_dir):
    """The anti-join side of the merge is the (small) deduped batch keys —
    it must broadcast so the target side never shuffles."""
    a = assert_broadcast_join(QUERIES["merge_orders"](spark, sf_dir))
    assert "LeftAnti" in a.plan


def test_cast_projection_is_shuffle_free(spark, sf_dir):
    a = assert_no_shuffle(QUERIES["p2_cast_projection"](spark, sf_dir))
    assert "* Project" in a.plan  # '*' prefix = inside WholeStageCodegen


def test_window_dedup_single_shuffle(spark, sf_dir):
    # one hash exchange for the PK window, nothing else
    assert_single_shuffle(
        QUERIES["w1_last_writer_wins"](spark, sf_dir), key_substring="o_orderkey"
    )


def test_text_features_shuffle_free(spark, sf_dir):
    assert_no_shuffle(QUERIES["text_quality_score"](spark, sf_dir))


def test_topk_arrow_kernel_is_joinless_single_shuffle(spark, sf_dir):
    """The arrow top-k embeds the query set in the kernel closure: no join
    at all; the only by-key exchange is the final global rank window over
    (partitions × queries × k) candidate rows."""
    a = audit(QUERIES["sim_topk_quantized_cosine"](spark, sf_dir))
    assert a.joins == [], a.joins
    assert len(a.hash_shuffles) == 1 and "query_id" in a.hash_shuffles[0], a.exchanges


def test_topk_expr_kernel_broadcasts_queries(spark, sf_dir):
    from pyspark.sql import functions as F

    from tidb2dw_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    a = audit(brute_force_topk(emb, q, k=5, metric="quantized_cosine"))
    assert any(j.startswith("Broadcast") for j in a.joins), a.joins


def test_audit_parses_plan(spark, sf_dir):
    a = audit(QUERIES["q1_lineitem_agg"](spark, sf_dir))
    # AQE plans show no codegen stars pre-execution, so only bound the ratio
    assert a.total_ops > 0 and 0.0 <= a.codegen_fraction <= 1.0
    assert a.num_shuffles >= 1
    assert a.pushed_filters and a.read_schemas


def test_split_is_shuffle_free(spark, sf_dir):
    assert_no_shuffle(QUERIES["split_train_test"](spark, sf_dir))


def test_salted_join_scatters_hot_keys(spark, sf_dir):
    """The salted-join row must actually join on (key, __salt) — the salt
    has to reach the join condition or the whole mitigation is a no-op —
    and stay result-equivalent to the plain join."""
    from pyspark.sql import functions as F

    from tidb2dw_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice"
    )
    supp = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select("s_suppkey", "s_nationkey")
        .withColumnRenamed("s_suppkey", "l_suppkey")
    )
    salted = salted_join(li, supp, on=["l_suppkey"], num_salts=8)
    assert "__salt" in salted._jdf.queryExecution().analyzed().toString()
    plain = li.join(supp, "l_suppkey")
    agg = lambda df: df.groupBy("s_nationkey").agg(  # noqa: E731
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
    )
    assert sorted(map(tuple, agg(salted).collect())) == sorted(
        map(tuple, agg(plain).collect())
    )


def test_ivf_broadcasts_probes_no_corpus_shuffle(spark, sf_dir):
    """Cell assignment must be a narrow map (literal matrix math) and the
    corpus side must not exchange before scoring.  Round 11: the arrow
    path scores via ONE mapInPandas stage against the driver-held probe
    batch (each corpus vector crosses the Python boundary once, never
    once per candidate pair) — no join node at all, and the corpus is
    never shuffled or broadcast."""
    a = audit(QUERIES["sim_ivf_topk"](spark, sf_dir))
    assert "MapInPandas" in a.plan, a.plan
    assert not a.joins, a.joins  # probe scoring needs no join anymore
    # only the final top-k window may shuffle BY KEY (hash on query_id);
    # round-robin spreads from spread_for_compute are load-balancing only
    assert len(a.hash_shuffles) <= 1, a.exchanges
    assert all("query_id" in e for e in a.hash_shuffles), a.exchanges


def test_q5_shape_broadcasts_all_dims_single_fact_shuffle(spark, sf_dir):
    """Q5 shape: every dim (customer/supplier/nation/region) broadcasts;
    the only key exchanges are the fact-side orderkey join + the final
    nation aggregation — the fact never shuffles for a dim."""
    a = audit(QUERIES["q_local_supplier_revenue"](spark, sf_dir))
    assert sum(j.startswith("Broadcast") for j in a.joins) >= 4, a.joins
    assert not any("SortMergeJoin" in j for j in a.joins), a.joins
    assert len(a.hash_shuffles) <= 3, a.exchanges


def test_q7_pair_filter_lands_in_broadcast_dims(spark, sf_dir):
    """Q7 shape: the nation-pair disjunction filters the 2-row broadcast
    dims, not the fact after a wide join."""
    a = audit(QUERIES["q_volume_shipping"](spark, sf_dir))
    assert sum(j.startswith("Broadcast") for j in a.joins) >= 4, a.joins
    assert any("n_name" in f for f in a.pushed_filters), a.pushed_filters


def test_zorder_multirange_scan_is_shuffle_free(spark, sf_dir):
    """The pruned multi-range read is scan+filter only — pruning happens
    in the driver against manifest stats, never as a plan node."""
    from tidb2dw_spark.plans import assert_no_shuffle

    assert_no_shuffle(QUERIES["q_zorder_multirange"](spark, sf_dir))


def test_bloom_point_lookup_scan_is_shuffle_free(spark, sf_dir):
    from tidb2dw_spark.plans import assert_no_shuffle

    assert_no_shuffle(QUERIES["q_bloom_point_lookup"](spark, sf_dir))


def test_cdf_change_compute_never_shuffles_preimage(spark, tmp_path):
    """The change-set computation must not exchange the pre-image: the
    batch keys broadcast into a LEFT-SEMI shrink (pre streams once), and
    the shrunken pre side broadcasts into the outer join.  An outer join
    that preserved the batch side directly would silently fall back to a
    sort-merge join (the broadcast hint lands on an unsupported build
    side) and shuffle every touched bucket."""
    from pyspark.sql import functions as F

    from tidb2dw_spark.table.managed import ManagedTable

    pre = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    win = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"),
        F.lit("U").alias("flag"),
    )
    ch = ManagedTable(tmp_path / "t")._compute_changes(
        win, pre, ["k"], ["k", "v"], broadcast_batch=True
    )
    a = audit(ch)
    assert "BroadcastHashJoin" in a.plan, a.plan
    assert "LeftSemi" in a.plan and "LeftOuter" in a.plan
    assert "SortMergeJoin" not in a.plan
    # the only exchanges are the two broadcasts of small sides
    import re

    assert not re.search(r"Exchange hashpartitioning", a.plan), a.plan


def test_q6_scan_only_pushdown(spark, sf_dir):
    """Q6 is the pure scan query: all three predicates reach the parquet
    scan, the projection prunes, and the only exchange is the 1-row
    global-agg partial combine."""
    from tidb2dw_spark.plans import assert_pushed_filter, assert_read_columns_only

    df = QUERIES["q6_forecast_revenue"](spark, sf_dir)
    assert_pushed_filter(df, "GreaterThanOrEqual(l_shipdate")
    assert_pushed_filter(df, "GreaterThanOrEqual(l_discount")
    assert_pushed_filter(df, "LessThan(l_quantity")
    assert_read_columns_only(
        df,
        required=["l_extendedprice", "l_discount"],
        forbidden=["l_partkey", "l_suppkey", "l_returnflag"],
    )


def test_q19_derives_single_side_filters_and_broadcasts_part(spark, sf_dir):
    """The disjunctive predicate must not block pushdown: Catalyst
    derives the implied brand-set filter for the part scan and the
    quantity envelope for the fact scan; part broadcasts."""
    from tidb2dw_spark.plans import assert_broadcast_join, audit

    df = QUERIES["q19_discounted_revenue"](spark, sf_dir)
    a = assert_broadcast_join(df)
    # implied single-side disjunctions pushed into each scan: the part
    # scan carries the brand/size OR-tree, the fact scan the quantity one
    assert "EqualTo(p_brand,Brand#1)" in a.plan, a.plan
    assert "GreaterThanOrEqual(l_quantity" in a.plan


def test_q21_collapses_double_correlation_to_one_shuffle_agg(spark, sf_dir):
    """The exists/not-exists pair folds into ONE per-order aggregation:
    exactly one orderkey-keyed exchange on the fact, no self-join of
    lineitem with itself."""
    from tidb2dw_spark.plans import audit

    df = QUERIES["q21_waiting_suppliers"](spark, sf_dir)
    a = audit(df)
    plan = a.plan
    # lineitem scanned ONCE (a correlated-subquery translation would scan
    # it 2-3x)
    assert plan.count("lineitem.parquet") == 1, plan
    assert "BroadcastHashJoin" in plan


def test_q15_single_suppkey_shuffle_then_tiny_window(spark, sf_dir):
    from tidb2dw_spark.plans import audit

    df = QUERIES["q15_top_supplier"](spark, sf_dir)
    plan = audit(df).plan
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan  # supplier name join broadcasts


def test_q10_topk_is_distributed_take_ordered(spark, sf_dir):
    """Global top-20 must plan TakeOrderedAndProject (per-partition
    partial top-k), never a single-partition global window sort."""
    from tidb2dw_spark.plans import audit

    plan = audit(QUERIES["q10_returned_items"](spark, sf_dir)).plan
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_sem_dedup_single_cluster_exchange(spark, sf_dir):
    """SemDeDup is ONE shuffle end-to-end: assignment + centroid
    similarity are narrow constant-folded expressions, and the pairwise
    verify is the cluster-local Arrow kernel — no join node, no pair-row
    exchange, no second pass over the corpus."""
    a = assert_single_shuffle(QUERIES["sem_dedup_keep"](spark, sf_dir))
    assert "FlatMapGroupsInPandas" in a.plan
    assert a.joins == []


def test_maintained_q3_read_is_distributed_take_ordered(spark, sf_dir):
    """The maintained-Q3 top-10 read must plan TakeOrderedAndProject over
    the group-sized view state — never a global window sort — so the
    serving path stays O(state/partitions) at any view size."""
    from tidb2dw_spark.entry_pipeline import QUERIES as PQ
    from tidb2dw_spark.plans import audit

    plan = audit(PQ["pipeline_maintained_q3"](spark, sf_dir)).plan
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_hll_single_fact_scan_two_register_exchanges(spark, sf_dir):
    """The HLL batch query reads the fact ONCE per leg (sketch + exact),
    pre-aggregates registers map-side before each exchange, and joins
    the 5-row sketch side by broadcast — the APPROX_COUNT_DISTINCT
    shape whose state stays 2^p·groups at any corpus size."""
    from tidb2dw_spark.plans import audit

    a = audit(QUERIES["approx_distinct_hll"](spark, sf_dir))
    plan = a.plan
    assert plan.count("orders.parquet") == 2  # sketch leg + exact leg
    assert "BroadcastHashJoin" in plan        # 5-row agg side broadcast
    # map-side combine on both legs: partial agg precedes every exchange
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_maintained_q7_read_is_broadcast_only(spark, sf_dir):
    """Reading the year-grain Q7 cube joins two 2-row nation broadcasts
    and re-groups the tiny state — no sort-merge join, no fact scan."""
    from tidb2dw_spark.entry_pipeline import QUERIES as PQ
    from tidb2dw_spark.plans import audit

    a = audit(PQ["pipeline_maintained_q7"](spark, sf_dir))
    assert "SortMergeJoin" not in a.plan
    assert "BroadcastHashJoin" in a.plan
    assert "lineitem.parquet" not in a.plan  # serves from view state only


def test_plans_md_is_fresh(spark, tmp_path):
    """PLANS.md freshness gate: regenerate the audit over the FULL
    registry (same sf0.01 the committed artifact uses) and fail on any
    drift — a plan change without `python -m tidb2dw_spark.plans.report`
    goes red here instead of silently staling for a round.  ~10 min at
    local[8]; the cost IS the point: every registry query's plan is
    re-derived and compared.  The report is partition-count invariant
    (keys are extracted without partition numbers), so the pytest
    session's config reproduces the standalone artifact byte-for-byte."""
    import pathlib

    from tidb2dw_spark.plans import report

    out = tmp_path / "PLANS.md"
    rc = report.generate(str(out))
    assert rc == 0, "a registry query failed to plan — see the Errors section"
    committed = pathlib.Path(__file__).resolve().parents[1] / "PLANS.md"
    if out.read_text() != committed.read_text():
        import difflib

        diff = "\n".join(
            difflib.unified_diff(
                committed.read_text().splitlines(),
                out.read_text().splitlines(),
                "PLANS.md (committed)",
                "PLANS.md (regenerated)",
                lineterm="",
            )
        )
        raise AssertionError(
            "PLANS.md is stale — regenerate with "
            "`python -m tidb2dw_spark.plans.report` and commit it.\n" + diff
        )


def test_sketch_serving_reads_are_state_only(spark, sf_dir):
    """The round-9 sketch-tier serving reads (maintained Q9 cube, HLL
    rollup, quantile histogram + its rollup) must read ONLY their
    maintained state — exactly one parquet scan, never a base table.
    This is the 100 TB property: the cube/registers/bins are
    groups-sized, so the serving cost is independent of fact size."""
    from tidb2dw_spark.plans import audit

    for name in (
        "pipeline_maintained_q9",
        "pipeline_hll_rollup",
        "pipeline_quantile_sketch",
        "pipeline_quantile_rollup",
    ):
        plan = audit(QUERIES[name](spark, sf_dir)).plan
        scans = [
            line
            for line in plan.splitlines()
            if "InMemoryFileIndex" in line
        ]
        assert len(scans) == 1, (name, scans)
        loc = scans[0]
        assert "lineitem" not in loc and "orders/v=" not in loc, (name, loc)
        # the maintained-state roots these rows serve from
        assert ("/mv/" in loc or "/qh/" in loc or "/sk/" in loc), (name, loc)


def test_cms_serving_reads_are_state_only(spark, sf_dir):
    """The Count-Min serving reads touch ONLY the counter state: the
    per-group row scans it twice (once to enumerate probe groups, once
    for the counters), the rollup once — never the base table."""
    from tidb2dw_spark.plans import audit

    for name, max_scans in (
        ("pipeline_maintained_cms", 2),
        ("pipeline_cms_rollup", 1),
        # cross-table union: two sketches' state parquets, no base
        ("pipeline_hll_union", 2),
    ):
        plan = audit(QUERIES[name](spark, sf_dir)).plan
        scans = [
            line
            for line in plan.splitlines()
            if "InMemoryFileIndex" in line
        ]
        assert 1 <= len(scans) <= max_scans, (name, scans)
        for loc in scans:
            assert "orders/v=" not in loc and "/sk/" in loc, (name, loc)


def test_cmhh_descent_reads_state_only(spark, sf_dir):
    """The dyadic heavy-hitter DESCENT touches only the counter state
    (one scan per probed level + one for the group enumeration — at
    most LEVELS+1), never the base table, and collects nothing
    data-sized: candidates stay in DataFrames end to end."""
    from tidb2dw_spark.plans import audit

    for name, cap in (
        ("pipeline_cms_heavy_hitters", 9),   # 8 level probes + groups
        ("pipeline_cms_range_count", 2),     # node probe + groups
        # one-statement walk: top probe (reused for totals + first
        # pick) + 7 hop probes + group enumeration — all state parquet;
        # the round-11 win is EXCHANGES (16 → 2, window partitioning
        # reused across hops), not scan count
        ("pipeline_cms_quantile", 11),
    ):
        plan = audit(QUERIES[name](spark, sf_dir)).plan
        scans = [
            line
            for line in plan.splitlines()
            if "InMemoryFileIndex" in line
        ]
        assert 1 <= len(scans) <= cap, (name, scans)
        for loc in scans:
            assert "vals/v=" not in loc and "/hh/" in loc, (name, loc)
    # string-domain variant: 4 level probes + groups + the dictionary
    # DECODE join — every scan is sketch state or dict state, never the
    # base table, and the descent still collects nothing data-sized
    plan = audit(QUERIES["pipeline_cms_string_topk"](spark, sf_dir)).plan
    scans = [
        line for line in plan.splitlines() if "InMemoryFileIndex" in line
    ]
    assert 1 <= len(scans) <= 8, scans
    for loc in scans:
        assert "vals/v=" not in loc and "/shh/" in loc, loc


def test_ivf_join_shuffles_both_sides_never_broadcasts(spark, sf_dir):
    """The distributed ANN join (sim_ivf_topk_join) must be a SHUFFLE
    join on the cell key with the per-query top-k as an exchange on
    query_id — and NO broadcast of either data side.  At 100 TB both
    the index and the query table are data-sized; a planner falling
    back to broadcast here would OOM the executors."""
    df = QUERIES["sim_ivf_topk_join"](spark, sf_dir)
    a = audit(df)
    plan = a.plan
    # round 11: the candidate scoring is a cogroup-on-cell matmul
    # (FlatMapCoGroupsInPandas) — still a shuffle of BOTH data sides on
    # the cell key (each vector crosses the Python boundary once per
    # cell instead of once per candidate pair), never a broadcast
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    keys = " ".join(a.hash_shuffles)
    assert "cell" in keys and "query_id" in keys, a.hash_shuffles
    assert keys.count("cell") >= 2, a.hash_shuffles  # both sides exchange


def test_kmv_serving_reads_are_state_only(spark, sf_dir):
    """The KMV tier's serving reads fold ONLY the k-row hash states:
    the per-priority estimate reads its own state once; union and
    intersection read the two sigma-states (the intersection needs each
    side twice: rollup + common-hash join) — never the orders base.
    At 100 TB the cost is O(k) per group regardless of feed size."""
    from tidb2dw_spark.plans import audit

    for name, lo, hi in (
        ("pipeline_maintained_kmv", 1, 1),
        ("pipeline_kmv_union", 2, 2),
        ("pipeline_kmv_intersection", 2, 6),
    ):
        plan = audit(QUERIES[name](spark, sf_dir)).plan
        scans = [
            line for line in plan.splitlines() if "InMemoryFileIndex" in line
        ]
        assert lo <= len(scans) <= hi, (name, scans)
        for loc in scans:
            assert "orders/v=" not in loc and "orders.parquet" not in loc, (
                name, loc,
            )
            assert "/sk/" in loc or "/lo/" in loc or "/hi/" in loc, (name, loc)


def test_consistent_snapshot_reads_are_bucket_resolved(spark, sf_dir):
    """The TSO-pinned join reads both tables through their pinned
    commits' bucket maps — two managed-table scans (orders + cust
    version dirs), no extra state, and the dim side broadcasts."""
    from tidb2dw_spark.plans import audit

    a = audit(QUERIES["pipeline_consistent_snapshot"](spark, sf_dir))
    scans = [
        line for line in a.plan.splitlines() if "InMemoryFileIndex" in line
    ]
    assert len(scans) == 2, scans
    assert any("/orders/v=" in s for s in scans), scans
    assert any("/cust/v=" in s for s in scans), scans
