"""Physical-plan assertions: the plans Catalyst picks must be the plans we
designed for at scale — filters pushed to the scan, columns pruned, small
sides broadcast, narrow ops shuffle-free.  These are the properties that
decide whether an operator survives a 100× scale-up; regressing one is a
perf bug even while results stay correct."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.entry_queries import QUERIES


def plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    p = plan(QUERIES["q1_lineitem_agg"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # scan must read only the 5 referenced columns, not all 11
    read_schema = next(line for line in p.splitlines() if "ReadSchema" in line)
    for col in ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]:
        assert col in read_schema
    for col in ["l_partkey", "l_suppkey", "l_comment", "l_orderkey"]:
        assert col not in read_schema
    # partial aggregation before the exchange (map-side combine)
    assert p.index("HashAggregate") < p.index("Exchange")


def test_revenue_join_broadcasts_dim_side(spark, sf_dir):
    p = plan(QUERIES["q_revenue_by_segment"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_merge_broadcasts_batch_keys(spark, sf_dir):
    """The anti-join side of the merge is the (small) deduped batch keys —
    it must broadcast so the target side never shuffles."""
    p = plan(QUERIES["merge_orders"](spark, sf_dir))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_cast_projection_is_shuffle_free(spark, sf_dir):
    p = plan(QUERIES["p2_cast_projection"](spark, sf_dir))
    assert "Exchange" not in p
    assert "* Project" in p  # '*' prefix = inside WholeStageCodegen


def test_window_dedup_single_shuffle(spark, sf_dir):
    p = plan(QUERIES["w1_last_writer_wins"](spark, sf_dir))
    # one hash exchange for the PK window, nothing else
    exchanges = re.findall(r"^\(\d+\) Exchange", p, re.M)
    assert len(exchanges) == 1, exchanges
    assert "hashpartitioning(o_orderkey" in p


def test_text_features_shuffle_free(spark, sf_dir):
    p = plan(QUERIES["text_quality_score"](spark, sf_dir))
    assert "Exchange" not in p


def test_topk_broadcasts_queries(spark, sf_dir):
    p = plan(QUERIES["sim_topk_quantized_cosine"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
