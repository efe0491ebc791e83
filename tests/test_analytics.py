"""Unit + plan-shape tests for the analytic-breadth operators
(entry_analytics: as-of join, range join, rollup, top-k, quantiles, vocab).

Oracle parity for all six queries is covered by test_oracle_parity.py via
the registry; here we pin operator *semantics* on constructed edge cases
and assert the physical plans keep their scale shape.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tidb2dw_spark import entry_analytics as ea
from tidb2dw_spark.operators.asof import asof_join
from tidb2dw_spark.operators.rangejoin import range_count_join
from tidb2dw_spark.plans import audit


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # exact-ts match candidate
            (2, 10, _ts("2024-01-01 12:00:00")),  # normal backward match
            (3, 10, _ts("2024-01-01 08:00:00")),  # before any right row
            (4, 99, _ts("2024-01-01 12:00:00")),  # key with no right rows
        ],
        "id long, k long, ts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 10:00:00")),
            (101, 10, _ts("2024-01-01 11:30:00")),
            (102, 10, _ts("2024-01-01 13:00:00")),
        ],
        "rid long, k long, ts timestamp",
    )


class TestAsofJoin:
    def test_backward_inclusive(self, spark):
        out = asof_join(
            _left(spark),
            _right(spark),
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols={"rid": "rid", "ts": "rts"},
        )
        got = {r["id"]: r["rid"] for r in out.collect()}
        # id=1 matches the equal-ts right row; id=2 the newest earlier one;
        # id=3 and id=4 have no match → NULL
        assert got == {1: 100, 2: 101, 3: None, 4: None}

    def test_exclusive(self, spark):
        out = asof_join(
            _left(spark),
            _right(spark),
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols={"rid": "rid"},
            allow_exact_matches=False,
        )
        got = {r["id"]: r["rid"] for r in out.collect()}
        assert got[1] is None  # strict <: the 10:00 right row no longer matches
        assert got[2] == 101

    def test_left_columns_preserved(self, spark):
        out = asof_join(
            _left(spark),
            _right(spark),
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols={"rid": "rid"},
        )
        assert out.columns == ["id", "k", "ts", "rid"]
        assert out.count() == 4

    def test_single_shuffle_no_join(self, spark, sf_dir):
        df = ea.QUERIES["events_asof_join"](spark, sf_dir)
        a = audit(df)
        assert a.joins == [], a.joins  # union+window — no join node at all
        assert len(a.hash_shuffles) == 1, a.exchanges
        assert "user_id" in a.hash_shuffles[0]


class TestRangeCountJoin:
    def test_window_boundaries(self, spark):
        left = spark.createDataFrame(
            [(1, 5, _ts("2024-01-01 10:10:00"))], "id long, k long, ts timestamp"
        )
        right = spark.createDataFrame(
            [
                (5, _ts("2024-01-01 10:00:00")),  # exactly -600s: inclusive
                (5, _ts("2024-01-01 10:10:00")),  # exactly 0: inclusive
                (5, _ts("2024-01-01 09:59:59")),  # one second too old
                (5, _ts("2024-01-01 10:10:01")),  # in the future
                (6, _ts("2024-01-01 10:05:00")),  # other key
            ],
            "k long, ts timestamp",
        )
        out = range_count_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", window_seconds=600
        )
        assert out.collect()[0]["n_in_range"] == 2

    def test_zero_match_rows_kept(self, spark):
        left = spark.createDataFrame(
            [(1, 5, _ts("2024-01-01 10:00:00")), (2, 7, _ts("2024-01-01 10:00:00"))],
            "id long, k long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(5, _ts("2024-01-01 09:55:00"))], "k long, ts timestamp"
        )
        out = range_count_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", window_seconds=600
        )
        got = {r["id"]: r["n_in_range"] for r in out.collect()}
        assert got == {1: 1, 2: 0}

    def test_cross_bucket_match(self, spark):
        # right row in the preceding bucket still matches: left at :01 of a
        # 10-min bucket, right 9 minutes earlier in the previous bucket
        left = spark.createDataFrame(
            [(1, 5, _ts("2024-01-01 10:01:00"))], "id long, k long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(5, _ts("2024-01-01 09:52:00"))], "k long, ts timestamp"
        )
        out = range_count_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", window_seconds=600
        )
        assert out.collect()[0]["n_in_range"] == 1

    def test_plan_is_equi_join(self, spark, sf_dir):
        df = ea.QUERIES["events_range_join"](spark, sf_dir)
        a = audit(df)
        assert a.joins, "expected a join node"
        for j in a.joins:
            assert "NestedLoop" not in j and "Cartesian" not in j, a.joins


class TestAnalyticsPlans:
    def test_rollup_single_shuffle_with_expand(self, spark, sf_dir):
        df = ea.QUERIES["q_rollup_priority_status"](spark, sf_dir)
        a = audit(df)
        assert "Expand" in a.plan
        assert len(a.hash_shuffles) == 1, a.exchanges

    def test_top3_broadcasts_dim(self, spark, sf_dir):
        df = ea.QUERIES["q_top3_customers_per_nation"](spark, sf_dir)
        a = audit(df)
        assert any("BroadcastHashJoin" in j for j in a.joins), a.joins

    def test_vocab_partial_agg_before_shuffle(self, spark, sf_dir):
        df = ea.QUERIES["text_vocab_top_terms"](spark, sf_dir)
        a = audit(df)
        # the exchange must carry (term, partial count), i.e. follow a
        # partial HashAggregate — visible as hashpartitioning(term…)
        assert any("term" in e for e in a.hash_shuffles), a.exchanges
        assert "TakeOrderedAndProject" in a.plan  # top-k, not global sort

    def test_redact_pii_shuffle_free(self, spark, sf_dir):
        from tidb2dw_spark.plans import assert_no_shuffle

        assert_no_shuffle(ea.QUERIES["text_redact_pii"](spark, sf_dir))

    def test_repetition_stats_shuffle_free(self, spark, sf_dir):
        from tidb2dw_spark.plans import assert_no_shuffle

        assert_no_shuffle(ea.QUERIES["text_repetition_stats"](spark, sf_dir))

    def test_repetition_semantics(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a c a"), (2, "x"), (3, "Tie tie BREAK break")],
            "doc_id long, text string",
        )
        from tidb2dw_spark.functions.text import repetition_stats

        out = {
            r["doc_id"]: (r["top_word_count"], r["n_words"])
            for r in df.select(
                "doc_id", repetition_stats(F.col("text")).alias("s")
            ).select("doc_id", "s.*").collect()
        }
        assert out == {1: (3, 5), 2: (1, 1), 3: (2, 4)}

    def test_redact_pii_semantics(self, spark):
        from tidb2dw_spark.functions.text import pii_counts, redact_pii

        df = spark.createDataFrame(
            [(1, "mail a.b+c@x-y.co now or call 555-123-4567 x")],
            "doc_id long, text string",
        )
        c = pii_counts(F.col("text"))
        row = df.select(
            c["n_emails"].alias("e"),
            c["n_phones"].alias("p"),
            redact_pii(F.col("text")).alias("clean"),
        ).collect()[0]
        assert (row["e"], row["p"]) == (1, 1)
        assert row["clean"] == "mail [EMAIL] now or call [PHONE] x"

    def test_boilerplate_flags_and_reassembly(self, spark):
        """A segment planted across most docs is flagged; dropping flagged
        segments reconstructs the clean text (order preserved)."""
        from tidb2dw_spark.functions.dedup import boilerplate_flags

        rows = [(i, f"unique words {i}. follow us on example") for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        segs = boilerplate_flags(df, "doc_id", "text", min_docs=5)
        flagged = {r["seg"] for r in segs.filter("is_boilerplate").collect()}
        assert flagged == {"follow us on example"}
        clean = (
            segs.filter(~F.col("is_boilerplate"))
            .groupBy("doc_id")
            .agg(F.concat_ws(". ", F.collect_list("seg")).alias("clean"))
            .collect()
        )
        assert {r["doc_id"]: r["clean"] for r in clean} == {
            i: f"unique words {i}" for i in range(8)
        }

    def test_interarrival_semantics(self, spark):
        ts = dt.datetime(2024, 1, 1)
        rows = [
            (1, ts, 7), (2, ts + dt.timedelta(seconds=3), 7),
            (3, ts + dt.timedelta(seconds=10), 7), (4, ts, 9),
        ]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
        df.createOrReplaceTempView("__ia")
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gaps = df.select(
            "user_id",
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("g"),
        ).filter("g is not null")
        out = {
            r["user_id"]: (r["n"], r["lo"], r["hi"])
            for r in gaps.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.min("g").alias("lo"), F.max("g").alias("hi"))
            .collect()
        }
        assert out == {7: (2, 3_000_000, 7_000_000)}  # user 9: single event → no gaps

    def test_price_quartiles_one_exchange_one_sort(self, spark, sf_dir):
        """Both ranking windows share the o_orderpriority partition key and a
        sort-prefix-compatible order, so the plan must have exactly one hash
        exchange and a single Sort feeding both Window operators."""
        from tidb2dw_spark.plans import formatted_plan

        df = ea.QUERIES["q_order_price_quartiles"](spark, sf_dir)
        a = audit(df)
        assert len(a.hash_shuffles) == 1, a.exchanges
        assert "o_orderpriority" in a.hash_shuffles[0], a.exchanges
        plan = formatted_plan(df)
        assert plan.count(") Sort") == 1, plan

    def test_window_value_suite_one_exchange_one_sort(self, spark, sf_dir):
        """lead/first_value share the tie-broken sort; percent_rank/
        cume_dist ride its prefix — one exchange, one Sort."""
        from tidb2dw_spark.plans import formatted_plan

        df = ea.QUERIES["q_window_value_suite"](spark, sf_dir)
        a = audit(df)
        assert len(a.hash_shuffles) == 1, a.exchanges
        assert formatted_plan(df).count(") Sort") == 1

    def test_setops_single_scan_single_exchange(self, spark, sf_dir):
        """The flag-agg INTERSECT/EXCEPT must not re-scan orders per
        branch: no joins, one o_custkey exchange, IN-filter pushed."""
        from tidb2dw_spark.plans import assert_pushed_filter, formatted_plan

        df = ea.QUERIES["q_customer_priority_setops"](spark, sf_dir)
        a = audit(df)
        assert a.joins == [], a.joins
        assert len(a.hash_shuffles) == 1, a.exchanges
        import re

        scans = re.findall(r"\(\d+\) Scan parquet", formatted_plan(df))
        assert len(scans) == 1, scans
        assert_pushed_filter(df, "o_orderpriority")

    def test_cube_one_expand_one_exchange(self, spark, sf_dir):
        df = ea.QUERIES["q_cube_priority_status"](spark, sf_dir)
        a = audit(df)
        assert len(a.hash_shuffles) == 1, a.exchanges

    def test_q17_window_not_self_join(self, spark, sf_dir):
        """The correlated per-part average must be a window (one lineitem
        exchange), not an agg + self-join (two lineitem shuffles + join);
        part must broadcast."""
        df = ea.QUERIES["q_small_qty_revenue_by_brand"](spark, sf_dir)
        a = audit(df)
        assert a.joins == ["BroadcastHashJoin"], a.joins
        assert len(a.hash_shuffles) == 2, a.exchanges
        assert any("l_partkey" in e for e in a.hash_shuffles), a.exchanges
        assert any("p_brand" in e for e in a.hash_shuffles), a.exchanges

    def test_monthly_stats_two_phase_distinct(self, spark, sf_dir):
        a = audit(ea.QUERIES["q_monthly_order_stats"](spark, sf_dir))
        assert len(a.hash_shuffles) == 2, a.exchanges

    def test_gapfill_is_joinless_map_lookup(self, spark, sf_dir):
        """The spine must come from explode + map lookup, not a left join
        to the daily frame: the only join is the broadcast 1-row bounds
        cross join, and the two exchanges are the daily and per-user aggs."""
        df = ea.QUERIES["events_daily_gapfill"](spark, sf_dir)
        a = audit(df)
        assert a.joins == ["BroadcastNestedLoopJoin"], a.joins
        assert len(a.hash_shuffles) == 2, a.exchanges

    def test_q3_pushes_both_date_filters_topk_not_sort(self, spark, sf_dir):
        from tidb2dw_spark.plans import assert_pushed_filter, formatted_plan

        df = ea.QUERIES["q_shipping_priority_top10"](spark, sf_dir)
        assert_pushed_filter(df, "o_orderdate")
        assert_pushed_filter(df, "l_shipdate")
        plan = formatted_plan(df)
        assert "TakeOrderedAndProject" in plan  # top-k, not a global sort

    def test_quantiles_single_exchange_on_lang(self, spark, sf_dir):
        df = ea.QUERIES["q_doclen_quantiles_by_lang"](spark, sf_dir)
        a = audit(df)
        assert len(a.hash_shuffles) <= 2, a.exchanges
        assert any("lang" in e for e in a.hash_shuffles), a.exchanges

    def test_revenue_by_nation_broadcasts_dims_one_agg_exchange(self, spark, sf_dir):
        """The 4-table chain must not shuffle the fact side per dim: dims
        broadcast, and the only hash exchange is the final n_name agg."""
        from tidb2dw_spark.plans import formatted_plan

        df = ea.QUERIES["q_revenue_by_nation"](spark, sf_dir)
        a = audit(df)
        plan = formatted_plan(df)
        assert plan.lower().count("broadcasthashjoin") >= 2, plan
        assert all("n_name" in e for e in a.hash_shuffles), a.exchanges

    def test_orders_with_returns_is_semi_join_with_pushed_filter(self, spark, sf_dir):
        from tidb2dw_spark.plans import assert_pushed_filter, formatted_plan

        df = ea.QUERIES["q_orders_with_returns"](spark, sf_dir)
        assert "leftsemi" in formatted_plan(df).lower().replace(" ", "")
        assert_pushed_filter(df, "l_returnflag")

    def test_pivot_single_exchange_no_discovery_scan(self, spark, sf_dir):
        """Pinned-values pivot = one conditional-agg pass: a single hash
        exchange on user_id and no extra distinct job."""
        a = audit(ea.QUERIES["events_type_pivot"](spark, sf_dir))
        assert len(a.hash_shuffles) == 1, a.exchanges
        assert "user_id" in a.hash_shuffles[0]

    def test_interarrival_window_and_agg_share_one_exchange(self, spark, sf_dir):
        """The lag window and the groupBy both key on user_id — Catalyst
        must plan ONE exchange, not two."""
        a = audit(ea.QUERIES["events_user_interarrival"](spark, sf_dir))
        assert len(a.hash_shuffles) == 1, a.exchanges
        assert "user_id" in a.hash_shuffles[0]

    def test_centroid_sums_single_exchange(self, spark, sf_dir):
        """posexplode → partial agg: one exchange keyed on (label, pos),
        carrying centroid-sized partials."""
        a = audit(ea.QUERIES["emb_label_centroid_sums"](spark, sf_dir))
        assert len(a.hash_shuffles) == 1, a.exchanges
        assert "label" in a.hash_shuffles[0]

    def test_distinct_users_two_phase(self, spark, sf_dir):
        """count(DISTINCT) plans the two-phase shape: a (type,user) dedup
        exchange then the final per-type exchange — never a global
        collect-and-dedup."""
        a = audit(ea.QUERIES["events_distinct_users_by_type"](spark, sf_dir))
        assert len(a.hash_shuffles) == 2, a.exchanges
