"""Checksum suites: one driver row verifying a FAMILY of queries.

The driver's correctness gate checks at most ~50 registry entries, so the
analytics breadth (100 members as of round 8, including every maintained
TPC-H view), the sampling, similarity, and multimodal families are
verified through composite entries.  Each member query's full result is folded
to a single (query, n_rows, checksum) row with an engine-portable integer
fingerprint, and the suite returns one row per member — a hash mismatch in
ANY member's rows flips that member's checksum, so the driver row carries
the same bit-exactness signal as 30 individual rows.

Fingerprint (identical algebra in Spark and DuckDB, integer-only):

    col_fp  = ((raw % M) + M) % M        with NULL → 987654321
    row_fp  = (Σ_i (col_fp_i · W_i) % M) % M   (columns sorted by name)
    result  = (COUNT(*), SUM(row_fp) % nothing — sum < 2^51, exact BIGINT)

raw per type: integers as-is; strings via the md5-hex→int idiom already
proven across engines (functions/dedup.py:55 / oracle_sql.sql_md5_long);
doubles quantized FLOOR(x·1e6 + 0.5) (bit-identical doubles → identical
integers); timestamps as epoch microseconds (UTC session); booleans 0/1.
M = 2^31 − 1 keeps every product under 2^62 (no BIGINT overflow in either
engine, and Spark's ANSI overflow checking never fires).

The member column specs are pinned literally below: if a member's schema
drifts, the Spark side raises instead of silently fingerprinting different
columns, and tests/test_oracle_parity.py catches the mismatch.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 2_147_483_647
_NULL_FP = 987_654_321
_WEIGHTS = [10007, 10037, 10061, 10091, 10139, 10141, 10151, 10159, 10163, 10169]

# kind ∈ int | str | dbl | ts | bool
ANALYTICS_SPEC: dict[str, list[tuple[str, str]]] = {
    "text_features": [("doc_id", "int"), ("n_chars", "int"), ("n_tokens", "int"), ("n_bpe_tokens", "int"), ("fingerprint", "str"), ("lang_pred", "str")],
    "text_quality_score": [("doc_id", "int"), ("n_chars", "int"), ("n_tokens", "int"), ("avg_token_len", "dbl"), ("punct_ratio", "dbl"), ("stopword_ratio", "dbl"), ("quality_score", "dbl")],
    # BM25 retrieval top-k: integer-ratio scoring (log-free idf), exact
    "text_bm25_topk": [("doc_id", "int"), ("score_q", "int"), ("n_terms", "int")],
    "q_rollup_priority_status": [("o_orderpriority", "str"), ("o_orderstatus", "str"), ("gid", "int"), ("n_orders", "int"), ("revenue_cents", "int")],
    "q_top3_customers_per_nation": [("c_nationkey", "int"), ("c_custkey", "int"), ("revenue_cents", "int"), ("rnk", "int")],
    "q_doclen_quantiles_by_lang": [("lang", "str"), ("n_docs", "int"), ("p25", "int"), ("p50", "int"), ("p75", "int"), ("p90", "int")],
    "text_vocab_top_terms": [("term", "str"), ("n", "int")],
    "text_redact_pii": [("doc_id", "int"), ("n_emails", "int"), ("n_phones", "int"), ("clean", "str")],
    "text_repetition_stats": [("doc_id", "int"), ("top_word_count", "int"), ("n_words", "int")],
    "q_revenue_by_nation": [("n_name", "str"), ("n_lineitems", "int"), ("revenue_cents", "int")],
    "q_revenue_by_region": [("r_name", "str"), ("n_lineitems", "int"), ("revenue_cents", "int")],
    "q_brand_revenue_by_supp_nation": [("n_name", "str"), ("p_brand", "str"), ("n_lineitems", "int"), ("revenue_cents", "int")],
    "q_orders_with_returns": [("o_orderkey", "int"), ("o_orderstatus", "str"), ("totalprice_cents", "int")],
    "events_user_interarrival": [("user_id", "int"), ("n_gaps", "int"), ("min_gap_us", "int"), ("max_gap_us", "int"), ("sum_gap_us", "int")],
    "events_distinct_users_by_type": [("event_type", "str"), ("n_users", "int"), ("n_events", "int")],
    "emb_label_centroid_sums": [("label", "int"), ("pos", "int"), ("qsum", "int"), ("n", "int")],
    "q_order_price_quartiles": [("o_orderkey", "int"), ("o_orderpriority", "str"), ("quartile", "int"), ("price_rank", "int")],
    "q_cumulative_revenue_per_customer": [("o_custkey", "int"), ("o_orderkey", "int"), ("cum_revenue_cents", "int")],
    "events_type_pivot": [("user_id", "int"), ("click", "int"), ("error", "int"), ("purchase", "int"), ("signup", "int"), ("view", "int")],
    "q_orders_above_avg": [("o_orderkey", "int"), ("totalprice_cents", "int")],
    "events_json_extract_agg": [("k", "int"), ("n_events", "int"), ("n_users", "int")],
    "text_boilerplate_segments": [("doc_id", "int"), ("seg", "str"), ("seg_docs", "int"), ("is_boilerplate", "bool")],
    "q_window_value_suite": [("o_orderkey", "int"), ("o_orderpriority", "str"), ("next_cents", "int"), ("cheapest_key", "int"), ("price_pct_rank", "dbl"), ("price_cume_dist", "dbl")],
    "q_customer_priority_setops": [("tag", "str"), ("o_custkey", "int")],
    "q_cube_priority_status": [("o_orderpriority", "str"), ("o_orderstatus", "str"), ("gid", "int"), ("n_orders", "int"), ("revenue_cents", "int")],
    "q_small_qty_revenue_by_brand": [("p_brand", "str"), ("n_small", "int"), ("revenue_cents", "int")],
    "q_monthly_order_stats": [("month", "ts"), ("n_orders", "int"), ("n_customers", "int"), ("revenue_cents", "int")],
    "events_daily_gapfill": [("user_id", "int"), ("dday", "ts"), ("n_events", "int")],
    "q_trailing_week_revenue": [("o_orderpriority", "str"), ("dday", "ts"), ("rev_cents", "int"), ("rev_7d_cents", "int")],
    "q_shipping_priority_top10": [("l_orderkey", "int"), ("o_orderdate", "ts"), ("revenue_cents", "int")],
    "q_nation_presence_fulljoin": [("nationkey", "int"), ("n_cust", "int"), ("n_supp", "int")],
    "q_skew_salted_supplier_revenue": [("s_nationkey", "int"), ("n_lineitems", "int"), ("revenue_cents", "int")],
    "text_bpe_merges": [("step", "int"), ("lhs", "str"), ("rhs", "str"), ("merged", "str"), ("pair_count", "int")],
    "text_bpe_tokenize": [("doc_id", "int"), ("n_words", "int"), ("n_subword_tokens", "int")],
    "q_bucketed_colocated_join": [("o_orderpriority", "str"), ("n_items", "int"), ("revenue_cents", "int")],
    "q_zorder_multirange": [("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderdate", "ts"), ("totalprice_cents", "int")],
    # merge-on-read lifecycle vs the same DuckDB fold oracle as the CoW replay
    "pipeline_mor_replay": [("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"), ("o_total_cents", "int"), ("o_note", "str")],
    # change data feed: every merge commit's row-level change set, re-derived
    # relationally by the oracle (incl. deleted-then-updated keys → insert)
    "pipeline_cdf_replay": [("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"), ("o_total_cents", "int"), ("o_note", "str"), ("_change_type", "str"), ("_commit_seq", "int"), ("_commit_version", "int")],
    # aggregate maintained ONLY from the change feed == oracle's full recompute
    "pipeline_incremental_agg": [("o_orderstatus", "str"), ("n_rows", "int"), ("total_cents", "int")],
    # commit-ordinal time travel on a bucket-pruned table (pre-DDL schema)
    "pipeline_time_travel": [("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"), ("o_total_cents", "int")],
    # CDF-maintained secondary index: build -> merge -> refresh -> probe
    "table_index_lookup": [("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"), ("o_totalprice", "dbl"), ("o_orderdate", "ts"), ("o_orderpriority", "str")],
    # change feed read ACROSS a RENAME barrier un-re-seeded (field ids)
    "pipeline_rename_continuity": [("o_orderkey", "int"), ("o_custkey", "int"), ("o_status", "str"), ("o_total_cents", "int"), ("_change_type", "str"), ("_commit_seq", "int"), ("_commit_version", "int"), ("via", "str")],
    # MIN/MAX maintained aggregate across extremum-deleting changes
    "pipeline_incremental_minmax": [("o_orderstatus", "str"), ("n_rows", "int"), ("total_cents", "int"), ("min_cents", "int"), ("max_cents", "int")],
    # range-layout secondary index: zone-pruned value buckets, BETWEEN probe
    "table_index_range_lookup": [("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"), ("o_totalprice", "dbl"), ("o_orderdate", "ts"), ("o_orderpriority", "str"), ("probe", "str")],
    # JOIN rollup maintained from TWO change feeds (ΔF⋈D_old ∪ F_new⋈ΔD)
    "pipeline_incremental_join_agg": [("o_orderpriority", "str"), ("c_mktsegment", "str"), ("n_rows", "int"), ("total_cents", "int")],
    # two-dim STAR rollup maintained from THREE feeds (telescoped delta)
    "pipeline_star_join_agg": [("p_brand", "str"), ("s_nationkey", "int"), ("n_rows", "int"), ("qty_sum", "int"), ("cents_sum", "int")],
    # SNOWFLAKE chain: nation joins on CUSTOMER's attribute (ownership)
    "pipeline_snowflake_join_agg": [("c_mktsegment", "str"), ("n_name", "str"), ("n_rows", "int"), ("total_cents", "int")],
    # MIN/MAX over the join view — dirty-group rescan through the join
    "pipeline_join_minmax": [("c_mktsegment", "str"), ("n_rows", "int"), ("total_cents", "int"), ("min_cents", "int"), ("max_cents", "int")],
    # TPC-H Q1 maintained: WHERE-filtered view, exact integer-div averages
    "pipeline_maintained_q1": [("l_returnflag", "str"), ("l_linestatus", "str"), ("n_rows", "int"), ("sum_qty", "int"), ("sum_base_cents", "int"), ("sum_disc_price", "int"), ("sum_charge", "int"), ("avg_qty_milli", "int"), ("avg_price_milli", "int"), ("avg_disc_milli", "int")],
    # TPC-H Q3 maintained: chain join + fact/dim WHEREs, top-10 read
    "pipeline_maintained_q3": [("l_orderkey", "int"), ("o_orderdate", "ts"), ("o_orderpriority", "str"), ("revenue_c", "int")],
    # TPC-H Q13 composed: maintained keyed counts + left-join read
    "pipeline_maintained_q13": [("c_count", "int"), ("custdist", "int")],
    # TPC-H Q16 live: COUNT(DISTINCT supplier) THROUGH the join, support
    # multiset maintained from the signed star delta terms
    "pipeline_maintained_q16": [("p_brand", "str"), ("p_size", "int"), ("n_rows", "int"), ("supplier_cnt", "int")],
    # heavy hitters through the join, probed from the SAME Q16 store
    "pipeline_q16_top_suppliers": [("p_brand", "str"), ("p_size", "int"), ("l_suppkey", "int"), ("n_rows_v", "int"), ("rank", "int")],
    # TPC-H Q5 live: six-table snowflake at depth 3 with the cross-dim
    # c_nationkey = s_nationkey join_where and the region σ
    "pipeline_maintained_q5": [("n_name", "str"), ("n_rows", "int"), ("revenue_c", "int")],
    # TPC-H Q7 live: DERIVED year-grain group key (fact_derived_cols)
    # over a chained 4-feed star; nation-pair σ + names resolve at read
    "pipeline_maintained_q7": [("supp_nation", "str"), ("cust_nation", "str"), ("ship_year", "int"), ("n_lineitems", "int"), ("revenue_cents", "int")],
    # Q7 name cube with nation in TWO ROLES (one table, one feed, two
    # renamed join slots); nation renames relabel through both roles
    "pipeline_maintained_q7_roles": [("supp_nation", "str"), ("cust_nation", "str"), ("ship_year", "int"), ("n_rows", "int"), ("revenue_cents", "int")],
    # TPC-H Q12 live: conditional-count EXPRESSION measures over the
    # dim attribute, maintained exactly through priority flips
    "pipeline_maintained_q12": [("l_linestatus", "str"), ("n_rows", "int"), ("high_lines", "int"), ("low_lines", "int")],
    # TPC-H Q14 live: derived cents measure + dim-attr CASE split;
    # PROMO flips move revenue between the maintained measures
    "pipeline_maintained_q14": [("n_lines", "int"), ("promo_revenue_cents", "int"), ("total_revenue_cents", "int")],
    # TPC-H Q15 composed: maintained per-supplier σ-window revenue +
    # rank-1 argmax and name join at read
    "pipeline_maintained_q15": [("s_suppkey", "int"), ("s_name", "str"), ("total_revenue_cents", "int")],
    # cross-engine-exact HyperLogLog (registers + scaled harmonic sum
    # are BIGINTs; est_raw is one IEEE divide — bit-identical doubles)
    "approx_distinct_hll": [("o_orderpriority", "str"), ("n_exact", "int"), ("used_buckets", "int"), ("hsum_scaled", "int"), ("est_raw", "dbl")],
    # HLL as derived state: insert-only max-fold + delete-triggered
    # register recount, both asserted in-row
    "pipeline_maintained_hll": [("o_orderpriority", "str"), ("used_buckets", "int"), ("hsum_scaled", "int"), ("est_raw", "dbl")],
    # registers max-merged to the GLOBAL grain, no base scan; oracle
    # builds the coarse sketch directly -> bit-equal merge proof
    "pipeline_hll_rollup": [("used_buckets", "int"), ("hsum_scaled", "int"), ("est_raw", "dbl")],
    "pipeline_hll_union": [("used_buckets", "int"), ("hsum_scaled", "int"), ("est_raw", "dbl")],
    # KMV (k-minimum-values): the set-algebra distinct tier — retained
    # k-min hashes are cross-engine-exact BIGINTs; union merge is
    # bit-equal to a direct build; intersection is the theta-overlap
    # estimate neither HLL nor the exact store can answer from state
    "approx_distinct_kmv": [("o_orderpriority", "str"), ("n_exact", "int"), ("n_hashes", "int"), ("theta", "int"), ("est_raw", "dbl")],
    "pipeline_maintained_kmv": [("o_orderpriority", "str"), ("n_hashes", "int"), ("theta", "int"), ("est_raw", "dbl")],
    "pipeline_kmv_union": [("n_hashes", "int"), ("theta", "int"), ("est_raw", "dbl")],
    "pipeline_kmv_intersection": [("n_union", "int"), ("theta", "int"), ("rho", "int"), ("est_raw", "dbl")],
    # contamination triage: train/eval distinct shared-4-gram volume
    # from two KMV states (theta overlap), next to the exact intersect
    "text_contamination_kmv": [("n_exact", "int"), ("n_union", "int"), ("theta", "int"), ("rho", "int"), ("est_raw", "dbl")],
    "pipeline_kmv_difference": [("n_union", "int"), ("theta", "int"), ("rho", "int"), ("est_raw", "dbl")],
    # quantiles over a live+archive bag-union from two maintained
    # histograms (bins add across tables)
    "pipeline_quantile_union": [("q_milli", "int"), ("rank", "int"), ("total", "int"), ("bin_lo", "int"), ("bin_hi", "int")],
    # cross-table snapshot pinned to one source TSO fence: both tables'
    # ts<=fence changes visible, both later fences not — no torn join
    "pipeline_consistent_snapshot": [("c_mktsegment", "str"), ("n_orders", "int"), ("revenue_cents", "int")],
    # derived state AT the fence: the pinned view version covers exactly
    # the pinned orders commit even though the live view folded past it
    "pipeline_consistent_snapshot_view": [("ckbucket", "int"), ("n_rows", "int"), ("revenue_cents", "int")],
    # approximate-quantile tier: maintained integer histogram; the
    # signed count fold handles deletes with NO recount; rank/total/bin
    # bounds are pure integers incl. the oracle's cumulative walk
    "pipeline_quantile_sketch": [("o_orderpriority", "str"), ("q_milli", "int"), ("rank", "int"), ("total", "int"), ("bin_lo", "int"), ("bin_hi", "int")],
    "pipeline_maintained_cms": [("o_orderpriority", "str"), ("o_custkey", "int"), ("est", "int")],
    "pipeline_cms_rollup": [("o_custkey", "int"), ("est", "int")],
    # join-cardinality + F2 skew statistics from two maintained CM
    # counter states (inner product), next to the exact join count
    "pipeline_cms_join_size": [("n_exact_join", "int"), ("est_join_size", "int"), ("est_f2", "int")],
    # turnstile heavy-hitter ENUMERATION from the dyadic CM state: the
    # descent NAMES every value >= threshold (decay + growth exercised);
    # the oracle replays all 8 levels and the descent as chained CTEs
    "pipeline_cms_heavy_hitters": [("prio", "str"), ("v", "int"), ("est", "int")],
    # range selectivity (BETWEEN counts) from the same dyadic state:
    # canonical-cover node sums, never an underestimate; the oracle
    # embeds the identical node set
    "pipeline_cms_range_count": [("prio", "str"), ("lo", "int"), ("hi", "int"), ("est", "int")],
    # STRING-domain heavy hitters: value<->dense-id dictionary as
    # derived state feeding a 4-level dyadic tree; the oracle replays
    # the dictionary slices, counters, descent, and decode join
    "pipeline_cms_string_topk": [("prio", "str"), ("v", "str"), ("est", "int")],
    # quantiles by rank WALK down the same dyadic prefix tree (no
    # bin-width parameter); the oracle replays totals, clamps, and the
    # per-level cumsum pick as chained CTEs
    "pipeline_cms_quantile": [("prio", "str"), ("q_milli", "int"), ("rank", "int"), ("total", "int"), ("value", "int"), ("est", "int")],
    # BETWEEN selectivity bracketed from the maintained bins: full-bin
    # sum (est_lo) vs +edge-bins (est_hi); oracle recomputes both sums
    "pipeline_quantile_range": [("o_orderpriority", "str"), ("lo", "int"), ("hi", "int"), ("est_lo", "int"), ("est_hi", "int")],
    # global quantiles merged from the per-priority bins (counts add);
    # oracle recomputes the coarse histogram + walk directly
    "pipeline_quantile_rollup": [("q_milli", "int"), ("rank", "int"), ("total", "int"), ("bin_lo", "int"), ("bin_hi", "int")],
    # time-bucketed live rollup: derived month grain + second-moment
    # expression measure on the single-table maintained aggregate
    "pipeline_maintained_monthly": [("month", "ts"), ("n_rows", "int"), ("revenue_cents", "int"), ("rev_dollars_sq", "int")],
    # TPC-H Q6 live: sigma-view with double-typed bounds + expression
    # revenue measure, scalar read over the 3-row state
    "pipeline_maintained_q6": [("n_lineitems", "int"), ("revenue_cents", "int")],
    # TPC-H Q19 live: the three-branch disjunction as a join_where
    "pipeline_maintained_q19": [("n_lineitems", "int"), ("revenue_cents", "int")],
    # TPC-H Q4 composed: maintained per-order returned-line counts +
    # the date-window semi-join at read
    "pipeline_maintained_q4": [("o_orderpriority", "str"), ("n_orders", "int")],
    # TPC-H Q22 composed: live positive-balance scalar (derived sign
    # flag) + per-customer recent-order counts, anti-joined at read
    "pipeline_maintained_q22": [("c_nationkey", "int"), ("n_cust", "int"), ("total_bal_cents", "int")],
    # TPC-H Q8 live: 7-table snowflake cube at (date x supp_nation)
    # grain, two dim sigmas; year rollup + share split at read
    "pipeline_maintained_q8": [("o_year", "int"), ("nation_rev_cents", "int"), ("total_rev_cents", "int")],
    # TPC-H Q17 composed, INDEX-ACCELERATED: live per-part qty rollup +
    # SecondaryIndex probe + bucket-pruned fact read (no fact scan)
    "pipeline_maintained_q17": [("p_brand", "str"), ("n_small", "int"), ("revenue_cents", "int")],
    # TPC-H Q9 live (closes the 22): (nation, o_year) profit cube over
    # the five-feed snowflake; supply cost is a deterministic
    # fact-derived integer expression (no partsupp in TESTDATA); the
    # fixture raises unless churn flips some group's profit SIGN
    "pipeline_maintained_q9": [("nation", "str"), ("o_year", "int"), ("n_rows", "int"), ("profit_c", "int")],
    # TPC-H Q11 live: chained-sigma value rollup; the global threshold
    # derives from the view's own state at read
    "pipeline_maintained_q11": [("l_partkey", "int"), ("value_cents", "int")],
    # TPC-H Q21 composed: two maintained distinct views (one sigma-
    # filtered) + the culprit identity from the support store's top-1
    "pipeline_maintained_q21": [("s_suppkey", "int"), ("s_name", "str"), ("numwait", "int")],
    # TPC-H Q2 composed: pair-grain maintained cost rollup + sigma-part
    # restricted argmin window at read
    "pipeline_maintained_q2": [("p_partkey", "int"), ("p_brand", "str"), ("s_name", "str"), ("cost_cents", "int")],
    # TPC-H Q20 live: fact sigma window + dim LIKE sigma that part
    # renames cross in both directions
    "pipeline_maintained_q20": [("s_suppkey", "int"), ("s_name", "str"), ("qty_shipped", "int")],
    # TPC-H Q10 live: fact σ + dim σ, customer-cardinality dim group key
    "pipeline_maintained_q10": [("c_custkey", "int"), ("c_name", "str"), ("revenue_c", "int")],
    # TPC-H Q18 composed: maintained per-order qty rollup + HAVING/joins at read
    "pipeline_maintained_q18": [("c_name", "str"), ("o_custkey", "int"), ("o_orderkey", "int"), ("o_orderdate", "ts"), ("totalprice_cents", "int"), ("qty_cents", "int")],
    # maintained BM25: inverted index as derived state (postings + doc
    # lengths folded ± from the feed; query reads probed term buckets)
    "pipeline_maintained_bm25": [("doc_id", "int"), ("score_q", "int"), ("n_terms", "int")],
    # self-healing stream supervision: mid-run RENAME + widening barriers
    # healed by same-checkpoint restarts (the query raises if no heal ran)
    "pipeline_stream_selfheal": [("o_orderstatus", "str"), ("n_rows", "int"), ("total_cents", "int")],
    # exact COUNT(DISTINCT) via the bucket-partitioned support multiset
    "pipeline_incremental_distinct": [("o_orderpriority", "str"), ("n_rows", "int"), ("n_cust", "int"), ("n_status", "int")],
    # heavy hitters probed from the SAME maintained support store
    "pipeline_distinct_topk": [("o_orderpriority", "str"), ("o_custkey", "int"), ("cnt", "int"), ("rank", "int")],
    # exact maintained per-group quantiles (integer ceil-div thresholds)
    "pipeline_distinct_quantile": [("o_orderpriority", "str"), ("q_label", "str"), ("cents", "int")],
    "q_bloom_point_lookup": [("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderdate", "ts"), ("totalprice_cents", "int")],
    "q_local_supplier_revenue": [("n_name", "str"), ("n_lineitems", "int"), ("revenue_cents", "int")],
    "q_volume_shipping": [("supp_nation", "str"), ("cust_nation", "str"), ("ship_year", "int"), ("n_lineitems", "int"), ("revenue_cents", "int")],
    "q_priority_semijoin_counts": [("o_orderpriority", "str"), ("n_orders", "int")],
    "q_custdist": [("c_count", "int"), ("custdist", "int")],
    "q_brand_supplier_counts": [("p_brand", "str"), ("p_size", "int"), ("supplier_cnt", "int")],
    "q_big_order_customers": [("c_name", "str"), ("o_custkey", "int"), ("o_orderkey", "int"), ("o_orderdate", "ts"), ("totalprice_cents", "int"), ("qty_cents", "int")],
    "q_min_cost_supplier": [("p_partkey", "int"), ("p_brand", "str"), ("s_name", "str"), ("cost_cents", "int")],
    "events_funnel_counts": [("stage", "int"), ("n_users", "int")],
    "events_weekly_cohort_retention": [("cohort", "ts"), ("week_offset", "int"), ("n_users", "int")],
    "q_idle_rich_customers": [("c_nationkey", "int"), ("n_cust", "int"), ("total_bal_cents", "int")],
    # TPC-H completion: the ten shapes finishing the canonical 22
    "q6_forecast_revenue": [("n_lineitems", "int"), ("revenue_cents", "int")],
    "q8_market_share": [("o_year", "int"), ("nation_rev_cents", "int"), ("total_rev_cents", "int")],
    "q10_returned_items": [("c_custkey", "int"), ("c_name", "str"), ("revenue_cents", "int")],
    "q11_important_stock": [("l_partkey", "int"), ("value_cents", "int")],
    "q12_linestatus_priority": [("l_linestatus", "str"), ("high_lines", "int"), ("low_lines", "int")],
    "q14_promo_revenue": [("promo_revenue_cents", "int"), ("total_revenue_cents", "int")],
    "q15_top_supplier": [("s_suppkey", "int"), ("s_name", "str"), ("total_revenue_cents", "int")],
    "q19_discounted_revenue": [("n_lineitems", "int"), ("revenue_cents", "int")],
    "q20_widget_suppliers": [("s_suppkey", "int"), ("s_name", "str"), ("qty_shipped", "int")],
    "q21_waiting_suppliers": [("s_suppkey", "int"), ("s_name", "str"), ("numwait", "int")],
}

# Similarity/dedup leftovers: the four entries round 3 excluded from the
# driver surface with argued equivalence, now driver-visible per-member,
# plus the high-recall (3-table) LSH-blocked near-dup variant (the exact
# all-pairs kernels are pytest-only sf0.001 cross-checks — no registered
# row collects the corpus) and the
# round-4 product-quantization family (raw PQ + residual IVF-PQ).  The
# two float-path members (float cosine top-k, LSH bucketed top-k) are
# membership-checked on (query_id, neighbor_id): their id sets are stable
# because score gaps at the k boundary are orders of magnitude above float
# accumulation error, while the scores themselves are not required to be
# bit-identical cross-engine.
SIMILARITY_SPEC: dict[str, list[tuple[str, str]]] = {
    "dedup_minhash_signature": [("doc_id", "int"), ("hash_idx", "int"), ("minhash", "int")],
    "dedup_simhash": [("doc_id", "int"), ("simhash", "int")],
    "sim_topk_cosine": [("query_id", "int"), ("neighbor_id", "int")],
    "sim_lsh_bucketed_topk": [("query_id", "int"), ("neighbor_id", "int")],
    "sim_embedding_near_dup": [("id_a", "int"), ("id_b", "int"), ("qcos", "dbl")],
    # product quantization: training + ADC rank are integer-exact
    "emb_pq_codebooks": [("sub", "int"), ("code", "int"), ("pos", "int"), ("centroid_q", "int"), ("code_n", "int")],
    "sim_pq_topk": [("query_id", "int"), ("neighbor_id", "int"), ("dist", "int"), ("rank", "int")],
    # residual IVF-PQ: cells + residual Lloyd + codes + ADC, one composed oracle
    "sim_ivfpq_topk": [("query_id", "int"), ("neighbor_id", "int"), ("dist", "int"), ("rank", "int")],
    # continuous near-dup against the persisted signature store
    "dedup_incremental_minhash": [("phase", "int"), ("id_a", "int"), ("id_b", "int"), ("n_sig_matches", "int")],
    # cross-batch SemDeDup vs the persisted survivor store (frozen
    # centroids; store-then-batch precedence; exact two-phase oracle)
    "dedup_incremental_semdedup": [("vec_id", "int"), ("cluster", "int"), ("csim", "dbl"), ("phase", "int"), ("kept", "bool")],
    "sim_ivfpq_recall_eval": [("query_id", "int"), ("n_hits", "int"), ("k", "int")],
    # ANN index as derived state: maintained through a delete/update/
    # insert-bearing merge, fingerprinted on ids + rank (float score
    # drives the rank; the rank itself is the cross-engine contract)
    "sim_ivf_derived_refresh": [("query_id", "int"), ("neighbor_id", "int"), ("rank", "int")],
    # distributed ANN join: table-sized query side, shuffle join on cell
    "sim_ivf_topk_join": [("query_id", "int"), ("neighbor_id", "int"), ("rank", "int")],
    # SemDeDup: k-means blocking + within-cluster cosine survivor rule
    "sem_dedup_keep": [("vec_id", "int"), ("cluster", "int"), ("csim", "dbl"), ("kept", "bool")],
    # compressed ANN as derived state: PQ codes refreshed from the CDF
    "sim_ivfpq_derived_refresh": [("query_id", "int"), ("neighbor_id", "int"), ("dist", "int"), ("rank", "int")],
}

# Legacy fake-format multimodal plumbing rows (UTF-8 bytes standing in for
# blobs), folded into one suite row when the real-codec rows
# (mm_ppm_decode_features / mm_ppm_resize_features / mm_wav_energy) took
# their individual driver slots.  mean_byte is one IEEE divide — bit-
# identical across engines, so the dbl quantization is exact.
MULTIMODAL_SPEC: dict[str, list[tuple[str, str]]] = {
    "mm_image_features": [("doc_id", "int"), ("n_bytes", "int"), ("mean_byte", "dbl")],
    "mm_resize_then_features": [("doc_id", "int"), ("n_bytes", "int"), ("mean_byte", "dbl")],
    "mm_audio_energy": [("doc_id", "int"), ("n_windows", "int")],
    "mm_video_frame_sample": [("doc_id", "int"), ("frame_idx", "int")],
    # real zlib-PNG decode (integer channel sums — all-int fingerprint)
    "mm_png_decode_features": [
        ("doc_id", "int"), ("width", "int"), ("height", "int"),
        ("n_pixels", "int"), ("sum_r", "int"), ("sum_g", "int"), ("sum_b", "int"),
    ],
    # real gzip inflate verified by md5 of the decompressed text
    "mm_gzip_text_roundtrip": [
        ("doc_id", "int"), ("n_chars", "int"), ("n_tokens", "int"),
        ("text_md5", "str"),
    ],
}

SAMPLING_SPEC: dict[str, list[tuple[str, str]]] = {
    "split_train_test": [("doc_id", "int"), ("split", "str")],
    "sample_stratified_by_lang": [("doc_id", "int"), ("lang", "str")],
    "sample_cap_per_source": [("doc_id", "int"), ("source", "str"), ("sample_rank", "int")],
    "split_by_source_group": [("doc_id", "int"), ("source", "str"), ("split", "str")],
    "sample_token_budget_per_source": [("doc_id", "int"), ("source", "str"), ("n_tokens", "int"), ("cum_tokens", "int")],
}


# -- Spark side --------------------------------------------------------------
def _spark_raw(col: str, kind: str):
    c = F.col(col)
    if kind == "int" or kind == "bool":
        return c.cast("long")
    if kind == "str":
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    if kind == "dbl":
        return F.floor(c.cast("double") * 1000000.0 + F.lit(0.5)).cast("long")
    if kind == "ts":
        return F.unix_micros(c.cast("timestamp"))
    raise ValueError(f"unknown fingerprint kind {kind!r}")


def _spark_row_fp(spec: list[tuple[str, str]]):
    terms = []
    for i, (col, kind) in enumerate(sorted(spec)):
        col_fp = F.pmod(F.coalesce(_spark_raw(col, kind), F.lit(_NULL_FP)), F.lit(_M))
        terms.append(F.pmod(col_fp * F.lit(_WEIGHTS[i]), F.lit(_M)))
    return F.pmod(reduce(lambda a, b: a + b, terms), F.lit(_M))


def suite_query(spec_by_member: dict[str, list[tuple[str, str]]], registry):
    """Build the suite callable: one (query, n_rows, checksum) row per
    member.  Members run as independent subplans of one union job."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        outs = []
        for name in sorted(spec_by_member):
            spec = spec_by_member[name]
            df = registry[name](spark, sf_dir)
            missing = {c for c, _ in spec} - set(df.columns)
            if missing:
                raise RuntimeError(f"{name}: fingerprint spec drift, missing {missing}")
            outs.append(
                df.select(_spark_row_fp(spec).alias("row_fp"))
                .agg(
                    F.count("*").alias("n_rows"),
                    F.coalesce(F.sum("row_fp"), F.lit(0)).cast("long").alias("checksum"),
                )
                .select(F.lit(name).alias("query"), "n_rows", "checksum")
            )
        return reduce(lambda a, b: a.unionByName(b), outs)

    return run


# -- DuckDB side -------------------------------------------------------------
def _dk_raw(col: str, kind: str) -> str:
    if kind == "int" or kind == "bool":
        return f"CAST({col} AS BIGINT)"
    if kind == "str":
        return f"('0x'||substr(md5({col}),1,15))::BIGINT"
    if kind == "dbl":
        return f"CAST(FLOOR(CAST({col} AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"
    if kind == "ts":
        return f"epoch_us({col})"
    raise ValueError(f"unknown fingerprint kind {kind!r}")


def _dk_row_fp(spec: list[tuple[str, str]]) -> str:
    terms = []
    for i, (col, kind) in enumerate(sorted(spec)):
        col_fp = f"(((COALESCE({_dk_raw(col, kind)}, {_NULL_FP}) % {_M}) + {_M}) % {_M})"
        terms.append(f"(({col_fp} * {_WEIGHTS[i]}) % {_M})")
    return f"(({' + '.join(terms)}) % {_M})"


def suite_oracle(spec_by_member: dict[str, list[tuple[str, str]]], oracles: dict[str, str]) -> str:
    parts = []
    for name in sorted(spec_by_member):
        spec, member_sql = spec_by_member[name], oracles[name]
        parts.append(
            f"SELECT '{name}' AS query, COUNT(*) AS n_rows,\n"
            f"       CAST(COALESCE(SUM(row_fp), 0) AS BIGINT) AS checksum\n"
            f"FROM (SELECT {_dk_row_fp(spec)} AS row_fp FROM ({member_sql}) __m) __f"
        )
    return "\nUNION ALL\n".join(parts)
