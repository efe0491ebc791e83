"""Analytic-breadth queries: rollup aggregation, top-k per group, integer
discrete quantiles, vocabulary build, as-of join, bucketed range join.

Beyond SURVEY.md §2 parity (the reference computes no aggregates at all —
§2.4), these exercise the analytic surface a warehouse user of the
reference would run on the replicated tables, each with a DuckDB oracle.
All money/measure sums are integer cents and all rank/quantile math is
pure-integer so cross-engine results are bit-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .fixtures import read_table
from .operators.asof import asof_join
from .operators.rangejoin import range_count_join

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Rollup aggregation — subtotals + grand total in one pass
# ---------------------------------------------------------------------------
@register(
    "q_rollup_priority_status",
    """
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority, o_orderstatus) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(priority, status): Spark plans one Expand + one hash agg —
    subtotal rows ride the same shuffle as the leaf groups (no re-scan
    per grouping set)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus").agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")).alias(
                "revenue_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Top-k per group — rank window over a pre-aggregated frame
# ---------------------------------------------------------------------------
@register(
    "q_top3_customers_per_nation",
    """
WITH rev AS (
  SELECT c.c_nationkey, c.c_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_nationkey, c_custkey, revenue_cents,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY c_nationkey ORDER BY revenue_cents DESC, c_custkey) AS rnk
  FROM rev
) WHERE rnk <= 3
""",
)
def q_top3_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join → partial-agg'd groupBy → per-nation rank ≤ 3.
    The window runs over the aggregated (nation, customer) frame — orders
    of magnitude smaller than the fact — and the rank filter prunes
    before anything downstream."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    rev = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")).alias(
                "revenue_cents"
            )
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue_cents").desc(), F.col("c_custkey")
    )
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "revenue_cents", "rnk")
    )


# ---------------------------------------------------------------------------
# Discrete quantiles — pure-integer rank targets (ceil(q·n) as (a·n+a)//b)
# so both engines pick identical elements; no float interpolation at all
# ---------------------------------------------------------------------------
@register(
    "q_doclen_quantiles_by_lang",
    """
WITH ranked AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       max(CASE WHEN rn = (n + 3) // 4 THEN n_chars END) AS p25,
       max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50,
       max(CASE WHEN rn = (3 * n + 3) // 4 THEN n_chars END) AS p75,
       max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90
FROM ranked GROUP BY lang
""",
)
def q_doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language discrete quantiles of document length: one window pass
    (single exchange on lang) + conditional agg — never materializes a
    sorted global copy."""
    docs = read_table(spark, sf_dir, "documents").select("lang", "n_chars", "doc_id")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = docs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )

    def at(num: int, den: int):
        # rank target ceil(num·n / den) computed as (num·n + den-1) DIV den
        target = F.floor((F.lit(num) * F.col("n") + (den - 1)) / den)
        return F.max(F.when(F.col("rn") == target, F.col("n_chars")))

    return ranked.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        at(1, 4).alias("p25"),
        at(1, 2).alias("p50"),
        at(3, 4).alias("p75"),
        at(9, 10).alias("p90"),
    )


# ---------------------------------------------------------------------------
# Vocabulary build — token frequencies, deterministic global top-k
# ---------------------------------------------------------------------------
@register(
    "text_vocab_top_terms",
    """
WITH tokens AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents
), counts AS (
  SELECT term, count(*) AS n FROM tokens WHERE term <> '' GROUP BY term
)
SELECT term, CAST(n AS BIGINT) AS n
FROM counts
QUALIFY row_number() OVER (ORDER BY n DESC, term) <= 200
""",
)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocab build: explode→count partial-aggregates before the
    shuffle (the exchange carries (term, partial_n), not tokens), then a
    total-ordered top-200 over the vocab-sized frame."""
    docs = read_table(spark, sf_dir, "documents").select("text")
    counts = (
        docs.select(
            F.explode_outer(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    return counts.orderBy(F.col("n").desc(), "term").limit(200)


# ---------------------------------------------------------------------------
# PII scrub — inject deterministic fake PII (the synthetic corpus has none),
# then count + redact; exercises cross-engine regex parity
# ---------------------------------------------------------------------------
@register(
    "text_redact_pii",
    r"""
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || doc_id || '@example.com or 555-123-4567'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
       regexp_replace(
         regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
         '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS clean
FROM tagged
""",
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub pass: count then placeholder-replace emails/phones.  Pure
    regexp codegen expressions — shuffle-free scan."""
    from .functions.text import pii_counts, redact_pii

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tagged = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-123-4567"),
            ),
        ).otherwise(F.col("text")),
    )
    counts = pii_counts(F.col("text"))
    return tagged.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        redact_pii(F.col("text")).alias("clean"),
    )


# ---------------------------------------------------------------------------
# Repetition stats — boilerplate/spam signal, zero-shuffle fold
# ---------------------------------------------------------------------------
@register(
    "text_repetition_stats",
    """
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
  FROM documents
), f AS (
  SELECT doc_id, w, count(*) AS c FROM words WHERE w <> '' GROUP BY doc_id, w
)
SELECT doc_id, CAST(max(c) AS INT) AS top_word_count, CAST(sum(c) AS INT) AS n_words
FROM f GROUP BY doc_id
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest single-word count + word total per doc — the oracle uses
    the explode→groupBy formulation; the Spark side folds each row's
    sorted word array in place (no shuffle at all)."""
    from .functions.text import repetition_stats

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select("doc_id", repetition_stats(F.col("text")).alias("s")).select(
        "doc_id", "s.top_word_count", "s.n_words"
    )


# ---------------------------------------------------------------------------
# Multi-table join chain — fact → orders → customer → nation → region
# ---------------------------------------------------------------------------
@register(
    "q_revenue_by_nation",
    """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table join chain rolled up to nation.  The fact side stays
    unshuffled until the final small-keyed agg: orders is the only
    non-broadcastable dim at scale (it shuffles on orderkey with the
    fact), customer and nation broadcast — Catalyst + AQE pick that
    shape from the declarative plan, and the revenue expression is
    integer cents so the rollup is order-independent exact."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(cents).alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# 5-table chain through region — every testdata table is now covered by
# at least one registered query
# ---------------------------------------------------------------------------
@register(
    "q_revenue_by_region",
    """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table chain rolled up to region (same broadcast-dim shape as
    q_revenue_by_nation, one level deeper)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_regionkey"
    )
    region = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(cents).alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-mitigated join — the salting pattern as a first-class operator
# ---------------------------------------------------------------------------
@register(
    "q_skew_salted_supplier_revenue",
    """
SELECT s.s_nationkey,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
)
def q_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join through ``operators.skew.salted_join``: the fact side
    scatters each suppkey across 8 salt sub-keys and the dim side is
    exploded 8×, so one hot supplier's rows land on 8 reducers instead of
    one.  Result-equivalent to the plain join (the dim key is unique, so
    each fact row matches exactly once, on its own salt) — which is
    exactly what the oracle checks.  Use this shape when a profile shows
    one join key dominating a reducer and the dim is too big to broadcast
    yet cheap to replicate R times."""
    from .operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select("s_suppkey", "s_nationkey")
        .withColumnRenamed("s_suppkey", "l_suppkey")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        salted_join(li, supp, on=["l_suppkey"], num_salts=8)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(cents).alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Star join — fact against three broadcast dims (part, supplier, nation)
# ---------------------------------------------------------------------------
@register(
    "q_brand_revenue_by_supp_nation",
    """
SELECT n.n_name, p.p_brand,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name, p.p_brand
""",
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped star join: the fact scans once through three
    broadcast dim joins (part, supplier, nation — all small relative to
    the fact at any SF) and shuffles only the (nation, brand) partial
    aggregates."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "p_brand")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(cents).alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# EXISTS / semi-join — orders having at least one returned lineitem
# ---------------------------------------------------------------------------
@register(
    "q_orders_with_returns",
    """
SELECT o.o_orderkey, o.o_orderstatus,
       CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS totalprice_cents
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
""",
)
def q_orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join.  The subquery side is filtered and
    pruned to the join key before the join, so the semi-join build input
    is distinct orderkeys of returned items — and Spark's runtime bloom
    filter can push that set into the orders scan."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    returned = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100.0).cast("long").alias("totalprice_cents"),
    )


# ---------------------------------------------------------------------------
# Lead/lag — per-user interarrival gaps (integer microseconds: exact sums)
# ---------------------------------------------------------------------------
@register(
    "events_user_interarrival",
    """
WITH d AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
FROM d WHERE gap_us IS NOT NULL GROUP BY user_id
""",
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap stats between consecutive events — lag window then
    aggregate.  One exchange on user_id shared by the window and the
    groupBy (same partitioning, Catalyst reuses it); gaps are integer
    microseconds so min/max/sum are order-independent exact."""
    events = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").alias("sum_gap_us"),
    )


# ---------------------------------------------------------------------------
# Distinct aggregation — two-phase partial distinct under one shuffle
# ---------------------------------------------------------------------------
@register(
    "events_distinct_users_by_type",
    """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
""",
)
def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group: Spark plans Expand + two-phase
    aggregation, deduping (type, user) partially before the exchange —
    the shuffle carries distinct pairs, not events."""
    events = read_table(spark, sf_dir, "events").select("event_type", "user_id")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Embedding label centroids — integer-quantized element sums (exact)
# ---------------------------------------------------------------------------
@register(
    "emb_label_centroid_sums",
    """
WITH q AS (
  SELECT label,
         [(round(CAST(embedding[i] AS DOUBLE)*1000000))::BIGINT
          for i in range(1, len(embedding)+1)] AS qv
  FROM embeddings
),
x AS (SELECT label, unnest(qv) AS qval,
             unnest(generate_series(1, len(qv))) AS pos FROM q)
SELECT label, CAST(pos AS INT) AS pos, CAST(sum(qval) AS BIGINT) AS qsum,
       CAST(count(*) AS BIGINT) AS n
FROM x GROUP BY label, pos
""",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid accumulators (element-wise sum + count over the
    quantized vectors; centroid = qsum/n downstream).  posexplode →
    groupBy(label, pos) partial-aggregates each scan partition down to
    |labels|·dim cells before the one exchange — at 100 TB the shuffle
    carries centroid-sized partials, not vectors."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1_000_000).cast("long"),
        ).alias("qv"),
    )
    x = q.select("label", F.posexplode_outer("qv").alias("pos0", "qval"))
    return x.groupBy(
        "label", (F.col("pos0") + 1).cast("int").alias("pos")
    ).agg(F.sum("qval").alias("qsum"), F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# ntile + dense_rank — remaining ranking-function coverage in one pass
# ---------------------------------------------------------------------------
@register(
    "q_order_price_quartiles",
    """
SELECT o_orderkey, o_orderpriority,
       CAST(ntile(4) OVER (
         PARTITION BY o_orderpriority
         ORDER BY CAST(round(o_totalprice * 100.0) AS BIGINT), o_orderkey
       ) AS INT) AS quartile,
       CAST(dense_rank() OVER (
         PARTITION BY o_orderpriority
         ORDER BY CAST(round(o_totalprice * 100.0) AS BIGINT)
       ) AS BIGINT) AS price_rank
FROM orders
""",
)
def q_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) on a TOTAL order (o_orderkey tiebreak — tile boundaries
    are order-dependent, so determinism needs it) + dense_rank on cents
    alone (tie-insensitive, equal prices share a rank).  Same partition
    key → one exchange feeding both window sorts."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    w_total = Window.partitionBy("o_orderpriority").orderBy(cents, F.col("o_orderkey"))
    w_price = Window.partitionBy("o_orderpriority").orderBy(cents)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w_total).alias("quartile"),
        F.dense_rank().over(w_price).alias("price_rank"),
    )


# ---------------------------------------------------------------------------
# Running-total window — explicit ROWS frame spec
# ---------------------------------------------------------------------------
@register(
    "q_cumulative_revenue_per_customer",
    """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       AS cum_revenue_cents
FROM orders
""",
)
def q_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total — an explicit rowsBetween frame
    (every other window here uses the default frame).  One exchange on
    o_custkey; integer cents keep the running sum exact under any
    intra-frame order."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents).over(w).alias("cum_revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Pivot — event-type counts as columns (warehouse staple)
# ---------------------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_type_pivot",
    "SELECT user_id, "
    + ", ".join(
        f"CAST(count(CASE WHEN event_type = '{t}' THEN 1 END) AS BIGINT) AS {t}"
        for t in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id",
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a pinned value list, written as conditional aggregation.
    Two deliberate scale choices: pinning the values skips the distinct
    discovery scan ``pivot()`` needs without them, and the conditional-agg
    form plans ONE exchange on user_id — ``groupBy().pivot().count()``
    plans two (a (user, type) pre-aggregate, then the pivot re-aggregate),
    shuffling the same rows twice for nothing at this cardinality."""
    events = read_table(spark, sf_dir, "events").select("user_id", "event_type")
    return events.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(t)
            for t in EVENT_TYPES
        ]
    )


# ---------------------------------------------------------------------------
# Scalar subquery — orders above the global average price
# ---------------------------------------------------------------------------
@register(
    "q_orders_above_avg",
    """
SELECT o_orderkey, CAST(round(o_totalprice * 100.0) AS BIGINT) AS totalprice_cents
FROM orders
WHERE CAST(round(o_totalprice * 100.0) AS BIGINT) >
      (SELECT CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
              / count(*) FROM orders)
""",
)
def q_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: the 1-row global aggregate broadcasts into
    a cross join (no second scan shape — Spark plans the agg once).  The
    average is one BIGINT-sum / BIGINT-count division: exact IEEE in both
    engines."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    priced = orders.select("o_orderkey", cents.alias("totalprice_cents"))
    avg_row = priced.agg(
        (F.sum("totalprice_cents").cast("double") / F.count("*")).alias("avg_cents")
    )
    return (
        priced.crossJoin(F.broadcast(avg_row))
        .filter(F.col("totalprice_cents") > F.col("avg_cents"))
        .select("o_orderkey", "totalprice_cents")
    )


# ---------------------------------------------------------------------------
# JSON extraction — the reference maps TiDB json → STRING (bigquery
# types.go precedent); querying it back out is the warehouse-side op
# ---------------------------------------------------------------------------
@register(
    "events_json_extract_agg",
    """
SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY k
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a typed field from the JSON-as-string column and aggregate
    on it.  get_json_object is a codegen expression — the parse happens
    inside the scan stage, and only the extracted int reaches the
    shuffle."""
    events = read_table(spark, sf_dir, "events").select("props", "user_id")
    return events.select(
        F.get_json_object("props", "$.k").cast("int").alias("k"), "user_id"
    ).groupBy("k").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Boilerplate segments — cross-document segment-frequency dedup
# ---------------------------------------------------------------------------
@register(
    "text_boilerplate_segments",
    """
WITH tagged AS (
  SELECT doc_id, CASE WHEN doc_id % 4 = 0
       THEN 'subscribe to our newsletter today. ' || text ELSE text END AS text
  FROM documents),
segs AS (SELECT doc_id, unnest(string_split(text, '. ')) AS seg FROM tagged),
freq AS (SELECT seg, count(DISTINCT doc_id) AS seg_docs FROM segs GROUP BY seg)
SELECT s.doc_id, s.seg, CAST(f.seg_docs AS BIGINT) AS seg_docs,
       f.seg_docs >= 10 AS is_boilerplate
FROM segs s JOIN freq f USING (seg)
""",
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: a planted subscription prompt (the synthetic
    corpus has no natural boilerplate) must be flagged on every fourth
    doc while organic segments stay below the spread threshold.  See
    functions.dedup.boilerplate_flags."""
    from .functions.dedup import boilerplate_flags

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tagged = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("subscribe to our newsletter today. "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    return boilerplate_flags(tagged, "doc_id", "text", min_docs=10)


# ---------------------------------------------------------------------------
# As-of join — most recent prior click per purchase (union+window, no join)
# ---------------------------------------------------------------------------
@register(
    "events_asof_join",
    """
SELECT p.event_id, p.user_id, p.ts,
       c.event_id AS click_event_id, c.ts AS click_ts,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent click at or before
    it.  See operators/asof.py: one exchange on user_id, no join."""
    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click")
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols={"event_id": "click_event_id", "ts": "click_ts"},
    )
    return out.filter(F.col("click_event_id").isNotNull()).select(
        "event_id",
        "user_id",
        "ts",
        "click_event_id",
        "click_ts",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp"))
        ).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# Range join — clicks within 10 minutes before each error (bucketed equi-join)
# ---------------------------------------------------------------------------
@register(
    "events_range_join",
    """
SELECT e.event_id, e.user_id, e.ts,
       CAST(count(CASE WHEN c.user_id IS NOT NULL THEN 1 END) AS BIGINT)
         AS n_clicks_10m
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND epoch_us(c.ts) >= epoch_us(e.ts) - 600000000
 AND epoch_us(c.ts) <= epoch_us(e.ts)
GROUP BY e.event_id, e.user_id, e.ts
""",
)
def events_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks in the 10 minutes up to each error, same user.  See
    operators/rangejoin.py: time-bucket quantization turns the inequality
    predicate into an equi-join (no nested loop)."""
    events = read_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    return range_count_join(
        errors,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        window_seconds=600,
        count_alias="n_clicks_10m",
    )


# ---------------------------------------------------------------------------
# Window-function completion: lead, first_value, percent_rank, cume_dist
# ---------------------------------------------------------------------------
@register(
    "q_window_value_suite",
    """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_orderpriority,
       COALESCE(lead(cents) OVER w_total, -1) AS next_cents,
       first_value(o_orderkey) OVER w_total AS cheapest_key,
       percent_rank() OVER w_price AS price_pct_rank,
       cume_dist() OVER w_price AS price_cume_dist
FROM o
WINDOW w_total AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey),
       w_price AS (PARTITION BY o_orderpriority ORDER BY cents)
""",
)
def q_window_value_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset (lead), frame-start (first_value) and relative-position
    (percent_rank / cume_dist) window functions in one pass.  lead /
    first_value run on a TOTAL order (orderkey tiebreak — both are
    position-sensitive); percent_rank / cume_dist are tie-insensitive so
    they order on cents alone.  Both windows share the o_orderpriority
    partition key → one exchange, one sort (the tie-broken order is a
    superset of the cents order).  percent_rank = (rank-1)/(n-1) and
    cume_dist = peers/n are each a single IEEE division — bit-identical
    cross-engine."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    w_total = Window.partitionBy("o_orderpriority").orderBy(cents, F.col("o_orderkey"))
    w_price = Window.partitionBy("o_orderpriority").orderBy(cents)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.coalesce(F.lead(cents).over(w_total), F.lit(-1)).alias("next_cents"),
        F.first("o_orderkey").over(w_total).alias("cheapest_key"),
        F.percent_rank().over(w_price).alias("price_pct_rank"),
        F.cume_dist().over(w_price).alias("price_cume_dist"),
    )


# ---------------------------------------------------------------------------
# Set operations — INTERSECT / EXCEPT over customer key sets
# ---------------------------------------------------------------------------
@register(
    "q_customer_priority_setops",
    """
WITH u AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     l AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM u INTERSECT SELECT o_custkey FROM l)
UNION ALL
SELECT 'urgent_only' AS tag, o_custkey FROM (SELECT o_custkey FROM u EXCEPT SELECT o_custkey FROM l)
""",
)
def q_customer_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT with distinct set semantics (the oracle runs the
    literal set operators) — implemented as ONE scan + membership-flag
    aggregation.  ``df.intersect``/``df.subtract`` would compile each
    branch to its own distinct + semi/anti join, re-scanning the fact
    table four times; folding membership into per-key bools makes the
    whole query a single pushed-filter scan and a single o_custkey
    exchange, the same trick as the pivot.  Each key lands in exactly one
    arm (or neither), so the tagged union is a projection, not a join."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    flags = (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderpriority") == "1-URGENT").alias("u"),
            F.max(F.col("o_orderpriority") == "5-LOW").alias("l"),
        )
    )
    return (
        flags.withColumn(
            "tag",
            F.when(F.col("u") & F.col("l"), "both").when(F.col("u"), "urgent_only"),
        )
        .filter(F.col("tag").isNotNull())
        .select("tag", "o_custkey")
    )


# ---------------------------------------------------------------------------
# CUBE — all grouping-set slices of (priority, status) in one pass
# ---------------------------------------------------------------------------
@register(
    "q_cube_priority_status",
    """
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority, o_orderstatus) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(priority, status): the 2^2 grouping sets ride ONE Expand + one
    hash agg exchange, same shape as the rollup — the status-only slice is
    what ROLLUP can't produce."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")).alias(
            "revenue_cents"
        ),
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape — correlated per-part average, pure-integer comparison
# ---------------------------------------------------------------------------
@register(
    "q_small_qty_revenue_by_brand",
    """
WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents
  FROM lineitem
), stats AS (
  SELECT l_partkey, sum(q) AS sq, count(*) AS n FROM li GROUP BY l_partkey
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_small,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM li JOIN stats USING (l_partkey) JOIN part ON p_partkey = l_partkey
WHERE 5 * q * n < sq
GROUP BY p_brand
""",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity.  The correlated aggregate is a WINDOW over l_partkey — one
    exchange — where the textbook self-join (agg + re-join) would shuffle
    lineitem twice and join it to itself.  `qty < 0.2*avg` is rearranged
    to `5*q*n < sum_q`, all-integer, so no float average has to agree
    cross-engine.  part joins broadcast; the brand agg is the only other
    exchange."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100.0).cast("long").alias("cents"),
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_brand")
    w = Window.partitionBy("l_partkey")
    small = (
        li.withColumn("sq", F.sum("q").over(w))
        .withColumn("n", F.count("*").over(w))
        .filter(F.lit(5) * F.col("q") * F.col("n") < F.col("sq"))
    )
    return (
        small.join(F.broadcast(part), small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Calendar aggregation — month truncation + multi-measure agg
# ---------------------------------------------------------------------------
@register(
    "q_monthly_order_stats",
    """
SELECT date_trunc('month', o_orderdate) AS month,
       count(*) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY 1
""",
)
def q_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup: date_trunc to month + count/distinct/sum in one
    aggregation.  The distinct customer count plans the standard two-phase
    expand — both exchanges carry (month, custkey) pairs at most, never
    raw orders rows twice."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")).alias(
                "revenue_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Date-spine gap fill — zero rows for inactive (user, day) combinations
# ---------------------------------------------------------------------------
@register(
    "events_daily_gapfill",
    """
WITH RECURSIVE daily AS (
  SELECT user_id, date_trunc('day', ts) AS dday, count(*) AS n
  FROM events GROUP BY 1, 2
), b AS (
  SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
  FROM events
), spine(dday) AS (
  SELECT lo FROM b
  UNION ALL
  SELECT dday + INTERVAL 1 DAY FROM spine WHERE dday < (SELECT hi FROM b)
)
SELECT u.user_id, s.dday, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
FROM (SELECT DISTINCT user_id FROM events) u
CROSS JOIN spine s
LEFT JOIN daily d ON d.user_id = u.user_id AND d.dday = s.dday
""",
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: every (user, day) over the global range,
    zero-filled where inactive.  Spark-first shape: daily counts partial-
    aggregate to |users|·|active days|; a second agg folds each user's
    days into a bounded map (range-length entries); the spine is then an
    explode + map lookup — NO join node, and the left-join-to-spine
    formulation's third exchange never happens.  Global bounds ride a
    broadcast 1-row cross join."""
    events = read_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("dday")
    )
    daily = events.groupBy("user_id", "dday").agg(F.count("*").alias("n"))
    per_user = daily.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("dday", "n"))).alias("m")
    )
    bounds = events.agg(
        F.min("dday").alias("lo"), F.max("dday").alias("hi")
    )
    return (
        per_user.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
            ).alias("dday"),
            "m",
        )
        .select(
            "user_id",
            "dday",
            F.coalesce(F.element_at("m", F.col("dday")), F.lit(0))
            .cast("long")
            .alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# RANGE window frame — value-based trailing interval (vs the ROWS frame in
# q_cumulative_revenue_per_customer)
# ---------------------------------------------------------------------------
@register(
    "q_trailing_week_revenue",
    """
WITH daily AS (
  SELECT o_orderpriority, date_trunc('day', o_orderdate) AS dday,
         date_diff('day', DATE '1970-01-01', date_trunc('day', o_orderdate)) AS ep_day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2, 3
)
SELECT o_orderpriority, dday, rev_cents,
       CAST(sum(rev_cents) OVER (
         PARTITION BY o_orderpriority ORDER BY ep_day
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rev_7d_cents
FROM daily
""",
)
def q_trailing_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per priority: a RANGE frame over the epoch
    day — value-based bounds, so missing days shrink the window (a ROWS
    frame would silently sum 7 *rows* regardless of gaps).  The window
    runs over the pre-aggregated daily frame (|priorities|·|days| rows,
    not |orders|), and daily agg + window share nothing that needs a
    second fact scan."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("day", F.col("o_orderdate")).alias("dday"),
        F.datediff(
            F.date_trunc("day", F.col("o_orderdate")), F.lit("1970-01-01").cast("date")
        ).alias("ep_day"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")).alias("rev_cents")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("ep_day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        "dday",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("rev_7d_cents"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — selective date pushdown on both fact scans + top-k
# ---------------------------------------------------------------------------
@register(
    "q_shipping_priority_top10",
    """
WITH j AS (
  SELECT l.l_orderkey, o.o_orderdate,
         CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT) AS cents
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate < TIMESTAMP '1998-01-01'
    AND l.l_shipdate  > TIMESTAMP '1998-01-01'
)
SELECT l_orderkey, o_orderdate,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM j
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
""",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: orders placed before the cutoff whose lineitems
    shipped after it, top-10 orders by discounted revenue.  Both date
    predicates push to the parquet scans (row-group pruning does the
    heavy lifting at 100 TB); the orderkey join is big-big so it shuffles
    both sides once — co-located for free when both tables are bucketed
    by orderkey in the warehouse (ManagedTable pk_buckets).  The final
    top-10 is TakeOrderedAndProject over the aggregated frame, never a
    global sort."""
    cutoff = "1998-01-01"
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .select(
            "l_orderkey",
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("long").alias("cents"),
        )
    )
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    return agg.orderBy(F.col("revenue_cents").desc(), "l_orderkey").limit(10)


# ---------------------------------------------------------------------------
# FULL OUTER join — the one join type nothing else exercises
# ---------------------------------------------------------------------------
@register(
    "q_nation_presence_fulljoin",
    """
WITH c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_cust
  FROM customer WHERE c_nationkey % 2 = 0 GROUP BY 1
), s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_supp
  FROM supplier WHERE s_nationkey % 3 = 0 GROUP BY 1
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
""",
)
def q_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER over two independently-aggregated relations (customer vs
    supplier nation footprints; the modulo filters make all three row
    classes — matched, left-only, right-only — non-empty).  Both sides
    pre-aggregate to |nations| rows before the join, so the full-outer
    shuffle moves group counts, never base rows; Spark coalesces the key
    automatically with the named-column join."""
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_nationkey") % 2 == 0)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_nationkey") % 3 == 0)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust.join(supp, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join (SMB) — pre-shuffle once, join exchange-free
# ---------------------------------------------------------------------------
_SMB_CACHE: dict[str, tuple[str, str]] = {}


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """orders/lineitem written once per session as Spark bucketed tables
    (``bucketBy(8, orderkey) + sortBy``): the one-time write pays the hash
    shuffle, and every later equi-join/aggregation on the bucket key reads
    co-located, pre-sorted buckets — no Exchange in the join plan.  This is
    the layout a warehouse keeps its replicated fact tables in at 100 TB:
    the join that would shuffle 100 TB per query instead shuffles once at
    load, exactly the trade the reference's warehouses make with
    CLUSTER BY / DISTKEY (snowsql/sql.go, redshiftsql/sql.go create paths)."""
    if sf_dir in _SMB_CACHE:
        return _SMB_CACHE[sf_dir]
    import re
    import tempfile

    suffix = re.sub(r"\W+", "_", sf_dir).strip("_")
    d = tempfile.mkdtemp(prefix="tidb2dw_smb_")
    on, ln = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{d}/{on}").mode("overwrite").format("parquet")
        .saveAsTable(on)
    )
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{d}/{ln}").mode("overwrite").format("parquet")
        .saveAsTable(ln)
    )
    _SMB_CACHE[sf_dir] = (on, ln)
    return on, ln


@register(
    "q_bucketed_colocated_join",
    """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join on the bucket key of two co-bucketed tables:
    sort-merge join with ZERO exchanges before the join (both sides read
    their matching buckets pre-sorted; asserted in tests/test_zorder_smb).
    The merge hint pins SMJ so the co-location shows even where the small
    side would broadcast at test scale."""
    on, ln = _bucketed_tables(spark, sf_dir)
    o = spark.table(on).select("o_orderkey", "o_orderpriority")
    li = spark.table(ln)
    joined = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100.0).cast("long")).alias(
            "revenue_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Z-order clustered multi-range read — zone maps selective on BOTH columns
# ---------------------------------------------------------------------------
_ZORDER_CACHE: dict[str, object] = {}


def _zorder_orders(spark: SparkSession, sf_dir: str):
    """Managed copy of orders, OPTIMIZE ZORDER BY (o_custkey, o_orderdate)
    + analyze, built once per session.  Files then cover small
    (custkey × orderdate) hyper-rectangles, so read_multi_range prunes on
    both predicates at once (tests/test_zorder_smb asserts the file-skip)."""
    if sf_dir in _ZORDER_CACHE:
        return _ZORDER_CACHE[sf_dir]
    import tempfile

    from .table.managed import ManagedTable

    t = ManagedTable(tempfile.mkdtemp(prefix="tidb2dw_zorder_") + "/orders")
    t.create(spark.read.parquet(f"{sf_dir}/orders.parquet"), pk_cols=["o_orderkey"])
    t.cluster_by(
        spark, ["o_custkey", "o_orderdate"],
        target_bytes=256 << 10, zorder=True, zorder_bits=6,
    )
    t.analyze(spark, ["o_custkey", "o_orderdate"])
    _ZORDER_CACHE[sf_dir] = t
    return t


@register(
    "q_zorder_multirange",
    """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(round(o_totalprice * 100.0) AS BIGINT) AS totalprice_cents
FROM orders
WHERE o_custkey BETWEEN 10 AND 59
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                      AND TIMESTAMP '1996-12-31 00:00:00'
""",
)
def q_zorder_multirange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive range scan through the z-ordered table: zone maps skip
    every file whose (custkey, orderdate) rectangle misses either range —
    a lexicographic sort would only prune on its leading column.  The
    result is the plain filter (what the oracle checks); the layout only
    changes which files are opened."""
    t = _zorder_orders(spark, sf_dir)
    return t.read_multi_range(
        spark,
        {
            "o_custkey": (10, 59),
            "o_orderdate": ("1996-01-01 00:00:00", "1996-12-31 00:00:00"),
        },
    ).select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100.0).cast("long").alias("totalprice_cents"),
    )


# ---------------------------------------------------------------------------
# Bloom-pruned equality probe — point lookups on a non-clustered column
# ---------------------------------------------------------------------------
_BLOOM_CACHE: dict[str, object] = {}


def _bloom_orders(spark: SparkSession, sf_dir: str):
    """Managed copy of orders clustered by o_orderdate (files are
    date-localized) with per-file BLOOM stats on o_custkey — the column a
    point probe arrives on.  Zone maps can't help o_custkey here (every
    date-range file spans most customers' key range), but a customer only
    appears in files covering dates they actually ordered on — exactly the
    value-locality blooms exploit."""
    if sf_dir in _BLOOM_CACHE:
        return _BLOOM_CACHE[sf_dir]
    import tempfile

    from .table.managed import ManagedTable

    t = ManagedTable(tempfile.mkdtemp(prefix="tidb2dw_bloom_") + "/orders")
    t.create(spark.read.parquet(f"{sf_dir}/orders.parquet"), pk_cols=["o_orderkey"])
    t.cluster_by(spark, ["o_orderdate"], target_bytes=256 << 10)
    t.analyze_bloom(spark, ["o_custkey"])
    _BLOOM_CACHE[sf_dir] = t
    return t


@register(
    "q_bloom_point_lookup",
    """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(round(o_totalprice * 100.0) AS BIGINT) AS totalprice_cents
FROM orders
WHERE o_custkey = 42
""",
)
def q_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One customer's orders through ``read_eq``: the bloom skips every
    file whose date range contains none of the customer's orders; the
    exact filter applies to the files that remain.  Result is the plain
    equality predicate (what the oracle checks); the layout + stats only
    change which files open (pruning asserted in tests/test_bloom.py)."""
    t = _bloom_orders(spark, sf_dir)
    return t.read_eq(spark, "o_custkey", 42).select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100.0).cast("long").alias("totalprice_cents"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape — local-supplier revenue (join condition spans two dims)
# ---------------------------------------------------------------------------
@register(
    "q_local_supplier_revenue",
    """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: revenue from orders whose supplier sits in the
    CUSTOMER's nation, restricted to one region.  The interesting edge is
    the supplier join carrying a condition on a column that arrives
    through the customer side (c_nationkey = s_nationkey) — Spark still
    broadcasts every dim, so the fact shuffles only for the orderkey join
    with orders; at 100 TB that join co-locates when both tables are
    bucketed by orderkey (q_bucketed_colocated_join's layout)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(cents).alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — volume shipping between a nation pair, by year
# ---------------------------------------------------------------------------
@register(
    "q_volume_shipping",
    """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
   OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
GROUP BY 1, 2, 3
""",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: trade volume between two nations in either
    direction, by ship year.  The nation-pair disjunction is pushed into
    the two broadcast nation dims BEFORE the join (each side filters to
    the 2-row nation subset), so the OR never degrades the join into a
    filter-after-cross — the fact-side scan joins against 2-row
    broadcasts and the residual pair predicate runs on matched rows
    only."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    pair = ["NATION_3", "NATION_7"]
    nation = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name")
        .filter(F.col("n_name").isin(pair))
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("timestamp")).cast("long").alias("ship_year"),
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(cents).alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — semi-join existence check feeding an aggregate
# ---------------------------------------------------------------------------
@register(
    "q_priority_semijoin_counts",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: orders in a date window that HAVE a returned line,
    counted by priority.  EXISTS compiles to a LEFT SEMI join — each order
    matches at most once no matter how many lines return, so no distinct
    is needed and no fan-out ever materializes.  The lineitem side is
    filtered + column-pruned to (l_orderkey) before the join; the date
    window is pushed to the orders parquet scan.  At 100 TB both sides
    shuffle on orderkey — co-located when bucketed by orderkey."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    returned = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(returned, on="o_orderkey", how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape — order-count distribution incl. zero-order customers
# ---------------------------------------------------------------------------
@register(
    "q_custdist",
    """
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
""",
)
def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: how many customers placed N (non-urgent) orders —
    zero included, which is what forces the LEFT OUTER join (an inner
    join silently drops the no-order customers) and puts the priority
    filter INSIDE the join condition, not a WHERE (a post-join WHERE
    would also drop them).  Two aggregations: per-customer count rides
    the join's custkey exchange; the tiny distribution agg reshuffles
    only (customer, count) pairs."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — distinct-supplier counts with an anti-join exclusion
# ---------------------------------------------------------------------------
@register(
    "q_brand_supplier_counts",
    """
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 9, 19, 29, 39, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 10)
GROUP BY p.p_brand, p.p_size
""",
)
def q_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: distinct suppliers per (brand, size) for a part
    subset, excluding a supplier denylist.  The NOT IN compiles to a LEFT
    ANTI join against the (tiny, broadcast) denylist — s_suppkey is
    non-null so NOT IN and ANTI agree; the part dim broadcasts with its
    filters applied before the join.  count(DISTINCT) shuffles only the
    post-filter (brand, size, suppkey) triples."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    part = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(
            (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 19, 29, 39, 49)
        )
        .select("p_partkey", "p_brand", F.col("p_size").cast("long").alias("p_size"))
    )
    denied = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_nationkey") < 10)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(denied), on="l_suppkey", how="left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume orders via aggregate-then-join
# ---------------------------------------------------------------------------
@register(
    "q_big_order_customers",
    """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_cents
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100.0) AS BIGINT)) > 25000
)
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS totalprice_cents,
       b.qty_cents
FROM big b
JOIN orders o   ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def q_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: customers behind orders whose total quantity
    clears a threshold.  Aggregate-then-join: lineitem collapses to
    per-order sums FIRST (partial agg combines map-side), the HAVING
    prunes to the rare big orders, and only those survivors join orders —
    the join input is orders-of-interest-sized, not lineitem-sized.  The
    customer dim broadcasts.  Quantities are cent-quantized so the
    HAVING threshold compares integers identically in both engines."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100.0).cast("long")).alias("qty_cents"))
        .filter(F.col("qty_cents") > 25000)
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100.0).cast("long").alias("totalprice_cents"),
            "qty_cents",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — per-group correlated minimum (min-cost supplier)
# ---------------------------------------------------------------------------
@register(
    "q_min_cost_supplier",
    """
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS cost_cents
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT *, min(cost_cents) OVER (PARTITION BY l_partkey) AS min_cost
  FROM costs
)
SELECT p.p_partkey, p.p_brand, s.s_name, r.cost_cents
FROM ranked r
JOIN part p     ON r.l_partkey = p.p_partkey AND p.p_size <= 5
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.cost_cents = r.min_cost
""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: for each (small) part, the supplier(s) with the
    minimum observed cost.  The classic correlated scalar subquery
    (`WHERE cost = (SELECT min(cost) … WHERE same part)`) is expressed as
    a window MIN over the part key — Catalyst's own decorrelation target
    shape, one shuffle on partkey shared by the aggregate and the window
    instead of a per-row subquery re-scan.  Ties keep every minimal
    supplier (deterministic, order-free).  Part and supplier dims
    broadcast."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100.0).cast("long")).alias(
            "cost_cents"
        )
    )
    w = Window.partitionBy("l_partkey")
    ranked = costs.withColumn("min_cost", F.min("cost_cents").over(w)).filter(
        F.col("cost_cents") == F.col("min_cost")
    )
    part = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey", "p_brand")
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    return (
        ranked.join(F.broadcast(part), ranked.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), ranked.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", "cost_cents")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape — above-average balances with no orders (exact integer avg)
# ---------------------------------------------------------------------------
@register(
    "q_idle_rich_customers",
    """
WITH bal AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents
  FROM customer
),
pos AS (
  SELECT CAST(sum(bal_cents) AS BIGINT) AS total, count(*) AS n
  FROM bal WHERE bal_cents > 0
)
SELECT b.c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(b.bal_cents) AS BIGINT) AS total_bal_cents
FROM bal b, pos
WHERE b.bal_cents * pos.n > pos.total
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = b.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY b.c_nationkey
""",
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: customers with an above-average balance and no
    RECENT orders (the synthetic data gives every customer some order, so
    "idle" is date-windowed), aggregated by nation.  The average
    comparison is exact cross-multiplication (bal·n > total) — no
    floating division anywhere, so both engines agree bit-for-bit even at
    the boundary.  The global (total, n) pair is a 1-row broadcast-joined
    aggregate (the same shape AQE gives a scalar subquery); the idleness
    test is a LEFT ANTI join against the date-filtered orders keys (the
    filter pushes to the parquet scan)."""
    bal = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100.0).cast("long").alias("bal_cents"),
    )
    pos = bal.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("total"), F.count("*").alias("n")
    )
    orders_keys = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        bal.join(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("n") > F.col("total"))
        .join(orders_keys, on="c_custkey", how="left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum("bal_cents").alias("total_bal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel analysis — ordered-stage progression per user
# ---------------------------------------------------------------------------
@register(
    "events_funnel_counts",
    """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
   AND e.ts <= v.t1 + INTERVAL '12 hours'
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
   AND e.ts <= c.t2 + INTERVAL '12 hours'
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT stage, CAST(count(*) AS BIGINT) AS n_users FROM (
  SELECT v.user_id,
         CASE WHEN p.user_id IS NOT NULL THEN 3
              WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS stage
  FROM v LEFT JOIN c ON v.user_id = c.user_id
         LEFT JOIN p ON v.user_id = p.user_id
) s GROUP BY stage
""",
)
def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase: a user advances a stage only
    with an event STRICTLY AFTER their previous stage's first event and
    within a 12-hour conversion window of it.
    Each stage is one filtered scan (event_type pushed to parquet)
    aggregated per user — partial aggs combine map-side and every join
    key is user_id, so at scale all three stage frames share one
    user-hash exchange layout; the stage frames are per-user (tiny
    relative to events) and AQE broadcasts them."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 12 HOURS"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 12 HOURS"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    stage = (
        F.when(F.col("t3").isNotNull(), F.lit(3))
        .when(F.col("t2").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
    )
    return (
        v.join(c, "user_id", "left").join(p, "user_id", "left")
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention
# ---------------------------------------------------------------------------
@register(
    "events_weekly_cohort_retention",
    """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
)
SELECT f.cohort,
       CAST((epoch(a.wk) - epoch(f.cohort)) / 604800 AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM act a JOIN firsts f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
)
def events_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted in
    each later week they were active.  Two aggregations over one events
    lineage (first-week per user; distinct active (user, week)) joined on
    user_id; week arithmetic is integer epoch-seconds / 604800 so both
    engines bucket identically (both truncate weeks to Monday)."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        act.join(firsts, "user_id")
        .select(
            "cohort",
            ((F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / 604800)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# TPC-H completion — the ten shapes that finish the canonical 22 (Q6, Q8,
# Q10, Q11, Q12, Q14, Q15, Q19, Q20, Q21), each adapted to the columns the
# synthetic schema carries (no partsupp / l_shipmode / l_receiptdate: Q11 and
# Q20 use lineitem as the supply fact, Q12 groups by l_linestatus, Q21 uses
# l_returnflag as the late-delivery signal) with exact integer-cents math.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    """
SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the query whose entire cost
    is how little you read.  All three predicates push to the parquet
    scan (date, discount band, quantity), the projection prunes to three
    columns, and the single global agg partial-combines map-side: at
    100 TB this is one pass over the pruned row groups, zero shuffles of
    anything but per-partition partials."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100.0)
                .cast("long")
            ).cast("long").alias("revenue_cents"),
        )
    )


@register(
    "q8_market_share",
    """
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN sn.n_name = 'NATION_1'
                     THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS nation_rev_cents,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS total_rev_cents
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
JOIN region r    ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
JOIN part p      ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): within one region's customer
    orders for one part type, the share of revenue supplied by one
    nation, per order year.  Returned as (nation_rev, total_rev) integer
    pairs — the ratio is one downstream divide, and keeping both sides
    integer keeps the row bit-exact.  Plan: the fact scans once; part
    (filtered), customer-nation-region, supplier-nation all broadcast;
    orders co-shuffles with lineitem on orderkey; the conditional sum
    folds both measures in ONE aggregation pass — market share costs no
    second join or scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    cust_nat = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey")
            ),
            cust["c_nationkey"] == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust_nat), orders["o_custkey"] == cust_nat["c_custkey"])
        .join(F.broadcast(supp_nat), li["l_suppkey"] == supp_nat["s_suppkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            cents.alias("cents"),
            F.when(F.col("supp_nation") == "NATION_1", cents)
            .otherwise(F.lit(0)).alias("nation_cents"),
        )
        .groupBy("o_year")
        .agg(
            F.sum("nation_cents").cast("long").alias("nation_rev_cents"),
            F.sum("cents").cast("long").alias("total_rev_cents"),
        )
    )


@register(
    "q10_returned_items",
    """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c.c_custkey, c.c_name
QUALIFY row_number() OVER (ORDER BY revenue_cents DESC, c_custkey) <= 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): revenue lost to returns per
    customer in one quarter, top 20.  Both filters (returnflag on the
    fact, date on orders) push to their scans BEFORE the join, so the
    orderkey shuffle moves only returned lines of one quarter's orders;
    customer broadcasts; the top-20 is orderBy().limit() — Spark plans
    TakeOrderedAndProject (per-partition partial top-k, tiny final
    merge), never a single-partition global window sort, and the custkey
    tiebreak keeps the cut deterministic (bit-equal to the oracle's
    row_number ≤ 20)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_custkey")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(cents).cast("long").alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q11_important_stock",
    """
WITH sup AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_2'
),
v AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem l JOIN sup s ON l.l_suppkey = s.s_suppkey
  GROUP BY l.l_partkey
),
tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total FROM v)
SELECT v.l_partkey, v.value_cents FROM v, tot
WHERE v.value_cents * 20000 > tot.total
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock; the schema has no partsupp, so
    lineitem is the supply fact): per-part supplied value from one
    nation's suppliers, keeping parts above a fixed fraction of the
    total.  The threshold test is exact integer cross-multiplication
    (value·20000 > total) — no floating division at the boundary.  One
    shuffle on partkey; the global total is a 1-row broadcast; the
    nation's supplier keys broadcast into the fact scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    sup = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .join(
            F.broadcast(
                spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
                    F.col("n_name") == "NATION_2"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    v = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long")
            .alias("value_cents")
        )
    )
    tot = v.agg(F.sum("value_cents").cast("long").alias("total"))
    return (
        v.join(F.broadcast(tot))
        .filter(F.col("value_cents") * 20000 > F.col("total"))
        .select("l_partkey", "value_cents")
    )


@register(
    "q12_linestatus_priority",
    """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
""",
)
def q12_linestatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping priority audit; l_linestatus stands in
    for the schema's missing l_shipmode): per line status, how many 1997
    shipments belonged to high- vs low-priority orders.  The date filter
    pushes to the fact scan; the conditional counts fold in one pass —
    the canonical CASE-inside-SUM pivot that avoids two joins."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_linestatus")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_lines"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_lines"),
        )
    )


@register(
    "q14_promo_revenue",
    """
SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_revenue_cents,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS total_revenue_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): the month's revenue share from promo
    parts, returned as an exact integer (promo, total) pair.  Date filter
    on the fact scan, part broadcast, one conditional aggregation —
    the percentage is the caller's single divide."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_type")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
            .cast("long")
            .alias("promo_revenue_cents"),
            F.sum(cents).cast("long").alias("total_revenue_cents"),
        )
    )


@register(
    "q15_top_supplier",
    """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100.0) AS BIGINT))
              AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
QUALIFY rank() OVER (ORDER BY r.total_revenue_cents DESC) = 1
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the quarter's revenue-per-supplier view,
    returning every supplier tied at the maximum (rank, not row_number —
    the spec's tie semantics).  The revenue agg shuffles on suppkey once;
    the max is a supplier-count-sized window; supplier broadcast-joins
    for the name."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0)
            .cast("long")
        )
        .cast("long")
        .alias("total_revenue_cents")
    )
    w = Window.orderBy(F.desc("total_revenue_cents"))
    return (
        rev.join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .withColumn("__rk", F.rank().over(w))
        .filter(F.col("__rk") == 1)
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


@register(
    "q19_discounted_revenue",
    """
SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the disjunctive three-branch
    predicate spanning both join sides.  Expressed declaratively so
    Catalyst derives the IMPLIED single-side filters (brand IN the three
    values pushes into the part scan; the quantity envelope 1..30 into
    the fact scan) before evaluating the residual OR after the broadcast
    join — the classic can't-push-an-OR query made scan-prunable."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_size"
    )
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    branch = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(branch)
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0)
                .cast("long")
            )
            .cast("long")
            .alias("revenue_cents"),
        )
    )


@register(
    "q20_widget_suppliers",
    """
WITH wparts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '%widget'
),
shipped AS (
  SELECT l.l_suppkey,
         CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty_shipped
  FROM lineitem l JOIN wparts w ON l.l_partkey = w.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, sh.qty_shipped
FROM shipped sh JOIN supplier s ON sh.l_suppkey = s.s_suppkey
WHERE sh.qty_shipped > 100
""",
)
def q20_widget_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion; no partsupp in the
    schema, so shipped quantity stands in for available stock): suppliers
    who moved more than a threshold quantity of widget parts in 1997 —
    the nested semi-join chain part-filter → fact agg → supplier.  The
    name predicate prunes part driver-side and broadcasts; one suppkey
    shuffle; quantities round to exact integers before summing."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_name").like("%widget")
    ).select("p_partkey")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    shipped = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long"))
            .cast("long")
            .alias("qty_shipped")
        )
        .filter(F.col("qty_shipped") > 100)
    )
    return shipped.join(
        F.broadcast(supp), shipped["l_suppkey"] == supp["s_suppkey"]
    ).select("s_suppkey", "s_name", "qty_shipped")


@register(
    "q21_waiting_suppliers",
    """
WITH base AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_returnflag
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret,
         max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS ret_supp
  FROM base GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order p JOIN supplier s ON p.ret_supp = s.s_suppkey
WHERE p.n_supp >= 2 AND p.n_ret = 1
GROUP BY s.s_suppkey, s.s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting; l_returnflag
    is the late-delivery signal — the schema has no receipt/commit
    dates): for finalized multi-supplier orders, the supplier who was
    the ONLY one with a returned line, counted per supplier.  The spec's
    exists/not-exists double correlation collapses into ONE per-order
    aggregation (distinct suppliers, distinct returned suppliers, the
    sole returned supplier) — one orderkey shuffle instead of two
    correlated self-joins, identical semantics."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    ret_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(ret_supp).alias("n_ret"),
            F.max(ret_supp).alias("ret_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
    )
    return (
        per_order.join(F.broadcast(supp), per_order["ret_supp"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Approximate COUNT(DISTINCT): cross-engine-exact HyperLogLog (the
# APPROX tier next to events_distinct_users_by_type's exact counts).
# The sketch state AND the raw estimate are bit-reproducible in DuckDB
# (md5-hex→int hashing, integer-exact rho via bin(), harmonic sum as a
# scaled BIGINT, one IEEE divide) — see operators/sketch.py.
# ---------------------------------------------------------------------------
def _hll_oracle() -> str:
    from .operators.sketch import hll_numerator, hll_register_sql

    p = 10
    m = 1 << p
    wp1 = 61 - p
    bucket, rho = hll_register_sql("o_custkey", p)
    a = hll_numerator(p)
    return f"""
WITH regs AS (
  SELECT o_orderpriority, {bucket} AS bucket, MAX({rho}) AS rho
  FROM orders WHERE o_custkey IS NOT NULL
  GROUP BY 1, 2
), agg AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS used_buckets,
         CAST(SUM(CAST(1 AS BIGINT) << ({wp1} - rho)) AS BIGINT) AS present
  FROM regs GROUP BY 1
), ex AS (
  SELECT o_orderpriority,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders GROUP BY 1
)
SELECT e.o_orderpriority, e.n_exact, a.used_buckets,
       CAST(a.present + ({m} - a.used_buckets)
            * (CAST(1 AS BIGINT) << {wp1}) AS BIGINT) AS hsum_scaled,
       {a!r} / CAST(a.present + ({m} - a.used_buckets)
                    * (CAST(1 AS BIGINT) << {wp1}) AS BIGINT) AS est_raw
FROM ex e JOIN agg a USING (o_orderpriority)
"""


@register("approx_distinct_hll", _hll_oracle())
def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority approximate distinct customers via HLL (p=10, 1024
    registers/group) next to the exact count — both the register layout
    (used_buckets, hsum_scaled: exact BIGINTs) and the raw estimator
    (one IEEE divide of two exactly-computed numbers) are bit-equal to
    the DuckDB recompute; the engine-local small-range correction lives
    in MaintainedHLLSketch.estimate (operators/sketch.py docstring).
    One fact scan + a registers-sized shuffle per group — the shape
    APPROX_COUNT_DISTINCT takes at 100 TB, with state 2^p rows per
    group instead of O(distinct)."""
    from .operators.sketch import hll_numerator, hll_register_cols

    p = 10
    m = 1 << p
    wp1 = 61 - p
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority", "o_custkey"
    )
    bucket, rho = hll_register_cols("o_custkey", p)
    regs = (
        orders.filter(F.col("o_custkey").isNotNull())
        .select("o_orderpriority", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("o_orderpriority", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    agg = (
        regs.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("used_buckets"),
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {wp1} - rho)"))
            .cast("long")
            .alias("__present"),
        )
        .select(
            "o_orderpriority",
            "used_buckets",
            (
                F.col("__present")
                + (F.lit(m) - F.col("used_buckets"))
                * F.lit(1 << wp1).cast("long")
            )
            .cast("long")
            .alias("hsum_scaled"),
        )
        .withColumn("est_raw", F.lit(hll_numerator(p)) / F.col("hsum_scaled"))
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").cast("long").alias("n_exact")
    )
    return exact.join(F.broadcast(agg), "o_orderpriority").select(
        "o_orderpriority", "n_exact", "used_buckets", "hsum_scaled", "est_raw"
    )


# ---------------------------------------------------------------------------
# Approximate COUNT(DISTINCT) via KMV (k-minimum-values) — the
# SET-ALGEBRA sibling of approx_distinct_hll: the retained k smallest
# md5 hashes are cross-engine exact, so n_hashes and theta are BIGINTs
# a DuckDB window-rank recompute reproduces bit-for-bit, and est_raw is
# one IEEE divide of a literal double numerator.  Unlike HLL registers,
# two KMV states also answer INTERSECTION questions (see
# pipeline_kmv_intersection); this row pins the batch build + estimator.
# ---------------------------------------------------------------------------
def _kmv_oracle() -> str:
    from .operators.sketch import kmv_hash_sql, kmv_numerator

    k = 256
    num = kmv_numerator(k)
    h = kmv_hash_sql("o_custkey")
    return f"""
WITH hs AS (
  SELECT DISTINCT o_orderpriority, {h} AS h
  FROM orders WHERE o_custkey IS NOT NULL
), kmin AS (
  SELECT o_orderpriority, h FROM (
    SELECT o_orderpriority, h,
           row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
    FROM hs
  ) WHERE rn <= {k}
), agg AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_hashes,
         CAST(MAX(h) AS BIGINT) AS theta
  FROM kmin GROUP BY 1
), ex AS (
  SELECT o_orderpriority,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders GROUP BY 1
)
SELECT e.o_orderpriority, e.n_exact, a.n_hashes, a.theta,
       CASE WHEN a.n_hashes < {k} THEN CAST(a.n_hashes AS DOUBLE)
            ELSE {num!r} / a.theta END AS est_raw
FROM ex e JOIN agg a USING (o_orderpriority)
"""


@register("approx_distinct_kmv", _kmv_oracle())
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority approximate distinct customers via KMV (k=256,
    ~6.3% rel. error) next to the exact count.  The k-min state is the
    same one shuffle + group-partitioned rank an exact COUNT(DISTINCT)
    pays, but the retained state is k rows/group — and unlike HLL it
    composes into union AND intersection estimates across sketches
    (operators/sketch.py MaintainedKMVSketch docstring)."""
    from .functions.dedup import md5_long
    from .operators.sketch import kmv_numerator
    from pyspark.sql import Window

    k = 256
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority", "o_custkey"
    )
    w = Window.partitionBy("o_orderpriority").orderBy("h")
    kmin = (
        orders.filter(F.col("o_custkey").isNotNull())
        .select(
            "o_orderpriority",
            md5_long(F.col("o_custkey").cast("string")).alias("h"),
        )
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )
    agg = (
        kmin.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hashes"),
            F.max("h").cast("long").alias("theta"),
        )
        .withColumn(
            "est_raw",
            F.when(
                F.col("n_hashes") < k, F.col("n_hashes").cast("double")
            ).otherwise(F.lit(kmv_numerator(k)) / F.col("theta")),
        )
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").cast("long").alias("n_exact")
    )
    return exact.join(F.broadcast(agg), "o_orderpriority").select(
        "o_orderpriority", "n_exact", "n_hashes", "theta", "est_raw"
    )
