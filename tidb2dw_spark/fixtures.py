"""Deterministic synthetic changelogs over the driver testdata tables.

We don't run TiDB/TiCDC, so merge correctness is tested against changelogs
*derived from the base tables themselves* with pure-ANSI SQL (arithmetic +
CASE + a 2-row fan-out join — no engine-specific functions), evaluated by BOTH
engines: Spark (``spark.sql`` over temp views) builds the batch our
operators consume, and the DuckDB oracle embeds the same text as a CTE.
Identical inputs by construction; no fixture files needed.

Event classes per key (FIXTURES.md §3 coverage matrix), selected by
``pk % 10``:

    1 → single U                      (basic update arm)
    2 → U then U at higher ts         (last-writer-wins)
    3 → single D                      (delete arm)
    4 → I then D at higher ts         (same-batch insert+delete → net delete,
                                       SURVEY §7 hard-part 5)
    5 → D then I at higher ts         (net reinsert)
    6 → I with key+100000000            (not-matched insert arm)

commit_ts = pk*10 + seq keeps events per key strictly ordered and globally
deterministic.  Shape note: one scan + CROSS JOIN a 2-row sequence + CASE,
instead of one UNION branch per event class — Spark inlines multi-referenced
CTEs, so the branch form re-evaluated the source (incl. lineitem's
dedup groupBy) once per branch.
"""

from __future__ import annotations

ORDERS_PAYLOAD = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"

ORDERS_CHANGELOG_SQL = """
WITH ev AS (SELECT orders.*, o_orderkey % 10 AS m FROM orders),
f AS (
  SELECT ev.*, k.i FROM ev
  CROSS JOIN (SELECT 1 AS i UNION ALL SELECT 2 AS i) k
  WHERE (k.i = 1 AND ev.m IN (1, 2, 3, 4, 5, 6))
     OR (k.i = 2 AND ev.m IN (2, 4, 5))
)
SELECT CASE WHEN (m = 3) OR (m = 4 AND i = 2) OR (m = 5 AND i = 1) THEN 'D'
            WHEN (m = 4 AND i = 1) OR (m = 5 AND i = 2) OR (m = 6) THEN 'I'
            ELSE 'U' END AS flag,
       'orders' AS tablename, 'tpch' AS schemaname,
       CAST(o_orderkey*10 + i AS BIGINT) AS commit_ts,
       CASE WHEN m = 6 THEN o_orderkey + 100000000 ELSE o_orderkey END AS o_orderkey,
       o_custkey,
       CASE WHEN m = 1 THEN 'U1' WHEN m = 2 AND i = 1 THEN 'XX'
            WHEN m = 2 AND i = 2 THEN 'U2' WHEN m = 4 THEN 'I4'
            WHEN m = 5 AND i = 2 THEN 'R5' WHEN m = 6 THEN 'N6'
            ELSE o_orderstatus END AS o_orderstatus,
       CASE WHEN m = 1 THEN o_totalprice + 100.0
            WHEN m = 2 AND i = 2 THEN o_totalprice + 200.0
            WHEN m = 5 AND i = 2 THEN o_totalprice + 500.0
            ELSE o_totalprice END AS o_totalprice,
       o_orderdate, o_orderpriority
FROM f
"""

LINEITEM_PAYLOAD = (
    "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
)

# composite-PK (l_orderkey, l_linenumber) changelog.  The testdata lineitem
# is a multiset on that key, so events derive only from keys with exactly
# one row (HAVING count(*)=1 + min() = identity) — otherwise the LWW
# survivor among identical (pk, ts, flag) events would be nondeterministic.
_LI_SRC = """
  SELECT l_orderkey, l_linenumber,
         min(l_partkey) AS l_partkey, min(l_suppkey) AS l_suppkey,
         min(l_quantity) AS l_quantity, min(l_extendedprice) AS l_extendedprice,
         min(l_discount) AS l_discount, min(l_tax) AS l_tax,
         min(l_returnflag) AS l_returnflag, min(l_linestatus) AS l_linestatus,
         min(l_shipdate) AS l_shipdate
  FROM lineitem
  GROUP BY l_orderkey, l_linenumber
  HAVING count(*) = 1
"""

LINEITEM_CHANGELOG_SQL = f"""
WITH li_src AS ({_LI_SRC}),
ev AS (SELECT li_src.*, (l_orderkey + l_linenumber) % 10 AS m FROM li_src),
f AS (
  SELECT ev.*, k.i FROM ev
  CROSS JOIN (SELECT 1 AS i UNION ALL SELECT 2 AS i) k
  WHERE (k.i = 1 AND ev.m IN (1, 2, 3, 4)) OR (k.i = 2 AND ev.m = 2)
)
SELECT CASE WHEN m = 3 THEN 'D' WHEN m = 4 THEN 'I' ELSE 'U' END AS flag,
       'lineitem' AS tablename, 'tpch' AS schemaname,
       CAST(l_orderkey*100 + l_linenumber*10 + i AS BIGINT) AS commit_ts,
       l_orderkey, l_partkey, l_suppkey,
       CASE WHEN m = 4 THEN l_linenumber + 100 ELSE l_linenumber END AS l_linenumber,
       CASE WHEN m = 1 THEN l_quantity + 1.0
            WHEN m = 2 AND i = 2 THEN l_quantity + 2.0
            ELSE l_quantity END AS l_quantity,
       l_extendedprice, l_discount, l_tax,
       CASE WHEN m = 1 THEN 'U' WHEN m = 2 AND i = 1 THEN 'X'
            WHEN m = 2 AND i = 2 THEN 'W' WHEN m = 4 THEN 'N'
            ELSE l_returnflag END AS l_returnflag,
       l_linestatus, l_shipdate
FROM f
"""

CHANGELOG_SQL = {
    "orders": ORDERS_CHANGELOG_SQL,
    "lineitem": LINEITEM_CHANGELOG_SQL,
}

TABLE_PK = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

ALL_TABLES = list(TABLE_PK)


def read_table(spark, sf_dir: str, name: str):
    """Read one testdata table, normalizing TIMESTAMP(NANOS) columns (which
    Spark's parquet reader rejects) to micros timestamps by integer-dividing
    the raw int64 — identical to DuckDB's nanos→micros truncation, so
    oracle parity holds."""
    from pyspark.sql import functions as F

    path = f"{sf_dir}/{name}.parquet"
    ns_cols = NANOS_TS_COLUMNS.get(name)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols or []:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# testdata columns stored as TIMESTAMP(NANOS) (checked via pyarrow)
NANOS_TS_COLUMNS = {"events": ["ts"]}


def register_views(spark, sf_dir: str, tables=None) -> None:
    """Register the testdata parquet tables as temp views (oracle parity:
    the driver pre-registers the same names in DuckDB)."""
    for name in tables or ALL_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
