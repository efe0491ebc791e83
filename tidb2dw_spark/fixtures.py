"""Deterministic synthetic changelogs over the driver testdata tables.

We don't run TiDB/TiCDC, so merge correctness is tested against changelogs
*derived from the base tables themselves* with pure-ANSI SQL (arithmetic +
CASE + UNION ALL only — no engine-specific functions), evaluated by BOTH
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
    6 → I with key+1000000            (not-matched insert arm)

commit_ts = pk*10 + seq keeps events per key strictly ordered and globally
deterministic.
"""

from __future__ import annotations

ORDERS_PAYLOAD = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"

ORDERS_CHANGELOG_SQL = """
SELECT 'U' AS flag, 'orders' AS tablename, 'tpch' AS schemaname,
       CAST(o_orderkey*10+1 AS BIGINT) AS commit_ts,
       o_orderkey, o_custkey, 'U1' AS o_orderstatus,
       o_totalprice + 100.0 AS o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 = 1
UNION ALL
SELECT 'U', 'orders', 'tpch', CAST(o_orderkey*10+1 AS BIGINT),
       o_orderkey, o_custkey, 'XX', o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 = 2
UNION ALL
SELECT 'U', 'orders', 'tpch', CAST(o_orderkey*10+2 AS BIGINT),
       o_orderkey, o_custkey, 'U2',
       o_totalprice + 200.0, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 = 2
UNION ALL
SELECT 'D', 'orders', 'tpch', CAST(o_orderkey*10+1 AS BIGINT),
       o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 = 3
UNION ALL
SELECT 'I', 'orders', 'tpch', CAST(o_orderkey*10+1 AS BIGINT),
       o_orderkey, o_custkey, 'I4', o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 = 4
UNION ALL
SELECT 'D', 'orders', 'tpch', CAST(o_orderkey*10+2 AS BIGINT),
       o_orderkey, o_custkey, 'I4', o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 = 4
UNION ALL
SELECT 'D', 'orders', 'tpch', CAST(o_orderkey*10+1 AS BIGINT),
       o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 = 5
UNION ALL
SELECT 'I', 'orders', 'tpch', CAST(o_orderkey*10+2 AS BIGINT),
       o_orderkey, o_custkey, 'R5',
       o_totalprice + 500.0, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 = 5
UNION ALL
SELECT 'I', 'orders', 'tpch', CAST(o_orderkey*10+1 AS BIGINT),
       o_orderkey + 1000000, o_custkey, 'N6', o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 10 = 6
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
WITH li_src AS ({_LI_SRC})
SELECT 'U' AS flag, 'lineitem' AS tablename, 'tpch' AS schemaname,
       CAST(l_orderkey*100 + l_linenumber*10 + 1 AS BIGINT) AS commit_ts,
       l_orderkey, l_partkey, l_suppkey, l_linenumber,
       l_quantity + 1.0 AS l_quantity, l_extendedprice, l_discount, l_tax,
       'U' AS l_returnflag, l_linestatus, l_shipdate
FROM li_src WHERE (l_orderkey + l_linenumber) % 10 = 1
UNION ALL
SELECT 'U', 'lineitem', 'tpch',
       CAST(l_orderkey*100 + l_linenumber*10 + 1 AS BIGINT),
       l_orderkey, l_partkey, l_suppkey, l_linenumber,
       l_quantity, l_extendedprice, l_discount, l_tax,
       'X', l_linestatus, l_shipdate
FROM li_src WHERE (l_orderkey + l_linenumber) % 10 = 2
UNION ALL
SELECT 'U', 'lineitem', 'tpch',
       CAST(l_orderkey*100 + l_linenumber*10 + 2 AS BIGINT),
       l_orderkey, l_partkey, l_suppkey, l_linenumber,
       l_quantity + 2.0, l_extendedprice, l_discount, l_tax,
       'W', l_linestatus, l_shipdate
FROM li_src WHERE (l_orderkey + l_linenumber) % 10 = 2
UNION ALL
SELECT 'D', 'lineitem', 'tpch',
       CAST(l_orderkey*100 + l_linenumber*10 + 1 AS BIGINT),
       l_orderkey, l_partkey, l_suppkey, l_linenumber,
       l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus, l_shipdate
FROM li_src WHERE (l_orderkey + l_linenumber) % 10 = 3
UNION ALL
SELECT 'I', 'lineitem', 'tpch',
       CAST(l_orderkey*100 + l_linenumber*10 + 1 AS BIGINT),
       l_orderkey, l_partkey, l_suppkey, l_linenumber + 100,
       l_quantity, l_extendedprice, l_discount, l_tax,
       'N', l_linestatus, l_shipdate
FROM li_src WHERE (l_orderkey + l_linenumber) % 10 = 4
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
