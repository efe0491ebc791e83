"""Test helpers: DuckDB oracle comparison (mirrors the driver's check)."""

from __future__ import annotations

import duckdb
import pandas as pd

from tidb2dw_spark.fixtures import ALL_TABLES


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for an order/type-insensitive compare, like a value hash
    out = df.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str):
    got = normalize(spark_df.toPandas())
    con = duck_connection(sf_dir)
    want = normalize(con.sql(oracle_sql).df())
    con.close()
    assert list(got.columns) == list(want.columns), f"{list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
