"""Cross-engine property test for the checksum-suite fingerprint algebra
(entry_suites): for random values of every supported kind, the Spark
expression and the generated DuckDB SQL must produce identical
(n_rows, checksum) — the invariant the suite rows' bit-exactness rests on."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from tidb2dw_spark.entry_suites import _dk_row_fp, _spark_row_fp

SPEC = [("b", "bool"), ("d", "dbl"), ("i", "int"), ("s", "str"), ("t", "ts")]

ints = st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62))
# quantization domain: |x|*1e6 must stay in exact-double integer range
dbls = st.one_of(
    st.none(),
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
)
strs = st.one_of(st.none(), st.text(alphabet=st.characters(codec="utf-8", exclude_characters="'\x00"), max_size=40))
bools = st.one_of(st.none(), st.booleans())
tss = st.one_of(
    st.none(),
    st.datetimes(
        min_value=__import__("datetime").datetime(1971, 1, 1),
        max_value=__import__("datetime").datetime(2100, 1, 1),
    ),
)


@settings(max_examples=25, deadline=None)
@given(rows=st.lists(st.tuples(bools, dbls, ints, strs, tss), min_size=1, max_size=5))
def test_fingerprint_parity(spark_session, rows):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = spark_session
    schema = T.StructType(
        [
            T.StructField("b", T.BooleanType(), True),
            T.StructField("d", T.DoubleType(), True),
            T.StructField("i", T.LongType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("t", T.TimestampType(), True),
        ]
    )
    sdf = spark.createDataFrame(rows, schema=schema)
    got_spark = (
        sdf.select(_spark_row_fp(SPEC).alias("fp"))
        .agg(F.count("*").alias("n"), F.sum("fp").alias("c"))
        .collect()[0]
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t (b BOOLEAN, d DOUBLE, i BIGINT, s VARCHAR, t TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", rows)
    got_dk = con.execute(
        f"SELECT COUNT(*), CAST(SUM(fp) AS BIGINT) FROM (SELECT {_dk_row_fp(SPEC)} AS fp FROM t)"
    ).fetchone()

    assert (got_spark["n"], got_spark["c"]) == got_dk


@pytest.fixture(scope="module")
def spark_session(spark):
    return spark
