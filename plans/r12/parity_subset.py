#!/usr/bin/env python
"""Driver-sim parity for a SUBSET of declared queries (fast iteration
during the optimization round): same hash methodology as the driver.

Usage: python plans/r12/parity_subset.py <query> [<query> ...] [--sf DIR]
"""
from __future__ import annotations

import hashlib
import importlib.util
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if "--sf" in args:
    i = args.index("--sf")
    SF = args[i + 1]
    del args[i : i + 2]
names = args

from tidb2dw_spark import entry_queries  # noqa: E402
from tidb2dw_spark.session import get_spark  # noqa: E402

spark = get_spark("r12-parity-subset")
spark.sparkContext.setLogLevel("ERROR")
import duckdb  # noqa: E402

con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def vhash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


qs, os_ = entry_queries.QUERIES, entry_queries.ORACLES
bad = 0
for name in names:
    sdf = qs[name](spark, SF).toPandas()
    if name in os_:
        odf = con.sql(os_[name]).df()
        ok = (
            len(sdf) == len(odf)
            and sorted(sdf.columns) == sorted(odf.columns)
            and vhash(sdf) == vhash(odf)
        )
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} ({len(sdf)} rows)")
        bad += 0 if ok else 1
    else:
        print(f"  {name}: rows-only ({len(sdf)})")
sys.exit(1 if bad else 0)
