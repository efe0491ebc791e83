#!/usr/bin/env python
"""Round-12 optimization measurement harness.

Usage:
    python plans/r11/measure.py <query> [<query> ...] [--repeats N] [--explain]

For each named registry query: runs it `repeats` times (best-of, same
methodology as bench.py — clearCache between runs, timed .count()), and
with --explain also writes plans/r11/<query>_<tag>.txt containing
df.explain("formatted") output.  Jobs are labelled so the (disabled) UI /
event logs stay readable.  Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

from tidb2dw_spark.session import get_spark  # noqa: E402
from tidb2dw_spark import entry_queries  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    repeats = 3
    explain = False
    tag = "before"
    names = []
    it = iter(range(len(args)))
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain = True; i += 1
        elif a == "--tag":
            tag = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r12-measure")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM the same way bench.py does
    entry_queries.QUERIES["merge_orders"](spark, sf_dir).count()

    for name in names:
        fn = entry_queries.QUERIES[name]
        if explain:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(REPO, "plans", "r12", f"{name}_{tag}.txt")
            with open(out, "w") as f:
                f.write(plan)
        best = float("inf")
        times = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r12-measure:{name}")
            start = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - start
            times.append(round(dt, 3))
            best = min(best, dt)
        print(json.dumps({"query": name, "best": round(best, 3), "runs": times}))


if __name__ == "__main__":
    main()
