#!/usr/bin/env python
"""Per-job profile of one registry query: runs it (optionally twice, the
second run after clearCache so fixture-cached rows profile their serving
path), then dumps every Spark job's duration/description/stage metrics
via the live UI REST API.  Analysis-only tool — bench methodology is
unchanged (bench.py still uses get_spark with the UI off)."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402


def get_spark_ui(app_name: str = "r12-profile") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .getOrCreate()
    )


def main() -> None:
    names = sys.argv[1:]
    runs = 2
    if names and names[0] == "--once":
        runs = 1
        names = names[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    from tidb2dw_spark import entry_queries

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(first_job: int):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            js = json.load(r)
        out = []
        for j in sorted(js, key=lambda j: j["jobId"]):
            if j["jobId"] < first_job:
                continue
            dur = None
            if "completionTime" in j and "submissionTime" in j:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                t0 = datetime.strptime(j["submissionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                t1 = datetime.strptime(j["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                dur = (t1 - t0).total_seconds()
            out.append(
                {
                    "jobId": j["jobId"],
                    "sec": dur,
                    "desc": (j.get("description") or j.get("name") or "")[:150],
                    "stages": j.get("stageIds", []),
                    "tasks": j.get("numTasks"),
                }
            )
        return out

    for name in names:
        fn = entry_queries.QUERIES[name]
        for i in range(runs):
            spark.catalog.clearCache()
            tracker = spark.sparkContext.statusTracker()
            ids = tracker.getJobIdsForGroup(None) or []
            first = (max(ids) + 1) if ids else 0
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            if i == runs - 1:
                js = jobs_after(first)
                total = sum(j["sec"] or 0 for j in js)
                print(f"=== {name} run{i} wall={wall:.3f}s jobs={len(js)} jobsum={total:.3f}s")
                for j in js:
                    print(f"  job {j['jobId']:>4} {j['sec']:>7.3f}s tasks={j['tasks']:>4} {j['desc']}")
            else:
                print(f"=== {name} run{i} wall={wall:.3f}s (warm-up)")


if __name__ == "__main__":
    main()
