#!/usr/bin/env python
"""Zero-engine-logic scan control for the webtext scaling legs: read
the SAME cached pages parquet the webtext bench consumes and fold
sum(length(text)) + count — pure I/O + decompress + string
materialization, no joins, no engine operators. Whatever efficiency
this reads at a given executor shape is the HOST's ceiling for
string-heavy scans; an engine pipeline cannot scale better than its
input stream.

Usage: SPARK_GRAFT_EXECUTORS=2x2x12288 [SPARK_GRAFT_WMULT=100]
       python tools/bench_scan_control.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.session import get_spark

    mult = int(os.environ.get("SPARK_GRAFT_WMULT", "100"))
    executors = os.environ.get("SPARK_GRAFT_EXECUTORS", "4x2x12288")
    cores = int(executors.split("x")[0]) * int(executors.split("x")[1])
    cache = f"/dev/shm/bench_inputs/webtext_m{mult}"
    if not os.path.exists(cache + "/_SUCCESS"):
        raise SystemExit(f"run tools/bench_webtext.py first to build {cache}")
    spark = get_spark(app=f"scan_control[{cores}]", cpus=cores, executors=executors)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(cache).repartition(cores * 4)

    # warm-up (JIT + codegen), then the timed fold
    pages.limit(1000).agg(F.sum(F.length("text"))).collect()
    t0 = time.time()
    row = pages.agg(
        F.sum(F.length("text")).alias("chars"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    wall = time.time() - t0
    spark.stop()
    print(json.dumps({
        "cpus": cores, "rows": row["n"], "chars": row["chars"],
        "wall": round(wall, 3), "rows_per_sec": round(row["n"] / wall, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
