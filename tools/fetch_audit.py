#!/usr/bin/env python
"""Measure — not infer — the inter-JVM shuffle-fetch cost behind the
sub-0.8 standalone PIP legs (BASELINE.md residual analysis): run a leg
twice (first run warms JIT; second is reported) under the EXECS
topology and diff AppStatusStore stage metrics, splitting shuffle
reads into LOCAL vs REMOTE bytes plus blocked fetch-wait and remote
request service time.

At N = local-cluster[1,2,·] every shuffle block is process-local
(remote bytes ≈ 0); at 4N = local-cluster[4,2,·] ~3/4 of blocks cross
JVMs. On a real cluster BOTH sizes fetch over the network — the N leg
is flattered by exactly the cost this tool makes visible.

Usage:
  EXECS=1x2x12288 MULT=16000 python tools/fetch_audit.py
  EXECS=4x2x12288 MULT=16000 python tools/fetch_audit.py
Prints one JSON line per query leg.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

FIELDS = (
    "shuffleLocalBytesRead",
    "shuffleRemoteBytesRead",
    "shuffleFetchWaitTime",
    "shuffleRemoteReqsDuration",
    "shuffleWriteBytes",
    "executorRunTime",
)


def totals(spark) -> dict[str, int]:
    from shuffle_audit import all_stages

    out = dict.fromkeys(FIELDS, 0)
    for st in all_stages(spark):
        for f in FIELDS:
            out[f] += getattr(st, f)()
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from hope_graph_builder_spark import synth
    from hope_graph_builder_spark.operators.spatial_join import (
        dwithin_join,
        hot_cell_factors,
        pip_join_rect,
        with_point_cell,
    )
    from hope_graph_builder_spark.session import get_spark

    execs = os.environ.get("EXECS", "1x2x12288")
    mult = int(os.environ.get("MULT", "16000"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app=f"fetch_audit[{execs}]", executors=execs)
    spark.sparkContext.setLogLevel("ERROR")

    layers = synth.noise_layers(spark)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    points = spark.read.parquet(f"/dev/shm/bench_inputs/{tag}_m{mult}/points")
    edges_tenth = spark.read.parquet(f"/dev/shm/bench_inputs/{tag}_m{mult}/edges_tenth")

    pw = with_point_cell(points, "x", "y", 7)
    hot = hot_cell_factors(pw, threshold=max(125 * mult, 100_000)).localCheckpoint()

    legs = {
        "pip_join_shuffle_hot": lambda: pip_join_rect(
            points, layers, res=7, how="inner", point_id="doc_id",
            hot=hot, broadcast_polys=False,
        ),
        "dwithin_join": lambda: dwithin_join(
            points.filter(F.col("doc_id") % 10 != 0), edges_tenth, dist=30.0, res=9
        ),
    }
    for name, build in legs.items():
        for attempt in ("warmup", "warm"):
            before = totals(spark)
            t0 = time.time()
            build().count()
            wall = time.time() - t0
            after = totals(spark)  # one snapshot — per-field rescans could straddle late stage updates
            delta = {f: after[f] - before[f] for f in FIELDS}
            if attempt == "warm":
                print(json.dumps({
                    "query": name, "execs": execs, "mult": mult,
                    "wall_sec": round(wall, 3), **delta,
                }), flush=True)
    spark.stop()
    os._exit(0)


if __name__ == "__main__":
    main()
