#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode (used for BENCH/BASELINE.md evidence) re-runs the
flagship at two parallelism levels in separate JVMs and reports
throughput at each plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _headline_queries():
    from hope_graph_builder_spark import contract

    q = contract.queries()
    names = [
        "noise_exposures",
        "pip_point_layers",
        "dwithin_pages_edges",
        "point_cells",
        "edge_sampling",
    ]
    return {n: q[n] for n in names if n in q}


def run(sf_dir: str, cpus: int) -> dict:
    from hope_graph_builder_spark.session import get_spark

    spark = get_spark(app=f"bench[{cpus}]", cpus=cpus)
    timings: dict[str, float] = {}
    for name, fn in _headline_queries().items():
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    if "--scaling" in sys.argv:
        # child mode: run once at given cpus, print json
        timings = run(sf_dir, cpus)
        print(json.dumps({"cpus": cpus, "queries": timings}))
        return

    timings = run(sf_dir, cpus)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "spatial-join+tiling headline queries wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
