#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): decompose the flagship into
noop-sink-timed phases, with AppStatusStore stage-metric deltas per
phase, so optimization targets the measured hot phase instead of the
whole wall. bench.py itself is FROZEN for driver measurement — this
file holds every extra measurement.

Usage:
  python bench_extra.py flagship          # phase decomposition
  python bench_extra.py legs              # the five secondary legs, noop-timed
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_MULT (default 100),
     SPARK_GRAFT_EXECUTORS (default 4x4x6144 — bench.py's shape),
     SPARK_GRAFT_REPS (default 2; first rep warms codegen, last reported).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def stage_totals(spark) -> dict[str, int]:
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    seq = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    tot = {"sw_bytes": 0, "sr_bytes": 0, "sw_recs": 0, "exec_ms": 0, "stages": 0}
    for i in range(seq.size()):
        st = seq.apply(i)
        tot["sw_bytes"] += st.shuffleWriteBytes()
        tot["sr_bytes"] += st.shuffleReadBytes()
        tot["sw_recs"] += st.shuffleWriteRecords()
        tot["exec_ms"] += st.executorRunTime()
        tot["stages"] += 1
    return tot


def main() -> None:
    from pyspark.sql import functions as F

    from hope_graph_builder_spark import synth
    from hope_graph_builder_spark.operators.noise import aggregate_noise_values, LAYER_NAMES
    from hope_graph_builder_spark.operators.sampling import sample_edges, with_xy_id
    from hope_graph_builder_spark.operators.spatial_join import (
        dwithin_join, hot_cell_factors, pip_join_rect, with_point_cell,
    )
    from hope_graph_builder_spark.pipelines.noise_join import (
        location_exposures, noise_final_samples, run_noise_join,
    )
    from hope_graph_builder_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_MULT", "100"))
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    executors = os.environ.get("SPARK_GRAFT_EXECUTORS")
    if executors is None:
        executors = "4x4x6144"
    spark = get_spark(app=f"bench_extra[{mode}]", cpus=cpus, executors=executors or None)
    spark.sparkContext.setLogLevel("ERROR")
    layers = synth.noise_layers(spark)

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    cache_root = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/dev/shm/bench_inputs")

    def materialize(df, name):
        path = f"{cache_root}/{sf_tag}_m{mult}/{name}"
        if not os.path.exists(path + "/_SUCCESS"):
            df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    edges = materialize(synth.page_edges_dense(spark, sf_dir, mult), "edges")
    points = materialize(synth.page_points_dense(spark, sf_dir, mult), "points")
    edges_tenth = materialize(
        synth.page_edges_dense(spark, sf_dir, max(mult // 10, 1)).filter(
            F.col("edge_id") % 10 != 0
        ),
        "edges_tenth",
    )

    out: dict[str, dict] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def phase(name, df, sink=noop):
        spark.sparkContext.setJobDescription(name)
        best = None
        for r in range(reps):
            t0 = time.time()
            m0 = stage_totals(spark)
            sink(df)
            dt = time.time() - t0
            m1 = stage_totals(spark)
            best = {
                "sec": round(dt, 3),
                "sw_mb": round((m1["sw_bytes"] - m0["sw_bytes"]) / 1e6, 1),
                "sr_mb": round((m1["sr_bytes"] - m0["sr_bytes"]) / 1e6, 1),
                "sw_recs": m1["sw_recs"] - m0["sw_recs"],
                "exec_s": round((m1["exec_ms"] - m0["exec_ms"]) / 1e3, 1),
                "stages": m1["stages"] - m0["stages"],
            }
        out[name] = best
        print(f"# {name}: {best}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    def consume(df):
        df.agg(
            F.bit_xor(F.xxhash64(F.to_json(F.struct(*df.columns)))).alias("x"),
            F.count(F.lit(1)).alias("n"),
        ).collect()

    NR = synth.NODATA_RECT

    if mode == "flagship":
        samples = with_xy_id(sample_edges(edges))
        phase("A_scan_edges", edges)
        phase("B_samples_explode", samples)
        phase("C_location_exposures", location_exposures(samples, layers, 7))
        pts = location_exposures(samples, layers, 7)
        x = (F.floor(F.col("xy_id") / 10_000_000) / 10.0)
        y = (F.pmod(F.col("xy_id"), 10_000_000) / 10.0)
        nx0, ny0, nx1, ny1 = NR
        pts2 = pts.select(
            "xy_id", x.alias("x"), y.alias("y"),
            ((x >= nx0) & (x < nx1) & (y >= ny0) & (y < ny1)).alias("nodata_zone"),
            *LAYER_NAMES,
        )
        phase("D_normal_branch", aggregate_noise_values(pts2))
        final = noise_final_samples(edges, layers, NR, res=7)
        phase("E_final_samples_joined", final)
        fl = run_noise_join(edges, layers, NR, res=7)
        phase("F_full_noop", fl)
        phase("G_full_hashfold", fl, sink=consume)
    elif mode == "legs":
        phase("point_cells", with_point_cell(points, "x", "y", 9))
        phase("pip_join", pip_join_rect(points, layers, res=8, how="inner", point_id="doc_id"))
        phase("pip_join_shuffle_salted", pip_join_rect(
            points, layers, res=7, how="inner", point_id="doc_id",
            salt=8, broadcast_polys=False))
        pw = with_point_cell(points, "x", "y", 7)
        hot = hot_cell_factors(pw, threshold=max(125 * mult, 100_000)).localCheckpoint()
        phase("pip_join_shuffle_hot", pip_join_rect(
            points, layers, res=7, how="inner", point_id="doc_id",
            hot=hot, broadcast_polys=False))
        phase("dwithin_join", dwithin_join(
            points.filter(F.col("doc_id") % 10 != 0), edges_tenth, dist=30.0, res=9))
    else:
        raise SystemExit(f"unknown mode {mode}")

    spark.stop()
    print(json.dumps({"mode": mode, "mult": mult, "phases": out}), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
