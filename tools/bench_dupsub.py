#!/usr/bin/env python
"""Exact-substring dedup scaling evidence (operators/dedup
.dup_substring_spans): run the full window-hash → corpus-count →
island-merge audit over a densified documents table at one executor
shape and print one JSON line.

Densification: documents unioned MULT times with shifted ids and a
per-copy HEAD tag; bodies stay byte-identical across copies, so every
window beyond the first ~k chars is genuinely duplicated MULT times —
the worst realistic case (near-total duplication) for the
groupBy(hash) combine and the flagged-position window.

Usage:
  SPARK_GRAFT_EXECUTORS=1x2x12288 SPARK_GRAFT_DMULT=20 \
      python tools/bench_dupsub.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators.dedup import dup_substring_spans
    from hope_graph_builder_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("SPARK_GRAFT_DMULT", "20"))
    k = int(os.environ.get("SPARK_GRAFT_DK", "40"))
    stride = int(os.environ.get("SPARK_GRAFT_DSTRIDE", "4"))
    executors = os.environ.get("SPARK_GRAFT_EXECUTORS", "4x2x12288")
    cores = int(executors.split("x")[0]) * int(executors.split("x")[1])
    spark = get_spark(app=f"bench_dupsub[{cores}]", cpus=cores, executors=executors)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    copies = spark.range(mult).select(F.col("id").alias("_m"))
    docs = base.crossJoin(copies).select(
        (F.col("doc_id") + F.col("_m") * (n_base + 17)).alias("doc_id"),
        F.concat(F.lit("copy"), F.col("_m").cast("string"), F.lit(" "),
                 F.col("text")).alias("text"),
    )
    cache = f"/dev/shm/bench_inputs/dupsub_m{mult}"
    if not os.path.exists(cache + "/_SUCCESS"):
        docs.write.mode("overwrite").parquet(cache)
    docs = spark.read.parquet(cache).repartition(cores * 4)
    n_docs = docs.count()
    n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]

    # warm-up: compile plan shapes on a small slice
    tiny = docs.limit(200)
    dup_substring_spans(tiny, k=k, stride=stride, hash_method="xx").agg(
        F.bit_xor(F.xxhash64(F.to_json(F.struct("doc_id", "dup_chars"))))
    ).collect()

    t0 = time.time()
    out = dup_substring_spans(docs, k=k, stride=stride, hash_method="xx")
    row = out.agg(
        F.bit_xor(F.xxhash64(F.to_json(F.struct(*out.columns)))).alias("x"),
        F.count(F.lit(1)).alias("n"),
        F.sum("dup_chars").alias("dc"),
    ).collect()[0]
    wall = time.time() - t0
    spark.stop()
    print(json.dumps({
        "cpus": cores, "docs": n_docs, "chars": int(n_chars), "k": k,
        "stride": stride, "rows": row["n"], "dup_chars": int(row["dc"]),
        "wall": round(wall, 3),
        "mchars_per_sec": round(n_chars / wall / 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
