#!/usr/bin/env python
"""Composed-curation scaling evidence (pipelines/curation
.run_corpus_curation): run the full five-stage chain — Gopher battery
gate → per-source quota → token-budget pack → chunking → sharding —
over a densified documents corpus at one executor shape and print one
JSON line.

Densification: documents × MULT with per-copy version tags and MULT%25
source splits (so quota pressure is real: 25× the base source count,
MULT/25 copies land in each). Input is materialized once to /dev/shm
with an explicit partition layout (the operators scale with partitions;
the 3-file default layout measures the scan, not the engine — see
BASELINE.md §6).

Usage:
  SPARK_GRAFT_EXECUTORS=4x2x12288 SPARK_GRAFT_CMULT=100 \
      python tools/bench_curation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATE = [
    "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
    "ok_alpha_words", "ok_bullet_lines", "ok_ellipsis_lines",
    "ok_dup_lines",
]


def main() -> None:
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.pipelines.curation import run_corpus_curation
    from hope_graph_builder_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("SPARK_GRAFT_CMULT", "100"))
    executors = os.environ.get("SPARK_GRAFT_EXECUTORS", "4x2x12288")
    cores = int(executors.split("x")[0]) * int(executors.split("x")[1])
    spark = get_spark(app=f"bench_curation[{cores}]", cpus=cores,
                      executors=executors)
    spark.sparkContext.setLogLevel("ERROR")

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    cache = f"/dev/shm/bench_inputs/curation_{sf_tag}_m{mult}"
    if not os.path.exists(cache + "/_SUCCESS"):
        base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "source", "text"
        )
        n0 = base.count()
        copies = spark.range(mult).select(F.col("id").alias("_m"))
        docs = base.crossJoin(copies).select(
            (F.col("doc_id") + F.col("_m") * (n0 + 17)).alias("doc_id"),
            F.concat(F.col("source"), F.lit("_"),
                     (F.col("_m") % 25).cast("string")).alias("source"),
            F.concat(F.lit("v"), F.col("_m").cast("string"), F.lit(" "),
                     F.col("text")).alias("text"),
        ).repartition(64)
        docs.write.mode("overwrite").parquet(cache)
    docs = spark.read.parquet(cache)
    n_docs = docs.count()
    n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]

    kw = dict(quota_per_source=300, token_budget=2_000_000, seq_len=64,
              overlap=8, n_shards=32, gate_cols=GATE)
    # warm-up: plan shapes on a slice
    run_corpus_curation(docs.limit(500), **kw).agg(
        F.count(F.lit(1))
    ).collect()

    t0 = time.time()
    out = run_corpus_curation(docs, **kw)
    row = out.agg(
        F.bit_xor(F.xxhash64("shard", "pos", "chunk_text")).alias("x"),
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("tok"),
    ).collect()[0]
    wall = time.time() - t0
    spark.stop()
    print(json.dumps({
        "cpus": cores, "docs": n_docs, "chars": int(n_chars),
        "chunks": row["n"], "tokens": int(row["tok"]),
        "xor": row["x"], "wall": round(wall, 3),
        "kdocs_per_sec": round(n_docs / wall / 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
