"""Operator-level tests: graph CC vs a Python union-find oracle,
multimodal plumbing, dedup/similarity sanity."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from hope_graph_builder_spark import synth
from hope_graph_builder_spark.operators import dedup, multimodal, similarity
from hope_graph_builder_spark.operators.graph import (
    connected_components,
    drop_small_components,
    redensify_ids,
    remove_isolated_nodes,
)

from tests.conftest import SF_TINY


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    pdf = pd.DataFrame({
        "src": [1, 2, 3, 10, 11, 20, 21, 21],
        "dst": [2, 3, 4, 11, 12, 21, 20, 22],
    })
    cc = connected_components(spark.createDataFrame(pdf)).toPandas()
    oracle = _union_find(list(zip(pdf.src, pdf.dst)))
    # canonical label = min id per component in both
    got = dict(zip(cc.id, cc.component))
    assert got == oracle


def test_graph_cleanup_chain(spark):
    pdf = pd.DataFrame({
        "src": [1, 2, 3, 10, 50],
        "dst": [2, 3, 4, 11, 51],
    })
    edges = spark.createDataFrame(pdf)
    cc = connected_components(edges)
    kept = drop_small_components(edges, cc, min_nodes=2)
    # components {10,11} and {50,51} have exactly 2 nodes → dropped
    assert sorted(r.src for r in kept.collect()) == [1, 2, 3]
    nodes = spark.createDataFrame(pd.DataFrame({"id": [1, 2, 3, 4, 10, 11, 99]}))
    alive = remove_isolated_nodes(nodes, kept)
    assert sorted(r.id for r in alive.collect()) == [1, 2, 3, 4]
    dense = redensify_ids(alive).toPandas().sort_values("id")
    assert dense.new_id.tolist() == [0, 1, 2, 3]


def test_multimodal_features(spark):
    pages = synth.pages(spark, SF_TINY)
    out = multimodal.extract_features(pages)
    rows = out.limit(5).collect()
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in rows)
    assert all(abs(sum(r.features) - 1.0) < 1e-3 for r in rows)
    assert out.count() == pages.count()
    # deterministic: same input → same features
    r2 = out.limit(5).collect()
    assert [r.features for r in rows] == [r.features for r in r2]


def test_minhash_catches_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base, base + " ok", "completely different words entirely unrelated content here"],
    })
    pairs = dedup.minhash_dup_pairs(spark.createDataFrame(docs)).collect()
    got = {(r.a, r.b) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_cosine_topk_self_similarity(spark):
    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = similarity.cosine_topk(emb, q, k=5).toPandas()
    assert set(out.query_id) == {0, 1, 2}
    assert (out.groupby("query_id").size() == 5).all()
    assert (out.cos <= 1.0 + 1e-9).all() and (out.cos >= -1.0 - 1e-9).all()
    # ANN recall: bucketed candidates are a subset ranked identically
    ann = similarity.ann_lsh_topk(emb, q, k=5).toPandas()
    assert set(ann.columns) == {"query_id", "cand_id", "cos", "rank"}
