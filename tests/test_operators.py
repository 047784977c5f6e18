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


def test_kmeans_lloyd_converges_and_feeds_ivf(spark):
    """Lloyd iterations must tighten clusters on a separable fixture,
    and ivf_topk(centroids=trained, nprobe=nlist) must equal the exact
    brute-force top-k (with every list probed, routing cannot lose a
    candidate)."""
    import numpy as np

    from hope_graph_builder_spark.operators import similarity

    rng = np.random.RandomState(42)
    centers = rng.normal(size=(4, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + 0.15 * rng.normal(size=64)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cen1 = similarity.kmeans_lloyd(emb, k=4, iters=1)
    cen3 = similarity.kmeans_lloyd(emb, k=4, iters=3)

    def sse(cen_df):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        c = emb.select(F.col("vec_id").alias("cand_id"),
                       similarity._as_double(F.col("embedding")).alias("cv"))
        wa = Window.partitionBy("cand_id").orderBy(F.desc("acos"), F.asc("list_id"))
        a = (c.crossJoin(F.broadcast(cen_df.select("list_id", "cen")))
             .withColumn("acos", similarity.cosine(F.col("cv"), F.col("cen")))
             .withColumn("r", F.row_number().over(wa)).filter("r = 1"))
        return a.agg(F.avg(1.0 - F.col("acos"))).collect()[0][0]

    assert sse(cen3) <= sse(cen1) + 1e-12
    sizes = {r.list_id: r.size for r in cen3.collect()}
    assert sum(sizes.values()) == 200 and len(sizes) == 4
    # trained-centroid IVF with full probing == exact brute force
    q = emb.filter("vec_id % 50 = 0")
    ivf = similarity.ivf_topk(emb, q, k=5, nlist=4, nprobe=4, centroids=cen3)
    exact = similarity.cosine_topk(emb, q, k=5)
    got = {(r.query_id, r.rank): r.cand_id for r in ivf.collect()}
    want = {(r.query_id, r.rank): r.cand_id for r in exact.collect()}
    assert got == want


def test_dwithin_salting_preserves_results(spark):
    """dwithin_join salted / profile-hot ≡ unsalted on the synthetic
    hotspot data (the skew those valves exist for)."""
    from pyspark.sql import functions as F

    from hope_graph_builder_spark import synth
    from hope_graph_builder_spark.operators.spatial_join import (
        dwithin_join,
        hot_cell_factors,
        with_point_cell,
    )
    from tests.conftest import SF_TINY

    pts = synth.page_points(spark, SF_TINY).select("doc_id", "x", "y")
    edges = synth.page_edges(spark, SF_TINY).select("edge_id", "x1", "y1", "x2", "y2")
    base = dwithin_join(pts, edges, dist=30.0, res=9).select("doc_id", "edge_id")
    salted = dwithin_join(pts, edges, dist=30.0, res=9, salt=8).select("doc_id", "edge_id")
    hot = hot_cell_factors(with_point_cell(pts, "x", "y", 9), threshold=5).localCheckpoint()
    hotted = dwithin_join(pts, edges, dist=30.0, res=9, hot=hot).select("doc_id", "edge_id")
    for other in (salted, hotted):
        assert base.exceptAll(other).count() == 0
        assert other.exceptAll(base).count() == 0
    assert base.count() > 0


def test_dedup_clusters_transitive_and_singletons(spark):
    from hope_graph_builder_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, base),        # near/exact dups
         (10, "completely different content about spark engines " * 8),
         (11, "completely different content about spark engines " * 8),  # dup pair
         (20, "a lone unique document with its own words entirely " * 6)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.dedup_clusters(docs).collect()}
    assert out[1].cluster_id == 1 and out[3].cluster_id == 1
    assert out[2].cluster_id == 1  # transitive via shared buckets
    assert out[10].cluster_id == 10 and out[11].cluster_id == 10
    assert out[20].cluster_id == 20 and out[20].keep
    keeps = [d for d, r in out.items() if r.keep]
    assert sorted(keeps) == [1, 10, 20]
    # exactly one canonical per cluster
    clusters = {r.cluster_id for r in out.values()}
    assert len(keeps) == len(clusters)


def test_repetition_signals_hand_cases(spark):
    from hope_graph_builder_spark.operators import text as textops
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "a a a b"),            # 4 tokens, 2 distinct → dup_tok 0.5
         (2, "x y x y x y"),        # bigrams: xy,yx,xy,yx,xy → 5 total 2 distinct
         (3, "all words unique here"),
         (4, "w"),                  # 1 token → bigram/trigram ratios 0
         (5, "")],
        "doc_id long, text string",
    )
    t = F.col("text")
    out = {r.doc_id: r for r in docs.select(
        "doc_id",
        textops.dup_ngram_ratio(t, 1).alias("r1"),
        textops.dup_ngram_ratio(t, 2).alias("r2"),
        textops.repetition_flags(t).alias("ok"),
    ).collect()}
    assert out[1].r1 == 0.5
    assert abs(out[2].r2 - 3.0 / 5.0) < 1e-15
    assert out[3].r1 == 0.0 and out[3].ok
    assert out[4].r2 == 0.0 and out[4].ok
    assert out[5].r1 == 0.0
    assert not out[2].ok  # looped text fails the bigram gate


def test_asof_join_semantics(spark):
    """≤-semantics, latest-wins, per-key isolation, NULL when no prior."""
    from datetime import datetime

    from hope_graph_builder_spark.operators.temporal import asof_join

    T = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 7, T("2024-01-01T10:00:00")),
         (2, 7, T("2024-01-01T12:00:00")),
         (3, 8, T("2024-01-01T09:00:00")),   # no prior view for user 8
         (4, 9, T("2024-01-01T11:00:00"))],  # exact-ts match
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, 100, T("2024-01-01T09:30:00"), 1.0),
         (7, 101, T("2024-01-01T11:30:00"), 2.0),
         (8, 102, T("2024-01-01T09:30:00"), 3.0),   # AFTER left 3 → no match
         (9, 103, T("2024-01-01T11:00:00"), 4.0)],  # ts == left 4 ts → matches
        "user_id long, event_id long, ts timestamp, value double",
    )
    out = {r.event_id: r for r in asof_join(
        left, right, by="user_id", payload=["event_id", "ts", "value"]
    ).collect()}
    assert out[1].prev_event_id == 100 and out[1].prev_value == 1.0
    assert out[2].prev_event_id == 101   # latest of the two priors
    assert out[3].prev_event_id is None and out[3].prev_ts is None
    assert out[4].prev_event_id == 103   # <= includes the exact tie


def test_interval_join_bins_and_boundaries(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators.temporal import interval_join

    T = lambda s: datetime.fromisoformat(s)  # noqa: E731
    pts = spark.createDataFrame(
        [(1, T("2024-01-01T10:00:00")),       # == start → in
         (2, T("2024-01-01T12:00:00")),       # == end → OUT (half-open)
         (3, T("2024-01-01T11:59:59.900")),   # sub-second before end → in
         (4, T("2024-01-01T13:30:00")),       # outside
         (5, T("2024-01-02T02:00:00"))],      # inside the long window
        "event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(100, T("2024-01-01T10:00:00"), T("2024-01-01T12:00:00")),
         (200, T("2024-01-01T20:00:00"), T("2024-01-02T06:00:00"))],  # spans 10 bins
        "window_id long, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(pts, iv)
    got = sorted((r.event_id, r.window_id) for r in out.collect())
    assert got == [(1, 100), (3, 100), (5, 200)]
    # each pair exactly once despite the multi-bin cover
    assert out.count() == len(got)
    # the plan is an equi-join, not a broadcast nested loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_cover_valve(spark):
    """Heavy-tailed intervals route to coarser bin levels (the
    time-axis split_by_cover_size): results identical to the
    valve-free join, the plan stays equi-join (no BNLJ/Cartesian),
    every interval's explode at its routed level is ≤ max_cover, and
    each interval lives in exactly one level (no duplicate pairs)."""
    from datetime import datetime, timedelta

    from hope_graph_builder_spark.operators.temporal import interval_join

    base = datetime.fromisoformat("2024-01-01T00:00:00")
    # 40 short (≤ 2 h) windows + 6 long tails (3 d .. 40 d)
    iv_rows, pt_rows = [], []
    for i in range(40):
        s = base + timedelta(hours=3 * i, minutes=7)
        iv_rows.append((i, s, s + timedelta(minutes=30 + i)))
        pt_rows.append((1000 + i, s + timedelta(minutes=10)))
    for j, days in enumerate([3, 5, 8, 13, 21, 40]):
        s = base + timedelta(hours=11 * j)
        iv_rows.append((100 + j, s, s + timedelta(days=days)))
        pt_rows.append((2000 + j, s + timedelta(days=days // 2)))
    pts = spark.createDataFrame(pt_rows, "event_id long, ts timestamp")
    iv = spark.createDataFrame(
        iv_rows, "window_id long, start_ts timestamp, end_ts timestamp"
    )
    MAXC = 4
    valved = interval_join(pts, iv, max_cover=MAXC, level_scale=8)
    plain = interval_join(pts, iv)  # single-level reference
    got = sorted((r.event_id, r.window_id) for r in valved.collect())
    want = sorted((r.event_id, r.window_id) for r in plain.collect())
    assert got == want and len(got) == len(set(got))  # equal, no dups
    plan = valved._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # explode bound: at its routed level every interval covers ≤ MAXC
    # bins (levels 3600·8^ℓ; an interval routes to the first level
    # where its cover fits)
    import math

    for _, s, e in iv_rows:
        su, eu = int(s.timestamp()), int(e.timestamp())
        for lvl in range(6):
            w = 3600 * 8 ** lvl
            cover = eu // w - su // w + 1
            if cover <= MAXC or lvl == 5:
                assert cover <= MAXC, f"interval cover {cover} > {MAXC} at final level"
                break


def test_kmeans_anchor_init_offset_ids(spark):
    """Rank-based anchor init: ids starting at 10^6 still yield k
    clusters (the value-based `id < k` init silently produced ZERO
    anchors here); a corpus smaller than k raises instead of training
    short."""
    import pytest as _pytest

    from hope_graph_builder_spark.operators import similarity

    emb = (
        spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    cen = similarity.kmeans_lloyd(emb, k=4, iters=1)
    rows = cen.collect()
    assert sorted(r.list_id for r in rows) == [0, 1, 2, 3]
    assert all(len(r.cen) == 64 and r.size > 0 for r in rows)
    with _pytest.raises(ValueError, match="anchor init"):
        similarity.kmeans_lloyd(emb.limit(3), k=4, iters=1)
    # ivf_topk shares the anchor path: offset ids still route
    out = similarity.ivf_topk(emb, emb.limit(4), k=3, nlist=4, nprobe=2)
    assert out.count() > 0


def test_webtext_trigram_vs_marker_disagreement(spark):
    """A doc whose marker-word score says 'de' (it contains ' der und
    die ' once, no en marker words) but whose trigram profile hits say
    'en' (the body is English): the v2 pipeline must follow the
    TRAINED trigram classifier, not the marker heuristic."""
    from pyspark.sql import Row

    from hope_graph_builder_spark.operators import text as textops
    from hope_graph_builder_spark.operators.extract import markup_pages
    from hope_graph_builder_spark.pipelines.webtext import run_webtext_ingest

    train = spark.createDataFrame([
        Row(doc_id=1, text="quick brown fox jumps over lazy dog rain falls "
                           "green field wind north quick brown fox jumps lazy dog",
            lang="en"),
        Row(doc_id=2, text="der hund und die katze der wald und die sonne "
                           "der regen und die wiese", lang="de"),
    ])
    profiles = textops.train_lang_profiles(train, top_n=64)

    body = "quick brown fox jumps over lazy dog der und die " + " ".join(
        f"field{i} green{i} rain{i} wind{i}" for i in range(30)
    )
    pages = spark.createDataFrame(
        [(1, "https://x.example/1", body, None)],
        "doc_id long, url string, text string, lang string",
    )
    pages = markup_pages(pages)
    # marker heuristic: de markers (der/und/die) = 3 > en markers = 0
    marker = pages.select(textops.lang_id(F.col("text")).alias("m")).first().m
    assert marker == "de"
    out = run_webtext_ingest(pages, profiles=profiles).first()
    assert out.lang_pred == "en"  # trigram hits overwhelm the markers
    assert out.keep  # rich varied text passes both gates


def test_asof_join_total_tiebreak_deterministic(spark):
    """Two right rows sharing (key, ts, payload[0]) but differing in a
    later payload field: the carried payload must be the struct-order
    minimum... maximum under last(): the window orders by the FULL
    payload struct ascending, so the LAST row in frame order (the one
    carried forward) is the struct-maximum — pinned and stable across
    partitionings."""
    from datetime import datetime

    from hope_graph_builder_spark.operators.temporal import asof_join

    T = datetime.fromisoformat
    left = spark.createDataFrame(
        [(1, 7, T("2024-01-01T12:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right_rows = [
        (7, 100, T("2024-01-01T10:00:00"), 5.0),   # tie on (user, ts, event_id)
        (7, 100, T("2024-01-01T10:00:00"), 2.0),
    ]
    for nparts in (1, 4):
        right = spark.createDataFrame(
            right_rows, "user_id long, event_id long, ts timestamp, value double"
        ).repartition(nparts)
        r = asof_join(left, right, by="user_id",
                      payload=["event_id", "ts", "value"]).first()
        # full-struct order: (100, ts, 2.0) < (100, ts, 5.0) → last = 5.0
        assert r.prev_value == 5.0, f"nondeterministic tie at nparts={nparts}"


def test_dwithin_polyline_matches_bruteforce(spark):
    """dwithin_polyline_join (segment explode → cell join → refine →
    min agg) ≡ the brute-force cross-join min over every segment; the
    salted variant is identical too."""
    from hope_graph_builder_spark.operators.spatial_join import (
        dwithin_polyline_join,
        point_segment_dist2,
    )

    pts = synth.page_points(spark, SF_TINY).select("doc_id", "x", "y").limit(200)
    pl = synth.page_polylines(spark, SF_TINY).limit(200)
    out = dwithin_polyline_join(pts, pl, dist=30.0, res=9)
    n = F.size("xs")
    segs = pl.select(
        "edge_id",
        F.explode(F.sequence(F.lit(1), n - 1)).alias("_i"),
        "xs", "ys",
    ).select(
        "edge_id",
        F.element_at("xs", F.col("_i").cast("int")).alias("x1"),
        F.element_at("ys", F.col("_i").cast("int")).alias("y1"),
        F.element_at("xs", (F.col("_i") + 1).cast("int")).alias("x2"),
        F.element_at("ys", (F.col("_i") + 1).cast("int")).alias("y2"),
    )
    brute = (
        segs.crossJoin(pts)
        .withColumn("_d2", point_segment_dist2("x", "y"))
        .groupBy("edge_id", "doc_id")
        .agg(F.min("_d2").alias("min_d2"))
        .filter(F.col("min_d2") <= 900.0)
    )
    assert out.exceptAll(brute).count() == 0
    assert brute.exceptAll(out).count() == 0
    assert out.count() > 0
    salted = dwithin_polyline_join(pts, pl, dist=30.0, res=9, salt=4)
    assert salted.exceptAll(out).count() == 0
    assert out.exceptAll(salted).count() == 0


def test_host_and_domain_extraction(spark):
    """host_expr strips scheme, userinfo, port; lowercases.
    registered_domain_expr = last two labels (documented
    public-suffix approximation)."""
    from hope_graph_builder_spark.operators import web

    rows = [
        ("https://Example.ORG/x", "example.org", "example.org"),
        ("http://a.b.example.net:8080/p?q=1", "a.b.example.net", "example.net"),
        ("https://user:pw@Sub.Host.Org/", "sub.host.org", "host.org"),
        ("https://localhost/x", "localhost", "localhost"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], "url string")
    got = df.select(
        web.host_expr(F.col("url")).alias("h"),
        web.registered_domain_expr(F.col("url")).alias("d"),
    ).collect()
    for (u, h, d), r in zip(rows, got):
        assert r.h == h, (u, r.h)
        assert r.d == d, (u, r.d)


def test_gapfill_locf_semantics(spark):
    """Constructed series: bucket-local last-observation wins (ts then
    id tie-break), gaps carry forward, leading gaps stay NULL, every
    key gets every bucket."""
    from datetime import datetime

    from hope_graph_builder_spark.operators.temporal import gapfill_locf

    T = datetime.fromisoformat
    rows = [
        # key 1: two obs in bucket 01:00 (same ts → id tie-break), gap at 02:00
        (1, T("2024-01-01T01:10:00"), 10.0, 100),
        (1, T("2024-01-01T01:10:00"), 11.0, 101),  # higher id wins
        (1, T("2024-01-01T03:05:00"), 12.0, 102),
        # key 2: first obs only in the second bucket → leading NULL
        (2, T("2024-01-01T01:30:00"), 20.0, 200),
        # outside the window → ignored
        (1, T("2024-01-02T00:00:00"), 99.0, 103),
    ]
    s = spark.createDataFrame(rows, "k long, ts timestamp, value double, event_id long")
    out = gapfill_locf(
        s, by="k", ts="ts", value="value", bucket_seconds=3600,
        start_ts="2024-01-01 00:00:00", end_ts="2024-01-01 05:00:00",
        id_col="event_id",
    )
    got = {(r.k, r.bucket_ts.hour): (r.value_filled, r.observed) for r in out.collect()}
    assert len(got) == 2 * 5  # every key × every bucket
    assert got[(1, 0)] == (None, False)          # leading gap stays NULL
    assert got[(1, 1)] == (11.0, True)           # id tie-break: 101 wins
    assert got[(1, 2)] == (11.0, False)          # carried forward
    assert got[(1, 3)] == (12.0, True)
    assert got[(1, 4)] == (12.0, False)
    assert got[(2, 0)] == (None, False)
    assert got[(2, 1)] == (20.0, True)
    assert got[(2, 4)] == (20.0, False)


def test_simhash_pairs_exact_recall_and_refusal(spark):
    """4-band Hamming index == brute-force all-pairs popcount at
    radius 3 (the pigeonhole guarantee); radii beyond the guarantee
    refuse instead of silently under-recalling."""
    import pytest as _pytest

    docs = synth.pages(spark, SF_TINY).select("doc_id", F.col("text"))
    dup = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup)
    got = dedup.simhash_dup_pairs(corpus, max_hamming=3)
    sh = corpus.select(
        F.col("doc_id").alias("_id"), dedup.simhash(F.col("text"), bits=63).alias("sh")
    )
    x = sh.select(F.col("_id").alias("a"), F.col("sh").alias("sa"))
    y = sh.select(F.col("_id").alias("b"), F.col("sh").alias("sb"))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    brute = (
        x.crossJoin(y).filter(F.col("a") < F.col("b"))
        .filter(ham <= 3)
        .select("a", "b", ham.cast("int").alias("hamming"))
    )
    assert got.exceptAll(brute).count() == 0
    assert brute.exceptAll(got).count() == 0
    # injected exact copies must appear at hamming 0
    assert got.filter((F.col("b") - F.col("a") == 50000) & (F.col("hamming") == 0)).count() > 0
    with _pytest.raises(ValueError, match="exact-recall"):
        dedup.simhash_dup_pairs(corpus, max_hamming=4)


def test_pagerank_hand_computed(spark):
    """Tiny graph 1→2, 1→3, 2→3 — two iterations computed by hand
    (unnormalized damped form, r0=1): sources pin at 1−d, the sink
    accumulates both paths; dangling node 3 contributes nothing."""
    from hope_graph_builder_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src long, dst long")
    r1 = {r.id: r.rank for r in pagerank(e, iters=1).collect()}
    assert r1 == {1: 0.15, 2: 0.575, 3: 1.425}
    r2 = {r.id: r.rank for r in pagerank(e, iters=2).collect()}
    assert r2[1] == 0.15
    # the operator brounds each iteration at 5 dp — round expectations too
    assert r2[2] == round(0.15 + 0.85 * (0.15 / 2), 5)          # 0.21375
    assert r2[3] == round(0.15 + 0.85 * (0.15 / 2 + 0.575), 5)  # 0.7025
    # every rank ≥ the (1−d) floor
    assert all(v >= 0.15 for v in r2.values())


def test_minhash_fast_hash_mode(spark):
    """The xxhash64 production mode of the MinHash path: exact
    duplicates are guaranteed to cluster under ANY hash family
    (identical shingle sets → identical signatures → same buckets),
    and unrelated docs stay apart; 'md5' stays the oracle mode."""
    import pytest as _pytest

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " tail"),
         (10, "completely different content about spark engines " * 8)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.dedup_clusters(docs, hash="xx").collect()}
    assert out[1].cluster_id == out[2].cluster_id == 1
    assert out[3].cluster_id == 1  # near-dup still collides
    assert out[10].cluster_id == 10
    with _pytest.raises(ValueError, match="unknown hash"):
        dedup.minhash_signature(docs, hash="nope")


def test_star_pairs_component_equivalent(spark):
    """The giant-cluster valve: minhash_star_pairs emits per-bucket
    STAR edges (member → bucket-min hub) instead of the bucket clique.
    Reachability within a bucket is identical (every member connects
    through the hub), so connected components — and therefore
    dedup_clusters output — must EQUAL the clique-pair result, while
    the edge count stays linear in bucket size."""
    docs = synth.pages(spark, SF_TINY).select("doc_id", "text").limit(120)

    clique = dedup.minhash_dup_pairs(docs)
    star = dedup.minhash_star_pairs(docs)
    n_clique, n_star = clique.count(), star.count()
    assert n_star <= n_clique  # star never exceeds the clique

    uf = _union_find([(r.a, r.b) for r in clique.collect()])
    comp_star = {
        r.doc_id: r.cluster_id for r in dedup.dedup_clusters(docs).collect()
    }
    for doc, root in uf.items():
        assert comp_star[doc] == root  # same components, same min-id labels
    # docs outside any candidate pair are their own singleton cluster
    for doc, cid in comp_star.items():
        if doc not in uf:
            assert cid == doc


def test_star_pairs_linear_on_giant_cluster(spark):
    """A 60-copy duplicate cluster: the clique pair list is C(60,2) =
    1770 pairs, the star list is 59 — the quadratic-vs-linear gap that
    OOMs executors at web scale (100k-copy boilerplate buckets)."""
    base = "identical boilerplate page body repeated verbatim " * 8
    docs = spark.createDataFrame(
        [(i, base) for i in range(60)], "doc_id long, text string"
    )
    assert dedup.minhash_dup_pairs(docs).count() == 1770
    assert dedup.minhash_star_pairs(docs).count() == 59
    out = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(docs).collect()}
    assert set(out.values()) == {0}  # one cluster, labeled by the min id


def test_line_dedup_c4_semantics(spark):
    """Corpus-wide keep-first line dedup: the boilerplate line is kept
    only at its first (doc_id, pos) occurrence; lines under min_chars
    are exempt everywhere (including intra-doc repeats); a doc whose
    every line is removed comes back as an empty string with the full
    removal count."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\ncookie banner text\nunique one"),
            (2, "cookie banner text\nunique two\nok"),
            (3, "unique three\ncookie banner text"),
            (4, ""),
            (5, "ok\nok\nalpha beta"),
            (6, "cookie banner text"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.line_dedup(docs, min_chars=3).collect()}
    assert out[1].clean_text == "alpha beta\ncookie banner text\nunique one"
    assert (out[1].n_lines, out[1].n_removed) == (3, 0)
    assert out[2].clean_text == "unique two\nok"  # dup banner dropped
    assert out[3].clean_text == "unique three"
    assert out[4].clean_text == "" and out[4].n_removed == 0  # '' exempt (len 0 < 3)
    assert out[5].clean_text == "ok\nok"  # short 'ok' exempt even repeated
    assert out[5].n_removed == 1  # 'alpha beta' first seen in doc 1
    assert out[6].clean_text == "" and out[6].n_removed == 1  # fully boilerplate


def test_line_dedup_min_chars_zero_pure(spark):
    """min_chars=0 is the pure rule: EVERY duplicate line (even empty
    ones) collapses to its first occurrence."""
    docs = spark.createDataFrame(
        [(1, "x\n\ny"), (2, "x\n\nz")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dedup.line_dedup(docs).collect()}
    assert out[1].clean_text == "x\n\ny" and out[1].n_removed == 0
    assert out[2].clean_text == "z" and out[2].n_removed == 2


def test_pii_scrub(spark):
    """Email → IPv4 → phone redaction with per-stage counts; the
    dotted-quad prefix false positive ('1.2.3.4' out of '1.2.3.4.5')
    is pinned deliberately — identical in both regex engines."""
    from hope_graph_builder_spark.operators import pii

    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@x-corp.io. thanks"),
            (2, "server 10.0.0.1 and backup 192.168.255.254"),
            (3, "call +49 30 901820 or +1 555 010 4321"),
            (4, "no pii here"),
            (5, "version 1.2.3.4.5 tagged"),
            (6, "u@example.org logs 8.8.8.8 tel 555-123-4567"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii.with_pii_scrubbed(docs).collect()}
    assert out[1].clean_text == "mail me at <EMAIL>. thanks"
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (1, 0, 0)
    assert out[2].clean_text == "server <IP> and backup <IP>"
    assert out[2].n_ips == 2
    assert out[3].clean_text == "call <PHONE> or <PHONE>"
    assert out[3].n_phones == 2
    assert out[4].clean_text == "no pii here"
    assert (out[4].n_emails, out[4].n_ips, out[4].n_phones) == (0, 0, 0)
    assert out[5].clean_text == "version <IP>.5 tagged"  # documented FP shape
    assert out[6].clean_text == "<EMAIL> logs <IP> tel <PHONE>"
    assert (out[6].n_emails, out[6].n_ips, out[6].n_phones) == (1, 1, 1)


def test_url_canonical_and_dedup(spark):
    """Every canonicalization rule fires somewhere: scheme+host case,
    userinfo, default vs explicit port, fragment, trailing slash,
    non-http scheme passthrough, relative input."""
    from hope_graph_builder_spark.operators import web

    cases = [
        (0, "HTTP://Example.COM:80/a/5/", "http://example.com/a/5"),
        (1, "http://example.com/a/5", "http://example.com/a/5"),
        (2, "https://Example.com:443/b?q=7#frag9", "https://example.com/b?q=7"),
        (3, "https://user@example.com/b?q=7", "https://example.com/b?q=7"),
        (4, "http://example.com:8080/x/", "http://example.com:8080/x"),
        (5, "ftp://Host.Example/Path", "ftp://host.example/Path"),
        (6, "/relative/path#x", "/relative/path"),
        (7, "https://example.com/", "https://example.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    got = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id", web.url_canonical_expr(F.col("url")).alias("c")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)

    dd = {r.doc_id: r for r in web.url_dedup(df).collect()}
    assert dd[0].keep and not dd[1].keep  # 0 and 1 collide, min id wins
    assert dd[0].n_dups == 2 and dd[1].n_dups == 2
    assert dd[2].keep and not dd[3].keep
    assert all(dd[i].keep for i in (4, 5, 6, 7))  # singletons


def test_hash_sample_deterministic_and_consistent(spark):
    """Hash sampling: rerun-identical, roughly rate-sized, and
    CONSISTENT across tables — the same key samples in or out
    everywhere, so sampled tables still join."""
    from hope_graph_builder_spark.operators import corpus

    a = synth.pages(spark, SF_TINY).select("doc_id", "lang")
    s1 = {r.doc_id for r in corpus.hash_sample(a, rate=0.3).collect()}
    s2 = {r.doc_id for r in corpus.hash_sample(a, rate=0.3).collect()}
    assert s1 == s2  # deterministic
    n = a.count()
    assert 0.15 * n < len(s1) < 0.45 * n  # ~rate, generous band
    other = a.select("doc_id")  # a second "table" with the same key
    s3 = {r.doc_id for r in corpus.hash_sample(other, rate=0.3).collect()}
    assert s1 == s3  # cross-table consistency
    s4 = {r.doc_id for r in corpus.hash_sample(a, rate=0.3, salt="z9").collect()}
    assert s1 != s4  # salt decorrelates


def test_pack_token_budget_equals_global_prefix(spark):
    """The two-phase bucketed prefix sum must reproduce the naive
    global-order greedy prefix exactly, cum_tokens included."""
    from hope_graph_builder_spark.operators import corpus

    d = spark.createDataFrame(
        [(i, (i * 37 % 101) / 100.0, i * 13 % 97 + 1) for i in range(300)],
        "doc_id long, quality double, n_tokens long",
    )
    budget = 4000
    got = {
        r.doc_id: r.cum_tokens
        for r in corpus.pack_token_budget(d, budget).collect()
    }
    rows = sorted(d.collect(), key=lambda r: (-r.quality, r.doc_id))
    cum, want = 0, {}
    for r in rows:
        cum += r.n_tokens
        if cum > budget:
            break
        want[r.doc_id] = cum
    assert got == want


def test_ngram_contamination(spark):
    """Docs sharing an n-gram with the benchmark are flagged; short
    docs (< n tokens) report zero grams and are never flagged."""
    from hope_graph_builder_spark.operators import corpus

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different words in this training document here"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("eval: the quick brown fox jumps over the lazy dog",)], "text string"
    )
    out = {r.doc_id: r for r in corpus.ngram_contamination(docs, bench, n=5).collect()}
    assert out[1].contaminated and out[1].n_hits >= 1
    assert out[2].contaminated  # shares 'fox jumps over the lazy' etc.
    assert not out[3].contaminated and out[3].n_hits == 0
    assert out[4].n_grams == 0 and not out[4].contaminated
    assert out[3].n_grams == 4  # 8 tokens -> four distinct 5-grams


def test_char_lm_score_backoff(spark):
    """Hand-computed smoothed trigram LM on a 2-char alphabet: seen
    trigram, seen-prefix backoff, unseen-prefix floor, and the <3-char
    NULL row all hit their closed-form values."""
    import math

    from hope_graph_builder_spark.operators import text as t

    train = spark.createDataFrame([(0, "abab")], "doc_id long, text string")
    # trigrams: aba, bab (1 each); prefixes ab,ba (1 each); V={a,b}=2
    lm = t.train_char_lm(train)
    docs = spark.createDataFrame(
        [
            (1, "ababa"),  # aba,bab,aba all seen: lp=ln(2/3) each
            (2, "abb"),    # unseen tri, seen prefix 'ab': ln(1/3)
            (3, "xyz"),    # unseen prefix: ln(1/2)
            (4, "ab"),     # too short
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in t.char_lm_score(docs, lm).collect()}
    assert out[1].n_tri == 3
    assert abs(float(out[1].avg_nll) - round(-math.log(2 / 3), 5)) < 1e-9
    assert abs(float(out[2].avg_nll) - round(-math.log(1 / 3), 5)) < 1e-9
    assert abs(float(out[3].avg_nll) - round(-math.log(1 / 2), 5)) < 1e-9
    assert out[4].n_tri == 0 and out[4].avg_nll is None and out[4].sum_lp is None


def test_host_boilerplate_strip(spark):
    """Banner on 2/3 of host A's pages is stripped EVERYWHERE (unlike
    keep-first line dedup); a one-page host is exempt via min_pages;
    short repeated lines are exempt via min_chars; order preserved."""
    from hope_graph_builder_spark.operators import web

    banner = "accept our cookies please"
    docs = spark.createDataFrame(
        [
            (1, "a.com", f"{banner}\nreal content one\nok"),
            (2, "a.com", f"{banner}\nreal content two"),
            (3, "a.com", "no banner here today"),
            (4, "b.com", f"{banner}\nlonely page content"),
        ],
        "doc_id long, host string, text string",
    )
    out = {
        r.doc_id: r
        for r in web.host_boilerplate_strip(
            docs, min_ratio=0.5, min_pages=2, min_chars=5
        ).collect()
    }
    assert out[1].clean_text == "real content one\nok" and out[1].n_removed == 1
    assert out[2].clean_text == "real content two" and out[2].n_removed == 1
    assert out[3].clean_text == "no banner here today" and out[3].n_removed == 0
    # host b has one page: min_pages gate keeps its banner
    assert out[4].clean_text.startswith(banner) and out[4].n_removed == 0
    # 'ok' is short (< min_chars): exempt from evidence AND never stripped
    assert out[1].n_lines == 3


def test_shard_shuffle_deterministic(spark):
    """Same input → identical (shard, pos) across runs; positions are
    dense 0..k-1 per shard; changing the salt changes the permutation;
    union of shards is the input."""
    from hope_graph_builder_spark.operators import corpus

    d = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = corpus.shard_shuffle(d, 8).collect()
    b = corpus.shard_shuffle(d, 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 200
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    c = {r.doc_id: (r.shard, r.pos) for r in corpus.shard_shuffle(d, 8, salt="other").collect()}
    amap = {r.doc_id: (r.shard, r.pos) for r in a}
    assert any(amap[i] != c[i] for i in amap)


def test_dup_substring_spans(spark):
    """Planted duplicate passage → merged maximal span with exact
    char accounting; unique docs unflagged; short docs 0 windows;
    stride>1 still catches runs >= k+stride-1; xx mode == md5 mode."""
    from hope_graph_builder_spark.operators import dedup as dd

    shared = "X" * 25  # a 25-char run duplicated across docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, f"aaa {shared} bbb unique tail one here"),
            (2, f"zzz {shared} qqq other ending two here"),
            (3, "totally unique document with no repeats at all"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dd.dup_substring_spans(docs, k=10).collect()}
    # the maximal shared region is ' ' + 'X'*25 + ' ' (both flanking
    # spaces sit inside cross-doc-identical windows) -> one 27-char span
    assert out[1].n_spans == 1 and out[2].n_spans == 1
    assert out[1].dup_chars == 27 and out[2].dup_chars == 27
    assert out[3].n_dup_windows == 0 and out[3].n_spans == 0
    assert out[4].n_windows == 0 and out[4].dup_chars == 0
    # stride mode: run length 25 >= 10 + 3 - 1 -> still detected
    st = {r.doc_id: r for r in dd.dup_substring_spans(docs, k=10, stride=3).collect()}
    assert st[1].n_dup_windows > 0 and st[3].n_dup_windows == 0
    # production hash mode: identical spans on this fixture
    xx = {r.doc_id: r for r in dd.dup_substring_spans(docs, k=10, hash_method="xx").collect()}
    assert all(
        (xx[i].n_spans, xx[i].dup_chars) == (out[i].n_spans, out[i].dup_chars)
        for i in (1, 2, 3, 4)
    )


def test_join_uniform_sample(spark):
    """Sampling over a join without materializing it: every sampled
    pair must equal the pair the global-index bijection names —
    replicated independently in Python (same hash, same bucket-major
    key order, same row ranks) — with k distinct in-range strata
    indices; deterministic across reruns; tiny joins return the full
    join."""
    import hashlib

    from hope_graph_builder_spark.operators.join_sample import (
        join_uniform_sample,
    )

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # skewed: key 0 carries half of a; key ids 0..9
    a_rows = [(i, i % 10 if i % 2 else 0) for i in range(200)]
    b_rows = [(1000 + i, i % 10) for i in range(150)]
    a = spark.createDataFrame(a_rows, "a_id long, k long")
    b = spark.createDataFrame(b_rows, "b_id long, k long")

    ca, cb = {}, {}
    for _, key in a_rows:
        ca[key] = ca.get(key, 0) + 1
    for _, key in b_rows:
        cb[key] = cb.get(key, 0) + 1
    keys = sorted(
        (kk for kk in ca if kk in cb),
        key=lambda kk: (h60(str(kk)) % 64, kk),
    )
    off, offs = 0, {}
    for kk in keys:
        offs[kk] = off
        off += ca[kk] * cb[kk]
    P = off
    a_by_key = {}
    for i, key in sorted(a_rows):
        a_by_key.setdefault(key, []).append(i)
    b_by_key = {}
    for i, key in sorted(b_rows):
        b_by_key.setdefault(key, []).append(i)

    k = 37
    salt = "t0"
    q, r = P // k, P % k
    expected = {}
    for j in range(k):
        lo = j * q + (j * r) // k
        hi = (j + 1) * q + ((j + 1) * r) // k
        pos = lo + h60(f"{salt}#{j}") % (hi - lo)
        kk = max((kk for kk in keys if offs[kk] <= pos),
                 key=lambda kk: offs[kk])
        rel = pos - offs[kk]
        expected[pos] = (kk, a_by_key[kk][rel // cb[kk]],
                         b_by_key[kk][rel % cb[kk]])

    out = {r2.idx: (r2.k, r2.a_id, r2.b_id) for r2 in
           join_uniform_sample(a, b, "k", k, "a_id", "b_id", salt=salt).collect()}
    assert out == expected and len(out) == k
    # deterministic rerun
    out2 = {r2.idx: (r2.k, r2.a_id, r2.b_id) for r2 in
            join_uniform_sample(a, b, "k", k, "a_id", "b_id", salt=salt).collect()}
    assert out2 == out
    # tiny join: full result comes back
    from pyspark.sql import functions as F
    tiny = join_uniform_sample(a.filter(F.col("a_id") < 3),
                               b.filter(F.col("b_id") < 1002), "k", 1000,
                               "a_id", "b_id").collect()
    got_pairs = {(r2.k, r2.a_id, r2.b_id) for r2 in tiny}
    want_pairs = {(ka, ia, ib) for ia, ka in a_rows[:3]
                  for ib, kb2 in b_rows[:2] if ka == kb2}
    assert got_pairs == want_pairs
    # n_buckets='auto' (r06 scale knob): below the 64M-key floor it
    # must resolve to 64 and reproduce the fixed-bucket sample exactly
    out_auto = {r2.idx: (r2.k, r2.a_id, r2.b_id) for r2 in
                join_uniform_sample(a, b, "k", k, "a_id", "b_id",
                                    salt=salt, n_buckets="auto").collect()}
    assert out_auto == out
    # n_buckets is a bijection PARAMETER: another value draws a valid
    # (k distinct in-range strata, real join pairs) but generally
    # DIFFERENT sample — which is why auto cannot silently replace a
    # caller's fixed value above the floor
    out512 = join_uniform_sample(a, b, "k", k, "a_id", "b_id",
                                 salt=salt, n_buckets=512).collect()
    assert len(out512) == k and len({r2.idx for r2 in out512}) == k
    all_pairs = {(ka, ia, ib) for ia, ka in a_rows
                 for ib, kb2 in b_rows if ka == kb2}
    assert {(r2.k, r2.a_id, r2.b_id) for r2 in out512} <= all_pairs
    assert all(0 <= r2.idx < P for r2 in out512)


def test_join_uniform_sample_uniformity(spark):
    """Empirical pin of the uniformity claim: over 20 independent
    salts × 50 draws, each key's selection frequency matches its pair
    share ca·cb/P within 5 binomial standard deviations (deterministic
    — fixed salts, no flake). A layout bias (e.g. truncation toward
    low-offset keys) would blow through the bound."""
    from collections import Counter

    from hope_graph_builder_spark.operators.join_sample import (
        join_uniform_sample,
    )

    a_rows = [(i, i % 7) for i in range(140)]          # 20 rows/key
    b_rows = [(1000 + i, i % 7) for i in range(70)]    # 10 rows/key
    a = spark.createDataFrame(a_rows, "a_id long, k long")
    b = spark.createDataFrame(b_rows, "b_id long, k long")
    P, per_key = 7 * 20 * 10, 20 * 10
    draws = Counter()
    n_salts, k = 20, 50
    for s in range(n_salts):
        for r in join_uniform_sample(a, b, "k", k, "a_id", "b_id",
                                     salt=f"u{s}").collect():
            draws[r.k] += 1
    n = n_salts * k
    p = per_key / P
    import math
    sd = math.sqrt(n * p * (1 - p))
    for key in range(7):
        assert abs(draws[key] - n * p) <= 5 * sd, (key, draws[key], n * p, sd)
    assert sum(draws.values()) == n


def test_pip_rect_uniform_sample(spark):
    """Spatial join sampling: every returned pair is a TRUE
    containment pair (subset of the materialized PIP join), count is
    min(k, accepted), reruns are identical, and a different salt
    draws a different (still valid) sample."""
    from hope_graph_builder_spark import synth
    from hope_graph_builder_spark.operators.join_sample import (
        pip_rect_uniform_sample,
    )
    from hope_graph_builder_spark.operators.spatial_join import pip_join_rect

    pts = synth.page_points(spark, "/root/testdata/sf0.001").select(
        "doc_id", "x", "y"
    )
    layers = synth.noise_layers(spark)
    true_pairs = {
        (r.doc_id, r.poly_id)
        for r in pip_join_rect(pts, layers, res=9, point_id="doc_id")
        .select("doc_id", "poly_id").collect()
    }
    out = pip_rect_uniform_sample(
        pts, layers, k=40, res=9, rect_id="poly_id", salt="s1"
    ).collect()
    assert 0 < len(out) <= 40
    assert all((r.doc_id, r.poly_id) in true_pairs for r in out)
    out2 = pip_rect_uniform_sample(
        pts, layers, k=40, res=9, rect_id="poly_id", salt="s1"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    other = pip_rect_uniform_sample(
        pts, layers, k=40, res=9, rect_id="poly_id", salt="s2"
    ).collect()
    assert all((r.doc_id, r.poly_id) in true_pairs for r in other)
    assert {r.idx for r in other} != {r.idx for r in out}


def test_weighted_sample(spark):
    """Token-mass sampling closed-form: draw counts track weights (a
    doc with half the total mass gets ~half the draws), zero weights
    never drawn, deterministic reruns, and the exact draw positions
    match an independent Python replica of strata + cumulative-weight
    containment."""
    import hashlib

    from hope_graph_builder_spark.operators.join_sample import weighted_sample

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = [(1, 500), (2, 250), (3, 125), (4, 125), (5, 0)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    k, salt = 100, "w1"
    # python replica
    live = [(i, w) for i, w in rows if w > 0]
    order = sorted(live, key=lambda t: (h60(str(t[0])) % 64, t[0]))
    offs, off = {}, 0
    for i, w in order:
        offs[i] = off
        off += w
    W = off
    q, r = W // k, W % k
    expected = {}
    for j in range(k):
        lo = j * q + (j * r) // k
        hi = (j + 1) * q + ((j + 1) * r) // k
        if hi <= lo:
            continue
        pos = lo + h60(f"{salt}#{j}") % (hi - lo)
        doc = max((i for i, _ in order if offs[i] <= pos),
                  key=lambda i: offs[i])
        expected[pos] = doc
    got = {r2.idx: r2.doc_id for r2 in
           weighted_sample(d, "w", k, salt=salt).collect()}
    assert got == expected
    counts = {}
    for doc in got.values():
        counts[doc] = counts.get(doc, 0) + 1
    assert 5 not in counts
    assert abs(counts[1] - 50) <= 2 and abs(counts[2] - 25) <= 2
    got2 = {r2.idx: r2.doc_id for r2 in
            weighted_sample(d, "w", k, salt=salt).collect()}
    assert got2 == got


def test_dwithin_uniform_sample(spark):
    """Range-join sampling: every returned pair is a TRUE
    DWithin(30 m) pair (subset of the materialized dwithin join) and
    reruns are identical."""
    from hope_graph_builder_spark import synth
    from hope_graph_builder_spark.operators.join_sample import (
        dwithin_uniform_sample,
    )
    from hope_graph_builder_spark.operators.spatial_join import dwithin_join

    pts = synth.page_points(spark, "/root/testdata/sf0.001").select(
        "doc_id", "x", "y"
    )
    edges = synth.page_edges(spark, "/root/testdata/sf0.001").select(
        "edge_id", "x1", "y1", "x2", "y2"
    )
    true_pairs = {
        (r.doc_id, r.edge_id)
        for r in dwithin_join(pts, edges, 30.0, res=11)
        .select("doc_id", "edge_id").collect()
    }
    out = dwithin_uniform_sample(pts, edges, 30.0, 25, res=11, salt="d1").collect()
    assert 0 < len(out) <= 25
    assert all((r.doc_id, r.edge_id) in true_pairs for r in out)
    out2 = dwithin_uniform_sample(pts, edges, 30.0, 25, res=11, salt="d1").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_review_fix_regressions(spark, monkeypatch):
    """Regression pins for the round-5 review findings: NULL-text
    batch rows survive delta dedup (sentinel digest, dedupe among
    themselves); ann_recall k-trim without a rank column raises
    instead of AnalysisException; parse_json_fields output-name
    collisions raise; the curation chunk_uid guard raises on a 20-bit
    chunk_id overflow instead of silently colliding."""
    import pytest
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators import dedup as dd
    from hope_graph_builder_spark.operators.similarity import ann_recall
    from hope_graph_builder_spark.operators.web import parse_json_fields
    from hope_graph_builder_spark.pipelines import curation

    # 1. NULL text: rows preserved, NULL==NULL dedupe, never index-dup
    batch = spark.createDataFrame(
        [(1, "real"), (2, None), (3, None)], "doc_id long, text string"
    )
    idx = spark.createDataFrame([("real",)], "t string").select(
        F.md5("t").alias("h")
    )
    out = {r.doc_id: r for r in dd.delta_exact_dedup(batch, idx).collect()}
    assert len(out) == 3
    assert out[1].dup_of_index and not out[1].keep
    assert out[2].keep and not out[2].dup_of_index and not out[2].dup_in_batch
    assert out[3].dup_in_batch and not out[3].dup_of_index and not out[3].keep

    # 2. k-trim needs rank on BOTH inputs
    two_col = spark.createDataFrame([(1, 2)], "query_id long, cand_id long")
    with pytest.raises(ValueError, match="rank"):
        ann_recall(two_col, two_col, k=3)

    # 3. '.'→'_' output-name collision is loud
    d = spark.createDataFrame([(1, '{"a": {"b": 1}}')], "id long, props string")
    with pytest.raises(ValueError, match="collision"):
        parse_json_fields(d, "props", {"a.b": "int", "a_b": "string"})

    # 4. chunk_uid overflow raises (shrink the shift so a small doc trips it)
    monkeypatch.setattr(curation, "_CHUNK_UID_SHIFT", 2)
    docs = spark.createDataFrame(
        [(1, "s", " ".join(f"w{i} of the and to be have that with ok" for i in range(30)))],
        "doc_id long, source string, text string",
    )
    with pytest.raises(Exception, match="chunk_id overflows"):
        curation.run_corpus_curation(
            docs, quota_per_source=10, token_budget=10**6, seq_len=4,
            overlap=0, n_shards=2, gate_cols=["ok_word_count"],
        ).collect()


def test_strip_dup_spans_random_brute_force(spark):
    """Randomized cross-check (seeded, one Spark job): 80 short
    strings over a 2-letter alphabet — dense window collisions,
    heavy island merging, spans at every boundary — against an
    independent brute-force Python implementation of flag → island →
    excise, for both the audit stats and the cleaned bytes."""
    import random
    from collections import Counter

    from hope_graph_builder_spark.operators import dedup as dd

    rng = random.Random(7)
    k = 5
    texts = {
        i: "".join(rng.choice("ab") for _ in range(rng.randint(0, 40)))
        for i in range(80)
    }

    cnt = Counter()
    for t in texts.values():
        for i in range(len(t) - k + 1):
            cnt[t[i:i + k]] += 1
    want = {}
    for d, t in texts.items():
        flagged = [i for i in range(len(t) - k + 1) if cnt[t[i:i + k]] > 1]
        spans = []
        for p in flagged:
            if spans and p <= spans[-1][1] + k:  # operator: new iff pos > lag + k
                spans[-1][1] = p
            else:
                spans.append([p, p])
        spans = [(s, e + k - 1) for s, e in spans]
        clean, prev = [], 0
        for s, e in spans:
            clean.append(t[prev:s])
            prev = e + 1
        clean.append(t[prev:])
        want[d] = ("".join(clean), len(spans), sum(e - s + 1 for s, e in spans))

    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in dd.strip_dup_spans(docs, k=k).collect()}
    assert len(got) == len(texts)
    for d in texts:
        assert (got[d].text, got[d].n_removed_spans, got[d].removed_chars) \
            == want[d], (d, texts[d])
    audit = {r.doc_id: r for r in dd.dup_substring_spans(docs, k=k).collect()}
    for d in texts:
        assert (audit[d].n_spans, audit[d].dup_chars) == want[d][1:], d


def test_chunk_tokens_random_brute_force(spark):
    """Randomized cross-check: chunk grids over random whitespace-laden
    texts vs an independent Python slicer, for three (seq_len,
    overlap) shapes in one job each."""
    import random

    from hope_graph_builder_spark.operators import corpus

    rng = random.Random(11)
    texts = {
        i: " ".join(
            "".join(rng.choice("xyz") for _ in range(rng.randint(1, 4)))
            for _ in range(rng.randint(0, 30))
        ) + rng.choice(["", " ", "  "])
        for i in range(60)
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    for seq_len, overlap in ((4, 0), (5, 2), (7, 6)):
        stride = seq_len - overlap
        want = {}
        for d, t in texts.items():
            toks = [w for w in t.split(" ") if w]
            chunks = []
            for ci, s in enumerate(range(0, len(toks), stride)):
                if s != 0 and s + overlap >= len(toks):
                    continue
                c = toks[s:s + seq_len]
                chunks.append((ci, len(c), " ".join(c)))
            want[d] = chunks
        got = {}
        for r in corpus.chunk_tokens(docs, seq_len, overlap).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.n_tokens, r.chunk_text)
            )
        for d in texts:
            assert sorted(got.get(d, [])) == want[d], (seq_len, overlap, d)


def test_ann_recall(spark):
    """Recall harness closed-form: per-query hit counting, a query the
    approximate index misses entirely counts as 0 (not dropped),
    macro vs micro disagree exactly as hand-computed, k trims by
    rank."""
    from hope_graph_builder_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4),
         (2, 20, 1), (2, 21, 2)],
        "query_id long, cand_id long, rank int",
    )
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 2), (1, 99, 3), (1, 13, 4)],
        "query_id long, cand_id long, rank int",
    )
    r = ann_recall(approx, exact).collect()[0]
    # q1: 3 of 4 hit; q2: no approx rows at all -> 0 of 2
    assert (r.n_queries, r.n_exact, r.n_hits) == (2, 6, 3)
    assert r.micro_recall == 0.5
    assert abs(r.macro_recall - (0.75 + 0.0) / 2) < 1e-9
    # k=2: exact trims to {10,11}/{20,21}, approx to {10,12}
    r2 = ann_recall(approx, exact, k=2).collect()[0]
    assert (r2.n_exact, r2.n_hits) == (4, 1)


def test_ivf_recall_monotone_and_complete(spark):
    """IVF recall@5 measured against brute force: monotone
    non-decreasing in nprobe, and probing EVERY list (nprobe == nlist)
    is exhaustive search — recall exactly 1.0. Pins both the recall
    harness and the IVF routing."""
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 29 == 0)
    exact = similarity.cosine_topk(emb, qs, k=5)
    prev = -1.0
    for nprobe in (1, 2, 8):
        a = similarity.ivf_topk(emb, qs, k=5, nlist=8, nprobe=nprobe)
        r = similarity.ann_recall(a, exact).collect()[0]
        assert r.micro_recall >= prev
        prev = r.micro_recall
    assert prev == 1.0  # nprobe == nlist probes everything


def test_lsh_params():
    """S-curve band picker: bands·rows == k always; monotone — higher
    thresholds never pick fewer rows (sharper curves sit further
    right); the 50%-candidate point (1/b)^(1/r) lands near the
    threshold for large k; invalid args raise."""
    import pytest

    from hope_graph_builder_spark.operators.dedup import lsh_params

    prev_rows = 0
    for t in (0.2, 0.35, 0.5, 0.65, 0.8, 0.95):
        b, r = lsh_params(t, 128)
        assert b * r == 128
        assert r >= prev_rows
        prev_rows = r
        mid = (1.0 / b) ** (1.0 / r)
        assert abs(mid - t) < 0.2, (t, b, r, mid)
    assert lsh_params(0.5, 16)[0] * lsh_params(0.5, 16)[1] == 16
    with pytest.raises(ValueError):
        lsh_params(1.5, 16)
    with pytest.raises(ValueError):
        lsh_params(0.5, 0)


def test_parse_json_fields(spark):
    """Typed JSON extraction tolerance: missing key, malformed JSON
    and uncastable values all yield NULL (ANSI-safe try_cast); nested
    dotted paths resolve; present values come back typed."""
    from hope_graph_builder_spark.operators.web import parse_json_fields

    d = spark.createDataFrame(
        [
            (1, '{"k": 7, "s": "x", "a": {"b": 2.5}}'),
            (2, '{"s": "y"}'),             # k missing
            (3, '{"k": "notanint"}'),      # uncastable
            (4, '{broken'),                # malformed
            (5, None),                     # null bag
        ],
        "id long, props string",
    )
    out = {r.id: r for r in parse_json_fields(
        d, "props", {"k": "int", "s": "string", "a.b": "double"}
    ).collect()}
    assert out[1].k == 7 and out[1].s == "x" and out[1].a_b == 2.5
    assert out[2].k is None and out[2].s == "y"
    assert out[3].k is None
    assert out[4].k is None and out[4].s is None
    assert out[5].k is None


def test_run_corpus_curation(spark):
    """Composed curation chain: deterministic across reruns, dense
    per-shard positions, every emitted doc passes the gate, and a salt
    change re-permutes the stream without changing the chunk set
    (cap/shard both re-keyed) only when the quota doesn't bind —
    here it does, so we assert the weaker contract: same pipeline,
    same salt → byte-identical output."""
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators import text as textops
    from hope_graph_builder_spark.pipelines.curation import run_corpus_curation

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    gate_cols = [
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_alpha_words", "ok_bullet_lines", "ok_ellipsis_lines",
        "ok_dup_lines",
    ]
    kw = dict(quota_per_source=4, token_budget=2000, seq_len=16,
              overlap=4, n_shards=4, gate_cols=gate_cols)
    a = sorted(map(tuple, run_corpus_curation(docs, **kw).collect()))
    b = sorted(map(tuple, run_corpus_curation(docs, **kw).collect()))
    assert a == b and len(a) > 0
    # dense 0-based positions within every shard; shard in range
    per = {}
    for shard, pos, *_ in a:
        assert 0 <= shard < 4
        per.setdefault(shard, []).append(pos)
    assert all(sorted(v) == list(range(len(v))) for v in per.values())
    # every emitted doc passes the gate
    emitted = {r[2] for r in a}
    flags = {
        r.doc_id: all(r[c] for c in gate_cols)
        for r in textops.gopher_flags(docs).collect()
    }
    assert all(flags[d] for d in emitted)
    # chunks of one doc reconstruct a prefix-consistent token stream:
    # chunk k starts at stride*k, so overlapping regions agree
    rows1 = sorted((r for r in a if r[2] == next(iter(emitted))),
                   key=lambda r: r[3])
    toks = []
    for _, _, _, chunk_id, n_tokens, chunk_text in rows1:
        ct = chunk_text.split(" ")
        assert len(ct) == n_tokens
        start = 12 * chunk_id  # stride = 16 - 4
        assert toks[start:start + len(ct)] == ct[: max(0, len(toks) - start)]
        toks[start:start + len(ct)] = ct
    assert len(toks) > 0


def test_sessionize(spark):
    """Closed-form session boundaries: gap >= threshold opens a new
    session (the session_window rule — an event exactly at the closed
    end starts fresh), sessions never cross users, ties ordered by
    event id, stats roll up exactly."""
    from datetime import datetime, timedelta

    from hope_graph_builder_spark.operators.temporal import (
        session_stats,
        sessionize,
    )

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + timedelta(seconds=s)

    rows = [
        (1, 10, at(0)), (2, 10, at(100)),      # same session
        (3, 10, at(100 + 600)),                # exactly gap -> NEW session
        (4, 10, at(100 + 600 + 599)),          # gap-1 -> same
        (5, 20, at(50)),                       # other user
        (6, 20, at(50)),                       # tie ts -> same session, id order
    ]
    d = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r.event_id: r.session_seq for r in
           sessionize(d, gap_seconds=600).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 0}
    st = {(r.user_id, r.session_seq): r for r in
          session_stats(d, gap_seconds=600).collect()}
    assert st[(10, 0)].n_events == 2 and st[(10, 1)].n_events == 2
    assert st[(10, 0)].duration_us == 100_000_000
    assert st[(10, 1)].duration_us == 599_000_000
    assert st[(20, 0)].n_events == 2 and st[(20, 0)].duration_us == 0


def test_gopher_flags(spark):
    """Each Gopher rule flips on its own adversarial document while a
    clean document passes all eight; counters are exact."""
    from hope_graph_builder_spark.operators import text as textops

    good_body = " ".join(
        f"word{i} of the and that" for i in range(20)
    )  # 100 words, stopword-rich, alphabetic, no symbols
    docs = spark.createDataFrame(
        [
            (1, good_body),
            (2, "the of short doc"),  # < 50 words
            (3, " ".join("a" for _ in range(25)) + " " +
                " ".join("the of and be to have" for _ in range(10))),  # mean len < 3
            (4, good_body + " " + "#" * 1 + " #### ##### ####"),  # symbols
            (5, " ".join(f"123{i} 456{i}" for i in range(30)) + " the of"),  # digits
            (6, " ".join(f"word{i} blah{i} blip{i} blop{i}" for i in range(25))),  # no stopwords
            (7, "\n".join(f"- bullet{i} the of item row here there now ok go"
                          for i in range(10))),  # all bullet lines
            (8, "\n".join(f"line{i} the of words trail off and fade..."
                          for i in range(10))),  # all ellipsis lines
            (9, good_body + "\n" + "\n".join("same line" for _ in range(9))),  # dup lines
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.gopher_flags(docs).collect()}
    assert out[1].gopher_pass
    assert out[1].n_words == 100 and out[1].n_stop_kinds >= 2
    assert not out[2].ok_word_count and not out[2].gopher_pass
    assert not out[3].ok_mean_word_len
    assert not out[4].ok_symbol_ratio and out[4].n_syms >= 13
    assert not out[5].ok_alpha_words
    assert not out[6].ok_stop_words and out[6].n_stop_kinds == 0
    assert not out[7].ok_bullet_lines and out[7].n_bullet_lines == 10
    assert not out[8].ok_ellipsis_lines and out[8].n_ellipsis_lines == 10
    assert not out[9].ok_dup_lines and out[9].n_dup_lines == 8


def test_webtext_ingest_strip_composition(spark):
    """RefinedWeb-shaped composition: near-dup ingest keep → join the
    extracted text back → exact-substring removal. The license footer
    shared by two otherwise-unrelated KEPT documents — the case
    doc-level MinHash can never catch — is stripped from both; the
    unique document and the unique bodies pass through byte-identical;
    keep flags are untouched by the strip stage."""
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators import dedup as dd
    from hope_graph_builder_spark.operators.extract import extract_text, markup_pages
    from hope_graph_builder_spark.pipelines.webtext import run_webtext_ingest

    # bodies are APERIODIC (every token globally unique, quality rides
    # on token count alone) so the only >= k duplicated run among kept
    # docs is the footer itself; distinct pre-footer endings pin the
    # span start to the footer's leading space
    footer = " copyright footer all rights reserved contact legal team now"
    rich1 = " ".join(f"a{i}q{(i * 3) % 97}" for i in range(100)) + " endone"
    rich2 = " ".join(f"b{i}r{(i * 5) % 89}" for i in range(100)) + " endtwo"
    rich3 = " ".join(f"c{i}s{(i * 7) % 83}" for i in range(100))
    pages = markup_pages(
        spark.createDataFrame(
            [
                (1, "https://a.example/1", rich1 + footer, "en"),
                (2, "https://a.example/2", rich1 + footer, "en"),  # exact dup of 1
                (3, "https://b.example/3", rich2 + footer, "en"),
                (4, "https://c.example/4", rich3, "en"),
            ],
            "doc_id long, url string, text string, lang string",
        )
    )
    ing = run_webtext_ingest(pages)
    kept_ids = sorted(r.doc_id for r in ing.filter("keep").collect())
    assert kept_ids == [1, 3, 4]  # cluster {1,2} keeps its best member
    texts = extract_text(pages).select(
        "doc_id", F.col("extracted_text").alias("text")
    )
    raw = {r.doc_id: r.text for r in texts.collect()}
    kept_docs = texts.join(ing.filter("keep").select("doc_id"), "doc_id")
    out = {r.doc_id: r for r in dd.strip_dup_spans(kept_docs, k=20).collect()}
    # the footer — duplicated across kept docs 1 and 3 — is excised
    assert out[1].text == raw[1].replace(footer, "")
    assert out[3].text == raw[3].replace(footer, "")
    assert out[1].n_removed_spans == 1 and out[1].removed_chars == len(footer)
    # rich1 itself was duplicated only with the DROPPED doc 2, so among
    # kept docs it is unique and survives; doc 4 is untouched
    assert out[4].text == raw[4] and out[4].n_removed_spans == 0


def test_delta_exact_dedup(spark):
    """Rolling-ingest dedup closed-form: index hits, within-batch
    keeper = min id, a doc that is both, row count preserved, and a
    defensively-deduped non-unique index changes nothing."""
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators import dedup as dd

    batch = spark.createDataFrame(
        [(1, "new alpha"), (2, "old one"), (3, "new beta"),
         (4, "new beta"), (5, "old two"), (6, "old one")],
        "doc_id long, text string",
    )
    index = spark.createDataFrame(
        [("old one",), ("old two",)], "t string"
    ).select(F.md5("t").alias("h"))
    out = {r.doc_id: r for r in dd.delta_exact_dedup(batch, index).collect()}
    assert len(out) == 6
    assert out[1].keep and not out[1].dup_of_index and not out[1].dup_in_batch
    assert out[2].dup_of_index and not out[2].dup_in_batch and not out[2].keep
    assert out[3].keep and not out[3].dup_in_batch
    assert out[4].dup_in_batch and not out[4].dup_of_index and not out[4].keep
    assert out[5].dup_of_index and not out[5].keep
    # doc 6: same digest as doc 2 (in-batch, keeper 2) AND in the index
    assert out[6].dup_of_index and out[6].dup_in_batch and not out[6].keep
    # non-unique index through the defensive path: identical flags
    dup_idx = index.union(index)
    out2 = {r.doc_id: r for r in
            dd.delta_exact_dedup(batch, dup_idx, index_unique=False).collect()}
    assert len(out2) == 6
    assert all(
        (out2[i].dup_of_index, out2[i].dup_in_batch, out2[i].keep)
        == (out[i].dup_of_index, out[i].dup_in_batch, out[i].keep)
        for i in out
    )


def test_vocab_topk_and_bpe_pairs(spark):
    """Closed-form vocabulary + BPE pair counts: hand-counted corpus,
    deterministic boundary ties, single-char words contribute no
    pairs, pair weights follow word frequency."""
    from hope_graph_builder_spark.operators import text as textops

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "The the CAT a"), (3, "a b the")],
        "doc_id long, text string",
    )
    v = {r.token: r.cnt for r in textops.vocab_topk(docs, k=10).collect()}
    assert v == {"the": 4, "cat": 2, "a": 2, "sat": 1, "b": 1}
    # k=2 boundary: 'the'(4) then tie cnt=2 -> 'a' beats 'cat' lexically
    top2 = [(r.token, r.cnt) for r in textops.vocab_topk(docs, k=2).collect()]
    assert sorted(top2) == [("a", 2), ("the", 4)]
    # pairs: 'the'×4 -> th,he ×4; 'cat'×2 -> ca,at ×2; 'sat' -> sa,at;
    # 'a'×2 and 'b' single-char -> nothing
    p = {(r.a, r.b): r.cnt for r in textops.bpe_pair_counts(docs).collect()}
    assert p == {("t", "h"): 4, ("h", "e"): 4, ("c", "a"): 2,
                 ("a", "t"): 3, ("s", "a"): 1}
    import pytest
    with pytest.raises(ValueError):
        textops.vocab_topk(docs, k=0)


def test_quota_cap(spark):
    """Two-phase per-group cap == the naive global window in both
    modes, at several bucket counts (1 degenerates to naive), on a
    skewed fixture where one group dwarfs the quota; quota >= group
    size keeps everything; dense 0-based ranks."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators import corpus
    from hope_graph_builder_spark.operators.dedup import hash60

    rows = [(i, "big" if i < 900 else f"g{i % 7}", (i % 13) / 12.0)
            for i in range(1000)]
    d = spark.createDataFrame(rows, "doc_id long, src string, q double")

    h = hash60(F.concat(F.col("doc_id").cast("string"), F.lit("#q0")))
    naive_hash = (
        d.withColumn("_h", h)
        .withColumn(
            "grp_rank",
            (F.row_number().over(
                Window.partitionBy("src").orderBy("_h", "doc_id")) - 1
             ).cast("long"),
        )
        .filter(F.col("grp_rank") < 10)
        .drop("_h")
    )
    want = sorted(map(tuple, naive_hash.collect()))
    for nb in (1, 4, 64):
        got = sorted(map(tuple, corpus.quota_cap(
            d, quota=10, by="src", salt="q0", n_buckets=nb).collect()))
        assert got == want, f"hash mode n_buckets={nb}"

    naive_q = (
        d.withColumn(
            "grp_rank",
            (F.row_number().over(
                Window.partitionBy("src").orderBy(F.desc("q"), "doc_id")) - 1
             ).cast("long"),
        )
        .filter(F.col("grp_rank") < 3)
    )
    want_q = sorted(map(tuple, naive_q.collect()))
    for nb in (1, 8, 64):
        got_q = sorted(map(tuple, corpus.quota_cap(
            d, quota=3, by="src", quality_col="q", n_buckets=nb).collect()))
        assert got_q == want_q, f"quality mode n_buckets={nb}"

    # quota >= every group size: all rows survive, ranks dense per group
    all_kept = corpus.quota_cap(d, quota=2000, by="src").collect()
    assert len(all_kept) == 1000
    per = {}
    for r in all_kept:
        per.setdefault(r.src, []).append(r.grp_rank)
    assert all(sorted(v) == list(range(len(v))) for v in per.values())

    import pytest
    with pytest.raises(ValueError):
        corpus.quota_cap(d, quota=0, by="src")


def test_strip_dup_spans(spark):
    """Exact-substring removal: the cleaned text byte-for-byte on a
    closed-form fixture — flanking-space maximal spans excised from
    every copy, a fully-duplicated doc collapses to '', a doc with two
    separate duplicated passages loses two spans, unique and sub-k
    docs pass through byte-identical; strip stats equal the audit's
    span stats; xx mode == md5 mode."""
    from hope_graph_builder_spark.operators import dedup as dd

    shared = "X" * 25
    s2 = "abcdefghijklmnopqrstuvwxy"  # 25 distinct chars, no self-repeat
    docs = spark.createDataFrame(
        [
            (1, f"aaa {shared} bbb unique tail one here"),
            (2, f"zzz {shared} qqq other ending two here"),
            (3, "totally unique document with no repeats at all"),
            (4, "tiny"),
            (5, f" {shared} "),
            (6, f"one {s2} gap unique middle part {s2} final"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dd.strip_dup_spans(docs, k=10).collect()}
    assert out[1].text == "aaabbb unique tail one here"
    assert out[2].text == "zzzqqq other ending two here"
    assert out[3].text == "totally unique document with no repeats at all"
    assert out[4].text == "tiny"
    assert out[5].text == "" and out[5].removed_chars == 27
    # doc 6: each ' '+s2+' ' span (27 chars) removed independently
    assert out[6].text == "onegap unique middle partfinal"
    assert out[6].n_removed_spans == 2 and out[6].removed_chars == 54
    assert out[1].n_removed_spans == 1 and out[1].removed_chars == 27
    assert out[3].n_removed_spans == 0 and out[3].removed_chars == 0
    # strip stats are exactly the audit's span stats
    audit = {r.doc_id: r for r in dd.dup_substring_spans(docs, k=10).collect()}
    assert all(
        (out[i].n_removed_spans, out[i].removed_chars)
        == (audit[i].n_spans, audit[i].dup_chars)
        for i in audit
    )
    # production hash mode: identical cleaned bytes on this fixture
    xx = {r.doc_id: r for r in dd.strip_dup_spans(docs, k=10, hash_method="xx").collect()}
    assert all(xx[i].text == out[i].text for i in out)


def test_line_key_xx_mode_equivalence(spark):
    """The 8-byte hash-key production mode ('xx') produces identical
    output to raw-line keys on both line-shuffle operators."""
    from hope_graph_builder_spark.operators import dedup as dd
    from hope_graph_builder_spark.operators import web

    docs = spark.createDataFrame(
        [
            (1, "a.com", "shared banner line here\nunique alpha\nshared banner line here"),
            (2, "a.com", "shared banner line here\nunique beta"),
            (3, "b.com", "shared banner line here\nunique gamma"),
            (4, "b.com", "other content\nunique delta"),
        ],
        "doc_id long, host string, text string",
    )
    for fn, kw in (
        (dd.line_dedup, dict(min_chars=5)),
        (web.host_boilerplate_strip, dict(min_ratio=0.5, min_pages=2, min_chars=5)),
    ):
        raw = sorted(map(tuple, fn(docs, **kw).collect()))
        xx = sorted(map(tuple, fn(docs, key_method="xx", **kw).collect()))
        assert raw == xx, fn.__name__


def test_webtext_ingest_lm_gate(spark):
    """With an lm + ceiling the ingest grows avg_nll and keep
    additionally requires the perplexity gate: a gibberish page whose
    other signals pass is now dropped; the fluent page survives;
    default call (no lm) keeps its original schema."""
    from hope_graph_builder_spark.operators import text as textops
    from hope_graph_builder_spark.operators.extract import markup_pages
    from hope_graph_builder_spark.pipelines.webtext import run_webtext_ingest

    fluent_words = " ".join(
        f"field{i} green{i} rain{i} wind{i} stone{i}" for i in range(25)
    )
    gibberish = " ".join(f"zq{i}xv jwk{i}qz vxq{i}jw" for i in range(30))
    train = spark.createDataFrame(
        [(0, "the quick brown fox " + fluent_words, "en")],
        "doc_id long, text string, lang string",
    )
    lm = textops.train_char_lm(train)
    pages = markup_pages(
        spark.createDataFrame(
            [
                (1, "https://x.example/1", "the quick brown fox " + fluent_words, "en"),
                (2, "https://x.example/2", gibberish, "en"),
            ],
            "doc_id long, url string, text string, lang string",
        )
    )
    base = {r.doc_id: r for r in run_webtext_ingest(pages).collect()}
    assert "avg_nll" not in base[1].asDict()
    out = {
        r.doc_id: r
        for r in run_webtext_ingest(pages, lm=lm, lm_max_nll=3.0).collect()
    }
    assert out[1].avg_nll < out[2].avg_nll
    assert out[1].keep
    assert not out[2].keep and base[2].keep  # only the LM gate drops it
    import pytest

    with pytest.raises(ValueError):
        run_webtext_ingest(pages, lm=lm)


def test_chunk_tokens(spark):
    """Exact chunk grid: stride = seq_len - overlap, short tail kept,
    all-redundant tail suppressed, empty doc emits nothing."""
    import pytest

    from hope_graph_builder_spark.operators import corpus

    docs = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
            (2, "a b c"),
            (3, ""),
            (4, "x " * 4),  # trailing spaces dropped -> 4 tokens
        ],
        "doc_id long, text string",
    )
    out = corpus.chunk_tokens(docs, seq_len=4, overlap=2)
    rows = sorted(
        ((r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text) for r in out.collect())
    )
    # doc 1: starts 0,2,4,6,8 but 8+2 >= 10 -> suppressed (tokens t8,t9
    # already covered by the chunk at 6); starts 0,2,4,6
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t2 t3 t4 t5"),
        (1, 2, 4, "t4 t5 t6 t7"),
        (1, 3, 4, "t6 t7 t8 t9"),
    ]
    # doc 2: 3 tokens -> one short chunk
    assert [r for r in rows if r[0] == 2] == [(2, 0, 3, "a b c")]
    assert not [r for r in rows if r[0] == 3]
    # doc 4: 4 tokens exactly one full chunk; start 2 suppressed (2+2>=4)
    assert [r for r in rows if r[0] == 4] == [(4, 0, 4, "x x x x")]
    with pytest.raises(ValueError):
        corpus.chunk_tokens(docs, seq_len=4, overlap=4)
