"""Similarity search over embedding columns (task brief):
brute-force cosine top-k baseline + sign-LSH bucketed ANN scale path.

Dot products are sequential folds (F.aggregate) over double-cast
arrays — deterministic and bit-identical to DuckDB's list_reduce, so
even the float scores oracle-compare exactly.

Scale notes: brute force is a broadcast of the (small) query set
against the full corpus — O(Q×N) but embarrassingly parallel and
shuffle-free until the final per-query top-k (a tiny groupBy). The
sign-LSH variant buckets the corpus once (one narrow projection), then
joins query buckets to corpus buckets — candidate set shrinks ~2^bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LSH_BITS = 8
DIM = 64


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential fold — same evaluation order as DuckDB list_reduce."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k by cosine; deterministic tie-break on
    corpus id. Query side is broadcast (small by construction)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def lsh_plane_weight(j: int, k: int) -> float:
    """Deterministic pseudo-random hyperplane component — pure rational
    arithmetic so any engine reproduces it exactly."""
    return ((j * 37 + k * 101) % 19 - 9) / 9.0


def sign_lsh_bucket(v: Column, bits: int = LSH_BITS, dim: int = DIM) -> Column:
    """Bucket id = Σ_j (dot(v, plane_j) ≥ 0) << j over ``bits`` fixed
    hyperplanes (literal weight arrays, sequential fold dot)."""
    acc = F.lit(0).cast("long")
    for j in range(bits):
        w = F.array(*[F.lit(lsh_plane_weight(j, k)) for k in range(dim)])
        d = dot(v, w)
        acc = acc + F.when(d >= 0.0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
    return acc


PLANE_STRIDE = 1009  # table t uses planes t*STRIDE .. t*STRIDE+bits-1


def sign_lsh_table_buckets(
    v: Column, tables: int, bits: int = LSH_BITS, dim: int = DIM
) -> Column:
    """Array of (table, bucket) structs — one sign-LSH bucket per
    independent hyperplane table (planes disjoint via PLANE_STRIDE)."""
    out = []
    for t in range(tables):
        acc = F.lit(0).cast("long")
        for j in range(bits):
            w = F.array(
                *[F.lit(lsh_plane_weight(t * PLANE_STRIDE + j, k)) for k in range(dim)]
            )
            acc = acc + F.when(
                dot(v, w) >= 0.0, F.shiftleft(F.lit(1).cast("long"), j)
            ).otherwise(F.lit(0).cast("long"))
        out.append(F.struct(F.lit(t).alias("tbl"), acc.alias("bucket")))
    return F.array(*out)


def ann_multitable_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    tables: int = 2,
    bits: int = LSH_BITS,
    dim: int = DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table sign-LSH ANN — the 100 TB shape: a single 8-bit
    table leaves n/256 vectors per bucket (quadratic within bucket);
    raising bits shrinks buckets exponentially but loses recall, and L
    independent tables win the recall back (candidate iff the pair
    collides in ANY table). At web scale run e.g. bits=16, tables=8 →
    per-bucket n/65536 with union recall; here tables=2/bits=8 keeps
    the oracle twin tractable.

    Plan shape: corpus buckets once (narrow explode of L structs, no
    shuffle), query buckets broadcast, candidate pairs deduped across
    tables on (query, cand) ids BEFORE the vectors are re-attached, so
    each survivor is scored exactly once."""
    cb = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.explode(
            sign_lsh_table_buckets(_as_double(F.col(vec_col)), tables, bits, dim)
        ).alias("tb"),
    ).select("cand_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            sign_lsh_table_buckets(_as_double(F.col(vec_col)), tables, bits, dim)
        ).alias("tb"),
    ).select("query_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    pairs = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"], "inner")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    scored = (
        pairs.join(c, "cand_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = LSH_BITS,
    dim: int = DIM,
) -> DataFrame:
    """ANN: restrict brute force to same-LSH-bucket candidates."""
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        sign_lsh_bucket(_as_double(F.col(vec_col)), bits, dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        sign_lsh_bucket(_as_double(F.col(vec_col)), bits, dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket", "inner")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def _anchor_centroids(c: DataFrame, k: int) -> DataFrame:
    """Deterministic rank-based anchors: the ``k`` smallest ids of
    ``c`` (cand_id, cv), re-labeled list_id 0..k-1. Fails loudly when
    the corpus has fewer than k vectors. The limit(k) result is k rows
    — the row_number window over it is a single tiny partition, and
    downstream every consumer broadcasts it."""
    top = c.orderBy("cand_id").limit(k)
    n = top.count()
    if n < k:
        raise ValueError(
            f"anchor init needs k={k} vectors, corpus has only {n}"
        )
    w = Window.orderBy("cand_id")
    return top.select(
        (F.row_number().over(w) - 1).cast("long").alias("list_id"),
        F.col("cv").alias("cen"),
    )


def kmeans_lloyd(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dp: int = 5,
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column — the trained
    coarse quantizer for ``ivf_topk(centroids=...)`` (its docstring's
    documented swap-in seam, now real). Spherical assignment (argmax
    cosine, ties to the lowest list id — identical to IVF routing) and
    arithmetic-mean update.

    100 TB shape per iteration: one broadcast of the k×dim centroid
    table, one narrow assignment pass (crossJoin against the broadcast
    + windowed argmax per vector), one groupBy(list, dim) with map-side
    partial sums. Centroids are localCheckpoint'ed between iterations
    (lineage cut, same pattern as operators/graph.py) — never collected
    to the driver.

    Cross-engine exactness (the repo's quantize-then-decimal-sum rule):
    components are half-even-quantized to ``dp`` decimals up front
    (default 5 — the validated bround==round_even range), so
    the per-dimension SUM runs in DECIMAL — order-free and exact — and
    mean = CAST(sum AS DOUBLE)/n is bit-identical in any engine. A
    cluster that loses all members drops out (documented; anchors-init
    makes this unreachable on real corpora).

    Anchor init is RANK-based (the k smallest ids, re-labeled
    0..k-1), not value-based ``id < k`` — ids may start anywhere
    (UUID-hash ids, offset ranges); a corpus with fewer than k
    vectors raises instead of silently training fewer clusters.
    orderBy(id).limit(k) plans as a distributed top-k (per-partition
    take + tiny merge), never a global sort.

    → (list_id, cen array<double>, size long)."""
    v = F.transform(F.col(vec_col), lambda x: F.bround(x.cast("double"), dp))
    c = corpus.select(F.col(id_col).alias("cand_id"), v.alias("cv"))
    cen = _anchor_centroids(c, k)
    cen = cen.withColumn("size", F.lit(1).cast("long"))
    wa = Window.partitionBy("cand_id").orderBy(F.desc("acos"), F.asc("list_id"))
    for _ in range(iters):
        assigned = (
            c.crossJoin(F.broadcast(cen.select("list_id", "cen")))
            .withColumn("acos", cosine(F.col("cv"), F.col("cen")))
            .withColumn("arnk", F.row_number().over(wa))
            .filter(F.col("arnk") == 1)
            .select("cand_id", "cv", "list_id")
        )
        sums = (
            assigned.select("list_id", F.posexplode("cv").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(20,10)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        cen = sums.groupBy("list_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda t: t["m"],
            ).alias("cen"),
            F.first("n").alias("size"),
        )
        cen = cen.localCheckpoint()
    return cen


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN — the cluster-routed scale path (complement of the
    LSH family): vectors are assigned once to their nearest of
    ``nlist`` coarse centroids (inverted lists), queries probe their
    ``nprobe`` closest lists, exact cosine runs only inside probed
    lists → candidate work ≈ N·nprobe/nlist per query.

    Centroids are deterministic anchors (the ``nlist`` smallest-id
    corpus vectors, rank-labeled — id values may start anywhere)
    instead of k-means iterations: the ROUTING/plan shape —
    broadcast centroid table, one narrow assignment pass, equi-join on
    list id, per-query top-k window — is exactly the production IVF
    shape; swapping in trained centroids changes only the tiny
    broadcast table — pass ``centroids=kmeans_lloyd(corpus, k=nlist)``
    (columns list_id, cen) for the trained variant. At 100 TB:
    nlist ~ sqrt(N), lists co-partitioned by list_id so each probe is
    a partition-local scan."""
    if centroids is not None:
        cen = centroids.select("list_id", "cen")
    else:
        cen = _anchor_centroids(
            corpus.select(
                F.col(id_col).alias("cand_id"),
                _as_double(F.col(vec_col)).alias("cv"),
            ),
            nlist,
        )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    wa = Window.partitionBy("cand_id").orderBy(F.desc("acos"), F.asc("list_id"))
    assigned = (
        c.crossJoin(F.broadcast(cen))
        .withColumn("acos", cosine(F.col("cv"), F.col("cen")))
        .withColumn("arnk", F.row_number().over(wa))
        .filter(F.col("arnk") == 1)
        .select("cand_id", "cv", "list_id")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("list_id"))
    probes = (
        q.crossJoin(F.broadcast(cen))
        .withColumn("qcos", cosine(F.col("qv"), F.col("cen")))
        .withColumn("qrnk", F.row_number().over(wq))
        .filter(F.col("qrnk") <= nprobe)
        .select("query_id", "qv", "list_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def embedding_neardup(
    corpus: DataFrame,
    threshold: float = 0.99,
    tables: int = 2,
    bits: int = LSH_BITS,
    dim: int = DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine NEAR-DUP pairs — the dedup form of ANN (task
    brief: 'embedding-cosine near-dup'): multi-table sign-LSH candidate
    generation (linear), pair-dedup across tables BEFORE vectors
    re-attach, exact cosine ≥ threshold only on candidates. Same scale
    shape as d_lsh_jaccard_verify: no all-pairs stage anywhere; at
    100 TB raise bits/tables to bound per-bucket candidates."""
    v = _as_double(F.col(vec_col))
    bk = corpus.select(
        F.col(id_col).alias("vid"),
        F.explode(sign_lsh_table_buckets(v, tables, bits, dim)).alias("tb"),
    ).select("vid", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    x, y = bk.alias("x"), bk.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vid") < F.col("y.vid")),
        )
        .select(F.col("x.vid").alias("a"), F.col("y.vid").alias("b"))
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("a"), _as_double(F.col(vec_col)).alias("av"))
    vb = corpus.select(F.col(id_col).alias("b"), _as_double(F.col(vec_col)).alias("bv"))
    return (
        pairs.join(va, "a").join(vb, "b")
        .withColumn("cos", cosine(F.col("av"), F.col("bv")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int | None = None,
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one —
    the measurement that turns "nprobe=2 seems fine" into a number you
    tune against. Both inputs are (query_id, cand_id[, rank]) tables
    (the shape cosine_topk / ivf_topk / lsh_topk emit); ``k`` trims
    both sides to their top-k by ``rank`` when present. Returns ONE
    row: (n_queries, n_exact, n_hits, macro_recall, micro_recall) —
    macro = mean of per-query |A∩E|/|E| (every query weighted equally,
    the number ANN papers quote; a float mean — order-dependent in the
    last ulp, bround'ed), micro = Σhits/Σexact computed as ONE division
    of two exact integer sums (engine-exact; when every query has
    exactly k exact neighbors, macro == micro analytically). Exact-side queries
    with no approximate hits count as recall 0 (a probe miss is a
    miss, not a dropped row).

    Scale shape: one equi-join on (query_id, cand_id) + two
    aggregations with map-side combine; both inputs are top-k tables
    (n_queries·k rows), not corpora."""
    if k is not None:
        missing = [n for n, d in (("approx", approx), ("exact", exact))
                   if "rank" not in d.columns]
        if missing:
            raise ValueError(
                f"k-trim needs a 'rank' column on both inputs; missing on "
                f"{missing} — pass k=None for pre-trimmed tables"
            )
        a = approx.filter(F.col("rank") <= k).select("query_id", "cand_id")
        e = exact.filter(F.col("rank") <= k).select("query_id", "cand_id")
    else:
        a = approx.select("query_id", "cand_id")
        e = exact.select("query_id", "cand_id")
    hit = a.withColumn("_hit", F.lit(1))
    per = (
        e.join(hit, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.count("_hit").alias("_h"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("_n").cast("long").alias("n_exact"),
        F.sum("_h").cast("long").alias("n_hits"),
        F.bround(F.avg(F.col("_h") / F.col("_n")), 6).alias("macro_recall"),
        (F.sum("_h").cast("double") / F.sum("_n").cast("double")).alias(
            "micro_recall"
        ),
    )
