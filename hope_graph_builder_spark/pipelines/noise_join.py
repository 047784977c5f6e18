"""Flagship pipeline: the noise-graph spatial join, re-expressed as one
lazy DataFrame DAG (reference `/root/reference/src/noise_graph_join/
noise_graph_join.py:17-138`, traced in SURVEY.md §3.1).

Stage map (reference step → here):
  3  sampling points           sample_edges            (native explode)
  4  xy_id dedup (CSE)         with_xy_id + unique_points
  5  nodata-zone flag          native rect predicate
  6  13-layer sjoin + dedup    pip_join_rect + pivot_layer_max (1 join,
                               1 pivot — not 13 sequential sjoins)
  7  missing split             Column predicate
  8  kNN ring interpolation    ring_points + pip_join_rect +
                               exact 0.7-nearest quantile
  9  source coalesce/max/...   aggregate_noise_values
 10  union                     unionByName
 11  fan-out join              samples ⟕ all_samples on xy_id
 12  per-edge aggregate        aggregate_noises_by_edge
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _persist(df: DataFrame) -> DataFrame:
    """Reused-subtree persistence — OPT-IN via HGBS_PERSIST=1.

    Measured (MULT=400, 4×2-core executors): caching the wide pivoted
    point table costs MORE than recomputing its prefix for the second
    (tiny, column-pruned) consumer — 58.4 s with persist vs 47.9 s
    without for the full flagship. A one-reuse cache of a 10-column
    table rarely pays for its build; the prefix is a broadcast join +
    one distinct. Set HGBS_PERSIST=1 when the reused subtree is
    genuinely expensive (e.g. a shuffle-path PIP join at scale)."""
    if os.environ.get("HGBS_PERSIST"):
        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df

from hope_graph_builder_spark.operators.noise import (
    LAYER_NAMES,
    aggregate_noise_values,
    aggregate_noises_by_edge,
    interpolate_missing,
    pivot_layer_max,
)
from hope_graph_builder_spark.operators.sampling import (
    ring_points,
    sample_edges,
    with_xy_id,
)
from hope_graph_builder_spark.operators.spatial_join import pip_join_rect

SAMPLE_COLS = [
    "xy_id", "road", "train", "tram", "metro",
    "n_max", "n_max_sources", "n_max_adj", "n_max_mask",
]


def unique_points(samples: DataFrame) -> DataFrame:
    """Distinct quantized sampling locations. The reference keeps the
    first duplicate's exact geometry (noise_graph_join.py:33); for
    deterministic distributed execution we use the quantized location
    itself (bin coordinate, 0.1 m grid) — documented deviation, same
    equivalence classes."""
    return samples.select("xy_id").distinct().select(
        "xy_id",
        (F.floor(F.col("xy_id") / 10_000_000) / 10.0).alias("x"),
        (F.pmod(F.col("xy_id"), 10_000_000) / 10.0).alias("y"),
    )


def noise_final_samples(
    edges: DataFrame,
    layers: DataFrame,
    nodata_rect: tuple[float, float, float, float] | None,
    res: int = 7,
    ring_radius: float = 7.0,
    ring_count: int = 20,
    salt: int = 1,
    hot: DataFrame | None = None,
    dedup_xy: bool = True,
    nodata_polys: DataFrame | None = None,
    nodata_res: int = 4,
    fused_dedup: bool = True,
) -> DataFrame:
    """edges(edge_id, x1, y1, x2, y2, length) ×
    layers(layer, poly_id, minx, miny, maxx, maxy, db) →
    one row per edge sample with per-source dB, n_max, n_max_sources,
    n_max_adj (reference steps 3-11; input to the per-edge aggregate).

    ``dedup_xy`` picks the physical strategy (results identical,
    oracle-verified both ways):
    - True — the reference's CSE: distinct quantized locations → PIP →
      fan-out join back to samples. Right when the PIP is a SHUFFLE
      join (layer table too big to broadcast): dedup shrinks the
      expensive join's input ~2.4×.
    - False — PIP every sample directly (at its quantized location, so
      values per location stay identical) via the broadcast join, ONE
      pivot keyed (edge_id, sample idx). Kills the distinct AND the
      fan-out join. MEASURED on the street-edge workload (3 m sampling
      → 2.4× co-located samples): dedup still wins (57-61 s vs
      64-68 s at 4N/MULT=400) — the saved exchanges don't pay for the
      2.4× extra refine work. Pick False only when sample locations
      are mostly unique (dedup factor ≈ 1)."""
    if not dedup_xy:
        return _final_samples_nodedup(
            edges, layers, nodata_rect, res, ring_radius, ring_count, salt, hot
        )
    samples = with_xy_id(sample_edges(edges))

    if fused_dedup and salt == 1 and hot is None and nodata_polys is None:
        return _final_samples_fused_dedup(
            samples, layers, nodata_rect, res, ring_radius, ring_count, edges=edges
        )
    uniq = unique_points(samples)

    if nodata_polys is not None:
        # general nodata GEOMETRY (the reference's nodata layer is a
        # municipal-boundary multipolygon read from GeoPackage,
        # noise_graph_join_test.py:90, noise_graph_join.py:41-47):
        # even-odd PIP semi-join flags the unique sample locations.
        # nodata_res is coarse by default — nodata zones are huge
        # (municipality-scale), so big cells keep the cover linear.
        from hope_graph_builder_spark.operators.spatial_join import pip_join_wkb

        flags = (
            pip_join_wkb(
                uniq.select("xy_id", "x", "y"), nodata_polys,
                res=nodata_res, point_id="xy_id",
            )
            .select("xy_id").distinct()
            .withColumn("_nz", F.lit(True))
        )
        uniq = uniq.join(flags, "xy_id", "left").withColumn(
            "nodata_zone", F.coalesce(F.col("_nz"), F.lit(False))
        ).drop("_nz")
    else:
        nx0, ny0, nx1, ny1 = nodata_rect
        uniq = uniq.withColumn(
            "nodata_zone",
            (F.col("x") >= nx0) & (F.col("x") < nx1)
            & (F.col("y") >= ny0) & (F.col("y") < ny1),
        )

    matches = pip_join_rect(
        uniq, layers, res=res, how="inner", point_id="xy_id", salt=salt, hot=hot
    ).select("xy_id", "layer", "db")
    # pts feeds both the normal and the missing/kNN branches — persist
    # so the sample→dedup→join→pivot prefix computes once
    pts = _persist(uniq.join(pivot_layer_max(matches, "xy_id"), "xy_id", "left"))

    no_noise = None
    for c in LAYER_NAMES:
        cond = F.col(c).isNull()
        no_noise = cond if no_noise is None else (no_noise & cond)
    pts = pts.withColumn("missing_noises", F.col("nodata_zone") & no_noise)

    normal = aggregate_noise_values(pts.filter(~F.col("missing_noises"))).select(*SAMPLE_COLS)

    # Miss-branch input: missing ⇒ nodata_zone, so the second pass over
    # the unpersisted pts lineage filters the (tiny) nodata strip BEFORE
    # the PIP — a full-corpus PIP+pivot recompute becomes a strip-only
    # one. pts.filter(missing) can't push this itself: the no_noise
    # predicate needs the pivot's output. Identical rows by
    # construction (oracle-pinned by the flagship queries). With the
    # subtree persisted, reading the cache is cheaper than any
    # recompute — then filter pts directly.
    if os.environ.get("HGBS_PERSIST"):
        miss = pts.filter(F.col("missing_noises")).select("xy_id", "x", "y")
    else:
        nod = uniq.filter(F.col("nodata_zone"))
        nod_matches = pip_join_rect(
            nod, layers, res=res, how="inner", point_id="xy_id", salt=salt, hot=hot
        ).select("xy_id", "layer", "db")
        nod_pts = nod.join(pivot_layer_max(nod_matches, "xy_id"), "xy_id", "left")
        nod_no_noise = None
        for c in LAYER_NAMES:
            cond = F.col(c).isNull()
            nod_no_noise = cond if nod_no_noise is None else (nod_no_noise & cond)
        miss = nod_pts.filter(nod_no_noise).select("xy_id", "x", "y")
    rings = ring_points(miss, radius=ring_radius, count=ring_count, keep=["xy_id"], index_col="ring_i")
    if salt == 1 and hot is None:
        # broadcastable layer side: LEFT cell-join + one aggregation
        # replaces inner PIP → pivot → join-back (same values, one
        # SortMergeJoin + exchange fewer — r06, oracle-pinned)
        ring_pivot = _left_cell_pivot(rings, layers, res, keys=["xy_id", "ring_i"])
    else:
        ring_matches = pip_join_rect(
            rings, layers, res=res, how="inner", point_id="xy_id", salt=salt, hot=hot
        ).select("xy_id", "ring_i", "layer", "db")
        ring_pivot = rings.select("xy_id", "ring_i").join(
            pivot_layer_max(ring_matches, ["xy_id", "ring_i"]), ["xy_id", "ring_i"], "left"
        )
    interp_vals = interpolate_missing(ring_pivot, ring_count=ring_count)
    # interp_vals carries exactly one row per miss key (rings preserve
    # every miss point; both groupBys preserve keys), so the old
    # ``miss ⟕ interp_vals`` reassembly join was the identity — dropped
    interp = aggregate_noise_values(interp_vals, prefer_syke=True).select(*SAMPLE_COLS)

    all_samples = normal.unionByName(interp)
    return samples.join(all_samples, "xy_id", "left")


def _layer_index_col() -> F.Column:
    """layer name → its LAYER_NAMES position, evaluated ONCE on the
    (tiny, broadcast) polygon side so the hot per-candidate aggregation
    compares ints instead of strings (r06: 8 string equalities per
    candidate row × 53M rows dominated the fused-agg CPU)."""
    expr = F.lit(None).cast("int")
    for i in range(len(LAYER_NAMES) - 1, -1, -1):
        expr = F.when(F.col("layer") == LAYER_NAMES[i], F.lit(i)).otherwise(expr)
    return expr


def _left_cell_pivot(
    points: DataFrame,
    layers: DataFrame,
    res: int,
    keys: list[str],
    x: str = "x",
    y: str = "y",
    res_bump: int = 0,
) -> DataFrame:
    """LEFT broadcast cell-join + one grouped 8-way conditional max —
    the fused PIP+pivot core shared by ``location_exposures`` and the
    ring branch. Exactly one aggregation over a stream-static broadcast
    join; unmatched points survive with all-null layer columns.
    Value-identical to pip_join_rect(inner) → pivot_layer_max →
    join-back (oracle-pinned), with zero join-backs.

    ``res_bump`` joins at a finer cell resolution than the caller's
    polygon-scale ``res`` — results are resolution-invariant (the exact
    bbox refine decides), only the candidate count changes. One step
    finer quarters the cell area, so far fewer non-hit (point, rect)
    candidate rows reach the aggregation (measured at bench scale:
    53M → 33M rows, 2.36 → 1.79 s for the big location pass) at the
    cost of ~4× cover rows on the (tiny, broadcast) polygon side.
    Callers bump only when the point side is large; the cover explode
    stays bounded by the split_by_cover_size valve upstream."""
    from hope_graph_builder_spark.operators.spatial_join import (
        CELL,
        with_cover_cells,
        with_point_cell,
    )

    res = res + res_bump
    p = with_point_cell(points, x, y, res)
    g = F.broadcast(
        with_cover_cells(layers, "minx", "miny", "maxx", "maxy", res)
        .withColumn("_li", _layer_index_col())
        .select(CELL, "_li", "minx", "miny", "maxx", "maxy", "db")
    )
    cand = p.join(g, CELL, "left")
    hit = (
        (F.col(x) >= F.col("minx")) & (F.col(x) < F.col("maxx"))
        & (F.col(y) >= F.col("miny")) & (F.col(y) < F.col("maxy"))
    )
    rows = cand.select(
        *keys,
        F.when(hit, F.col("_li")).alias("_li"),
        F.when(hit, F.col("db")).alias("db"),
    )
    return rows.groupBy(*keys).agg(
        *[
            F.max(F.when(F.col("_li") == i, F.col("db"))).alias(c)
            for i, c in enumerate(LAYER_NAMES)
        ],
    )


def location_exposures(
    samples: DataFrame,
    layers: DataFrame,
    res: int,
    strip: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Location-level exposure table — the fused dedup+PIP+pivot core:
    raw samples LEFT-cell-join the broadcast layer cover at their
    QUANTIZED coordinates and ONE groupBy(xy_id) with map-side combine
    is simultaneously the location dedup AND the per-layer max pivot.
    Output: (xy_id, <one max-dB column per layer>); unmatched
    locations survive the left join with all-null layers.

    x / y are pure functions of xy_id, so they are NOT carried through
    the shuffle as first() buffers — callers re-derive them from xy_id
    (measured: dropping the derivable columns trims the fused partial
    rows ~19%, the one place this path out-shuffled the explicit one).

    ``strip`` pre-filters samples to a rect BEFORE the join (the
    flagship's miss-branch recompute pushes the nodata filter down to
    the sample explode this way).

    Exactly one aggregation over a stream-static broadcast join — a
    legal Structured Streaming stage: streaming/noise_stream.py runs
    this same function over an edge STREAM and the test pins
    stream == batch equality."""
    sq = samples.select(
        "xy_id",
        (F.floor(F.col("xy_id") / 10_000_000) / 10.0).alias("x"),
        (F.pmod(F.col("xy_id"), 10_000_000) / 10.0).alias("y"),
    )
    if strip is not None:
        nx0, ny0, nx1, ny1 = strip
        sq = sq.filter(
            (F.col("x") >= nx0) & (F.col("x") < nx1)
            & (F.col("y") >= ny0) & (F.col("y") < ny1)
        )
    # the point side is corpus-sized here → join one res step finer
    # (fewer false candidates; see _left_cell_pivot docstring)
    return _left_cell_pivot(sq, layers, res, keys=["xy_id"], res_bump=1)


def _final_samples_fused_dedup(
    samples: DataFrame,
    layers: DataFrame,
    nodata_rect: tuple[float, float, float, float],
    res: int,
    ring_radius: float,
    ring_count: int,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Broadcast-PIP fast path: dedup + PIP + pivot in ONE shuffle.

    The old shape was distinct(xy_id) → inner cell-join → groupBy
    pivot → join-back (3 shuffles of xy_id-sized data). Here the raw
    samples LEFT-cell-join the broadcast layer cover at their QUANTIZED
    coordinates (identical evaluation points, so identical values) and
    one groupBy(xy_id) with map-side combine is simultaneously the
    dedup AND the per-layer max pivot; unmatched locations survive via
    the left join. Measured at 4N/MULT=400: 42.5 → ~35 s end-to-end.
    Only for the broadcast case — the salted/hot shuffle path and
    polygon nodata keep the explicit-stage shape.

    r06 miss-branch shape (guide §2.4 — remove shuffles outright; each
    step oracle-pinned identical by the flagship queries):
    - ``edges`` enables a bbox prefilter for the strip recompute: only
      edges whose bbox (±0.1 m, covering the 0.05 m quantization shift)
      intersects the nodata strip can yield strip samples, so the
      recompute explodes a tiny fraction instead of every edge, and the
      OR-form predicate pushes down to the parquet scan.
    - the ring pivot is a LEFT broadcast cell-join + one aggregation
      (``_left_cell_pivot``) instead of inner PIP → pivot → join-back
      (removes one SortMergeJoin + exchange).
    - ``interp_vals`` has exactly one row per ``miss`` key by
      construction (every miss point spawns ring_count ring rows, the
      left join preserves them, both groupBys preserve keys), so the
      old ``miss ⟕ interp_vals`` reassembly join was the identity —
      dropped (removes the second SortMergeJoin + exchange, and with
      it 2 of the 3 strip recomputes of the whole sample explode)."""
    nx0, ny0, nx1, ny1 = nodata_rect

    def build_pts(strip_only: bool) -> DataFrame:
        # miss-branch recompute (strip_only): the nodata filter pushes
        # all the way down to the sample explode — and, when the raw
        # edges are available, below it, to the edge scan itself
        src = samples
        if strip_only and edges is not None:
            m = 0.1  # quantization moves a sample ≤0.05 m; margin 2×
            pre = edges.filter(
                ((F.col("x1") >= nx0 - m) | (F.col("x2") >= nx0 - m))
                & ((F.col("x1") < nx1 + m) | (F.col("x2") < nx1 + m))
                & ((F.col("y1") >= ny0 - m) | (F.col("y2") >= ny0 - m))
                & ((F.col("y1") < ny1 + m) | (F.col("y2") < ny1 + m))
            )
            src = with_xy_id(sample_edges(pre))
        agg = location_exposures(
            src, layers, res, strip=nodata_rect if strip_only else None
        )
        x = (F.floor(F.col("xy_id") / 10_000_000) / 10.0)
        y = (F.pmod(F.col("xy_id"), 10_000_000) / 10.0)
        return agg.select(
            "xy_id",
            x.alias("x"),
            y.alias("y"),
            ((x >= nx0) & (x < nx1) & (y >= ny0) & (y < ny1)).alias("nodata_zone"),
            *LAYER_NAMES,
        )

    def no_noise_pred() -> F.Column:
        cond = None
        for c in LAYER_NAMES:
            cur = F.col(c).isNull()
            cond = cur if cond is None else (cond & cur)
        return cond

    pts = _persist(build_pts(strip_only=False)).withColumn(
        "missing_noises", F.col("nodata_zone") & no_noise_pred()
    )
    normal = aggregate_noise_values(pts.filter(~F.col("missing_noises"))).select(*SAMPLE_COLS)

    if os.environ.get("HGBS_PERSIST"):
        miss = pts.filter(F.col("missing_noises")).select("xy_id", "x", "y")
    else:
        miss = build_pts(strip_only=True).filter(no_noise_pred()).select("xy_id", "x", "y")
    rings = ring_points(miss, radius=ring_radius, count=ring_count,
                        keep=["xy_id"], index_col="ring_i")
    ring_pivot = _left_cell_pivot(rings, layers, res, keys=["xy_id", "ring_i"])
    interp_vals = interpolate_missing(ring_pivot, ring_count=ring_count)
    interp = aggregate_noise_values(interp_vals, prefer_syke=True).select(*SAMPLE_COLS)

    all_samples = normal.unionByName(interp)
    return samples.join(all_samples, "xy_id", "left")


def _final_samples_nodedup(
    edges: DataFrame,
    layers: DataFrame,
    nodata_rect: tuple[float, float, float, float],
    res: int,
    ring_radius: float,
    ring_count: int,
    salt: int,
    hot: DataFrame | None,
) -> DataFrame:
    """PIP-every-sample strategy (see noise_final_samples docstring).
    Each sample is evaluated at its QUANTIZED location (xy_id bin
    center) — exactly the coordinates the dedup path evaluates — so
    per-location values, and therefore per-edge aggregates, are
    identical. Salting is ignored: the layer side is broadcast here
    (no shuffle to skew); use dedup_xy=True for the salted shuffle
    path."""
    from hope_graph_builder_spark.operators.spatial_join import (
        CELL,
        with_cover_cells,
        with_point_cell,
    )

    samples = with_xy_id(sample_edges(edges, index_col="_si"))
    s = samples.select(
        "edge_id", "_si", "sample_len", "xy_id",
        (F.floor(F.col("xy_id") / 10_000_000) / 10.0).alias("x"),
        (F.pmod(F.col("xy_id"), 10_000_000) / 10.0).alias("y"),
    )
    nx0, ny0, nx1, ny1 = nodata_rect
    s = s.withColumn(
        "nodata_zone",
        (F.col("x") >= nx0) & (F.col("x") < nx1) & (F.col("y") >= ny0) & (F.col("y") < ny1),
    )
    # LEFT cell-cover broadcast join keeps unmatched samples in-line
    # (no separate match/join-back pass); refine becomes the match value
    p = with_point_cell(s, "x", "y", res)
    g = F.broadcast(with_cover_cells(layers, "minx", "miny", "maxx", "maxy", res))
    cand = p.join(g, CELL, "left")
    hit = (
        (F.col("x") >= F.col("minx")) & (F.col("x") < F.col("maxx"))
        & (F.col("y") >= F.col("miny")) & (F.col("y") < F.col("maxy"))
    )
    rows = cand.select(
        "edge_id", "_si", "sample_len", "xy_id", "x", "y", "nodata_zone",
        F.when(hit, F.col("layer")).alias("layer"),
        F.when(hit, F.col("db")).alias("db"),
    )
    pts = rows.groupBy("edge_id", "_si").agg(
        F.first("sample_len").alias("sample_len"),
        F.first("xy_id").alias("xy_id"),
        F.first("x").alias("x"),
        F.first("y").alias("y"),
        F.first("nodata_zone").alias("nodata_zone"),
        *[F.max(F.when(F.col("layer") == c, F.col("db"))).alias(c) for c in LAYER_NAMES],
    )

    no_noise = None
    for c in LAYER_NAMES:
        cond = F.col(c).isNull()
        no_noise = cond if no_noise is None else (no_noise & cond)
    pts = pts.withColumn("missing_noises", F.col("nodata_zone") & no_noise)
    pts = _persist(pts)

    carry = ["edge_id", "_si", "sample_len", "xy_id"]
    normal = aggregate_noise_values(pts.filter(~F.col("missing_noises"))).select(
        *carry, *SAMPLE_COLS[1:]
    )

    miss = pts.filter(F.col("missing_noises")).select(*carry, "x", "y")
    rings = ring_points(
        miss, radius=ring_radius, count=ring_count,
        keep=["edge_id", "_si"], index_col="ring_i",
    )
    ring_matches = pip_join_rect(
        rings, layers, res=res, how="inner", point_id="ring_i"
    ).select("edge_id", "_si", "ring_i", "layer", "db")
    ring_pivot = rings.select("edge_id", "_si", "ring_i").join(
        pivot_layer_max(ring_matches, ["edge_id", "_si", "ring_i"]),
        ["edge_id", "_si", "ring_i"],
        "left",
    )
    interp_vals = interpolate_missing(
        ring_pivot, ring_count=ring_count, key=["edge_id", "_si"]
    )
    interp = aggregate_noise_values(
        miss.join(interp_vals, ["edge_id", "_si"], "left"), prefer_syke=True
    ).select(*carry, *SAMPLE_COLS[1:])

    return normal.unionByName(interp).drop("_si")


def run_noise_join(
    edges: DataFrame,
    layers: DataFrame,
    nodata_rect: tuple[float, float, float, float] | None,
    res: int = 7,
    ring_radius: float = 7.0,
    ring_count: int = 20,
    salt: int = 1,
    hot: DataFrame | None = None,
    extent_rect: tuple[float, float, float, float] | None = None,
    dedup_xy: bool = True,
    nodata_polys: DataFrame | None = None,
    nodata_res: int = 4,
    fused_dedup: bool = True,
    extent_polys: list | None = None,
) -> DataFrame:
    """Full flagship: → edge_noises(edge_id, noises map, noise_source,
    noise_sources map).

    ``extent_rect`` enables the J3 three-valued semantics (reference
    noise_graph_update.py:36-44, gpd.sjoin op='within'): edges whose
    GEOMETRY is within the noise-data extent get the {} / '' defaults
    when unmatched; all other edges get noises=NULL / noise_source=NULL
    (nodata). For a rectangular (convex) extent and straight 2-vertex
    edges, geometry-within ⇔ BOTH endpoints inside — exactly the native
    predicate below, no refinement needed.

    ``extent_polys`` is the turnkey GENERAL-extent form (list of ring
    arrays, outer + holes, even-odd — the reference's extent is a real
    concave municipal polygon): within = both endpoints inside AND no
    boundary crossing (``segments_within_rings``), which differs from
    the endpoint-only predicate exactly when a segment exits and
    re-enters a concave region. Mutually exclusive with
    ``extent_rect``."""
    if nodata_polys is not None and not dedup_xy:
        raise ValueError("nodata_polys requires the dedup_xy=True strategy")
    if extent_rect is not None and extent_polys is not None:
        raise ValueError("pass extent_rect OR extent_polys, not both")
    final = noise_final_samples(
        edges, layers, nodata_rect, res, ring_radius, ring_count, salt, hot,
        dedup_xy=dedup_xy, nodata_polys=nodata_polys, nodata_res=nodata_res,
        fused_dedup=fused_dedup,
    )
    # SLIM all-numeric projection into the fused single-pass edge
    # aggregate: ONE exchange for the entire tail (the old 2-pass +
    # reassembly-join tail cost 5 exchanges / 6 stages, and the
    # stage-launch floor was the measured N-vs-4N scaling bottleneck).
    # No persist: the fused aggregate is the only consumer.
    slim = final.select("edge_id", "sample_len", "n_max_adj", "n_max_mask")
    if extent_rect is None and extent_polys is None:
        # every edge yields ≥1 sample ⇒ the aggregate's group keys
        # already cover the full edge list — no reassembly join
        return aggregate_noises_by_edge(slim)
    if extent_polys is not None:
        from hope_graph_builder_spark.operators.geometry import edges_within_rings

        return aggregate_noises_by_edge(
            slim,
            edges_all=edges_within_rings(edges, extent_polys),
            extent_flag="in_extent",
        )
    ex0, ey0, ex1, ey1 = extent_rect
    inside = lambda x, y: (  # noqa: E731
        (F.col(x) >= ex0) & (F.col(x) < ex1) & (F.col(y) >= ey0) & (F.col(y) < ey1)
    )
    # within(convex rect) ⇔ both endpoints inside (see docstring)
    edges_flagged = edges.select(
        "edge_id", (inside("x1", "y1") & inside("x2", "y2")).alias("in_extent")
    )
    # (edges_flagged is the preserved side of the left join, so it
    # cannot be broadcast; it re-shuffles on edge_id — extent mode only)
    return aggregate_noises_by_edge(
        slim, edges_all=edges_flagged, extent_flag="in_extent"
    )
