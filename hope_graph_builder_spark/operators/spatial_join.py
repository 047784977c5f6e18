"""Cell-indexed spatial joins — the engine's flagship operators.

Re-expresses the reference's R-tree sjoins
(J1/J2/J3: `/root/reference/src/noise_graph_join/utils.py:143-163`,
`:75-87`; J4 DWithin: `src/green_view_join_v1/green_view_join_v1.py:38-53`)
as: cell equi-join prefilter (native Columns, §spatial/cells) + exact
refinement.

Refinement strategy:
- rectangles (axis-aligned)  → native comparisons (whole-stage codegen)
- DWithin(point, segment, d) → native arithmetic (dist² ≤ d², no UDF)
- general polygon rings      → vectorized numpy ray-cast inside
                               mapInPandas (Arrow batches)

Skew: hot cells (e.g. a popular page hotspot) are salted — the POINT
side gets `salt = pmod(xxhash64(id), k)`, the (small) polygon side is
replicated k× — either a static factor or per-cell factors from a
profile pass (`hot_cell_factors`). AQE skew-join stays on as backstop.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from hope_graph_builder_spark.spatial import cell_id_expr, cover_bbox_expr
from hope_graph_builder_spark.spatial.kernels import points_in_rings
from hope_graph_builder_spark.spatial.wkb import multipolygon_from_wkb

CELL = "_cell"
SALT = "_salt"


def with_point_cell(df: DataFrame, x: str, y: str, res: int, out: str = CELL) -> DataFrame:
    return df.withColumn(out, cell_id_expr(F.col(x), F.col(y), res))


def with_cover_cells(
    df: DataFrame, minx: str, miny: str, maxx: str, maxy: str, res: int, out: str = CELL
) -> DataFrame:
    """Explode each bbox into the cells it intersects (native sequence)."""
    return df.withColumn(
        out,
        F.explode(cover_bbox_expr(F.col(minx), F.col(miny), F.col(maxx), F.col(maxy), res)),
    )


def split_by_cover_size(
    polys: DataFrame, res: int, max_cells: int = 4096
) -> tuple[DataFrame, DataFrame]:
    """Operability valve for the polygon side: geometries whose bbox
    cover at ``res`` would explode past ``max_cells`` (a metro-wide
    boundary at a street-scale res covers millions of cells — measured
    in this repo's own gpkg test before the guard) are split off so the
    pipeline can route them to a coarser res or a broadcast refine
    instead of freezing the cover explode. Native arithmetic on the
    bbox columns; zero-cost when nothing is oversized."""
    from hope_graph_builder_spark.spatial import cells as cellsmod

    s = F.lit(cellsmod.cell_size(res))
    nx = F.floor(F.col("maxx") / s) - F.floor(F.col("minx") / s) + 1
    ny = F.floor(F.col("maxy") / s) - F.floor(F.col("miny") / s) + 1
    n = nx * ny
    return polys.filter(n <= max_cells), polys.filter(n > max_cells)


def hot_cell_factors(
    points_with_cell: DataFrame, threshold: int, max_factor: int = 32
) -> DataFrame:
    """Profile pass: cells whose point count exceeds ``threshold`` get a
    salt factor ceil(count/threshold), capped. Tiny output → broadcast.
    At 100 TB this profile runs on a sample; locally it's exact.

    ``max_factor`` must fit the 7 salt bits of the packed join key
    (_pack_ck) — validated here so a mis-tuned valve fails loudly
    instead of wrapping two salts onto one key."""
    if not (1 <= max_factor <= _MAX_SALT):
        raise ValueError(
            f"max_factor must be in [1, {_MAX_SALT}] (salt packs into 7 bits"
            f" of the join key), got {max_factor}"
        )
    return (
        points_with_cell.groupBy(CELL)
        .count()
        .filter(F.col("count") > threshold)
        .select(
            CELL,
            F.least(
                F.ceil(F.col("count") / F.lit(threshold)).cast("int"), F.lit(max_factor)
            ).alias("_k"),
        )
    )


_LOW56 = (1 << 56) - 1
_MAX_SALT = 64  # salt values 0..63 fit bits 56..62 of the packed key


def _pack_ck(salt_col):
    """(cell, salt) → ONE long key: low 56 bits = ix/iy, bits 56..62 =
    salt (≤ 63). The cell id's res bits live at 56..62, but res is
    CONSTANT within a join, so masking it out loses nothing. One 8-byte
    key column instead of two per shuffled row on BOTH join sides (the
    points side is the wide one at scale: 40 → 32 B/row, and one hash
    evaluation instead of two) — the salted-shuffle legs are
    memory-bandwidth-bound (BASELINE.md addendum 4), so exchange bytes
    are the scaling currency."""
    return F.col(CELL).bitwiseAND(F.lit(_LOW56)) + F.shiftleft(
        salt_col.cast("long"), 56
    )


def _apply_salt(
    points: DataFrame, polys: DataFrame, point_id: str, salt: int, hot: DataFrame | None
) -> tuple[DataFrame, DataFrame, list[str]]:
    if not (1 <= salt <= _MAX_SALT):
        raise ValueError(
            f"salt must be in [1, {_MAX_SALT}] (7 packed key bits), got {salt}"
        )
    if hot is not None:
        points = points.join(F.broadcast(hot), CELL, "left").withColumn(
            "_ck",
            _pack_ck(F.pmod(F.xxhash64(F.col(point_id)), F.coalesce(F.col("_k"), F.lit(1)))),
        ).drop("_k", CELL)
        polys = (
            polys.join(F.broadcast(hot), CELL, "left")
            .withColumn(
                SALT,
                F.explode(F.sequence(F.lit(0), F.coalesce(F.col("_k"), F.lit(1)) - 1)),
            )
            .withColumn("_ck", _pack_ck(F.col(SALT)))
            .drop("_k", SALT, CELL)
        )
        return points, polys, ["_ck"]
    if salt > 1:
        points = points.withColumn(
            "_ck", _pack_ck(F.pmod(F.xxhash64(F.col(point_id)), F.lit(salt)))
        ).drop(CELL)
        polys = (
            polys.withColumn(SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
            .withColumn("_ck", _pack_ck(F.col(SALT)))
            .drop(SALT, CELL)
        )
        return points, polys, ["_ck"]
    return points, polys, [CELL]


def pip_join_rect(
    points: DataFrame,
    rects: DataFrame,
    res: int,
    x: str = "x",
    y: str = "y",
    how: str = "inner",
    point_id: str = "doc_id",
    salt: int = 1,
    hot: DataFrame | None = None,
    broadcast_polys: bool = True,
) -> DataFrame:
    """Point-in-rectangle spatial join, fully native (no UDF).

    ``rects`` must carry minx/miny/maxx/maxy. Containment is half-open
    ([minx, maxx) × [miny, maxy)) so stacked rectangle borders never
    double-match. ``how='left'`` keeps unmatched points with null
    rect columns (reference J1/J2 left semantics, utils.py:143-163).
    """
    p = with_point_cell(points, x, y, res)
    g = with_cover_cells(rects, "minx", "miny", "maxx", "maxy", res)
    p, g, keys = _apply_salt(p, g, point_id, salt, hot)
    if broadcast_polys:
        g = F.broadcast(g)
    cand = p.join(g, keys, "inner")
    refined = cand.filter(
        (F.col(x) >= F.col("minx")) & (F.col(x) < F.col("maxx"))
        & (F.col(y) >= F.col("miny")) & (F.col(y) < F.col("maxy"))
    ).drop(*keys)
    if how == "inner":
        return refined
    if how == "left":
        rect_cols = [c for c in rects.columns]
        matches = refined.select(point_id, *rect_cols)
        return points.join(matches, point_id, "left")
    raise ValueError(how)


def pip_join_wkb(
    points: DataFrame,
    polys: DataFrame,
    res: int,
    x: str = "x",
    y: str = "y",
    point_id: str = "doc_id",
    poly_id: str = "poly_id",
    geom: str = "geom",
    salt: int = 1,
    hot: DataFrame | None = None,
    broadcast_polys: bool = True,
) -> DataFrame:
    """Point-in-polygon join for general WKB geometry: Polygon or
    MultiPolygon, WITH hole rings (reference noise/land-cover surfaces
    carry both, noise_data_preprocessing.py:26-41).

    Same cell prefilter as pip_join_rect; exact refine is a vectorized
    even-odd ray-cast across ALL rings of all parts
    (spatial/kernels.points_in_rings — inside-the-hole correctly does
    NOT match) over Arrow batches, grouped by polygon within each
    batch — one decode + one vectorized test per (batch, polygon).
    Requires bbox columns minx/miny/maxx/maxy on ``polys`` (cheap to
    precompute at ingest; keeps the cover native).
    """
    p = with_point_cell(points, x, y, res)
    g = with_cover_cells(polys, "minx", "miny", "maxx", "maxy", res)
    p, g, keys = _apply_salt(p, g, point_id, salt, hot)
    if broadcast_polys:
        g = F.broadcast(g)
    cand = p.join(g, keys, "inner").drop(*keys, "minx", "miny", "maxx", "maxy")
    out_schema = StructType([f for f in cand.schema.fields if f.name != geom])
    xcol, ycol, gcol = x, y, geom

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf.drop(columns=[gcol])
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[xcol].to_numpy(dtype=np.float64)
            py = pdf[ycol].to_numpy(dtype=np.float64)
            for _, idx in pdf.groupby(poly_id, sort=False).indices.items():
                parts = multipolygon_from_wkb(bytes(pdf[gcol].iloc[idx[0]]))
                rings = [r for part in parts for r in part]
                keep[idx] = points_in_rings(px[idx], py[idx], rings)
            yield pdf.loc[keep].drop(columns=[gcol])

    return cand.mapInPandas(refine, schema=out_schema)


def dwithin_join(
    points: DataFrame,
    segments: DataFrame,
    dist: float,
    res: int,
    x: str = "x",
    y: str = "y",
    point_id: str = "doc_id",
    broadcast_points: bool = False,
    salt: int = 1,
    hot: DataFrame | None = None,
) -> DataFrame:
    """points × 2-vertex segments within ``dist`` meters — fully native.

    Re-expresses the reference's buffer(30 m)+sjoin(intersects) (J4,
    green_view_join_v1.py:38-53) without materializing buffer geometry:
    cover the segment bbox expanded by dist, equi-join on cell, refine
    with exact point-segment distance² ≤ dist² (pure arithmetic —
    stays in whole-stage codegen).
    ``segments`` must carry x1, y1, x2, y2.

    Skew: same valve as the PIP joins — ``salt``/``hot`` spray the
    point side by pmod(xxhash64(point_id), k) and replicate the
    cover-exploded segment side k× (hot: only in profiled hot cells),
    joined on the packed single-long (cell, salt) key. A dense page
    hotspot otherwise lands every pair of its cell in one task at
    100 TB. Salted ≡ unsalted is pytest-asserted."""
    d = F.lit(float(dist))
    seg = (
        segments
        .withColumn("_minx", F.least("x1", "x2") - d)
        .withColumn("_maxx", F.greatest("x1", "x2") + d)
        .withColumn("_miny", F.least("y1", "y2") - d)
        .withColumn("_maxy", F.greatest("y1", "y2") + d)
    )
    g = with_cover_cells(seg, "_minx", "_miny", "_maxx", "_maxy", res).drop(
        "_minx", "_miny", "_maxx", "_maxy"
    )
    p = with_point_cell(points, x, y, res)
    p, g, keys = _apply_salt(p, g, point_id, salt, hot)
    cand = g.join(F.broadcast(p) if broadcast_points else p, keys, "inner").drop(*keys)
    return cand.filter(point_segment_dist2(x, y) <= d * d)


def point_segment_dist2(x: str, y: str):
    """Exact point→segment distance² as one codegen'd Column (clamped
    projection onto [x1,y1]-[x2,y2]; degenerate segment → endpoint
    distance). The identical association order is mirrored in every
    DuckDB oracle that shares it."""
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    seg2 = dx * dx + dy * dy
    t_raw = ((F.col(x) - F.col("x1")) * dx + (F.col(y) - F.col("y1")) * dy) / seg2
    t = F.when(seg2 > 0, F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))).otherwise(F.lit(0.0))
    cx = F.col("x1") + t * dx
    cy = F.col("y1") + t * dy
    return (F.col(x) - cx) * (F.col(x) - cx) + (F.col(y) - cy) * (F.col(y) - cy)


def dwithin_polyline_join(
    points: DataFrame,
    polylines: DataFrame,
    dist: float,
    res: int,
    x: str = "x",
    y: str = "y",
    point_id: str = "doc_id",
    line_id: str = "edge_id",
    salt: int = 1,
    hot: DataFrame | None = None,
) -> DataFrame:
    """points × MULTI-VERTEX polylines within ``dist`` meters →
    (line_id, point_id, min_d2) — the real-street-edge form of J4 (the
    reference's edges are polylines, noise_graph_join/utils.py:23-30;
    dwithin_join handles the 2-vertex special case).

    Plan shape: polylines explode into their segments NARROWLY (an
    in-partition sequence explode — no shuffle, ~nv rows per line),
    each segment covers its dist-expanded bbox at ``res``, the
    cell-equi-join + exact distance² refine prunes BEFORE the single
    aggregation exchange, and groupBy(line, point) min collapses
    multi-segment duplicates while reporting the true polyline
    distance². Same skew valve as the segment path. Filter-then-min
    equals min-then-filter because any pair with a surviving segment
    has its global minimum among the survivors."""
    n = F.size("xs")
    segs = polylines.select(
        line_id,
        F.explode(F.sequence(F.lit(1), n - 1)).alias("_i"),
        "xs", "ys",
    ).select(
        line_id,
        F.element_at("xs", F.col("_i").cast("int")).alias("x1"),
        F.element_at("ys", F.col("_i").cast("int")).alias("y1"),
        F.element_at("xs", (F.col("_i") + 1).cast("int")).alias("x2"),
        F.element_at("ys", (F.col("_i") + 1).cast("int")).alias("y2"),
    )
    d = F.lit(float(dist))
    seg = (
        segs
        .withColumn("_minx", F.least("x1", "x2") - d)
        .withColumn("_maxx", F.greatest("x1", "x2") + d)
        .withColumn("_miny", F.least("y1", "y2") - d)
        .withColumn("_maxy", F.greatest("y1", "y2") + d)
    )
    g = with_cover_cells(seg, "_minx", "_miny", "_maxx", "_maxy", res).drop(
        "_minx", "_miny", "_maxx", "_maxy"
    )
    p = with_point_cell(points, x, y, res)
    p, g, keys = _apply_salt(p, g, point_id, salt, hot)
    cand = g.join(p, keys, "inner").drop(*keys)
    d2 = point_segment_dist2(x, y)
    return (
        cand.withColumn("_d2", d2)
        .filter(F.col("_d2") <= d * d)
        .groupBy(line_id, point_id)
        .agg(F.min("_d2").alias("min_d2"))
    )
