"""Square-grid cell index (H3/S2 stand-in) as native Spark expressions.

Re-expresses the reference's R-tree spatial indexing
(`/root/reference/src/noise_graph_join/utils.py:148` via gpd.sjoin,
PostGIS GIST at `land_cover_overlay_analysis.py:80-81`) as a
cell-equi-join prefilter that Catalyst plans like any hash join.

Layout of a cell id (int64):
    bits 56..62 : resolution (0..63)
    bits 28..55 : ix (floor(x / size)), 28 bits
    bits  0..27 : iy (floor(y / size)), 28 bits

Coordinates are metric, in [0, EXTENT_M). EXTENT_M = 2^17 m = 131.072 km,
so at res r the cell side is 2^(17-r) meters; res 7 → 1024 m cells,
res 10 → 128 m cells, res 12 → 32 m.

All functions here come in two flavors:
  *_expr  — pyspark Column expressions (JVM-side, codegen'd)
  *_np    — identical numpy math for pandas-UDF internals and tests
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EXTENT_M = 131072.0  # 2^17 meters
_IX_SHIFT = 28
_RES_SHIFT = 56
_MASK28 = (1 << 28) - 1


def cell_size(res: int) -> float:
    """Cell side length in meters at resolution ``res``."""
    return EXTENT_M / float(1 << res)


def suggest_res(typical_extent_m: float) -> int:
    """Resolution whose cell size ≈ the typical geometry extent, so a
    polygon covers ~1-4 cells (cover rows stay linear in polygon count)
    while per-cell candidate lists stay small. Clamped to [0, 20]."""
    import math

    if typical_extent_m <= 0:
        return 12
    res = round(math.log2(EXTENT_M / typical_extent_m))
    return max(0, min(20, int(res)))


def cell_ixy_expr(x: Column, y: Column, res: int) -> tuple[Column, Column]:
    size = cell_size(res)
    ix = F.floor(x / F.lit(size)).cast("long")
    iy = F.floor(y / F.lit(size)).cast("long")
    return ix, iy


def _pack_expr(ix: Column, iy: Column, res: int) -> Column:
    return (
        F.lit(res << _RES_SHIFT).cast("long")
        + F.shiftleft(ix, _IX_SHIFT)
        + iy
    )


def cell_id_expr(x: Column, y: Column, res: int) -> Column:
    """Cell id of the point (x, y) at ``res`` — pure Column arithmetic."""
    ix, iy = cell_ixy_expr(x, y, res)
    return _pack_expr(ix, iy, res)


def cover_bbox_expr(
    minx: Column, miny: Column, maxx: Column, maxy: Column, res: int
) -> Column:
    """array<long> of every cell id intersecting the bbox — native
    ``sequence`` + ``transform`` + ``flatten`` (no UDF, no shuffle).

    Replaces GeoPandas' per-call R-tree build (reference
    `utils.py:143-163`): the polygon side of a spatial join gets
    exploded over this cover, then joined to the point side's
    ``cell_id_expr`` on a long key.
    """
    size = F.lit(cell_size(res))
    ix0 = F.floor(minx / size).cast("long")
    ix1 = F.floor(maxx / size).cast("long")
    iy0 = F.floor(miny / size).cast("long")
    iy1 = F.floor(maxy / size).cast("long")
    base = F.lit(res << _RES_SHIFT).cast("long")
    return F.flatten(
        F.transform(
            F.sequence(ix0, ix1),
            lambda ix: F.transform(
                F.sequence(iy0, iy1),
                lambda iy: base + F.shiftleft(ix, _IX_SHIFT) + iy,
            ),
        )
    )


# ---------------------------------------------------------------- numpy ---


def cells_of_points_np(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    size = cell_size(res)
    ix = np.floor(x / size).astype(np.int64)
    iy = np.floor(y / size).astype(np.int64)
    return (np.int64(res) << _RES_SHIFT) + (ix << _IX_SHIFT) + iy


def cover_bbox_np(
    minx: float, miny: float, maxx: float, maxy: float, res: int
) -> np.ndarray:
    size = cell_size(res)
    ix = np.arange(int(np.floor(minx / size)), int(np.floor(maxx / size)) + 1)
    iy = np.arange(int(np.floor(miny / size)), int(np.floor(maxy / size)) + 1)
    gx, gy = np.meshgrid(ix.astype(np.int64), iy.astype(np.int64), indexing="ij")
    return ((np.int64(res) << _RES_SHIFT) + (gx << _IX_SHIFT) + gy).ravel()


def unpack_cell_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    res = cell >> _RES_SHIFT
    ix = (cell >> _IX_SHIFT) & _MASK28
    iy = cell & _MASK28
    return res, ix, iy
