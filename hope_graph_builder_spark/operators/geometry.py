"""General-geometry operators: P4 boundary-intersects filter and F9
multi-part explode (reference
`/root/reference/src/noise_data_preprocessing/noise_data_preprocessing.py:26-47`,
`get_nodata_areas.py:31-34`).

The boundary test is entirely native Column arithmetic (a Liang-Barsky
slab test per ring segment under ``exists``, whole-stage codegen); the
multi-part explode decodes OGC WKB in Arrow-batched ``mapInPandas``
(binary parsing is the one thing Columns can't express) and emits the
per-part scalars every downstream rect/bbox operator consumes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hope_graph_builder_spark.spatial import wkb as wkbmod

_BIG = 1e300  # stand-in for ±inf (engine-portable, no literal parsing)


def _axis_t(p0: Column, d: Column, lo: float, hi: float) -> tuple[Column, Column]:
    """Entry/exit parameter range of one slab; degenerate axis (d == 0)
    collapses to (-BIG, BIG) inside the slab and an empty range outside."""
    inside = (p0 >= lo) & (p0 <= hi)
    t_a = (F.lit(lo) - p0) / d
    t_b = (F.lit(hi) - p0) / d
    return (
        F.when(d != 0.0, F.least(t_a, t_b)).otherwise(
            F.when(inside, F.lit(-_BIG)).otherwise(F.lit(_BIG))
        ),
        F.when(d != 0.0, F.greatest(t_a, t_b)).otherwise(
            F.when(inside, F.lit(_BIG)).otherwise(F.lit(-_BIG))
        ),
    )


def segment_intersects_rect(
    x0: Column, y0: Column, x1: Column, y1: Column,
    rect: tuple[float, float, float, float],
) -> Column:
    """True iff the closed segment (x0,y0)-(x1,y1) touches the closed
    axis-aligned rect — Liang-Barsky slab test, pure codegen arithmetic."""
    rx0, ry0, rx1, ry1 = rect
    dx, dy = x1 - x0, y1 - y0
    tx_lo, tx_hi = _axis_t(x0, dx, rx0, rx1)
    ty_lo, ty_hi = _axis_t(y0, dy, ry0, ry1)
    enter = F.greatest(tx_lo, ty_lo, F.lit(0.0))
    leave = F.least(tx_hi, ty_hi, F.lit(1.0))
    return enter <= leave


def ring_boundary_intersects_rect(
    xs: Column, ys: Column, rect: tuple[float, float, float, float]
) -> Column:
    """P4 (noise_data_preprocessing.py:43-47): does the polygon RING
    (boundary) touch the rect? ``exists`` over the ring's segments —
    note this is boundary ∩ rect, NOT polygon ∩ rect: a polygon whose
    interior swallows the rect whole is correctly False.
    Degenerate rings (<2 points) have no segments → False (guarded so
    the descending F.sequence(1, 0) never reaches element_at)."""
    idx = F.sequence(F.lit(1), F.size(xs) - 1)
    hit = F.exists(
        idx,
        lambda i: segment_intersects_rect(
            F.element_at(xs, i.cast("int")),
            F.element_at(ys, i.cast("int")),
            F.element_at(xs, (i + 1).cast("int")),
            F.element_at(ys, (i + 1).cast("int")),
            rect,
        ),
    )
    return F.when(F.size(xs) >= 2, hit).otherwise(F.lit(False))


def shoelace_terms_expr(xs: Column, ys: Column) -> Column:
    """Cross-product terms x_i·y_{i+1} − x_{i+1}·y_i over the CLOSED
    ring (wrap via i % n + 1) — the shared building block of the
    native area/centroid expressions below."""
    n = F.size(xs)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (
            F.element_at(xs, i.cast("int"))
            * F.element_at(ys, (F.pmod(i, n) + 1).cast("int"))
            - F.element_at(xs, (F.pmod(i, n) + 1).cast("int"))
            * F.element_at(ys, i.cast("int"))
        ),
    )


def polygon_area_expr(xs: Column, ys: Column) -> Column:
    """Shoelace area of a ring held as coordinate ARRAY columns —
    entirely native (sequence/transform/aggregate fold), so ring area
    stays inside whole-stage codegen with zero UDF or WKB decode. The
    fold is sequential, matching DuckDB list_reduce for oracle-exact
    floats."""
    s = F.aggregate(
        shoelace_terms_expr(xs, ys), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.abs(s) / F.lit(2.0)


def polygon_centroid_expr(xs: Column, ys: Column) -> tuple[Column, Column]:
    """Ring centroid (Cx, Cy) = Σ(p_i+p_{i+1})·cross_i / (6·A_signed),
    native folds; NULL for degenerate (near-zero-area) rings — the
    guard runs on the identical float both engines compute."""
    t = shoelace_terms_expr(xs, ys)
    n = F.size(xs)
    a_signed = F.aggregate(t, F.lit(0.0), lambda acc, x: acc + x) / F.lit(2.0)
    idx = F.sequence(F.lit(1), n)

    def fold_weighted(coord: Column) -> Column:
        return F.aggregate(
            F.transform(
                idx,
                lambda i: (
                    F.element_at(coord, i.cast("int"))
                    + F.element_at(coord, (F.pmod(i, n) + 1).cast("int"))
                ) * F.element_at(t, i.cast("int")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    ok = F.abs(a_signed) > 1e-9
    cx = F.when(ok, fold_weighted(xs) / (F.lit(6.0) * a_signed))
    cy = F.when(ok, fold_weighted(ys) / (F.lit(6.0) * a_signed))
    return cx, cy


def edges_within_rings(
    edges: DataFrame, rings: list[np.ndarray], id_col: str = "edge_id"
) -> DataFrame:
    """J3 for GENERAL extent polygons: (edge_id, x1..y2) →
    (edge_id, in_extent) where in_extent = segment geometry WITHIN the
    even-odd region of ``rings`` (concave + holes supported — the
    reference's municipal extent is a real concave polygon,
    `noise_graph_update.py:36-44`). Arrow-batched kernel
    (``segments_within_rings``), no shuffle; the extent rings ride in
    the closure (small, broadcast with the task)."""
    from hope_graph_builder_spark.spatial.kernels import segments_within_rings

    rings2 = [np.asarray(r, dtype=np.float64) for r in rings]
    icol = id_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok = segments_within_rings(
                pdf["x1"].to_numpy(np.float64), pdf["y1"].to_numpy(np.float64),
                pdf["x2"].to_numpy(np.float64), pdf["y2"].to_numpy(np.float64),
                rings2,
            )
            yield pd.DataFrame({icol: pdf[icol], "in_extent": ok})

    return edges.select(icol, "x1", "y1", "x2", "y2").mapInPandas(
        op, schema=f"{icol} long, in_extent boolean"
    )


# ------------------------------------------------------------- F9 explode --

_PART_SCHEMA = (
    "doc_id long, part_i int, n_rings int, "
    "minx double, miny double, maxx double, maxy double"
)


def explode_multipolygon(df: DataFrame, wkb_col: str = "geom",
                         id_col: str = "doc_id") -> DataFrame:
    """F9 multi→single explode: one row per polygon part with its ring
    count and outer-ring bbox. Arrow-batched mapInPandas, no shuffle —
    partitioning is inherited, so at 100 TB this is a pure map stage."""
    gcol, icol = wkb_col, id_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pi, nr, x0, y0, x1, y1 = [], [], [], [], [], [], []
            for did, buf in zip(pdf[icol], pdf[gcol]):
                for k, rings in enumerate(wkbmod.multipolygon_from_wkb(bytes(buf))):
                    outer = rings[0]
                    ids.append(did)
                    pi.append(k)
                    nr.append(len(rings))
                    x0.append(outer[:, 0].min())
                    y0.append(outer[:, 1].min())
                    x1.append(outer[:, 0].max())
                    y1.append(outer[:, 1].max())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "part_i": pd.Series(pi, dtype="int32"),
                    "n_rings": pd.Series(nr, dtype="int32"),
                    "minx": pd.Series(x0, dtype="float64"),
                    "miny": pd.Series(y0, dtype="float64"),
                    "maxx": pd.Series(x1, dtype="float64"),
                    "maxy": pd.Series(y1, dtype="float64"),
                }
            )

    return df.select(icol, gcol).mapInPandas(op, schema=_PART_SCHEMA)


def polylines_from_wkb(df: DataFrame, wkb_col: str = "geom",
                       id_col: str = "edge_id") -> DataFrame:
    """WKB LineString column → (id, xs array<double>, ys array<double>)
    — the ingest shim that lets WKB-borne street geometry feed
    ``sample_polyline`` (reference edges arrive as geometry columns,
    utils.py:23-30). Arrow-batched mapInPandas; no shuffle."""
    gcol, icol = wkb_col, id_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs, ys = [], []
            for buf in pdf[gcol]:
                coords = wkbmod.linestring_from_wkb(bytes(buf))
                xs.append(coords[:, 0].tolist())
                ys.append(coords[:, 1].tolist())
            yield pd.DataFrame({icol: pdf[icol], "xs": xs, "ys": ys})

    return df.select(icol, gcol).mapInPandas(
        op, schema=f"{icol} long, xs array<double>, ys array<double>"
    )


def polylines_to_wkb(df: DataFrame, id_col: str = "edge_id") -> DataFrame:
    """(id, xs, ys) → WKB LineString binary (the sink-side twin)."""
    icol = id_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            geoms = [
                wkbmod.linestring_to_wkb(np.column_stack([np.asarray(x), np.asarray(y)]))
                for x, y in zip(pdf["xs"], pdf["ys"])
            ]
            yield pd.DataFrame({icol: pdf[icol], "geom": geoms})

    return df.select(icol, "xs", "ys").mapInPandas(op, schema=f"{icol} long, geom binary")


def synth_multipolygons(points: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic multipolygon WKB fixture: (id, x, y) → 1-3 rect
    parts, every (id + k) % 4 == 0 part carrying one hole ring. The
    coordinate arithmetic runs in numpy float64 with the same operation
    order as the DuckDB oracle twin (synth-rule parity, not a WKB
    reference import)."""
    icol = id_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            geoms = []
            for did, x, y in zip(pdf[icol], pdf["x"], pdf["y"]):
                nparts = 1 + did % 3
                parts = []
                for k in range(nparts):
                    minx = x + k * 37.0
                    miny = y + k * 23.0
                    w = float(10 + (did * 7 + k * 13) % 50)
                    h = float(8 + (did * 11 + k * 17) % 40)
                    outer = np.array(
                        [[minx, miny], [minx + w, miny],
                         [minx + w, miny + h], [minx, miny + h], [minx, miny]]
                    )
                    rings = [outer]
                    if (did + k) % 4 == 0:
                        hw = float(1 + (did + k) % 3)
                        hh = float(1 + (did + k) % 2)
                        hole = np.array(
                            [[minx + 2.0, miny + 2.0], [minx + 2.0 + hw, miny + 2.0],
                             [minx + 2.0 + hw, miny + 2.0 + hh],
                             [minx + 2.0, miny + 2.0 + hh], [minx + 2.0, miny + 2.0]]
                        )
                        rings.append(hole)
                    parts.append(rings)
                geoms.append(wkbmod.multipolygon_to_wkb(parts))
            yield pd.DataFrame({"doc_id": pdf[icol], "geom": geoms})

    return points.select(icol, "x", "y").mapInPandas(op, schema="doc_id long, geom binary")
