"""Graph-export pipeline — reference §3.3
(`/root/reference/src/graph_export/graph_export.py:28-87`): clip the
graph to an export extent (J5 semi-join), drop explicitly excluded
edges (P7/U3 anti-join), remove now-isolated nodes (G3), simplify the
edge geometry (F19, Douglas-Peucker) and attach the export scalar
columns (F15 biking length).

P5 (geometry-type filter, `graph_export/utils.py` type dispatch) is a
NATIVE expression here: the OGC WKB type code is the little-endian
uint32 at offset 1, and every type the engine emits is < 256, so one
byte → int comparison filters a billion-row geometry column without
leaving codegen.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hope_graph_builder_spark.functions.rowexprs import biking_length
from hope_graph_builder_spark.operators.graph import remove_isolated_nodes
from hope_graph_builder_spark.spatial.kernels import simplify_rdp


def wkb_type_expr(geom: Column) -> Column:
    """OGC geometry type code of a WKB binary column, natively and
    byte-order-aware: the type word's LOW byte sits at offset 1 for NDR
    (flag byte 0x01) and offset 4 for XDR (0x00) — all OGC 2D type
    codes are < 256, so one byte suffices. Stays in codegen."""
    flag = F.conv(F.hex(F.substring(geom, 1, 1)), 16, 10).cast("int")
    low = F.when(flag == 1, F.substring(geom, 2, 1)).otherwise(
        F.substring(geom, 5, 1)
    )
    return F.conv(F.hex(low), 16, 10).cast("int")


def filter_geometry_type(df: DataFrame, wkb_col: str, type_code: int) -> DataFrame:
    """P5: keep rows whose WKB geometry has the given OGC type code."""
    return df.filter(wkb_type_expr(F.col(wkb_col)) == type_code)


def simplify_polylines(df: DataFrame, tol: float, id_col: str = "edge_id") -> DataFrame:
    """F19 (graph_export/utils.py:105-106): Douglas-Peucker per edge
    over (xs, ys) coordinate arrays — Arrow-batched mapInPandas (the
    recursion is inherently per-geometry), no shuffle."""
    icol = id_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs, ys = [], []
            for x, y in zip(pdf["xs"], pdf["ys"]):
                coords = np.column_stack([np.asarray(x), np.asarray(y)])
                out = simplify_rdp(coords, tol)
                xs.append(out[:, 0].tolist())
                ys.append(out[:, 1].tolist())
            yield pd.DataFrame({icol: pdf[icol], "xs": xs, "ys": ys})

    return df.select(icol, "xs", "ys").mapInPandas(
        op, schema=f"{icol} long, xs array<double>, ys array<double>"
    )


def run_graph_export(
    edges: DataFrame,
    nodes: DataFrame,
    aoi: tuple[float, float, float, float],
    excluded_edges: DataFrame | None = None,
    simplify_tol: float | None = None,
    polylines: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """§3.3 composition → (export_edges, export_nodes).

    - J5 clip: keep edges whose BOTH endpoint nodes are inside the AOI
      (reference clips to the Helsinki extent, graph_export.py:74-80)
    - P7/U3: anti-join against an excluded-edge id set (:78-79)
    - G3: drop nodes no surviving edge touches (:82-87)
    - F15: biking_len export column (:28-32)
    - F19: optional geometry simplify when ``polylines`` (edge_id, xs,
      ys) is supplied
    """
    x0, y0, x1, y1 = aoi
    keep_nodes = nodes.filter(
        (F.col("x") >= x0) & (F.col("x") < x1) & (F.col("y") >= y0) & (F.col("y") < y1)
    ).select("id")
    kept = (
        edges.join(keep_nodes.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(keep_nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    if excluded_edges is not None:
        kept = kept.join(excluded_edges.select("edge_id"), "edge_id", "left_anti")
    kept = kept.withColumn(
        "biking_len", biking_length(F.col("length"), F.col("bike_safety_factor"))
    )
    export_nodes = remove_isolated_nodes(nodes, kept)
    if simplify_tol is not None and polylines is not None:
        simp = simplify_polylines(polylines, simplify_tol)
        kept = kept.join(simp, "edge_id", "left")
    return kept, export_nodes
