"""OTP CSV → clean graph: the reference's REAL import chain over its
own fixture format (S1 scan + §3.2 steps 4, 7-11 of
`/root/reference/src/otp_graph_import/otp_graph_import.py:16-232`),
golden-tested against the reference's published expectations
(3702 edges / 1328 nodes / mean projected length 31.65,
`otp_graph_import_test.py:59-60,119`).

Spark-first re-expression:
- `;`-separated CSV with WKT geometry → `spark.read.csv` + an
  Arrow-batched WKT parse + EPSG:3879 projection (pure map stage —
  no shuffle; at 100 TB this is embarrassingly parallel)
- attribute filters stay native Column predicates
- igraph's in-memory `decompose(mode='STRONG')` + per-subgraph edge
  counts (otp_graph_import.py:161-199) becomes the iterative
  distributed SCC (`operators/graph.strongly_connected_components`)
  plus one aggregate: igraph's decompose assigns an edge to a subgraph
  only when BOTH endpoints share the SCC, so the deletion set is
  exactly {intra-SCC edges of SCCs with ≤ max_edges intra edges};
  cross-SCC edges survive (matching igraph, asserted by the golden
  counts).
- step 8 (delete edges outside buffered HMA) is geometry-dependent;
  the golden test proves it is a no-op on this fixture (every vertex
  inside the HMA ring) — callers with real out-of-area data compose
  `filter_aoi`/`ring_boundary_intersects_rect` before this pipeline.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hope_graph_builder_spark.operators.graph import (
    remove_isolated_nodes,
    strongly_connected_components,
)
from hope_graph_builder_spark.spatial.crs import lonlat_to_gk_np
from hope_graph_builder_spark.spatial.kernels import polyline_length
from hope_graph_builder_spark.spatial.wkt import parse_linestring_np


def read_otp_edges(spark: SparkSession, path: str) -> DataFrame:
    """S1 edge scan: `;`-sep CSV, WKT LINESTRING geometry in EPSG:4326
    (otp_graph_import.py:45-56). Parses + projects to EPSG:3879 and
    computes the projected length rounded to 4 dp half-even — the
    reference's `round(geom.length, 4)` (otp_graph_import.py:103)."""
    raw = spark.read.options(sep=";", header=True, inferSchema=True).csv(path)
    cols = [
        "id_otp", "node_orig_id", "node_dest_id",
        "allows_walking", "allows_biking", "is_no_thru_traffic",
        "geometry",
    ]
    src = raw.select(*cols)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs, ys, lens = [], [], []
            for w in pdf["geometry"]:
                coords = parse_linestring_np(w) if isinstance(w, str) else np.zeros((0, 2))
                if len(coords):
                    px, py = lonlat_to_gk_np(coords[:, 0], coords[:, 1])
                    proj = np.column_stack([px, py])
                else:
                    proj = coords
                xs.append(proj[:, 0].tolist())
                ys.append(proj[:, 1].tolist())
                # empty geometry → length 0.0 (reference fallback,
                # otp_graph_import.py:103 `if isinstance(... ) else 0.0`)
                lens.append(round(polyline_length(proj), 4) if len(proj) >= 2 else 0.0)
            out = pdf.drop(columns=["geometry"]).copy()
            out["xs"] = xs
            out["ys"] = ys
            out["length"] = pd.Series(lens, dtype="float64")
            yield out

    schema = (
        "id_otp long, node_orig_id long, node_dest_id long, "
        "allows_walking boolean, allows_biking boolean, "
        "is_no_thru_traffic boolean, "
        "xs array<double>, ys array<double>, length double"
    )
    return src.mapInPandas(op, schema=schema)


def read_otp_nodes(spark: SparkSession, path: str) -> DataFrame:
    """S1 node scan (otp_graph_import.py:32-42); geometry kept as raw
    WKT — node coordinates are not needed for the graph-cleanup golden."""
    return spark.read.options(sep=";", header=True, inferSchema=True).csv(path)


def filter_otp_traversable(edges: DataFrame) -> DataFrame:
    """Step 4 (otp_graph_import.py:75-76): walking-or-biking, then
    not-no-thru-traffic."""
    return edges.filter(
        (F.col("allows_walking") | F.col("allows_biking"))
        & ~F.col("is_no_thru_traffic")
    )


def drop_small_scc_edges(
    edges: DataFrame,
    scc: DataFrame,
    max_edges: int = 15,
    src: str = "node_orig_id",
    dst: str = "node_dest_id",
) -> DataFrame:
    """Steps 9-10 (otp_graph_import.py:143-199): delete every edge that
    is INTERNAL to a strongly connected component with ≤ ``max_edges``
    internal edges. Cross-SCC edges belong to no decomposed subgraph in
    igraph and are kept.

    Scale shape: two equi-joins to attach component labels (scc is a
    node→component table — shuffle join at scale, broadcastable when
    small) + one map-side-combined count; the ≤max_edges component list
    is tiny by construction → broadcast."""
    cs = scc.select(F.col("id").alias(src), F.col("component").alias("_cs"))
    cd = scc.select(F.col("id").alias(dst), F.col("component").alias("_cd"))
    lab = edges.join(cs, src).join(cd, dst)
    small = (
        lab.filter(F.col("_cs") == F.col("_cd"))
        .groupBy("_cs")
        .count()
        .filter(F.col("count") <= max_edges)
        .select("_cs", F.lit(True).alias("_small"))
    )
    return (
        lab.join(F.broadcast(small), "_cs", "left")
        .filter((F.col("_cs") != F.col("_cd")) | F.col("_small").isNull())
        .drop("_cs", "_cd", "_small")
    )


def with_wgs_polyline(edges: DataFrame) -> DataFrame:
    """geom_wgs parity (reference keeps BOTH `geometry` (projected) and
    `geom_wgs` per edge — `common/geometry.py:6-18`,
    `otp_graph_import.py:41,54` — and the 4326 exchange path exports
    the wgs side): inverse-project the projected xs/ys polylines back
    to lon/lat arrays and attach the wgs-side geometry length the
    reference's wgs golden is defined on
    (`otp_graph_import_test.py:109-111`). Arrow-batched mapInPandas,
    same shape as the forward pass in read_otp_edges."""
    from hope_graph_builder_spark.spatial.crs import gk_to_lonlat_np

    names = [f.name for f in edges.schema.fields]
    types = {f.name: f.dataType.simpleString() for f in edges.schema.fields}

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lons, lats, wlens = [], [], []
            for xs, ys in zip(pdf["xs"], pdf["ys"]):
                p = np.column_stack([np.asarray(xs), np.asarray(ys)])
                if len(p):
                    lon, lat = gk_to_lonlat_np(p[:, 0], p[:, 1])
                    ll = np.column_stack([lon, lat])
                else:
                    ll = p
                lons.append(ll[:, 0].tolist())
                lats.append(ll[:, 1].tolist())
                wlens.append(polyline_length(ll) if len(ll) >= 2 else 0.0)
            out = pdf.copy()
            out["lons"] = lons
            out["lats"] = lats
            out["length_wgs"] = pd.Series(wlens, dtype="float64")
            yield out

    schema = (
        ", ".join(f"{n} {types[n]}" for n in names)
        + ", lons array<double>, lats array<double>, length_wgs double"
    )
    return edges.mapInPandas(op, schema=schema)


def run_otp_import_csv(
    spark: SparkSession,
    edges_csv: str,
    nodes_csv: str,
    small_scc_max_edges: int = 15,
    max_iter: int = 300,
) -> tuple[DataFrame, DataFrame]:
    """The full fixture chain → (clean_nodes, clean_edges). Matches the
    reference's golden counts on its own test data (see module doc)."""
    e = filter_otp_traversable(read_otp_edges(spark, edges_csv))
    e = e.localCheckpoint()  # parsed once; feeds SCC + label joins
    scc = strongly_connected_components(
        e, src="node_orig_id", dst="node_dest_id", max_iter=max_iter
    )
    kept = drop_small_scc_edges(e, scc, max_edges=small_scc_max_edges)
    nodes = read_otp_nodes(spark, nodes_csv).select("id_otp")
    alive = remove_isolated_nodes(
        nodes, kept, id_col="id_otp", src="node_orig_id", dst="node_dest_id"
    )
    return alive, kept
