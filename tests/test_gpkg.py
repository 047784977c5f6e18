"""S4 GeoPackage scan over the reference's real extents.gpkg: decode
consistency (file envelope == bbox recomputed from decoded rings),
layer inventory, and the nodata layer feeding a real PIP join."""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

GPKG = "/root/reference/src/test/data/extents.gpkg"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(GPKG), reason="reference fixture not present"
)


def test_layer_inventory():
    from hope_graph_builder_spark.sources.gpkg import list_layers

    assert set(list_layers(GPKG)) == {
        "hma_municipalities", "municipal_boundaries", "municipality_boundaries"
    }


def test_envelope_matches_decoded_rings(spark):
    """The file's stored envelope must equal the bbox recomputed from
    OUR ring decode — ties the GPKG header parse and the WKB decoder
    together against real QGIS-written data."""
    from hope_graph_builder_spark.sources.gpkg import read_gpkg_layer

    df = read_gpkg_layer(spark, GPKG, "hma_municipalities")
    assert df.count() == 15
    got = {r["id"]: r for r in df.collect()}

    con = sqlite3.connect(f"file:{GPKG}?mode=ro", uri=True)
    for ident, blob in con.execute("SELECT id, geom FROM hma_municipalities"):
        flags = blob[3]
        assert (flags >> 1) & 0x7 == 1  # [minx, maxx, miny, maxy]
        minx, maxx, miny, maxy = struct.unpack_from("<4d", blob, 8)
        r = got[ident]
        for a, b in [(minx, r["minx"]), (maxx, r["maxx"]),
                     (miny, r["miny"]), (maxy, r["maxy"])]:
            assert abs(a - b) < 1e-6
    con.close()


def test_nodata_layer_drives_real_pip(spark):
    """municipal_boundaries (the reference noise join's nodata layer,
    noise_graph_join_test.py:90) through pip_join_wkb: points at ring
    vertices' centroids of the polygon must match; points far outside
    the envelope must not."""
    from hope_graph_builder_spark.sources.gpkg import read_gpkg_layer
    from hope_graph_builder_spark.operators.spatial_join import pip_join_wkb
    from hope_graph_builder_spark.spatial import wkb as wkbmod

    nod = read_gpkg_layer(spark, GPKG, "municipal_boundaries")
    row = nod.collect()[0]
    assert row["nodata_zone"] == 1
    parts = wkbmod.multipolygon_from_wkb(bytes(row["geom"]))
    assert len(parts) >= 1

    # probe points: each part's outer-ring vertex mean (inside for
    # convex-ish parts — validated against our own even-odd kernel),
    # plus 2 points far outside the envelope
    from hope_graph_builder_spark.spatial.kernels import points_in_rings

    probes = []
    for i, p in enumerate(parts[:50]):
        c = p[0][:-1].mean(axis=0)
        probes.append((i, float(c[0]), float(c[1])))
    rings = [r for p in parts for r in p]
    px = np.array([p[1] for p in probes])
    py = np.array([p[2] for p in probes])
    expected_in = points_in_rings(px, py, rings)
    probes.append((900, row["minx"] - 1e4, row["miny"] - 1e4))
    probes.append((901, row["maxx"] + 1e4, row["maxy"] + 1e4))

    pts = spark.createDataFrame(probes, "doc_id long, x double, y double")
    polys = nod.select(F.lit(0).alias("poly_id"), "geom",
                       "minx", "miny", "maxx", "maxy")
    matched = {
        r["doc_id"]
        for r in pip_join_wkb(pts, polys, res=6).select("doc_id").collect()
    }
    assert 900 not in matched and 901 not in matched
    for (i, _, _), exp in zip(probes[:-2], expected_in):
        assert (i in matched) == bool(exp)
    assert any(expected_in)  # the probe set genuinely exercises matches


def test_cover_size_valve_routes_metro_polygon(spark):
    """The municipal boundary at street-scale res would cover millions
    of cells; split_by_cover_size must route it to the oversized side
    at res 12 and keep it at the coarse res the PIP test uses."""
    from hope_graph_builder_spark.operators.spatial_join import split_by_cover_size
    from hope_graph_builder_spark.sources.gpkg import read_gpkg_layer

    nod = read_gpkg_layer(spark, GPKG, "municipal_boundaries")
    ok12, over12 = split_by_cover_size(nod, res=12)
    assert ok12.count() == 0 and over12.count() == 1
    ok6, over6 = split_by_cover_size(nod, res=6)
    assert ok6.count() == 1 and over6.count() == 0


def test_reference_gpkg_drives_general_overlay(spark):
    """Source→operator composition on REAL reference data: the
    extents.gpkg nodata multipolygon (concave, multipart) feeds
    overlay_share_general; shares must be in (0, 1] and edges fully
    inside one part must score exactly 1."""
    import numpy as np
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.pipelines.overlay import overlay_share_general
    from hope_graph_builder_spark.sources.gpkg import list_layers, read_gpkg_layer
    from hope_graph_builder_spark.spatial import wkb as wkbmod

    layer = list_layers(GPKG)[0]
    polys = read_gpkg_layer(spark, GPKG, layer)
    row = polys.collect()[0]
    parts = wkbmod.multipolygon_from_wkb(bytes(row["geom"]))
    # centroid-ish interior point of the biggest part's outer ring
    biggest = max(parts, key=lambda rs: len(rs[0]))
    cx, cy = biggest[0][:, 0].mean(), biggest[0][:, 1].mean()
    p = polys.select(
        F.lit(0).cast("long").alias("poly_id"),
        F.lit("nodata").alias("veg_class"),
        "geom", "minx", "miny", "maxx", "maxy",
    )
    edges = spark.createDataFrame(
        [(1, float(cx), float(cy), float(cx), float(cy))],
        "edge_id long, x1 double, y1 double, x2 double, y2 double",
    )
    out = overlay_share_general(edges, p, res=6, dist=5.0).collect()
    from hope_graph_builder_spark.spatial.kernels import points_in_rings

    rings = [r for part in parts for r in part]
    inside = bool(points_in_rings(np.array([cx]), np.array([cy]), rings)[0])
    if inside:
        assert len(out) == 1 and 0.0 < out[0]["share"] <= 1.0 + 1e-9
    else:
        # centroid of a concave part can fall outside — the share is
        # then partial or the pair vanishes; both are consistent
        assert all(0.0 < r["share"] <= 1.0 + 1e-9 for r in out)
