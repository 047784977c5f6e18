"""S9 WFS scan: request-shape parity with the reference, GeoJSON →
WKB/bbox decode (incl. holes + multiparts), and the per-layer cache
short-circuit — all through an injected transport (no network)."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F


def _canned_fc() -> str:
    donut = {
        "type": "Feature",
        "properties": {"veg_class": "low", "h": 2},
        "geometry": {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]],
                [[40, 40], [60, 40], [60, 60], [40, 60], [40, 40]],
            ],
        },
    }
    multi = {
        "type": "Feature",
        "properties": {"veg_class": "high", "h": 12},
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [
                [[[200, 0], [300, 0], [300, 50], [200, 50], [200, 0]]],
                [[[400, 0], [450, 0], [450, 50], [400, 50], [400, 0]]],
            ],
        },
    }
    return json.dumps({"type": "FeatureCollection", "features": [donut, multi]})


def test_request_url_matches_reference_params():
    from hope_graph_builder_spark.sources.wfs import wfs_getfeature_url

    u = wfs_getfeature_url("https://example.org/geoserver/wfs", "maanpeite_puusto_yli20m_2018")
    assert u == (
        "https://example.org/geoserver/wfs?service=WFS&version=1.0.0"
        "&request=GetFeature&typeName=maanpeite_puusto_yli20m_2018&outputFormat=json"
    )


def test_geojson_decode_and_pip(spark):
    from hope_graph_builder_spark.operators.spatial_join import pip_join_wkb
    from hope_graph_builder_spark.sources.wfs import read_wfs_layer

    calls = []

    def fetch(url):
        calls.append(url)
        return _canned_fc()

    df = read_wfs_layer(spark, "https://example.org/wfs", "veg", fetch=fetch)
    assert df.count() == 2
    assert len(calls) == 1
    rows = {r["veg_class"]: r for r in df.collect()}
    assert rows["low"]["minx"] == 0.0 and rows["low"]["maxx"] == 100.0
    assert rows["high"]["maxx"] == 450.0

    # hole + multipart semantics through the standard PIP path
    pts = spark.createDataFrame(
        [(0, 50.0, 50.0),   # inside the donut HOLE → no match
         (1, 10.0, 10.0),   # in the donut ring → low
         (2, 420.0, 25.0),  # in the second part of the multipolygon → high
         (3, 350.0, 25.0)], # between parts → no match
        "doc_id long, x double, y double",
    )
    polys = df.select(F.col("fid").alias("poly_id"), "veg_class",
                      "geom", "minx", "miny", "maxx", "maxy")
    got = {
        r["doc_id"]: r["veg_class"]
        for r in pip_join_wkb(pts, polys, res=9).select("doc_id", "veg_class").collect()
    }
    assert got == {1: "low", 2: "high"}


def test_3d_positions_sliced_to_2d(spark):
    """Many WFS servers emit XYZ positions; the WKB header we write
    declares 2D, so Z must be sliced off — not serialized as if the
    ring were 2D (which would corrupt every coordinate after the
    first)."""
    import json

    from hope_graph_builder_spark.sources.wfs import read_wfs_layer
    from hope_graph_builder_spark.spatial import wkb as wkbmod

    fc = json.dumps({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "properties": {"veg_class": "low"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[0, 0, 5.0], [100, 0, 5.0], [100, 100, 5.0], [0, 100, 5.0], [0, 0, 5.0]]
                ],
            },
        }],
    })
    df = read_wfs_layer(spark, "https://example.org/wfs", "veg3d", fetch=lambda u: fc)
    row = df.collect()[0]
    parts = wkbmod.multipolygon_from_wkb(bytes(row["geom"]))
    ring = parts[0][0]
    assert ring.shape == (5, 2)
    np.testing.assert_array_equal(
        ring, [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]]
    )
    assert row["maxx"] == 100.0 and row["maxy"] == 100.0


def test_layer_cache_short_circuits(spark, tmp_path):
    from hope_graph_builder_spark.sources.wfs import read_wfs_layer

    calls = []

    def fetch(url):
        calls.append(url)
        return _canned_fc()

    d = str(tmp_path)
    a = read_wfs_layer(spark, "https://example.org/wfs", "veg", fetch=fetch, cache_dir=d)
    b = read_wfs_layer(spark, "https://example.org/wfs", "veg", fetch=fetch, cache_dir=d)
    assert len(calls) == 1  # second read served from the parquet cache
    assert a.count() == b.count() == 2
