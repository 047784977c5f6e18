"""S4 sink: write_gpkg_layer emits a spec-valid GeoPackage that our
own reader AND the layout checks of the reference's real extents.gpkg
both accept; sink→scan round-trips geometry, attrs and bbox."""

from __future__ import annotations

import sqlite3

import numpy as np
import pytest
from pyspark.sql import functions as F

from hope_graph_builder_spark.sources.gpkg import (
    list_layers,
    parse_gpkg_geometry,
    read_gpkg_layer,
)
from hope_graph_builder_spark.sources.gpkg_sink import (
    GPKG_APPLICATION_ID,
    write_gpkg_layer,
)
from hope_graph_builder_spark.spatial import wkb


def _fixture_df(spark):
    donut = wkb.polygon_to_wkb_rings([
        np.array([[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 100.0]]),
        np.array([[40.0, 40.0], [60.0, 40.0], [60.0, 60.0], [40.0, 60.0]]),
    ])
    multi = wkb.multipolygon_to_wkb([
        [np.array([[200.0, 0.0], [300.0, 0.0], [300.0, 50.0], [200.0, 50.0]])],
        [np.array([[400.0, 0.0], [450.0, 0.0], [450.0, 50.0], [400.0, 50.0]])],
    ])
    return spark.createDataFrame(
        [("donut", 2.5, bytearray(donut), 0.0, 0.0, 100.0, 100.0),
         ("multi", 12.0, bytearray(multi), 200.0, 0.0, 450.0, 50.0)],
        "name string, height double, geom binary, "
        "minx double, miny double, maxx double, maxy double",
    )


def test_sink_scan_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out.gpkg")
    n = write_gpkg_layer(_fixture_df(spark), path, "veg", srs_id=0)
    assert n == 2
    assert list_layers(path) == ["veg"]
    back = read_gpkg_layer(spark, path, "veg")
    rows = {r["name"]: r for r in back.collect()}
    assert rows["donut"]["height"] == 2.5
    parts = wkb.multipolygon_from_wkb(bytes(rows["donut"]["geom"]))
    assert len(parts) == 1 and len(parts[0]) == 2  # outer + hole survived
    assert rows["multi"]["maxx"] == 450.0
    mparts = wkb.multipolygon_from_wkb(bytes(rows["multi"]["geom"]))
    assert len(mparts) == 2


def test_sink_matches_spec_and_reference_layout(spark, tmp_path):
    """The emitted file must satisfy the same layout invariants the
    reference's real extents.gpkg satisfies: GPKG application id, the
    three metadata tables, a contents row with data_type='features',
    a geometry_columns row, GP-header blobs whose envelope matches the
    decoded rings."""
    path = str(tmp_path / "spec.gpkg")
    write_gpkg_layer(_fixture_df(spark), path, "veg", srs_id=0)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == GPKG_APPLICATION_ID
    tables = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"gpkg_spatial_ref_sys", "gpkg_contents",
            "gpkg_geometry_columns", "veg"} <= tables
    assert {r[0] for r in con.execute(
        "SELECT srs_id FROM gpkg_spatial_ref_sys")} >= {-1, 0, 4326}
    row = con.execute(
        "SELECT data_type, min_x, max_y, srs_id FROM gpkg_contents"
        " WHERE table_name='veg'").fetchone()
    assert row == ("features", 0.0, 100.0, 0)
    gc = con.execute(
        "SELECT column_name, geometry_type_name, z, m FROM"
        " gpkg_geometry_columns WHERE table_name='veg'").fetchone()
    assert gc == ("geom", "GEOMETRY", 0, 0)
    blob = bytes(con.execute("SELECT geom FROM veg WHERE name='donut'").fetchone()[0])
    assert blob[:2] == b"GP"
    payload = parse_gpkg_geometry(blob)
    rings, _ = wkb.polygon_rings_from_wkb(payload)
    assert rings[0][:, 0].max() == 100.0
    con.close()


REF_GPKG = "/root/reference/src/test/data/extents.gpkg"


@pytest.mark.skipif(
    __import__("os").path.exists(REF_GPKG) is False,
    reason="reference fixture not present",
)
def test_rewrite_reference_fixture_roundtrip(spark, tmp_path):
    """Read the reference's REAL extents.gpkg, re-write every layer
    through our sink, read it back — geometry bytes and attrs must
    survive both directions."""
    out = str(tmp_path / "rewrite.gpkg")
    for layer in list_layers(REF_GPKG):
        df = read_gpkg_layer(spark, REF_GPKG, layer)
        n = write_gpkg_layer(df, out, layer, srs_id=0)
        assert n == df.count()
        back = read_gpkg_layer(spark, out, layer)
        a = df.select(F.md5("geom").alias("h")).orderBy("h").collect()
        b = back.select(F.md5("geom").alias("h")).orderBy("h").collect()
        assert a == b
    assert sorted(list_layers(out)) == sorted(list_layers(REF_GPKG))


def test_gpkg_sink_scale_guard_trips(spark, tmp_path):
    """write_gpkg_layer refuses DataFrames beyond max_driver_rows: a
    GeoPackage is a single-writer sqlite funnel, so the guard routes
    bulk exports to the distributed parquet sink instead of silently
    streaming millions of rows through one process."""
    import pytest as _pytest

    from pyspark.sql import functions as F
    from hope_graph_builder_spark.sources.gpkg_sink import write_gpkg_layer

    df = spark.range(10).select(
        F.col("id").alias("a"),
        F.encode(F.lit("\x01\x01\x00\x00\x00"), "UTF-8").alias("geom"),
    )
    with _pytest.raises(ValueError, match="max_driver_rows"):
        write_gpkg_layer(df, str(tmp_path / "g.gpkg"), "layer", max_driver_rows=5)
