"""S12 Shapefile scan: the fixture is built byte-by-byte IN THE TEST
straight from the ESRI whitepaper's record layouts (an independent
construction of known-good vectors — the reader never sees its own
writer), then read through sources/shapefile and driven into the
standard PIP path."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F


def _shp_polygon_record(recno: int, rings: list[list[tuple[float, float]]]) -> bytes:
    pts = [p for r in rings for p in r]
    npoints = len(pts)
    nparts = len(rings)
    parts, acc = [], 0
    for r in rings:
        parts.append(acc)
        acc += len(r)
    xs = [p[0] for p in pts]; ys = [p[1] for p in pts]
    content = struct.pack("<i", 5)
    content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    content += struct.pack("<ii", nparts, npoints)
    content += struct.pack(f"<{nparts}i", *parts)
    for x, y in pts:
        content += struct.pack("<dd", x, y)
    return struct.pack(">ii", recno, len(content) // 2) + content


def _shp_file(records: list[bytes]) -> bytes:
    body = b"".join(records)
    total_words = (100 + len(body)) // 2
    head = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    head += struct.pack("<ii", 1000, 5)
    head += struct.pack("<8d", 0, 0, 500, 500, 0, 0, 0, 0)
    return head + body


def _shp_polyline_record(recno: int, parts_pts: list[list[tuple[float, float]]]) -> bytes:
    pts = [p for part in parts_pts for p in part]
    npoints = len(pts)
    nparts = len(parts_pts)
    starts, acc = [], 0
    for part in parts_pts:
        starts.append(acc)
        acc += len(part)
    xs = [p[0] for p in pts]; ys = [p[1] for p in pts]
    content = struct.pack("<i", 3)
    content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    content += struct.pack("<ii", nparts, npoints)
    content += struct.pack(f"<{nparts}i", *starts)
    for x, y in pts:
        content += struct.pack("<dd", x, y)
    return struct.pack(">ii", recno, len(content) // 2) + content


def _dbf_file(fields: list[tuple[str, str, int, int]], rows: list[list],
              deleted: set[int] = frozenset()) -> bytes:
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(f[2] for f in fields)
    head = struct.pack("<B3BiHH", 3, 24, 1, 1, len(rows), hdr_size, rec_size)
    head += b"\x00" * 20
    for name, ftype, flen, fdec in fields:
        head += name.encode().ljust(11, b"\x00") + ftype.encode()
        head += b"\x00" * 4 + bytes([flen, fdec]) + b"\x00" * 14
    head += b"\x0d"
    body = b""
    for i, row in enumerate(rows):
        body += b"*" if i in deleted else b" "
        for (name, ftype, flen, fdec), v in zip(fields, row):
            s = (f"{v:.{fdec}f}" if ftype == "N" and fdec else str(v))
            body += s.rjust(flen).encode()[:flen] if ftype == "N" else s.ljust(flen).encode()[:flen]
    return head + body + b"\x1a"


@pytest.fixture()
def shp_base(tmp_path):
    donut = [
        [(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)],
        [(40, 40), (60, 40), (60, 60), (40, 60), (40, 40)],
    ]
    plain = [[(200, 0), (300, 0), (300, 50), (200, 50), (200, 0)]]
    shp = _shp_file([
        _shp_polygon_record(1, donut),
        _shp_polygon_record(2, plain),
    ])
    dbf = _dbf_file(
        [("VEG_CLASS", "C", 8, 0), ("HEIGHT", "N", 6, 1)],
        [["low", 2.5], ["high", 12.0]],
    )
    base = str(tmp_path / "veg")
    open(base + ".shp", "wb").write(shp)
    open(base + ".dbf", "wb").write(dbf)
    return base


def test_read_shapefile_attrs_and_bbox(spark, shp_base):
    from hope_graph_builder_spark.sources.shapefile import read_shapefile

    df = read_shapefile(spark, shp_base)
    rows = {r["VEG_CLASS"]: r for r in df.collect()}
    assert set(rows) == {"low", "high"}
    assert rows["low"]["HEIGHT"] == 2.5 and rows["high"]["HEIGHT"] == 12.0
    assert rows["low"]["minx"] == 0.0 and rows["low"]["maxx"] == 100.0
    assert rows["high"]["minx"] == 200.0


def test_shapefile_polygon_rings_drive_pip(spark, shp_base):
    from hope_graph_builder_spark.operators.spatial_join import pip_join_wkb
    from hope_graph_builder_spark.sources.shapefile import read_shapefile

    df = read_shapefile(spark, shp_base)
    pts = spark.createDataFrame(
        [(0, 50.0, 50.0),   # donut hole → no match
         (1, 10.0, 10.0),   # donut ring → low
         (2, 250.0, 25.0)], # plain polygon → high
        "doc_id long, x double, y double",
    )
    polys = df.select(F.col("fid").alias("poly_id"), "VEG_CLASS",
                      "geom", "minx", "miny", "maxx", "maxy")
    got = {
        r["doc_id"]: r["VEG_CLASS"]
        for r in pip_join_wkb(pts, polys, res=9).select("doc_id", "VEG_CLASS").collect()
    }
    assert got == {1: "low", 2: "high"}


def test_deleted_dbf_record_keeps_attribute_alignment(spark, tmp_path):
    """A dBase record flagged deleted ('*') must not shift later
    attributes onto the wrong geometries: .shp has no deletion flag, so
    the reader keeps a placeholder and drops the (shape, attrs) pair."""
    from hope_graph_builder_spark.sources.shapefile import read_shapefile

    sq = lambda x0: [[(x0, 0), (x0 + 10, 0), (x0 + 10, 10), (x0, 10), (x0, 0)]]
    shp = _shp_file([
        _shp_polygon_record(1, sq(0)),
        _shp_polygon_record(2, sq(100)),   # deleted in .dbf
        _shp_polygon_record(3, sq(200)),
    ])
    dbf = _dbf_file(
        [("NAME", "C", 8, 0)],
        [["first"], ["dead"], ["third"]],
        deleted={1},
    )
    base = str(tmp_path / "del")
    open(base + ".shp", "wb").write(shp)
    open(base + ".dbf", "wb").write(dbf)
    rows = {r["NAME"]: r for r in read_shapefile(spark, base).collect()}
    assert set(rows) == {"first", "third"}
    # the surviving third record must keep ITS geometry (x0=200), not
    # the deleted one's
    assert rows["third"]["minx"] == 200.0 and rows["first"]["minx"] == 0.0


def test_multipart_polyline_encodes_all_parts(spark, tmp_path):
    from hope_graph_builder_spark.sources.shapefile import read_shapefile
    from hope_graph_builder_spark.spatial import wkb as wkbmod

    shp = _shp_file([
        _shp_polyline_record(1, [[(0, 0), (10, 0)], [(50, 50), (60, 60), (70, 50)]]),
        _shp_polyline_record(2, [[(200, 0), (210, 0)]]),
    ])
    dbf = _dbf_file([("NAME", "C", 8, 0)], [["multi"], ["single"]])
    base = str(tmp_path / "lines")
    open(base + ".shp", "wb").write(shp)
    open(base + ".dbf", "wb").write(dbf)
    rows = {r["NAME"]: r for r in read_shapefile(spark, base).collect()}
    multi = wkbmod.multilinestring_from_wkb(bytes(rows["multi"]["geom"]))
    assert len(multi) == 2
    np.testing.assert_array_equal(multi[0], [[0, 0], [10, 0]])
    np.testing.assert_array_equal(multi[1], [[50, 50], [60, 60], [70, 50]])
    # bbox still bounds every part
    assert rows["multi"]["maxx"] == 70.0 and rows["multi"]["maxy"] == 60.0
    # single-part stays a plain LineString
    single = wkbmod.multilinestring_from_wkb(bytes(rows["single"]["geom"]))
    assert len(single) == 1 and wkbmod.wkb_type(bytes(rows["single"]["geom"])) == wkbmod.WKB_LINESTRING
