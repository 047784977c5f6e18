"""S12: Shapefile scan — the reference's debug/exchange sibling of the
GeoPackage path (SURVEY.md §2.1). Implemented directly from the public
ESRI Shapefile Technical Description (July 1998 whitepaper): .shp =
100-byte big/little-endian mixed header + length-prefixed records;
.dbf = dBase III fixed-width attribute table. No third-party IO.

Driver-side read like the other exchange formats (convert-once-to-
parquet seam); emits the standard (attrs…, WKB geom, bbox) shape.
Supported shapes: Point (1), PolyLine (3), Polygon (5) — the ones the
reference's pipelines produce/consume. Polygon part rings are emitted
as one polygon with rings in file order (outer first per spec's
clockwise convention)."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from hope_graph_builder_spark.spatial import wkb as wkbmod

SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5


def read_shp(path: str) -> list[tuple[int, int, list[np.ndarray]]]:
    """→ [(record_number, shape_type, parts)] where parts is a list of
    (n, 2) coordinate arrays (one per part/ring; a Point yields one
    1×2 array)."""
    buf = open(path, "rb").read()
    (magic,) = struct.unpack_from(">i", buf, 0)
    assert magic == 9994, "not a shapefile"
    (version, _gtype) = struct.unpack_from("<ii", buf, 28)
    assert version == 1000
    out = []
    off = 100
    while off < len(buf):
        recno, content_words = struct.unpack_from(">ii", buf, off)
        off += 8
        (stype,) = struct.unpack_from("<i", buf, off)
        if stype == 0:  # null shape
            out.append((recno, stype, []))
        elif stype == SHP_POINT:
            x, y = struct.unpack_from("<dd", buf, off + 4)
            out.append((recno, stype, [np.array([[x, y]])]))
        elif stype in (SHP_POLYLINE, SHP_POLYGON):
            nparts, npoints = struct.unpack_from("<ii", buf, off + 36)
            parts = struct.unpack_from(f"<{nparts}i", buf, off + 44)
            pts = np.frombuffer(
                buf, "<f8", 2 * npoints, off + 44 + 4 * nparts
            ).reshape(npoints, 2)
            bounds = list(parts) + [npoints]
            out.append(
                (recno, stype,
                 [pts[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)])
            )
        else:
            raise ValueError(f"unsupported shape type {stype}")
        off += 2 * content_words  # content length is in 16-bit words
    return out


def read_dbf(path: str) -> tuple[list[tuple[str, str]], list[list | None]]:
    """dBase III: → (fields [(name, type)], records). C → str, N → int
    (or float when decimals > 0); values stripped. Records flagged
    deleted ('*') are kept as ``None`` placeholders so the list stays
    positionally aligned with the .shp record stream — .shp has no
    deletion flag, so dropping here would shift every later attribute
    row onto the wrong geometry (zip in read_shapefile drops the pair)."""
    buf = open(path, "rb").read()
    nrec, hdr_size, rec_size = struct.unpack_from("<iHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    records: list[list | None] = []
    for r in range(nrec):
        base = hdr_size + r * rec_size
        if buf[base:base + 1] == b"*":  # deleted — placeholder keeps alignment
            records.append(None)
            continue
        row, p = [], base + 1
        for name, ftype, flen, fdec in fields:
            raw = buf[p:p + flen].decode("ascii").strip()
            p += flen
            if ftype == "N" and raw:
                row.append(float(raw) if fdec else int(raw))
            elif ftype == "N":
                row.append(None)
            else:
                row.append(raw)
        records.append(row)
    return [(n, t) for n, t, _, _ in fields], records


def read_shapefile(spark: SparkSession, base: str) -> DataFrame:
    """base (no extension) → DataFrame(fid, attrs…, geom WKB, minx..maxy).
    Point records get a degenerate bbox; PolyLine encodes as WKB
    LineString (first part), Polygon as WKB Polygon with all rings."""
    shapes = read_shp(base + ".shp")
    fields, records = read_dbf(base + ".dbf")
    rows = []
    for (recno, stype, parts), attrs in zip(shapes, records):
        if attrs is None:  # dBase deleted record — drop geometry too
            continue
        if stype == SHP_POINT:
            xy = parts[0][0]
            geom = wkbmod.points_to_wkb(np.array([xy[0]]), np.array([xy[1]]))[0]
            bbox = (xy[0], xy[1], xy[0], xy[1])
        elif stype == SHP_POLYLINE:
            geom = (wkbmod.linestring_to_wkb(parts[0]) if len(parts) == 1
                    else wkbmod.multilinestring_to_wkb(parts))
            allp = np.vstack(parts)
            bbox = (allp[:, 0].min(), allp[:, 1].min(), allp[:, 0].max(), allp[:, 1].max())
        elif stype == SHP_POLYGON:
            geom = wkbmod.polygon_to_wkb_rings(parts)
            outer = parts[0]
            bbox = (outer[:, 0].min(), outer[:, 1].min(), outer[:, 0].max(), outer[:, 1].max())
        else:
            continue
        rows.append([recno, *attrs, bytearray(geom),
                     float(bbox[0]), float(bbox[1]), float(bbox[2]), float(bbox[3])])

    def sql_type(t):
        return {"N": "double", "C": "string"}.get(t, "string")

    # dBase N fields parse to int when decimals == 0 — normalize to the
    # declared SQL type
    norm = []
    for row in rows:
        out = [row[0]]
        for (name, t), v in zip(fields, row[1:1 + len(fields)]):
            out.append(float(v) if t == "N" and v is not None else v)
        norm.append(out + row[1 + len(fields):])
    schema = ", ".join(
        ["fid long"]
        + [f"`{n}` {sql_type(t)}" for n, t in fields]
        + ["geom binary", "minx double", "miny double", "maxx double", "maxy double"]
    )
    return spark.createDataFrame(norm, schema=schema)
