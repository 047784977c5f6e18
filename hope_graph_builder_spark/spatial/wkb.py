"""Minimal WKB (well-known binary) codec, numpy-vectorized.

The engine's geometry interchange format is WKB in a BinaryType column
(SURVEY.md §1.1) — the public OGC format, so any consumer (GeoPandas,
PostGIS, Sedona) can read our outputs. Shapely is not available in this
sandbox, so encode/decode is implemented directly from the OGC spec.
Only the shapes the reference uses: Point, LineString, Polygon (outer
ring only — reference polygons are exploded to single parts first,
`/root/reference/src/noise_data_preprocessing/noise_data_preprocessing.py:26-41`).

Hot paths do NOT round-trip WKB per row; they carry plain double
columns (x, y / x1..y2) or coordinate arrays. WKB is for I/O edges and
for general-polygon refinement kernels.
"""

from __future__ import annotations

import struct

import numpy as np

_LE = 1
WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6

_POINT_HEAD = struct.pack("<BI", _LE, WKB_POINT)


def points_to_wkb(x: np.ndarray, y: np.ndarray) -> list[bytes]:
    """Vectorized: build all 21-byte point buffers in one structured array."""
    n = len(x)
    arr = np.empty(n, dtype=np.dtype([("h", "V5"), ("x", "<f8"), ("y", "<f8")]))
    arr["h"] = np.frombuffer(_POINT_HEAD, dtype="V5")[0]
    arr["x"] = x
    arr["y"] = y
    raw = arr.tobytes()
    return [raw[i * 21 : (i + 1) * 21] for i in range(n)]


def point_from_wkb(buf: bytes) -> tuple[float, float]:
    assert buf[0] == _LE
    return struct.unpack_from("<dd", buf, 5)


def points_from_wkb(bufs) -> tuple[np.ndarray, np.ndarray]:
    raw = b"".join(bufs)
    arr = np.frombuffer(raw, dtype=np.dtype([("h", "V5"), ("x", "<f8"), ("y", "<f8")]))
    return arr["x"].copy(), arr["y"].copy()


def linestring_to_wkb(coords: np.ndarray) -> bytes:
    """coords: (n, 2) float64."""
    head = struct.pack("<BII", _LE, WKB_LINESTRING, coords.shape[0])
    return head + np.ascontiguousarray(coords, dtype="<f8").tobytes()


def linestring_from_wkb(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 5)
    return np.frombuffer(buf, dtype="<f8", count=2 * n, offset=9).reshape(n, 2)


def multilinestring_to_wkb(parts: list[np.ndarray]) -> bytes:
    """MultiLineString: parts = list of (n, 2) arrays. OGC type 5."""
    head = struct.pack("<BII", _LE, WKB_MULTILINESTRING, len(parts))
    return head + b"".join(linestring_to_wkb(p) for p in parts)


def multilinestring_from_wkb(buf: bytes) -> list[np.ndarray]:
    """LineString rides through as a single part."""
    assert buf[0] == _LE
    t = wkb_type(buf)
    if t == WKB_LINESTRING:
        return [linestring_from_wkb(buf)]
    assert t == WKB_MULTILINESTRING, t
    (nparts,) = struct.unpack_from("<I", buf, 5)
    out, off = [], 9
    for _ in range(nparts):
        assert buf[off] == _LE
        (n,) = struct.unpack_from("<I", buf, off + 5)
        out.append(np.frombuffer(buf, "<f8", 2 * n, off + 9).reshape(n, 2))
        off += 9 + 16 * n
    return out


def polygon_to_wkb(ring: np.ndarray) -> bytes:
    """ring: (n, 2); closed automatically if first != last."""
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    head = struct.pack("<BIII", _LE, WKB_POLYGON, 1, ring.shape[0])
    return head + np.ascontiguousarray(ring, dtype="<f8").tobytes()


def polygon_from_wkb(buf: bytes) -> np.ndarray:
    """Returns the outer ring (n, 2), closed."""
    (nrings,) = struct.unpack_from("<I", buf, 5)
    assert nrings >= 1
    (n,) = struct.unpack_from("<I", buf, 9)
    return np.frombuffer(buf, dtype="<f8", count=2 * n, offset=13).reshape(n, 2)


def polygon_to_wkb_rings(rings: list[np.ndarray]) -> bytes:
    """Polygon with holes: rings[0] = outer, rings[1:] = holes."""
    closed = []
    for r in rings:
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        closed.append(np.ascontiguousarray(r, dtype="<f8"))
    head = struct.pack("<BII", _LE, WKB_POLYGON, len(closed))
    body = b"".join(
        struct.pack("<I", r.shape[0]) + r.tobytes() for r in closed
    )
    return head + body


def multipolygon_to_wkb(parts: list[list[np.ndarray]]) -> bytes:
    """MultiPolygon: parts = list of polygons, each a list of rings
    (outer first). OGC type 6, little-endian."""
    head = struct.pack("<BII", _LE, WKB_MULTIPOLYGON, len(parts))
    return head + b"".join(polygon_to_wkb_rings(rings) for rings in parts)


def polygon_rings_from_wkb(buf: bytes, offset: int = 0) -> tuple[list[np.ndarray], int]:
    """All rings of one polygon record; returns (rings, next offset)."""
    assert buf[offset] == _LE
    (t,) = struct.unpack_from("<I", buf, offset + 1)
    assert t == WKB_POLYGON, t
    (nrings,) = struct.unpack_from("<I", buf, offset + 5)
    p = offset + 9
    rings = []
    for _ in range(nrings):
        (n,) = struct.unpack_from("<I", buf, p)
        rings.append(np.frombuffer(buf, "<f8", 2 * n, p + 4).reshape(n, 2))
        p += 4 + 16 * n
    return rings, p


def multipolygon_from_wkb(buf: bytes) -> list[list[np.ndarray]]:
    """F9 decode (reference noise_data_preprocessing.py:26-41 explodes
    multi→single parts): list of polygons, each a list of rings."""
    assert buf[0] == _LE
    t = wkb_type(buf)
    if t == WKB_POLYGON:  # single part rides through unchanged
        rings, _ = polygon_rings_from_wkb(buf)
        return [rings]
    assert t == WKB_MULTIPOLYGON, t
    (nparts,) = struct.unpack_from("<I", buf, 5)
    out, off = [], 9
    for _ in range(nparts):
        rings, off = polygon_rings_from_wkb(buf, off)
        out.append(rings)
    return out


def rect_to_wkb(minx: float, miny: float, maxx: float, maxy: float) -> bytes:
    ring = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
    )
    return polygon_to_wkb(ring)


def wkb_type(buf: bytes) -> int:
    return struct.unpack_from("<I", buf, 1)[0]
