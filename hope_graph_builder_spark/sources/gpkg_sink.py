"""S4 twin sink: WRITE a GeoPackage — the reference emits .gpkg debug
exports of intermediate layers (`/root/reference/src/otp_graph_import/
otp_graph_import.py` b_export_otp_*_gpkg, graph_export debug files).
Implemented directly from the public OGC GeoPackage spec (1.3):
stdlib sqlite3 file with the GPKG application id, the three required
metadata tables (gpkg_spatial_ref_sys / gpkg_contents /
gpkg_geometry_columns), and one feature table whose geometry BLOBs are
the 'GP' header (+ type-1 envelope) over the row's existing OGC WKB.

Driver-side sink like sources/graphml_sink.py: a .gpkg is a
single-file EXCHANGE artifact (sqlite can't be written from many
executors); rows stream through ``toLocalIterator`` without
collecting the whole DataFrame, and the scale sink remains parquet
(checkpoint/manifest.py). Round-trips through read_gpkg_layer and is
validated against the layout of the reference's own extents.gpkg.
"""

from __future__ import annotations

import os
import sqlite3
import struct

from pyspark.sql import DataFrame

GPKG_APPLICATION_ID = 0x47504B47  # "GPKG"
GPKG_USER_VERSION = 10300  # spec 1.3.0

_SQLITE_TYPES = {
    "bigint": "INTEGER", "int": "MEDIUMINT", "smallint": "SMALLINT",
    "tinyint": "TINYINT", "boolean": "BOOLEAN",
    "double": "DOUBLE", "float": "FLOAT",
    "string": "TEXT", "binary": "BLOB",
}

_REQUIRED_SRS = [
    # spec Req. 11: undefined cartesian (-1), undefined geographic (0),
    # and WGS84 (4326) rows must exist
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
    ("WGS 84 geodetic", 4326, "EPSG", 4326,
     'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]]',
     "longitude/latitude coordinates in decimal degrees"),
]


def _qi(name: str) -> str:
    """Quote an SQL identifier the standard way: double quotes, embedded
    quotes doubled — valid for SQLite table and column names (the
    previous repr()-based single quoting leaned on SQLite's
    string-literal-as-identifier compatibility quirk and broke on names
    containing an apostrophe)."""
    return '"' + str(name).replace('"', '""') + '"'


# A .gpkg is a single-writer SQLite file streamed through the driver —
# correct for debug/exchange layers (the reference's use), wrong for
# bulk output. Above this many rows the sink refuses and points at the
# distributed parquet sink (checkpoint/manifest.py); override only for
# a deliberate large export.
MAX_DRIVER_ROWS = 2_000_000


def gpkg_geometry_blob(wkb: bytes, srs_id: int,
                       bbox: tuple[float, float, float, float] | None) -> bytes:
    """OGC GeoPackage §2.1.3 BLOB: magic 'GP', version 0, flags
    (little-endian bit + envelope indicator 1 when a bbox is given),
    srs_id, envelope as [minx, maxx, miny, maxy] doubles, then the
    unmodified WKB payload."""
    if bbox is None:
        head = struct.pack("<2sBBi", b"GP", 0, 0x01, srs_id)
        return head + wkb
    minx, miny, maxx, maxy = bbox
    head = struct.pack("<2sBBi", b"GP", 0, 0x03, srs_id)
    env = struct.pack("<4d", minx, maxx, miny, maxy)  # spec order!
    return head + env + wkb


def write_gpkg_layer(
    df: DataFrame,
    path: str,
    layer: str,
    geom_col: str = "geom",
    srs_id: int = 0,
    geometry_type: str = "GEOMETRY",
    identifier: str | None = None,
    max_driver_rows: int = MAX_DRIVER_ROWS,
) -> int:
    """Write ``df`` (attrs…, WKB ``geom_col``, optional minx/miny/
    maxx/maxy bbox columns) as one feature layer; returns the feature
    count. Creates the file with the required GPKG skeleton if absent;
    replaces the layer if it already exists.

    Scale guard: refuses DataFrames larger than ``max_driver_rows``
    (counted up front) — SQLite is a single-writer container, so every
    row funnels through this one process; beyond debug/exchange scale
    the right sink is distributed parquet (checkpoint/manifest.py) or
    per-shard .gpkg files written from a partitioned loop."""
    n_in = df.count()
    if n_in > max_driver_rows:
        raise ValueError(
            f"write_gpkg_layer: {n_in} rows exceeds max_driver_rows="
            f"{max_driver_rows}; a GeoPackage is a single-writer sqlite"
            " file streamed through the driver. Export via the parquet"
            " sink (checkpoint/manifest.py) or raise max_driver_rows"
            " for a deliberate large export."
        )
    bbox_cols = {"minx", "miny", "maxx", "maxy"}
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    attr_fields = [
        (n, t) for n, t in fields if n != geom_col and n not in bbox_cols
    ]
    has_bbox = bbox_cols.issubset({n for n, _ in fields})

    con = sqlite3.connect(path)
    try:
        con.execute(f"PRAGMA application_id = {GPKG_APPLICATION_ID}")
        con.execute(f"PRAGMA user_version = {GPKG_USER_VERSION}")
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,"
            "organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,"
            "definition TEXT NOT NULL, description TEXT)"
        )
        for name, sid, org, org_id, definition, desc in _REQUIRED_SRS:
            con.execute(
                "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
                (name, sid, org, org_id, definition or "undefined", desc),
            )
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            "table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,"
            "identifier TEXT UNIQUE, description TEXT DEFAULT '',"
            "last_change DATETIME NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),"
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,"
            "srs_id INTEGER,"
            "CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id)"
            " REFERENCES gpkg_spatial_ref_sys(srs_id))"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
            "table_name TEXT NOT NULL, column_name TEXT NOT NULL,"
            "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,"
            "z TINYINT NOT NULL, m TINYINT NOT NULL,"
            "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
        )
        con.execute(f"DROP TABLE IF EXISTS {_qi(layer)}")
        con.execute("DELETE FROM gpkg_contents WHERE table_name = ?", (layer,))
        con.execute(
            "DELETE FROM gpkg_geometry_columns WHERE table_name = ?", (layer,)
        )
        # an incoming `fid` column (e.g. a layer read back from another
        # GeoPackage) becomes THE primary key instead of colliding with
        # the one we add
        has_fid = any(n == "fid" for n, _ in attr_fields)
        attr_fields = [(n, t) for n, t in attr_fields if n != "fid"]
        attr_ddl = ", ".join(
            f"{_qi(n)} {_SQLITE_TYPES.get(t, 'TEXT')}" for n, t in attr_fields
        )
        sep = ", " if attr_ddl else ""
        pk = ("fid INTEGER PRIMARY KEY" if has_fid
              else "fid INTEGER PRIMARY KEY AUTOINCREMENT")
        con.execute(
            f"CREATE TABLE {_qi(layer)} ({pk}{sep}{attr_ddl}, {_qi(geom_col)} BLOB)"
        )

        attr_names = (["fid"] if has_fid else []) + [n for n, _ in attr_fields]
        placeholders = ", ".join(["?"] * (len(attr_names) + 1))
        insert = (
            f"INSERT INTO {_qi(layer)} ({', '.join(_qi(n) for n in attr_names)}"
            f"{', ' if attr_names else ''}{_qi(geom_col)}) VALUES ({placeholders})"
        )
        n_rows = 0
        gminx = gminy = float("inf")
        gmaxx = gmaxy = float("-inf")
        for row in df.toLocalIterator():
            d = row.asDict()
            bbox = None
            if has_bbox:
                bbox = (d["minx"], d["miny"], d["maxx"], d["maxy"])
                gminx = min(gminx, d["minx"]); gminy = min(gminy, d["miny"])
                gmaxx = max(gmaxx, d["maxx"]); gmaxy = max(gmaxy, d["maxy"])
            blob = gpkg_geometry_blob(bytes(d[geom_col]), srs_id, bbox)
            con.execute(insert, [d[n] for n in attr_names] + [blob])
            n_rows += 1
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (layer, "features", identifier or layer,
             None if n_rows == 0 or not has_bbox else gminx,
             None if n_rows == 0 or not has_bbox else gminy,
             None if n_rows == 0 or not has_bbox else gmaxx,
             None if n_rows == 0 or not has_bbox else gmaxy,
             srs_id),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (layer, geom_col, geometry_type, srs_id),
        )
        con.commit()
    finally:
        con.close()
    return n_rows
