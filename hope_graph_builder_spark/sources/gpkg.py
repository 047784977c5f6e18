"""S4: GeoPackage scan — reads the reference's .gpkg fixtures
(`/root/reference/src/noise_graph_join/noise_graph_join.py` reads
noise/nodata layers via geopandas/fiona; `otp_graph_import.py` writes
debug gpkg). Round 1-2 documented this out of scope; it is now
implemented directly from the public OGC GeoPackage spec: a GPKG is a
SQLite database (stdlib sqlite3) whose geometry BLOBs are a small
'GP' header (+ optional envelope) followed by standard OGC WKB — which
`spatial/wkb.py` already decodes.

Driver-side read (like sources/graphml.py): GPKG is an EXCHANGE
format; the production seam is convert-once-to-parquet, then every
downstream operator is a distributed Spark plan over (attrs, WKB,
bbox) columns — the exact shape pip_join_wkb consumes.
"""

from __future__ import annotations

import sqlite3

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from hope_graph_builder_spark.spatial import wkb as wkbmod

_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def _connect_ro(path: str) -> sqlite3.Connection:
    # URI mode=ro: never create/modify the file (sqlite3.connect on a
    # plain path CREATES missing files)
    return sqlite3.connect(f"file:{path}?mode=ro", uri=True)


def list_layers(path: str) -> list[str]:
    with _connect_ro(path) as con:
        return [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
        )]


def parse_gpkg_geometry(blob: bytes) -> bytes:
    """GPKG geometry BLOB → the raw WKB payload (OGC GeoPackage spec
    §2.1.3: magic 'GP', version, flags byte with envelope indicator in
    bits 1-3, 4-byte srs_id, optional envelope of doubles)."""
    assert blob[:2] == b"GP", "not a GPKG geometry blob"
    flags = blob[3]
    env = _ENVELOPE_DOUBLES[(flags >> 1) & 0x7]
    return blob[8 + 8 * env:]


def read_gpkg_layer(spark: SparkSession, path: str, layer: str,
                    geom_col: str = "geom") -> DataFrame:
    """One row per feature: every attribute column + ``geom`` (raw WKB
    binary) + outer bbox (minx/miny/maxx/maxy computed from the decoded
    rings — so downstream cell covers stay native)."""
    with _connect_ro(path) as con:
        cols = [r[1] for r in con.execute(f"PRAGMA table_info('{layer}')")]
        attr_cols = [c for c in cols if c != geom_col]
        rows = []
        for rec in con.execute(
            f"SELECT {', '.join(attr_cols)}, {geom_col} FROM '{layer}'"
        ):
            *attrs, blob = rec
            wkb = parse_gpkg_geometry(bytes(blob))
            parts = wkbmod.multipolygon_from_wkb(wkb)
            outer = np.vstack([p[0] for p in parts])
            rows.append([
                *attrs, bytearray(wkb),
                float(outer[:, 0].min()), float(outer[:, 1].min()),
                float(outer[:, 0].max()), float(outer[:, 1].max()),
            ])

    def sql_type(c):
        with _connect_ro(path) as con:
            t = {r[1]: (r[2] or "TEXT") for r in con.execute(f"PRAGMA table_info('{layer}')")}[c]
        t = t.upper()
        if "INT" in t:
            return "bigint"
        if t in ("REAL", "DOUBLE", "FLOAT"):
            return "double"
        return "string"

    schema = ", ".join(
        [f"`{c}` {sql_type(c)}" for c in attr_cols]
        + ["geom binary", "minx double", "miny double", "maxx double", "maxy double"]
    )
    return spark.createDataFrame(rows, schema=schema)
