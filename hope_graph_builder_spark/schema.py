"""Central schema declarations (SURVEY.md §1.2 — the reference keeps
its schema in attribute Enums with short on-disk keys,
`/root/reference/src/common/igraph.py:24-71`; we keep explicit
StructTypes plus the short↔long name map).
"""

from __future__ import annotations

from pyspark.sql import types as T

# pages — the driver-mandated input table (BASELINE.json input_hint)
PAGES = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

# street edges (2-vertex fast path; general geometry rides as WKB)
EDGES = T.StructType([
    T.StructField("edge_id", T.LongType(), False),
    T.StructField("x1", T.DoubleType(), False),
    T.StructField("y1", T.DoubleType(), False),
    T.StructField("x2", T.DoubleType(), False),
    T.StructField("y2", T.DoubleType(), False),
    T.StructField("length", T.DoubleType(), False),
    T.StructField("geom", T.BinaryType(), True),       # WKB, optional
    T.StructField("geom_wgs", T.BinaryType(), True),   # dual-CRS (§1.3)
])

NOISE_LAYERS = T.StructType([
    T.StructField("layer", T.StringType(), False),
    T.StructField("poly_id", T.LongType(), False),
    T.StructField("minx", T.DoubleType(), False),
    T.StructField("miny", T.DoubleType(), False),
    T.StructField("maxx", T.DoubleType(), False),
    T.StructField("maxy", T.DoubleType(), False),
    T.StructField("db", T.LongType(), False),
    T.StructField("geom", T.BinaryType(), True),       # WKB for non-rect
])

# flagship output — three-valued map semantics (igraph.py:62: None =
# nodata, {} = no noise, populated = exposures)
EDGE_NOISES = T.StructType([
    T.StructField("edge_id", T.LongType(), False),
    T.StructField("noises", T.MapType(T.IntegerType(), T.DoubleType()), True),
    T.StructField("noise_source", T.StringType(), True),
    T.StructField("noise_sources", T.MapType(T.StringType(), T.IntegerType()), True),
])

MANIFEST = T.StructType([
    T.StructField("stage", T.StringType(), False),
    T.StructField("tile_group", T.LongType(), False),
    T.StructField("row_count", T.LongType(), False),
    T.StructField("checksum", T.LongType(), True),
    T.StructField("wall_ms", T.LongType(), False),
    T.StructField("status", T.StringType(), False),
])

# short on-disk attribute keys ↔ column names (reference igraph.py:43-71)
SHORT_NAMES = {
    "edge_id": "ii",
    "noises": "n",
    "noise_source": "ns",
    "noise_sources": "nss",
    "length": "l",
    "bike_safety_factor": "bsf",
}
LONG_NAMES = {v: k for k, v in SHORT_NAMES.items()}
