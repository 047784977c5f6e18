"""S9: WFS GetFeature scan — the reference fetches land-cover /
noise-surface layers from a WFS endpoint as GeoJSON and caches each
layer locally (`/root/reference/src/green_view_join_v1/
fetch_land_cover.py:37-76`, `noise_data_preprocessing.py:15-24`).

Twin: the same request shape (service/version/request/typeName/
outputFormat=json), GeoJSON FeatureCollection → (properties…, WKB
geometry, bbox) rows — the standard shape every downstream operator
consumes — with a parquet per-layer cache replacing the reference's
GeoPackage cache. The HTTP transport is an injectable callable
(default stdlib urllib) so the parse/caching logic is fully testable
offline; this sandbox has no network, which only disables the default
transport, not the operator.
"""

from __future__ import annotations

import json
import os
from typing import Callable
from urllib.parse import urlencode

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from hope_graph_builder_spark.spatial import wkb as wkbmod


def wfs_getfeature_url(
    url: str, layer: str, version: str = "1.0.0", request: str = "GetFeature"
) -> str:
    """Exactly the reference's parameter set (fetch_land_cover.py:43-50)."""
    params = {
        "service": "WFS",
        "version": version,
        "request": request,
        "typeName": layer,
        "outputFormat": "json",
    }
    return f"{url}?{urlencode(params)}"


def _default_fetch(full_url: str) -> str:
    import urllib.request

    with urllib.request.urlopen(full_url) as r:  # pragma: no cover (no network in CI sandbox)
        return r.read().decode("utf-8")


def _ring2d(r) -> np.ndarray:
    """GeoJSON positions may carry a Z — many WFS servers emit 3D
    coordinates. The WKB header we write declares 2D points, so slice
    every ring to (n, 2) before serialization."""
    return np.asarray(r, dtype=np.float64)[:, :2]


def _geojson_geom_to_parts(geom: dict) -> list[list[np.ndarray]]:
    t = geom["type"]
    if t == "Polygon":
        return [[_ring2d(r) for r in geom["coordinates"]]]
    if t == "MultiPolygon":
        return [[_ring2d(r) for r in part] for part in geom["coordinates"]]
    raise ValueError(f"unsupported WFS geometry type: {t}")


def read_wfs_layer(
    spark: SparkSession,
    url: str,
    layer: str,
    fetch: Callable[[str], str] | None = None,
    cache_dir: str | None = None,
    properties: list[str] | None = None,
) -> DataFrame:
    """GetFeature → DataFrame(fid, properties…, geom WKB, bbox). With
    ``cache_dir``, a previously fetched layer loads from parquet and the
    endpoint is NOT contacted again (the reference's per-layer cache
    behavior, fetch_land_cover.py:57-73)."""
    cache = os.path.join(cache_dir, f"{layer}.parquet") if cache_dir else None
    if cache and os.path.exists(os.path.join(cache, "_SUCCESS")):
        return spark.read.parquet(cache)

    body = (fetch or _default_fetch)(wfs_getfeature_url(url, layer))
    fc = json.loads(body)
    assert fc.get("type") == "FeatureCollection", "not a WFS GeoJSON response"
    rows = []
    prop_names = properties
    for i, feat in enumerate(fc.get("features", [])):
        parts = _geojson_geom_to_parts(feat["geometry"])
        buf = wkbmod.multipolygon_to_wkb(parts)
        outer = np.vstack([p[0] for p in parts])
        props = feat.get("properties") or {}
        if prop_names is None:
            prop_names = sorted(props)
        rows.append(
            [i, *[None if props.get(p) is None else str(props.get(p)) for p in prop_names],
             bytearray(buf),
             float(outer[:, 0].min()), float(outer[:, 1].min()),
             float(outer[:, 0].max()), float(outer[:, 1].max())]
        )
    prop_names = prop_names or []
    schema = ", ".join(
        ["fid long"]
        + [f"`{p}` string" for p in prop_names]
        + ["geom binary", "minx double", "miny double", "maxx double", "maxy double"]
    )
    df = spark.createDataFrame(rows, schema=schema)
    if cache:
        df.write.mode("overwrite").parquet(cache)
        return spark.read.parquet(cache)
    return df
