"""Dual-CRS support without pyproj: WGS84 lon/lat ↔ spherical (web)
Mercator, closed-form and numpy-vectorized.

The reference keeps every geometry in a projected metric CRS
(EPSG:3879) for measurement and EPSG:4326 for exchange
(`/root/reference/src/common/geometry.py:6-18`,
`otp_graph_import.py:41,54`). pyproj is not in this sandbox, so the
engine's metric CRS is spherical Mercator (EPSG:3857 math, public
formula); the convention — project once at ingest, measure in meters,
exchange in 4326 — is identical.

Both directions come in Column-expression and numpy flavors; the
Column flavor keeps reprojection inside whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

R = 6378137.0  # WGS84 semi-major axis


def lonlat_to_mercator_np(lon: np.ndarray, lat: np.ndarray):
    x = np.radians(lon) * R
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * R
    return x, y


def mercator_to_lonlat_np(x: np.ndarray, y: np.ndarray):
    lon = np.degrees(x / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0)
    return lon, lat


def lonlat_to_mercator_expr(lon: Column, lat: Column) -> tuple[Column, Column]:
    x = F.radians(lon) * F.lit(R)
    y = F.log(F.tan(F.lit(float(np.pi / 4.0)) + F.radians(lat) / F.lit(2.0))) * F.lit(R)
    return x, y


def mercator_to_lonlat_expr(x: Column, y: Column) -> tuple[Column, Column]:
    lon = F.degrees(x / F.lit(R))
    lat = F.degrees(F.atan(F.exp(y / F.lit(R))) * F.lit(2.0) - F.lit(float(np.pi / 2.0)))
    return lon, lat
