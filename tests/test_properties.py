"""Property-based cross-checks (hypothesis) between independent
implementations — the native Column folds vs the numpy kernels vs the
codecs. Complements the golden/oracle layers: these hunt for edge
cases no fixture contains (degenerate rings, repeated vertices,
extreme coordinates)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hope_graph_builder_spark.spatial import wkb as wkbmod
from hope_graph_builder_spark.spatial.kernels import (
    points_in_rings,
    polyline_interpolate,
    rect_union_area,
    rect_union_parts,
)

coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=64
)


@st.composite
def rings(draw, min_pts=3, max_pts=8):
    n = draw(st.integers(min_pts, max_pts))
    pts = draw(
        st.lists(st.tuples(coord, coord), min_size=n, max_size=n, unique=True)
    )
    r = np.array(pts, dtype=np.float64)
    return np.vstack([r, r[:1]])  # closed


@st.composite
def multipolygons(draw):
    nparts = draw(st.integers(1, 3))
    parts = []
    for _ in range(nparts):
        nrings = draw(st.integers(1, 3))
        parts.append([draw(rings()) for _ in range(nrings)])
    return parts


@given(multipolygons())
@settings(max_examples=80, deadline=None)
def test_wkb_multipolygon_roundtrip(parts):
    """encode → decode is the identity on rings (bitwise doubles)."""
    buf = wkbmod.multipolygon_to_wkb(parts)
    back = wkbmod.multipolygon_from_wkb(buf)
    assert len(back) == len(parts)
    for p0, p1 in zip(parts, back):
        assert len(p0) == len(p1)
        for r0, r1 in zip(p0, p1):
            assert np.array_equal(r0, r1)


@given(multipolygons(), st.lists(st.tuples(coord, coord), min_size=5, max_size=20))
@settings(max_examples=60, deadline=None)
def test_even_odd_survives_wkb(parts, probes):
    """points_in_rings gives the same answer on decoded rings as on the
    originals (the refine path always sees decoded WKB)."""
    px = np.array([p[0] for p in probes])
    py = np.array([p[1] for p in probes])
    flat = [r for part in parts for r in part]
    direct = points_in_rings(px, py, flat)
    decoded = points_in_rings(
        px, py,
        [r for part in wkbmod.multipolygon_from_wkb(wkbmod.multipolygon_to_wkb(parts))
         for r in part],
    )
    assert np.array_equal(direct, decoded)


@st.composite
def rect_sets(draw):
    n = draw(st.integers(1, 10))
    out = []
    for _ in range(n):
        x0 = draw(st.floats(0, 900, allow_nan=False))
        y0 = draw(st.floats(0, 900, allow_nan=False))
        w = draw(st.floats(0.1, 100, allow_nan=False))
        h = draw(st.floats(0.1, 100, allow_nan=False))
        out.append((x0, y0, x0 + w, y0 + h))
    return np.array(out, dtype=np.float64)


@given(rect_sets())
@settings(max_examples=80, deadline=None)
def test_union_parts_area_identity(rects):
    parts = rect_union_parts(rects)
    areas = (parts[:, 2] - parts[:, 0]) * (parts[:, 3] - parts[:, 1])
    assert abs(areas.sum() - rect_union_area(rects)) <= 1e-6 * max(1.0, areas.sum())


def test_sample_polyline_matches_numpy_kernel(spark):
    """The native higher-order-fold sampling (sample_polyline) must
    match the INDEPENDENT numpy interpolation kernel pointwise on 100
    seeded random polylines (2-8 vertices, incl. repeated vertices) —
    two formulations, one semantics."""
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators.sampling import sample_polyline

    rng = np.random.RandomState(42)
    rows = []
    for eid in range(100):
        n = rng.randint(2, 9)
        pts = rng.uniform(0, 1000, size=(n, 2)).round(2)
        if eid % 7 == 0 and n >= 3:
            pts[1] = pts[0]  # repeated consecutive vertex (zero segment)
        rows.append((eid, pts[:, 0].tolist(), pts[:, 1].tolist()))
    df = spark.createDataFrame(rows, "edge_id long, xs array<double>, ys array<double>")
    got = {
        (r["edge_id"], r["i"]): (r["x"], r["y"])
        for r in sample_polyline(df, interval=3.0, index_col="i").collect()
    }
    mism = 0
    for eid, xs, ys in rows:
        coords = np.column_stack([xs, ys])
        d = np.diff(coords, axis=0)
        total = float(np.sqrt((d * d).sum(axis=1)).sum())
        n = max(1, int(np.rint(total / 3.0)))
        fracs = (np.arange(n) + 0.5) / n
        want = polyline_interpolate(coords, fracs)
        for i in range(n):
            gx, gy = got[(eid, i)]
            if abs(gx - want[i, 0]) > 1e-6 or abs(gy - want[i, 1]) > 1e-6:
                mism += 1
    assert mism == 0
    assert len(got) == sum(
        max(1, int(np.rint(float(np.sqrt((np.diff(np.column_stack([xs, ys]), axis=0) ** 2).sum(axis=1)).sum()) / 3.0)))
        for _, xs, ys in rows
    )
