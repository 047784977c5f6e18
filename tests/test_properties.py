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


@st.composite
def axis_rects(draw, n_min=1, n_max=10):
    n = draw(st.integers(n_min, n_max))
    out = []
    for _ in range(n):
        x0 = draw(st.floats(0, 900, allow_nan=False, width=64))
        y0 = draw(st.floats(0, 900, allow_nan=False, width=64))
        w = draw(st.floats(1, 100, allow_nan=False, width=64))
        h = draw(st.floats(1, 100, allow_nan=False, width=64))
        out.append((x0, y0, x0 + w, y0 + h))
    return np.array(out, dtype=np.float64)


@given(axis_rects())
@settings(max_examples=60, deadline=None)
def test_trapezoid_union_matches_rect_union(rects):
    """Two independent union algorithms (coordinate compression vs
    vertical-slab trapezoid sweep) must agree on any rectangle set,
    and the sweep's parts must sum to the same area."""
    from hope_graph_builder_spark.spatial.kernels import (
        poly_union_area,
        poly_union_trapezoids,
        trapezoid_areas,
    )

    polys = [
        [np.array([[a, b], [c, b], [c, d], [a, d]])] for a, b, c, d in rects
    ]
    want = rect_union_area(rects)
    got = poly_union_area(polys)
    assert abs(got - want) <= 1e-6 * max(want, 1.0)
    parts = poly_union_trapezoids(polys)
    assert abs(trapezoid_areas(parts).sum() - want) <= 1e-6 * max(want, 1.0)


@st.composite
def simple_rings(draw, min_pts=4, max_pts=12):
    """PROVABLY simple rings: vertices at jittered equally-spaced
    angles around a center (every angular gap < π, so the polygon is
    star-shaped w.r.t. an interior center and no edge can cross
    another). Merely sorting random angles is NOT enough — when the
    angles span less than the full circle, the closing edge can cut
    the chain (a real counterexample hypothesis found)."""
    n = draw(st.integers(min_pts, max_pts))
    jit = draw(st.lists(st.floats(-1, 1, allow_nan=False, width=64),
                        min_size=n, max_size=n))
    rads = draw(st.lists(st.floats(1, 300, allow_nan=False, width=64),
                         min_size=n, max_size=n))
    cx = draw(st.floats(-200, 400, allow_nan=False, width=64))
    cy = draw(st.floats(-200, 400, allow_nan=False, width=64))
    angs = [(i + 0.45 * j) * 2.0 * np.pi / n for i, j in enumerate(jit)]
    pts = np.array([
        [cx + r * np.cos(a), cy + r * np.sin(a)] for a, r in zip(angs, rads)
    ])
    return np.vstack([pts, pts[:1]])


@given(simple_rings(),
       st.floats(10, 400, allow_nan=False, width=64),
       st.floats(10, 400, allow_nan=False, width=64))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.filter_too_much])
def test_general_clip_bounded_and_consistent(ring, w, h):
    """For SIMPLE rings: clip area is bounded by the window area AND
    by the ring's own area, and clipping by an all-containing window
    returns exactly the shoelace area."""
    from hope_graph_builder_spark.spatial.kernels import (
        ring_clip_area,
        shoelace_area,
    )

    win = np.array([[0, 0], [w, 0], [w, h], [0, h]], float)
    a = ring_clip_area(ring, win)
    full = shoelace_area(ring[:-1])
    big = np.array([[-2e6, -2e6], [2e6, -2e6], [2e6, 2e6], [-2e6, 2e6]], float)
    tol = 1e-9 * max(full, 1.0)
    assert a <= w * h + tol
    assert a <= full + tol
    assert abs(ring_clip_area(ring, big) - full) <= tol


@given(st.floats(-500, 500, width=64), st.floats(-500, 500, width=64),
       st.floats(-500, 500, width=64), st.floats(-500, 500, width=64),
       st.floats(5, 80, width=64))
@settings(max_examples=60, deadline=None)
def test_capsule_area_bounds(x1, y1, x2, y2, r):
    """capsule ∩ anything is bounded by the capsule's own area; a
    window containing the whole capsule yields exactly L·2r + πr²."""
    from hope_graph_builder_spark.spatial.kernels import capsule_ring_area

    big = np.array([[-2000, -2000], [2000, -2000], [2000, 2000], [-2000, 2000]], float)
    L = float(np.hypot(x2 - x1, y2 - y1))
    cap_area = L * 2 * r + np.pi * r * r
    got = capsule_ring_area(big, x1, y1, x2, y2, r)
    assert abs(got - cap_area) < 1e-6 * cap_area
    win = np.array([[0, 0], [50, 0], [50, 50], [0, 50]], float)
    assert capsule_ring_area(win, x1, y1, x2, y2, r) <= min(cap_area, 2500.0) + 1e-6
