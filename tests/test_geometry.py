"""P4 boundary-intersects + F9 multipolygon explode invariants."""

import numpy as np
from pyspark.sql import functions as F

from hope_graph_builder_spark.operators.geometry import (
    explode_multipolygon,
    ring_boundary_intersects_rect,
    segment_intersects_rect,
    synth_multipolygons,
)
from hope_graph_builder_spark.spatial import wkb

from tests.conftest import SF_TINY


def test_wkb_multipolygon_roundtrip():
    outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 8.0], [0.0, 8.0], [0.0, 0.0]])
    hole = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 3.0], [2.0, 3.0], [2.0, 2.0]])
    part2 = np.array([[50.0, 50.0], [60.0, 50.0], [60.0, 55.0], [50.0, 55.0], [50.0, 50.0]])
    buf = wkb.multipolygon_to_wkb([[outer, hole], [part2]])
    assert wkb.wkb_type(buf) == wkb.WKB_MULTIPOLYGON
    parts = wkb.multipolygon_from_wkb(buf)
    assert len(parts) == 2
    assert len(parts[0]) == 2 and len(parts[1]) == 1
    assert np.array_equal(parts[0][0], outer)
    assert np.array_equal(parts[0][1], hole)
    # a bare POLYGON decodes as a single part
    single = wkb.polygon_to_wkb_rings([outer, hole])
    assert len(wkb.multipolygon_from_wkb(single)) == 1


def test_segment_rect_slab_cases(spark):
    rect = (10.0, 10.0, 20.0, 20.0)
    cases = [
        # (x0, y0, x1, y1, expected)
        (0.0, 0.0, 5.0, 5.0, False),      # fully outside
        (0.0, 15.0, 30.0, 15.0, True),    # crosses horizontally
        (12.0, 12.0, 18.0, 18.0, True),   # fully inside
        (0.0, 0.0, 30.0, 30.0, True),     # diagonal through
        (0.0, 25.0, 30.0, 25.0, False),   # parallel above
        (15.0, 0.0, 15.0, 30.0, True),    # vertical through (dx=0)
        (5.0, 0.0, 5.0, 30.0, False),     # vertical beside (dx=0)
        (10.0, 0.0, 10.0, 30.0, True),    # touches left edge exactly
        (0.0, 0.0, 10.0, 10.0, True),     # endpoint touches corner
        (21.0, 15.0, 30.0, 15.0, False),  # starts right of rect
    ]
    df = spark.createDataFrame(
        [(i, *c[:4]) for i, c in enumerate(cases)], "i int, x0 double, y0 double, x1 double, y1 double"
    )
    got = {
        r.i: r.hit
        for r in df.select(
            "i",
            segment_intersects_rect(
                F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"), rect
            ).alias("hit"),
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == c[4], f"case {i}: {c}"


def test_ring_boundary_vs_containment(spark):
    """A ring whose interior strictly contains the rect does NOT
    boundary-intersect it; an overlapping ring does."""
    big = ([0.0, 100.0, 100.0, 0.0, 0.0], [0.0, 0.0, 100.0, 100.0, 0.0])
    crossing = ([5.0, 15.0, 15.0, 5.0, 5.0], [5.0, 5.0, 15.0, 15.0, 5.0])
    df = spark.createDataFrame(
        [(0, *big), (1, *crossing)], "i int, xs array<double>, ys array<double>"
    )
    rect = (10.0, 10.0, 20.0, 20.0)
    got = {
        r.i: r.hit
        for r in df.select(
            "i", ring_boundary_intersects_rect(F.col("xs"), F.col("ys"), rect).alias("hit")
        ).collect()
    }
    assert got[0] is False
    assert got[1] is True


def test_wkb_polyline_roundtrip_feeds_sampler(spark):
    """WKB LineString → arrays → sample_polyline: the ingest shim is
    lossless and the sampler consumes its output unchanged."""
    from hope_graph_builder_spark import synth
    from hope_graph_builder_spark.operators.geometry import (
        polylines_from_wkb,
        polylines_to_wkb,
    )
    from hope_graph_builder_spark.operators.sampling import sample_polyline

    pl = synth.page_polylines(spark, SF_TINY).limit(50).cache()
    rt = polylines_from_wkb(polylines_to_wkb(pl))
    direct = sample_polyline(pl).toPandas().sort_values(["edge_id", "x"]).reset_index(drop=True)
    viawkb = sample_polyline(rt).toPandas().sort_values(["edge_id", "x"]).reset_index(drop=True)
    assert direct.equals(viawkb)


def test_rect_union_area_kernel():
    from hope_graph_builder_spark.spatial.kernels import rect_union_area

    # disjoint → plain sum
    assert rect_union_area(np.array([[0, 0, 2, 2], [5, 5, 7, 8]], float)) == 4 + 6
    # fully contained → outer only
    assert rect_union_area(np.array([[0, 0, 10, 10], [2, 2, 4, 4]], float)) == 100
    # partial overlap → inclusion-exclusion
    assert rect_union_area(np.array([[0, 0, 4, 4], [2, 2, 6, 6]], float)) == 16 + 16 - 4
    assert rect_union_area(np.zeros((0, 4))) == 0.0
    # brute-force cross-check on random integer rects
    rng = np.random.RandomState(3)
    for _ in range(10):
        r = rng.randint(0, 30, size=(6, 2))
        w = rng.randint(1, 10, size=(6, 2))
        rects = np.column_stack([r, r + w]).astype(float)
        grid = np.zeros((50, 50), dtype=bool)
        for x0, y0, x1, y1 in rects.astype(int):
            grid[x0:x1, y0:y1] = True
        assert rect_union_area(rects) == float(grid.sum())


def test_simplify_rdp_kernel():
    from hope_graph_builder_spark.spatial.kernels import (
        point_segment_dist2,
        simplify_rdp,
    )

    # collinear interior points vanish; endpoints stay
    line = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    out = simplify_rdp(line, 0.01)
    assert np.array_equal(out, line[[0, -1]])
    # a spike above tolerance survives
    spike = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 5.0], [3.0, 0.0], [4.0, 0.0]])
    out = simplify_rdp(spike, 0.5)
    assert any(np.array_equal(p, [2.0, 5.0]) for p in out)
    # deviation bound: every dropped vertex is within tol of the kept chain
    rng = np.random.RandomState(7)
    wiggly = np.cumsum(rng.randn(40, 2), axis=0)
    tol = 0.8
    kept = simplify_rdp(wiggly, tol)
    # check each original point against its enclosing kept segment
    for p in wiggly:
        d2 = point_segment_dist2(
            np.full(len(kept) - 1, p[0]), np.full(len(kept) - 1, p[1]),
            kept[:-1, 0], kept[:-1, 1], kept[1:, 0], kept[1:, 1],
        )
        assert d2.min() <= tol * tol + 1e-9


def test_simplify_polylines_pipeline(spark):
    """F19 over the fixture polylines: vertex counts never grow,
    endpoints are preserved."""
    from hope_graph_builder_spark import synth
    from hope_graph_builder_spark.pipelines.graph_export import simplify_polylines

    pl = synth.page_polylines(spark, SF_TINY).limit(100).cache()
    simp = simplify_polylines(pl, tol=5.0)
    j = pl.select("edge_id", F.col("xs").alias("oxs"), F.col("ys").alias("oys")).join(
        simp, "edge_id"
    )
    rows = j.collect()
    assert len(rows) == 100
    for r in rows:
        assert len(r.xs) <= len(r.oxs)
        assert r.xs[0] == r.oxs[0] and r.xs[-1] == r.oxs[-1]
        assert r.ys[0] == r.oys[0] and r.ys[-1] == r.oys[-1]


def test_multipart_explode_invariants(spark):
    pts = spark.createDataFrame(
        [(i, 100.0 * i, 50.0 * i) for i in range(12)], "doc_id long, x double, y double"
    )
    parts = explode_multipolygon(synth_multipolygons(pts)).toPandas()
    # 1 + doc_id % 3 parts per doc
    counts = parts.groupby("doc_id").size()
    for did, n in counts.items():
        assert n == 1 + did % 3
    # hole rule: n_rings == 2 iff (doc_id + part_i) % 4 == 0
    for _, r in parts.iterrows():
        assert (r.n_rings == 2) == ((r.doc_id + r.part_i) % 4 == 0)
    # bboxes are non-degenerate and ordered
    assert (parts.maxx > parts.minx).all() and (parts.maxy > parts.miny).all()


def test_segments_within_rings_concave_and_hole(spark):
    """Concave U + hole: endpoint-only membership is NOT sufficient —
    a segment spanning the notch has both endpoints inside but exits
    the region; a segment over the hole likewise."""
    import numpy as np

    from hope_graph_builder_spark.operators.geometry import edges_within_rings
    from hope_graph_builder_spark.spatial.kernels import segments_within_rings

    # U-shape: [0,100]×[0,100] minus notch [40,60]×[40,100]; hole [10,20]²
    u = np.array([
        [0, 0], [100, 0], [100, 100], [60, 100], [60, 40],
        [40, 40], [40, 100], [0, 100],
    ], float)
    hole = np.array([[10, 10], [20, 10], [20, 20], [10, 20]], float)
    x1 = np.array([30.0, 30.0, 5.0, 70.0, 30.0])
    y1 = np.array([80.0, 10.0, 15.0, 80.0, 30.0])
    x2 = np.array([80.0, 35.0, 15.0, 80.0, 70.0])
    y2 = np.array([80.0, 10.0, 15.0, 90.0, 30.0])
    got = segments_within_rings(x1, y1, x2, y2, [u, hole])
    # 0: spans the notch (both endpoints inside!) → NOT within
    # 1: fully in the left arm → within
    # 2: ends inside the hole → NOT within
    # 3: fully in the right arm → within
    # 4: y=30 passes BELOW the notch (notch starts at y=40) → within
    assert got.tolist() == [False, True, False, True, True]

    # same answers through the Spark operator
    df = spark.createDataFrame(
        [(i, float(a), float(b), float(c), float(d))
         for i, (a, b, c, d) in enumerate(zip(x1, y1, x2, y2))],
        "edge_id long, x1 double, y1 double, x2 double, y2 double",
    )
    rows = {r.edge_id: r.in_extent for r in edges_within_rings(df, [u, hole]).collect()}
    assert [rows[i] for i in range(5)] == [False, True, False, True, True]


def test_native_area_centroid_exprs(spark):
    """polygon_area_expr / polygon_centroid_expr (pure Column folds)
    vs the numpy shoelace kernel and known shapes."""
    import numpy as np
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators.geometry import (
        polygon_area_expr,
        polygon_centroid_expr,
    )
    from hope_graph_builder_spark.spatial.kernels import shoelace_area

    rng = np.random.RandomState(4)
    rows = [(0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 2.0, 2.0]),   # rect 4×2
            (1, [0.0, 3.0, 0.0], [0.0, 0.0, 3.0]),             # triangle
            (2, [1.0, 2.0], [1.0, 2.0])]                        # degenerate
    for k in range(3, 10):
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        r = rng.uniform(1, 9, 8)
        rows.append((k, (10 + r * np.cos(ang)).tolist(), (10 + r * np.sin(ang)).tolist()))
    df = spark.createDataFrame(rows, "rid long, xs array<double>, ys array<double>")
    cx, cy = polygon_centroid_expr(F.col("xs"), F.col("ys"))
    got = {r.rid: r for r in df.select(
        "rid", polygon_area_expr(F.col("xs"), F.col("ys")).alias("a"),
        cx.alias("cx"), cy.alias("cy")).collect()}
    assert got[0].a == 8.0 and got[0].cx == 2.0 and got[0].cy == 1.0
    assert got[1].a == 4.5 and abs(got[1].cx - 1.0) < 1e-12
    assert got[2].a == 0.0 and got[2].cx is None
    for rid, xs, ys in rows[3:]:
        ring = np.column_stack([xs, ys])
        assert abs(got[rid].a - shoelace_area(ring)) < 1e-9
