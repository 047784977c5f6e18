"""Golden tests on the reference's REAL noise-join fixtures
(test_graph.graphml + noise_csv/ — data only, not code), porting the
assertions of `noise_graph_join_test.py`:

- sampling-point generation at interval 2 m over the real street
  geometries: 3522 edges sampled / 180 empty-geometry edges skipped,
  58554 total samples, per-edge Σ sample_len == geometry length (:38-60)
- the noise_graph_update stage: 3702 edges, three-valued coupling
  invariants, and — through OUR dict-repr codec on the reference's own
  CSV — the exact published main-source frequencies
  {'road': 2322, 'train': 1198, '': 2} and mean total noise length
  33.20 (:100-110). (The full spatial join golden needs
  noise_data_processed.gpkg, which the reference repo does not ship.)
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

REF = "/root/reference/src/test"
GRAPHML = f"{REF}/data/test_graph.graphml"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(GRAPHML), reason="reference fixture not present"
)


@pytest.fixture(scope="module")
def graph_edges(spark):
    from hope_graph_builder_spark.sources.graphml import read_graphml_edges

    return read_graphml_edges(spark, GRAPHML).localCheckpoint()


@pytest.fixture(scope="module")
def polylines(spark, graph_edges):
    """LineString edges → (id_ig, xs, ys) coordinate arrays (projected
    CRS, as stored in the reference graph)."""
    from typing import Iterator

    import pandas as pd

    from hope_graph_builder_spark.spatial.wkt import parse_linestring_np

    src = graph_edges.filter(F.col("geom").startswith("LINESTRING (")).select(
        F.col("ii").cast("long").alias("id_ig"), "geom"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs, ys = [], []
            for w in pdf["geom"]:
                c = parse_linestring_np(w)
                xs.append(c[:, 0].tolist())
                ys.append(c[:, 1].tolist())
            yield pd.DataFrame({"id_ig": pdf["id_ig"], "xs": xs, "ys": ys})

    return src.mapInPandas(
        op, schema="id_ig long, xs array<double>, ys array<double>"
    ).localCheckpoint()


def test_golden_sampling_counts(spark, graph_edges, polylines):
    """noise_graph_join_test.py:38-56: at 2 m interval, 3522 edges get
    sampling points (the 180 GEOMETRYCOLLECTION EMPTY edges none), and
    the exploded sample table has exactly 58554 rows."""
    from hope_graph_builder_spark.operators.sampling import sample_polyline

    assert graph_edges.count() == 3702
    empty = graph_edges.filter(~F.col("geom").startswith("LINESTRING (")).count()
    assert empty == 180
    assert polylines.count() == 3522

    samples = sample_polyline(polylines, interval=2.0, edge_id="id_ig")
    assert samples.count() == 58554


def test_golden_sampling_lengths(spark, polylines):
    """noise_graph_join_test.py:53-60: per edge, Σ sample_len equals
    the geometry length to 1e-5 (reference assertAlmostEqual places=5)."""
    from hope_graph_builder_spark.operators.sampling import (
        polyline_length_expr,
        sample_polyline,
    )

    samples = sample_polyline(polylines, interval=2.0, edge_id="id_ig")
    sums = samples.groupBy("id_ig").agg(F.sum("sample_len").alias("s"))
    lens = polylines.select("id_ig", polyline_length_expr("xs", "ys").alias("len"))
    bad = (
        sums.join(lens, "id_ig")
        .filter(F.abs(F.col("s") - F.col("len")) > 1e-5)
        .count()
    )
    assert bad == 0


def test_golden_noise_update(spark, graph_edges):
    """noise_graph_join_test.py:100-110 + the noise_graph_update test:
    defaults + CSV write-back on the real fixture. The CSV's dict-repr
    strings go through OUR GraphML-equivalent codec; the published
    frequencies and mean must come out exactly."""
    from hope_graph_builder_spark.pipelines.noise_update import (
        noise_graph_update,
        read_edge_noise_csv,
        set_default_and_na_edge_noises,
    )
    from hope_graph_builder_spark.spatial.crs import lonlat_to_gk_np
    from hope_graph_builder_spark.spatial.kernels import points_in_ring
    from hope_graph_builder_spark.spatial.wkt import parse_linestring_np

    # extent membership: every LineString edge's vertices lie inside the
    # projected HMA ring (verified below on a sample), so within ⇔
    # has-geometry — the reference test relies on the same fact
    # (noise_graph_join_test.py:139 'this will fail if some of the
    # edges are outside the noise data extent')
    hma = json.load(open(f"{REF}/data/HMA.geojson"))
    ring_ll = np.asarray(hma["features"][0]["geometry"]["coordinates"][0])
    hx, hy = lonlat_to_gk_np(ring_ll[:, 0], ring_ll[:, 1])
    ring = np.column_stack([hx, hy])
    some = [
        r["geom"]
        for r in graph_edges.filter(F.col("geom").startswith("LINESTRING ("))
        .limit(200).collect()
    ]
    verts = np.vstack([parse_linestring_np(w) for w in some])
    assert points_in_ring(verts[:, 0], verts[:, 1], ring).all()

    edges = graph_edges.select(
        F.col("ii").cast("long").alias("id_ig"),
        F.col("geom").startswith("LINESTRING (").alias("in_extent"),
    )
    noises_csv = read_edge_noise_csv(spark, f"{REF}/noise_csv/3701_edge_noises.csv")
    out = noise_graph_update(
        set_default_and_na_edge_noises(edges), noises_csv
    ).localCheckpoint()

    assert out.count() == 3702

    # three-valued coupling invariants (noise_graph_join_test.py:141-166)
    bad = out.filter(
        (F.col("noises").isNull() != F.col("noise_source").isNull())
        | (F.col("noises").isNotNull() & (F.size("noises") == 0)
           & (F.col("noise_source") != ""))
        | ((F.size("noises") > 0) & (F.col("noise_source") == ""))
    ).count()
    assert bad == 0
    # nodata exactly on the 180 empty-geometry edges
    assert out.filter(F.col("noises").isNull()).count() == 180

    # exact published main-source frequencies (:110)
    freq = {
        r["noise_source"]: r["cnt"]
        for r in out.filter(F.col("noises").isNotNull())
        .groupBy("noise_source").agg(F.count("*").alias("cnt")).collect()
    }
    assert freq == {"road": 2322, "train": 1198, "": 2}

    # mean total noise length 33.20 at 2 dp (:108): round(Σ values, 4)
    # per edge, averaged over the 3522 joined edges
    totals = out.filter(F.size("noises") >= 0).join(
        noises_csv.select("id_ig"), "id_ig", "left_semi"
    ).select(
        F.round(
            F.aggregate(F.map_values("noises"), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("t")
    )
    mean_total = totals.agg(F.avg("t")).collect()[0][0]
    assert abs(mean_total - 33.20) <= 0.005


def test_golden_ring_sampling_std():
    """noise_graph_join_test.py:62-69: 20 ring points at r=40; std of
    distances from one ring point to all others ≈ 24.812. The reference
    samples a POLYGONAL buffer boundary (Shapely, 64-segment circle);
    our ring is the exact circle — std 24.836, within 0.05 of the
    published value (the residual is the polygon approximation, not
    sampling logic). Exact-circle invariants asserted tightly."""
    from hope_graph_builder_spark.spatial.kernels import ring_points

    sps = ring_points(25501668.9, 6684943.1, 40.0, 20)
    assert len(sps) == 20
    d_center = np.sqrt(((sps - [25501668.9, 6684943.1]) ** 2).sum(axis=1))
    assert np.abs(d_center - 40.0).max() < 1e-6  # all exactly on the circle
    d = np.sqrt(((sps - sps[-1]) ** 2).sum(axis=1))
    assert abs(np.std(d) - 24.812) < 0.05


@pytest.mark.parametrize(
    "length,expected",
    [(10.0, 0.5), (5.0, 0.5), (40.0, 0.5), (70.0, 0.5), (80.0, None)],
)
def test_golden_gvi_gated_mean(spark, length, expected):
    """green_view_join_v1_test.py:69-80 (get_mean_edge_gsv_gvi golden):
    GVI list [0.5, 1, 0] against edge lengths 10/5/40/70 → 0.5; at
    length 80 the required sample count (floor(80/10·0.5) = 4) exceeds
    the 3 samples → None. Run through the FULL DataFrame pipeline
    (dwithin join + gated mean), not a scalar helper."""
    from hope_graph_builder_spark.pipelines.green_view import gvi_mean_per_edge

    edges = spark.createDataFrame(
        [(1, 0.0, 0.0, length, 0.0, length)],
        "edge_id long, x1 double, y1 double, x2 double, y2 double, length double",
    )
    pts = spark.createDataFrame(
        [(1, 1.0, 5.0, 0.5), (2, 2.0, 5.0, 1.0), (3, 3.0, 5.0, 0.0)],
        "gvi_id long, x double, y double, GVI double",
    )
    rows = gvi_mean_per_edge(edges, pts, res=6).collect()
    assert len(rows) == 1 and rows[0]["n"] == 3
    assert rows[0]["mean_gvi"] == expected
