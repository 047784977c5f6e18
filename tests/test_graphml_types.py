"""F21 typed-converter round-trip over EVERY §1.2 attribute type —
the Spark twin of the reference's GraphML converter suite test
(`otp_graph_import_test.py:62-100` over `common/igraph.py:74-119`):
int, str, float, bool, three-valued dicts (None / {} / populated),
string-keyed dicts, tuples, WKT geometry — through the stringly
representation AND a parquet write/read."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def typed_edges(spark):
    rows = [
        Row(
            edge_id=0, name_otp="path", length=15.556, bike_safety_factor=1.6666666,
            is_stairs=False, allows_walking=True,
            noises={40: 2.5, 45: 0.75}, noise_source="road",
            noise_sources={"road": 3, "train": 1},
            uv=Row(u=196723, v=196724),
            geom_wkt="LINESTRING (25.03 60.277, 25.031 60.2769)",
        ),
        # the {} / '' no-noise state (igraph.py:62)
        Row(
            edge_id=1, name_otp="", length=0.0, bike_safety_factor=1.0,
            is_stairs=True, allows_walking=False,
            noises={}, noise_source="", noise_sources={},
            uv=Row(u=1, v=2), geom_wkt="LINESTRING EMPTY",
        ),
        # the None nodata state on every nullable attribute
        Row(
            edge_id=2, name_otp=None, length=None, bike_safety_factor=None,
            is_stairs=None, allows_walking=None,
            noises=None, noise_source=None, noise_sources=None,
            uv=None, geom_wkt=None,
        ),
    ]
    schema = (
        "edge_id bigint, name_otp string, length double, bike_safety_factor double, "
        "is_stairs boolean, allows_walking boolean, "
        "noises map<int,double>, noise_source string, noise_sources map<string,int>, "
        "uv struct<u:bigint,v:bigint>, geom_wkt string"
    )
    return spark.createDataFrame(rows, schema=schema)


def test_stringly_repr_matches_python_literals(typed_edges):
    """The sink side must emit exactly the reference's on-disk strings:
    Python dict/tuple/bool literals, 'None' nulls."""
    from hope_graph_builder_spark.functions.graphml_types import edge_to_strings

    s = {r["edge_id"]: r for r in edge_to_strings(typed_edges).collect()}
    assert s["0"]["noises"] == "{40: 2.5, 45: 0.75}"
    assert s["0"]["noise_sources"] == "{'road': 3, 'train': 1}"
    assert s["0"]["uv"] == "(196723, 196724)"
    assert s["0"]["is_stairs"] == "False" and s["0"]["allows_walking"] == "True"
    assert s["1"]["noises"] == "{}" and s["1"]["noise_sources"] == "{}"
    assert s["2"]["noises"] == "None" and s["2"]["uv"] == "None"
    assert s["2"]["length"] == "None" and s["2"]["is_stairs"] == "None"


def test_round_trip_all_types_through_parquet(typed_edges, spark, tmp_path):
    from hope_graph_builder_spark.functions.graphml_types import (
        edge_from_strings,
        edge_to_strings,
    )

    path = str(tmp_path / "graphml_equiv.parquet")
    edge_to_strings(typed_edges).write.mode("overwrite").parquet(path)
    back = edge_from_strings(spark.read.parquet(path))

    assert back.schema == typed_edges.schema
    # exact row equality both ways (maps compared via sorted entries)
    def canon(df):
        return df.select(
            "edge_id", "name_otp", "length", "bike_safety_factor",
            "is_stairs", "allows_walking",
            F.to_json(F.col("noises")).alias("noises"),
            "noise_source",
            F.to_json(F.col("noise_sources")).alias("noise_sources"),
            F.col("uv").cast("string").alias("uv"),
            "geom_wkt",
        )

    a, b = canon(typed_edges), canon(back)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # three-valued semantics survive: None, {}, populated are distinct
    states = {
        r["edge_id"]: (r["noises"] is None, r["noises"] == {} if r["noises"] is not None else None)
        for r in back.collect()
    }
    assert states[0] == (False, False)
    assert states[1] == (False, True)
    assert states[2] == (True, None)


def test_graphml_sink_roundtrip_real_fixture(spark, tmp_path):
    """S7: write_graphml → our own S6 scan reproduces the reference's
    REAL test_graph.graphml tables exactly (3522 edges incl. dict-repr
    attribute strings with quotes and braces)."""
    import os

    from hope_graph_builder_spark.sources.graphml import (
        read_graphml_edges,
        read_graphml_nodes,
    )
    from hope_graph_builder_spark.sources.graphml_sink import write_graphml

    src = "/root/reference/src/test/data/test_graph.graphml"
    if not os.path.isfile(src):
        pytest.skip("reference fixture not present")
    nodes = read_graphml_nodes(spark, src)
    edges = read_graphml_edges(spark, src)
    out = str(tmp_path / "roundtrip.graphml")
    counts = write_graphml(nodes, edges, out)
    assert counts["nodes"] == nodes.count() and counts["edges"] == edges.count()

    nodes2 = read_graphml_nodes(spark, out)
    edges2 = read_graphml_edges(spark, out)
    assert sorted(nodes2.columns) == sorted(nodes.columns)
    assert sorted(edges2.columns) == sorted(edges.columns)
    for a, b in ((nodes, nodes2), (edges, edges2)):
        a = a.select(*sorted(a.columns))
        b = b.select(*sorted(a.columns))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_graphml_sink_escaping_and_nulls(spark, tmp_path):
    """Adversarial values: XML metacharacters, dict-reprs, empty
    strings, and NULLs (NULL attr → omitted <data> → NULL on re-read;
    '' → empty element → '' on re-read — distinct states preserved)."""
    from pyspark.sql import Row

    from hope_graph_builder_spark.sources.graphml import (
        read_graphml_edges,
        read_graphml_nodes,
    )
    from hope_graph_builder_spark.sources.graphml_sink import write_graphml

    nodes = spark.createDataFrame(
        [
            Row(node_id="n<>&\"1", attr="a & b < c > d"),
            Row(node_id="n2", attr="{'road': 2.5, \"x\": '<&>'}"),
            Row(node_id="n3", attr=""),
            Row(node_id="n4", attr=None),
        ]
    )
    edges = spark.createDataFrame(
        [
            Row(source="n<>&\"1", target="n2", w="1.5", tag="<tag>&amp;</tag>"),
            Row(source="n3", target="n4", w=None, tag=""),
        ]
    )
    out = str(tmp_path / "esc.graphml")
    write_graphml(nodes, edges, out)
    n2 = read_graphml_nodes(spark, out)
    e2 = read_graphml_edges(spark, out)
    assert {tuple(r) for r in n2.collect()} == {tuple(r) for r in nodes.collect()}
    assert {tuple(r) for r in e2.collect()} == {tuple(r) for r in edges.collect()}


def test_graphml_sink_fragment_path_byte_identical(spark, tmp_path):
    """Scale guard: with max_driver_rows=0 the sink switches to the
    distributed fragment path (range-sorted text fragments + driver
    file concat). Output must be BYTE-identical to the driver-funnel
    path — same global order, same escaping — and round-trip through
    the S6 scan."""
    import os

    from hope_graph_builder_spark.sources.graphml import (
        read_graphml_edges,
        read_graphml_nodes,
    )
    from hope_graph_builder_spark.sources.graphml_sink import write_graphml

    src = "/root/reference/src/test/data/test_graph.graphml"
    if not os.path.isfile(src):
        pytest.skip("reference fixture not present")
    nodes = read_graphml_nodes(spark, src)
    edges = read_graphml_edges(spark, src)
    a = str(tmp_path / "driver.graphml")
    b = str(tmp_path / "frag.graphml")
    ca = write_graphml(nodes, edges, a)
    cb = write_graphml(nodes, edges, b, max_driver_rows=0)
    assert ca["fragmented"] == 0 and cb["fragmented"] == 1
    assert cb["nodes"] == nodes.count() and cb["edges"] == edges.count()
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()
    n2 = read_graphml_nodes(spark, b)
    assert n2.count() == nodes.count()
