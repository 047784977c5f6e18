"""S6: GraphML scan — reads the reference's own graph exchange files
(`/root/reference/src/common/igraph.py:122-175` reads them with
igraph; attribute values are ALL strings, typed on read by the
converter suite our `functions/graphml_types` re-expresses).

The XML parse runs driver-side (stdlib ElementTree): GraphML is an
EXCHANGE format — the production pattern is convert-once-to-parquet at
ingest and never re-parse (SURVEY.md §2.1); fixture-scale graphs
(thousands of edges) parse in milliseconds. The returned DataFrame is
immediately distributed; every downstream operator is a normal Spark
plan. For genuinely huge GraphML (which igraph itself could not load
either) the seam is the same: stream-convert to parquet, then scan.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://graphml.graphdrawing.org/xmlns}"


def read_graphml_edges(spark: SparkSession, path: str) -> DataFrame:
    """One row per <edge>: source, target, plus every declared edge
    attribute as a STRING column (GraphML stores strings; type with
    functions/graphml_types converters downstream)."""
    root = ET.parse(path).getroot()
    keys = {
        k.get("id"): k.get("attr.name")
        for k in root.iter(f"{_NS}key")
        if k.get("for") == "edge"
    }
    rows = []
    for e in root.iter(f"{_NS}edge"):
        row = {"source": e.get("source"), "target": e.get("target")}
        for d in e.iter(f"{_NS}data"):
            name = keys.get(d.get("key"))
            if name:
                row[name] = d.text if d.text is not None else ""
        rows.append(row)
    cols = ["source", "target", *keys.values()]
    data = [[r.get(c) for c in cols] for r in rows]
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(data, schema=schema)


def read_graphml_nodes(spark: SparkSession, path: str) -> DataFrame:
    root = ET.parse(path).getroot()
    keys = {
        k.get("id"): k.get("attr.name")
        for k in root.iter(f"{_NS}key")
        if k.get("for") == "node"
    }
    rows = []
    for n in root.iter(f"{_NS}node"):
        row = {"node_id": n.get("id")}
        for d in n.iter(f"{_NS}data"):
            name = keys.get(d.get("key"))
            if name:
                row[name] = d.text if d.text is not None else ""
        rows.append(row)
    cols = ["node_id", *keys.values()]
    data = [[r.get(c) for c in cols] for r in rows]
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(data, schema=schema)
