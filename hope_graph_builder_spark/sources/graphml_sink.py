"""S7: GraphML sink — writes (nodes, edges) tables as one GraphML file
in the igraph layout the reference emits (`/root/reference/src/common/
igraph.py:122-175` round-trips graphs through `Graph.write_graphml`;
every attribute is attr.type="string", typed on read by the converter
suite — `functions/graphml_types`).

Spark-first split: the per-row XML fragments are assembled as native
Column expressions (escaping + concat stay in whole-stage codegen,
distributed over however many partitions the graph has); only the
final file assembly streams those fragments through the driver with
``toLocalIterator`` — GraphML is a single-document EXCHANGE format, so
one writer must own the header/footer (same seam as the S6 scan:
convert once at the boundary, parquet everywhere else).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns"\n'
    '         xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"\n'
    '         xsi:schemaLocation="http://graphml.graphdrawing.org/xmlns\n'
    '         http://graphml.graphdrawing.org/xmlns/1.0/graphml.xsd">\n'
)


def xml_escape_expr(c: Column) -> Column:
    """&, <, > escaping for text content (& first — order matters)."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def xml_attr_escape_expr(c: Column) -> Column:
    """Attribute-position escaping: text escapes plus the quote."""
    return F.regexp_replace(xml_escape_expr(c), '"', "&quot;")


def _data_frag(key_id: str, col: str) -> Column:
    """<data> element, omitted entirely when the value is NULL (the
    scan reads absent data as NULL — round-trip-exact)."""
    return F.when(
        F.col(col).isNotNull(),
        F.concat(
            F.lit(f'      <data key="{key_id}">'),
            xml_escape_expr(F.col(col).cast("string")),
            F.lit("</data>\n"),
        ),
    ).otherwise(F.lit(""))


def node_xml_expr(node_id: str, attrs: dict[str, str]) -> Column:
    return F.concat(
        F.lit('    <node id="'),
        xml_attr_escape_expr(F.col(node_id).cast("string")),
        F.lit('">\n'),
        *[_data_frag(kid, col) for col, kid in attrs.items()],
        F.lit("    </node>"),
    )


def edge_xml_expr(source: str, target: str, attrs: dict[str, str]) -> Column:
    return F.concat(
        F.lit('    <edge source="'),
        xml_attr_escape_expr(F.col(source).cast("string")),
        F.lit('" target="'),
        xml_attr_escape_expr(F.col(target).cast("string")),
        F.lit('">\n'),
        *[_data_frag(kid, col) for col, kid in attrs.items()],
        F.lit("    </edge>"),
    )


def write_graphml(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    node_id: str = "node_id",
    source: str = "source",
    target: str = "target",
) -> dict[str, int]:
    """Write one GraphML document. Every non-key column becomes a
    string attribute (igraph layout: node keys ``v_<name>``, edge keys
    ``e_<name>``). Rows are emitted ordered by id for deterministic
    output. Returns counts for the caller's lineage record."""
    n_attrs = {c: f"v_{c}" for c in nodes.columns if c != node_id}
    e_attrs = {c: f"e_{c}" for c in edges.columns if c not in (source, target)}

    node_lines = (
        nodes.orderBy(F.col(node_id))
        .select(node_xml_expr(node_id, n_attrs).alias("x"))
    )
    edge_lines = (
        edges.orderBy(F.col(source), F.col(target))
        .select(edge_xml_expr(source, target, e_attrs).alias("x"))
    )

    n_nodes = n_edges = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write(_HEADER)
        for col, kid in n_attrs.items():
            f.write(f'  <key id="{kid}" for="node" attr.name="{col}" attr.type="string"/>\n')
        for col, kid in e_attrs.items():
            f.write(f'  <key id="{kid}" for="edge" attr.name="{col}" attr.type="string"/>\n')
        f.write('  <graph id="G" edgedefault="directed">\n')
        for row in node_lines.toLocalIterator():
            f.write(row["x"] + "\n")
            n_nodes += 1
        for row in edge_lines.toLocalIterator():
            f.write(row["x"] + "\n")
            n_edges += 1
        f.write("  </graph>\n</graphml>\n")
    return {"nodes": n_nodes, "edges": n_edges}
