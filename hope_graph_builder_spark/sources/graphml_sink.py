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


# Above this many total rows the per-row toLocalIterator funnel is the
# wrong tool (one process renders every row): the sink switches to the
# distributed fragment path — executors write globally range-sorted
# text fragments, the driver only CONCATENATES files (bounded memory,
# streamed), never rendering rows itself.
MAX_DRIVER_ROWS = 1_000_000
_FRAGMENT_ROWS = 500_000  # target rows per fragment file


def _write_fragments(lines: DataFrame, sort_cols: list[str], out_dir: str,
                     n_rows: int) -> list[str]:
    """Write ``lines`` (sort cols + ``x`` string) as globally ordered
    text fragments: range-partition on the sort key, sort within each
    partition, drop the key, write with the built-in text sink. Part
    files come back in range order (part-00000 holds the lowest key
    range), so concatenating them in name order reproduces the exact
    global orderBy stream."""
    import glob

    parts = max(1, min(256, -(-n_rows // _FRAGMENT_ROWS)))
    (
        lines.repartitionByRange(parts, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .select("x")
        .write.mode("overwrite")
        .text(out_dir)
    )
    return sorted(glob.glob(f"{out_dir}/part-*"))


def write_graphml(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    node_id: str = "node_id",
    source: str = "source",
    target: str = "target",
    max_driver_rows: int = MAX_DRIVER_ROWS,
) -> dict[str, int]:
    """Write one GraphML document. Every non-key column becomes a
    string attribute (igraph layout: node keys ``v_<name>``, edge keys
    ``e_<name>``). Rows are emitted ordered by id for deterministic
    output. Returns counts for the caller's lineage record.

    Scale: up to ``max_driver_rows`` total rows the driver streams rows
    via toLocalIterator; beyond that it switches to the fragment path
    (distributed sorted text fragments + driver file concat) — byte
    identical output, and the driver never touches a row."""
    import shutil
    import tempfile

    n_attrs = {c: f"v_{c}" for c in nodes.columns if c != node_id}
    e_attrs = {c: f"e_{c}" for c in edges.columns if c not in (source, target)}

    node_lines = nodes.select(
        F.col(node_id).alias("_k1"),
        node_xml_expr(node_id, n_attrs).alias("x"),
    )
    edge_lines = edges.select(
        F.col(source).alias("_k1"),
        F.col(target).alias("_k2"),
        edge_xml_expr(source, target, e_attrs).alias("x"),
    )

    n_nodes = nodes.count()
    n_edges = edges.count()
    fragmented = (n_nodes + n_edges) > max_driver_rows

    with open(path, "w", encoding="utf-8") as f:
        f.write(_HEADER)
        for col, kid in n_attrs.items():
            f.write(f'  <key id="{kid}" for="node" attr.name="{col}" attr.type="string"/>\n')
        for col, kid in e_attrs.items():
            f.write(f'  <key id="{kid}" for="edge" attr.name="{col}" attr.type="string"/>\n')
        f.write('  <graph id="G" edgedefault="directed">\n')
        if fragmented:
            tmp = tempfile.mkdtemp(prefix="graphml_frag_")
            try:
                for part in _write_fragments(
                    node_lines, ["_k1"], f"{tmp}/nodes", n_nodes
                ) + _write_fragments(
                    edge_lines, ["_k1", "_k2"], f"{tmp}/edges", n_edges
                ):
                    with open(part, "r", encoding="utf-8") as src:
                        shutil.copyfileobj(src, f)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        else:
            for row in node_lines.orderBy("_k1").select("x").toLocalIterator():
                f.write(row["x"] + "\n")
            for row in edge_lines.orderBy("_k1", "_k2").select("x").toLocalIterator():
                f.write(row["x"] + "\n")
        f.write("  </graph>\n</graphml>\n")
    return {"nodes": n_nodes, "edges": n_edges, "fragmented": int(fragmented)}
