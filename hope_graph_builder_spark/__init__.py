"""hope_graph_builder_spark — a from-scratch PySpark-native spatial-join +
tiling engine re-expressing the query semantics of
DigitalGeographyLab/hope-graph-builder (reference at /root/reference).

Design stance (SURVEY.md §7):
- DataFrame/SQL first; Catalyst is the planner. No RDDs.
- All tiling (cell ids, polygon covers) is *native Column expressions*
  (floor / bit-packing / sequence+explode) so it stays inside
  whole-stage codegen and the joins are plain equi-joins Catalyst can
  broadcast / shuffle / AQE-skew-split.
- Geometry kernels (point-in-polygon on general rings, point-segment
  distance, polyline interpolation) are vectorized numpy inside
  Arrow-batched pandas UDFs. No per-row Python UDFs anywhere.
- Geometry interchange format: WKB in BinaryType columns
  (spatial/wkb.py); hot paths carry plain coordinate columns.
"""

__version__ = "0.1.0"
