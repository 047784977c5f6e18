"""Edge sampling-point generation — native Column re-expression of the
reference's per-edge Shapely interpolation
(`/root/reference/src/noise_graph_join/utils.py:15-56`).

Reference semantics reproduced exactly:
- sample_count = round(length / interval)  (Python banker's round →
  Spark ``bround``), 0 → 1                         (utils.py:27-28)
- sample positions at normalized fracs (i + 0.5) / n (utils.py:15-21)
- sample_len = length / n                          (utils.py:46; the
  reference also rounds to 10 dp — dropped here as a documented
  deviation: 10-dp banker's rounding of arbitrary doubles is not
  reproducible bit-for-bit across engines, and the raw IEEE quotient
  is both exact and deterministic)
- xy_id from coords rounded to 0.1 m (banker's)    (utils.py:61)

Deviation (documented): the reference's xy_id is the string
f"{round(x,1)}_{round(y,1)}"; ours is the integer
bround(x,1)*10 * 10^7 + bround(y,1)*10 — same quantization, same
dedup equivalence classes, but joinable as a long (cheaper shuffle
key at 100 TB than a string).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLING_INTERVAL_M = 3.0  # reference noise_graph_join.py:28


def sample_edges(
    edges: DataFrame,
    interval: float = SAMPLING_INTERVAL_M,
    edge_id: str = "edge_id",
    index_col: str | None = None,
) -> DataFrame:
    """2-vertex edges (x1,y1,x2,y2,length) → sample points
    (edge_id, sample_len, x, y). Pure Column arithmetic: sequence +
    explode replaces the reference's row_accumulator loop
    (utils.py:38-56)."""
    # rint = IEEE half-even on the double — same banker's semantics as
    # bround at scale 0 (validated vs DuckDB round_even on 500k values)
    # without bround's per-row BigDecimal allocation
    n = F.greatest(F.lit(1).cast("long"), F.rint(F.col("length") / F.lit(interval)).cast("long"))
    df = (
        edges.withColumn("_n", n)
        .withColumn("sample_len", F.col("length") / F.col("_n"))
        .withColumn("_i", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n") - 1)))
        .withColumn("_frac", (F.col("_i") + F.lit(0.5)) / F.col("_n"))
    )
    extra = [F.col("_i").alias(index_col)] if index_col else []
    return df.select(
        edge_id,
        "sample_len",
        *extra,
        (F.col("x1") + (F.col("x2") - F.col("x1")) * F.col("_frac")).alias("x"),
        (F.col("y1") + (F.col("y2") - F.col("y1")) * F.col("_frac")).alias("y"),
    )


def sample_polyline(
    edges: DataFrame,
    interval: float = SAMPLING_INTERVAL_M,
    edge_id: str = "edge_id",
    xs: str = "xs",
    ys: str = "ys",
    index_col: str | None = None,
) -> DataFrame:
    """Multi-vertex LineString edges (edge_id, xs array<double>,
    ys array<double>) → sample points (edge_id, sample_len, x, y) —
    the general form of the reference's Shapely ``interpolate`` walk
    over arbitrary polylines (noise_graph_join/utils.py:23-30).
    ``sample_edges`` stays the 2-vertex fast path (same semantics,
    asserted in tests).

    Entirely native higher-order Column functions (no UDF):
    per-segment lengths → running-sum boundaries (left fold, same
    association order as the DuckDB oracle ⇒ bit-identical doubles) →
    sequence+explode of sample indices → locate the segment whose
    cumulative span covers the target distance → linear interpolation
    within it. Vertex counts on street edges are small (tens), so the
    O(n²) slice-folds stay in whole-stage codegen and beat any Arrow
    round-trip."""

    def fold_sum(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)

    nseg = F.size(xs) - 1
    seg = F.transform(
        F.sequence(F.lit(1), nseg),
        lambda i: F.sqrt(
            (F.element_at(F.col(xs), (i + 1).cast("int")) - F.element_at(F.col(xs), i.cast("int")))
            * (F.element_at(F.col(xs), (i + 1).cast("int")) - F.element_at(F.col(xs), i.cast("int")))
            + (F.element_at(F.col(ys), (i + 1).cast("int")) - F.element_at(F.col(ys), i.cast("int")))
            * (F.element_at(F.col(ys), (i + 1).cast("int")) - F.element_at(F.col(ys), i.cast("int")))
        ),
    )
    df = edges.withColumn("_seg", seg)
    cums = F.transform(
        F.sequence(F.lit(1), F.size("_seg")),
        lambda i: fold_sum(F.slice("_seg", F.lit(1), i)),
    )
    df = (
        df.withColumn("_cum", cums)
        .withColumn("_len", F.element_at("_cum", -1))
        .withColumn(
            "_n",
            F.greatest(F.lit(1).cast("long"), F.rint(F.col("_len") / F.lit(interval)).cast("long")),
        )
        .withColumn("sample_len", F.col("_len") / F.col("_n"))
        .withColumn("_i", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n") - 1)))
        .withColumn("_d", (F.col("_i") + F.lit(0.5)) / F.col("_n") * F.col("_len"))
    )
    # segment index (1-based): 1 + #interior boundaries ≤ d (the last
    # boundary == length is excluded so d never lands past the end)
    j = (
        F.lit(1)
        + F.size(
            F.filter(
                F.slice("_cum", F.lit(1), F.size("_cum") - 1),
                lambda c: c <= F.col("_d"),
            )
        )
    ).cast("int")
    # zero-length segment (repeated consecutive vertices) ⇒ snap to the
    # segment start instead of dividing 0/0 into NaN
    seg_j = F.element_at("_seg", F.col("_j"))
    df = df.withColumn("_j", j).withColumn(
        "_t",
        F.when(
            seg_j > 0,
            (
                F.col("_d")
                - F.when(F.col("_j") == 1, F.lit(0.0)).otherwise(
                    F.element_at("_cum", F.col("_j") - 1)
                )
            )
            / seg_j,
        ).otherwise(F.lit(0.0)),
    )
    extra = [F.col("_i").alias(index_col)] if index_col else []
    return df.select(
        edge_id,
        "sample_len",
        *extra,
        (
            F.element_at(F.col(xs), F.col("_j"))
            + (F.element_at(F.col(xs), F.col("_j") + 1) - F.element_at(F.col(xs), F.col("_j")))
            * F.col("_t")
        ).alias("x"),
        (
            F.element_at(F.col(ys), F.col("_j"))
            + (F.element_at(F.col(ys), F.col("_j") + 1) - F.element_at(F.col(ys), F.col("_j")))
            * F.col("_t")
        ).alias("y"),
    )


def polyline_length_expr(xs: str = "xs", ys: str = "ys") -> Column:
    """F3 general polyline length as one native fold."""
    nseg = F.size(xs) - 1
    seg = F.transform(
        F.sequence(F.lit(1), nseg),
        lambda i: F.sqrt(
            (F.element_at(F.col(xs), (i + 1).cast("int")) - F.element_at(F.col(xs), i.cast("int")))
            * (F.element_at(F.col(xs), (i + 1).cast("int")) - F.element_at(F.col(xs), i.cast("int")))
            + (F.element_at(F.col(ys), (i + 1).cast("int")) - F.element_at(F.col(ys), i.cast("int")))
            * (F.element_at(F.col(ys), (i + 1).cast("int")) - F.element_at(F.col(ys), i.cast("int")))
        ),
    )
    return F.aggregate(seg, F.lit(0.0), lambda a, x: a + x)


def xy_id_expr(x: Column, y: Column) -> Column:
    """Quantized-location surrogate key (reference utils.py:58-65):
    coords rounded to 0.1 m (banker's, on the ×10-scaled double via
    rint — pure FP, no BigDecimal) packed into one long."""
    qx = F.rint(x * F.lit(10.0)).cast("long")
    qy = F.rint(y * F.lit(10.0)).cast("long")
    return qx * F.lit(10_000_000).cast("long") + qy


def with_xy_id(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    return df.withColumn("xy_id", xy_id_expr(F.col(x), F.col(y)))


def ring_points(
    points: DataFrame,
    radius: float = 7.0,
    count: int = 20,
    keep: list[str] | None = None,
    index_col: str | None = None,
) -> DataFrame:
    """k offset sampling points on a circle around each input point —
    the kNN-interpolation ring (reference utils.py:89-96; r=7, k=20 at
    noise_graph_join.py:75). Native trig, sequence + explode.
    ``index_col`` optionally exposes the ring-point index 0..count-1."""
    keep = keep or ["xy_id"]
    theta = (
        F.lit(2.0 * 3.141592653589793)
        * (F.col("_i") + F.lit(0.5))
        / F.lit(float(count))
    )
    extra = [F.col("_i").alias(index_col)] if index_col else []
    return (
        points.withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(count - 1))))
        .select(
            *keep,
            *extra,
            (F.col("x") + F.lit(float(radius)) * F.cos(theta)).alias("x"),
            (F.col("y") + F.lit(float(radius)) * F.sin(theta)).alias("y"),
        )
    )
