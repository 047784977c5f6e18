"""Row-wise scalar functions from the export/GVI modules (reference
§2.7), as native Column expressions — the reference computes all of
these with per-row ``df.apply`` lambdas.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def noise_bucket(db: Column) -> Column:
    """F12 (graph_export/utils.py:44-52): ≥70→70, ≥65→65, ≥60→60,
    ≥55→55, ≥50→50, ≥45→45, else 40."""
    return (
        F.when(db >= 70, 70)
        .when(db >= 65, 65)
        .when(db >= 60, 60)
        .when(db >= 55, 55)
        .when(db >= 50, 50)
        .when(db >= 45, 45)
        .otherwise(40)
    )


def total_noise_len(noises: Column) -> Column:
    """Σ noises.values() (graph_export/utils.py:10-16)."""
    return F.aggregate(F.map_values(noises), F.lit(0.0), lambda a, x: a + x)


def residual_db40(noises: Column, length: Column) -> Column:
    """F14 (graph_export/utils.py:19-32): exposure not covered by any
    dB class goes to class 40: length − Σ values if > 0."""
    resid = length - total_noise_len(noises)
    return F.when(resid > 0, resid).otherwise(F.lit(0.0))


def noises_with_db40(noises: Column, length: Column) -> Column:
    """map_concat of the residual-40 entry (only when positive)."""
    resid = residual_db40(noises, length)
    with40 = F.map_concat(
        noises, F.map_from_arrays(F.array(F.lit(40)), F.array(resid))
    )
    return F.when(resid > 0, with40).otherwise(noises)


def mean_noise_level(noises: Column, length: Column) -> Column:
    """F13 (graph_export/utils.py:35-41):
    round(Σ((db + 2.5) · len) / length, 1)."""
    s = F.aggregate(
        F.map_entries(noises),
        F.lit(0.0),
        lambda a, e: a + (e["key"].cast("double") + F.lit(2.5)) * e["value"],
    )
    return F.bround(s / length, 1)


def biking_length(length: Column, bike_safety_factor: Column) -> Column:
    """F15 (graph_export/graph_export.py:28-32):
    round(length · factor, 3)."""
    return F.bround(length * bike_safety_factor, 3)


def geojson_line_feature(
    edge_id: Column, x1: Column, y1: Column, x2: Column, y2: Column, props: dict[str, Column]
) -> Column:
    """F20/S11 (graph_export/utils.py:60-92,110-175): line-delimited
    GeoJSON feature via to_json(struct(...)) — no string assembly."""
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("LineString").alias("type"),
                F.array(F.array(x1, y1), F.array(x2, y2)).alias("coordinates"),
            ).alias("geometry"),
            F.struct(edge_id.alias("id"), *[c.alias(k) for k, c in props.items()]).alias(
                "properties"
            ),
        )
    )
