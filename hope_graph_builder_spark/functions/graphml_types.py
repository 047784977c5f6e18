"""F21/S6/S7: the GraphML-equivalent typed attribute codec.

The reference stores EVERY graph attribute as a string in GraphML and
re-types on read with per-attribute converters — 'None' encodes null,
dicts/tuples are Python literals parsed with ast.literal_eval, booleans
are 'True'/'False', geometry is WKT
(`/root/reference/src/common/igraph.py:74-119`, round-trip asserted at
`otp_graph_import_test.py:62-100`).

Spark twin: the graph stays a DataFrame; this module converts a typed
edge table to the same stringly representation (`edge_to_strings`) and
back (`edge_from_strings`) with NATIVE Column expressions only — the
dict-repr → JSON translation is two regexp_replaces feeding from_json,
so the codec runs in whole-stage codegen, no UDFs. Every §1.2 type is
covered: int, float, str, bool, three-valued dict (None / {} /
populated), str-keyed dict, tuple, WKT geometry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NONE = "None"


def _nullable(col: Column, s: Column) -> Column:
    return F.when(col.isNull(), F.lit(NONE)).otherwise(s)


def scalar_to_str(col: Column) -> Column:
    """int/float/str → str; null → 'None' (igraph.py:74-80)."""
    return _nullable(col, col.cast("string"))


def bool_to_str(col: Column) -> Column:
    """Python bool repr 'True'/'False' (igraph.py:82-83)."""
    return _nullable(col, F.when(col, F.lit("True")).otherwise(F.lit("False")))


def int_map_to_str(col: Column) -> Column:
    """map<int,double> → Python dict literal '{40: 2.5, 45: 0.75}';
    None → 'None', empty → '{}' (the noises three-state, igraph.py:62)."""
    body = F.concat_ws(
        ", ",
        F.transform(
            F.map_entries(col),
            lambda e: F.concat(e["key"].cast("string"), F.lit(": "), e["value"].cast("string")),
        ),
    )
    return _nullable(col, F.concat(F.lit("{"), body, F.lit("}")))


def str_map_to_str(col: Column) -> Column:
    """map<string,int> → "{'road': 3, 'train': 1}" (noise_sources)."""
    body = F.concat_ws(
        ", ",
        F.transform(
            F.map_entries(col),
            lambda e: F.concat(F.lit("'"), e["key"], F.lit("': "), e["value"].cast("string")),
        ),
    )
    return _nullable(col, F.concat(F.lit("{"), body, F.lit("}")))


def tuple_to_str(u: Column, v: Column) -> Column:
    """uv tuple → '(1, 2)' (igraph.py:86-87)."""
    return F.when(u.isNull() | v.isNull(), F.lit(NONE)).otherwise(
        F.concat(F.lit("("), u.cast("string"), F.lit(", "), v.cast("string"), F.lit(")"))
    )


def str_from(col: Column, typ: str) -> Column:
    """'None'-aware typed scalar parse (to_str/to_int/to_float)."""
    return F.when(col == NONE, F.lit(None).cast(typ)).otherwise(col.cast(typ))


def bool_from(col: Column) -> Column:
    return F.when(col == NONE, F.lit(None).cast("boolean")).otherwise(col == "True")


def int_map_from(col: Column) -> Column:
    """dict-repr with integer keys → map<int,double>: quote the keys,
    from_json as string-keyed (JSON map keys are strings), then
    transform_keys back to int. '{}' → empty map, 'None' → NULL."""
    jsonish = F.regexp_replace(col, r"(\d+):", r'"$1":')
    parsed = F.from_json(jsonish, "map<string,double>")
    return F.when(col == NONE, F.lit(None).cast("map<int,double>")).otherwise(
        F.transform_keys(parsed, lambda k, _: k.cast("int"))
    )


def str_map_from(col: Column) -> Column:
    """dict-repr with single-quoted string keys → map<string,int>."""
    jsonish = F.regexp_replace(col, "'", '"')
    return F.when(col == NONE, F.lit(None).cast("map<string,int>")).otherwise(
        F.from_json(jsonish, "map<string,int>")
    )


def tuple_from(col: Column) -> Column:
    """'(1, 2)' → struct<u:long, v:long>."""
    u = F.regexp_extract(col, r"\((-?\d+), (-?\d+)\)", 1)
    v = F.regexp_extract(col, r"\((-?\d+), (-?\d+)\)", 2)
    return F.when(col == NONE, F.lit(None).cast("struct<u:bigint,v:bigint>")).otherwise(
        F.struct(u.cast("long").alias("u"), v.cast("long").alias("v"))
    )


# typed edge table ⇄ stringly table (the GraphML-file equivalent) ------------

_SCALARS = {"edge_id": "bigint", "name_otp": "string", "length": "double",
            "bike_safety_factor": "double"}
_BOOLS = ["is_stairs", "allows_walking"]


def edge_to_strings(df: DataFrame) -> DataFrame:
    """Typed edge attributes → all-string columns (S7 sink side)."""
    return df.select(
        *[scalar_to_str(F.col(c)).alias(c) for c in _SCALARS],
        *[bool_to_str(F.col(c)).alias(c) for c in _BOOLS],
        int_map_to_str(F.col("noises")).alias("noises"),
        scalar_to_str(F.col("noise_source")).alias("noise_source"),
        str_map_to_str(F.col("noise_sources")).alias("noise_sources"),
        tuple_to_str(F.col("uv.u"), F.col("uv.v")).alias("uv"),
        scalar_to_str(F.col("geom_wkt")).alias("geom_wkt"),
    )


def edge_from_strings(df: DataFrame) -> DataFrame:
    """All-string columns → typed edge attributes (S6 scan side)."""
    return df.select(
        *[str_from(F.col(c), t).alias(c) for c, t in _SCALARS.items()],
        *[bool_from(F.col(c)).alias(c) for c in _BOOLS],
        int_map_from(F.col("noises")).alias("noises"),
        str_from(F.col("noise_source"), "string").alias("noise_source"),
        str_map_from(F.col("noise_sources")).alias("noise_sources"),
        tuple_from(F.col("uv")).alias("uv"),
        str_from(F.col("geom_wkt"), "string").alias("geom_wkt"),
    )
