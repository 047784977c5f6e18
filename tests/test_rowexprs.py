"""Unit tests for export/GVI scalar functions (reference F12-F18
boundary semantics)."""

import json

from pyspark.sql import functions as F

from hope_graph_builder_spark.functions.rowexprs import (
    biking_length,
    geojson_line_feature,
    mean_noise_level,
    noise_bucket,
    noises_with_db40,
    residual_db40,
)
from hope_graph_builder_spark.pipelines.green_view import combine_gvi


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_noise_bucket_boundaries(spark):
    vals = {72: 70, 70: 70, 69: 65, 65: 65, 47: 45, 45: 45, 44: 40, 0: 40}
    for db, want in vals.items():
        assert _one(spark, noise_bucket(F.lit(db))) == want


def test_mean_noise_and_residual(spark):
    noises = F.map_from_arrays(
        F.array(F.lit(50), F.lit(60)), F.array(F.lit(10.0), F.lit(20.0))
    )
    length = F.lit(40.0)
    # Σ((db+2.5)·len)/length = (52.5*10 + 62.5*20)/40 = 44.375 → 44.4
    assert _one(spark, mean_noise_level(noises, length)) == 44.4
    # residual = 40 - 30 = 10 → db40 entry added
    assert _one(spark, residual_db40(noises, length)) == 10.0
    m = _one(spark, noises_with_db40(noises, length))
    assert m[40] == 10.0 and m[50] == 10.0
    # fully covered → unchanged
    m2 = _one(spark, noises_with_db40(noises, F.lit(30.0)))
    assert 40 not in m2


def test_biking_length(spark):
    assert _one(spark, biking_length(F.lit(10.0), F.lit(1.6666666))) == 16.667


def test_combine_gvi_reference_quirks(spark):
    # gsv present → rounded gsv
    assert _one(spark, combine_gvi(F.lit(0.456), F.lit(0.9), F.lit(0.9))) == 0.46
    # gsv == 0.0 is treated as missing (reference `if gsv:` falsy quirk)
    assert _one(spark, combine_gvi(F.lit(0.0), F.lit(0.5), F.lit(0.2))) == 0.5
    # cap at 1.0
    assert _one(spark, combine_gvi(F.lit(None).cast("double"), F.lit(1.0), F.lit(0.9))) == 1.0
    # omit_low_veg variant
    assert _one(
        spark, combine_gvi(F.lit(None).cast("double"), F.lit(1.0), F.lit(0.3), omit_low_veg=True)
    ) == 0.3


def test_geojson_feature_is_valid_json(spark):
    col = geojson_line_feature(
        F.lit(7), F.lit(1.0), F.lit(2.0), F.lit(3.0), F.lit(4.0),
        {"noise_source": F.lit("road")},
    )
    s = _one(spark, col)
    d = json.loads(s)
    assert d["type"] == "Feature"
    assert d["geometry"]["coordinates"] == [[1.0, 2.0], [3.0, 4.0]]
    assert d["properties"] == {"id": 7, "noise_source": "road"}


def test_extract_text_byte_identity_nasty_strings(spark):
    """extract(markup(text)) must be byte-identical for adversarial
    content: entities, angle brackets, repeated/leading/trailing
    whitespace, unicode, empty strings, tag-looking text."""
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators.extract import extract_text, markup_pages

    texts = [
        "plain words here",
        "a & b < c > d \"quoted\"",
        "double  space and  more",
        " leading and trailing ",
        "",
        "<p>not a tag</p> &amp; already-escaped",
        "unicode äö € 中文",
        "word " * 20 + "tail",   # crosses several paragraph boundaries
    ]
    df = spark.createDataFrame(
        [(i, t, f"https://example.org/x/{i}") for i, t in enumerate(texts)],
        "doc_id long, text string, url string",
    )
    out = extract_text(markup_pages(df))
    bad = out.filter(F.col("extracted_text") != F.col("text")).collect()
    assert bad == [], [(r["text"], r["extracted_text"]) for r in bad]
