"""Structured Streaming windowed ingest == batch equivalent."""

from hope_graph_builder_spark.streaming.windowed import (
    batch_equivalent,
    run_stream_to_memory,
)

from tests.conftest import SF_TINY


def test_stream_matches_batch(spark):
    stream_out = run_stream_to_memory(spark, SF_TINY, name="win_test")
    batch_out = batch_equivalent(spark, SF_TINY)
    assert stream_out.count() == batch_out.count() > 0
    assert stream_out.exceptAll(batch_out).count() == 0
    assert batch_out.exceptAll(stream_out).count() == 0


def test_streaming_noise_exposures_match_batch(spark):
    """The flagship's location-exposure stage run as a file stream
    (stream-static broadcast cell-join + single aggregation) produces
    exactly the batch table — including locations with no layer hit
    (they must survive the left join with all-null layer columns)."""
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.streaming import noise_stream

    stream_out = noise_stream.run_stream_to_memory(spark, SF_TINY, name="noise_stream_test")
    batch_out = noise_stream.batch_equivalent(spark, SF_TINY)
    assert stream_out.count() == batch_out.count() > 0
    assert stream_out.exceptAll(batch_out).count() == 0
    assert batch_out.exceptAll(stream_out).count() == 0
    # the stage keeps unmatched locations AND produces real exposures
    assert stream_out.filter(F.col("hel_road").isNotNull()).count() > 0
    assert (
        stream_out.filter(
            sum((F.col(c).isNull().cast("int") for c in stream_out.columns[1:]), F.lit(0))
            == len(stream_out.columns) - 1
        ).count()
        > 0
    )
