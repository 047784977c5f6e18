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
