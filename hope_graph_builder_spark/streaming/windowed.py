"""Structured Streaming ingest (engine extension; the reference is
batch-only — SURVEY.md §2.9 — but the pages table carries ``warc_ts``
and the driver's events table is stream-shaped).

Pattern: readStream → watermark → tumbling-window aggregate →
writeStream. The aggregation is the exact streaming twin of the batch
``w_time_buckets`` contract query, and the test asserts
stream-vs-batch result equality after ``processAllAvailable``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def events_schema(spark: SparkSession, sf_dir: str) -> StructType:
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(events_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        # the events table only — streaming the whole fixture dir with
        # this schema would read 9 unrelated tables and silently corrupt
        # the counts if any ever gained a ts/event_type column. The
        # source needs a directory, so glob-filter to the events file.
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def windowed_counts(events: DataFrame, window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts + sums per event_type with late-data
    watermarking."""
    e = events.withColumn("ts2", F.col("ts").cast("timestamp"))
    return (
        e.withWatermark("ts2", watermark)
        .groupBy(F.window("ts2", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "total",
        )
    )


def run_stream_to_memory(spark: SparkSession, sf_dir: str, name: str = "win_out") -> DataFrame:
    """Drive the stream synchronously to completion against the local
    parquet (memory sink; complete mode so the final table equals the
    batch answer)."""
    q = (
        windowed_counts(read_events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same aggregation as a batch query (equivalence oracle)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_counts(e)
