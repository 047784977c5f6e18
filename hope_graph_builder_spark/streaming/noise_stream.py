"""Incremental spatial join: the flagship's location-exposure stage as
a Structured Streaming query (engine extension; the reference is
batch-only, SURVEY.md §2.9 — but the north-star pipeline ingests
web-page batches continuously, and new pages mean new page-derived
edges whose samples must join the static noise layers incrementally).

The streamed stage is EXACTLY `pipelines.noise_join.location_exposures`
— one stream-static broadcast cell-join plus one aggregation, which is
the legal Structured Streaming subset (the full flagship chains two
aggregations — per-location then per-edge — which complete-mode
streaming forbids; the per-edge rollup stays a batch pass over the
continuously-maintained location table, the standard lambda split).

Scale shape: the stream side is map-only until the single groupBy;
state is one row per distinct quantized location, the same cardinality
the batch shuffle carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hope_graph_builder_spark import synth
from hope_graph_builder_spark.operators.sampling import sample_edges, with_xy_id
from hope_graph_builder_spark.pipelines.noise_join import location_exposures


def read_docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a file stream (one file per trigger; the
    glob filter keeps the other fixture tables out of the scan)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def edges_from_docs(docs: DataFrame) -> DataFrame:
    """Page-derived street edges from a (batch OR streaming) documents
    DataFrame — the same pure Column derivation as synth.page_edges,
    expressed over an arbitrary input so it is stream-compatible."""
    fr = synth.xy_fragments("doc_id")
    return docs.select(
        F.col("doc_id").alias("edge_id"),
        F.expr(fr["x"]).alias("x1"),
        F.expr(fr["y"]).alias("y1"),
        (F.expr(fr["x"]) + F.expr(fr["dx"])).alias("x2"),
        (F.expr(fr["y"]) + F.expr(fr["dy"])).alias("y2"),
        F.sqrt(
            F.expr(fr["dx"]) * F.expr(fr["dx"]) + F.expr(fr["dy"]) * F.expr(fr["dy"])
        ).alias("length"),
    )


def streaming_location_exposures(
    edges: DataFrame, layers: DataFrame, res: int = 7
) -> DataFrame:
    """edges (stream) × layers (static, broadcast) → the continuously
    maintained (xy_id, per-layer max dB) table."""
    return location_exposures(with_xy_id(sample_edges(edges)), layers, res)


def run_stream_to_memory(
    spark: SparkSession, sf_dir: str, res: int = 7, name: str = "noise_stream_out"
) -> DataFrame:
    """Drive the stream to completion (memory sink, complete mode — the
    final table must equal the batch answer)."""
    edges = edges_from_docs(read_docs_stream(spark, sf_dir))
    layers = synth.noise_layers(spark)
    q = (
        streaming_location_exposures(edges, layers, res=res)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def batch_equivalent(spark: SparkSession, sf_dir: str, res: int = 7) -> DataFrame:
    """The same stage as one batch query (equivalence oracle)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return streaming_location_exposures(
        edges_from_docs(docs), synth.noise_layers(spark), res=res
    )
