"""Streaming web-text ingest — the CONTINUOUS form of
pipelines/webtext: Common Crawl drops land as file batches, and the
stateless prefix of the ingest (HTML→text extraction, language ID,
quality + repetition signals, token counts) is pure map work, so it
runs unchanged as a Structured Streaming query over a pages file
stream. The near-dup clustering stage is NOT streamable (iterative
connected components over a growing pair graph); it stays a periodic
batch pass over the continuously-appended signals table — the same
lambda split the streaming spatial join documents
(streaming/noise_stream.py).

Stream ≡ batch is pytest-asserted: the streamed signals must equal
run_webtext_ingest's signal columns row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hope_graph_builder_spark.operators import text as textops
from hope_graph_builder_spark.operators.extract import extract_text


def read_pages_stream(
    spark: SparkSession, path: str, glob: str = "*.parquet"
) -> DataFrame:
    """A pages-shaped parquet directory as a file stream (one file per
    trigger — the per-dump ingest unit)."""
    schema = spark.read.option("pathGlobFilter", glob).parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )


def streaming_webtext_signals(pages: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The stateless ingest prefix over a (batch OR streaming) pages
    DataFrame: extraction + every per-document signal. No aggregation,
    no state — appends forever at any rate."""
    ex = extract_text(pages)
    t = F.col("extracted_text")
    return ex.select(
        id_col,
        "url",
        textops.lang_id(t).alias("lang_pred"),
        F.bround(textops.quality_score(t), 6).alias("quality"),
        textops.token_count(t).cast("long").alias("n_tokens"),
        textops.dup_ngram_ratio(t, 2).alias("dup_bi"),
        textops.repetition_flags(t).alias("rep_pass"),
    )
