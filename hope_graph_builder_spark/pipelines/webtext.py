"""The CC-style web-text ingest pipeline — the training-data battery
composed into one user-facing entry point (task brief: dedup +
text-analysis as first-class stages over the mandated pages table):

    pages(url, warc_ts, html, …)          [WARC source or parquet]
      → HTML→text extraction              (one map scan, no shuffle)
      → language ID + quality + tokens    (same scan, codegen)
      → MinHash+LSH near-dup clusters     (sparse pair graph → CC)
      → keep = canonical representative ∧ quality gate

Every stage is an existing oracle-checked operator; this module owns
only the composition. Plan shape at 100 TB: two map scans (extract /
signals fuse into one), the LSH banding shuffle, the sparse component
iteration, and one label-attach join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hope_graph_builder_spark.operators import text as textops
from hope_graph_builder_spark.operators.dedup import dedup_clusters
from hope_graph_builder_spark.operators.extract import extract_text


def run_webtext_ingest(
    pages: DataFrame, id_col: str = "doc_id", quality_min: float = 0.5
) -> DataFrame:
    """→ (doc_id, url, lang_pred, quality, n_tokens, cluster_id, keep):
    ``keep`` marks the canonical member of each near-dup cluster that
    also clears the quality gate — `filter("keep")` IS the training
    corpus."""
    ex = extract_text(pages).select(
        id_col, "url", F.col("extracted_text")
    )
    sig = ex.select(
        id_col,
        "url",
        textops.lang_id(F.col("extracted_text")).alias("lang_pred"),
        F.bround(textops.quality_score(F.col("extracted_text")), 6).alias("quality"),
        textops.token_count(F.col("extracted_text")).cast("long").alias("n_tokens"),
    )
    clusters = dedup_clusters(
        ex.select(id_col, F.col("extracted_text").alias("text")), id_col=id_col
    )
    out = sig.join(clusters, id_col)
    return out.withColumn(
        "keep", F.col("keep") & (F.col("quality") >= F.lit(float(quality_min)))
    )
