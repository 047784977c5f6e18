"""The CC-style web-text ingest pipeline — the training-data battery
composed into one user-facing entry point (task brief: dedup +
text-analysis as first-class stages over the mandated pages table):

    pages(url, warc_ts, html, …, lang)    [WARC source or parquet]
      → HTML→text extraction              (one map scan, no shuffle)
      → trained trigram language ID       (explode + broadcast join)
      → quality + tokens + repetition     (one codegen map scan)
      → MinHash+LSH near-dup clusters     (sparse pair graph → CC)
      → canonical = best member per cluster (rep gate ≻ quality ≻ id)
      → keep = canonical ∧ quality gate ∧ repetition gate

Every stage is an existing oracle-checked operator; this module owns
only the composition. Plan shape at 100 TB: two map scans (extract /
signals fuse into one), the trigram explode + broadcast-profile join,
the LSH banding shuffle, the sparse component iteration, and one
label-attach join plus one per-cluster window.

Canonical selection is QUALITY-FIRST (v2): each cluster keeps its
best member — repetition-gate pass first, then highest quality, then
lowest id — so a cluster whose min-id member is junk still surfaces
its usable duplicate (the standard CC-pipeline ordering; the v1
min-id canonical silently dropped whole clusters when the min-id
member failed the gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hope_graph_builder_spark.operators import text as textops
from hope_graph_builder_spark.operators.dedup import dedup_clusters
from hope_graph_builder_spark.operators.extract import extract_text


def run_webtext_ingest(
    pages: DataFrame,
    id_col: str = "doc_id",
    quality_min: float = 0.5,
    profiles: DataFrame | None = None,
) -> DataFrame:
    """→ (doc_id, url, lang_pred, quality, n_tokens, rep_pass,
    cluster_id, keep): ``keep`` marks the best member of each near-dup
    cluster (repetition-pass ≻ quality ≻ id) that also clears the
    quality AND repetition gates — `filter("keep")` IS the training
    corpus.

    ``profiles``: trained character-trigram language profiles
    (plang, tri — operators/text.train_lang_profiles). Defaults to
    self-training on the labeled ``lang`` column of ``pages`` (at
    100 TB: train once on a sample, the profile table is langs×N rows
    and broadcasts)."""
    ex = extract_text(pages).select(
        id_col, "url", F.col("extracted_text"),
        *([] if profiles is not None else [F.col("lang")]),
    )
    if profiles is None:
        profiles = textops.train_lang_profiles(
            ex.filter(F.col("lang").isNotNull()), text="extracted_text", lang="lang"
        )
    lang = textops.lang_pred_ngram(
        ex, profiles, text="extracted_text", id_col=id_col, out="lang_pred"
    )
    t = F.col("extracted_text")
    sig = ex.select(
        id_col,
        "url",
        F.bround(textops.quality_score(t), 6).alias("quality"),
        textops.token_count(t).cast("long").alias("n_tokens"),
        textops.repetition_flags(t).alias("rep_pass"),
    ).join(lang, id_col)
    clusters = dedup_clusters(
        ex.select(id_col, F.col("extracted_text").alias("text")), id_col=id_col
    ).select(id_col, "cluster_id")
    out = sig.join(clusters, id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("rep_pass"), F.desc("quality"), F.asc(id_col)
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "keep",
            (F.col("_rn") == 1)
            & (F.col("quality") >= F.lit(float(quality_min)))
            & F.col("rep_pass"),
        )
        .drop("_rn")
        .select(
            id_col, "url", "lang_pred", "quality", "n_tokens",
            "rep_pass", "cluster_id", "keep",
        )
    )
