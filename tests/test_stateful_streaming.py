"""applyInPandasWithState first-seen dedup over a file stream."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hope_graph_builder_spark.operators.text import fingerprint
from hope_graph_builder_spark.streaming.stateful import streaming_first_seen

from tests.conftest import SF_TINY


@pytest.fixture()
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="stream_")
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    keys = docs.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
    # duplicate the input across two files → second occurrence of every
    # fp must be suppressed by state
    keys.coalesce(1).write.mode("overwrite").parquet(f"{d}/in1")
    spark.read.parquet(f"{d}/in1").write.mode("overwrite").parquet(f"{d}/in2")
    src = f"{d}/src"
    import os
    os.makedirs(src)
    for i, sub in enumerate(["in1", "in2"]):
        for j, f_ in enumerate(os.listdir(f"{d}/{sub}")):
            if f_.endswith(".parquet"):
                shutil.copy(f"{d}/{sub}/{f_}", f"{src}/part{i}_{j}.parquet")
    yield d, src
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_first_seen_dedup(spark, stream_dir):
    d, src = stream_dir
    schema = "fp string, doc_id long"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_first_seen(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM dedup_out")
    n_fp = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    # every fingerprint emitted exactly once despite duplicated input
    assert got.count() == n_fp
    assert got.groupBy("fp").count().filter(F.col("count") > 1).count() == 0
