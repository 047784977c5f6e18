"""Kill-and-resume semantics of the lineage manifest (SURVEY.md §4.5,
north rule: resume at partition granularity without recomputing
completed tile groups)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hope_graph_builder_spark import synth
from hope_graph_builder_spark.checkpoint.manifest import (
    completed_groups,
    read_manifest,
    read_stage,
    run_stage,
    with_tile_group,
)

from tests.conftest import SF_TINY


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _points(spark):
    return with_tile_group(
        synth.page_points(spark, SF_TINY).select("doc_id", "x", "y"), "x", "y", res=3
    )


def test_stage_write_and_manifest(spark, tmpdir):
    pts = _points(spark)
    stats = run_stage(spark, pts, "pts", tmpdir)
    assert stats["groups_skipped"] == 0
    m = read_manifest(spark, tmpdir)
    total = m.agg(F.sum("row_count")).collect()[0][0]
    assert total == pts.count()
    # checksums present for every group
    assert m.filter(F.col("checksum").isNull()).count() == 0


def test_resume_skips_completed(spark, tmpdir):
    pts = _points(spark)
    groups = [r.tile_group for r in pts.select("tile_group").distinct().collect()]
    half = set(groups[: len(groups) // 2])

    # first (simulated-killed) run: only half the tile groups got done
    part1 = pts.filter(F.col("tile_group").isin(half))
    run_stage(spark, part1, "pts", tmpdir)
    assert completed_groups(spark, tmpdir, "pts").count() == len(half)

    # resume with the FULL input: only the remaining groups are written
    stats = run_stage(spark, pts, "pts", tmpdir)
    assert stats["groups_skipped"] == len(half)
    assert stats["groups_written"] == len(groups) - len(half)

    # final data is complete and row-identical to the input
    out = read_stage(spark, tmpdir, "pts")
    assert out.count() == pts.count()
    assert out.select("doc_id").exceptAll(pts.select("doc_id")).count() == 0


def test_rerun_noop(spark, tmpdir):
    pts = _points(spark)
    run_stage(spark, pts, "pts", tmpdir)
    stats = run_stage(spark, pts, "pts", tmpdir)
    assert stats["groups_written"] == 0
    assert read_stage(spark, tmpdir, "pts").count() == pts.count()


def test_debug_sink_tap(spark, tmp_path):
    """S5: the tap writes parquet + a sidecar schema.json and respects
    sampling."""
    import json
    import os

    from hope_graph_builder_spark.checkpoint.manifest import debug_sink

    df = spark.range(100).withColumnRenamed("id", "v")
    out = str(tmp_path / "tap")
    debug_sink(df, out, sample_rows=10)
    assert spark.read.parquet(out).count() == 10
    sch = json.load(open(os.path.join(out, "_schema.json")))
    assert sch["fields"][0]["name"] == "v"
