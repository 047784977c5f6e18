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


def test_webtext_ingest_checkpointed_kill_resume(spark, tmpdir):
    """Resumable CC ingest: a bucket-aligned partial run (the crash
    surrogate — dynamic partition overwrite means a mid-write kill
    leaves uncommitted groups that replay identically) is resumed by a
    full run that (a) skips every completed signal bucket, (b) detects
    the grown signal set via the stage-2 content fingerprint and
    re-runs the GLOBAL clustering in a fresh namespace, and (c) ends
    byte-equal to the never-killed pipeline."""
    from pyspark.sql import functions as F

    from hope_graph_builder_spark.operators import text as textops
    from hope_graph_builder_spark.operators.extract import extract_text, markup_pages
    from hope_graph_builder_spark.pipelines.webtext import (
        run_webtext_ingest,
        run_webtext_ingest_checkpointed,
    )

    pages = markup_pages(synth.pages(spark, SF_TINY))
    # fixed profiles: resume determinism must not depend on which
    # input-half trained them
    profiles = textops.train_lang_profiles(
        extract_text(pages), text="extracted_text", lang="lang"
    ).localCheckpoint()

    B = 16
    half = pages.filter(F.pmod(F.xxhash64(F.col("doc_id")), F.lit(B)) < B // 2)
    c_part = run_webtext_ingest_checkpointed(
        spark, half, tmpdir, profiles=profiles, buckets=B
    )
    assert 0 < c_part["signals"]["groups_written"] <= B // 2

    c_full = run_webtext_ingest_checkpointed(
        spark, pages, tmpdir, profiles=profiles, buckets=B
    )
    # completed signal buckets were skipped, the rest written
    assert c_full["signals"]["groups_skipped"] == c_part["signals"]["groups_written"]
    assert c_full["signals"]["groups_written"] > 0
    # the grown signal set keyed a NEW final namespace (no stale
    # cluster labels from the half-corpus fixpoint)
    assert c_full["final_stage"] != c_part["final_stage"]

    from hope_graph_builder_spark.checkpoint.manifest import read_stage

    got = read_stage(spark, tmpdir, c_full["final_stage"]).drop("tile_group")
    want = run_webtext_ingest(pages, profiles=profiles)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # idempotent re-run: everything skips
    c_again = run_webtext_ingest_checkpointed(
        spark, pages, tmpdir, profiles=profiles, buckets=B
    )
    assert c_again["signals"]["groups_written"] == 0
    assert c_again["final"]["groups_written"] == 0
