"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship noise-join pipeline on sf0.001.
queries()         — one entry per implemented operator (SURVEY.md §2),
                    each (spark, sf_dir) -> DataFrame.
oracle_sql()      — DuckDB SQL twins, column names aliased identically.

Implementation lives in hope_graph_builder_spark/ (contract.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hope_graph_builder_spark import contract, synth  # noqa: E402
from hope_graph_builder_spark.pipelines.noise_join import run_noise_join  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: page-derived edges × noise polygon layers →
    per-edge noise exposure maps (reference noise_graph_join §3.1)."""
    sf_dir = "/root/testdata/sf0.001"
    edges = synth.page_edges(spark, sf_dir)
    layers = synth.noise_layers(spark)
    return run_noise_join(edges, layers, synth.NODATA_RECT, res=7)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
