"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2 plus the training-data-prep operators; ``oracle_sql()``
returns the DuckDB twin of each query (same column names, same
rounding, same tie-breaks). See ``bern2_spark/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_shipped(spark: SparkSession) -> None:
    """Executors must be able to import bern2_spark even when the
    driver-created session didn't go through bern2_spark.session."""
    from bern2_spark.session import _ship_package
    try:
        _ship_package(spark)
    except Exception:
        pass  # already added, or local-only plan


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline (preprocess -> tag -> mutations ->
    sieve normalize -> neural fallback -> canonicalize -> triples) over
    /root/testdata/sf0.001 documents."""
    _ensure_shipped(spark)
    from bern2_spark.queries import QUERIES
    return QUERIES["kg_pipeline_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bern2_spark.queries import QUERIES

    def wrap(fn):
        def run(spark, sf_dir):
            _ensure_shipped(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from bern2_spark.queries import ORACLES
    return dict(ORACLES)
