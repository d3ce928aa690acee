"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline at sf0.001; ``queries``/
``oracle_sql`` expose each implemented operator with a DuckDB oracle
(see grate_spark/queries.py for the implementations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build deterministic CSV blobs from the sf0.001 documents
    table, run the vectorized extraction UDTF, and return per-row
    extraction output with the sha256 parity column."""
    from grate_spark.queries import _docs_as_csv_blobs
    from grate_spark.operators.extraction import (extract_files,
                                                  with_content_sha)

    blobs = _docs_as_csv_blobs(spark, "/root/testdata/sf0.001")
    rows = with_content_sha(extract_files(blobs))
    return rows.select("repo", "path", "sheet", "row_id", "cells",
                       "content_sha256", "error")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from grate_spark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (same column names)."""
    from grate_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}
