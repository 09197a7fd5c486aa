"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over german_ocr_spark.queries: every implemented operator
from SURVEY.md §2 has a registry entry there; SQL-expressible ones carry
a DuckDB oracle producing identical rows (validated locally by
tools/validate_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from german_ocr_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the mapInPandas extraction pipeline (explode spans →
    per-kind vectorized kernels → ordered output) over spans built from
    the sf0.001 documents table."""
    return QUERIES["q00_extract_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
