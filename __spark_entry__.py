"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``mongodb_mysql_cdc_spark``; this file only
adapts the registry to the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mongodb_mysql_cdc_spark import registry  # noqa: E402
from mongodb_mysql_cdc_spark.session import tune_for_harness  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    tune_for_harness(spark)
    from mongodb_mysql_cdc_spark.suite.relational import pricing_summary

    return pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    wrapped: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in registry.queries().items():

        def make(f):
            def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
                tune_for_harness(spark)
                return f(spark, sf_dir)

            return runner

        wrapped[name] = make(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return registry.oracles()
