"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`coviddatapipeline_spark.queries.catalog` — the
engine's named-query registry. Every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extensions) registers itself there
with a (spark, sf_dir) -> DataFrame builder and, where SQL-expressible,
a DuckDB oracle twin with matching column aliases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from coviddatapipeline_spark.queries import catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: revenue per nation (scan + 3 joins +
    aggregate + sort in one Catalyst plan). Driver checks rows > 0."""
    return catalog.get("flagship_revenue_by_nation").fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; see catalog registry."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted => rows-only check)."""
    return catalog.oracle_sql()
