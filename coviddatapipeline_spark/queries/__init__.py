"""Named-query registry — the engine's public query surface.

``catalog.queries()`` / ``catalog.oracle_sql()`` back the driver
contract in __spark_entry__.py: every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extensions) is registered here with
a DataFrame builder and, where SQL-expressible, a DuckDB oracle twin.
"""

from coviddatapipeline_spark.queries.catalog import (  # noqa: F401
    Query,
    all_queries,
    get,
    oracle_sql,
    queries,
    register,
)
