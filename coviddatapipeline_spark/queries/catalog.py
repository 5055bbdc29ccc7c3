"""Query registry.

Operator modules call :func:`register` at import time; the driver-facing
``queries()`` / ``oracle_sql()`` mappings are assembled from the
registry. Column names are part of the contract: the driver compares a
Spark result against the DuckDB oracle by (row count, schema, order-
insensitive value hash) with columns sorted by name, so every computed
column must carry the same alias on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules whose import populates the registry.
_OPERATOR_MODULES = (
    "coviddatapipeline_spark.operators.relational",
    "coviddatapipeline_spark.operators.relational_ext",
    "coviddatapipeline_spark.operators.advanced",
    "coviddatapipeline_spark.operators.reshape",
    "coviddatapipeline_spark.operators.covid",
    "coviddatapipeline_spark.operators.dedup",
    "coviddatapipeline_spark.operators.similarity",
    "coviddatapipeline_spark.operators.text",
    "coviddatapipeline_spark.operators.events",
    "coviddatapipeline_spark.operators.multimodal",
)


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB ANSI SQL, None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}
_LOADED = False


# Session confs every query depends on for oracle parity, applied
# defensively at call time: the driver passes its OWN SparkSession,
# which need not have been built by our session factory. All three are
# runtime-settable SQL confs (verified on a vanilla session).
_REQUIRED_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS); without this the vectorized
    # reader rejects the file. Read as long, convert via ts DIV 1000.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB timestamps are UTC-naive; date_format must agree.
    "spark.sql.session.timeZone": "UTC",
    # Arrow batch transfer for the Pandas-UDF escape hatches.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def _ensure_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on some future version: query may still work


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def get(name: str) -> Query:
    _load()
    return _REGISTRY[name]


def queries() -> dict[str, QueryFn]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    _load()
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (omitted for rows-only ops)."""
    _load()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
