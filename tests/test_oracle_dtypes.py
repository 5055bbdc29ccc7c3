"""Cross-engine numeric-representation tripwire (VERDICT r02 fix #7).

The driver hashes the DuckDB oracle AFTER a pandas fetch, where
  - HUGEINT (any ``sum(INTEGER)``/``sum(BIGINT)``) becomes float64,
  - DECIMAL becomes float64,
  - an integer column containing NULL becomes float64,
while Spark's side keeps bigint / Decimal — numerically identical
values that hash differently. Round 2 shipped nine such oracles (two
red in-window, seven latent). This test walks EVERY registered oracle,
fetches only its dtypes through the same pandas path, derives the
Spark result schema lazily (no jobs run), and asserts no numeric-kind
mismatch: an integral Spark column must face an integral pandas dtype,
a fractional Spark column a float dtype, and Decimal must never reach
the output of either side.

It is deliberately cheap — one DuckDB execution per oracle, zero Spark
actions — so it runs in the default suite and would have caught the
round-2 red class before the driver did.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from coviddatapipeline_spark.queries import catalog

ALL = catalog.all_queries()
WITH_ORACLE = sorted(name for name, q in ALL.items() if q.oracle is not None)

_SPARK_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_SPARK_FRACTIONAL = (T.FloatType, T.DoubleType)


def _spark_kind(dtype: T.DataType) -> str:
    if isinstance(dtype, _SPARK_INTEGRAL):
        return "int"
    if isinstance(dtype, _SPARK_FRACTIONAL):
        return "float"
    if isinstance(dtype, T.DecimalType):
        return "decimal"
    return "other"


def _pandas_kind(dtype) -> str:
    if np.issubdtype(dtype, np.integer):
        return "int"
    if np.issubdtype(dtype, np.floating):
        return "float"
    return "other"


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_numeric_kinds_align(name, spark, duck, parity_sf_dir):
    q = ALL[name]
    spark_schema = {f.name.lower(): f.dataType for f in q.fn(spark, parity_sf_dir).schema}
    pdf = duck.execute(q.oracle).df()
    duck_dtypes = {c.lower(): pdf[c].dtype for c in pdf.columns}

    assert spark_schema.keys() == duck_dtypes.keys(), (
        f"{name}: column sets differ: spark={sorted(spark_schema)} "
        f"duck={sorted(duck_dtypes)}"
    )
    for col, sdt in spark_schema.items():
        s_kind = _spark_kind(sdt)
        d_kind = _pandas_kind(duck_dtypes[col])
        assert s_kind != "decimal", (
            f"{name}.{col}: Spark emits Decimal — the driver's pandas fetch "
            f"renders the DuckDB side float64, so this hashes red even when "
            f"values match; cast the output (both sides) to double or string"
        )
        if s_kind == "int":
            assert d_kind == "int", (
                f"{name}.{col}: Spark {sdt.simpleString()} vs DuckDB pandas "
                f"{duck_dtypes[col]} — an uncast integer sum (HUGEINT) or a "
                f"NULL in an integer column; add CAST(... AS BIGINT) / "
                f"coalesce in the oracle and mirror it Spark-side"
            )
        elif s_kind == "float":
            assert d_kind == "float", (
                f"{name}.{col}: Spark {sdt.simpleString()} vs DuckDB pandas "
                f"{duck_dtypes[col]} — fractional Spark column must face a "
                f"float oracle column (cast the oracle side to DOUBLE)"
            )
