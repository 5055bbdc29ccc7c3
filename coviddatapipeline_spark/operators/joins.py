"""Join algorithms Spark lacks natively, composed from DataFrame ops.

``asof_join`` — for each left row, the latest right row with
``right.ts <= left.ts`` within the same ``by`` key (the time-series
"last known value" join; native in DuckDB/kdb/Pandas, absent in Spark).

Implementation: union both sides tagged, one window pass per key ordered
by (ts, side) taking ``last(right_value, ignorenulls=True)`` — a single
shuffle on the key, no range-explosion, no per-row lookup. This is the
scale-correct form: cost is one sort per key partition, identical to a
sort-merge join. (An ``applyInPandas`` + ``pd.merge_asof`` variant
would move every row through Arrow; only worth it when per-group logic
gets genuinely imperative.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """Left rows enriched with the most recent ``right`` values at or
    before the left row's ``on`` time, per ``by`` key.

    ``left`` and ``right`` must share the ``on`` and ``by`` column names;
    ``value_cols`` are taken from ``right``.
    """
    lcols = [c for c in left.columns]
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (on, by) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # Right rows sort before left rows at equal timestamps (side 0 < 1),
    # so an exact-tie right row IS visible to the left row — merge_asof
    # ("backward") semantics.
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on), F.col("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = unioned.select(
        *unioned.columns,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return enriched.filter(F.col("_side") == 1).select(
        *lcols, *[f"asof_{c}" for c in value_cols]
    )

