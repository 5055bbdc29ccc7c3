#!/usr/bin/env python3
"""Scaling probe: how do the headline plans behave as data grows?

Unions the sf0.1 fact tables N times in-memory (distinct synthetic keys
per replica so join/group cardinalities scale too) and times the
flagship join-agg and the wide aggregation at 1x / 4x / 10x. The point
is the SHAPE of the curve: a plan that is O(n) shows ~linear wall time;
a plan hiding a driver loop, a cartesian, or a single-partition stage
bends superlinear fast. Run ad hoc; results recorded in SCALE.md.

Usage: python3 scaling_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from coviddatapipeline_spark.session import get_spark


def replicate(df, key_cols, n):
    """Union n copies, shifting integer keys per replica so cardinality
    scales with data volume (a pure union would just duplicate keys)."""
    out = None
    for i in range(n):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * 100_000_000))
        out = c if out is None else out.unionByName(c)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scaling_probe")
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    for mult in (1, 4, 10):
        li = replicate(lineitem, ["l_orderkey"], mult)
        od = replicate(orders, ["o_orderkey", "o_custkey"], mult)

        t0 = time.perf_counter()
        # flagship shape: fact-fact join + group
        (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
            .collect()
        )
        t_join = time.perf_counter() - t0

        t0 = time.perf_counter()
        # pricing-summary shape: wide agg over the fact table
        (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"),
                F.sum("l_extendedprice"),
                F.avg("l_discount"),
                F.count("*"),
            )
            .collect()
        )
        t_agg = time.perf_counter() - t0

        t0 = time.perf_counter()
        # round-2 ranking shape: exact global quartiles without a
        # single-partition window (operators/ranking.py)
        from coviddatapipeline_spark.operators.ranking import (
            ntile_from_rn,
            with_global_row_number,
        )

        ranked, n = with_global_row_number(
            od.select("o_totalprice", "o_orderkey"), ["o_totalprice", "o_orderkey"]
        )
        (
            ranked.select(ntile_from_rn(F.col("rn"), n, 4).alias("q"), "o_totalprice")
            .groupBy("q")
            .agg(F.count("*"), F.min("o_totalprice"), F.max("o_totalprice"))
            .collect()
        )
        t_rank = time.perf_counter() - t0

        rows = 600_572 * mult  # sf0.1 lineitem rows x replicas
        orows = 150_000 * mult
        print(
            f"mult={mult:2d}  rows~{rows:>8,}  join+agg={t_join:6.2f}s "
            f"({rows/t_join/1e6:5.2f}M rows/s)  wide-agg={t_agg:6.2f}s "
            f"({rows/t_agg/1e6:5.2f}M rows/s)  global-rank={t_rank:6.2f}s "
            f"({orows/t_rank/1e6:5.2f}M rows/s)"
        )


if __name__ == "__main__":
    main()
