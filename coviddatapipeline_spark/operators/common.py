"""Shared helpers for operator modules."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# DuckDB (1.0) has no initcap; this template reproduces Spark's
# F.initcap semantics exactly (lowercase, then uppercase the first
# character of each whitespace-delimited word): verified equal on
# "  o'BRIEN new  YORK " -> "O'brien New  York".
DUCKDB_INITCAP = (
    "array_to_string(list_transform(string_split(lower({x}), ' '), "
    "w -> upper(w[1]) || w[2:]), ' ')"
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table as a DataFrame (lazy parquet scan)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def t_fanout(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Like :func:`t`, but guarantees at least ``defaultParallelism``
    partitions before CPU-heavy per-row work (shingling, hashing,
    per-pair math). A small file arrives as ONE scan partition, which
    would serialize the compute on a single core; the repartition is a
    no-op shuffle of a tiny input. Guarded: a table that already spans
    >= cores partitions (any real table at 100 TB under
    files.maxPartitionBytes) is returned untouched — this never adds a
    shuffle at scale.
    """
    df = t(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` as a usable TimestampType column.

    The file stores TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as
    an epoch-nanos long. Integer-divide (never float-divide — doubles
    lose precision above 2^53) to micros, matching DuckDB's truncation
    of the same column to µs TIMESTAMP.
    """
    from pyspark.sql import functions as F

    df = t(spark, sf_dir, "events")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
