"""Structured-Streaming twin of the covid pipeline (SURVEY §7.2.6).

The reference frames its CSV as "a stream of data (never ending)" with
hand-rolled offset checkpoints (/root/reference/README.md:81,
ingest_csv_to_elastic.py:24-33). Spark's file source + checkpointLocation
is the native form: exactly-once file offsets, resumable, no
checkpoint-vs-write ordering hazards (SURVEY §4.3.6).

``Trigger.AvailableNow`` gives the hourly-micro-batch analogue: drain
everything available, then stop — re-invoke on any schedule.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from coviddatapipeline_spark.pipeline.schemas import COVID_RAW_SCHEMA
from coviddatapipeline_spark.pipeline.silver import transform_covid


def stream_csv_to_silver(
    spark: SparkSession,
    input_dir: str,
    silver_path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Continuously ingest CSV files dropped into ``input_dir``, apply the
    Silver transform, append to the Silver table. File-source offsets in
    ``checkpoint_dir`` replace both reference checkpoints (S9 + S10):
    a restart resumes at the exact unprocessed file set, and a file is
    never double-processed."""
    raw = (
        spark.readStream.schema(COVID_RAW_SCHEMA)
        .option("header", "true")
        .option("maxFilesPerTrigger", 10)
        .csv(input_dir)
    )
    clean = transform_covid(raw)
    return (
        clean.writeStream.format("parquet")
        .option("path", silver_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_event_counts(
    spark: SparkSession,
    events_df_stream,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
):
    """Event-time tumbling-window aggregation with a real watermark —
    the idiomatic generalization of the reference's hand-rolled date
    watermark: late rows beyond ``watermark`` are dropped by the engine
    with bounded state, not silently lost by a checkpoint race."""
    return (
        events_df_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
