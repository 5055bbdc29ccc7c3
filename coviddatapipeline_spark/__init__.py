"""coviddatapipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference COVID batch-ETL pipeline
(PayamZohari/CovidDataPipeline, see /root/reference), re-expressed as
idiomatic PySpark: medallion batch ETL over Parquet (Bronze → Silver →
Gold), a Structured-Streaming twin for the reference's checkpoint/
resume semantics, and a large catalog of relational + LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE on, tuned shuffle partitions)
- ``sources``    readers/writers (parquet, csv, json; idempotent DDL-ish modes)
- ``schemas``    typed StructTypes for the covid model + testdata tables
- ``pipeline``   bronze/silver/gold/watermark/streaming (reference parity)
- ``operators``  relational, dedup, similarity, text, multimodal, windows
- ``queries``    the named-query registry backing __spark_entry__.py
"""

__version__ = "0.1.0"

from coviddatapipeline_spark.session import get_spark  # noqa: E402,F401
from coviddatapipeline_spark.queries import catalog  # noqa: E402,F401

__all__ = ["get_spark", "catalog", "__version__"]
