"""Reference-parity covid pipeline: Bronze → Silver → Gold over Parquet.

The reference's 4-stage stack (CSV → Elasticsearch → Airflow/Celery →
Postgres → Metabase; see SURVEY §0) collapses into one lazy DataFrame
chain per run:

- ``bronze``     CSV landing → Parquet (replaces ES index, S1-S5)
- ``silver``     clean/typed covid_cases table (replaces ETL transform
                 + Postgres load, P1-P5/F1-F6/S8)
- ``gold``       the five dashboard queries Q1-Q5 (replaces Metabase)
- ``watermark``  incremental-extract control state (replaces the JSON
                 checkpoints, S9/S10), with the reference's same-date
                 loss and duplicate hazards fixed (SURVEY §4.3.1-2)
- ``streaming``  Structured-Streaming twin: file-source offsets +
                 checkpointLocation are the native form of the
                 reference's hand-rolled resume story
"""
