"""Typed schemas for the covid model (SURVEY §1).

covid_raw: the CSV/Elasticsearch shape — every field a string, no types
at source (reference reads via csv.DictReader,
/root/reference/ingest_csv_to_elastic.py:79, and indexes into a
dynamic-mapped ES index with no explicit mapping).

covid_cases: the single fixed, typed schema in the system — the
Postgres warehouse table (/root/reference/scripts/postgres_db_scripts.sql:1-8).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Columns the transform consumes (/root/reference/dags/ETL.py:96-102)
# plus representative ballast columns carried to Bronze but pruned by
# Silver (FIXTURES.md A1) — exercises column pruning.
COVID_RAW_SCHEMA = T.StructType(
    [
        T.StructField("REPORT_DATE", T.StringType()),
        T.StructField("PROVINCE_STATE_NAME", T.StringType()),
        T.StructField("COUNTY_NAME", T.StringType()),
        T.StructField("PEOPLE_POSITIVE_NEW_CASES_COUNT", T.StringType()),
        T.StructField("PEOPLE_DEATH_NEW_COUNT", T.StringType()),
        T.StructField("CONTINENT_NAME", T.StringType()),
        T.StructField("DATA_SOURCE_NAME", T.StringType()),
        T.StructField("PEOPLE_POSITIVE_CASES_COUNT", T.StringType()),
        T.StructField("COUNTY_FIPS_NUMBER", T.StringType()),
    ]
)

COVID_CASES_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("state", T.StringType()),
        T.StructField("county", T.StringType()),
        T.StructField("new_cases", T.IntegerType()),
        T.StructField("new_deaths", T.IntegerType()),
    ]
)
