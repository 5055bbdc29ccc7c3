"""Silver: the covid_cases transform (SURVEY §2.2-2.3, P1-P5 / F1-F6).

One declarative ``DataFrame -> DataFrame`` transform replacing the
reference's row-at-a-time dict loop (/root/reference/dags/ETL.py:91-107):

- P1 projection + rename of the 5 consumed columns
- F1 trim, F2 title-case (initcap) on state/county
- F3 int cast with default-0 for missing/empty measures
- F4 empty-string default for missing dimensions
- F6 date parse
- P4 malformed-row drop: rows whose date or a *present but unparsable*
  measure fails to cast are filtered out (the reference's try/except
  skip), without failing the job under ANSI mode (try_* functions)

Deliberate divergences from the reference, per SURVEY §4.3.4: a NULL
state/county is coalesced to '' instead of crashing the row out via
AttributeError — documented, tested behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _measure(col: str) -> Column:
    """int(rec.get(col, 0))-like semantics (/root/reference/dags/ETL.py:100-101):
    missing/empty → 0; present-but-unparsable → NULL (row dropped by the
    malformed filter); parsable → int.

    DELIBERATE DIVERGENCE (documented per SURVEY §4.3.4, ADVICE r01): the
    reference's ``int(rec.get(col, 0))`` defaults only an *absent* key to
    0 and raises (row skipped) on a present-but-empty string. Spark's CSV
    reader conflates both cases into NULL (empty unquoted field → null,
    short row → null), so the distinction is unrepresentable post-read;
    we map both to 0, which keeps absent-key parity and diverges on
    empty-string fields (0 instead of dropped)."""
    c = F.trim(F.col(col))
    return F.when(c.isNull() | (c == ""), F.lit(0)).otherwise(c.try_cast("int"))


def _dimension(col: str) -> Column:
    """strip().title() with missing→'' (/root/reference/dags/ETL.py:98-99),
    NULL coalesced to '' (divergence, SURVEY §4.3.4)."""
    return F.initcap(F.trim(F.coalesce(F.col(col), F.lit(""))))


def transform_covid(raw: DataFrame) -> DataFrame:
    """covid_raw (all-string Bronze) → covid_cases (typed Silver).

    Usable as ``bronze_df.transform(transform_covid)``. Catalyst prunes
    the unreferenced ballast columns out of the Bronze scan.
    """
    shaped = raw.select(
        F.try_to_timestamp(F.trim(F.col("REPORT_DATE")), F.lit("yyyy-MM-dd"))
        .cast("date")
        .alias("date"),
        _dimension("PROVINCE_STATE_NAME").alias("state"),
        _dimension("COUNTY_NAME").alias("county"),
        _measure("PEOPLE_POSITIVE_NEW_CASES_COUNT").alias("new_cases"),
        _measure("PEOPLE_DEATH_NEW_COUNT").alias("new_deaths"),
    )
    # P4: malformed-row drop — bad date or unparsable present measure.
    return shaped.filter(
        F.col("date").isNotNull()
        & F.col("new_cases").isNotNull()
        & F.col("new_deaths").isNotNull()
    )
