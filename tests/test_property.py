"""Property-based differential test: ``transform_covid`` vs a pure-
Python model of the reference's row loop (/root/reference/dags/
ETL.py:91-107) with the engine's documented divergences (SURVEY
§4.3.4: NULL dims coalesce to '' instead of crashing the row;
initcap instead of CPython .title()).

Hypothesis drives arbitrary mixes of valid/missing/empty/garbage cells
through both implementations; outputs must match as multisets."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from coviddatapipeline_spark.pipeline.silver import transform_covid

COLS = (
    "REPORT_DATE",
    "PROVINCE_STATE_NAME",
    "COUNTY_NAME",
    "PEOPLE_POSITIVE_NEW_CASES_COUNT",
    "PEOPLE_DEATH_NEW_COUNT",
)

_dates = st.one_of(
    st.dates(min_value=__import__("datetime").date(1990, 1, 1),
             max_value=__import__("datetime").date(2030, 12, 28)).map(str),
    st.sampled_from(["", "  ", "not-a-date", "2021-13-99", "2021/01/02", None]),
)
_dims = st.one_of(
    st.text(alphabet="abcXYZ' -", min_size=0, max_size=12),
    st.none(),
)
_measures = st.one_of(
    st.integers(min_value=-5, max_value=99999).map(str),
    st.sampled_from(["", "  ", "x", "1.5", "99oops", None, "  7 "]),
)

_row = st.fixed_dictionaries(
    {
        "REPORT_DATE": _dates,
        "PROVINCE_STATE_NAME": _dims,
        "COUNTY_NAME": _dims,
        "PEOPLE_POSITIVE_NEW_CASES_COUNT": _measures,
        "PEOPLE_DEATH_NEW_COUNT": _measures,
    }
)


def _initcap(s: str) -> str:
    """Spark F.initcap: first letter of each whitespace-delimited word
    uppercased, rest lowercased, spacing preserved."""
    return re.sub(r"\S+", lambda m: m.group()[0].upper() + m.group()[1:].lower(), s)


def _model_row(rec):
    """The reference transform with the engine's documented decisions."""
    import datetime as dt

    d = rec["REPORT_DATE"]
    if d is None:
        return None
    try:
        date = dt.datetime.strptime(d.strip(), "%Y-%m-%d").date()
    except ValueError:
        return None

    def dim(k):
        v = rec[k] or ""
        return _initcap(v.strip())

    def measure(k):
        v = rec[k]
        if v is None or v.strip() == "":
            return 0
        try:
            return int(v.strip())
        except ValueError:
            return None  # malformed -> row dropped

    cases, deaths = measure("PEOPLE_POSITIVE_NEW_CASES_COUNT"), measure(
        "PEOPLE_DEATH_NEW_COUNT"
    )
    if cases is None or deaths is None:
        return None
    return (str(date), dim("PROVINCE_STATE_NAME"), dim("COUNTY_NAME"), cases, deaths)


@given(rows=st.lists(_row, min_size=0, max_size=40))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_transform_matches_reference_model(spark, rows):
    expected = Counter(m for m in (_model_row(r) for r in rows) if m is not None)
    df = spark.createDataFrame(
        [tuple(r[c] for c in COLS) for r in rows] or [(None,) * 5],
        schema=", ".join(f"{c} string" for c in COLS),
    )
    if not rows:
        df = df.limit(0)
    got = Counter(
        (str(r["date"]), r["state"], r["county"], r["new_cases"], r["new_deaths"])
        for r in transform_covid(df).collect()
    )
    assert got == expected
