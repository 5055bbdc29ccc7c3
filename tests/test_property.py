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


# --- distributed exact global ranking vs the reference window -------------

_rank_rows = st.lists(
    st.tuples(
        st.one_of(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.sampled_from([0.0, 1.0, 1.0, -0.0, 42.5]),  # force heavy ties
        ),
    ),
    min_size=0,
    max_size=200,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=_rank_rows)
def test_global_row_number_property(spark, vals):
    """For arbitrary (ties-heavy) doubles, the distributed global row
    number equals row_number() OVER (ORDER BY v, k) exactly — including
    duplicate values straddling cutpoint boundaries."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from coviddatapipeline_spark.operators.ranking import with_global_row_number

    rows = [(float(v[0]), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v double, k long") if rows else (
        spark.range(0).select(F.col("id").cast("double").alias("v"),
                              F.col("id").alias("k"))
    )
    ranked, n = with_global_row_number(df, ["v", "k"], num_buckets=4)
    assert n == len(rows)
    if not rows:
        return
    ref = df.select(
        "k", F.row_number().over(W.orderBy("v", "k")).alias("rn_ref")
    )
    diff = ranked.join(ref, "k").filter(F.col("rn") != F.col("rn_ref")).count()
    assert diff == 0
