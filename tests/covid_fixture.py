"""Deterministic covid_raw fixture per FIXTURES.md §A1.

Synthesizes the reference's CSV shape with the noise the transform must
handle: case/whitespace-dirty dims, empty/absent/unparsable measures,
many rows sharing dates (the §4.3.1 same-date hazard), apostrophe
counties (initcap-vs-title divergence), and ballast columns.
"""

from __future__ import annotations

import csv
import datetime as dt
import random

HEADER = [
    "REPORT_DATE",
    "PROVINCE_STATE_NAME",
    "COUNTY_NAME",
    "PEOPLE_POSITIVE_NEW_CASES_COUNT",
    "PEOPLE_DEATH_NEW_COUNT",
    "CONTINENT_NAME",
    "DATA_SOURCE_NAME",
    "PEOPLE_POSITIVE_CASES_COUNT",
    "COUNTY_FIPS_NUMBER",
]

STATES = [" arkansas ", "FLORIDA", "california", " Colorado", "new york"]
COUNTIES = [" bradley", "O'BRIEN", "martin ", "GARLAND", "greene", "pulaski "]


def make_rows(n: int = 2000, seed: int = 42, start: str = "2020-01-22"):
    rng = random.Random(seed)
    d0 = dt.date.fromisoformat(start)
    rows = []
    for i in range(n):
        day = d0 + dt.timedelta(days=i // 10)  # 10 rows share each date
        cases = str(rng.randint(0, 500))
        deaths = str(rng.randint(0, 50))
        if i % 97 == 0:
            cases = ""  # empty -> default 0
        if i % 193 == 0:
            deaths = "N/A"  # unparsable -> row dropped
        if i % 211 == 0:
            day_s = "not-a-date"  # bad date -> row dropped
        else:
            day_s = day.isoformat()
        rows.append(
            [
                day_s,
                rng.choice(STATES),
                rng.choice(COUNTIES),
                cases,
                deaths,
                "North America",
                "cdc",
                str(rng.randint(0, 99999)),
                str(rng.randint(1000, 56045)),
            ]
        )
    return rows


def write_csv(path: str, rows) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(rows)
