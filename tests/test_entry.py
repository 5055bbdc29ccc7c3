"""Smoke test of the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_flagship(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "revenue", "n_items"}


def test_queries_oracle_keys_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query; queries without oracle are allowed
    assert set(oracles) <= set(qs)
