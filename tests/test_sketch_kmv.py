"""Bounded-error contract for the KMV/theta set-operation sketches.

The driver hash-check certifies both engines run the identical
algebra; these tests pin that the algebra is also STATISTICALLY sound:
unsaturated sketches report exactly, and saturated estimates stay
within the published ~3/sqrt(k-2) relative-error band on real data
(deterministic — the hash is the sample, so these are fixed numbers,
not flaky draws)."""

from __future__ import annotations

import math

from coviddatapipeline_spark.operators.sketch import (
    KMV_K,
    sketch_kmv_set_ops,
)

import os

_TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SMALL_SF = os.path.join(_TESTDATA, "sf0.001")  # 15 users/type  -> unsaturated
BIG_SF = os.path.join(_TESTDATA, "sf0.01")  # 150 users/type -> saturated


def test_unsaturated_sketches_are_exact(spark):
    rows = sketch_kmv_set_ops(spark, SMALL_SF).collect()
    assert len(rows) == 9
    for r in rows:
        assert r["n_retained"] < KMV_K
        assert r["est"] == r["exact"], r
        assert r["err_e4"] == 0


def test_saturated_estimates_within_3sigma(spark):
    rows = sketch_kmv_set_ops(spark, BIG_SF).collect()
    assert len(rows) == 9
    bound_e4 = int(3 / math.sqrt(KMV_K - 2) * 10000)  # ~3810 for k=64
    saturated = [r for r in rows if "&" not in r["set_name"]]
    for r in saturated:
        assert r["n_retained"] == KMV_K, r
        assert r["err_e4"] <= bound_e4, r
    # intersections: absolute error is bounded by the UNION's scale,
    # not the intersection's own (theta comes from the per-set
    # sketches), so check against the matching union row
    unions = {r["set_name"]: r for r in rows if "|" in r["set_name"]}
    for r in rows:
        if "&" in r["set_name"]:
            u = unions[r["set_name"].replace("&", "|")]
            assert abs(r["est"] - r["exact"]) * 10000 <= bound_e4 * u["exact"], r


def test_union_never_below_either_side(spark):
    """Set algebra sanity on the ESTIMATES themselves: an estimated
    union dominates each side's estimate (the merged sketch's k-th
    minimum can only shrink), and the intersection estimate never
    exceeds the union estimate."""
    rows = {r["set_name"]: r for r in sketch_kmv_set_ops(spark, BIG_SF).collect()}
    for a, b in (("click", "purchase"), ("click", "view"), ("purchase", "view")):
        assert rows[f"{a}|{b}"]["est"] >= max(rows[a]["est"], rows[b]["est"])
        assert rows[f"{a}&{b}"]["est"] <= rows[f"{a}|{b}"]["est"]
