"""Round-13 optimization internals (OPTIMIZATION_r13.md §1/§2).

ADVICE r12 (medium): the §C3 SQL-template rewrite of the unigram DP
injected the vocabulary as ``map_from_arrays(transform(split(b64),
unbase64))`` and claimed Catalyst constant-folds it — but ``transform``
is a higher-order function and HOFs are never foldable, so the executed
plan rebuilt the map O(|vocab|) at runtime per candidate per character
per distinct word. The fix builds each key as its own lambda-free
``CAST(unbase64('..') AS STRING)`` call so the whole chain folds back
to the one map literal ``create_map`` used to produce. These tests pin
the fold on the OPTIMIZED plan (the thing that executes), plus the
degenerate vocab keys the base64 injection exists for.

ADVICE r12 (low): ``_bm25_scored`` persisted its narrow per-doc base
and never unpersisted it, and is invoked independently by both
``bm25_fixed_query`` and ``hybrid_rrf_fusion`` on every query build.
It now memoizes ONE persisted base per (session, documents-file
signature) and unpersists a superseded base when the file changes.
"""

from __future__ import annotations

import os
import time

from coviddatapipeline_spark.operators import retrieval
from coviddatapipeline_spark.operators.retrieval import _bm25_scored
from coviddatapipeline_spark.operators.text import _uni_best_seg


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_uni_vocab_map_is_folded_literal(spark):
    """The executed plan must carry the vocab as ONE folded map literal
    — no residual map_from_arrays/unbase64 calls re-building it per
    candidate at runtime (ADVICE r12 medium)."""
    df = spark.createDataFrame([("abc",)], ["word"])
    out = df.withColumn("dp", _uni_best_seg("word", {"a": 3, "b": 2, "ab": 5}))
    plan = _optimized_plan(out)
    assert "map_from_arrays" not in plan, "vocab map did not constant-fold"
    assert "unbase64" not in plan, "per-key decode must fold away"
    assert "keys: [" in plan, "expected a folded map literal in the plan"


def test_uni_vocab_map_folds_for_empty_vocab(spark):
    df = spark.createDataFrame([("abc",)], ["word"])
    out = df.withColumn("dp", _uni_best_seg("word", {}))
    plan = _optimized_plan(out)
    assert "map_from_arrays" not in plan
    rows = out.collect()
    # no vocab -> no reachable segmentation -> total NULL struct
    assert rows[0]["dp"] is None or rows[0]["dp"]["np"] is None


def test_uni_vocab_map_quote_backslash_keys_fold_and_segment(spark):
    """The base64 injection exists so ANY corpus string is a safe SQL
    key; the lambda-free form must keep that property AND still fold."""
    vocab = {"a": 3, "b": 2, "c": 1, "a'b": 5, "\\": 7, 'x"y': 4}
    df = spark.createDataFrame([("a'b\\c",), ('x"yc',)], ["word"])
    out = df.withColumn("dp", _uni_best_seg("word", vocab))
    plan = _optimized_plan(out)
    assert "map_from_arrays" not in plan
    got = {r["word"]: (r["dp"]["np"], r["dp"]["negsc"], r["dp"]["enc"])
           for r in out.collect()}
    # min pieces first: a'b | \ | c beats any single-char split
    assert got["a'b\\c"] == (3, -(5 + 7 + 1), "a'b \\ c")
    assert got['x"yc'] == (2, -(4 + 1), 'x"y c')


def test_bm25_scored_memoized_per_signature(spark, tmp_path):
    """Two builds over the same documents file share ONE scored frame
    (and thus one persisted base); a rewrite invalidates the memo,
    unpersists the superseded base, and the fresh frame computes from
    the new bytes (ADVICE r12 low). Cache occupancy stays at exactly
    one entry for the whole sequence — Spark's CacheManager matches
    same-path parquet plans as ``sameResult`` regardless of the file
    listing snapshot, so the per-handle ``storageLevel`` cannot
    distinguish old from new; ``numCachedEntries`` can."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    n0 = cm.numCachedEntries()
    d = str(tmp_path)
    docs = spark.createDataFrame(
        [(1, "table hash window"), (2, "table table join"), (3, None)],
        ["doc_id", "text"],
    )
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    s1 = _bm25_scored(spark, d)
    s2 = _bm25_scored(spark, d)
    assert s1 is s2, "same file signature must reuse the memoized scored frame"
    s1.count()  # materialize the persisted base
    assert cm.numCachedEntries() == n0 + 1
    per = retrieval._BM25_CACHE[spark]
    (key1,) = [k for k in per if k[0].startswith(d)]

    time.sleep(0.05)
    docs2 = spark.createDataFrame(
        [(1, "window window window"), (4, "hash")], ["doc_id", "text"]
    )
    docs2.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    s3 = _bm25_scored(spark, d)
    assert s3 is not s1, "rewritten documents must invalidate the memo"
    # the fresh frame computes from the NEW bytes
    got = {r["doc_id"]: r["score"] for r in s3.collect()}
    assert set(got) == {1, 4}
    # no accumulation: superseded base evicted, exactly one live entry
    assert cm.numCachedEntries() == n0 + 1, "superseded base must be unpersisted"
    # memo holds exactly one entry for this path
    assert len([k for k in per if k[0] == key1[0]]) == 1
    # cleanup: drop this test's entry so later tests see their own deltas
    per.pop([k for k in per if k[0] == key1[0]][0])[1].unpersist()


def test_bm25_scored_results_unchanged_by_memo(spark, tmp_path):
    """The memoized frame is a lazy plan — collecting it twice gives the
    same rows, and the scores match an unmemoized re-derivation from a
    copy of the same data."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    rows = [
        (1, "table hash window extra words"),
        (2, "table table table"),
        (3, "nothing relevant here"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for d in (d1, d2):
        os.makedirs(d, exist_ok=True)
        docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    a = sorted(map(tuple, _bm25_scored(spark, d1).collect()))
    b = sorted(map(tuple, _bm25_scored(spark, d2).collect()))
    assert a == b
    a2 = sorted(map(tuple, _bm25_scored(spark, d1).collect()))
    assert a == a2
