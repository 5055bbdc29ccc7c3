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


def test_triangle_dense_path_equals_wedge_close(spark, parity_sf_dir, monkeypatch):
    """OPTIMIZATION_r13 §3: the node-count-gated bitset fast path and
    the published degree-ordered wedge-close must produce the identical
    entry rows — same exact n_triangles, same clustering — on the real
    corpus. The gate is flipped via the module constant, exactly how a
    >16384-node graph would flip it."""
    from coviddatapipeline_spark.operators import graph as G

    fast = G.graph_triangle_stats(spark, parity_sf_dir).collect()
    monkeypatch.setattr(G, "TRI_DENSE_MAX_NODES", -1)
    slow = G.graph_triangle_stats(spark, parity_sf_dir).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]
    assert fast[0]["n_triangles"] > 0  # non-vacuous


def test_triangle_dense_kernel_random_graph(spark, monkeypatch):
    """Both counting paths on a seeded random graph (edges the entry's
    co-occurrence construction would never produce — odd ids, gaps,
    isolated-pair components), plus a brute-force reference count."""
    import itertools
    import random

    from coviddatapipeline_spark.operators import graph as G

    rnd = random.Random(13)
    nodes = [3, 7, 11, 20, 21, 22, 40, 41, 55, 56, 57, 58, 90, 91, 500]
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a in nodes
            for b in nodes
            if a != b and rnd.random() < 0.4
        }
    )
    ref = sum(
        1
        for x, y, z in itertools.combinations(sorted(nodes), 3)
        if (x, y) in set(edges) and (x, z) in set(edges) and (y, z) in set(edges)
    )
    edf = spark.createDataFrame(edges, ["u", "v"]).localCheckpoint(eager=True)
    from pyspark.sql import functions as F

    deg = (
        edf.select(F.col("u").alias("node"))
        .unionByName(edf.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    n = deg.count()
    fast = G._tri_count_dense(spark, edf, deg, n).collect()[0]["n_triangles"]
    slow = G._tri_count_wedge_close(edf, deg).collect()[0]["n_triangles"]
    assert fast == slow == ref


def test_triangle_dense_kernel_empty_graph(spark):
    """Zero edges -> n_triangles must be 0 (not NULL) on both paths."""
    from pyspark.sql import functions as F

    from coviddatapipeline_spark.operators import graph as G

    edf = spark.createDataFrame([], "u long, v long").localCheckpoint(eager=True)
    deg = (
        edf.select(F.col("u").alias("node"))
        .unionByName(edf.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    fast = G._tri_count_dense(spark, edf, deg, 0).collect()
    slow = G._tri_count_wedge_close(edf, deg).collect()
    assert fast[0]["n_triangles"] == 0
    assert slow[0]["n_triangles"] == 0


def _knn_join_reference(cells):
    """The pre-r13 join+window formulation of the within-cell kNN graph,
    inlined verbatim as the differential reference."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from coviddatapipeline_spark.operators.similarity import KNN_K, _dot

    a = cells.select(F.col("vec_id"), F.col("label"), F.col("v").alias("va"))
    b = cells.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("blabel"),
        F.col("v").alias("vb"),
    )
    joined = a.join(
        b,
        (F.col("label") == F.col("blabel"))
        & (F.col("vec_id") != F.col("neighbor_id")),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        joined.withColumn("cos", _dot("va", "vb"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("vec_id", "neighbor_id", "rank", F.round("cos", 4).alias("cosine"))
    )


def _knn_rows_key(rows):
    return sorted(
        (r["vec_id"], r["rank"], r["neighbor_id"], repr(r["cosine"])) for r in rows
    )


def test_knn_kernel_equals_join_on_corpus(spark, parity_sf_dir):
    from coviddatapipeline_spark.operators.similarity import (
        _emb,
        knn_within_cell_report,
    )

    cells = _emb(spark, parity_sf_dir)
    new = _knn_rows_key(knn_within_cell_report(cells).collect())
    old = _knn_rows_key(_knn_join_reference(cells).collect())
    assert new == old and len(new) > 0


def test_knn_kernel_degenerate_rows(spark):
    """Crafted rows covering every seam the kernel must reproduce from
    the join+window formulation: NULL label (never joins), NULL vec_id
    (neither source nor candidate), NULL vector / NULL element (NULL
    cosine: ranked last but still emitted), NaN coordinate (NaN cosine
    ranks FIRST — Spark orders NaN greatest under DESC), duplicate
    vec_id values (the window merges both rows' candidates into one
    partition), and a small cell where NULL-cos candidates make the
    top-k."""
    from coviddatapipeline_spark.operators.common import EMB_DIM
    from coviddatapipeline_spark.operators.similarity import (
        knn_within_cell_report,
    )

    def vec(x0, fill=0.0):
        return [float(x0)] + [float(fill)] * (EMB_DIM - 1)

    nanv = [float("nan")] + [0.0] * (EMB_DIM - 1)
    nullelem = [None] + [1.0] * (EMB_DIM - 1)
    rows = [
        (1, "a", vec(1.0)),
        (2, "a", vec(2.0)),
        (3, "a", nullelem),   # NULL cosine with everyone
        (4, "a", None),       # NULL vector
        (5, "a", nanv),       # NaN cosine ranks first
        (2, "a", vec(9.0)),   # duplicate id: merged candidate list
        (6, None, vec(5.0)),  # NULL label: no rows at all
        (7, "b", vec(3.0)),   # lone valid vector, only degenerate peers
        (None, "b", vec(4.0)),  # NULL id: invisible
        (8, "b", nullelem),
    ]
    cells = spark.createDataFrame(rows, "vec_id long, label string, v array<double>")
    new = _knn_rows_key(knn_within_cell_report(cells).collect())
    old = _knn_rows_key(_knn_join_reference(cells).collect())
    assert new == old
    ids = {r[0] for r in new}
    assert 6 not in ids  # NULL label emitted nothing
    assert None not in ids
    # vec 7 pairs only with the NULL-element vec 8 -> one NULL-cos row
    v7 = [r for r in new if r[0] == 7]
    assert len(v7) == 1 and v7[0][3] == repr(None)


def test_layout_rle_pair_formulations_agree(spark, parity_sf_dir):
    """OPTIMIZATION_r13 §7: the bucket-lag + boundary-pair formulation
    must equal the old rn+1 self-join over the cutpoint-bucketed global
    row number — on the real corpus and on a crafted frame with NULL
    status / NULL key rows (which land in the smallest bucket and pair
    like any other row; NULL <> NULL is never a change, matching the
    old when(va != vb) gate)."""

    from pyspark.sql import functions as F

    from coviddatapipeline_spark.operators import warehouse as WH
    from coviddatapipeline_spark.operators.common import t
    from coviddatapipeline_spark.operators.ranking import with_global_row_number

    def old_profile(orders, keys, layout):
        ranked, _n = with_global_row_number(orders, keys, out="rn")
        a = ranked.select(F.col("o_orderstatus").alias("va"), "rn")
        bdf = ranked.select(
            F.col("o_orderstatus").alias("vb"), (F.col("rn") - 1).alias("rn")
        )
        return (
            a.join(bdf, "rn")
            .agg(
                F.count("*").alias("pairs"),
                F.sum(F.when(F.col("va") != F.col("vb"), 1).otherwise(0)).alias(
                    "changes"
                ),
            )
            .select(
                F.lit(layout).alias("layout"),
                (F.col("pairs") + 1).cast("long").alias("n_rows"),
                (F.col("changes") + 1).cast("long").alias("n_runs"),
            )
        )

    # real corpus: full entry rows vs the old formulation rebuilt
    orders = t(spark, parity_sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate",
        F.ascii("o_orderstatus").alias("status_code"),
    )
    old = sorted(
        tuple(r)
        for r in old_profile(orders, ["status_code", "o_orderkey"], "by_status")
        .unionByName(old_profile(orders, ["o_orderdate", "o_orderkey"], "by_date"))
        .collect()
    )
    new_rows = WH.layout_rle_run_profile(spark, parity_sf_dir).collect()
    new = sorted((r["layout"], r["n_rows"], r["n_runs"]) for r in new_rows)
    assert new == old

    # crafted degenerate frame (NULL status, NULL key, one-row bucket)
    rows = [
        (1, "O", "1998-01-01"),
        (2, "O", "1998-01-02"),
        (3, None, "1998-01-03"),
        (None, "F", None),
        (5, "F", "1998-01-05"),
    ]
    crafted = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_orderdate string"
    ).select(
        "o_orderkey", "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.ascii("o_orderstatus").alias("status_code"),
    )
    for keys in (["status_code", "o_orderkey"], ["o_orderdate", "o_orderkey"]):
        got_old = old_profile(crafted, keys, "x").collect()[0]
        # rebuild the new formulation inline over the crafted frame
        from coviddatapipeline_spark.operators.ranking import (
            _BKT,
            _monotone_numeric,
            _range_buckets,
            const_key,
        )
        from pyspark.sql.window import Window

        bucketed = _range_buckets(crafted, _monotone_numeric(crafted, keys[0]), 8)
        w = Window.partitionBy(_BKT).orderBy(*[F.col(k) for k in keys])
        within = (
            bucketed.select(
                F.col("o_orderstatus").alias("vb"),
                F.lag("o_orderstatus").over(w).alias("va"),
                F.lag(F.lit(1)).over(w).alias("has_prev"),
            )
            .filter(F.col("has_prev") == 1)
            .select("va", "vb")
        )
        ksort = F.struct(*[F.col(k) for k in keys])
        summary = bucketed.groupBy(_BKT).agg(
            F.min_by("o_orderstatus", ksort).alias("first_v"),
            F.max_by("o_orderstatus", ksort).alias("last_v"),
        )
        wb = Window.partitionBy(const_key(_BKT)).orderBy(_BKT)
        boundary = (
            summary.select(
                F.col("first_v").alias("vb"),
                F.lag("last_v").over(wb).alias("va"),
                F.lag(F.lit(1)).over(wb).alias("has_prev"),
            )
            .filter(F.col("has_prev") == 1)
            .select("va", "vb")
        )
        got_new = (
            within.unionByName(boundary)
            .agg(
                F.count("*").alias("pairs"),
                F.sum(F.when(F.col("va") != F.col("vb"), 1).otherwise(0)).alias(
                    "changes"
                ),
            )
            .select(
                ((F.col("pairs") + 1).cast("long")).alias("n_rows"),
                ((F.col("changes") + 1).cast("long")).alias("n_runs"),
            )
            .collect()[0]
        )
        assert (got_new["n_rows"], got_new["n_runs"]) == (
            got_old["n_rows"],
            got_old["n_runs"],
        )


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
