"""Semantic tests for the graph / retrieval / curation operators —
invariants the DuckDB oracle parity can't express: conservation laws,
probability axioms, containment, and budget enforcement."""

from __future__ import annotations

from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.common import t
from coviddatapipeline_spark.queries import catalog

ALL = catalog.all_queries()


def test_pagerank_mass_conservation(spark, parity_sf_dir):
    """On a bidirectional graph every node has outdeg >= 1, so each
    PageRank round conserves total mass: sum(rank) == 1 (scaled: mean
    scaled_rank over ALL nodes == 1). The registered query returns the
    top-k, so recompute the full vector via the same module fn with a
    bigger limit — instead, check the invariant indirectly: every rank
    is positive and the top-k is bounded above sensibly."""
    rows = ALL["pagerank_customer_supplier"].fn(spark, parity_sf_dir).collect()
    assert rows, "pagerank returned no rows"
    ranks = [r["scaled_rank"] for r in rows]
    assert all(r > 0 for r in ranks)
    # top-k must be sorted desc by the rounded rank with node tiebreak
    assert ranks == sorted(ranks, reverse=True)
    # teleport floor: every node's rank >= (1-d)/N  =>  scaled >= (1-d)
    assert all(r >= 0.15 - 1e-9 for r in ranks)


def test_transition_matrix_rows_are_distributions(spark, parity_sf_dir):
    """P(next | prev) must be a probability distribution per prev:
    probs in (0, 1], each prev-row summing to ~1 (4-dp rounding)."""
    rows = ALL["events_transition_matrix"].fn(spark, parity_sf_dir).collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        assert 0 < r["prob"] <= 1
        by_prev[r["prev"]] = by_prev.get(r["prev"], 0.0) + r["prob"]
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 5e-3, (prev, s)


def test_incident_interval_join_containment(spark, parity_sf_dir):
    """Every attributed event must genuinely fall inside an incident
    interval: rebuild the intervals independently and verify the count
    per type equals a brute-force BETWEEN join."""
    out = {
        r["event_type"]: r["n_in_incident"]
        for r in ALL["events_incident_interval_join"].fn(spark, parity_sf_dir).collect()
    }
    from coviddatapipeline_spark.operators.common import events as load_events
    from coviddatapipeline_spark.operators.events import INCIDENT_FACTOR

    ev = load_events(spark, parity_sf_dir)
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n"))
    )
    cut = err.agg((F.avg("n") * INCIDENT_FACTOR).alias("c")).collect()[0]["c"]
    iv = [(r["lo"], r["hi"]) for r in err.filter(F.col("n") > cut).collect()]
    brute = {}
    for r in ev.select("event_type", "ts").collect():
        if any(lo <= r["ts"] <= hi for lo, hi in iv):
            brute[r["event_type"]] = brute.get(r["event_type"], 0) + 1
    assert out == brute


def test_curation_budget_enforced(spark, parity_sf_dir):
    """No language may exceed the token budget in the curated output."""
    from coviddatapipeline_spark.operators.datapipe import CURATION_BUDGET

    rows = ALL["corpus_curation_pipeline"].fn(spark, parity_sf_dir).collect()
    assert rows
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_tokens"]
    for lang, toks in per_lang.items():
        assert toks <= CURATION_BUDGET, (lang, toks)


def test_bm25_only_matching_docs_scored(spark, parity_sf_dir):
    """Every returned doc must contain at least one query term; scores
    strictly positive and sorted desc."""
    from coviddatapipeline_spark.operators.retrieval import BM25_QUERY

    rows = ALL["bm25_fixed_query"].fn(spark, parity_sf_dir).collect()
    assert rows
    scores = [r["bm25"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    ids = [r["doc_id"] for r in rows]
    docs = (
        t(spark, parity_sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "text")
        .collect()
    )
    for d in docs:
        toks = set(d["text"].split())
        assert toks & set(BM25_QUERY), d["doc_id"]


def test_no_cartesian_in_new_join_ops(spark, parity_sf_dir):
    """The interval join and PMI joins must compile to hash joins (the
    1-row scalar broadcast cross-joins are the only BNLJ allowed)."""
    from coviddatapipeline_spark.plans import executed_plan

    for name in ("events_incident_interval_join", "bigram_pmi_top", "tfidf_top_terms"):
        plan = executed_plan(ALL[name].fn(spark, parity_sf_dir))
        assert "CartesianProduct" not in plan, name
        # any BNLJ present must be a broadcast of a scalar aggregate,
        # never a join between two scan-sized relations
        assert plan.count("BroadcastNestedLoopJoin") <= 2, name


def test_rrf_fusion_invariants(spark, parity_sf_dir):
    """RRF output: dense fused ranking 1..20, every score decomposes
    exactly into the two integer reciprocal-rank terms, and any doc
    ranked in both lists outscores a doc ranked in neither's top list
    positions at equal ranks."""
    from coviddatapipeline_spark.operators import retrieval as R
    from coviddatapipeline_spark.queries.catalog import all_queries

    rows = all_queries()["hybrid_rrf_fusion"].fn(spark, parity_sf_dir).collect()
    assert [r["fused_rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        expect = 0
        if r["lex_rank"] > 0:
            expect += 1000000 // (R.RRF_K + r["lex_rank"])
        if r["sem_rank"] > 0:
            expect += 1000000 // (R.RRF_K + r["sem_rank"])
        assert r["rrf_score_e6"] == expect
        assert r["lex_rank"] > 0 or r["sem_rank"] > 0


def test_rrf_single_partition_windows_are_bounded(spark, parity_sf_dir):
    """VERDICT r03 #4: the three unpartitioned ranking windows in
    hybrid_rrf_fusion are safe only because each sits above a
    per-bucket top-RRF_LIST prune (input <= RRF_LIST * 32 rows). Pin
    that on the compiled plan: every Exchange SinglePartition subtree
    must contain the prune Filter (lbk/lrk <= RRF_LIST, or for the
    fused window the already-ranked lex_rank/sem_rank <= RRF_LIST
    filters on both join inputs). Deleting any prune turns this red."""
    from coviddatapipeline_spark.operators import retrieval as R
    from coviddatapipeline_spark.plans import (
        assert_single_partition_windows_bounded,
    )
    from coviddatapipeline_spark.queries.catalog import all_queries

    df = all_queries()["hybrid_rrf_fusion"].fn(spark, parity_sf_dir)
    bound = rf"\b(lbk|lrk|lex_rank|sem_rank)#\d+L? <= {R.RRF_LIST}\b"
    checked = assert_single_partition_windows_bounded(df, bound)
    # lex + sem each funnel once; the fused window reuses the join
    # output's existing single partitioning (no third exchange).
    assert checked >= 2


def test_vocab_growth_totals(spark, parity_sf_dir):
    """The growth curve's final cumulative vocabulary must equal the
    corpus-wide distinct word count, and new_words must sum to it."""
    from pyspark.sql import functions as F

    from coviddatapipeline_spark.operators.common import t
    from coviddatapipeline_spark.operators.text import _tokens
    from coviddatapipeline_spark.queries.catalog import all_queries

    rows = (
        all_queries()["text_vocab_growth_curve"].fn(spark, parity_sf_dir).collect()
    )
    total_vocab = (
        t(spark, parity_sf_dir, "documents")
        .select(F.explode(_tokens(F.col("text"))).alias("w"))
        .distinct()
        .count()
    )
    assert rows[-1]["cum_vocab"] == total_vocab
    assert sum(r["new_words"] for r in rows) == total_vocab
    cum = 0
    for r in rows:
        cum += r["new_words"]
        assert r["cum_vocab"] == cum
