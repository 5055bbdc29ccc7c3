"""Semantic tests for operators whose guarantees are not (fully)
expressible as a DuckDB oracle: approximate sketches and the salted-agg
equivalence at the plan level."""

from __future__ import annotations

from pyspark.sql import functions as F

from coviddatapipeline_spark.queries import catalog
from coviddatapipeline_spark.operators.common import t

ALL = catalog.all_queries()


def test_approx_distinct_error_bound(spark, parity_sf_dir):
    """HLL++ at rsd=0.01 must land within 5% of the exact distinct count
    for every group (generous bound: 3-sigma at 1% rsd is 3%). The
    entry itself now carries this check as its oracle-hashed approx_ok
    column; this test independently recomputes the exact side so a bug
    in the entry's own exact_users aggregation can't mask a sketch
    violation."""
    rows = {
        r["event_type"]: r
        for r in ALL["approx_distinct_users_by_type"].fn(spark, parity_sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in t(spark, parity_sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(rows) == set(exact)
    for k, row in rows.items():
        assert row["exact_users"] == exact[k], (k, row, exact[k])
        assert row["approx_ok"], (k, row)


def test_salted_agg_no_single_reducer(spark, parity_sf_dir):
    """The salted aggregate's physical plan must contain two distinct
    hash aggregations (partial on (key, salt), final on key) — i.e. the
    salt survives into the plan rather than being optimized away."""
    from coviddatapipeline_spark.plans import executed_plan

    df = ALL["salted_agg_event_value"].fn(spark, parity_sf_dir)
    assert "salt" in executed_plan(df)


def test_range_join_is_equi_join(spark, parity_sf_dir):
    """The bucketed range join must plan as a hash/sort-merge equi-join,
    not a broadcast nested-loop cartesian: the bucket key gives Catalyst
    an equality predicate to hash on."""
    from coviddatapipeline_spark.plans import assert_no_cartesian

    df = ALL["range_join_clicks_before_purchase"].fn(spark, parity_sf_dir)
    assert_no_cartesian(df)


def test_multiprobe_recall_at_least_single_probe(spark, parity_sf_dir):
    """Probing 2 cells must recover at least as many of the exact top-k
    neighbors as probing 1 cell (the recall/cost dial moving the right
    way)."""
    def topk_sets(name):
        out = {}
        for r in ALL[name].fn(spark, parity_sf_dir).collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets("ann_cosine_topk_bruteforce")
    single = topk_sets("ann_cosine_topk_ivf")
    multi = topk_sets("ann_cosine_topk_multiprobe")

    def recall(probed):
        hits = sum(len(exact[q] & probed.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        return hits / total

    r1, r2 = recall(single), recall(multi)
    assert r2 >= r1, (r1, r2)


def test_simhash_banded_pairs_no_cartesian(spark, parity_sf_dir):
    """Both SimHash pair queries must plan as band equi-joins — zero
    BroadcastNestedLoopJoin/CartesianProduct (VERDICT r01 fix #5; the
    round-1 all-pairs form was a cartesian)."""
    from coviddatapipeline_spark.plans import assert_no_cartesian

    for name in ("dedup_simhash_near_pairs", "dedup_simhash_banded_pairs"):
        assert_no_cartesian(ALL[name].fn(spark, parity_sf_dir))


def test_tpch_q2_plan_shape(spark, parity_sf_dir):
    """Q2 argmin join-back: no data-sized cartesian (the partsupp
    fan-out is an explode, not a cross join; the single allowed
    nested-loop is the 1-row supplier-count scalar broadcast — the
    repo's standard scalar-subquery shape) and the constant dims
    broadcast."""
    from coviddatapipeline_spark.plans import audit

    a = audit(ALL["tpch_q2_min_cost_supplier"].fn(spark, parity_sf_dir))
    assert a["cartesian_products"] == 0
    # the 1-row count broadcast appears once per plan branch (eps feeds
    # both the min-agg and the join-back); each is O(1) rows
    assert a["nested_loop_joins"] <= 2
    assert a["broadcast_joins"] >= 2  # nation + region at minimum


def test_skew_salted_join_salt_in_plan(spark, parity_sf_dir):
    """The salt must survive into the physical join keys (not be
    optimized away) and the plan must stay cartesian-free."""
    from coviddatapipeline_spark.plans import assert_no_cartesian, executed_plan

    df = ALL["skew_salted_join_agg"].fn(spark, parity_sf_dir)
    assert_no_cartesian(df)
    assert "salt" in executed_plan(df)


def test_ffd_packing_invariants(spark, parity_sf_dir):
    """FFD must conserve docs/tokens vs the chop packer, be
    deterministic, and respect the capacity-derived bin bounds. (Its
    bin count is NOT comparable to the chop packer's: chop bins may
    overflow capacity when a doc straddles a boundary, so chop can
    report fewer, fuller-than-1.0 bins — asserting FFD <= chop would be
    wrong.)"""
    from coviddatapipeline_spark.operators.datapipe import CONTEXT_TOKENS

    greedy = {
        r.source: r for r in ALL["pack_sequences_greedy"].fn(spark, parity_sf_dir).collect()
    }
    ffd1 = {r.source: r for r in ALL["pack_sequences_ffd"].fn(spark, parity_sf_dir).collect()}
    ffd2 = {r.source: r for r in ALL["pack_sequences_ffd"].fn(spark, parity_sf_dir).collect()}
    assert ffd1.keys() == greedy.keys()
    for src, g in greedy.items():
        f = ffd1[src]
        assert f.n_docs == g.n_docs and f.total_tokens == g.total_tokens
        # structural bounds: at least one bin for a non-empty source,
        # never more bins than docs (each doc lands in exactly one bin)
        assert 1 <= f.n_bins <= f.n_docs
        # kernel reports fill as an exact e4 integer (floor division)
        assert f.fill_e4 == f.total_tokens * 10000 // (f.n_bins * CONTEXT_TOKENS)
        assert ffd2[src] == f  # deterministic


def test_star_cc_equals_propagation_cc(spark, parity_sf_dir):
    """The alternating-star components must agree exactly with the
    min-label-propagation components — same labels, any graph."""
    from coviddatapipeline_spark.operators.dedup import (
        dedup_components_labelprop,
        dedup_near_dup_components,
    )

    star = {r["doc_id"]: r["component"]
            for r in dedup_near_dup_components(spark, parity_sf_dir).collect()}
    prop = {r["doc_id"]: r["component"]
            for r in dedup_components_labelprop(spark, parity_sf_dir).collect()}
    assert star == prop and len(star) > 0


def test_canonical_doc_no_global_window(spark, parity_sf_dir):
    """The per-component argmax window must be partitioned — no
    Exchange SinglePartition over the SF-scaled documents table."""
    from coviddatapipeline_spark.operators.dedup import (
        dedup_canonical_doc_per_component,
    )
    from coviddatapipeline_spark.plans import executed_plan

    plan = executed_plan(dedup_canonical_doc_per_component(spark, parity_sf_dir))
    # the final .orderBy is a global sort of the (tiny) component summary;
    # strip it before asserting, then require no other single-partition stage
    body = plan.split("Sort", 1)[-1]
    assert "Exchange SinglePartition" not in body


def test_star_components_vs_union_find(spark):
    """star_components on adversarial graphs (long chain — diameter far
    beyond the round budget if rounds scaled with diameter — plus
    disjoint cliques and a seeded random graph) must match a Python
    union-find exactly."""
    import random

    from coviddatapipeline_spark.operators.dedup import star_components

    def uf_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    rng = random.Random(7)
    graphs = {
        # 60-node chain: diameter 59 >> 12 rounds — only a
        # diameter-independent algorithm converges inside the budget
        "chain": [(i, i + 1) for i in range(60)],
        "cliques": [(10 * c + i, 10 * c + j)
                    for c in range(3) for i in range(5) for j in range(i + 1, 5)],
        "random": list({tuple(sorted(rng.sample(range(40), 2)))
                        for _ in range(50)}),
    }
    for name, edges in graphs.items():
        df = spark.createDataFrame(edges, "a: long, b: long")
        got = {r["node"]: r["component"]
               for r in star_components(df).collect()}
        assert got == uf_components(edges), name


def test_salted_band_join_plan_and_parity(spark, parity_sf_dir):
    """The skew-hardened band join must (a) keep the salt column in the
    equi-join keys — so a viral band value fans out across tasks instead
    of serializing into one — (b) contain no cartesian/nested-loop, and
    (c) produce EXACTLY the unsalted candidate pairs."""
    from coviddatapipeline_spark.operators.dedup import (
        dedup_simhash_banded_pairs_salted,
        dedup_simhash_near_pairs,
    )
    from coviddatapipeline_spark.plans import assert_no_cartesian, executed_plan

    df = dedup_simhash_banded_pairs_salted(spark, parity_sf_dir)
    assert_no_cartesian(df)
    assert "__salt" in executed_plan(df)

    salted = {(r.doc_a, r.doc_b, r.hamming) for r in df.collect()}
    plain = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_simhash_near_pairs(spark, parity_sf_dir).collect()
    }
    assert salted == plain and len(salted) > 0


def test_chunk_count_closed_form():
    """The chunking audit uses a closed form instead of exploding
    chunks; verify it against an explicit sliding-window enumeration
    for every length up to 10x the window."""
    from coviddatapipeline_spark.operators.datapipe import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )
    import math

    for n in range(1, CHUNK_TOKENS * 10):
        starts = [0]
        while starts[-1] + CHUNK_TOKENS < n:
            starts.append(starts[-1] + CHUNK_STRIDE)
        expected = len(starts)
        closed = 1 if n <= CHUNK_TOKENS else math.ceil((n - CHUNK_TOKENS) / CHUNK_STRIDE) + 1
        assert closed == expected, (n, closed, expected)
        emitted = min(n, CHUNK_TOKENS) + (closed - 1) * CHUNK_TOKENS
        # every chunk is CHUNK_TOKENS long except possibly the last
        real = sum(min(CHUNK_TOKENS, n - s) for s in starts)
        # emitted over-counts only the final short chunk's padding-free tail
        assert emitted >= real and emitted - real < CHUNK_TOKENS


def test_canonical_select_covers_components(spark, parity_sf_dir):
    """Every near-dup component keeps exactly one canonical doc, the
    canonical is a member, cluster sizes are >= 2 impossible to assert
    (singletons only when a pair collapses) — but size >= 1, dropped =
    size - 1, and the component ids match the registered CC entry."""
    comp = {
        r["component"]
        for r in ALL["dedup_near_dup_components"].fn(spark, parity_sf_dir).collect()
    }
    rows = (
        ALL["dedup_cluster_canonical_select"].fn(spark, parity_sf_dir).collect()
    )
    assert {r["component"] for r in rows} == comp
    for r in rows:
        assert r["cluster_size"] >= 1
        assert r["n_dropped"] == r["cluster_size"] - 1
        assert r["canonical_chars"] >= 0


def test_path_mining_shares_and_ranks(spark, parity_sf_dir):
    """Path ranks are dense from 1, counts non-increasing, every path
    is three '>'-joined event types, and shares are consistent."""
    rows = ALL["events_session_path_mining"].fn(spark, parity_sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r["path"].split(">")) == 3
        assert 0 <= r["share_e4"] <= 10000


def test_curation_manifest_accounting(spark, parity_sf_dir):
    """Per source, drop reasons + kept must partition n_docs exactly;
    the corpus-wide totals must cover every document once."""
    rows = ALL["docpipe_curation_manifest"].fn(spark, parity_sf_dir).collect()
    from coviddatapipeline_spark.operators.common import t

    total_docs = t(spark, parity_sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total_docs
    for r in rows:
        assert (
            r["drop_low_quality"] + r["drop_exact_dup"] + r["drop_near_dup"] + r["kept"]
            == r["n_docs"]
        )
        assert 0 <= r["kept_share_e4"] <= 10000
        assert (r["kept"] == 0) == (r["kept_tokens"] == 0)
