"""Structural invariants + plan shape for the sketch family
(Count-Min, Bloom) and the semantic-pruning entries — properties the
hash-parity oracle cannot express (they hold for ANY data, not just
this round's testdata)."""

from __future__ import annotations

from pyspark.sql import functions as F

from coviddatapipeline_spark.operators import sketch, similarity
from coviddatapipeline_spark.plans import assert_no_cartesian, audit


def test_cms_never_underestimates(spark, parity_sf_dir):
    """Count-Min's one-sided error guarantee: the estimate is exact
    count + non-negative collision mass, for every reported key."""
    rows = sketch.sketch_cms_heavy_hitters(spark, parity_sf_dir).collect()
    assert rows, "heavy-hitter report must be non-empty"
    for r in rows:
        assert r.cms_estimate >= r.exact_count, r
        assert r.overestimate == r.cms_estimate - r.exact_count, r


def test_cms_plan_broadcasts_grid(spark, parity_sf_dir):
    """The d x w grid is metadata-sized; the estimate join must be a
    broadcast hash join, never a shuffle of the key table against it."""
    df = sketch.sketch_cms_heavy_hitters(spark, parity_sf_dir)
    assert_no_cartesian(df)
    assert audit(df)["broadcast_joins"] >= 1


def test_bloom_no_false_negatives(spark, parity_sf_dir):
    """Bloom's defining guarantee: every true member passes the filter
    — passed must decompose exactly into members + false positives."""
    rows = sketch.bloom_join_prefilter_audit(spark, parity_sf_dir).collect()
    assert rows
    for r in rows:
        assert r.passed == r.true_members + r.false_positives, r
        assert 0 <= r.fp_rate_e4 <= 10000, r


def test_bloom_plan_broadcasts_bits(spark, parity_sf_dir):
    """The set-bit position table stands in for the real bitset: like
    the bits it models, it must be broadcast to the probe side."""
    df = sketch.bloom_join_prefilter_audit(spark, parity_sf_dir)
    assert_no_cartesian(df)
    assert audit(df)["broadcast_joins"] >= 1


def test_semdedup_prune_semantics(spark, parity_sf_dir):
    """pruned <=> threshold exceeded; exactly one cell-opening vector
    per cell carries the no-earlier-neighbor sentinel."""
    df = similarity.semdedup_cell_prune(spark, parity_sf_dir)
    assert_no_cartesian(df)  # the pair join must ride the cell equi-key
    rows = df.collect()
    n_cells = len({r.cell for r in rows})
    sentinels = [r for r in rows if r.max_earlier_cos == similarity.NO_EARLIER]
    assert len(sentinels) == n_cells  # the lowest vec_id of each cell
    for r in rows:
        if r.pruned:
            assert r.max_earlier_cos > similarity.SEMDEDUP_TAU - 1e-4, r
        else:
            assert r.max_earlier_cos <= similarity.SEMDEDUP_TAU + 1e-4, r


def test_semdedup_trained_cells_uses_audited_quantizer(spark, parity_sf_dir):
    """Shared-kernel proof: the trained-cell variant's (vec_id, cell)
    partitioning must be EXACTLY the audited Lloyd quantizer's
    assignment (km_train_centroids + km_assign — the model the IVF
    entries probe), and its prune report must equal the shared kernel
    composed by hand over those cells."""
    from coviddatapipeline_spark.operators.datapipe import (
        km_assign,
        km_train_centroids,
    )
    from pyspark.sql import functions as F

    df = similarity.semdedup_trained_cells(spark, parity_sf_dir)
    assert_no_cartesian(df)
    got_cells = {(r.vec_id, r.cell) for r in df.select("vec_id", "cell").collect()}
    q, cent = km_train_centroids(spark, parity_sf_dir)
    want_cells = {
        (r.vec_id, r.cluster)
        for r in km_assign(q, cent).select("vec_id", "cluster").collect()
    }
    assert got_cells == want_cells and len(want_cells) > 0
    # by-hand composition through the shared kernel matches the entry
    emb = similarity._emb(spark, parity_sf_dir).select("vec_id", "v")
    assigned = km_assign(q, cent).select(
        "vec_id", F.col("cluster").cast("long").alias("cell")
    )
    want = {
        (r.vec_id, r.cell, r.max_earlier_cos, r.pruned)
        for r in similarity.semdedup_prune_report(emb.join(assigned, "vec_id")).collect()
    }
    got = {(r.vec_id, r.cell, r.max_earlier_cos, r.pruned) for r in df.collect()}
    assert got == want
    # non-vacuity: the trained partitioning differs from the static
    # label cells somewhere (else the composition proves nothing)
    labels = {
        (r.vec_id, r.label)
        for r in similarity._emb(spark, parity_sf_dir).select("vec_id", "label").collect()
    }
    assert {c for _, c in got_cells} != {l for _, l in labels} or got_cells != labels


def test_matryoshka_recall_bounds(spark, parity_sf_dir):
    """Recall is a ratio of top-k overlaps: in [0, 1] for every query,
    and the report covers every query vector exactly once."""
    rows = similarity.ann_matryoshka_recall(spark, parity_sf_dir).collect()
    assert len(rows) == similarity.N_QUERIES
    for r in rows:
        assert 0.0 <= r.recall_at_k <= 1.0, r


def test_weighted_bernoulli_mass_matches_expectation(spark, parity_sf_dir):
    """The realized keep count must land near its expected integer mass
    (binomial concentration), and the kept rate must be the exact
    integer division of the counts — plus: weights in [0, 10000]."""
    from coviddatapipeline_spark.operators import datapipe

    rows = datapipe.sample_weighted_bernoulli(spark, parity_sf_dir).collect()
    assert rows
    tot_docs = sum(r.n_docs for r in rows)
    tot_kept = sum(r.n_kept for r in rows)
    tot_expected = sum(r.expected_kept_e4 for r in rows) / 10000.0
    assert 0 < tot_kept < tot_docs  # weighted, not all-or-nothing
    # 5-sigma binomial bound with worst-case p=0.5 variance
    assert abs(tot_kept - tot_expected) <= 5 * (tot_docs * 0.25) ** 0.5 + 1
    for r in rows:
        assert r.kept_rate_e4 == (r.n_kept * 10000) // r.n_docs, r


def test_hll_invariants(spark, parity_sf_dir):
    """HLL structural invariants for any data: registers bounded by
    [1, 27] via r_max, nonzero <= m, sum_scaled >= nonzero (each present
    register contributes >= 1 at the common denominator), and the ALL
    row's r_max is the max over group rows (register merge is max)."""
    from coviddatapipeline_spark.queries.catalog import all_queries

    rows = (
        all_queries()["sketch_hll_cardinality"].fn(spark, parity_sf_dir).collect()
    )
    groups = [r for r in rows if r["priority"] != "ALL"]
    alls = [r for r in rows if r["priority"] == "ALL"]
    assert len(alls) == 1 and groups
    for r in rows:
        assert 1 <= r["r_max"] <= 27
        assert 0 < r["nonzero_registers"] <= sketch.HLL_M
        assert r["sum_scaled"] >= r["nonzero_registers"]
        assert r["hll_estimate"] > 0
    assert alls[0]["r_max"] == max(r["r_max"] for r in groups)
    assert alls[0]["nonzero_registers"] >= max(
        r["nonzero_registers"] for r in groups
    )


def test_temporal_neighbor_join_is_equi_join(spark, parity_sf_dir):
    """The minute-bucketed +/-60s neighbor join must plan as an
    equi-join on the bucket key — no cartesian, no nested loop."""
    from coviddatapipeline_spark.queries.catalog import all_queries

    df = all_queries()["events_temporal_neighbor_join"].fn(spark, parity_sf_dir)
    assert_no_cartesian(df)
    total = df.agg(F.sum("n_events")).collect()[0][0]
    from coviddatapipeline_spark.operators.common import events

    assert total == events(spark, parity_sf_dir).count()


def test_semdedup_drift_audit_invariants(spark, parity_sf_dir):
    """The drift x semdedup composition audit: rotation is a bijection
    on the same vector set, so total occupancy is CONSERVED across the
    two partitionings while per-cell occupancy (and therefore the
    Sigma(cell^2) pairwise-work split) actually moves — and pairs must
    equal n*(n-1)/2 exactly on both sides. Non-vacuity: the drift
    shifts at least one cell's occupancy AND changes the total prune
    yield or the total pairwise work (else the audit audits nothing)."""
    df = similarity.semdedup_drift_work_audit(spark, parity_sf_dir)
    assert_no_cartesian(df)
    rows = df.collect()
    assert len(rows) > 1
    assert sum(r.n_base for r in rows) == sum(r.n_drift for r in rows) > 0
    for r in rows:
        assert r.pairs_base == r.n_base * (r.n_base - 1) // 2
        assert r.pairs_drift == r.n_drift * (r.n_drift - 1) // 2
        assert 0 <= r.pruned_base <= max(r.n_base - 1, 0)
        assert 0 <= r.pruned_drift <= max(r.n_drift - 1, 0)
    assert any(r.n_base != r.n_drift for r in rows), "drift moved nothing"
    assert (
        sum(r.pairs_base for r in rows) != sum(r.pairs_drift for r in rows)
        or sum(r.pruned_base for r in rows) != sum(r.pruned_drift for r in rows)
    ), "drift changed neither work nor prune yield"
