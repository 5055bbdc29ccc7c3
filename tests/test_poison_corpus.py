"""Poison-corpus robustness: the edge rows a 100 TB corpus certainly
contains — empty / whitespace-only / NULL text, zero-norm / empty /
NULL / wrong-dimension embeddings — must never ABORT a job. A NULL or
absent result for a degenerate row is acceptable behavior; an ANSI
INVALID_ARRAY_INDEX / DIVIDE_BY_ZERO / CAST_INVALID_INPUT or a ragged
``np.vstack`` that kills every task retry is not.

This pins the round-5 crash class found by ``tools/poison_probe.py``
(which sweeps ALL registered entries; this test pins the eleven entries
that crashed plus the semantic contracts of the fixes). The class is
invisible to oracle sweeps by construction: synthetic testdata contains
no degenerate rows, so Spark and DuckDB agree while both engines' jobs
would die on the first real-world malformed document.
"""

from __future__ import annotations

import shutil

import pytest

from coviddatapipeline_spark.queries import catalog
from tests.conftest import sf_dir

# The entries that CRASHED on the round-5 poison probe, grouped by root
# cause (see each operator's fix comment):
#   - getItem on empty/short vectors under ANSI (k-means family)
#   - ragged np.vstack in the blocked GEMM kernel
#   - ANSI DIVIDE_BY_ZERO on zero-piece docs / zero-norm prefixes /
#     zero-duration assets
#   - ANSI CAST_INVALID_INPUT on out-of-scheme source labels
#   - len(None) on NULL payloads in pandas kernels
#   - NULL dispatch-array subscript in the header probe
POISONED_ENTRIES = [
    "ann_cosine_topk_ivf_trained",
    "ivf_kmeans_lloyd",
    "ann_recall_trained_vs_exact",
    "dedup_embedding_cosine_pairs",
    "ann_matryoshka_recall",
    "text_bpe_token_estimate",
    "text_vocab_growth_curve",
    "mm_decode_features_pandas",
    "mm_image_decode_bmp",
    "mm_resize_plan_pandas",
    "mm_av_header_probe",
    # never crashed, but exercises the same guarded k-gram builder the
    # round-5 short-doc fix landed in (dedup.kgram_window_structs)
    "dedup_exact_substring_runs",
    # second probe axis (events/orders/lineitem poison): NULL order
    # date / all-NULL ship dates in the cogroup kernel, NaN price in
    # the integer-cents quantizer, zero prior-year revenue in the lag
    "cogroup_fulfillment_pandas",
    "window_moving_avg_7day_revenue",
    "orders_yoy_growth",
    # third probe axis (customer/supplier/part poison): the linkage
    # dirty-feed's md5-position arithmetic is `% length(name)` —
    # REMAINDER_BY_ZERO on the first empty part name
    "linkage_blocked_fuzzy_match",
]


@pytest.fixture(scope="module")
def poison_dir(spark, tmp_path_factory):
    from tools.poison_probe import build_poison_dir

    out = str(tmp_path_factory.mktemp("poison"))
    yield build_poison_dir(spark, base_sf=sf_dir("0.001"), out=out)
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("name", POISONED_ENTRIES)
def test_entry_survives_poison_rows(spark, poison_dir, name):
    rows = catalog.all_queries()[name].fn(spark, poison_dir).collect()
    assert rows  # executed AND produced the clean-data result set


def test_kmeans_ignores_degenerate_vectors(spark, poison_dir):
    """Cluster populations must count only corpus-dimensional vectors:
    the four poison vectors (zero-norm is valid 64-d; empty/NULL/short
    are not) may not crash training, and the three non-conforming ones
    may not be assigned anywhere."""
    clean = catalog.all_queries()["ivf_kmeans_lloyd"].fn(spark, sf_dir("0.001"))
    poisoned = catalog.all_queries()["ivf_kmeans_lloyd"].fn(spark, poison_dir)
    n_clean = sum(r["n"] for r in clean.collect())
    n_poison = sum(r["n"] for r in poisoned.collect())
    # exactly one poison vector (the zero vector, correct dim) joins
    assert n_poison == n_clean + 1


def test_bpe_estimate_null_not_abort(spark, poison_dir):
    rows = catalog.all_queries()["text_bpe_token_estimate"].fn(spark, poison_dir)
    empties = {
        r["doc_id"]: r["chars_per_piece"]
        for r in rows.filter("doc_id >= 990000000").collect()
    }
    # empty / whitespace / NULL text: zero pieces -> undefined ratio
    assert empties[990000001] is None
    assert empties[990000003] is None
    assert empties[990000005] is None
    # a real (if tiny) doc still gets a ratio
    assert empties[990000004] is not None


def test_vocab_growth_bad_source_groups_under_null(spark, poison_dir):
    rows = catalog.all_queries()["text_vocab_growth_curve"].fn(spark, poison_dir)
    idx = [r["source_idx"] for r in rows.collect()]
    assert None in idx  # out-of-scheme labels grouped, not job-aborting


def test_sessionization_excludes_null_ts(spark, poison_dir):
    """Session contract: an event with no timestamp has no position in
    any session. Poison user 77001 has one NULL-ts event (excluded) and
    one far-future event (a real, placeable event — included)."""
    rows = catalog.all_queries()["events_sessionization"].fn(spark, poison_dir)
    r = rows.filter("user_id = 77001").collect()[0]
    assert (r["n_sessions"], r["n_events"]) == (1, 1)


def test_mm_null_payload_is_zero_byte_asset(spark, poison_dir):
    feats = catalog.all_queries()["mm_decode_features_pandas"].fn(spark, poison_dir)
    row = feats.filter("doc_id = 990000005").collect()[0]
    assert row["n_bytes"] == 0 and row["first_byte"] == -1
