"""Query registry.

Operator modules call :func:`register` at import time; the driver-facing
``queries()`` / ``oracle_sql()`` mappings are assembled from the
registry. Column names are part of the contract: the driver compares a
Spark result against the DuckDB oracle by (row count, schema, order-
insensitive value hash) with columns sorted by name, so every computed
column must carry the same alias on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules whose import populates the registry.
_OPERATOR_MODULES = (
    "coviddatapipeline_spark.operators.relational",
    "coviddatapipeline_spark.operators.relational_ext",
    "coviddatapipeline_spark.operators.advanced",
    "coviddatapipeline_spark.operators.reshape",
    "coviddatapipeline_spark.operators.covid",
    "coviddatapipeline_spark.operators.dedup",
    "coviddatapipeline_spark.operators.similarity",
    "coviddatapipeline_spark.operators.text",
    "coviddatapipeline_spark.operators.events",
    "coviddatapipeline_spark.operators.multimodal",
    "coviddatapipeline_spark.operators.tpch_more",
    "coviddatapipeline_spark.operators.tpch_rest",
    "coviddatapipeline_spark.operators.datapipe",
    "coviddatapipeline_spark.operators.warehouse",
    "coviddatapipeline_spark.operators.retrieval",
    "coviddatapipeline_spark.operators.graph",
    "coviddatapipeline_spark.operators.timeseries",
    "coviddatapipeline_spark.operators.linalg",
    "coviddatapipeline_spark.operators.sketch",
)


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB ANSI SQL, None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    src: QueryFn | None = None  # unwrapped builder (for fingerprinting)


# Cross-cutting modules whose behavior flows into MANY entries'
# results (the global-ranking machinery, the shared table loader /
# oracle templates, the session confs). Their sources salt EVERY
# entry fingerprint: module-level hashing alone has a blind spot —
# an edit to ranking.py changes the semantics of a dozen entries
# defined in OTHER modules whose own files (and therefore stamps)
# are untouched.
_FINGERPRINT_SALT_MODULES = (
    "coviddatapipeline_spark.operators.ranking",
    "coviddatapipeline_spark.operators.common",
    "coviddatapipeline_spark.session",
    # storage protocol: the versioned-table commit/compact/time-travel
    # API flows into entries that read their own committed snapshots
    # back (warehouse_snapshot_diff_cdc), so an edit here must re-gate
    # stamps like any shared-helper edit
    "coviddatapipeline_spark.sources",
)


def entry_fingerprint(name: str) -> str:
    """Content hash of an entry: its defining module's source + oracle
    + the shared-helper salt modules above.

    The sweep gate (tools/sweep_oracles.py + tests/test_window_swept.py)
    stamps each locally-verified entry with this hash; editing any code
    in the entry's module, its oracle, or a shared helper invalidates
    the stamp, so an unswept or stale entry cannot sit in the driver's
    50-slot window without a red test. Module-level hashing is
    deliberately conservative: touching one function re-gates every
    entry in that module (and touching a salt module re-gates ALL
    entries), which is exactly when a re-sweep is wanted.
    """
    import hashlib
    import importlib
    import inspect
    import sys as _sys

    q = get(name)
    src_fn = q.src or q.fn
    mod_file = inspect.getfile(_sys.modules[src_fn.__module__])
    h = hashlib.sha256()
    with open(mod_file, "rb") as f:
        h.update(f.read())
    for salt_mod in _FINGERPRINT_SALT_MODULES:
        with open(inspect.getfile(importlib.import_module(salt_mod)), "rb") as f:
            h.update(f.read())
    h.update((q.oracle or "").encode())
    return h.hexdigest()


_REGISTRY: dict[str, Query] = {}
_LOADED = False

# The driver's correctness gate covers the FIRST 50 entries of queries()
# iteration order; the window is 50 of ~180 registered entries, so the
# list ROTATES each round (VERDICT.md round 2, fix #6): a small sentinel
# set of previously-green rows stays pinned, every entry whose oracle or
# implementation changed this round enters the window for verification,
# and the remaining slots cycle through families no CORRECTNESS file has
# covered yet. Rows-only entries (no oracle) are kept BELOW the window —
# a slot the driver can't hash-check is a wasted slot (round-2 fix #3).
# Names not (yet) registered are skipped harmlessly.
_PRIORITY: tuple[str, ...] = (
    # --- Round-11 window: the LEDGER-ZEROING round (VERDICT r10 #1),
    # installed verbatim from `tools/plan_next_window.py`, which now
    # computes ALL debt classes from the tools/window_history/
    # snapshots: (a) 9 first driver rows (the round-10/11 additions:
    # unigram train/encode/coverage, semdedup_trained_cells, plus this
    # round's text_unigram_encode_arrow and
    # text_unigram_oov_admission), (b) 11 changed-oracle debt entries
    # (the 7-entry WS_RE remainder + stats_mad_per_segment +
    # mm_binary_file_ingest + the two BPE encoders whose enc separator
    # changed this round), (c) the 15 impl-changed sort-sweep entries
    # — now COMPUTED from per-entry function-source hashes (VERDICT
    # r10 #2), no longer a prose list — and (d) 8 stale-rotation
    # fills (oldest last-in-window snapshot first). Backlog after
    # this window: never-checked 0, changed-oracle 0, impl-changed 0.
    "flagship_revenue_by_nation",
    "s1_scan_count_orders",
    "q4_topk_other_share",
    "dedup_minhash_lsh",
    "ann_cosine_topk_ivf",
    "text_token_stats",
    "events_sessionization",
    # --- rotation (first-time, changed-oracle, impl-changed, stale) ---
    "text_unigram_encode",
    "semdedup_trained_cells",
    "text_unigram_encode_arrow",
    "text_unigram_oov_admission",
    "semdedup_drift_work_audit",
    "text_tokenizer_bakeoff",
    "mm_zip_member_extract",
    "text_unigram_train",
    "text_unigram_vocab_coverage",
    "mm_binary_file_ingest",
    "stats_mad_per_segment",
    "text_bpe_tokenize_apply",
    "text_bpe_train_encode",
    "text_repetition_ratio",
    "text_unigram_logprob",
    "text_vocab_growth_curve",
    "text_winnow_fingerprint",
    "text_word_entropy",
    "text_word_trigrams_top",
    "train_order_global_shuffle",
    "dedup_embedding_cosine_pairs",
    "dedup_exact_keep_first",
    "dedup_exact_substring_removal",
    "dedup_near_dup_components",
    "events_asof_last_click_before_purchase",
    "events_user_gap_median_pandas",
    "graph_semantic_clusters",
    "knn_graph_within_cell",
    "mm_frame_hashes",
    "range_join_clicks_before_purchase",
    "semdedup_cell_prune",
    "text_html_extract",
    "text_pii_scrub",
    "text_quality_score",
    "tfidf_top_terms",
    "ann_cosine_topk_bruteforce",
    "ann_cosine_topk_ivf_trained",
    "ann_cosine_topk_multiprobe",
    "ann_hard_negative_mining",
    "ann_ivf_nprobe_curve",
    "ann_lsh_hyperplane_topk",
    "ann_matryoshka_recall",
    "ann_recall_ivf_vs_exact",
)


def _ordered() -> dict[str, Query]:
    """Registry with _PRIORITY names first, then registration order."""
    _load()
    out: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            out[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in out:
            out[name] = q
    return out


# Session confs every query depends on for oracle parity, applied
# defensively at call time: the driver passes its OWN SparkSession,
# which need not have been built by our session factory. All three are
# runtime-settable SQL confs (verified on a vanilla session).
_REQUIRED_CONFS = {
    # Some driver rounds generate events.parquet with TIMESTAMP(NANOS),
    # which the vectorized reader rejects; this reads those as epoch-nanos
    # longs (common.events converts via ts DIV 1000). No-op for the
    # TIMESTAMP(MICROS) layout other rounds generate.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB timestamps are UTC-naive; date_format must agree.
    "spark.sql.session.timeZone": "UTC",
    # Arrow batch transfer for the Pandas-UDF escape hatches.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


# Sessions already checked by _ensure_confs: each conf.get/set is a
# py4j round-trip paid on EVERY query build otherwise (3 gets x every
# builder call adds up across a 50-entry driver pass and a min-of-5
# bench). A session whose confs were ensured once stays ensured — these
# keys are only ever set, never unset, by this module (a caller who
# mutates them afterwards is outside the driver contract).
_CONFS_ENSURED: "WeakSet[SparkSession]" = None  # initialized below


def _ensure_confs(spark: SparkSession) -> None:
    global _CONFS_ENSURED
    if _CONFS_ENSURED is None:
        from weakref import WeakSet

        _CONFS_ENSURED = WeakSet()
    if spark in _CONFS_ENSURED:
        return
    for k, v in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on some future version: query may still work
    _CONFS_ENSURED.add(spark)


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name, fn=wrapped, oracle=oracle,
            doc=doc or (fn.__doc__ or ""), tags=tags, src=fn,
        )
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_queries() -> dict[str, Query]:
    return _ordered()


def get(name: str) -> Query:
    _load()
    return _REGISTRY[name]


def queries() -> dict[str, QueryFn]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (omitted for rows-only ops)."""
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
