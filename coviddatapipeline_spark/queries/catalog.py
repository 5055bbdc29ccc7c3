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
#
# Round-6 window (VERDICT r05 #1): install the published r06 rotation
# verbatim (NEXT.md "r06 window") — 2 sentinels plus the ENTIRE 48-entry
# never-driver-checked backlog. After this round every one of the 255
# registered entries has a green driver hash row (the round-2 goal);
# the registry already unfroze THIS round — the round-6 additions
# (LRS, time-travel read, substring removal, boilerplate maximal
# k-grams) sit BELOW the window carrying three-SF sweep stamps and
# take driver rows in round 7.
_PRIORITY: tuple[str, ...] = (
    # --- sentinels (green every round they have sat) ---
    "flagship_revenue_by_nation",
    "dedup_minhash_lsh",
    # --- rotation: the final 48 first-time entries, alphabetical; this
    # is the complete remaining backlog (events 9+, timeseries, text,
    # relational_ext, tpch_more/rest, graph, warehouse, datapipe tails).
    "ann_lsh_hyperplane_topk",
    "ann_recall_trained_vs_exact",
    "dedup_components_labelprop",
    "dedup_levenshtein_candidates",
    "dedup_source_mirror_detection",
    "events_funnel_time_bounded",
    "events_funnel_view_click_purchase",
    "events_hourly_gapfill_locf",
    "events_incident_interval_join",
    "events_lateness_watermark_profile",
    "events_rate_percentiles_exact",
    "events_seasonality_decomposition",
    "ivf_kmeans_one_step",
    "knn_graph_within_cell",
    "label_centroid_similarity",
    "layout_rle_run_profile",
    "mix_epoch_schedule",
    "mix_source_temperature_weights",
    "mm_frame_dup_crossdoc",
    "orders_market_basket_lift",
    "orders_open_backlog_sweepline",
    "orders_weekday_seasonality",
    "orders_yoy_growth",
    "pack_chunks_with_overlap",
    "pack_span_corruption_plan",
    "part_price_histogram",
    "pref_pairs_by_quality",
    "profile_orders_columns",
    "sample_balanced_per_lang",
    "sample_bottomk_per_source",
    "sample_weighted_bernoulli",
    "scd2_point_in_time",
    "setops_multiset_variants",
    "split_leakage_audit",
    "split_unigram_kl_audit",
    "sql_api_flagship_twin",
    "stats_mad_per_segment",
    "stats_regression_qty_price",
    "supplier_balance_winsorized",
    "supplier_balance_zscore",
    "text_zipf_fit",
    "text_zipf_rank_frequency",
    "tpch_q16_supplier_count_by_part",
    "tpch_q20_excess_stock_suppliers",
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "union_by_name_evolved_schemas",
    "window_percent_rank_cume",
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


def _ensure_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on some future version: query may still work


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
