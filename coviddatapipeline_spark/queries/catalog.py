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
# Round-3 window:
#   - sentinels: 9 previously-green rows spanning covid/dedup/ann/text/
#     events (regression canaries for the families rotated out);
#   - round-3 fixes: the 9 HUGEINT-cast oracles (round-2's red class),
#     the null-free window_lag + string-decimal rewrites, the star-CC
#     swap, the estimator-audit LEFT JOIN, the integer-exact degree
#     histogram;
#   - rotation: first driver coverage for datapipe, warehouse,
#     retrieval, graph, timeseries, linalg, reshape, tpch_more/rest and
#     the remaining relational/advanced entries.
_PRIORITY: tuple[str, ...] = (
    # --- sentinels (green in CORRECTNESS_r02) ---
    "flagship_revenue_by_nation",
    "s1_scan_count_orders",
    "s6_p2_watermark_increment",
    "q2_a2_latest_date",
    "q4_topk_other_share",
    "dedup_minhash_lsh",
    "ann_cosine_topk_ivf",
    "text_token_stats",
    "events_sessionization",
    # --- round-3 fixed oracles: HUGEINT casts (VERDICT r02 fix #1) ---
    "f3_f4_cast_with_default",
    "docpipe_clean_corpus_stats",
    "text_repetition_ratio",
    "text_gopher_rules",
    "text_word_entropy",
    "text_unigram_logprob",
    "tpch_q11_important_stock",
    "contamination_ngram_overlap",
    "pack_sequences_greedy",
    "events_hourly_profile",
    # --- round-3 fixed oracles: null-free / string-decimal rewrites ---
    "window_lag_order_gap_days",
    "decimal_money_totals",
    # --- round-3 changed implementations ---
    "dedup_near_dup_components",  # now the alternating-star core
    "dedup_minhash_estimator_audit",  # oracle LEFT JOIN (ADVICE)
    "graph_degree_histogram",  # integer-exact bucketing (ADVICE)
    # --- promoted oracle-backed multimodal entry (r02 fix #3) ---
    "mm_av_header_probe",
    # --- rotation: families never covered by a CORRECTNESS file ---
    "pricing_summary",
    "window_topk_orders_per_segment",
    "join_left_outer_order_counts",
    "scalar_subquery_above_avg",
    "median_price_per_segment",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_revenue_by_customer",
    "tpch_q18_large_volume_customers",
    "tpch_q9_product_profit",
    "tpch_q2_min_cost_supplier",
    "pivot_priority_by_status",
    "unpivot_order_metrics",
    "rfm_customer_segments",
    "split_train_val_test",
    "sample_token_budget_per_lang",
    "emb_int8_quant_stats",
    "scd2_customer_merge",
    "dq_constraint_audit",
    "tfidf_top_terms",
    "bm25_fixed_query",
    "pagerank_customer_supplier",
    "events_ewma_daily_revenue",
    "daily_revenue_anomalies",
    "emb_pca_power_iteration",
    "events_funnel_conversion",
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
        _REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
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
