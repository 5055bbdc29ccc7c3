#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed once as a full action (collect for small
results, count for wide ones) after a warm-up of the session; wall
time includes planning + execution, which is what the driver's
baseline measures.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from coviddatapipeline_spark.queries import catalog
from coviddatapipeline_spark.session import get_spark

# Headline set: one per workload family — join-agg, wide agg, window,
# top-k+other, outer join, incremental scan, plus the LLM-pipeline
# extensions (LSH dedup, exact-GEMM cosine dedup, IVF ANN, text stats).
HEADLINE = [
    "flagship_revenue_by_nation",
    "pricing_summary",
    "q4_topk_other_share",
    "window_topk_orders_per_segment",
    "join_left_outer_order_counts",
    "s6_p2_watermark_increment",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine_pairs",
    "ann_cosine_topk_ivf",
    "text_token_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark(app_name="bench")

    # Warm up the JVM so the first measured query doesn't pay one-time
    # session costs (whole-stage-codegen JIT, parquet reader class load,
    # broadcast machinery). Run the headline shapes once against the tiny
    # sf0.001 tables: same plans, negligible data — ~3s of warmup that
    # makes every measured number steady-state.
    qs = catalog.queries()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            if name in qs:
                try:
                    qs[name](spark, warm_dir).collect()
                except Exception:
                    pass
    else:
        spark.range(1).count()
    # Warm the OS page cache + parquet footers for the measured SF's
    # tables so run-to-run variance reflects query execution, not disk
    # state (standard steady-state methodology; the tables are a few MB).
    import glob

    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(p).count()
        except Exception:
            pass
    names = [n for n in HEADLINE if n in qs]
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        # Full execution: pull results (headline outputs are small aggregates).
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
