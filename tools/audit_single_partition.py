"""Catalog-wide single-partition audit: find UNBOUNDED global funnels.

Compiles every registered entry at sf0.001 and inspects each
``Exchange SinglePartition`` in the physical plan. Exempt (bounded by
construction): keyless partial/merge aggregates (one row per input
partition), and subtrees containing a row-limiting construct (a
``<= k`` rank filter, ``Limit``, ``TakeOrdered``). Everything else is
either in the DOMAIN_BOUNDED allowlist below — a global window over a
table already reduced to a domain-bounded cardinality (nations, days,
months, columns, sources), where a single partition is the CORRECT
plan because the input cannot scale with data — or it is flagged and
the exit code is nonzero.

This is the catalog-wide generalization of
``plans.assert_single_partition_windows_bounded`` (which the RRF plan
test applies precisely); run it after adding operators with global
windows. Round-4 baseline: 0 flagged.

Usage: python tools/audit_single_partition.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coviddatapipeline_spark.plans import executed_plan
from coviddatapipeline_spark.queries import catalog
from coviddatapipeline_spark.session import get_spark

# entry -> why a single-partition stage is legitimately bounded there.
DOMAIN_BOUNDED = {
    "q4_topk_other_share": "window over per-nation aggregate (25 rows)",
    "window_moving_avg_7day_revenue": "window over the daily series (calendar-bounded)",
    "events_level_shift_detector": "window over the daily series (calendar-bounded)",
    "orders_yoy_growth": "window over per-month aggregate (calendar-bounded)",
    "profile_orders_columns": "stack over the 6-column profile table",
    "dq_constraint_audit": "constraint summary table (fixed constraint count)",
    "mix_budget_waterfill": "water-fill over per-source aggregate (sources are a domain)",
    "text_vocab_growth_curve": "growth curve per source (sources are a domain)",
    "text_ks_length_drift": "KS walk over distinct doc lengths (bounded by max doc length)",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="sp-audit", shuffle_partitions=8)
    qs = catalog.all_queries()

    def indent(line: str) -> int:
        m = re.search(r"[A-Za-z*(]", line)
        return m.start() if m else len(line)

    flagged: dict[str, str] = {}
    for name, q in qs.items():
        try:
            plan = executed_plan(q.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            flagged[name] = f"ERR {type(e).__name__}: {e}"
            continue
        lines = plan.splitlines()
        bad = 0
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            d = indent(line)
            sub = []
            for below in lines[i + 1 :]:
                if below.strip() and indent(below) <= d:
                    break
                sub.append(below)
            first = next((s for s in sub if s.strip()), "")
            if re.search(r"Aggregate\(keys?=\[\], functions=\[(partial_|merge_)", first):
                continue
            if any(
                re.search(r"#\d+L? <= \d+\b", s) or "Limit" in s or "TakeOrdered" in s
                for s in sub
            ):
                continue
            bad += 1
        if bad and name not in DOMAIN_BOUNDED:
            flagged[name] = f"{bad} unbounded SinglePartition"
    for n, m in sorted(flagged.items()):
        print(f"FLAG {n} :: {m}")
    print(f"{len(flagged)} flagged of {len(qs)} ({len(DOMAIN_BOUNDED)} allowlisted)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
