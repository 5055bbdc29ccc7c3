"""Propose the next driver-window rotation from the CORRECTNESS history.

Reads every CORRECTNESS_r*.json in the repo root, diffs the union of
driver-checked names against the oracle-backed registry, and prints:

  - coverage accounting (checked / never-checked, per module),
  - a proposed next `_PRIORITY` fill: the pinned sentinels followed by
    never-checked entries breadth-first by module (round-robin, so
    every module gets driver rows as early as possible),

ready to paste into `coviddatapipeline_spark/queries/catalog.py`. The
sentinel list mirrors the one pinned there; edit SENTINELS when the
canary set changes. Entries whose oracle or implementation changed in
the current round must be ADDED to the window by hand — this tool only
plans first-time coverage.

Usage: python tools/plan_next_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coviddatapipeline_spark.queries import catalog

SENTINELS = (
    "flagship_revenue_by_nation",
    "s1_scan_count_orders",
    "q4_topk_other_share",
    "dedup_minhash_lsh",
    "ann_cosine_topk_ivf",
    "text_token_stats",
    "events_sessionization",
)


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                # Only a HASH-verified row counts as coverage: an entry
                # that historically ran as rows-only (err: no_oracle)
                # and has since gained an oracle still needs its first
                # hash-checked driver row.
                if row.get("hash_match"):
                    checked.add(name)
    qs = catalog.all_queries()
    oracle_backed = [n for n, q in qs.items() if q.oracle is not None]
    # The CURRENT window is about to be (or was just) driver-checked;
    # treat it as covered even if this round's CORRECTNESS file hasn't
    # been written yet, so planning before the driver runs is safe.
    current_window = set(list(qs)[:window])
    never = [
        n for n in oracle_backed if n not in checked and n not in current_window
    ]
    by_mod: dict[str, list[str]] = defaultdict(list)
    for n in never:
        q = qs[n]
        by_mod[(q.src or q.fn).__module__.rsplit(".", 1)[-1]].append(n)

    print(f"registry: {len(qs)} ({len(oracle_backed)} oracle-backed)")
    print(f"driver-checked (all rounds): {len(checked & set(qs))}")
    print(f"never-checked backlog: {len(never)}")
    for m in sorted(by_mod):
        print(f"  {m} ({len(by_mod[m])}): {', '.join(sorted(by_mod[m]))}")

    slots = window - len(SENTINELS)
    # round-robin across modules, largest-backlog modules first, so
    # breadth comes before depth
    order = sorted(by_mod, key=lambda m: -len(by_mod[m]))
    queues = {m: sorted(by_mod[m]) for m in order}
    fill: list[str] = []
    while len(fill) < slots and any(queues.values()):
        for m in order:
            if queues[m] and len(fill) < slots:
                fill.append(queues[m].pop(0))
    print(f"\nproposed _PRIORITY ({len(SENTINELS)} sentinels + {len(fill)} first-time):")
    print("_PRIORITY: tuple[str, ...] = (")
    for n in SENTINELS:
        print(f'    "{n}",')
    print("    # --- rotation (breadth-first by module) ---")
    for n in fill:
        print(f'    "{n}",')
    print(")")
    remaining = len(never) - len(fill)
    print(f"\nbacklog after this window: {remaining}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
