"""Sweep every registered oracle with the driver-faithful compare.

Runs each Spark query and its DuckDB oracle at sf0.01 (the driver's
correctness scale) through tests.parity.compare and prints one line per
failure. Exit 0 iff all green.

Usage: python tools/sweep_oracles.py [name_substring ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coviddatapipeline_spark.queries import catalog
from coviddatapipeline_spark.session import get_spark
from tests.parity import compare

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    filters = sys.argv[1:]
    sf = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="oracle-sweep", shuffle_partitions=8)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf}/{name}.parquet')"
        )
    all_q = catalog.all_queries()
    names = [n for n, q in all_q.items() if q.oracle is not None]
    if filters:
        names = [n for n in names if any(f in n for f in filters)]
    failures = []
    for i, name in enumerate(names):
        q = all_q[name]
        t0 = time.time()
        try:
            ok, msg = compare(q.fn(spark, sf), con, q.oracle)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "ok" if ok else "FAIL"
        print(f"[{i+1}/{len(names)}] {status:4s} {dt:6.2f}s {name}" + ("" if ok else f" :: {msg[:300]}"), flush=True)
        if not ok:
            failures.append((name, msg))
    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    for name, msg in failures:
        print(f"FAIL {name}: {msg[:400]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
