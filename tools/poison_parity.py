#!/usr/bin/env python3
"""Poison-PARITY inventory: beyond execution (tools/poison_probe.py),
measure which entries' cross-engine hash agreement survives the poison
corpus — i.e. whose Spark/DuckDB contract is TOTAL vs defined only on
well-formed data.

Four observed outcome classes (round-5 inventory, recorded in
SCALE.md §14):
  AGREE       — hash-identical even with degenerate rows present
  ORACLE-ERR  — the DuckDB oracle itself crashes on poison input
                (list_inner_product dim mismatch, NaN casts, malformed
                JSON...). The Spark side executes: the engine is
                strictly more robust than its verification artifact,
                which is the intended asymmetry — oracles verify
                clean-data semantics, they are not the product.
  DIVERGE/dtype — compare-harness artifact only: a NULL in an integer
                column makes pandas deliver the DuckDB side as float64
                ('1970.0' vs 1970), and a genuine NaN in a float64
                column is indistinguishable from NULL after a pandas
                fetch. Neither is a semantic difference. Since round 6
                both are stripped at the source: the inventory compares
                with ``int_floats=True`` AND ``duck_fetch="native"``
                (fetchall preserves NaN-vs-NULL and int-vs-float as
                DuckDB computed them) — leniencies the driver-faithful
                default deliberately does NOT have (see tests/parity.py
                canon_cell / fetch_duck_native docstrings).
  DIVERGE/semantic — defined-but-different degenerate conventions:
                Spark propagates NaN through sums/avgs where DuckDB
                yields NULL; NULL-group rows placed differently;
                input-sensitive statistics (percentile cutoffs, PCA)
                legitimately shift with the poison rows.

The driver's correctness gate runs on clean synthetic data, where all
255 entries hash-match; this tool documents how far past that contract
each entry's agreement extends.

Usage: python tools/poison_parity.py [name_substring ...]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import duckdb  # noqa: E402

from coviddatapipeline_spark.queries import catalog  # noqa: E402
from coviddatapipeline_spark.session import get_spark  # noqa: E402
from tools.poison_probe import build_poison_dir  # noqa: E402


def main() -> int:
    from parity import compare  # tests/parity.py — the driver-faithful compare

    filters = sys.argv[1:]
    spark = get_spark(app_name="poison-parity", shuffle_partitions=8)
    fx = build_poison_dir(spark)
    print(f"poison fixture: {fx}")
    con = duckdb.connect()
    for t_ in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = f"{fx}/{t_}.parquet"
        # spiked tables are Spark-written DIRECTORIES; symlinked ones are files
        pat = p + "/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t_} AS SELECT * FROM read_parquet('{pat}')")

    qs = catalog.all_queries()
    names = [
        n
        for n, q in sorted(qs.items())
        if q.oracle is not None and (not filters or any(f in n for f in filters))
    ]
    agree, diverge, errs = 0, [], []
    for name in names:
        q = qs[name]
        try:
            ok, msg = compare(
                q.fn(spark, fx), con, q.oracle, int_floats=True,
                duck_fetch="native",
            )
        except Exception as e:  # noqa: BLE001 — classifying, not handling
            errs.append((name, str(e).split("\n")[0][:160]))
            continue
        if ok:
            agree += 1
        else:
            diverge.append((name, msg[:160]))

    print(
        f"\nPOISON PARITY: {agree}/{len(names)} agree; "
        f"{len(diverge)} diverge; {len(errs)} oracle/compare errors"
    )
    for n, m in diverge:
        print("DIVERGE", n, "|", m)
    for n, m in errs:
        print("ORACLE-ERR", n, "|", m)
    shutil.rmtree(fx, ignore_errors=True)
    return 0  # an inventory, not a gate — poison parity is not promised


if __name__ == "__main__":
    sys.exit(main())
