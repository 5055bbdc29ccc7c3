#!/usr/bin/env python3
"""Poison-corpus robustness probe: run EVERY registered entry against a
testdata clone whose tables are spiked with the edge rows a 100 TB
corpus certainly contains but the synthetic testdata does not —
empty / whitespace-only / single-token / NULL text, zero / empty /
NULL / short embedding vectors, NULL timestamps/keys/labels, NaN/Inf
measures, malformed JSON, out-of-scheme enum labels.

This generalizes the round-5 finding: dedup_exact_substring_runs
crashed the whole job on any sub-8-token document (Spark's
``sequence(1, 0)`` is descending, ``slice(tk, 0, k)`` aborts) — a class
invisible to oracle sweeps because the synthetic corpus has no short
docs. The probe asserts EXECUTION (every entry completes a collect()),
not value parity: a NaN or empty result on poison rows is acceptable
behavior, a task abort is not.

Usage: python tools/poison_probe.py [name_substring ...]
Exit 0 iff every entry executes.
"""

from __future__ import annotations

import datetime as _dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coviddatapipeline_spark.queries import catalog  # noqa: E402
from coviddatapipeline_spark.session import get_spark  # noqa: E402

BASE_SF = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)

NAN = float("nan")
INF = float("inf")

# ids far above every synthetic range so poison rows are identifiable
# (and excludable) in any output
POISON_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (990_000_001, "", "en", "web", 0),
    (990_000_002, "x", "en", "web", 1),
    (990_000_003, "   ", "en", "web", 3),
    (990_000_004, "two tokens", "en", "books", 10),
    (990_000_005, None, "en", "web", 0),
    (990_000_006, "a" * 5000, "en", "web", 5000),  # one huge token
    (990_000_007, "unicode éü中文 mixed tokens here", "zz", "web", 30),
    (990_000_008, "seven little tokens precisely in this row", None, "web", 41),
    # Unicode hazard classes (round 7): the string-semantics seams where
    # JVM UTF-16 (Spark) and UTF-8 (DuckDB) engines can disagree on
    # length/substr/regex — all present in any 100 TB web crawl.
    # astral-plane chars (UTF-16 surrogate pairs on the JVM)
    (990_000_009, "emoji \U0001F389\U0001F680 astral \U0001F600 plane",
     "en", "web", 28),
    # zero-width space / joiner INSIDE tokens (invisible, never split
    # by the \\s+ tokenizer on either engine)
    (990_000_010, "zero\u200bwidth joined\u200dtokens here", "en", "web", 30),
    # combining marks: decomposed e+\u0301 vs precomposed \u00e9 are
    # DIFFERENT code-point sequences (no engine normalizes)
    (990_000_011, "combining e\u0301 marks and a\u030a ring vs \u00e9 \u00e5",
     "en", "web", 40),
    # non-breaking / thin spaces: NOT \\s in Java or RE2, so they glue
    # tokens on both engines rather than splitting them
    (990_000_012, "nbsp\u00a0inside and\u2009thin space", "en", "web", 27),
    # LEADING multi-byte characters (ADVICE r07): text whose FIRST char
    # is 2-byte (\u00e9 => first byte 0xC3=195, code point 233) and 4-byte
    # astral (\ud83d\ude80 => first byte 0xF0=240, code point 128640) \u2014 the seam
    # where first-byte kernels (b[0]) and ascii()/code-point oracles
    # silently diverge; every round-7 Unicode row started with ASCII.
    (990_000_013, "\u00e9clair leads with a two-byte char", "en", "web", 35),
    (990_000_014, "\U0001F680 astral liftoff leads here", "en", "web", 30),
]


def poison_embeddings(dim: int):
    """(vec_id, embedding, label) edge rows for a dim-d corpus."""
    return [
        (990_000_001, [0.0] * dim, 0),  # zero vector: norm 0, cosine 0/0
        (990_000_002, [], 1),  # empty vector
        (990_000_003, None, 2),  # NULL vector
        (990_000_004, [1.0, -1.0], 3),  # wrong (short) dimensionality
    ]


_TS = _dt.datetime(2024, 1, 2, 12, 0, 0)

# (event_id, ts, user_id, event_type, value, props)
POISON_EVENTS = [
    (990_000_001, None, 77_001, "click", 1.0, '{"k": 1}'),  # NULL ts
    (990_000_002, _dt.datetime(2031, 1, 1), 77_001, "click", 1.0, '{"k": 1}'),
    (990_000_003, _TS, None, "click", 1.0, '{"k": 2}'),  # NULL user
    (990_000_004, _TS, 77_002, None, 1.0, '{"k": 3}'),  # NULL type
    (990_000_005, _TS, 77_002, "weird_type", NAN, '{"k": 4}'),
    (990_000_006, _TS, 77_003, "purchase", INF, "not json"),
    (990_000_007, _TS, 77_003, "click", -5.0, None),  # NULL props
    (990_000_008, _TS, 77_003, "click", 1e308, "{}"),  # huge measure
]

# (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
#  o_orderpriority)
POISON_ORDERS = [
    (990_000_001, None, "X", 0.0, None, "9-WEIRD"),
    (990_000_002, 1, "O", -10.5, _dt.datetime(2024, 1, 2), None),
    (990_000_003, 1, None, NAN, _dt.datetime(1970, 1, 1), "1-URGENT"),
    (None, 1, "O", 5.0, _dt.datetime(2024, 1, 2), "1-URGENT"),  # NULL PK
]

# (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
#  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
#  l_shipdate)
POISON_LINEITEM = [
    (990_000_001, 1, 1, 1, 0.0, 0.0, 0.0, 0.0, None, None, None),
    (990_000_002, None, 1, 2, NAN, -1.0, 1.5, 0.0, "Z", "?",
     _dt.datetime(2024, 1, 3)),
    (None, 1, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O",
     _dt.datetime(2024, 1, 4)),  # NULL FK
]

# (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
POISON_CUSTOMER = [
    (990_000_001, None, None, NAN, None),  # all-degenerate dim row
    (990_000_002, "", 0, -INF, "weird segment"),
    (990_000_003, "Customer#bad-suffix", 9999, 0.0, "FURNITURE"),  # dangling FK
]

# (s_suppkey, s_name, s_nationkey, s_acctbal)
POISON_SUPPLIER = [
    (990_000_001, None, None, NAN),
    (990_000_002, "", 9999, INF),  # dangling FK, infinite balance
]

# (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
POISON_PART = [
    (990_000_001, None, None, None, None, NAN),
    (990_000_002, "", "NotBrand", "weird type", -1, 0.0),  # out-of-scheme brand
]


def _spike(spark, base_sf: str, out: str, table: str, rows) -> None:
    """Union poison rows (created with the BASE table's exact schema, so
    timestamp/physical-type drift across driver generations can't skew
    the fixture) into ``out``'s copy of ``table``."""
    from pyspark.sql.types import LongType

    base = spark.read.parquet(os.path.join(base_sf, f"{table}.parquet"))
    # TIMESTAMP(NANOS) driver generations arrive as epoch-nanos longs
    # (see common.events): adapt datetime literals to the physical type.
    long_fields = {
        i for i, f in enumerate(base.schema.fields)
        if isinstance(f.dataType, LongType)
    }
    # Naive datetimes are interpreted as UTC (ADVICE r05): a bare
    # .timestamp() would read them in the HOST's local timezone and
    # shift the fixture's long ts values by the UTC offset across
    # machines — boundary-sensitive assertions must see identical
    # fixtures everywhere.
    rows = [
        tuple(
            int(v.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000) * 1000
            if i in long_fields and isinstance(v, _dt.datetime)
            else v
            for i, v in enumerate(r)
        )
        for r in rows
    ]
    extra = spark.createDataFrame(rows, base.schema)
    base.unionByName(extra).coalesce(2).write.mode("overwrite").parquet(
        os.path.join(out, f"{table}.parquet")
    )


def build_poison_dir(spark, base_sf: str = BASE_SF, out: str | None = None) -> str:
    """Clone ``base_sf`` with spiked documents/embeddings/events/orders/
    lineitem; other tables are symlinked. Returns the fixture dir."""
    out = out or tempfile.mkdtemp(prefix="cdp_poison_")
    os.makedirs(out, exist_ok=True)

    spiked = {
        "documents.parquet",
        "embeddings.parquet",
        "events.parquet",
        "orders.parquet",
        "lineitem.parquet",
        "customer.parquet",
        "supplier.parquet",
        "part.parquet",
    }
    for name in os.listdir(base_sf):
        src = os.path.join(base_sf, name)
        dst = os.path.join(out, name)
        if name not in spiked and not os.path.exists(dst):
            os.symlink(src, dst)

    _spike(spark, base_sf, out, "documents", POISON_DOCS)
    emb = spark.read.parquet(os.path.join(base_sf, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    _spike(spark, base_sf, out, "embeddings", poison_embeddings(dim))
    _spike(spark, base_sf, out, "events", POISON_EVENTS)
    _spike(spark, base_sf, out, "orders", POISON_ORDERS)
    _spike(spark, base_sf, out, "lineitem", POISON_LINEITEM)
    _spike(spark, base_sf, out, "customer", POISON_CUSTOMER)
    _spike(spark, base_sf, out, "supplier", POISON_SUPPLIER)
    _spike(spark, base_sf, out, "part", POISON_PART)
    return out


def main() -> int:
    import shutil
    import time

    filters = sys.argv[1:]
    spark = get_spark(app_name="poison-probe", shuffle_partitions=8)
    fx = build_poison_dir(spark)
    print(f"poison fixture: {fx}")
    all_q = catalog.all_queries()
    names = [n for n in all_q if not filters or any(f in n for f in filters)]
    failures = []

    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            all_q[name].fn(spark, fx).collect()
            status = "ok"
        except Exception as e:  # noqa: BLE001 — reporting, not handling
            status = "CRASH"
            failures.append((name, str(e).split("\n")[0][:300]))
        print(
            f"[{i + 1}/{len(names)}] {status:5s} "
            f"{time.perf_counter() - t0:6.2f}s {name}",
            flush=True,
        )
    print()
    for name, err in failures:
        print(f"CRASH {name}: {err}")
    print(f"\n{len(names) - len(failures)}/{len(names)} executed")
    shutil.rmtree(fx, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
