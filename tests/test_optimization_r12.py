"""Round-12 optimization internals (OPTIMIZATION_r12.md §A1/A2/A4).

The table-resolution memo and the stat-based fanout guard changed
``operators/common.py`` internals without changing any entry's results
(that part is proven by the sweeps); these tests pin the NEW contracts:

- ``t`` memoizes the lazy plan per (session, path, content signature)
  and invalidates when the underlying dataset is rewritten;
- ``t_fanout`` still fans small tables out to ``defaultParallelism``
  and still leaves an (estimated-)large table untouched — now decided
  from on-disk bytes vs ``spark.sql.files.maxPartitionBytes`` instead
  of a per-build ``df.rdd`` physical-plan probe;
- ``_conf_bytes`` parses every Spark size-conf spelling we rely on.
"""

from __future__ import annotations

import os
import time

import pytest

from coviddatapipeline_spark.operators import common
from coviddatapipeline_spark.operators.common import (
    _conf_bytes,
    _dataset_bytes,
    t,
    t_fanout,
)

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def sf_dir(sf: str) -> str:
    return os.path.join(TESTDATA_ROOT, f"sf{sf}")


def test_t_memoizes_same_object_per_session(spark):
    d = sf_dir("0.001")
    a = t(spark, d, "orders")
    b = t(spark, d, "orders")
    assert a is b, "same session + unchanged file must reuse the resolved plan"
    # different table or sf -> different entry
    assert t(spark, d, "nation") is not a
    assert t(spark, sf_dir("0.01"), "orders") is not a


def test_t_memo_is_plan_only_and_recomputes_from_disk(spark, tmp_path):
    """The memo must cache the LAZY plan, never results: rewriting the
    dataset (new signature) yields a fresh resolution that sees the new
    bytes."""
    path = os.path.join(str(tmp_path), "tbl.parquet")
    spark.range(5).write.mode("overwrite").parquet(path)
    df1 = t(spark, str(tmp_path), "tbl")
    assert df1.count() == 5
    # rewrite with different contents; ensure mtime ticks even on
    # coarse filesystem clocks
    time.sleep(0.05)
    spark.range(9).write.mode("overwrite").parquet(path)
    df2 = t(spark, str(tmp_path), "tbl")
    assert df2.count() == 9, "rewritten dataset must invalidate the memo"
    assert df2 is not df1


def test_t_fanout_small_table_fans_out(spark):
    d = sf_dir("0.001")
    df = t_fanout(spark, d, "documents")
    assert (
        df.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    ), "a one-split local table must be repartitioned before per-row compute"


def test_t_fanout_large_estimate_left_untouched(spark):
    """With maxPartitionBytes shrunk below the file size the split
    estimate reaches defaultParallelism and the table must come back
    without a repartition node (the 100 TB behavior)."""
    d = sf_dir("0.001")
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
        base = t(spark, d, "documents")
        df = t_fanout(spark, d, "documents")
        assert df is base, "estimated-large tables must not be repartitioned"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_dataset_bytes_file_and_dir(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"a" * 100)
    assert _dataset_bytes(str(f)) == 100
    d = tmp_path / "ds"
    d.mkdir()
    (d / "p1").write_bytes(b"a" * 10)
    (d / "p2").write_bytes(b"b" * 30)
    assert _dataset_bytes(str(d)) == 40


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("128m", 128 * 1024**2),
        ("128M", 128 * 1024**2),
        ("1g", 1024**3),
        ("1gb", 1024**3),
        ("4194304", 4194304),
        ("512k", 512 * 1024),
    ],
)
def test_conf_bytes_parsing(raw, expected):
    class FakeConf:
        def get(self, key, default=None):
            return raw

    class FakeSpark:
        conf = FakeConf()

    assert _conf_bytes(FakeSpark(), "any.key", "128m") == expected


def test_path_signature_changes_on_dir_content_change(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    (d / "p1").write_bytes(b"a" * 10)
    s1 = common._path_signature(str(d))
    time.sleep(0.05)
    (d / "p2").write_bytes(b"b" * 10)
    assert common._path_signature(str(d)) != s1


def test_q4_single_pass_no_duplicate_agg_subtree(spark, parity_sf_dir):
    """OPTIMIZATION_r12 §A3: the grand total comes from the same
    WindowExec as the rank — the plan must contain exactly ONE
    aggregate over the orders join tree (one partial+final HashAggregate
    pair => the scan subtree is planned once) and no
    BroadcastNestedLoopJoin."""
    from coviddatapipeline_spark.queries import catalog

    df = catalog.get("q4_topk_other_share").fn(spark, parity_sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    assert "BroadcastNestedLoopJoin" not in plan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 3, (
        "orders/customer/nation must each be scanned exactly once; "
        f"got {len(scans)} scans:\n{plan}"
    )
