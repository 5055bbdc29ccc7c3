"""Storage-layout scale features, asserted at the PHYSICAL PLAN level:
partitioned writes must prune, bucketed joins must not shuffle. These
are the layout decisions that matter at 100 TB — a correct answer with
the wrong plan fails here."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.common import t
from coviddatapipeline_spark.plans import assert_no_shuffle, audit, executed_plan
from coviddatapipeline_spark.sources import write_bucketed_table, write_parquet


def _plan(df) -> str:
    return executed_plan(df)


def test_partitioned_write_prunes_partitions(spark, tmp_path, parity_sf_dir):
    """Writing orders partitioned by year and filtering on year must
    show up as a PartitionFilter on the scan (directory pruning), not a
    data filter — i.e. non-matching years are never read."""
    out = os.path.join(str(tmp_path), "orders_by_year")
    orders = t(spark, parity_sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_parquet(orders, out, partition_by=("o_year",))

    scan = spark.read.parquet(out).filter(F.col("o_year") == 1996)
    plan = _plan(scan)
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:200], (
        plan[:2000]
    )
    # (inputFiles() lists pre-pruning candidates, so the plan's
    # PartitionFilters section above is the authoritative pruning proof)
    # the pruned result matches a plain filter on the original table
    assert scan.count() == orders.filter(F.col("o_year") == 1996).count()


def test_bucketed_join_skips_shuffle(spark, tmp_path, parity_sf_dir):
    """Orders and customer bucketed on the join key must sort-merge-join
    with NO Exchange in the plan: co-located buckets make the shuffle a
    write-time cost paid once, not a per-query cost."""
    orders = t(spark, parity_sf_dir, "orders")
    customer = t(spark, parity_sf_dir, "customer")
    write_bucketed_table(
        orders, "orders_b", os.path.join(str(tmp_path), "orders_b"),
        ("o_custkey",), num_buckets=8, sort_cols=("o_custkey",),
    )
    write_bucketed_table(
        customer, "customer_b", os.path.join(str(tmp_path), "customer_b"),
        ("c_custkey",), num_buckets=8, sort_cols=("c_custkey",),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert_no_shuffle(joined)
        # same rows as the unbucketed join
        expected = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_filter_and_projection_reach_parquet_scan(spark, parity_sf_dir):
    """Predicate pushdown + column pruning: the scan must carry
    PushedFilters for the predicate and read only the two referenced
    columns (ReadSchema), regardless of the table's width."""
    li = t(spark, parity_sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    a = audit(q)
    assert "l_quantity" in a["pushed_filters"], a["pushed_filters"]
    assert "l_orderkey" in a["read_schema"] and "l_extendedprice" not in a["read_schema"]
    # the section parser must NOT have swallowed the trailing sections —
    # that made this assertion vacuous (every scanned column always
    # appears in ReadSchema's struct<...> text)
    assert "ReadSchema" not in a["pushed_filters"]
    assert "struct<" not in a["pushed_filters"]


def test_plan_section_parser_stops_at_next_section():
    """_section on a realistic single-line FileScan: each payload ends
    at the next `, Section: ` boundary, commas inside filter payloads
    and `file:/` paths notwithstanding. An empty PushedFilters must
    come back EMPTY — not carrying ReadSchema text that would let a
    pushdown assertion pass with pushdown regressed to nothing."""
    from coviddatapipeline_spark.plans import _section

    line = (
        "FileScan parquet [l_orderkey#1L,l_quantity#2] Batched: true, "
        "DataFilters: [isnotnull(l_quantity#2), (l_quantity#2 > 45.0)], "
        "Format: Parquet, Location: InMemoryFileIndex(1 paths)"
        "[file:/root/testdata/sf0.01/lineitem.parquet], "
        "PartitionFilters: [], "
        "PushedFilters: [IsNotNull(l_quantity), "
        "GreaterThan(l_quantity,45.0)], "
        "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"
    )
    assert _section(line, "PushedFilters") == (
        "[IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"
    )
    assert _section(line, "PartitionFilters") == "[]"
    assert _section(line, "ReadSchema") == (
        "struct<l_orderkey:bigint,l_quantity:double>"
    )
    # regression shape: empty pushdown stays empty
    gone = line.replace(
        "[IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]", "[]"
    )
    assert "l_quantity" not in _section(gone, "PushedFilters")


def test_broadcast_join_in_flagship_plan(spark, parity_sf_dir):
    """The flagship join pyramid must broadcast its dimension tables —
    a shuffle join against `nation` (25 rows) would be plan malpractice."""
    from coviddatapipeline_spark.queries import catalog

    df = catalog.all_queries()["flagship_revenue_by_nation"].fn(spark, parity_sf_dir)
    assert audit(df)["broadcast_joins"] >= 1


def test_jsonl_roundtrip_explicit_schema(spark, tmp_path, parity_sf_dir):
    """NDJSON egress + re-ingest with an explicit schema (no inference
    scan) must be lossless for the typed columns."""
    from coviddatapipeline_spark.sources import read_jsonl, write_jsonl

    out = os.path.join(str(tmp_path), "orders_jsonl")
    orders = t(spark, parity_sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_jsonl(orders, out)
    back = read_jsonl(spark, out, schema=orders.schema)
    assert back.schema == orders.schema
    a = orders.agg(F.count("*"), F.sum("o_orderkey"), F.round(F.sum("o_totalprice"), 2)).collect()
    b = back.agg(F.count("*"), F.sum("o_orderkey"), F.round(F.sum("o_totalprice"), 2)).collect()
    assert a == b


def test_schema_evolution_merge_schema(spark, tmp_path, parity_sf_dir):
    """A table whose later partitions gained a column must read with
    mergeSchema: old rows surface NULL for the new column, new rows keep
    their values — the additive-evolution contract of a parquet lake."""
    out = os.path.join(str(tmp_path), "evolving")
    v1 = t(spark, parity_sf_dir, "orders").select("o_orderkey", "o_totalprice").limit(100)
    v1.write.parquet(os.path.join(out, "batch=1"))
    v2 = (
        t(spark, parity_sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("o_channel", F.lit("web"))
        .offset(100)
        .limit(50)
    )
    v2.write.parquet(os.path.join(out, "batch=2"))

    merged = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(out)
    assert "o_channel" in merged.columns
    counts = merged.groupBy(F.col("o_channel").isNull().alias("is_old")).count().collect()
    got = {r["is_old"]: r["count"] for r in counts}
    assert got == {True: 100, False: 50}


def test_csv_corrupt_record_quarantine(spark, tmp_path):
    """PERMISSIVE CSV scan with a corrupt-record column: good rows parse,
    bad rows are captured (not dropped, not fatal) — the quarantine-split
    pattern for dirty 100 TB ingest."""
    p = os.path.join(str(tmp_path), "dirty.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n2,y\nBADLY\"QUOTED,z,extra,cols\n3,z\n")
    from pyspark.sql import types as T

    from coviddatapipeline_spark.sources import read_csv_with_quarantine

    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    good, bad = read_csv_with_quarantine(spark, p, schema)
    assert good.count() == 3 and bad.count() == 1
    assert sorted(r["a"] for r in good.collect()) == [1, 2, 3]
    assert "BADLY" in bad.collect()[0]["_corrupt_record"]


def test_fanout_widens_narrow_scans_only(spark, parity_sf_dir):
    """t_fanout must lift a single-partition small-file scan to >= core
    count (so per-row compute parallelizes) and leave already-wide scans
    untouched (never adds a shuffle at scale)."""
    from coviddatapipeline_spark.operators.common import t_fanout

    cores = spark.sparkContext.defaultParallelism
    narrow = t(spark, parity_sf_dir, "documents")
    assert narrow.rdd.getNumPartitions() < cores  # precondition: small file
    widened = t_fanout(spark, parity_sf_dir, "documents")
    assert widened.rdd.getNumPartitions() >= cores


def test_orc_roundtrip_with_pushdown(spark, tmp_path, parity_sf_dir):
    """ORC source/sink: values survive the roundtrip and the vectorized
    ORC reader receives the filter pushdown + pruned read schema, same
    contract as the parquet scans."""
    from coviddatapipeline_spark.sources import read_orc, write_orc

    orders = spark.read.parquet(f"{parity_sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_orc(orders.select("o_orderkey", "o_custkey", "o_totalprice"), path)

    back = read_orc(spark, path)
    q = back.filter(F.col("o_totalprice") > 100000).select("o_orderkey")
    plan = executed_plan(q)
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]
    assert q.count() == orders.filter("o_totalprice > 100000").count()


def test_keyset_pagination_predicate_reaches_scan(spark, parity_sf_dir):
    """The keyset cursor must compile to a scan-level filter (that is
    the whole point vs OFFSET): the OR-expanded tuple comparison shows
    up in PushedFilters on o_orderdate, so parquet row-group stats can
    prune pages the cursor has already passed."""
    from coviddatapipeline_spark.operators.relational_ext import pagination_keyset
    from coviddatapipeline_spark.plans import audit

    a = audit(pagination_keyset(spark, parity_sf_dir))
    assert "o_orderdate" in a["pushed_filters"], a["pushed_filters"]


def test_zorder_beats_linear_on_point_skip(spark, parity_sf_dir):
    """The Z-order layout must strictly beat the time-linear layout on
    the cross-axis point probe (more files skipped) — the property that
    makes the re-clustering job worth running, asserted on real data.
    (Average bbox area is reported, not asserted: with few large files
    z-order trades one-axis tightness for both-axis boundedness, so the
    area comparison flips with file size while the skip win does not.)"""
    from coviddatapipeline_spark.queries.catalog import all_queries

    rows = {
        r["layout"]: r
        for r in all_queries()["zorder_layout_skipping_audit"]
        .fn(spark, parity_sf_dir)
        .collect()
    }
    z, lin = rows["zorder"], rows["linear"]
    assert z["n_files"] == lin["n_files"]
    assert z["x_skip_frac_e4"] > lin["x_skip_frac_e4"]
    assert z["max_bbox_area"] <= (1 << 4) * (1 << 4)


def test_linkage_blocking_is_equi_join(spark, parity_sf_dir):
    """The fuzzy-match candidate generation must be blocked equi-joins,
    never a cartesian compare of dirty x clean."""
    from coviddatapipeline_spark.plans import assert_no_cartesian
    from coviddatapipeline_spark.queries.catalog import all_queries

    df = all_queries()["linkage_blocked_fuzzy_match"].fn(spark, parity_sf_dir)
    assert_no_cartesian(df)
    rows = df.collect()
    # every resolved name with distance >= 0 is counted once; correct
    # resolutions only occur at distance >= 0
    for r in rows:
        assert r["n_correct"] <= r["n_names"]
        if r["edit_distance"] == -1:
            assert r["n_correct"] == 0


def test_merged_schema_read_surfaces_new_column(spark, tmp_path):
    """A batch written before a column existed must read back with the
    merged schema and NULLs for the missing column."""
    import os

    from coviddatapipeline_spark.sources import read_parquet_merged_schema

    p = os.path.join(str(tmp_path), "bronze")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        os.path.join(p, "b1")
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(os.path.join(p, "b2"))
    got = read_parquet_merged_schema(spark, p + "/*")
    assert set(got.columns) == {"id", "v", "score"}
    rows = {r["id"]: r["score"] for r in got.collect()}
    assert rows == {1: None, 2: 9.5}


def test_compact_small_files_preserves_data(spark, tmp_path):
    """Compaction must reduce file count to ceil(rows/target) without
    changing a single row, and the directory must stay readable."""
    import os

    from coviddatapipeline_spark.sources import compact_small_files

    p = os.path.join(str(tmp_path), "t")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    df.repartition(24).write.parquet(p)
    before_rows = sorted(r["id"] for r in spark.read.parquet(p).collect())
    fb, fa = compact_small_files(spark, p, target_rows_per_file=5_000)
    assert fb >= 20 and fa == 2
    after = spark.read.parquet(p)
    assert sorted(r["id"] for r in after.collect()) == before_rows
    assert after.groupBy("k").count().count() == 7


def test_compact_small_files_recovers_from_stale_dirs(spark, tmp_path):
    """Crash-recovery contract (ADVICE r03): leftover _compact_tmp /
    _compact_old from a prior failed run must not fail the next
    invocation, and a stranded _compact_old with nothing at the table
    path (crash between the two renames) must be restored."""
    import os
    import shutil

    from coviddatapipeline_spark.sources import compact_small_files

    p = os.path.join(str(tmp_path), "t")
    df = spark.range(1_000).select(F.col("id"))
    df.repartition(8).write.parquet(p)
    before_rows = sorted(r["id"] for r in spark.read.parquet(p).collect())

    # stale leftovers from a "prior failed run"
    os.makedirs(p + "._compact_tmp/junk")
    fb, fa = compact_small_files(spark, p, target_rows_per_file=1_000)
    assert fa == 1
    assert not os.path.exists(p + "._compact_tmp")
    assert not os.path.exists(p + "._compact_old")
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == before_rows

    # crash between the renames: table stranded at _compact_old
    shutil.move(p, p + "._compact_old")
    assert not os.path.exists(p)
    fb, fa = compact_small_files(spark, p, target_rows_per_file=1_000)
    assert fa == 1
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == before_rows


def test_versioned_table_atomic_commits_and_gc(spark, tmp_path):
    """The pointer-file commit protocol: every commit is a new immutable
    version; the pointer names exactly one live snapshot; a reader
    holding the PREVIOUS snapshot's path can still read it after one
    more commit (GC keeps N-1); orphan directories from crashed commits
    are collected on the next commit."""
    import json
    import os

    from coviddatapipeline_spark.sources import (
        read_versioned,
        versioned_table_path,
        write_versioned,
    )

    root = os.path.join(str(tmp_path), "vt")
    write_versioned(spark, spark.range(10), root)
    v0 = versioned_table_path(root)
    assert v0.endswith("v0") and read_versioned(spark, root).count() == 10

    # commit v1; a "reader" still holding v0 must keep working (GC lag)
    write_versioned(spark, spark.range(20), root)
    assert versioned_table_path(root).endswith("v1")
    assert read_versioned(spark, root).count() == 20
    assert spark.read.parquet(v0).count() == 10  # in-flight reader survives

    # simulate the REALISTIC crash shape: a commit that finished its data
    # write but died before the pointer flip leaves its orphan at exactly
    # v{pointer_version + 1} = v2 — the slot the NEXT commit computes, so
    # without pre-write GC the errorifexists write would fail forever and
    # the table would be permanently write-blocked (ADVICE r04). Also
    # strand a pointer temp file and a far-future orphan.
    os.makedirs(os.path.join(root, "v2"))
    with open(os.path.join(root, "v2", "part-junk.parquet"), "w") as f:
        f.write("junk")
    os.makedirs(os.path.join(root, "v99"))
    with open(os.path.join(root, "._ptr_crashed"), "w") as f:
        f.write("{}")
    assert versioned_table_path(root).endswith("v1")

    # next commit collects the colliding v2 orphan BEFORE choosing its
    # slot (so it succeeds and lands at v2), plus v99, the ptr temp, v0
    write_versioned(spark, spark.range(30), root)
    assert versioned_table_path(root).endswith("v2")
    dirs = {d for d in os.listdir(root) if d.startswith("v")}
    assert dirs == {"v1", "v2"}
    assert not [f for f in os.listdir(root) if f.startswith("._ptr_")]
    assert read_versioned(spark, root).count() == 30

    # the pointer itself is a complete manifest
    with open(os.path.join(root, "_CURRENT")) as f:
        ptr = json.load(f)
    assert ptr == {"version": 2, "version_dir": "v2"}


def test_compact_versioned_no_reader_window(spark, tmp_path):
    """OPTIMIZE via versioned commit: file count drops to
    ceil(rows/target), rows unchanged, and at EVERY moment the pointer
    resolves to a complete snapshot (no missing-directory window — the
    gap the two-rename compaction documents)."""
    import os

    from coviddatapipeline_spark.sources import (
        compact_versioned,
        read_versioned,
        versioned_table_path,
        write_versioned,
    )

    root = os.path.join(str(tmp_path), "vt")
    write_versioned(spark, spark.range(10_000).repartition(24), root)
    before = sorted(r["id"] for r in read_versioned(spark, root).collect())
    fb, fa = compact_versioned(spark, root, target_rows_per_file=5_000)
    assert fb >= 20 and fa == 2
    assert sorted(r["id"] for r in read_versioned(spark, root).collect()) == before
    # the pointer flip is os.replace: the path always resolves
    assert os.path.isdir(versioned_table_path(root))


def test_read_versioned_at_time_travel_and_retention(spark, tmp_path):
    """Time-travel reads resolve any RETAINED version (live + its
    predecessor); a GC'd version raises FileNotFoundError instead of
    silently reading a partially-collected directory."""
    import os

    import pytest

    from coviddatapipeline_spark.sources import (
        read_versioned_at,
        write_versioned,
    )

    root = os.path.join(str(tmp_path), "vt")
    write_versioned(spark, spark.range(10), root)  # v0
    write_versioned(spark, spark.range(20), root)  # v1
    write_versioned(spark, spark.range(30), root)  # v2 (v0 GC'd)
    assert read_versioned_at(spark, root, 2).count() == 30
    assert read_versioned_at(spark, root, 1).count() == 20
    with pytest.raises(FileNotFoundError):
        read_versioned_at(spark, root, 0)


def test_orc_entry_scan_has_pushdown_and_pruning(spark, parity_sf_dir, tmp_path):
    """storage_orc_roundtrip_parity's read side (the factored
    build_orc_scan_agg the entry itself runs): the shipdate predicate
    must reach the ORC reader as PushedFilters and ReadSchema must
    carry only the 5 projected columns — the ORC path keeps the same
    scan posture as the parquet path."""
    from coviddatapipeline_spark.operators.warehouse import build_orc_scan_agg
    from coviddatapipeline_spark.sources import write_orc

    li = t(spark, parity_sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus",
        "l_extendedprice", "l_discount", "l_shipdate",
    )
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    plan = executed_plan(build_orc_scan_agg(spark, path))
    pushed = plan.split("PushedFilters")[1][:200]
    assert "l_shipdate" in pushed and "GreaterThanOrEqual" in pushed
    # Spark truncates the FileScan schema string with '...', so assert
    # on the visible prefix (projection order is deterministic) and on
    # the absence of unprojected columns.
    schema = plan.split("ReadSchema")[1][:300]
    for col in ("l_returnflag", "l_linestatus", "l_extendedprice",
                "l_discount"):
        assert col in schema, schema
    assert "l_orderkey" not in schema and "l_quantity" not in schema
