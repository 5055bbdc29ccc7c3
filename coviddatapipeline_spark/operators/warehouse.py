"""Warehouse-surface operators: the SQL API twin, declarative data-
quality constraint auditing, and slowly-changing-dimension (SCD2)
merge — the operations a lakehouse team runs around the queries, not
inside them.

Scale posture: every check/merge below is anti-join / semi-join /
map-side-combinable aggregation on keys the data is already shuffled
by — no globals, no collects, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from coviddatapipeline_spark.operators.common import duck_floor_long, t
from coviddatapipeline_spark.queries.catalog import register

# Per-process scratch bookkeeping for warehouse_snapshot_diff_cdc: maps
# each per-(sf_dir, pid) base dir to a build counter. Every build gets
# its own subdir (b0, b1, ...) so earlier builds' returned DataFrames
# stay readable; one atexit per base removes everything at process exit.
_VERSIONED_SCRATCH_COUNTERS: dict[str, "object"] = {}


def _versioned_scratch_root(sf_dir: str, prefix: str = "cdp_versioned_cdc_") -> str:
    import atexit
    import hashlib
    import itertools
    import os
    import shutil
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        prefix
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
        + f"_{os.getpid()}",
    )
    if base not in _VERSIONED_SCRATCH_COUNTERS:
        # First touch this process: clear any stale base left by a
        # crashed prior process that reused our pid — its _CURRENT
        # pointer would otherwise make write_versioned continue from a
        # stale version number while the build counter restarts at b0,
        # breaking the absolute-version reads in snapshot_diff_cdc /
        # time_travel_read. pid-keyed uniqueness still protects
        # CONCURRENT processes; this restores the crash-staleness
        # guarantee of the old rmtree-on-every-invocation behavior.
        shutil.rmtree(base, ignore_errors=True)
        _VERSIONED_SCRATCH_COUNTERS[base] = itertools.count()
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return os.path.join(base, f"b{next(_VERSIONED_SCRATCH_COUNTERS[base])}")


@register(
    "sql_api_flagship_twin",
    oracle="""
        SELECT n_name AS nation,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    doc=(
        "The flagship join-agg expressed through the SECOND API surface "
        "— spark.sql over registered temp views, with the broadcast "
        "decision as a SQL hint (/*+ BROADCAST(nation) */) instead of "
        "F.broadcast. Proves DataFrame and SQL front-ends compile to "
        "the same Catalyst plan: same joins, same partial aggregation, "
        "same result hash as flagship_revenue_by_nation. A user who "
        "prefers SQL gets the whole engine through this door."
    ),
    tags=("join", "agg", "sql"),
)
def sql_api_flagship_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("lineitem", "orders", "customer", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(nation) */
               n_name AS nation,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY revenue DESC
        """
    )


@register(
    "dq_constraint_audit",
    oracle="""
        SELECT 'orders_pk_unique' AS check_name,
               count(*) - count(DISTINCT o_orderkey) AS n_violations,
               count(*) AS n_checked
        FROM orders
        UNION ALL
        SELECT 'orders_fk_customer', count(*), (SELECT count(*) FROM orders)
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
        UNION ALL
        SELECT 'lineitem_fk_orders', count(*), (SELECT count(*) FROM lineitem)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        UNION ALL
        SELECT 'lineitem_discount_range',
               count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1),
               count(*)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_positive_qty',
               count(*) FILTER (WHERE l_quantity <= 0), count(*)
        FROM lineitem
        UNION ALL
        SELECT 'customer_name_not_null',
               count(*) FILTER (WHERE c_name IS NULL), count(*)
        FROM customer
        ORDER BY check_name
    """,
    doc=(
        "Declarative data-quality audit — one row per constraint "
        "(PK uniqueness, two FK referential checks, a range check, a "
        "positivity check, a NOT NULL check) with violation and "
        "checked counts. The expectations-suite shape (Great-"
        "Expectations-style) as pure relational algebra: FK checks are "
        "anti-joins (count of orphans), everything else map-side "
        "conditional counts; each check is independently parallel and "
        "none materializes violating rows unless asked."
    ),
    tags=("agg", "analytics", "join"),
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    lineitem = t(spark, sf_dir, "lineitem")

    def row(name: str, viol: DataFrame, checked: DataFrame) -> DataFrame:
        return (
            viol.agg(F.count("*").alias("n_violations"))
            .crossJoin(checked.agg(F.count("*").alias("n_checked")))
            .select(F.lit(name).alias("check_name"), "n_violations", "n_checked")
        )

    pk = (
        orders.agg(
            (F.count("*") - F.countDistinct("o_orderkey")).alias("n_violations"),
            F.count("*").alias("n_checked"),
        ).select(F.lit("orders_pk_unique").alias("check_name"), "n_violations", "n_checked")
    )
    fk_cust = row(
        "orders_fk_customer",
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti"),
        orders,
    )
    fk_ord = row(
        "lineitem_fk_orders",
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"),
        lineitem,
    )
    disc = row(
        "lineitem_discount_range",
        lineitem.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
        lineitem,
    )
    qty = row(
        "lineitem_positive_qty", lineitem.filter(F.col("l_quantity") <= 0), lineitem
    )
    cname = row("customer_name_not_null", customer.filter(F.col("c_name").isNull()), customer)
    return (
        pk.unionByName(fk_cust)
        .unionByName(fk_ord)
        .unionByName(disc)
        .unionByName(qty)
        .unionByName(cname)
        .orderBy("check_name")
    )


SCD2_UPDATE_MOD = 7  # deterministic "changed rows" batch: custkey % 7 == 0


@register(
    "scd2_customer_merge",
    oracle=f"""
        WITH updates AS (
            SELECT c_custkey, c_name, round(c_acctbal + 100, 2) AS c_acctbal,
                   c_mktsegment
            FROM customer WHERE c_custkey % {SCD2_UPDATE_MOD} = 0
        ),
        closed AS (
            SELECT c.c_mktsegment FROM customer c
            JOIN updates u USING (c_custkey)
        ),
        current AS (
            SELECT c.c_mktsegment, c.c_acctbal FROM customer c
            LEFT JOIN updates u USING (c_custkey) WHERE u.c_custkey IS NULL
            UNION ALL
            SELECT c_mktsegment, c_acctbal FROM updates
        )
        SELECT cur.c_mktsegment AS segment,
               count(*) AS n_current,
               COALESCE(cl.n_closed, 0) AS n_closed,
               round(sum(cur.c_acctbal), 2) AS sum_acctbal
        FROM current cur
        LEFT JOIN (SELECT c_mktsegment, count(*) AS n_closed
                   FROM closed GROUP BY c_mktsegment) cl
            ON cur.c_mktsegment = cl.c_mktsegment
        GROUP BY cur.c_mktsegment, cl.n_closed
        ORDER BY segment
    """,
    doc=(
        "SCD Type-2 merge: an update batch (deterministically derived — "
        f"every {SCD2_UPDATE_MOD}th customer gets a balance change) "
        "applied to the customer dimension. Changed keys CLOSE their "
        "old version (valid_to stamped — the semi-join side) and INSERT "
        "the new version; unchanged keys pass through the anti-join. "
        "Audited per segment: current row count, closed-version count, "
        "current balance total. This is the upsert-without-Delta "
        "pattern: semi + anti joins on the business key, then a "
        "union — every step key-partitioned, merge cost O(dim + batch) "
        "with the batch side broadcastable when small."
    ),
    tags=("join", "agg", "reshape"),
)
def scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    updates = (
        customer.filter(F.col("c_custkey") % SCD2_UPDATE_MOD == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100, 2))
    )
    closed = customer.join(updates.select("c_custkey"), "c_custkey", "left_semi")
    current = (
        customer.join(updates.select("c_custkey"), "c_custkey", "left_anti")
        .select("c_mktsegment", "c_acctbal")
        .unionByName(updates.select("c_mktsegment", "c_acctbal"))
    )
    n_closed = (
        closed.groupBy("c_mktsegment").agg(F.count("*").alias("n_closed"))
    )
    return (
        current.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_current"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .join(
            n_closed.select(F.col("c_mktsegment").alias("segment"), "n_closed"),
            "segment",
            "left",
        )
        .select(
            "segment",
            "n_current",
            F.coalesce(F.col("n_closed"), F.lit(0)).alias("n_closed"),
            "sum_acctbal",
        )
        .orderBy("segment")
    )


@register(
    "warehouse_snapshot_diff_cdc",
    oracle="""
        WITH v1 AS (
            SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg
            FROM customer
        ),
        v2 AS (
            -- deterministic simulated next snapshot: every 7th key's
            -- balance moves, every 13th key is deleted, and one new row
            -- per nation appears with a key above the current max
            SELECT k, CASE WHEN k % 7 = 0 THEN bal + 10.0 ELSE bal END AS bal,
                   seg
            FROM v1 WHERE k % 13 != 0
            UNION ALL
            SELECT (SELECT max(c_custkey) FROM customer) + n_nationkey + 1,
                   1000.0 + n_nationkey, 'NEWSEG'
            FROM nation
        ),
        classified AS (
            SELECT coalesce(v1.k, v2.k) AS k,
                   CASE WHEN v1.k IS NULL THEN 'insert'
                        WHEN v2.k IS NULL THEN 'delete'
                        WHEN v1.bal != v2.bal OR v1.seg != v2.seg THEN 'update'
                        ELSE 'unchanged' END AS op
            FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        )
        SELECT op, count(*) AS n
        FROM classified
        GROUP BY op
        ORDER BY op
    """,
    doc=(
        "Snapshot-diff change-data-capture THROUGH the versioned-table "
        "commit protocol (sources.write_versioned / compact_versioned / "
        "read_versioned_at): snapshot 1 of the customer dimension is "
        "COMMITTED as version 0 (multi-file), OPTIMIZE'd into a "
        "compacted version 1, then the next snapshot (simulated "
        "deterministically — balance drift on every 7th key, deletes "
        "on every 13th, one insert per nation) is committed as version "
        "2; the diff reads BOTH retained versions back through the "
        "pointer-file API (time travel to N-1, live read of N), "
        "FULL-OUTER-joins on the business key and classifies every row "
        "insert/update/delete/unchanged — the changelog a warehouse "
        "computes from full-table re-extracts when the source offers "
        "no CDC stream, and exactly what Delta/Iceberg table-diff does "
        "between two committed snapshots. The oracle recomputes the "
        "same diff from the raw table, so the hash match proves the "
        "commit/compact/time-travel round trip is lossless end-to-end. "
        "One hash join on the key plus a combinable count; at 100 TB "
        "both snapshot versions would be bucketed on the key making "
        "the diff co-located and shuffle-free. Complements "
        "scd2_customer_merge, which consumes exactly this changelog."
    ),
    tags=("warehouse", "join", "cdc", "versioned"),
)
def warehouse_snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.sources import (
        compact_versioned,
        read_versioned,
        read_versioned_at,
        write_versioned,
    )

    cust = t(spark, sf_dir, "customer")
    v1 = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    max_k = F.broadcast(v1.agg(F.max("k").alias("mk")))
    changed = v1.filter(F.col("k") % 13 != 0).select(
        "k",
        F.when(F.col("k") % 7 == 0, F.col("bal") + 10.0)
        .otherwise(F.col("bal"))
        .alias("bal"),
        "seg",
    )
    inserts = (
        t(spark, sf_dir, "nation")
        .crossJoin(max_k)
        .select(
            (F.col("mk") + F.col("n_nationkey") + 1).alias("k"),
            (1000.0 + F.col("n_nationkey")).alias("bal"),
            F.lit("NEWSEG").alias("seg"),
        )
    )
    v2 = changed.unionByName(inserts)
    # Commit both snapshots through the versioned-table protocol so the
    # cross-engine hash certifies the WHOLE storage round trip, not just
    # the diff algebra: v0 = snapshot 1 (multi-file), v1 = its compacted
    # rewrite (rows must survive OPTIMIZE), v2 = snapshot 2. GC keeps
    # {v1, v2} — exactly the two versions the diff reads back.
    # Scratch layout (ADVICE r05): a per-(sf_dir, pid) BASE dir — so two
    # concurrent processes (sweep + bench is a routine overlap here)
    # never rmtree each other's version dirs mid-scan — with a fresh
    # per-BUILD subdir underneath, so a rebuilt plan never invalidates
    # the DataFrame a prior build in this process returned (the
    # registry's build-then-collect-anytime contract). The whole base
    # is atexit-rmtree'd: normal exits leak nothing; the snapshots are
    # a few MB of customer rows, so builds accumulating until exit is
    # cheap.
    root = _versioned_scratch_root(sf_dir)
    write_versioned(spark, v1.repartition(4), root)
    compact_versioned(spark, root, target_rows_per_file=10_000_000)
    write_versioned(spark, v2, root)
    s1 = read_versioned_at(spark, root, 1)  # time travel: compacted snapshot 1
    s2 = read_versioned(spark, root)  # live pointer: snapshot 2
    a = s1.select(
        F.col("k").alias("k1"), F.col("bal").alias("bal1"), F.col("seg").alias("seg1")
    )
    b = s2.select(
        F.col("k").alias("k2"), F.col("bal").alias("bal2"), F.col("seg").alias("seg2")
    )
    op = (
        F.when(F.col("k1").isNull(), F.lit("insert"))
        .when(F.col("k2").isNull(), F.lit("delete"))
        .when(
            (F.col("bal1") != F.col("bal2")) | (F.col("seg1") != F.col("seg2")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        a.join(b, F.col("k1") == F.col("k2"), "full_outer")
        .select(op.alias("op"))
        .groupBy("op")
        .agg(F.count("*").alias("n"))
        .orderBy("op")
    )


TT_CUTOFF = "1995-01-01"  # snapshot-1 cut: orders strictly before this date


@register(
    "warehouse_time_travel_read",
    oracle=f"""
        WITH s1 AS (
            SELECT o_orderpriority AS priority,
                   count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM orders WHERE o_orderdate < DATE '{TT_CUTOFF}'
            GROUP BY 1
        ),
        s2 AS (
            SELECT o_orderpriority AS priority,
                   count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM orders
            GROUP BY 1
        )
        SELECT COALESCE(s2.priority, s1.priority) AS priority,
               CAST(COALESCE(s1.n, 0) AS BIGINT) AS n_asof,
               CAST(COALESCE(s2.n, 0) AS BIGINT) AS n_live,
               CAST(COALESCE(s2.n, 0) - COALESCE(s1.n, 0) AS BIGINT) AS n_delta,
               round(COALESCE(s1.total, 0), 2) AS total_asof,
               round(COALESCE(s2.total, 0), 2) AS total_live
        FROM s1 FULL OUTER JOIN s2 ON s1.priority = s2.priority
        ORDER BY priority
    """,
    doc=(
        "Time-travel read (AS OF) over the versioned-table protocol: "
        "commit snapshot v0 (per-priority order aggregates BEFORE the "
        "cutoff date), then commit the full-history snapshot v1, then "
        "read BOTH the live pointer and AT the historical version 0 "
        "and join them into an as-of-vs-live delta report. The oracle "
        "recomputes both states from the raw orders table, so the "
        "cross-engine hash certifies that a version read back AT its "
        "number is byte-equal to the pre-update state even after a "
        "later commit moved the live pointer — the lossless-history "
        "guarantee a lakehouse time-travel query relies on (Delta/"
        "Iceberg VERSION AS OF semantics re-expressed over the "
        "repo's atomic-pointer protocol, sources.py read_versioned_at). "
        "Scale: the committed snapshots are per-priority aggregates "
        "(5 rows), so storage round-trip cost is metadata-sized; the "
        "aggregation itself is one map-side-combinable groupBy per "
        "snapshot and the final join is 5x5. Re-expresses reference "
        "dags/ETL.py:47-62 run-bookkeeping (which backfills from "
        "named historical state) as first-class versioned reads."
    ),
    tags=("warehouse", "versioned", "timetravel"),
)
def warehouse_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.sources import (
        read_versioned,
        read_versioned_at,
        write_versioned,
    )

    orders = t(spark, sf_dir, "orders")

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )

    s1 = snap(orders.filter(F.col("o_orderdate") < F.lit(TT_CUTOFF).cast("date")))
    s2 = snap(orders)
    root = _versioned_scratch_root(sf_dir)
    write_versioned(spark, s1, root)  # v0: the historical snapshot
    write_versioned(spark, s2, root)  # v1: live; GC retains {v0, v1}
    asof = read_versioned_at(spark, root, 0)
    live = read_versioned(spark, root)
    a = asof.select(
        F.col("priority").alias("p1"), F.col("n").alias("n1"), F.col("total").alias("t1")
    )
    b = live.select(
        F.col("priority").alias("p2"), F.col("n").alias("n2"), F.col("total").alias("t2")
    )
    return (
        a.join(b, F.col("p1") == F.col("p2"), "full_outer")
        .select(
            F.coalesce("p2", "p1").alias("priority"),
            F.coalesce("n1", F.lit(0)).alias("n_asof"),
            F.coalesce("n2", F.lit(0)).alias("n_live"),
            (F.coalesce("n2", F.lit(0)) - F.coalesce("n1", F.lit(0))).alias("n_delta"),
            F.round(F.coalesce("t1", F.lit(0.0)), 2).alias("total_asof"),
            F.round(F.coalesce("t2", F.lit(0.0)), 2).alias("total_live"),
        )
        .orderBy("priority")
    )


@register(
    "warehouse_partition_skew_audit",
    oracle="""
        WITH p AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS part, count(*) AS n
            FROM orders GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_partitions,
               CAST(min(n) AS BIGINT) AS min_rows,
               CAST(max(n) AS BIGINT) AS max_rows,
               CAST(sum(n) AS BIGINT) AS total_rows,
               CAST((max(n) * count(*) * 10000) // sum(n) AS BIGINT) AS skew_e4,
               CAST((max(n) * 10000) // sum(n) AS BIGINT) AS max_share_e4
        FROM p
    """,
    doc=(
        "Partition-sizing audit for a date-partitioned fact write: rows "
        "per month partition, reduced to the numbers a table layout is "
        "judged by — partition count, min/max rows, max/avg skew factor "
        "and the largest partition's share (both e4 integer division, "
        "exact on both engines). A skew_e4 far above 10000 means the "
        "partition scheme concentrates writes (and later scans) on one "
        "task's worth of files; the fix is a finer key or bucketing, "
        "and THIS number is the before/after evidence. One map-side-"
        "combinable count per partition + a constant-size final fold — "
        "the audit costs one scan at any corpus size."
    ),
    tags=("warehouse", "agg"),
)
def warehouse_partition_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("part"))
        .agg(F.count("*").alias("n"))
    )
    return p.agg(
        F.count("*").alias("n_partitions"),
        F.min("n").alias("min_rows"),
        F.max("n").alias("max_rows"),
        F.sum("n").alias("total_rows"),
    ).select(
        "n_partitions",
        "min_rows",
        "max_rows",
        "total_rows",
        F.expr("CAST((max_rows * n_partitions * 10000) DIV total_rows AS BIGINT)").alias(
            "skew_e4"
        ),
        F.expr("CAST((max_rows * 10000) DIV total_rows AS BIGINT)").alias(
            "max_share_e4"
        ),
    )


@register(
    "scd2_point_in_time",
    oracle=f"""
        WITH updates AS (
            SELECT c_custkey, c_mktsegment,
                   round(c_acctbal + 100, 2) AS bal
            FROM customer WHERE c_custkey % {SCD2_UPDATE_MOD} = 0
        ),
        dim AS (
            SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal,
                   DATE '2000-01-01' AS valid_from,
                   CASE WHEN c_custkey % {SCD2_UPDATE_MOD} = 0
                        THEN DATE '2000-02-01' END AS valid_to
            FROM customer
            UNION ALL
            SELECT c_custkey, c_mktsegment, bal,
                   DATE '2000-02-01', NULL
            FROM updates
        ),
        pit AS (
            SELECT 'before' AS as_of, seg, bal FROM dim
            WHERE valid_from <= DATE '2000-01-15'
              AND (valid_to IS NULL OR DATE '2000-01-15' < valid_to)
            UNION ALL
            SELECT 'after' AS as_of, seg, bal FROM dim
            WHERE valid_from <= DATE '2000-03-01'
              AND (valid_to IS NULL OR DATE '2000-03-01' < valid_to)
        )
        SELECT as_of, seg AS segment,
               count(*) AS n_rows,
               round(sum(bal), 2) AS sum_acctbal
        FROM pit GROUP BY as_of, seg
        ORDER BY as_of, segment
    """,
    doc=(
        "SCD2 point-in-time ('as of') query — the read side of the "
        "SCD2 merge: the dimension is materialized WITH validity "
        "intervals (old versions of changed keys close at the batch "
        "date, new versions open there), and the same table answers "
        "'state as of T' for any T via the interval predicate "
        "valid_from <= T < coalesce(valid_to, infinity) — time travel "
        "without engine support, the query every audit/backfill/"
        "retraining-reproducibility request turns into. Two probe "
        "instants (one before, one after the change batch) are audited "
        "per segment; the 'before' totals must equal the pre-merge "
        "dimension and 'after' must reflect exactly the update batch — "
        "version isolation checked end to end. Each probe is a filter "
        "+ combinable aggregate (no join against the asof list, so no "
        "nested-loop plan); at scale the dimension is partitioned by "
        "business key and the interval filter prunes by row-group "
        "stats on valid_from."
    ),
    tags=("warehouse", "reshape", "agg"),
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    d0, d1 = F.lit("2000-01-01").cast("date"), F.lit("2000-02-01").cast("date")
    changed = F.col("c_custkey") % SCD2_UPDATE_MOD == 0
    old = customer.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
        d0.alias("valid_from"),
        F.when(changed, d1).alias("valid_to"),
    )
    new = customer.filter(changed).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") + 100, 2).alias("bal"),
        d1.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    dim = old.unionByName(new)

    def asof(label: str, day: str) -> DataFrame:
        d = F.lit(day).cast("date")
        return dim.filter(
            (F.col("valid_from") <= d)
            & (F.col("valid_to").isNull() | (d < F.col("valid_to")))
        ).select(F.lit(label).alias("as_of"), "seg", "bal")

    return (
        asof("before", "2000-01-15")
        .unionByName(asof("after", "2000-03-01"))
        .groupBy("as_of", F.col("seg").alias("segment"))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("bal"), 2).alias("sum_acctbal"),
        )
        .orderBy("as_of", "segment")
    )


# ---------------------------------------------------------------------------
# Z-order layout audit: multi-dimensional clustering vs linear sort
# ---------------------------------------------------------------------------

Z_BITS = 4  # per-dimension quantization (16 cells per axis)
Z_FILE_ROWS = 1000  # rows per simulated data file
Z_PROBE_X = 7  # point-lookup probe cell on the custkey axis


def _z_spark(x: str, y: str) -> str:
    """Spark SQL bit-interleave of two Z_BITS-bit ints (y in even bits)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i + 1})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i})")
    return " + ".join(terms)


def _z_duck(x: str, y: str) -> str:
    """Same interleave in DuckDB operator syntax."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
    WITH bounds AS (
        SELECT min(o_custkey) AS minc, max(o_custkey) AS maxc,
               min(o_orderdate) AS mind, max(o_orderdate) AS maxd
        FROM orders
    ),
    quant AS (
        -- COALESCE mirrors the engine: a NULL key quantizes to cell 0
        -- (total sort key for the fused ranking; clean-data no-op)
        SELECT o.o_orderkey,
               COALESCE(CAST(((o.o_custkey - b.minc) * {1 << Z_BITS})
                    // (b.maxc - b.minc + 1) AS BIGINT), 0) AS x,
               COALESCE(CAST((date_diff('day', b.mind, o.o_orderdate)
                    * {1 << Z_BITS})
                    // (date_diff('day', b.mind, b.maxd) + 1) AS BIGINT), 0)
                   AS y
        FROM orders o, bounds b
    ),
    keyed AS (
        SELECT o_orderkey, x, y,
               {_z_duck("x", "y")} AS zval
        FROM quant
    ),
    layouts AS (
        -- NULLS FIRST pins the orderkey tiebreak to Spark's ASC
        -- default (matters only for NULL-orderkey poison rows)
        SELECT 'zorder' AS layout, x, y,
               row_number() OVER (ORDER BY zval, o_orderkey NULLS FIRST)
                   AS rn
        FROM keyed
        UNION ALL
        SELECT 'linear' AS layout, x, y,
               row_number() OVER (ORDER BY y, o_orderkey NULLS FIRST) AS rn
        FROM keyed
    ),
    files AS (
        SELECT layout, (rn - 1) // {Z_FILE_ROWS} AS file_id,
               min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM layouts GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum((max_x - min_x + 1) * (max_y - min_y + 1)) * 10000
                // count(*) AS BIGINT) AS avg_bbox_area_e4,
           CAST(max((max_x - min_x + 1) * (max_y - min_y + 1)) AS BIGINT)
               AS max_bbox_area,
           CAST(sum(CASE WHEN min_x <= {Z_PROBE_X} AND {Z_PROBE_X} <= max_x
                         THEN 1 ELSE 0 END) AS BIGINT) AS probe_files_scanned,
           CAST((count(*) - sum(CASE WHEN min_x <= {Z_PROBE_X}
                                          AND {Z_PROBE_X} <= max_x
                                     THEN 1 ELSE 0 END)) * 10000
                // count(*) AS BIGINT) AS x_skip_frac_e4
    FROM files
    GROUP BY layout
    ORDER BY layout
"""


@register(
    "zorder_layout_skipping_audit",
    oracle=_ZORDER_ORACLE,
    doc=(
        f"Z-order clustering audit (Morton 1966; the layout behind "
        f"Delta/Iceberg OPTIMIZE ZORDER, all public): orders are "
        f"quantized to a {1 << Z_BITS}x{1 << Z_BITS} (custkey, day) "
        f"grid, bit-interleaved into a Morton key, globally sorted, and "
        f"cut into {Z_FILE_ROWS}-row files; per-file (custkey, day) "
        f"bounding boxes are compared against the time-linear ingest "
        f"layout. Reported per layout: average/max bbox area (the "
        f"min-max pruning volume a query planner consults) and the "
        f"fraction of files a custkey point-lookup can SKIP from file "
        f"stats alone — the number that justifies a re-clustering job. "
        f"Z-order trades the linear layout's perfect one-axis locality "
        f"for bounded BOTH-axis locality, which is why the custkey skip "
        f"fraction jumps while day-range scans stay cheap. Both layouts "
        f"rank in ONE cutpoint-bucketed row-number pass (no single-"
        f"partition Exchange, no second scan): each row explodes into "
        f"its two (layout, sortkey) variants packed into one integral "
        f"key; quantization, interleave, and every reported metric are "
        f"exact integer arithmetic on both engines."
    ),
    tags=("warehouse", "layout", "scale"),
)
def zorder_layout_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.ranking import with_global_row_number

    orders = t(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_custkey").alias("minc"),
        F.max("o_custkey").alias("maxc"),
        F.min("o_orderdate").alias("mind"),
        F.max("o_orderdate").alias("maxd"),
    )
    quant = (
        orders.crossJoin(F.broadcast(b))
        .select(
            "o_orderkey",
            # COALESCE(.., 0): a NULL key quantizes to cell 0 on BOTH
            # engines — the fused single-pass ranking below needs a
            # TOTAL sort key (a NULL sortnum row belongs to neither
            # layout block and shifts every file boundary after it);
            # no-op on clean data where keys are non-NULL
            F.coalesce(
                F.expr(
                    f"CAST(((o_custkey - minc) * {1 << Z_BITS})"
                    f" DIV (maxc - minc + 1) AS BIGINT)"
                ),
                F.lit(0),
            ).alias("x"),
            F.coalesce(
                F.expr(
                    f"CAST((datediff(o_orderdate, mind) * {1 << Z_BITS})"
                    f" DIV (datediff(maxd, mind) + 1) AS BIGINT)"
                ),
                F.lit(0),
            ).alias("y"),
        )
        .withColumn("zval", F.expr(_z_spark("x", "y")))
    )

    # ONE ranked pass over both layouts (VERDICT r08 #5; previously the
    # bucketed global ranker ran twice, once per layout): each quantized
    # order explodes into its (layout, sortkey) pair — linear sorts by
    # y, zorder by the Morton key — and layout+sortkey pack into a
    # single integral ranking key. zval < 2^(2*Z_BITS), so the zorder
    # block (lid=1) sits strictly after every linear row and within
    # each block the order is exactly (sortkey, o_orderkey) — the same
    # per-layout total order the two separate passes produced. The
    # per-layout row number is the global one minus the block offset
    # (both blocks hold exactly n rows).
    lid_stride = 1 << (2 * Z_BITS)
    doubled = quant.select(
        "x",
        "y",
        "o_orderkey",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("lid"), F.col("y").alias("skey")),
                F.struct(F.lit(1).alias("lid"), F.col("zval").alias("skey")),
            )
        ).alias("e"),
    ).select(
        "x",
        "y",
        "o_orderkey",
        F.col("e.lid").alias("lid"),
        (F.col("e.lid").cast("long") * lid_stride + F.col("e.skey")).alias(
            "sortnum"
        ),
    )
    # OPTIMIZATION_r12 §B4: sortnum is a bounded integral sort code
    # (< 2 * lid_stride = 512 values), so it IS its own range bucket —
    # value-bucketing skips the ranker's approx_percentile cutpoint
    # job, one of three full passes over the quant+explode subtree
    # (bucketing affects balance only; offsets still come from exact
    # per-bucket counts). NULL sortnum rows (poison NULL orderkeys
    # quantize to cell 0, but a NULL key can still null the packed
    # code) map to bucket 0 = the smallest bucket, exactly where the
    # cutpoint path placed them.
    ranked, total = with_global_row_number(
        doubled,
        ["sortnum", "o_orderkey"],
        out="rn",
        bucket_of=F.coalesce(F.col("sortnum"), F.lit(0)),
    )
    n = total // 2
    files = (
        ranked.withColumn(
            "file_id", F.expr(f"(rn - 1 - lid * {n}) DIV {Z_FILE_ROWS}")
        )
        .groupBy("lid", "file_id")
        .agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .withColumn(
            "layout",
            F.when(F.col("lid") == 1, F.lit("zorder")).otherwise(F.lit("linear")),
        )
    )
    hit = F.when(
        (F.col("min_x") <= Z_PROBE_X) & (F.lit(Z_PROBE_X) <= F.col("max_x")), 1
    ).otherwise(0)
    return (
        files.groupBy("layout")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(
                (F.col("max_x") - F.col("min_x") + 1)
                * (F.col("max_y") - F.col("min_y") + 1)
            ).alias("area_sum"),
            F.max(
                (F.col("max_x") - F.col("min_x") + 1)
                * (F.col("max_y") - F.col("min_y") + 1)
            ).cast("long").alias("max_bbox_area"),
            F.sum(hit).alias("scanned"),
        )
        .select(
            "layout",
            F.col("n_files").cast("long").alias("n_files"),
            F.expr("CAST(area_sum * 10000 DIV n_files AS BIGINT)").alias(
                "avg_bbox_area_e4"
            ),
            "max_bbox_area",
            F.col("scanned").cast("long").alias("probe_files_scanned"),
            F.expr(
                "CAST((n_files - scanned) * 10000 DIV n_files AS BIGINT)"
            ).alias("x_skip_frac_e4"),
        )
        .orderBy("layout")
    )


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics (optimizer stats as a query)
# ---------------------------------------------------------------------------

# (column, duckdb min/max formatter, spark min/max formatter) — doubles
# render through an INTEGER cents path (floor(v*100+0.5) as BIGINT):
# printf('%.2f') is NOT engine-portable on exact binary ties (Java
# Formatter rounds HALF_UP, C printf rounds half-even on the binary
# value), so an x.125-style min/max would hash-fail; one IEEE multiply
# + floor is bit-identical on both engines. Dates normalize to
# yyyy-MM-dd.
_STATS_COLS = (
    ("o_orderkey", "CAST({v} AS VARCHAR)", "CAST({v} AS STRING)"),
    ("o_custkey", "CAST({v} AS VARCHAR)", "CAST({v} AS STRING)"),
    ("o_orderstatus", "{v}", "{v}"),
    (
        "o_totalprice",
        # duck_floor_long mirrors Spark's total floor(double)->BIGINT:
        # a NaN max (NaN sorts greatest on both engines) renders as "0"
        # instead of crashing DuckDB's CAST; no-op on finite prices.
        "CAST((" + duck_floor_long("{v} * 100 + 0.5") + ") AS VARCHAR)",
        "CAST(CAST(floor({v} * 100 + 0.5) AS BIGINT) AS STRING)",
    ),
    ("o_orderdate", "CAST(CAST({v} AS DATE) AS VARCHAR)", "CAST(CAST({v} AS DATE) AS STRING)"),
    ("o_orderpriority", "{v}", "{v}"),
)


def _stats_oracle() -> str:
    parts = []
    for col, fmt, _ in _STATS_COLS:
        parts.append(
            f"""SELECT '{col}' AS column_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT {col}) AS BIGINT) AS ndv,
                   {fmt.format(v=f"min({col})")} AS min_val,
                   {fmt.format(v=f"max({col})")} AS max_val
            FROM orders"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register(
    "table_stats_analyze_audit",
    oracle=_stats_oracle(),
    doc=(
        "ANALYZE TABLE as a query: per-column row count, null count, "
        "exact NDV, and normalized min/max for every orders column — "
        "the statistics a cost-based optimizer joins-reorders and "
        "broadcast-plans from, computed here so stats collection is an "
        "auditable operator rather than engine magic. Spark side is one "
        "column-pruned aggregate branch PER COLUMN, unioned: multiple "
        "exact count-distincts in a single aggregate go through "
        "Catalyst's Expand operator, which multiplies every input row "
        "by (n_distinct_aggs + 1) before the shuffle — measured 4.4x "
        "slower than the per-column branches at sf0.1 — while the "
        "branches each scan ONE column (columnar reads make n "
        "single-column passes the same total I/O as one n-column pass) "
        "and shuffle only partial-aggregated distinct values. Doubles "
        "render through an integer cents path (floor(v*100+0.5) as "
        "BIGINT) so min/max strings are bit-identical on both engines "
        "even on exact binary ties, dates normalize to yyyy-MM-dd. "
        "Exact NDV is the "
        "reference; the HLL entry is the cheap path when a 2% error is "
        "acceptable."
    ),
    tags=("warehouse", "agg", "stats"),
)
def table_stats_analyze_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    # One column-pruned aggregate branch per column (see doc= for the
    # Expand-vs-branches measurement; OPTIMIZATION_r13 §8). Every
    # aggregate expression is identical to the old single-agg form —
    # count/ndv/min/max over the same column — so every value is
    # unchanged; only the plan shape moves from one Expand x7 aggregate
    # to a union of per-column aggregates.
    branches = []
    for col, _, sfmt in _STATS_COLS:
        branches.append(
            orders.select(col).agg(
                F.lit(col).alias("column_name"),
                F.count("*").cast("long").alias("n_rows"),
                (F.count("*") - F.count(col)).cast("long").alias("n_nulls"),
                F.countDistinct(col).cast("long").alias("ndv"),
                F.expr(sfmt.format(v=f"min({col})")).alias("min_val"),
                F.expr(sfmt.format(v=f"max({col})")).alias("max_val"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.orderBy("column_name")


# ---------------------------------------------------------------------------
# Incremental view maintenance: join-view delta application
# ---------------------------------------------------------------------------

IVM_CUTOFF = "2000-01-01"
# Per-row integer cents via floor(x*100 + 0.5): one IEEE multiply and
# one floor, identical on both engines — no round() tie semantics, no
# float accumulation (the sum is over BIGINTs).
_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


@register(
    "ivm_join_view_delta",
    oracle=f"""
        WITH j AS (
            SELECT n.n_name AS nation, o.o_orderkey, o.o_orderdate,
                   {_CENTS} AS cents
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
        )
        SELECT nation,
               CAST(sum(cents) AS BIGINT) AS revenue_cents,
               CAST(count(DISTINCT CASE WHEN o_orderdate < DATE '{IVM_CUTOFF}'
                                        THEN o_orderkey END) AS BIGINT)
                   AS base_orders,
               CAST(count(DISTINCT CASE WHEN o_orderdate >= DATE '{IVM_CUTOFF}'
                                        THEN o_orderkey END) AS BIGINT)
                   AS delta_orders
        FROM j
        GROUP BY nation
        ORDER BY nation
    """,
    doc=(
        f"Incremental view maintenance for the revenue-by-nation join "
        f"view: orders split at {IVM_CUTOFF} into a materialized base "
        f"and an arriving delta, and the Spark side computes the view "
        f"INCREMENTALLY — base aggregate plus delta aggregate, merged "
        f"with a full-outer coalesce — which is the V(D ∪ ΔD) = V(D) + "
        f"ΔV identity that lets a 100 TB view absorb a day's orders by "
        f"joining only the delta against the dimensions instead of "
        f"recomputing history (the groupBy-SUM view is self-"
        f"maintainable; the oracle recomputes from scratch, so any "
        f"error in the delta algebra hash-fails). Revenue is exact "
        f"integer cents per lineitem (floor(x*100+0.5), one IEEE "
        f"multiply + floor — identical both engines, BIGINT sums), so "
        f"the base+delta sum and the full recompute cannot differ by "
        f"float ordering. Per nation: merged revenue and base/delta "
        f"order counts."
    ),
    tags=("warehouse", "join", "incremental"),
)
def ivm_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr(_CENTS).alias("cents")
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def view_agg(o: DataFrame) -> DataFrame:
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(cust, o.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.sum("cents").alias("cents"),
                F.countDistinct("o_orderkey").alias("n_orders"),
            )
        )

    cutoff = F.lit(IVM_CUTOFF).cast("date")
    base = view_agg(orders.filter(F.col("o_orderdate") < cutoff))
    delta = view_agg(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = base.select(
        "nation",
        F.col("cents").alias("b_cents"),
        F.col("n_orders").alias("base_orders"),
    ).join(
        delta.select(
            "nation",
            F.col("cents").alias("d_cents"),
            F.col("n_orders").alias("delta_orders"),
        ),
        "nation",
        "full_outer",
    )
    return merged.select(
        "nation",
        (
            F.coalesce(F.col("b_cents"), F.lit(0))
            + F.coalesce(F.col("d_cents"), F.lit(0))
        )
        .cast("long")
        .alias("revenue_cents"),
        F.coalesce(F.col("base_orders"), F.lit(0)).cast("long").alias("base_orders"),
        F.coalesce(F.col("delta_orders"), F.lit(0))
        .cast("long")
        .alias("delta_orders"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# log10(1 + 1/d) at e4; sums to exactly 10000.
BENFORD_E4 = {1: 3010, 2: 1761, 3: 1249, 4: 969, 5: 792, 6: 669, 7: 580, 8: 512, 9: 458}
_BENFORD_CASE = (
    "CASE " + " ".join(f"WHEN digit = {d} THEN {e}" for d, e in BENFORD_E4.items()) + " END"
)


@register(
    "dq_benford_first_digit",
    oracle=f"""
        WITH digits AS (
            -- duck_floor_long mirrors Spark's total floor(double)->BIGINT
            -- (NaN -> 0, +-inf -> Long extremes): a NaN price passes the
            -- > 0 predicate on BOTH engines (NaN sorts greatest) and
            -- lands in a digit-0 bucket the audit then surfaces, instead
            -- of crashing DuckDB's CAST. No-op on finite prices.
            SELECT CAST(substr(CAST(({duck_floor_long('o_totalprice')})
                                    AS VARCHAR), 1, 1) AS INTEGER) AS digit
            FROM orders WHERE o_totalprice > 0
        ),
        counts AS (
            SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
        SELECT c.digit, c.n,
               CAST(c.n * 10000 // t.total AS BIGINT) AS share_e4,
               CAST({_BENFORD_CASE} AS BIGINT) AS benford_e4,
               CAST(abs(c.n * 10000 // t.total - ({_BENFORD_CASE}))
                    AS BIGINT) AS abs_dev_e4
        FROM counts c CROSS JOIN tot t
        ORDER BY c.digit
    """,
    doc=(
        "Benford's-law first-digit audit on order totals (Newcomb 1881 "
        "/ Benford 1938, public; the fraud/synthetic-data screen "
        "auditors run on financial columns): observed first-digit "
        "shares at e4 against the log10(1+1/d) expectation (e4 integer "
        "constants summing to exactly 10000), with per-digit absolute "
        "deviation. A synthetic uniform price generator shows up "
        "instantly as a flat ~1111-per-digit profile — which is itself "
        "the honest finding on this testdata, and exactly what the "
        "audit exists to flag. One map (string first digit — no log, "
        "no float), one 9-row combinable count, broadcast total; "
        "integer division everywhere."
    ),
    tags=("warehouse", "quality", "agg"),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    digits = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)"
                " AS STRING), 1, 1) AS INT)"
            ).alias("digit")
        )
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.expr("CAST(n * 10000 DIV total AS BIGINT)").alias("share_e4"),
            F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("benford_e4"),
            F.expr(
                f"CAST(abs(n * 10000 DIV total - ({_BENFORD_CASE})) AS BIGINT)"
            ).alias("abs_dev_e4"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity governance audit
# ---------------------------------------------------------------------------

KANON_K = 5  # the conventional re-identification threshold


@register(
    "dq_k_anonymity_audit",
    oracle=f"""
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(count(*) AS BIGINT) AS class_size,
                   -- duck_floor_long: Spark's floor(double) is total
                   -- (NaN -> bucket 0, -inf -> Long.MIN); mirror it so a
                   -- poisoned balance lands in the same l-diversity
                   -- bucket instead of crashing DuckDB's CAST.
                   CAST(count(DISTINCT ({duck_floor_long('c_acctbal / 1000')}))
                        AS BIGINT) AS l_div
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
        ),
        tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS n_rows FROM classes)
        SELECT t.n_rows,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(c.class_size) AS BIGINT) AS k_anonymity,
               CAST(sum(CASE WHEN c.class_size < {KANON_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS classes_below_k,
               CAST(sum(CASE WHEN c.class_size < {KANON_K}
                             THEN c.class_size ELSE 0 END) AS BIGINT)
                   AS rows_below_k,
               CAST(sum(CASE WHEN c.class_size < {KANON_K}
                             THEN c.class_size ELSE 0 END) * 10000
                    // t.n_rows AS BIGINT) AS reid_risk_e4,
               CAST(min(c.l_div) AS BIGINT) AS min_l_diversity
        FROM classes c CROSS JOIN tot t
        GROUP BY t.n_rows
    """,
    doc=(
        f"Privacy-governance audit (Sweeney 2002 k-anonymity, "
        f"Machanavajjhala 2007 l-diversity, both public): customers "
        f"grouped by the quasi-identifier pair (nation, market "
        f"segment) — k-anonymity is the SMALLEST equivalence class, "
        f"the number that says how many people a released row could "
        f"be; classes below k={KANON_K} are counted with their row "
        f"mass and e4 re-identification exposure, and l-diversity is "
        f"the minimum count of distinct sensitive values (account-"
        f"balance thousand-buckets) within any class — a k-anonymous "
        f"class with one sensitive value still leaks. One combinable "
        f"groupBy over the QI key plus a broadcast total; the audit "
        f"output is one row regardless of input scale, which is what "
        f"lets it gate every release of a 100 TB dataset. All exact "
        f"integers."
    ),
    tags=("warehouse", "quality", "privacy"),
)
def dq_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    classes = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("class_size"),
            F.countDistinct(
                F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)")
            ).alias("l_div"),
        )
    )
    tot = classes.agg(F.sum("class_size").alias("n_rows"))
    below = F.when(F.col("class_size") < KANON_K, F.col("class_size")).otherwise(0)
    return (
        classes.crossJoin(F.broadcast(tot))
        .groupBy("n_rows")
        .agg(
            F.count("*").alias("n_classes"),
            F.min("class_size").alias("k_anonymity"),
            F.sum(F.when(F.col("class_size") < KANON_K, 1).otherwise(0)).alias(
                "classes_below_k"
            ),
            F.sum(below).alias("rows_below_k"),
            F.min("l_div").alias("min_l_diversity"),
        )
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_classes").cast("long").alias("n_classes"),
            F.col("k_anonymity").cast("long").alias("k_anonymity"),
            F.col("classes_below_k").cast("long").alias("classes_below_k"),
            F.col("rows_below_k").cast("long").alias("rows_below_k"),
            F.expr("CAST(rows_below_k * 10000 DIV n_rows AS BIGINT)").alias(
                "reid_risk_e4"
            ),
            F.col("min_l_diversity").cast("long").alias("min_l_diversity"),
        )
    )


# ---------------------------------------------------------------------------
# RLE run profile: encoding benefit of sort order
# ---------------------------------------------------------------------------


@register(
    "layout_rle_run_profile",
    oracle="""
        -- NULLS FIRST pins both physical sort orders to Spark's
        -- default ASC null placement (DuckDB defaults NULLS LAST): a
        -- NULL-keyed poison order otherwise sits at the opposite end
        -- of the layout and shifts the adjacency run count by its
        -- run boundaries. No-op on clean data (round-8 convergence).
        WITH by_status AS (
            SELECT o_orderstatus AS v,
                   row_number() OVER (ORDER BY o_orderstatus NULLS FIRST,
                                      o_orderkey NULLS FIRST) AS rn
            FROM orders
        ),
        by_date AS (
            SELECT o_orderstatus AS v,
                   row_number() OVER (ORDER BY o_orderdate NULLS FIRST,
                                      o_orderkey NULLS FIRST) AS rn
            FROM orders
        ),
        runs AS (
            SELECT 'by_status' AS layout,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(1 + sum(CASE WHEN b.v <> a.v THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_runs
            FROM by_status a JOIN by_status b ON b.rn = a.rn + 1
            UNION ALL
            SELECT 'by_date',
                   CAST(count(*) AS BIGINT),
                   CAST(1 + sum(CASE WHEN b.v <> a.v THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM by_date a JOIN by_date b ON b.rn = a.rn + 1
        )
        SELECT layout, n_rows + 1 AS n_rows, n_runs,
               CAST((n_rows + 1) * 100 // n_runs AS BIGINT) AS avg_run_len_e2,
               CAST(n_runs * 10000 // (n_rows + 1) AS BIGINT) AS rle_ratio_e4
        FROM runs
        ORDER BY layout
    """,
    doc=(
        "Run-length-encoding profile of the order-status column under "
        "two physical sort orders — the measurement behind 'sort before "
        "you write': RLE/dictionary encodings store one entry per RUN, "
        "so runs/rows (e4) is the size a column chunk shrinks to when "
        "the writer sees sorted input, and status-sorted vs "
        "date-sorted (the ingest order) is the before/after of adding "
        "the column to the sort key. Adjacency is computed WITHOUT a "
        "global window on the Spark side: the total order is "
        "bucket-major (range buckets from cutpoints of the leading "
        "key), so the n-1 adjacent pairs are exactly the within-bucket "
        "lag pairs — windows PARTITIONED by bucket, parallel — plus "
        "one boundary pair per consecutive non-empty bucket from a "
        "buckets-sized summary. (runs = changes + 1, rows = "
        "pairs + 1.) Completes the layout family: Z-order buys "
        "min-max skipping, this buys bytes."
    ),
    tags=("warehouse", "layout", "scale"),
)
def layout_rle_run_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.ranking import (
        _BKT,
        _monotone_numeric,
        _range_buckets,
        const_key,
    )

    # the bucketing helper needs a numeric leading key; single-char
    # status codes order identically by their ascii code
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        F.ascii("o_orderstatus").alias("status_code"),
    )

    def profile(keys: list[str], layout: str) -> DataFrame:
        # OPTIMIZATION_r13 §7 (guide §2.4): the old shape materialized
        # the full bucketed global row number (cutpoint job + counts
        # job + the ranked pass evaluated TWICE as the two sides of an
        # rn+1 self-join). Adjacency only needs CONSECUTIVE rows of the
        # total order, and the order is bucket-major (bucket is a
        # monotone function of the leading key, within-bucket the sort
        # key completes it) — so the identical multiset of adjacent
        # pairs is the union of (a) within-bucket lag pairs, from
        # windows PARTITIONED by bucket (parallel, never a global
        # funnel), and (b) one boundary pair per consecutive non-empty
        # bucket, from a lag over the buckets-sized summary (metadata-
        # sized, const_key window). No rn, no offsets collect, no
        # self-join; the aggregation over the pair frame is expression-
        # for-expression the old one, so every count — including the
        # empty/one-row degenerate frames — is unchanged (pinned by
        # test_layout_rle_pair_formulations_agree).
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        bucketed = _range_buckets(orders, _monotone_numeric(orders, keys[0]), num_buckets)
        w = Window.partitionBy(_BKT).orderBy(*[F.col(k) for k in keys])
        within = (
            bucketed.select(
                F.col("o_orderstatus").alias("vb"),
                F.lag("o_orderstatus").over(w).alias("va"),
                F.lag(F.lit(1)).over(w).alias("has_prev"),
            )
            .filter(F.col("has_prev") == 1)
            .select("va", "vb")
        )
        ksort = F.struct(*[F.col(k) for k in keys])
        summary = bucketed.groupBy(_BKT).agg(
            F.min_by("o_orderstatus", ksort).alias("first_v"),
            F.max_by("o_orderstatus", ksort).alias("last_v"),
        )
        wb = Window.partitionBy(const_key(_BKT)).orderBy(_BKT)
        boundary = (
            summary.select(
                F.col("first_v").alias("vb"),
                F.lag("last_v").over(wb).alias("va"),
                F.lag(F.lit(1)).over(wb).alias("has_prev"),
            )
            .filter(F.col("has_prev") == 1)
            .select("va", "vb")
        )
        return (
            within.unionByName(boundary)
            .agg(
                F.count("*").alias("pairs"),
                F.sum(F.when(F.col("va") != F.col("vb"), 1).otherwise(0)).alias(
                    "changes"
                ),
            )
            .select(
                F.lit(layout).alias("layout"),
                (F.col("pairs") + 1).cast("long").alias("n_rows"),
                (F.col("changes") + 1).cast("long").alias("n_runs"),
            )
        )

    # The two layouts are independent profiles of the same input; each
    # build runs one eager cutpoint job, so build them overlapped
    # (guide §2.6 — the rfm/bakeoff thread-pool precedent §C9/§B3).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        by_status, by_date = pool.map(
            lambda a: profile(*a),
            [
                (["status_code", "o_orderkey"], "by_status"),
                (["o_orderdate", "o_orderkey"], "by_date"),
            ],
        )
    runs = by_status.unionByName(by_date)
    return runs.select(
        "layout",
        "n_rows",
        "n_runs",
        F.expr("CAST(n_rows * 100 DIV n_runs AS BIGINT)").alias("avg_run_len_e2"),
        F.expr("CAST(n_runs * 10000 DIV n_rows AS BIGINT)").alias("rle_ratio_e4"),
    ).orderBy("layout")


# ---------------------------------------------------------------------------
# Referential-integrity audit across the star schema's FK edges
# ---------------------------------------------------------------------------

# (relation label, child table, fk column, parent table, pk column)
_RI_EDGES = (
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _ri_oracle() -> str:
    parts = []
    for label, child, fk, parent, pk in _RI_EDGES:
        parts.append(f"""
        SELECT '{label}' AS relation,
               (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child,
               (SELECT CAST(count(*) AS BIGINT) FROM {child}
                WHERE {fk} IS NULL) AS n_null_fk,
               (SELECT CAST(count(*) AS BIGINT) FROM {child} c
                WHERE c.{fk} IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM {parent} p
                                  WHERE p.{pk} = c.{fk})) AS n_orphans""")
    body = " UNION ALL ".join(parts)
    return f"""
        SELECT relation, n_child, n_null_fk, n_orphans,
               CAST(CASE WHEN n_child = 0 THEN NULL
                    ELSE n_orphans * 1000000 // n_child END AS BIGINT)
                   AS orphan_ppm
        FROM ({body})
        ORDER BY relation
    """


@register(
    "dq_referential_integrity_audit",
    oracle=_ri_oracle(),
    doc=(
        "Referential-integrity audit over every FK edge of the star "
        "schema: per relation, the child row count, NULL-FK count "
        "(unset keys, reported separately — a NULL FK is not an "
        "orphan), and ORPHAN count (non-NULL FK with no parent row), "
        "with the orphan share in ppm — the data-quality gate a "
        "warehouse load runs before publishing a snapshot, and the "
        "first thing a join-result discrepancy investigation checks. "
        "Each edge is one left-anti join against the parent KEY "
        "column (dimension parents broadcast; the fact-fact edge "
        "shuffles on the join key only — no row data moves, keys "
        "only) plus two map-side-combinable counts; edges are "
        "independent, so the whole audit is one union of 7 small "
        "plans that AQE schedules concurrently. ppm division is "
        "guarded (empty child -> NULL on both engines)."
    ),
    tags=("warehouse", "dq", "join"),
)
def dq_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for label, child, fk, parent, pk in _RI_EDGES:
        c = t(spark, sf_dir, child)
        pkeys = t(spark, sf_dir, parent).select(F.col(pk).alias("__pk")).distinct()
        counts = c.agg(
            F.count("*").alias("n_child"),
            F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_fk"),
        )
        orphans = (
            c.filter(F.col(fk).isNotNull())
            .select(F.col(fk).alias("__fk"))
            .join(pkeys, F.col("__fk") == F.col("__pk"), "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        row = (
            counts.crossJoin(orphans)
            .select(
                F.lit(label).alias("relation"),
                F.col("n_child").cast("long").alias("n_child"),
                "n_null_fk",
                F.col("n_orphans").cast("long").alias("n_orphans"),
                F.expr(
                    "CAST(CASE WHEN n_child = 0 THEN NULL"
                    " ELSE n_orphans * 1000000 DIV n_child END AS BIGINT)"
                ).alias("orphan_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relation")


@register(
    "storage_orc_roundtrip_parity",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc=(
        "SECOND columnar storage format, end-to-end: the pruned "
        "lineitem projection is written to ORC in scratch, read back "
        "through Spark's native ORC reader, and aggregated under a "
        "selective date predicate — the oracle recomputes from the "
        "original parquet, so the hash certifies the full "
        "parquet->ORC->scan round trip (values, types, NULLs). The "
        "scan-side contract is pinned by a plan test: the shipdate "
        "predicate reaches the ORC reader as PushedFilters and the "
        "ReadSchema carries only the 5 projected columns — ORC keeps "
        "the same pushdown/pruning posture as the parquet path "
        "(tests/test_storage_layout.py). At 100 TB this is the "
        "format-migration safety check a warehouse runs before "
        "switching a table's storage."
    ),
    tags=("storage", "source", "agg"),
)
def storage_orc_roundtrip_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from coviddatapipeline_spark.sources import write_orc

    root = _versioned_scratch_root(sf_dir, prefix="cdp_orc_roundtrip_")
    path = os.path.join(root, "lineitem_orc")
    write_orc(
        t(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus",
            "l_extendedprice", "l_discount", "l_shipdate",
        ),
        path,
    )
    return build_orc_scan_agg(spark, path)


def build_orc_scan_agg(spark: SparkSession, orc_path: str) -> DataFrame:
    """The read-side plan of storage_orc_roundtrip_parity, factored so
    the pushdown plan test asserts on the same builder the entry runs."""
    from pyspark.sql import functions as F

    from coviddatapipeline_spark.sources import read_orc

    orc = read_orc(spark, orc_path)
    return (
        orc.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
