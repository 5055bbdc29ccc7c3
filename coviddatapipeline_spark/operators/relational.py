"""Relational operator surface: joins, windows, set ops, rollup/cube,
pivot, top-k — the "for free from Spark" operators (SURVEY §2.5) that a
user of the reference would gain by switching, each with a DuckDB
oracle.

Scale notes (100 TB posture):
- dimension joins (region/nation/customer) are explicitly
  ``F.broadcast`` — no shuffle of the fact side;
- fact-fact joins shuffle on the join key and rely on AQE for skew;
- aggregations are expressed declaratively so Catalyst plans partial
  (map-side) aggregation before the shuffle;
- money sums are rounded to 2 decimals on BOTH sides so the
  order-of-summation ulp noise of distributed doubles can't flip the
  value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from coviddatapipeline_spark.queries.catalog import register
from coviddatapipeline_spark.operators.common import t
from coviddatapipeline_spark.operators.ranking import const_key

# ---------------------------------------------------------------------------
# Flagship: revenue per nation (scan + 3 joins + agg + sort in one plan).
# The reference's Q4/Q5 dashboard shape (sum-per-group, ordered) lifted to
# the multi-table testdata; cf. /root/reference/dags/ETL.py Metabase queries
# reconstructed in SURVEY §2.4.
# ---------------------------------------------------------------------------


def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    # fact⋈fact shuffles on the key; dims broadcast (no shuffle of lineitem
    # for the customer/nation sides once orders is reduced).
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(nation.n_name.alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


register(
    "flagship_revenue_by_nation",
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
    doc="Flagship: lineitem⋈orders⋈customer⋈nation revenue rollup.",
    tags=("join", "agg", "flagship"),
)(flagship_revenue_by_nation)


@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity), 4)                                        AS avg_qty,
               round(avg(l_extendedprice), 4)                                   AS avg_price,
               round(avg(l_discount), 4)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: wide multi-aggregate scan; one shuffle, partial aggs map-side.",
    tags=("agg",),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00"))
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "join_broadcast_region_rollup",
    oracle="""
        SELECT r_name AS region, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
    """,
    doc="Snowflake dim chain with explicit broadcast of both dims — zero fact shuffle pre-agg.",
    tags=("join",),
)
def join_broadcast_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(region.r_name.alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("region")
    )


@register(
    "join_left_semi_customers_with_orders",
    oracle="""
        SELECT count(*) AS n
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="EXISTS as left-semi join: never materializes the right side's payload columns.",
    tags=("join",),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count("*").alias("n"))
    )


@register(
    "join_left_anti_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    doc="NOT EXISTS as left-anti join.",
    tags=("join",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_left_outer_order_counts",
    oracle="""
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
    """,
    doc="Left outer join preserving customers with zero orders (count of NULL key = 0).",
    tags=("join",),
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "window_topk_orders_per_segment",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice, rn
        FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        WHERE rn <= 5
        ORDER BY c_mktsegment, rn
    """,
    doc="Top-K per group via row_number window; deterministic tiebreak on the key.",
    tags=("window",),
)
def window_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_running_revenue_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_total
        FROM orders
        WHERE o_custkey < 100
        ORDER BY o_custkey, o_orderkey
    """,
    doc="Running total per key — ordered window with explicit ROWS frame.",
    tags=("window",),
)
def window_running_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_lag_order_gap_days",
    oracle="""
        -- NULLS FIRST pins the window's lag chain to Spark's default
        -- ASC ordering (DuckDB defaults NULLS LAST): a NULL-dated
        -- poison order otherwise sits at the opposite end of its
        -- customer's order history and shifts every gap after it.
        -- No-op on clean data (round-8 poison-parity convergence).
        SELECT o_custkey, o_orderkey,
               coalesce(date_diff('day',
                         lag(o_orderdate) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate NULLS FIRST,
                                      o_orderkey NULLS FIRST),
                         o_orderdate), -1) AS gap_days
        FROM orders
        WHERE o_custkey < 50
        ORDER BY o_custkey, o_orderkey
    """,
    doc=(
        "lag() across rows per key: inter-order gap in days. A customer's "
        "first order has no predecessor; that NULL is encoded as -1 so the "
        "output column stays integer and null-free for cross-engine "
        "hashing (a NULL in a DuckDB integer column turns the whole "
        "pandas column float64, which hashes 0 as '0.0' against Spark's 0)."
    ),
    tags=("window",),
)
def window_lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.coalesce(
                F.datediff(F.col("o_orderdate"), prev), F.lit(-1)
            ).alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "set_ops_nation_presence",
    oracle="""
        WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
             s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        SELECT 'union' AS op, count(*) AS n FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
        UNION ALL
        SELECT 'intersect' AS op, count(*) AS n FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        UNION ALL
        SELECT 'except' AS op, count(*) AS n FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        ORDER BY op
    """,
    doc="UNION / INTERSECT / EXCEPT over customer vs supplier nations.",
    tags=("setop",),
)
def set_ops_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    rows = [
        c.union(s).distinct().agg(F.lit("union").alias("op"), F.count("*").alias("n")),
        c.intersect(s).agg(F.lit("intersect").alias("op"), F.count("*").alias("n")),
        c.exceptAll(s).distinct().agg(F.lit("except").alias("op"), F.count("*").alias("n")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("op")


@register(
    "rollup_sales_by_status_priority",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
    """,
    doc="ROLLUP hierarchy totals; NULL grouping slots coalesced to 'ALL' for a stable hash.",
    tags=("agg",),
)
def rollup_sales_by_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@register(
    "cube_counts_status_priority",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
    """,
    doc="CUBE over two dimensions.",
    tags=("agg",),
)
def cube_counts_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
        .orderBy("status", "priority")
    )


@register(
    "pivot_priority_by_status",
    oracle="""
        SELECT o_orderpriority AS priority,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY priority
    """,
    doc="Pivot (wide conditional aggregation); fixed pivot values so no extra pass.",
    tags=("agg",),
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "priority",
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
        .orderBy("priority")
    )


@register(
    "distinct_customers_per_status",
    oracle="""
        SELECT o_orderstatus AS status, count(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY o_orderstatus ORDER BY status
    """,
    doc="Exact distinct aggregation (expands to two-phase agg in Spark).",
    tags=("agg",),
)
def distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("status")
    )


@register(
    "filter_pushdown_part_scan",
    oracle="""
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_size >= 30 AND p_type = 'ECONOMY'
        ORDER BY p_partkey
    """,
    doc="Conjunctive predicate pushed to the parquet scan (PushedFilters).",
    tags=("scan",),
)
def filter_pushdown_part_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return (
        part.filter((F.col("p_size") >= 30) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    )


@register(
    "setop_yearly_customer_retention",
    oracle="""
        WITH y96 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
              AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        ),
        y97 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
              AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        ),
        retained AS (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97),
        churned  AS (SELECT o_custkey FROM y96 EXCEPT   SELECT o_custkey FROM y97),
        acquired AS (SELECT o_custkey FROM y97 EXCEPT   SELECT o_custkey FROM y96)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM y96) AS active_1996,
               (SELECT CAST(count(*) AS BIGINT) FROM y97) AS active_1997,
               (SELECT CAST(count(*) AS BIGINT) FROM retained) AS retained,
               (SELECT CAST(count(*) AS BIGINT) FROM churned) AS churned,
               (SELECT CAST(count(*) AS BIGINT) FROM acquired) AS acquired,
               CAST((SELECT count(*) FROM retained) * 10000
                    // (SELECT count(*) FROM y96) AS BIGINT) AS retention_e4
    """,
    doc=(
        "Year-over-year customer retention via relational set ops — "
        "the INTERSECT / EXCEPT surface the registry was missing as a "
        "first-class entry: 1996 actives intersect 1997 actives = "
        "retained, each EXCEPT = churned/acquired, plus the e4 "
        "retention rate. Spark expresses the same algebra with "
        "intersect()/exceptAll-free distinct set ops, which Catalyst "
        "plans as aggregates over a union with bitmasks or "
        "left-semi/anti hash joins — either way shuffle-partitioned "
        "on the key, no materialized id lists. One row out; the "
        "distinct key sets are the only state at any scale."
    ),
    tags=("relational", "setop", "agg"),
)
def setop_yearly_customer_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )

    def actives(y: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("d") >= F.lit(f"{y}-01-01").cast("date"))
                & (F.col("d") < F.lit(f"{y + 1}-01-01").cast("date"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = actives(1996), actives(1997)
    retained = y96.intersect(y97)
    churned = y96.exceptAll(retained)
    acquired = y97.exceptAll(retained)
    counts = (
        y96.agg(F.count("*").alias("active_1996"))
        .crossJoin(y97.agg(F.count("*").alias("active_1997")))
        .crossJoin(retained.agg(F.count("*").alias("retained")))
        .crossJoin(churned.agg(F.count("*").alias("churned")))
        .crossJoin(acquired.agg(F.count("*").alias("acquired")))
    )
    return counts.select(
        F.col("active_1996").cast("long").alias("active_1996"),
        F.col("active_1997").cast("long").alias("active_1997"),
        F.col("retained").cast("long").alias("retained"),
        F.col("churned").cast("long").alias("churned"),
        F.col("acquired").cast("long").alias("acquired"),
        F.expr("CAST(retained * 10000 DIV active_1996 AS BIGINT)").alias(
            "retention_e4"
        ),
    )


@register(
    "sla_ship_latency_by_priority",
    oracle="""
        WITH per_order AS (
            SELECT o.o_orderkey, o.o_orderpriority,
                   date_diff('day', CAST(o.o_orderdate AS DATE),
                             max(CAST(l.l_shipdate AS DATE))) AS days
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END) * 10000
                    // count(*) AS BIGINT) AS within_30_e4,
               CAST(sum(CASE WHEN days <= 60 THEN 1 ELSE 0 END) * 10000
                    // count(*) AS BIGINT) AS within_60_e4,
               CAST(sum(CASE WHEN days <= 90 THEN 1 ELSE 0 END) * 10000
                    // count(*) AS BIGINT) AS within_90_e4,
               CAST(max(days) AS BIGINT) AS max_days
        FROM per_order
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc=(
        "Fulfillment SLA attainment by order priority: days from order "
        "to LAST shipment per order (the customer-visible completion "
        "time), then the e4 fraction meeting 30/60/90-day targets per "
        "priority — the table an ops review reads, and the check that "
        "priority classes actually predict service (inverted "
        "attainment flags a broken fulfillment queue). One fact-fact "
        "equi-join, one per-order max (combinable), one 5-row "
        "priority aggregate; exact integer date math and division "
        "throughout."
    ),
    tags=("relational", "join", "agg"),
)
def sla_ship_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("od")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "od")
        .agg(F.max("sd").alias("last_ship"))
        .select(
            "o_orderpriority", F.datediff("last_ship", "od").alias("days")
        )
    )
    hit = lambda d: F.sum(F.when(F.col("days") <= d, 1).otherwise(0))  # noqa: E731
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            hit(30).alias("h30"),
            hit(60).alias("h60"),
            hit(90).alias("h90"),
            F.max("days").cast("long").alias("max_days"),
        )
        .select(
            "o_orderpriority",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.expr("CAST(h30 * 10000 DIV n_orders AS BIGINT)").alias("within_30_e4"),
            F.expr("CAST(h60 * 10000 DIV n_orders AS BIGINT)").alias("within_60_e4"),
            F.expr("CAST(h90 * 10000 DIV n_orders AS BIGINT)").alias("within_90_e4"),
            "max_days",
        )
        .orderBy("o_orderpriority")
    )


TOPK_GLOBAL = 100
TOPK_PER_GROUP = 3


@register(
    "topk_global_with_per_group_cap",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY round(o_totalprice, 2) DESC,
                                      o_orderkey) AS gr
            FROM orders
        ),
        capped AS (SELECT * FROM per_cust WHERE gr <= {TOPK_PER_GROUP}),
        ranked AS (
            SELECT o_orderkey, o_custkey,
                   round(o_totalprice, 2) AS price,
                   CAST(gr AS BIGINT) AS rank_in_customer,
                   row_number() OVER (ORDER BY round(o_totalprice, 2) DESC,
                                      o_orderkey) AS r
            FROM capped
        )
        SELECT CAST(r AS BIGINT) AS rank, o_orderkey, o_custkey, price,
               rank_in_customer
        FROM ranked WHERE r <= {TOPK_GLOBAL}
        ORDER BY rank
    """,
    doc=(
        f"Global top-{TOPK_GLOBAL} orders by value with AT MOST "
        f"{TOPK_PER_GROUP} per customer — the diversity-constrained "
        f"leaderboard (same shape as 'top docs per query with a "
        f"per-domain cap' in search): a per-customer window prunes to "
        f"{TOPK_PER_GROUP} rows FIRST, so the global ranking sees at "
        f"most {TOPK_PER_GROUP} x |customers| rows and the final "
        f"window is over the pruned set, never the fact table — the "
        f"two-stage prune that makes constrained top-k viable at any "
        f"scale. Prices rank on round(x, 2) with an orderkey "
        f"tie-break, the repo's cross-engine float-ordering "
        f"convention."
    ),
    tags=("relational", "window", "topk"),
)
def topk_global_with_per_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price")
    )
    per_cust = orders.withColumn(
        "gr",
        F.row_number().over(
            W.partitionBy("o_custkey").orderBy(F.col("price").desc(), "o_orderkey")
        ),
    ).filter(F.col("gr") <= TOPK_PER_GROUP)
    # distributed TakeOrdered picks the global top-K (per_cust is
    # O(customers) rows — data-proportional, so a global ranking window
    # over it would funnel one partition); the row_number then runs
    # over <= TOPK_GLOBAL rows behind a constant-key window.
    ranked = (
        per_cust.orderBy(F.col("price").desc(), "o_orderkey")
        .limit(TOPK_GLOBAL)
        .withColumn(
            "r",
            F.row_number().over(
                W.partitionBy(const_key("o_orderkey")).orderBy(
                    F.col("price").desc(), "o_orderkey"
                )
            ),
        )
    )
    return ranked.select(
        F.col("r").cast("long").alias("rank"),
        "o_orderkey",
        "o_custkey",
        "price",
        F.col("gr").cast("long").alias("rank_in_customer"),
    ).orderBy("rank")
