"""TPC-H completion sweep — the five topologies rounds 1-2 hadn't
covered, adapted to the reduced testdata schema (no l_shipmode /
l_commitdate / l_receiptdate / p_container / partsupp table):

- Q4  — EXISTS semi-join count by order priority (line predicate
  adapted from "committed late" to "has a returned line").
- Q9  — multi-way profit rollup by nation x year; supply cost is the
  same deterministic pure function of (partkey, suppkey) the derived
  partsupp in ``tpch_more`` uses, so both engines price identically.
- Q12 — conditional two-way counts per category; the shipmode
  category is replaced by a ship-delay bucket derived from
  datediff(l_shipdate, o_orderdate).
- Q14 — promo revenue share for one ship month.
- Q19 — disjunctive (brand, size-range, quantity-range) predicate
  over the part join — the OR-of-ANDs pushdown shape.

With these the registry covers every TPC-H query topology:
Q1 (``pricing_summary``) and Q2-Q22 here and in ``advanced`` /
``tpch_more`` (Q5 proper — region filter + local-supplier
cross-condition — is ``tpch_q5_local_supplier_volume`` below; the
flagship covers the same join graph unfiltered).

Scale posture: every query joins the SF-scaled fact to SF-scaled
``part``/``orders`` via equi-join left to AQE (no hard broadcast of a
growing dim — the round-1 broadcast policy), predicates sit directly on
scan columns so they push into the parquet reader, and money math
follows the q7/q8 lesson: double products cast to DECIMAL(18,4) before
SUM (associative-exact, partial-sum order can't move the rounded
total), cast to double only at output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.common import t
from coviddatapipeline_spark.queries.catalog import register


@register(
    "tpch_q4_priority_check",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: quarter of orders having at least one line "
        "matching a predicate (returned, standing in for the missing "
        "commit/receipt dates), counted per priority. The EXISTS "
        "becomes a LEFT SEMI join: the date filter prunes orders at "
        "the scan, the returnflag filter prunes lineitem at the scan, "
        "and the semi join keeps at most one match per order with no "
        "row multiplication. Both shuffles carry already-filtered "
        "inputs; the final agg groups five priority values."
    ),
    tags=("join", "semi", "agg", "tpch"),
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
        WITH profit AS (
            SELECT n_name AS nation,
                   CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS yr,
                   CAST(l_extendedprice * (1 - l_discount)
                        - (((l_partkey * 31 + l_suppkey * 17) % 9000 + 1000)
                           / 100.0) * l_quantity
                        AS DECIMAL(18, 4)) AS amount
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
        )
        SELECT nation, yr,
               round(CAST(sum(amount) AS DOUBLE), 2) AS sum_profit
        FROM profit
        GROUP BY nation, yr
        ORDER BY nation, yr DESC
    """,
    doc=(
        "TPC-H Q9 shape: profit (revenue minus supply cost) for 'red' "
        "parts, rolled up by supplier nation x order year. The testdata "
        "has no partsupp, so supply cost is the tpch_more._partsupp "
        "cents formula evaluated directly on (l_partkey, l_suppkey) — a "
        "pure integer function both engines compute bit-identically. "
        "Topology preserved: fact -> orders (SF-scaled equi-join, AQE), "
        "-> part with the name predicate pushed into the join's build "
        "side, -> supplier -> broadcast nation. Profit is summed as "
        "DECIMAL so partial-sum order can't move the rounded total."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    cost = (
        ((F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 9000 + 1000)
        / F.lit(100.0)
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - cost * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
            amount.alias("amount"),
        )
        .groupBy("nation", "yr")
        .agg(F.round(F.sum("amount").cast("double"), 2).alias("sum_profit"))
        .orderBy("nation", F.col("yr").desc())
    )


@register(
    "tpch_q12_shipdelay_priority",
    oracle="""
        WITH flat AS (
            SELECT CASE
                       WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                           THEN 'FAST'
                       WHEN date_diff('day', o_orderdate, l_shipdate) <= 120
                           THEN 'NORMAL'
                       ELSE 'SLOW'
                   END AS ship_bucket,
                   o_orderpriority
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
        )
        SELECT ship_bucket,
               count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM flat
        GROUP BY ship_bucket
        ORDER BY ship_bucket
    """,
    doc=(
        "TPC-H Q12 shape: conditional two-way counts per shipping "
        "category over one ship year. The schema has no l_shipmode, so "
        "the category is a ship-delay bucket (days between order and "
        "ship date: <=30 FAST, <=120 NORMAL, else SLOW — synthetic "
        "delays include negative values, which land in FAST). The "
        "ship-date range predicate pushes into the lineitem scan "
        "before the SF-scaled orders equi-join; the priority split is "
        "a map-side count-when, so the only full shuffle carries the "
        "filtered join, and the final agg reduces to three rows."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q12_shipdelay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST").when(delay <= 120, "NORMAL").otherwise("SLOW")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(bucket.alias("ship_bucket"), is_high.alias("hi"))
        .groupBy("ship_bucket")
        .agg(
            F.count(F.when(F.col("hi"), 1)).alias("high_line_count"),
            F.count(F.when(~F.col("hi"), 1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
        SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
                                           ELSE CAST(0 AS DECIMAL(18, 4)) END)
                             AS DOUBLE)
                     / CAST(sum(rev) AS DOUBLE), 4) AS promo_share_pct,
               count(*) AS n_lines
        FROM (
            SELECT p_type,
                   CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 4))
                       AS rev
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              AND l_shipdate <  TIMESTAMP '1997-10-01'
        ) f
    """,
    doc=(
        "TPC-H Q14 shape: share of one ship month's revenue coming "
        "from PROMO parts — a conditional-sum ratio over the "
        "lineitem x part equi-join. The one-month predicate pushes "
        "into the lineitem scan (it prunes ~97% of the fact before "
        "the join); part is SF-scaled so the join is left to AQE "
        "rather than hard-broadcast. Both the numerator and the "
        "denominator sum as DECIMAL and the division happens once, on "
        "doubles, at output — the ratio is deterministic across "
        "partial-sum orders."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero_dec = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("p_type"), rev.alias("rev"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
                        zero_dec
                    )
                ).cast("double")
                / F.sum("rev").cast("double"),
                4,
            ).alias("promo_share_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
        SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18, 4))) AS DOUBLE), 2)
                   AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing "
        "part attributes (brand, size) with line attributes (quantity) "
        "— the disjunctive-pushdown stress test. The disjunction can't "
        "split per-side completely, but its side-local weakenings can: "
        "Catalyst pushes brand IN (three values) + size <= 15 to the "
        "part scan and quantity <= 30 to the lineitem scan, so the "
        "join carries a pre-filtered fraction of both tables and the "
        "full disjunction evaluates post-join on survivors only. "
        "Revenue sums as DECIMAL, double at output."
    ),
    tags=("join", "agg", "filter", "tpch"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    cond = (
        ((brand == "Brand#11") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#22") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#13") & size.between(1, 15) & qty.between(20, 30))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
        SELECT n_name AS nation,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18, 4))) AS DOUBLE), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, nation
    """,
    doc=(
        "TPC-H Q5 proper (the flagship covers the Q5 join graph but "
        "not its distinctive constraint): revenue from LOCAL suppliers "
        "— customer and supplier must share a nation — within one "
        "region and order-date year. The c_nationkey = s_nationkey "
        "cross-condition rides the lineitem-supplier equi-join as a "
        "post-join filter; region prunes nation via a broadcast "
        "(5-row and 25-row constant dims), the date range prunes "
        "orders at the scan, and the revenue sum is DECIMAL-exact "
        "before the output cast. Six tables, one SF-scaled shuffle "
        "chain: lineitem-orders-customer on their natural keys."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lineitem = t(spark, sf_dir, "lineitem")
    supplier = t(spark, sf_dir, "supplier")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    region = F.broadcast(
        t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )
