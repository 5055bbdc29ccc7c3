"""Graph analytics over relational data: fixed-iteration PageRank on
the customer<->supplier interaction graph, and the per-user event-type
Markov transition matrix. Complements the connected-components pair in
``operators/dedup.py`` (min-label propagation + alternating
large/small-star) with the other classic iterative-graph shape and a
sequence-model aggregation.

Scale posture: PageRank is the canonical "iterate a join+groupBy to a
fixpoint" workload. Each round is one shuffle on dst (map-side
combinable sum of contributions); the rank vector is node-sized (much
smaller than the edge list), the edge list is computed once and
localCheckpoint'd (the dedup.py CC lesson: without eager plan
truncation the logical plan doubles per round and the driver, not the
cluster, becomes the bottleneck). Iteration count is fixed (3), so the
DuckDB oracle can unroll the same three rounds as plain CTEs and match
bit-for-bit modulo the round(,6) output contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.common import t
from coviddatapipeline_spark.queries.catalog import register

PR_DAMPING = 0.85
PR_ITERS = 3
PR_TOPK = 25

# One PageRank round in DuckDB: contributions along edges + teleport.
# Bidirectional edge construction guarantees every node has outdeg >= 1,
# so there is no dangling mass and the plain inner-join update is exact.
_PR_ROUND = """
        r{next} AS (
            SELECT e.dst AS node,
                   {tele} + {d} * sum(r.rank / o.outdeg) AS rank
            FROM edges e
            JOIN r{cur} r ON r.node = e.src
            JOIN outdeg o ON o.node = e.src
            GROUP BY e.dst
        )"""


def _pr_oracle() -> str:
    rounds = ",".join(
        _PR_ROUND.format(
            next=i + 1, cur=i, d=PR_DAMPING, tele=f"(1 - {PR_DAMPING}) / max(n.n)"
        ).replace("FROM edges e", "FROM edges e CROSS JOIN n")
        for i in range(PR_ITERS)
    )
    return f"""
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
            SELECT 'C' || c AS src, 'S' || s AS dst FROM pairs
            UNION ALL
            SELECT 'S' || s AS src, 'C' || c AS dst FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        n AS (SELECT count(*) AS n FROM nodes),
        outdeg AS (SELECT src AS node, count(*) AS outdeg
                   FROM edges GROUP BY src),
        r0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes CROSS JOIN n),
        {rounds}
        SELECT node, round(rank * n.n, 6) AS scaled_rank
        FROM r{PR_ITERS} CROSS JOIN n
        ORDER BY round(rank * n.n, 6) DESC, node
        LIMIT {PR_TOPK}
    """


@register(
    "pagerank_customer_supplier",
    oracle=_pr_oracle(),
    doc=(
        f"PageRank ({PR_ITERS} fixed iterations, d={PR_DAMPING}) over "
        "the bidirectional customer<->supplier graph derived from "
        "lineitem x orders (edge = 'customer bought from supplier'). "
        "Top-25 nodes by rank scaled to mean 1.0. Each iteration is "
        "one shuffle: contributions grouped by destination with "
        "map-side partial sums; the edge list and out-degrees are "
        "computed once and localCheckpoint'd so the logical plan stays "
        "O(1) per round instead of doubling (the dedup-CC lesson); the "
        "rank vector is node-sized. Bidirectional edges make every "
        "node's out-degree >= 1, eliminating dangling-mass handling, "
        "and let the DuckDB oracle unroll the identical three rounds "
        "as CTEs. Ranking key is round(,6) so sub-ulp float-sum "
        "ordering differences between engines cannot flip the top-k."
    ),
    tags=("graph", "iterative", "agg"),
)
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # Rank-carrying edge table: contribution denominator attached once,
    # reused every round (join by src is the same shuffle each time).
    contrib_edges = edges.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    # Graph-size scalar rides the rank vector as a constant column (the
    # crossJoin(broadcast(agg)) house pattern — no driver round-trip).
    n_df = F.broadcast(nodes.agg(F.count("*").alias("n")))
    ranks = nodes.crossJoin(n_df).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank"), "n"
    )
    for _ in range(PR_ITERS):
        ranks = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.node)
            .groupBy("dst")
            .agg(
                (
                    (1.0 - PR_DAMPING) / F.max("n")
                    + PR_DAMPING * F.sum(F.col("rank") / F.col("outdeg"))
                ).alias("rank"),
                F.max("n").alias("n"),
            )
            .select(F.col("dst").alias("node"), "rank", "n")
            .localCheckpoint(eager=True)
        )
    return (
        ranks.select(
            "node", F.round(F.col("rank") * F.col("n"), 6).alias("scaled_rank")
        )
        .orderBy(F.desc("scaled_rank"), "node")
        .limit(PR_TOPK)
    )


@register(
    "events_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ),
        c AS (
            SELECT prev, event_type AS next, count(*) AS n
            FROM seq WHERE prev IS NOT NULL
            GROUP BY prev, next
        )
        SELECT prev, next, n,
               round(n * 1.0 / sum(n) OVER (PARTITION BY prev), 4) AS prob
        FROM c
        ORDER BY prev, next
    """,
    doc=(
        "First-order Markov transition matrix of user event sequences: "
        "P(next event type | previous event type), estimated from each "
        "user's time-ordered stream. The lag window partitions by "
        "user_id (millions of small partitions at scale, never a "
        "global sort); the transition counts collapse to an "
        "|event_types|^2-sized matrix, so the row-normalizing window "
        "runs over a constant-sized table. The session-behavior model "
        "used for funnel anomaly detection and synthetic-sequence "
        "generation."
    ),
    tags=("events", "window", "agg"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev", F.lag("event_type").over(w))
    c = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count("*").alias("n"))
    )
    wn = Window.partitionBy("prev")
    return (
        c.withColumn("prob", F.round(F.col("n") / F.sum("n").over(wn), 4))
        .select("prev", "next", "n", "prob")
        .orderBy("prev", "next")
    )
