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

import pandas as pd  # module-level so pandas_udf type hints resolve

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.common import t
from coviddatapipeline_spark.queries.catalog import register
from coviddatapipeline_spark.operators.ranking import const_key

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


# --- Triangle counting on the supplier co-occurrence graph -----------

# Two suppliers are adjacent when they co-appear in at least this many
# distinct orders. At sf0.01 the mean pair co-occurs ~18 times, so the
# threshold thins the graph without emptying it at sf0.001.
TRI_MIN_COOCCUR = 2

# Dense-graph fast-path gate (OPTIMIZATION_r13 §3, guide §1.2/§3.1):
# when the EXACT node count (a driver-side count over the checkpointed
# edge frame's degree table — a measured value, never an estimate, so
# the gate cannot misfire the way size-estimate gates do) is at most
# this, triangles are counted by bitset-intersection popcounts instead
# of the wedge-close join: each node's id-ordered out-neighborhood is
# packed into an n-bit row, the n x n/8 matrix (<= 32 MiB at the cap —
# broadcast-join-relation scale, and the ONLY driver-side payload; the
# edge list itself never leaves the executors) ships once per executor
# as a SparkContext broadcast, and a map-only Arrow kernel popcounts
# W[u] & W[v] per edge. Work is m*n/64 word-ops instead of
# sum(out-deg^2) join rows — on the 69%-dense sf0.1 test graph that is
# 5.5M word-ANDs instead of a 76M-row wedge join (measured 9.5 s for
# the close alone). Above the cap (any real 100 TB graph: n ~ 10^9)
# the published degree-ordered wedge-close below runs unchanged —
# exactly the broadcast-vs-shuffle join-strategy selection Spark itself
# performs, driven here by an exact count. Both paths produce the same
# exact integer (every triangle counted once at its minimum vertex /
# minimum-(degree,id) vertex respectively); pinned equal by
# tests/test_optimization_r13.py::test_triangle_dense_path_equals_wedge_close.
TRI_DENSE_MAX_NODES = 16384


def _tri_count_wedge_close(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """1-row n_triangles frame via the degree-ordered wedge-close —
    the published hub-proof O(m^1.5) shape, the path every graph above
    TRI_DENSE_MAX_NODES takes (see the gate comment)."""
    # Orient every edge low-(d, id) -> high-(d, id); node count is
    # dimension-sized, so the degree joins broadcast.
    ed = edges.join(
        F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("du"))),
        "u",
    ).join(
        F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))),
        "v",
    )
    low_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    e_or = ed.select(
        F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        # the head's (degree, id) rank travels with the edge so wedges
        # can be emitted ONCE, in orientation order, without a re-join
        F.when(low_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=True)  # reused 3x in the wedge-close
    e1, e2, e3 = e_or.alias("e1"), e_or.alias("e2"), e_or.alias("e3")
    # Wedges at the anchor a, each unordered (b, c) pair exactly once
    # with (b, c) in (degree, id) order — the closing edge, if the
    # triangle exists, is then oriented b -> c by construction, so one
    # equi-join closes it and each triangle counts exactly once (at its
    # unique minimum-(degree, id) vertex). C(out-deg, 2) wedges total.
    wedge_ordered = (F.col("e1.db") < F.col("e2.db")) | (
        (F.col("e1.db") == F.col("e2.db")) & (F.col("e1.b") < F.col("e2.b"))
    )
    return (
        e1.join(e2, F.col("e2.a") == F.col("e1.a"))
        .filter(wedge_ordered)
        .join(e3, (F.col("e3.a") == F.col("e1.b")) & (F.col("e3.b") == F.col("e2.b")))
        .agg(F.count("*").alias("n_triangles"))
    )


def _tri_count_dense(
    spark: SparkSession, edges: DataFrame, deg: DataFrame, n_nodes: int
) -> DataFrame:
    """1-row n_triangles frame via bitset-intersection popcounts — the
    small-graph fast path behind the exact-count TRI_DENSE_MAX_NODES
    gate (see the gate comment for the memory math and why this is
    scale-SAFE only because the wedge-close handles everything above
    the cap).

    The edge list is already id-oriented (u < v), which is an acyclic
    orientation, so counting |N+(u) & N+(v)| per edge counts each
    triangle x < y < z exactly once (at edge (x, y), with z in both
    out-neighborhoods) — the same exact integer the wedge-close
    produces at the minimum-(degree, id) vertex. Degree skew is
    irrelevant here: work per edge is a constant n/64 word-ANDs.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.window import Window

    # Dense 0..n-1 ids. The 1-partition window is over the n-row degree
    # table (gate-bounded, <= 16384 rows) — dimension-sized, like the
    # Lloyd centroid frames.
    idx = deg.select(
        "node", (F.row_number().over(Window.orderBy("node")) - 1).alias("i")
    )
    eidx = edges.join(
        F.broadcast(idx.select(F.col("node").alias("u"), F.col("i").alias("ui"))),
        "u",
    ).join(
        F.broadcast(idx.select(F.col("node").alias("v"), F.col("i").alias("vi"))),
        "v",
    ).select("ui", "vi")
    nw = max((n_nodes + 63) // 64, 1)

    @F.pandas_udf("binary")
    def _pack(vs: pd.Series) -> pd.Series:
        # one n-bit out-neighborhood row per anchor, packed executor-
        # side. A Series-batched UDF over the collect_list aggregate
        # sees ALL n anchors in ~1 Arrow batch (a per-group
        # applyInPandas paid ~1 ms of pandas-frame overhead per anchor
        # — measured 1.10 s vs 0.45 s for this form at sf0.1).
        out = []
        for v in vs:
            vi = np.asarray(v, np.int64)
            words = np.zeros(nw, np.uint64)
            np.bitwise_or.at(
                words, vi >> 6, np.uint64(1) << (vi & 63).astype(np.uint64)
            )
            out.append(words.tobytes())
        return pd.Series(out)

    # Driver-side state is EXACTLY the n x n/64-word bitset matrix
    # (<= 32 MiB at the gate cap — a broadcast-join build relation's
    # scale, and the gate makes the bound a hard one); the m-row edge
    # list itself never leaves the executors.
    adj_rows = (
        eidx.groupBy("ui")
        .agg(F.collect_list("vi").alias("vs"))
        .select("ui", _pack("vs").alias("w"))
        .collect()
    )
    W = np.zeros((n_nodes, nw), np.uint64)
    for r in adj_rows:
        W[r["ui"]] = np.frombuffer(r["w"], np.uint64)
    bc = spark.sparkContext.broadcast(W.tobytes())
    pop8 = np.array([bin(x).count("1") for x in range(256)], np.int64)

    def _cnt(batches):
        Wx = np.frombuffer(bc.value, np.uint64).reshape(n_nodes, nw)
        for pdf in batches:
            a = pdf["ui"].to_numpy(np.int64)
            b = pdf["vi"].to_numpy(np.int64)
            inter = Wx[a] & Wx[b]
            yield pd.DataFrame({"c": [int(pop8[inter.view(np.uint8)].sum())]})

    return eidx.mapInPandas(_cnt, "c long").agg(
        # sum() of zero partial rows is NULL where the wedge-close's
        # count(*) is 0 — coalesce keeps the empty-graph row identical
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_triangles")
    )


@register(
    "graph_triangle_stats",
    oracle=f"""
        WITH pl AS (
            SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
        ),
        edges AS (
            SELECT a.s AS u, b.s AS v
            FROM pl a JOIN pl b ON a.o = b.o AND a.s < b.s
            GROUP BY a.s, b.s
            HAVING count(*) >= {TRI_MIN_COOCCUR}
        ),
        deg AS (
            SELECT node, count(*) AS d FROM (
                SELECT u AS node FROM edges
                UNION ALL SELECT v FROM edges
            ) GROUP BY node
        ),
        tri AS (
            SELECT count(*) AS n_triangles
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        wedge AS (SELECT sum(d * (d - 1) / 2) AS n_wedges,
                         count(*) AS n_nodes FROM deg)
        SELECT w.n_nodes,
               (SELECT count(*) FROM edges) AS n_edges,
               t.n_triangles,
               round(3.0 * t.n_triangles / w.n_wedges, 4)
                   AS global_clustering
        FROM tri t CROSS JOIN wedge w
    """,
    doc=(
        "Triangle count and global clustering coefficient of the "
        "supplier co-occurrence graph (edge = two suppliers sharing >= "
        f"{TRI_MIN_COOCCUR} distinct orders). Edge construction is one "
        "groupBy(order) + per-order sorted-set pair explode — per-order "
        "fanout is schema-bounded (TPC-H caps line items per order at "
        "7), so the pair explosion is O(rows), not quadratic. The "
        "triangle count picks its strategy from the EXACT node count "
        "(guide-style deliberate strategy selection): graphs at most "
        f"TRI_DENSE_MAX_NODES = {TRI_DENSE_MAX_NODES} nodes take the "
        "bitset fast path (id-ordered out-neighborhoods packed to an "
        "n x n/8-byte matrix, <= 32 MiB at the cap, broadcast once; a "
        "map-only Arrow kernel popcounts W[u] & W[v] per edge — "
        "m*n/64 word-ops, degree-skew-immune); anything larger takes "
        "the DEGREE-ORDERED wedge-close (the standard hub-proof "
        "orientation): every edge directed from its lower-(degree, id) "
        "endpoint to the higher makes the edge list a DAG whose max "
        "out-degree is O(sqrt(m)); wedges e1(a,b) x e2(a,c) are built "
        "only at the LOW-degree anchor and closed by the oriented edge "
        "(b -> c), bounding the join by sum(out-deg^2) = O(m^1.5) no "
        "matter how skewed the co-occurrence hubs are. Both paths "
        "count every triangle exactly once (at its minimum-id / "
        "minimum-(degree, id) vertex), so the oracle's plain "
        "id-oriented 3-join reaches the identical count. Clustering = "
        "3 x triangles / wedges."
    ),
    tags=("graph", "join", "agg"),
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Edge construction (OPTIMIZATION_r13 §3a, guide §2.4): one
    # groupBy(order) + per-order pair explode replaces the former
    # (order, supplier) DISTINCT + self-equi-join + groupBy chain —
    # collect_set dedups (order, supplier) inside the same exchange the
    # distinct paid, pairs are generated map-side from the sorted set
    # (u < v by construction, each unordered pair once per order), and
    # count(*) per (u, v) is the identical distinct-order co-occurrence
    # count. Per-order fanout is schema-bounded (TPC-H caps line items
    # per order at 7, so <= C(7,2) = 21 pairs per order), making the
    # explode O(rows). 3 exchanges + a 594k-row self-join -> 2
    # exchanges, measured 1.9 s -> 0.9 s at sf0.1.
    pairs = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("s")).alias("ss"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
    )
    edges = (
        pairs.groupBy("u", "v")
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= TRI_MIN_COOCCUR)
        .select("u", "v")
        .localCheckpoint(eager=True)  # reused 4x below; compute once
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # Exact-count strategy gate — see TRI_DENSE_MAX_NODES above. The
    # count job runs over the checkpointed edges' small degree
    # aggregate (n rows), negligible against either counting path.
    n_nodes_v = deg.count()
    if n_nodes_v <= TRI_DENSE_MAX_NODES:
        tri = _tri_count_dense(spark, edges, deg, n_nodes_v)
    else:
        tri = _tri_count_wedge_close(edges, deg)
    wedge = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("n_wedges"),
        F.count("*").alias("n_nodes"),
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(wedge))
        .crossJoin(F.broadcast(n_edges))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 4).alias(
                "global_clustering"
            ),
        )
    )


@register(
    "graph_degree_histogram",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        deg AS (SELECT c AS node, count(*) AS d FROM pairs GROUP BY c),
        buckets AS (
            SELECT CAST(length(printf('%b', d)) - 1 AS INT) AS log2_bucket,
                   count(*) AS n_nodes, min(d) AS min_deg, max(d) AS max_deg
            FROM deg GROUP BY 1
        )
        SELECT log2_bucket, n_nodes, min_deg, max_deg
        FROM buckets ORDER BY log2_bucket
    """,
    doc=(
        "Log2-bucketed degree distribution of the customer side of the "
        "customer-supplier bipartite graph (degree = distinct suppliers "
        "a customer bought from). Two map-side-combinable shuffles "
        "(distinct pairs, then per-node count) and a bucket rollup "
        "whose cardinality is log(max_degree) — the shape used to "
        "detect hub skew before choosing a join strategy: a heavy top "
        "bucket is the signal to salt or isolate hot keys."
    ),
    tags=("graph", "agg"),
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = pairs.groupBy("c").agg(F.count("*").alias("d"))
    # Bucket = bit_length(d) - 1, computed with EXACT integer math on
    # both engines (Spark: length of the binary string; DuckDB:
    # length(printf('%b', d)) - 1). floor(ln(d)/ln(2)) sits exactly on
    # an integer boundary for power-of-two degrees, where a 1-ulp libm
    # difference between JVM Math.log and DuckDB ln would flip the
    # bucket — the same cross-engine float hazard the LSH operators
    # avoid with integer quantization.
    return (
        deg.groupBy(
            (F.length(F.expr("bin(d)")) - F.lit(1))
            .cast("int")
            .alias("log2_bucket")
        )
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
        )
        .orderBy("log2_bucket")
    )


# --- Market-basket association mining --------------------------------

MB_MIN_SUPPORT = 3
MB_TOP_K = 20


@register(
    "orders_market_basket_lift",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        n AS (SELECT count(DISTINCT o) AS n_orders FROM items),
        freq AS (SELECT p, count(*) AS cp FROM items GROUP BY p),
        pairs AS (
            SELECT a.p AS pa, b.p AS pb, count(*) AS co
            FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p
            HAVING count(*) >= {MB_MIN_SUPPORT}
        )
        SELECT pa, pb, co,
               round(co * 1.0 * n.n_orders / (fa.cp * fb.cp), 6) AS lift,
               round(co * 1.0 / fa.cp, 6) AS confidence_a_to_b
        FROM pairs
        JOIN freq fa ON fa.p = pairs.pa
        JOIN freq fb ON fb.p = pairs.pb
        CROSS JOIN n
        ORDER BY round(co * 1.0 * n.n_orders / (fa.cp * fb.cp), 6) DESC,
                 pa, pb
        LIMIT {MB_TOP_K}
    """,
    doc=(
        "Market-basket association rules over order contents: for part "
        f"pairs co-bought in >= {MB_MIN_SUPPORT} orders, lift = "
        "P(a,b)/(P(a)P(b)) and directed confidence, top-"
        f"{MB_TOP_K} by lift. Pair generation is the order-key self-"
        "join of DISTINCT (order, part) — fanout per order is "
        "schema-bounded (<= C(7,2) pairs), so candidate volume is "
        "O(orders), and the support filter prunes before the "
        "frequency joins. Item frequencies join back on the part key "
        "(at 100 TB the head of the frequency table would broadcast); "
        "the basket-count scalar rides as crossJoin(broadcast(agg)). "
        "Deterministic top-k via the round(,6) lift key with pair "
        "tie-break."
    ),
    tags=("graph", "join", "agg", "analytics"),
)
def orders_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)  # reused 3x: pairs, freq, basket count
    )
    # count("o"), not count("*"): a NULL orderkey is not a basket, and
    # the oracle's count(DISTINCT o) skips NULL — count(*) over the
    # distinct frame counted the NULL row and inflated every lift
    # denominator by one on poison corpora (round-9 convergence;
    # identical on clean data where orderkeys are non-NULL)
    n = F.broadcast(items.select("o").distinct().agg(F.count("o").alias("n_orders")))
    freq = items.groupBy("p").agg(F.count("*").alias("cp"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= MB_MIN_SUPPORT)
    )
    fa = freq.select(F.col("p").alias("pa"), F.col("cp").alias("ca"))
    fb = freq.select(F.col("p").alias("pb"), F.col("cp").alias("cb"))
    lift = F.round(F.col("co") * F.col("n_orders") / (F.col("ca") * F.col("cb")), 6)
    return (
        pairs.join(fa, "pa")
        .join(fb, "pb")
        .crossJoin(n)
        .select(
            "pa",
            "pb",
            "co",
            lift.alias("lift"),
            F.round(F.col("co") / F.col("ca"), 6).alias("confidence_a_to_b"),
        )
        .orderBy(F.col("lift").desc(), "pa", "pb")
        .limit(MB_TOP_K)
    )


# ---------------------------------------------------------------------------
# Bipartite projection: co-purchase affinity with lift
# ---------------------------------------------------------------------------

AFFINITY_TOP = 20


@register(
    "graph_copurchase_affinity",
    oracle=f"""
        WITH cp AS (
            SELECT DISTINCT o.o_custkey, l.l_partkey
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        nc AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
               FROM orders),
        deg AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_buyers
            FROM cp GROUP BY l_partkey
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS support
            FROM cp a JOIN cp b
              ON a.o_custkey = b.o_custkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT p.part_a, p.part_b, p.support,
                   CAST(p.support * n.n_cust * 10000
                        // (da.n_buyers * db.n_buyers) AS BIGINT) AS lift_e4,
                   row_number() OVER (ORDER BY p.support DESC,
                                      p.part_a, p.part_b) AS rank
            FROM pairs p
            JOIN deg da ON p.part_a = da.l_partkey
            JOIN deg db ON p.part_b = db.l_partkey
            CROSS JOIN nc n
        )
        SELECT CAST(rank AS BIGINT) AS rank, part_a, part_b, support, lift_e4
        FROM scored WHERE rank <= {AFFINITY_TOP}
        ORDER BY rank
    """,
    doc=(
        f"Market-basket affinity by bipartite projection (Agrawal "
        f"association-rule lineage, public): the customer-part "
        f"purchase graph projects onto part pairs sharing a buyer — "
        f"support = co-buying customers (the DISTINCT (customer, "
        f"part) reduction first, so a customer buying a part ten "
        f"times counts once), lift = support * N / (buyers_a * "
        f"buyers_b) at e4, the measure that separates 'popular with "
        f"everything' from genuine affinity. Top-{AFFINITY_TOP} by "
        f"support. The projection self-join runs on the customer "
        f"equi-key — per-customer quadratic, globally "
        f"sum-of-basket-squares, the same bounded-block shape as the "
        f"LSH band join (a viral basket is the skew case; the salted "
        f"band helper applies unchanged). Degrees join back "
        f"broadcast-sized; the ranking window sees only the pair "
        f"aggregate."
    ),
    tags=("graph", "join", "agg"),
)
def graph_copurchase_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    nc = orders.agg(F.countDistinct("o_custkey").alias("n_cust"))
    deg = cp.groupBy("l_partkey").agg(F.count("*").alias("n_buyers"))
    a = cp.select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("part_a"))
    b = cp.select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ck")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
    )
    scored = (
        pairs.join(
            F.broadcast(deg.select(F.col("l_partkey").alias("part_a"),
                                   F.col("n_buyers").alias("deg_a"))),
            "part_a",
        )
        .join(
            F.broadcast(deg.select(F.col("l_partkey").alias("part_b"),
                                   F.col("n_buyers").alias("deg_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(nc))
        .withColumn(
            "lift_e4",
            F.expr("CAST(support * n_cust * 10000 DIV (deg_a * deg_b) AS BIGINT)"),
        )
    )
    # distributed TakeOrdered first (co-purchase pairs are
    # data-proportional), then a constant-key ranking window over the
    # <= AFFINITY_TOP surviving rows.
    top = scored.orderBy(
        F.col("support").desc(), "part_a", "part_b"
    ).limit(AFFINITY_TOP)
    w = _W.partitionBy(const_key("part_a")).orderBy(
        F.col("support").desc(), "part_a", "part_b"
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "part_a", "part_b",
                F.col("support").cast("long").alias("support"), "lift_e4")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph
# ---------------------------------------------------------------------------


@register(
    "graph_degree_assortativity",
    oracle="""
        WITH cp AS (
            SELECT DISTINCT o.o_custkey, l.l_partkey
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM cp a JOIN cp b
              ON a.o_custkey = b.o_custkey AND a.l_partkey < b.l_partkey
            GROUP BY pa, pb
        ),
        deg AS (
            SELECT p, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT pa AS p FROM edges UNION ALL SELECT pb FROM edges)
            GROUP BY p
        ),
        ends AS (
            SELECT da.d AS x, db.d AS y
            FROM edges e
            JOIN deg da ON e.pa = da.p
            JOIN deg db ON e.pb = db.p
        ),
        sym AS (
            SELECT x, y FROM ends UNION ALL SELECT y AS x, x AS y FROM ends
        ),
        sums AS (
            SELECT CAST(count(*) AS BIGINT) AS m,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM sym
        )
        SELECT m // 2 AS n_edges,
               CAST((CASE WHEN CAST(m AS HUGEINT) * sxy
                               - CAST(sx AS HUGEINT) * sx < 0
                          THEN -1 ELSE 1 END)
                    * (abs(CAST(m AS HUGEINT) * sxy
                           - CAST(sx AS HUGEINT) * sx) * 10000
                       // (CAST(m AS HUGEINT) * sxx
                           - CAST(sx AS HUGEINT) * sx)) AS BIGINT)
                   AS assortativity_e4
        FROM sums
    """,
    doc=(
        "Degree assortativity of the part co-purchase graph (Newman "
        "2002, public): the Pearson correlation of endpoint degrees "
        "over edges, computed on the SYMMETRIZED edge list so the two "
        "marginals coincide (sum x = sum y, sum x^2 = sum y^2) and the "
        "whole statistic reduces to four integer power sums — "
        "(m*Sxy - Sx^2) / (m*Sxx - Sx^2) at e4 with the sign-explicit "
        "truncating division, zero floats. Negative assortativity "
        "(hubs attach to leaves) is the disassortative signature of "
        "co-occurrence graphs and decides whether hub-salting or "
        "hub-removal is the right skew defense for downstream "
        "traversals. Reuses the distinct (customer, part) reduction "
        "and bounded basket self-join of the affinity entry; degrees "
        "join back on the part key."
    ),
    tags=("graph", "stats", "join"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    a = cp.select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pa"))
    b = cp.select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pb"))
    # (A localCheckpoint of edges was measured and REJECTED here:
    # Spark's ReuseExchange already dedups the repeated pair-distinct
    # subtree inside the one final job, so the checkpoint only added a
    # 200 MB materialization and its variance — 3.58 s algebra-only vs
    # 3.82 s with the checkpoint, min-of-3 at sf0.1.)
    edges = (
        a.join(b, "ck")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    deg = (
        edges.select(F.col("pa").alias("p"))
        .unionByName(edges.select(F.col("pb").alias("p")))
        .groupBy("p")
        .agg(F.count("*").alias("d"))
    )
    ends = (
        edges.join(
            F.broadcast(deg.select(F.col("p").alias("pa"), F.col("d").alias("x"))),
            "pa",
        )
        .join(
            F.broadcast(deg.select(F.col("p").alias("pb"), F.col("d").alias("y"))),
            "pb",
        )
        .select("x", "y")
    )
    # OPTIMIZATION_r13 §9 (guide §2.3): symmetrization in exact integer
    # algebra instead of a UNION that ran the 12.7M-row ends probe (two
    # broadcast-hash probes per row) twice and pushed 2x the rows
    # through the final aggregate: over sym = ends ∪ swap(ends) the
    # four power sums are m = 2·n, Σx = Σx+Σy, Σx² = Σx²+Σy²,
    # Σxy = 2·Σxy — term-for-term the same BIGINTs (each half-sum is
    # bounded by the old total, so no new overflow path; the
    # DECIMAL(38,0) quotient below is unchanged). 4.57 → 3.58 s
    # min-of-3 at sf0.1; the oracle's literal UNION re-proves the
    # equality every sweep.
    half = ends.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx1"),
        F.sum("y").alias("sy1"),
        F.sum(F.col("x") * F.col("x")).alias("sxx1"),
        F.sum(F.col("y") * F.col("y")).alias("syy1"),
        F.sum(F.col("x") * F.col("y")).alias("sxy1"),
    )
    sums = half.select(
        (F.lit(2) * F.col("n")).alias("m"),
        (F.col("sx1") + F.col("sy1")).alias("sx"),
        (F.col("sxx1") + F.col("syy1")).alias("sxx"),
        (F.lit(2) * F.col("sxy1")).alias("sxy"),
    )
    # m * sxy overflows int64 on hub-heavy graphs (caught by ANSI mode
    # at sf0.1); the power-sum products run in DECIMAL(38,0), and the
    # e4 quotient is made EXACT by subtracting the decimal modulus
    # before dividing (a decimal division of an exact multiple carries
    # no rounding) — DuckDB reaches the same integers through HUGEINT.
    dec = "CAST({x} AS DECIMAL(38, 0))"
    num = f"({dec.format(x='m')} * sxy - {dec.format(x='sx')} * sx)"
    den = f"({dec.format(x='m')} * sxx - {dec.format(x='sx')} * sx)"
    return sums.select(
        F.expr("CAST(m DIV 2 AS BIGINT)").alias("n_edges"),
        F.expr(
            f"CAST((CASE WHEN {num} < 0 THEN -1 ELSE 1 END)"
            f" * ((abs({num}) * 10000 - (abs({num}) * 10000) % {den})"
            f" / {den}) AS BIGINT)"
        ).alias("assortativity_e4"),
    )


# ---------------------------------------------------------------------------
# PageRank on the co-purchase graph (iterative, exact fixed-point)
# ---------------------------------------------------------------------------

PR_ITERS = 3  # power-iteration steps
PR_SCALE = 10**12  # total rank mass, distributed as integers
PR_D_NUM, PR_D_DEN = 17, 20  # damping d = 0.85 as an exact rational
PR_TOP = 20


def _pr_oracle() -> str:
    parts = [
        f"""
        edges AS (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey <> b.l_partkey
        ),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
        base AS (
            SELECT n_nodes,
                   CAST({PR_SCALE} // n_nodes AS BIGINT) AS r0,
                   CAST(({PR_D_DEN - PR_D_NUM} * ({PR_SCALE} // n_nodes))
                        // {PR_D_DEN} AS BIGINT) AS b
            FROM n
        ),
        r0 AS (SELECT src AS part, (SELECT r0 FROM base) AS pr FROM deg)"""
    ]
    for it in range(1, PR_ITERS + 1):
        parts.append(f"""
        r{it} AS (
            SELECT e.dst AS part,
                   CAST((SELECT b FROM base)
                        + {PR_D_NUM} * sum(r.pr // d.d) // {PR_D_DEN}
                        AS BIGINT) AS pr
            FROM edges e
            JOIN r{it - 1} r ON e.src = r.part
            JOIN deg d ON e.src = d.src
            GROUP BY e.dst
        )""")
    return f"""
        WITH {",".join(parts)},
        ranked AS (
            SELECT part, pr, d.d AS n_neighbors,
                   row_number() OVER (ORDER BY pr DESC, part) AS rank
            FROM r{PR_ITERS} JOIN deg d ON part = d.src
        )
        SELECT CAST(rank AS BIGINT) AS rank, part, pr,
               n_neighbors
        FROM ranked WHERE rank <= {PR_TOP}
        ORDER BY rank
    """


@register(
    "graph_copurchase_pagerank",
    oracle=_pr_oracle(),
    doc=(
        f"PageRank (Page et al. 1999, public) over the order-level "
        f"co-purchase graph: parts sharing an order are linked both "
        f"ways (undirected as a symmetric directed graph, so every "
        f"node has out-degree >= 1 and in-degree >= 1 — no dangling-"
        f"mass handling needed, documented), then {PR_ITERS} power-"
        f"iteration steps with damping {PR_D_NUM}/{PR_D_DEN} in EXACT "
        f"fixed-point integers: total mass {PR_SCALE} floor-divided "
        f"across nodes, per-edge contribution pr DIV degree, update "
        f"base + {PR_D_NUM} * sum DIV {PR_D_DEN} — every intermediate "
        f"is a positive int64 (mass <= {PR_SCALE} << 2^53), so the "
        f"ranks hash identically cross-engine where float PageRank "
        f"would diverge on partial-sum order alone (the Lloyd/ACF "
        f"exact-integer house pattern). Top-{PR_TOP} parts by final "
        f"rank. Scale: the edge build is the per-order quadratic "
        f"self-join (sum-of-basket-squares, the affinity entry's "
        f"bounded-block shape); each iteration is one equi-join on "
        f"src + one map-side-combinable groupBy on dst — shuffle on "
        f"the edge key only, rank state is node-sized, {PR_ITERS} "
        f"rounds of lineage (no unbounded growth). Oracle: the "
        f"unrolled r0..r{PR_ITERS} CTE chain."
    ),
    tags=("graph", "iterative", "agg"),
)
def graph_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d")).persist()
    scalars = deg.agg(
        F.count("*").alias("n_nodes"),
        F.expr(f"CAST({PR_SCALE} DIV count(*) AS BIGINT)").alias("r0"),
        F.expr(
            f"CAST({PR_D_DEN - PR_D_NUM} * ({PR_SCALE} DIV count(*))"
            f" DIV {PR_D_DEN} AS BIGINT)"
        ).alias("b"),
    )
    # rank state rides the node set; the two scalars broadcast
    r = deg.crossJoin(F.broadcast(scalars)).select(
        F.col("src").alias("part"), F.col("r0").alias("pr")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(r.withColumnRenamed("part", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("pr DIV d").alias("c"))
        )
        r = (
            contrib.groupBy(F.col("dst").alias("part"))
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(scalars))
            .select(
                "part",
                F.expr(
                    f"CAST(b + {PR_D_NUM} * s DIV {PR_D_DEN} AS BIGINT)"
                ).alias("pr"),
            )
        )
    top = (
        r.join(deg.select(F.col("src").alias("part"),
                          F.col("d").cast("long").alias("n_neighbors")), "part")
        .orderBy(F.col("pr").desc(), "part")
        .limit(PR_TOP)
    )
    # constant-key global window: input is the <= PR_TOP limit() output
    w = _W.partitionBy(const_key("part")).orderBy(F.col("pr").desc(), "part")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "part", "pr", "n_neighbors")
        .orderBy("rank")
    )
