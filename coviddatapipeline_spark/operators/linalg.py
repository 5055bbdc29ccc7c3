"""Distributed linear algebra on the embeddings table: dominant
principal component by power iteration, cross-engine bit-deterministic.

The iterate-a-matvec-to-a-fixpoint shape is the third classic
iterative workload next to PageRank (``operators/graph.py``) and Lloyd
k-means (``operators/datapipe.py``), and it uses the same two tricks
that made those oracle-checkable:

- **Fixed-point arithmetic.** Vectors quantize to
  ``floor(x * 10^4 + 0.5)`` int64 (explicit floor-half-up — NOT the
  engines' ``round()``, whose half-rule and float handling differ), so
  every data-sized reduction — the per-vector projection ``s = q . x``
  and the per-dimension accumulation ``y_d = sum_vec q_d * s`` — is
  EXACT INTEGER math, immune to partial-sum ordering. Bounds:
  ``|q|,|x| <= 10^4``, dim 64 gives ``|s| <= 6.4e9``;
  ``|y_d| <= 1e4 * 6.4e9 * N``, within int64 for N up to ~140M
  vectors per job (shard above that).
- **Driver-held model state.** The 64-int direction vector is
  metadata-sized; each round collects it and re-broadcasts as column
  literals, exactly like the k-means centroid table. The single float
  step per round (normalize to unit length, requantize) happens once
  on 64 numbers with the same operation sequence on both engines.

Per round the cluster work is: one map-only projection (no shuffle),
one map-side-combinable groupBy over 64 dimension keys. Data never
re-partitions across rounds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.common import t
from coviddatapipeline_spark.queries.catalog import register

PCA_SCALE = 10_000  # fixed-point scale for both data and direction
PCA_ITERS = 3
PCA_DIM = 64


def _quant_duck(expr: str) -> str:
    return (
        f"list_transform({expr}, e -> "
        f"CAST(floor(CAST(e AS DOUBLE) * {PCA_SCALE} + 0.5) AS BIGINT))"
    )


def _pca_oracle() -> str:
    """Unrolled power iteration as chained CTEs (the PageRank/Lloyd
    oracle pattern): each round computes integer projections s, integer
    per-dimension sums y, then renormalizes on 64 values."""
    parts = [
        f"""
        q AS (
            SELECT vec_id, label, {_quant_duck('embedding')} AS q
            FROM embeddings
        ),
        x0 AS (
            SELECT list_transform(generate_series(1, {PCA_DIM}),
                                  i -> {PCA_SCALE}::BIGINT) AS x
        )"""
    ]
    for r in range(1, PCA_ITERS + 1):
        parts.append(f"""
        s{r} AS (
            SELECT q.vec_id, q.q,
                   list_sum(list_transform(generate_series(1, {PCA_DIM}),
                            i -> q.q[i] * x.x[i])) AS s
            FROM q CROSS JOIN x{r - 1} x
        ),
        y{r} AS (
            SELECT u.i AS pos, sum(s.q[u.i] * s.s) AS y
            FROM s{r} s CROSS JOIN generate_series(1, {PCA_DIM}) u(i)
            GROUP BY u.i
        ),
        yl{r} AS (
            SELECT list(y ORDER BY pos) AS ys FROM y{r}
        ),
        x{r} AS (
            SELECT list_transform(ys, y -> CAST(floor(
                       CAST(y AS DOUBLE) / sqrt(list_reduce(
                           list_transform(ys,
                               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
                           (a, b) -> a + b))
                       * {PCA_SCALE} + 0.5) AS BIGINT)) AS x
            FROM yl{r}
        )""")
    final = f"""
        proj AS (
            SELECT q.label,
                   list_sum(list_transform(generate_series(1, {PCA_DIM}),
                            i -> q.q[i] * x.x[i])) AS p
            FROM q CROSS JOIN x{PCA_ITERS} x
        )
        SELECT label, count(*) AS n,
               round(sum(p) * 1.0 / (count(*) * {PCA_SCALE * PCA_SCALE}), 6)
                   AS mean_proj,
               round(min(p) * 1.0 / {PCA_SCALE * PCA_SCALE}, 6) AS min_proj,
               round(max(p) * 1.0 / {PCA_SCALE * PCA_SCALE}, 6) AS max_proj
        FROM proj GROUP BY label ORDER BY label
    """
    return "WITH " + ",".join(parts) + "," + final


def _dot_lit(qcol: str, x: list[int]):
    return F.aggregate(
        F.zip_with(
            F.col(qcol), F.array(*[F.lit(int(v)) for v in x]), lambda a, b: a * b
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


@register(
    "emb_pca_power_iteration",
    oracle=_pca_oracle(),
    doc=(
        f"Dominant principal direction of the embedding cloud by "
        f"{PCA_ITERS} power-iteration rounds (uncentered PCA / "
        "dominant eigenvector of the Gram matrix), reported as "
        "per-label projection stats onto that direction — the "
        "1-D structure screen that shows how well coarse labels "
        "separate along the main axis of variance. Distributed shape "
        "per round: s = q.x is a map-only integer dot against 64 "
        "broadcast literals; y = sum_vec q*s is one map-side-"
        "combinable shuffle onto 64 dimension keys; the 64-int "
        "direction renormalizes on the driver (model-state pattern "
        "shared with ivf_kmeans_lloyd). All data-sized sums are exact "
        "int64 fixed-point, so engines agree bit-for-bit; the oracle "
        "unrolls the identical rounds as CTEs."
    ),
    tags=("similarity", "iterative", "linalg"),
)
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"),
            lambda e: F.floor(e.cast("double") * PCA_SCALE + F.lit(0.5)).cast("long"),
        ).alias("q"),
    ).persist()

    x = [PCA_SCALE] * PCA_DIM
    for _ in range(PCA_ITERS):
        s = q.withColumn("s", _dot_lit("q", x))
        y_rows = (
            s.select(F.posexplode("q").alias("pos", "qv"), "s")
            .groupBy("pos")
            .agg(F.sum(F.col("qv") * F.col("s")).alias("y"))
            .collect()
        )
        ys = [r["y"] for r in sorted(y_rows, key=lambda r: r["pos"])]
        # Normalize on the driver with the exact operation sequence the
        # oracle uses: float(y) -> sequential sum of squares -> sqrt ->
        # divide -> scale -> floor(t + 0.5).
        norm2 = 0.0
        for yv in ys:
            fv = float(yv)
            norm2 = norm2 + fv * fv
        norm = math.sqrt(norm2)
        x = [int(math.floor(float(yv) / norm * PCA_SCALE + 0.5)) for yv in ys]

    unit = PCA_SCALE * PCA_SCALE
    out = (
        q.withColumn("p", _dot_lit("q", x))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("p") / (F.count("*") * F.lit(unit)), 6).alias("mean_proj"),
            F.round(F.min("p") / F.lit(unit), 6).alias("min_proj"),
            F.round(F.max("p") / F.lit(unit), 6).alias("max_proj"),
        )
        .orderBy("label")
    )
    q.unpersist()
    return out


# ---------------------------------------------------------------------------
# Embedding vector data-quality audit
# ---------------------------------------------------------------------------


@register(
    "emb_vector_quality_audit",
    oracle="""
        WITH norms AS (
            -- The CASE mirrors the engine's fold semantics exactly so
            -- the audit stays TOTAL on the degenerate rows it exists to
            -- find: NULL vector -> NULL norm (Spark zip_with/aggregate
            -- propagates NULL), empty vector -> 0.0 (the fold's init),
            -- else the dot product. DuckDB's bare list_dot_product
            -- would crash on an empty list (flat-vector INTERNAL
            -- error), i.e. the unguarded oracle died on exactly the
            -- failed-encoder rows this check is meant to count.
            SELECT label, len(embedding) AS dim,
                   CAST(floor(CASE WHEN embedding IS NULL THEN NULL
                                   WHEN len(embedding) = 0 THEN 0.0
                                   ELSE list_dot_product(embedding::DOUBLE[],
                                                         embedding::DOUBLE[])
                              END * 10000
                              + 0.5) AS BIGINT) AS norm2_e4
            FROM embeddings
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(min(dim) AS BIGINT) AS min_dim,
               CAST(max(dim) AS BIGINT) AS max_dim,
               CAST(sum(CASE WHEN norm2_e4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS zero_vectors,
               CAST(min(norm2_e4) AS BIGINT) AS min_norm2_e4,
               CAST(max(norm2_e4) AS BIGINT) AS max_norm2_e4,
               CAST(sum(norm2_e4) // count(*) AS BIGINT) AS mean_norm2_e4
        FROM norms
        GROUP BY label
        ORDER BY label
    """,
    doc=(
        "Vector-column data quality — the checks an embedding ingest "
        "runs before indexing: per quantizer cell (label), vector "
        "count, dimension consistency (min_dim = max_dim or the batch "
        "is mixed-model garbage), zero-vector count (failed encoder "
        "outputs that poison cosine), and the squared-norm range/mean — "
        "unit-normalized corpora must sit at norm2 ~= 1, drift flags a "
        "normalization bug. Norm2 is the same sequential-fold dot "
        "product both engines already share, quantized per vector via "
        "floor(x*1e4+0.5) BEFORE aggregation so min/max/mean are "
        "integer statistics with no float-sum ordering. Map-only plus "
        "one combinable groupBy — the shape that audits a trillion "
        "vectors."
    ),
    tags=("similarity", "agg", "quality"),
)
def emb_vector_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.common import t as _t

    emb = _t(spark, sf_dir, "embeddings").select(
        "label",
        F.size("embedding").alias("dim"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    norm2 = F.aggregate(
        F.zip_with("v", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    norms = emb.withColumn(
        "norm2_e4",
        F.floor(norm2 * 10000 + F.lit(0.5)).cast("long"),
    )
    return (
        norms.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("dim").cast("long").alias("min_dim"),
            F.max("dim").cast("long").alias("max_dim"),
            F.sum(F.when(F.col("norm2_e4") == 0, 1).otherwise(0))
            .cast("long")
            .alias("zero_vectors"),
            F.min("norm2_e4").alias("min_norm2_e4"),
            F.max("norm2_e4").alias("max_norm2_e4"),
            F.expr("CAST(sum(norm2_e4) DIV count(*) AS BIGINT)").alias(
                "mean_norm2_e4"
            ),
        )
        .select(
            "label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            "min_dim",
            "max_dim",
            "zero_vectors",
            "min_norm2_e4",
            "max_norm2_e4",
            "mean_norm2_e4",
        )
        .orderBy("label")
    )
