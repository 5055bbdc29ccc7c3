"""Training-data pipeline operators (round 2 widening).

The ops a 100 TB LLM-pretraining data pipeline runs between raw corpus
and training shards, beyond dedup/quality (operators/dedup.py, text.py):

- deterministic stratified train/val/test split (hash-bucketed, so any
  worker — or a re-run — routes a document identically, no RNG state),
- benchmark-contamination detection (shingle overlap against a held-out
  evaluation set — the decontamination join every eval-honest pipeline
  runs before training),
- sequential sequence packing ("concat-and-chop" into fixed context
  windows, the packing strategy LLM dataloaders actually use),
- per-class balanced downsampling (hash-ordered keep-first cap),
- int8 quantization planning for embedding shards (absmax scales).

Everything is JVM column algebra or partitioned windows — no Python in
any hot path, every shuffle keyed on a grouping the data already needs.
All cross-engine hashing uses md5 (the one hash Spark and DuckDB
share), never xxhash/crc32 (engine-specific seeds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from coviddatapipeline_spark.operators.common import EMB_DIM, WS_RE, t
from coviddatapipeline_spark.operators.text import _SW_SQL, _TOKENS, _tokens, STOPWORDS
from coviddatapipeline_spark.queries.catalog import register
from coviddatapipeline_spark.operators.ranking import const_key

# md5-derived uniform bucket in [0, 100): the cross-engine deterministic
# "random" — first 8 hex chars of md5(doc_id) as an integer.
_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


def _bucket(col) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") % 100
    )


@register(
    "split_train_val_test",
    oracle=f"""
        WITH tagged AS (
            SELECT source,
                   CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
                        WHEN {_BUCKET_SQL} < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT source, split, count(*) AS n
        FROM tagged
        GROUP BY source, split
        ORDER BY source, split
    """,
    doc=(
        "Deterministic stratified train/val/test split (80/10/10): the "
        "split is a pure function of md5(doc_id), so assignment is "
        "reproducible across runs, engines, and partitionings — no RNG "
        "seed to ship, no shuffle to randomize. Per-source counts audit "
        "stratification. At 100 TB this is a map-only tag + one "
        "map-side-combinable count."
    ),
    tags=("datapipe", "sampling"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n"))
        .orderBy("source", "split")
    )


def contamination_hits(shingles: DataFrame, bench: DataFrame) -> DataFrame:
    """Per-doc contamination kernel, shared by the registered batch
    entry and the streaming ingest guard
    (``pipeline.streaming.stream_contamination_guard``) so 'the check
    the audit verified' and 'the check the ingest path runs' are the
    same code. ``shingles`` is the exploded (doc_id, source, s) frame
    of DISTINCT per-doc shingles; ``bench`` is the (s) shingle set of
    the held-out benchmark. Inverted-index equi-join on the shingle —
    never doc×doc — then one combinable per-doc count; the bench side
    is broadcast-sized for real eval suites and AQE picks that join
    when it fits."""
    return (
        shingles.join(bench, "s")
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("shared"))
    )


@register(
    "contamination_ngram_overlap",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, source,
                   unnest(list_distinct(list_transform(
                       generate_series(1, len({_TOKENS.format(x='text')}) - 2),
                       i -> array_to_string(({_TOKENS.format(x='text')})[i:i+2], ' '))))
                       AS s
            FROM documents
        ),
        bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
        hits AS (
            SELECT sh.doc_id, sh.source, count(*) AS shared
            FROM sh JOIN bench USING (s)
            WHERE sh.source <> 'src0'
            GROUP BY sh.doc_id, sh.source
        )
        SELECT source,
               count(*) AS n_contaminated,
               CAST(sum(CASE WHEN shared >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy,
               max(shared) AS max_shared
        FROM hits
        GROUP BY source
        ORDER BY source
    """,
    doc=(
        "Benchmark-contamination check: corpus documents sharing word-"
        "trigram shingles with a held-out evaluation source (src0 plays "
        "the benchmark). The overlap is an inverted-index equi-join on "
        "the shingle — never doc×doc — and the benchmark shingle set is "
        "the small side (broadcastable at real scale). Same join shape "
        "as dedup_ngram_jaccard_pairs, whose MAX_SHINGLE_DF cap applies "
        "verbatim when boilerplate shingles appear."
    ),
    tags=("datapipe", "dedup", "text"),
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.dedup import _trigrams

    docs = t(spark, sf_dir, "documents")
    # persist: the shingle explode feeds both the benchmark side and the
    # corpus side — tokenize once, not twice (same rationale as
    # dedup_ngram_jaccard_pairs' persisted shingle frame)
    sh = docs.select(
        "doc_id", "source", F.explode(_trigrams(F.col("text"))).alias("s")
    ).persist()
    bench = sh.filter(F.col("source") == "src0").select("s").distinct()
    hits = contamination_hits(sh.filter(F.col("source") != "src0"), bench)
    return (
        hits.groupBy("source")
        .agg(
            F.count("*").alias("n_contaminated"),
            F.sum(F.when(F.col("shared") >= 10, 1).otherwise(0)).alias("n_heavy"),
            F.max("shared").alias("max_shared"),
        )
        .orderBy("source")
    )


CONTEXT_TOKENS = 2048  # packing window (tokens per training sequence)


@register(
    "pack_sequences_greedy",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, len({_TOKENS.format(x='text')}) AS n_tok
            FROM documents
        ),
        packed AS (
            SELECT source, n_tok,
                   (sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tok)
                       // {CONTEXT_TOKENS} AS bin
            FROM toks
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               count(DISTINCT bin) AS n_bins,
               round(sum(n_tok) * 1.0
                     / (count(DISTINCT bin) * {CONTEXT_TOKENS}), 4) AS fill_ratio
        FROM packed
        GROUP BY source
        ORDER BY source
    """,
    doc=(
        "Sequential sequence packing ('concat-and-chop'): per source, "
        "documents in doc_id order accumulate into fixed "
        f"{CONTEXT_TOKENS}-token context windows; a doc's bin is its "
        "cumulative start offset div window — exactly what an LLM "
        "dataloader's packed-shard builder computes. The running sum is "
        "a window PARTITIONED by source (parallel across sources); at "
        "100 TB you sub-shard hot sources the same way the ranking "
        "helper buckets keys."
    ),
    tags=("datapipe", "window", "text"),
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).alias("n_tok")
    )
    cum = F.sum("n_tok").over(
        W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    )
    packed = toks.withColumn(
        "bin", F.floor((cum - F.col("n_tok")) / CONTEXT_TOKENS).cast("long")
    )
    return (
        packed.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.countDistinct("bin").alias("n_bins"),
            F.round(
                F.sum("n_tok") * 1.0 / (F.countDistinct("bin") * CONTEXT_TOKENS), 4
            ).alias("fill_ratio"),
        )
        .orderBy("source")
    )


KEEP_PER_LANG = 20


@register(
    "sample_balanced_per_lang",
    oracle=f"""
        WITH ordered AS (
            SELECT lang, n_chars,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY {_BUCKET_SQL}, doc_id) AS rk
            FROM documents
        )
        SELECT lang, count(*) AS n_kept,
               round(avg(n_chars), 2) AS avg_chars
        FROM ordered
        WHERE rk <= {KEEP_PER_LANG}
        GROUP BY lang
        ORDER BY lang
    """,
    doc=(
        "Class-balanced downsampling: cap each language at "
        f"{KEEP_PER_LANG} documents, chosen by md5-hash order (an "
        "unbiased, reproducible 'random' sample needing no RNG state) — "
        "the per-class rebalancing step before mixing training sources. "
        "The window is PARTITIONED by lang; per-class top-K never "
        "funnels the corpus through one task."
    ),
    tags=("datapipe", "sampling", "window"),
)
def sample_balanced_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(_bucket(F.col("doc_id")), F.col("doc_id"))
    )
    return (
        docs.select("lang", "n_chars", rk.alias("rk"))
        .filter(F.col("rk") <= KEEP_PER_LANG)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@register(
    "emb_int8_quant_stats",
    oracle="""
        -- finite-vector gate (both engines): a NULL / NaN / Inf
        -- component cannot be absmax-quantized, so such vectors are
        -- excluded from the plan — the production semantics, and it
        -- makes the contract total on poison corpora (Spark's max and
        -- DuckDB's list_max order NaN differently, so without the gate
        -- the two engines disagree on which scale a poisoned vector
        -- gets). No-op on clean data (round 9 convergence).
        WITH per_vec AS (
            SELECT label,
                   list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
                       AS scale,
                   sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
                       AS l2
            FROM embeddings
            WHERE embedding IS NOT NULL
              AND len(embedding) > 0
              AND COALESCE(list_sum(list_transform(embedding::DOUBLE[],
                    x -> CASE WHEN x IS NOT NULL AND isfinite(x)
                              THEN 0 ELSE 1 END)), 0) = 0
        )
        SELECT label, count(*) AS n,
               round(avg(scale), 6) AS avg_absmax_scale,
               round(avg(l2), 4) AS avg_l2
        FROM per_vec
        GROUP BY label
        ORDER BY label
    """,
    doc=(
        "Int8 quantization planning for embedding shards: per-vector "
        "absmax scale (the factor an int8 ANN index stores alongside "
        "each vector) and L2 norm, rolled up per label. Pure JVM "
        "higher-order array functions (transform/aggregate/array_max) — "
        "a map-only pass plus one tiny aggregate at any scale."
    ),
    tags=("datapipe", "similarity", "array"),
)
def emb_int8_quant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    inf = float("inf")
    emb = t(spark, sf_dir, "embeddings").filter(
        # finite-vector gate — mirrors the oracle's WHERE (see oracle
        # comment); forall on an empty array is true on Spark and the
        # oracle's COALESCE(sum, 0)=0 matches that
        F.col("embedding").isNotNull()
        # empty vectors gate out too: Spark's aggregate seed makes
        # their l2 exactly 0.0 while DuckDB's list_sum([]) is NULL —
        # and a 0-d vector has no quantization scale anyway
        & (F.size("embedding") > 0)
        & F.forall(
            F.col("embedding"),
            lambda x: x.isNotNull()
            & ~F.isnan(x.cast("double"))
            & (F.abs(x.cast("double")) != F.lit(inf)),
        )
    )
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / 127.0
    l2 = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        emb.select("label", scale.alias("scale"), l2.alias("l2"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("scale"), 6).alias("avg_absmax_scale"),
            F.round(F.avg("l2"), 4).alias("avg_l2"),
        )
        .orderBy("label")
    )


@register(
    "pack_sequences_ffd",
    oracle=f"""
        WITH RECURSIVE toks AS MATERIALIZED (
            SELECT doc_id, source, len({_TOKENS.format(x='text')}) AS n_tok
            FROM documents
        ),
        -- MATERIALIZED matters: the recursive term joins `ordered`
        -- every iteration, and without it DuckDB re-tokenizes the
        -- whole corpus per step (measured 40x slower at sf0.1).
        ordered AS MATERIALIZED (
            SELECT source, n_tok,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_tok DESC, doc_id) AS rn
            FROM toks
        ),
        counts AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                   max(rn) AS n
            FROM ordered GROUP BY source
        ),
        -- Replay FFD exactly: step k places the k-th doc (all sources
        -- advance in lock-step; a source with fewer docs just stops
        -- joining). bins = remaining capacity per opened bin; first
        -- fitting bin by 1-based position, else open a new one. pos is
        -- hoisted into the derived table so each step scans bins once
        -- (O(B), not O(B^2)); COALESCE covers list_position's
        -- documented NULL-on-absent (1.0.0 returns 0 — both handled).
        fold AS (
            SELECT source, 0 AS rn, CAST([] AS BIGINT[]) AS bins FROM counts
            UNION ALL
            SELECT source, rn,
                   CASE WHEN pos = 0
                        THEN list_append(
                                 bins,
                                 CAST(greatest({CONTEXT_TOKENS} - n_tok, 0)
                                      AS BIGINT))
                        ELSE list_transform(
                                 bins,
                                 (r, i) -> CASE WHEN i = pos
                                           THEN r - n_tok ELSE r END)
                   END AS bins
            FROM (
                SELECT f.source AS source, f.rn + 1 AS rn, f.bins AS bins,
                       s.n_tok AS n_tok,
                       COALESCE(list_position(
                           list_transform(f.bins, r -> r >= s.n_tok),
                           true), 0) AS pos
                FROM fold f
                JOIN ordered s ON s.source = f.source AND s.rn = f.rn + 1
            )
        )
        SELECT c.source, c.n_docs, c.total_tokens,
               CAST(len(f.bins) AS BIGINT) AS n_bins,
               CAST(c.total_tokens * 10000
                    // (len(f.bins) * {CONTEXT_TOKENS}) AS BIGINT) AS fill_e4
        FROM fold f JOIN counts c ON c.source = f.source AND f.rn = c.n
        ORDER BY c.source
    """,
    doc=(
        "First-fit-decreasing sequence packing per source: docs sorted "
        "by token count descending, each placed into the first bin with "
        f"room (capacity {CONTEXT_TOKENS} tokens) — the tighter packing "
        "an offline shard builder uses when doc order need not be "
        "preserved. Exact FFD is sequential per group, so it runs as an "
        "Arrow-batched grouped-map applyInPandas kernel (one group per "
        "source, parallel across sources); the DuckDB oracle replays "
        "the identical fold as a recursive CTE over the same "
        "(n_tok DESC, doc_id) order, so bin counts hash-match exactly. "
        "Fill is reported as an e4 integer (floor division) — no float "
        "rounding to diverge across engines. Unit tests additionally "
        "pin doc/token conservation vs the chop packer, "
        "capacity-derived bin bounds, and determinism. (FFD bins "
        "respect capacity, so its bin COUNT is not comparable to the "
        "chop packer's, whose boundary-straddling bins may overflow — "
        "fill ratios measure different things.)"
    ),
    tags=("datapipe", "udf", "text"),
)
def pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401  (worker-side)

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).alias("n_tok")
    )

    cap = CONTEXT_TOKENS

    # Kernel nested so cloudpickle ships it by value (driver imports the
    # entry file from a foreign cwd; workers have no package path).
    def ffd(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["n_tok", "doc_id"], ascending=[False, True])
        bins = []  # remaining capacity per bin
        for n in pdf["n_tok"]:
            for i, rem in enumerate(bins):
                if n <= rem:
                    bins[i] -= n
                    break
            else:
                bins.append(max(cap - n, 0))
        total = int(pdf["n_tok"].sum())
        n_bins = len(bins)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_tokens": [total],
                "n_bins": [n_bins],
                "fill_e4": [total * 10000 // (n_bins * cap) if n_bins else 0],
            }
        )

    return (
        toks.groupBy("source")
        .applyInPandas(
            ffd,
            schema="source string, n_docs long, total_tokens long, "
            "n_bins long, fill_e4 long",
        )
        .orderBy("source")
    )


KMEANS_K = 8


@register(
    "ivf_kmeans_one_step",
    oracle=f"""
        WITH ev AS (
            -- EMB_DIM contract (SCALE.md §14), mirrored from the engine
            -- filter below: total on poison corpora, no-op on clean data.
            SELECT vec_id, embedding FROM embeddings
            WHERE len(embedding) = {EMB_DIM}
        ),
        seeds AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS c
            FROM ev WHERE vec_id < {KMEANS_K}
        ),
        assigned AS (
            SELECT e.vec_id,
                   (SELECT s.cid FROM seeds s
                    ORDER BY list_dot_product(e.embedding::DOUBLE[], s.c) DESC,
                             s.cid ASC
                    LIMIT 1) AS cluster
            FROM ev e
        )
        SELECT cluster, count(*) AS n
        FROM assigned
        GROUP BY cluster
        ORDER BY cluster
    """,
    doc=(
        "One Lloyd assignment step for IVF quantizer training: the "
        f"first {KMEANS_K} vectors seed the centroids (deterministic "
        "init), every vector assigns to its max-dot-product seed "
        "(unit-norm vectors: max dot = min L2), per-cluster sizes out. "
        "The k seeds broadcast as literals; assignment is a map-only "
        "argmax over k dot products in JVM column space — the shape "
        "each subsequent Lloyd iteration repeats (driver loops over "
        "tiny k x dim collected centroids, data never moves). The "
        "oracle runs the same argmax per vector in SQL."
    ),
    tags=("datapipe", "similarity"),
)
def ivf_kmeans_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EMB_DIM uniform-dimension contract (SCALE.md §14): Lloyd
    # assignment is defined over corpus-dimensional vectors; NULL /
    # empty / ragged rows are excluded, mirrored by the oracle's ev
    # CTE. No-op on clean corpora.
    emb = t(spark, sf_dir, "embeddings").filter(F.size("embedding") == EMB_DIM)
    seeds = (
        emb.filter(F.col("vec_id") < KMEANS_K)
        .select("vec_id", "embedding")
        .collect()
    )  # k x dim floats — a metadata-sized collect (the quantizer itself)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dots = []
    for row in sorted(seeds, key=lambda r: r["vec_id"]):
        c = F.array(*[F.lit(float(x)) for x in row["embedding"]])
        dots.append(
            F.struct(
                F.zip_with(v, c, lambda a, b: a * b).alias("prod"),
                F.lit(row["vec_id"]).alias("cid"),
            )
        )
    # argmax over k dot products: struct ordering on (dot, -cid) via
    # max_by-style reduce
    scored = F.array(
        *[
            F.struct(
                F.aggregate(d["prod"], F.lit(0.0), lambda acc, x: acc + x).alias("dot"),
                (-d["cid"]).alias("neg_cid"),
            )
            for d in dots
        ]
    )
    best = F.array_max(scored)  # lexicographic: max dot, then max -cid (min cid)
    return (
        emb.select((-best["neg_cid"]).cast("long").alias("cluster"))
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .orderBy("cluster")
    )


# --- multi-iteration Lloyd (NEXT.md round-2 #4) ----------------------------

KM_SCALE = 1_000_000  # fixed-point: coord -> round(coord * 1e6) as int64
KM_DIM = EMB_DIM  # quantizer trains in the corpus dimensionality
KM_ITERS = 2  # centroid updates; KM_ITERS + 1 assignment passes total


def km_cte_parts() -> tuple[str, str]:
    """(joined WITH-parts, final-assignment CTE name) for the unrolled
    Lloyd chain — shared by the trainer oracle and the trained-ANN
    oracle (similarity.py), which extends the chain with a probe."""
    parts = _km_parts()
    return ",".join(parts), f"a{KM_ITERS + 1}"


def _km_parts() -> list[str]:
    parts = [
        f"""
        e AS (
            -- mirrors the engine's KM_DIM uniform-dimension contract
            -- (km_train_centroids filters size(embedding) == KM_DIM):
            -- a no-op on clean data, it makes the oracle TOTAL on
            -- poison corpora instead of crashing in list_dot_product
            -- on the ragged/NULL vectors the engine excluded
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                                  x -> CAST(round(x * {KM_SCALE}) AS BIGINT)) AS q
            FROM embeddings
            WHERE len(embedding) = {KM_DIM}
        ),
        cent0 AS (SELECT vec_id AS cid, q AS c FROM e WHERE vec_id < {KMEANS_K})
        """
    ]
    for it in range(1, KM_ITERS + 2):
        parts.append(f"""
        a{it} AS (
            SELECT e.vec_id,
                   (SELECT c.cid FROM cent{it - 1} c
                    ORDER BY list_dot_product(e.q::DOUBLE[], c.c::DOUBLE[]) DESC,
                             c.cid ASC
                    LIMIT 1) AS cluster
            FROM e
        )""")
        if it <= KM_ITERS:
            parts.append(f"""
        m{it} AS (
            SELECT a{it}.cluster AS cid, u.i,
                   CAST(floor(sum(e.q[u.i]) * 1.0 / count(*)) AS BIGINT) AS c
            FROM a{it} JOIN e USING (vec_id),
                 unnest(generate_series(1, {KM_DIM})) AS u(i)
            GROUP BY a{it}.cluster, u.i
        ),
        cent{it} AS (
            SELECT c0.cid, COALESCE(m.c, c0.c) AS c
            FROM cent0 c0
            LEFT JOIN (SELECT cid, list(c ORDER BY i) AS c
                       FROM m{it} GROUP BY cid) m USING (cid)
        )""")
    return parts


def _km_oracle() -> str:
    """Unrolled DuckDB CTE chain for KM_ITERS Lloyd updates + final
    assignment, in the same fixed-point integer arithmetic as the Spark
    operator (see ivf_kmeans_lloyd doc for why integers)."""
    parts = _km_parts()
    last = KM_ITERS + 1
    return (
        "WITH " + ",".join(parts) + f"""
        SELECT a.cluster, count(*) AS n, l.centroid_l1
        FROM a{last} a
        JOIN (SELECT cid AS cluster,
                     CAST(list_sum(list_transform(c, x -> abs(x))) AS BIGINT)
                         AS centroid_l1
              FROM cent{KM_ITERS}) l USING (cluster)
        GROUP BY a.cluster, l.centroid_l1
        ORDER BY a.cluster
    """
    )


def km_assign(df: DataFrame, cent: dict[int, list[int]]) -> DataFrame:
    """Add a ``cluster`` column: argmax dot product against the k
    broadcast centroids (map-only, no shuffle); ties break to the
    lowest centroid id.

    OPTIMIZATION_r12 §B1 (guide §4.2, uni_best_seg_arrow precedent):
    the model ships ONCE per executor as a SparkContext broadcast into
    an Arrow-batched pandas kernel instead of a K x DIM literal
    expression tree. The literal form cost ~2.7 s of py4j expression
    construction + ~4 s of Catalyst analysis PER BUILD at K=8, D=64
    (measured; every Lloyd iteration pays it again with new literals),
    and at a production K (thousands of cells) the plan itself would
    be the bottleneck — the exact failure mode the tokenizer vocab
    literal had (SCALE.md §21). The kernel computes the identical
    exact-integer argmax: int64 coordinates, products <= 64 * (2^20)^2
    << 2^63, NumPy int64 matmul is exact, argmax takes the FIRST
    maximum over centroids sorted by cid — the same (dot, -cid)
    lexicographic tie-break as the old struct array_max. Degenerate
    rows (NULL vector, NULL element, non-KM_DIM length after an
    upstream that skipped the quantize gate) reproduce the old
    expression's NULL-dot semantics: every dot is NULL, so the
    struct comparison fell through to max(neg_cid) = lowest cid —
    pinned by tests/test_optimization_r12.py on crafted rows."""
    cids = sorted(cent)
    cmat = np.array([cent[c] for c in cids], dtype=np.int64)
    cid_arr = np.array(cids, dtype=np.int64)
    lowest = int(cids[0])
    bc = df.sparkSession.sparkContext.broadcast((cmat, cid_arr, lowest))

    @F.pandas_udf("long")
    def _assign(qs: pd.Series) -> pd.Series:
        cm, ci, lo = bc.value
        dim = cm.shape[1]
        vals = qs.tolist()
        n = len(vals)
        qmat = np.zeros((n, dim), dtype=np.int64)
        bad = np.zeros(n, dtype=bool)
        for r, row in enumerate(vals):
            if row is None:
                bad[r] = True
                continue
            a = np.asarray(row)
            if a.shape != (dim,) or a.dtype.kind not in "iu":
                # Arrow hands a null-element list as float64-with-NaN
                # (or object); a clean float array of the right
                # length is still an exact int64 payload
                if (
                    a.shape == (dim,)
                    and a.dtype.kind == "f"
                    and not np.isnan(a).any()
                ):
                    qmat[r] = a.astype(np.int64)
                else:
                    bad[r] = True
                continue
            qmat[r] = a
        dots = qmat @ cm.T  # exact int64
        out = ci[np.argmax(dots, axis=1)].copy()
        out[bad] = lo
        return pd.Series(out)

    return df.withColumn("cluster", _assign("q"))


def km_quantize(emb: DataFrame) -> DataFrame:
    """Fixed-point quantization + EMB_DIM gate shared by the Lloyd
    trainer and the streaming ingest twin (stream_ivf_cell_assign):
    corpus-dimensional vectors only, coordinates as round(x * KM_SCALE)
    int64 — the bit-deterministic representation every assignment and
    centroid mean is computed in."""
    return emb.filter(F.size("embedding") == KM_DIM).select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * KM_SCALE).cast("long"),
        ).alias("q"),
    )


def km_train_centroids(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Run the fixed-point Lloyd loop (see ivf_kmeans_lloyd doc) and
    return (persisted quantized frame, trained centroid dict). Shared
    by the registered trainer entry and the trained-quantizer ANN
    (similarity.ann_cosine_topk_ivf_trained), so 'the model the audit
    verified' and 'the model the index probes' are the same code."""
    emb = t(spark, sf_dir, "embeddings")
    # A NULL / empty / wrong-dimension vector cannot be assigned a cell
    # in KM_DIM-space, and the per-dim centroid sums index q[i] (ANSI:
    # INVALID_ARRAY_INDEX aborts the job on the first short array) —
    # train and assign only corpus-dimensional vectors (size(NULL) is
    # NULL, so NULL embeddings are filtered too). No-op on clean data.
    q = km_quantize(emb).persist()

    seeds = q.filter(F.col("vec_id") < KMEANS_K).collect()
    cent: dict[int, list[int]] = {
        int(r["vec_id"]): [int(v) for v in r["q"]] for r in seeds
    }
    # One array-of-sums aggregate instead of KM_DIM separate F.sum
    # columns (OPTIMIZATION_r12 §C2, guide §1.2/§7.3): the per-column
    # form cost ~0.3 s of py4j Column construction PER ITERATION on the
    # bench host — pure driver-side plan-build time, paid again every
    # round. One parsed expression builds the identical 64 SumAggregates
    # (SQL array indexing is 0-based like Column.__getitem__), so the
    # collected values — and the trained centroids — are bit-identical.
    sums_arr = F.expr(
        "array(" + ", ".join(f"sum(q[{i}])" for i in range(KM_DIM)) + ")"
    ).alias("s")
    for _ in range(KM_ITERS):
        sums = (
            km_assign(q, cent)
            .groupBy("cluster")
            .agg(F.count("*").alias("n"), sums_arr)
            .collect()
        )  # k rows x (dim+1) ints — metadata-sized driver state
        for r in sums:
            n = int(r["n"])
            # Python // floors like both engines' floor(sum/n); sums are
            # < 2^53 so the SQL double division is exact-then-floored too
            cent[int(r["cluster"])] = [int(v) // n for v in r["s"]]
    return q, cent


@register(
    "ivf_kmeans_lloyd",
    oracle=_km_oracle(),
    doc=(
        f"Full Lloyd k-means for IVF quantizer training: {KM_ITERS} "
        "centroid updates + a final assignment, k="
        f"{KMEANS_K} seeded deterministically from the first k vectors. "
        "Cross-engine determinism comes from FIXED-POINT arithmetic: "
        f"coordinates quantize to round(x * {KM_SCALE}) int64, so "
        "assignment dot products (<= 64 * (2^20)^2 << 2^53) and "
        "floor-div centroid means are exact integers on both engines — "
        "an iterative algorithm with float means would diverge on "
        "partial-sum order alone. Scale shape: per iteration, one "
        "map-only argmax over k broadcast-literal centroids (no "
        "shuffle) plus one map-side-combinable agg producing k rows x "
        f"{KM_DIM} per-dim sums; centroid state (k x {KM_DIM} ints) "
        "lives on the driver — metadata-sized, like any trained-model "
        "broadcast. Data never re-partitions across iterations. Ties "
        "break to the lowest centroid id, empty clusters keep their "
        "previous centroid (oracle: COALESCE)."
    ),
    tags=("datapipe", "similarity", "iterative"),
)
def ivf_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, cent = km_train_centroids(spark, sf_dir)

    def assign(df: DataFrame) -> DataFrame:
        return km_assign(df, cent)

    l1 = {cid: sum(abs(v) for v in c) for cid, c in cent.items()}
    l1_map = F.create_map(
        *[F.lit(x) for cid in sorted(l1) for x in (cid, l1[cid])]
    )
    return (
        assign(q)
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .withColumn("centroid_l1", l1_map[F.col("cluster")].cast("long"))
        .orderBy("cluster")
    )


FRAME_STRIDE = 32


@register(
    "mm_frame_hashes",
    oracle=f"""
        WITH frames AS (
            SELECT doc_id,
                   md5(substr(text, i * {FRAME_STRIDE} + 1, {FRAME_STRIDE})) AS fh
            FROM documents,
                 unnest(generate_series(0,
                     CAST(greatest(ceil(len(text) * 1.0 / {FRAME_STRIDE}) - 1, 0)
                          AS BIGINT))) AS u(i)
            WHERE len(text) > 0
        )
        SELECT doc_id,
               count(*) AS n_frames,
               count(DISTINCT fh) AS n_distinct_frames,
               min(fh) AS min_frame_hash
        FROM frames
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc=(
        "Chunked payload fingerprinting: the payload (text stand-in per "
        "the multimodal module's convention) split into fixed "
        f"{FRAME_STRIDE}-byte frames, one md5 per frame — the per-frame "
        "content hashing a video dedup/integrity pass runs. posexplode "
        "over a computed offset sequence keeps it JVM-side; per-doc "
        "rollup counts repeated frames (n_distinct < n_frames reveals "
        "intra-payload repetition)."
    ),
    tags=("multimodal", "dedup"),
)
def mm_frame_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_frames = F.ceil(F.length("text") / F.lit(FRAME_STRIDE)).cast("long")
    frames = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("i"),
        F.col("text"),
    ).select(
        "doc_id",
        F.md5(F.substring(F.col("text"), F.col("i") * FRAME_STRIDE + 1, FRAME_STRIDE)).alias("fh"),
    )
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.countDistinct("fh").alias("n_distinct_frames"),
            F.min("fh").alias("min_frame_hash"),
        )
    )


# --- corpus mixing / budgeting (round-2 tail) ------------------------------


@register(
    "mix_source_temperature_weights",
    oracle=f"""
        WITH per AS (
            SELECT source,
                   CAST(sum(len({_TOKENS.format(x='text')})) AS BIGINT)
                       AS tokens_total,
                   count(*) AS n_docs
            FROM documents GROUP BY source
        ),
        tot AS (SELECT sum(sqrt(tokens_total)) AS z FROM per)
        SELECT source, tokens_total, n_docs,
               round(sqrt(tokens_total) / z, 6) AS weight,
               round(1e7 * (sqrt(tokens_total) / z) / tokens_total, 4)
                   AS epochs_at_10m
        FROM per, tot
        ORDER BY source
    """,
    doc=(
        "Temperature-based source mixing (alpha = 0.5): sampling weight "
        "w_s = sqrt(tokens_s) / sum_i sqrt(tokens_i) — the standard "
        "upweight-the-tail mix (multilingual-BERT exponent-smoothed "
        "sampling, Pile-style source weighting) that keeps small "
        "high-quality sources from being drowned by web crawl. "
        "epochs_at_10m = how many passes over each source a 10M-token "
        "budget implies — epochs >> 1 flags sources the mix would "
        "over-repeat. alpha = 0.5 is deliberate: sqrt is IEEE-exact on "
        "both engines where pow(x, 0.3) can differ by 1 ulp across "
        "libms. Plan: one map-side-combinable agg over the corpus, then "
        "arithmetic on a per-source frame of |sources| rows joined back "
        "via broadcast cross-join — nothing global touches data."
    ),
    tags=("datapipe", "sampling", "agg"),
)
def mix_source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(F.size(_tokens(F.col("text")))).alias("tokens_total"),
        F.count("*").alias("n_docs"),
    )
    tot = per.agg(F.sum(F.sqrt(F.col("tokens_total"))).alias("z"))
    w = F.sqrt(F.col("tokens_total")) / F.col("z")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tokens_total",
            "n_docs",
            F.round(w, 6).alias("weight"),
            F.round(F.lit(1e7) * w / F.col("tokens_total"), 4).alias("epochs_at_10m"),
        )
        .orderBy("source")
    )


TOKEN_BUDGET_PER_LANG = 2_000


@register(
    "sample_token_budget_per_lang",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lang,
                   len({_TOKENS.format(x='text')}) AS toks,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ),
        c AS (
            SELECT lang, toks,
                   sum(toks) OVER (PARTITION BY lang ORDER BY h, doc_id)
                       AS cum
            FROM d
        )
        SELECT lang, count(*) AS n_kept,
               CAST(sum(toks) AS BIGINT) AS tokens_kept
        FROM c WHERE cum <= {TOKEN_BUDGET_PER_LANG}
        GROUP BY lang
        ORDER BY lang
    """,
    doc=(
        f"Token-budget subsampling: each language keeps documents — in "
        "deterministic md5(doc_id) shuffle order, so the 'random' "
        "sample is reproducible with no RNG state — until the running "
        f"token total reaches {TOKEN_BUDGET_PER_LANG}. The cumulative "
        "sum is a window PARTITIONED BY lang (never global), ordered by "
        "a unique (hash, doc_id) key so RANGE/ROWS frames agree across "
        "engines. This is the per-language cap step of corpus balancing "
        "— one hash-partitioned shuffle on lang, then a streaming "
        "running sum within each partition."
    ),
    tags=("datapipe", "sampling", "window"),
)
def sample_token_budget_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(_tokens(F.col("text"))).alias("toks"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    cum = F.sum("toks").over(
        W.partitionBy("lang").orderBy("h", "doc_id")
    )
    return (
        d.withColumn("cum", cum)
        .filter(F.col("cum") <= TOKEN_BUDGET_PER_LANG)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("toks").alias("tokens_kept"),
        )
        .orderBy("lang")
    )


@register(
    "emb_dim_stats",
    oracle="""
        SELECT u.i - 1 AS dim,
               round(avg(embedding[u.i]::DOUBLE), 6) AS mean,
               round(stddev(embedding[u.i]::DOUBLE), 6) AS std,
               round(min(embedding[u.i]::DOUBLE), 6) AS vmin,
               round(max(embedding[u.i]::DOUBLE), 6) AS vmax
        FROM embeddings, unnest(generate_series(1, 64)) AS u(i)
        GROUP BY u.i
        ORDER BY dim
    """,
    doc=(
        "Per-dimension embedding statistics (mean/std/min/max over all "
        "64 dims): the feature-drift / normalization audit a vector "
        "pipeline runs before quantization or index training — a dim "
        "with collapsed variance is dead weight, a shifted mean breaks "
        "a dot-product index built on centered data. posexplode fans "
        "each vector to (dim, value) rows — 64x row growth but tiny "
        "fixed-width rows — then one map-side-combinable agg keyed on "
        "dim (64 groups, perfectly parallel, no skew possible). Floats "
        "widen to double BEFORE aggregation on both engines."
    ),
    tags=("datapipe", "similarity", "agg"),
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    x = F.col("x").cast("double")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.round(F.avg(x), 6).alias("mean"),
            F.round(F.stddev(x), 6).alias("std"),
            F.round(F.min(x), 6).alias("vmin"),
            F.round(F.max(x), 6).alias("vmax"),
        )
        .orderBy("dim")
    )


CURATION_MIN_TOKS = 10
CURATION_BUDGET = 3_000


@register(
    "corpus_curation_pipeline",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lang, source,
                   len({_TOKENS.format(x='text')}) AS toks,
                   length(replace(trim(regexp_replace(text, '{WS_RE}', ' ', 'g')),
                                  ' ', '')) * 1.0
                       / len({_TOKENS.format(x='text')}) AS alen,
                   md5(lower(trim(regexp_replace(text, '{WS_RE}', ' ', 'g'))))
                       AS fp
            FROM documents
        ),
        quality AS (
            SELECT * FROM d
            WHERE toks >= {CURATION_MIN_TOKS} AND alen BETWEEN 2 AND 12
        ),
        deduped AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                          AS rn
                FROM quality
            ) WHERE rn = 1
        ),
        budgeted AS (
            SELECT * FROM (
                SELECT *, sum(toks) OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
                FROM deduped
            ) WHERE cum <= {CURATION_BUDGET}
        )
        SELECT lang, source, count(*) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS n_tokens
        FROM budgeted
        GROUP BY lang, source
        ORDER BY lang, source
    """,
    doc=(
        "End-to-end corpus curation as ONE declarative plan — the "
        "composition story: quality gate (token count >= "
        f"{CURATION_MIN_TOKS}, mean token length in [2, 12]) -> exact "
        "dedup keep-first (row_number over fingerprint) -> per-language "
        f"token budget ({CURATION_BUDGET:,} tokens, deterministic "
        "md5(doc_id) shuffle order) -> per-(lang, source) yield stats. "
        "Catalyst fuses all four stages: the quality filter runs at the "
        "scan, the dedup and budget windows are both hash-partitioned "
        "(fp, lang — never global), and nothing materializes between "
        "stages. A four-notebook-cell pipeline in one optimizer-visible "
        "query; each stage also exists standalone "
        "(text_quality_score, dedup_exact_keep_first, "
        "sample_token_budget_per_lang)."
    ),
    tags=("datapipe", "text", "window", "pipeline"),
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks_arr = _tokens(F.col("text"))
    norm = F.trim(F.regexp_replace(F.col("text"), WS_RE, " "))
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks_arr).alias("toks"),
        (
            F.length(F.regexp_replace(norm, " ", ""))
            / F.size(toks_arr)
        ).alias("alen"),
        F.md5(F.lower(norm)).alias("fp"),
    )
    quality = d.filter(
        (F.col("toks") >= CURATION_MIN_TOKS) & F.col("alen").between(2, 12)
    )
    deduped = (
        quality.withColumn(
            "rn", F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )
    budgeted = (
        deduped.withColumn(
            "cum",
            F.sum("toks").over(
                W.partitionBy("lang").orderBy(
                    F.md5(F.col("doc_id").cast("string")), "doc_id"
                )
            ),
        )
        .filter(F.col("cum") <= CURATION_BUDGET)
    )
    return (
        budgeted.groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").cast("long").alias("n_tokens"))
        .orderBy("lang", "source")
    )


def _leakage_oracle() -> str:
    from coviddatapipeline_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _minhash_sql,
    )

    pairs_sql = _minhash_sql()
    split_case = (
        f"CASE WHEN {_BUCKET_SQL} < 80 THEN 'train' "
        f"WHEN {_BUCKET_SQL} < 90 THEN 'val' ELSE 'test' END"
    )
    return f"""
        WITH neardups AS ({pairs_sql}),
        splits AS (SELECT doc_id, {split_case} AS split FROM documents)
        SELECT least(sa.split, sb.split) AS split_lo,
               greatest(sa.split, sb.split) AS split_hi,
               count(*) AS n_pairs,
               count(CASE WHEN sa.split != sb.split THEN 1 END) AS n_leaking
        FROM neardups p
        JOIN splits sa ON sa.doc_id = p.doc_a
        JOIN splits sb ON sb.doc_id = p.doc_b
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


@register(
    "split_leakage_audit",
    oracle=_leakage_oracle(),
    doc=(
        "Cross-split contamination audit: every verified near-duplicate "
        "pair (the full MinHash-LSH pipeline, Jaccard >= 0.7) labeled "
        "with the train/val/test assignment of both members — pairs "
        "whose members land in DIFFERENT splits are evaluation "
        "leakage: the val/test example has a near-copy in train, so "
        "metrics on it are memorization, not generalization. This is "
        "the audit run BEFORE training, composed from two existing "
        "primitives (deterministic md5 split + LSH near-dup), both "
        "pure functions of doc content/id, so the audit is "
        "reproducible across engines and partitionings. Scale cost is "
        "the LSH pipeline's (sum bucket^2); the split join adds two "
        "hash joins against a two-column projection of the corpus."
    ),
    tags=("datapipe", "dedup", "audit"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    docs = t(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    splits = docs.select(
        "doc_id",
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.count(F.when(F.col("split_a") != F.col("split_b"), 1)).alias(
                "n_leaking"
            ),
        )
        .orderBy("split_lo", "split_hi")
    )


N_SHARDS = 16


@register(
    "train_order_global_shuffle",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id,
                   len({_TOKENS.format(x='text')}) AS n_tok,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % {N_SHARDS} AS shard,
                   md5(CAST(doc_id AS VARCHAR)) AS okey
            FROM documents
        )
        SELECT shard,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               arg_min(doc_id, okey) AS first_doc_id,
               arg_max(doc_id, okey) AS last_doc_id
        FROM keyed
        GROUP BY shard
        ORDER BY shard
    """,
    doc=(
        "Deterministic global training-order shuffle: shard = "
        "md5(doc_id) mod N, within-shard order = the md5 hex itself — "
        "a reproducible permutation that is a pure function of doc_id "
        "(no RNG state to ship, identical on every engine and every "
        "re-run, the property epoch-resumable dataloaders need). The "
        "materialization at scale is repartition(shard) + "
        "sortWithinPartitions(okey) — ONE hash shuffle, no global "
        "sort; this entry emits the per-shard audit (doc/token counts "
        "balanced by the uniform hash, plus the first/last doc in "
        "training order as min/max over the order key) that validates "
        "the permutation without materializing it."
    ),
    tags=("datapipe", "sampling"),
)
def train_order_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    okey = F.md5(F.col("doc_id").cast("string"))
    keyed = docs.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_tok"),
        (
            F.conv(F.substring(okey, 1, 8), 16, 10).cast("long") % N_SHARDS
        ).alias("shard"),
        okey.alias("okey"),
    )
    return (
        keyed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min(F.struct("okey", "doc_id")).getField("doc_id").alias("first_doc_id"),
            F.max(F.struct("okey", "doc_id")).getField("doc_id").alias("last_doc_id"),
        )
        .orderBy("shard")
    )


SAMPLE_K = 50


@register(
    "sample_bottomk_per_source",
    oracle=f"""
        WITH ranked AS (
            SELECT source, doc_id,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)))
                       AS rn
            FROM documents
        )
        SELECT source,
               count(*) AS n_total,
               CAST(count(CASE WHEN rn <= {SAMPLE_K} THEN 1 END) AS BIGINT)
                   AS n_kept,
               CAST(sum(CASE WHEN rn <= {SAMPLE_K} THEN doc_id END) AS BIGINT)
                   AS kept_id_sum
        FROM ranked
        GROUP BY source
        ORDER BY source
    """,
    doc=(
        "Deterministic uniform sample of K docs per source via "
        "BOTTOM-K-BY-HASH: rank each source's docs by md5(doc_id) and "
        "keep the first K. Because md5 is uniform and content-blind, "
        "this IS a uniform random sample — but reproducible across "
        "runs, engines, partitionings, and INCREMENTAL growth (a doc's "
        "hash never changes, so re-sampling a grown corpus keeps "
        "maximal overlap with the previous sample — the property "
        "reservoir sampling loses the moment you re-run it). One "
        "source-partitioned window, no global sort; kept_id_sum is the "
        "cross-engine checksum that the SAME docs were chosen, not "
        "just the same count."
    ),
    tags=("datapipe", "sampling"),
)
def sample_bottomk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    ranked = docs.select("source", "doc_id").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(F.col("rn") <= SAMPLE_K, 1)).alias("n_kept"),
            F.sum(F.when(F.col("rn") <= SAMPLE_K, F.col("doc_id"))).alias(
                "kept_id_sum"
            ),
        )
        .orderBy("source")
    )


CHUNK_TOKENS = 128  # tokens per training chunk
CHUNK_STRIDE = 96  # stride between chunk starts (32-token overlap)


@register(
    "pack_chunks_with_overlap",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, len({_TOKENS.format(x='text')}) AS n_tok
            FROM documents
        ),
        chunked AS (
            SELECT doc_id, source, n_tok,
                   CASE WHEN n_tok <= {CHUNK_TOKENS} THEN 1
                        ELSE CAST(ceil((n_tok - {CHUNK_TOKENS}) * 1.0
                                       / {CHUNK_STRIDE}) AS BIGINT) + 1
                   END AS n_chunks
            FROM toks
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS corpus_tokens,
               CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
               CAST(sum(least(n_tok, {CHUNK_TOKENS})
                        + (n_chunks - 1) * {CHUNK_TOKENS}) AS BIGINT)
                   AS emitted_tokens,
               round(sum(least(n_tok, {CHUNK_TOKENS})
                         + (n_chunks - 1) * {CHUNK_TOKENS}) * 1.0
                     / sum(n_tok), 4) AS duplication_factor
        FROM chunked
        GROUP BY source
        ORDER BY source
    """,
    doc=(
        f"Sliding-window chunking for long documents: {CHUNK_TOKENS}-"
        f"token chunks at stride {CHUNK_STRIDE} (a "
        f"{CHUNK_TOKENS - CHUNK_STRIDE}-token overlap preserves "
        "cross-boundary context) — the other half of dataloader prep "
        "next to pack_sequences_greedy: packing merges SHORT docs into "
        "windows, chunking splits LONG docs across them. Chunk counts "
        "and the emitted-token mass are CLOSED FORMS of the doc's token "
        "count (ceil arithmetic — no per-chunk explode needed for the "
        "audit, so the plan is one map + one map-side-combinable agg "
        "regardless of document length), and duplication_factor "
        "reports the token-inflation cost, the number you tune stride "
        "against. emitted = min(n, C) + (chunks-1) * C counts every "
        "chunk at the full window — i.e. the final short chunk is "
        "counted PADDED to C (what a fixed-shape batch actually "
        "costs), so duplication_factor folds in both overlap and "
        "final-chunk padding (invariant-tested against an explicit "
        "sliding-window enumeration in test_chunk_count_closed_form)."
    ),
    tags=("datapipe", "text"),
)
def pack_chunks_with_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(_tokens(F.col("text")))
    n_chunks = F.when(n_tok <= CHUNK_TOKENS, F.lit(1).cast("long")).otherwise(
        F.ceil((n_tok - CHUNK_TOKENS) / F.lit(float(CHUNK_STRIDE))).cast("long") + 1
    )
    emitted = (
        F.least(n_tok, F.lit(CHUNK_TOKENS)).cast("long")
        + (n_chunks - 1) * CHUNK_TOKENS
    )
    return (
        docs.select(
            "source",
            n_tok.alias("n_tok"),
            n_chunks.alias("n_chunks"),
            emitted.alias("emitted"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("corpus_tokens"),
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.sum("emitted").cast("long").alias("emitted_tokens"),
            F.round(F.sum("emitted") / F.sum("n_tok"), 4).alias(
                "duplication_factor"
            ),
        )
        .orderBy("source")
    )


@register(
    "split_unigram_kl_audit",
    oracle=f"""
        WITH tagged AS (
            SELECT CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
                        WHEN {_BUCKET_SQL} < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   unnest({_TOKENS.format(x='text')}) AS word
            FROM documents
        ),
        wc AS (
            SELECT split, word, count(*) AS c
            FROM tagged WHERE split IN ('train', 'val')
            GROUP BY split, word
        ),
        vocab AS (SELECT DISTINCT word FROM wc),
        v AS (SELECT count(*) AS vs FROM vocab),
        tot AS (SELECT split, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY split),
        probs AS (
            SELECT vocab.word,
                   (coalesce(tr.c, 0) + 1) * 1.0
                       / ((SELECT n FROM tot WHERE split = 'train') + v.vs) AS p_train,
                   (coalesce(va.c, 0) + 1) * 1.0
                       / ((SELECT n FROM tot WHERE split = 'val') + v.vs) AS p_val
            FROM vocab
            CROSS JOIN v
            LEFT JOIN (SELECT word, c FROM wc WHERE split = 'train') tr USING (word)
            LEFT JOIN (SELECT word, c FROM wc WHERE split = 'val') va USING (word)
        )
        SELECT (SELECT n FROM tot WHERE split = 'train') AS n_train_tokens,
               (SELECT n FROM tot WHERE split = 'val') AS n_val_tokens,
               (SELECT vs FROM v) AS vocab_size,
               round(sum(p_val * ln(p_val / p_train)), 4) AS kl_val_train
        FROM probs
    """,
    doc=(
        "Split distribution-shift audit: add-one-smoothed KL divergence "
        "of the VAL split's word-unigram distribution from TRAIN's, "
        "over their joint vocabulary — the eval-hygiene check that the "
        "deterministic hash split actually produced exchangeable "
        "samples (a near-zero KL; a large one means val measures a "
        "different distribution than the model trains on, e.g. after a "
        "per-source or time-based split). Composes the md5 split with "
        "the token pipeline: one combinable (split, word) count, a "
        "vocab-sized outer join-back, and scalar totals riding as "
        "subquery folds. The same shape monitors train-vs-INCOMING "
        "drift when pointed at an ingest batch instead of val."
    ),
    tags=("datapipe", "text", "audit"),
)
def split_unigram_kl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    tagged = docs.select(
        split.alias("split"), F.explode(_tokens(F.col("text"))).alias("word")
    ).filter(F.col("split").isin("train", "val"))
    wc = tagged.groupBy("split", "word").agg(F.count("*").alias("c"))
    vocab = wc.select("word").distinct()
    v = F.broadcast(vocab.agg(F.count("*").alias("vs")))
    tot = wc.groupBy("split").agg(F.sum("c").cast("long").alias("n"))
    n_train = F.broadcast(
        tot.filter(F.col("split") == "train").select(F.col("n").alias("n_train"))
    )
    n_val = F.broadcast(
        tot.filter(F.col("split") == "val").select(F.col("n").alias("n_val"))
    )
    tr = wc.filter(F.col("split") == "train").select("word", F.col("c").alias("ct"))
    va = wc.filter(F.col("split") == "val").select("word", F.col("c").alias("cv"))
    probs = (
        vocab.join(tr, "word", "left")
        .join(va, "word", "left")
        .crossJoin(v)
        .crossJoin(n_train)
        .crossJoin(n_val)
        .select(
            ((F.coalesce(F.col("ct"), F.lit(0)) + 1) / (F.col("n_train") + F.col("vs"))).alias("p_train"),
            ((F.coalesce(F.col("cv"), F.lit(0)) + 1) / (F.col("n_val") + F.col("vs"))).alias("p_val"),
            "n_train",
            "n_val",
            "vs",
        )
    )
    return probs.agg(
        F.max("n_train").alias("n_train_tokens"),
        F.max("n_val").alias("n_val_tokens"),
        F.max("vs").alias("vocab_size"),
        F.round(F.sum(F.col("p_val") * F.log(F.col("p_val") / F.col("p_train"))), 4).alias(
            "kl_val_train"
        ),
    )


# ---------------------------------------------------------------------------
# Quality-weighted Bernoulli downsampling (importance sampling, integer-exact)
# ---------------------------------------------------------------------------

_WS_SALT = "wsamp:"  # decorrelates this sampler's coin from every other md5 use


@register(
    "sample_weighted_bernoulli",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, source,
                   len({_TOKENS.format(x='text')}) AS n_tok,
                   len(list_filter({_TOKENS.format(x='text')},
                                   w -> list_contains({_SW_SQL}, w))) AS n_stop
            FROM documents
        ),
        weighted AS (
            SELECT doc_id, source,
                   least(n_tok, 100) * 50
                   + least((n_stop * 12500) // n_tok, 5000) AS w_e4,
                   CAST(concat('0x', substr(md5(concat('{_WS_SALT}',
                        CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                       % 10000 AS coin
            FROM scored
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(w_e4) AS BIGINT) AS expected_kept_e4,
               CAST(count(CASE WHEN coin < w_e4 THEN 1 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN coin < w_e4 THEN doc_id END) AS BIGINT)
                   AS kept_id_sum,
               CAST(count(CASE WHEN coin < w_e4 THEN 1 END) * 10000
                    // count(*) AS BIGINT) AS kept_rate_e4
        FROM weighted
        GROUP BY source
        ORDER BY source
    """,
    doc=(
        "Quality-WEIGHTED Bernoulli downsampling — the importance-"
        "sampling counterpart of the uniform samplers (bottom-k, "
        "budget, balanced): each document is kept with probability "
        "proportional to an integer quality weight (length saturation "
        "+ stopword density, the text_quality_score shape recomputed "
        "entirely in integer arithmetic: weight and coin are both "
        "exact e4 integers, so the accept decision has NO float "
        "boundary anywhere — the lesson of the round-3 rounding-tie "
        "class applied at design time). The coin is a salted "
        "md5(doc_id) residue: content-blind, reproducible across "
        "runs/engines/partitionings, and independent of every other "
        "sampler's hash stream by the salt. Map-only per-row math + "
        "one combinable groupBy — the 100 TB shape; expected_kept_e4 "
        "vs n_kept exposes realized-vs-expected sampling error, "
        "kept_id_sum is the same-docs checksum."
    ),
    tags=("datapipe", "sampling", "text"),
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tok"),
        F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS))).alias("n_stop"),
    )
    weighted = scored.select(
        "doc_id",
        "source",
        (
            F.least(F.col("n_tok"), F.lit(100)) * 50
            + F.least(F.expr("(n_stop * 12500) DIV n_tok"), F.lit(5000))
        ).alias("w_e4"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(_WS_SALT), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 10000
        ).alias("coin"),
    )
    kept = F.col("coin") < F.col("w_e4")
    return (
        weighted.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("w_e4").alias("expected_kept_e4"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id"))).alias("kept_id_sum"),
        )
        .withColumn(
            "kept_rate_e4", F.expr("CAST((n_kept * 10000) DIV n_docs AS BIGINT)")
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Temperature-mix epoch schedule (integer-exact training-mix planning)
# ---------------------------------------------------------------------------

MIX_BUDGET_TOKENS = 1_000_000  # target tokens per training epoch plan


@register(
    "mix_epoch_schedule",
    oracle=f"""
        WITH c AS (
            SELECT source,
                   CAST(sum(len({_TOKENS.format(x='text')})) AS BIGINT) AS corpus_tokens
            FROM documents GROUP BY source
        ),
        w AS (
            SELECT source, corpus_tokens,
                   CAST(floor(sqrt(corpus_tokens)) AS BIGINT) AS weight_isqrt
            FROM c
        ),
        tot AS (SELECT CAST(sum(weight_isqrt) AS BIGINT) AS wsum FROM w)
        SELECT w.source, w.corpus_tokens, w.weight_isqrt,
               CAST(({MIX_BUDGET_TOKENS} * w.weight_isqrt) // tot.wsum AS BIGINT)
                   AS target_tokens,
               CAST((({MIX_BUDGET_TOKENS} * w.weight_isqrt) // tot.wsum) * 100
                    // w.corpus_tokens AS BIGINT) AS epochs_e2,
               CAST(CASE WHEN (({MIX_BUDGET_TOKENS} * w.weight_isqrt) // tot.wsum)
                              * 100 // w.corpus_tokens > 100
                         THEN 1 ELSE 0 END AS INT) AS upsampled
        FROM w CROSS JOIN tot
        ORDER BY w.source
    """,
    doc=(
        "Temperature-mix epoch schedule: the planning step that turns "
        "per-source corpus sizes into 'how many epochs of each source "
        "does a token budget buy'. Source weights follow alpha=0.5 "
        "temperature sampling (the multilingual-pretraining standard "
        "that upweights small sources relative to proportional "
        "sampling), computed as INTEGER sqrt — floor(sqrt(tokens)) is "
        "exact on both engines since corpus counts sit far below "
        "2^53 — so target tokens, epoch counts (e2 fixed point), and "
        "the upsampled flag are all integer division with no float "
        "share anywhere, the same discipline as the weighted sampler. "
        "Complements mix_source_temperature_weights (which reports the "
        "float shares): THIS is the artifact a dataloader consumes. "
        "One combinable token-count shuffle; the schedule itself is "
        "sources-sized metadata joined back as a broadcast scalar."
    ),
    tags=("datapipe", "sampling", "text"),
)
def mix_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.size(_tokens(F.col("text"))).alias("n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").alias("corpus_tokens"))
    )
    w = c.withColumn(
        "weight_isqrt", F.floor(F.sqrt(F.col("corpus_tokens"))).cast("long")
    )
    tot = w.agg(F.sum("weight_isqrt").alias("wsum"))
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_tokens",
            F.expr(f"CAST(({MIX_BUDGET_TOKENS} * weight_isqrt) DIV wsum AS BIGINT)"),
        )
        .withColumn(
            "epochs_e2",
            F.expr("CAST((target_tokens * 100) DIV corpus_tokens AS BIGINT)"),
        )
        .withColumn("upsampled", (F.col("epochs_e2") > 100).cast("int"))
        .select(
            "source",
            "corpus_tokens",
            "weight_isqrt",
            "target_tokens",
            "epochs_e2",
            "upsampled",
        )
        .orderBy("source")
    )


@register(
    "mm_frame_dup_crossdoc",
    oracle=f"""
        WITH frames AS (
            SELECT doc_id,
                   md5(substr(text, i * {FRAME_STRIDE} + 1, {FRAME_STRIDE})) AS fh
            FROM documents,
                 unnest(generate_series(0,
                     CAST(greatest(ceil(len(text) * 1.0 / {FRAME_STRIDE}) - 1, 0)
                          AS BIGINT))) AS u(i)
            WHERE len(text) > 0
        ),
        by_hash AS (
            SELECT fh,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_occ
            FROM frames GROUP BY fh
        ),
        ranked AS (
            SELECT fh, n_docs, n_occ,
                   row_number() OVER (ORDER BY n_docs DESC, n_occ DESC, fh) AS rank
            FROM by_hash WHERE n_docs >= 2
        )
        SELECT CAST(rank AS BIGINT) AS rank, fh, n_docs, n_occ
        FROM ranked WHERE rank <= 20
        ORDER BY rank
    """,
    doc=(
        "Cross-document frame-level dedup: the per-frame content "
        "hashes (mm_frame_hashes' fingerprinting pass) inverted into a "
        "hash -> documents index, reporting the top-20 frames shared "
        "by the most documents — intros, watermark cards, and "
        "boilerplate segments that appear across many videos and "
        "should be stripped or stored once (content-addressable "
        "chunk dedup, the video sibling of exact text dedup). One "
        "map-side frame hash per chunk, one combinable groupBy on the "
        "hash, a top-k over the >=2-doc survivors; at 100 TB the "
        "inverted index is the object a dedup store maintains "
        "incrementally, and a viral frame is exactly the hot-key case "
        "the df-cap/salting machinery of the shingle index handles."
    ),
    tags=("multimodal", "dedup"),
)
def mm_frame_dup_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_frames = F.ceil(F.length("text") / F.lit(FRAME_STRIDE)).cast("long")
    frames = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("i"), "text"
    ).select(
        "doc_id",
        F.md5(
            F.substring(F.col("text"), F.col("i") * FRAME_STRIDE + 1, FRAME_STRIDE)
        ).alias("fh"),
    )
    by_hash = frames.groupBy("fh").agg(
        F.countDistinct("doc_id").alias("n_docs"), F.count("*").alias("n_occ")
    )
    # distributed TakeOrdered first (shared frame hashes are
    # data-proportional in the worst case), then a constant-key
    # ranking window over the <= 20 surviving rows.
    top20 = (
        by_hash.filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), F.col("fh"))
        .limit(20)
    )
    w = W.partitionBy(const_key("fh")).orderBy(
        F.col("n_docs").desc(), F.col("n_occ").desc(), F.col("fh")
    )
    return (
        top20.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "fh", "n_docs", "n_occ")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Water-filling token-budget allocation across sources
# ---------------------------------------------------------------------------


@register(
    "mix_budget_waterfill",
    oracle=f"""
        WITH per AS (
            SELECT source,
                   CAST(sum(len({_TOKENS.format(x='text')})) AS BIGINT) AS s
            FROM documents GROUP BY source
        ),
        budget AS (
            SELECT CAST(sum(s) AS BIGINT) // 2 AS b,
                   CAST(count(*) AS BIGINT) AS k
            FROM per
        ),
        ordered AS (
            SELECT source, s,
                   CAST(row_number() OVER (ORDER BY s, source) AS BIGINT) AS i,
                   CAST(sum(s) OVER (ORDER BY s, source
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
            FROM per
        ),
        cand AS (
            SELECT o.i, o.s,
                   CAST((b.b - (o.pfx - o.s)) // (b.k - o.i + 1) AS BIGINT)
                       AS lvl,
                   CAST((b.b - (o.pfx - o.s)) % (b.k - o.i + 1) AS BIGINT)
                       AS rem,
                   CAST(coalesce(lag(o.s) OVER (ORDER BY o.i), 0) AS BIGINT)
                       AS s_prev
            FROM ordered o CROSS JOIN budget b
        ),
        split AS (
            SELECT i AS si, lvl, rem FROM cand
            WHERE s_prev <= lvl AND lvl < s
        )
        SELECT o.source, o.s AS tokens,
               CAST(CASE WHEN sp.si IS NULL OR o.i < sp.si THEN o.s
                         ELSE sp.lvl + CASE WHEN o.i - sp.si < sp.rem
                                            THEN 1 ELSE 0 END
                    END AS BIGINT) AS allocated,
               CAST(CASE WHEN sp.si IS NULL OR o.i < sp.si THEN 1 ELSE 0 END
                    AS BIGINT) AS capped
        FROM ordered o LEFT JOIN split sp ON true
        ORDER BY o.source
    """,
    doc=(
        "Water-filling (max-min fair) token-budget allocation across "
        "sources — the allocator behind 'spend B tokens as evenly as "
        "possible, but a small source can only give what it has': "
        "sources sorted by size, the water level L solves "
        "prefix(m) + (k-m)*L = B at the unique split where "
        "s_m <= L < s_m+1, sources below the level are capped at "
        "their size, the rest get L with the integer remainder handed "
        "one token each to the first remainder sources in sort order "
        "— so the allocation is exact (sums to precisely B when "
        "B <= total, pytest-asserted) and deterministic with no "
        "fractional tokens. Every step is a window over the "
        "|sources|-row aggregate; the only data-sized work is the one "
        "combinable token count. The max-min fairness classic "
        "(Bertsekas & Gallager 1987, public) applied to corpus "
        "budgeting; complements the temperature-mix entry, which "
        "allocates by power law instead of fairness."
    ),
    tags=("datapipe", "planning", "agg"),
)
def mix_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(_tokens(F.col("text")))).alias("s"))
    )
    budget = per.agg(
        F.expr("CAST(sum(s) AS BIGINT) DIV 2").alias("b"),
        F.count("*").alias("k"),
    )
    # constant-key global windows: all of them run over the per-source
    # aggregate (k sources), never the documents table
    w_ord = W.partitionBy(const_key("source")).orderBy("s", "source")
    ordered = per.select(
        "source",
        F.col("s").cast("long").alias("s"),
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.sum("s").over(w_ord.rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("pfx"),
    )
    cand = ordered.crossJoin(F.broadcast(budget)).select(
        "i",
        "s",
        F.expr("CAST((b - (pfx - s)) DIV (k - i + 1) AS BIGINT)").alias("lvl"),
        F.expr("CAST((b - (pfx - s)) % (k - i + 1) AS BIGINT)").alias("rem"),
        F.coalesce(F.lag("s").over(W.partitionBy(const_key("i")).orderBy("i")), F.lit(0))
        .cast("long")
        .alias("s_prev"),
    )
    split = cand.filter(
        (F.col("s_prev") <= F.col("lvl")) & (F.col("lvl") < F.col("s"))
    ).select(F.col("i").alias("si"), "lvl", "rem")
    return (
        ordered.join(F.broadcast(split), F.lit(True), "left")
        .select(
            "source",
            F.col("s").alias("tokens"),
            F.expr(
                "CAST(CASE WHEN si IS NULL OR i < si THEN s"
                " ELSE lvl + CASE WHEN i - si < rem THEN 1 ELSE 0 END"
                " END AS BIGINT)"
            ).alias("allocated"),
            F.expr(
                "CAST(CASE WHEN si IS NULL OR i < si THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("capped"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Span-corruption (T5-style) planning
# ---------------------------------------------------------------------------

SPAN_CORRUPT_PCT = 15  # corrupted-token percentage
SPAN_MEAN = 3  # mean span length


@register(
    "pack_span_corruption_plan",
    oracle=f"""
        WITH per AS (
            SELECT doc_id,
                   CAST(len({_TOKENS.format(x='text')}) AS BIGINT) AS nt
            FROM documents
        ),
        plan AS (
            SELECT doc_id, nt,
                   nt * {SPAN_CORRUPT_PCT} // 100 AS n_masked,
                   (nt * {SPAN_CORRUPT_PCT} // 100 + {SPAN_MEAN} - 1)
                       // {SPAN_MEAN} AS n_spans
            FROM per
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS total_tokens,
               CAST(sum(n_masked) AS BIGINT) AS masked_tokens,
               CAST(sum(n_spans) AS BIGINT) AS n_spans,
               CAST(sum(nt - n_masked + n_spans) AS BIGINT) AS encoder_tokens,
               CAST(sum(n_masked + n_spans + 1) AS BIGINT) AS decoder_tokens,
               CAST(sum(n_masked) * 10000 // sum(nt) AS BIGINT)
                   AS realized_corrupt_e4
        FROM plan
    """,
    doc=(
        f"Span-corruption batch planning (Raffel et al. 2020 T5, "
        f"public): per document, {SPAN_CORRUPT_PCT}% of tokens are "
        f"masked in mean-{SPAN_MEAN} spans, and the plan reports the "
        f"EXACT encoder/decoder token totals a trainer must budget — "
        f"encoder = tokens - masked + sentinels, decoder = masked + "
        f"sentinels + 1 — as closed-form integer arithmetic per doc "
        f"(floor corruption, ceil span count), plus the realized e4 "
        f"corruption rate (below nominal because short docs floor to "
        f"0 masked — the rounding bias this audit makes visible "
        f"instead of discovering at OOM time). Map-only + one "
        f"combinable corpus aggregate; the span-corruption sibling of "
        f"the chunking and FFD packing entries."
    ),
    tags=("datapipe", "planning", "agg"),
)
def pack_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = t(spark, sf_dir, "documents").select(
        F.size(_tokens(F.col("text"))).cast("long").alias("nt")
    )
    plan = per.select(
        "nt",
        F.expr(f"nt * {SPAN_CORRUPT_PCT} DIV 100").alias("n_masked"),
        F.expr(
            f"(nt * {SPAN_CORRUPT_PCT} DIV 100 + {SPAN_MEAN} - 1)"
            f" DIV {SPAN_MEAN}"
        ).alias("n_spans"),
    )
    return plan.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("total_tokens"),
        F.sum("n_masked").cast("long").alias("masked_tokens"),
        F.sum("n_spans").cast("long").alias("n_spans"),
        F.sum(F.col("nt") - F.col("n_masked") + F.col("n_spans"))
        .cast("long")
        .alias("encoder_tokens"),
        F.sum(F.col("n_masked") + F.col("n_spans") + 1)
        .cast("long")
        .alias("decoder_tokens"),
        F.expr(
            "CAST(sum(n_masked) * 10000 DIV sum(nt) AS BIGINT)"
        ).alias("realized_corrupt_e4"),
    )


# ---------------------------------------------------------------------------
# Preference-pair construction by quality margin (DPO/RM data prep)
# ---------------------------------------------------------------------------


@register(
    "pref_pairs_by_quality",
    oracle=f"""
        WITH q AS (
            SELECT doc_id, source,
                   len({_TOKENS.format(x='text')}) AS nt,
                   len(list_filter({_TOKENS.format(x='text')},
                                   w -> list_contains({_SW_SQL}, w))) AS ns
            FROM documents
        ),
        scored AS (
            -- COALESCE(.., 0): a NULL-text doc scores 0 (worst). The
            -- mirrored asc/desc ranks NEED a total key — Spark places
            -- NULL first under ASC but DuckDB places it last, which
            -- silently breaks the hi + lo = n + 1 reversal invariant
            -- cross-engine (round-9 convergence; clean docs always
            -- score non-NULL).
            SELECT doc_id, source,
                   COALESCE(CAST(least(nt, 100)
                        * (50 * nt + 25 * least(5 * ns, 2 * nt))
                        // greatest(nt, 1) AS BIGINT), 0) AS q_e4
            FROM q
        ),
        ranked AS (
            SELECT source, doc_id, q_e4,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY q_e4 DESC, doc_id ASC) AS hi,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY q_e4 ASC, doc_id DESC) AS lo,
                   count(*) OVER (PARTITION BY source) AS n
            FROM scored
        ),
        pairs AS (
            SELECT h.source, h.doc_id AS chosen, l.doc_id AS rejected,
                   h.q_e4 - l.q_e4 AS margin_e4
            FROM ranked h JOIN ranked l
              ON h.source = l.source AND h.hi = l.lo AND h.hi <= h.n // 2
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(margin_e4) // count(*) AS BIGINT) AS mean_margin_e4,
               CAST(max(margin_e4) AS BIGINT) AS max_margin_e4,
               CAST(min(margin_e4) AS BIGINT) AS min_margin_e4
        FROM pairs
        GROUP BY source
        ORDER BY source
    """,
    doc=(
        "Preference-pair construction for reward-model / DPO training "
        "data: within each source, documents ranked by the integer e4 "
        "quality score pair best-with-worst inward (rank-i chosen vs "
        "rank-i-from-the-bottom rejected, i <= n/2) — the maximal-"
        "margin pairing that gives a preference trainer the cleanest "
        "signal first. The descending and ascending ranks use MIRRORED "
        "tie-breaks (doc_id asc / doc_id desc), which makes the two "
        "orders exact reversals of each other, so hi + lo = n + 1 "
        "holds for every document and a doc can never pair with "
        "itself, ties included — margins are provably >= 0. Reports "
        "per source: pair count and margin statistics in exact "
        "integers. Two windows per source partition plus one "
        "self-equi-join on (source, rank); the same shape at any "
        "corpus size."
    ),
    tags=("datapipe", "planning", "text"),
)
def pref_pairs_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.dedup import _QUALITY_E4

    docs = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("nt"),
        F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS))).alias("ns"),
    ).withColumn(
        # total score: NULL text -> 0 (see oracle comment)
        "q_e4",
        F.coalesce(F.expr(_QUALITY_E4), F.lit(0)),
    )
    w_hi = W.partitionBy("source").orderBy(F.col("q_e4").desc(), F.col("doc_id").asc())
    w_lo = W.partitionBy("source").orderBy(F.col("q_e4").asc(), F.col("doc_id").desc())
    ranked = scored.select(
        "source",
        "doc_id",
        "q_e4",
        F.row_number().over(w_hi).alias("hi"),
        F.row_number().over(w_lo).alias("lo"),
        F.count("*").over(W.partitionBy("source")).alias("n"),
    )
    h = ranked.select(
        "source",
        F.col("doc_id").alias("chosen"),
        F.col("q_e4").alias("q_hi"),
        F.col("hi").alias("i"),
        "n",
    )
    low = ranked.select(
        "source",
        F.col("doc_id").alias("rejected"),
        F.col("q_e4").alias("q_lo"),
        F.col("lo").alias("i"),
    )
    pairs = (
        h.join(low, ["source", "i"])
        .filter(F.col("i") <= F.expr("n DIV 2"))
        .select("source", (F.col("q_hi") - F.col("q_lo")).alias("margin_e4"))
    )
    return (
        pairs.groupBy("source")
        .agg(
            F.count("*").alias("n_pairs"),
            F.expr("CAST(sum(margin_e4) DIV count(*) AS BIGINT)").alias(
                "mean_margin_e4"
            ),
            F.max("margin_e4").cast("long").alias("max_margin_e4"),
            F.min("margin_e4").cast("long").alias("min_margin_e4"),
        )
        .select(
            "source",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "mean_margin_e4",
            "max_margin_e4",
            "min_margin_e4",
        )
        .orderBy("source")
    )


# --- exact integer perceptron (quality classifier training) -----------------

PCT_EPOCHS = 3  # batch updates; every epoch is one distributed pass

# Feature extraction shared by engine and oracle AS A CONTRACT (not
# code): [bias=1, n_chars, n_spaces, n_'e'] — all exact int64 column
# math, total on NULL text via COALESCE-to-0. Deliberately avoids the
# tokenizer so the entry has no cross-module kernel dependency.
_PCT_FEATS_SQL = """
        SELECT doc_id, source,
               CAST(1 AS BIGINT) AS x0,
               CAST(COALESCE(n_chars, 0) AS BIGINT) AS x1,
               CAST(COALESCE(length(text) - length(replace(text, ' ', '')), 0)
                    AS BIGINT) AS x2,
               CAST(COALESCE(length(text) - length(replace(text, 'e', '')), 0)
                    AS BIGINT) AS x3,
               CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
        FROM documents
"""


def _pct_cte_chain() -> tuple[str, str]:
    """(WITH-body, last-weights-CTE-name) for the unrolled perceptron
    fold — shared by the train oracle (which reports every epoch) and
    the apply oracle (which scores under the final weights): epoch k's
    misclassified set is evaluated under epoch k-1's weights (w0 = zero
    vector, so epoch 1 updates on every row — 0 <= 0), and the new
    weights are the old plus the misclassified sum of y*x. Every
    quantity is exact integer arithmetic; CASTs collapse DuckDB's
    HUGEINT sum promotion; COALESCE mirrors the engine's empty-set -> 0
    update (a fully-separated epoch stops moving the weights)."""
    parts = [f"WITH feats AS ({_PCT_FEATS_SQL}),"]
    prev_w = None  # CTE name holding (w0..w3) after epoch k
    for k in range(1, PCT_EPOCHS + 1):
        margin = (
            "0"
            if prev_w is None
            else f"(SELECT w0 FROM {prev_w}) * x0 + (SELECT w1 FROM {prev_w}) * x1"
            f" + (SELECT w2 FROM {prev_w}) * x2 + (SELECT w3 FROM {prev_w}) * x3"
        )
        parts.append(
            f"""e{k} AS (
            SELECT CAST(count(*) AS BIGINT) AS m,
                   CAST(COALESCE(sum(y * x0), 0) AS BIGINT) AS s0,
                   CAST(COALESCE(sum(y * x1), 0) AS BIGINT) AS s1,
                   CAST(COALESCE(sum(y * x2), 0) AS BIGINT) AS s2,
                   CAST(COALESCE(sum(y * x3), 0) AS BIGINT) AS s3
            FROM feats WHERE y * ({margin}) <= 0
        ),"""
        )
        base = ("0, 0, 0, 0" if prev_w is None else
                f"(SELECT w0 FROM {prev_w}), (SELECT w1 FROM {prev_w}), "
                f"(SELECT w2 FROM {prev_w}), (SELECT w3 FROM {prev_w})")
        parts.append(
            f"""wk{k} AS (
            SELECT b.c0 + e{k}.s0 AS w0, b.c1 + e{k}.s1 AS w1,
                   b.c2 + e{k}.s2 AS w2, b.c3 + e{k}.s3 AS w3
            FROM (SELECT {base}) AS b(c0, c1, c2, c3), e{k}
        ),"""
        )
        prev_w = f"wk{k}"
    body = "\n".join(parts)
    # strip the trailing comma of the last CTE
    body = body[: body.rfind(",")] + body[body.rfind(",") + 1 :]
    return body, prev_w


def _pct_oracle() -> str:
    body, _ = _pct_cte_chain()
    selects = [
        f"SELECT {k} AS epoch, wk{k}.w0, wk{k}.w1, wk{k}.w2, wk{k}.w3, "
        f"e{k}.m AS n_updates FROM wk{k}, e{k}"
        for k in range(1, PCT_EPOCHS + 1)
    ]
    return body + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY epoch"


@register(
    "quality_perceptron_train",
    oracle=_pct_oracle(),
    doc=(
        f"Distributed BATCH perceptron training in exact int64 — the "
        f"trainable-classifier counterpart of the fixed-point k-means: "
        f"{PCT_EPOCHS} epochs, each one distributed pass computing the "
        "misclassified set under the previous weights (zero init, so "
        "epoch 1 updates on every row) and the batch update "
        "w += sum(y*x) over it; features are exact integer column math "
        "([1, n_chars, n_spaces, n_'e'] predicting lang='en'), so "
        "weights, margins and update counts are bit-deterministic "
        "under ANY partitioning/summation order — no float gradient "
        "noise, the same reproducibility argument as the PageRank and "
        "Lloyd entries. The oracle replays the identical fold as an "
        "unrolled CTE chain. Scale: per epoch one map-side-combinable "
        "agg over the corpus (margins are a broadcast-literal "
        "expression); driver state is 4 ints — the classic "
        "parameter-server-free shape for linear models."
    ),
    tags=("datapipe", "ml", "iterative"),
)
def quality_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats, report = pct_train(spark, sf_dir)
    feats.unpersist()
    return spark.createDataFrame(
        report,
        "epoch int, w0 long, w1 long, w2 long, w3 long, n_updates long",
    ).orderBy("epoch")


def pct_margin(w: list[int]):
    """Broadcast-literal int64 margin expression under weights ``w``."""
    return (
        F.lit(int(w[0])) * F.col("x0") + F.lit(int(w[1])) * F.col("x1")
        + F.lit(int(w[2])) * F.col("x2") + F.lit(int(w[3])) * F.col("x3")
    )


def pct_features(docs: DataFrame) -> DataFrame:
    """Exact-int64 feature frame ([1, n_chars, n_spaces, n_'e'] plus
    the lang='en' label) from a documents-shaped frame. The single
    featurization shared by the trainer, the apply/gate entry, and the
    streaming admission twin (pipeline/streaming.py) — so the model
    the audit verified scores the same features the arrival path
    sees."""
    return docs.select(
        "doc_id",
        "source",
        F.lit(1).cast("long").alias("x0"),
        F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("x1"),
        F.coalesce(
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))),
            F.lit(0),
        ).cast("long").alias("x2"),
        F.coalesce(
            F.length("text") - F.length(F.replace(F.col("text"), F.lit("e"), F.lit(""))),
            F.lit(0),
        ).cast("long").alias("x3"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1)).alias("y"),
    )


def pct_verdicts(feats: DataFrame, w: list[int]) -> DataFrame:
    """Per-doc admission verdicts (doc_id, source, pred_en, true_en)
    under frozen weights ``w`` — the scoring kernel shared verbatim by
    the registered apply entry's per-source report and the streaming
    admission twin."""
    return feats.select(
        "doc_id",
        "source",
        F.when(pct_margin(w) > 0, F.lit(1)).otherwise(F.lit(0)).alias("pred_en"),
        F.when(F.col("y") == 1, F.lit(1)).otherwise(F.lit(0)).alias("true_en"),
    )


def pct_train(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[tuple]]:
    """Run the batch-perceptron fold and return (persisted feature
    frame, per-epoch report rows). Shared by the registered trainer
    entry and the apply/quality-gate entry, so 'the model the audit
    verified' and 'the model the gate scores with' are the same code —
    the km_train_centroids pattern. Caller unpersists the frame."""
    feats = pct_features(t(spark, sf_dir, "documents")).persist()

    w = [0, 0, 0, 0]
    report = []
    for epoch in range(1, PCT_EPOCHS + 1):
        row = (
            feats.filter((F.col("y") * pct_margin(w)) <= 0)
            .agg(
                F.count("*").alias("m"),
                *[
                    F.coalesce(F.sum(F.col("y") * F.col(f"x{i}")), F.lit(0))
                    .cast("long")
                    .alias(f"s{i}")
                    for i in range(4)
                ],
            )
            .collect()[0]
        )  # 5 ints — metadata-sized driver state, like the Lloyd sums
        w = [w[i] + int(row[f"s{i}"]) for i in range(4)]
        report.append((epoch, w[0], w[1], w[2], w[3], int(row["m"])))
    return feats, report


def _pct_apply_oracle() -> str:
    body, last_w = _pct_cte_chain()
    margin = (
        f"(SELECT w0 FROM {last_w}) * x0 + (SELECT w1 FROM {last_w}) * x1"
        f" + (SELECT w2 FROM {last_w}) * x2 + (SELECT w3 FROM {last_w}) * x3"
    )
    return f"""{body},
        scored AS (
            SELECT source, y,
                   CASE WHEN ({margin}) > 0 THEN 1 ELSE 0 END AS pred_en,
                   CASE WHEN y = 1 THEN 1 ELSE 0 END AS true_en
            FROM feats
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(pred_en) AS BIGINT) AS n_pred_en,
               CAST(sum(true_en) AS BIGINT) AS n_true_en,
               CAST(sum(CASE WHEN pred_en = true_en THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               CAST(sum(CASE WHEN pred_en = true_en THEN 1 ELSE 0 END)
                    * 10000 // count(*) AS BIGINT) AS accuracy_e4
        FROM scored
        GROUP BY source
        ORDER BY source NULLS FIRST
    """


@register(
    "quality_perceptron_apply",
    oracle=_pct_apply_oracle(),
    doc=(
        "The APPLY side of the trained quality classifier — the "
        "train/apply pairing the BPE (mine/encode) and IVF "
        "(train/probe) families follow: the batch-perceptron weights "
        "come from the SAME pct_train fold the trainer entry audits, "
        "then every document is scored with the broadcast-literal "
        "int64 margin (strictly positive => predicted English) and the "
        "per-source gate report aggregates predicted/true/correct "
        "counts and an exact e4 accuracy — the numbers a curation "
        "pipeline thresholds on before admitting a source. The oracle "
        "replays training AND scoring in one unrolled CTE chain. "
        "Scale: training is the trainer entry's cost; scoring is one "
        "map-only expression + a map-side-combinable groupBy on "
        "source — no shuffle of the corpus."
    ),
    tags=("datapipe", "ml", "iterative"),
)
def quality_perceptron_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats, report = pct_train(spark, sf_dir)
    w = list(report[-1][1:5])
    out = (
        pct_verdicts(feats, w)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("pred_en").cast("long").alias("n_pred_en"),
            F.sum("true_en").cast("long").alias("n_true_en"),
            F.sum((F.col("pred_en") == F.col("true_en")).cast("long"))
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "source", "n_docs", "n_pred_en", "n_true_en", "n_correct",
            F.expr("n_correct * 10000 div n_docs").alias("accuracy_e4"),
        )
        .orderBy("source")
    )
    # feats stays persisted — the returned plan reads it (the
    # km_train_centroids precedent; Spark evicts LRU under pressure)
    return out


# ---------------------------------------------------------------------------
# DSIR-style hashed-ngram importance (exact integers — no float logs)
# ---------------------------------------------------------------------------
#
# Data Selection via Importance Resampling (Xie et al. 2023, public)
# scores documents by how much more likely their hashed-ngram profile
# is under a TARGET distribution than under the SOURCE distribution.
# The published formulation sums per-ngram log-ratios; logs are
# transcendental and the two engines' libm last-ulp differences are a
# standing cross-engine tie risk (the rfm lesson), so this engine uses
# the exact-integer surrogate the verification contract allows: each
# bucket carries the e4-quantized likelihood RATIO as integer
# division (t_cnt * S * 10000) DIV (s_cnt * T), and a document's
# importance is the exact int64 SUM of its ngram occurrences' bucket
# ratios — rank-deterministic, bit-identical under any partitioning,
# and mirrored verbatim in SQL. (A monotone transform of the DSIR
# score per bucket, summed instead of multiplied — documented
# surrogate, not the published log-sum.)

DSIR_BUCKETS = 256
DSIR_TOPK = 20

# word-bigram -> bucket, the house 60-bit md5-prefix hash reduced mod
# DSIR_BUCKETS (same derivation both engines, like the MinHash base)
_DSIR_B_SQL = (
    "(CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) % " f"{DSIR_BUCKETS})"
)


def _dsir_grams_sql() -> str:
    return f"""
        grams AS (
            SELECT doc_id, lang, g,
                   {_DSIR_B_SQL} AS b
            FROM (
                SELECT doc_id, lang,
                       t[CAST(u.i AS INTEGER)] || ' ' ||
                           t[CAST(u.i AS INTEGER) + 1] AS g
                FROM (SELECT doc_id, lang, {_TOKENS.format(x='text')} AS t
                      FROM documents),
                     unnest(generate_series(1, len(t) - 1)) AS u(i)
            )
        ),
        buckets AS (
            SELECT b,
                   CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS t_cnt,
                   CAST(count(*) AS BIGINT) AS s_cnt
            FROM grams GROUP BY b
        ),
        tot AS (
            SELECT CAST(sum(t_cnt) AS BIGINT) AS t_total,
                   CAST(sum(s_cnt) AS BIGINT) AS s_total
            FROM buckets
        ),
        lr AS (
            SELECT b, t_cnt, s_cnt,
                   CASE WHEN tot.t_total = 0 THEN NULL
                        ELSE CAST(t_cnt * tot.s_total * 10000
                                  // (s_cnt * tot.t_total) AS BIGINT)
                   END AS lr_e4
            FROM buckets, tot
        )"""


def _dsir_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, b) — one row per word-bigram OCCURRENCE with its
    hash bucket. Shared by both DSIR entries."""
    toks = _tokens(F.col("text"))
    d = docs.select("doc_id", "lang", toks.alias("t")).filter(F.size("t") >= 2)
    g = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("t", i), F.element_at("t", i + 1)
            ),
        )
    ).alias("g")
    return d.select("doc_id", "lang", g).select(
        "doc_id",
        "lang",
        (F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long")
         % DSIR_BUCKETS).alias("b"),
    )


def _dsir_lr(grams: DataFrame) -> DataFrame:
    """(b, t_cnt, s_cnt, lr_e4) — the 256-bucket likelihood-ratio
    table (target = lang='en' ngram occurrences, source = all)."""
    buckets = grams.groupBy("b").agg(
        F.count(F.when(F.col("lang") == "en", 1)).cast("long").alias("t_cnt"),
        F.count("*").cast("long").alias("s_cnt"),
    )
    tot = buckets.agg(
        F.sum("t_cnt").cast("long").alias("t_total"),
        F.sum("s_cnt").cast("long").alias("s_total"),
    )
    return buckets.crossJoin(F.broadcast(tot)).select(
        "b",
        "t_cnt",
        "s_cnt",
        F.when(F.col("t_total") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.expr("CAST(t_cnt * s_total * 10000 DIV (s_cnt * t_total) AS BIGINT)")
        )
        .alias("lr_e4"),
    )


@register(
    "dsir_bucket_likelihood_profile",
    oracle=f"""
        WITH {_dsir_grams_sql()}
        SELECT b AS bucket, t_cnt, s_cnt, lr_e4
        FROM lr
        ORDER BY bucket
    """,
    doc=(
        f"DSIR-style hashed-ngram importance, part 1 — the bucket "
        f"model (Xie et al. 2023, public): every word-bigram "
        f"occurrence hashes into one of {DSIR_BUCKETS} buckets (60-bit "
        f"md5-prefix reduced mod {DSIR_BUCKETS}, the MinHash base-hash "
        f"derivation), and each bucket reports target count (lang="
        f"'en'), source count (all docs), and the e4-quantized "
        f"likelihood ratio as EXACT integer division (t_cnt*S*10000) "
        f"DIV (s_cnt*T) — the engine's integer surrogate for the "
        f"published per-bucket log-ratio, chosen because libm log "
        f"last-ulp differences are a standing cross-engine tie risk. "
        f"Scale: one linear ngram explode + a {DSIR_BUCKETS}-key "
        f"map-side-combinable agg; the model is {DSIR_BUCKETS} rows of "
        f"driver-free state that broadcasts anywhere (int64 headroom: "
        f"t_cnt*S*1e4 needs the DECIMAL(38) form past ~1e14 ngram "
        f"occurrences — the KMV wide-integer precedent)."
    ),
    tags=("datapipe", "sampling", "agg"),
)
def dsir_bucket_likelihood_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = _dsir_grams(t(spark, sf_dir, "documents"))
    return _dsir_lr(grams).select(
        F.col("b").alias("bucket"), "t_cnt", "s_cnt", "lr_e4"
    ).orderBy("bucket")


@register(
    "dsir_doc_importance_topk",
    oracle=f"""
        WITH {_dsir_grams_sql()},
        scored AS (
            SELECT g.doc_id, max(g.lang) AS lang,
                   CAST(count(*) AS BIGINT) AS n_ngrams,
                   CAST(sum(lr.lr_e4) AS BIGINT) AS importance_e4
            FROM grams g JOIN lr ON g.b = lr.b
            GROUP BY g.doc_id
        )
        SELECT CAST(row_number() OVER (ORDER BY importance_e4 DESC, doc_id)
                    AS BIGINT) AS rank,
               doc_id, lang, n_ngrams, importance_e4
        FROM scored
        QUALIFY rank <= {DSIR_TOPK}
        ORDER BY rank
    """,
    doc=(
        f"DSIR-style hashed-ngram importance, part 2 — document "
        f"scoring: each document's ngram occurrences join the "
        f"broadcast {DSIR_BUCKETS}-row bucket table and its importance "
        f"is the EXACT int64 sum of their e4 likelihood ratios "
        f"(deterministic under any partitioning — no float "
        f"accumulation anywhere); top-{DSIR_TOPK} documents by "
        f"(importance desc, doc_id) via distributed TakeOrdered, the "
        f"selection step a DSIR resampling run thresholds on. Scale: "
        f"map-only scoring behind a broadcast join + one "
        f"map-side-combinable per-doc agg; no shuffle of the corpus "
        f"beyond the doc_id agg."
    ),
    tags=("datapipe", "sampling", "topk"),
)
def dsir_doc_importance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    grams = _dsir_grams(t(spark, sf_dir, "documents"))
    lr = _dsir_lr(grams).select("b", "lr_e4")
    scored = (
        grams.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count("*").cast("long").alias("n_ngrams"),
            F.sum("lr_e4").cast("long").alias("importance_e4"),
        )
    )
    top = scored.orderBy(F.col("importance_e4").desc(), "doc_id").limit(DSIR_TOPK)
    return top.withColumn(
        # constant-key global window over the <= DSIR_TOPK limit() rows
        "rank",
        F.row_number()
        .over(
            _W.partitionBy(const_key("doc_id")).orderBy(
                F.col("importance_e4").desc(), "doc_id"
            )
        )
        .cast("long"),
    ).select("rank", "doc_id", "lang", "n_ngrams", "importance_e4").orderBy("rank")
