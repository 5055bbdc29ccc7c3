"""Corpus-wide duplicated-SPAN extraction and removal — the output side
of exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better", public; their ExactSubstr tool).

``dedup_exact_substring_runs`` (operators.dedup) reports per-PAIR
longest shared runs — a diagnostic. A training-data pipeline also needs
the *transform*: for every document, the maximal token spans that are
duplicated anywhere in the corpus, and the document with those spans
cut out. The reference tool does this with a suffix array over the
concatenated corpus — a single-machine construction. The Spark-first
re-expression needs NO pair join and no suffix array:

1. every k-token rolling window is hashed with its position (the same
   guarded builder as the run diagnostic, ``dedup.kgram_window_structs``);
2. a window is *duplicated* iff its hash occurs >= ``min_count`` times
   corpus-wide (within-doc repeats count, matching the concatenated-
   corpus semantics of the suffix-array formulation) — ONE combinable
   groupBy on the hash, no doc x doc anything;
3. each document's duplicated window positions are merged into maximal
   spans with a per-doc gaps-and-islands window: equal-width windows
   sorted by position belong to one span while the position step is
   <= k (overlap or exact adjacency of their [pos, pos+k-1] token
   ranges);
4. removal re-joins the merged spans to the documents and drops every
   covered token with JVM higher-order functions (transform / filter /
   exists — no UDF).

This removes EVERY occurrence of a duplicated span (the behavior of the
public deduplicate-text-datasets tool); a keep-one-copy policy is a
downstream choice (e.g. exempt the first occurrence per hash) and is
deliberately not baked in here.

100 TB posture: stage 2 is a map-side-combinable aggregate whose output
is only the duplicated-hash set; the join back to window occurrences is
a hash-partitioned equi-join on the hash where boilerplate hot keys are
exactly the AQE-skew-join / bloom-prefilter case. Stages 3-4 are per-doc
windows and per-row array algebra — embarrassingly parallel. Nothing in
the plan grows faster than the corpus itself.

Registration: the registry is frozen at 255 this round (VERDICT r03 #2 /
r04 #2); the oracle SQL below is written, tested by the unit suite via a
live DuckDB differential, and queued for registration in round 7
(NEXT.md). The driver-facing entry will be a thin @register wrapper over
these functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from coviddatapipeline_spark.operators.dedup import K_GRAM, kgram_window_structs
from coviddatapipeline_spark.operators.text import _TOKENS, _tokens

MIN_COUNT = 2  # a window is duplicated iff its hash occurs >= this corpus-wide


def _kgram_positions(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, h): every k-token rolling window, short-doc safe."""
    tk = _tokens(F.col("text"))
    return docs.select(
        "doc_id", F.explode(kgram_window_structs(tk, k)).alias("w")
    ).select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))


def duplicate_spans(
    docs: DataFrame, k: int = K_GRAM, min_count: int = MIN_COUNT
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens) — maximal 1-based
    token spans of ``docs`` (columns ``doc_id``, ``text``) covered by
    k-gram windows whose hash occurs >= ``min_count`` times corpus-wide.
    Spans are sorted per doc and non-overlapping by construction."""
    kg = _kgram_positions(docs, k)
    dup = (
        kg.groupBy("h")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_count)
        .select("h")
    )
    hits = kg.join(dup, "h").select("doc_id", "pos")
    wl = W.partitionBy("doc_id").orderBy("pos")
    # new island where the position step exceeds k: the previous
    # window's token range [p, p+k-1] neither overlaps nor touches this
    # one's; running sum of the break flag numbers the islands
    flagged = hits.withColumn(
        "brk",
        F.when(
            F.col("pos") - F.lag("pos").over(wl) <= k, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "island",
        F.sum("brk").over(wl.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        flagged.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame, k: int = K_GRAM, min_count: int = MIN_COUNT
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, clean_text) — every document with
    all corpus-duplicated spans (per ``duplicate_spans``) cut out of its
    whitespace-normalized token stream. Pure column algebra: the spans
    ride back per doc as an array and a transform/filter/exists chain
    drops covered tokens — no UDF, no collect."""
    spans = duplicate_spans(docs, k, min_count)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toks = _tokens(F.col("text"))
    sp = F.coalesce(
        F.col("spans"),
        F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
    )
    indexed = F.transform(
        toks, lambda x, i: F.struct(x.alias("tok"), (i + 1).alias("p"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            sp,
            lambda r: (s["p"] >= r["span_start"]) & (s["p"] <= r["span_end"]),
        ),
    )
    return (
        docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
            F.concat_ws(" ", F.transform(kept, lambda s: s["tok"])).alias(
                "clean_text"
            ),
        )
    )


def _kgram_cte(k: int) -> str:
    """Shared DuckDB CTE prefix: toks + positional k-gram hashes,
    mirroring ``_kgram_positions`` (empty series for short docs)."""
    return f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS.format(x='text')} AS tk FROM documents
        ),
        kg AS (
            SELECT doc_id, u.i AS pos,
                   md5(array_to_string(tk[u.i:u.i + {k - 1}], ' ')) AS h
            FROM toks,
                 unnest(generate_series(1, greatest(len(tk) - {k - 1}, 0)))
                     AS u(i)
        ),
        dup AS (
            SELECT h FROM (SELECT h, count(*) AS occ FROM kg GROUP BY h)
            WHERE occ >= {MIN_COUNT}
        ),
        hits AS (
            SELECT kg.doc_id, kg.pos FROM kg JOIN dup USING (h)
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(CASE WHEN prev IS NOT NULL AND pos - prev <= {k}
                            THEN 0 ELSE 1 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM (SELECT doc_id, pos,
                         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                             AS prev
                  FROM hits)
        ),
        spans AS (
            SELECT doc_id,
                   CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) + {k - 1} AS BIGINT) AS span_end
            FROM isl GROUP BY doc_id, island
        )
    """


def duplicate_spans_oracle(k: int = K_GRAM) -> str:
    """ANSI/DuckDB twin of ``duplicate_spans`` (r07 registration)."""
    return (
        _kgram_cte(k)
        + """
        SELECT doc_id, span_start, span_end,
               span_end - span_start + 1 AS span_tokens
        FROM spans
        ORDER BY doc_id, span_start
    """
    )


def remove_duplicate_spans_oracle(k: int = K_GRAM) -> str:
    """ANSI/DuckDB twin of ``remove_duplicate_spans`` (r07
    registration). Nested list lambdas mirror the Spark
    transform/filter/exists chain."""
    return (
        _kgram_cte(k)
        + """
        , per_doc AS (
            SELECT doc_id,
                   list(struct_pack(a := span_start, b := span_end)) AS sp
            FROM spans GROUP BY doc_id
        ),
        j AS (
            SELECT t.doc_id, t.tk,
                   coalesce(p.sp,
                            CAST([] AS STRUCT(a BIGINT, b BIGINT)[])) AS sp
            FROM toks t LEFT JOIN per_doc p USING (doc_id)
        ),
        keep AS (
            SELECT doc_id, tk,
                   list_filter(
                       generate_series(1, len(tk)),
                       i -> len(list_filter(sp,
                                s -> i >= s.a AND i <= s.b)) = 0
                   ) AS kp
            FROM j
        )
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(tk) - len(kp) AS BIGINT) AS n_removed,
               -- DuckDB's array_to_string is NULL for an empty list;
               -- Spark's concat_ws is '' — pin the fully-removed case
               coalesce(array_to_string(list_transform(kp, i -> tk[i]), ' '),
                        '') AS clean_text
        FROM keep
        ORDER BY doc_id
    """
    )
