"""Duplicated-span extraction/removal (operators.dedup_spans) and the
short-doc crash regression in the shared k-gram window builder.

Three layers, per the house test model:
- hand-built corpus with known duplicated passages -> exact expected
  spans and cleaned text;
- Python-model differential on arbitrary corpora (hypothesis);
- live DuckDB differential of BOTH oracle SQL strings (queued for r07
  registration) via the driver-faithful compare.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.dedup import K_GRAM, kgram_window_structs
from coviddatapipeline_spark.operators.dedup_spans import (
    duplicate_spans,
    duplicate_spans_oracle,
    remove_duplicate_spans,
    remove_duplicate_spans_oracle,
)
from tests.parity import compare

SF_SMALL = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# --- the round-5 crash regression -----------------------------------------


def test_kgram_windows_short_doc_is_empty_not_crash(spark):
    """A doc with < k tokens must yield ZERO windows (DuckDB's empty
    generate_series), not a descending sequence(1, 0) feeding
    slice(tk, 0, k) — which aborts the whole job (the latent crash
    fixed this round; every synthetic testdata doc has >= 8 tokens so
    the sweeps never saw it)."""
    df = _docs(
        spark,
        [("d1", "only three words"), ("d2", "a b c d e f g h i j"), ("d3", "")],
    )
    out = df.select(
        "doc_id",
        F.size(kgram_window_structs(F.split(F.col("text"), " "), 8)).alias("n"),
    ).collect()
    got = {r["doc_id"]: r["n"] for r in out}
    assert got == {"d1": 0, "d2": 3, "d3": 0}


def test_exact_substring_runs_survive_short_docs(spark, tmp_path):
    """The registered run diagnostic must not crash when the corpus
    contains sub-k-token documents (it did before the shared guarded
    builder)."""
    from coviddatapipeline_spark.operators.dedup import (
        dedup_exact_substring_runs,
    )

    docs = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
    short_ids = (900_000_001, 900_000_002)  # doc_id is BIGINT in testdata
    extra = spark.createDataFrame(
        [(short_ids[0], "too short"), (short_ids[1], "x")], ["doc_id", "text"]
    )
    mixed = docs.select("doc_id", "text").unionByName(extra)
    out_dir = str(tmp_path / "docs_mixed")
    mixed.write.parquet(os.path.join(out_dir, "documents.parquet"))
    res = dedup_exact_substring_runs(spark, out_dir)
    rows = res.collect()  # executes without slice() abort
    assert not [
        r for r in rows if r["doc_a"] in short_ids or r["doc_b"] in short_ids
    ]  # short docs contribute no windows, hence no runs


# --- hand-built corpus: exact spans ---------------------------------------

_SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = K_GRAM


def test_duplicate_spans_known_corpus(spark):
    rows = [
        ("a", f"start one two {_SHARED} tail1 tail2"),
        ("b", f"{_SHARED} completely different ending here now ok"),
        ("c", "no duplication in this document at all whatsoever friend"),
    ]
    out = duplicate_spans(_docs(spark, rows), k=K_GRAM).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in out}
    # doc a: shared block at tokens 4..11; doc b: tokens 1..8
    assert got == {("a", 4, 11), ("b", 1, 8)}
    assert all(r["span_tokens"] == 8 for r in out)


def test_duplicate_spans_merges_overlap_and_adjacency(spark):
    # 16-token shared block -> 9 consecutive duplicated windows in each
    # doc -> ONE merged span, not 9
    block = " ".join(f"w{i}" for i in range(16))
    rows = [("a", f"{block} xx yy"), ("b", f"pre1 pre2 pre3 {block}")]
    out = duplicate_spans(_docs(spark, rows), k=K_GRAM).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in out}
    assert got == {("a", 1, 16), ("b", 4, 19)}


def test_duplicate_spans_within_doc_repeat_counts(spark):
    # the SAME doc repeating a block is duplication under concatenated-
    # corpus (suffix-array) semantics: both occurrences are spans
    block = "p q r s t u v w"
    rows = [("solo", f"{block} mid1 mid2 {block}")]
    out = duplicate_spans(_docs(spark, rows), k=K_GRAM).collect()
    got = {(r["span_start"], r["span_end"]) for r in out}
    assert got == {(1, 8), (11, 18)}


def test_remove_duplicate_spans_known_corpus(spark):
    rows = [
        ("a", f"start one two {_SHARED} tail1 tail2"),
        ("b", f"{_SHARED} completely different ending here now ok"),
        ("c", "no duplication in this document at all whatsoever friend"),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(_docs(spark, rows), k=K_GRAM).collect()
    }
    assert out["a"]["clean_text"] == "start one two tail1 tail2"
    assert out["a"]["n_removed"] == 8 and out["a"]["n_tokens"] == 13
    assert out["b"]["clean_text"] == "completely different ending here now ok"
    assert out["c"]["n_removed"] == 0
    assert out["c"]["clean_text"] == rows[2][1]


# --- Python-model differential (hypothesis) -------------------------------


def _model_spans(texts: dict[str, str], k: int) -> set[tuple[str, int, int]]:
    """Straight-line reference: hash every k-window, count occurrences
    corpus-wide, merge covered windows per doc."""
    occ: dict[str, int] = {}
    wins: dict[str, list[tuple[int, str]]] = {}
    for d, txt in texts.items():
        toks = re.sub(r"\s+", " ", txt).strip().split(" ")
        ws = []
        for i in range(max(len(toks) - k + 1, 0)):
            h = " ".join(toks[i : i + k])
            occ[h] = occ.get(h, 0) + 1
            ws.append((i + 1, h))
        wins[d] = ws
    spans: set[tuple[str, int, int]] = set()
    for d, ws in wins.items():
        dup = sorted(p for p, h in ws if occ[h] >= 2)
        i = 0
        while i < len(dup):
            j = i
            while j + 1 < len(dup) and dup[j + 1] - dup[j] <= k:
                j += 1
            spans.add((d, dup[i], dup[j] + k - 1))
            i = j + 1
    return spans


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=14),
        min_size=2,
        max_size=6,
    ),
    k=st.integers(2, 4),
)
def test_duplicate_spans_matches_python_model(spark, data, k):
    # tiny alphabet + short docs force plenty of repeats and edge shapes
    texts = {f"d{i}": " ".join(f"t{v}" for v in row) for i, row in enumerate(data)}
    rows = [(d, t) for d, t in texts.items()]
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(_docs(spark, rows), k=k).collect()
    }
    assert got == _model_spans(texts, k)


# --- DuckDB oracle differential (r07 registration readiness) --------------


@pytest.fixture(scope="module")
def span_fixture_dir(spark, tmp_path_factory):
    """sf0.001 documents PLUS engineered rows the synthetic corpus
    lacks: short docs, an empty doc, and cross-doc + within-doc
    verbatim repeats — so the oracle differential exercises every
    branch, not just the no-op path."""
    base = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
    block = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    extra = spark.createDataFrame(
        [
            (910_000_001, f"intro words {block} closing remarks"),
            (910_000_002, f"{block} other content follows here"),
            (910_000_003, f"{block} middle filler {block}"),
            (910_000_004, "tiny"),
            (910_000_005, ""),
        ],
        ["doc_id", "text"],
    )
    out = str(tmp_path_factory.mktemp("span_sf") / "fx")
    base.select("doc_id", "text").unionByName(extra).coalesce(2).write.parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def _con(fx_dir):
    con = duckdb.connect()
    # Spark writes the table as a directory of part files; glob them
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(fx_dir, 'documents.parquet', '*.parquet')}')"
    )
    return con


def test_duplicate_spans_vs_duckdb_oracle(spark, span_fixture_dir):
    ok, msg = compare(
        duplicate_spans(
            spark.read.parquet(span_fixture_dir + "/documents.parquet")
        ),
        _con(span_fixture_dir),
        duplicate_spans_oracle(),
    )
    assert ok, msg


def test_remove_duplicate_spans_vs_duckdb_oracle(spark, span_fixture_dir):
    ok, msg = compare(
        remove_duplicate_spans(
            spark.read.parquet(span_fixture_dir + "/documents.parquet")
        ),
        _con(span_fixture_dir),
        remove_duplicate_spans_oracle(),
    )
    assert ok, msg
