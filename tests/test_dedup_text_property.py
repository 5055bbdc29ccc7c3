"""Property-based differential tests for the round-6 token-level dedup
entries against pure-Python models of their published semantics.

The three-SF oracle sweeps pin these entries on the synthetic corpus;
hypothesis drives corpora the testdata cannot contain — empty docs,
docs shorter than one window, whole-corpus self-repeats like
``a a a a ...`` (overlapping occurrences), single-token vocabularies
where every window is the same gram, and boundary-only maximality
(repeats flush against a document edge). Each example round-trips
through a real parquet write + the registered (spark, sf_dir) entry, so
the short-doc guards and ANSI-safe neighbor lookups execute for real.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import tempfile
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from coviddatapipeline_spark.operators.dedup import K_GRAM

# Tiny vocabulary so K_GRAM-token repeats actually occur in short docs.
_tok = st.sampled_from(["a", "b", "c"])
_doc = st.lists(_tok, min_size=0, max_size=3 * K_GRAM)
_corpus = st.lists(
    st.one_of(_doc.map(lambda ts: " ".join(ts)), st.none()),
    min_size=1,
    max_size=12,
)


def _tokens_model(text: str) -> list[str]:
    """The repo's tokenization contract (operators/text.py): collapse
    whitespace runs, trim, split on single space. ``"" -> [""]`` — one
    empty token, matching both Spark F.split and DuckDB string_split."""
    return re.sub(r"\s+", " ", text).strip().split(" ")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _write_documents(spark, texts):
    d = tempfile.mkdtemp(prefix="cdp_prop_docs_")
    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        os.path.join(d, "documents.parquet"), mode="overwrite"
    )
    return d


def _removal_model(texts):
    """Pure-Python Lee-et-al removal: every token covered by a k-gram
    whose space-joined text occurs >= 2 times corpus-wide (occurrence
    count, within-doc repeats included) is cut."""
    toks = {i: _tokens_model(t) for i, t in enumerate(texts) if t is not None}
    counts: Counter[str] = Counter()
    for tk in toks.values():
        for i in range(len(tk) - K_GRAM + 1):
            counts[" ".join(tk[i : i + K_GRAM])] += 1
    out = {}
    for doc_id, tk in toks.items():
        covered = set()
        for i in range(len(tk) - K_GRAM + 1):
            if counts[" ".join(tk[i : i + K_GRAM])] >= 2:
                covered.update(range(i, i + K_GRAM))
        kept = [t for i, t in enumerate(tk) if i not in covered]
        out[doc_id] = (len(tk), len(tk) - len(kept), _md5(" ".join(kept)))
    return out


def _maximal_model(texts):
    """Pure-Python maximal-repeat filter: a duplicated k-gram survives
    iff each side has >= 2 distinct non-null neighbor tokens or at
    least one occurrence at a document boundary."""
    occ = defaultdict(lambda: {"n": 0, "docs": set(), "prev": [], "next": []})
    for doc_id, t in enumerate(texts):
        if t is None:
            continue
        tk = _tokens_model(t)
        for i in range(len(tk) - K_GRAM + 1):
            g = occ[_md5(" ".join(tk[i : i + K_GRAM]))]
            g["n"] += 1
            g["docs"].add(doc_id)
            g["prev"].append(tk[i - 1] if i > 0 else None)
            g["next"].append(tk[i + K_GRAM] if i + K_GRAM < len(tk) else None)
    rows = []
    for h, g in occ.items():
        if g["n"] < 2:
            continue

        def _maximal(side):
            nn = [x for x in side if x is not None]
            return len(set(nn)) >= 2 or len(nn) < len(side)

        if _maximal(g["prev"]) and _maximal(g["next"]):
            rows.append((h, g["n"], len(g["docs"])))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:20]


@given(texts=_corpus)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_substring_removal_matches_model(spark, texts):
    from coviddatapipeline_spark.operators.dedup import (
        dedup_exact_substring_removal,
    )

    d = _write_documents(spark, texts)
    try:
        got = {
            r["doc_id"]: (r["n_tok"], r["n_removed"], r["kept_md5"])
            for r in dedup_exact_substring_removal(spark, d).collect()
        }
        assert got == _removal_model(texts)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(texts=_corpus)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_boilerplate_maximal_kgrams_matches_model(spark, texts):
    from coviddatapipeline_spark.operators.dedup import (
        dedup_boilerplate_maximal_kgrams,
    )

    d = _write_documents(spark, texts)
    try:
        got = [
            (r["gram_md5"], r["n_occ"], r["n_docs"])
            for r in dedup_boilerplate_maximal_kgrams(spark, d).collect()
        ]
        # Entry output is already (n_occ DESC, gram_md5) — a total
        # order — so list equality checks the top-20 cut too.
        assert got == _maximal_model(texts)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _passages_model(texts):
    """Pure-Python gaps-and-islands over corpus-duplicated window
    starts: top-20 longest maximal duplicated passages as
    (doc_id, start_pos, n_tok, md5-of-token-slice), 1-based."""
    toks = {i: _tokens_model(t) for i, t in enumerate(texts) if t is not None}
    counts: Counter[str] = Counter()
    for tk in toks.values():
        for i in range(len(tk) - K_GRAM + 1):
            counts[" ".join(tk[i : i + K_GRAM])] += 1
    rows = []
    for doc_id, tk in sorted(toks.items()):
        dup = [
            i
            for i in range(len(tk) - K_GRAM + 1)
            if counts[" ".join(tk[i : i + K_GRAM])] >= 2
        ]
        run_start = None
        prev = None
        for p in dup + [None]:
            if run_start is not None and (p is None or p != prev + 1):
                n_tok = prev - run_start + K_GRAM
                rows.append(
                    (
                        doc_id,
                        run_start + 1,
                        n_tok,
                        _md5(" ".join(tk[run_start : run_start + n_tok])),
                    )
                )
                run_start = None
            if p is not None and run_start is None:
                run_start = p
            prev = p
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:20]


@given(texts=_corpus)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_duplicated_passages_topk_matches_model(spark, texts):
    from coviddatapipeline_spark.operators.dedup import (
        dedup_duplicated_passages_topk,
    )

    d = _write_documents(spark, texts)
    try:
        got = [
            (r["doc_id"], r["start_pos"], r["n_tok"], r["passage_md5"])
            for r in dedup_duplicated_passages_topk(spark, d).collect()
        ]
        assert got == _passages_model(texts)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _occurrences_model(texts):
    """Pure-Python model of dedup_passage_occurrences_topk: group the
    maximal duplicated runs (same islands as _passages_model) by the
    md5 of their exact token slice; top-20 clusters as
    (passage_md5, n_tok, n_occ, n_docs) by (n_occ DESC, n_tok DESC,
    md5)."""
    toks = {i: _tokens_model(t) for i, t in enumerate(texts) if t is not None}
    counts: Counter[str] = Counter()
    for tk in toks.values():
        for i in range(len(tk) - K_GRAM + 1):
            counts[" ".join(tk[i : i + K_GRAM])] += 1
    per_md5_occ: Counter[str] = Counter()
    per_md5_docs: dict[str, set[int]] = defaultdict(set)
    per_md5_len: dict[str, int] = {}
    for doc_id, tk in sorted(toks.items()):
        dup = [
            i
            for i in range(len(tk) - K_GRAM + 1)
            if counts[" ".join(tk[i : i + K_GRAM])] >= 2
        ]
        run_start = None
        prev = None
        for p in dup + [None]:
            if run_start is not None and (p is None or p != prev + 1):
                n_tok = prev - run_start + K_GRAM
                m = _md5(" ".join(tk[run_start : run_start + n_tok]))
                per_md5_occ[m] += 1
                per_md5_docs[m].add(doc_id)
                per_md5_len[m] = n_tok  # content determines length
                run_start = None
            if p is not None and run_start is None:
                run_start = p
            prev = p
    rows = [
        (m, per_md5_len[m], n, len(per_md5_docs[m]))
        for m, n in per_md5_occ.items()
    ]
    rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
    return rows[:20]


@given(texts=_corpus)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_passage_occurrences_topk_matches_model(spark, texts):
    from coviddatapipeline_spark.operators.dedup import (
        dedup_passage_occurrences_topk,
    )

    d = _write_documents(spark, texts)
    try:
        got = [
            (r["passage_md5"], r["n_tok"], r["n_occ"], r["n_docs"])
            for r in dedup_passage_occurrences_topk(spark, d).collect()
        ]
        assert got == _occurrences_model(texts)
    finally:
        shutil.rmtree(d, ignore_errors=True)
