"""Differential test: the distributed iterative BPE trainer must equal
a pure-Python reference implementation of the published algorithm
(Sennrich et al. 2016 — pair-count, argmax with deterministic
tie-break, greedy left-to-right merge, RE-COUNT after each merge) on
crafted and seeded-random corpora, including the merge-cascade cases
('aaa' under (a,a) -> [aa, a]; rule k selected against the vocabulary
as compressed by rules 1..k-1). The oracle-parity sweep certifies
Spark == DuckDB; this pins BOTH against the algorithm itself."""

from __future__ import annotations

import os
import random

from coviddatapipeline_spark.operators.text import (
    BPE_TRAIN_MERGES,
    _bpe_word_freqs,
    bpe_train_rounds,
)
from coviddatapipeline_spark.queries.catalog import all_queries


def _py_tokens(text: str) -> list[str]:
    # the module tokenization contract: collapse the explicit ASCII
    # whitespace class, trim, split on single space, drop empties
    import re

    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text).strip()
    return [w for w in norm.split(" ") if w]


def _py_fold(s: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in s:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_train(texts: list[str], n_merges: int):
    """Reference trainer: returns [(step, a, b, count, tokens_after)]."""
    wf: dict[str, int] = {}
    for t in texts:
        if t is None:
            continue
        for w in _py_tokens(t):
            wf[w] = wf.get(w, 0) + 1
    seqs = {w: list(w) for w in wf}
    out = []
    for k in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + wf[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        seqs = {w: _py_fold(s, a, b) for w, s in seqs.items()}
        tokens_after = sum(len(s) * wf[w] for w, s in seqs.items())
        out.append((k, a, b, cnt, tokens_after))
    return out


def _write_docs(spark, tmp_path, texts: list[str | None]) -> str:
    d = os.path.join(str(tmp_path), "sf_bpe")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def _run_entry(spark, sf_dir):
    rows = all_queries()["text_bpe_train"].fn(spark, sf_dir).collect()
    return [
        (r["step"], r["a"], r["b"], r["pair_count"], r["tokens_after"])
        for r in rows
    ]


CRAFTED = [
    # merge cascade: 'aaaa' has 3 overlapping (a,a) positions but only
    # 2 greedy merges; a one-pass miner and a re-counting trainer
    # diverge on the SECOND rule here
    "aaaa aaaa aa baab",
    "abab abab ab",
    # ties: (x,y) and (y,x) equal counts -> (a,b) lexicographic break
    "xy yx xy yx",
    None,  # NULL text must be ignored
    "",  # empty text contributes nothing
    "cascade cascade cascade",  # long word, repeated
]


def test_bpe_train_matches_python_reference_crafted(spark, tmp_path):
    d = _write_docs(spark, tmp_path, CRAFTED)
    got = _run_entry(spark, d)
    want = _py_train([t for t in CRAFTED], BPE_TRAIN_MERGES)
    assert got == want and len(want) == BPE_TRAIN_MERGES
    # non-vacuous: at least one learned rule must CONSUME an earlier
    # rule's output (a composed symbol appears as a merge operand) —
    # the thing one-pass mining cannot produce
    symbols = {a for _, a, _, _, _ in want} | {b for _, _, b, _, _ in want}
    assert any(len(s) > 1 for s in symbols), want


def test_bpe_train_matches_python_reference_seeded_random(spark, tmp_path):
    rng = random.Random(20260816)
    alphabet = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(40)
    ]
    d = _write_docs(spark, tmp_path, texts)
    got = _run_entry(spark, d)
    want = _py_train(texts, BPE_TRAIN_MERGES)
    assert got == want and len(want) == BPE_TRAIN_MERGES


def test_bpe_train_encode_applies_trained_rules(spark, tmp_path):
    """The trained-encode entry must tokenize with the SAME rules the
    reference trainer learns, applied in priority order."""
    d = _write_docs(spark, tmp_path, CRAFTED)
    want_rules = [(a, b) for _, a, b, _, _ in _py_train(CRAFTED, BPE_TRAIN_MERGES)]
    rows = all_queries()["text_bpe_train_encode"].fn(spark, d).collect()
    assert rows, "no encoded words"
    for r in rows:
        s = list(r["word"])
        for a, b in want_rules:
            s = _py_fold(s, a, b)
        assert r["enc"] == " ".join(s), (r["word"], r["enc"], s)
        assert r["n_tokens"] == len(s)


def test_bpe_train_rounds_empty_corpus(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [None, "", "   "])
    wf = _bpe_word_freqs(spark, d)
    assert bpe_train_rounds(wf) == []
    assert _run_entry(spark, d) == []
