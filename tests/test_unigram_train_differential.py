"""Differential test: the distributed hard-EM unigram-LM trainer must
equal a pure-Python reference implementation of the algorithm
(SentencePiece-style seed -> Viterbi E-step -> usage-count M-step ->
prune, Kudo 2018, under the module's documented exact-integer
objective: min pieces, tie max count sum, tie lexicographic encoding)
on crafted and seeded-random corpora. The oracle-parity sweep
certifies Spark == DuckDB; this pins BOTH against the algorithm
itself — including the hard-EM signature one-shot mining cannot
produce: a piece pruned in round k changes round k+1's segmentations.
"""

from __future__ import annotations

import os
import random

from coviddatapipeline_spark.operators.text import (
    UNI_MAX_WLEN,
    UNI_PIECE_MAX,
    UNI_PRUNE_STEP,
    UNI_ROUNDS,
    UNI_SEED_MULTI,
    UNI_TOPK,
)
from coviddatapipeline_spark.queries.catalog import all_queries


def _py_tokens(text: str) -> list[str]:
    import re

    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text).strip()
    return [w for w in norm.split(" ") if w]


def _py_wf(texts: list[str | None]) -> dict[str, int]:
    wf: dict[str, int] = {}
    for t in texts:
        if t is None:
            continue
        for w in _py_tokens(t):
            if len(w) <= UNI_MAX_WLEN:
                wf[w] = wf.get(w, 0) + 1
    return wf


def _py_best(word: str, vocab: dict[str, int]):
    """(np, negsc, enc) Viterbi under (min np, max sc, min enc)."""
    dp: list[tuple[int, int, str] | None] = [None] * (len(word) + 1)
    dp[0] = (0, 0, "")
    for i in range(1, len(word) + 1):
        cands = []
        for ln in range(1, UNI_PIECE_MAX + 1):
            if ln <= i and dp[i - ln] is not None:
                piece = word[i - ln : i]
                if piece in vocab:
                    np_, negsc, enc = dp[i - ln]
                    cands.append(
                        (
                            np_ + 1,
                            negsc - vocab[piece],
                            piece if np_ == 0 else enc + " " + piece,
                        )
                    )
        dp[i] = min(cands) if cands else None
    return dp[len(word)]


def _py_train(texts: list[str | None]):
    """Reference trainer: returns ([(step, vocab_size, corpus_pieces,
    corpus_score, top_piece, top_count)], final_vocab)."""
    wf = _py_wf(texts)
    singles: dict[str, int] = {}
    multis: dict[str, int] = {}
    for w, n in wf.items():
        for i, ch in enumerate(w):
            singles[ch] = singles.get(ch, 0) + n
            for ln in range(2, UNI_PIECE_MAX + 1):
                if i + ln <= len(w):
                    p = w[i : i + ln]
                    multis[p] = multis.get(p, 0) + n
    top = sorted(multis.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_SEED_MULTI]
    vocab = dict(singles)
    vocab.update(dict(top))
    multi_set = {p for p, _ in top}
    out = []
    for k in range(1, UNI_ROUNDS + 1):
        if not vocab:
            break
        counts: dict[str, int] = {}
        corpus_pieces = 0
        corpus_score = 0
        for w, n in wf.items():
            np_, negsc, enc = _py_best(w, vocab)
            corpus_pieces += n * np_
            corpus_score += n * -negsc
            for p in enc.split(" "):
                counts[p] = counts.get(p, 0) + n
        ranked = sorted(multi_set, key=lambda p: (-counts.get(p, 0), p))
        top_piece = ranked[0] if ranked else None
        top_count = counts.get(top_piece, 0) if ranked else None
        keep = ranked[: max(UNI_SEED_MULTI - UNI_PRUNE_STEP * k, 0)]
        vocab = {p: counts.get(p, 0) for p in vocab if p not in multi_set}
        vocab.update({p: counts.get(p, 0) for p in keep})
        multi_set = set(keep)
        out.append(
            (k, len(vocab), corpus_pieces, corpus_score, top_piece, top_count)
        )
    return out, wf, vocab


def _py_encode(wf: dict[str, int], vocab: dict[str, int]):
    top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_TOPK]
    out = []
    for rank, (w, n) in enumerate(top, 1):
        np_, negsc, enc = _py_best(w, vocab)
        out.append((rank, w, n, len(w), np_, -negsc, enc))
    return out


def _write_docs(spark, tmp_path, texts: list[str | None]) -> str:
    d = os.path.join(str(tmp_path), "sf_uni")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def _run_train(spark, sf_dir):
    rows = all_queries()["text_unigram_train"].fn(spark, sf_dir).collect()
    return [
        (r["step"], r["vocab_size"], r["corpus_pieces"], r["corpus_score"],
         r["top_piece"], r["top_count"])
        for r in rows
    ]


def _run_encode(spark, sf_dir):
    rows = all_queries()["text_unigram_encode"].fn(spark, sf_dir).collect()
    return [
        (r["rank"], r["word"], r["n_occ"], r["n_chars"], r["n_pieces"],
         r["score"], r["enc"])
        for r in rows
    ]


CRAFTED = [
    # min-pieces ties broken by count sum then lexicographic enc:
    # 'abab' splits as ab|ab vs a|bab etc.
    "abab abab ab ba bab abab",
    # long runs: 'aaaaaa' has many compositions; singles guarantee
    # totality when no multi matches
    "aaaaaa aaa aa a xyz",
    # words longer than UNI_MAX_WLEN are excluded from training
    "w" * (UNI_MAX_WLEN + 1) + " short words here",
    None,
    "",
    "   ",
    "mixed MIXED MiXeD case kept distinct tokens tokens tokens",
]


def test_unigram_train_matches_reference_on_crafted(spark, tmp_path):
    d = _write_docs(spark, tmp_path, CRAFTED)
    want, wf, final_vocab = _py_train(CRAFTED)
    assert _run_train(spark, d) == want
    assert _run_encode(spark, d) == _py_encode(wf, final_vocab)
    # non-vacuity: some word segments with a multi-char piece
    assert any(" " not in _py_best(w, final_vocab)[2] and len(w) > 1
               for w in wf) or any(
        len(p) > 1 for p in final_vocab
    )


def test_unigram_train_matches_reference_on_random(spark, tmp_path):
    rng = random.Random(20260816)
    alphabet = "abcdef"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
        for _ in range(60)
    ]
    texts = [
        " ".join(rng.choices(words, k=rng.randint(3, 30))) for _ in range(40)
    ]
    d = _write_docs(spark, tmp_path, texts)
    want, wf, final_vocab = _py_train(texts)
    got = _run_train(spark, d)
    assert got == want
    assert _run_encode(spark, d) == _py_encode(wf, final_vocab)
    # hard-EM non-vacuity on this seed: pruning must actually change
    # the vocabulary across rounds (vocab sizes strictly decrease)
    sizes = [r[1] for r in want]
    assert sizes == sorted(sizes, reverse=True) and len(set(sizes)) > 1


def _py_coverage(texts: list[str | None]):
    """Reference for text_unigram_vocab_coverage: train on the 80%
    doc_id split, audit the held-out 20% per lang (texts[i] has
    doc_id=i, lang=f'l{i % 2}')."""
    train = [t for i, t in enumerate(texts) if i % 10 < 8]
    _, _, vocab = _py_train(train)
    out: dict[str, dict[str, int]] = {}
    for i, t in enumerate(texts):
        if i % 10 < 8 or t is None:
            continue
        lang = f"l{i % 2}"
        a = out.setdefault(
            lang, {"n": 0, "long": 0, "oov": 0, "cov": 0, "pieces": 0, "chars": 0}
        )
        for w in _py_tokens(t):
            a["n"] += 1
            if len(w) > UNI_MAX_WLEN:
                a["long"] += 1
            else:
                best = _py_best(w, vocab) if vocab else None
                if best is None:
                    a["oov"] += 1
                else:
                    a["cov"] += 1
                    a["pieces"] += best[0]
                    a["chars"] += len(w)
    rows = []
    for lang, a in sorted(out.items()):
        rows.append(
            (
                lang, a["n"], a["long"], a["oov"], a["cov"],
                (a["long"] + a["oov"]) * 1000000 // a["n"],
                a["pieces"] * 10000 // a["chars"] if a["chars"] else None,
            )
        )
    return rows


def test_unigram_coverage_held_out_oov(spark, tmp_path):
    """The coverage audit must flag genuine held-out OOV: a word whose
    character never occurs in the train split, and an over-cap word,
    both land in the right buckets with exact integer rates."""
    import os as _os

    texts = []
    for i in range(20):
        if i % 10 < 8:
            texts.append("alpha beta gamma delta " + "ab " * (i % 3 + 1))
        elif i % 10 == 8:
            # held out: one OOV word (q/z/x absent from train), rest covered
            texts.append("alpha qzx beta")
        else:
            # held out: an over-cap word plus covered words
            texts.append("w" * (UNI_MAX_WLEN + 5) + " gamma delta")
    d = _os.path.join(str(tmp_path), "sf_cov")
    _os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, t, f"l{i % 2}") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    ).write.mode("overwrite").parquet(_os.path.join(d, "documents.parquet"))

    rows = sorted(
        (r["lang"], r["n_word_occ"], r["long_occ"], r["oov_occ"],
         r["covered_occ"], r["oov_ppm"], r["pieces_per_10k_chars"])
        for r in all_queries()["text_unigram_vocab_coverage"].fn(spark, d).collect()
    )
    want = _py_coverage(texts)
    assert rows == want
    # non-vacuity: both failure buckets are hit
    assert sum(r[3] for r in rows) > 0, "no OOV word flagged"
    assert sum(r[2] for r in rows) > 0, "no over-cap word flagged"
    assert all(r[5] > 0 for r in rows)

def test_unigram_train_degenerate_corpus_matches_oracle_shape(spark, tmp_path):
    """ADVICE r10 (low): on a fully degenerate corpus (every text NULL
    or whitespace — no trainable word) the oracle's per-round scalar
    subqueries still emit UNI_ROUNDS rows of (k, 0, NULL, NULL, NULL,
    NULL); the engine must mirror that shape, not return 0 rows."""
    import duckdb

    from coviddatapipeline_spark.queries.catalog import get

    d = _write_docs(spark, tmp_path, [None, "", "   ", "\t\n"])
    q = get("text_unigram_train")
    got = [tuple(r) for r in q.fn(spark, d).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'documents.parquet')}/*.parquet')"
    )
    want = [tuple(r) for r in con.execute(q.oracle).fetchall()]
    con.close()
    assert got == want
    assert len(got) == UNI_ROUNDS
    assert all(r[1] == 0 and r[2] is None and r[4] is None for r in got)

def test_uni_arrow_kernel_equals_column_dp(spark):
    """The production-vocab Arrow kernel (uni_best_seg_arrow: broadcast
    vocab + pandas DP) must compute EXACTLY the column DP's objective
    (_uni_best_seg: create_map literal) on every word — including ties
    (count-sum then lexicographic enc) and OOV words, where the column
    DP yields a NULL struct and the Arrow kernel a NULL-FIELD struct
    (the documented asymmetry: test dp.np IS NULL)."""
    from pyspark.sql import functions as F

    from coviddatapipeline_spark.operators.text import (
        _uni_best_seg,
        uni_best_seg_arrow,
    )

    rng = random.Random(20260817)
    alpha = "abcdef"
    vocab: dict[str, int] = {c: rng.randint(1, 50) for c in alpha}
    for a in alpha:
        for b in alpha:
            vocab[a + b] = rng.randint(1, 900)
    while len(vocab) < 1200:
        p = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 4)))
        vocab.setdefault(p, rng.randint(1, 900))
    # force exact count ties so the lexicographic enc tiebreak is live
    vocab["ab"] = vocab["ba"] = vocab["aa"] = vocab["bb"] = 777

    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    words += ["abab", "aabb", "abba", "baba", "aaaa"]  # tie-heavy
    words += ["axz", "zzz", "aq"]  # chars outside the vocab alphabet -> OOV
    df = spark.createDataFrame([(w,) for w in words], "word string")

    col_dp = df.withColumn("dp", _uni_best_seg("word", vocab))
    arr_dp = df.withColumn("dp", uni_best_seg_arrow(spark, vocab)(F.col("word")))

    def rows(d):
        return sorted(
            (r["word"],
             None if r["dp"] is None or r["dp"]["np"] is None
             else (r["dp"]["np"], r["dp"]["negsc"], r["dp"]["enc"]))
            for r in d.collect()
        )

    got_col, got_arr = rows(col_dp), rows(arr_dp)
    assert got_col == got_arr
    # non-vacuity: OOV rows are NULL on both paths; covered rows exist
    oov = [w for w, v in got_col if v is None]
    assert set(oov) == {"axz", "zzz", "aq"}
    assert any(v is not None and v[0] > 1 for _, v in got_col)


def test_tokenizer_bakeoff_invariants(spark):
    """The bakeoff's totals must be internally consistent: every
    encoding is at most one symbol per char and at least one per word
    occurrence, the winner column follows the exact totals, and both
    models are genuinely trained (multi-symbol compression visible on
    at least one side — else the bakeoff compares two char-splitters)."""
    from coviddatapipeline_spark.queries.catalog import all_queries
    from tests.conftest import PARITY_SF, sf_dir

    rows = (
        all_queries()["text_tokenizer_bakeoff"]
        .fn(spark, sf_dir(PARITY_SF))
        .collect()
    )
    assert rows
    for r in rows:
        assert 0 < r["n_word_occ"] <= r["n_chars"]
        assert r["n_word_occ"] <= r["bpe_tokens"] <= r["n_chars"]
        assert r["n_word_occ"] <= r["uni_pieces"] <= r["n_chars"]
        want = (
            "unigram" if r["uni_pieces"] < r["bpe_tokens"]
            else "bpe" if r["uni_pieces"] > r["bpe_tokens"] else "tie"
        )
        assert r["winner"] == want
        assert r["bpe_per_10k"] == r["bpe_tokens"] * 10000 // r["n_chars"]
        assert r["uni_per_10k"] == r["uni_pieces"] * 10000 // r["n_chars"]
    # non-vacuity: at least one side compresses below 1 symbol/char
    assert any(
        r["bpe_tokens"] < r["n_chars"] or r["uni_pieces"] < r["n_chars"]
        for r in rows
    )
