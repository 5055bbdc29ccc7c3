"""Regression tests for the round-1 ADVICE findings: short-document
shingling crashes, empty multimodal payloads, and Silver replay
duplication under foreachBatch at-least-once semantics.

The driver testdata contains no doc shorter than 47 chars, which is
exactly why the 146 round-1 tests missed these — so these fixtures
synthesize the degenerate inputs directly."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.dedup import _trigrams
from coviddatapipeline_spark.queries import catalog
from tests.covid_fixture import make_rows, write_csv


# --- short/empty documents fixture ----------------------------------------

SHORT_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "", "en", "web", 0),
    (2, "one", "en", "web", 3),
    (3, "two tokens", "en", "web", 10),
    (4, "exactly three tokens", "en", "web", 20),
    (5, "now four whole tokens", "en", "web", 21),
    (6, "a much longer document with plenty of tokens to shingle over", "en", "cc", 61),
    (7, "a much longer document with plenty of tokens to shingle over", "en", "cc", 61),
]


@pytest.fixture(scope="module")
def short_docs_dir(spark, tmp_path_factory):
    """A sf_dir containing only documents.parquet with degenerate docs."""
    root = str(tmp_path_factory.mktemp("shortdocs"))
    df = spark.createDataFrame(
        SHORT_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(os.path.join(root, "documents.parquet"))
    return root


def test_trigrams_short_docs_no_crash(spark):
    """<3 tokens must yield an empty array, not a slice() crash."""
    df = spark.createDataFrame(
        [(t,) for _, t, *_ in SHORT_DOCS], "text string"
    ).select(_trigrams(F.col("text")).alias("tg"))
    rows = [r.tg for r in df.collect()]
    assert rows[0] == []  # empty doc
    assert rows[1] == []  # 1 token
    assert rows[2] == []  # 2 tokens
    assert len(rows[3]) == 1  # exactly 3 tokens -> one shingle
    assert len(rows[4]) == 2  # 4 tokens -> two shingles


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard_pairs",
        "text_word_trigrams_top",
        "text_token_stats",
        "dedup_exact_stats",
    ],
)
def test_short_docs_queries_run(name, spark, short_docs_dir):
    """The ADVICE-flagged shingle consumers survive degenerate docs."""
    q = catalog.get(name)
    df = q.fn(spark, short_docs_dir)
    assert df.count() >= 0


def test_short_docs_minhash_still_finds_the_real_dup(spark, short_docs_dir):
    """Short docs are skipped, but genuine near-dups still pair up."""
    q = catalog.get("dedup_minhash_lsh")
    pairs = q.fn(spark, short_docs_dir).collect()
    ids = {(r[0], r[1]) for r in pairs} if pairs else set()
    assert (6, 7) in ids or any(6 in p and 7 in p for p in ids)


def test_mm_frame_offsets_empty_payload(spark, short_docs_dir):
    """Zero-byte payload reports n_frames=0 instead of crashing on
    sequence(0, -1, 32)."""
    q = catalog.get("mm_frame_offsets")
    rows = {r.doc_id: r for r in q.fn(spark, short_docs_dir).collect()}
    assert rows[1].n_bytes == 0
    assert rows[1].n_frames == 0
    assert rows[6].n_frames == (rows[6].n_bytes + 31) // 32


# --- streaming replay idempotency -----------------------------------------


def test_stream_refresh_gold_replay_is_idempotent(spark, tmp_path):
    """Simulate a foreachBatch replay: drain once, wipe the checkpoint
    (forcing the same input to re-run as the same batch ids), drain
    again — the batch_id-partitioned dynamic overwrite must leave Silver
    row counts unchanged (no at-least-once duplication, SURVEY §4.3.2)."""
    from coviddatapipeline_spark.pipeline.streaming import stream_refresh_gold

    root = str(tmp_path)
    in_dir, silver, gold, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "silver"),
        os.path.join(root, "gold"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    write_csv(os.path.join(in_dir, "batch1.csv"), make_rows(200))

    q = stream_refresh_gold(spark, in_dir, silver, gold, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(silver).count()
    assert n1 > 0

    # Replay: wipe offsets only — the stream re-reads batch1.csv under
    # the same batch_id, exactly what a crash-before-commit produces.
    shutil.rmtree(ckpt)
    q = stream_refresh_gold(spark, in_dir, silver, gold, ckpt)
    q.awaitTermination(120)
    n2 = spark.read.parquet(silver).count()
    assert n2 == n1, f"replay duplicated silver rows: {n1} -> {n2}"


# --- hot-shingle cap (VERDICT r01 fix #6) ----------------------------------


def test_ngram_jaccard_hot_shingle_cap(spark, tmp_path, monkeypatch):
    """With a tiny cap, boilerplate shared by many docs stops generating
    candidate pairs (every shingle of the clones exceeds the df cap),
    while genuine near-dups with rare shingles still pair up."""
    import coviddatapipeline_spark.operators.dedup as D

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler, "en", "spam", len(boiler)) for i in range(100, 120)]
    rows += [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "web", 40),
        (2, "alpha beta gamma delta epsilon zeta eta iota", "en", "web", 40),
    ]
    root = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{root}/documents.parquet")

    monkeypatch.setattr(D, "MAX_SHINGLE_DF", 10)
    pairs = {(r.doc_a, r.doc_b) for r in D.dedup_ngram_jaccard_pairs(spark, root).collect()}
    # 20 boilerplate clones (df=20 > 10): all their shingles capped away ->
    # zero of the 190 clone pairs; the rare-shingle near-dup pair survives.
    assert (1, 2) in pairs
    assert not any(a >= 100 for a, _ in pairs)

    monkeypatch.setattr(D, "MAX_SHINGLE_DF", 1000)
    pairs = {(r.doc_a, r.doc_b) for r in D.dedup_ngram_jaccard_pairs(spark, root).collect()}
    assert (1, 2) in pairs and any(a >= 100 for a, _ in pairs)


# --- round-3 ADVICE regressions: boundary-data parity ----------------------
#
# The r03 fixes (µs-exact session gaps; integer-cents ANALYZE rendering)
# were verified by three-SF sweeps, but the driver testdata need not
# contain the actual hazard inputs — a gap strictly inside (1800 s,
# 1801 s), or a price that is an exact binary tie at the rounding
# boundary. These fixtures synthesize exactly those inputs and run the
# REGISTERED entries against their REGISTERED oracles on them, so the
# cross-engine semantics are pinned independent of what the driver
# generates.

import datetime as _dt

import duckdb as _duckdb


def _us(base, micros):
    return base + _dt.timedelta(microseconds=micros)


@pytest.fixture(scope="module")
def gap_boundary_dir(spark, tmp_path_factory):
    """events.parquet engineered around the 30-minute session boundary."""
    base = _dt.datetime(2024, 3, 1, 12, 0, 0)
    rows, eid = [], 0

    def ev(user, micros, etype="view", value=1.0):
        nonlocal eid
        eid += 1
        rows.append((eid, _us(base, micros), user, etype, value, "{}"))

    ev(1, 0); ev(1, 1_800_000_000)              # gap == 1800 s: same session
    ev(2, 0); ev(2, 1_800_000_001)              # 1 µs over: new session
    ev(3, 0); ev(3, 1_800_500_000)              # the truncation-bug zone
    ev(4, 0); ev(4, 1_799_999_999)              # 1 µs under: same session
    ev(5, 0)                                     # singleton user
    ev(6, 0, "view"); ev(6, 60_000_000, "click")  # normal session w/ path
    ev(6, 1_860_500_123, "purchase")             # 1800.500123 s after the click: new session
    root = str(tmp_path_factory.mktemp("gapboundary"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(root, "events.parquet"))
    return root


@pytest.mark.parametrize(
    "name",
    [
        "events_sessionization",
        "events_session_survival",
        "events_session_path_mining",
        "events_peak_concurrency",
    ],
)
def test_session_gap_boundary_parity(name, spark, gap_boundary_dir):
    """Every sessionization consumer must agree with its oracle on gaps
    1 µs either side of (and exactly at) the 30-minute boundary — the
    whole-second-truncation compare would split user 3 differently."""
    from tests.parity import compare

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{gap_boundary_dir}/events.parquet/*.parquet')"
    )
    q = catalog.get(name)
    ok, msg = compare(q.fn(spark, gap_boundary_dir), con, q.oracle)
    assert ok, f"{name}: {msg}"


def test_session_gap_boundary_splits(spark, gap_boundary_dir):
    """Direct semantics: == 1800 s joins the session, anything strictly
    over splits it — including the (1800 s, 1801 s) zone that
    whole-second truncation misjudged."""
    got = {
        r["user_id"]: r["n_sessions"]
        for r in catalog.get("events_sessionization")
        .fn(spark, gap_boundary_dir)
        .collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 1, 5: 1, 6: 2}


@pytest.fixture(scope="module")
def tie_orders_dir(spark, tmp_path_factory):
    """orders.parquet whose min/max o_totalprice are exact binary ties
    at the cents-rounding boundary (x.125 / x.875 are exactly
    representable doubles; printf('%.2f') renders them differently
    across Java HALF_UP and C half-even)."""
    base = _dt.datetime(1995, 6, 1)
    rows = [
        (1, 10, "F", 0.125, base, "1-URGENT"),
        (2, 20, "O", 2.675, base + _dt.timedelta(days=1), "2-HIGH"),
        (3, 30, "F", 9999.875, base + _dt.timedelta(days=2), "3-MEDIUM"),
        (4, None, "P", None, base + _dt.timedelta(days=3), None),
    ]
    root = str(tmp_path_factory.mktemp("tieorders"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(root, "orders.parquet"))
    return root


def test_analyze_stats_tie_rendering_parity(spark, tie_orders_dir):
    """table_stats_analyze_audit must hash-match its oracle when the
    min/max doubles are exact rounding-boundary ties — the printf
    rendering this replaced diverged exactly here."""
    from tests.parity import compare

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tie_orders_dir}/orders.parquet/*.parquet')"
    )
    q = catalog.get("table_stats_analyze_audit")
    ok, msg = compare(q.fn(spark, tie_orders_dir), con, q.oracle)
    assert ok, msg
    row = {
        r["column_name"]: (r["min_val"], r["max_val"], r["n_nulls"])
        for r in q.fn(spark, tie_orders_dir).collect()
    }
    # integer-cents path: 0.125 -> "13" (floor(12.5+0.5)), 9999.875 -> "999988"
    assert row["o_totalprice"] == ("13", "999988", 1)


def test_events_nanos_long_layout_parses_identically(spark, tmp_path, gap_boundary_dir):
    """The driver has generated events.parquet as TIMESTAMP(NANOS) in
    some rounds (read as epoch-nanos LONG under
    spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS) in
    others; common.events branches on the physical dtype. The layout
    drift broke a full round once, and only the MICROS branch is
    exercised by current testdata — so pin the NANOS branch: the same
    events written as epoch-nanos longs must parse to EXACTLY the rows
    the MICROS file yields, microseconds included."""
    from coviddatapipeline_spark.operators.common import events

    micros = events(spark, gap_boundary_dir)
    nanos_root = os.path.join(str(tmp_path), "nanos_sf")
    micros.select(
        "event_id",
        (F.unix_micros("ts") * F.lit(1000)).alias("ts"),  # epoch NANOS long
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.parquet(os.path.join(nanos_root, "events.parquet"))

    back = events(spark, nanos_root)
    assert dict(back.dtypes)["ts"] == "timestamp"
    a = sorted(map(tuple, micros.select("event_id", "ts").collect()))
    b = sorted(map(tuple, back.select("event_id", "ts").collect()))
    assert a == b  # µs-exact across both physical layouts

    # and the sessionization consumer agrees end-to-end on the µs
    # boundary fixture through the NANOS path too
    got = {
        r["user_id"]: r["n_sessions"]
        for r in catalog.get("events_sessionization").fn(spark, nanos_root).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 1, 5: 1, 6: 2}
