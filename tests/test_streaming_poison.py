"""Streaming twins vs the poison corpus: NULL event-times, NULL
users/types, NaN/Inf measures, and malformed props are routine in a
real event stream — none may abort a streaming query (state-store
corruption aside, a crashed query means data loss until a human
restarts it, which is strictly worse than a skipped row).

Batch siblings of these operators are covered by tools/poison_probe.py
and tests/test_poison_corpus.py; this file drives the streaming path,
where the same degenerate rows additionally interact with watermarks
(a NULL event time has no position relative to the watermark) and with
``applyInPandasWithState`` kernels (NaT arithmetic).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.common import events
from coviddatapipeline_spark.pipeline import streaming as st
from tests.conftest import sf_dir
from tools.poison_probe import POISON_EVENTS


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """events (sf0.001, usable µs ts) + poison rows, staged as a parquet
    dir for readStream."""
    out = os.path.join(str(tmp_path_factory.mktemp("stream_poison")), "events")
    ev = events(spark, sf_dir("0.001")).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    extra = spark.createDataFrame(POISON_EVENTS, ev.schema)
    ev.unionByName(extra).coalesce(2).write.parquet(out)
    return out, spark.read.parquet(out).schema


def _drain(df, name: str, spark):
    q = (
        df.writeStream.outputMode(
            "update" if name in ("running_totals",) else "append"
        )
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None, f"{name} crashed: {q.exception()}"
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_event_counts_survives(spark, staged):
    path, schema = staged
    stream = spark.readStream.schema(schema).parquet(path)
    out = _drain(st.stream_event_counts(spark, stream), "p_counts", spark)
    assert out.count() >= 0


def test_stream_session_windows_survives(spark, staged):
    path, schema = staged
    stream = spark.readStream.schema(schema).parquet(path)
    out = _drain(st.stream_session_windows(stream), "p_sessions", spark)
    assert out.count() >= 0


def test_stream_dedup_survives(spark, staged):
    path, schema = staged
    stream = spark.readStream.schema(schema).parquet(path)
    out = _drain(st.stream_dedup_within_watermark(stream), "p_dedup", spark)
    assert out.count() >= 0


def test_stream_running_totals_survives_nan_and_null_user(spark, staged):
    path, schema = staged
    stream = spark.readStream.schema(schema).parquet(path)
    out = _drain(st.stream_user_running_totals(stream), "running_totals", spark)
    rows = {r["user_id"]: r for r in out.collect()}
    assert rows  # and the NULL-user group is a real group, not a crash
    assert None in rows


def test_stream_click_purchase_join_survives(spark, staged):
    path, schema = staged
    clicks = spark.readStream.schema(schema).parquet(path).filter(
        F.col("event_type") == "click"
    )
    purchases = spark.readStream.schema(schema).parquet(path).filter(
        F.col("event_type") == "purchase"
    )
    out = _drain(
        st.stream_click_purchase_join(clicks, purchases), "p_joined", spark
    )
    assert out.count() >= 0


def test_stream_session_paths_survives(spark, staged, tmp_path):
    path, schema = staged
    out_path = os.path.join(str(tmp_path), "paths")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = st.stream_session_paths(spark, path, out_path, ckpt, schema)
    q.awaitTermination(180)
    assert q.exception() is None, f"session_paths crashed: {q.exception()}"
    assert spark.read.parquet(out_path).count() >= 0


def test_session_paths_exclude_null_ts_symmetrically(spark, tmp_path):
    """An event with no timestamp is excluded from session analysis —
    in the streaming twin AND the batch operator. Unfiltered, the
    streaming kernel's NaT -> int64 cast fabricated a phantom path
    ('b>c>NULLTS') inside persistent state, and batch Spark/DuckDB
    silently disagree on dirty data (NULL ts sorts first vs last)."""
    import datetime

    ts0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, ts0, 5, "a", 1.0, "{}"),
        (2, ts0 + datetime.timedelta(minutes=1), 5, "b", 1.0, "{}"),
        (3, None, 5, "NULLTS", 1.0, "{}"),
        (4, ts0 + datetime.timedelta(minutes=2), 5, "c", 1.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df = spark.createDataFrame(rows, schema)
    inp = os.path.join(str(tmp_path), "in")
    df.coalesce(1).write.parquet(inp)
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ck")
    q = st.stream_session_paths(spark, inp, out, ckpt, df.schema)
    q.awaitTermination(120)
    assert q.exception() is None
    paths = {r["path"] for r in spark.read.parquet(out).collect()}
    assert paths == {"a>b>c"}

    # batch side: same exclusion (the poison row is also event-type
    # vocabulary, so inclusion would change the mined paths)
    from coviddatapipeline_spark.operators.events import (
        events_session_path_mining,
    )
    batch_dir = os.path.join(str(tmp_path), "batch_sf")
    os.makedirs(batch_dir)
    df.write.parquet(os.path.join(batch_dir, "events.parquet"))
    got = {r["path"] for r in events_session_path_mining(spark, batch_dir).collect()}
    assert got == {"a>b>c"}


def test_stream_daily_mix_drift_survives(spark, staged, tmp_path):
    path, schema = staged
    cells = os.path.join(str(tmp_path), "cells")
    kl = os.path.join(str(tmp_path), "kl")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = st.stream_daily_mix_drift(spark, path, cells, kl, ckpt, schema)
    q.awaitTermination(180)
    assert q.exception() is None, f"mix_drift crashed: {q.exception()}"
    assert spark.read.parquet(kl).count() >= 0


def test_stream_cms_grid_survives(spark, staged, tmp_path):
    path, schema = staged
    grid = os.path.join(str(tmp_path), "grid")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = st.stream_cms_grid(spark, path, grid, ckpt, schema)
    q.awaitTermination(180)
    assert q.exception() is None, f"cms_grid crashed: {q.exception()}"
    assert spark.read.parquet(grid).count() >= 0


def test_stream_dau_wau_survives(spark, staged, tmp_path):
    path, schema = staged
    pairs = os.path.join(str(tmp_path), "pairs")
    out = os.path.join(str(tmp_path), "dauwau")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = st.stream_dau_wau(spark, path, pairs, out, ckpt, schema)
    q.awaitTermination(180)
    assert q.exception() is None, f"dau_wau crashed: {q.exception()}"
    assert spark.read.parquet(out).count() >= 0


def test_stream_contamination_guard_survives_poison_docs(spark, tmp_path):
    """The ingest contamination guard on a poison DOCUMENT stream:
    NULL / empty / whitespace / sub-shingle texts and a poison
    benchmark side must all flow through (the _trigrams short-doc
    guard covers the streaming path identically); the empty-output
    write must also be abort-free (a micro-batch of only degenerate
    docs emits zero hit rows, not a crash)."""
    from tools.poison_probe import POISON_DOCS

    root = str(tmp_path)
    in_dir = os.path.join(root, "docs")
    out = os.path.join(root, "hits")
    ckpt = os.path.join(root, "ckpt")
    docs = spark.createDataFrame(
        POISON_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).select("doc_id", "source", "text")
    docs.coalesce(1).write.parquet(in_dir)
    q = st.stream_contamination_guard(
        spark, in_dir, out, ckpt, docs.schema, docs
    )
    q.awaitTermination(180)
    assert q.exception() is None, f"contamination_guard crashed: {q.exception()}"
    assert spark.read.parquet(out).count() >= 0
