"""Structured-Streaming twin tests: file-source resume semantics and
event-time windowed aggregation with watermark (rows-only — streaming
state is not SQL-expressible, SURVEY §7.5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from coviddatapipeline_spark.operators.common import events
from coviddatapipeline_spark.pipeline.streaming import (
    stream_csv_to_silver,
    stream_dedup_within_watermark,
    stream_event_counts,
    stream_user_running_totals,
)
from tests.covid_fixture import make_rows, write_csv


def test_stream_resume_exactly_once(spark, tmp_path):
    """Drop file 1, drain; drop file 2, drain: each file processed exactly
    once across restarts (the reference's checkpoint story, natively)."""
    root = str(tmp_path)
    in_dir, silver, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "silver"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    rows = make_rows(600)

    write_csv(os.path.join(in_dir, "batch1.csv"), rows[:300])
    q = stream_csv_to_silver(spark, in_dir, silver, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(silver).count()
    assert n1 > 0

    # restart with a new file present — only the new file is processed
    write_csv(os.path.join(in_dir, "batch2.csv"), rows[300:])
    q = stream_csv_to_silver(spark, in_dir, silver, ckpt)
    q.awaitTermination(120)
    n2 = spark.read.parquet(silver).count()
    assert n2 > n1

    # restart with nothing new — exactly-once means zero growth
    q = stream_csv_to_silver(spark, in_dir, silver, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(silver).count() == n2


def test_stream_event_window_agg(spark, tmp_path, parity_sf_dir):
    """Event-time tumbling window + watermark over the events table,
    driven to completion with availableNow + memory sink; totals must
    reconcile with the batch equivalent."""
    # stage events (with proper timestamp) as a parquet dir for readStream
    staged = os.path.join(str(tmp_path), "events_parquet")
    ev = events(spark, parity_sf_dir)
    ev.write.parquet(staged)

    stream = spark.readStream.schema(ev.schema).parquet(staged)
    agg = stream_event_counts(spark, stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("ev_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # Exactness contract (VERDICT r03 #7): every window the stream
    # emits must equal the batch aggregation cell-for-cell, and the
    # only rows append mode may withhold are the watermark tail —
    # windows ending within (watermark) of the global max event time.
    got = {
        (r["window"]["start"], r["window"]["end"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM ev_out").collect()
    }
    batch_rows = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    batch = {
        (r["window"]["start"], r["window"]["end"], r["event_type"]): r["n"]
        for r in batch_rows
    }
    assert got and all(batch.get(k) == v for k, v in got.items())
    import datetime

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    tail_cut = max_ts - datetime.timedelta(minutes=30)
    withheld = set(batch) - set(got)
    assert all(end > tail_cut for (_, end, _) in withheld), (
        "append mode withheld a window NOT in the watermark tail: "
        f"{sorted(withheld)[:5]}"
    )


def test_stream_stateful_running_totals(spark, tmp_path, parity_sf_dir):
    """applyInPandasWithState: per-user running totals must converge to
    the batch groupBy totals once the stream drains (update mode emits
    one row per user per batch; the LAST emission per user is final)."""
    staged = os.path.join(str(tmp_path), "events_parquet")
    ev = events(spark, parity_sf_dir).select("user_id", "ts", "value")
    ev.write.parquet(staged)

    stream = spark.readStream.schema(ev.schema).parquet(staged)
    out = stream_user_running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # memory sink keeps every per-batch update; running totals are
    # monotone, so max(n_events) per user is the final state.
    final = {
        r["user_id"]: (r["n"], r["v"])
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n, max(total_value) AS v "
            "FROM running_out GROUP BY user_id"
        ).collect()
    }
    expected = {
        r["user_id"]: (r["n"], round(r["v"], 2))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert final == expected


def test_stream_dedup_within_watermark(spark, tmp_path, parity_sf_dir):
    """At-least-once redelivery (the same file staged twice) must
    collapse to exactly one row per event_id downstream."""
    staged = os.path.join(str(tmp_path), "dup_events")
    os.makedirs(staged)
    ev = events(spark, parity_sf_dir).select("event_id", "ts", "user_id").limit(500)
    # two identical deliveries of the same batch
    ev.coalesce(1).write.parquet(os.path.join(staged, "delivery1"))
    ev.coalesce(1).write.parquet(os.path.join(staged, "delivery2"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    out = stream_dedup_within_watermark(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").collect()[0]
    assert got["n"] == got["d"] == 500


def test_stream_session_windows_match_batch(spark, tmp_path, parity_sf_dir):
    """Streaming session_window totals (closed sessions only, append
    mode) must be a subset of — and mostly equal to — the batch
    session_window aggregation over the same data."""
    from coviddatapipeline_spark.pipeline.streaming import stream_session_windows

    staged = os.path.join(str(tmp_path), "sess_events")
    ev = events(spark, parity_sf_dir).select("user_id", "ts", "value")
    ev.write.parquet(staged)

    stream = spark.readStream.schema(ev.schema).parquet(staged)
    out = stream_session_windows(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["session_value"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    batch = {
        (r["user_id"], r["session_window"]["start"], r["session_window"]["end"]): (
            r["n"], round(r["v"], 2)
        )
        for r in ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    # append mode withholds sessions not yet closed by the watermark;
    # everything emitted must match the batch result exactly.
    assert got and all(batch.get(k) == v for k, v in got.items())


def test_stream_refresh_gold_tracks_ingestion(spark, tmp_path):
    """Q6 (count-per-run tracking): gold tables must refresh after each
    streaming drain and reflect the cumulative silver state."""
    from coviddatapipeline_spark.pipeline.streaming import stream_refresh_gold

    root = str(tmp_path)
    in_dir = os.path.join(root, "in")
    silver, gold, ckpt = (
        os.path.join(root, "silver"),
        os.path.join(root, "gold"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    rows = make_rows(400)

    write_csv(os.path.join(in_dir, "b1.csv"), rows[:200])
    q = stream_refresh_gold(spark, in_dir, silver, gold, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(os.path.join(gold, "q1_total_count")).collect()[0][0]
    assert n1 == spark.read.parquet(silver).count() > 0

    # second drop: gold refreshes to the new cumulative count (Q6 story)
    write_csv(os.path.join(in_dir, "b2.csv"), rows[200:])
    q = stream_refresh_gold(spark, in_dir, silver, gold, ckpt)
    q.awaitTermination(120)
    n2 = spark.read.parquet(os.path.join(gold, "q1_total_count")).collect()[0][0]
    assert n2 == spark.read.parquet(silver).count() > n1
    # q5 must agree with a direct aggregation of silver
    got = {
        r["state"]: r["deaths"]
        for r in spark.read.parquet(os.path.join(gold, "q5_deaths_by_state")).collect()
    }
    want = {
        r["state"]: r["deaths"]
        for r in spark.read.parquet(silver)
        .groupBy("state")
        .agg(F.sum("new_deaths").alias("deaths"))
        .collect()
    }
    assert got == want


def test_stream_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics: after the watermark has advanced past a
    window, a row arriving with an event time inside that window is
    DROPPED from append-mode output (not double-counted, not crashed) —
    the principled replacement for the reference's silent same-date
    loss (SURVEY §4.3.1)."""
    import datetime as dt

    staged = os.path.join(str(tmp_path), "late_events")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out_dir = os.path.join(str(tmp_path), "out")
    os.makedirs(staged)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "ts timestamp, user_id long, event_type string, value double"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(staged, name)
        )

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(staged)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .count()
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: two rows in hour-0, plus a row far ahead that pushes the
    # watermark (max ts - 10min) way past hour-0's end.
    write_batch("b1", [
        (base + dt.timedelta(minutes=1), 1, "click", 1.0),
        (base + dt.timedelta(minutes=2), 2, "click", 1.0),
        (base + dt.timedelta(hours=6), 3, "click", 1.0),
    ])
    drain()
    # batch 2 (separate run, watermark restored from checkpoint): a LATE
    # row for hour-0 — must be ignored.
    write_batch("b2", [(base + dt.timedelta(minutes=30), 4, "click", 1.0)])
    drain()
    # hour-0 window was finalized with exactly 2 rows; the late row in
    # batch 2 must not create a duplicate/updated hour-0 window.
    res = spark.read.parquet(out_dir)
    hour0 = res.filter(F.col("window.start") == base).collect()
    assert len(hour0) == 1 and hour0[0]["count"] == 2


def test_stream_stream_interval_join_matches_batch(spark, tmp_path, parity_sf_dir):
    """Stream-stream interval join must produce exactly the pairs the
    batch range-join produces (availableNow drains everything, inner
    join emits every match)."""
    from coviddatapipeline_spark.pipeline.streaming import stream_click_purchase_join
    from coviddatapipeline_spark.queries import catalog

    ev = events(spark, parity_sf_dir)
    clicks_dir = os.path.join(str(tmp_path), "clicks")
    purch_dir = os.path.join(str(tmp_path), "purchases")
    ev.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    ev.filter(F.col("event_type") == "purchase").write.parquet(purch_dir)

    clicks = spark.readStream.schema(ev.schema).parquet(clicks_dir)
    purchases = spark.readStream.schema(ev.schema).parquet(purch_dir)
    joined = stream_click_purchase_join(clicks, purchases)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT purchase_id, count(*) AS n_clicks, round(sum(click_value), 2) AS v "
        "FROM ssj_out GROUP BY purchase_id"
    ).collect()
    got_map = {r["purchase_id"]: (r["n_clicks"], r["v"]) for r in got}
    batch = catalog.all_queries()["range_join_clicks_before_purchase"].fn(
        spark, parity_sf_dir
    ).collect()
    batch_map = {r["purchase_id"]: (r["n_clicks"], r["click_value"]) for r in batch}
    assert got_map == batch_map and got_map


def test_stream_incremental_gold_q5(spark, tmp_path):
    """Update-mode streaming aggregate + dynamic partition overwrite:
    the keyed gold table must equal the batch aggregate after each
    drain, across restarts (state restored from checkpoint)."""
    from coviddatapipeline_spark.pipeline.streaming import stream_incremental_gold_q5
    from coviddatapipeline_spark.pipeline.silver import transform_covid
    from coviddatapipeline_spark.pipeline.schemas import COVID_RAW_SCHEMA

    root = str(tmp_path)
    in_dir, gold, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "gold_q5"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    rows = make_rows(500)

    def batch_expected():
        raw = (
            spark.read.schema(COVID_RAW_SCHEMA)
            .option("header", "true")
            .csv(in_dir)
        )
        return {
            r["state"]: r["d"]
            for r in transform_covid(raw)
            .groupBy("state")
            .agg(F.sum("new_deaths").alias("d"))
            .collect()
        }

    write_csv(os.path.join(in_dir, "b1.csv"), rows[:250])
    q = stream_incremental_gold_q5(spark, in_dir, gold, ckpt)
    q.awaitTermination(120)
    got1 = {r["state"]: r["deaths"] for r in spark.read.parquet(gold).collect()}
    assert got1 == batch_expected()

    write_csv(os.path.join(in_dir, "b2.csv"), rows[250:])
    q = stream_incremental_gold_q5(spark, in_dir, gold, ckpt)
    q.awaitTermination(120)
    got2 = {r["state"]: r["deaths"] for r in spark.read.parquet(gold).collect()}
    assert got2 == batch_expected()
    # totals grew (new data actually processed, not replayed)
    assert sum(got2.values()) > sum(got1.values())


def test_stream_static_enrichment(spark, tmp_path, parity_sf_dir):
    """Stream-static join: streamed events enriched with a static
    per-type weight table must match the batch join exactly."""
    from coviddatapipeline_spark.pipeline.streaming import stream_enrich_with_static

    staged = os.path.join(str(tmp_path), "ss_events")
    ev = events(spark, parity_sf_dir).select("event_id", "event_type", "value")
    ev.write.parquet(staged)
    weights = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("signup", 3.0)],
        "event_type string, weight double",
    )

    stream = spark.readStream.schema(ev.schema).parquet(staged)
    out = stream_enrich_with_static(stream, weights, "event_type")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, round(sum(value * coalesce(weight, 0)), 2) AS wsum "
        "FROM ss_out"
    ).collect()[0]
    want = (
        ev.join(weights, "event_type", "left")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value") * F.coalesce("weight", F.lit(0))), 2).alias("wsum"),
        )
        .collect()[0]
    )
    assert (got["n"], got["wsum"]) == (want["n"], want["wsum"])


def test_stream_daily_mix_drift_matches_batch(spark, tmp_path, parity_sf_dir):
    """The streaming KL-drift monitor (update-mode cell maintenance +
    shared kernel recompute) must EXACTLY equal the batch operator over
    the same events after two incremental drains — counts are integers
    and both paths run the identical kernel, so equality is exact, not
    approximate."""
    from coviddatapipeline_spark.operators.timeseries import events_daily_kl_drift
    from coviddatapipeline_spark.pipeline.streaming import stream_daily_mix_drift

    root = str(tmp_path)
    in_dir, cells, kl, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "cells"),
        os.path.join(root, "kl"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    ev = events(spark, parity_sf_dir).select("event_id", "ts", "event_type")
    mid = ev.approxQuantile("event_id", [0.5], 0.01)[0]

    def stage(df, name):
        # the file stream source lists in_dir FLAT — stage each chunk's
        # part files directly into it, not as a nested parquet dir
        import glob
        import shutil

        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    stage(ev.filter(F.col("event_id") <= mid), "p1")
    stream_daily_mix_drift(
        spark, in_dir, cells, kl, ckpt, ev.schema
    ).awaitTermination(120)
    stage(ev.filter(F.col("event_id") > mid), "p2")
    stream_daily_mix_drift(
        spark, in_dir, cells, kl, ckpt, ev.schema
    ).awaitTermination(120)

    got = {
        (r["day"], r["n_events"], r["kl_prev"])
        for r in spark.read.parquet(kl).collect()
    }
    want = {
        (r["day"], r["n_events"], r["kl_prev"])
        for r in events_daily_kl_drift(spark, parity_sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_stream_cms_grid_matches_batch(spark, tmp_path, parity_sf_dir):
    """The streamed Count-Min grid (update-mode cell maintenance over
    two incremental drains) must equal the batch-built grid cell-for-
    cell — integer counts, exact equality — proving the sketch merges
    across micro-batches; and probe-key estimates read from the
    streamed grid must match the registered batch operator's estimates."""
    from coviddatapipeline_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
        _h,
        sketch_cms_heavy_hitters,
    )
    from coviddatapipeline_spark.pipeline.streaming import stream_cms_grid

    root = str(tmp_path)
    in_dir, grid, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "grid"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    ev = events(spark, parity_sf_dir).select("event_id", "ts", "user_id")
    mid = ev.approxQuantile("event_id", [0.5], 0.01)[0]

    def stage(df, name):
        import glob
        import shutil

        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    stage(ev.filter(F.col("event_id") <= mid), "p1")
    stream_cms_grid(spark, in_dir, grid, ckpt, ev.schema).awaitTermination(120)
    stage(ev.filter(F.col("event_id") > mid), "p2")
    stream_cms_grid(spark, in_dir, grid, ckpt, ev.schema).awaitTermination(120)

    streamed = {
        (r.j, r.bucket): r.cnt for r in spark.read.parquet(grid).collect()
    }
    js = F.array([F.lit(j) for j in range(CMS_DEPTH)])
    batch = {
        (r.j, r.bucket): r.cnt
        for r in (
            ev.select("user_id", F.explode(js).alias("j"))
            .withColumn(
                "bucket",
                _h(
                    F.concat(
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    ),
                    CMS_WIDTH,
                ),
            )
            .groupBy("j", "bucket")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
    }
    assert streamed == batch

    # probe the streamed grid with the batch top-10 keys: the estimate
    # (min over depth rows) must match the registered operator's number
    grid_df = spark.read.parquet(grid)
    top = sketch_cms_heavy_hitters(spark, parity_sf_dir).collect()
    probes = spark.createDataFrame(
        [(r.user_id,) for r in top], "user_id long"
    ).select("user_id", F.explode(js).alias("j"))
    probes = probes.withColumn(
        "bucket",
        _h(
            F.concat(
                F.col("j").cast("string"), F.lit(":"), F.col("user_id").cast("string")
            ),
            CMS_WIDTH,
        ),
    )
    est = {
        r.user_id: r.est
        for r in probes.join(grid_df, ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est"))
        .collect()
    }
    for r in top:
        assert est[r.user_id] == r.cms_estimate, r


def test_stream_dau_wau_matches_batch(spark, tmp_path, parity_sf_dir):
    """The streaming DAU/WAU twin (per-batch (user, day) reduction into
    an idempotent pair log + shared kernel recompute) must EXACTLY
    equal the batch operator after two incremental drains."""
    from coviddatapipeline_spark.queries.catalog import all_queries
    from coviddatapipeline_spark.pipeline.streaming import stream_dau_wau

    root = str(tmp_path)
    in_dir, pairs, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "pairs"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    ev = events(spark, parity_sf_dir).select("event_id", "ts", "user_id")
    mid = ev.approxQuantile("event_id", [0.5], 0.01)[0]

    def stage(df, name):
        import glob
        import shutil

        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    stage(ev.filter(F.col("event_id") <= mid), "p1")
    stream_dau_wau(spark, in_dir, pairs, out, ckpt, ev.schema).awaitTermination(120)
    stage(ev.filter(F.col("event_id") > mid), "p2")
    stream_dau_wau(spark, in_dir, pairs, out, ckpt, ev.schema).awaitTermination(120)

    got = {
        (r["day"], r["dau"], r["wau"], r["stickiness_e4"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["day"], r["dau"], r["wau"], r["stickiness_e4"])
        for r in all_queries()["events_dau_wau_stickiness"]
        .fn(spark, parity_sf_dir)
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_session_paths_match_batch(spark, tmp_path, parity_sf_dir):
    """The applyInPandasWithState session-path twin must emit EXACTLY
    the batch kernel's pre-ranking path multiset — across two
    micro-batches split mid-stream AND a checkpoint restart between
    them, so paths spanning the batch boundary ride the carried
    (e1, e2) state. Expected counts come from an independent pandas
    model (not the Spark batch kernel), and the registered entry's
    ranked top-10 is re-derived from the streamed counts as a second
    check."""
    import glob
    import shutil
    from collections import Counter

    from coviddatapipeline_spark.pipeline.streaming import stream_session_paths
    from coviddatapipeline_spark.queries.catalog import all_queries

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    ev = events(spark, parity_sf_dir).select("event_id", "user_id", "ts", "event_type")

    # independent pandas model of sessionized 3-gram mining
    pdf = ev.toPandas()
    pdf["us"] = pdf["ts"].values.astype("datetime64[us]").astype("int64")

    # Pick the split point deterministically INSIDE a >=3-event session,
    # right after its 2nd event (needing a strict time increase to the
    # 3rd so ties can't pull it back together): the session's first
    # 3-gram then provably spans the batch boundary and only the
    # carried (e1, e2) state can recover it.
    def pick_mid():
        for _, g in pdf.sort_values(["us", "event_id"]).groupby("user_id"):
            us_list = g["us"].tolist()
            start = 0
            for i in range(1, len(us_list) + 1):
                if i == len(us_list) or us_list[i] - us_list[i - 1] > 1_800_000_000:
                    if i - start >= 3 and us_list[start + 2] > us_list[start + 1]:
                        return int(us_list[start + 1])
                    start = i
        return None

    mid = pick_mid()
    assert mid is not None, "testdata has no >=3-event session to sever"

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    # split on event TIME (ties all land left), so per-user arrival
    # order across batches is nondecreasing (ts, event_id) — the twin's
    # stated contract
    stage(ev.filter(F.unix_micros("ts") <= mid), "p1")
    stream_session_paths(spark, in_dir, out, ckpt, ev.schema).awaitTermination(120)
    stage(ev.filter(F.unix_micros("ts") > mid), "p2")
    stream_session_paths(spark, in_dir, out, ckpt, ev.schema).awaitTermination(120)

    got = Counter(r["path"] for r in spark.read.parquet(out).collect())

    def model(frame):
        c = Counter()
        frame = frame.sort_values(["us", "event_id"])
        trail, last = [], None
        for us, et in zip(frame["us"], frame["event_type"]):
            if last is not None and us - last > 1_800_000_000:
                trail = [et]
            else:
                trail.append(et)
                if len(trail) == 3:
                    c[">".join(trail)] += 1
                    trail = trail[-2:]
            last = us
        return c

    want = Counter()
    for _, g in pdf.groupby("user_id"):
        want.update(model(g))
    assert got == want and len(got) > 0

    # the split must actually sever sessions, or the carried-state path
    # is untested: per-batch mining alone must UNDERCOUNT
    parts = Counter()
    for _, g in pdf[pdf["us"] <= mid].groupby("user_id"):
        parts.update(model(g))
    for _, g in pdf[pdf["us"] > mid].groupby("user_id"):
        parts.update(model(g))
    assert sum(parts.values()) < sum(want.values())

    # second check: the registered entry's ranked top-10 re-derived
    # from the streamed counts matches exactly (rank, path, n, share)
    total = sum(got.values())
    ranked = sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    derived = [
        (i + 1, p, n, n * 10000 // total) for i, (p, n) in enumerate(ranked)
    ]
    entry = [
        (r["rank"], r["path"], r["n"], r["share_e4"])
        for r in all_queries()["events_session_path_mining"]
        .fn(spark, parity_sf_dir)
        .collect()
    ]
    assert derived == entry


# ---------------------------------------------------------------------------
# Twin-coverage audit (VERDICT r03 #7)
# ---------------------------------------------------------------------------

# Every streaming twin and the exactness contract its test pins. A new
# stream_* function added to pipeline/streaming.py without an entry
# here (and a test referencing it) turns the audit red — the gap the
# round-3 verdict asked to make structural.
def test_stream_contamination_guard_matches_batch(spark, tmp_path, parity_sf_dir):
    """The streaming ingest-path contamination guard must emit EXACTLY
    the per-doc hit rows the batch kernel computes over the same corpus
    — across two incremental drains, so batch-split independence is
    part of the assertion (contamination is stateless per doc by
    construction; a doc straddling nothing, only the trigger boundary,
    must not change any count)."""
    from coviddatapipeline_spark.operators.datapipe import contamination_hits
    from coviddatapipeline_spark.operators.dedup import _trigrams
    from coviddatapipeline_spark.pipeline.streaming import (
        stream_contamination_guard,
    )

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    docs = spark.read.parquet(os.path.join(parity_sf_dir, "documents.parquet"))
    bench_docs = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0").select(
        "doc_id", "source", "text"
    )
    mid = corpus.approxQuantile("doc_id", [0.5], 0.01)[0]

    def stage(df, name):
        import glob
        import shutil

        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    stage(corpus.filter(F.col("doc_id") <= mid), "p1")
    stream_contamination_guard(
        spark, in_dir, out, ckpt, corpus.schema, bench_docs
    ).awaitTermination(120)
    stage(corpus.filter(F.col("doc_id") > mid), "p2")
    stream_contamination_guard(
        spark, in_dir, out, ckpt, corpus.schema, bench_docs
    ).awaitTermination(120)

    got = {
        (r["doc_id"], r["source"], r["shared"], r["heavy"])
        for r in spark.read.parquet(out).collect()
    }
    sh = corpus.select(
        "doc_id", "source", F.explode(_trigrams(F.col("text"))).alias("s")
    )
    bench = bench_docs.select(
        F.explode(_trigrams(F.col("text"))).alias("s")
    ).distinct()
    want = {
        (r["doc_id"], r["source"], r["shared"], r["shared"] >= 10)
        for r in contamination_hits(sh, bench).collect()
    }
    assert got == want and len(want) > 0


_TWIN_CONTRACTS = {
    "stream_csv_to_silver": "test_stream_resume_exactly_once",
    "stream_refresh_gold": "test_stream_refresh_gold_tracks_ingestion",
    "stream_incremental_gold_q5": "test_stream_incremental_gold_q5",
    "stream_session_windows": "test_stream_session_windows_match_batch",
    "stream_enrich_with_static": "test_stream_static_enrichment",
    "stream_click_purchase_join": "test_stream_stream_interval_join_matches_batch",
    "stream_dedup_within_watermark": "test_stream_dedup_within_watermark",
    "stream_user_running_totals": "test_stream_stateful_running_totals",
    "stream_session_paths": "test_stream_session_paths_match_batch",
    "stream_event_counts": "test_stream_event_window_agg",
    "stream_daily_mix_drift": "test_stream_daily_mix_drift_matches_batch",
    "stream_cms_grid": "test_stream_cms_grid_matches_batch",
    "stream_dau_wau": "test_stream_dau_wau_matches_batch",
    "stream_contamination_guard": "test_stream_contamination_guard_matches_batch",
    "stream_versioned_pinned_read": "test_stream_pinned_read_snapshot_isolation",
    "stream_substring_scrub": "test_stream_substring_scrub_matches_batch",
    "stream_ivf_cell_assign": "test_stream_ivf_cell_assign_matches_batch",
    "stream_kmv_distinct": "test_stream_kmv_distinct_matches_batch",
    "stream_html_extract": "test_stream_html_extract_matches_batch",
    "stream_warc_ingest": "test_stream_warc_ingest_matches_batch",
    "stream_quality_admission": "test_stream_quality_admission_matches_batch",
    "stream_binary_ingest": "test_stream_binary_ingest_matches_batch",
    "stream_unigram_encode": "test_stream_unigram_encode_matches_batch",
    "stream_unigram_admission": "test_stream_unigram_admission_matches_batch",
}


def _public_stream_fns():
    import inspect

    from coviddatapipeline_spark.pipeline import streaming as S

    return sorted(
        n
        for n, obj in vars(S).items()
        if n.startswith("stream_") and inspect.isfunction(obj)
        and obj.__module__ == S.__name__
    )


def test_every_streaming_twin_has_an_exactness_test():
    """Audit: the twin registry above covers every public stream_*
    function, and every named test actually exists in this module."""
    fns = _public_stream_fns()
    missing = [n for n in fns if n not in _TWIN_CONTRACTS]
    assert not missing, f"streaming twins with no exactness test: {missing}"
    stale = [n for n in _TWIN_CONTRACTS if n not in fns]
    assert not stale, f"twin registry names no longer in streaming.py: {stale}"
    here = globals()
    gone = [t for t in _TWIN_CONTRACTS.values() if t not in here]
    assert not gone, f"twin tests named in the registry do not exist: {gone}"

def test_stream_pinned_read_snapshot_isolation(spark, tmp_path, parity_sf_dir):
    """Snapshot isolation under concurrent commits + restart: a stream
    pinned to version 0 of a versioned dim must enrich EVERY micro-batch
    — including batches processed after a writer committed version 1,
    and batches processed by a restarted-from-checkpoint stream — with
    v0's attribute values, byte-for-byte. A control batch read through
    the LIVE pointer must see v1, proving the pin (not staleness of the
    table) is what held the stream's view still."""
    import glob
    import json
    import shutil

    from coviddatapipeline_spark.pipeline.streaming import (
        stream_versioned_pinned_read,
    )
    from coviddatapipeline_spark.sources import read_versioned, write_versioned

    root = str(tmp_path)
    in_dir, out, ckpt, table = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
        os.path.join(root, "dim"),
    )
    os.makedirs(in_dir)

    # v0: priority -> weight 1.0x; v1 doubles every weight.
    dims = spark.createDataFrame(
        [(f"{i}-P", float(i)) for i in range(1, 6)], "priority string, weight double"
    )
    write_versioned(spark, dims, table)  # v0 (pinned)

    orders = (
        spark.read.parquet(os.path.join(parity_sf_dir, "orders.parquet"))
        .select(
            "o_orderkey",
            F.concat(
                F.substring("o_orderpriority", 1, 1), F.lit("-P")
            ).alias("priority"),
        )
    )
    mid = orders.approxQuantile("o_orderkey", [0.5], 0.01)[0]

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    schema = orders.schema

    # drain 1: pinned at the live version (v0)
    stage(orders.filter(F.col("o_orderkey") <= mid), "p1")
    stream_versioned_pinned_read(
        spark, in_dir, table, out, ckpt, schema, "priority"
    ).awaitTermination(120)

    # concurrent commit: v1 doubles the weights and moves the pointer
    write_versioned(
        spark, dims.withColumn("weight", F.col("weight") * 2), table
    )
    assert {r["weight"] for r in read_versioned(spark, table).collect()} == {
        2.0, 4.0, 6.0, 8.0, 10.0,
    }

    # drain 2: RESTART from checkpoint after the commit — the persisted
    # pin, not a re-resolved pointer, must drive the join
    stage(orders.filter(F.col("o_orderkey") > mid), "p2")
    stream_versioned_pinned_read(
        spark, in_dir, table, out, ckpt, schema, "priority"
    ).awaitTermination(120)

    with open(os.path.join(ckpt, "pinned_version.json")) as f:
        assert json.load(f)["version"] == 0

    got = spark.read.parquet(out)
    assert got.count() == orders.count()  # every row, exactly once
    # every enriched row carries a v0 weight (1..5), never a v1 double
    want = {
        (r["o_orderkey"], r["priority"], float(r["priority"][0]))
        for r in orders.collect()
    }
    assert {
        (r["o_orderkey"], r["priority"], r["weight"]) for r in got.collect()
    } == want

def test_stream_substring_scrub_matches_batch(spark, tmp_path, parity_sf_dir):
    """The ingest-path substring scrub must emit EXACTLY the per-doc
    removal report the shared batch kernel computes over the same
    corpus against the same static reference — across two incremental
    drains, so batch-split independence is part of the assertion
    (removal against a static reference is stateless per doc)."""
    import glob
    import shutil

    from coviddatapipeline_spark.operators.dedup import (
        K_GRAM,
        _tokens,
        kgram_window_structs,
        substring_removal_report,
    )
    from coviddatapipeline_spark.pipeline.streaming import stream_substring_scrub

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    docs = spark.read.parquet(os.path.join(parity_sf_dir, "documents.parquet"))
    ref_docs = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    mid = corpus.approxQuantile("doc_id", [0.5], 0.01)[0]

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    stage(corpus.filter(F.col("doc_id") <= mid), "p1")
    stream_substring_scrub(
        spark, in_dir, out, ckpt, corpus.schema, ref_docs
    ).awaitTermination(120)
    stage(corpus.filter(F.col("doc_id") > mid), "p2")
    stream_substring_scrub(
        spark, in_dir, out, ckpt, corpus.schema, ref_docs
    ).awaitTermination(120)

    got = {
        (r["doc_id"], r["n_tok"], r["n_removed"], r["kept_md5"])
        for r in spark.read.parquet(out).collect()
    }
    ref = (
        ref_docs.filter(F.col("text").isNotNull())
        .select(
            F.explode(
                kgram_window_structs(_tokens(F.col("text")), K_GRAM)
            ).alias("w")
        )
        .select(F.col("w.h").alias("h"))
        .distinct()
    )
    batch_docs = corpus.filter(F.col("text").isNotNull()).select(
        "doc_id", _tokens(F.col("text")).alias("tk")
    )
    want = {
        (r["doc_id"], r["n_tok"], r["n_removed"], r["kept_md5"])
        for r in substring_removal_report(batch_docs, ref).collect()
    }
    assert got == want and len(want) > 0
    # the scrub must actually cut something on this corpus (src0 shares
    # boilerplate with the other sources in the synthetic testdata) —
    # a vacuous all-zero report would pass set equality
    assert any(r[2] > 0 for r in got)


def test_stream_pinned_read_fails_loudly_past_retention(spark, tmp_path):
    """The other half of the pin contract: once a SECOND commit lands
    after the pin (the pinned version falls out of the live+predecessor
    retention set), a restarted stream must fail LOUDLY at resolve —
    FileNotFoundError naming the version — never silently re-join a
    different snapshot."""
    import glob
    import shutil

    import pytest

    from coviddatapipeline_spark.pipeline.streaming import (
        stream_versioned_pinned_read,
    )
    from coviddatapipeline_spark.sources import write_versioned

    root = str(tmp_path)
    in_dir, out, ckpt, table = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
        os.path.join(root, "dim"),
    )
    os.makedirs(in_dir)
    dims = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, weight double"
    )
    write_versioned(spark, dims, table)  # v0 (will be pinned)

    rows = spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
    tmp = os.path.join(root, "stage")
    rows.coalesce(1).write.parquet(tmp)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
        shutil.move(f, os.path.join(in_dir, f"p1_{i}.parquet"))

    stream_versioned_pinned_read(
        spark, in_dir, table, out, ckpt, rows.schema, "k"
    ).awaitTermination(120)

    # two commits: v0 leaves the {live, predecessor} retention set
    write_versioned(spark, dims.withColumn("weight", F.col("weight") * 2), table)
    write_versioned(spark, dims.withColumn("weight", F.col("weight") * 3), table)
    assert not os.path.isdir(os.path.join(table, "v0"))

    with pytest.raises(FileNotFoundError, match="version 0"):
        stream_versioned_pinned_read(
            spark, in_dir, table, out, ckpt, rows.schema, "k"
        )

def test_stream_ivf_cell_assign_matches_batch(spark, tmp_path, parity_sf_dir):
    """Streaming IVF cell assignment must emit EXACTLY the (vec_id,
    cluster) rows the shared batch kernels produce for the same vectors
    under the same trained quantizer — across two incremental drains
    (assignment is stateless per vector), including vectors the
    EMB_DIM gate excludes."""
    import glob
    import shutil

    from coviddatapipeline_spark.operators.datapipe import (
        km_assign,
        km_quantize,
        km_train_centroids,
    )
    from coviddatapipeline_spark.pipeline.streaming import stream_ivf_cell_assign

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    emb = spark.read.parquet(os.path.join(parity_sf_dir, "embeddings.parquet"))
    # stream the corpus back through the ingest path, split in two;
    # shift ids so the "incoming" vectors are distinct from training
    incoming = emb.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    mid = incoming.approxQuantile("vec_id", [0.5], 0.01)[0]

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    stage(incoming.filter(F.col("vec_id") <= mid), "p1")
    stream_ivf_cell_assign(
        spark, in_dir, out, ckpt, incoming.schema, parity_sf_dir
    ).awaitTermination(120)
    stage(incoming.filter(F.col("vec_id") > mid), "p2")
    stream_ivf_cell_assign(
        spark, in_dir, out, ckpt, incoming.schema, parity_sf_dir
    ).awaitTermination(120)

    got = {
        (r["vec_id"], r["cluster"])
        for r in spark.read.parquet(out).collect()
    }
    q, cent = km_train_centroids(spark, parity_sf_dir)
    q.unpersist()
    want = {
        (r["vec_id"], r["cluster"])
        for r in km_assign(km_quantize(incoming), cent)
        .select("vec_id", "cluster")
        .collect()
    }
    assert got == want and len(want) > 0
    # every trained cell receives traffic on this corpus (k=8 cells,
    # thousands of vectors) — a collapsed assignment would still pass
    # set equality, so pin the spread
    assert len({c for _, c in got}) == len(cent)


def test_stream_kmv_distinct_matches_batch(spark, tmp_path, parity_sf_dir):
    """The merged store of per-batch KMV sketches must equal the batch
    kernel's sketch of the full corpus ROW-FOR-ROW (lossless union
    composition), across two incremental drains; and re-appending a
    batch's sketch rows (an at-least-once retry) must leave the merged
    sketch byte-identical — the algebraic replay-safety the twin's
    design claims in place of an exactly-once sink."""
    import glob
    import shutil

    from coviddatapipeline_spark.operators.sketch import (
        KMV_K,
        KMV_TYPES,
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )
    from coviddatapipeline_spark.pipeline.streaming import stream_kmv_distinct

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    events = spark.read.parquet(os.path.join(parity_sf_dir, "events.parquet"))

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    mid = events.approxQuantile("event_id", [0.5], 0.01)[0]
    stage(events.filter(F.col("event_id") <= mid), "p1")
    stream_kmv_distinct(spark, in_dir, out, ckpt, events.schema).awaitTermination(120)
    stage(events.filter(F.col("event_id") > mid), "p2")
    stream_kmv_distinct(spark, in_dir, out, ckpt, events.schema).awaitTermination(120)

    store = spark.read.parquet(out)
    merged = kmv_merge(store)
    got = {(r["g"], r["h"]) for r in merged.collect()}

    du = (
        events.filter(
            F.col("user_id").isNotNull() & F.col("event_type").isin(*KMV_TYPES)
        )
        .select(F.col("event_type").alias("g"), F.col("user_id").alias("u"))
        .distinct()
    )
    want = {(r["g"], r["h"]) for r in kmv_sketch(du).collect()}
    assert got == want and len(want) > 0
    # non-vacuous at the parity SF: every type saturates its sketch, so
    # the merge genuinely re-cut the union rather than passing it through
    est = {r["g"]: (r["n_retained"], r["est"]) for r in kmv_estimate(merged).collect()}
    assert set(est) == set(KMV_TYPES)
    for g, (n_ret, _) in est.items():
        assert n_ret == KMV_K, (g, n_ret)

    # replay-safety: duplicate an entire drain's emissions (the
    # at-least-once failure mode) -> the merged sketch cannot move
    store.write.mode("append").parquet(out)
    replay = {(r["g"], r["h"]) for r in kmv_merge(spark.read.parquet(out)).collect()}
    assert replay == got


def test_stream_html_extract_matches_batch(spark, tmp_path, parity_sf_dir):
    """The ingest-path HTML extraction must emit EXACTLY the per-doc
    report the shared batch kernel computes over the same corpus —
    across two incremental drains, so trigger-split independence is
    part of the assertion (extraction is per-row and stateless)."""
    import glob
    import shutil

    from coviddatapipeline_spark.operators.text import html_extract_report
    from coviddatapipeline_spark.pipeline.streaming import stream_html_extract

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    docs = spark.read.parquet(os.path.join(parity_sf_dir, "documents.parquet"))
    mid = docs.approxQuantile("doc_id", [0.5], 0.01)[0]

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    stage(docs.filter(F.col("doc_id") <= mid), "p1")
    stream_html_extract(spark, in_dir, out, ckpt, docs.schema).awaitTermination(120)
    stage(docs.filter(F.col("doc_id") > mid), "p2")
    stream_html_extract(spark, in_dir, out, ckpt, docs.schema).awaitTermination(120)

    key = lambda r: (
        r["doc_id"], r["n_raw_bytes"], r["n_text_chars"], r["n_tokens"],
        r["main_md5"], r["content_ratio_e4"],
    )
    got = {key(r) for r in spark.read.parquet(out).collect()}
    want = {key(r) for r in html_extract_report(docs).collect()}
    assert got == want and len(want) > 0
    # non-vacuous: extraction actually stripped chrome on every doc
    assert all(k[1] is None or k[2] is None or k[2] < k[1] for k in want)


def test_stream_warc_ingest_matches_batch(spark, tmp_path, parity_sf_dir):
    """The ingest-path WARC parse must emit EXACTLY the per-archive
    report the shared batch kernel computes over the same corpus —
    across two incremental drains, so trigger-split independence is
    part of the assertion (parsing is per-archive and stateless)."""
    import glob
    import shutil

    from coviddatapipeline_spark.operators.multimodal import warc_parse_report
    from coviddatapipeline_spark.pipeline.streaming import stream_warc_ingest

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    docs = spark.read.parquet(os.path.join(parity_sf_dir, "documents.parquet"))
    mid = docs.approxQuantile("doc_id", [0.5], 0.01)[0]

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    stage(docs.filter(F.col("doc_id") <= mid), "p1")
    stream_warc_ingest(spark, in_dir, out, ckpt, docs.schema).awaitTermination(120)
    stage(docs.filter(F.col("doc_id") > mid), "p2")
    stream_warc_ingest(spark, in_dir, out, ckpt, docs.schema).awaitTermination(120)

    key = lambda r: (
        r["doc_id"], r["n_members"], r["content_length"],
        r["payload_md5"], r["target_uri"], r["decoded"],
    )
    got = {key(r) for r in spark.read.parquet(out).collect()}
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    want = {key(r) for r in warc_parse_report(payloads).collect()}
    assert got == want and len(want) > 0
    # non-vacuous: every archive decoded with both members seen
    assert all(k[5] and k[1] == 2 for k in want)


def test_stream_quality_admission_matches_batch(spark, tmp_path, parity_sf_dir):
    """The ingest-path admission gate must emit EXACTLY the per-doc
    verdicts the shared batch kernel computes under the same frozen
    weights — across two incremental drains, so trigger-split
    independence is part of the assertion (scoring is stateless), and
    the per-source aggregate of the emissions must equal the
    registered apply entry's report."""
    import glob
    import shutil

    from coviddatapipeline_spark.operators.datapipe import (
        pct_features,
        pct_train,
        pct_verdicts,
    )
    from coviddatapipeline_spark.pipeline.streaming import (
        stream_quality_admission,
    )

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    docs = spark.read.parquet(os.path.join(parity_sf_dir, "documents.parquet"))
    feats, report = pct_train(spark, parity_sf_dir)
    feats.unpersist()
    w = list(report[-1][1:5])  # frozen serving weights (last epoch)
    mid = docs.approxQuantile("doc_id", [0.5], 0.01)[0]

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    stage(docs.filter(F.col("doc_id") <= mid), "p1")
    stream_quality_admission(
        spark, in_dir, out, ckpt, docs.schema, w
    ).awaitTermination(120)
    stage(docs.filter(F.col("doc_id") > mid), "p2")
    stream_quality_admission(
        spark, in_dir, out, ckpt, docs.schema, w
    ).awaitTermination(120)

    key = lambda r: (r["doc_id"], r["source"], r["pred_en"], r["true_en"])
    got = {key(r) for r in spark.read.parquet(out).collect()}
    want = {key(r) for r in pct_verdicts(pct_features(docs), w).collect()}
    assert got == want and len(want) > 0
    # non-vacuous: both true labels occur (the gate has something to
    # separate), and the emitted verdicts match an independent pure-
    # Python margin recomputation on a sample of raw rows (the model
    # may legitimately predict one class everywhere at small SF, so
    # verdict diversity is NOT asserted)
    assert {k[3] for k in want} == {0, 1}
    by_id = {k[0]: k for k in want}
    for r in docs.orderBy("doc_id").limit(20).collect():
        text = r["text"] or ""
        x = [
            1,
            r["n_chars"] or 0,
            text.count(" "),
            text.count("e"),
        ]
        margin = sum(wi * xi for wi, xi in zip(w, x))
        assert by_id[r["doc_id"]][2] == (1 if margin > 0 else 0)
        assert by_id[r["doc_id"]][3] == (1 if r["lang"] == "en" else 0)

    # the arrival-path emissions aggregate to the registered apply
    # entry's per-source report (same weights, same kernel)
    from coviddatapipeline_spark.queries.catalog import all_queries

    batch = {
        (r["source"], r["n_docs"], r["n_pred_en"], r["n_true_en"], r["n_correct"])
        for r in all_queries()["quality_perceptron_apply"]
        .fn(spark, parity_sf_dir)
        .collect()
    }
    agg = {
        (r["source"], r["n"], r["p"], r["t"], r["c"])
        for r in spark.read.parquet(out)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pred_en").cast("long").alias("p"),
            F.sum("true_en").cast("long").alias("t"),
            F.sum((F.col("pred_en") == F.col("true_en")).cast("long"))
            .cast("long")
            .alias("c"),
        )
        .collect()
    }
    assert agg == batch


def test_stream_binary_ingest_matches_batch(spark, tmp_path):
    """The arrival-path binary ingest (files-listing pattern: the
    LISTING streams, each micro-batch re-reads exactly its listed paths
    through the batch binaryFile scan) must emit EXACTLY the per-file
    report the shared batch kernel computes over the whole fixture dir
    — across two incremental drains, so trigger-split independence is
    part of the assertion (parsing is per-file and stateless)."""
    import glob
    import shutil

    from coviddatapipeline_spark.operators.multimodal import (
        binary_blob_scan,
        binary_ingest_report,
        ensure_binary_fixtures,
    )
    from coviddatapipeline_spark.pipeline.streaming import stream_binary_ingest

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    fdir = ensure_binary_fixtures()
    names = sorted(os.listdir(fdir))
    assert len(names) >= 6
    listing = spark.createDataFrame(
        [(os.path.join(fdir, n),) for n in names], "path string"
    )
    mid = names[len(names) // 2]

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    base = os.path.join(fdir, "")
    stage(listing.filter(F.col("path") <= base + mid), "p1")
    stream_binary_ingest(spark, in_dir, out, ckpt, listing.schema).awaitTermination(120)
    stage(listing.filter(F.col("path") > base + mid), "p2")
    stream_binary_ingest(spark, in_dir, out, ckpt, listing.schema).awaitTermination(120)

    key = lambda r: (
        r["file_name"], r["kind"], r["file_bytes"], r["n_records"],
        r["payload_bytes"], r["detail_md5"], r["detail"], r["decoded"],
    )
    got = {key(r) for r in spark.read.parquet(out).collect()}
    want = {key(r) for r in binary_ingest_report(binary_blob_scan(spark, fdir)).collect()}
    assert got == want and len(want) == len(names)
    # non-vacuous: every file decoded, all seven format families present
    assert all(k[7] for k in want)
    assert {k[1] for k in want} == {
        "tar", "zip", "warc", "bmp", "png", "gif", "wav"
    }


def test_stream_unigram_encode_matches_batch(spark, tmp_path, parity_sf_dir):
    """The ingest-path unigram tokenizer must emit EXACTLY the per-doc
    piece/score totals the shared Viterbi kernel computes over the same
    corpus under the same frozen trained vocabulary — across two
    incremental drains, so trigger-split independence is part of the
    assertion (segmentation is stateless under frozen vocab)."""
    import glob
    import shutil

    from coviddatapipeline_spark.operators.text import (
        UNI_MAX_WLEN,
        _tokens,
        _uni_best_seg,
        _uni_wf,
        unigram_train_rounds,
    )
    from coviddatapipeline_spark.pipeline.streaming import stream_unigram_encode

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    docs = spark.read.parquet(os.path.join(parity_sf_dir, "documents.parquet"))
    # train offline (the audited trainer), freeze the final vocabulary
    vocab = unigram_train_rounds(_uni_wf(spark, parity_sf_dir))[-1][2]
    mid = docs.approxQuantile("doc_id", [0.5], 0.01)[0]

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    # one crafted arrival whose second word uses a char OUTSIDE the
    # trained alphabet: the serving path must SURFACE the coverage
    # loss as n_oov instead of silently null-sum-skipping it
    alphabet = {p for p in vocab if len(p) == 1}
    oov_ch = next(c for c in "§¶Ө☃" if c not in alphabet)
    covered_w = max((p for p in vocab if len(p) <= UNI_MAX_WLEN), key=len)
    oov_doc_id = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    oov_doc = spark.createDataFrame(
        [(oov_doc_id, f"{covered_w} {oov_ch}{oov_ch}")],
        docs.select("doc_id", "text").schema,
    )
    extra_cols = [c for c in docs.columns if c not in ("doc_id", "text")]
    for c in extra_cols:
        oov_doc = oov_doc.withColumn(c, F.lit(None).cast(docs.schema[c].dataType))
    oov_doc = oov_doc.select(*docs.columns)

    stage(docs.filter(F.col("doc_id") <= mid), "p1")
    stream_unigram_encode(spark, in_dir, out, ckpt, docs.schema, vocab).awaitTermination(120)
    stage(docs.filter(F.col("doc_id") > mid).unionByName(oov_doc), "p2")
    stream_unigram_encode(spark, in_dir, out, ckpt, docs.schema, vocab).awaitTermination(120)

    key = lambda r: (
        r["doc_id"], r["n_words"], r["n_oov"], r["n_pieces"], r["score"]
    )
    got = {key(r) for r in spark.read.parquet(out).collect()}
    all_docs = docs.unionByName(oov_doc)
    words = (
        all_docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(_tokens(F.col("text"))).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= UNI_MAX_WLEN))
    )
    dp = _uni_best_seg("word", vocab)
    want = {
        key(r)
        for r in words.select("doc_id", dp.alias("dp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.when(F.col("dp").isNull(), F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.col("dp")["np"]).cast("long").alias("n_pieces"),
            F.sum(-F.col("dp")["negsc"]).cast("long").alias("score"),
        )
        .collect()
    }
    assert got == want and len(want) > 0
    # the crafted doc: 2 words, exactly 1 OOV, and the covered word
    # still contributes real pieces/score (no silent NULL collapse)
    oov_rows = [r for r in got if r[0] == oov_doc_id]
    assert len(oov_rows) == 1
    assert oov_rows[0][1] == 2 and oov_rows[0][2] == 1
    assert oov_rows[0][3] is not None and oov_rows[0][3] >= 1
    assert oov_rows[0][4] is not None and oov_rows[0][4] > 0
    # clean docs report zero OOV (vocab was trained on this corpus)
    assert all(r[2] == 0 for r in got if r[0] != oov_doc_id)
    # non-vacuous: every doc got a positive score, and the trained
    # multi-char pieces actually compress somewhere (fewer pieces than
    # words would imply is impossible; fewer pieces than a per-char
    # segmentation is the compression signal — any multi-char piece in
    # the frozen vocab that survived training guarantees it)
    assert any(r[2] > 0 and r[3] > 0 for r in want)
    assert any(len(p) > 1 for p in vocab)


def test_stream_unigram_admission_matches_batch(spark, tmp_path, parity_sf_dir):
    """The arrival-path admission gate must emit EXACTLY the per-doc
    verdicts the shared kernel (text.uni_admission_report) computes
    over the same corpus under the same frozen trained vocabulary —
    across two incremental drains (trigger-split independence: the
    verdict is per-doc and stateless). A crafted OOV-heavy arrival
    must be REJECTED through the OOV arm specifically, with its
    coverage loss surfaced, and both admit outcomes must occur."""
    import glob
    import shutil

    from coviddatapipeline_spark.operators.text import (
        UNI_ADMIT_OOV_PPM,
        _uni_wf,
        uni_admission_report,
        unigram_train_rounds,
    )
    from coviddatapipeline_spark.pipeline.streaming import stream_unigram_admission

    root = str(tmp_path)
    in_dir, out, ckpt = (
        os.path.join(root, "in"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    os.makedirs(in_dir)
    docs = spark.read.parquet(os.path.join(parity_sf_dir, "documents.parquet"))
    vocab = unigram_train_rounds(_uni_wf(spark, parity_sf_dir))[-1][2]
    mid = docs.approxQuantile("doc_id", [0.5], 0.01)[0]

    def stage(df, name):
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(in_dir, f"{name}_{i}.parquet"))

    # crafted arrival: >5% of its words are OOV (char outside the
    # trained alphabet) -> the OOV arm must reject it
    alphabet = {p for p in vocab if len(p) == 1}
    oov_ch = next(c for c in "§¶Ө☃" if c not in alphabet)
    covered_w = max((p for p in vocab if len(p) > 1), key=len)
    bad_id = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    bad_doc = spark.createDataFrame(
        [(bad_id, f"{covered_w} {oov_ch} {oov_ch} {oov_ch}")],
        docs.select("doc_id", "text").schema,
    )
    for c in [c for c in docs.columns if c not in ("doc_id", "text")]:
        bad_doc = bad_doc.withColumn(c, F.lit(None).cast(docs.schema[c].dataType))
    bad_doc = bad_doc.select(*docs.columns)

    stage(docs.filter(F.col("doc_id") <= mid), "p1")
    stream_unigram_admission(
        spark, in_dir, out, ckpt, docs.schema, vocab
    ).awaitTermination(120)
    stage(docs.filter(F.col("doc_id") > mid).unionByName(bad_doc), "p2")
    stream_unigram_admission(
        spark, in_dir, out, ckpt, docs.schema, vocab
    ).awaitTermination(120)

    cols = ("doc_id", "source", "n_word_occ", "bad_occ", "oov_ppm",
            "cost_p10k", "admitted")
    key = lambda r: tuple(r[c] for c in cols)
    got = {key(r) for r in spark.read.parquet(out).collect()}
    want = {
        key(r)
        for r in uni_admission_report(
            docs.unionByName(bad_doc), vocab
        ).collect()
    }
    assert got == want and len(want) > 0
    # the crafted doc: 4 words, 3 OOV -> 750000 ppm, rejected by the
    # OOV arm with the loss surfaced
    bad_rows = [r for r in got if r[0] == bad_id]
    assert len(bad_rows) == 1
    assert bad_rows[0][2] == 4 and bad_rows[0][3] == 3
    assert bad_rows[0][4] == 750_000 > UNI_ADMIT_OOV_PPM
    assert bad_rows[0][6] is False
    # clean docs: zero OOV everywhere (vocab trained on this corpus),
    # yet BOTH outcomes occur -> the compression arm is live too
    clean = {r for r in got if r[0] != bad_id}
    assert all(r[3] == 0 for r in clean)
    assert {r[6] for r in clean} == {True, False}
