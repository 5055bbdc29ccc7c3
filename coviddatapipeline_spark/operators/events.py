"""Event-stream operators over the ``events`` table (the reference's
"never-ending stream" role, /root/reference/README.md:81): tumbling and
sliding event-time windows, sessionization, and an as-of join — the
batch twins of the Structured-Streaming pipeline in
``pipeline.streaming`` (same column algebra; in streaming it runs under
``withWatermark`` with bounded state).

All timestamps go through ``common.events`` (nanos → µs, matching the
DuckDB oracle's truncation). Window starts are emitted as formatted
strings so the value hash is engine-neutral.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from coviddatapipeline_spark.queries.catalog import register
from coviddatapipeline_spark.operators.common import events
from coviddatapipeline_spark.operators.joins import asof_join
from coviddatapipeline_spark.operators.ranking import const_key

_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "events_hourly_rollup",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY hour, event_type
    """,
    doc="Tumbling 1-hour event-time rollup (streaming twin: F.window + watermark).",
    tags=("events", "window"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), _FMT).alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour", "event_type")
    )


@register(
    "events_sliding_window",
    oracle="""
        WITH slid AS (
            -- ts IS NOT NULL mirrors Spark's F.window, which DROPS a
            -- NULL-timestamp row (no window can be assigned) where the
            -- bare oracle would emit a NULL win_start group: total on
            -- poison corpora, no-op on clean data.
            SELECT to_timestamp((floor(epoch(ts) / 900) - i.i) * 900) AS win_start,
                   value
            FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
            WHERE ts IS NOT NULL
        )
        SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM slid
        GROUP BY win_start
        ORDER BY win
    """,
    doc=(
        "Sliding window (1 h size, 15 min slide) via F.window — each event "
        "lands in 4 overlapping windows; the oracle reproduces Spark's "
        "epoch-aligned window assignment arithmetic."
    ),
    tags=("events", "window"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.date_format(F.col("w.start"), _FMT).alias("win"), "n", "total_value")
        .orderBy("win")
    )


@register(
    "events_sessionization",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new_session
            FROM events WHERE ts IS NOT NULL
        ),
        sessions AS (
            SELECT user_id, ts,
                   sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
                                             ROWS UNBOUNDED PRECEDING) AS session_id
            FROM gaps
        )
        SELECT user_id,
               count(DISTINCT session_id) AS n_sessions,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc=(
        "Sessionization (30-min inactivity gap): lag + cumulative-sum "
        "session ids — one shuffle on user_id. Streaming twin: "
        "F.session_window under a watermark."
    ),
    tags=("events", "window"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Session contract (see events_session_path_mining): an event with
    # no timestamp has no position in any session — excluded here and
    # in the oracle alike (engines otherwise place NULL ts on opposite
    # ends of the window sort). No-op on clean data.
    ev = events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag("ts").over(w_order)
    # µs-exact gap compare: the oracle's `ts - lag(ts) > INTERVAL 30 MINUTE`
    # is µs-precise, so a whole-second cast would split gaps in
    # (1800s, 1801s) differently across engines. Same derivation at every
    # sessionization site in this module — keep them identical.
    new_sess = F.when(
        prev.isNull() | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000), 1
    ).otherwise(0)
    return (
        ev.withColumn("is_new_session", new_sess)
        .withColumn("session_id", F.sum("is_new_session").over(w_cum))
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "events_asof_last_click_before_purchase",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS asof_click_ts,
               round(c.value, 2) AS asof_click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
            ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    doc=(
        "As-of join: each purchase enriched with the user's most recent "
        "click at-or-before it. Spark lacks a native ASOF JOIN; implemented "
        "as a tagged union + one ordered window pass per key "
        "(operators.joins.asof_join) — one shuffle, no range explosion. "
        "Oracle uses DuckDB's native ASOF JOIN."
    ),
    tags=("events", "join", "asof"),
)
def events_asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks.select("user_id", "ts", "click_ts", "value"),
        on="ts",
        by="user_id",
        value_cols=["click_ts", "value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("asof_click_ts", _FMT).alias("asof_click_ts"),
        F.round("asof_value", 2).alias("asof_click_value"),
    )


@register(
    "events_user_gap_median_pandas",
    oracle="""
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS gap_us
            FROM events
        ),
        nn AS (
            SELECT user_id, gap_us,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY gap_us) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM g WHERE gap_us IS NOT NULL
        )
        SELECT user_id,
               ((2 * (sum(CASE WHEN rn = (n + 1) // 2 THEN gap_us END)
                      + sum(CASE WHEN rn = (n + 2) // 2 THEN gap_us END))
                 + 200) // 400) / 10000.0 AS median_gap_s,
               count(*) AS n_gaps
        FROM nn
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc=(
        "Grouped-map Pandas UDF (applyInPandas): per-user median "
        "inter-event gap. The custom-operator escape hatch — per-group "
        "imperative logic in Arrow-batched pandas — oracle-checked "
        "against a pure-SQL formulation (lower/upper middle via "
        "row_number, no quantile_cont interpolation). EXACT "
        "arithmetic end-to-end: gaps are integer microseconds, the "
        "even-count median keeps the two middle values as their "
        "integer SUM (so the .5 average never becomes a float), and "
        "the 4-decimal rounding happens in integer space "
        "((2p + q) div 2q) before one final division — the sf0.1 "
        "sweep caught a 1e-4 divergence when pandas' float median "
        "and DuckDB's interpolated quantile rounded an exact "
        "half-tie differently. Scale: one shuffle — on a USER BUCKET, "
        "not the raw user id: a per-user kernel call costs ~ms of "
        "Python overhead each (the cogroup entry measured 2.4 ms/call "
        "— overhead-bound, near-flat across SFs), so the kernel takes "
        "one bucket of users and computes every member's median with "
        "vectorized pandas (sort + cumcount nth-element selection, the "
        "same derivation as the oracle's row_number form)."
    ),
    tags=("events", "udf"),
)
def events_user_gap_median_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Kernel-call count scales with the cluster, not a literal: each
    # bucket materializes ~1/n_buckets of the keyspace as ONE pandas
    # frame, so at 100x data a fixed 64 would grow per-call frames
    # 100x. 4x parallelism keeps per-call frames Arrow-batch-sized
    # (rows_per_call ~ |events| / (4 * cores)) while the per-call
    # Python overhead (~2.4 ms) stays amortized over thousands of
    # users per bucket. Floor 64 guards tiny sessions (local[1]).
    # Bucketing is semantics-free: results are per-user, independent
    # of which bucket a user lands in.
    n_buckets = max(64, spark.sparkContext.defaultParallelism * 4)
    ev = (
        events(spark, sf_dir)
        .filter(F.col("ts").isNotNull())  # a time gap needs a time
        .select("user_id", "event_id", "ts")
        .withColumn("bk", F.pmod(F.hash("user_id"), F.lit(n_buckets)))
    )

    # Kernel is nested so cloudpickle ships it by value (foreign-cwd
    # consumers have no package on the worker path).
    def median_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "median_gap_s": pd.Series(dtype="float64"),
                "n_gaps": pd.Series(dtype="int64"),
            }
        )
        if pdf.empty:
            return empty
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        # integer MICROseconds regardless of the ns/us unit Arrow hands
        # over; all median math stays integral (see oracle doc)
        t_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        uid = pdf["user_id"].to_numpy()
        gap = t_us.diff().to_numpy()
        same = np.r_[False, uid[1:] == uid[:-1]]  # gap defined within a user
        g = pd.DataFrame({"user_id": uid[same], "gap": gap[same].astype("int64")})
        if g.empty:
            return empty
        # nth-element selection per user, fully vectorized: sort by
        # (user, gap), index each user's gaps 0..n-1, keep the lower and
        # upper middle, SUM them (even n: the two middles; odd n: the
        # middle twice) — the exact-integer median x2 of the oracle.
        g = g.sort_values(["user_id", "gap"], kind="mergesort")
        n = g.groupby("user_id")["gap"].transform("size").to_numpy()
        rn = g.groupby("user_id").cumcount().to_numpy()
        lower, upper = (n - 1) // 2, n // 2
        pick = g[(rn == lower) | (rn == upper)]
        agg = pick.groupby("user_id")["gap"].agg(["sum", "count"])
        med2 = np.where(agg["count"] == 1, 2 * agg["sum"], agg["sum"])
        e4 = (2 * med2 + 200) // 400  # round-half-up to 1e-4 s
        n_gaps = g.groupby("user_id")["gap"].size()
        return pd.DataFrame(
            {
                "user_id": agg.index.astype("int64"),
                "median_gap_s": e4 / 10000.0,
                "n_gaps": n_gaps.reindex(agg.index).astype("int64"),
            }
        )

    return (
        ev.groupBy("bk")
        .applyInPandas(median_gap, schema="user_id long, median_gap_s double, n_gaps long")
    )


@register(
    "events_rolling_7d_active_users",
    oracle="""
        WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        spine AS (SELECT DISTINCT d FROM daily)
        SELECT strftime(s.d, '%Y-%m-%d') AS day,
               count(DISTINCT u.user_id) AS wau
        FROM spine s JOIN daily u ON u.d BETWEEN s.d - 6 AND s.d
        GROUP BY s.d
        ORDER BY day
    """,
    doc=(
        "Rolling 7-day distinct active users (WAU): DISTINCT over a "
        "sliding window isn't expressible as a window function, so the "
        "scale pattern is a day-spine range join against the deduped "
        "(day, user) table — candidate volume is 7x the daily-actives "
        "table (already tiny vs the event stream), and the range join is "
        "bounded by construction."
    ),
    tags=("events", "timeseries", "analytics"),
)
def events_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    daily = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    spine = daily.select("d").distinct().select(F.col("d").alias("sd"))
    return (
        spine.join(
            daily,
            (F.col("d") >= F.date_sub(F.col("sd"), 6)) & (F.col("d") <= F.col("sd")),
        )
        .groupBy(F.date_format("sd", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
        .orderBy("day")
    )


@register(
    "events_error_rate_hourly",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
               count(*) AS n_events,
               count(*) FILTER (WHERE event_type = 'error') AS n_errors,
               round(count(*) FILTER (WHERE event_type = 'error') * 100.0
                     / count(*), 4) AS error_pct
        FROM events
        GROUP BY 1
        HAVING round(count(*) FILTER (WHERE event_type = 'error') * 100.0
               / count(*), 4) > 15.0
        ORDER BY hour
    """,
    doc=(
        "Operational monitoring shape: hourly error rate with an "
        "alert-threshold HAVING filter — conditional aggregation over "
        "time buckets, the query a pipeline-health dashboard runs on "
        "the event stream."
    ),
    tags=("events", "agg", "timeseries"),
)
def events_error_rate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    n_err = F.count_if(F.col("event_type") == "error")
    pct = F.round(n_err * 100.0 / F.count("*"), 4)
    return (
        ev.groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            n_err.alias("n_errors"),
            pct.alias("error_pct"),
        )
        .filter(F.col("error_pct") > 15.0)
        .orderBy("hour")
    )


@register(
    "events_funnel_view_click_purchase",
    oracle="""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(ts) AS t2
            FROM events e JOIN s1 USING (user_id)
            WHERE event_type = 'click' AND ts > t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(ts) AS t3
            FROM events e JOIN s2 USING (user_id)
            WHERE event_type = 'purchase' AND ts > t2
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM s1) AS n_view,
               (SELECT count(*) FROM s2) AS n_click_after_view,
               (SELECT count(*) FROM s3) AS n_purchase_after_click,
               round((SELECT count(*) FROM s3) * 1.0
                     / (SELECT count(*) FROM s1), 4) AS full_conversion
    """,
    doc=(
        "Strict-order conversion funnel (view -> click -> purchase): a "
        "user advances a step only with an event STRICTLY AFTER their "
        "previous step's first occurrence. Deliberately different "
        "semantics from events_funnel_conversion (reshape.py), which "
        "compares GLOBAL first-occurrence timestamps in one pass — "
        "that form misses a user whose only click precedes their first "
        "view but who clicks again after it; this form catches them. "
        "The price is one chained conditional min-agg per step, each a "
        "user-keyed shuffle; after the first, every join is "
        "co-partitioned on user_id. Never a window over all users, "
        "never a driver loop — depth-k funnels are k joins."
    ),
    tags=("events", "agg", "join"),
)
def events_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_view"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchase_after_click")))
        .select(
            "*",
            F.round(
                F.col("n_purchase_after_click") * 1.0 / F.col("n_view"), 4
            ).alias("full_conversion"),
        )
    )


@register(
    "events_hourly_gapfill_locf",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   round(sum(value), 2) AS v, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        bounds AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM daily),
        types AS (SELECT DISTINCT event_type FROM events),
        spine AS (
            SELECT t.event_type,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
            FROM types t, bounds
        ),
        j AS (
            SELECT s.event_type, s.hr, d.v, COALESCE(d.n, 0) AS n
            FROM spine s LEFT JOIN daily d USING (event_type, hr)
        )
        SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
               n AS n_events,
               CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS v_filled
        FROM j ORDER BY event_type, hour
    """,
    doc=(
        "Time-series gap filling: a complete hourly spine per event "
        "type (generated, not scanned — F.sequence over the observed "
        "min/max), left-joined to the hourly rollup, missing hours "
        "forward-filled (LOCF) with the last observed value via an "
        "IGNORE NULLS window. Scale shape: the only data-sized work is "
        "the hourly pre-aggregation (one keyed shuffle with map-side "
        "combine); the spine and the LOCF window run on the REDUCED "
        "frame (types x hours — metadata-sized at any corpus scale), "
        "partitioned by event_type, never global."
    ),
    tags=("events", "timeseries", "window"),
)
def events_hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.round(F.sum("value"), 2).alias("v"), F.count("*").alias("n"))
    bounds = hourly.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    j = spine.join(hourly, ["event_type", "hr"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        j.select(
            "event_type",
            F.date_format("hr", _FMT).alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.when(F.col("v").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "events_attribution_first_last",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   first_value(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS first_touch,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS last_touch
            FROM events
        )
        SELECT first_touch, last_touch, count(*) AS n_conversions
        FROM seq
        WHERE event_type = 'purchase' AND last_touch IS NOT NULL
        GROUP BY first_touch, last_touch
        ORDER BY first_touch, last_touch
    """,
    doc=(
        "Marketing-attribution matrix: for every conversion (purchase "
        "event), the user's FIRST-ever touch and the LAST touch "
        "immediately preceding the conversion, counted per (first, "
        "last) pair. Both attribution views come from one pass over "
        "the per-user ordered stream (first_value + lag share the same "
        "user-partitioned window sort); the result collapses to an "
        "|event_types|^2 matrix. At 100 TB the only data-sized cost is "
        "the per-user sort, which sessionization and funnel analysis "
        "already pay — in a real pipeline these windows share one "
        "shuffle via the same repartition key."
    ),
    tags=("events", "window", "agg"),
)
def events_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.first("event_type").over(w).alias("first_touch"),
        F.lag("event_type").over(w).alias("last_touch"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "purchase") & F.col("last_touch").isNotNull()
        )
        .groupBy("first_touch", "last_touch")
        .agg(F.count("*").alias("n_conversions"))
        .orderBy("first_touch", "last_touch")
    )


INCIDENT_FACTOR = 1.2  # an hour is an incident at >120% of mean error rate


@register(
    "events_incident_interval_join",
    oracle=f"""
        WITH err AS (
            SELECT date_trunc('hour', ts) AS hr, min(ts) AS lo, max(ts) AS hi,
                   count(*) AS n_err
            FROM events WHERE event_type = 'error'
            GROUP BY hr
        ),
        thresh AS (SELECT avg(n_err) * {INCIDENT_FACTOR} AS cut FROM err),
        incidents AS (
            SELECT hr, lo, hi FROM err CROSS JOIN thresh WHERE n_err > cut
        )
        SELECT e.event_type,
               count(*) AS n_in_incident,
               count(DISTINCT i.hr) AS n_incidents
        FROM events e
        JOIN incidents i ON e.ts BETWEEN i.lo AND i.hi
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    doc=(
        "Point-in-interval join, bucketized: incident windows are the "
        f"[first, last] error span of hours whose error count exceeds "
        f"{INCIDENT_FACTOR}x the hourly mean; every event landing "
        "inside an incident window is attributed to it. The oracle "
        "states it as a theta join (ts BETWEEN lo AND hi); the Spark "
        "plan is the scale-safe form — intervals are hour-contained by "
        "construction, so the range join becomes an EQUI-join on the "
        "hour granule plus a residual BETWEEN filter, never a "
        "BroadcastNestedLoop over the fact table. (General intervals "
        "replicate to each overlapped granule first — same pattern, "
        "explode(sequence(lo_granule, hi_granule)).) Incident table is "
        "calendar-bounded, broadcast; threshold is a broadcast scalar."
    ),
    tags=("events", "join", "agg"),
)
def events_incident_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n_err"))
    )
    thresh = err.agg((F.avg("n_err") * INCIDENT_FACTOR).alias("cut"))
    incidents = (
        err.crossJoin(F.broadcast(thresh))
        .filter(F.col("n_err") > F.col("cut"))
        .select("hr", "lo", "hi")
    )
    return (
        ev.withColumn("hr", F.date_trunc("hour", "ts"))
        .join(F.broadcast(incidents), "hr")
        .filter(F.col("ts").between(F.col("lo"), F.col("hi")))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_in_incident"),
            F.countDistinct("hr").alias("n_incidents"),
        )
        .orderBy("event_type")
    )


ASOF_FWD_TOLERANCE_S = 3600


@register(
    "events_asof_next_purchase",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, ts, event_id, event_type,
                   min(CASE WHEN event_type = 'purchase' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS next_purchase_ts
            FROM events
        ),
        clicks AS (
            SELECT date_diff('microsecond', ts, next_purchase_ts) AS delay_us
            FROM seq WHERE event_type = 'click'
        )
        SELECT count(*) AS n_clicks,
               count(CASE WHEN delay_us <= {ASOF_FWD_TOLERANCE_S}::BIGINT * 1000000
                          THEN 1 END) AS n_converted_1h,
               round(avg(CASE WHEN delay_us <= {ASOF_FWD_TOLERANCE_S}::BIGINT * 1000000
                              THEN delay_us / 1e6 END), 2) AS avg_delay_s,
               round(quantile_cont(CASE WHEN delay_us <= {ASOF_FWD_TOLERANCE_S}::BIGINT
                                             * 1000000
                                        THEN delay_us / 1e6 END, 0.5), 2)
                   AS median_delay_s
        FROM clicks
    """,
    doc=(
        "Forward as-of join with tolerance: for every click, the SAME "
        "user's next purchase after it in STREAM order — strictness is "
        "over the (ts, event_id) sequence position, not time: a "
        "purchase sharing the click's exact timestamp counts as 'next' "
        "when its event_id is larger (and is skipped when smaller), "
        "the standard deterministic tie-break for same-instant events; "
        "both engines order identically so parity is exact. Kept only "
        "within a 1-hour window — the conversion-latency primitive. "
        "Expressed "
        "as a conditional running-min over the user-partitioned "
        "ordered event stream (ROWS 1 FOLLOWING .. UNBOUNDED), so it "
        "is ONE shuffle on user_id with no self-join at all — the "
        "window-as-asof trick that beats a range join whenever both "
        "sides live in the same stream. Delays are computed in exact "
        "integer microseconds (unix_micros both sides) before the "
        "float division, so truncation semantics cannot diverge "
        "between engines. Complements events_asof_last_click_before_"
        "purchase (backward as-of, two-table form)."
    ),
    tags=("events", "window", "asof"),
)
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    seq = ev.withColumn(
        "next_purchase_ts",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
    )
    clicks = seq.filter(F.col("event_type") == "click").select(
        (F.unix_micros("next_purchase_ts") - F.unix_micros("ts")).alias("delay_us")
    )
    tol_us = ASOF_FWD_TOLERANCE_S * 1_000_000
    in_tol = F.when(F.col("delay_us") <= tol_us, F.col("delay_us") / 1e6)
    return clicks.agg(
        F.count("*").alias("n_clicks"),
        F.count(F.when(F.col("delay_us") <= tol_us, 1)).alias("n_converted_1h"),
        F.round(F.avg(in_tol), 2).alias("avg_delay_s"),
        F.round(F.percentile(in_tol, F.lit(0.5)), 2).alias("median_delay_s"),
    )


FUNNEL_CLICK_WINDOW_S = 1800
FUNNEL_PURCHASE_WINDOW_S = 3600


@register(
    "events_funnel_time_bounded",
    oracle=f"""
        WITH fv AS (
            SELECT user_id, min(ts) AS vts FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        fc AS (
            SELECT c.user_id, min(c.ts) AS cts
            FROM events c JOIN fv ON c.user_id = fv.user_id
            WHERE c.event_type = 'click' AND c.ts > fv.vts
              AND date_diff('microsecond', fv.vts, c.ts)
                  <= {FUNNEL_CLICK_WINDOW_S}::BIGINT * 1000000
            GROUP BY c.user_id
        ),
        fp AS (
            SELECT p.user_id, min(p.ts) AS pts
            FROM events p JOIN fc ON p.user_id = fc.user_id
            WHERE p.event_type = 'purchase' AND p.ts > fc.cts
              AND date_diff('microsecond', fc.cts, p.ts)
                  <= {FUNNEL_PURCHASE_WINDOW_S}::BIGINT * 1000000
            GROUP BY p.user_id
        )
        SELECT (SELECT count(*) FROM fv) AS n_view_users,
               (SELECT count(*) FROM fc) AS n_click_30m,
               (SELECT count(*) FROM fp) AS n_purchase_60m,
               round((SELECT count(*) FROM fc) * 1.0
                     / (SELECT count(*) FROM fv), 4) AS view_to_click,
               round((SELECT count(*) FROM fp) * 1.0
                     / nullif((SELECT count(*) FROM fc), 0), 4) AS click_to_purchase
    """,
    doc=(
        "Time-bounded conversion funnel: first view -> first click "
        "within 30 min -> first purchase within 60 min of that click, "
        "counted per user. Each stage REDUCES to one row per user "
        "(min-timestamp groupBy, map-side combinable) BEFORE the next "
        "join, so stage joins are user-key equi-joins between "
        "per-user tables with a residual time-range predicate — "
        "fan-out is bounded by events-per-user at the candidate "
        "stage, never views x clicks. Microsecond-exact integer time "
        "arithmetic on both engines. Complements the unbounded "
        "strict-order funnel (events_funnel_view_click_purchase) "
        "with the session-realistic windowed semantics."
    ),
    tags=("events", "join", "funnel"),
)
def events_funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    fc = (
        clicks.join(fv, "user_id")
        .filter(
            (F.col("ts") > F.col("vts"))
            & (
                F.unix_micros("ts") - F.unix_micros("vts")
                <= FUNNEL_CLICK_WINDOW_S * 1_000_000
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    fp = (
        purchases.join(fc, "user_id")
        .filter(
            (F.col("ts") > F.col("cts"))
            & (
                F.unix_micros("ts") - F.unix_micros("cts")
                <= FUNNEL_PURCHASE_WINDOW_S * 1_000_000
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    nv = F.broadcast(fv.agg(F.count("*").alias("n_view_users")))
    nc = F.broadcast(fc.agg(F.count("*").alias("n_click_30m")))
    np_ = F.broadcast(fp.agg(F.count("*").alias("n_purchase_60m")))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view_users",
            "n_click_30m",
            "n_purchase_60m",
            F.round(F.col("n_click_30m") / F.col("n_view_users"), 4).alias(
                "view_to_click"
            ),
            F.round(
                F.col("n_purchase_60m")
                / F.nullif(F.col("n_click_30m"), F.lit(0)),
                4,
            ).alias("click_to_purchase"),
        )
    )


# ---------------------------------------------------------------------------
# Watermark-delay sizing: global out-of-orderness profile
# ---------------------------------------------------------------------------

_LATE_EDGES_S = (0, 1, 10, 60, 600)  # bucket edges in seconds


@register(
    "events_lateness_watermark_profile",
    oracle="""
        WITH x AS (
            SELECT epoch_us(ts) AS ts_us,
                   max(epoch_us(ts)) OVER (ORDER BY event_id
                                           ROWS UNBOUNDED PRECEDING) AS run_max
            FROM events
        ),
        l AS (SELECT run_max - ts_us AS late_us FROM x),
        b AS (
            SELECT CASE WHEN late_us = 0 THEN 0
                        WHEN late_us <= 1000000 THEN 1
                        WHEN late_us <= 10000000 THEN 2
                        WHEN late_us <= 60000000 THEN 3
                        WHEN late_us <= 600000000 THEN 4
                        ELSE 5 END AS bucket_ord,
                   late_us
            FROM l
        )
        SELECT bucket_ord,
               CASE bucket_ord WHEN 0 THEN 'in_order'
                               WHEN 1 THEN 'le_1s'
                               WHEN 2 THEN 'le_10s'
                               WHEN 3 THEN 'le_60s'
                               WHEN 4 THEN 'le_600s'
                               ELSE 'gt_600s' END AS lateness_bucket,
               count(*) AS n,
               CAST(max(late_us) AS BIGINT) AS max_late_us
        FROM b
        GROUP BY bucket_ord
        ORDER BY bucket_ord
    """,
    doc=(
        "Watermark-delay sizing profile: per event, lateness = (max "
        "event-time seen so far in stream order) - own event-time — the "
        "out-of-orderness a Structured Streaming watermark must absorb; "
        "the histogram over {in-order, <=1s, <=10s, <=60s, <=600s, "
        ">600s} with per-bucket max is exactly the evidence that picks "
        "``withWatermark``'s delay (and prices what the tail buckets "
        "would drop). The prefix max runs through "
        "ranking.with_global_running_max — range-bucketed, never an "
        "``Exchange SinglePartition`` funnel — and everything is integer "
        "microseconds, so the histogram is exact on both engines. The "
        "oracle's single-node window states the same semantics "
        "declaratively."
    ),
    tags=("events", "streaming", "window"),
)
def events_lateness_watermark_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.ranking import with_global_running_max

    ev = events(spark, sf_dir).select(
        "event_id", F.unix_micros("ts").alias("ts_us")
    )
    run = with_global_running_max(ev, ["event_id"], "ts_us", out="run_max")
    late = run.select((F.col("run_max") - F.col("ts_us")).alias("late_us"))
    edges_us = [e * 1_000_000 for e in _LATE_EDGES_S]
    bucket = (
        F.when(F.col("late_us") == edges_us[0], 0)
        .when(F.col("late_us") <= edges_us[1], 1)
        .when(F.col("late_us") <= edges_us[2], 2)
        .when(F.col("late_us") <= edges_us[3], 3)
        .when(F.col("late_us") <= edges_us[4], 4)
        .otherwise(5)
    )
    labels = ["in_order", "le_1s", "le_10s", "le_60s", "le_600s", "gt_600s"]
    label = F.element_at(F.array([F.lit(x) for x in labels]), F.col("bucket_ord") + 1)
    return (
        late.withColumn("bucket_ord", bucket)
        .groupBy("bucket_ord")
        .agg(F.count("*").alias("n"), F.max("late_us").alias("max_late_us"))
        .select("bucket_ord", label.alias("lateness_bucket"), "n", "max_late_us")
        .orderBy("bucket_ord")
    )


# ---------------------------------------------------------------------------
# Capacity planning: exact per-minute rate percentiles
# ---------------------------------------------------------------------------


@register(
    "events_rate_percentiles_exact",
    oracle="""
        WITH m AS (
            SELECT date_trunc('minute', ts) AS minute, count(*) AS cnt
            FROM events GROUP BY 1
        ),
        r AS (
            SELECT cnt, row_number() OVER (ORDER BY cnt, minute) AS rn FROM m
        ),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
        sel AS (
            SELECT 1 AS ord, 'p50' AS stat, (n * 50 + 99) // 100 AS k FROM nn
            UNION ALL SELECT 2, 'p95', (n * 95 + 99) // 100 FROM nn
            UNION ALL SELECT 3, 'p99', (n * 99 + 99) // 100 FROM nn
            UNION ALL SELECT 4, 'max', n FROM nn
        )
        SELECT sel.ord, sel.stat, CAST(r.cnt AS BIGINT) AS events_per_minute
        FROM sel JOIN r ON r.rn = sel.k
        ORDER BY sel.ord
    """,
    doc=(
        "Exact per-minute ingest-rate percentiles (p50/p95/p99/max) — "
        "the capacity-planning numbers behind trigger intervals, "
        "maxFilesPerTrigger/maxOffsetsPerTrigger sizing, and alert "
        "thresholds; approx_percentile is the cheap 100 TB default, "
        "THIS is the exact reference it is validated against. "
        "Selection is rank-based in pure integers (k = ceil(p*n/100) "
        "computed as (p*n+99) div 100, value = the row at global rank "
        "k under the unique (count, minute) order), so no "
        "interpolation and no float percentile semantics to diverge "
        "cross-engine — the lower-selection discipline the per-user "
        "median entry established. The global rank comes from "
        "ranking.with_global_row_number (cutpoint buckets, no "
        "single-partition funnel); the minute table it ranks is "
        "calendar-bounded, not stream-sized."
    ),
    tags=("events", "agg", "window"),
)
def events_rate_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.ranking import with_global_row_number

    # OPTIMIZATION_r13 §6: the ranker's eager cutpoint + count jobs plus
    # the final pass would otherwise evaluate the events scan + minute
    # groupBy three times; the checkpoint materializes the minute-count
    # frame (calendar-bounded: one row per active minute) once.
    m = (
        events(spark, sf_dir)
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    ranked, n = with_global_row_number(m, ["cnt", "minute"], out="rn")
    sel = [
        (1, "p50", (n * 50 + 99) // 100),
        (2, "p95", (n * 95 + 99) // 100),
        (3, "p99", (n * 99 + 99) // 100),
        (4, "max", n),
    ]
    sel_df = m.sparkSession.createDataFrame(sel, "ord int, stat string, k long")
    return (
        ranked.join(F.broadcast(sel_df), ranked.rn == sel_df.k)
        .select("ord", "stat", F.col("cnt").alias("events_per_minute"))
        .orderBy("ord")
    )


@register(
    "events_session_survival",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new_session
            FROM events WHERE ts IS NOT NULL
        ),
        sessions AS (
            SELECT user_id, ts,
                   sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
                                             ROWS UNBOUNDED PRECEDING) AS session_id
            FROM gaps
        ),
        d AS (
            SELECT user_id, session_id,
                   epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
            FROM sessions GROUP BY user_id, session_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(count(CASE WHEN dur_us >= 60000000 THEN 1 END) AS BIGINT) AS ge_1m,
               CAST(count(CASE WHEN dur_us >= 300000000 THEN 1 END) AS BIGINT) AS ge_5m,
               CAST(count(CASE WHEN dur_us >= 900000000 THEN 1 END) AS BIGINT) AS ge_15m,
               CAST(count(CASE WHEN dur_us >= 60000000 THEN 1 END) * 10000
                    // count(*) AS BIGINT) AS share_1m_e4,
               CAST(count(CASE WHEN dur_us >= 300000000 THEN 1 END) * 10000
                    // count(*) AS BIGINT) AS share_5m_e4,
               CAST(count(CASE WHEN dur_us >= 900000000 THEN 1 END) * 10000
                    // count(*) AS BIGINT) AS share_15m_e4
        FROM d
    """,
    doc=(
        "Session-duration survival curve: the fraction of 30-min-gap "
        "sessions lasting at least 1/5/15 minutes — the engagement "
        "tail (a survival function sampled at fixed horizons) product "
        "analytics reads next to the session counts the sessionization "
        "entry reports. Same lag + cumulative-flag session frame "
        "(user-partitioned windows, one shuffle), durations in exact "
        "integer microseconds, shares in e4 integer division — no "
        "float anywhere. At scale the only data-sized work is the "
        "per-(user, session) min/max reduction, map-side combinable "
        "after the session tag."
    ),
    tags=("events", "window", "agg"),
)
def events_session_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Session contract: NULL-ts events excluded (see events_sessionization)
    ev = events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = W.partitionBy("user_id").orderBy("ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    prev = F.lag("ts").over(w_order)
    new_sess = F.when(
        prev.isNull() | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000), 1
    ).otherwise(0)
    d = (
        ev.withColumn("is_new_session", new_sess)
        .withColumn("session_id", F.sum("is_new_session").over(w_cum))
        .groupBy("user_id", "session_id")
        .agg(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us")
        )
    )
    ge = lambda us: F.count(F.when(F.col("dur_us") >= us, 1))
    return d.agg(
        F.count("*").alias("n_sessions"),
        ge(60_000_000).alias("ge_1m"),
        ge(300_000_000).alias("ge_5m"),
        ge(900_000_000).alias("ge_15m"),
    ).select(
        "n_sessions",
        "ge_1m",
        "ge_5m",
        "ge_15m",
        F.expr("CAST((ge_1m * 10000) DIV n_sessions AS BIGINT)").alias("share_1m_e4"),
        F.expr("CAST((ge_5m * 10000) DIV n_sessions AS BIGINT)").alias("share_5m_e4"),
        F.expr("CAST((ge_15m * 10000) DIV n_sessions AS BIGINT)").alias(
            "share_15m_e4"
        ),
    )


# ---------------------------------------------------------------------------
# Bucketed temporal range join (neighbor counting)
# ---------------------------------------------------------------------------

NEIGHBOR_WINDOW_US = 60_000_000  # +/- 60 s


@register(
    "events_temporal_neighbor_join",
    oracle=f"""
        WITH us AS (
            SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        ),
        pairs AS (
            SELECT a.event_id, CAST(count(*) AS BIGINT) AS nb
            FROM us a JOIN us b
              ON b.tus BETWEEN a.tus - {NEIGHBOR_WINDOW_US}
                           AND a.tus + {NEIGHBOR_WINDOW_US}
             AND b.user_id <> a.user_id
            GROUP BY a.event_id
        ),
        per AS (
            SELECT e.event_id, CAST(coalesce(p.nb, 0) AS BIGINT) AS neighbor_count
            FROM us e LEFT JOIN pairs p ON e.event_id = p.event_id
        )
        SELECT neighbor_count, CAST(count(*) AS BIGINT) AS n_events
        FROM per GROUP BY neighbor_count
        ORDER BY neighbor_count
    """,
    doc=(
        "Temporal range join by minute bucketing: for every event, the "
        "number of OTHER users' events within +/-60 s (the co-activity "
        "signal behind bot-ring and flash-crowd detection), reported as "
        "the neighbor-count histogram. The naive form is an inequality "
        "theta-join — a nested-loop O(n^2) plan no engine saves you "
        "from; here each event maps to its epoch-minute bucket, probes "
        "the three adjacent buckets via a 3-way explode, and the join is "
        "a plain EQUI-join on the bucket key (cost n x window-density, "
        "shuffle-partitionable on the bucket like any hash join) with "
        "the exact |dt| <= 60 s refinement applied post-join. Zero-"
        "neighbor events survive via the left join-back, so the "
        "histogram is total. This is the generic interval/range-join "
        "recipe (bucket width = range width => candidates live in "
        "adjacent buckets only) that also powers the as-of and interval-"
        "stabbing entries at 100 TB. Plan-tested: no cartesian, no "
        "broadcast-nested-loop."
    ),
    tags=("events", "join", "range"),
)
def events_temporal_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    us = events(spark, sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("tus")
    )
    bucket = F.expr(f"tus DIV {NEIGHBOR_WINDOW_US}")
    right = us.select(
        F.col("event_id").alias("b_event_id"),
        F.col("user_id").alias("b_user_id"),
        F.col("tus").alias("b_tus"),
        bucket.alias("bucket"),
    )
    probes = us.select(
        "event_id",
        "user_id",
        "tus",
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bucket"),
    )
    pairs = (
        probes.join(right, "bucket")
        .filter(
            (F.col("b_user_id") != F.col("user_id"))
            & (F.abs(F.col("b_tus") - F.col("tus")) <= NEIGHBOR_WINDOW_US)
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("nb"))
    )
    per = us.join(pairs, "event_id", "left").select(
        "event_id", F.coalesce(F.col("nb"), F.lit(0)).cast("long").alias("neighbor_count")
    )
    return (
        per.groupBy("neighbor_count")
        .agg(F.count("*").alias("n_events"))
        .orderBy("neighbor_count")
    )


# ---------------------------------------------------------------------------
# Exact sliding-window distinct: DAU / WAU / stickiness
# ---------------------------------------------------------------------------

WAU_DAYS = 7


def dau_wau_from_daily_users(du: DataFrame) -> DataFrame:
    """Shared kernel: (user_id, day) distinct-activity pairs -> the
    DAU/WAU/stickiness table. Used by the batch operator and by the
    streaming twin (pipeline.streaming.stream_dau_wau), so both paths
    are the same column algebra by construction."""
    du = du.distinct()
    bounds = du.agg(F.min("day").alias("mind"), F.max("day").alias("maxd"))
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    ks = F.array(*[F.lit(k) for k in range(WAU_DAYS)])
    # OPTIMIZATION_r12 §B7 (guide §2.4): no .distinct() on the exploded
    # contributions — the downstream countDistinct("user_id") per tday
    # already dedups (user, tday) pairs in its own partial aggregation,
    # so the explicit distinct was a second full Exchange of the same
    # rows for the same answer (plan: 3 -> 2 data-sized shuffles).
    contrib = du.select(
        "user_id", F.explode(ks).alias("k"), "day"
    ).select("user_id", F.date_add("day", F.col("k")).alias("tday"))
    wau = (
        contrib.crossJoin(F.broadcast(bounds))
        .filter((F.col("tday") >= F.col("mind")) & (F.col("tday") <= F.col("maxd")))
        .groupBy(F.col("tday").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        wau.join(dau, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.expr(
                "CAST(coalesce(dau, 0) * 10000 DIV wau AS BIGINT)"
            ).alias("stickiness_e4"),
        )
        .orderBy("day")
    )



@register(
    "events_dau_wau_stickiness",
    oracle=f"""
        WITH du AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        bounds AS (SELECT min(day) AS mind, max(day) AS maxd FROM du),
        dau AS (
            SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day
        ),
        contrib AS (
            SELECT DISTINCT user_id, day + CAST(k AS INTEGER) AS tday
            FROM du, (SELECT unnest(generate_series(0, {WAU_DAYS - 1})) AS k)
        ),
        wau AS (
            SELECT c.tday AS day, CAST(count(DISTINCT c.user_id) AS BIGINT)
                       AS wau
            FROM contrib c, bounds b
            WHERE c.tday BETWEEN b.mind AND b.maxd
            GROUP BY c.tday
        )
        SELECT w.day,
               CAST(coalesce(d.dau, 0) AS BIGINT) AS dau,
               w.wau,
               CAST(coalesce(d.dau, 0) * 10000 // w.wau AS BIGINT)
                   AS stickiness_e4
        FROM wau w LEFT JOIN dau d ON w.day = d.day
        ORDER BY w.day
    """,
    doc=(
        f"Exact distinct-over-sliding-window without re-scanning the "
        f"window: daily active users, trailing-{WAU_DAYS}-day active "
        f"users, and the DAU/WAU stickiness ratio (e4 integer). The "
        f"naive form re-aggregates {WAU_DAYS} days of raw events per "
        f"output day ({WAU_DAYS}x read amplification, and count "
        f"DISTINCT cannot ride a rolling window frame because distinct "
        f"is not subtractable); here the event stream is first reduced "
        f"to distinct (user, day) — the only full-data shuffle — and "
        f"each activity day then contributes to its {WAU_DAYS} "
        f"covering window-end days via a constant explode, so the WAU "
        f"count is an ordinary distinct-aggregate over a table "
        f"{WAU_DAYS}x the (user, day) reduction, never the raw stream. "
        f"Window-end days outside the observed range are dropped, so "
        f"every reported row has a fully-formed-or-truncated-left "
        f"window exactly like the oracle. Days whose ENTIRE trailing "
        f"window is empty (an activity gap of >= {WAU_DAYS + 1} days) "
        f"emit no row rather than a 0/0 stickiness — property-tested "
        f"against a brute-force model. All integers."
    ),
    tags=("events", "agg", "window"),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    return dau_wau_from_daily_users(du)


# ---------------------------------------------------------------------------
# Session path mining: top 3-step clickstream paths
# ---------------------------------------------------------------------------

PATH_TOP = 10


@register(
    "events_session_path_mining",
    oracle=f"""
        WITH gaps AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN ts - lag(ts) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                        OR lag(ts) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events WHERE ts IS NOT NULL
        ),
        sess AS (
            SELECT user_id, ts, event_id, event_type,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM gaps
        ),
        steps AS (
            SELECT event_type AS e1,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
            FROM sess
            WINDOW w AS (PARTITION BY user_id, session_id
                         ORDER BY ts, event_id)
        ),
        paths AS (
            SELECT concat(e1, '>', e2, '>', e3) AS path,
                   CAST(count(*) AS BIGINT) AS n
            FROM steps WHERE e2 IS NOT NULL AND e3 IS NOT NULL
            GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM paths)
        SELECT CAST(row_number() OVER (ORDER BY p.n DESC, p.path) AS BIGINT)
                   AS rank,
               p.path, p.n,
               CAST(p.n * 10000 // t.total AS BIGINT) AS share_e4
        FROM paths p CROSS JOIN tot t
        QUALIFY rank <= {PATH_TOP}
        ORDER BY rank
    """,
    doc=(
        f"Clickstream path mining: the top-{PATH_TOP} 3-step event-type "
        f"paths WITHIN sessions (30-min gap sessionization, then two "
        f"leads over the (user, session) window — a path never crosses "
        f"a session boundary because the window partition ends there). "
        f"This is the n-gram generalization of the Markov transition "
        f"matrix entry: where that estimates one-step dynamics, paths "
        f"expose the actual funnels users walk. One shuffle on user_id "
        f"(sessionize + leads ride the same partitioning), one "
        f"combinable path count; the ranking window sees only the "
        f"path-vocabulary table (<= |event_types|^3 rows). Share is e4 "
        f"integer division of exact counts."
    ),
    tags=("events", "window", "sequence"),
)
def events_session_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    # An event with no timestamp has no position in any session:
    # excluded HERE, in the oracle, and in the streaming twin
    # (stream_session_paths), symmetrically. Without the filter the
    # engines silently disagree on dirty data (Spark windows sort NULL
    # ts first, DuckDB last) and the streaming kernel's NaT -> int64
    # cast fabricates session breaks. No-op on clean data.
    ev = events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev = F.lag("ts").over(w_order)
    new_sess = F.when(
        prev.isNull() | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000), 1
    ).otherwise(0)
    sess = ev.withColumn("is_new", new_sess).withColumn(
        "session_id", F.sum("is_new").over(w_cum)
    )
    w_path = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    steps = sess.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w_path).alias("e2"),
        F.lead("event_type", 2).over(w_path).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = steps.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count("*").alias("n"))
    tot = paths.agg(F.sum("n").alias("total"))
    # constant-key global window: input is per-path aggregates, bounded
    # by |event_type|^3 distinct 3-step paths
    w_rank = W.partitionBy(const_key("path")).orderBy(F.col("n").desc(), "path")
    return (
        paths.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= PATH_TOP)
        .select(
            "rank",
            "path",
            F.col("n").cast("long").alias("n"),
            F.expr("CAST(n * 10000 DIV total AS BIGINT)").alias("share_e4"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Peak concurrent sessions by sweep-line
# ---------------------------------------------------------------------------


@register(
    "events_peak_concurrency",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                        OR lag(ts) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events WHERE ts IS NOT NULL
        ),
        sess AS (
            SELECT user_id,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id,
                   epoch_us(ts) AS tus
            FROM gaps
        ),
        spans AS (
            SELECT user_id, session_id,
                   min(tus) AS s, max(tus) + 1 AS e
            FROM sess GROUP BY user_id, session_id
        ),
        deltas AS (
            SELECT s AS tus, 1 AS d FROM spans
            UNION ALL
            SELECT e AS tus, -1 AS d FROM spans
        ),
        merged AS (
            SELECT tus, CAST(sum(d) AS BIGINT) AS d
            FROM deltas GROUP BY tus
        ),
        run AS (
            SELECT tus,
                   CAST(sum(d) OVER (ORDER BY tus ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS active
            FROM merged
        )
        SELECT CAST(to_timestamp(tus // 1000000) AS DATE) AS day,
               CAST(max(active) AS BIGINT) AS peak_concurrent
        FROM run
        GROUP BY day
        ORDER BY day
    """,
    doc=(
        "Peak concurrent sessions per day by SWEEP-LINE over session "
        "spans: sessions come from the shared 30-min-gap derivation, "
        "each span emits +1 at its first event and -1 one microsecond "
        "after its last, deltas MERGE per instant before the prefix "
        "sum (so tie order inside an instant cannot affect the "
        "running value — the cross-engine determinism trick), and the "
        "prefix sum runs through the cutpoint-bucketed running-sum "
        "helper. The concurrency function is piecewise constant and "
        "changes only at span boundaries, so the per-day max over "
        "boundary instants IS the day's peak among session-boundary "
        "instants (documented: a midnight-spanning lull day samples "
        "its carried-in level at its first boundary). The capacity "
        "number a connection-pool or license tier is sized by; same "
        "event-differencing shape as the order-backlog entry, at "
        "microsecond grain."
    ),
    tags=("events", "window", "sweepline"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.ranking import with_global_running_sum

    # Session contract: NULL-ts events excluded (see events_sessionization)
    ev = events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev = F.lag("ts").over(w_order)
    new_sess = F.when(
        prev.isNull() | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000), 1
    ).otherwise(0)
    sess = (
        ev.withColumn("is_new", new_sess)
        .withColumn("session_id", F.sum("is_new").over(w_cum))
        .select("user_id", "session_id", F.unix_micros("ts").alias("tus"))
    )
    spans = sess.groupBy("user_id", "session_id").agg(
        F.min("tus").alias("s"), (F.max("tus") + 1).alias("e")
    )
    deltas = spans.select(F.col("s").alias("tus"), F.lit(1).alias("d")).unionByName(
        spans.select(F.col("e").alias("tus"), F.lit(-1).alias("d"))
    )
    # OPTIMIZATION_r13 §6 (guide §5 caching-when-reused): the ranker
    # below launches eager cutpoint + count jobs plus the final pass —
    # three evaluations of everything upstream. Without this the whole
    # sessionization pipeline (two per-user windows + two groupBys) ran
    # three times; the checkpoint materializes the boundary-instant
    # frame (<= 2 rows per session — session-count-sized, far smaller
    # than events) exactly once. Measured 5.5 -> 2.3 s at sf0.1.
    merged = (
        deltas.groupBy("tus").agg(F.sum("d").alias("d")).localCheckpoint(eager=True)
    )
    run, _ = with_global_running_sum(merged, ["tus"], "d", out="active_raw")
    run = run.withColumn("active", F.col("active_raw").cast("long"))
    return (
        run.groupBy(
            F.expr("CAST(timestamp_seconds(tus DIV 1000000) AS DATE)").alias("day")
        )
        .agg(F.max("active").alias("peak_concurrent"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Conversion rate with Agresti-Coull interval
# ---------------------------------------------------------------------------


@register(
    "events_conversion_interval",
    oracle="""
        WITH flags AS (
            SELECT CAST(ts AS DATE) AS day, user_id,
                   max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
            FROM events GROUP BY day, user_id
        ),
        per AS (
            SELECT day,
                   CAST(sum(v) AS BIGINT) AS viewers,
                   CAST(sum(CASE WHEN v = 1 AND p = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS buyers
            FROM flags GROUP BY day
        ),
        ci AS (
            SELECT day, viewers, buyers,
                   (buyers + 2.0) / (viewers + 4.0) AS pt,
                   2.0 * sqrt((buyers + 2.0) / (viewers + 4.0)
                              * (1.0 - (buyers + 2.0) / (viewers + 4.0))
                              / (viewers + 4.0)) AS hw
            FROM per WHERE viewers > 0
        )
        SELECT day, viewers, buyers,
               CAST(buyers * 10000 // viewers AS BIGINT) AS rate_e4,
               CAST(greatest(floor((pt - hw) * 10000 + 0.5), 0) AS BIGINT)
                   AS ci_lo_e4,
               CAST(least(floor((pt + hw) * 10000 + 0.5), 10000) AS BIGINT)
                   AS ci_hi_e4
        FROM ci
        ORDER BY day
    """,
    doc=(
        "Daily view->purchase conversion (a converter is a user who "
        "BOTH viewed and purchased that day, so x <= n by construction "
        "and the interval arithmetic stays in-domain) with an "
        "Agresti-Coull 95% "
        "interval (Agresti & Coull 1998, public; the z=2 form whose "
        "center is the add-2-successes-add-4-trials estimator): the "
        "uncertainty band that stops a dashboard from paging on a "
        "3-viewer day. Point rate is exact integer e4; the interval "
        "is p~ +/- 2*sqrt(p~(1-p~)/(n+4)) where every operation "
        "(divide, multiply, IEEE-754 sqrt) is correctly rounded and "
        "evaluated in the same order on both engines, then quantized "
        "once via floor(x*1e4+0.5) and clamped to [0, 10000] — the "
        "same determinism argument as the temperature-mix sqrt. One "
        "combinable distinct-aggregate per day; no window, no join."
    ),
    tags=("events", "stats", "agg"),
)
def events_conversion_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = (
        events(spark, sf_dir)
        .groupBy(F.col("ts").cast("date").alias("day"), "user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "p"
            ),
        )
    )
    per = (
        flags.groupBy("day")
        .agg(
            F.sum("v").alias("viewers"),
            F.sum(F.when((F.col("v") == 1) & (F.col("p") == 1), 1).otherwise(0)).alias(
                "buyers"
            ),
        )
        .filter(F.col("viewers") > 0)
    )
    pt = (F.col("buyers") + 2.0) / (F.col("viewers") + 4.0)
    hw = 2.0 * F.sqrt(pt * (1.0 - pt) / (F.col("viewers") + 4.0))
    return per.select(
        "day",
        F.col("viewers").cast("long").alias("viewers"),
        F.col("buyers").cast("long").alias("buyers"),
        F.expr("CAST(buyers * 10000 DIV viewers AS BIGINT)").alias("rate_e4"),
        F.greatest(F.floor((pt - hw) * 10000 + 0.5), F.lit(0))
        .cast("long")
        .alias("ci_lo_e4"),
        F.least(F.floor((pt + hw) * 10000 + 0.5), F.lit(10000))
        .cast("long")
        .alias("ci_hi_e4"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Usage concentration: exact Gini + top-decile share
# ---------------------------------------------------------------------------


@register(
    "events_usage_gini",
    oracle="""
        WITH per AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY user_id
        ),
        ranked AS (
            SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM per
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
            FROM per
        )
        SELECT t.n AS n_users, t.s AS total_events,
               CAST((2 * sum(r.i * r.x) - (t.n + 1) * t.s) * 10000
                    // (t.n * t.s) AS BIGINT) AS gini_e4,
               CAST(sum(CASE WHEN r.i > t.n - (t.n + 9) // 10
                             THEN r.x ELSE 0 END) * 10000
                    // t.s AS BIGINT) AS top_decile_share_e4
        FROM ranked r CROSS JOIN tot t
        GROUP BY t.n, t.s
    """,
    doc=(
        "Usage-concentration audit: the EXACT Gini coefficient of "
        "events per user via the rank formula G = (2*sum(i*x_i) - "
        "(n+1)*S) / (n*S) over the ascending (count, user) order — "
        "pure integers once ranks exist, no Lorenz-curve floats — "
        "plus the top-decile event share (ceil(n/10) heaviest users). "
        "The capacity/abuse number: a Gini near 0 means uniform load, "
        "near 1 means a handful of users ARE the workload and "
        "per-user rate limits or salting decisions follow. Ranks come "
        "from the cutpoint-bucketed global row number on the Spark "
        "side (per-USER counts, already reduced — the ranked table is "
        "|users|, not |events|); one combinable count plus one "
        "metadata-sized ranking."
    ),
    tags=("events", "stats", "agg"),
)
def events_usage_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coviddatapipeline_spark.operators.ranking import with_global_row_number

    per = (
        events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("x"))
    )
    ranked, n = with_global_row_number(per, ["x", "user_id"], out="i")
    tot = per.agg(F.count("*").alias("n"), F.sum("x").alias("s"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("n", "s")
        .agg(
            F.sum(F.col("i") * F.col("x")).alias("ix"),
            F.sum(
                F.when(
                    F.col("i") > F.col("n") - F.expr("(n + 9) DIV 10"),
                    F.col("x"),
                ).otherwise(0)
            ).alias("top_x"),
        )
        .select(
            F.col("n").cast("long").alias("n_users"),
            F.col("s").cast("long").alias("total_events"),
            F.expr(
                "CAST((2 * ix - (n + 1) * s) * 10000 DIV (n * s) AS BIGINT)"
            ).alias("gini_e4"),
            F.expr("CAST(top_x * 10000 DIV s AS BIGINT)").alias(
                "top_decile_share_e4"
            ),
        )
    )
