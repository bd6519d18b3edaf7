"""Rakam event-analytics queries — funnels, retention, sessions,
segmentation, paths, RFM — over the `events` table.

These are the query shapes the reference connector exists to serve
(`pom.xml:12-13`; Rakam issues funnel/retention/segmentation SQL to
Presto over the per-(project, collection) Kafka tables, SURVEY §0/§1.3).
Implementations live in :mod:`.operators.events` (docstrings carry the
100 TB shuffle budget per operator); every query here has an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.operators import events as ev
from presto_rakam_kafka_spark.operators import sketches
from presto_rakam_kafka_spark.queries import _t, query
from presto_rakam_kafka_spark.fixtures import staging_mkdtemp


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_seq, count(*) AS n_events,
             max(epoch_us(ts)) - min(epoch_us(ts)) AS active_us
      FROM sess GROUP BY user_id, session_seq
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           max(n_events) AS max_session_events,
           CAST(sum(active_us) AS BIGINT) AS total_active_us
    FROM per_session GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) + per-user session stats:
    the lag-flag-cumsum idiom, one ``user_id`` shuffle end-to-end."""
    return ev.user_session_stats(_t(spark, sf_dir, "events"))


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM s1) AS n_users
      UNION ALL
      SELECT 2, 'click', (SELECT count(*) FROM s2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    ) WHERE n_users > 0
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel. Spark side is the one-shuffle
    sorted-fold (`operators/events.py:funnel`); the oracle is the
    textbook chained min-timestamp construction — equivalence holds
    because (ts, event_id) is collision-free."""
    return ev.funnel(_t(spark, sf_dir, "events"))


@query(
    "events_funnel_windowed",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1
             AND e.ts <= s1.t1 + INTERVAL 72 HOUR GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2
             AND e.ts <= s2.t2 + INTERVAL 72 HOUR GROUP BY e.user_id)
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM s1) AS n_users
      UNION ALL
      SELECT 2, 'click', (SELECT count(*) FROM s2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    ) WHERE n_users > 0
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel (each step within 72 h of the previous
    match — Rakam's "converted within N" variant). Spark side is the
    struct-accumulator fold (`operators/events.py:funnel_windowed`,
    greedy first-match); oracle is the window-bounded chained-min
    construction."""
    return ev.funnel_windowed(_t(spark, sf_dir, "events"), window_hours=72)


from presto_rakam_kafka_spark import schema_inference as si


@query(
    "events_props_schema_inference",
    oracle=si.infer_props_schema_oracle("events"),
)
def events_props_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rakam's dynamic-schema ingestion half: infer each JSON property
    key's widest value type (long ⊂ double ⊂ boolean-vs-string
    lattice) in one distributed pass — the inference that feeds
    ``metastore.add_fields`` evolution (`schema_inference.py`;
    widening is Avro-promotion-compatible so old readers survive)."""
    return si.infer_props_schema(_t(spark, sf_dir, "events"))


@query(
    "events_funnel_segmented",
    oracle="""
    WITH seg AS (
      -- (ts, event_id) tie-break matches the Spark fold's array_sort
      -- order: a join back on ts alone would duplicate rows when two
      -- step-1 events share the min timestamp.
      SELECT user_id, ts AS t1,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
                  THEN 'high' ELSE 'low' END AS seg
      FROM (SELECT user_id, ts, props,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'view')
      WHERE rn = 1),
    s1 AS (SELECT user_id, t1 FROM seg),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT step, step_name, seg, count(*) AS n_users FROM (
      SELECT 1 AS step, 'view' AS step_name, g.seg FROM seg g
      UNION ALL
      SELECT 2, 'click', g.seg FROM s2 JOIN seg g ON s2.user_id = g.user_id
      UNION ALL
      SELECT 3, 'purchase', g.seg FROM s3 JOIN seg g ON s3.user_id = g.user_id)
    GROUP BY step, step_name, seg
    """,
)
def events_funnel_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel grouped by a segment of the FIRST-step event (Rakam's
    "funnel with segment": here props.k ≥ 50 → 'high' else 'low' on
    the first view). Spark side captures the segment at the fold's
    0→1 advance — still one corpus shuffle; oracle joins the chained-
    min t1 back to its event to read the same property."""
    return ev.funnel_segmented(_t(spark, sf_dir, "events"))


@query(
    "events_retention_filtered",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    ret AS (
      SELECT DISTINCT f.user_id, f.cohort_wk, date_trunc('week', e.ts) AS wk
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase' AND date_trunc('week', e.ts) >= f.cohort_wk)
    SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST((epoch(wk) - epoch(cohort_wk)) / 604800 AS BIGINT) AS week_offset,
           count(*) AS n_active
    FROM ret GROUP BY cohort_wk, wk
    """,
)
def events_retention_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention with configured first/return actions (Rakam retention
    report: "signed up, came back and purchased"): cohort = week of
    first signup, cells count distinct cohort users purchasing k weeks
    later. Single-pass per-user agg (conditional first-X + distinct
    Y-weeks), two exchanges (`operators/events.py:retention_filtered`)."""
    return ev.retention_filtered(_t(spark, sf_dir, "events"))


@query(
    "events_funnel_filtered",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view'
                  AND CAST(json_extract_string(props, '$.k') AS INTEGER) > 40
                GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.value > 30 AND e.ts > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT * FROM (
      SELECT 1 AS step, 'view_bigk' AS step_name, (SELECT count(*) FROM s1) AS n_users
      UNION ALL
      SELECT 2, 'big_click', (SELECT count(*) FROM s2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    ) WHERE n_users > 0
    """,
)
def events_funnel_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with per-step PROPERTY predicates — the Rakam funnel a
    user actually configures (step 1: views whose ``props.k`` exceeds
    40; step 2: clicks with ``value > 30``; step 3: any purchase).
    Spark side is the match-array sorted fold
    (`operators/events.py:funnel_filtered`, still ONE corpus shuffle);
    oracle is the predicate-chained min-timestamp construction."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    steps = [
        ("view_bigk", (F.col("event_type") == "view") & (k > 40)),
        ("big_click", (F.col("event_type") == "click") & (F.col("value") > 30)),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    return ev.funnel_filtered(_t(spark, sf_dir, "events"), steps)


@query(
    "events_funnel_latency",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id),
    lat AS (
      SELECT (epoch_us(s3.t3) - epoch_us(s1.t1)) / 1e6 AS v
      FROM s3 JOIN s1 ON s3.user_id = s1.user_id),
    ranked AS (
      SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 AS DOUBLE) AS rn,
             CAST(count(*) OVER () AS DOUBLE) AS n
      FROM lat)
    SELECT CAST(n AS BIGINT) AS n_converted,
           round(max(CASE WHEN rn = floor((n-1)*0.5) THEN v END)
             + ((n-1)*0.5 - floor((n-1)*0.5))
             * (max(CASE WHEN rn = ceil((n-1)*0.5) THEN v END)
                - max(CASE WHEN rn = floor((n-1)*0.5) THEN v END)), 4) AS median_s,
           round(max(CASE WHEN rn = floor((n-1)*0.9) THEN v END)
             + ((n-1)*0.9 - floor((n-1)*0.9))
             * (max(CASE WHEN rn = ceil((n-1)*0.9) THEN v END)
                - max(CASE WHEN rn = floor((n-1)*0.9) THEN v END)), 4) AS p90_s
    FROM ranked GROUP BY n
    """,
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert percentiles for full-funnel completers: fold
    accumulator extended with (first, last) match times, exact
    rank-interpolated median/p90 replayed against the chained-min
    oracle (`operators/events.py:funnel_latency`)."""
    return ev.funnel_latency(_t(spark, sf_dir, "events"))


@query(
    "events_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT strftime(f.cohort_wk, '%Y-%m-%d') AS cohort_week,
           date_diff('day', f.cohort_wk, a.wk) // 7 AS week_offset,
           count(*) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (cohort week × week offset →
    distinct active users)."""
    return ev.retention_cohorts(_t(spark, sf_dir, "events"))


@query(
    "events_segmentation",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(json_extract_string(props, '$.k') AS BIGINT) // 25 AS k_bucket,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def events_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rakam segmentation: measures per (event_type, day, dynamic
    JSON-prop bucket) — the schemaless-column path (SURVEY §1.3)
    exercised through `get_json_object` in codegen."""
    return ev.segmentation(_t(spark, sf_dir, "events"))


@query(
    "events_top_transitions",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    )
    SELECT src, dst, count(*) AS n FROM pairs WHERE dst IS NOT NULL
    GROUP BY src, dst ORDER BY n DESC, src, dst LIMIT 10
    """,
)
def events_top_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 event-type bigrams across user paths (deterministic
    count-desc/src/dst order; TakeOrdered top-k on the Spark side)."""
    return ev.top_transitions(_t(spark, sf_dir, "events"), k=10)


@query(
    "events_active_users",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                FROM events),
    days AS (SELECT DISTINCT day AS anchor FROM ud)
    SELECT strftime(d.anchor, '%Y-%m-%d') AS day,
           count(DISTINCT CASE WHEN ud.day = d.anchor THEN user_id END) AS dau,
           count(DISTINCT user_id) AS wau
    FROM ud JOIN days d ON date_diff('day', ud.day, d.anchor) BETWEEN 0 AND 6
    GROUP BY 1
    """,
)
def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day WAU per day. Rolling COUNT(DISTINCT) isn't
    a window function on either engine; the scale shape is dedup to
    (user, day) then a broadcast calendar range join
    (`operators/events.py:active_users`)."""
    return ev.active_users(_t(spark, sf_dir, "events"), window_days=7)


@query(
    "events_daily_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           round(avg(n) OVER w, 2) AS trailing_mean,
           round(CASE WHEN stddev_samp(n) OVER w > 0
                      THEN (n - avg(n) OVER w) / (stddev_samp(n) OVER w)
                 END, 2) AS z_score
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                           AND INTERVAL 1 DAY PRECEDING)
    """,
)
def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) volume vs a trailing-7-day mean/z-score —
    the alerting shape. Range-frame window over calendar-bounded daily
    cells; the only corpus-sized op is the initial agg."""
    return ev.daily_anomaly(_t(spark, sf_dir, "events"), trailing_days=7)


# NOTE (VERDICT r13 #9): an earlier round registered a SECOND
# `events_ab_test` here (ev.ab_test-based, purchase>150 conversion);
# the later definition below (line ~1280, first-purchase>=100) silently
# shadowed it in both QUERIES and ORACLES, so it was dead code with an
# unreachable oracle. Removed in round 14 — zero behavior change (the
# registry always resolved to the later definition; gate-proven).


@query(
    "events_hll_weekly_users", oracle=sketches.hll_weekly_users_oracle("events")
)
def events_hll_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per week via MERGEABLE from-scratch HLL: per-day
    sketches (the stored rollup) merged register-wise to weeks, exact
    count alongside — Rakam's continuous pre-aggregation of distinct
    counts, fully replayed in DuckDB (`operators/sketches.py`)."""
    return sketches.hll_weekly_users(_t(spark, sf_dir, "events"))


@query("events_peak_concurrency", oracle=ev.peak_concurrency_oracle("events"))
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions (round 8): sweep-line over session
    [start, end) boundaries — +1/−1 deltas, ties end-before-start
    (half-open), running sum = the concurrency curve, computed with the
    DISTRIBUTED exact cumsum (never a single-partition global window —
    `operators/events.py:peak_concurrency`). Returns the peak and the
    first instant it was reached."""
    return ev.peak_concurrency(_t(spark, sf_dir, "events"))


@query("events_lifecycle", oracle=ev.lifecycle_oracle("events"))
def events_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (round 8): new / retained / resurrected
    / churned user counts per week — the decomposition a growth
    dashboard puts under its DAU chart. ONE corpus shuffle: per-user
    sorted week array (partial-agg'd collect_set, ≤ weeks-of-history
    elements), neighbor classification as a shuffle-free HOF
    projection, churn attributed to the week after last activity and
    capped at the data's edge (`operators/events.py:lifecycle`)."""
    return ev.lifecycle(_t(spark, sf_dir, "events"))


def _rfm_per_user(ev_df: DataFrame) -> DataFrame:
    """The FOLD half of RFM: per-user (last_ts, freq, purchase cents) —
    max/count/sum, each associative, so the same groupBy runs as a
    complete-mode streaming aggregation."""
    return ev_df.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("cents"),
    )


def _rfm_finish(pu: DataFrame) -> DataFrame:
    """The FINISH half of RFM: quintile ranks + the (R, F, M) grid over
    the per-user frame. The recency anchor derives from the frame
    itself (max over per-user last_ts == global max ts — to_date is
    monotone), so the finish never rescans events. Three persist-cached
    global-rank passes: each with_global_rank evaluates its input 2-3x
    (fit, counts, final) and the passes CHAIN, so without the cache
    rank 3 re-runs rank 1+2's exchanges (9.9 -> 8.75 s warm at 5M
    events; the remaining cost is the per-user fold plus nine bounded
    rank jobs)."""
    from presto_rakam_kafka_spark.operators.ranks import (
        eager_pin,
        with_global_ranks,
    )

    mx = F.broadcast(
        pu.groupBy().agg(F.max(F.to_date("last_ts")).alias("_max_d"))
    )
    pu = (
        pu.join(mx)
        .withColumn("rec", F.datediff("_max_d", F.to_date("last_ts")))
        .withColumn("neg_freq", -F.col("freq"))
        .withColumn("neg_cents", -F.col("cents"))
    )
    # pin: the rank passes reuse it (fault-tolerant reliable
    # checkpoint — see ranks.eager_pin — instead of the r8
    # executor-local localCheckpoint)
    pu = eager_pin(pu)
    # round 13: one multi-spec pass — the three chained
    # with_global_rank calls paid a boundary-fit job + a counts job
    # EACH over the same pinned frame; with_global_ranks collapses them
    # into one fit aggregate + one counts shuffle (8 → 4 driver jobs),
    # bit-identical rank assignment per spec
    pu = with_global_ranks(
        pu,
        [
            (["rec", "user_id"], "rr"),
            (["neg_freq", "user_id"], "fr"),
            (["neg_cents", "user_id"], "mr"),
        ],
        count_col="n",
    )
    return (
        pu.selectExpr(
            "CAST((rr - 1) * 5 DIV n + 1 AS INT) AS r_bucket",
            "CAST((fr - 1) * 5 DIV n + 1 AS INT) AS f_bucket",
            "CAST((mr - 1) * 5 DIV n + 1 AS INT) AS m_bucket",
            "cents",
        )
        .groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cents").cast("long").alias("monetary_cents"),
        )
    )


_RFM_ORACLE = """
    WITH pu AS (
      SELECT user_id, max(ts) AS last_ts, count(*) AS freq,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ), mx AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events),
    rk AS (
      SELECT user_id, cents,
             row_number() OVER (ORDER BY date_diff('day', CAST(last_ts AS DATE), max_d), user_id) AS rr,
             row_number() OVER (ORDER BY -freq, user_id) AS fr,
             row_number() OVER (ORDER BY -cents, user_id) AS mr,
             count(*) OVER () AS n
      FROM pu, mx
    )
    SELECT CAST((rr - 1) * 5 // n + 1 AS INTEGER) AS r_bucket,
           CAST((fr - 1) * 5 // n + 1 AS INTEGER) AS f_bucket,
           CAST((mr - 1) * 5 // n + 1 AS INTEGER) AS m_bucket,
           count(*) AS n_users,
           CAST(sum(cents) AS BIGINT) AS monetary_cents
    FROM rk GROUP BY 1, 2, 3
    """


@query("events_rfm_segments", oracle=_RFM_ORACLE)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (round 8): every user scored into quintiles of
    Recency (days since last event), Frequency (event count), and
    Monetary (integer purchase cents), rolled up per (R, F, M) cell —
    the classic CRM segmentation grid (the SEGMENTATION step on top of
    `events_user_rfm`'s raw per-user attributes). The quintile assignment is
    RANK-based via the distributed global-rank primitive
    (`operators/ranks.py:with_global_rank` — frozen-boundary buckets,
    one hash exchange + machine-local sorts, NEVER a single-partition
    ORDER BY window, which is what a naive ntile(5) plans), with
    user_id tiebreaks and integer bucket math so both engines assign
    identical cells. Cost: one per-user fold + three users-sized rank
    passes; output ≤ 125 cells."""
    return _rfm_finish(_rfm_per_user(_t(spark, sf_dir, "events")))


@query("stream_rfm_segments", oracle=_RFM_ORACLE)
def stream_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous RFM (round 8): the per-user (last_ts, freq, cents)
    fold is a complete-mode streaming aggregation (max/count/sum — all
    associative), and the drained per-user frame feeds the SAME
    rank-quintile finish as the batch grid, including the recency
    anchor derived from the drained state itself (never a second
    events pass). NINTH fold-then-finish rollup; streaming state is
    one row per user — the continuously-maintained CRM table a
    marketing dashboard reads."""
    from presto_rakam_kafka_spark.queries import _drain, _events_stream

    pu = _drain(
        _rfm_per_user(_events_stream(spark, sf_dir)),
        "rfm_per_user",
        "complete",
    )
    return _rfm_finish(pu)


@query("stream_lifecycle", oracle=ev.lifecycle_oracle("events"))
def stream_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous growth accounting (round 8): the distinct
    (user, week) activity pairs are a complete-mode streaming groupBy
    (distinctness is idempotent — the fold), and the drained pairs feed
    the same classification finish as the batch `events_lifecycle`
    (identical oracle). EIGHTH fold-then-finish rollup; streaming state
    is users × active weeks."""
    from presto_rakam_kafka_spark.queries import _drain, _events_stream

    pairs = _drain(
        _events_stream(spark, sf_dir)
        .groupBy("user_id", F.date_trunc("week", "ts").alias("wk"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("user_id", "wk"),
        "lifecycle_pairs",
        "complete",
    )
    return ev.lifecycle_from_pairs(pairs)


@query(
    "events_value_quantiles",
    oracle=sketches.value_quantiles_oracle("events"),
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles (p50/p90/p99) from a MERGEABLE
    binned-histogram sketch (round 8) — the third from-scratch sketch
    family next to CMS and HLL: fixed-boundary bins make the sketch
    counts associative (map-side combine, streaming fold) and the
    estimate deterministic with error ≤ the documented bin width —
    unlike `percentile_approx`, whose adaptive q-digest no other
    engine replays. The quantile finish windows over the SKETCH
    (groups × bins rows), never the corpus."""
    hist = sketches.value_histogram(_t(spark, sf_dir, "events"))
    return sketches.quantiles_from_histogram(hist)


@query(
    "events_value_quantiles_log",
    oracle=sketches.value_quantiles_log_oracle("events"),
)
def events_value_quantiles_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-scale quantile sketch (round 9, VERDICT r8 #5): the linear
    sketch's state bound is O(value range / bin width) — unbounded on
    long-tail domains (cents up to 1e9). Here bins are log-spaced —
    underflow + decimal exponent + 16 mantissa slots per decade — so
    state is O(decades · 144) with a documented RELATIVE error ≤ 1/16,
    and the binning runs on exact integer/string arithmetic (never
    floor(log) of a double: JVM Math.log vs C++ libm half-ulp
    disagreements at decade boundaries are exactly the cross-engine
    trap the hash gate would catch). Same mergeable-counts fold as the
    linear sketch; DuckDB replays the whole pipeline."""
    hist = sketches.value_histogram_log(_t(spark, sf_dir, "events"))
    return sketches.quantiles_from_histogram_log(hist)


@query(
    "stream_value_quantiles",
    oracle=sketches.value_quantiles_oracle("events"),
)
def stream_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous quantile dashboard (round 8): the histogram sketch is
    a complete-mode streaming groupBy (counts are associative — the
    fold), the drained sketch feeds the same quantile finish as the
    batch row (identical oracle). SEVENTH fold-then-finish rollup;
    streaming state is groups × occupied bins, independent of stream
    length — the shape that makes p99 latency/value dashboards viable
    on unbounded streams."""
    from presto_rakam_kafka_spark.queries import _drain, _events_stream

    hist = _drain(
        sketches.value_histogram(_events_stream(spark, sf_dir)),
        "quantile_hist",
        "complete",
    )
    return sketches.quantiles_from_histogram(hist)


@query(
    "events_hll_rolling_users",
    oracle=sketches.hll_rolling_users_oracle("events"),
)
def events_hll_rolling_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from MERGED per-day HLL
    sketches (round 9) — the rolling-window shape mergeable sketches
    exist for: exact trailing distincts rescan window_days of raw
    events per anchor day (corpus × window), the sketch answer is a
    range join over the days × 16-register rollup plus the estimator.
    Exact counts verified alongside; DuckDB replays probes, merge, and
    estimator bit-for-bit."""
    return sketches.hll_rolling_users(_t(spark, sf_dir, "events"))


@query(
    "events_forecast_holt",
    oracle=__import__(
        "presto_rakam_kafka_spark.operators.events", fromlist=["events"]
    ).holt_forecast_oracle("events"),
)
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-volume forecast (round 9): Holt's linear exponential
    smoothing per event_type over the dense daily-count series, 7 days
    ahead. Dyadic coefficients (α=0.5, β=0.25) make every smoothing
    step exact in IEEE doubles, so the DuckDB recursive-CTE replay is
    bit-identical and the output ships UN-rounded. One corpus-sized
    aggregation; fold and horizon expansion run on the days×series
    rollup only."""
    import presto_rakam_kafka_spark.operators.events as ev

    return ev.holt_forecast(_t(spark, sf_dir, "events"))


@query(
    "stream_hll_rolling_users",
    oracle=sketches.hll_rolling_users_oracle("events"),
)
def stream_hll_rolling_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous trailing-7-day distinct users. Round 10 (VERDICT r9
    next-2): the fold is now EMIT-ON-CLOSE with bounded state — anchor
    days the stream's max day has passed are emitted to an append
    store per trigger, and pairs too old for any unemitted anchor are
    evicted, so live state is (window + open days) × daily users, not
    stream lifetime (state-size test asserts the bound; the emitted ∪
    live-tail union is row-equal to the unbounded finish). rho is a
    pure function of user_id, so day registers rebuilt from distinct
    pairs equal registers folded from raw events — one fold serves the
    sketch AND the exact verification column. Identical oracle as the
    batch row. A sketch-only dashboard would fold
    `_hll_daily_registers` instead at days×16 rows of state."""
    from presto_rakam_kafka_spark.queries import _events_stream
    from presto_rakam_kafka_spark.streaming import rollup

    return rollup.run_rolling_pairs(
        _events_stream(spark, sf_dir),
        lambda b: b.select(
            F.date_trunc("day", "ts").alias("uday"), "user_id"
        ).distinct(),
        sketches.hll_rolling_users_from_pairs,
        "uday",
        7,
        "hll_rolling_pairs",
    )


@query(
    "stream_forecast_holt",
    oracle=__import__(
        "presto_rakam_kafka_spark.operators.events", fromlist=["events"]
    ).holt_forecast_oracle("events"),
)
def stream_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous forecasting (round 9): the daily-count table is an
    associative fold (complete-mode streaming groupBy), and the drained
    rollup feeds the SAME Holt finish as the batch row — twelfth
    fold-then-finish rollup, identical oracle. The forecast updates
    every trigger from days×series state, never rescanning the
    stream's history."""
    import presto_rakam_kafka_spark.operators.events as ev
    from presto_rakam_kafka_spark.queries import _drain, _events_stream

    daily = _drain(
        _events_stream(spark, sf_dir)
        .groupBy(
            F.col("event_type"), F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("y")),
        "holt_daily",
        "complete",
    )
    return ev.holt_forecast_from_daily(daily)


@query(
    "events_audience_rule",
    oracle="""
    WITH mx AS (SELECT max(ts) AS max_ts FROM events),
    w AS (
      SELECT e.* FROM events e, mx
      WHERE e.ts >= mx.max_ts - INTERVAL 30 DAY
        AND e.event_type IN ('purchase', 'error')
    ),
    agg AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_include,
             sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS n_exclude,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_ts,
             max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_ts,
             round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS sum_value
      FROM w GROUP BY user_id
    )
    SELECT user_id, CAST(n_include AS BIGINT) AS n_events,
           strftime(first_ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           sum_value
    FROM agg WHERE n_include >= 3 AND n_exclude = 0
    """,
)
def events_audience_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience builder (round 9) — Rakam's behavioral segment export:
    users with ≥3 purchases in the trailing 30 days and ZERO 'error'
    events in the same window, with activation evidence (count, first/
    last purchase, total value). One corpus shuffle: both rules fold in
    a single per-user conditional aggregate (the exclude is a HAVING,
    never an anti-join), and the window bound is a scan predicate
    against the broadcast max-ts scalar."""
    import presto_rakam_kafka_spark.operators.events as ev

    return ev.audience_rule(_t(spark, sf_dir, "events"))


@query(
    "stream_audience_rule",
    oracle="""
    WITH mx AS (
      SELECT date_trunc('day', max(ts)) AS max_day FROM events
      WHERE event_type IN ('purchase', 'error')
    ),
    w AS (
      SELECT e.* FROM events e, mx
      WHERE date_trunc('day', e.ts) >= mx.max_day - INTERVAL 29 DAY
        AND e.event_type IN ('purchase', 'error')
    ),
    agg AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_include,
             sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS n_exclude,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_ts,
             max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_ts,
             round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS sum_value
      FROM w GROUP BY user_id
    )
    SELECT user_id, CAST(n_include AS BIGINT) AS n_events,
           strftime(first_ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           sum_value
    FROM agg WHERE n_include >= 3 AND n_exclude = 0
    """,
)
def stream_audience_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained audience: the per-user conditional
    aggregate folds over (user, type, DAY) cells — counts / min / max
    / sum are all associative — and the include/exclude HAVING plus
    the trailing-window cut run as the batch finish over the final
    state, anchored at its max day (never rescanning the stream).
    Round 10 (VERDICT r9 next-2): the fold's state is COMPACTED TO THE
    LIVE WINDOW every trigger (`run_windowed_cells`) — a cell older
    than the running max day − 29 can never re-enter the final
    trailing window (max day is monotone), so eviction is exactly
    output-preserving and state is bounded by 30 days × active keys,
    not stream lifetime (state-size test asserts the bound). The
    window is deliberately DAY-granular ("trailing 30 calendar days",
    the usual product semantics) in BOTH engines: day cells are
    atomic, so no cell can straddle the cut (the batch row
    `events_audience_rule` keeps instant-cut semantics, where it
    aggregates raw rows)."""
    from presto_rakam_kafka_spark.queries import _events_stream
    from presto_rakam_kafka_spark.streaming import rollup

    def cell_fn(batch: DataFrame) -> DataFrame:
        return (
            batch.filter(F.col("event_type").isin(["purchase", "error"]))
            .groupBy(
                F.col("user_id"), F.col("event_type"),
                F.date_trunc("day", "ts").alias("cday"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("ts").alias("min_ts"),
                F.max("ts").alias("max_ts"),
                F.sum("value").alias("sv"),
            )
        )

    cells = rollup.run_windowed_cells(
        _events_stream(spark, sf_dir),
        cell_fn,
        ["user_id", "event_type", "cday"],
        [
            F.sum("n").alias("n"),
            F.min("min_ts").alias("min_ts"),
            F.max("max_ts").alias("max_ts"),
            F.sum("sv").alias("sv"),
        ],
        "cday",
        30,
        "audience_cells",
    )
    mx = F.broadcast(cells.groupBy().agg(F.max("cday").alias("_max_day")))
    w = cells.join(mx).filter(
        F.col("cday") >= F.col("_max_day") - F.expr("INTERVAL 29 DAYS")
    )
    inc = F.col("event_type") == "purchase"
    agg = w.groupBy("user_id").agg(
        F.sum(F.when(inc, F.col("n")).otherwise(0)).alias("n_include"),
        F.sum(F.when(~inc, F.col("n")).otherwise(0)).alias("n_exclude"),
        F.min(F.when(inc, F.col("min_ts"))).alias("first_ts"),
        F.max(F.when(inc, F.col("max_ts"))).alias("last_ts"),
        F.round(F.sum(F.when(inc, F.col("sv")).otherwise(0.0)), 2).alias(
            "sum_value"
        ),
    )
    return agg.filter(
        (F.col("n_include") >= 3) & (F.col("n_exclude") == 0)
    ).select(
        "user_id",
        F.col("n_include").cast("long").alias("n_events"),
        F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        "sum_value",
    )


@query(
    "events_hll_audience_overlap",
    oracle=sketches.hll_audience_overlap_oracle("events"),
)
def events_hll_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap (|users(view) ∩ users(purchase)|) estimated
    purely from per-event-type HLL rollups via inclusion–exclusion on
    the register-wise-max union sketch; exact counts alongside."""
    return sketches.hll_audience_overlap(_t(spark, sf_dir, "events"))


@query(
    "events_user_rfm",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT user_id,
           date_diff('day', date_trunc('day', max(ts)),
                     (SELECT max(date_trunc('day', ts)) FROM p)) AS recency_days,
           count(*) AS frequency,
           round(sum(value), 2) AS monetary
    FROM p GROUP BY user_id
    """,
)
def events_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/frequency/monetary user attributes from purchase events
    (broadcast scalar anchor, one shuffle)."""
    return ev.user_rfm(_t(spark, sf_dir, "events"))


@query("events_stickiness", oracle=ev.stickiness_oracle("events"))
def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly engagement stickiness (avg DAU / MAU) — one distinct
    (month, day, user) shuffle, both grains reaggregated from it."""
    return ev.stickiness(_t(spark, sf_dir, "events"))


from presto_rakam_kafka_spark.streaming.attribution import attribution_oracle


@query("events_attribution", oracle=attribution_oracle("events"))
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch (7-day window) + first-touch attribution per
    purchase — running IGNORE-NULLS carries over ONE user_id shuffle,
    not a per-conversion as-of join."""
    return ev.last_touch_attribution(_t(spark, sf_dir, "events"))


@query(
    "events_funnel_trend",
    oracle="""
    WITH e AS (SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
                      user_id, ts, event_type FROM events),
    s1 AS (SELECT wk, user_id, min(ts) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY wk, user_id),
    s2 AS (SELECT e.wk, e.user_id, min(e.ts) AS t2 FROM e
           JOIN s1 ON e.wk = s1.wk AND e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.wk, e.user_id),
    s3 AS (SELECT e.wk, e.user_id, min(e.ts) AS t3 FROM e
           JOIN s2 ON e.wk = s2.wk AND e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.wk, e.user_id)
    SELECT wk, 1 AS step, 'view' AS step_name, count(*) AS n_users FROM s1 GROUP BY wk
    UNION ALL
    SELECT wk, 2, 'click', count(*) FROM s2 GROUP BY wk
    UNION ALL
    SELECT wk, 3, 'purchase', count(*) FROM s3 GROUP BY wk
    """,
)
def events_funnel_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel per calendar week (Rakam's funnel-over-time chart): the
    same one-shuffle sorted fold with the week in the grouping key —
    time grain rides the existing shuffle for free."""
    return ev.funnel_trend(_t(spark, sf_dir, "events"))


@query(
    "events_funnel_unordered",
    oracle="""
    WITH f AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s0,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS s1,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s2
      FROM events GROUP BY user_id),
    d AS (SELECT user_id,
                 s0 + least(s0, s1) + least(s0, s1, s2) AS depth FROM f)
    SELECT step, step_name, count(*) AS n_users
    FROM d JOIN (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
           s(step, step_name) ON d.depth >= s.step
    GROUP BY step, step_name
    """,
)
def events_funnel_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered funnel (strict-ordering toggle off): users who did
    ALL prefix event types in any order — one groupBy(user) of boolean
    maxes, no sort/fold; always ≥ the ordered funnel per step."""
    return ev.funnel_unordered(_t(spark, sf_dir, "events"))


from presto_rakam_kafka_spark.operators import warehouse

_ORDER_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]
_UPDATES_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice + 1.0 AS o_totalprice,
           o_orderdate, o_orderpriority,
           (o_orderkey % 19 = 0) AS deleted
    FROM orders WHERE o_orderkey % 13 = 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, 'N' AS o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority, false AS deleted
    FROM orders WHERE o_orderkey % 17 = 0
"""


def _order_updates(orders: DataFrame) -> DataFrame:
    """The CDC batch both MERGE gate rows apply: price bumps for every
    13th order (every 19th of those flagged deleted), inserts of new
    keys for every 17th (the `_UPDATES_SQL` twin). +1.00 not *1.1: the
    product rounds differently across engines on representation edges
    (a 1-cent straddle seen live at sf0.01); adding an exactly-
    representable constant keeps doubles identical."""
    return orders.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority",
        (F.col("o_orderkey") % 19 == 0).alias("deleted"),
    ).unionAll(
        orders.filter(F.col("o_orderkey") % 17 == 0).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_custkey", F.lit("N").alias("o_orderstatus"),
            "o_totalprice", "o_orderdate", "o_orderpriority",
            F.lit(False).alias("deleted"),
        )
    )


_MERGE_SUMMARY_ORACLE = f"""
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM ({warehouse.merge_upsert_oracle(
        "SELECT " + ", ".join(_ORDER_COLS) + " FROM orders",
        _UPDATES_SQL, "o_orderkey", _ORDER_COLS, delete_col="deleted",
    )})
    GROUP BY o_orderstatus
    """


def _merge_summary(merged: DataFrame) -> DataFrame:
    """Integer-cents per-status rollup shared by the MERGE gate rows:
    prices carry exactly 2 decimals, so per-row round(x*100) is
    engine-stable and the long sum is EXACT — a round(sum(double), 2)
    straddled the last cent between Spark and DuckDB at sf0.01."""
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("sum_price_cents"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query("merge_upsert_orders", oracle=_MERGE_SUMMARY_ORACLE)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (round 7): a CDC batch — price bumps for
    every 13th order, inserts of new keys, deletes for every 19th
    update key — applied to the orders snapshot as ONE key-partitioned
    full-outer join (whole-row update wins, unmatched update inserts,
    flagged match deletes). Bucket both sides by the key and the
    exchange disappears; a small CDC batch broadcasts and the target
    never shuffles. Summarized per status for a compact gate row
    (integer-cents sum — see `_merge_summary`)."""
    orders = _t(spark, sf_dir, "orders").select(*_ORDER_COLS)
    return _merge_summary(
        warehouse.merge_upsert(
            orders, _order_updates(orders), "o_orderkey", delete_col="deleted"
        )
    )


@query("merge_upsert_orders_sharded", oracle=_MERGE_SUMMARY_ORACLE)
def merge_upsert_orders_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucket-PRUNED MERGE fast path (round 8, VERDICT next-3):
    the same CDC batch applied through the sharded snapshot store
    (`streaming/cdc.py:merge_into_snapshot`) — the orders table lives
    as ``_shard=K`` md5-bucket partitions, the batch's touched-bucket
    set is a bounded collect, the full-outer MERGE join reads a
    partition-pruned scan of just those buckets, and untouched buckets
    are hard-linked into the new generation with zero data I/O (the r7
    `merge_upsert` full-outer join rebuilt the whole target however
    small the batch — O(target) per merge at 100 TB). Result must be
    value-identical to the unsharded `merge_upsert_orders` row: same
    oracle."""
    import os
    import tempfile

    from presto_rakam_kafka_spark.streaming import cdc

    orders = _t(spark, sf_dir, "orders").select(*_ORDER_COLS)
    # process-cached staging (the _purged_log_dir discipline): the
    # bucketed base-table write happens once per process; re-MERGING
    # the same CDC batch onto the merged store is IDEMPOTENT (updates
    # replace by key, repeat deletes are unmatched no-ops, repeat
    # inserts are whole-row self-replacements), so every rerun yields
    # the identical summary while each run still exercises the pruned
    # merge + generation flip; GC bounds the generation pile-up.
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = os.path.join(
        tempfile.gettempdir(), f"merge_shard_{tag}_p{os.getpid()}x"
    )
    if not os.path.exists(os.path.join(path, "_CURRENT")):
        cdc.init_snapshot(orders, path, key_col="o_orderkey", num_buckets=8)
    cdc.merge_into_snapshot(
        _order_updates(orders), path, "o_orderkey", delete_col="deleted"
    )
    # min_age_s=0.0: explicit retention decision (round-13 review) —
    # this store is process-cached under /tmp with strictly sequential
    # single-process access (merge → gc → read), so the slow-reader
    # grace protects nobody here and would let repeated gate/bench
    # runs pile up one generation each for 15 minutes
    cdc.gc_snapshots(path, keep_last=2, min_age_s=0.0)
    return _merge_summary(cdc.read_snapshot(spark, path))


@query(
    "scd2_user_history",
    oracle=warehouse.scd2_history_oracle(
        "events", "user_id", "event_type", "ts", "event_id"
    ),
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build (round 7): per-user event_type RUNS
    with validity intervals — consecutive equal values collapse, each
    run gets (valid_from, valid_to-exclusive, null while current). One
    shuffle on user_id; change-detect lag and interval-close lead share
    the partitioning (single Exchange + Sort in the plan)."""
    return warehouse.scd2_history(
        _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id",
    )


@query(
    "stream_cdc_snapshot",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value
    FROM latest WHERE rn = 1 AND event_type <> 'error'
    """,
)
def stream_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained snapshot (round 7): the events stream
    applied as CDC — per micro-batch, latest-change-per-user (a
    partial-agg max_by, never a window), MERGE into the current
    snapshot, publish under an epoch-named generation + atomic pointer
    flip (replayed epochs skip — exactly-once). 'error' events are
    delete markers: a user whose latest change is a delete leaves the
    snapshot; a later event re-inserts them. The oracle replays the
    whole contract as latest-per-key SQL over the full log — streaming
    MERGE equals one big batch merge. Same read view as Kafka log
    compaction (`kafka_log_compacted_scan`) arrived at through the
    other door: there the LOG is rewritten, here the SNAPSHOT is
    maintained."""
    import tempfile

    from presto_rakam_kafka_spark.queries import _events_stream
    from presto_rakam_kafka_spark.streaming import cdc

    path = staging_mkdtemp("cdc_snap_")
    base = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts", "value")
        .limit(0)
    )
    cdc.init_snapshot(base, path, key_col="user_id", num_buckets=8)
    st = _events_stream(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "ts", "value",
        (F.col("event_type") == "error").alias("deleted"),
    )
    q = (
        cdc.apply_cdc_stream(
            st, path, "user_id", "ts", "event_id", delete_col="deleted",
            checkpoint=staging_mkdtemp("cdc_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = cdc.read_snapshot(spark, path)
    return snap.select(
        "user_id", "event_id", "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"), "value",
    )


@query(
    "stream_cdc_snapshot_manifest",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value
    FROM latest WHERE rn = 1 AND event_type <> 'error'
    """,
)
def stream_cdc_snapshot_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`stream_cdc_snapshot` in the OBJECT-STORE-SAFE carry mode
    (round 9, VERDICT r8 #2): identical CDC contract — per micro-batch
    latest-per-key MERGE, epoch-named generations, atomic pointer flip,
    (app_id, epoch) exactly-once — but untouched buckets travel between
    generations BY MANIFEST REFERENCE (Delta/Iceberg's recipe) instead
    of hard links, so the same store works where os.link does not exist
    (S3/GCS — where 100 TB snapshots actually live). Same oracle as the
    link-mode row: the carry mechanism must be invisible to readers."""
    import tempfile

    from presto_rakam_kafka_spark.queries import _events_stream
    from presto_rakam_kafka_spark.streaming import cdc

    path = staging_mkdtemp("cdc_snap_")
    base = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts", "value")
        .limit(0)
    )
    cdc.init_snapshot(
        base, path, key_col="user_id", num_buckets=8, carry="manifest"
    )
    st = _events_stream(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "ts", "value",
        (F.col("event_type") == "error").alias("deleted"),
    )
    q = (
        cdc.apply_cdc_stream(
            st, path, "user_id", "ts", "event_id", delete_col="deleted",
            checkpoint=staging_mkdtemp("cdc_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = cdc.read_snapshot(spark, path)
    return snap.select(
        "user_id", "event_id", "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"), "value",
    )


@query(
    "events_top_paths",
    oracle="""
    WITH s AS (
      SELECT user_id,
             array_agg(event_type ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ), p AS (
      SELECT unnest(list_transform(range(1, len(seq) - 1),
                    i -> seq[i] || '>' || seq[i+1] || '>' || seq[i+2])) AS path
      FROM s WHERE len(seq) >= 3
    )
    SELECT path, n, rank FROM (
      SELECT path, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, path ASC) AS rank
      FROM p GROUP BY path
    ) WHERE rank <= 10
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis (round 7): the top 10 three-step event sequences
    users actually take — the 'what do people do before purchasing'
    query of a product-analytics suite. Same ONE-corpus-shuffle shape
    as the funnel family: per-user sorted fold (partial-agg'd
    collect_list), then triples are a shuffle-free explode projection,
    the global count is a vocabulary-bounded groupBy (|event_types|³
    keys max), and top-10 is TakeOrderedAndProject."""
    evs = _t(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("us"),
            F.col("event_id"),
            F.col("event_type"),
        ).alias("ev"),
    )
    seqs = evs.groupBy("user_id").agg(
        F.expr("transform(array_sort(collect_list(ev)), e -> e.event_type)").alias(
            "seq"
        )
    )
    paths = seqs.filter(F.expr("size(seq) >= 3")).selectExpr(
        "explode(transform(sequence(0, size(seq) - 3),"
        " i -> concat_ws('>', seq[i], seq[i+1], seq[i+2]))) AS path"
    )
    from pyspark.sql import Window

    top = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("n"), F.asc("path"))
    return top.withColumn("rank", F.row_number().over(w))


@query(
    "events_ab_test",
    oracle="""
    WITH fp AS (
      SELECT user_id,
             first(value ORDER BY ts, event_id) AS first_val
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), per_user AS (
      SELECT u.user_id, u.user_id % 2 AS variant,
             CASE WHEN coalesce(fp.first_val, 0) >= 100 THEN 1 ELSE 0 END AS conv
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN fp USING (user_id)
    ), v AS (
      SELECT variant, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c
      FROM per_user GROUP BY variant
    )
    SELECT a.n AS n_control, a.c AS conv_control,
           b.n AS n_treat, b.c AS conv_treat,
           round((CAST(b.c AS DOUBLE) / b.n - CAST(a.c AS DOUBLE) / a.n)
                 / sqrt((CAST(a.c + b.c AS DOUBLE) / (a.n + b.n))
                        * (1.0 - CAST(a.c + b.c AS DOUBLE) / (a.n + b.n))
                        * (CAST(1 AS DOUBLE) / a.n + CAST(1 AS DOUBLE) / b.n)),
                 4) AS z_score
    FROM v a JOIN v b ON a.variant = 0 AND b.variant = 1
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout (round 7): deterministic variant
    assignment (user_id % 2 — the hash-bucket assignment an
    experimentation platform uses), per-variant user and conversion
    counts, and the pooled two-proportion z-score computed with
    explicit double arithmetic (identical IEEE ops in both engines —
    never a library stat function the oracle can't replay). One
    per-user shuffle + a 2-row aggregate; the z-test itself is
    driver-free scalar math on the 2-row frame."""
    # conversion = FIRST purchase value >= 100 ("did the first order
    # clear the bar") — scale-invariant by construction: one draw per
    # user at any SF. "Any purchase ever over T" saturates to p = 1 as
    # events-per-user grow with SF — pooled variance hits 0 and the z
    # denominator divides by zero (found live by the ANSI gate).
    ev = _t(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            # struct ordering, not an epoch-arithmetic key: the r7 form
            # (unix_seconds*1e6 + id vs DuckDB's rounding epoch() cast)
            # diverged on sub-second timestamps near .5; (ts, id) lexical
            # order is exact at ANY timestamp precision, and the DuckDB
            # twin is the ordered aggregate first(value ORDER BY ts, id)
            F.min_by("value", F.struct("ts", "event_id")).alias("first_val")
        )
    )
    per_user = (
        ev.select("user_id")
        .distinct()
        .join(fp, "user_id", "left")
        .select(
            (F.col("user_id") % 2).alias("variant"),
            F.when(F.coalesce("first_val", F.lit(0.0)) >= 100, 1)
            .otherwise(0)
            .alias("conv"),
        )
    )
    v = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").cast("long").alias("c")
    )
    a = v.filter(F.col("variant") == 0).alias("a")
    b = v.filter(F.col("variant") == 1).alias("b")
    return (
        a.crossJoin(b)
        .selectExpr(
            "a.n AS n_control",
            "a.c AS conv_control",
            "b.n AS n_treat",
            "b.c AS conv_treat",
            # CAST AS DOUBLE, never "* 1.0": Spark types int * 1.0 as
            # DECIMAL while DuckDB uses DOUBLE — the z diverged at the
            # 4th decimal (the text_stats lesson, found live again)
            "round((CAST(b.c AS DOUBLE) / b.n - CAST(a.c AS DOUBLE) / a.n)"
            " / sqrt((CAST(a.c + b.c AS DOUBLE) / (a.n + b.n))"
            "        * (1.0 - CAST(a.c + b.c AS DOUBLE) / (a.n + b.n))"
            "        * (CAST(1 AS DOUBLE) / a.n + CAST(1 AS DOUBLE) / b.n)),"
            " 4) AS z_score",
        )
    )


@query(
    "events_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, count(*) AS n
      FROM events GROUP BY 1
    ), w AS (
      SELECT d, n,
             sum(n * 1.0) OVER f AS s,
             sum(n * n * 1.0) OVER f AS s2,
             count(*) OVER f AS k
      FROM daily
      WINDOW f AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, n,
           round((n - s / k) / sqrt((s2 - s * s / k) / (k - 1)), 4) AS z,
           CASE WHEN abs((n - s / k) / sqrt((s2 - s * s / k) / (k - 1))) > 3
                THEN 1 ELSE 0 END AS is_anomaly
    FROM w WHERE k >= 3 AND (s2 - s * s / k) > 0
    """,
)
def events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection (round 7): each day's event count
    z-scored against the trailing week (frame EXCLUDES the current
    day, so a spike can't suppress its own baseline). Variance is the
    explicit sum/sum-of-squares form over the 7-row frame — identical
    summation order in both engines — rather than stddev_samp, whose
    internal algorithm (Welford vs two-pass) can differ in the last
    ulp between engines. One daily rollup + one tiny ordered window
    over ~days rows (bounded: days, not events)."""
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    f = Window.orderBy("d").rowsBetween(-7, -1)
    w = daily.select(
        "d",
        "n",
        F.sum(F.col("n") * 1.0).over(f).alias("s"),
        F.sum(F.col("n") * F.col("n") * 1.0).over(f).alias("s2"),
        F.count(F.lit(1)).over(f).alias("k"),
    )
    z = "(n - s / k) / sqrt((s2 - s * s / k) / (k - 1))"
    return (
        w.filter((F.col("k") >= 3) & (F.expr("s2 - s * s / k") > 0))
        .selectExpr(
            "date_format(d, 'yyyy-MM-dd') AS day",
            "n",
            f"round({z}, 4) AS z",
            f"CASE WHEN abs({z}) > 3 THEN 1 ELSE 0 END AS is_anomaly",
        )
    )


@query(
    "events_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
      FROM events GROUP BY user_id
    ), spend AS (
      SELECT user_id, date_trunc('week', ts) AS wk,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT strftime(f.cohort_wk, '%Y-%m-%d') AS cohort_week,
           date_diff('day', f.cohort_wk, s.wk) // 7 AS week_offset,
           count(DISTINCT s.user_id) AS n_buyers,
           CAST(sum(s.cents) AS BIGINT) AS revenue_cents
    FROM spend s JOIN firsts f ON s.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value (round 7): purchase revenue laid out as a
    cohort-week x week-offset matrix — retention's revenue twin ("how
    much does the March cohort spend in its 4th week"). Revenue is
    summed as EXACT integer cents (2-decimal fixture values; the
    merge_upsert_orders lesson — never round(sum(double)) in a gate
    row). Same two-exchange budget as the retention matrix: per-user
    first-week agg + per-(user, week) spend agg, then a join keyed by
    user."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("week", "ts").alias("wk"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    return (
        spend.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.col("wk"), F.col("cohort_wk")) / 7).alias(
                "week_offset"
            ),
        )
        .agg(
            F.count_distinct("user_id").alias("n_buyers"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


@query(
    "stream_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
      FROM events GROUP BY user_id
    ), spend AS (
      SELECT user_id, date_trunc('week', ts) AS wk,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT strftime(f.cohort_wk, '%Y-%m-%d') AS cohort_week,
           date_diff('day', f.cohort_wk, s.wk) // 7 AS week_offset,
           count(DISTINCT s.user_id) AS n_buyers,
           CAST(sum(s.cents) AS BIGINT) AS revenue_cents
    FROM spend s JOIN firsts f ON s.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def stream_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous cohort LTV (round 7; single-pass since round 8,
    VERDICT next-6): ONE complete-mode streaming aggregation keyed by
    (user, week) accumulates BOTH halves of the revenue matrix —
    min(ts) per (user, week) and the week's integer-cent purchase sum,
    each associative — so the stream is consumed ONCE (the r7 form
    drained it twice, once per half). The finish then derives each
    user's cohort week as the min over their drained week rows — a
    state-sized (users × active weeks) batch step, never a second pass
    over events — and joins/buckets exactly like the batch
    `events_cohort_ltv` (identical oracle). Sixth fold-then-finish
    rollup: state is users × active weeks — the stored matrix an LTV
    dashboard reads, never raw events."""
    from presto_rakam_kafka_spark.queries import _drain, _events_stream

    parts = _drain(
        _events_stream(spark, sf_dir)
        .groupBy("user_id", F.date_trunc("week", "ts").alias("wk"))
        .agg(
            F.min("ts").alias("min_ts"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("cents"),
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .cast("long")
            .alias("n_purch"),
        ),
        "ltv_parts",
        "complete",
    )
    # both legs read the SAME drained table — rename the grouped leg's
    # key so the self-join has no conflicting attributes
    firsts = (
        parts.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("min_ts")).alias("cohort_wk"))
        .withColumnRenamed("user_id", "_first_user")
    )
    spend = parts.filter(F.col("n_purch") > 0).select("user_id", "wk", "cents")
    return (
        spend.join(firsts, F.col("user_id") == F.col("_first_user"))
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.col("wk"), F.col("cohort_wk")) / 7).alias(
                "week_offset"
            ),
        )
        .agg(
            F.count_distinct("user_id").alias("n_buyers"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
