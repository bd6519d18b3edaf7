"""Windowed streaming aggregations: tumbling, sliding, session.

Beyond-reference surface (the reference is batch-over-log only,
SURVEY §1.1 / §2.B last row). Each operator takes the *streaming*
events DataFrame and returns a streaming aggregate; each has a DuckDB
oracle builder replaying the same window algebra in SQL so the
correctness gate covers the streaming path end-to-end.

Output-mode guidance (encoded in the paired gate queries):

* ``complete`` — window state is the full result; right for bounded
  replays and small window cardinality (what the gate runs).
* ``append`` + watermark — emits a window only once the watermark
  passes its end; the unbounded-stream mode. State is bounded by the
  watermark delay; late rows beyond the delay are dropped. Covered by
  tests (late-data assertions) rather than the gate, since emitted
  subsets depend on the replay's final watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per (tumbling window, event_type) count + value sum."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("window.start", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def tumbling_counts_oracle(table: str = "events", hours: int = 1) -> str:
    return f"""
    SELECT strftime(time_bucket(INTERVAL '{hours} hours', ts), '{TS_FMT_DUCK}') AS window_start,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM {table}
    GROUP BY 1, 2
    """


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per (sliding window, event_type) count: each event lands in
    ``window/slide`` overlapping windows."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("window.start", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
        )
    )


def sliding_counts_oracle(
    table: str = "events", window_minutes: int = 60, slide_minutes: int = 30
) -> str:
    k = window_minutes // slide_minutes
    return f"""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '{slide_minutes} minutes', ts)
               - i * INTERVAL '{slide_minutes} minutes' AS window_start,
             event_type
      FROM {table}, range({k}) r(i)
    )
    SELECT strftime(window_start, '{TS_FMT_DUCK}') AS window_start,
           event_type, count(*) AS n
    FROM expanded GROUP BY 1, 2
    """


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session windows (gap-merged): Spark's native
    ``session_window`` — window end extends ``gap`` past the last event,
    adjacent events merge while their gap stays under it."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", TS_FMT_SPARK).alias("session_start"),
            F.date_format("session_window.end", TS_FMT_SPARK).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_window_stats_oracle(table: str = "events", gap_minutes: int = 30) -> str:
    """Classic SQL sessionization: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``; session end is
    last-event + gap (Spark's session_window.end convention)."""
    return f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '{gap_minutes} minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM {table}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
           strftime(max(ts) + INTERVAL '{gap_minutes} minutes', '{TS_FMT_DUCK}') AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, sess_id
    """
