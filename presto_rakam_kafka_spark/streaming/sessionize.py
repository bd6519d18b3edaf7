"""Custom stateful operator: per-user sessionization via
``applyInPandasWithState``.

This is the SURVEY §7 "custom stateful streaming operator" slot — the
pattern for semantics Spark's built-in operators can't express (the
built-in ``session_window`` covers plain gap-sessions; this operator is
the template for richer per-key state machines: it tracks an open
session per user across micro-batches, closes it either when a
later-than-gap event arrives or when the event-time watermark passes
``last_event + gap``, and emits one row per closed session).

Determinism contract (what the oracle replays): on an event-time-
ordered replay, the emitted set is exactly

* every non-final session of a user (closed by a successor event), plus
* each user's final session iff the final watermark
  (``max(ts) - delay``) strictly passed ``last_event + gap``
  (event-time timeout fired; still-open sessions stay in state).

Arrow moves each key-group batch as pandas DataFrames; state is one
tuple per user — bounded, partitioned by key, executor-local.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.StringType()),
        T.StructField("session_end", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

#: (start_us, last_us, n_events, sum_value) — epoch-microsecond session state.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _fmt_us(us: int) -> str:
    return pd.Timestamp(us, unit="us").strftime("%Y-%m-%d %H:%M:%S")


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Close-on-gap sessionization with event-time-timeout state expiry."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            cur = tuple(state.get) if state.exists else None
            rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
            for ts, value in zip(rows["ts"], rows["value"]):
                us = int(pd.Timestamp(ts).value // 1_000)
                if cur is None:
                    cur = (us, us, 1, float(value))
                elif us - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (us, us, 1, float(value))
                else:
                    cur = (cur[0], max(cur[1], us), cur[2] + 1, cur[3] + float(value))
            if cur is not None:
                state.update(cur)
                # Expire the open session when the watermark passes
                # last_event + gap (milliseconds API).
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1_000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [_fmt_us(c[0]) for c in closed],
                    "session_end": [_fmt_us(c[1] + gap_us) for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [round(c[3], 2) for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_oracle(
    table: str = "events",
    gap_minutes: int = 30,
    watermark_minutes: int = 30,
) -> str:
    """The determinism contract above, replayed in SQL: sessionize by
    gap, keep non-final sessions plus timed-out final sessions."""
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
    ), agg AS (
      SELECT user_id, sess_id,
             min(ts) AS start_ts, max(ts) AS last_ts,
             count(*) AS n_events, round(sum(value), 2) AS sum_value
      FROM sessions GROUP BY user_id, sess_id
    ), final AS (
      SELECT *,
             max(sess_id) OVER (PARTITION BY user_id) AS last_sess,
             (SELECT max(ts) FROM {table}) AS max_ts
      FROM agg
    )
    SELECT user_id,
           strftime(start_ts, '{TS_FMT_DUCK}') AS session_start,
           strftime(last_ts + INTERVAL '{gap_minutes} minutes', '{TS_FMT_DUCK}') AS session_end,
           n_events, sum_value
    FROM final
    WHERE sess_id < last_sess
       OR (max_ts - INTERVAL '{watermark_minutes} minutes')
          > (last_ts + INTERVAL '{gap_minutes} minutes')
    """
