"""Streaming attribution: per-user last/first-touch state advanced via
``applyInPandasWithState`` — the batch `events_attribution` carry
(`operators/events.py:last_touch_attribution`, running IGNORE-NULLS
windows over one user_id shuffle) as a *continuous* query that emits an
attribution row the moment each conversion arrives (VERDICT r5 next-7).

State per user is exactly the information the batch window carries up
to the current row: ``(first_touch, last_touch_us, last_touch_type)``
— three scalars, O(users) total, nothing rescans history. Each
micro-batch sorts its per-user slice by (ts, event_id) and replays the
same fold: touches update the carry, conversions read it (a touch at
the same timestamp but a later event_id does NOT attribute — identical
to the batch window's ROWS UNBOUNDED PRECEDING..CURRENT ROW frame over
(ts, event_id) order).

Determinism contract (what the oracle replays): on an event-time-
ordered replay the emitted set equals the batch attribution exactly —
same oracle SQL as `events_attribution`. Cross-batch correctness
requires per-user in-order delivery (the staged replay's time-ordered
chunks guarantee it; per-partition Kafka ordering gives it for
key-routed events) — the same delivery contract as `funnel.py`.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("conversion_id", T.LongType()),
        T.StructField("attributed_touch", T.StringType()),
        T.StructField("first_touch", T.StringType()),
    ]
)

#: (first_touch, last_touch_us, last_touch_type) — the batch carry.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_touch", T.StringType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def attribution_stream(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("view", "click"),
    conversion_type: str = "purchase",
    window_days: int = 7,
    state_ttl_days: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Emit (user_id, conversion_id, attributed_touch, first_touch)
    for every conversion event, attributed to the user's most recent
    touch within ``window_days`` ('none' outside the window or with no
    touch at all), with the first-ever touch carried alongside.

    ``state_ttl_days`` bounds the per-user carry: it expires that many
    days of EVENT time after the user's last activity (event-time
    timeout vs the watermark, attached to ``ts`` with ``watermark`` as
    the allowed-lateness delay). **TTL mode drops events later than
    that lateness** — EventTimeTimeout filters rows older than the
    watermark before the stateful operator, so cross-batch out-of-order
    events are silently discarded when ``watermark`` is smaller than
    the stream's real disorder, and attribution can then differ from
    the no-TTL path; size it to the expected cross-batch lateness (see
    `funnel.py` for the same contract). Unbounded streams need the
    TTL — the carry is otherwise an
    O(all-users-ever) leak. Semantics of expiry: the user becomes a
    new user, so a later conversion with no fresh touch attributes to
    'none' and first_touch restarts. A TTL ≥ ``window_days`` never
    changes ``attributed_touch`` (any touch old enough to expire is
    outside the attribution window anyway); it CAN reset the
    cosmetic first-touch carry — the documented cost of bounding state
    (r6 verdict next-7)."""
    touch_set = set(touch_types)
    window_us = window_days * 86400 * 1_000_000
    ttl_ms = None if state_ttl_days is None else state_ttl_days * 86400 * 1000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        (user_id,) = key
        first_touch, last_us, last_type = (
            tuple(state.get) if state.exists else (None, None, None)
        )
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        seen_us = int(pd.Timestamp(rows["ts"].max()).value // 1_000)
        out: list[tuple[int, str, str]] = []
        for ts, eid, etype in zip(
            rows["ts"], rows["event_id"], rows["event_type"]
        ):
            us = int(pd.Timestamp(ts).value // 1_000)
            if etype in touch_set:
                last_us, last_type = us, etype
                if first_touch is None:
                    first_touch = etype
            elif etype == conversion_type:
                within = last_us is not None and last_us >= us - window_us
                out.append(
                    (
                        int(eid),
                        last_type if within else "none",
                        first_touch if first_touch is not None else "none",
                    )
                )
        if state.exists or last_us is not None or first_touch is not None:
            state.update((first_touch, last_us, last_type))
            if ttl_ms is not None:
                # idle-TTL anchored at the user's newest event, floored
                # past the watermark (setTimeoutTimestamp rejects
                # already-passed timestamps for late-only batches).
                state.setTimeoutTimestamp(
                    max(
                        seen_us // 1000 + ttl_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "conversion_id": [o[0] for o in out],
                    "attributed_touch": [o[1] for o in out],
                    "first_touch": [o[2] for o in out],
                }
            )

    keep = list(touch_types) + [conversion_type]
    src = events.filter(F.col("event_type").isin(keep))
    if ttl_ms is not None:
        src = src.withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def attribution_oracle(
    table: str = "events",
    touch_types: tuple[str, ...] = ("view", "click"),
    conversion_type: str = "purchase",
    window_days: int = 7,
) -> str:
    """Batch attribution as SQL (IGNORE-NULLS running carries) — the
    shared oracle for `events_attribution` AND the drained stream."""
    touches = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
    WITH a AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type IN ({touches}) THEN ts END
                        IGNORE NULLS) OVER w AS lt_ts,
             last_value(CASE WHEN event_type IN ({touches}) THEN event_type END
                        IGNORE NULLS) OVER w AS lt_type,
             first_value(CASE WHEN event_type IN ({touches}) THEN event_type END
                         IGNORE NULLS) OVER w AS ft_type
      FROM {table}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id AS conversion_id,
           CASE WHEN lt_ts IS NOT NULL AND lt_ts >= ts - INTERVAL {window_days} DAY
                THEN lt_type ELSE 'none' END AS attributed_touch,
           coalesce(ft_type, 'none') AS first_touch
    FROM a WHERE event_type = '{conversion_type}'
    """
