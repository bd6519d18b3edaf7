"""Streaming funnel: per-user funnel state advanced incrementally via
``applyInPandasWithState`` — Rakam's funnel query as a *continuous*
query instead of a batch scan.

State per user is the same accumulator as the batch sorted-fold
(`operators/events.py:funnel_windowed`): ``(depth, last_us)``. Each
micro-batch sorts its per-user slice by (ts, event_id) and advances the
fold; a row is emitted the moment a user reaches a new step — the
"conversion events" stream a funnel dashboard tails.

Determinism contract (what the oracle replays): on an event-time-
ordered replay the emitted set equals the batch greedy chained-min
funnel — for each user with final depth d, one row per step 1..d
stamped with the matching event's time. Cross-batch correctness
requires per-user in-order delivery (the staged replay guarantees it;
on a real bus, per-partition Kafka ordering gives it for key-routed
events). A late event older than already-folded state cannot retract a
conversion — documented streaming-funnel semantics, same tradeoff as
every incremental funnel materialization.

State is two longs per user: O(users) total, partitioned by key,
nothing scans history — the 100 TB contrast to re-running the batch
funnel per refresh.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step", T.IntegerType()),
        T.StructField("step_name", T.StringType()),
        T.StructField("step_ts", T.StringType()),
    ]
)

#: (depth, last_us) — the batch fold's accumulator, persisted per user.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("depth", T.IntegerType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def funnel_stream(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_hours: int | None = None,
) -> DataFrame:
    """Emit (user_id, step, step_name, step_ts) whenever a user's
    funnel depth advances. ``window_hours`` bounds each step's distance
    from the previous match (None = unbounded)."""
    idx = {s: i for i, s in enumerate(steps)}
    window_us = None if window_hours is None else window_hours * 3600 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        depth, last_us = tuple(state.get) if state.exists else (0, None)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        out: list[tuple[int, str, int]] = []
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            i = idx.get(etype)
            if i is None or i != depth:
                continue
            us = int(pd.Timestamp(ts).value // 1_000)
            if (
                window_us is not None
                and last_us is not None
                and us - last_us > window_us
            ):
                continue
            depth, last_us = depth + 1, us
            out.append((depth, etype, us))
        if out:
            state.update((depth, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "step": [o[0] for o in out],
                    "step_name": [o[1] for o in out],
                    "step_ts": [
                        pd.Timestamp(o[2], unit="us").strftime(TS_FMT_DUCK)
                        for o in out
                    ],
                }
            )
        elif state.exists or depth:
            state.update((depth, last_us))

    return (
        events.filter(F.col("event_type").isin(list(steps)))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def funnel_stream_oracle(
    table: str = "events",
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_hours: int | None = None,
) -> str:
    """Chained greedy-min construction of the same conversion set."""
    bound = (
        ""
        if window_hours is None
        else " AND e.ts <= prev.t + INTERVAL {h} HOUR".format(h=window_hours)
    )
    ctes = [
        f"s1 AS (SELECT user_id, min(ts) AS t FROM {table} "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM {table} e "
            f"JOIN s{i - 1} prev ON e.user_id = prev.user_id "
            f"WHERE e.event_type = '{s}' AND e.ts > prev.t{bound} "
            f"GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT user_id, {i} AS step, '{s}' AS step_name, "
        f"strftime(t, '{TS_FMT_DUCK}') AS step_ts FROM s{i}"
        for i, s in enumerate(steps, start=1)
    ]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)
