"""Streaming joins: stream-static enrichment and watermarked
stream-stream joins (beyond-reference surface, SURVEY §2.B last row).

Scale notes:

* **Stream-static** re-plans the static side per micro-batch; a small
  dimension broadcasts into every batch — no state, no shuffle of the
  stream beyond the join itself.
* **Stream-stream inner** keeps both sides in state keyed by the join
  key; the event-time bound plus watermarks lets Spark evict state as
  the watermark passes ``ts + interval`` — without the bound, state
  grows forever at 100 TB/day. The time condition below is exactly the
  eviction contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static inner join (dimension enrichment). The static side
    is broadcast when under the threshold — per micro-batch, free."""
    return stream.join(F.broadcast(dim), on=on, how="inner")


def view_purchase_join(
    events: DataFrame,
    window_minutes: int = 60,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: each ``purchase`` matched
    to the same user's ``view``s in the preceding ``window_minutes``.

    Both sides carry watermarks and the join predicate bounds purchase
    time relative to view time, so state for a view row is dropped once
    the watermark passes ``view_ts + window`` (and symmetric for
    purchases) — bounded state under unbounded input.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_time"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def view_purchase_join_oracle(table: str = "events", window_minutes: int = 60) -> str:
    """Batch replay of the same join: with an in-order replay nothing is
    late, so the streamed inner-join result equals the batch join."""
    return f"""
    SELECT v.user_id AS user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_time,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
           round(p.value, 2) AS purchase_value
    FROM {table} v
    JOIN {table} p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts > v.ts
     AND p.ts <= v.ts + INTERVAL ({window_minutes}) MINUTE
    """
