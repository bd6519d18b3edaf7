"""Stateful streaming deduplication.

Beyond-reference surface (SURVEY §7 step 4): the batch dedup operators
in :mod:`..operators.dedup` pick survivors over a frozen corpus; these
dedup an *unbounded* stream with bounded state via watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_keys_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """First-seen row per key combination, with state expiring once the
    watermark passes (``dropDuplicatesWithinWatermark``): a duplicate is
    suppressed whenever it arrives within the watermark delay of the
    first occurrence — the bounded-state contract an unbounded stream
    needs (plain ``dropDuplicates`` would grow state forever).

    Project the result to ``keys`` for a deterministic comparison: which
    physical row survives depends on arrival order, but the *key set*
    equals batch ``SELECT DISTINCT`` whenever every duplicate arrives
    within the delay (true for the staged replay; tests cover the
    expiry path).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def dedup_keys_oracle(table: str, keys: list[str]) -> str:
    cols = ", ".join(keys)
    return f"SELECT DISTINCT {cols} FROM {table}"
