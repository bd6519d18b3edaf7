"""Warehouse maintenance operators: MERGE-style upsert and SCD type-2
history — the mutation/dimension-management half every analytics engine
eventually needs next to its scan path (the reference is scan-only;
Rakam's continuous ingestion implies exactly these maintenance shapes
downstream: apply a CDC batch to a snapshot, track attribute history).

Spark has no MERGE INTO without a table format (Delta/Iceberg own the
transactional flavor); the DataFrame formulation below is the engine-
level core those formats execute: one key-partitioned full-outer join.

100 TB shapes:
- ``merge_upsert``: each side shuffles ONCE on the key; with target and
  updates both bucketed by the key (layout.stage_bucketed) the exchange
  disappears entirely and the merge is a zip of co-located buckets. The
  update batch is usually ≪ target — broadcast it and the target never
  shuffles at all (Catalyst picks this when the batch is under the
  broadcast threshold).
- ``scd2_history``: one shuffle on the entity key; both windows (change
  detection + interval close) share the same partitioning, so Catalyst
  plans a single Exchange + one Sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """SQL ``MERGE INTO`` semantics as one full-outer join:

    - key in both → the UPDATE ROW replaces the target row (whole-row
      update, the MERGE ``WHEN MATCHED THEN UPDATE SET *``);
    - key only in updates → inserted (``WHEN NOT MATCHED THEN INSERT``);
    - key only in target → kept;
    - ``delete_col`` (boolean on the updates side) marks CDC deletes:
      a matched-and-flagged key is dropped (``WHEN MATCHED AND
      u.deleted THEN DELETE``); an unmatched delete is a no-op.

    Updates must be unique per key (CDC batches are; enforce upstream
    with `exact_dedup`-style latest-per-key if not). Column set of the
    result == column set of ``target``."""
    cols = [c for c in target.columns]
    t = target.alias("t")
    u = updates.alias("u")
    joined = t.join(u, F.col(f"t.{key_col}") == F.col(f"u.{key_col}"), "full_outer")
    matched = F.col(f"u.{key_col}").isNotNull()
    if delete_col is not None:
        joined = joined.filter(
            ~(matched & F.coalesce(F.col(f"u.{delete_col}"), F.lit(False)))
        )
    return joined.select(
        *[
            F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )


def merge_upsert_oracle(
    target_sql: str,
    updates_sql: str,
    key_col: str,
    cols: list[str],
    delete_col: str | None = None,
) -> str:
    """DuckDB twin over two subqueries (same row-replacement rules)."""
    proj = ", ".join(
        f"CASE WHEN u.{key_col} IS NOT NULL THEN u.{c} ELSE t.{c} END AS {c}"
        for c in cols
    )
    anti_delete = (
        f"WHERE NOT (u.{key_col} IS NOT NULL AND coalesce(u.{delete_col}, false))"
        if delete_col is not None
        else ""
    )
    return f"""
    SELECT {proj}
    FROM ({target_sql}) t FULL OUTER JOIN ({updates_sql}) u
      ON t.{key_col} = u.{key_col}
    {anti_delete}
    """


TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change/event log:
    one row per (entity, attribute-value RUN) with its validity
    interval — ``valid_from`` = first ts of the run, ``valid_to`` =
    next run's first ts (null while current). Consecutive events with
    the SAME value collapse into one row (runs, not rows).

    ONE shuffle on the key: the lag (change detection) and lead
    (interval close) windows share (key, order) partitioning, so the
    plan is a single Exchange + Sort + two Window passes over it.
    Deterministic under ties via ``tiebreak_col``."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    # NULL-SAFE change detection: `_prev != attr` is three-valued — a
    # non-null→NULL transition yields NULL and the run boundary was
    # silently dropped (the NULL period merged into its predecessor).
    # `eqNullSafe` (SQL IS DISTINCT FROM) treats NULL as a value; the
    # first row of each entity is detected by lag(1) being null (lag of
    # the ATTRIBUTE is null both on row one and after a NULL value, so
    # it cannot double as the first-row marker).
    changes = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_first", F.lag(F.lit(1)).over(w).isNull())
        .filter(
            F.col("_first") | ~F.col("_prev").eqNullSafe(F.col(attr_col))
        )
        .drop("_prev", "_first")
    )
    w2 = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    return changes.select(
        F.col(key_col),
        F.col(attr_col),
        F.date_format(ts_col, TS_FMT).alias("valid_from"),
        F.date_format(F.lead(ts_col).over(w2), TS_FMT).alias("valid_to"),
    )


def scd2_history_oracle(
    table: str, key_col: str, attr_col: str, ts_col: str, tiebreak_col: str
) -> str:
    return f"""
    WITH flagged AS (
      SELECT {key_col}, {attr_col}, {ts_col}, {tiebreak_col},
             lag({attr_col}) OVER w AS prev,
             lag(1) OVER w AS prevflag
      FROM {table}
      WINDOW w AS (PARTITION BY {key_col}
                   ORDER BY {ts_col}, {tiebreak_col})
    ), changes AS (
      SELECT {key_col}, {attr_col}, {ts_col}, {tiebreak_col}
      FROM flagged
      WHERE prevflag IS NULL OR prev IS DISTINCT FROM {attr_col}
    )
    SELECT {key_col}, {attr_col},
           strftime({ts_col}, '{TS_FMT_DUCK}') AS valid_from,
           strftime(lead({ts_col}) OVER w2, '{TS_FMT_DUCK}') AS valid_to
    FROM changes
    WINDOW w2 AS (PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col})
    """
