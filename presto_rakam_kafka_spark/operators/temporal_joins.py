"""Temporal joins the host engine lacked: as-of and interval (band)
joins.

SURVEY §2.B "Range / as-of / interval joins": Presto 0.123 could only
express these as theta joins (cross product + filter) — quadratic and
unusable at scale. These are the Spark-first formulations:

* **As-of join** — one union + one window sort per key; no join at
  all. O(n log n) within each key partition, single shuffle on the key.
* **Interval join** — time-bucketed equi join: the range predicate
  rides on an equi key (user, bucket) so Catalyst plans a hash join
  with a residual filter; each left row fans out to exactly
  ``ceil(band/bucket)+1`` keys. No cross product at any scale.

Both have exact SQL oracles (DuckDB ``ASOF JOIN`` is native; the
interval oracle is the naive predicate join, affordable at oracle
scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join_prior(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: str,
    payload_alias: str,
) -> DataFrame:
    """For each left row, attach ``payload`` of the latest right row
    with ``right.ts < left.ts`` (strictly prior) and the same ``key``.

    Union-and-window formulation: tag both sides, sort each key group
    by (ts, side) with right rows first at equal ts is NOT wanted for
    strict '<' — left rows sort first at ties so a right row at the
    exact same timestamp is not visible to them — then propagate the
    last non-null payload. One shuffle (by key), no join operator.
    """
    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(right.schema[payload].dataType).alias("_p"),
    )
    r_tag = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.col(payload).alias("_p"),
    )
    # _side ascending puts right rows (0) before left rows (1) at equal
    # ts; rowsBetween(-inf, -1)... careful: we want strictly-prior, so
    # left at ts T must NOT see right at ts T → left (1) sorts BEFORE
    # right (0) at ties → order by (ts, -_side) i.e. _side descending.
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    unioned = l_tag.unionByName(r_tag)
    out = unioned.withColumn("_asof", F.last("_p", ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).select(
        "_l.*", F.col("_asof").alias(payload_alias)
    )


def asof_prior_purchase_oracle(table: str = "events") -> str:
    """DuckDB native ASOF JOIN replaying :func:`asof_join_prior` on the
    self-join fixture query (latest strictly-prior purchase value per
    user)."""
    return f"""
    SELECT a.event_id, a.user_id, a.event_type,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(p.value, 2) AS last_purchase_value
    FROM {table} a
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM {table}
                    WHERE event_type = 'purchase') p
      ON a.user_id = p.user_id AND a.ts > p.ts
    """


def interval_self_join(
    events: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    band_minutes: int = 5,
) -> DataFrame:
    """Ordered pairs (a, b) of same-``key`` rows with
    ``0 < b.ts - a.ts <= band`` — the "events within N minutes"
    band join.

    Scale shape: bucket = floor(epoch/band); a row lands in bucket B
    and can only pair forward with rows in buckets {{B, B+1}}, so the
    left side explodes to two (key, bucket) join keys and the range
    predicate is a residual filter on a hash join. Pair count is the
    output size, never a cross product.
    """
    band_s = band_minutes * 60
    bucket = (F.unix_timestamp(F.col(ts)) / band_s).cast("long")
    a = events.select(
        F.col(key),
        F.col(id_col).alias("id_a"),
        F.col(ts).alias("ts_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("_bucket"),
    )
    b = events.select(
        F.col(key),
        F.col(id_col).alias("id_b"),
        F.col(ts).alias("ts_b"),
        bucket.alias("_bucket"),
    )
    return (
        a.join(b, on=[key, "_bucket"])
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {band_s} SECONDS"))
        )
        .select(F.col(key), "id_a", "id_b")
    )


def interval_self_join_oracle(
    table: str, key: str, id_col: str, band_minutes: int = 5
) -> str:
    return f"""
    SELECT a.{key}, a.{id_col} AS id_a, b.{id_col} AS id_b
    FROM {table} a JOIN {table} b
      ON a.{key} = b.{key}
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '{band_minutes} minutes'
    """
