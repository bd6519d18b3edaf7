"""Distributed order statistics: a GLOBAL rank without a global
single-partition window.

``Window.orderBy(v)`` with no partition key moves every row into ONE
task (Spark even warns) — the classic scale-killer this package has
been removing since round 4 (packing, top-k). When a total order is
genuinely required (exact percentiles, global row numbering), the
distributed form is:

1. ``repartitionByRange`` on the order columns — one range shuffle,
   rows land in partitions that tile the sort order;
2. ``sortWithinPartitions`` — every sort machine-local;
3. per-partition row counts → cumulative offsets (one tiny driver
   round-trip, #partitions rows — the same bounded-fit contract as
   the k-means/z-order fits);
4. local ``row_number`` + broadcast offset = exact global rank.

Ties that straddle a range boundary receive arbitrary-but-consistent
ranks, exactly like a global sort's tie order; percentile math over
values is unaffected (equal values interpolate to themselves).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str = "grank",
    num_ranges: int | None = None,
) -> DataFrame:
    """Add a 1-based exact global rank over ``order_cols`` using the
    range-shuffle + local-sort + offset scheme above. Costs one range
    exchange, one machine-local sort, and one #partitions-row driver
    aggregation — never a single-partition stage."""
    if num_ranges is None:
        num_ranges = df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(num_ranges, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # PERSIST before the counts action: Spark's range partitioner
    # re-SAMPLES boundaries on every job, so without a shared
    # materialization the offsets job and the downstream job can see
    # different partition assignments (caught by the equivalence test
    # on tie-heavy data). The cache holds exactly the bytes the range
    # shuffle already produced — the same materialization contract as
    # RDD.zipWithIndex. The default MEMORY_AND_DISK level is
    # load-bearing: under memory pressure blocks SPILL (same data)
    # rather than drop-and-recompute (fresh sampling → silently
    # inconsistent offsets); do not weaken it to MEMORY_ONLY.
    parts = parts.persist()
    counts = sorted(
        (r["_pid"], r["c"])
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off_df = df.sparkSession.createDataFrame(offsets, "_pid INT, _off BIGINT")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, F.row_number().over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    cum_col: str = "gcum",
    num_ranges: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order_cols``
    order, same scheme as :func:`with_global_rank` with per-partition
    SUM offsets instead of counts: one range exchange, machine-local
    sorts and local cumsums, a #partitions-row driver fold, broadcast
    offsets. Bit-identical to ``sum().over(Window.orderBy(...))``
    (integer addition is associative) with no single-partition stage."""
    if num_ranges is None:
        num_ranges = df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(num_ranges, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # same persist-before-offsets discipline as with_global_rank (the
    # range sampler is per-job; see the comment there)
    parts = parts.persist()
    sums = sorted(
        (r["_pid"], r["s"])
        for r in parts.groupBy("_pid")
        .agg(F.sum(value_col).cast("long").alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in sums:
        offsets.append((pid, acc))
        acc += int(s)
    off_df = df.sparkSession.createDataFrame(offsets, "_pid INT, _off BIGINT")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(cum_col, F.sum(value_col).over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )
