"""Storage-layout disciplines: partitioned writes with partition-pruned
scans, and bucketed tables with shuffle-free co-located joins.

At 100 TB these two table layouts are where most of the performance
lives, before any operator tuning:

* **Partitioning** (hive-style ``partitionBy`` directories) turns a
  predicate on the partition column into directory pruning — the scan
  never opens non-matching files. The reference's `_offset` pushdown
  (SURVEY §4 O1) is the same idea on the Kafka log; this is its
  warehouse-table counterpart.
* **Bucketing** (``bucketBy`` on the join key) pre-shuffles a table at
  write time: two tables bucketed identically join with NO exchange —
  the shuffle that dominates repeated fact-fact joins is paid once at
  ingest instead of per query.

Both are verified two ways: the oracle gate proves results identical to
the plain layout, and plan assertions (tests) prove the pruning /
missing exchange actually happened — a layout that silently falls back
to full scan + shuffle would still be "correct".

Staged layouts are cached per (sf_dir, layout) in a module dict, like
the streaming runner's chunk cache: queries and tests share one write.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from presto_rakam_kafka_spark.fixtures import staging_mkdtemp

_LAYOUT_CACHE: dict[tuple[str, str], str] = {}


# ---------------------------------------------------------------------
# Partitioned layout → partition-pruned scan
# ---------------------------------------------------------------------


def stage_partitioned(
    spark: SparkSession, df: DataFrame, cache_key: str, partition_col: str
) -> str:
    """Write ``df`` hive-partitioned by ``partition_col``; return the
    path (cached per key)."""
    key = (cache_key, f"part:{partition_col}")
    if key in _LAYOUT_CACHE and os.path.isdir(_LAYOUT_CACHE[key]):
        return _LAYOUT_CACHE[key]
    path = staging_mkdtemp("layout_part_")
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    _LAYOUT_CACHE[key] = path
    return path


def read_pruned(spark: SparkSession, path: str, partition_col: str, value: str) -> DataFrame:
    """Scan the partitioned layout with an equality filter on the
    partition column — Catalyst turns it into directory pruning
    (``PartitionFilters`` in the FileScan, zero non-matching files
    opened). Plan-asserted in tests."""
    return spark.read.parquet(path).filter(F.col(partition_col) == value)


# ---------------------------------------------------------------------
# Bucketed layout → shuffle-free join
# ---------------------------------------------------------------------


def stage_bucketed(
    spark: SparkSession,
    df: DataFrame,
    cache_key: str,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> str:
    """Write ``df`` as a bucketed+sorted table on ``bucket_col`` and
    return the table name. Bucket files live under a temp path
    (external table); the catalog entry carries the bucket spec Spark's
    planner needs to elide the exchange. Sorted buckets additionally
    let sort-merge join skip its sort."""
    key = (cache_key, f"bucket:{table}:{bucket_col}:{num_buckets}")
    # the module cache outlives a SparkSession: also require the table
    # in THIS session's catalog, else re-stage
    if key in _LAYOUT_CACHE and spark.catalog.tableExists(table):
        return table
    path = staging_mkdtemp(f"layout_bucket_{table}_")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
    _LAYOUT_CACHE[key] = path
    return table


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys. With
    matching bucket specs the planner emits a sort-merge join with NO
    ShuffleExchange on either side — the write-time layout already
    co-located matching keys. Plan-asserted in tests.

    The ``merge`` hint pins sort-merge: at fixture scale AQE would
    (rightly) broadcast the small side, which hides the mechanism under
    test — at 100 TB neither side broadcasts and sort-merge over
    buckets IS the plan, so the hint makes the demonstrated plan the
    scale plan."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])


# ---------------------------------------------------------------------
# Sort-clustered layout → row-group skipping on range predicates
# ---------------------------------------------------------------------


def stage_sorted(
    spark: SparkSession,
    df: DataFrame,
    cache_key: str,
    sort_col: str,
    num_ranges: int = 4,
    block_bytes: int = 128 * 1024,
) -> str:
    """Write ``df`` range-partitioned + sorted on ``sort_col`` with
    small parquet row groups; return the path (cached per key).

    The third layout discipline after partitioning and bucketing:
    sort-clustering makes every row group's min/max footer stats TIGHT
    on the sort column, so a pushed range predicate skips whole row
    groups at read time (parquet reader drops groups whose stats can't
    match — the warehouse counterpart of the `kafka_segments` source's
    footer-stat segment pruning, and the single-column core of what
    Delta/Iceberg ship as Z-ORDER). ``repartitionByRange`` makes files
    disjoint in the sort key too, so skipping works at both file and
    row-group granularity. The small ``block_bytes`` stands in for the
    128 MB production row group at fixture scale."""
    key = (
        cache_key,
        f"sorted:{sort_col}:{num_ranges}:{block_bytes}:{','.join(df.columns)}",
    )
    if key in _LAYOUT_CACHE and os.path.isdir(_LAYOUT_CACHE[key]):
        return _LAYOUT_CACHE[key]
    path = staging_mkdtemp("layout_sorted_")
    (
        df.repartitionByRange(num_ranges, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option("parquet.block.size", str(block_bytes))
        .parquet(path)
    )
    _LAYOUT_CACHE[key] = path
    return path


def row_groups_overlapping(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(overlapping, total) row groups whose [min, max] stats intersect
    [lo, hi] — the direct receipt that sort-clustering enables
    skipping (pyarrow footer walk, no Spark)."""
    import pyarrow.parquet as pq

    overlapping = total = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for g in range(md.num_row_groups):
            stats = md.row_group(g).column(idx).statistics
            total += 1
            if stats is None or stats.min is None:
                overlapping += 1
            elif not (stats.max < lo or stats.min > hi):
                overlapping += 1
    return overlapping, total


def zorder_expr(col_a: str, col_b: str, bits: int = 16) -> str:
    """Morton (Z-order) interleave of two non-negative int columns'
    low ``bits`` bits — bit i of a lands at 2i, bit i of b at 2i+1.
    Pure integer shift/mask arithmetic: identical semantics in Spark
    SQL and DuckDB, whole-stage-codegen'd, no UDF.

    Callers must pre-scale both columns to the same bit width: raw
    interleave degenerates to a sort on whichever column has more
    significant bits (measured: with raw 14-bit orderkey × 11-bit
    partkey the partkey predicate skipped ~nothing). That is why
    :func:`stage_zordered` min-max-normalizes first — the same
    range-bucket normalization production Z-ORDER implementations
    apply."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({col_a} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({col_b} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def stage_zordered(
    spark: SparkSession,
    df: DataFrame,
    cache_key: str,
    col_a: str,
    col_b: str,
    num_ranges: int = 4,
    block_bytes: int = 128 * 1024,
    bits: int = 10,
) -> str:
    """Write ``df`` clustered by the Morton interleave of two columns
    (range-partitioned + sorted on the z-value, small row groups) —
    the Delta/Iceberg Z-ORDER discipline from first principles. A
    single-column sort gives tight stats on ONE column and destroys
    locality on others; the z-curve keeps BOTH columns' min/max ranges
    narrow per row group, so selective predicates on either column (or
    both) skip row groups. Receipt in tests via the same
    :func:`row_groups_overlapping` footer walk as the sorted layout.

    Both columns are min-max scaled to ``bits`` bits before the
    interleave (one tiny offline agg, the fit-then-layout shape):
    equal bit widths keep the curve balanced between the two dims —
    see :func:`zorder_expr` for the degenerate raw-value mode."""
    key = (
        cache_key,
        f"zorder:{col_a}:{col_b}:{num_ranges}:{block_bytes}:{bits}:"
        f"{','.join(df.columns)}",
    )
    if key in _LAYOUT_CACHE and os.path.isdir(_LAYOUT_CACHE[key]):
        return _LAYOUT_CACHE[key]
    path = staging_mkdtemp("layout_zorder_")
    top = (1 << bits) - 1
    mm = df.agg(
        F.min(col_a).alias("a0"), F.max(col_a).alias("a1"),
        F.min(col_b).alias("b0"), F.max(col_b).alias("b1"),
    ).collect()[0]
    a0, a1 = int(mm["a0"]), int(mm["a1"])
    b0, b1 = int(mm["b0"]), int(mm["b1"])
    sa = f"(CAST(({col_a} - {a0}) AS BIGINT) * {top} DIV {max(a1 - a0, 1)})"
    sb = f"(CAST(({col_b} - {b0}) AS BIGINT) * {top} DIV {max(b1 - b0, 1)})"
    z = zorder_expr(sa, sb, bits)
    (
        df.withColumn("_z", F.expr(z))
        .repartitionByRange(num_ranges, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("parquet.block.size", str(block_bytes))
        .parquet(path)
    )
    _LAYOUT_CACHE[key] = path
    return path
