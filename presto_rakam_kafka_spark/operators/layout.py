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
    path = tempfile.mkdtemp(prefix="layout_part_")
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
    path = tempfile.mkdtemp(prefix=f"layout_bucket_{table}_")
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
