"""SparkSession factory tuned for this engine.

Local-mode defaults mirror the test/bench environment (single JVM,
``local[N]``); the same settings are cluster-safe — AQE, Arrow, and a
shuffle-partition count sized to the parallelism at hand.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "presto_rakam_kafka_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults matter for scale:

    * AQE on: runtime shuffle coalescing, skew-join splitting, and
      dynamic broadcast-join demotion/promotion — the 100 TB insurance
      policy for every join/agg in this package.
    * Arrow on: every pandas UDF in :mod:`.operators` moves data in
      columnar batches instead of pickled rows.
    * UTC session timezone: parquet/Kafka timestamps are naive; pinning
      UTC keeps results identical across driver locales (and matches
      the DuckDB oracle, which is timezone-naive).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Sketch operators aggregate >100 columns (e.g. 128 MinHash
        # mins); default maxFields=100 silently drops them out of
        # whole-stage codegen — a ~2-4× slowdown.
        .config("spark.sql.codegen.maxFields", "300")
        # The kafka_segments Python DataSource consumes offset
        # conjuncts in pushFilters() (split pruning, A4); off by
        # default in Spark 4.1.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Let the planner pick shuffled-hash join when its size
        # conditions hold (round-13 optimization, guide §3.1): a SMJ
        # pays two sorts a hash join doesn't need; AQE's skew-join
        # splitting still applies to SHJ, and joins where neither side
        # fits per-partition keep planning SMJ (the size conditions
        # gate the choice). Measured ~5-8% on the SMJ-planning rows at
        # sf0.1 (dedup_semantic 4.3 -> 3.9); results are join-strategy
        # independent. Executor-memory assumption (ADVICE r13 #4): SHJ
        # builds its per-partition hash map unspillable, and the size
        # gate trusts plan statistics the Python DSv2 sources estimate
        # poorly — deployments whose joins read stats-less Python
        # sources with tight executor memory should flip this back to
        # true (or hint SHUFFLE_MERGE on those joins); AQE's skew split
        # and the size conditions bound, but do not eliminate, the
        # build-side OOM risk.
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
