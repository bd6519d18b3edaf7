"""Query inventory: every operator from SURVEY.md §2 as a named query
with a DuckDB oracle.

Registry contract (mirrors the driver's):

* ``QUERIES[name]`` — ``(spark, sf_dir) -> DataFrame``
* ``ORACLES[name]`` — equivalent ANSI SQL for DuckDB over views
  ``region nation customer supplier part orders lineitem events
  documents embeddings`` (absent for non-SQL-expressible ops → the
  driver records a rows-only check).

Conventions keeping the value-hash comparison stable:

* every computed/aggregate column is aliased identically on both sides;
* double aggregates are ``round(x, 2)`` on both sides (sum-order
  nondeterminism under AQE/shuffle must not leak into the hash);
* timestamps in output are formatted to strings on both sides;
* every top-k has a deterministic total order (explicit tie-break key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.fixtures import load_catalog, read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# =====================================================================
# Tier A — connector semantics (scan, hidden columns, offset pushdown)
# =====================================================================


@query(
    "flagship_offset_agg",
    oracle="""
    SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events WHERE event_id BETWEEN 100 AND 499
    GROUP BY event_type
    """,
)
def flagship_offset_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7 minimum slice: catalog → source → hidden ``_offset`` →
    pushdown → agg. Spark analog of ``TestMinimalFunctionality.java:103``."""
    from presto_rakam_kafka_spark.plans.offset_pushdown import extract_offset_ranges

    catalog = load_catalog(spark, sf_dir)
    ranges, residual = extract_offset_ranges([("between", (100, 499))])
    assert not residual
    df = catalog.table("tpch", "events", include_hidden=True, offset_ranges=ranges)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "count_star",
    oracle="SELECT count(*) AS n FROM lineitem",
)
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count invariant (reference: count after N produced messages,
    ``TestMinimalFunctionality.java:111-120``)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "count_empty",
    oracle="SELECT count(*) AS n FROM events WHERE event_id < 0",
)
def count_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count over an empty scan = 0 (reference invariant on the
    empty topic, ``TestMinimalFunctionality.java:100-109``)."""
    catalog = load_catalog(spark, sf_dir)
    from presto_rakam_kafka_spark.plans.offset_pushdown import extract_offset_ranges

    ranges, _ = extract_offset_ranges([("<", 0)])
    df = catalog.table("tpch", "events", include_hidden=True, offset_ranges=ranges or None)
    if not ranges:  # fully pruned: empty relation, still answer 0
        df = df.filter(F.lit(False))
    return df.agg(F.count(F.lit(1)).alias("n"))


@query(
    "count_many_splits",
    oracle="SELECT count(*) AS n, count(DISTINCT l_orderkey) AS n_orders FROM lineitem",
)
def count_many_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count across many partitions — no double-count, no gap
    (reference: 100k messages over thousands of segment splits,
    ``TestManySegments.java:98-109``). Repartitioning to many small
    partitions before the count simulates the many-splits shape."""
    df = _t(spark, sf_dir, "lineitem").repartition(64)
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "hidden_columns",
    oracle="""
    SELECT 'tpch' AS project, 'events' AS collection,
           count(*) AS n, min(event_id) AS min_offset, max(event_id) AS max_offset
    FROM events
    """,
)
def hidden_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden-column synthesis (A7): project/collection constants +
    ``_offset`` (``KafkaMetadata.java:165-167``,
    ``KafkaConnectorPageSource.java:311-345``)."""
    catalog = load_catalog(spark, sf_dir)
    df = catalog.table("tpch", "events", include_hidden=True)
    return df.groupBy("project", "collection").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_offset").alias("min_offset"),
        F.max("_offset").alias("max_offset"),
    )


@query(
    "offset_range_scan",
    oracle="""
    SELECT event_id AS _offset, event_type, round(value, 2) AS value_r
    FROM events
    WHERE (event_id >= 10 AND event_id < 50) OR (event_id >= 900 AND event_id <= 940)
    """,
)
def offset_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-range offset pushdown incl. bound-openness semantics
    (``KafkaSplitManager.java:153-178``)."""
    from presto_rakam_kafka_spark.plans.offset_pushdown import OffsetRange

    catalog = load_catalog(spark, sf_dir)
    ranges = [OffsetRange(10, 50), OffsetRange(900, 941)]
    df = catalog.table("tpch", "events", include_hidden=True, offset_ranges=ranges)
    return df.select(
        "_offset", "event_type", F.round("value", 2).alias("value_r")
    )


@query(
    "select_star_hides_system_columns",
    oracle="SELECT * FROM events WHERE event_id < 5",
)
def select_star_hides_system_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden means not-in-``SELECT *`` (Presto hidden flag; SURVEY §1.4):
    the default table() projection returns exactly the user schema."""
    catalog = load_catalog(spark, sf_dir)
    return catalog.table("tpch", "events").filter(F.col("event_id") < 5)
