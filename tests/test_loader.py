"""Query-result → topic loader (`KafkaLoader` / `loadTpchTopic` twin):
round-trip a TPC-H table through many JSON log segments and back —
the `TestManySegments.java:98-109` exact-count invariant plus lossless
typed decode (ISO8601 temporals) at the TPC-H-harness level."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from presto_rakam_kafka_spark.fixtures import read_table
from presto_rakam_kafka_spark.sources import loader
from presto_rakam_kafka_spark.sources.kafka_datasource import KafkaSegmentDataSource
from presto_rakam_kafka_spark.fixtures import staging_mkdtemp


def test_tpch_roundtrip_many_segments_exact(spark, sf_dir):
    spark.dataSource.register(KafkaSegmentDataSource)
    src = read_table(spark, sf_dir, "lineitem")
    path = staging_mkdtemp("tpch_topic_")

    n = loader.load_tpch_topic(
        spark, sf_dir, "lineitem", path, num_partitions=3, segment_rows=100
    )
    assert n == src.count()

    back = spark.read.format("kafka_segments").option("path", path).load()
    # Exact count across many segments/partitions: no double-count, no gap.
    assert back.count() == n

    decoded = back.select(
        F.from_json(
            F.col("value").cast("string"),
            src.schema,
            {"timestampFormat": loader.ISO_TS, "dateFormat": loader.ISO_DATE},
        ).alias("r")
    ).select("r.*")
    # Typed aggregates survive the JSON hop: ints, decimals/doubles, dates.
    a = src.agg(
        F.sum("l_quantity").alias("q"),
        F.round(F.sum("l_extendedprice"), 2).alias("p"),
        F.max("l_shipdate").alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    b = decoded.agg(
        F.sum("l_quantity").alias("q"),
        F.round(F.sum("l_extendedprice"), 2).alias("p"),
        F.max("l_shipdate").alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert tuple(a) == tuple(b)
    # No corrupt rows: every value decoded.
    assert decoded.filter(F.col(src.columns[0]).isNull()).count() == 0


def test_loader_key_routing_and_per_partition_offsets(spark, sf_dir):
    """NumberPartitioner semantics: partition = key mod P; offsets are
    contiguous per-partition sequences from 0 (what a broker assigns)."""
    src = read_table(spark, sf_dir, "nation")
    frames = loader.encode_frames(src, "n_nationkey", num_partitions=2)
    rows = frames.select("partition", "offset", "key").collect()
    for r in rows:
        key = int.from_bytes(bytes(r["key"]), "big", signed=True)
        assert r["partition"] == key % 2
    for pid in (0, 1):
        offs = sorted(r["offset"] for r in rows if r["partition"] == pid)
        assert offs == list(range(len(offs)))
