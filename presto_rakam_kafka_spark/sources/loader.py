"""Query-result → topic loader: the `KafkaLoader` / `TestUtils
.loadTpchTopic` twin (SURVEY §2.C).

The reference's TPC-H harness runs a Presto query and pumps each result
row into Kafka as a JSON message, converting dates/times to ISO8601
(`util/KafkaLoader.java:50-150`, conversion at `:120-148`), keyed by a
long encoded as 8 bytes (`util/NumberEncoder.java:21-37`) and routed to
``key mod partitions`` (`util/NumberPartitioner.java:20-37`);
`TestUtils.loadTpchTopic` wraps it with ``SELECT *`` over a TPC-H table
(`util/TestUtils.java:48-54`). `EmbeddedKafka` forces tiny
``segment.bytes`` so a load fragments into many log segments
(`util/EmbeddedKafka.java:70-84`, `TestManySegments.java:64-81`).

Spark-first split of that design:

* **Serialization is distributed**: ``to_json(struct(*))`` with an
  ISO8601 ``timestampFormat``/``dateFormat`` runs in codegen on
  executors; the 8-byte big-endian key mirrors `NumberEncoder`.
* **Routing is Kafka's**: partition = ``pmod(key, num_partitions)``
  (`NumberPartitioner`), offsets are independent per-partition
  sequences — exactly a keyed producer against a P-partition topic.
* Only the final fixture **layout** (tiny parquet "segments" under
  ``partition=N/``) materializes driver-side — same test-only caveat as
  :func:`.kafka_datasource.write_segments`; production logs are written
  by brokers.

Round-trip contract (tested): load a TPC-H table with a small
``segment_rows`` → many segments; scan it back through the
``kafka_segments`` DataSource; JSON-decode values with the table's
schema; the exact row count (the `TestManySegments.java:98-109`
invariant) and column aggregates must match the source table, with
DATE/TIMESTAMP columns surviving the ISO8601 hop losslessly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.sources.kafka_datasource import (
    RAW_FRAME_SCHEMA,
    _arrow_schema,
)

ISO_TS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
ISO_DATE = "yyyy-MM-dd"


def encode_frames(
    df: DataFrame,
    key_col: str,
    num_partitions: int = 2,
    topic: str = "loaded",
) -> DataFrame:
    """Distributed part of the load: rows → keyed JSON Kafka frames.

    Returns a RAW_FRAME_SCHEMA-shaped DataFrame: JSON value with
    ISO8601 temporals (`KafkaLoader.java:120-148`), 8-byte big-endian
    key (`NumberEncoder`), partition = key mod P (`NumberPartitioner`),
    offset = per-partition arrival sequence (what a broker assigns).
    The per-partition ``row_number`` is the one shuffle, on the same
    uniform key Kafka itself would route by."""
    key = F.col(key_col).cast("long")
    framed = df.select(
        F.pmod(key, F.lit(num_partitions)).cast("int").alias("partition"),
        # NumberEncoder.java:21-37 — 8-byte big-endian two's-complement.
        F.unhex(F.lpad(F.hex(key), 16, "0")).alias("key"),
        F.to_json(
            F.struct(*[F.col(c) for c in df.columns]),
            {"timestampFormat": ISO_TS, "dateFormat": ISO_DATE},
        )
        .cast("binary")
        .alias("value"),
        key.alias("_seq"),
    )
    w = Window.partitionBy("partition").orderBy("_seq")
    return framed.select(
        "partition",
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        "key",
        "value",
        F.lit(topic).alias("topic"),
        F.current_timestamp().alias("timestamp"),
    )


def load_topic(
    df: DataFrame,
    path: str,
    key_col: str,
    num_partitions: int = 2,
    segment_rows: int = 0,
    topic: str = "loaded",
) -> int:
    """`KafkaLoader.run` twin: pump a query result into a segment-log
    topic at ``path``. ``segment_rows`` > 0 rolls small segments (the
    ``segment.bytes=256`` many-segments stress); returns rows loaded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    frames = encode_frames(df, key_col, num_partitions, topic)
    pdf = frames.toPandas()  # fixture layout only — see module docstring
    os.makedirs(path, exist_ok=True)
    for pid in range(num_partitions):
        sub = pdf[pdf["partition"] == pid].sort_values("offset")
        pdir = os.path.join(path, f"partition={pid}")
        os.makedirs(pdir, exist_ok=True)
        chunks = (
            [sub]
            if not segment_rows
            else [
                sub.iloc[i : i + segment_rows]
                for i in range(0, len(sub), segment_rows)
            ]
        )
        for chunk in chunks:
            if chunk.empty:
                continue
            first = int(chunk["offset"].iloc[0])
            table = pa.Table.from_pandas(
                chunk[[f.name for f in RAW_FRAME_SCHEMA.fields]],
                preserve_index=False,
            ).cast(_arrow_schema())
            pq.write_table(table, os.path.join(pdir, f"segment-{first}.parquet"))
    return len(pdf)


def load_tpch_topic(
    spark,
    sf_dir: str,
    table: str,
    path: str,
    num_partitions: int = 2,
    segment_rows: int = 0,
) -> int:
    """`TestUtils.loadTpchTopic` twin: ``SELECT *`` over a fixture
    table → topic, keyed by the table's first column.

    Deliberate divergence from the reference: `KafkaLoader.java` keys
    every message by a GLOBAL incrementing row counter
    (``producer.send(..., count.getAndIncrement(), ...)``) — a
    driver-side mutable sequence that has no distributed analog short
    of a global sort. We key by the table's first column instead, which
    is unique for every TPC-H table (their first column is the primary
    key prefix), so routing and per-partition offset order stay
    deterministic. Tables whose first column repeats would get
    nondeterministic offsets among ties — pass such tables through
    :func:`load_topic` with an explicitly unique ``key_col``."""
    from presto_rakam_kafka_spark.fixtures import read_table

    df = read_table(spark, sf_dir, table)
    return load_topic(
        df,
        path,
        key_col=df.columns[0],
        num_partitions=num_partitions,
        segment_rows=segment_rows,
        topic=f"tpch_{table}",
    )
