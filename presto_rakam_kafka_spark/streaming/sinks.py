"""Streaming sinks: foreachBatch with exactly-once parquet output.

SURVEY §7 step 4 names foreachBatch as part of the streaming surface:
it hands each micro-batch to arbitrary batch-DataFrame code — the
escape hatch for sinks Structured Streaming doesn't speak natively
(JDBC upserts, multi-table fanout, compaction).

Exactly-once recipe used here (the standard one): the checkpoint makes
batch replay possible after failure, so the batch function must be
*idempotent per epoch_id* — each batch writes to an epoch-keyed
partition directory with overwrite, so a replayed batch overwrites its
own previous (possibly partial) output instead of duplicating it.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from presto_rakam_kafka_spark.fixtures import staging_mkdtemp


def write_stream_parquet_exactly_once(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str | None = None,
    query_name: str = "parquet_sink",
):
    """Start (and return) a streaming query appending to ``out_dir``
    with epoch-keyed idempotent writes; read back with
    ``spark.read.parquet(out_dir)``."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
        )

    ckpt = checkpoint_dir or staging_mkdtemp(f"ckpt_{query_name}_")
    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_sink(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the sink back, dropping the epoch partitioning column."""
    return spark.read.parquet(out_dir).drop("epoch")
