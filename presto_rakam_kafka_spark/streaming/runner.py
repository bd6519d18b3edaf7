"""Streaming test/run harness: chunked file-stream input + drain-to-
DataFrame execution.

The reference is batch-over-log only (SURVEY §1.1); this module powers
the beyond-reference Structured Streaming surface (SURVEY §7 step 4).
Production streams come from :class:`..sources.kafka.KafkaEventSource`
``.stream()``; this harness replays the same event tables through the
*file* stream source so every streaming operator is testable — and
oracle-checkable — without a broker. Micro-batch boundaries are real:
the input is staged as N time-ordered parquet chunks and
``maxFilesPerTrigger=1`` makes each chunk one trigger, so watermark
advancement, state timeouts, and late-data policies execute exactly as
they would on a live stream.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from presto_rakam_kafka_spark.fixtures import staging_mkdtemp

_STAGE_CACHE: dict[tuple[str, str, int], str] = {}


def stage_chunked_events(
    spark: SparkSession,
    sf_dir: str,
    table: str = "events",
    num_chunks: int = 4,
    order_col: str = "ts",
) -> str:
    """Write ``table`` as ``num_chunks`` time-ordered parquet files and
    return the directory. Chunk *i* holds the i-th quantile of
    ``order_col`` and files carry increasing mtimes, so the file source
    replays them in event-time order — the well-behaved stream on which
    append-mode results are deterministic. (Late data is injected by
    tests explicitly, not by the replay.)

    Results are cached per (sf_dir, table, num_chunks): queries and
    tests share one staging.
    """
    key = (sf_dir, table, num_chunks)
    if key in _STAGE_CACHE and os.path.isdir(_STAGE_CACHE[key]):
        return _STAGE_CACHE[key]
    out_dir = staging_mkdtemp(f"stream_{table}_")
    # read_table normalizes fixture quirks (nanos → µs timestamps), so
    # the staged chunks are plain µs-timestamp parquet.
    from presto_rakam_kafka_spark.fixtures import read_table

    df = read_table(spark, sf_dir, table)
    # ntile over the order column → equal-size contiguous time slices.
    from pyspark.sql import Window as W

    chunked = df.withColumn(
        "_chunk", F.ntile(num_chunks).over(W.orderBy(order_col)) - 1
    )
    for i in range(num_chunks):
        part = chunked.filter(F.col("_chunk") == i).drop("_chunk")
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"chunk={i}")
        )
    # Flatten: the file source watches one flat dir; name files so
    # lexicographic order == time order and bump mtimes monotonically.
    import glob
    import shutil
    import time as _time

    flat = staging_mkdtemp(f"stream_{table}_flat_")
    now = _time.time()
    for i in range(num_chunks):
        srcs = glob.glob(os.path.join(out_dir, f"chunk={i}", "*.parquet"))
        assert len(srcs) == 1
        dst = os.path.join(flat, f"part-{i:05d}.parquet")
        shutil.copy(srcs[0], dst)
        os.utime(dst, (now + i, now + i))
    shutil.rmtree(out_dir)
    _STAGE_CACHE[key] = flat
    return flat


def read_file_stream(
    spark: SparkSession, input_dir: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a staged directory, one chunk per
    micro-batch by default."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )


def run_available_now(stream_df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Drain the stream with ``Trigger.AvailableNow`` into a memory sink
    and return the result table.

    AvailableNow processes all staged input in micro-batches (respecting
    ``maxFilesPerTrigger``), runs the trailing no-data batch so
    event-time timeouts and window evictions fire against the final
    watermark, then stops — the batch-bounded replay of an unbounded
    query.
    """
    ckpt = staging_mkdtemp(f"ckpt_{name}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def drain_available_now(
    stream_df: DataFrame,
    name: str,
    output_mode: str,
    max_restarts: int = 200,
    on_restart=None,
) -> DataFrame:
    """:func:`run_available_now` for RATE-LIMITED Python stream sources.

    Python data sources fall back to single-batch execution under
    ``Trigger.AvailableNow`` — one start processes ONE rate-limited
    batch (e.g. ``maxRowsPerBatch`` rows), not all available input. A
    single start over a bounded source therefore silently drains only
    the first batch. This helper restarts the query against a SHARED
    checkpoint until a start reports zero input rows: aggregation state
    lives in the checkpoint's state store, so each restart continues
    the same logical query — the production always-on cadence replayed
    as bounded epochs (same discipline as
    ``serving.run_rollup_maintenance``).

    ``on_restart(i)`` (optional) fires after start ``i`` terminates —
    the between-epochs injection point (e.g. a registry snapshot
    gaining a schema id mid-stream).

    A start's "produced data" signal is the SUM of input rows across
    its ``recentProgress`` entries, not ``lastProgress`` alone: a start
    may run a data batch AND a trailing zero-row trigger, and judging
    only the last trigger would break the loop before snapshotting
    that start's output (round-11 review finding #7)."""
    if output_mode != "complete":
        # the per-restart snapshot below REPLACES the memory table, so
        # only complete mode (each batch emits the full state) survives
        # the restart cadence; append/update would lose earlier batches
        raise ValueError(
            "drain_available_now supports output_mode='complete' only; "
            "use run_available_now (single start) for append/update"
        )
    ckpt = staging_mkdtemp(f"ckpt_{name}_")
    spark = stream_df.sparkSession
    last: tuple | None = None
    total_in = 0
    # max_restarts data-bearing starts + ONE confirming start: a source
    # holding exactly max_restarts batches drains completely on the last
    # allowed start, and only the extra zero-row start can prove it —
    # raising without the probe would crash a complete snapshot
    # (round-12 review finding #4)
    for i in range(max_restarts + 1):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if on_restart is not None:
            on_restart(i)
        total_in = sum(
            int(p.get("numInputRows", 0) or 0)
            for p in (q.recentProgress or [])
            if p
        )
        # snapshot BEFORE the zero check when anything was emitted:
        # each .start() re-registers the memory table, so a later
        # no-progress restart (no trigger at all) leaves it EMPTY and
        # must not clobber the last real state. Complete-mode output
        # is aggregate-sized — a driver-safe collect.
        tbl = spark.table(name)
        rows = tbl.collect()
        if rows:
            last = (rows, tbl.schema)
        if total_in == 0:
            break
        if i == max_restarts:
            # even the confirming start produced rows — the source is
            # genuinely not drained and the snapshot is a partial
            # aggregate. Returning it silently would surface as an
            # opaque hash mismatch in a gate query and as wrong data
            # everywhere else (ADVICE r11 #3).
            raise RuntimeError(
                f"drain_available_now({name!r}) exhausted "
                f"max_restarts={max_restarts} with the source still "
                f"producing rows (last start read {total_in}); raise "
                f"max_restarts or the source's per-batch rate limit"
            )
    if last is None:
        return spark.table(name)  # empty source: empty result, right schema
    return spark.createDataFrame(last[0], last[1])
