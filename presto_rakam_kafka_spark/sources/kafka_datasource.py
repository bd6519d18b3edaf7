"""Kafka-log-shaped Python DataSource — the reference's split planner as
a first-class Spark (DSv2/Python) source.

``spark.read.format("kafka_segments")`` over a directory laid out like a
Kafka log::

    <path>/partition=<id>/segment-<first_offset>.parquet

Each segment parquet holds contiguous raw frames (``partition, offset,
key, value, topic, timestamp``). The reader re-implements, natively in
Spark's source API, the three planner behaviors the reference implements
in ``KafkaSplitManager``:

* **Partition discovery (A3)** — partitions are enumerated from the log
  directory; an empty/malformed layout **raises**
  (mirrors this engine's strict `KafkaEventSource._discover_partitions`;
  the reference enumerates broker metadata,
  ``KafkaSplitManager.java:84-138``).
* **Per-segment splits (A2)** — one :class:`InputPartition` per segment
  file (the reference: one split per log segment so "a topic can be
  processed by more workers than partitions", ``KafkaSplit.java:28-34``),
  optionally subdivided to satisfy ``minSplits`` using the segment's
  offset span (the analog of Spark-Kafka's ``minPartitions``).
* **Offset pushdown (A4)** — Catalyst hands ``offset`` conjuncts to
  :meth:`KafkaSegmentReader.pushFilters`; consumed bounds clamp every
  split's range and *prune whole segments* via parquet min/max offset
  stats, before any executor starts (``KafkaSplitManager.java:153-178``).
  Non-offset filters are returned to Spark and evaluated post-scan.

Scale notes: ``partitions()`` runs driver-side and reads only directory
listings + one parquet footer per segment (the same metadata a Kafka
admin-client offset lookup costs the reference). ``read()`` streams
Arrow record batches — zero row-at-a-time Python. At 100 TB the split
count is segments × ceil(span/rows-per-split): scheduling granularity is
controlled by the log layout, not by file count heuristics.
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RAW_FRAME_SCHEMA = StructType(
    [
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("timestamp", TimestampType()),
    ]
)

_PARTITION_DIR = re.compile(r"^partition=(\d+)$")
_SEGMENT_FILE = re.compile(r"^segment-(\d+)\.parquet$")


def _arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("partition", pa.int32()),
            pa.field("offset", pa.int64()),
            pa.field("key", pa.binary()),
            pa.field("value", pa.binary()),
            pa.field("topic", pa.string()),
            pa.field("timestamp", pa.timestamp("us")),
        ]
    )


class KafkaLogLayoutError(Exception):
    """The log directory has no ``partition=N`` dirs / no segments —
    scanning it silently as empty would be the under-scan failure mode
    the strict A3 discovery exists to prevent."""


@dataclass(frozen=True)
class OffsetSplit(InputPartition):
    """One scan task: a segment file clamped to [start, end)."""

    path: str
    partition_id: int
    start: int  # inclusive
    end: int  # exclusive


class KafkaSegmentDataSource(DataSource):
    """Register with ``spark.dataSource.register(KafkaSegmentDataSource)``
    then ``spark.read.format("kafka_segments").option("path", dir)``.

    Options: ``path`` (required), ``minSplits`` (A2 sub-segment
    parallelism floor, default 0 = one split per segment).
    """

    @classmethod
    def name(cls) -> str:
        return "kafka_segments"

    def schema(self) -> StructType:
        return RAW_FRAME_SCHEMA

    def reader(self, schema: StructType) -> "KafkaSegmentReader":
        return KafkaSegmentReader(dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> "KafkaSegmentStreamReader":
        return KafkaSegmentStreamReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> "KafkaSegmentWriter":
        return KafkaSegmentWriter(dict(self.options), overwrite)


class KafkaSegmentReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise KafkaLogLayoutError("kafka_segments requires option 'path'")
        self._path = path
        self._min_splits = int(options.get("minsplits", options.get("minSplits", 0)))
        # offset bounds accumulated from pushed filters; None = unbounded
        self._start: int | None = None  # inclusive
        self._end: int | None = None  # exclusive

    # -- A4: offset conjuncts clamp the scan; everything else returns --
    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        remaining: list[Filter] = []
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("offset",) or col == ["offset"] or col == "offset":
                col = ("offset",)
            if col != ("offset",):
                remaining.append(f)
                continue
            if isinstance(f, GreaterThanOrEqual):
                self._clamp_start(f.value)
            elif isinstance(f, GreaterThan):
                self._clamp_start(f.value + 1)
            elif isinstance(f, LessThan):
                self._clamp_end(f.value)
            elif isinstance(f, LessThanOrEqual):
                self._clamp_end(f.value + 1)
            elif isinstance(f, EqualTo):
                self._clamp_start(f.value)
                self._clamp_end(f.value + 1)
            else:
                remaining.append(f)
        return remaining

    def _clamp_start(self, v: int) -> None:
        self._start = v if self._start is None else max(self._start, v)

    def _clamp_end(self, v: int) -> None:
        self._end = v if self._end is None else min(self._end, v)

    # -- A2/A3: segment enumeration → splits ---------------------------
    def partitions(self) -> list[OffsetSplit]:
        import pyarrow.parquet as pq

        part_dirs: list[tuple[int, str]] = []
        try:
            entries = os.listdir(self._path)
        except OSError as exc:
            raise KafkaLogLayoutError(f"cannot list log dir {self._path}") from exc
        for e in entries:
            m = _PARTITION_DIR.match(e)
            if m:
                part_dirs.append((int(m.group(1)), os.path.join(self._path, e)))
        if not part_dirs:
            raise KafkaLogLayoutError(
                f"no partition=N directories under {self._path} — refusing to "
                "scan an empty/foreign layout as zero rows (A3 strictness)"
            )

        segments: list[tuple[int, str, int, int]] = []  # (pid, file, lo, hi+1)
        for pid, pdir in sorted(part_dirs):
            for fname in sorted(os.listdir(pdir)):
                if not _SEGMENT_FILE.match(fname):
                    continue
                fpath = os.path.join(pdir, fname)
                # Parquet footer stats give the segment's offset span —
                # the planner's analog of a segment index lookup. One
                # footer read per segment, driver-side only.
                meta = pq.read_metadata(fpath)
                idx = meta.schema.to_arrow_schema().get_field_index("offset")
                lo, hi = None, None
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(idx).statistics
                    if st is None:  # no stats → conservative full span
                        lo, hi = None, None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is None:
                    segments.append((pid, fpath, 0, 2**62))
                else:
                    segments.append((pid, fpath, int(lo), int(hi) + 1))

        if not segments:
            raise KafkaLogLayoutError(f"no segment files under {self._path}")

        # Clamp by pushed offset bounds; prune non-overlapping segments.
        clamped: list[tuple[int, str, int, int]] = []
        for pid, fpath, lo, hi in segments:
            if self._start is not None:
                lo = max(lo, self._start)
            if self._end is not None:
                hi = min(hi, self._end)
            if lo < hi:
                clamped.append((pid, fpath, lo, hi))
        if not clamped:
            # Fully pruned scan still needs ≥1 (empty) split.
            pid, fpath, _, _ = segments[0]
            return [OffsetSplit(fpath, pid, 0, 0)]

        # A2: subdivide segment offset spans until the split count
        # reaches minSplits (the reference's more-workers-than-partitions
        # property; Spark-Kafka's minPartitions).
        per_split = 0
        if self._min_splits > len(clamped):
            total_span = sum(hi - lo for _, _, lo, hi in clamped)
            per_split = max(1, math.ceil(total_span / self._min_splits))
        splits: list[OffsetSplit] = []
        for pid, fpath, lo, hi in clamped:
            if per_split and hi - lo > per_split:
                for s in range(lo, hi, per_split):
                    splits.append(OffsetSplit(fpath, pid, s, min(s + per_split, hi)))
            else:
                splits.append(OffsetSplit(fpath, pid, lo, hi))
        return splits

    # -- executor-side scan: Arrow batches, no per-row Python ----------
    def read(self, partition: OffsetSplit):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if partition.start >= partition.end:
            return
        table = pq.read_table(partition.path)
        mask = pc.and_(
            pc.greater_equal(table["offset"], partition.start),
            pc.less(table["offset"], partition.end),
        )
        table = table.filter(mask)
        # Align column order AND arrow types with the declared schema
        # (Spark's Arrow bridge rejects e.g. ns timestamps).
        table = table.select([f.name for f in RAW_FRAME_SCHEMA.fields]).cast(
            _arrow_schema()
        )
        yield from table.to_batches()


@dataclass(frozen=True)
class _StagedFiles(WriterCommitMessage):
    """One task's staged segment files: [(staged_path, partition_id,
    first_offset), …]."""

    files: tuple  # of (str, int, int)


class KafkaSegmentWriter(DataSourceWriter):
    """Producer/sink analog (A15): ``df.write.format("kafka_segments")``
    appends a DataFrame of raw frames to a segment log with a TWO-PHASE
    publish — tasks stage parquet segments under ``.staging-<job>/``,
    the driver's :meth:`commit` renames them into ``partition=N/`` in
    one pass, and :meth:`abort` discards the staging dir. A failed or
    speculative task can never leave a half-visible segment, which is
    the reference's missing sink made exactly-once (same guarantee as
    ``streaming/sinks.py`` foreachBatch, here as a native source API).

    Frames route to partitions by ``pmod(offset, numPartitions)`` (the
    keyed-producer fixture convention of :func:`write_segments`).
    Offsets are producer-supplied and globally unique, so
    ``segment-<first_offset>`` names cannot collide across tasks.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        import uuid

        path = options.get("path")
        if not path:
            raise KafkaLogLayoutError("kafka_segments requires option 'path'")
        self._path = path
        self._num_partitions = int(
            options.get("numpartitions", options.get("numPartitions", 2))
        )
        self._topic = options.get("topic", "tpch_events")
        self._overwrite = overwrite
        self._staging = os.path.join(self._path, f".staging-{uuid.uuid4().hex[:12]}")

    def write(self, iterator) -> _StagedFiles:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows_by_pid: dict[int, list] = {}
        for row in iterator:
            d = row.asDict()
            pid = int(d["offset"]) % self._num_partitions
            rows_by_pid.setdefault(pid, []).append(d)
        os.makedirs(self._staging, exist_ok=True)
        task_tag = uuid.uuid4().hex[:8]
        staged = []
        for pid, rows in rows_by_pid.items():
            rows.sort(key=lambda d: d["offset"])
            first = int(rows[0]["offset"])
            cols = {
                "partition": [pid] * len(rows),
                "offset": [int(d["offset"]) for d in rows],
                "key": [d.get("key") for d in rows],
                "value": [d.get("value") for d in rows],
                "topic": [d.get("topic") or self._topic for d in rows],
                "timestamp": [d.get("timestamp") for d in rows],
            }
            table = pa.Table.from_pydict(cols).cast(_arrow_schema())
            fpath = os.path.join(self._staging, f"{task_tag}-{pid}-{first}.parquet")
            pq.write_table(table, fpath)
            staged.append((fpath, pid, first))
        return _StagedFiles(files=tuple(staged))

    def commit(self, messages) -> None:
        import shutil

        if self._overwrite:
            for e in os.listdir(self._path):
                if _PARTITION_DIR.match(e):
                    shutil.rmtree(os.path.join(self._path, e))
        for msg in messages:
            if msg is None:
                continue
            for fpath, pid, first in msg.files:
                pdir = os.path.join(self._path, f"partition={pid}")
                os.makedirs(pdir, exist_ok=True)
                os.replace(fpath, os.path.join(pdir, f"segment-{first}.parquet"))
        shutil.rmtree(self._staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._staging, ignore_errors=True)


class KafkaSegmentStreamReader(SimpleDataSourceStreamReader):
    """Incremental consumption over a growing segment log — the Kafka
    consumer model as a native Spark streaming source.

    Streaming offsets are per-partition next-offset maps
    (``{"0": 500, "1": 512}``), exactly Kafka's consumer-position model:
    :meth:`read` scans each partition from its position to the current
    log end and advances the map; :meth:`readBetweenOffsets` replays a
    committed range deterministically for failure recovery (the replay
    contract Kafka's seekable log provides the reference's engine);
    :meth:`commit` is a no-op because retention is the log's concern,
    not the consumer's.

    Options: ``path`` (required); ``startingOffsets`` = ``earliest``
    (default) | ``latest`` — the same knob as the batch scan's
    earliest/latest sentinels (``KafkaSplitManager.java:163-167``).
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise KafkaLogLayoutError("kafka_segments requires option 'path'")
        self._path = path
        start = options.get(
            "startingoffsets", options.get("startingOffsets", "earliest")
        ).lower()
        if start not in ("earliest", "latest"):
            raise ValueError(f"startingOffsets must be earliest|latest, got {start}")
        self._starting = start
        # A8: size-bounded micro-batches — the analog of the Kafka
        # source's maxOffsetsPerTrigger (and of the reference's
        # KAFKA_MAX_FETCH_SIZE batch bounding). 0 = unbounded.
        self._max_rows = int(
            options.get("maxrowsperbatch", options.get("maxRowsPerBatch", 0))
        )

    # -- log introspection (driver-side, metadata only) ----------------
    def _segments(self) -> dict[int, list[tuple[str, int, int]]]:
        """{partition_id: [(file, lo, hi_exclusive), …]} from footer stats."""
        import pyarrow.parquet as pq

        out: dict[int, list[tuple[str, int, int]]] = {}
        try:
            entries = os.listdir(self._path)
        except OSError as exc:
            raise KafkaLogLayoutError(f"cannot list log dir {self._path}") from exc
        for e in entries:
            m = _PARTITION_DIR.match(e)
            if not m:
                continue
            pid = int(m.group(1))
            pdir = os.path.join(self._path, e)
            segs = []
            for fname in sorted(os.listdir(pdir)):
                if not _SEGMENT_FILE.match(fname):
                    continue
                fpath = os.path.join(pdir, fname)
                meta = pq.read_metadata(fpath)
                idx = meta.schema.to_arrow_schema().get_field_index("offset")
                lo = min(
                    meta.row_group(rg).column(idx).statistics.min
                    for rg in range(meta.num_row_groups)
                )
                hi = max(
                    meta.row_group(rg).column(idx).statistics.max
                    for rg in range(meta.num_row_groups)
                )
                segs.append((fpath, int(lo), int(hi) + 1))
            out[pid] = segs
        if not out:
            raise KafkaLogLayoutError(
                f"no partition=N directories under {self._path} (A3 strictness)"
            )
        return out

    def initialOffset(self) -> dict:
        segs = self._segments()
        if self._starting == "latest":
            return {
                str(pid): max((hi for _, _, hi in s), default=0)
                for pid, s in segs.items()
            }
        return {
            str(pid): min((lo for _, lo, _ in s), default=0)
            for pid, s in segs.items()
        }

    def _rows_between(self, start: dict, end: dict):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for pid, segs in sorted(self._segments().items()):
            lo = int(start.get(str(pid), 0))
            hi = end.get(str(pid))
            hi = int(hi) if hi is not None else None
            for fpath, slo, shi in segs:
                if shi <= lo or (hi is not None and slo >= hi):
                    continue  # segment outside the consumed range
                table = pq.read_table(fpath)
                mask = pc.greater_equal(table["offset"], lo)
                if hi is not None:
                    mask = pc.and_(mask, pc.less(table["offset"], hi))
                table = table.filter(mask).select(
                    [f.name for f in RAW_FRAME_SCHEMA.fields]
                )
                yield from (tuple(r.values()) for r in table.to_pylist())

    def read(self, start: dict):
        segs = self._segments()
        end = {
            str(pid): max(
                (hi for _, _, hi in s), default=int(start.get(str(pid), 0))
            )
            for pid, s in segs.items()
        }
        # partitions may appear mid-stream; keep any position the log no
        # longer covers (retention) so the offset map only moves forward
        for k, v in start.items():
            end[k] = max(int(end.get(k, 0)), int(v))
        if self._max_rows > 0:
            # Bound the batch by offset SPAN, split evenly across the
            # partitions that have lag (offsets are dense in the fixture
            # log, so span ≈ rows; a sparse log just under-fills — the
            # safe direction). Remaining lag arrives in later batches.
            lagging = [
                k for k in end if int(end[k]) > int(start.get(k, 0))
            ]
            if lagging:
                per_part = max(1, self._max_rows // len(lagging))
                for k in lagging:
                    end[k] = min(int(end[k]), int(start.get(k, 0)) + per_part)
        # iter(list(...)), deliberately: the simple-reader harness both
        # PICKLES the prefetched batch (a generator can't pickle) and
        # calls next() on it in its prefetch cache (a bare list isn't an
        # iterator) — a list_iterator satisfies both. The driver-side
        # prefetch hop is the documented trade of
        # SimpleDataSourceStreamReader; a partition-parallel
        # DataSourceStreamReader is the upgrade path if per-batch volume
        # ever warrants it.
        return iter(list(self._rows_between(start, end))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows_between(start, end)))

    def commit(self, end: dict) -> None:
        pass  # retention is the log's concern (Kafka model)


def compact_segments(
    path: str,
    target_rows: int = 100_000,
    partitions: list[int] | None = None,
) -> dict[int, tuple[int, int]]:
    """Compact each partition's many small segments into few
    ``target_rows``-sized ones — the small-files answer for a log that
    accumulated tiny producer batches (at 100 TB, scan parallelism
    should come from ``minSplits`` sub-ranges of big segments, not from
    thousands of tiny files each costing a footer read + task).

    Offsets, frame bytes, and ordering are preserved exactly; only the
    file boundaries change. Publication is two-phase like
    :class:`KafkaSegmentWriter`: new segments are staged, then one
    rename pass swaps them in and removes the old files, so a reader
    planning concurrently sees either the old or the new layout, never
    a mix of halves. Returns {partition_id: (files_before, files_after)}.
    """
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    report: dict[int, tuple[int, int]] = {}
    staging = os.path.join(path, f".staging-compact-{uuid.uuid4().hex[:12]}")
    try:
        entries = os.listdir(path)
    except OSError as exc:
        raise KafkaLogLayoutError(f"cannot list log dir {path}") from exc
    for e in sorted(entries):
        m = _PARTITION_DIR.match(e)
        if not m:
            continue
        pid = int(m.group(1))
        if partitions is not None and pid not in partitions:
            continue
        pdir = os.path.join(path, e)
        old_files = sorted(
            f for f in os.listdir(pdir) if _SEGMENT_FILE.match(f)
        )
        if len(old_files) <= 1:
            report[pid] = (len(old_files), len(old_files))
            continue
        table = pa.concat_tables(
            [pq.read_table(os.path.join(pdir, f)) for f in old_files]
        ).sort_by("offset")
        os.makedirs(staging, exist_ok=True)
        staged = []
        for start in range(0, table.num_rows, target_rows):
            chunk = table.slice(start, target_rows)
            first = chunk["offset"][0].as_py()
            fpath = os.path.join(staging, f"{pid}-{first}.parquet")
            pq.write_table(chunk, fpath)
            staged.append((fpath, first))
        # publish: new files in, old files out (rename is atomic per
        # file; a concurrent planner sees a consistent superset/subset,
        # and offsets never duplicate across old/new within one read
        # because the swap below removes old files first per partition)
        for f in old_files:
            os.remove(os.path.join(pdir, f))
        for fpath, first in staged:
            os.replace(fpath, os.path.join(pdir, f"segment-{first}.parquet"))
        report[pid] = (len(old_files), len(staged))
    shutil.rmtree(staging, ignore_errors=True)
    return report


def write_segments(
    df,
    path: str,
    num_partitions: int = 2,
    segment_rows: int = 0,
    topic: str = "tpch_events",
) -> None:
    """Lay a raw-frame DataFrame (offset long, key/value binary, …) out
    as a ``partition=N/segment-<first>.parquet`` log under ``path``.

    Frames are routed to partitions by ``pmod(offset, num_partitions)``
    and offsets stay globally unique (the fixture analog of a keyed
    producer). ``segment_rows`` > 0 rolls segments like a size-bounded
    log; 0 writes one segment per partition. Test/fixture helper —
    production logs are written by Kafka itself.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = df.toPandas()
    os.makedirs(path, exist_ok=True)
    for pid in range(num_partitions):
        sub = pdf[pdf["offset"] % num_partitions == pid].sort_values("offset")
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
            chunk = chunk.assign(
                partition=pid, topic=topic
            )[[f.name for f in RAW_FRAME_SCHEMA.fields]]
            table = pa.Table.from_pandas(chunk, preserve_index=False).cast(
                _arrow_schema()
            )
            pq.write_table(table, os.path.join(pdir, f"segment-{first}.parquet"))
