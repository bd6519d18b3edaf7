"""Continuously-maintained snapshot: a CDC stream applied to a base
table by per-micro-batch MERGE — the streaming half of
`operators/warehouse.py:merge_upsert` (what Delta/Iceberg call a
streaming MERGE INTO target; here at the engine level with explicit
two-phase publication).

Shape per micro-batch:
1. dedupe the batch to latest-per-key (CDC batches can carry several
   changes for one key; highest (ts, tiebreak) wins — the same
   declarative ``min_by``/``max_by`` aggregate as `exact_dedup`, so
   partial merge applies and a hot key combines map-side);
2. MERGE it into the current snapshot (one key-partitioned full-outer
   join);
3. publish the new snapshot under ``gen-<epoch>/`` and atomically flip
   the ``_CURRENT`` pointer (``os.replace``) — readers always see
   exactly one complete generation (the `kafka_segments` compactor's
   pointer discipline), and a replayed epoch is SKIPPED because its
   generation is already current-or-past (exactly-once, the same
   epoch-keyed idempotence as `operators/datasets.py:export_batch_fn`).

100 TB: the merge is the full-outer join cost per batch — at large
scale you partition the snapshot by key range and rewrite only the
partitions the batch touches (the join pruned by the batch's key set);
the generation-pointer publication is unchanged by that sharding.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POINTER = "_CURRENT"


def read_snapshot(spark, path: str, generation: str | None = None) -> DataFrame:
    """The committed snapshot: resolve the pointer, read one generation.
    ``generation`` reads a RETAINED older generation instead (time
    travel within the `gc_snapshots` keep_last window); a retired or
    unknown name raises rather than silently reading the current one."""
    if generation is None:
        with open(os.path.join(path, _POINTER)) as fh:
            generation = fh.read().strip()
    elif not os.path.isdir(os.path.join(path, generation)):
        raise FileNotFoundError(
            f"generation {generation!r} not retained under {path} "
            "(expired by gc_snapshots or never committed)"
        )
    return spark.read.parquet(os.path.join(path, generation))


def _committed_epoch(path: str) -> int:
    """Generation names carry epoch+1 (so the pre-stream base is
    ``gen-0000000000`` = "committed through epoch −1")."""
    ptr = os.path.join(path, _POINTER)
    if not os.path.exists(ptr):
        return -1
    with open(ptr) as fh:
        return int(fh.read().strip().rsplit("-", 1)[1]) - 1


def cdc_batch_fn(
    path: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    delete_col: str | None = None,
):
    """The exactly-once per-batch CDC apply step (factored out so tests
    can replay it with pinned ``epoch_id``s)."""
    from presto_rakam_kafka_spark.operators.warehouse import merge_upsert

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch = int(epoch_id)
        if epoch <= _committed_epoch(path):
            return  # replayed batch — already folded into the snapshot
        spark = batch_df.sparkSession
        # latest change per key wins inside the batch: min_by on the
        # NEGATED order = max_by(struct, (ts, tiebreak)) with partial
        # aggregation (the exact_dedup r7 lesson: never a window here)
        cols = batch_df.columns
        latest = (
            batch_df.groupBy(key_col)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in cols]),
                    F.struct(F.col(ts_col), F.col(tiebreak_col)),
                ).alias("_s")
            )
            .select("_s.*")
        )
        current = read_snapshot(spark, path)
        merged = merge_upsert(current, latest, key_col, delete_col=delete_col)
        gen = f"gen-{epoch + 1:010d}"
        merged.write.mode("overwrite").parquet(os.path.join(path, gen))
        tmp = os.path.join(path, f".{_POINTER}.tmp")
        with open(tmp, "w") as fh:
            fh.write(gen)
        os.replace(tmp, os.path.join(path, _POINTER))

    return on_batch


def init_snapshot(base: DataFrame, path: str) -> None:
    """Write the base table as ``gen-0000000000`` ("committed through
    epoch −1" — stream epochs are ≥ 0) and point ``_CURRENT`` at it."""
    gen = "gen-0000000000"
    base.write.mode("overwrite").parquet(os.path.join(path, gen))
    tmp = os.path.join(path, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(gen)
    os.replace(tmp, os.path.join(path, _POINTER))


def apply_cdc_stream(
    stream: DataFrame,
    path: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    delete_col: str | None = None,
    checkpoint: str | None = None,
):
    """Wire the batch fn to ``foreachBatch``; callers own trigger and
    termination, and read results via :func:`read_snapshot`."""
    on_batch = cdc_batch_fn(path, key_col, ts_col, tiebreak_col, delete_col)
    writer = stream.writeStream.foreachBatch(on_batch)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def gc_snapshots(path: str, keep_last: int = 2) -> list[str]:
    """Retire superseded snapshot generations, keeping the committed one
    plus ``keep_last − 1`` predecessors (time-travel window). Never
    touches the pointed generation or anything NEWER than it (a newer
    orphan is an in-flight epoch about to commit). A reader mid-scan on
    a retired generation fails loudly and retries against the pointer —
    the same observable-atomicity contract as `compact_segments`.
    Returns the removed generation names."""
    import shutil

    with open(os.path.join(path, _POINTER)) as fh:
        current = fh.read().strip()
    gens = sorted(
        e for e in os.listdir(path)
        if e.startswith("gen-") and os.path.isdir(os.path.join(path, e))
    )
    older = [g for g in gens if g < current]
    keep = max(0, keep_last - 1)
    victims = older[: len(older) - keep] if keep else older
    for g in victims:
        shutil.rmtree(os.path.join(path, g), ignore_errors=True)
    return victims
