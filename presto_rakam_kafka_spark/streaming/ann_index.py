"""Streaming ANN index maintenance: each micro-batch of new vectors is
coded against the frozen IVF-PQ geometry and upserted into the
persisted incremental index — the continuous-ingestion counterpart of
`operators/similarity.py`'s `upsert_ivfpq_index` (VERDICT r5 next-6).

Shape: ``foreachBatch`` → one coded projection + one list-partitioned
delta write + one atomic ``_CURRENT`` manifest flip per micro-batch.
Probes running concurrently see a consistent snapshot (the manifest
read is atomic). Exactly-once: deltas are NAMED BY EPOCH
(``epoch-<id>``) — a crash between the delta write and the flip leaves
an orphan directory invisible to every reader, and the restarted batch
overwrites that same directory and commits once; a replay AFTER the
flip finds its epoch delta already live and does nothing. Either way
the same vectors are never indexed twice — the same two-phase
discipline as the `kafka_segments` writer
(`sources/kafka_datasource.py:compact_segments`).

State: NONE in the streaming engine — the index itself is the state,
on disk, shared with batch readers. At 100 TB each micro-batch's cost
is proportional to the batch (code + write), never to the index; delta
count grows with trigger count, so production compacts periodically by
re-initializing from the unioned index (documented on
`upsert_ivfpq_index`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from presto_rakam_kafka_spark.operators.similarity import (
    NUM_CENTROIDS,
    PQ_KSUB,
    PQ_M,
    upsert_ivfpq_index,
)


def index_stream(
    stream: DataFrame,
    path: str,
    vec_col: str,
    id_col: str,
    dim: int,
    num_centroids: int = NUM_CENTROIDS,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    checkpoint: str | None = None,
    app_id: str = "default",
):
    """Start a query that upserts every micro-batch into the
    incremental IVF-PQ index at ``path`` (which must already be
    initialized via ``init_ivfpq_index``). Returns the streaming query;
    callers own trigger/termination. Give each checkpoint lineage its
    own ``app_id``: delta names carry it, so a stream restarted with a
    fresh checkpoint (epochs back at 0) indexes under new delta names
    instead of colliding with — and being swallowed by — the previous
    run's ``epoch-0`` delta (the txnAppId discipline used by
    `operators/datasets.py` and `streaming/cdc.py`)."""

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # (app, epoch)-named delta = exactly-once per writer: a replayed
        # batch (retry after the manifest flip) finds its delta already
        # live and the upsert is a no-op, instead of allocating a fresh
        # delta id and double-indexing the same vectors (duplicate
        # entries would displace genuine neighbors in top-k probes).
        tag = (
            f"epoch-{int(epoch_id):08d}"
            if app_id == "default"
            else f"epoch-{app_id}-{int(epoch_id):08d}"
        )
        upsert_ivfpq_index(
            batch_df.sparkSession,
            batch_df,
            path,
            vec_col,
            id_col,
            dim,
            num_centroids=num_centroids,
            m=m,
            ksub=ksub,
            delta_name=tag,
        )

    writer = stream.writeStream.foreachBatch(on_batch)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
