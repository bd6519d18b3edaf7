"""Incremental streaming near-duplicate detection.

Batch MinHash-LSH (:mod:`..operators.dedup`) answers "which pairs in
this frozen corpus are near-dups"; a live ingestion pipeline needs the
*incremental* question — "is this incoming document a near-dup of
anything seen so far" — without re-sketching history per batch. This
module runs that as a ``foreachBatch`` pipeline over an accumulating
signature store:

1. each micro-batch sketches ONLY its own documents (shingles →
   K min-hash signature → banded bucket keys — the exact code paths of
   the batch operator, ``shingle_sets`` / ``_signatures_from_shingles``);
2. candidates = batch×batch band collisions (earlier id flags later)
   ∪ batch×HISTORY band collisions (history is earlier by arrival);
3. candidates verify with exact Jaccard over the stored shingle sets
   (sketches route, shingles decide — same contract as batch LSH);
4. flagged ids land in an epoch-keyed output dir; the batch's buckets
   and shingles append to the epoch-keyed store.

Exactly-once: every write is ``overwrite`` into ``epoch=N`` dirs (the
sinks.py recipe), and history reads filter ``epoch < N``, so a replayed
batch overwrites its own partial output and can never match against
its own previous attempt.

Scale shape (100 TB/day ingest): per batch the work is
O(batch sketch) + O(collisions); history participates only through its
bucket index — (id, band, key) longs, shuffled on uniform keys — and
its shingle sets are joined only for verified candidates. State grows
append-only; the batch operator's compaction norms apply (periodically
collapse epoch dirs; retention drops history older than the dedup
horizon).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.functions.hashing import jaccard_spark
from presto_rakam_kafka_spark.fixtures import staging_mkdtemp
from presto_rakam_kafka_spark.operators.dedup import (
    NUM_BANDS,
    _signatures_from_shingles,
    derived_rows_per_band,
    shingle_sets,
)


def _band_melt(sigs: DataFrame, id_col: str, num_bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, key) — one 8-byte key per band (hash of the band's
    signature rows), same expression shape as the batch operator."""
    band_structs = ", ".join(
        "named_struct('band', {i}, 'key', xxhash64({args}))".format(
            i=i,
            args=", ".join(f"sig[{i * rows_per_band + r}]" for r in range(rows_per_band)),
        )
        for i in range(num_bands)
    )
    return sigs.selectExpr(id_col, f"inline(array({band_structs}))")


def incremental_neardup(
    spark: SparkSession,
    stream_docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_bands: int = NUM_BANDS,
    rows_per_band: int | None = None,
    store_dir: str | None = None,
    out_dir: str | None = None,
) -> DataFrame:
    """Run the incremental pipeline over a (bounded) document stream
    and return the distinct flagged ids as a batch DataFrame.

    Flag semantics: a document is flagged iff some EARLIER document
    (previous micro-batch, or same batch with smaller id) has exact
    word-``n``-gram Jaccard ≥ ``threshold`` among its band-collision
    candidates. This equals the batch MinHash-LSH semantics (band
    collision, then exact-Jaccard verify) — NOT the unconditional
    all-pairs semantics: a pair sitting exactly at the threshold only
    band-collides with the S-curve probability (~50% at the derived
    geometry's midpoint), so equality to the all-pairs oracle is
    probabilistic by construction, exactly as for the batch
    ``minhash_lsh_pairs`` operator. The fixture's near-duplicates are
    far above the threshold (J ≈ 0.9+), where the per-pair miss
    probability is ≤ ~4e-4, which is why the gate replays the simpler
    all-pairs oracle (same stance, and same residual risk, as the
    ``dedup_minhash_lsh`` gate)."""
    if rows_per_band is None:
        rows_per_band = derived_rows_per_band(threshold, num_bands)
    num_hashes = num_bands * rows_per_band
    store = store_dir or staging_mkdtemp("neardup_store_")
    out = out_dir or staging_mkdtemp("neardup_out_")
    buckets_dir = os.path.join(store, "buckets")
    shingles_dir = os.path.join(store, "shingles")
    jac = jaccard_spark("sh_flag", "sh_partner")

    def _epochs_before(path: str, epoch_id: int) -> list[str]:
        if not os.path.isdir(path):
            return []
        return [
            os.path.join(path, d)
            for d in os.listdir(path)
            if d.startswith("epoch=") and int(d.split("=", 1)[1]) < epoch_id
        ]

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sh = shingle_sets(batch_df, text_col, id_col, n)
        sigs = _signatures_from_shingles(sh, id_col, num_hashes)
        melted = _band_melt(sigs, id_col, num_bands, rows_per_band)
        ver = sh.persist()

        # within-batch: earlier (smaller) id flags the later one
        left = melted.select(F.col(id_col).alias("partner_id"), "band", "key")
        right = melted.select(F.col(id_col).alias("flag_id"), "band", "key")
        intra = (
            left.join(right, ["band", "key"])
            .filter(F.col("partner_id") < F.col("flag_id"))
            .select("flag_id", "partner_id")
        )

        # vs history: any stored doc is earlier by arrival
        hist_bucket_dirs = _epochs_before(buckets_dir, epoch_id)
        cands = intra
        if hist_bucket_dirs:
            hist = spark.read.parquet(*hist_bucket_dirs).select(
                F.col(id_col).alias("partner_id"), "band", "key"
            )
            cross = hist.join(right, ["band", "key"]).select("flag_id", "partner_id")
            cands = intra.unionByName(cross)
        cands = cands.distinct()

        # verify with exact Jaccard over shingle sets
        flag_sh = ver.selectExpr(f"{id_col} AS flag_id", "shingles AS sh_flag")
        batch_partner_sh = ver.selectExpr(
            f"{id_col} AS partner_id", "shingles AS sh_partner"
        )
        hist_sh_dirs = _epochs_before(shingles_dir, epoch_id)
        partner_sh = batch_partner_sh
        if hist_sh_dirs:
            partner_sh = batch_partner_sh.unionByName(
                spark.read.parquet(*hist_sh_dirs).selectExpr(
                    f"{id_col} AS partner_id", "shingles AS sh_partner"
                )
            )
        flagged = (
            cands.join(flag_sh, "flag_id")
            .join(partner_sh, "partner_id")
            .filter(F.expr(jac) >= threshold)
            .select(F.col("flag_id").alias(id_col))
            .distinct()
        )

        # epoch-keyed idempotent writes: output, then state append
        flagged.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")
        melted.write.mode("overwrite").parquet(f"{buckets_dir}/epoch={epoch_id}")
        ver.write.mode("overwrite").parquet(f"{shingles_dir}/epoch={epoch_id}")
        ver.unpersist()

    ckpt = staging_mkdtemp("ckpt_neardup_")
    q = (
        stream_docs.writeStream.foreachBatch(process)
        .queryName("neardup_incremental")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).select(id_col).distinct()


def incremental_neardup_oracle(
    table: str, text_col: str, id_col: str, n: int = 3, threshold: float = 0.8
) -> str:
    """Batch ALL-PAIRS twin of the incremental flag semantics: flag b
    iff some a < b has exact n-gram Jaccard ≥ threshold. The streaming
    path additionally requires an LSH band collision before verifying,
    so this oracle is an equality only up to LSH recall — acceptable
    because every fixture near-dup pair sits far above the threshold
    (see :func:`incremental_neardup`); a corpus engineered at the
    threshold would need a banding-replay oracle instead."""
    from presto_rakam_kafka_spark.functions.hashing import jaccard_duckdb, shingles_duckdb

    jac = jaccard_duckdb("a.sh", "b.sh")
    return f"""
    WITH sh AS (
      SELECT {id_col}, {shingles_duckdb(text_col, n)} AS sh FROM {table})
    SELECT DISTINCT b.{id_col}
    FROM sh a JOIN sh b ON a.{id_col} < b.{id_col}
    WHERE {jac} >= {threshold}
    """
