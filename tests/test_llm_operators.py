"""Operator-level contracts for the LLM-pipeline operators (the
oracle equivalence itself is covered by test_queries_vs_oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.fixtures import read_table
from presto_rakam_kafka_spark.operators import dedup, multimodal, similarity


def test_exact_dedup_idempotent(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    once = dedup.exact_dedup(docs, "text", "doc_id")
    twice = dedup.exact_dedup(once, "text", "doc_id")
    assert once.count() == twice.count()
    # survivors are distinct by content
    assert once.count() == once.select(F.md5("text")).distinct().count()


def test_minhash_lsh_no_false_positives_and_recall(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.8).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.8).collect()
    }
    # exact verification ⇒ zero false positives; banding at these params
    # ⇒ full recall on this corpus
    assert lsh == exact


def test_simhash_banding_finds_all_close_pairs(spark, sf_dir):
    """Pigeonhole guarantee: banded join ≡ brute force at Hamming ≤ k."""
    docs = read_table(spark, sf_dir, "documents")
    sigs = dedup.simhash_signatures(docs, "text", "doc_id")
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(F.expr("bit_count(sh_a ^ sh_b)") <= 3)
        .collect()
    }
    banded = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_pairs(docs, "text", "doc_id", max_hamming=3).collect()
    }
    assert banded == brute


def test_simhash_stable_across_partitioning(spark, sf_dir):
    """Signature is a pure per-row function — repartitioning must not
    change it (guards against order-dependent accumulation bugs)."""
    docs = read_table(spark, sf_dir, "documents")
    one = dict(dedup.simhash_signatures(docs, "text", "doc_id").collect())
    many = dict(
        dedup.simhash_signatures(docs.repartition(13), "text", "doc_id").collect()
    )
    assert one == many


def test_lsh_topk_subset_of_bucket(spark, sf_dir):
    """ANN contract: every LSH neighbor shares the query's bucket and
    ranks are 1..k dense per query."""
    emb = read_table(spark, sf_dir, "embeddings")
    res = similarity.lsh_bucket_topk(
        emb, emb.filter("vec_id % 100 = 0"), "embedding", "vec_id", dim=64, k=5
    ).collect()
    by_q: dict[int, list[int]] = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_payload(b"\x00", "image/png")


def test_multimodal_feature_schema_and_partitioning(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    assets = multimodal.attach_payload(docs, "text", "doc_id")
    feats = multimodal.extract_features(assets.repartition(7))
    assert feats.schema == multimodal.FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all((not r.decoded) and r.feature_dim == multimodal.STUB_FEATURE_DIM for r in rows)
