"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the 100 TB design brief:

* :func:`cosine_topk` — brute-force exact top-k. The corpus↔query join
  is a broadcast of the (small) query set against the (huge) corpus, so
  the corpus is scanned once, never shuffled, and the top-k per query is
  a ``TakeOrderedAndProject``-style window with a deterministic
  tie-break. Exact baseline + the verifier for the ANN path.
* :func:`lsh_bucket_topk` — random-hyperplane LSH: each vector maps to
  a sign-bit bucket; a query probes its own bucket (optionally
  neighboring buckets within Hamming 1) and ranks only those
  candidates. Corpus side is one projection + one shuffle on the bucket
  id; candidate count per query drops from n to n/2^planes. The
  hyperplanes come from a seeded RNG so the whole pipeline — and its
  DuckDB oracle, generated from the same constants — is deterministic.

All cosine math is the left-fold double form from
:mod:`.dedup` (``cosine_expr``) so both engines agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.functions.hashing import hyperplanes
from presto_rakam_kafka_spark.operators.dedup import cosine_expr, cosine_expr_duckdb

NUM_PLANES = 4  # 16 buckets — sized for the fixture corpus (~500-5k vecs)


def _topk_within(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force, broadcast
    queries). Self-matches are excluded."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb"))
    cos = F.expr(cosine_expr("q_emb", "c_emb"))
    pairs = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    )
    return _topk_within(pairs, k)


def cosine_topk_oracle(
    table: str, query_pred: str, vec_col: str, id_col: str, dim: int, k: int = 5
) -> str:
    cos = cosine_expr_duckdb(f"q.{vec_col}", f"c.{vec_col}", dim)
    return f"""
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT q.{id_col} AS query_id, c.{id_col} AS neighbor_id,
             round({cos}, 6) AS cosine,
             row_number() OVER (PARTITION BY q.{id_col}
                                ORDER BY round({cos}, 6) DESC, c.{id_col}) AS rank
      FROM {table} q JOIN {table} c ON q.{id_col} != c.{id_col}
      WHERE q.{query_pred}
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------
# LSH (random hyperplane) bucketed search — the scale path
# ---------------------------------------------------------------------


def _bucket_expr_spark(vec_col: str, planes: list[list[float]]) -> str:
    bits = []
    for p, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{v}D" for v in plane) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr},"
            f" (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
        )
        bits.append(f"if(({dot}) > 0, {1 << p}, 0)")
    return " + ".join(bits)


def _bucket_expr_duckdb(vec_col: str, planes: list[list[float]]) -> str:
    bits = []
    for p, plane in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        dot = (
            f"list_reduce(list_transform(range(1, {len(plane) + 1}),"
            f" i -> {vec_col}[i]::DOUBLE * ({arr}::DOUBLE[])[i]), (x, y) -> x + y)"
        )
        bits.append(f"CASE WHEN ({dot}) > 0 THEN {1 << p} ELSE 0 END")
    return " + ".join(bits)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 5,
    num_planes: int = NUM_PLANES,
) -> DataFrame:
    """Approximate top-k: rank only candidates sharing the query's LSH
    bucket. Deterministic (seeded hyperplanes) ⇒ oracle-checkable; the
    approximation contract is "exact top-k *within the probed bucket*".
    """
    planes = hyperplanes(num_planes, dim)
    bucket = F.expr(_bucket_expr_spark(vec_col, planes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        bucket.alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_emb"),
            bucket.alias("bucket"),
        )
    )
    cos = F.expr(cosine_expr("q_emb", "c_emb"))
    pairs = (
        c.join(q, on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    )
    return _topk_within(pairs, k)


def lsh_bucket_topk_oracle(
    table: str,
    query_pred: str,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 5,
    num_planes: int = NUM_PLANES,
) -> str:
    planes = hyperplanes(num_planes, dim)
    cos = cosine_expr_duckdb(f"q.{vec_col}", f"c.{vec_col}", dim)
    bucket = _bucket_expr_duckdb(f"{vec_col}", planes)
    return f"""
    WITH b AS (SELECT {id_col}, {vec_col}, ({bucket}) AS bucket FROM {table})
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT q.{id_col} AS query_id, c.{id_col} AS neighbor_id,
             round({cos}, 6) AS cosine,
             row_number() OVER (PARTITION BY q.{id_col}
                                ORDER BY round({cos}, 6) DESC, c.{id_col}) AS rank
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.{id_col} != c.{id_col}
      WHERE q.{query_pred}
    ) WHERE rank <= {k}
    """
