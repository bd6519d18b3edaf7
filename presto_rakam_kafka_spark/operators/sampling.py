"""Deterministic hash-based sampling and dataset splitting.

The sampling ops a training-data pipeline actually needs are
*reproducible*: the same row lands in the same sample/split on every
run, on any cluster layout, after any repartition — which rules out
``TABLESAMPLE``/``rand()``. Hashing a stable key instead gives:

* no shuffle, no state — a partition-local filter/projection that
  pipelines with the scan;
* set-stable membership under re-runs and retries (a task retry must
  not change the training set);
* composable stratification — the hash is uniform per key, so the
  sample preserves any distribution not correlated with the key.

The hash is the engine-portable md5 base hash
(:mod:`..functions.hashing`), so every operator here is
oracle-checkable bit-for-bit in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.functions.hashing import (
    base_hash_duckdb,
    base_hash_spark,
)

#: Split-fraction boundaries in percent: [0,90) train, [90,95) val,
#: [95,100) test.
SPLIT_BOUNDS = (("train", 90), ("val", 95), ("test", 100))


def _bucket_spark(key_col: str) -> str:
    return f"pmod({base_hash_spark(f'cast({key_col} as string)')}, 100)"


def _bucket_duckdb(key_col: str) -> str:
    # DuckDB % keeps the dividend's sign; the base hash is non-negative
    # (60-bit), so plain % equals pmod here.
    return f"({base_hash_duckdb(f'CAST({key_col} AS VARCHAR)')} % 100)"


def hash_sample(df: DataFrame, key_col: str, pct: int) -> DataFrame:
    """Keep ~``pct``% of rows, deterministically by key hash."""
    return df.filter(F.expr(f"{_bucket_spark(key_col)} < {pct}"))


def hash_sample_oracle(table: str, key_col: str, pct: int, select: str = "*") -> str:
    return f"SELECT {select} FROM {table} WHERE {_bucket_duckdb(key_col)} < {pct}"


def assign_split(df: DataFrame, key_col: str) -> DataFrame:
    """Attach a ``split`` column (train/val/test) by key hash."""
    b = _bucket_spark(key_col)
    expr = "CASE "
    for name, hi in SPLIT_BOUNDS:
        expr += f"WHEN {b} < {hi} THEN '{name}' "
    expr += "END"
    return df.withColumn("split", F.expr(expr))


def assign_split_oracle_case(key_col: str) -> str:
    b = _bucket_duckdb(key_col)
    expr = "CASE "
    for name, hi in SPLIT_BOUNDS:
        expr += f"WHEN {b} < {hi} THEN '{name}' "
    expr += "END"
    return expr
