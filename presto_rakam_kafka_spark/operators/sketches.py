"""Count-min sketch heavy hitters — a from-scratch sketch operator.

The reference's host engine ships approx_distinct (HLL) and
approx_percentile (q-digest); Spark covers those natively
(``approx_count_distinct`` / ``percentile_approx``, both gate-covered).
Count-min is the third classic stream sketch — frequency estimation in
d×w counters with a one-sided error guarantee (est ≥ true;
est ≤ true + εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉) —
and neither engine ships it, so this module builds it from the same
engine-portable seeded hash family the MinHash operators use
(:mod:`..functions.hashing`), making the whole sketch replayable in
DuckDB for the correctness gate.

Scale shape (100 TB): the sketch build is one groupBy over (row, d)
fan-out — d·w counters total regardless of input size, so the sketch
table is tiny (d×w rows) and BROADCASTS back for estimation; the only
full shuffle is the d-way fan-out aggregation on uniform bucket keys.
The exact join in :func:`cms_heavy_hitters` exists to report the
estimate/exact pair; a production pipeline keeps just the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.functions.hashing import (
    HASH_P,
    base_hash_duckdb,
    base_hash_spark,
    minhash_coefficients,
)

#: Sketch geometry: d=4 rows (δ ≈ 1.8%), w=512 buckets (ε ≈ 0.53% —
#: εN ≈ a dozen counts at fixture scale, so top-k by estimate is
#: meaningful; still only d·w = 2048 counters at ANY input size).
CMS_D = 4
CMS_W = 512
_CMS_SEED = 271828


def _coeffs(d: int) -> tuple[list[int], list[int]]:
    return minhash_coefficients(d, seed=_CMS_SEED)


def _bucket_spark(key_col: str, i: int, a: int, b: int, w: int) -> str:
    # hash the STRING rendering of the key so Spark md5(binary) and
    # DuckDB md5(varchar) see identical bytes for any key type
    h = base_hash_spark(f"cast({key_col} as string)")
    return f"(({a}L * ({h} % {HASH_P}) + {b}L) % {HASH_P}) % {w}"


def _bucket_duckdb(key_col: str, i: int, a: int, b: int, w: int) -> str:
    h = base_hash_duckdb(f"CAST({key_col} AS VARCHAR)")
    return f"(({a} * ({h} % {HASH_P}) + {b}) % {HASH_P}) % {w}"


def cms_heavy_hitters(
    df: DataFrame, key_col: str, k: int = 10, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Top-k keys by count-min-estimated frequency, with the exact
    count alongside (est ≥ exact always — the CMS one-sided bound,
    property-tested). Deterministic order: (est desc, key asc).

    Plan: one inline() fan-out → (i, bucket) groupBy builds the d×w
    sketch; the sketch broadcasts back onto the distinct keys; min over
    the d probed counters is the estimate."""
    A, B = _coeffs(d)
    key = key_col
    probe_structs = ", ".join(
        f"named_struct('i', {i}, 'bucket', {_bucket_spark(key, i, A[i], B[i], w)})"
        for i in range(d)
    )
    rows = df.selectExpr(f"{key}", f"inline(array({probe_structs}))")
    sketch = rows.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    exact = df.groupBy(key).agg(F.count(F.lit(1)).alias("exact"))
    probes = exact.selectExpr(key, "exact", f"inline(array({probe_structs}))")
    est = (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy(key, "exact")
        .agg(F.min("cnt").cast("long").alias("est"))
    )
    win = Window.orderBy(F.desc("est"), F.asc(key))
    return (
        est.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(key, "est", "exact", "rank")
    )


def cms_heavy_hitters_oracle(
    table: str, key_col: str, k: int = 10, d: int = CMS_D, w: int = CMS_W
) -> str:
    A, B = _coeffs(d)
    key = key_col

    def case_for(col_ref: str) -> str:
        return (
            "CASE i "
            + " ".join(
                f"WHEN {i} THEN {_bucket_duckdb(col_ref, i, A[i], B[i], w)}"
                for i in range(d)
            )
            + " END"
        )
    return f"""
    WITH probes AS (
      SELECT {key}, i, {case_for(key)} AS bucket
      FROM {table}, range({d}) r(i)),
    sketch AS (
      SELECT i, bucket, count(*) AS cnt FROM probes GROUP BY i, bucket),
    exact AS (
      SELECT {key}, count(*) AS exact FROM {table} GROUP BY {key}),
    key_probes AS (
      SELECT e.{key}, e.exact, i, {case_for('e.' + key)} AS bucket
      FROM exact e, range({d}) r(i)),
    est AS (
      SELECT kp.{key}, kp.exact, min(s.cnt)::BIGINT AS est
      FROM key_probes kp JOIN sketch s ON kp.i = s.i AND kp.bucket = s.bucket
      GROUP BY kp.{key}, kp.exact)
    SELECT {key}, est, exact, rank FROM (
      SELECT *, row_number() OVER (ORDER BY est DESC, {key} ASC) AS rank FROM est)
    WHERE rank <= {k}
    """
