"""The engine-portable hash kit (functions/hashing.py) must agree
bit-for-bit between Spark and DuckDB on arbitrary input — every sketch
oracle (simhash, fingerprints, sampling splits) rests on it.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.functions.hashing import (
    HASH_P,
    base_hash_duckdb,
    base_hash_spark,
    jaccard_duckdb,
    jaccard_spark,
    minhash_coefficients,
    shingles_duckdb,
    shingles_spark,
)

# Adversarial corpus: ascii, unicode, quotes, regex metachars,
# whitespace runs, long strings. (Not empty — shingling/tokenizing
# presuppose >=3 tokens; base hash itself is tested on all of these.)
CORPUS = [
    "plain ascii words here",
    "ünïcödé tõkens über ałl things",
    "中文 分词 测试 句子 混合 words",
    "quotes ' and \" and `backticks` here",
    "regex .* chars [a-z] (groups) | pipes + plus",
    "tabs\tand  double  spaces padded",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 10,
    "emoji 🚀 rockets 🎉 party tokens",
    "trailing space ends here ",
    "0 1 2 3 numbers 42 and -7 mixed 3.14 here",
]


def test_base_hash_identical(spark):
    pdf = pd.DataFrame({"s": CORPUS})
    got = (
        spark.createDataFrame(pdf)
        .select(F.expr(base_hash_spark("s")).alias("h"))
        .toPandas()["h"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = [r[0] for r in con.execute(f"SELECT {base_hash_duckdb('s')} FROM t").fetchall()]
    assert got == exp
    # 60-bit: non-negative, < 2^60, so a*h+b stays in int64 via mod P.
    assert all(0 <= h < 2**60 for h in got)


def test_shingles_and_jaccard_identical(spark):
    pdf = pd.DataFrame({"s": CORPUS})
    sdf = spark.createDataFrame(pdf).select(F.expr(shingles_spark("s", 3)).alias("sh"))
    got = [list(r.sh) for r in sdf.collect()]
    con = duckdb.connect()
    con.register("t", pdf)
    exp = [r[0] for r in con.execute(f"SELECT {shingles_duckdb('s', 3)} FROM t").fetchall()]
    # array_distinct (Spark) and list_distinct (DuckDB) order elements
    # differently; every consumer is set-semantic (jaccard intersects,
    # minhash mins over explode), so compare as sets — and require
    # distinctness on both sides.
    assert [sorted(g) for g in got] == [sorted(e) for e in exp]
    assert all(len(set(g)) == len(g) for g in got)
    # Pairwise jaccard of consecutive corpus entries matches too.
    a = spark.createDataFrame(pd.DataFrame({"x": CORPUS[:-1], "y": CORPUS[1:]}))
    jg = a.select(
        F.expr(
            jaccard_spark(shingles_spark("x", 3), shingles_spark("y", 3))
        ).alias("j")
    ).toPandas()["j"].tolist()
    con.register("p", pd.DataFrame({"x": CORPUS[:-1], "y": CORPUS[1:]}))
    je = [
        r[0]
        for r in con.execute(
            f"SELECT {jaccard_duckdb(shingles_duckdb('x', 3), shingles_duckdb('y', 3))} FROM p"
        ).fetchall()
    ]
    assert [round(v, 10) for v in jg] == [round(v, 10) for v in je]


def test_minhash_coefficients_bounded_and_deterministic():
    a1, b1 = minhash_coefficients(128)
    a2, b2 = minhash_coefficients(128)
    assert (a1, b1) == (a2, b2)  # seed-stable across calls/processes
    assert all(1 <= a < HASH_P for a in a1)
    assert all(0 <= b < HASH_P for b in b1)
    # No int64 overflow: max a * max h + max b < 2^63.
    assert (HASH_P - 1) * (HASH_P - 1) + (HASH_P - 1) < 2**63
