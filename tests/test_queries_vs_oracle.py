"""Every registry query with an oracle must hash-match DuckDB at
sf0.001 — the local replica of the driver's t2 gate (which runs the
same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from presto_rakam_kafka_spark import queries as Q
from tests.oracle_check import compare_query


def _names():
    return sorted(Q.ORACLES.keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    ok, msg = compare_query(df, duck, Q.ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows_or_schema(spark, sf_dir):
    # Queries without an oracle still must run and have a stable schema.
    for name, fn in Q.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} has no columns"


def test_gate_is_type_strict(spark, duck):
    """The local gate must fail on a type-skewed oracle — round 1's
    math_funcs passed locally with a BIGINT-vs-DOUBLE mismatch that the
    driver's (type-aware) hash then rejected."""
    import pyspark.sql.functions as F

    df = spark.range(1).select(F.lit(68424).cast("long").alias("v"))
    ok, _ = compare_query(df, duck, "SELECT CAST(68424 AS DOUBLE) AS v")
    assert not ok, "gate accepted BIGINT vs DOUBLE"
    ok, msg = compare_query(df, duck, "SELECT CAST(68424 AS BIGINT) AS v")
    assert ok, msg


def test_gate_rejects_hugeint_widening(spark, duck):
    """DuckDB sum(BIGINT) widens to HUGEINT, which `fetchall` renders as
    a plain Python int (passing an untyped gate) but Arrow renders as
    Decimal — the driver-side hash then mismatches (round 3's
    avro_decode_roundtrip). The gate must reject the oracle by TYPE."""
    import pyspark.sql.functions as F

    df = spark.range(3).select(F.sum("id").alias("s"))
    ok, msg = compare_query(df, duck, "SELECT sum(x) AS s FROM (VALUES (0),(1),(2)) t(x)")
    assert not ok and "HUGEINT" in msg, f"gate accepted HUGEINT oracle: {msg}"
    ok, msg = compare_query(
        df, duck, "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (0),(1),(2)) t(x)"
    )
    assert ok, msg


def test_no_oracle_widens_to_hugeint(duck):
    """Sweep EVERY registered oracle's DuckDB result types: none may
    contain HUGEINT (the audit VERDICT r3 asked for, kept as a gate)."""
    hits = []
    for name, sql in sorted(Q.ORACLES.items()):
        res = duck.sql(sql)
        for cname, typ in zip(res.columns, res.types):
            if "HUGEINT" in str(typ).upper():
                hits.append(f"{name}.{cname}")
    assert not hits, f"oracles widen to HUGEINT (add explicit CASTs): {hits}"


def test_gate_is_decimal_strict(spark, duck):
    import pyspark.sql.functions as F

    df = spark.range(1).select(F.lit("2.50").cast("decimal(10,2)").alias("v"))
    ok, _ = compare_query(df, duck, "SELECT CAST(2.5 AS DOUBLE) AS v")
    assert not ok, "gate accepted DECIMAL vs DOUBLE"
    # Scale differences within DECIMAL are NOT differences (2.50 == 2.5).
    ok, msg = compare_query(df, duck, "SELECT CAST(2.5 AS DECIMAL(8,1)) AS v")
    assert ok, msg
