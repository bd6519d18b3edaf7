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
