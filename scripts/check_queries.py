"""Spot-check a SUBSET of registry queries against the DuckDB oracle.

Same comparison as scripts/emit_local_gate.py (type-tagged,
order-insensitive hash), restricted to the names given — the fast
per-change equivalence gate for the optimization rounds.

Usage: python scripts/check_queries.py q1,q2,... [sf_dir ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from presto_rakam_kafka_spark.fixtures import sweep_staging  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    import duckdb

    from oracle_check import compare_query
    from presto_rakam_kafka_spark import queries as Q
    from presto_rakam_kafka_spark.session import get_spark

    sweep_staging()
    spark = get_spark(app_name="check_queries")
    failed = 0
    for sf_dir in sf_dirs:
        duck = duckdb.connect()
        for name in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            duck.sql(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        for name in names:
            df = Q.QUERIES[name](spark, sf_dir)
            oracle = Q.ORACLES.get(name)
            if oracle is None:
                print(f"{sf_dir} {name}: NO ORACLE (rows={len(df.collect())})")
                continue
            ok, msg = compare_query(df, duck, oracle)
            print(f"{sf_dir} {name}: {'ok' if ok else 'FAIL ' + msg}")
            failed += 0 if ok else 1
        duck.close()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
