"""Emit the local type-strict correctness gate as a JSON artifact.

The driver's CORRECTNESS_r{N}.json samples ~50 of the registry's queries;
this script runs ALL of them at sf0.01 against the DuckDB oracle (same
comparison as tests/oracle_check.py — type-tagged, order-insensitive)
and writes LOCAL_GATE_r{N}.json in the driver's file shape, so the
judge can diff the full registry against the driver's sample
(VERDICT r2 "Next round" item 8).

Usage: python scripts/emit_local_gate.py [round_number] [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from presto_rakam_kafka_spark.fixtures import sweep_staging  # noqa: E402

sweep_staging()  # age-keyed: clear prior runs' staging before timing
sys.path.insert(0, str(REPO / "tests"))


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    from oracle_check import compare_query
    from presto_rakam_kafka_spark import queries as Q
    from presto_rakam_kafka_spark.session import get_spark

    spark = get_spark(app_name="local_gate")
    duck = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        duck.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    results: dict[str, dict] = {}
    for name in sorted(Q.QUERIES):
        entry: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            rows = df.collect()
            entry["spark_rows"] = len(rows)
            oracle = Q.ORACLES.get(name)
            if oracle is None:
                # rows-only check, same as the driver's weaker path
                entry["rows_match"] = len(rows) >= 0
                entry["err"] = "no oracle (rows-only check)"
            else:
                entry["oracle_rows"] = len(duck.sql(oracle).fetchall())
                ok, msg = compare_query(df, duck, oracle)
                entry["rows_match"] = entry["spark_rows"] == entry["oracle_rows"]
                entry["schema_match"] = not msg.startswith("column mismatch")
                entry["hash_match"] = ok
                if not ok:
                    entry["err"] = msg
        except Exception as exc:  # noqa: BLE001 — record, don't abort the sweep
            entry["err"] = f"{type(exc).__name__}: {exc}"[:500]
        results[name] = entry
        status = "ok" if entry["hash_match"] else entry["err"]
        print(f"{name}: {status}")

    out = REPO / f"LOCAL_GATE_r{rnd:02d}.json"
    out.write_text(json.dumps(results, indent=2))
    n_ok = sum(1 for e in results.values() if e["hash_match"])
    print(f"\n{n_ok}/{len(results)} hash-match → {out}")


if __name__ == "__main__":
    main()
