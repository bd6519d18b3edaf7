"""Local replica of the driver's correctness gate: run each registry
query on Spark AND its oracle SQL on DuckDB, compare row count, column
names, and an order-insensitive value multiset."""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal as _Decimal


def _norm_cell(v):
    # Every rendering is TYPE-TAGGED: the driver's hash distinguishes
    # 68424 (BIGINT) from 68424.0 (DOUBLE), and round 1's math_funcs
    # slipped through this gate precisely because untagged "%.12g"
    # rendered both identically (VERDICT r1 §wrong-1/4). A bool is an
    # int in Python, so it is tested first.
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        # 12 significant digits: strict enough to catch real bugs,
        # loose enough for sum-order jitter we already round away.
        return f"f:{v:.12g}"
    if isinstance(v, _Decimal):
        # Normalize scale (2.50 == 2.5) but keep exactness and the tag:
        # a DECIMAL result is not interchangeable with a DOUBLE.
        return f"dec:{v.normalize()}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{v.hex()}"
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return f"s:{v}"


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# DuckDB types whose Python `fetchall` rendering HIDES a widening the
# driver's Arrow-path rendering exposes: HUGEINT fetches as a plain int
# locally but exports to Arrow as decimal128(38,0) → Python Decimal, so
# an oracle `sum(BIGINT)` passes an untyped local gate and red-flags in
# the driver (round 3's avro_decode_roundtrip; round 1's math_funcs was
# the same family at the value level). Flag these by NAME from
# `res.types` so they can never pass locally again.
_DUCK_WIDENED = ("HUGEINT", "UHUGEINT")


def _duck_type_skew(res, duck_cols) -> str | None:
    for name, typ in zip(duck_cols, res.types):
        t = str(typ).upper()
        if any(w in t for w in _DUCK_WIDENED):
            return (
                f"oracle column '{name}' is DuckDB {t}: wrap the aggregate in "
                f"an explicit CAST (e.g. CAST(sum(x) AS BIGINT)) — HUGEINT "
                f"arrives as Decimal via Arrow and hash-mismatches the driver"
            )
    return None


def compare_query(spark_df, duck_con, oracle_sql: str) -> tuple[bool, str]:
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = duck_con.sql(oracle_sql)
    duck_cols = [c.lower() for c in res.columns]
    skew = _duck_type_skew(res, duck_cols)
    if skew is not None:
        return False, skew
    # Fetch through Arrow, not fetchall(): Arrow is the rendering the
    # driver-side hash sees, and the two differ exactly where DuckDB
    # widens internally (HUGEINT → decimal128(38,0)).
    tbl = res.fetch_arrow_table()
    cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    duck_rows = list(zip(*cols)) if cols else []

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        detail = "; ".join(f"row{i}: spark={a[i]} duck={b[i]}" for i in diffs)
        return False, f"value mismatch ({detail})"
    return True, "ok"
