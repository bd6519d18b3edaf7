"""Skew-resilient aggregation: two-phase salted group-by.

SURVEY §7 "100 TB-scale discipline": a hot grouping key (a handful of
event types over billions of events, a bot user_id) funnels its entire
partition through one reducer in a plain ``groupBy``. AQE's skew-join
splitting covers joins but not aggregations, and Spark's map-side
partial aggregation already absorbs *moderate* skew — the salted form
is for the pathological case where even partial-agg output for one key
overwhelms a single final task (e.g. high-cardinality distinct-ish
state per key).

Shape: phase 1 groups by ``(key, salt)`` — the hot key's rows spread
over ``salt_buckets`` reducers — phase 2 re-combines the per-salt
partials by ``key`` alone (``salt_buckets`` rows per key, trivially
cheap). Only algebraic aggregates decompose this way; ``avg`` is
derived as sum/count at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: op → (phase-1 partial, phase-2 combine of the partial column)
_ALGEBRAIC = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """``df.groupBy(keys).agg(...)`` with the shuffle salted.

    ``aggs``: output column → (op, input column); ops: count / sum /
    min / max / avg. Results are exactly the unsalted aggregation's
    for count/min/max and integer sums; float sums/avgs differ only by
    summation order (same caveat as any distributed sum).
    """
    needs_avg = [name for name, (op, _) in aggs.items() if op == "avg"]
    phase1_aggs = []
    phase2_aggs = []
    post = []
    for name, (op, col) in aggs.items():
        if op == "avg":
            phase1_aggs += [
                F.sum(col).alias(f"__{name}_s"),
                F.count(col).alias(f"__{name}_c"),
            ]
            phase2_aggs += [
                F.sum(f"__{name}_s").alias(f"__{name}_s"),
                F.sum(f"__{name}_c").alias(f"__{name}_c"),
            ]
            post.append((F.col(f"__{name}_s") / F.col(f"__{name}_c")).alias(name))
        else:
            partial, combine = _ALGEBRAIC[op]
            phase1_aggs.append(partial(col).alias(name))
            phase2_aggs.append(combine(name).alias(name))
            post.append(F.col(name))

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partials = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    combined = partials.groupBy(*keys).agg(*phase2_aggs)
    drop = [c for n in needs_avg for c in (f"__{n}_s", f"__{n}_c")]
    out = combined.select(*keys, *post)
    return out.drop(*drop)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    row_col: str,
    salt_buckets: int = 16,
    join_hint: str | None = None,
) -> DataFrame:
    """Equi join with the fact-side shuffle salted — the hot-key join
    fix for when AQE's skew split isn't available (non-AQE plans,
    stream-batch joins) or the dim side is too big to broadcast but
    small enough to replicate ``salt_buckets``×.

    Each fact row gets a deterministic salt from a row-unique column
    (``row_col`` — NOT the join key: a hot key must spread over all
    buckets), and the dim side is replicated once per salt, so the join
    runs on ``(key, salt)`` and one hot key occupies ``salt_buckets``
    reducers instead of one. Exactly the plain join's rows, including
    many-to-many keys (every dim row for a key exists under every
    salt). ``join_hint`` ("merge" / "shuffle_hash") pins the strategy
    so plans are assertable; production lets AQE choose.
    """
    sf = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(row_col)), F.lit(salt_buckets)).cast("int")
    )
    sd = dim.select(
        "*",
        F.explode(F.expr(f"sequence(0, {salt_buckets - 1})")).alias("__salt"),
    )
    if join_hint:
        sd = sd.hint(join_hint)
    joined = sf.join(
        sd,
        (sf[fact_key] == sd[dim_key]) & (sf["__salt"] == sd["__salt"]),
        "inner",
    )
    return joined.drop(sf["__salt"]).drop(sd["__salt"])
