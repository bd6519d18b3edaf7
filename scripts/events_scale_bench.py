"""Scale receipt for the event-analytics operators (operators/events.py).

The oracle gate proves them correct at sf0.01 (10k events); this script
measures them on a synthetic corpus 100-1000× larger, and directly
races the funnel's one-shuffle sorted-fold against the textbook K-step
chained-join funnel so the SCALE_NOTES claim carries a number.

Corpus: N events over U users built DISTRIBUTED (spark.range →
md5-derived type/timestamp; no driver materialization). Timestamps are
spread over 90 days; user activity is Zipf-ish (user = id % U weighted
by a squared mix) to keep a realistic skew without a pathological key.

Usage::

    python scripts/events_scale_bench.py --events 1000000 --users 20000

Emits one JSON line per op: {"op", "events", "cold_s", "warm_s",
"rows_out"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from presto_rakam_kafka_spark.operators import events as ev  # noqa: E402
from presto_rakam_kafka_spark.session import get_spark  # noqa: E402

TYPES = "('view','click','purchase','signup','error')"


def build_events(spark, n: int, users: int):
    """Distributed synthetic event log: md5-mixed type/user/ts, 90-day
    span, mild quadratic skew on user activity."""
    mix = "conv(substr(md5(cast(id as string)), 1, 8), 16, 10)"
    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("id").alias("event_id"),
            F.expr(
                f"timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, {mix} % 7776000)"
            ).alias("ts"),
            F.expr(f"cast(pow({mix} % {users}, 2) / {users} as long)").alias("user_id"),
            F.expr(f"element_at(array{TYPES}, cast({mix} % 5 as int) + 1)").alias(
                "event_type"
            ),
            (F.col("id") % 97 / 10.0).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
    )


def chained_join_funnel(events, steps=ev.FUNNEL_STEPS):
    """The textbook funnel: one groupBy + join per step — K corpus
    shuffles. Benchmark-only contrast for the fold."""
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    counts = [(1, steps[0], cur)]
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col("event_type") == s)
            .join(cur.withColumnRenamed("t", "prev_t"), "user_id")
            .filter(F.col("ts") > F.col("prev_t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        counts.append((i, s, nxt))
        cur = nxt
    rows = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"), F.lit(s).alias("step_name"), "n_users"
        )
        for i, s, df in counts
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def timed(label, build, events_df, n):
    for phase in ("cold", "warm"):
        t0 = time.time()
        rows = build(events_df).count()
        took = time.time() - t0
        if phase == "warm":
            print(
                json.dumps(
                    {
                        "op": label,
                        "events": n,
                        "cold_s": round(cold, 2),
                        "warm_s": round(took, 2),
                        "rows_out": rows,
                    }
                )
            )
        cold = took


def _top_paths(events):
    from presto_rakam_kafka_spark import queries_analytics as qa

    class _FakeT:
        pass

    # reuse the registered query body by inlining its plan over the
    # synthetic frame (the registry function reads from sf_dir)
    from pyspark.sql import Window

    evs = events.select(
        "user_id",
        F.struct(
            F.expr("unix_micros(ts)").alias("us"),
            F.col("event_id"),
            F.col("event_type"),
        ).alias("ev"),
    )
    seqs = evs.groupBy("user_id").agg(
        F.expr("transform(array_sort(collect_list(ev)), e -> e.event_type)").alias("seq")
    )
    paths = seqs.filter(F.expr("size(seq) >= 3")).selectExpr(
        "explode(transform(sequence(0, size(seq) - 3),"
        " i -> concat_ws('>', seq[i], seq[i+1], seq[i+2]))) AS path"
    )
    top = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n")).orderBy(
        F.desc("n"), F.asc("path")
    ).limit(10)
    w = Window.orderBy(F.desc("n"), F.asc("path"))
    return top.withColumn("rank", F.row_number().over(w))


def _anomaly_days(events):
    from pyspark.sql import Window

    daily = events.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    f = Window.orderBy("d").rowsBetween(-7, -1)
    w = daily.select(
        "d", "n",
        F.sum(F.col("n") * 1.0).over(f).alias("s"),
        F.sum(F.col("n") * F.col("n") * 1.0).over(f).alias("s2"),
        F.count(F.lit(1)).over(f).alias("k"),
    )
    z = "(n - s / k) / sqrt((s2 - s * s / k) / (k - 1))"
    return w.filter((F.col("k") >= 3) & (F.expr("s2 - s * s / k") > 0)).selectExpr(
        "d", "n", f"round({z}, 4) AS z"
    )


def _rfm_segments(events):
    from pyspark.sql import functions as F

    from presto_rakam_kafka_spark.operators.ranks import with_global_rank

    pu = events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("cents"),
    )
    mx = F.broadcast(events.agg(F.max(F.to_date("ts")).alias("_max_d")))
    pu = (
        pu.join(mx)
        .withColumn("rec", F.datediff("_max_d", F.to_date("last_ts")))
        .withColumn("neg_freq", -F.col("freq"))
        .withColumn("neg_cents", -F.col("cents"))
        .localCheckpoint(eager=True)
    )
    # persist=True on every pass: each with_global_rank evaluates its
    # input 2-3x (fit, counts, final) and the three passes CHAIN, so
    # without the cache rank 3 re-runs rank 1+2's exchanges each time
    # (9.9 -> 8.75 s warm at 5M events; the remaining cost is
    # the 5M-event per-user fold plus nine bounded rank jobs)
    pu = with_global_rank(
        pu, ["rec", "user_id"], rank_col="rr", count_col="n", persist=True
    )
    pu = with_global_rank(pu, ["neg_freq", "user_id"], rank_col="fr", persist=True)
    pu = with_global_rank(pu, ["neg_cents", "user_id"], rank_col="mr", persist=True)
    return (
        pu.selectExpr(
            "CAST((rr - 1) * 5 DIV n + 1 AS INT) AS r_bucket",
            "CAST((fr - 1) * 5 DIV n + 1 AS INT) AS f_bucket",
            "CAST((mr - 1) * 5 DIV n + 1 AS INT) AS m_bucket",
            "cents",
        )
        .groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cents").cast("long").alias("monetary_cents"),
        )
    )


def _value_quantiles(events):
    from presto_rakam_kafka_spark.operators import sketches as sk

    return sk.quantiles_from_histogram(sk.value_histogram(events))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--users", type=int, default=20_000)
    ap.add_argument("--op", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="events_scale_bench")
    events = build_events(spark, args.events, args.users)
    events.persist().count()  # one materialization; ops race from cache

    ops = {
        "funnel_fold": ev.funnel,
        "funnel_chained_joins": chained_join_funnel,
        "funnel_windowed_fold": lambda e: ev.funnel_windowed(e, window_hours=72),
        "session_stats": ev.user_session_stats,
        "retention": ev.retention_cohorts,
        "active_users": ev.active_users,
        "segmentation": ev.segmentation,
        "hll_weekly_users_p9": lambda e: __import__(
            "presto_rakam_kafka_spark.operators.sketches", fromlist=["sketches"]
        ).hll_weekly_users(e, p=9),
        # round 6
        "attribution": ev.last_touch_attribution,
        "stickiness": ev.stickiness,
        "funnel_latency": ev.funnel_latency,
        # round 7
        "scd2_history": lambda e: __import__(
            "presto_rakam_kafka_spark.operators.warehouse", fromlist=["warehouse"]
        ).scd2_history(e, "user_id", "event_type", "ts", "event_id"),
        "top_paths": _top_paths,
        "anomaly_days": _anomaly_days,
        # round 8
        "lifecycle": ev.lifecycle,
        "rfm_segments": _rfm_segments,
        "value_quantiles": _value_quantiles,
        # round 9: the eager_pin receipt + the log-scale sketch + the
        # audience-builder fold
        "peak_concurrency": lambda e: ev.peak_concurrency(e, gap_minutes=30),
        "value_quantiles_log": lambda e: __import__(
            "presto_rakam_kafka_spark.operators.sketches",
            fromlist=["sketches"],
        ).quantiles_from_histogram_log(
            __import__(
                "presto_rakam_kafka_spark.operators.sketches",
                fromlist=["sketches"],
            ).value_histogram_log(e)
        ),
        "audience_rule": ev.audience_rule,
    }
    for name, fn in ops.items():
        if args.op and args.op != name:
            continue
        timed(name, fn, events, args.events)


if __name__ == "__main__":
    main()
