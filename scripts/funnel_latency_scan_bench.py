"""Receipt for the r7 global-rank scan cut (VERDICT r6 next-5 +
ADVICE events.py:236): funnel_latency on the 5M-event
synthetic corpus (scripts/events_scale_bench.py builder), r6 form
(unpersisted rank primitive + count crossJoin = 4 evaluations of the
per-user fold) vs r7 form (persist fill-read-unpersist + count_col
frozen literal = 2 evaluations).

Run: python scripts/funnel_latency_scan_bench.py
Prints one JSON line; recorded in SCALE_NOTES §global-rank-scans.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from presto_rakam_kafka_spark.operators import events as ev
from presto_rakam_kafka_spark.operators.events import FUNNEL_STEPS
from presto_rakam_kafka_spark.operators.ranks import with_global_rank
from presto_rakam_kafka_spark.session import get_spark
from scripts.events_scale_bench import build_events

N_EVENTS = 5_000_000
N_USERS = 50_000


def r6_form(events):
    # The pre-r7 shape, reproduced for the A/B: unpersisted rank
    # primitive (fit + counts + final each recompute the fold) plus a
    # count aggregate crossJoined in (a fourth evaluation).
    steps = FUNNEL_STEPS
    step_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    evs = events.filter(F.col("event_type").isin(list(steps))).select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("us"),
            F.col("event_id"),
            step_idx[F.col("event_type")].alias("idx"),
        ).alias("ev"),
    )
    zero = F.struct(
        F.lit(0).alias("depth"),
        F.lit(None).cast("long").alias("first_us"),
        F.lit(None).cast("long").alias("last_us"),
    )
    acc_fn = lambda acc, e: F.when(  # noqa: E731
        e["idx"] == acc["depth"],
        F.struct(
            (acc["depth"] + 1).alias("depth"),
            F.coalesce(acc["first_us"], e["us"]).alias("first_us"),
            e["us"].alias("last_us"),
        ),
    ).otherwise(acc)
    folded = evs.groupBy("user_id").agg(
        F.aggregate(F.array_sort(F.collect_list("ev")), zero, acc_fn).alias("acc")
    )
    lat = folded.filter(F.col("acc.depth") == len(steps)).select(
        ((F.col("acc.last_us") - F.col("acc.first_us")) / 1e6).alias("v")
    )
    n_df = lat.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranked = (
        with_global_rank(lat, ["v"], rank_col="_gr")
        .select("v", (F.col("_gr") - 1).cast("double").alias("rn"))
        .crossJoin(F.broadcast(n_df))
    )

    def interp(q):
        h = f"(n-1)*{q}"
        lo = f"max(CASE WHEN rn = floor({h}) THEN v END)"
        hi = f"max(CASE WHEN rn = ceil({h}) THEN v END)"
        return f"round({lo} + ({h} - floor({h})) * ({hi} - {lo}), 4)"

    return ranked.groupBy("n").agg(
        F.expr(interp("0.5")).alias("median_s"),
        F.expr(interp("0.9")).alias("p90_s"),
    ).select(F.col("n").cast("long").alias("n_converted"), "median_s", "p90_s")


def timed(fn, events):
    t0 = time.monotonic()
    rows = fn(events).collect()
    return round(time.monotonic() - t0, 3), rows


def shuffle_totals(spark, since_stage: int):
    """(write_records, write_bytes, max_stage_id) for stages with
    id > since_stage, via the status REST API — counts how many times
    each form executes the per-user fold's corpus shuffle, the metric
    that predicts cluster cost (wall-clock on local[32] hot memory
    under-sells it)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    recs = byts = 0
    max_id = since_stage
    for st in stages:
        if st["stageId"] > since_stage:
            recs += st.get("shuffleWriteRecords", 0)
            byts += st.get("shuffleWriteBytes", 0)
            max_id = max(max_id, st["stageId"])
    return recs, byts, max_id


def main():
    spark = get_spark(
        app_name="funnel-latency-scans",
        extra_conf={"spark.ui.enabled": "true"},
    )
    # localCheckpoint pins the synthetic corpus so both forms race the
    # OPERATOR (fold + rank) rather than re-deriving the md5 mixing —
    # the same methodology as events_scale_bench.py.
    events = build_events(spark, N_EVENTS, N_USERS).localCheckpoint(eager=True)
    out = {"n_events": N_EVENTS, "n_users": N_USERS}
    last = -1
    # shuffle volume read over the first run of each form; wall-clock
    # best of 2 (alternating order cancels warm-up drift)
    for rnd in range(2):
        t_old, r_old = timed(r6_form, events)
        if rnd == 0:
            recs, byts, last = shuffle_totals(spark, last)
            out["r6_shuffle_records"] = recs
            out["r6_shuffle_mb"] = round(byts / 1e6, 1)
        t_new, r_new = timed(ev.funnel_latency, events)
        if rnd == 0:
            recs, byts, last = shuffle_totals(spark, last)
            out["r7_shuffle_records"] = recs
            out["r7_shuffle_mb"] = round(byts / 1e6, 1)
        assert r_old == r_new, (r_old, r_new)
        out["r6_unpersisted_sec"] = min(out.get("r6_unpersisted_sec", 9e9), t_old)
        out["r7_persist_sec"] = min(out.get("r7_persist_sec", 9e9), t_new)
    out["speedup"] = round(out["r6_unpersisted_sec"] / out["r7_persist_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
