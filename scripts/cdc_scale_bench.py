"""Scale receipt for the streaming CDC snapshot (streaming/cdc.py):
apply a 5M-change stream (4 micro-batches) to a snapshot and measure
per-batch apply cost — the number that quantifies the SCALE_NOTES
§r7-ops-2 claim that per-batch cost is the full-outer merge, and the
motivation for key-range sharding at 100 TB.

Run: python scripts/cdc_scale_bench.py [--events 5000000] [--users 200000]
Prints one JSON line; recorded in SCALE_NOTES §r7-receipts.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from presto_rakam_kafka_spark.session import get_spark
from presto_rakam_kafka_spark.streaming import cdc
from scripts.events_scale_bench import build_events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark(app_name="cdc-scale-bench")
    events = build_events(spark, args.events, args.users).localCheckpoint(
        eager=True
    )
    path = tempfile.mkdtemp(prefix="cdc_scale_")
    base = events.select(
        "user_id", "event_id", "event_type", "ts", "value"
    ).limit(0)
    cdc.init_snapshot(base, path)
    fn = cdc.cdc_batch_fn(path, "user_id", "ts", "event_id", delete_col="deleted")

    per = args.events // args.batches
    out = {"events": args.events, "users": args.users, "batch_s": []}
    for i in range(args.batches):
        batch = events.filter(
            (F.col("event_id") >= i * per) & (F.col("event_id") < (i + 1) * per)
        ).select(
            "user_id", "event_id", "event_type", "ts", "value",
            (F.col("event_type") == "error").alias("deleted"),
        )
        t0 = time.monotonic()
        fn(batch, i)
        out["batch_s"].append(round(time.monotonic() - t0, 2))
    t0 = time.monotonic()
    n = cdc.read_snapshot(spark, path).count()
    out["snapshot_rows"] = n
    out["read_s"] = round(time.monotonic() - t0, 2)
    out["changes_per_s_last_batch"] = round(per / out["batch_s"][-1])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
