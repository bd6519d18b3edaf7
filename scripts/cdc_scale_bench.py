"""Scale receipt for the streaming CDC snapshot (streaming/cdc.py):
apply a 5M-change stream (4 micro-batches) to a BUCKET-SHARDED snapshot
and measure per-batch apply cost, then apply a ONE-USER batch and
measure how much of the new generation was actually rewritten vs
hard-linked — the round-8 receipt that per-batch I/O is
O(touched buckets), not O(snapshot).

Run: python scripts/cdc_scale_bench.py [--events 5000000] [--users 200000]
                                       [--buckets 16]
Prints one JSON line; recorded in SCALE_NOTES.
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
from presto_rakam_kafka_spark.fixtures import staging_mkdtemp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--carry", choices=["link", "manifest"], default="link")
    args = ap.parse_args()

    spark = get_spark(app_name="cdc-scale-bench")
    events = build_events(spark, args.events, args.users).localCheckpoint(
        eager=True
    )
    path = staging_mkdtemp("cdc_scale_")
    base = events.select(
        "user_id", "event_id", "event_type", "ts", "value"
    ).limit(0)
    cdc.init_snapshot(base, path, key_col="user_id", num_buckets=args.buckets,
                      carry=args.carry)
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

    # --- round-8 receipt: a one-user batch rewrites ~1 bucket -------
    import os

    def gen_stats(gen_dir):
        """(total_bytes, rewritten_bytes, files, rewritten_files):
        a file with st_nlink > 1 is a hard link shared with the prior
        generation — NOT rewritten; st_nlink == 1 means fresh I/O."""
        tot = rew = nf = nrw = 0
        for root, _dirs, files in os.walk(gen_dir):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                st = os.stat(os.path.join(root, f))
                nf += 1
                tot += st.st_size
                if st.st_nlink == 1:
                    nrw += 1
                    rew += st.st_size
        return tot, rew, nf, nrw

    one_user = events.filter(F.col("user_id") == 42).select(
        "user_id", "event_id", "event_type", "ts", "value",
        (F.col("event_type") == "error").alias("deleted"),
    )
    t0 = time.monotonic()
    fn(one_user, args.batches)  # next epoch
    out["one_user_batch_s"] = round(time.monotonic() - t0, 2)
    cur, _ = cdc._read_pointer(path)
    tot, rew, nf, nrw = gen_stats(os.path.join(path, cur))
    out["one_user_gen_bytes_total"] = tot
    out["one_user_gen_bytes_rewritten"] = rew
    out["one_user_gen_files"] = nf
    out["one_user_gen_files_rewritten"] = nrw
    out["rewrite_fraction"] = round(rew / tot, 4) if tot else None
    if args.carry == "manifest":
        # round-9 receipt: untouched buckets are carried BY REFERENCE —
        # count how many of the committed manifest's buckets point into
        # PRIOR generations (never copied, never linked) vs freshly
        # written in the one-user generation
        man = cdc._read_manifest(path, cur)
        fresh = sum(
            1 for fs in man["buckets"].values()
            if all(f.startswith(cur + "/") for f in fs)
        )
        out["manifest_buckets_total"] = len(man["buckets"])
        out["manifest_buckets_fresh"] = fresh
        out["manifest_buckets_referenced"] = len(man["buckets"]) - fresh
    print(json.dumps(out))


if __name__ == "__main__":
    main()
