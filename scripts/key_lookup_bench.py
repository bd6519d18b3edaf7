"""Receipt for the round-9 point-lookup index format (VERDICT r8 #1).

Claims measured:
(a) index bytes READ per lookup scale with segments CONSULTED — the
    per-segment binary sidecars are loaded lazily during the
    newest-first walk, so a hot present key costs ~1 bloom read and the
    early stop also stops index I/O (the r8 form parsed the WHOLE
    partition's monolithic JSON per call);
(b) per-probe time is FLAT in segment row count — uint8-bitset byte
    probes are O(1), where the r8 Python-bigint shift was O(m_bits);
(c) the distributed form (`lookup_latest_spark`) serves a 100k-key
    batch with total segment scans ∝ segments, not keys × segments;
(d) the distributed HISTORY read (`lookup_history_spark`, round 10)
    serves a 100k-key audit batch with segment reads ∝ bloom-positive
    segments;
(e) ``--route offset`` (round 10, VERDICT r9 next-5): the same
    receipts on an OFFSET-ROUTED log — every partition's bloom chain
    is walked and the max-offset hit wins, so the stale-read class is
    impossible by construction (asserted: all 100k latest offsets
    equal the known per-key maximum, which single-partition routing
    would get wrong for ~2/3 of keys here).

Run: python scripts/key_lookup_bench.py [--route key|offset]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from presto_rakam_kafka_spark.fixtures import staging_mkdtemp  # noqa: E402

from presto_rakam_kafka_spark.sources.kafka_datasource import (  # noqa: E402
    _bloom_build_bits,
    _bloom_might_contain,
    build_key_blooms,
    lookup_history_spark,
    lookup_latest,
    lookup_latest_spark,
    write_segments,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--route", choices=("key", "offset"), default="key")
    args = ap.parse_args()
    route_by_key = args.route == "key"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("key_lookup_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = staging_mkdtemp("key_lookup_bench_")
    out: dict = {}

    # --- log: 300k records, 100k distinct keys, 3 updates each -------
    n_rows, n_keys = 300_000, 100_000
    rows = [
        (o, str(o % n_keys).encode(), f"v{o}".encode(), None)
        for o in range(n_rows)
    ]
    raw = spark.createDataFrame(
        rows, "offset LONG, key BINARY, value BINARY, timestamp TIMESTAMP"
    )
    log = os.path.join(work, "log")
    t0 = time.time()
    write_segments(raw, log, num_partitions=3, segment_rows=1000,
                   route_by_key=route_by_key)
    t1 = time.time()
    build_key_blooms(log)
    t2 = time.time()
    out["log"] = {
        "route": args.route,
        "rows": n_rows, "keys": n_keys, "segment_rows": 1000,
        "write_s": round(t1 - t0, 2), "index_build_s": round(t2 - t1, 2),
        "index_bytes_total": sum(
            os.path.getsize(os.path.join(d, f))
            for d, _s, fs in os.walk(log) for f in fs if f.endswith(".bloom")
        ),
    }

    # --- (a) index bytes read ∝ segments consulted -------------------
    # hot key: last updated near the log head → newest-first finds it
    # in the first segment or two
    hot = str((n_rows - 1) % n_keys).encode()  # last-written key
    t0 = time.time()
    hits, s_hot = lookup_latest(log, [hot])
    ms_hot = (time.time() - t0) * 1000
    assert hits[hot][0] >= n_rows - n_keys - 1
    # cold key: first third of the key space last touched 2/3 back
    absent = b"no-such-key"
    t0 = time.time()
    _h2, s_abs = lookup_latest(log, [absent])
    ms_abs = (time.time() - t0) * 1000
    out["lazy_index"] = {
        "hot_key": {
            "blooms_read": s_hot["blooms_read"],
            "index_bytes_read": s_hot["index_bytes_read"],
            "segments_read": s_hot["segments_read"],
            "wall_ms": round(ms_hot, 1),
        },
        "absent_key": {
            "blooms_read": s_abs["blooms_read"],
            "index_bytes_read": s_abs["index_bytes_read"],
            "segments_read": s_abs["segments_read"],
            "segments_total": s_abs["segments_total"],
            "wall_ms": round(ms_abs, 1),
        },
        "bytes_per_bloom_hot": round(
            s_hot["index_bytes_read"] / max(1, s_hot["blooms_read"])
        ),
        "hot_reads_fraction_of_index": round(
            s_hot["index_bytes_read"] / out["log"]["index_bytes_total"], 5
        ),
    }

    # --- (b) probe time flat in segment row count --------------------
    probe_t = {}
    for seg_rows in (1_000, 100_000, 1_000_000):
        m_bits = 16 * seg_rows
        bits, _n = _bloom_build_bits(
            (str(i).encode() for i in range(min(seg_rows, 50_000))), m_bits
        )
        keys = [str(i).encode() for i in range(5_000)]
        t0 = time.time()
        for k in keys:
            _bloom_might_contain(bits, m_bits, k)
        probe_t[seg_rows] = round((time.time() - t0) / len(keys) * 1e6, 2)
    out["probe_us_by_segment_rows"] = probe_t  # flat ⇒ O(1) probes

    # --- (c) distributed 100k-key batch -------------------------------
    batch = [str(k).encode() for k in range(n_keys)]
    t0 = time.time()
    res = lookup_latest_spark(spark, log, batch, with_stats=True)
    rows_out = res.collect()
    wall = time.time() - t0
    seg_reads = {}
    for r in rows_out:
        seg_reads[r["pid"]] = r["segments_read"]  # per-partition constant
    found = sum(1 for r in rows_out if r["offset"] is not None)
    segs_total = s_abs["segments_total"]
    out["spark_batch_100k"] = {
        "keys": len(batch),
        "rows_returned": found,
        "wall_s": round(wall, 2),
        "segments_read_total": sum(seg_reads.values()),
        "segments_total": segs_total,
        "naive_keys_x_segments": len(batch) * segs_total,
    }

    if not route_by_key:
        # (e) stale reads impossible by construction: key k's records
        # sit at offsets k, k+100k, k+200k — offset-routing scatters
        # them across partitions (100000 % 3 = 1), so keyed
        # single-partition routing would serve a stale hit for ~2/3 of
        # keys; the offset walk must return the true max for ALL keys
        stale = sum(
            1 for r in rows_out
            if r["offset"] != int(bytes(r["key"]).decode()) + 2 * n_keys
        )
        out["spark_batch_100k"]["stale_hits"] = stale
        assert stale == 0, f"{stale} stale reads on the offset walk"
        # small-batch driver stats: reads ∝ partitions × bloom-positive
        # segments (the honest offset-walk cost shape). 5 CLUSTERED
        # keys → each key lives in exactly 3 of the 300 segments, so
        # ~15 (+FPR) reads out of 300 — a spread batch would be
        # bloom-positive everywhere, which is data shape, not a miss.
        small = [str(k).encode() for k in range(5)]
        _h, s_small = lookup_latest(log, small)
        out["offset_walk_small_batch"] = {
            "keys": len(small),
            "segments_read": s_small["segments_read"],
            "segments_bloom_skipped": s_small["segments_bloom_skipped"],
            "segments_total": s_small["segments_total"],
            "blooms_read": s_small["blooms_read"],
        }
        assert s_small["segments_read"] < s_small["segments_total"] // 4

    # --- (d) distributed history read, 100k-key audit batch ----------
    t0 = time.time()
    hres = lookup_history_spark(spark, log, batch, with_stats=True)
    hrows = hres.collect()
    hwall = time.time() - t0
    hseg = {}
    for r in hrows:
        hseg[r["pid"]] = r["segments_read"]
    out["history_batch_100k"] = {
        "keys": len(batch),
        "occurrences": len(hrows),
        "wall_s": round(hwall, 2),
        "segments_read_total": sum(hseg.values()),
        "segments_total": segs_total,
        "naive_keys_x_segments": len(batch) * segs_total,
    }
    # every key has exactly 3 occurrences in this log
    assert len(hrows) == 3 * n_keys, len(hrows)

    print(json.dumps(out, indent=2))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
