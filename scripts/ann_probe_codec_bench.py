"""Probe-codec receipt (round 8, VERDICT next-2): at the serving
geometry (nlist=64, m=16, ksub=256, nprobe=2, refine=128) the expr ADC
probe is Catalyst-compile-dominated (4096 generated LUT expressions,
≈2.3 s/query single-query — SCALE_NOTES §ann-recall). This measures the
`probe_codec="pandas"` twin (numpy LUTs + Arrow gather-sum, constant
plan size) against it: single-query and 50-query-batch latency, same
500k clustered corpus as the recall sweep, results asserted equal.

Run: python scripts/ann_probe_codec_bench.py [--n 500000]
Prints one JSON line; recorded in SCALE_NOTES.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from presto_rakam_kafka_spark.operators import similarity as sim
from presto_rakam_kafka_spark.session import get_spark
from scripts.ann_recall_sweep import DIM, make_corpus

NLIST, M, KSUB, NPROBE, REFINE, K = 64, 16, 256, 2, 128, 10


def probe(spark, path, queries, cents, books, lists, codec):
    return sorted(
        map(
            tuple,
            sim.ivfpq_topk_from_index(
                spark.read.parquet(path), queries, "embedding", "vec_id",
                dim=DIM, k=K, num_centroids=NLIST, nprobe=NPROBE, m=M,
                ksub=KSUB, centroids=cents, books=books, prune_lists=lists,
                refine_factor=REFINE, probe_codec=codec,
            ).collect(),
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    args = ap.parse_args()

    spark = get_spark(app_name="ann-probe-codec-bench")
    X = make_corpus(args.n, "clustered")
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(len(X), dtype=np.int64), "embedding": list(X)}
        ),
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    ).repartition(32)
    cents = sim.fit_centroids(df, "embedding", NLIST)
    books = sim.fit_pq_books(df, "embedding", DIM, m=M, ksub=KSUB)

    t0 = time.monotonic()
    path = sim.stage_ivfpq_index(
        spark, df, f"codecbench-{args.n}", "embedding", "vec_id", dim=DIM,
        num_centroids=NLIST, m=M, ksub=KSUB, store_vectors=True,
        centroids=cents, books=books, codec="pandas",
    )
    out = {"n": args.n, "build_s": round(time.monotonic() - t0, 2)}

    for tag, nq in (("single", 1), ("batch50", 50)):
        queries = df.filter(F.col("vec_id") < nq)
        lists = sim.probe_lists_for(
            queries, "embedding", dim=DIM, num_centroids=NLIST,
            nprobe=NPROBE, centroids=cents,
        )
        results = {}
        for codec in ("expr", "pandas"):
            t0 = time.monotonic()
            results[codec] = probe(spark, path, queries, cents, books, lists, codec)
            out[f"{tag}_{codec}_cold_s"] = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            probe(spark, path, queries, cents, books, lists, codec)
            warm = time.monotonic() - t0
            out[f"{tag}_{codec}_warm_s"] = round(warm, 2)
            out[f"{tag}_{codec}_warm_s_per_q"] = round(warm / nq, 3)
        assert results["expr"] == results["pandas"], "codec results diverged"
        out[f"{tag}_rows_equal"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
