"""Receipt for the r7 exact_dedup fix: min_by partial-agg vs the r6
row_number window on a HOT-KEY corpus.

Exact dedup's normal input is boilerplate-heavy web crawl where one
page repeats millions of times. The window form has one exchange but no
combiners — every copy of the duplicate class lands on one reducer. The
min_by form combines map-side: each of the 32 input partitions reduces
its ~31k copies to ONE struct before the shuffle, so the reducer merges
32 rows instead of sorting 1M.

Wall-clock alone cannot show the hazard on local[32] (the shuffle is a
shared-memory copy, so even a 1M-row hot key "sorts fast"); the metric
that predicts cluster behavior is SHUFFLE VOLUME, read from the Spark
status REST API per job: with combiners the skewed corpus shuffles ~32
records (one per mapper), without them it shuffles all 1,000,000 copies
to one reducer task.

Run: python scripts/exact_dedup_skew_bench.py
Prints one JSON line; recorded in SCALE_NOTES §exact-dedup-skew.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql import Window

from presto_rakam_kafka_spark.operators import dedup
from presto_rakam_kafka_spark.session import get_spark

N = 1_000_000
BOILER = (
    "Terms of service: by accessing this site you agree to the following "
    "conditions which apply to all visitors without exception. " * 4
)


def window_form(df, text_col, id_col):
    # The r6 shape, reproduced verbatim for the A/B.
    w = Window.partitionBy("content_md5").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("content_md5", F.md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("content_md5", "_rn")
    )


def corpus(spark, skewed: bool):
    base = spark.range(0, N, 1, 32).withColumnRenamed("id", "doc_id")
    if skewed:
        # one text x ~1M copies plus a handful of unique docs. The few
        # unique rows keep the text column non-constant: a pure literal
        # would let Catalyst constant-fold md5() and rewrite the window
        # form into TakeOrderedAndProject(limit=1), which benchmarks the
        # optimizer's special case instead of the hot-key shuffle.
        return base.withColumn(
            "text",
            F.when(
                F.col("doc_id") % (N // 8) == 0,
                F.concat(F.lit("unique-"), F.col("doc_id").cast("string")),
            ).otherwise(F.lit(BOILER)),
        )
    # uniform: every text unique
    return base.withColumn(
        "text", F.concat(F.lit(BOILER), F.col("doc_id").cast("string"))
    )


def timed(df):
    t0 = time.monotonic()
    n = df.count()
    return time.monotonic() - t0, n


def shuffle_totals(spark, since_stage: int) -> tuple[int, int, int]:
    """(write_records, write_bytes, max_stage_id) summed over stages
    with id > since_stage, via the status REST API."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    recs = byts = 0
    max_id = since_stage
    for s in stages:
        if s["stageId"] > since_stage:
            recs += s.get("shuffleWriteRecords", 0)
            byts += s.get("shuffleWriteBytes", 0)
            max_id = max(max_id, s["stageId"])
    return recs, byts, max_id


def main():
    spark = get_spark(
        app_name="exact-dedup-skew", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    out = {"n_docs": N, "forms": {}}
    last_stage = -1
    for corpus_name, skewed in (("skewed_1key", True), ("uniform", False)):
        c = corpus(spark, skewed)
        for form_name, fn in (("min_by", dedup.exact_dedup), ("window", window_form)):
            # warm the input pipeline once, then take the best of 2;
            # shuffle volume is read over the FIRST (cold) run only so
            # the record counts describe one execution.
            sec1, n = timed(fn(c, "text", "doc_id"))
            recs, byts, last_stage = shuffle_totals(spark, last_stage)
            sec2, _ = timed(fn(c, "text", "doc_id"))
            _, _, last_stage = shuffle_totals(spark, last_stage)
            out["forms"][f"{corpus_name}/{form_name}"] = {
                "sec": round(min(sec1, sec2), 3),
                "survivors": n,
                "shuffle_records": recs,
                "shuffle_mb": round(byts / 1e6, 2),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
