"""Round-14 item-5/4/6 profiler: split per-query cost into PLAN-BUILD
(query construction: Python + Catalyst parse) vs EXECUTE (noop write,
which includes analysis+optimization+codegen+run), and count Spark jobs
per phase. Medians of N repeats, canary per repeat.

Usage: python scripts/r14_probe_profile.py q1,q2,... [--n 3]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1].split(",")
    n_rep = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 3

    import bench as B
    from presto_rakam_kafka_spark import queries as Q
    from presto_rakam_kafka_spark.fixtures import load_catalog, sweep_staging
    from presto_rakam_kafka_spark.session import get_spark

    sweep_staging()
    spark = get_spark(app_name="r14_probe_profile")
    sc = spark.sparkContext
    load_catalog(spark, SF_DIR)
    Q.QUERIES["count_star"](spark, SF_DIR).collect()
    from presto_rakam_kafka_spark import queries_dsv2 as _qd

    log_dir = _qd._segment_log_dir(spark, SF_DIR)
    _qd._keyed_log_dir(spark, SF_DIR)
    _qd._compacted_log_dir(spark, SF_DIR)
    _qd._purged_log_dir(spark, SF_DIR)
    _qd._wire_segment_log_dir(spark, SF_DIR)
    _qd.events_serve_rollup_tail(spark, SF_DIR)
    _qd.events_serve_rollup_distinct(spark, SF_DIR)
    _qd.events_serve_rollup_quantiles(spark, SF_DIR)
    _qd.events_serve_rollup_stats(spark, SF_DIR)
    _qd.events_serve_rollup_repair(spark, SF_DIR)
    _qd.events_serve_rollup_topn(spark, SF_DIR)
    from presto_rakam_kafka_spark.sources.kafka_datasource import (
        KafkaSegmentDataSource,
    )

    spark.dataSource.register(KafkaSegmentDataSource)
    (
        spark.read.format("kafka_segments").option("path", log_dir).load()
        .limit(1).write.format("noop").mode("overwrite").save()
    )
    spark.range(sc.defaultParallelism * 4).repartition(
        sc.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()
    B._register_ann_stagers()
    for name in names:
        if name in B.ANN_STAGERS:
            B.ANN_STAGERS[name](spark)

    def canary() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id) AS s").write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out = {}
    for name in names:
        builds, execs, jobs_b, jobs_e, cans = [], [], [], [], []
        for i in range(n_rep):
            cans.append(canary())
            sc.setJobGroup(f"{name}-build-{i}", name)
            j0 = len(sc.statusTracker().getJobIdsForGroup(f"{name}-build-{i}"))
            t0 = time.perf_counter()
            df = Q.QUERIES[name](spark, SF_DIR)
            t1 = time.perf_counter()
            jb = len(sc.statusTracker().getJobIdsForGroup(f"{name}-build-{i}")) - j0
            sc.setJobGroup(f"{name}-exec-{i}", name)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            je = len(sc.statusTracker().getJobIdsForGroup(f"{name}-exec-{i}"))
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
            jobs_b.append(jb)
            jobs_e.append(je)
        out[name] = {
            "build_s": builds,
            "exec_s": execs,
            "build_med": statistics.median(builds),
            "exec_med": statistics.median(execs),
            "jobs_build": jobs_b,
            "jobs_exec": jobs_e,
            "canary": cans,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {
        k: {"build": v["build_med"], "exec": v["exec_med"],
            "jobs": [max(v["jobs_build"]), max(v["jobs_exec"])]}
        for k, v in out.items()}}))


if __name__ == "__main__":
    main()
