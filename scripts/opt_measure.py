#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).

For every HEADLINE query: stage fixtures exactly like bench.py, then
per query capture

* ``explain("formatted")`` → ``plans/r13/<name>_<tag>.txt``
* cold wall time to the ``noop`` sink (same methodology as bench.py)
* the number of Spark JOBS the run launched (statusTracker job-group
  count) — at bench scale (sf0.1, ~17 MB) driver job latency dominates,
  so job count is the first-order cost model for every query

and print one JSON line per query plus a sorted summary. This is a
measurement tool only — bench.py stays the driver contract.

Usage: python scripts/opt_measure.py [--tag before|after] [--only a,b,c]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
)


def main() -> None:
    import bench as B
    from presto_rakam_kafka_spark import queries as Q
    from presto_rakam_kafka_spark.fixtures import load_catalog, sweep_staging
    from presto_rakam_kafka_spark.session import get_spark

    tag = "before"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    only: list[str] | None = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    os.makedirs(PLANS_DIR, exist_ok=True)
    sweep_staging()
    spark = get_spark(app_name=f"opt_measure_{tag}")
    sc = spark.sparkContext

    names = [n for n in B.HEADLINE if n in Q.QUERIES]
    if only is not None:
        names = [n for n in names if n in only]

    # ---- identical staging/warmup to bench.py ----
    load_catalog(spark, SF_DIR)
    Q.QUERIES["count_star"](spark, SF_DIR).collect()
    from presto_rakam_kafka_spark import queries_dsv2 as _qd

    t0 = time.perf_counter()
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
    staging_s = round(time.perf_counter() - t0, 3)
    from presto_rakam_kafka_spark.sources.kafka_datasource import (
        KafkaSegmentDataSource,
    )

    spark.dataSource.register(KafkaSegmentDataSource)
    (
        spark.read.format("kafka_segments")
        .option("path", log_dir)
        .load()
        .limit(1)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    spark.range(sc.defaultParallelism * 4).repartition(
        sc.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()
    B._register_ann_stagers()

    results: dict[str, dict] = {}
    for name in names:
        if name in B.ANN_STAGERS:
            tb = time.perf_counter()
            B.ANN_STAGERS[name](spark)
            build_s = round(time.perf_counter() - tb, 3)
        else:
            build_s = None
        group = f"q_{name}"
        sc.setJobGroup(group, name)
        sc.setJobDescription(name)
        t1 = time.perf_counter()
        df = Q.QUERIES[name](spark, SF_DIR)
        build_df_s = round(time.perf_counter() - t1, 3)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        exec_s = round(time.perf_counter() - t2, 3)
        sc.setJobGroup("idle", "idle")
        try:
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        except Exception:
            jobs = -1
        n_exchange = plan.count("Exchange")
        n_py = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("MapInArrow")
            + plan.count("FlatMapGroupsInPandas")
        )
        with open(
            os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w"
        ) as fh:
            fh.write(plan)
        rec = {
            "name": name,
            "exec_s": exec_s,
            "plan_build_s": build_df_s,
            "jobs": jobs,
            "exchanges": n_exchange,
            "python_nodes": n_py,
        }
        if build_s is not None:
            rec["ann_build_s"] = build_s
        results[name] = rec
        print(json.dumps(rec), flush=True)

    total = round(sum(r["exec_s"] + r["plan_build_s"] for r in results.values()), 3)
    ranked = sorted(
        results.values(), key=lambda r: -(r["exec_s"] + r["plan_build_s"])
    )
    print(json.dumps({"metric": "opt_measure_total", "tag": tag,
                      "total_s": total, "staging_s": staging_s,
                      "n": len(results)}))
    print("# slowest 20 (exec+plan):")
    for r in ranked[:20]:
        print(
            f"#   {r['name']:38s} {r['exec_s'] + r['plan_build_s']:6.2f}s "
            f"jobs={r['jobs']:3d} exch={r['exchanges']:2d} py={r['python_nodes']}"
        )
    with open(os.path.join(PLANS_DIR, f"measure_{tag}.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
