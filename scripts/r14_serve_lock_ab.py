"""VERDICT r13 #3 receipt: A/B the flock/lease/heartbeat machinery
against the SERVE path (and, for contrast, one maintenance tick).

Hypothesis from code audit: serves are lock-free — `serve_rollup_tail`
reads the atomic pointer + manifest + cell parquet and never touches
`_store_lock`/`flock_guard`; the lease/heartbeat/fence runs only inside
maintenance (`maintain_rollup`/`run_rollup_maintenance`), which the
bench stages in warmup (untimed). This measures it: N serve
build+execute rounds with the lock machinery LIVE vs STUBBED
(flock_guard → no-op, _store_lock → no-op context), interleaved,
medians reported; then one fresh-store maintenance tick each way.

Usage: python scripts/r14_serve_lock_ab.py [--n 5]
"""

from __future__ import annotations

import contextlib
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@contextlib.contextmanager
def _noop_guard(*_a, **_k):
    yield False


class _NoopLock:
    def __init__(self, *_a, **_k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def renew(self):
        pass

    @contextlib.contextmanager
    def keepalive(self):
        yield


def main() -> None:
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 5

    from presto_rakam_kafka_spark import locks
    from presto_rakam_kafka_spark import queries_dsv2 as qd
    from presto_rakam_kafka_spark.fixtures import load_catalog, sweep_staging
    from presto_rakam_kafka_spark.session import get_spark
    from presto_rakam_kafka_spark.streaming import serving

    sweep_staging()
    spark = get_spark(app_name="serve_lock_ab")
    load_catalog(spark, SF_DIR)
    # stage the stores once (maintenance, lock machinery live)
    qd.events_serve_rollup_tail(spark, SF_DIR)
    qd.events_serve_rollup_quantiles(spark, SF_DIR)
    qd.events_serve_rollup_topn(spark, SF_DIR)

    live_guard = locks.flock_guard
    live_lock = serving._store_lock

    def serve_round() -> float:
        t0 = time.perf_counter()
        for q in (
            "events_serve_rollup_tail",
            "events_serve_rollup_quantiles",
            "events_serve_rollup_topn",
        ):
            from presto_rakam_kafka_spark import queries as Q

            Q.QUERIES[q](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        return round(time.perf_counter() - t0, 3)

    live, stubbed = [], []
    for _ in range(n):
        live.append(serve_round())
        locks.flock_guard = _noop_guard
        serving._store_lock = _NoopLock
        try:
            stubbed.append(serve_round())
        finally:
            locks.flock_guard = live_guard
            serving._store_lock = live_lock
    print(json.dumps({
        "serve_3rounds_live": live,
        "serve_3rounds_stubbed": stubbed,
        "serve_live_med": statistics.median(live),
        "serve_stub_med": statistics.median(stubbed),
    }))

    # maintenance tick cost, live vs stubbed (fresh store each time)
    import tempfile

    log_dir = qd._segment_log_dir(spark, SF_DIR)
    from presto_rakam_kafka_spark.streaming.serving import (
        _log_end_offsets,
        maintain_rollup,
    )

    cut = int(0.8 * max(_log_end_offsets(log_dir).values()))
    m_live, m_stub = [], []
    for i in range(3):
        s1 = tempfile.mkdtemp(prefix="ab_live_")
        t0 = time.perf_counter()
        maintain_rollup(
            spark, log_dir, s1, qd._serve_cell_fn, qd._SERVE_GROUP,
            qd._serve_merge_exprs(), day_col="day", up_to=cut,
        )
        m_live.append(round(time.perf_counter() - t0, 3))
        s2 = tempfile.mkdtemp(prefix="ab_stub_")
        locks.flock_guard = _noop_guard
        serving._store_lock = _NoopLock
        try:
            t0 = time.perf_counter()
            maintain_rollup(
                spark, log_dir, s2, qd._serve_cell_fn, qd._SERVE_GROUP,
                qd._serve_merge_exprs(), day_col="day", up_to=cut,
            )
            m_stub.append(round(time.perf_counter() - t0, 3))
        finally:
            locks.flock_guard = live_guard
            serving._store_lock = live_lock
    print(json.dumps({
        "maintain_live": m_live, "maintain_stubbed": m_stub,
        "maintain_live_med": statistics.median(m_live),
        "maintain_stub_med": statistics.median(m_stub),
    }))


if __name__ == "__main__":
    main()
