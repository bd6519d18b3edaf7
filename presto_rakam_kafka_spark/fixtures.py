"""Fixture wiring: the driver-generated parquet tables (TESTDATA.md) as
event tables in an :class:`EventCatalog` and as plain temp views.

The star-schema tables register under project ``tpch``; ``events``
doubles as the Rakam event-table analog with ``event_id`` as the
``_offset`` column (FIXTURES.md §2).
"""

from __future__ import annotations

import os
import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from presto_rakam_kafka_spark.catalog import EventCatalog
from presto_rakam_kafka_spark.metastore import InMemoryMetastore

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Monotone column exposed as _offset per table (FIXTURES.md §2 notes
#: event_id doubles as the offset analog; keys serve elsewhere).
OFFSET_COLUMNS = {
    "events": "event_id",
    "orders": "o_orderkey",
    "lineitem": None,  # composite key; falls back to monotone id
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "nation": "n_nationkey",
    "region": "r_regionkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return str(Path(sf_dir) / f"{name}.parquet")


#: parquet TIMESTAMP(NANOS) columns per table. Spark 4 rejects the nanos
#: parquet type outright (PARQUET_TYPE_ILLEGAL); we read them as long
#: (legacy conf) and rebuild a µs TimestampType with an exact integer
#: div — the fixture generator writes µs-precision values, so this is
#: lossless and matches DuckDB's TIMESTAMP (µs) view of the same file.
NANOS_TS_COLUMNS = {"events": ["ts"]}


_CATALOG_CACHE: dict[tuple[int, str, str], EventCatalog] = {}


def load_catalog(spark: SparkSession, sf_dir: str, project: str = "tpch") -> EventCatalog:
    """Register every fixture table as a (project, collection) event table.

    Memoized per (session, sf_dir): schema registration costs one
    parquet-footer read per table and must not be paid per query.
    """
    key = (id(spark), str(sf_dir), project)
    cached = _CATALOG_CACHE.get(key)
    if cached is not None:
        return cached
    ms = InMemoryMetastore()
    catalog = EventCatalog(spark, ms)
    for name in TABLES:
        path = table_path(sf_dir, name)
        schema = read_table(spark, sf_dir, name).schema
        ms.register_struct(project, name, schema)
        catalog.register_parquet(
            project,
            name,
            path,
            offset_column=OFFSET_COLUMNS.get(name),
            nanos_ts_columns=tuple(NANOS_TS_COLUMNS.get(name, ())),
        )
    _CATALOG_CACHE[key] = catalog
    return catalog


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F

    nanos_cols = NANOS_TS_COLUMNS.get(name, [])
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    dtypes = dict(df.dtypes)
    for c in nanos_cols:
        # Rebuild only when the file really holds TIMESTAMP(NANOS) (read
        # as long under the legacy conf); µs-precision files arrive as
        # native timestamps. Either way normalize to TIMESTAMP (not NTZ):
        # the session is pinned UTC so the cast is value-preserving, and
        # the engine's time functions (unix_millis etc.) take TIMESTAMP.
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Plain temp views named exactly like the DuckDB oracle's views."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


#: Staging-dir name prefixes this repo's fixtures, gates, and benches
#: create under the system temp dir. Swept age-keyed by
#: :func:`sweep_staging` so repeated runs don't accumulate (round-8
#: forensics found 4.6 GB / 1,800 dirs of stale staging inflating the
#: bench's non-shared tail ~15% — VERDICT r8 #6).
STAGING_PREFIXES = (
    "kafka_segments_", "kafka_segments_avro_", "kafka_keyed_",
    "kafka_purged_", "kafka_compacted_", "tpch_topic_", "merge_shard_",
    "layout_bucket_", "layout_part_", "layout_sorted_", "layout_zorder_",
    "ckpt_", "cdc_ckpt_", "cdc_snap_", "ckpt_neardup_", "stream_",
    "ivfpq_index_", "ivfpq_inc_", "neardup_store_", "neardup_out_",
    "key_lookup_bench_", "cdc_scale_", "cdc_test_", "cdc_gc_", "cdc_tt_",
    "cdc_shard_", "cdc_appid_", "cdc_manifest_", "ck_", "rck_",
    # round 10: serving stores + their fixture logs, the wire-framed
    # log, and the serving-bench staging (all minted pid-marked)
    "serve_store_", "serve_hll_store_", "serve_q_store_",
    "serve_stream_log_", "serve_stream_store_", "kafka_segments_wire_",
    "serve_bench_log_", "serve_bench_store_", "rollup_",
    "serve_stats_store_",
)

#: Spark's own scratch (dead JVMs leave these behind); swept only when
#: NO live JVM of this uid exists, never by age — a long-running
#: session's top dir mtime is not refreshed while jobs run, so age is
#: not evidence of death for these.
SPARK_SCRATCH_PREFIXES = ("spark-", "blockmgr-", "ivy2-")

#: Owner marker embedded in every staging name minted by
#: :func:`staging_mkdtemp`: ``{prefix}p{pid}x{random}``. The sweep
#: parses it back and treats owning-pid liveness — not mtime — as the
#: evidence a dir is garbage.
_PID_MARK = re.compile(r"p(\d+)x")


def staging_mkdtemp(prefix: str, suffix: str = "", dir: str | None = None) -> str:
    """``tempfile.mkdtemp`` with the creating pid embedded in the name
    (``{prefix}p{pid}x{rand}``). Every staging dir this repo mints goes
    through here so :func:`sweep_staging` can prove ownership: a dir
    whose recorded pid is alive is NEVER swept (mtime says nothing
    about liveness — a >1h gate run's fixture dirs are untouched after
    creation), and one whose pid is dead is garbage regardless of
    age."""
    import tempfile

    return tempfile.mkdtemp(prefix=f"{prefix}p{os.getpid()}x", suffix=suffix,
                            dir=dir)


def _pid_alive(pid: int) -> bool:
    """True when ``pid`` exists (EPERM = exists, owned by another uid —
    treated alive: never sweep what we cannot prove dead)."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return True
    return True


def _live_java_for_uid() -> bool:
    """True when any running process of THIS uid is a JVM (/proc scan).
    Spark scratch (spark-*/blockmgr-*) carries no owner pid in its name,
    so the only provable-dead condition is 'this user has zero JVMs'."""
    me = os.getuid()
    try:
        pids = [p for p in os.listdir("/proc") if p.isdigit()]
    except OSError:
        return True  # can't prove anything → treat as live
    for p in pids:
        try:
            if os.stat(f"/proc/{p}").st_uid != me:
                continue
            with open(f"/proc/{p}/comm") as fh:
                if fh.read().strip() == "java":
                    return True
        except OSError:
            continue
    return False


def sweep_staging(max_age_s: float = 3600.0,
                  spark_scratch_age_s: float = 86400.0) -> dict:
    """Liveness-keyed temp-staging sweep, run by ``bench.py`` and the
    gate runner BEFORE their cold pass. Removes ONLY dirs provably
    owned by dead runs:

    - repo staging dirs (``STAGING_PREFIXES``) carrying a
      :func:`staging_mkdtemp` pid marker whose pid is DEAD — swept at
      any age; a marker whose pid is alive (or owned by another uid,
      which reports EPERM) is never touched, however old. Unmarked
      entries matching the prefixes are left alone: in a shared tmpdir
      a bare ``ck_``/``stream_`` name could belong to an unrelated
      tool, and age is not proof of death (ADVICE r9).
    - Spark scratch (``spark-``/``blockmgr-``/``ivy2-``) owned by this
      uid, only when this uid has ZERO live JVMs — dead-JVM leftovers
      by construction. ``spark_scratch_age_s`` is a secondary guard
      against racing a JVM that is just starting.

    Returns {"dirs_removed": n, "bytes_freed": b} so harnesses can log
    the steady state."""
    import shutil
    import tempfile
    import time

    tmp = tempfile.gettempdir()
    now = time.time()
    me = os.getuid()
    removed, freed = 0, 0
    try:
        entries = os.listdir(tmp)
    except OSError:
        return {"dirs_removed": 0, "bytes_freed": 0}
    jvm_alive = None  # lazily computed once, only if scratch candidates exist
    for e in entries:
        fp = os.path.join(tmp, e)
        sweep = False
        if any(e.startswith(p) for p in STAGING_PREFIXES):
            m = _PID_MARK.search(e)
            sweep = bool(m) and not _pid_alive(int(m.group(1)))
        elif any(e.startswith(p) for p in SPARK_SCRATCH_PREFIXES):
            if jvm_alive is None:
                jvm_alive = _live_java_for_uid()
            try:
                owned = os.stat(fp).st_uid == me
                old = now - os.path.getmtime(fp) > spark_scratch_age_s
            except OSError:
                continue
            sweep = owned and old and not jvm_alive
        if not sweep:
            continue
        try:
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(fp) for f in fs
            ) if os.path.isdir(fp) else os.path.getsize(fp)
            if os.path.isdir(fp):
                shutil.rmtree(fp, ignore_errors=True)
            else:
                os.remove(fp)
            removed += 1
            freed += size
        except OSError:
            continue  # raced with a concurrent run — leave it
    return {"dirs_removed": removed, "bytes_freed": freed}
