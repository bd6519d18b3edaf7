"""Liveness-keyed staging sweep (ADVICE r9, medium): only dirs provably
owned by DEAD runs are removed — pid-marked names whose pid is gone.
Live-pid dirs, unmarked legacy names, and foreign 'ck_'-colliding files
are never touched regardless of age."""

import os
import subprocess
import tempfile
import time

from presto_rakam_kafka_spark.fixtures import (
    _PID_MARK,
    staging_mkdtemp,
    sweep_staging,
)


def test_staging_mkdtemp_embeds_live_pid():
    d = staging_mkdtemp("ckpt_test_")
    try:
        m = _PID_MARK.search(os.path.basename(d))
        assert m, d
        assert int(m.group(1)) == os.getpid()
    finally:
        os.rmdir(d)


def test_sweep_spares_live_pid_dir_however_old():
    d = staging_mkdtemp("ckpt_test_")
    try:
        old = time.time() - 7 * 86400
        os.utime(d, (old, old))
        sweep_staging(max_age_s=0.0)
        assert os.path.isdir(d), "live-pid staging dir was swept"
    finally:
        os.rmdir(d)


def test_sweep_removes_dead_pid_dir_and_counts_bytes():
    # a real dead pid: spawn a child that exits, then mint its name
    child = subprocess.Popen(["true"])
    child.wait()  # reaped → pid is dead
    dead = child.pid
    d = tempfile.mkdtemp(prefix=f"ckpt_test_p{dead}x")
    with open(os.path.join(d, "junk.bin"), "wb") as fh:
        fh.write(b"x" * 128)
    stats = sweep_staging(max_age_s=0.0)
    assert not os.path.exists(d), "dead-pid staging dir survived"
    assert stats["dirs_removed"] >= 1
    assert stats["bytes_freed"] >= 128


def test_sweep_leaves_unmarked_and_foreign_names_alone():
    # legacy dir without a pid marker + a foreign tool's file that
    # happens to share the 'ck_' prefix: both old, both spared
    legacy = tempfile.mkdtemp(prefix="ckpt_legacy_nomark_")
    foreign = os.path.join(tempfile.gettempdir(), "ck_foreign_tool.dat")
    with open(foreign, "w") as fh:
        fh.write("not ours")
    try:
        old = time.time() - 7 * 86400
        os.utime(legacy, (old, old))
        os.utime(foreign, (old, old))
        sweep_staging(max_age_s=0.0)
        assert os.path.isdir(legacy), "unmarked legacy dir was swept"
        assert os.path.exists(foreign), "foreign ck_ file was swept"
    finally:
        if os.path.isdir(legacy):
            os.rmdir(legacy)
        if os.path.exists(foreign):
            os.remove(foreign)


def test_sweep_spares_spark_scratch_while_jvm_lives():
    # the test session itself keeps a JVM alive, so scratch is spared
    # even past the age gate (liveness, not mtime, is the evidence)
    d = tempfile.mkdtemp(prefix="spark-test-scratch-")
    try:
        old = time.time() - 7 * 86400
        os.utime(d, (old, old))
        # only meaningful when a JVM actually runs; the conftest Spark
        # session guarantees one in the full suite, but guard anyway
        from presto_rakam_kafka_spark.fixtures import _live_java_for_uid

        if _live_java_for_uid():
            sweep_staging(max_age_s=0.0, spark_scratch_age_s=0.0)
            assert os.path.isdir(d), "spark scratch swept under a live JVM"
    finally:
        if os.path.isdir(d):
            os.rmdir(d)
