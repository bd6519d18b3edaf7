"""Kernel-flock guards shared by every tier that publishes atomic
pointer/generation flips (serving store, CDC snapshot, segment-log
maintenance).

Round-12 lesson, promoted to a module: **no observe-then-mutate
protocol over a bare lock path is sound** — ``rename``/``remove`` act
on the PATH, not the file observed, so every TTL-file steal variant
(remove, blind rename, rename + content-verify + restore) re-admits a
double hold through the vacant-path window between a winner's steal
and its re-create (stress-verified: 148/200 double-holds at 4-way
contention). ``fcntl.flock`` is the primitive that closes it: atomic,
held for the µs of one check-or-mutate step, and CRASH-RELEASED by the
kernel, so no staleness/steal protocol exists at all.

Scope of the guarantee: flock spans processes on one host and NFSv4
mounts. It does NOT span object stores or NFSv3 — there every caller
degrades to its documented fallback (generation FENCES for commit
safety, TTL leases for cooperative exclusion), which is why flip-time
fences stay in place everywhere flock is used.
"""

from __future__ import annotations

import os
from contextlib import contextmanager


def _unsupported_errnos() -> frozenset:
    import errno

    return frozenset(
        getattr(errno, name)
        for name in ("ENOTSUP", "EOPNOTSUPP", "ENOLCK", "EINVAL")
        if hasattr(errno, name)
    )


#: errnos meaning "this filesystem has no flock semantics" — callers
#: DEGRADE on these (fence-only / TTL-only), never retry or crash.
FLOCK_UNSUPPORTED_ERRNOS = _unsupported_errnos()


@contextmanager
def flock_guard(lock_path: str):
    """Hold an exclusive kernel flock on ``lock_path`` (created empty if
    absent) for the duration of the block — BLOCKING acquire, so use it
    only around short critical sections or whole maintenance ops whose
    concurrent twin should wait, not fail. Yields True when the lock
    was actually taken, False when the filesystem has no flock
    semantics (the caller's fence/TTL fallback is then load-bearing).
    The lock file's content is meaningless; closing the fd releases the
    lock, and the kernel releases it on crash."""
    import fcntl

    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    try:
        held = True
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
        except OSError as exc:
            if exc.errno not in FLOCK_UNSUPPORTED_ERRNOS:
                raise
            held = False
        yield held
    finally:
        os.close(fd)
