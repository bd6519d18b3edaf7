"""Planning-level rewrites (the engine's custom optimizer steps).

Everything else optimizer-ish (column pruning, constant folding, join
reordering, codegen, AQE) is delegated to Catalyst — SURVEY §4 shows the
reference's only nontrivial rewrite is the ``_offset`` pushdown, rebuilt
in :mod:`.offset_pushdown`.
"""

from presto_rakam_kafka_spark.plans.offset_pushdown import (
    Bound,
    OffsetRange,
    extract_offset_ranges,
    ranges_to_scan_bounds,
)

__all__ = ["Bound", "OffsetRange", "extract_offset_ranges", "ranges_to_scan_bounds"]
