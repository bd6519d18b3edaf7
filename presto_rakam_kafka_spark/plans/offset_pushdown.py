"""``_offset`` predicate pushdown → scan-range pruning.

Rebuilds the reference's only custom optimization (SURVEY §4 O1):
``KafkaSplitManager`` lifts ``_offset`` ranges out of the query's
``TupleDomain`` (``KafkaSplitManager.java:93-106``) and converts each
range into split start/end offsets (``KafkaSplitManager.java:153-178``),
with two subtleties we reproduce bit-exactly:

* **Bound openness** (``KafkaSplitManager.java:174-176``): a low bound
  that is not ``EXACTLY`` (i.e. ``_offset > v``) starts the scan at
  ``v + 1``; an inclusive high bound (``_offset <= v``) ends the
  end-exclusive scan at ``v + 1``.
* **Unbounded high resolves to the live latest offset**
  (``KafkaSplitManager.java:163-167``): represented here as ``end=None``
  until :func:`ranges_to_scan_bounds` resolves it against the source.

The residual predicate is still applied by Catalyst after the pruned
scan — pruning is an optimization, never a semantic filter (same
division as ``ConnectorPartitionResult``'s residual TupleDomain,
``KafkaSplitManager.java:132``).
"""

from __future__ import annotations

from dataclasses import dataclass

OFFSET_COLUMN = "_offset"


@dataclass(frozen=True)
class Bound:
    """One side of a range; ``value=None`` means unbounded."""

    value: int | None
    inclusive: bool = True


@dataclass(frozen=True)
class OffsetRange:
    """Half-open scan range ``[start, end)``; ``end=None`` = to latest.

    End-exclusivity matches the reference's split contract
    (``KafkaSplit.java:35-60``; end check at
    ``KafkaConnectorPageSource.java:236,251``).
    """

    start: int
    end: int | None

    def is_empty(self) -> bool:
        return self.end is not None and self.end <= self.start


def range_from_bounds(low: Bound, high: Bound) -> OffsetRange:
    """Convert a (low, high) bound pair into a half-open scan range,
    mirroring ``KafkaSplitManager.java:158-178`` bound handling."""
    if low.value is None:
        start = 0
    elif low.inclusive:
        start = low.value
    else:  # _offset > v  → start at v+1 (the EXACTLY bump, :174-176)
        start = low.value + 1
    if high.value is None:
        end: int | None = None
    elif high.inclusive:  # _offset <= v → end-exclusive v+1
        end = high.value + 1
    else:  # _offset < v → end-exclusive v
        end = high.value
    return OffsetRange(start=max(start, 0), end=end)


# -- conjunct extraction -------------------------------------------------

#: A conjunct is (op, value) over the _offset column.
#: Supported ops: '>', '>=', '<', '<=', '=', 'between' (value=(lo, hi)),
#: 'in' (value=iterable of points).
Conjunct = tuple[str, object]


def extract_offset_ranges(
    conjuncts: list[Conjunct],
) -> tuple[list[OffsetRange], list[Conjunct]]:
    """Split a conjunction into (offset scan ranges, residual conjuncts).

    AND-semantics: all range-producing conjuncts intersect into one
    range; an ``in`` conjunct intersects point-wise, producing multiple
    ranges (the reference iterates domain ranges the same way,
    ``KafkaSplitManager.java:158``). Unknown ops stay residual.
    """
    low = Bound(None)
    high = Bound(None)
    points: set[int] | None = None
    residual: list[Conjunct] = []
    consumed = False

    def tighten_low(v: int, inclusive: bool) -> None:
        nonlocal low
        eff = v if inclusive else v + 1
        cur = -1 if low.value is None else (low.value if low.inclusive else low.value + 1)
        if eff > cur:
            low = Bound(v, inclusive)

    def tighten_high(v: int, inclusive: bool) -> None:
        nonlocal high
        eff = v + 1 if inclusive else v
        if high.value is None:
            high = Bound(v, inclusive)
        else:
            cur = high.value + 1 if high.inclusive else high.value
            if eff < cur:
                high = Bound(v, inclusive)

    for op, val in conjuncts:
        if op == ">":
            tighten_low(int(val), False)  # type: ignore[arg-type]
        elif op == ">=":
            tighten_low(int(val), True)  # type: ignore[arg-type]
        elif op == "<":
            tighten_high(int(val), False)  # type: ignore[arg-type]
        elif op == "<=":
            tighten_high(int(val), True)  # type: ignore[arg-type]
        elif op == "=":
            tighten_low(int(val), True)  # type: ignore[arg-type]
            tighten_high(int(val), True)  # type: ignore[arg-type]
        elif op == "between":
            lo, hi = val  # type: ignore[misc]
            tighten_low(int(lo), True)
            tighten_high(int(hi), True)
        elif op == "in":
            pts = {int(v) for v in val}  # type: ignore[union-attr]
            points = pts if points is None else points & pts
        else:
            residual.append((op, val))
            continue
        consumed = True

    if not consumed:
        return [], residual

    base = range_from_bounds(low, high)
    if points is not None:
        ranges = [
            OffsetRange(p, p + 1)
            for p in sorted(points)
            if p >= base.start and (base.end is None or p < base.end)
        ]
    else:
        ranges = [] if base.is_empty() else [base]
    return ranges, residual


def ranges_to_scan_bounds(
    ranges: list[OffsetRange], earliest: int, latest: int
) -> list[tuple[int, int]]:
    """Resolve unbounded/clamped ranges against live partition offsets —
    the reference resolves unbounded-high to the latest offset fetched at
    plan time (``KafkaSplitManager.java:163-167,194-216``).

    Returns concrete non-empty ``[start, end)`` pairs clamped to
    ``[earliest, latest]``.
    """
    out: list[tuple[int, int]] = []
    for r in ranges:
        start = max(r.start, earliest)
        end = latest if r.end is None else min(r.end, latest)
        if end > start:
            out.append((start, end))
    return out
