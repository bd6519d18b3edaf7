"""Bit-exact bound semantics of the _offset pushdown (SURVEY §7 risk 1:
openness bump at KafkaSplitManager.java:174-176, unbounded-high→latest
at :163-167). Pure-python, no Spark."""

from __future__ import annotations

from presto_rakam_kafka_spark.plans.offset_pushdown import (
    Bound,
    OffsetRange,
    extract_offset_ranges,
    range_from_bounds,
    ranges_to_scan_bounds,
)


def test_closed_bounds():
    # _offset BETWEEN 10 AND 20 → [10, 21)
    assert range_from_bounds(Bound(10, True), Bound(20, True)) == OffsetRange(10, 21)


def test_open_low_bound_bumps():
    # _offset > 10 → start 11 (the EXACTLY bump)
    assert range_from_bounds(Bound(10, False), Bound(None)) == OffsetRange(11, None)


def test_open_high_bound_is_exclusive_end():
    # _offset < 20 → end 20 (end-exclusive split contract)
    assert range_from_bounds(Bound(None), Bound(20, False)) == OffsetRange(0, 20)


def test_unbounded_high_resolves_to_latest():
    ranges = [OffsetRange(5, None)]
    assert ranges_to_scan_bounds(ranges, earliest=0, latest=100) == [(5, 100)]


def test_clamping_to_earliest_and_empty():
    assert ranges_to_scan_bounds([OffsetRange(0, 10)], earliest=50, latest=100) == []
    assert ranges_to_scan_bounds([OffsetRange(0, 60)], earliest=50, latest=100) == [(50, 60)]


def test_extract_conjunction_intersects():
    ranges, residual = extract_offset_ranges([(">", 10), ("<=", 20), (">=", 12)])
    assert ranges == [OffsetRange(12, 21)]
    assert residual == []


def test_extract_equality_point():
    ranges, _ = extract_offset_ranges([("=", 7)])
    assert ranges == [OffsetRange(7, 8)]


def test_extract_in_points_filtered_by_range():
    ranges, _ = extract_offset_ranges([("in", [1, 5, 9]), (">=", 4)])
    assert ranges == [OffsetRange(5, 6), OffsetRange(9, 10)]


def test_extract_contradiction_is_empty():
    ranges, _ = extract_offset_ranges([(">", 20), ("<", 10)])
    assert ranges == []


def test_unknown_ops_stay_residual():
    ranges, residual = extract_offset_ranges([("like", "x%"), (">=", 3)])
    assert ranges == [OffsetRange(3, None)]
    assert residual == [("like", "x%")]


def test_no_offset_conjuncts_means_no_pruning():
    ranges, residual = extract_offset_ranges([("like", "x%")])
    assert ranges == []
    assert residual == [("like", "x%")]


def test_pushdown_equals_predicate_eval_property():
    """Property (hypothesis): for any conjunction of range ops, the
    extracted scan ranges cover EXACTLY the offsets satisfying the
    predicate — pruning must never change a count
    (TestManySegments.java's exact-count invariant, SURVEY §5)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    DOMAIN = range(0, 64)

    def eval_conjunct(off: int, op: str, val) -> bool:
        if op == ">":
            return off > val
        if op == ">=":
            return off >= val
        if op == "<":
            return off < val
        if op == "<=":
            return off <= val
        if op == "=":
            return off == val
        if op == "between":
            return val[0] <= off <= val[1]
        if op == "in":
            return off in val
        raise AssertionError(op)

    point = st.integers(min_value=-5, max_value=70)
    conjunct = st.one_of(
        st.tuples(st.sampled_from([">", ">=", "<", "<=", "="]), point),
        st.tuples(st.just("between"), st.tuples(point, point)),
        st.tuples(st.just("in"), st.lists(point, min_size=1, max_size=5)),
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(conjunct, min_size=1, max_size=5))
    def check(conjuncts):
        ranges, residual = extract_offset_ranges(conjuncts)
        assert residual == []
        covered = {
            off
            for off in DOMAIN
            for r in ranges
            if off >= r.start and (r.end is None or off < r.end)
        }
        expected = {
            off
            for off in DOMAIN
            if all(eval_conjunct(off, op, val) for op, val in conjuncts)
        }
        assert covered == expected, (conjuncts, sorted(covered), sorted(expected))

    check()


def test_kafka_offsets_json():
    from presto_rakam_kafka_spark.sources.kafka import offsets_json

    starting, ending = offsets_json("tpch_events", [0, 1], 10, 50)
    import json

    assert json.loads(starting) == {"tpch_events": {"0": 10, "1": 10}}
    assert json.loads(ending) == {"tpch_events": {"0": 50, "1": 50}}
    starting, ending = offsets_json("t_c", [0], None, None)
    assert json.loads(starting) == {"t_c": {"0": -2}}
    assert json.loads(ending) == {"t_c": {"0": -1}}
