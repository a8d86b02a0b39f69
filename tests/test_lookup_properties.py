"""Property-based tests for the driver-side WheelIndex lookup math.

Pure numpy (no Spark): randomized event sets are rolled up exactly as the
distributed build would (per-bucket count/sum/min/max/sumsq), then every
range / group-by / merge result is checked against a brute-force recompute
over the raw events. This is the correctness core of the engine — the routed
answers are only as good as these reductions.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_uwheel_spark.functions.timestamps import GRANULARITY_SECONDS
from datafusion_uwheel_spark.operators.lookup import WheelIndex

BASE = 1_700_000_000  # arbitrary epoch anchor


def build_wheel(events: list[tuple[int, float]], bucket_seconds: int = 1) -> WheelIndex:
    """Exact analogue of the distributed rollup, in numpy."""
    secs = np.array([s - s % bucket_seconds for s, _ in events], dtype=np.int64)
    vals = np.array([v for _, v in events], dtype=np.float64)
    order = np.argsort(secs, kind="stable")
    secs, vals = secs[order], vals[order]
    uniq, idx = np.unique(secs, return_index=True)
    return WheelIndex(
        "t",
        "v",
        "*_AGG",
        uniq,
        np.add.reduceat(np.ones_like(vals), idx).astype(np.int64),
        sum_=np.add.reduceat(vals, idx),
        min_=np.minimum.reduceat(vals, idx),
        max_=np.maximum.reduceat(vals, idx),
        sumsq_=np.add.reduceat(vals * vals, idx),
        min_ts_us=int(min(s for s, _ in events)) * 1_000_000,
        max_ts_us=int(max(s for s, _ in events)) * 1_000_000,
        complete=True,
        bucket_seconds=bucket_seconds,
    )


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=BASE, max_value=BASE + 7200),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=300,
)


@given(
    events=events_strategy,
    a=st.integers(min_value=-100, max_value=7300),
    width=st.integers(min_value=0, max_value=7400),
)
@settings(max_examples=200, deadline=None)
def test_combine_range_matches_bruteforce(events, a, width):
    w = build_wheel(events)
    start, end = BASE + a, BASE + a + width
    got = w.combine_range(start, end)
    assert got is not None  # complete wheel answers any valid range
    in_range = [v for s, v in events if start <= s < end]
    assert got["count"] == len(in_range)
    if in_range:
        assert math.isclose(got["sum"], math.fsum(in_range), rel_tol=1e-9, abs_tol=1e-6)
        assert got["min"] == min(in_range)
        assert got["max"] == max(in_range)
        assert math.isclose(
            got["avg"], math.fsum(in_range) / len(in_range), rel_tol=1e-9, abs_tol=1e-6
        )
        mean = math.fsum(in_range) / len(in_range)
        vp = math.fsum((x - mean) ** 2 for x in in_range) / len(in_range)
        assert math.isclose(got["var_pop"], vp, rel_tol=1e-6, abs_tol=1e-3)
    else:
        assert got["sum"] is None and got["min"] is None


@given(
    events=events_strategy,
    gran=st.sampled_from(["second", "minute", "hour"]),
)
@settings(max_examples=100, deadline=None)
def test_group_by_matches_bruteforce(events, gran):
    w = build_wheel(events)
    gs = GRANULARITY_SECONDS[gran]
    start = BASE - BASE % gs
    end = start + 7200 + gs
    got = w.group_by(start, end, gran)
    assert got is not None
    expect: dict[int, list[float]] = {}
    for s, v in events:
        expect.setdefault(s - s % gs, []).append(v)
    assert [b for b, _ in got] == sorted(expect)
    for b, states in got:
        vals = expect[b]
        assert states["count"] == len(vals)
        assert math.isclose(states["sum"], math.fsum(vals), rel_tol=1e-9, abs_tol=1e-6)
        assert states["min"] == min(vals)
        assert states["max"] == max(vals)


@given(
    first=events_strategy,
    second=events_strategy,
)
@settings(max_examples=100, deadline=None)
def test_merge_equals_fresh_build(first, second):
    w = build_wheel(first)
    delta = build_wheel(second)
    w.merge_delta(
        delta.secs, delta.cnt, delta.sum_, delta.min_, delta.max_, delta.sumsq_,
        min_ts_us=delta.min_ts_us, max_ts_us=delta.max_ts_us,
    )
    fresh = build_wheel(first + second)
    assert np.array_equal(w.secs, fresh.secs)
    assert np.array_equal(w.cnt, fresh.cnt)
    assert np.allclose(w.sum_, fresh.sum_)
    assert np.array_equal(w.min_, fresh.min_)
    assert np.array_equal(w.max_, fresh.max_)
    assert np.allclose(w.sumsq_, fresh.sumsq_)
    assert w.min_ts_us == fresh.min_ts_us and w.max_ts_us == fresh.max_ts_us


@given(
    secs=st.lists(
        st.integers(min_value=0, max_value=2_500_000_000), min_size=1, max_size=50
    ),
    gran=st.sampled_from(["month", "quarter", "year"]),
)
@settings(max_examples=200, deadline=None)
def test_calendar_buckets_match_python_datetime(secs, gran):
    from datetime import datetime, timezone

    from datafusion_uwheel_spark.functions.timestamps import bucket_starts

    got = bucket_starts(np.array(secs, dtype=np.int64), gran)
    for s, b in zip(secs, got):
        dt = datetime.fromtimestamp(s, tz=timezone.utc)
        if gran == "month":
            want = dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        elif gran == "quarter":
            want = dt.replace(
                month=(dt.month - 1) // 3 * 3 + 1,
                day=1, hour=0, minute=0, second=0, microsecond=0,
            )
        else:
            want = dt.replace(
                month=1, day=1, hour=0, minute=0, second=0, microsecond=0
            )
        assert int(b) == int(want.timestamp()), (s, gran)


@given(
    events=events_strategy,
    bucket=st.sampled_from([1, 60, 3600]),
    a=st.integers(min_value=-2, max_value=122),
    width=st.integers(min_value=0, max_value=124),
)
@settings(max_examples=100, deadline=None)
def test_coarse_buckets_answer_aligned_ranges(events, bucket, a, width):
    w = build_wheel(events, bucket_seconds=bucket)
    start = (BASE // bucket + a) * bucket
    end = start + width * bucket
    got = w.combine_range(start, end)
    assert got is not None
    in_range = [v for s, v in events if start <= (s - s % bucket) < end]
    assert got["count"] == len(in_range)
    # unaligned boundaries must be refused, never mis-answered
    if bucket > 1:
        assert w.combine_range(start + 1, end) is None
        assert w.count_range(start, end + 1) is None
