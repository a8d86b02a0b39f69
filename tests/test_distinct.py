"""HLL distinct-count rollup: estimates vs exact COUNT(DISTINCT), range
composition, and the probe-never-scans discipline."""

from __future__ import annotations

import pytest

from datafusion_uwheel_spark import WheelEngine
from datafusion_uwheel_spark.operators.distinct import build_distinct_rollup
from datafusion_uwheel_spark.sources import read_parquet

A, B = "2024-01-05 00:00:00", "2024-01-12 00:00:00"


@pytest.fixture(scope="module")
def events(spark, sf_small_dir):
    return read_parquet(spark, f"{sf_small_dir}/events.parquet")


@pytest.fixture(scope="module")
def rollup(events):
    r = build_distinct_rollup(events, "ts", "user_id", bucket_seconds=3600)
    yield r
    r.unpersist()


def exact(spark, events, a, b):
    return (
        events.filter(f"ts >= '{a}' AND ts < '{b}'")
        .select("user_id")
        .distinct()
        .count()
    )


def test_estimate_within_hll_error(spark, events, rollup):
    est = rollup.approx_distinct(A, B)
    truth = exact(spark, events, A, B)
    assert truth > 0
    assert abs(est - truth) / truth < 0.05  # lgK=12 → ~1.6% typical


def test_empty_range_is_zero(rollup):
    assert rollup.approx_distinct("2030-01-01 00:00:00", "2030-01-02 00:00:00") == 0


def test_merged_sketch_composes_across_ranges(spark, events, rollup):
    """Union of two half-range sketches must estimate the full range —
    the mergeable-monoid property that makes this a wheel state."""
    from pyspark.sql import functions as F

    mid = "2024-01-08 00:00:00"
    s1 = rollup.merged_sketch(A, mid)
    s2 = rollup.merged_sketch(mid, B)
    merged_est = (
        spark.createDataFrame([(s1,), (s2,)], "sk binary")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert merged_est == rollup.approx_distinct(A, B)


def test_unaligned_start_includes_leading_partial_bucket(spark, events, rollup):
    """An unaligned range start must include the leading partially-covered
    bucket whole (superset semantics) — never silently drop it and
    undercount. With 3600 s buckets, starting mid-bucket must give the
    same estimate as starting at the bucket boundary."""
    unaligned = "2024-01-05 00:30:00"  # mid-bucket for bucket_seconds=3600
    aligned = "2024-01-05 00:00:00"
    assert rollup.approx_distinct(unaligned, B) == rollup.approx_distinct(aligned, B)


def test_engine_no_rollup_raises_keyerror(spark, events):
    """approx_distinct on an engine that never built a distinct index must
    raise the documented KeyError, not AttributeError."""
    eng = WheelEngine(spark, "ev_no_rollup", events, time_column="ts")
    with pytest.raises(KeyError):
        eng.approx_distinct("user_id", A, B)


def test_engine_facade(spark, sf_small_dir, events):
    eng = WheelEngine(
        spark, "ev_distinct", events, time_column="ts"
    )
    eng.build_distinct_index("user_id")
    est = eng.approx_distinct("user_id", A, B)
    truth = exact(spark, events, A, B)
    assert abs(est - truth) / truth < 0.05
    with pytest.raises(KeyError):
        eng.approx_distinct("value", A, B)  # approximate answers are opt-in
