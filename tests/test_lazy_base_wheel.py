"""r14: the ctor defers the base COUNT wheel's scan when no pruning
columns are requested — the first unfiltered build_index seeds it from its
own single pass (``indices[None]``), so the standard ctor+build sequence
costs ONE table scan instead of two. Any reader that arrives first
materializes the identical wheel through ``_ensure_base``; observable
answers never change."""

from __future__ import annotations

from datafusion_uwheel_spark import WheelEngine
from datafusion_uwheel_spark.operators.lookup import STAR_AGGREGATION_ALIAS


def _jobs(spark):
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])


def test_build_seeds_deferred_base_and_routes_zero_job(spark, sf_small_dir):
    eng = WheelEngine(
        spark, "lzb_events", f"{sf_small_dir}/events.parquet", time_column="ts"
    )
    assert eng._base_pending
    assert STAR_AGGREGATION_ALIAS not in eng.count_wheels
    eng.build_index("value")
    # seeded for free from the build pass — no second scan
    assert not eng._base_pending
    assert STAR_AGGREGATION_ALIAS in eng.count_wheels
    j0 = _jobs(spark)
    rows = eng.sql_rows(
        "SELECT COUNT(*) AS n FROM lzb_events "
        "WHERE ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00'"
    )
    assert eng.last_route.kind == "count_range"
    assert _jobs(spark) == j0  # routed stays zero-job
    want = (
        spark.read.parquet(f"{sf_small_dir}/events.parquet")
        .filter("ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00'")
        .count()
    )
    assert rows[0][0] == want


def test_query_before_any_build_materializes_lazily(spark, sf_small_dir):
    eng = WheelEngine(
        spark, "lzb_events2", f"{sf_small_dir}/events.parquet", time_column="ts"
    )
    q = (
        "SELECT COUNT(*) AS n FROM lzb_events2 "
        "WHERE ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00'"
    )
    rows = eng.sql_rows(q)
    assert eng.last_route.kind == "count_range"
    assert not eng._base_pending
    want = (
        spark.read.parquet(f"{sf_small_dir}/events.parquet")
        .filter("ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00'")
        .count()
    )
    assert rows[0][0] == want
    # second ask is zero-job (the wheel now exists)
    want2 = (
        spark.read.parquet(f"{sf_small_dir}/events.parquet")
        .filter("ts >= '2024-01-03 00:00:00' AND ts < '2024-01-04 00:00:00'")
        .count()
    )
    j0 = _jobs(spark)
    assert eng.sql_rows(q.replace("01-05", "01-04"))[0][0] == want2
    assert _jobs(spark) == j0


def test_minmax_ctor_stays_eager(spark, sf_small_dir):
    eng = WheelEngine(
        spark,
        "lzb_events3",
        f"{sf_small_dir}/events.parquet",
        time_column="ts",
        min_max_columns=("value",),
    )
    # pruning wheels ride the ctor pass, so nothing was deferred
    assert not eng._base_pending
    assert STAR_AGGREGATION_ALIAS in eng.count_wheels
    assert "value" in eng.min_max_wheels


def test_filtered_build_on_deferred_engine_materializes_base(spark, sf_small_dir):
    eng = WheelEngine(
        spark, "lzb_events4", f"{sf_small_dir}/events.parquet", time_column="ts"
    )
    eng.build_index("value", filter="event_type = 'click'")
    # the keyed build widened its span against the (now materialized) base
    assert not eng._base_pending
    assert STAR_AGGREGATION_ALIAS in eng.count_wheels
    rows = eng.sql_rows(
        "SELECT COUNT(*) AS n FROM lzb_events4 WHERE event_type = 'click' "
        "AND ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00'"
    )
    assert eng.last_route.kind == "count_range"
    want = (
        spark.read.parquet(f"{sf_small_dir}/events.parquet")
        .filter(
            "event_type = 'click' AND ts >= '2024-01-03 00:00:00' "
            "AND ts < '2024-01-05 00:00:00'"
        )
        .count()
    )
    assert rows[0][0] == want


def test_introspection_and_persistence_materialize(spark, sf_small_dir, tmp_path):
    eng = WheelEngine(
        spark, "lzb_events5", f"{sf_small_dir}/events.parquet", time_column="ts"
    )
    assert eng.index_usage_bytes() > 0  # reader guard materialized the base
    assert not eng._base_pending
    eng2 = WheelEngine(
        spark, "lzb_events6", f"{sf_small_dir}/events.parquet", time_column="ts"
    )
    out = str(tmp_path / "idx")
    eng2.save_indexes(out)
    eng3 = WheelEngine(
        spark,
        "lzb_events7",
        f"{sf_small_dir}/events.parquet",
        time_column="ts",
        load_indexes=out,
    )
    assert STAR_AGGREGATION_ALIAS in eng3.count_wheels


def test_restricted_first_build_does_not_clobber_deferred_base(
    spark, sf_small_dir
):
    """A time_range-restricted unfiltered build on a deferred-base engine
    must NOT install its span-restricted count wheel as the STAR base (in
    the eager-ctor era the base already existed and the setdefault was a
    no-op); full-span COUNTs must still answer from the true full base."""
    eng = WheelEngine(
        spark, "lzb_events9", f"{sf_small_dir}/events.parquet", time_column="ts"
    )
    eng.build_index(
        "value",
        time_range=("2024-01-03 00:00:00", "2024-01-05 00:00:00"),
    )
    # the restricted build neither seeds nor occupies the base slot
    assert eng._base_pending
    assert STAR_AGGREGATION_ALIAS not in eng.count_wheels
    rows = eng.sql_rows(
        "SELECT COUNT(*) AS n FROM lzb_events9 "
        "WHERE ts >= '2024-01-01 00:00:00' AND ts < '2024-02-01 00:00:00'"
    )
    # the lazily materialized base is COMPLETE: the wide ask routes and
    # matches the raw table
    assert eng.last_route.kind == "count_range"
    assert not eng._base_pending
    base = eng.count_wheels[STAR_AGGREGATION_ALIAS]
    assert base.complete
    want = (
        spark.read.parquet(f"{sf_small_dir}/events.parquet")
        .filter("ts >= '2024-01-01 00:00:00' AND ts < '2024-02-01 00:00:00'")
        .count()
    )
    assert rows[0][0] == want


def test_restricted_build_after_seed_keeps_full_base(spark, sf_small_dir):
    """Inverse order: once the base is seeded by an unrestricted build, a
    later restricted build must leave it untouched (the pre-r14 setdefault
    semantics)."""
    eng = WheelEngine(
        spark, "lzb_events10", f"{sf_small_dir}/events.parquet",
        time_column="ts",
    )
    eng.build_index("value")
    base = eng.count_wheels[STAR_AGGREGATION_ALIAS]
    eng.build_index(
        "value",
        time_range=("2024-01-03 00:00:00", "2024-01-05 00:00:00"),
    )
    assert eng.count_wheels[STAR_AGGREGATION_ALIAS] is base
    assert base.complete


def test_streaming_merge_materializes_before_merge(spark, sf_small_dir):
    from datafusion_uwheel_spark.streaming.maintenance import (
        StreamingWheelMaintainer,
    )

    eng = WheelEngine(
        spark, "lzb_events8", f"{sf_small_dir}/events.parquet", time_column="ts"
    )
    m = StreamingWheelMaintainer(eng)
    batch = spark.read.parquet(f"{sf_small_dir}/events.parquet").limit(10)
    m.merge_batch(batch)
    # base existed BEFORE the merge: it saw the batch and was not rebuilt
    # later from the parquet alone
    assert not eng._base_pending
    assert STAR_AGGREGATION_ALIAS in eng.count_wheels
