"""Theta-sketch rollup: distinct-set ALGEBRA across time ranges (retained /
new / jaccard) vs exact SQL, streamed-vs-batch equality, save/load, and the
engine's opt-in discipline.

Theta sketches store values exactly below the nominal-entries threshold
(lg_k=12 → 4096), so the controlled-membership fixtures assert EXACT
answers; the sf-data test asserts the documented error bound instead."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark import WheelEngine
from datafusion_uwheel_spark.operators.theta import (
    build_theta_rollup,
    load_theta_rollup,
)
from datafusion_uwheel_spark.sources import read_parquet

R1 = ("2024-01-01 00:00:00", "2024-01-08 00:00:00")
R2 = ("2024-01-08 00:00:00", "2024-01-15 00:00:00")

# Controlled membership: week 1 = users 0..99, week 2 = users 50..169.
#   retained (∩)         = 50..99           → 50
#   new in week 2 (r2−r1) = 100..169        → 70
#   churned (r1−r2)       = 0..49           → 50
#   union                 = 0..169          → 170
W1 = range(100)
W2 = range(50, 170)


@pytest.fixture(scope="module")
def cohort(spark):
    """Each user appears in TWO buckets of their week so per-bucket
    sketches genuinely merge, under a parity segment for the keyed form."""
    rows = []
    for u in W1:
        rows.append(("2024-01-02 10:00:00", u, "a" if u % 2 else "b"))
        rows.append(("2024-01-06 22:00:00", u, "a" if u % 2 else "b"))
    for u in W2:
        rows.append(("2024-01-09 10:00:00", u, "a" if u % 2 else "b"))
        rows.append(("2024-01-13 22:00:00", u, "a" if u % 2 else "b"))
    df = spark.createDataFrame(rows, "ts string, user_id long, seg string")
    return df.select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id", "seg"
    )


@pytest.fixture(scope="module")
def rollup(cohort):
    r = build_theta_rollup(cohort, "ts", "user_id", bucket_seconds=3600)
    yield r
    r.unpersist()


def test_exact_set_algebra_small(rollup):
    assert rollup.approx_distinct(*R1) == 100
    assert rollup.approx_distinct(*R2) == 120
    assert rollup.approx_retained(R1, R2) == 50
    assert rollup.approx_jaccard(R1, R2) == pytest.approx(50 / 170)


def test_difference_is_directional(rollup):
    assert rollup.approx_new(R1, R2) == 70  # joined in week 2
    assert rollup.approx_new(R2, R1) == 50  # churned after week 1


def test_empty_ranges(rollup):
    empty = ("2030-01-01 00:00:00", "2030-01-02 00:00:00")
    assert rollup.approx_distinct(*empty) == 0
    assert rollup.approx_retained(empty, R1) == 0
    assert rollup.approx_new(empty, R1) == 100  # everything in R1 is new
    assert rollup.approx_new(R1, empty) == 0
    assert rollup.approx_jaccard(empty, empty) == 0.0


def test_retained_by_key_cohorts(cohort):
    r = build_theta_rollup(
        cohort, "ts", "user_id", bucket_seconds=3600, partition_by="seg"
    )
    try:
        rows = {x["seg"]: x for x in r.retained_by_key(R1, R2).collect()}
        # seg 'a' = odd users: 50 in week 1, 60 in week 2, retained = odd
        # users in 50..99 → 25; same split for 'b' (even)
        assert rows["a"]["n_r1"] == 50 and rows["a"]["n_r2"] == 60
        assert rows["a"]["n_retained"] == 25
        assert rows["b"]["n_retained"] == 25
        # unkeyed asks on the keyed rollup union across keys — never
        # double-count
        assert r.approx_distinct(*R1) == 100
        assert r.approx_retained(R1, R2) == 50
    finally:
        r.unpersist()


def test_unkeyed_rollup_refuses_cohort_table(rollup):
    with pytest.raises(ValueError):
        rollup.retained_by_key(R1, R2)


def test_streamed_equals_batch(spark, cohort):
    """merge_batch over halves ≡ one batch build (mergeable monoid)."""
    first = cohort.filter(f"ts < '{R2[0]}'")
    second = cohort.filter(f"ts >= '{R2[0]}'")
    streamed = build_theta_rollup(first, "ts", "user_id", bucket_seconds=3600)
    batch = build_theta_rollup(cohort, "ts", "user_id", bucket_seconds=3600)
    try:
        streamed.merge_batch(second, "ts")
        for ask in (
            lambda r: r.approx_distinct(*R1),
            lambda r: r.approx_distinct(*R2),
            lambda r: r.approx_retained(R1, R2),
            lambda r: r.approx_new(R1, R2),
        ):
            assert ask(streamed) == ask(batch)
    finally:
        streamed.unpersist()
        batch.unpersist()


def test_save_load_round_trip(spark, rollup, tmp_path):
    p = str(tmp_path / "theta_rollup")
    rollup.save(p)
    loaded = load_theta_rollup(spark, p)
    try:
        assert loaded.approx_distinct(*R1) == rollup.approx_distinct(*R1)
        assert loaded.approx_retained(R1, R2) == rollup.approx_retained(R1, R2)
        assert loaded.bucket_seconds == rollup.bucket_seconds
        assert loaded.column == rollup.column
    finally:
        loaded.unpersist()


def test_sf_data_error_bound(spark, sf_small_dir):
    """Real testdata: estimates within the documented bound of exact SQL."""
    events = read_parquet(spark, f"{sf_small_dir}/events.parquet")
    r = build_theta_rollup(events, "ts", "user_id", bucket_seconds=3600)
    try:
        a, b = "2024-01-05 00:00:00", "2024-01-12 00:00:00"
        truth = (
            events.filter(f"ts >= '{a}' AND ts < '{b}'")
            .select("user_id")
            .distinct()
            .count()
        )
        assert truth > 0
        est = r.approx_distinct(a, b)
        assert abs(est - truth) / truth < 0.05
        mid = "2024-01-08 00:00:00"
        inter = (
            events.filter(f"ts >= '{a}' AND ts < '{mid}'")
            .select("user_id")
            .intersect(
                events.filter(f"ts >= '{mid}' AND ts < '{b}'").select("user_id")
            )
            .count()
        )
        got = r.approx_retained((a, mid), (mid, b))
        assert abs(got - inter) <= max(2, 0.1 * inter)
    finally:
        r.unpersist()


def test_maintainer_streams_theta(spark, cohort):
    """The streaming maintainer carries theta rollups like the HLL/KLL
    ones: after merging the second week as a micro-batch, set-algebra
    answers equal a fresh build over everything."""
    from datafusion_uwheel_spark.streaming.maintenance import (
        StreamingWheelMaintainer,
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="uwheel_theta_stream_")
    first = cohort.filter(f"ts < '{R2[0]}'")
    first.write.mode("overwrite").parquet(f"{d}/events.parquet")
    eng = WheelEngine(
        spark, "events", f"{d}/events.parquet", time_column="ts"
    )
    eng.build_index("user_id")
    eng.build_theta_index("user_id", bucket_seconds=3600)
    StreamingWheelMaintainer(eng).merge_batch(
        cohort.filter(f"ts >= '{R2[0]}'")
    )
    assert eng.approx_retained("user_id", R1, R2) == 50
    assert eng.approx_new("user_id", R1, R2) == 70


def test_engine_glue_and_persistence(spark, sf_small_dir, tmp_path):
    eng = WheelEngine(
        spark, "events", f"{sf_small_dir}/events.parquet", time_column="ts"
    )
    with pytest.raises(KeyError):
        eng.approx_retained("user_id", R1, R2)  # opt-in, never silent
    eng.build_theta_index("user_id", bucket_seconds=3600)
    n = eng.approx_retained("user_id", R1, R2)
    assert n >= 0
    j = eng.approx_jaccard("user_id", R1, R2)
    assert 0.0 <= j <= 1.0
    eng.build_index("value")  # save_indexes requires at least one wheel
    out = str(tmp_path / "idx")
    eng.save_indexes(out)
    eng2 = WheelEngine(
        spark,
        "events",
        f"{sf_small_dir}/events.parquet",
        time_column="ts",
        load_indexes=out,
    )
    assert eng2.approx_retained("user_id", R1, R2) == n


def test_retention_series(spark, cohort):
    """Weekly retention series over the controlled cohort: week 2 retains
    exactly the 50..99 overlap; the first period has NULL prev columns."""
    r = build_theta_rollup(cohort, "ts", "user_id", bucket_seconds=3600)
    try:
        rows = r.retention_by("week").collect()
        assert len(rows) == 2
        first, second = rows
        assert first["n_curr"] == 100
        assert first["n_prev"] is None and first["retention"] is None
        assert second["n_curr"] == 120
        assert second["n_prev"] == 100
        assert second["n_retained"] == 50
        assert second["retention"] == pytest.approx(0.5)
        # integer 7-day tumbling windows are EPOCH-aligned (boundaries on
        # Thursdays — 1970-01-01), splitting the cohort differently than
        # calendar weeks: [.., Jan 4) holds W1's Jan 2; [Jan 4, 11) holds
        # W1's Jan 6 AND W2's Jan 9 (170 distinct); [Jan 11, ..) holds
        # W2's Jan 13. Retained: 100 (W1∩(W1∪W2)), then 120 ((W1∪W2)∩W2).
        rows2 = r.retention_by(7 * 86400).collect()
        assert [x["n_retained"] for x in rows2] == [None, 100, 120]
        assert [x["n_curr"] for x in rows2] == [100, 170, 120]
        with pytest.raises(ValueError):
            r.retention_by(3600 - 1)  # width the buckets don't tile
    finally:
        r.unpersist()


def test_engine_retention_series(spark, cohort, tmp_path):
    src = str(tmp_path / "cohort.parquet")
    cohort.write.mode("overwrite").parquet(src)
    eng = WheelEngine(spark, "cohort", src, time_column="ts")
    eng.build_theta_index("user_id", bucket_seconds=3600)
    got = eng.theta_retention_by("user_id", "week").collect()
    assert [x["n_retained"] for x in got] == [None, 50]


# ------------------------------------------------- property: random ranges
from datetime import datetime, timedelta
import random as _random

from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def random_rollup(spark):
    """One seeded random timeline (≤400 distinct users — below the theta
    exactness threshold), probed with hypothesis-drawn range pairs."""
    rng = _random.Random(7)
    base = datetime(2024, 3, 1)
    rows = []
    for day in range(14):
        for u in rng.sample(range(400), rng.randint(20, 120)):
            rows.append((base + timedelta(days=day, hours=rng.randint(0, 23)), u))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    r = build_theta_rollup(df, "ts", "user_id", bucket_seconds=3600)
    yield r, rows, base
    r.unpersist()


@given(
    d1=st.integers(0, 13),
    l1=st.integers(1, 4),
    d2=st.integers(0, 13),
    l2=st.integers(1, 4),
)
@settings(max_examples=12, deadline=None)
def test_theta_algebra_matches_exact_sets(random_rollup, d1, l1, d2, l2):
    """Every set-algebra ask over random day ranges equals exact Python
    set arithmetic (sketches are exact below the nominal threshold)."""
    r, rows, base = random_rollup

    def span(d, l):
        a = base + timedelta(days=d)
        b = base + timedelta(days=min(d + l, 14))
        return (str(a), str(b)), {u for ts, u in rows if a <= ts < b}

    r1, s1 = span(d1, l1)
    r2, s2 = span(d2, l2)
    assert r.approx_distinct(*r1) == len(s1)
    assert r.approx_retained(r1, r2) == len(s1 & s2)
    assert r.approx_new(r1, r2) == len(s2 - s1)
    union = len(s1 | s2)
    want_j = (len(s1 & s2) / union) if union else 0.0
    assert r.approx_jaccard(r1, r2) == pytest.approx(want_j)


def test_retention_series_no_global_window(spark, cohort):
    """r15 verdict #6: the previous-occupied-period lag must not plan a
    single-partition global window (the r14 `Window.orderBy` with no
    partitionBy) — the lag runs inside bounded coarse partitions with a
    boundary stitch, and the stitched series is row-identical to the
    direct path at every granularity, partition boundaries included."""
    r = build_theta_rollup(cohort, "ts", "user_id", bucket_seconds=3600)
    try:
        df = r.retention_by("week")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
        # granularity = one bucket → every period its own row; with the
        # stitch, periods crossing the 8192-period partition boundary
        # still see their true predecessor
        fine = [tuple(x) for x in r.retention_by(3600).collect()]
        assert [tuple(x) for x in r.retention_rows_by(3600)] == fine
        # the boundary stitch takes the LAST period of the previous
        # partition: force a tiny partition width so several boundaries
        # exist in even this cohort
        old = type(r)._LAG_PARTITION_PERIODS
        try:
            type(r)._LAG_PARTITION_PERIODS = 2
            r.invalidate_asks()
            stitched = [tuple(x) for x in r.retention_by(3600).collect()]
        finally:
            type(r)._LAG_PARTITION_PERIODS = old
        assert stitched == fine
    finally:
        r.unpersist()


def test_retention_lag_plan_choice(spark, cohort):
    """r15: retention_by picks its lag plan from a DRIVER-SIDE period-count
    proof. A fresh build records the materializing count, so the bounded
    single-window plan fires (no boundary re-aggregation, no broadcast
    join, no SinglePartition in the plan); with the proof erased (no
    recorded rows, no collected mirror) the stitch is the fallback — and
    both produce identical rows."""
    r = build_theta_rollup(cohort, "ts", "user_id", bucket_seconds=3600)
    try:
        assert r._rollup_rows is not None  # the build's count is recorded
        df = r.retention_by("week")
        bounded = [tuple(x) for x in df.collect()]
        assert r._last_lag_path == "bounded"
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
        assert "BroadcastHashJoin" not in plan, plan  # no stitch machinery

        # erase every proof: unknown row count, retired mirror
        r._rollup_rows = None
        r._drop_mirror()
        r.invalidate_asks()
        stitched = [tuple(x) for x in r.retention_by("week").collect()]
        assert r._last_lag_path == "stitch"
        assert stitched == bounded

        # the mirror span alone (once re-collected) restores the proof
        r._warm_mirror("__theta")
        if r._mirror_ref.get("m") not in (None, False):
            again = [tuple(x) for x in r.retention_by("week").collect()]
            assert r._last_lag_path == "bounded"
            assert again == bounded
    finally:
        r.unpersist()
