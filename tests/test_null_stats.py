"""Zero-job NULL accounting from wheel states: values vs delegated SQL,
drift (group-by) form, span defaults, and the alignment/coverage gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark import WheelEngine

A, B = "2024-01-01 00:00:00", "2024-01-01 04:00:00"


@pytest.fixture(scope="module")
def eng(spark):
    rows = []
    for h in range(4):
        for i in range(50):
            # hour h has h*10 NULLs among its 50 rows
            v = None if i < h * 10 else float(i)
            rows.append((f"2024-01-01 0{h}:00:{i:02d}", v))
    df = spark.createDataFrame(rows, "ts string, v double").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "v"
    )
    e = WheelEngine(spark, "nullstats", df, time_column="ts")
    e.build_index("v")
    return e


def test_range_matches_sql(spark, eng):
    got = eng.null_stats("v", A, B)
    want = spark.sql(
        f"SELECT COUNT(*) AS n, COUNT(v) AS vn FROM nullstats "
        f"WHERE ts >= '{A}' AND ts < '{B}'"
    ).collect()[0]
    assert got["rows"] == want["n"] == 200
    assert got["nulls"] == want["n"] - want["vn"] == 60
    assert abs(got["null_ratio"] - 0.3) < 1e-12


def test_defaults_cover_whole_span_with_zero_jobs(spark, eng):
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    got = eng.null_stats("v")
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "null_stats launched Spark jobs"
    assert got == {"rows": 200, "nulls": 60, "null_ratio": 0.3}


def test_drift_by_hour_matches_sql(spark, eng):
    got = {
        r["bucket"]: (r["rows"], r["nulls"], r["null_ratio"])
        for r in eng.null_stats_by("v", "hour").collect()
    }
    want = spark.sql(
        "SELECT date_trunc('hour', ts) AS b, COUNT(*) n, COUNT(v) vn "
        "FROM nullstats GROUP BY 1"
    ).collect()
    assert len(got) == len(want) == 4
    for r in want:
        rows, nulls, ratio = got[r["b"]]
        assert rows == r["n"] and nulls == r["n"] - r["vn"]
        assert abs(ratio - nulls / rows) < 1e-12
    # drift is visible: ratios ascend 0.0 → 0.6 across the hours
    ratios = [v[2] for _, v in sorted(got.items())]
    assert ratios == sorted(ratios) and ratios[0] == 0.0 and ratios[-1] == 0.6


def test_tumbling_width_form(eng):
    rows = eng.null_stats_by("v", 7200, A, B).collect()
    assert len(rows) == 2
    assert [r["nulls"] for r in rows] == [10, 50]


def test_value_range_drift_matches_sql(spark, eng):
    got = {
        r["bucket"]: (r["min_value"], r["max_value"])
        for r in eng.value_range_by("v", "hour").collect()
    }
    want = spark.sql(
        "SELECT date_trunc('hour', ts) AS b, MIN(v) lo, MAX(v) hi "
        "FROM nullstats GROUP BY 1"
    ).collect()
    assert len(got) == len(want) == 4
    for r in want:
        assert got[r["b"]] == (r["lo"], r["hi"])


def test_per_key_null_drift_matches_sql(spark):
    rows = []
    for h in range(3):
        for i in range(40):
            seg = "a" if i % 2 == 0 else "b"
            # segment b degrades over time; a stays clean
            v = None if (seg == "b" and i < h * 12) else float(i)
            rows.append((f"2024-01-01 0{h}:00:{i:02d}", seg, v))
    df = spark.createDataFrame(rows, "ts string, seg string, v double").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "seg", "v"
    )
    e = WheelEngine(spark, "nullseg", df, time_column="ts")
    e.build_partitioned_index("v", partition_by="seg")
    got = {
        r["key"]: (r["rows"], r["nulls"])
        for r in e.null_stats_by_key("v", "seg").collect()
    }
    want = spark.sql(
        "SELECT seg, COUNT(*) n, COUNT(v) vn FROM nullseg GROUP BY seg"
    ).collect()
    assert len(got) == len(want) == 2
    for r in want:
        assert got[r["seg"]] == (r["n"], r["n"] - r["vn"])
    # seg b holds the odd i's: nulls per hour = |{odd i < h*12}| = 0, 6, 12
    assert got["a"][1] == 0 and got["b"][1] == 18
    # restricted range: only hour 2
    h2 = {
        r["key"]: r["nulls"]
        for r in e.null_stats_by_key(
            "v", "seg", "2024-01-01 02:00:00", "2024-01-01 03:00:00"
        ).collect()
    }
    assert h2 == {"a": 0, "b": 12}


def test_gates(spark, eng):
    with pytest.raises(KeyError):
        eng.null_stats("missing", A, B)
    with pytest.raises(ValueError, match="aligned"):
        eng.null_stats("v", "2024-01-01 00:00:00.500", B)
    # second-granularity buckets tile ANY integer width — 7 s windows work
    assert eng.null_stats_by("v", 7, A, B).count() > 0
    with pytest.raises(ValueError, match="not answerable"):
        eng.null_stats_by("v", "fortnight", A, B)  # unknown granularity
