"""Bucketized range join vs DuckDB's inequality-join oracle — and a plan
check that the bucketization actually produced an equi-join, not a
BroadcastNestedLoop."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pytest

from datafusion_uwheel_spark.operators.rangejoin import range_join

BASE = datetime(2024, 4, 1)


@pytest.fixture(scope="module")
def frames(spark):
    rng = random.Random(11)
    keys = ["a", "b", "c"]
    prows = [
        (rng.choice(keys + ["d"]), BASE + timedelta(seconds=rng.randrange(0, 7200)), i)
        for i in range(400)
    ]
    irows = []
    for j in range(120):
        s = rng.randrange(-300, 7200)
        ln = rng.choice([5, 30, 100, 600, 601])  # mixed widths incl. > bucket
        irows.append(
            (rng.choice(keys), BASE + timedelta(seconds=s),
             BASE + timedelta(seconds=s + ln), f"iv{j}")
        )
    points = spark.createDataFrame(prows, "k string, x timestamp, pid long")
    intervals = spark.createDataFrame(irows, "k string, s timestamp, e timestamp, tag string")
    ppdf = pd.DataFrame(prows, columns=["k", "x", "pid"])
    ipdf = pd.DataFrame(irows, columns=["k", "s", "e", "tag"])
    return points, intervals, ppdf, ipdf


def _oracle(ppdf, ipdf, op_hi, how="inner"):
    con = duckdb.connect()
    con.register("p", ppdf)
    con.register("i", ipdf)
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return con.sql(
        f"SELECT p.k, p.x, p.pid, i.s, i.e, i.tag FROM p {join} i "
        f"ON p.k = i.k AND p.x >= i.s AND p.x {op_hi} i.e"
    ).fetchall()


def _rows(df):
    return sorted((r["k"], r["x"], r["pid"], r["s"], r["e"], r["tag"]) for r in df.collect())


@pytest.mark.parametrize("bucket", [60.0, 600.0])
def test_inner_matches_duckdb(frames, bucket):
    points, intervals, ppdf, ipdf = frames
    got = range_join(
        points, intervals, "x", "s", "e", by=("k",), bucket=bucket
    )
    assert _rows(got) == sorted(_oracle(ppdf, ipdf, "<"))
    assert len(got.collect()) > 50


def test_closed_bounds(frames):
    points, intervals, ppdf, ipdf = frames
    got = range_join(
        points, intervals, "x", "s", "e", by=("k",), bucket=120.0, bounds="[]"
    )
    assert _rows(got) == sorted(_oracle(ppdf, ipdf, "<="))


def test_left_keeps_unmatched(frames):
    points, intervals, ppdf, ipdf = frames
    got = range_join(
        points, intervals, "x", "s", "e", by=("k",), bucket=120.0, how="left"
    )
    assert _rows(got) == sorted(_oracle(ppdf, ipdf, "<", how="left"))
    # key "d" has no intervals — every one of its points survives with NULLs
    assert all(r["tag"] is None for r in got.collect() if r["k"] == "d")


def test_plan_is_equi_join(frames):
    points, intervals, *_ = frames
    plan = range_join(
        points, intervals, "x", "s", "e", by=("k",), bucket=120.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_outlier_interval_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    pts = spark.createDataFrame([(5.0,)], "x double")
    iv = spark.createDataFrame([(0.0, 1e9)], "s double, e double")
    with pytest.raises(SparkRuntimeException, match="range_join"):
        range_join(pts, iv, "x", "s", "e", bucket=1.0, max_buckets_per_interval=100).collect()


def test_validation(frames):
    points, intervals, *_ = frames
    with pytest.raises(ValueError, match="bucket"):
        range_join(points, intervals, "x", "s", "e", bucket=0)
    with pytest.raises(ValueError, match="bounds"):
        range_join(points, intervals, "x", "s", "e", bucket=1, bounds="()")
    with pytest.raises(ValueError, match="how"):
        range_join(points, intervals, "x", "s", "e", bucket=1, how="full")
    with pytest.raises(ValueError, match="not found"):
        range_join(points, intervals, "nope", "s", "e", bucket=1)
