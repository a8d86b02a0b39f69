"""DATE-typed time columns: index build, routing, and boundary handling.

The reference normalizes Date32 in its index build but mis-scales days as
milliseconds (``lib.rs:1250-1258``) — a DATE-keyed index there is garbage.
Here DATE days convert to exact epoch seconds/µs, so a table keyed by e.g.
``o_orderdate`` routes correctly.
"""

from __future__ import annotations

from datetime import date

import pytest

from datafusion_uwheel_spark import WheelEngine
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def date_engine(spark):
    schema = T.StructType(
        [
            T.StructField("d", T.DateType(), False),
            T.StructField("amount", T.DoubleType(), True),
        ]
    )
    rows = [(date(2024, 1, 1 + i % 20), float(i)) for i in range(100)]
    e = WheelEngine(spark, "dated", spark.createDataFrame(rows, schema), time_column="d")
    e.build_index("amount")
    return e


def routed_vs_delegate(e, sql, kind=None):
    routed = e.sql(sql)
    assert e.last_route.rewritten, e.last_route
    if kind:
        assert e.last_route.kind == kind
    delegated = e.spark.sql(sql)
    assert routed.dtypes == delegated.dtypes
    assert routed.collect() == delegated.collect()
    return routed.collect()


def test_date_count_range(date_engine):
    rows = routed_vs_delegate(
        date_engine,
        "SELECT COUNT(*) AS n FROM dated WHERE d >= '2024-01-03' AND d < '2024-01-10'",
        kind="count_range",
    )
    assert rows[0]["n"] == 35  # days 3..9, 5 rows each


def test_date_sum_avg_range(date_engine):
    routed_vs_delegate(
        date_engine,
        "SELECT SUM(amount) AS s, AVG(amount) AS a, MIN(amount) AS mn, MAX(amount) AS mx "
        "FROM dated WHERE d >= '2024-01-03' AND d < '2024-01-10'",
    )


def test_date_between_routes_zero_boundary_job(date_engine, spark):
    # every DATE row sits exactly at its bucket start → the at-start sliver
    # covers the whole bucket and BETWEEN resolves wheel-only (zero jobs)
    sql = (
        "SELECT COUNT(*) AS n, SUM(amount) AS s FROM dated "
        "WHERE d BETWEEN '2024-01-03' AND '2024-01-09'"
    )
    tracker = spark.sparkContext.statusTracker()
    date_engine.sql(sql).collect()
    before = tracker.getJobIdsForGroup(None)
    sql2 = (
        "SELECT COUNT(*) AS n, SUM(amount) AS s FROM dated "
        "WHERE d BETWEEN '2024-01-02' AND '2024-01-09'"
    )
    df = date_engine.sql(sql2)
    assert date_engine.last_route.kind == "hybrid_agg"
    assert date_engine.last_route.detail["boundary"] == "wheel"
    got = df.collect()
    assert tracker.getJobIdsForGroup(None) == before
    assert got == date_engine.spark.sql(sql2).collect()


def test_date_group_by_day(date_engine):
    sql = (
        "SELECT date_trunc('day', d) AS bucket, COUNT(*) AS n FROM dated "
        "WHERE d >= '2024-01-03' AND d < '2024-01-10' GROUP BY date_trunc('day', d)"
    )
    routed = date_engine.sql(sql)
    assert date_engine.last_route.kind == "group_by"
    # Spark's date_trunc('day', DATE) returns TIMESTAMP — so does the router
    delegated = date_engine.spark.sql(sql)
    assert routed.dtypes == delegated.dtypes
    assert sorted(routed.collect()) == sorted(delegated.collect())


def test_unsupported_time_type_raises(spark):
    df = spark.createDataFrame([(1, 1.0)], "t long, v double")
    with pytest.raises(ValueError, match="TIMESTAMP or DATE"):
        WheelEngine(spark, "badtime", df, time_column="t").build_index("v")
