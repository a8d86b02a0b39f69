"""ORDER BY / LIMIT on routable queries — dashboards sort timelines, so the
router must keep these zero-job instead of delegating. LIMIT on a group-by
routes only when the leading sort key is the unique time bucket (otherwise a
tied aggregate at the cut makes the kept set engine-dependent → delegate)."""

from __future__ import annotations

import pytest

from datafusion_uwheel_spark import WheelEngine

RANGE = "timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10'"


@pytest.fixture(scope="module")
def eng(spark, minimal_agg):
    e = WheelEngine(spark, "ol_fix", minimal_agg, time_column="timestamp")
    e.build_index("agg_col")
    return e


def check(e, sql, kind):
    routed = e.sql(sql)
    assert e.last_route.kind == kind, (sql, e.last_route)
    delegated = e.spark.sql(sql)
    assert routed.dtypes == delegated.dtypes
    assert routed.collect() == delegated.collect()
    return routed


def test_group_by_order_by_bucket(eng, spark):
    sql = (
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s "
        f"FROM ol_fix WHERE {RANGE} GROUP BY date_trunc('second', timestamp) "
        "ORDER BY b"
    )
    eng.sql(sql).collect()
    sql2 = sql.replace("ORDER BY b", "ORDER BY b DESC")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    routed = eng.sql(sql2)
    assert eng.last_route.kind == "group_by"
    got = routed.collect()
    assert tracker.getJobIdsForGroup(None) == before  # still zero jobs
    assert got == eng.spark.sql(sql2).collect()


def test_group_by_order_by_bucket_limit(eng):
    df = check(
        eng,
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s "
        f"FROM ol_fix WHERE {RANGE} GROUP BY date_trunc('second', timestamp) "
        "ORDER BY b DESC LIMIT 3",
        "group_by",
    )
    assert len(df.collect()) == 3


def test_group_by_order_by_value(eng):
    # agg values here are unique so delegate comparison is deterministic
    check(
        eng,
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s "
        f"FROM ol_fix WHERE {RANGE} GROUP BY date_trunc('second', timestamp) "
        "ORDER BY s DESC",
        "group_by",
    )


def test_limit_without_bucket_order_delegates(eng):
    eng.sql(
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s "
        f"FROM ol_fix WHERE {RANGE} GROUP BY date_trunc('second', timestamp) "
        "ORDER BY s DESC LIMIT 3"
    )
    assert eng.last_route.kind == "delegate"
    eng.sql(
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s "
        f"FROM ol_fix WHERE {RANGE} GROUP BY date_trunc('second', timestamp) LIMIT 3"
    )
    assert eng.last_route.kind == "delegate"


def test_scalar_limit_zero(eng):
    df = check(eng, f"SELECT COUNT(*) AS c FROM ol_fix WHERE {RANGE} LIMIT 0", "count_range")
    assert df.collect() == []


def test_scalar_order_by_is_noop(eng):
    check(eng, f"SELECT SUM(agg_col) AS s FROM ol_fix WHERE {RANGE} ORDER BY s", "single_agg")


def test_order_by_expression_delegates(eng):
    # ORDER BY an expression outside the routable grammar → delegate, still correct
    df = eng.sql(
        "SELECT date_trunc('second', timestamp) AS b, COUNT(*) AS c FROM ol_fix "
        f"WHERE {RANGE} GROUP BY date_trunc('second', timestamp) ORDER BY MAX(agg_col)"
    )
    assert eng.last_route.kind == "delegate"
    assert len(df.collect()) == 10


def test_landmark_group_by_order_limit(eng):
    df = check(
        eng,
        "SELECT date_trunc('second', timestamp) AS b, COUNT(*) AS c FROM ol_fix "
        "GROUP BY date_trunc('second', timestamp) ORDER BY b LIMIT 4",
        "group_by_landmark",
    )
    assert len(df.collect()) == 4


# ------------------------------------------------------------------ HAVING
def test_having_on_select_agg(eng):
    check(
        eng,
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s "
        f"FROM ol_fix WHERE {RANGE} GROUP BY date_trunc('second', timestamp) "
        "HAVING SUM(agg_col) > 5 ORDER BY b",
        "group_by",
    )


def test_having_alias(eng):
    df = check(
        eng,
        "SELECT date_trunc('second', timestamp) AS b, COUNT(*) AS c "
        f"FROM ol_fix WHERE {RANGE} GROUP BY date_trunc('second', timestamp) "
        "HAVING c >= 1 ORDER BY b",
        "group_by",
    )
    assert len(df.collect()) == 10


def test_having_agg_not_in_select(eng):
    # HAVING references MAX which is not selected — evaluated from states
    df = check(
        eng,
        "SELECT date_trunc('second', timestamp) AS b, COUNT(*) AS c "
        f"FROM ol_fix WHERE {RANGE} GROUP BY date_trunc('second', timestamp) "
        "HAVING MAX(agg_col) >= 8 ORDER BY b",
        "group_by",
    )
    assert len(df.collect()) == 3  # agg_col 8, 9, 10


def test_having_conjunction_and_landmark(eng):
    df = check(
        eng,
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s FROM ol_fix "
        "GROUP BY date_trunc('second', timestamp) "
        "HAVING SUM(agg_col) >= 3 AND COUNT(*) <= 1 ORDER BY b",
        "group_by_landmark",
    )
    assert len(df.collect()) == 8  # agg_col 3..10


def test_having_without_group_by_delegates(eng):
    df = eng.sql(f"SELECT SUM(agg_col) AS s FROM ol_fix WHERE {RANGE} HAVING COUNT(*) > 3")
    assert eng.last_route.kind == "delegate"
    assert df.collect()[0][0] == 55.0
