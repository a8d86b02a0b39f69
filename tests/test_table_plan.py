"""DataFrame-style entry point (§3.2): the fluent plan must route through the
same rewrites as the SQL front door and agree with it exactly."""

from __future__ import annotations

import pytest

from datafusion_uwheel_spark import WheelEngine

RANGE = "timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10'"


@pytest.fixture(scope="module")
def engine(spark, minimal_agg):
    eng = WheelEngine(
        spark, "fixture_tp", minimal_agg, time_column="timestamp",
        min_max_columns=("agg_col",),
    )
    eng.build_index("agg_col")
    return eng


def test_count_routes(engine):
    df = engine.table_plan().filter(RANGE).agg("COUNT(*) AS c")
    assert engine.last_route.kind == "count_range"
    assert df.collect()[0][0] == 10


def test_group_by_matches_sql_path(engine):
    t = (
        engine.table_plan()
        .filter(RANGE)
        .group_by("date_trunc('second', timestamp)")
    )
    rows = t.agg("SUM(agg_col) AS s", "COUNT(*) AS c").collect()
    assert engine.last_route.kind == "group_by"
    sql_rows = engine.sql(
        "SELECT date_trunc('second', timestamp) AS bucket, SUM(agg_col) AS s, "
        f"COUNT(*) AS c FROM fixture_tp WHERE {RANGE} "
        "GROUP BY date_trunc('second', timestamp)"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, sql_rows))


def test_chained_filters_and_keyed_wheel(engine):
    df = (
        engine.table_plan()
        .filter("timestamp >= '2024-05-10 00:00:00'")
        .filter("timestamp < '2024-05-10 00:00:10'")
        .agg("SUM(agg_col) AS s")
    )
    assert engine.last_route.kind == "single_agg"
    assert df.collect()[0][0] == 55.0


def test_select_star_prunes(engine):
    df = (
        engine.table_plan()
        .filter(RANGE)
        .filter("agg_col > 99.0")
        .select_star()
    )
    assert engine.last_route.kind == "prune_minmax"
    assert df.collect() == []


def test_landmark_and_delegation(engine):
    assert engine.table_plan().agg("SUM(agg_col) AS s").collect()[0][0] == 55.0
    assert engine.last_route.kind == "landmark"
    # outside the routable grammar → delegates, still correct
    df = engine.table_plan().filter(
        "timestamp >= '2024-05-10 00:00:00.500' AND timestamp < '2024-05-10 00:00:10'"
    ).agg("COUNT(*) AS c")
    assert engine.last_route.kind == "delegate"
    assert df.collect()[0][0] == 9


def test_fluent_having_order_limit(engine):
    df = (
        engine.table_plan()
        .filter(RANGE)
        .group_by("date_trunc('second', timestamp)")
        .having("SUM(agg_col) >= 3")
        .order_by("bucket DESC")
        .limit(3)
        .agg("SUM(agg_col) AS s")
    )
    assert engine.last_route.kind == "group_by"
    rows = df.collect()
    assert [r["s"] for r in rows] == [10.0, 9.0, 8.0]


def test_agg_rows_direct_path(engine):
    """agg_rows routes through sql_rows: same values as the DataFrame
    terminal, routed, no JVM materialization."""
    t = engine.table_plan().filter(RANGE)
    rows = t.agg_rows("COUNT(*) AS n", "SUM(agg_col) AS s")
    assert engine.last_route.rewritten
    df_rows = t.agg("COUNT(*) AS n", "SUM(agg_col) AS s").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in df_rows]
    # grouped form too
    g = (
        engine.table_plan()
        .filter(RANGE)
        .group_by("date_trunc('second', timestamp)")
        .order_by("bucket")
    )
    rows2 = g.agg_rows("COUNT(*) AS n")
    assert engine.last_route.rewritten
    assert [tuple(r) for r in rows2] == [
        tuple(r) for r in g.agg("COUNT(*) AS n").collect()
    ]
