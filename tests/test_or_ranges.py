"""OR-of-temporal-ranges routing: multi-window comparison queries combine
per-interval wheel states (union semantics for overlaps). The reference
rejects any OR (its extractor only walks AND trees, expr.rs:198-207)."""

from __future__ import annotations

import pytest

from datafusion_uwheel_spark import WheelEngine


@pytest.fixture(scope="module")
def eng(spark, minimal_agg):
    e = WheelEngine(spark, "or_fix", minimal_agg, time_column="timestamp")
    e.build_index("agg_col")
    return e


def check(e, sql, kind="or_ranges"):
    routed = e.sql(sql)
    assert e.last_route.kind == kind, (sql, e.last_route)
    delegated = e.spark.sql(sql)
    assert routed.dtypes == delegated.dtypes
    assert routed.collect() == delegated.collect()
    return routed.collect()


def test_disjoint_or_ranges(eng, spark):
    sql = (
        "SELECT COUNT(*) AS c, SUM(agg_col) AS s, MIN(agg_col) AS mn, AVG(agg_col) AS a "
        "FROM or_fix WHERE "
        "(timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:03') OR "
        "(timestamp >= '2024-05-10 00:00:07' AND timestamp < '2024-05-10 00:00:10')"
    )
    eng.sql(sql).collect()
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    routed = eng.sql(sql)
    assert eng.last_route.kind == "or_ranges"
    rows = routed.collect()
    assert tracker.getJobIdsForGroup(None) == before  # zero jobs
    assert rows == eng.spark.sql(sql).collect()
    # seconds 0,1,2 (1+2+3) and 7,8,9 (8+9+10) → count 6, sum 33
    assert rows[0]["c"] == 6 and rows[0]["s"] == 33.0


def test_overlapping_branches_count_once(eng):
    rows = check(
        eng,
        "SELECT COUNT(*) AS c FROM or_fix WHERE "
        "(timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:06') OR "
        "(timestamp >= '2024-05-10 00:00:04' AND timestamp < '2024-05-10 00:00:08')",
    )
    assert rows[0]["c"] == 8  # union [0, 8), not 6 + 4


def test_three_branches_stddev(eng):
    sql = (
        "SELECT STDDEV(agg_col) AS sd FROM or_fix WHERE "
        "(timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:02') OR "
        "(timestamp >= '2024-05-10 00:00:04' AND timestamp < '2024-05-10 00:00:05') OR "
        "(timestamp >= '2024-05-10 00:00:08' AND timestamp < '2024-05-10 00:00:10')"
    )
    routed = eng.sql(sql)
    assert eng.last_route.kind == "or_ranges"
    a = routed.collect()[0][0]
    b = eng.spark.sql(sql).collect()[0][0]
    assert a == pytest.approx(b, rel=1e-9)


def test_parenthesized_single_conjunction_still_routes(eng):
    rows = check(
        eng,
        "SELECT COUNT(*) AS c FROM or_fix WHERE "
        "(timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:05')",
        kind="count_range",
    )
    assert rows[0]["c"] == 5


def test_or_with_unaligned_branch_delegates(eng):
    df = eng.sql(
        "SELECT COUNT(*) AS c FROM or_fix WHERE "
        "(timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:03') OR "
        "(timestamp >= '2024-05-10 00:00:07.5' AND timestamp < '2024-05-10 00:00:10')"
    )
    assert eng.last_route.kind == "delegate"
    assert df.collect()[0][0] == 5  # 0,1,2 + 8,9


def test_or_with_mixed_residual_delegates(spark):
    from datetime import datetime

    rows = [(datetime(2024, 5, 10, 0, 0, i), "a" if i % 2 else "b", float(i)) for i in range(10)]
    e = WheelEngine(
        spark, "or_keyed", spark.createDataFrame(rows, "ts timestamp, k string, v double"),
        time_column="ts",
    )
    e.build_index("v", filter="k = 'a'")
    df = e.sql(
        "SELECT COUNT(*) AS c FROM or_keyed WHERE "
        "(ts >= '2024-05-10 00:00:00' AND ts < '2024-05-10 00:00:05' AND k = 'a') OR "
        "(ts >= '2024-05-10 00:00:05' AND ts < '2024-05-10 00:00:10' AND k = 'b')"
    )
    assert e.last_route.kind == "delegate"
    # k='a' at odd seconds {1,3} in [0,5); k='b' at even seconds {6,8} in [5,10)
    assert df.collect()[0][0] == 4


def test_parenthesized_range_and_residual_routes(spark, minimal_agg):
    e = WheelEngine(spark, "paren_fix", minimal_agg, time_column="timestamp")
    e.build_index("agg_col")
    sql = (
        "SELECT SUM(agg_col) AS s FROM paren_fix WHERE "
        "(timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10') "
        "AND agg_col > 0"
    )
    # residual doesn't match a keyed wheel → delegate, but the parse must
    # consume the full conjunction (not trip on trailing tokens)
    df = e.sql(sql)
    assert df.collect()[0][0] == 55.0
    sql2 = (
        "SELECT COUNT(*) AS c FROM paren_fix WHERE "
        "(timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10')"
    )
    assert e.sql(sql2).collect()[0][0] == 10
    assert e.last_route.kind == "count_range"


# ------------------------------------------------ grouped OR-ranges (r6)
@pytest.fixture(scope="module")
def gb_or_eng(spark, sf_small_dir):
    from datafusion_uwheel_spark import WheelEngine
    from datafusion_uwheel_spark.sources import read_parquet

    e = WheelEngine(
        spark, "orgb_events", f"{sf_small_dir}/events.parquet", time_column="ts"
    )
    e.build_index("value")
    e.build_index("value", filter="event_type = 'click'")
    read_parquet(spark, f"{sf_small_dir}/events.parquet").createOrReplaceTempView(
        "orgb_events"
    )
    return e


R1 = "(ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00')"
R2 = "(ts >= '2024-01-08 00:00:00' AND ts < '2024-01-10 00:00:00')"


def gb_or_check(e, sql, kind="or_group_by"):
    routed = e.sql(sql)
    assert e.last_route.kind == kind, (sql, e.last_route)
    got = routed.collect()
    want = e.spark.sql(sql).collect()
    assert routed.dtypes == e.spark.sql(sql).dtypes
    assert len(got) == len(want), (sql, len(got), len(want))
    for g, w in zip(got, want):
        for x, y in zip(g, w):
            if isinstance(x, float):
                assert abs(x - y) <= 1e-9 * max(1.0, abs(y)), (sql, g, w)
            else:
                assert x == y, (sql, g, w)


def test_or_group_by_day(gb_or_eng):
    gb_or_check(
        gb_or_eng,
        "SELECT date_trunc('day', ts) AS b, COUNT(*) AS n, SUM(value) AS s "
        f"FROM orgb_events WHERE {R1} OR {R2} "
        "GROUP BY date_trunc('day', ts) ORDER BY b",
    )


def test_or_group_by_overlapping_branches_merge(gb_or_eng):
    """Overlapping branches union-merge; a week cell straddling both
    intervals counts every row exactly once."""
    gb_or_check(
        gb_or_eng,
        "SELECT date_trunc('week', ts) AS b, COUNT(*) AS n FROM orgb_events "
        "WHERE (ts >= '2024-01-03 00:00:00' AND ts < '2024-01-08 00:00:00') "
        "OR (ts >= '2024-01-05 00:00:00' AND ts < '2024-01-12 00:00:00') "
        "GROUP BY date_trunc('week', ts) ORDER BY b",
    )


def test_or_group_by_windows_and_having(gb_or_eng):
    gb_or_check(
        gb_or_eng,
        "SELECT window(ts, '6 hours').start AS b, COUNT(*) AS n "
        f"FROM orgb_events WHERE {R1} OR {R2} "
        "GROUP BY window(ts, '6 hours') HAVING COUNT(*) > 2 ORDER BY b",
    )
    gb_or_check(
        gb_or_eng,
        "SELECT window(ts, '6 hours', '3 hours').start AS b, COUNT(*) AS n "
        f"FROM orgb_events WHERE {R1} OR {R2} "
        "GROUP BY window(ts, '6 hours', '3 hours') ORDER BY b",
    )


def test_or_group_by_keyed_residual(gb_or_eng):
    gb_or_check(
        gb_or_eng,
        "SELECT date_trunc('day', ts) AS b, SUM(value) AS s FROM orgb_events "
        "WHERE (ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00' "
        "AND event_type = 'click') OR (ts >= '2024-01-08 00:00:00' AND "
        "ts < '2024-01-10 00:00:00' AND event_type = 'click') "
        "GROUP BY date_trunc('day', ts) ORDER BY b",
    )


def test_or_with_key_grouping_delegates_correctly(gb_or_eng):
    """The r6 wrong-answer fix: OR + a KEY grouping previously fell into
    the scalar OR path, which dropped the key column (one scalar row
    instead of per-key rows) or crashed under ORDER BY. Must DELEGATE and
    match Spark exactly."""
    for sql in (
        f"SELECT event_type AS k, COUNT(*) AS n FROM orgb_events "
        f"WHERE {R1} OR {R2} GROUP BY event_type ORDER BY k",
        f"SELECT event_type AS k, COUNT(*) AS n FROM orgb_events "
        f"WHERE {R1} OR {R2} GROUP BY event_type",
    ):
        routed = gb_or_eng.sql(sql)
        assert gb_or_eng.last_route.kind == "delegate", gb_or_eng.last_route
        got = sorted(map(tuple, routed.collect()))
        want = sorted(map(tuple, gb_or_eng.spark.sql(sql).collect()))
        assert got == want


def test_or_group_by_unaligned_branch_delegates(gb_or_eng):
    sql = (
        "SELECT date_trunc('day', ts) AS b, COUNT(*) AS n FROM orgb_events "
        f"WHERE {R1} OR (ts >= '2024-01-08 00:00:00.500' AND ts < "
        "'2024-01-10 00:00:00') GROUP BY date_trunc('day', ts) ORDER BY b"
    )
    routed = gb_or_eng.sql(sql)
    assert gb_or_eng.last_route.kind == "delegate"
    assert [tuple(r) for r in routed.collect()] == [
        tuple(r) for r in gb_or_eng.spark.sql(sql).collect()
    ]


def test_or_group_by_variance_family(gb_or_eng):
    """Grouped OR + STDDEV previously raised KeyError('_sumsq'): group_by
    cells carried only the derived variance values, not the raw Σx² monoid
    the interval combiner needs (r6 review finding — the keyed-IN grouped
    path shared the latent defect)."""
    gb_or_check(
        gb_or_eng,
        "SELECT date_trunc('day', ts) AS b, STDDEV(value) AS sd, "
        f"VAR_POP(value) AS vp FROM orgb_events WHERE {R1} OR {R2} "
        "GROUP BY date_trunc('day', ts) ORDER BY b",
    )


def test_or_group_by_wrong_time_column_delegates(spark):
    """An OR-of-ranges query grouped on a DIFFERENT timestamp column must
    DELEGATE (r6 review finding: it previously bucketed silently on the
    wheel's time column)."""
    from datafusion_uwheel_spark import WheelEngine

    rows = [
        (f"2024-01-0{d} 0{h}:00:00", f"2024-02-0{d} 0{h}:00:00", float(d * h))
        for d in range(1, 8)
        for h in range(6)
    ]
    df = spark.createDataFrame(
        rows, "ts_s string, upd_s string, v double"
    ).selectExpr(
        "CAST(ts_s AS TIMESTAMP) AS ts", "CAST(upd_s AS TIMESTAMP) AS updated_at", "v"
    )
    e = WheelEngine(spark, "or_twocol", df, time_column="ts")
    e.build_index("v")
    sql = (
        "SELECT date_trunc('day', updated_at) AS b, COUNT(*) AS n FROM or_twocol "
        "WHERE (ts >= '2024-01-02 00:00:00' AND ts < '2024-01-04 00:00:00') OR "
        "(ts >= '2024-01-06 00:00:00' AND ts < '2024-01-08 00:00:00') "
        "GROUP BY date_trunc('day', updated_at) ORDER BY b"
    )
    routed = e.sql(sql)
    assert e.last_route.kind == "delegate", e.last_route
    assert [tuple(r) for r in routed.collect()] == [
        tuple(r) for r in spark.sql(sql).collect()
    ]
