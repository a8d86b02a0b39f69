"""Layers 2+3: routing decisions and exact golden values on the reference's
10-row fixture (FIXTURES.md F1; reference execution tests
``lib.rs:1520-2169``)."""

from __future__ import annotations

from datetime import datetime

import pytest

from datafusion_uwheel_spark import WheelEngine

RANGE = "timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10'"


@pytest.fixture(scope="module")
def engine(spark, minimal_agg):
    e = WheelEngine(
        spark,
        "fixture",
        minimal_agg,
        time_column="timestamp",
        min_max_columns=("agg_col",),
    )
    e.build_index("agg_col")
    return e


def run1(engine, sql):
    df = engine.sql(sql)
    return df.collect()[0][0]


# ---------------------------------------------------------------- execution
def test_count_range(engine):
    # lib.rs:1520-1562: count = 10
    assert run1(engine, f"SELECT COUNT(*) AS cnt FROM fixture WHERE {RANGE}") == 10
    assert engine.last_route.kind == "count_range"


def test_sum_range(engine):
    # lib.rs:1564-1610: sum = 55
    assert run1(engine, f"SELECT SUM(agg_col) AS s FROM fixture WHERE {RANGE}") == 55.0
    assert engine.last_route.kind == "single_agg"


def test_min_max_avg_range(engine):
    assert run1(engine, f"SELECT MIN(agg_col) AS m FROM fixture WHERE {RANGE}") == 1.0
    assert run1(engine, f"SELECT MAX(agg_col) AS m FROM fixture WHERE {RANGE}") == 10.0
    assert run1(engine, f"SELECT AVG(agg_col) AS a FROM fixture WHERE {RANGE}") == 5.5
    assert engine.last_route.rewritten


def test_partial_range(engine):
    # seconds 0..4 → agg_col 1..5
    sql = "SELECT SUM(agg_col) AS s FROM fixture WHERE timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:05'"
    assert run1(engine, sql) == 15.0
    assert engine.last_route.kind == "single_agg"


def test_multi_agg(engine):
    # lib.rs:1889-1957: (avg, sum) = (5.5, 55)
    df = engine.sql(f"SELECT AVG(agg_col) AS a, SUM(agg_col) AS s FROM fixture WHERE {RANGE}")
    row = df.collect()[0]
    assert (row["a"], row["s"]) == (5.5, 55.0)
    assert engine.last_route.kind == "multi_agg"


def test_group_by_day(engine):
    # lib.rs:1787-1845: single day bucket 2024-05-10 (epoch ms 1_715_299_200_000), count 10
    df = engine.sql(
        f"SELECT date_trunc('day', timestamp) AS bucket, COUNT(*) AS cnt FROM fixture WHERE {RANGE} GROUP BY date_trunc('day', timestamp)"
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["bucket"] == datetime(2024, 5, 10)
    assert rows[0]["cnt"] == 10
    assert engine.last_route.kind == "group_by"


def test_group_by_second_multi_agg(engine):
    # lib.rs:2031-2169: per-second buckets with (sum, avg, count)
    df = engine.sql(
        f"SELECT date_trunc('second', timestamp) AS bucket, SUM(agg_col) AS s, AVG(agg_col) AS a, COUNT(*) AS c FROM fixture WHERE {RANGE} GROUP BY date_trunc('second', timestamp)"
    )
    rows = sorted(df.collect(), key=lambda r: r["bucket"])
    assert len(rows) == 10
    assert [r["s"] for r in rows] == [float(i) for i in range(1, 11)]
    assert all(r["c"] == 1 for r in rows)
    assert engine.last_route.kind == "group_by"


def test_landmark_group_by(engine):
    # beyond the reference (group-by path demands a temporal Filter input,
    # lib.rs:269-272): a complete wheel covers the whole timeline
    sql = (
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s, COUNT(*) AS c "
        "FROM fixture GROUP BY date_trunc('second', timestamp)"
    )
    df = engine.sql(sql)
    assert engine.last_route.kind == "group_by_landmark"
    rows = sorted(df.collect(), key=lambda r: r["b"])
    assert len(rows) == 10 and [r["s"] for r in rows] == [float(i) for i in range(1, 11)]
    assert sorted(engine.spark.sql(sql).collect()) == sorted(df.collect())


def test_landmark_group_by_delegates_when_restricted(spark, minimal_agg):
    from datetime import datetime

    eng = WheelEngine(
        spark, "lm_gb_restricted", minimal_agg, time_column="timestamp",
        time_range=(datetime(2024, 5, 10, 0, 0, 0), datetime(2024, 5, 10, 0, 0, 5)),
    )
    eng.build_index("agg_col")
    sql = (
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s "
        "FROM lm_gb_restricted GROUP BY date_trunc('second', timestamp)"
    )
    df = eng.sql(sql)
    assert eng.last_route.kind == "delegate"  # restricted wheel can't claim full span
    assert len(df.collect()) == 10


def test_window_tumbling_matches_date_trunc(engine):
    # window(ts, '1 minute'|'1 hour'|'1 day') buckets coincide with the
    # epoch-aligned date_trunc granularities (no calendar offset below week)
    for iv, gran in [("1 minute", "minute"), ("1 hour", "hour"), ("1 day", "day")]:
        wsql = (
            f"SELECT window(timestamp, '{iv}').start AS b, COUNT(*) AS c, SUM(agg_col) AS s "
            f"FROM fixture WHERE {RANGE} GROUP BY window(timestamp, '{iv}')"
        )
        dsql = (
            f"SELECT date_trunc('{gran}', timestamp) AS b, COUNT(*) AS c, SUM(agg_col) AS s "
            f"FROM fixture WHERE {RANGE} GROUP BY date_trunc('{gran}', timestamp)"
        )
        wdf = engine.sql(wsql)
        assert engine.last_route.kind == "group_by"
        assert engine.last_route.detail["granularity"].startswith("window:")
        assert sorted(map(tuple, wdf.collect())) == sorted(
            map(tuple, engine.sql(dsql).collect())
        )


def test_window_tumbling_arbitrary_width(engine):
    # 2-second tumbling buckets: sums (1+2, 3+4, ...) — and the routed rows
    # must equal Spark's native window() evaluation of the same SQL
    sql = (
        "SELECT window(timestamp, '2 seconds').start AS b, "
        "window(timestamp, '2 seconds').end AS e, SUM(agg_col) AS s "
        f"FROM fixture WHERE {RANGE} GROUP BY window(timestamp, '2 seconds') ORDER BY b"
    )
    df = engine.sql(sql)
    assert engine.last_route.kind == "group_by"
    rows = df.collect()
    assert [r["s"] for r in rows] == [3.0, 7.0, 11.0, 15.0, 19.0]
    assert all((r["e"] - r["b"]).total_seconds() == 2.0 for r in rows)
    assert rows == engine.spark.sql(sql).collect()


def test_window_tumbling_landmark_and_keyed(spark, minimal_agg):
    import pyspark.sql.functions as F

    tagged = minimal_agg.withColumn(
        "parity", F.when(F.col("agg_col") % 2 == 0, "even").otherwise("odd")
    )
    e = WheelEngine(spark, "tagged_w", tagged, time_column="timestamp")
    e.build_index("agg_col", filter="parity = 'even'")
    # landmark form (no WHERE) routes from the complete wheel
    lm = (
        "SELECT window(timestamp, '5 seconds').start AS b, COUNT(*) AS c "
        "FROM tagged_w GROUP BY window(timestamp, '5 seconds')"
    )
    df = e.sql(lm)
    assert e.last_route.kind == "group_by_landmark"
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, e.spark.sql(lm).collect())
    )
    # keyed residual picks the keyed wheel
    ksql = (
        "SELECT window(timestamp, '5 seconds').start AS b, SUM(agg_col) AS s "
        f"FROM tagged_w WHERE {RANGE} AND parity = 'even' "
        "GROUP BY window(timestamp, '5 seconds') ORDER BY b"
    )
    kdf = e.sql(ksql)
    assert e.last_route.kind == "group_by"
    assert "parity = 'even'" in e.last_route.index_key
    assert [tuple(r) for r in kdf.collect()] == [tuple(r) for r in e.spark.sql(ksql).collect()]


def test_window_tumbling_delegates(spark, minimal_agg, engine):
    # width not divisible by a coarse wheel's buckets → delegate
    eng = WheelEngine(
        spark, "fixture_wmin", minimal_agg, time_column="timestamp",
        index_granularity="minute",
    )
    sql90 = (
        "SELECT window(timestamp, '90 seconds').start AS b, COUNT(*) AS c "
        "FROM fixture_wmin GROUP BY window(timestamp, '90 seconds')"
    )
    assert eng.explain_route(sql90).kind == "delegate"
    sql120 = (
        "SELECT window(timestamp, '2 minutes').start AS b, COUNT(*) AS c "
        "FROM fixture_wmin GROUP BY window(timestamp, '2 minutes')"
    )
    assert eng.explain_route(sql120).kind == "group_by_landmark"
    # startTime offsets, bare-struct selects, missing aliases, and sub-second
    # widths are outside the routable grammar → delegate (Spark answers them)
    for bad in (
        f"SELECT window(timestamp, '4 seconds', '2 seconds', '1 second').start AS b, "
        f"COUNT(*) AS c FROM fixture WHERE {RANGE} "
        f"GROUP BY window(timestamp, '4 seconds', '2 seconds', '1 second')",
        f"SELECT window(timestamp, '2 seconds') AS w, COUNT(*) AS c "
        f"FROM fixture WHERE {RANGE} GROUP BY window(timestamp, '2 seconds')",
        f"SELECT window(timestamp, '2 seconds').start, COUNT(*) AS c "
        f"FROM fixture WHERE {RANGE} GROUP BY window(timestamp, '2 seconds')",
        f"SELECT window(timestamp, '500 milliseconds').start AS b, COUNT(*) AS c "
        f"FROM fixture WHERE {RANGE} GROUP BY window(timestamp, '500 milliseconds')",
    ):
        assert engine.explain_route(bad).kind == "delegate"


def test_window_hopping_overlap(engine):
    # 4s windows sliding by 2s — every row lands in exactly 2 windows, and
    # the routed rows must equal Spark's native window() evaluation.
    sql = (
        "SELECT window(timestamp, '4 seconds', '2 seconds').start AS b, "
        "window(timestamp, '4 seconds', '2 seconds').end AS e, "
        "COUNT(*) AS c, SUM(agg_col) AS s "
        f"FROM fixture WHERE {RANGE} "
        "GROUP BY window(timestamp, '4 seconds', '2 seconds') ORDER BY b"
    )
    df = engine.sql(sql)
    assert engine.last_route.kind == "group_by"
    assert engine.last_route.detail["granularity"] == "window:4s/2s"
    rows = df.collect()
    assert rows == engine.spark.sql(sql).collect()
    # clipped edge windows still report their full 4-second bounds
    assert all((r["e"] - r["b"]).total_seconds() == 4.0 for r in rows)
    assert sum(r["c"] for r in rows) == 20  # 10 rows × 2 windows each


def test_window_hopping_gaps_and_having(engine):
    # slide > width is a Spark analysis error (PARAMETER_CONSTRAINT_VIOLATION)
    # — the parser delegates it so the caller gets Spark's own error.
    from pyspark.errors.exceptions.captured import AnalysisException

    bad = (
        "SELECT window(timestamp, '2 seconds', '3 seconds').start AS b, COUNT(*) AS c "
        f"FROM fixture WHERE {RANGE} "
        "GROUP BY window(timestamp, '2 seconds', '3 seconds') ORDER BY b"
    )
    with pytest.raises(AnalysisException):
        engine.sql(bad)
    assert engine.last_route.kind == "delegate"
    # explicit slide == width is just tumbling — routes on the fast path
    same = (
        "SELECT window(timestamp, '2 seconds', '2 seconds').start AS b, COUNT(*) AS c "
        f"FROM fixture WHERE {RANGE} "
        "GROUP BY window(timestamp, '2 seconds', '2 seconds') ORDER BY b"
    )
    sdf = engine.sql(same)
    assert engine.last_route.kind == "group_by"
    assert [tuple(r) for r in sdf.collect()] == [
        tuple(r) for r in engine.spark.sql(same).collect()
    ]
    # HAVING evaluated per hopping window from the same wheel states
    hv = (
        "SELECT window(timestamp, '4 seconds', '2 seconds').start AS b, SUM(agg_col) AS s "
        f"FROM fixture WHERE {RANGE} "
        "GROUP BY window(timestamp, '4 seconds', '2 seconds') "
        "HAVING COUNT(*) >= 4 ORDER BY b"
    )
    hdf = engine.sql(hv)
    assert engine.last_route.kind == "group_by"
    assert [tuple(r) for r in hdf.collect()] == [
        tuple(r) for r in engine.spark.sql(hv).collect()
    ]


def test_window_hopping_landmark_no_job(engine, spark):
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    lm = (
        "SELECT window(timestamp, '6 seconds', '3 seconds').start AS b, SUM(agg_col) AS s "
        "FROM fixture GROUP BY window(timestamp, '6 seconds', '3 seconds')"
    )
    df = engine.sql(lm)
    assert engine.last_route.kind == "group_by_landmark"
    rows = sorted(map(tuple, df.collect()))
    assert tracker.getJobIdsForGroup(None) == before  # routed: zero Spark jobs
    assert rows == sorted(map(tuple, spark.sql(lm).collect()))


def test_window_tumbling_no_job(engine, spark):
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = engine.sql(
        "SELECT window(timestamp, '5 seconds').start AS b, SUM(agg_col) AS s "
        f"FROM fixture WHERE {RANGE} GROUP BY window(timestamp, '5 seconds')"
    )
    assert engine.last_route.kind == "group_by"
    assert [r["s"] for r in sorted(df.collect(), key=lambda r: r["b"])] == [15.0, 40.0]
    assert tracker.getJobIdsForGroup(None) == before


def test_landmark_sum(engine):
    # lib.rs:1986-2029: landmark sum = 55 with no filter at all
    assert run1(engine, "SELECT SUM(agg_col) AS s FROM fixture") == 55.0
    assert engine.last_route.kind == "landmark"


def test_landmark_count(engine):
    assert run1(engine, "SELECT COUNT(*) AS c FROM fixture") == 10
    assert engine.last_route.kind == "landmark"


def test_landmark_multi_agg(engine):
    # widened beyond the reference's single-aggregate landmark guard
    row = engine.sql(
        "SELECT COUNT(*) AS c, SUM(agg_col) AS s, AVG(agg_col) AS a FROM fixture"
    ).collect()[0]
    assert engine.last_route.kind == "landmark"
    assert (row["c"], row["s"], row["a"]) == (10, 55.0, 5.5)


# ------------------------------------------------------------------ routing
def test_out_of_range_answered_when_complete(engine):
    # Deliberate deviation from lib.rs:1497-1518: an unrestricted index covers
    # the whole table, so it *proves* a range past the data span holds zero
    # rows — answer 0/NULL from the index instead of delegating.
    sql = "SELECT COUNT(*) AS c FROM fixture WHERE timestamp >= '2024-05-11 00:00:00' AND timestamp < '2024-05-11 00:00:10'"
    assert engine.explain_route(sql).kind == "count_range"
    assert run1(engine, sql) == 0


def test_out_of_range_delegates_when_time_restricted(spark, minimal_agg):
    # The reference's strict gate (lib.rs:1497-1518) survives where it is
    # load-bearing: a time_range-restricted build can't see outside rows.
    from datetime import datetime, timezone

    eng = WheelEngine(
        spark,
        "fixture_restricted",
        minimal_agg,
        time_column="timestamp",
        time_range=(
            datetime(2024, 5, 10, 0, 0, 0, tzinfo=timezone.utc),
            datetime(2024, 5, 10, 0, 0, 5, tzinfo=timezone.utc),
        ),
    )
    sql = "SELECT COUNT(*) AS c FROM fixture_restricted WHERE timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-11 00:00:00'"
    assert eng.explain_route(sql).kind == "delegate"


def test_sensor_shape_multi_minmax_and_time_range(spark):
    # FIXTURES.md F3: two min/max pruning columns, a time_range-restricted
    # build, and a keyed filter on a second column — the Builder doctest shape
    from datetime import datetime, timedelta

    rows = [
        (
            datetime(2024, 5, 10, 0, 0, 0) + timedelta(seconds=i),
            20.0 + i,          # temperature
            50.0 - i,          # humidity
            "NY" if i % 2 == 0 else "LA",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "timestamp timestamp, temperature double, humidity double, location string"
    )
    eng = WheelEngine(
        spark, "sensor", df, time_column="timestamp",
        min_max_columns=("temperature", "humidity"),
    )
    eng.build_index("temperature", filter="location = 'NY'")

    rng = "timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:20'"
    # both min/max wheels prune independently
    assert eng.explain_route(f"SELECT * FROM sensor WHERE {rng} AND temperature > 100.0").kind == "prune_minmax"
    assert eng.explain_route(f"SELECT * FROM sensor WHERE {rng} AND humidity > 100.0").kind == "prune_minmax"
    assert eng.explain_route(f"SELECT * FROM sensor WHERE {rng} AND humidity > 40.0").kind == "delegate"
    # keyed filter on a different column than the aggregate
    df2 = eng.sql(f"SELECT MAX(temperature) AS m FROM sensor WHERE {rng} AND location = 'NY'")
    assert eng.last_route.kind == "single_agg"
    assert df2.collect()[0][0] == 38.0  # i=18 is the last even second

    # time_range-restricted keyed build keeps the strict out-of-range gate
    eng2 = WheelEngine(
        spark, "sensor_tr", df, time_column="timestamp",
        time_range=(datetime(2024, 5, 10, 0, 0, 0), datetime(2024, 5, 10, 0, 0, 10)),
    )
    eng2.build_index("temperature")
    sql = "SELECT SUM(temperature) AS s FROM sensor_tr WHERE timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10'"
    assert eng2.explain_route(sql).kind == "single_agg"
    wide = "SELECT SUM(temperature) AS s FROM sensor_tr WHERE timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:01:00'"
    assert eng2.explain_route(wide).kind == "delegate"


def test_route_cache_hits_and_invalidates(spark, minimal_agg):
    import numpy as np

    eng = WheelEngine(spark, "fixture_rc", minimal_agg, time_column="timestamp")
    eng.build_index("agg_col")
    sql = "SELECT SUM(agg_col) AS s FROM fixture_rc WHERE timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10'"
    df1 = eng.sql(sql)
    df2 = eng.sql(sql)
    assert df2 is df1  # memoized routed answer
    # mutate the index (late row at an occupied second) → cache invalidated
    w = eng.agg_wheels[("agg_col", "*_AGG")]
    w.merge_delta(
        np.array([w.secs[0]]), np.array([1]),
        np.array([100.0]), np.array([100.0]), np.array([100.0]), np.array([10000.0]),
    )
    eng.index_epoch += 1
    df3 = eng.sql(sql)
    assert df3 is not df1
    assert df3.collect()[0][0] == 155.0


def test_variance_family_routed(engine):
    # 1..10: var_pop=8.25, var_samp=55/6, stddev=sqrt(var_samp)
    sql = f"SELECT VAR_POP(agg_col) AS vp, VARIANCE(agg_col) AS vs, STDDEV(agg_col) AS sd FROM fixture WHERE {RANGE}"
    row = engine.sql(sql).collect()[0]
    assert engine.last_route.kind == "multi_agg"
    assert row["vp"] == pytest.approx(8.25)
    assert row["vs"] == pytest.approx(55 / 6)
    assert row["sd"] == pytest.approx((55 / 6) ** 0.5)


def test_minute_granularity_engine(spark, sf_small_dir):
    # Coarse-base wheel (60s buckets): 60x smaller driver index; minute-
    # aligned ranges route, second-precision ranges delegate (still correct).
    from datafusion_uwheel_spark.sources import read_parquet

    events = read_parquet(spark, f"{sf_small_dir}/events.parquet")
    eng = WheelEngine(
        spark, "events_min", events, time_column="ts", index_granularity="minute"
    )
    eng.build_index("value")
    fine = WheelEngine(spark, "events_fine", events, time_column="ts")
    from datafusion_uwheel_spark.operators.lookup import STAR_AGGREGATION_ALIAS

    coarse_w = eng.count_wheels[STAR_AGGREGATION_ALIAS]
    # the ctor defers the base wheel until a build/reader (r14); this
    # white-box peek must materialize it first
    fine._ensure_base()
    fine_w = fine.count_wheels[STAR_AGGREGATION_ALIAS]
    assert coarse_w.bucket_seconds == 60
    assert coarse_w.secs.size < fine_w.secs.size  # fewer, coarser buckets
    assert coarse_w.cnt.sum() == fine_w.cnt.sum()

    rng = "ts >= '2024-01-05 00:00:00' AND ts < '2024-01-12 00:00:00'"
    sql = f"SELECT COUNT(*) AS c FROM events_min WHERE {rng}"
    assert eng.explain_route(sql).kind == "count_range"
    want = events.filter(
        "ts >= '2024-01-05 00:00:00' AND ts < '2024-01-12 00:00:00'"
    ).count()
    assert eng.sql(sql).collect()[0][0] == want

    # hour group-by works from minute buckets; second-aligned-only delegates
    gb = (
        "SELECT date_trunc('hour', ts) AS b, SUM(value) AS s FROM events_min "
        f"WHERE {rng} GROUP BY date_trunc('hour', ts)"
    )
    assert eng.explain_route(gb).kind == "group_by"
    odd = (
        "SELECT COUNT(*) AS c FROM events_min "
        "WHERE ts >= '2024-01-05 00:00:30' AND ts < '2024-01-06 00:00:00'"
    )
    assert eng.explain_route(odd).kind == "delegate"
    gb_sec = (
        "SELECT date_trunc('second', ts) AS b, COUNT(*) AS c FROM events_min "
        f"WHERE {rng} GROUP BY date_trunc('second', ts)"
    )
    assert eng.explain_route(gb_sec).kind == "delegate"


def test_keyed_landmark_routes_when_complete(spark, minimal_agg):
    # Beyond the reference: SUM with only a keyed filter (no time range) is
    # answerable from a complete keyed wheel's landmark.
    eng = WheelEngine(spark, "fixture_klm", minimal_agg, time_column="timestamp")
    eng.build_index("agg_col", filter="agg_col >= 5.0")
    sql = "SELECT SUM(agg_col) AS s FROM fixture_klm WHERE agg_col >= 5.0"
    assert eng.explain_route(sql).kind == "landmark"
    assert eng.sql(sql).collect()[0][0] == float(sum(range(5, 11)))
    # unregistered keyed filter still delegates
    assert eng.explain_route(
        "SELECT SUM(agg_col) AS s FROM fixture_klm WHERE agg_col >= 7.0"
    ).kind == "delegate"


def test_unaligned_boundary_delegates(engine):
    # SURVEY §4.3.1: sub-second bounds delegate instead of mis-answering
    sql = "SELECT COUNT(*) AS c FROM fixture WHERE timestamp >= '2024-05-10 00:00:00.500' AND timestamp < '2024-05-10 00:00:10'"
    assert engine.explain_route(sql).kind == "delegate"
    assert run1(engine, sql) == 9


def test_le_upper_bound_hybrid_routes_and_is_correct(engine):
    # the reference would mis-treat <= as < (expr.rs:219-222); we answer it
    # exactly: wheel core + pruned boundary sliver (ts == upper bound)
    sql = "SELECT COUNT(*) AS c FROM fixture WHERE timestamp >= '2024-05-10 00:00:00' AND timestamp <= '2024-05-10 00:00:09'"
    assert engine.explain_route(sql).kind == "hybrid_agg"
    assert run1(engine, sql) == 10


def test_unknown_table_delegates(engine, spark, minimal_agg):
    minimal_agg.createOrReplaceTempView("other_table")
    sql = "SELECT COUNT(*) AS c FROM other_table WHERE timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10'"
    assert engine.explain_route(sql).kind == "delegate"
    assert run1(engine, sql) == 10


def test_keyed_count_pruning(spark, minimal_agg):
    # SELECT * with a registered keyed filter proving zero rows in range →
    # pruned without a scan (beyond the reference's numeric-only pruning)
    eng = WheelEngine(spark, "fixture_kcp", minimal_agg, time_column="timestamp")
    eng.build_index("agg_col", filter="agg_col >= 5.0")
    empty_rng = "timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:04'"
    sql = f"SELECT * FROM fixture_kcp WHERE {empty_rng} AND agg_col >= 5.0"
    assert eng.explain_route(sql).kind == "prune_count"
    assert eng.sql(sql).collect() == []
    # rows exist later in the range → not provably empty → delegate
    full_rng = "timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10'"
    sql2 = f"SELECT * FROM fixture_kcp WHERE {full_rng} AND agg_col >= 5.0"
    assert eng.explain_route(sql2).kind == "delegate"
    assert len(eng.sql(sql2).collect()) == 6


def test_case_insensitive_column_resolution(engine):
    sql = f"SELECT SUM(AGG_COL) AS s FROM fixture WHERE {RANGE}"
    assert engine.explain_route(sql).kind == "single_agg"
    assert run1(engine, sql) == 55.0


def test_no_index_for_column_delegates(engine):
    sql = f"SELECT SUM(timestamp) AS s FROM fixture WHERE {RANGE}"
    assert engine.explain_route(sql).kind == "delegate"


def test_no_job_for_rewritten_query(engine, spark):
    """A matched query must not launch a Spark job (the point of the design:
    plan-time lookup, §3.1). LocalRelation creation is job-free; collect on
    it runs locally."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = engine.sql(f"SELECT COUNT(*) AS cnt FROM fixture WHERE {RANGE}")
    assert engine.last_route.rewritten
    assert df.collect()[0][0] == 10  # VALUES → LocalRelation: collect is job-free
    after = tracker.getJobIdsForGroup(None)
    assert before == after


def test_no_job_for_pruned_query(engine, spark):
    """Pruned SELECT * folds to an empty LocalTableScan — no job, no file
    listing (the plan-time elision the reference gets from empty_table_scan,
    lib.rs:817-824)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = engine.sql(f"SELECT * FROM fixture WHERE {RANGE} AND agg_col > 100")
    assert engine.last_route.kind == "prune_minmax"
    assert df.collect() == []
    assert tracker.getJobIdsForGroup(None) == before


# ------------------------------------------------------------------ pruning
def test_prune_minmax(engine):
    # agg_col max is 10 → `agg_col > 100` provably empty
    sql = f"SELECT * FROM fixture WHERE {RANGE} AND agg_col > 100"
    df = engine.sql(sql)
    assert engine.last_route.kind == "prune_minmax"
    assert df.count() == 0
    assert df.schema == engine.table().schema


def test_prune_minmax_not_empty_delegates(engine):
    sql = f"SELECT * FROM fixture WHERE {RANGE} AND agg_col > 5"
    assert engine.explain_route(sql).kind == "delegate"
    assert engine.sql(sql).count() == 5


def test_prune_count_subrange(engine, spark, minimal_agg):
    """Gap-range pruning: an engine over data with a hole answers empty
    SELECT * from the COUNT wheel."""
    import pyspark.sql.functions as F

    gappy = minimal_agg.filter(~F.col("agg_col").between(3, 8))
    e = WheelEngine(spark, "gappy", gappy, time_column="timestamp")
    # seconds 2..7 hold agg_col 3..8 → removed → empty
    sql = "SELECT * FROM gappy WHERE timestamp >= '2024-05-10 00:00:02' AND timestamp < '2024-05-10 00:00:08'"
    df = e.sql(sql)
    assert e.last_route.kind == "prune_count"
    assert df.count() == 0


# ------------------------------------------------------------- keyed index
def test_keyed_index(spark, minimal_agg):
    import pyspark.sql.functions as F

    tagged = minimal_agg.withColumn(
        "parity", F.when(F.col("agg_col") % 2 == 0, "even").otherwise("odd")
    )
    e = WheelEngine(spark, "tagged", tagged, time_column="timestamp")
    e.build_index("agg_col", filter="parity = 'even'")
    sql = f"SELECT SUM(agg_col) AS s FROM tagged WHERE {RANGE} AND parity = 'even'"
    assert e.sql(sql).collect()[0][0] == 30.0  # 2+4+6+8+10
    assert e.last_route.kind == "single_agg"
    assert "parity = 'even'" in e.last_route.index_key
    # a different key is NOT answered by this index
    sql_odd = f"SELECT SUM(agg_col) AS s FROM tagged WHERE {RANGE} AND parity = 'odd'"
    assert e.explain_route(sql_odd).kind == "delegate"
    assert e.sql(sql_odd).collect()[0][0] == 25.0


# ------------------------------------------------------------ introspection
def test_index_usage_bytes(engine):
    assert engine.index_usage_bytes() > 0
    keys = engine.index_keys()
    assert "fixture.*.*_AGG" in keys
    assert "fixture.agg_col.*_AGG" in keys
