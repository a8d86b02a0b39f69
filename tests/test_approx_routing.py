"""Opt-in routing of Spark's approximate aggregates to the sketch rollups
(r11 — the decision the r10 verdict asked for, taken as an explicit
opt-in rather than a documented refusal): with ``engine.approx_routing``
True and a rollup built for the column, ``approx_count_distinct(col)``
answers from the HLL rollup and ``percentile_approx/approx_percentile
(col, p)`` from the KLL rollup over aligned time ranges — zero Spark
jobs on a shim session, O(buckets) anywhere.

The contract: (a) OFF by default — without the opt-in the SQL delegates
and returns Spark's own HLL++/ApproximatePercentile values, because
DataSketches estimates legitimately differ (both within error bounds)
and silent routing would change answer values; (b) routed answers carry
the DELEGATE's exact column names and types (probed: percentile_approx
renders its default accuracy into the name and returns the input
column's type); (c) routed values are parity-BOUNDED: HLL within ~5% of
the exact distinct count, percentile's true rank within ~3x the k=200
KLL bound; (d) everything the rollup can't answer exactly-in-coverage
delegates — unaligned bounds (sketch buckets include partial edges
WHOLE), rsd/accuracy/array arguments, keyed or stale rollups, mixed
aggregates, GROUP BY; (e) approx answers are never memoized at the
engine (rollup mutations through their own handles don't bump
index_epoch) — the rollup's own ask memo prices repeats."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

A, B = "2024-02-01 03:00:00", "2024-02-02 00:00:00"
CD = "SELECT approx_count_distinct(uid) FROM apx WHERE ts >= '{a}' AND ts < '{b}'"
PQ = "SELECT percentile_approx(v, 0.5) FROM apx WHERE ts >= '{a}' AND ts < '{b}'"


@pytest.fixture(scope="module")
def eng(spark):
    from datafusion_uwheel_spark import WheelEngine

    base = datetime(2024, 2, 1)
    rows = [
        (
            base + timedelta(hours=h, minutes=m),
            (h * 11 + m) % 53,
            float(h * 60 + m),
            h * 60 + m,
            "click" if m % 4 else "view",
        )
        for h in range(30)
        for m in range(0, 60, 2)
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, uid bigint, v double, iv int, et string"
    )
    df.createOrReplaceTempView("apx")
    e = WheelEngine(spark, "apx", df, time_column="ts")
    e.approx_routing = True
    e.build_distinct_index("uid")
    e.build_quantile_index("v")
    e.build_quantile_index("iv")
    return e


def _names_types(df):
    # nullability legitimately differs: a VALUES literal is non-nullable
    # while the delegate aggregate is nullable — true of every routed
    # constant relation; the correctness contract is names + data types
    return [(f.name, f.dataType) for f in df.schema.fields]


def _no_jobs(spark, fn):
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    out = fn()
    after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    return out, after == before


def test_off_by_default_and_delegate_values(spark, eng):
    from datafusion_uwheel_spark import WheelEngine

    e2 = WheelEngine(spark, "apx", spark.table("apx"), time_column="ts")
    e2.build_distinct_index("uid")
    try:
        sql = CD.format(a=A, b=B)
        got = e2.sql(sql).collect()[0]
        assert e2.last_route.kind == "delegate"
        assert "opt-in" in e2.last_route.detail["reason"]
        # the delegate answer IS Spark's own HLL++ value
        assert got == spark.sql(sql.replace("FROM apx", "FROM apx")).collect()[0]
    finally:
        e2.distinct_rollups["uid"].unpersist()


def test_routed_names_types_and_parity_bounds(spark, eng):
    sql = CD.format(a=A, b=B)
    df = eng.sql(sql)
    assert eng.last_route.kind == "approx_agg"
    deleg = spark.sql(sql)
    assert df.columns == deleg.columns
    assert _names_types(df) == _names_types(deleg)
    est = df.collect()[0][0]
    exact = spark.sql(
        f"SELECT count(DISTINCT uid) FROM apx WHERE ts >= '{A}' AND ts < '{B}'"
    ).collect()[0][0]
    assert abs(est - exact) <= max(1, 0.05 * exact)
    # percentile: name + type match, true rank within ~3x the k=200 bound
    sqlq = PQ.format(a=A, b=B)
    dfq = eng.sql(sqlq)
    assert eng.last_route.kind == "approx_agg"
    delq = spark.sql(sqlq)
    assert dfq.columns == delq.columns and _names_types(dfq) == _names_types(delq)
    val = dfq.collect()[0][0]
    vals = sorted(
        r[0]
        for r in spark.sql(
            f"SELECT v FROM apx WHERE ts >= '{A}' AND ts < '{B}'"
        ).collect()
    )
    rank = vals.index(val) / len(vals)
    assert abs(rank - 0.5) < 0.05


def test_routed_is_job_free_and_uncached(spark, eng):
    sql = CD.format(a=A, b=B)
    eng.sql(sql).collect()  # warm the VALUES plan parse
    rows, job_free = _no_jobs(spark, lambda: eng.sql_rows(sql))
    assert eng.last_route.kind == "approx_agg" and job_free
    # engine-level memo must NOT hold approx answers: a rollup mutation
    # through its own handle (no index_epoch bump) must show up next ask
    r = eng.distinct_rollups["uid"]
    before = rows[0][0]
    late = spark.createDataFrame(
        [(datetime(2024, 2, 1, 4, 1), 7001 + i) for i in range(40)],
        "ts timestamp, uid bigint",
    )
    r.merge_batch(late, "ts")
    after = eng.sql_rows(sql)[0][0]
    assert eng.last_route.kind == "approx_agg"
    assert after > before  # 40 new uids in-range, HLL exact regime


def test_int_column_percentile_keeps_input_type(spark, eng):
    sql = f"SELECT percentile_approx(iv, 0.5) FROM apx WHERE ts >= '{A}' AND ts < '{B}'"
    df = eng.sql(sql)
    assert eng.last_route.kind == "approx_agg"
    deleg = spark.sql(sql)
    assert _names_types(df) == _names_types(deleg)  # INT, not BIGINT/DOUBLE
    assert isinstance(df.collect()[0][0], int)
    # approx_percentile alias routes with ITS default name
    sql2 = f"SELECT approx_percentile(v, 0.9) AS p90 FROM apx WHERE ts >= '{A}' AND ts < '{B}'"
    df2 = eng.sql(sql2)
    assert eng.last_route.kind == "approx_agg" and df2.columns == ["p90"]


@pytest.mark.parametrize(
    "sql,reason",
    [
        # unaligned end: sketch buckets include partial edges whole
        (CD.format(a=A, b="2024-02-02 00:30:10"), "not aligned"),
        # rsd / accuracy / array arguments are outside the routable grammar
        ("SELECT approx_count_distinct(uid, 0.02) FROM apx "
         f"WHERE ts >= '{A}' AND ts < '{B}'", None),
        ("SELECT percentile_approx(v, 0.5, 100) FROM apx "
         f"WHERE ts >= '{A}' AND ts < '{B}'", None),
        ("SELECT percentile_approx(v, array(0.5, 0.9)) FROM apx "
         f"WHERE ts >= '{A}' AND ts < '{B}'", None),
        # mixed with another aggregate
        ("SELECT approx_count_distinct(uid), COUNT(*) AS n FROM apx "
         f"WHERE ts >= '{A}' AND ts < '{B}'", "mixed"),
        # grouped form: the *_rows_by driver asks own the series shape
        # grouped form (GROUP BY the select ORDINAL is outside the routable
        # grammar entirely -> ParseError delegate; the *_rows_by driver
        # asks own the series shape)
        ("SELECT date_trunc('day', ts) AS bucket, approx_count_distinct(uid) "
         f"FROM apx WHERE ts >= '{A}' AND ts < '{B}' "
         "GROUP BY date_trunc('day', ts)", "mixed"),
        # residual predicate
        ("SELECT approx_count_distinct(uid) FROM apx WHERE ts >= "
         f"'{A}' AND ts < '{B}' AND et = 'click'", "pure aligned"),
        # no rollup built for the column
        (f"SELECT approx_count_distinct(et) FROM apx WHERE ts >= '{A}' AND ts < '{B}'",
         "no fresh unkeyed rollup"),
    ],
)
def test_delegations_still_answer(spark, eng, sql, reason):
    got = eng.sql(sql).collect()
    assert eng.last_route.kind == "delegate"
    if reason:
        assert reason in eng.last_route.detail["reason"]
    assert got == spark.sql(sql).collect()


def test_keyed_and_stale_rollups_delegate(spark, eng):
    from datafusion_uwheel_spark import WheelEngine

    e2 = WheelEngine(
        spark, "apx", spark.table("apx"), time_column="ts", approx_routing=True
    )
    e2.build_distinct_index("uid", partition_by="et")
    try:
        sql = CD.format(a=A, b=B)
        e2.sql(sql)
        assert e2.last_route.kind == "delegate"
        assert "unkeyed" in e2.last_route.detail["reason"]
    finally:
        e2.distinct_rollups["uid"].unpersist()
    r = eng.quantile_rollups["v"]
    r.mark_stale("test")
    try:
        eng.sql(PQ.format(a=A, b=B))
        assert eng.last_route.kind == "delegate"
    finally:
        r.mark_fresh()


def test_invalid_percentage_still_raises_like_spark(spark, eng):
    sql = f"SELECT percentile_approx(v, 1.5) FROM apx WHERE ts >= '{A}' AND ts < '{B}'"
    eng.explain_route(sql)  # the gate refuses, so Spark owns the error
    with pytest.raises(Exception, match="PERCENTILE|percentage|1.5"):
        eng.sql(sql).collect()
