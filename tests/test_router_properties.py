"""Property sweep: for EVERY routed query, routed == delegated.

One seeded dataset deliberately built to be nasty — sub-second timestamps,
NULL values, duplicate instants, rows exactly on second boundaries — then a
grid of operator/boundary/aggregate combinations. Whenever the router claims
a query (any non-delegate kind), the answer must equal stock spark.sql
bit-for-bit (schema types and values; float aggregates compared with
tolerance). Delegated queries are implicitly correct (same engine).

This is the adversarial net for the boundary algebra: at-start slivers,
hybrid add/subtract, point lookups, NULL denominators, int64 states.
"""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

import pytest

from datafusion_uwheel_spark import WheelEngine
from pyspark.sql import types as T

BASE = datetime(2024, 5, 10, 0, 0, 0)


@pytest.fixture(scope="module")
def prop_engine(spark):
    rng = random.Random(1234)
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("v", T.DoubleType(), True),
            T.StructField("k", T.LongType(), True),
        ]
    )
    rows = []
    for _ in range(400):
        # 30-second span; ~1/3 of rows exactly on second boundaries, the
        # rest at random sub-second µs offsets; ~15% NULLs in both columns
        sec = rng.randrange(0, 30)
        micro = 0 if rng.random() < 0.33 else rng.randrange(1, 1_000_000)
        ts = BASE + timedelta(seconds=sec, microseconds=micro)
        v = None if rng.random() < 0.15 else round(rng.uniform(-50, 50), 3)
        k = None if rng.random() < 0.15 else rng.randrange(0, 5)
        rows.append((ts, v, k))
    e = WheelEngine(spark, "proptab", spark.createDataFrame(rows, schema), time_column="ts")
    e.build_index("v")
    e.build_index("k")
    return e


def _t(sec: int) -> str:
    return (BASE + timedelta(seconds=sec)).strftime("%Y-%m-%d %H:%M:%S")


AGGS = [
    "COUNT(*) AS c",
    "COUNT(v) AS cv",
    "SUM(v) AS s",
    "AVG(v) AS a",
    "MIN(v) AS mn",
    "MAX(v) AS mx",
    "STDDEV(v) AS sd",
    "SUM(k) AS sk",
    "MIN(k) AS mnk",
    "MAX(k) AS mxk",
]

BOUNDS = [
    ("ts >= '{a}' AND ts < '{b}'", True),
    ("ts >= '{a}' AND ts <= '{b}'", True),
    ("ts > '{a}' AND ts < '{b}'", True),
    ("ts > '{a}' AND ts <= '{b}'", True),
    ("ts BETWEEN '{a}' AND '{b}'", True),
    ("ts = '{a}'", False),
]


def _rows_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                if not (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)):
                    return False
            elif x != y:
                return False
    return True


@pytest.mark.parametrize("tpl,ranged", BOUNDS)
def test_every_routed_boundary_shape_matches_delegate(prop_engine, tpl, ranged):
    rng = random.Random(hash(tpl) & 0xFFFF)
    e = prop_engine
    routed_seen = 0
    for _ in range(8):
        lo = rng.randrange(0, 28)
        hi = rng.randrange(lo, 31)
        cond = tpl.format(a=_t(lo), b=_t(hi)) if ranged else tpl.format(a=_t(lo))
        aggs = ", ".join(rng.sample(AGGS, rng.randrange(1, 4)))
        sql = f"SELECT {aggs} FROM proptab WHERE {cond}"
        routed = e.sql(sql)
        kind = e.last_route.kind
        delegated = e.spark.sql(sql)
        assert routed.dtypes == delegated.dtypes, (sql, kind)
        collected = routed.collect()
        assert _rows_equal(collected, delegated.collect()), (sql, kind)
        # the direct-rows path must agree with both, whatever routed
        direct = e.sql_rows(sql)
        assert e.last_route.kind == kind, (sql, kind, e.last_route)
        assert _rows_equal(direct, collected), (sql, kind, "sql_rows")
        if kind != "delegate":
            routed_seen += 1
    assert routed_seen > 0, f"no query of shape {tpl!r} ever routed"


def test_group_by_shapes_match_delegate(prop_engine):
    e = prop_engine
    for g in ("second", "minute"):
        sql = (
            f"SELECT date_trunc('{g}', ts) AS b, COUNT(*) AS c, SUM(v) AS s, "
            f"COUNT(v) AS cv, AVG(v) AS a FROM proptab "
            f"WHERE ts >= '{_t(0)}' AND ts < '{_t(30)}' GROUP BY date_trunc('{g}', ts)"
        )
        routed = e.sql(sql)
        assert e.last_route.kind == "group_by"
        delegated = e.spark.sql(sql)
        assert routed.dtypes == delegated.dtypes
        assert _rows_equal(
            sorted(routed.collect(), key=lambda r: r["b"]),
            sorted(delegated.collect(), key=lambda r: r["b"]),
        )


def test_landmark_and_landmark_group_by_match_delegate(prop_engine):
    e = prop_engine
    sql = "SELECT COUNT(*) AS c, SUM(v) AS s, AVG(v) AS a, COUNT(v) AS cv FROM proptab"
    routed = e.sql(sql)
    assert e.last_route.kind == "landmark"
    assert _rows_equal(routed.collect(), e.spark.sql(sql).collect())
    sql = (
        "SELECT date_trunc('second', ts) AS b, COUNT(*) AS c, SUM(v) AS s "
        "FROM proptab GROUP BY date_trunc('second', ts)"
    )
    routed = e.sql(sql)
    assert e.last_route.kind == "group_by_landmark"
    assert _rows_equal(
        sorted(routed.collect(), key=lambda r: r["b"]),
        sorted(e.spark.sql(sql).collect(), key=lambda r: r["b"]),
    )


@pytest.mark.parametrize("tpl", [t for t, ranged in BOUNDS if ranged])
def test_grouped_boundary_shapes_match_delegate(prop_engine, tpl):
    """The grouped hybrid under the adversarial net: every boundary-op
    template × granularities × optional HAVING over the nasty dataset
    (sub-second rows, NULLs, instants exactly on bounds). Whatever routes
    must equal stock spark.sql; at least one query per template must take
    the group_by_hybrid path (the `>=`/`<` template routes exact)."""
    rng = random.Random(hash(tpl) & 0xFFF)
    e = prop_engine
    routed_seen = 0
    for _ in range(6):
        lo = rng.randrange(0, 28)
        hi = rng.randrange(lo, 31)
        cond = tpl.format(a=_t(lo), b=_t(hi))
        gran = rng.choice(["second", "minute"])
        having = " HAVING COUNT(*) > 1" if rng.random() < 0.4 else ""
        sql = (
            f"SELECT date_trunc('{gran}', ts) AS b, COUNT(*) AS c, "
            f"SUM(v) AS s, AVG(v) AS a FROM proptab WHERE {cond} "
            f"GROUP BY date_trunc('{gran}', ts){having}"
        )
        routed = e.sql(sql)
        kind = e.last_route.kind
        delegated = e.spark.sql(sql)
        assert routed.dtypes == delegated.dtypes, (sql, kind)
        assert _rows_equal(
            sorted(routed.collect(), key=lambda r: r["b"]),
            sorted(delegated.collect(), key=lambda r: r["b"]),
        ), (sql, kind)
        if kind in ("group_by", "group_by_hybrid"):
            routed_seen += 1
    assert routed_seen > 0, f"no grouped query of shape {tpl!r} ever routed"


def test_order_limit_fuzz_matches_delegate(prop_engine):
    """Randomized ORDER BY / LIMIT sweep for the r8 total-order gate: the
    nasty dataset guarantees abundant COUNT ties, so a wrong kept-set
    decision at the LIMIT cut would surface as a routed-vs-delegate row
    mismatch. Sort keys are drawn from the integral outputs plus the
    bucket (float sorts carry the documented last-ulp rank caveat and the
    NaN placement is pinned in test_order_limit); whenever the bucket is
    in the sort list the query must ROUTE and match the delegate ordered
    row-for-row — membership AND order — and when it is absent the gate
    must DELEGATE."""
    e = prop_engine
    rng = random.Random(77)
    routed_seen = delegated_seen = 0
    for _ in range(24):
        cols = rng.sample(["b", "c", "cv"], rng.randint(1, 3))
        order = ", ".join(
            f"{c} {'DESC' if rng.random() < 0.5 else 'ASC'}" for c in cols
        )
        limit = rng.choice([1, 2, 3, 5, 100])
        sql = (
            "SELECT date_trunc('second', ts) AS b, COUNT(*) AS c, "
            "COUNT(v) AS cv, SUM(v) AS s FROM proptab "
            f"WHERE ts >= '{_t(0)}' AND ts < '{_t(30)}' "
            f"GROUP BY date_trunc('second', ts) ORDER BY {order} LIMIT {limit}"
        )
        routed = e.sql(sql)
        kind = e.last_route.kind
        if "b" not in cols:
            assert kind == "delegate", (sql, e.last_route)
            delegated_seen += 1
            continue
        assert kind == "group_by", (sql, e.last_route)
        routed_seen += 1
        got = routed.collect()
        want = e.spark.sql(sql).collect()
        assert len(got) == len(want), sql
        assert _rows_equal(got, want), sql  # ordered compare: no pre-sort
    assert routed_seen > 4 and delegated_seen > 2
