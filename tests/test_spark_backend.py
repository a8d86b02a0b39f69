"""Spark-backed rollup wheel: identical answers to the driver backend, with
the rollup living in executor cache instead of driver numpy."""

from __future__ import annotations

import pytest

from datafusion_uwheel_spark import WheelEngine

RANGE = "timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10'"


@pytest.fixture(scope="module")
def engines(spark, minimal_agg):
    drv = WheelEngine(
        spark, "sb_drv", minimal_agg, time_column="timestamp",
        min_max_columns=("agg_col",),
    )
    drv.build_index("agg_col")
    spk = WheelEngine(
        spark, "sb_spk", minimal_agg, time_column="timestamp",
        min_max_columns=("agg_col",), index_backend="spark",
    )
    spk.build_index("agg_col")
    return drv, spk


QUERIES = [
    ("SELECT COUNT(*) AS c FROM {t} WHERE " + RANGE, "count_range"),
    ("SELECT SUM(agg_col) AS s FROM {t} WHERE " + RANGE, "single_agg"),
    (
        "SELECT AVG(agg_col) AS a, STDDEV(agg_col) AS sd, COUNT(*) AS c FROM {t} WHERE " + RANGE,
        "multi_agg",
    ),
    (
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s FROM {t} WHERE "
        + RANGE
        + " GROUP BY date_trunc('second', timestamp)",
        "group_by",
    ),
    (
        # week buckets are Monday-aligned (date_trunc semantics) — regression
        # guard for the Spark backend's bucket-key arithmetic
        "SELECT date_trunc('week', timestamp) AS b, COUNT(*) AS c FROM {t} WHERE "
        + RANGE
        + " GROUP BY date_trunc('week', timestamp)",
        "group_by",
    ),
    (
        "SELECT date_trunc('month', timestamp) AS b, SUM(agg_col) AS s FROM {t} WHERE "
        + RANGE
        + " GROUP BY date_trunc('month', timestamp)",
        "group_by",
    ),
    ("SELECT SUM(agg_col) AS s FROM {t}", "landmark"),
    ("SELECT * FROM {t} WHERE " + RANGE + " AND agg_col > 99.0", "prune_minmax"),
    (
        # boundary shapes resolve from at-start states on BOTH backends
        "SELECT COUNT(*) AS c, SUM(agg_col) AS s FROM {t} WHERE "
        "timestamp BETWEEN '2024-05-10 00:00:02' AND '2024-05-10 00:00:07'",
        "hybrid_agg",
    ),
    (
        "SELECT COUNT(*) AS c, SUM(agg_col) AS s FROM {t} WHERE "
        "timestamp = '2024-05-10 00:00:04'",
        "point_agg",
    ),
    (
        # strict `>` lower + inclusive `<=` upper slivers (uw_le_bound shape)
        "SELECT COUNT(*) AS c, SUM(agg_col) AS s FROM {t} WHERE "
        "timestamp > '2024-05-10 00:00:01' AND timestamp <= '2024-05-10 00:00:06'",
        "hybrid_agg",
    ),
    (
        # ORDER BY/LIMIT must survive the wheel-boundary success path
        # (router.py:804 regression, r2 ADVICE) on both backends
        "SELECT COUNT(*) AS c FROM {t} WHERE "
        "timestamp > '2024-05-10 00:00:01' AND timestamp <= '2024-05-10 00:00:06' LIMIT 0",
        "hybrid_agg",
    ),
    (
        "SELECT COUNT(*) AS c, SUM(agg_col) AS s FROM {t} WHERE "
        "(timestamp >= '2024-05-10 00:00:01' AND timestamp < '2024-05-10 00:00:03') "
        "OR (timestamp >= '2024-05-10 00:00:07' AND timestamp < '2024-05-10 00:00:09')",
        "or_ranges",
    ),
    (
        "SELECT date_trunc('second', timestamp) AS b, SUM(agg_col) AS s FROM {t} WHERE "
        + RANGE
        + " GROUP BY date_trunc('second', timestamp) HAVING SUM(agg_col) > 4 "
        "ORDER BY b DESC LIMIT 3",
        "group_by",
    ),
    (
        # tumbling window() — arbitrary epoch-aligned width on BOTH backends
        "SELECT window(timestamp, '3 seconds').start AS b, "
        "window(timestamp, '3 seconds').end AS e, SUM(agg_col) AS s FROM {t} WHERE "
        + RANGE
        + " GROUP BY window(timestamp, '3 seconds') ORDER BY b",
        "group_by",
    ),
]


@pytest.mark.parametrize("sql_tpl,kind", QUERIES)
def test_backends_agree(engines, sql_tpl, kind):
    drv, spk = engines
    a = drv.sql(sql_tpl.format(t="sb_drv")).collect()
    assert drv.last_route.kind == kind
    b = spk.sql(sql_tpl.format(t="sb_spk")).collect()
    assert spk.last_route.kind == kind, spk.last_route
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_spark_backend_size_is_driver_free(engines):
    _, spk = engines
    assert spk.index_usage_bytes() == 0  # rollup lives in executor cache
    assert spk.index_keys()  # but the wheels exist


@pytest.mark.parametrize("backend", ["driver", "spark"])
def test_time_range_restricted_sliver_gating(spark, backend):
    """A wheel built under a time_range restriction has no at-start state at
    the boundary instant: the inclusive-upper sliver must NOT be answered
    from a zero state (r2 ADVICE high finding) — on BOTH backends the
    engine either falls back to the pruned boundary scan or delegates, and
    the answer always equals delegated spark.sql."""
    from datetime import datetime

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("v", T.DoubleType(), False),
        ]
    )
    rows = [(datetime(2024, 5, 10, 0, 0, i), float(i)) for i in range(11)]
    name = f"tr_gate_{backend}"
    eng = WheelEngine(
        spark, name, spark.createDataFrame(rows, schema), time_column="ts",
        index_backend=backend,
    )
    eng.build_index(
        "v",
        time_range=(datetime(2024, 5, 10, 0, 0, 0), datetime(2024, 5, 10, 0, 0, 5)),
    )
    sql = (
        f"SELECT COUNT(*) AS c, SUM(v) AS s FROM {name} WHERE "
        "ts > '2024-05-10 00:00:01' AND ts <= '2024-05-10 00:00:05'"
    )
    got = eng.sql(sql).collect()
    want = spark.sql(sql).collect()
    assert got == want  # rows at the restricted boundary are never dropped
