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
