"""Raw integral epoch time columns via ``WheelEngine(time_unit=...)`` — the
PySpark analogue of the reference's Time32/Time64 physical-type
normalization (``lib.rs:1203-1272``): the engine converts the BIGINT epoch
column to TimestampType once at construction, so timestamp-literal SQL
routes AND delegates identically."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from datafusion_uwheel_spark import WheelEngine

BASE = int(datetime(2024, 5, 10, tzinfo=timezone.utc).timestamp())
RANGE_SQL = (
    "SELECT COUNT(*) AS c, SUM(v) AS s FROM {t} WHERE "
    "ts >= '2024-05-10 00:00:02' AND ts < '2024-05-10 00:00:08'"
)


def _rows(unit_mult: int):
    return [((BASE + i) * unit_mult, float(i + 1)) for i in range(10)]


@pytest.mark.parametrize(
    "unit,mult",
    [("s", 1), ("ms", 1_000), ("us", 1_000_000), ("ns", 1_000_000_000)],
)
def test_epoch_long_time_column_routes(spark, unit, mult):
    name = f"epoch_{unit}"
    df = spark.createDataFrame(_rows(mult), "ts long, v double")
    eng = WheelEngine(spark, name, df, time_column="ts", time_unit=unit)
    eng.build_index("v")
    got = eng.sql(RANGE_SQL.format(t=name)).collect()
    assert eng.last_route.rewritten, eng.last_route
    assert got[0]["c"] == 6 and got[0]["s"] == sum(range(3, 9))
    # delegate path sees the SAME normalized view
    want = spark.sql(RANGE_SQL.format(t=name)).collect()
    assert got == want


def test_time_unit_rejects_non_integral(spark, minimal_agg):
    with pytest.raises(ValueError, match="integral epoch"):
        WheelEngine(
            spark, "bad_unit", minimal_agg, time_column="timestamp", time_unit="s"
        )


def test_unknown_time_unit(spark):
    df = spark.createDataFrame(_rows(1), "ts long, v double")
    with pytest.raises(ValueError, match="unknown time_unit"):
        WheelEngine(spark, "bad_unit2", df, time_column="ts", time_unit="days")


def test_untyped_long_without_unit_still_refuses(spark):
    """Without time_unit a BIGINT time column must fail loudly (never
    silently mis-bucket) — the pre-existing contract. The count wheel is
    built at construction, so the refusal surfaces there."""
    df = spark.createDataFrame(_rows(1), "ts long, v double")
    with pytest.raises(ValueError, match="TIMESTAMP or DATE"):
        WheelEngine(spark, "no_unit", df, time_column="ts")
