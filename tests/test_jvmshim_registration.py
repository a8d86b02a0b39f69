"""Python-side shim registration: view shape, confs, and the soundness
guards (complete wheels only, full state sets, shared bucket domain).
Runs in the shared session — registration needs no injected rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark import WheelEngine
from datafusion_uwheel_spark.jvmshim import (
    register_agg_rollup,
    register_count_rollup,
)
from datafusion_uwheel_spark.sources import read_parquet


@pytest.fixture()
def eng(spark, sf_small_dir):
    return WheelEngine(
        spark, "shimreg", f"{sf_small_dir}/events.parquet", time_column="ts"
    )


def test_count_rollup_view_and_confs(spark, eng):
    name = register_count_rollup(spark, eng)
    assert name == "__uwheel_rollup_shimreg"
    total = spark.table(name).agg(F.sum("cnt")).collect()[0][0]
    assert total == eng.df.count()
    assert "shimreg" in spark.conf.get("spark.uwheel.shim.tables")
    assert spark.conf.get("spark.uwheel.shim.shimreg.time_col") == "ts"
    assert spark.conf.get("spark.uwheel.shim.shimreg.bucket_sec") == "1"


def test_agg_rollup_combined_view_accumulates_columns(spark, eng):
    eng.build_index("value")
    name = register_agg_rollup(spark, eng, "value")
    assert name == "__uwheel_rollup_shimreg__agg"
    cols = set(spark.table(name).columns)
    assert {"sec", "cnt", "vcnt_value", "sum_value", "min_value", "max_value"} <= cols
    eng.build_index("user_id")
    register_agg_rollup(spark, eng, "user_id")
    cols = set(spark.table(name).columns)
    assert {"sum_value", "sum_user_id", "min_user_id"} <= cols
    assert spark.conf.get("spark.uwheel.shim.shimreg.agg_cols") == "user_id,value"
    # BIGINT column exports BIGINT min/max and BIGINT sums (exact int64)
    dt = dict(spark.table(name).dtypes)
    assert dt["min_user_id"] == "bigint" and dt["sum_user_id"] == "bigint"
    assert dt["min_value"] == "double"
    # per-bucket sums reproduce the table totals
    got = spark.table(name).agg(
        F.sum("sum_value").alias("sv"), F.sum("sum_user_id").alias("su")
    ).collect()[0]
    want = eng.df.agg(
        F.sum("value").alias("sv"), F.sum("user_id").alias("su")
    ).collect()[0]
    assert abs(got["sv"] - want["sv"]) < 1e-6 and got["su"] == want["su"]


def test_agg_rollup_requires_built_wheel(spark, eng):
    with pytest.raises(KeyError, match="build_index"):
        register_agg_rollup(spark, eng, "value")


def test_agg_rollup_rejects_state_subset(spark, eng):
    eng.build_index("value", aggs=("sum",))
    with pytest.raises(ValueError, match="state subset"):
        register_agg_rollup(spark, eng, "value")


def test_registration_rejects_incomplete_wheel(spark, sf_small_dir):
    e = WheelEngine(
        spark,
        "shimreg_tr",
        f"{sf_small_dir}/events.parquet",
        time_column="ts",
        time_range=("2024-01-03 00:00:00", "2024-01-10 00:00:00"),
    )
    with pytest.raises(ValueError, match="complete"):
        register_count_rollup(spark, e)


def test_registration_requires_source_path(spark, sf_small_dir):
    df = read_parquet(spark, f"{sf_small_dir}/events.parquet")
    e = WheelEngine(spark, "shimreg_df", df, time_column="ts")
    with pytest.raises(ValueError, match="source_path"):
        register_count_rollup(spark, e)
