"""Shared column resolution (operators/colresolve.py, r10): ONE
exact-first / duplicate-reject / ambiguity-raise semantics for every
operator that takes a user-supplied column name. The r2-r9 hazard this
closes: rollups' silent first-lowercase-match could build a wheel on the
WRONG column of a case-colliding parquet schema — plausible garbage
answers forever."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators.colresolve import (
    resolve_column,
    resolve_field,
)
from datafusion_uwheel_spark.operators.rollups import (
    column_sql_type,
    key_sql_type,
    time_micros_col,
)


@pytest.fixture(scope="module")
def colliding(spark):
    """A case-colliding schema: exact 'ts'/'TS' variants plus a
    duplicated exact name (legal after joins)."""
    return spark.createDataFrame(
        [(1, 2, 3.0, "x")], "ts bigint, TS bigint, Val double, seg string"
    )


def test_exact_match_wins_over_case_variant(colliding):
    # 'ts' and 'TS' collide case-insensitively; the exact ask resolves
    assert resolve_column(colliding, "ts") == "ts"
    assert resolve_column(colliding, "TS") == "TS"


def test_ambiguous_case_variant_raises(colliding):
    with pytest.raises(ValueError, match="ambiguous"):
        resolve_field(colliding, "Ts")


def test_case_insensitive_fallback_resolves_unique(colliding):
    f = resolve_field(colliding, "VAL")
    assert f.name == "Val" and f.dataType.simpleString() == "double"


def test_no_match_raises_with_columns(colliding):
    with pytest.raises(ValueError, match="no column 'nope'"):
        resolve_field(colliding, "nope")


def test_duplicate_exact_names_raise(spark):
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    dup = df.select("text", "text")
    with pytest.raises(ValueError, match="appears 2 times"):
        resolve_field(dup, "text")


# ------------------------------------------------- wheel-build integration
def test_rollup_typers_use_shared_resolution(spark, colliding):
    # exact asks on the colliding pair type-check the RIGHT column
    assert column_sql_type(colliding, "ts") == "BIGINT"
    assert key_sql_type(colliding, "seg") == "STRING"
    # the ambiguous variant now raises instead of silently taking the
    # first lowercase match (the old rollups.py:117/:365 behavior)
    with pytest.raises(ValueError, match="ambiguous"):
        column_sql_type(colliding, "tS")
    with pytest.raises(ValueError, match="ambiguous"):
        key_sql_type(colliding, "tS")


def test_time_column_resolution_is_strict(spark):
    df = spark.createDataFrame(
        [(1,)], "x long"
    ).select(
        F.to_timestamp(F.lit("2024-01-01")).alias("Event_Ts"),
        F.to_timestamp(F.lit("2024-01-02")).alias("event_ts"),
    )
    with pytest.raises(ValueError, match="ambiguous"):
        time_micros_col(df, "EVENT_TS")
    # exact name still resolves despite the collision
    assert time_micros_col(df, "event_ts") is not None
