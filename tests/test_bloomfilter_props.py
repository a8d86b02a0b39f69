"""Property tests for the shared bloom plumbing: the no-false-negative
contract (the single property every bloom caller's exactness proof rests
on) and the sizing clamp, over randomized key sets and types."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators import bloomfilter
from datafusion_uwheel_spark.operators.bloomjoin import (
    bloom_anti_join,
    bloom_semi_join,
)

# one strategy per hash domain: BIGINT goes raw, strings go through
# xxhash64 on both sides
_longs = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=40
)
_strs = st.lists(
    st.text(min_size=0, max_size=12), min_size=0, max_size=40
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(build=_longs, probe=_longs)
def test_no_false_negatives_longs(spark, build, probe):
    bdf = spark.createDataFrame([(v,) for v in build] or [(None,)], "k long")
    blob = bloomfilter.build_bloom(bdf, "k", fpp=0.05)
    if not build:
        # only-NULL build side aggregates to a NULL blob
        assert blob is None or isinstance(blob, bytes)
        return
    assert blob is not None
    pdf = spark.createDataFrame([(v,) for v in probe or [0]], "k long")
    hits = {
        r["k"]
        for r in pdf.filter(bloomfilter.might_contain(blob, "k")).collect()
    }
    # every true member must probe TRUE — false positives are allowed,
    # false negatives never
    assert set(build) & set(probe or [0]) <= hits


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(build=_strs, probe=_strs)
def test_semi_anti_equal_plain_joins_strings(spark, build, probe):
    left = spark.createDataFrame(
        [(i, v) for i, v in enumerate(probe)] or [(0, None)], "id long, k string"
    )
    right = spark.createDataFrame([(v,) for v in build] or [(None,)], "k string")
    semi_exact = sorted(
        r["id"] for r in left.join(right, "k", "left_semi").collect()
    )
    anti_exact = sorted(
        r["id"] for r in left.join(right, "k", "left_anti").collect()
    )
    semi = sorted(r["id"] for r in bloom_semi_join(left, right, "k").collect())
    anti = sorted(r["id"] for r in bloom_anti_join(left, right, "k").collect())
    assert semi == semi_exact
    assert anti == anti_exact
    # partition: every left row lands in exactly one side
    assert sorted(semi + anti) == sorted(r["id"] for r in left.collect())


def test_sizing_formula_and_caps(spark):
    # optimum at fpp=0.01 is ~9.585 bits/item
    items, bits = bloomfilter.bloom_num_bits(spark, 1000, 0.01)
    assert items == 1000 and 9_000 <= bits <= 10_000
    # floors
    items, bits = bloomfilter.bloom_num_bits(spark, 0, 0.5)
    assert items == 1 and bits >= 64
    # Spark's analysis caps clamp both knobs
    items, bits = bloomfilter.bloom_num_bits(spark, 10**12, 1e-9)
    assert items <= 4_000_000 and bits <= 67_108_864


def test_build_bloom_null_semantics(spark):
    # BIGINT NULLs reach the aggregate raw and are skipped -> NULL blob;
    # non-BIGINT NULLs hash through xxhash64(NULL) = the seed first, so an
    # all-NULL string side builds a real (one-entry) bloom. Callers stay
    # correct either way: their exact verify joins drop NULL matches.
    longs = spark.createDataFrame([(None,), (None,)], "k long")
    assert bloomfilter.build_bloom(longs, "k") is None
    strs = spark.createDataFrame([(None,), (None,)], "k string")
    blob = bloomfilter.build_bloom(strs, "k")
    assert isinstance(blob, bytes)
    empty = spark.createDataFrame([], "k string")
    assert bloomfilter.build_bloom(empty, "k") is None


def test_ensure_is_idempotent(spark):
    assert bloomfilter.ensure_bloom_fns(spark)
    assert bloomfilter.ensure_bloom_fns(spark)  # second call: registry hit
