"""Bloom-prefiltered semi/anti joins vs Spark's own exact joins — the
plain join IS the oracle (the composition must equal it row-for-row)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators import bloomjoin
from datafusion_uwheel_spark.operators.bloomjoin import (
    bloom_anti_join,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def frames(spark, sf_medium_dir):
    docs = spark.read.parquet(f"{sf_medium_dir}/documents.parquet")
    left = docs.select("doc_id", F.md5("text").alias("digest"), "lang")
    # the reference set: digests of a THIRD of the corpus, plus novel keys
    right = (
        left.filter(F.col("doc_id") % 3 == 0).select("digest")
        .unionByName(
            spark.createDataFrame(
                [("not-a-digest-1",), ("not-a-digest-2",)], "digest string"
            )
        )
    )
    return left, right


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_semi_equals_plain_join_string_keys(spark, frames):
    left, right = frames
    exact = left.join(right, on="digest", how="left_semi")
    got = bloom_semi_join(left, right, "digest")
    assert _ids(got) == _ids(exact)
    assert got.columns == left.columns
    assert len(_ids(got)) > 0


def test_anti_equals_plain_join_string_keys(spark, frames):
    left, right = frames
    exact = left.join(right, on="digest", how="left_anti")
    got = bloom_anti_join(left, right, "digest")
    assert _ids(got) == _ids(exact)
    assert got.columns == left.columns
    assert 0 < len(_ids(got)) < left.count()


def test_bigint_keys_and_column_pair(spark, frames):
    """BIGINT keys take the raw-long hash domain; (left_col, right_col)
    naming works."""
    left, _ = frames
    right = left.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("ref_id")
    )
    exact = left.join(
        right, on=F.col("doc_id") == F.col("ref_id"), how="left_semi"
    )
    got = bloom_semi_join(left, right, ("doc_id", "ref_id"))
    assert _ids(got) == _ids(exact)


def test_null_keys_follow_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, k string"
    )
    right = spark.createDataFrame([("a",), (None,)], "k string")
    semi = bloom_semi_join(left, right, "k")
    anti = bloom_anti_join(left, right, "k")
    assert sorted(r["id"] for r in semi.collect()) == [1]  # NULL never matches
    assert sorted(r["id"] for r in anti.collect()) == [2, 3]


def test_empty_right(spark, frames):
    left, _ = frames
    empty = spark.createDataFrame([], "digest string")
    assert bloom_semi_join(left, empty, "digest").count() == 0
    assert bloom_anti_join(left, empty, "digest").count() == left.count()


def test_aggressive_fpp_still_exact(spark, frames):
    """fpp=0.5 floods the verify stage with false positives — answers
    must not change."""
    left, right = frames
    exact = left.join(right, on="digest", how="left_anti")
    got = bloom_anti_join(left, right, "digest", fpp=0.5, expected_items=50)
    assert _ids(got) == _ids(exact)


def test_type_mismatch_refused(spark, frames):
    left, _ = frames
    right = spark.createDataFrame([(1,), (2,)], "digest long")
    with pytest.raises(ValueError, match="types must match"):
        bloom_semi_join(left, right, "digest")
    with pytest.raises(ValueError, match="types must match"):
        bloom_anti_join(left, right, ("digest", "digest"))


def test_prefilter_in_plan(spark, frames):
    left, right = frames
    plan = (
        bloom_semi_join(left, right, "digest")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "might_contain" in plan


def test_fallback_without_shim(spark, frames, monkeypatch):
    left, right = frames
    monkeypatch.setattr(bloomjoin, "ensure_bloom_fns", lambda s: False)
    exact = left.join(right, on="digest", how="left_semi")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = bloom_semi_join(left, right, "digest")
        ids = _ids(got)
    assert any("exact join" in str(x.message) for x in w)
    assert ids == _ids(exact)


def test_arg_validation(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        bloom_semi_join(left, right, "digest", fpp=0.0)
    with pytest.raises(ValueError):
        bloom_semi_join(left, right, ("a", "b", "c"))


def test_anti_persist_left_same_rows_one_source_scan(spark, frames):
    """persist_left (r12 — the r11 verdict's #7): identical rows, but the
    union's two branches read the persisted probe frame instead of each
    re-scanning the source — the executed plan shows the in-memory reads
    and at most one source scan, and the probe expression is evaluated
    before the cache (paid once, not per branch)."""
    left, right = frames
    exact = left.join(right, on="digest", how="left_anti")
    got = bloom_anti_join(left, right, "digest", persist_left=True)
    try:
        assert _ids(got) == _ids(exact)
        assert got.columns == left.columns
        phys = got._jdf.queryExecution().executedPlan().toString()
        # both branches read the CACHE (each InMemoryTableScan prints the
        # cached relation's build plan, so counting the parquet path in
        # the TEXT over-counts — the structural claim is the two cache
        # reads here vs the default path's two source scans below)
        assert phys.count("InMemoryTableScan") >= 2, phys
        # the probe expression is computed beneath the cache: each branch
        # filters on the cached __bj_mc column, not on a fresh
        # uw_might_contain over the source
        assert "uw_might_contain" not in phys.split("InMemoryRelation")[0], phys
        default = bloom_anti_join(left, right, "digest")
        dphys = default._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in dphys
        assert dphys.count("documents.parquet") >= 2, dphys
        # the temp probe column never leaks
        assert "__bj_mc" not in got.columns
    finally:
        got._uw_release()


def test_anti_persist_left_release_hook(spark, frames):
    left, right = frames
    got = bloom_anti_join(left, right, "digest", persist_left=True)
    got.count()
    cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert cached_before > 0
    got._uw_release()
