"""Ask memoization on the JVM-sketch rollups (sketch_retention.py r9):
HLL / KLL / theta merges stay JVM jobs (their DataSketches wire formats
have no honest driver-side Python merge here), but every ask is a pure
function of (rollup state, args) — so repeated asks answer from an LRU
memo with ZERO Spark jobs, invalidated on every mutation. The frequency
family is out of scope: it answers zero-job from a full driver mirror
instead (test_frequency.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators.distinct import build_distinct_rollup
from datafusion_uwheel_spark.operators.quantiles import build_quantile_rollup
from datafusion_uwheel_spark.operators.theta import build_theta_rollup

BASE = datetime(2024, 2, 1)
A, B = "2024-02-01 00:00:00", "2024-02-01 06:00:00"
R1 = ("2024-02-01 00:00:00", "2024-02-01 03:00:00")
R2 = ("2024-02-01 03:00:00", "2024-02-01 06:00:00")


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (BASE + timedelta(hours=h, minutes=m), (h * 7 + m) % 40, float(h * 60 + m))
        for h in range(6)
        for m in range(0, 60, 5)
    ]
    return spark.createDataFrame(rows, "ts timestamp, uid bigint, v double")


def _no_jobs(spark, fn):
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    out = fn()
    after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    return out, after == before


def test_hll_ask_memoized_and_invalidated(spark, events):
    r = build_distinct_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        first = r.approx_distinct(A, B)
        second, job_free = _no_jobs(spark, lambda: r.approx_distinct(A, B))
        assert second == first and job_free
        sk, _ = _no_jobs(spark, lambda: r.merged_sketch(A, B))
        sk2, job_free = _no_jobs(spark, lambda: r.merged_sketch(A, B))
        assert sk2 == sk and job_free
        # a merge with NEW distinct values must invalidate the memo
        extra = spark.createDataFrame(
            [(BASE + timedelta(hours=1), 1000 + i, 0.0) for i in range(200)],
            "ts timestamp, uid bigint, v double",
        )
        r.merge_batch(extra, "ts")
        assert r.approx_distinct(A, B) > first
    finally:
        r.unpersist()


def test_kll_ask_memoized_and_invalidated(spark, events):
    r = build_quantile_rollup(events, "ts", "v", bucket_seconds=3600)
    try:
        q = r.approx_quantile(0.5, A, B)
        q2, job_free = _no_jobs(spark, lambda: r.approx_quantile(0.5, A, B))
        assert q2 == q and job_free
        # list-rank asks memoize on the rank tuple; result stays a list
        qs = r.approx_quantile([0.25, 0.75], A, B)
        qs2, job_free = _no_jobs(
            spark, lambda: r.approx_quantile([0.25, 0.75], A, B)
        )
        assert qs2 == qs and isinstance(qs2, list) and job_free
        rk = r.approx_rank(100.0, A, B)
        rk2, job_free = _no_jobs(spark, lambda: r.approx_rank(100.0, A, B))
        assert rk2 == rk and job_free
        # merging a block of huge values must move the memoized median
        extra = spark.createDataFrame(
            [(BASE + timedelta(hours=2), 0, 1e6)] * 500,
            "ts timestamp, uid bigint, v double",
        )
        r.merge_batch(extra, "ts")
        assert r.approx_quantile(0.5, A, B) != q
    finally:
        r.unpersist()


def test_theta_asks_memoized_and_compact_invalidates(spark, events):
    r = build_theta_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        vals = (
            r.approx_distinct(A, B),
            r.approx_retained(R1, R2),
            r.approx_new(R1, R2),
            r.approx_jaccard(R1, R2),
        )
        again, job_free = _no_jobs(
            spark,
            lambda: (
                r.approx_distinct(A, B),
                r.approx_retained(R1, R2),
                r.approx_new(R1, R2),
                r.approx_jaccard(R1, R2),
            ),
        )
        assert again == vals and job_free
        # compaction re-rolls the table — memo must drop (answers identical
        # here because theta union is exact algebra, but the memo itself
        # must be empty so the next ask recomputes from the new frame)
        cutoff = int(datetime(2024, 2, 1, 3).timestamp())
        r.compact_before(cutoff, 3600 * 3)
        assert not getattr(r, "_ask_memo", {})
        assert r.approx_distinct(A, B) == vals[0]
    finally:
        r.unpersist()


def test_memo_respects_stale_gate(spark, events):
    """mark_stale must gate even memoized answers — the gate runs before
    the memo lookup."""
    r = build_distinct_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        r.approx_distinct(A, B)  # memoize
        r.mark_stale("test")
        with pytest.raises(RuntimeError, match="STALE"):
            r.approx_distinct(A, B)
        r.mark_fresh()  # data never changed while stale — memo still valid
        _, job_free = _no_jobs(spark, lambda: r.approx_distinct(A, B))
        assert job_free
    finally:
        r.unpersist()


def test_memo_lru_bound(spark, events):
    r = build_distinct_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        # pin the JOB path: this test detects memo eviction by whether a
        # recompute launches a job, and the r10 direct path recomputes
        # zero-job (its own suite is test_sketch_direct.py)
        r._jvm_ops = None
        r._ASK_MEMO_MAX = 4
        for h in range(6):
            r.approx_distinct(f"2024-02-01 0{h}:00:00", B)
        assert len(r._ask_memo) == 4
        # the newest key survived (hit = no job), the oldest was evicted
        _, job_free = _no_jobs(
            spark, lambda: r.approx_distinct("2024-02-01 05:00:00", B)
        )
        assert job_free
        _, job_free = _no_jobs(
            spark, lambda: r.approx_distinct("2024-02-01 00:00:00", B)
        )
        assert not job_free
    finally:
        r.unpersist()


def test_memo_keys_carry_argument_type(spark, events):
    """r10 ADVICE: str(start) alone erases the ask argument's type — an
    int epoch and the string of the same digits stringify identically but
    resolve through DIFFERENT paths (``F.lit(int).cast('timestamp')`` is
    epoch seconds; the digit STRING casts to NULL → empty range). The
    type-tagged key must keep them distinct instead of aliasing to one
    cached answer."""
    from datetime import timezone

    r = build_distinct_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        a = int(BASE.replace(tzinfo=timezone.utc).timestamp())
        b = a + 6 * 3600
        n_int = r.approx_distinct(a, b)
        assert n_int > 0
        # same digits as strings: the ANSI timestamp cast RAISES on the
        # bare digit string — an aliased memo key would instead silently
        # return the cached int-epoch answer, masking the error
        with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
            r.approx_distinct(str(a), str(b))
        # and the int ask is still memoized under its own key
        got, job_free = _no_jobs(spark, lambda: r.approx_distinct(a, b))
        assert got == n_int and job_free
    finally:
        r.unpersist()


def test_rank_memo_key_normalizes_value(spark, events):
    """r10 ADVICE: the rank memo key normalizes the value component the
    same way the computation does (int for bigint sketches, float
    otherwise) — a bool ask shares the int key it computes identically
    to, and an unhashable value fails in the numeric coercion, not with
    an opaque hash TypeError at the memo lookup."""
    r = build_quantile_rollup(events, "ts", "v", bucket_seconds=3600)
    try:
        first = r.approx_rank(1.0, A, B)
        got, job_free = _no_jobs(spark, lambda: r.approx_rank(True, A, B))
        assert got == first and job_free  # True normalizes to 1.0
        with pytest.raises((TypeError, ValueError)):
            r.approx_rank([1.0], A, B)
    finally:
        r.unpersist()


def test_key_component_is_type_tagged(spark, events):
    """r10 review: F.lit(key) is type-sensitive while Python hashes
    True == 1 together — on a BIGINT key column Spark REFUSES the boolean
    comparison outright (DATATYPE_MISMATCH), so an aliased memo key would
    silently mask that analysis error with the cached int-key answer. The
    bool ask must surface its own error; the int ask stays memoized."""
    keyed = events.withColumn("seg", (F.col("uid") % 2).cast("long"))
    r = build_distinct_rollup(keyed, "ts", "uid", bucket_seconds=3600,
                              partition_by="seg")
    try:
        first = r.approx_distinct(A, B, key=1)
        _, job_free = _no_jobs(spark, lambda: r.approx_distinct(A, B, key=1))
        assert job_free  # same-typed repeat hits
        with pytest.raises(Exception, match="DATATYPE_MISMATCH"):
            r.approx_distinct(A, B, key=True)
        got, job_free = _no_jobs(spark, lambda: r.approx_distinct(A, B, key=1))
        assert got == first and job_free  # int key untouched by the raise
    finally:
        r.unpersist()


def test_rank_floors_bigint_asks(spark, events):
    """r10 review: over integer data the fraction <= -1.5 equals the
    fraction <= floor(-1.5) = -2; int() truncation toward zero would
    wrongly include -1's mass."""
    from datetime import timedelta as _td

    neg = spark.createDataFrame(
        [(BASE + _td(minutes=i), v, 0.0)
         for i, v in enumerate([-3, -2, -1, 0, 1, 2] * 5)],
        "ts timestamp, uid bigint, v double",
    )
    r = build_quantile_rollup(neg, "ts", "uid", bucket_seconds=3600)
    try:
        assert r.approx_rank(-1.5, A, B) == r.approx_rank(-2, A, B)
        assert r.approx_rank(-1.5, A, B) < r.approx_rank(-1, A, B)
        # digit-string asks worked via int("5") before the floor fix and
        # the double family accepts them — behavior must not diverge
        assert r.approx_rank("1", A, B) == r.approx_rank(1, A, B)
    finally:
        r.unpersist()
