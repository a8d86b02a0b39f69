"""Grouped (dashboard-series) direct sketch asks (r11): the frequency
family's ``topk_rows_by`` economics extended to the three JVM-sketch
families — ``distinct_rows_by`` / ``quantile_rows_by`` /
``retention_rows_by`` answer the ``approx_*_by`` series ZERO-JOB from the
driver mirror through ONE batched py4j call
(``UwheelSketchOps.{hllEstimateGrouped,kllQuantiles*Grouped,
thetaRetentionGrouped}``), instead of the ~200 ms Spark job per ask.

Contract (the test_sketch_direct.py discipline): (a) rows EQUAL the job
path's collected DataFrame — exact for theta (order-free hash-set
algebra), for HLL in the coupon-exact regime these fixtures stay in
(beyond it HLL's HIP estimator is update-order-dependent: both paths
valid within the bound — probe-pinned r11, bench asserts are
bound-based), and for single-bucket KLL cells; rank-bounded for
multi-bucket KLL cells (randomized merge compaction); (b) warm grouped asks launch ZERO Spark
jobs; (c) the gate's refusals (exotic date_trunc level, unresolvable
bounds, shim-less session) fall back to the job path transparently;
(d) mutations (merge_batch / compact_before) drop the mirror so grouped
answers track the new state, and compaction's tiling gate raises on BOTH
paths; (e) NULL-sketch buckets surface exactly like the job path (NULL
estimate / NULL-per-rank / the theta coalesce-to-0 algebra)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from datafusion_uwheel_spark.operators.distinct import build_distinct_rollup
from datafusion_uwheel_spark.operators.quantiles import build_quantile_rollup
from datafusion_uwheel_spark.operators.theta import build_theta_rollup

BASE = datetime(2024, 2, 1)
A, B = "2024-02-01 03:00:00", "2024-02-02 01:00:00"


@pytest.fixture(scope="module")
def events(spark):
    # 30 hours (spans two days), values 0..1799, uid cycles mod 53
    rows = [
        (
            BASE + timedelta(hours=h, minutes=m),
            (h * 11 + m) % 53,
            float(h * 60 + m),
            "click" if m % 4 else "view",
        )
        for h in range(30)
        for m in range(0, 60, 2)
    ]
    return spark.createDataFrame(
        rows, "ts timestamp, uid bigint, v double, et string"
    )


def _no_jobs(spark, fn):
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    out = fn()
    after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    return out, after == before


def _force_job_path(rollup):
    rollup._jvm_ops = None


def _reenable(rollup):
    if hasattr(rollup, "_jvm_ops"):
        del rollup._jvm_ops


# ------------------------------------------------------------------- HLL
def test_hll_grouped_parity_and_job_free(spark, events):
    r = build_distinct_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        for gran, s, e in [
            ("hour", A, B),
            ("day", None, None),
            (21600, A, None),
            ("week", None, B),
        ]:
            r.invalidate_asks()
            direct, job_free = _no_jobs(
                spark, lambda: r.distinct_rows_by(gran, s, e)
            )
            assert job_free, (gran, s, e)
            job = [
                tuple(x) for x in r.approx_distinct_by(gran, s, e).collect()
            ]
            assert direct == job, (gran, s, e)
        # memo: repeat ask is a dict hit, still zero-job
        again, job_free = _no_jobs(spark, lambda: r.distinct_rows_by("hour", A, B))
        assert job_free and again == r.distinct_rows_by("hour", A, B)
        # empty restriction -> [] on both paths
        r.invalidate_asks()
        assert r.distinct_rows_by("hour", "2030-01-01", "2030-01-02") == []
        assert (
            r.approx_distinct_by("hour", "2030-01-01", "2030-01-02").count()
            == 0
        )
    finally:
        r.unpersist()


def test_hll_grouped_fallback_matches_direct(spark, events):
    r = build_distinct_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        direct = r.distinct_rows_by("hour", A, B)
        _force_job_path(r)
        r.invalidate_asks()
        assert r.distinct_rows_by("hour", A, B) == direct  # job-path rows
        _reenable(r)
        # exotic granularity: gate refuses, fallback answers identically
        r.invalidate_asks()
        rows = r.distinct_rows_by("dd", A, B)  # Spark alias for day
        assert rows == [
            tuple(x) for x in r.approx_distinct_by("dd", A, B).collect()
        ]
        # a bound the job path raises on must still raise (ANSI cast)
        with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
            r.distinct_rows_by("hour", "20240201", "20240202")
    finally:
        r.unpersist()


def test_hll_grouped_null_sketch_bucket(spark):
    # one bucket whose uids are ALL NULL: hll_sketch_agg yields an EMPTY
    # sketch (not NULL — probed r11), so the job path estimates 0 for that
    # bucket; the direct path must match exactly
    rows = [(BASE + timedelta(hours=h, minutes=m), None if h == 1 else h * 60 + m)
            for h in range(3) for m in range(0, 60, 10)]
    ev = spark.createDataFrame(rows, "ts timestamp, uid bigint")
    r = build_distinct_rollup(ev, "ts", "uid", bucket_seconds=3600)
    try:
        direct, job_free = _no_jobs(spark, lambda: r.distinct_rows_by("hour"))
        assert job_free
        job = [tuple(x) for x in r.approx_distinct_by("hour").collect()]
        assert direct == job
        assert direct[1][1] == 0  # the all-NULL hour: empty sketch -> 0
    finally:
        r.unpersist()


def test_hll_grouped_keyed_rollup_unions_keys(spark, events):
    # a keyed build answers UNKEYED grouped asks by unioning keys within
    # each cell — same grouping the job path applies
    r = build_distinct_rollup(
        events, "ts", "uid", bucket_seconds=3600, partition_by="et"
    )
    try:
        direct, job_free = _no_jobs(spark, lambda: r.distinct_rows_by("day"))
        assert job_free
        assert direct == [
            tuple(x) for x in r.approx_distinct_by("day").collect()
        ]
    finally:
        r.unpersist()


def test_hll_grouped_tracks_merge_batch(spark, events):
    r = build_distinct_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        before = r.distinct_rows_by("day")
        late = spark.createDataFrame(
            [(BASE + timedelta(hours=1, minutes=1), 9901),
             (BASE + timedelta(hours=1, minutes=3), 9902)],
            "ts timestamp, uid bigint",
        )
        r.merge_batch(late, "ts")
        after, job_free = _no_jobs(spark, lambda: r.distinct_rows_by("day"))
        # mirror re-collects once after the mutation (small jobs allowed),
        # so only assert the VALUES moved with the data
        assert after != before
        assert after == [
            tuple(x) for x in r.approx_distinct_by("day").collect()
        ]
    finally:
        r.unpersist()


def test_hll_grouped_compaction_tiling_both_paths(spark, events):
    import calendar

    r = build_distinct_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        cutoff = calendar.timegm(datetime(2024, 2, 2).utctimetuple())
        r.compact_before(cutoff, 86400)
        # finer than the tier: raises identically on direct and job paths
        with pytest.raises(ValueError, match="not tiled"):
            r.distinct_rows_by("hour")
        with pytest.raises(ValueError, match="not tiled"):
            r.approx_distinct_by("hour")
        # compaction dropped the mirror: the FIRST ask re-collects it (two
        # small jobs per data version), fresh asks after that are zero-job
        r.distinct_rows_by("day")
        r.invalidate_asks()
        direct, job_free = _no_jobs(spark, lambda: r.distinct_rows_by("day"))
        assert job_free
        assert direct == [
            tuple(x) for x in r.approx_distinct_by("day").collect()
        ]
        # fine granularity over the UNCOMPACTED suffix stays answerable
        fine = r.distinct_rows_by("hour", "2024-02-02 00:00:00", B)
        assert fine == [
            tuple(x)
            for x in r.approx_distinct_by(
                "hour", "2024-02-02 00:00:00", B
            ).collect()
        ]
    finally:
        r.unpersist()


# ------------------------------------------------------------------- KLL
def test_kll_grouped_parity_single_bucket_cells(spark, events):
    r = build_quantile_rollup(events, "ts", "v", bucket_seconds=3600)
    try:
        # hour cells hold ONE sketch each: no merge randomization, exact
        for q in (0.5, [0.25, 0.9]):
            r.invalidate_asks()
            direct, job_free = _no_jobs(
                spark, lambda: r.quantile_rows_by("hour", q, A, B)
            )
            assert job_free
            assert direct == [
                tuple(x)
                for x in r.approx_quantile_by("hour", q, A, B).collect()
            ]
        # empty restriction
        r.invalidate_asks()
        assert r.quantile_rows_by("hour", 0.5, "2030-01-01", "2030-01-02") == []
    finally:
        r.unpersist()


def test_kll_grouped_multi_bucket_rank_bounded(spark, events):
    r = build_quantile_rollup(events, "ts", "v", bucket_seconds=3600)
    try:
        direct, job_free = _no_jobs(
            spark, lambda: r.quantile_rows_by("day", 0.5)
        )
        assert job_free
        by_day: dict = {}
        for row in events.select("ts", "v").collect():
            by_day.setdefault(row[0].date(), []).append(row[1])
        assert len(direct) == len(by_day)
        for bucket, val in direct:
            vals = sorted(by_day[bucket.date()])
            rank = vals.index(val) / len(vals)
            assert abs(rank - 0.5) < 0.05  # ~3x the k=200 bound
    finally:
        r.unpersist()


def test_kll_grouped_bigint_family_and_null_bucket(spark):
    rows = [
        (BASE + timedelta(hours=h, minutes=m), None if h == 1 else h * 60 + m)
        for h in range(3)
        for m in range(0, 60, 10)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, iv bigint")
    r = build_quantile_rollup(ev, "ts", "iv", bucket_seconds=3600)
    try:
        assert r.suffix == "bigint"
        direct, job_free = _no_jobs(
            spark, lambda: r.quantile_rows_by("hour", [0.5, 1.0])
        )
        assert job_free
        job = [
            tuple(x) for x in r.approx_quantile_by("hour", [0.5, 1.0]).collect()
        ]
        assert direct == job  # single-bucket cells: exact, int-typed
        assert direct[1][1] is None and direct[1][2] is None  # NULL hour
        assert all(
            isinstance(v, int) for row in direct for v in row[1:] if v is not None
        )
        # rank validation mirrors the scalar ask
        with pytest.raises(ValueError, match="outside"):
            r.quantile_rows_by("hour", 1.5)
    finally:
        r.unpersist()


def test_kll_grouped_fallback_matches(spark, events):
    r = build_quantile_rollup(events, "ts", "v", bucket_seconds=3600)
    try:
        direct = r.quantile_rows_by("hour", 0.5, A, B)
        _force_job_path(r)
        r.invalidate_asks()
        assert r.quantile_rows_by("hour", 0.5, A, B) == direct
    finally:
        r.unpersist()


# ----------------------------------------------------------------- theta
def test_theta_grouped_parity_and_job_free(spark, events):
    r = build_theta_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        for gran, s, e in [("hour", A, B), ("day", None, None), (21600, None, None)]:
            r.invalidate_asks()
            direct, job_free = _no_jobs(
                spark, lambda: r.retention_rows_by(gran, s, e)
            )
            assert job_free, (gran, s, e)
            job = [tuple(x) for x in r.retention_by(gran, s, e).collect()]
            assert direct == job, (gran, s, e)
        # first period carries the job path's NULLs
        head = r.retention_rows_by("day")[0]
        assert head[2] is None and head[3] is None and head[4] is None
        # empty restriction
        r.invalidate_asks()
        assert r.retention_rows_by("hour", "2030-01-01", "2030-01-02") == []
    finally:
        r.unpersist()


def test_theta_grouped_null_sketch_period(spark):
    # an all-NULL period: theta_sketch_agg yields an EMPTY sketch (like
    # HLL — probed r11), so the period estimates 0 and the NEXT period's
    # lag sees a real (empty) sketch: n_prev 0, retention NULL (the
    # n_prev > 0 gate). The direct rows must match the job path exactly.
    rows = [
        (BASE + timedelta(hours=h, minutes=m), None if h == 1 else (h * 7 + m) % 19)
        for h in range(3)
        for m in range(0, 60, 10)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, uid bigint")
    r = build_theta_rollup(ev, "ts", "uid", bucket_seconds=3600)
    try:
        direct, job_free = _no_jobs(spark, lambda: r.retention_rows_by("hour"))
        assert job_free
        job = [tuple(x) for x in r.retention_by("hour").collect()]
        assert direct == job
        assert direct[1][1] == 0  # empty-sketch period estimates 0
    finally:
        r.unpersist()


def test_theta_grouped_fallback_matches(spark, events):
    r = build_theta_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        direct = r.retention_rows_by("day")
        _force_job_path(r)
        r.invalidate_asks()
        assert r.retention_rows_by("day") == direct
    finally:
        r.unpersist()


# ------------------------------------------------------------ by_key (r11)
def test_hll_by_key_parity_and_job_free(spark, events):
    r = build_distinct_rollup(
        events, "ts", "uid", bucket_seconds=3600, partition_by="et"
    )
    try:
        for s, e in [(None, None), (A, B), (A, None)]:
            r.invalidate_asks()
            direct, job_free = _no_jobs(
                spark, lambda: r.distinct_rows_by_key(s, e)
            )
            assert job_free, (s, e)
            assert direct == [
                tuple(x) for x in r.approx_distinct_by_key(s, e).collect()
            ], (s, e)
        # forced job path: identical rows through the fallback
        _force_job_path(r)
        r.invalidate_asks()
        assert r.distinct_rows_by_key(A, B) == [
            tuple(x) for x in r.approx_distinct_by_key(A, B).collect()
        ]
        _reenable(r)
        # unresolvable bound: fallback owns it (and its errors)
        r.invalidate_asks()
        with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
            r.distinct_rows_by_key("20240201", "20240202")
    finally:
        r.unpersist()


def test_hll_by_key_null_keys_first_and_unkeyed_raises(spark):
    from pyspark.sql import functions as F

    rows = [
        (BASE + timedelta(hours=h, minutes=m), h * 60 + m)
        for h in range(3)
        for m in range(0, 60, 4)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, uid bigint").withColumn(
        "k", F.when(F.col("uid") % 3 == 0, F.lit(None)).otherwise(F.col("uid") % 3)
    )
    r = build_distinct_rollup(ev, "ts", "uid", bucket_seconds=3600, partition_by="k")
    try:
        direct, job_free = _no_jobs(spark, lambda: r.distinct_rows_by_key())
        assert job_free
        assert direct == [
            tuple(x) for x in r.approx_distinct_by_key().collect()
        ]
        assert direct[0][0] is None  # NULL key first, like the job ORDER BY
    finally:
        r.unpersist()
    r2 = build_distinct_rollup(ev, "ts", "uid", bucket_seconds=3600)
    try:
        with pytest.raises(ValueError, match="partition_by"):
            r2.distinct_rows_by_key()
    finally:
        r2.unpersist()


def test_kll_by_key_parity(spark, events):
    r = build_quantile_rollup(
        events, "ts", "v", bucket_seconds=3600, partition_by="et"
    )
    try:
        for q in (0.5, [0.25, 0.9]):
            # single-hour restriction: one bucket per key — exact, no
            # merge randomization
            one_hr = ("2024-02-01 04:00:00", "2024-02-01 05:00:00")
            r.invalidate_asks()
            direct, job_free = _no_jobs(
                spark, lambda: r.quantile_rows_by_key(q, *one_hr)
            )
            assert job_free, q
            assert direct == [
                tuple(x)
                for x in r.approx_quantile_by_key(q, *one_hr).collect()
            ], q
        with pytest.raises(ValueError, match="outside"):
            r.quantile_rows_by_key(1.5)
    finally:
        r.unpersist()


def test_theta_retained_by_key_parity_and_job_free(spark, events):
    # the last *_by_key form (r11): cohort retention zero-job — both
    # ranges' per-key unions AND intersections in one batched call.
    # Theta algebra is update-order-free, so parity is EXACT.
    r = build_theta_rollup(
        events, "ts", "uid", bucket_seconds=3600, partition_by="et"
    )
    r1 = (A, "2024-02-02 00:00:00")
    r2 = ("2024-02-02 00:00:00", "2024-02-03 00:00:00")
    try:
        for ra, rb in [
            (r1, r2),
            (r1, r1),  # identical ranges: retained == each side
            (r1, ("2030-01-01", "2030-01-02")),  # empty r2 side
        ]:
            r.invalidate_asks()
            direct, job_free = _no_jobs(
                spark, lambda: r.retained_rows_by_key(ra, rb)
            )
            assert job_free, (ra, rb)
            assert direct == [
                tuple(x) for x in r.retained_by_key(ra, rb).collect()
            ], (ra, rb)
        # empty r2: keys still listed from r1, n_r2/n_retained 0
        r.invalidate_asks()
        rows = r.retained_rows_by_key(r1, ("2030-01-01", "2030-01-02"))
        assert rows and all(x[2] == 0 and x[3] == 0 for x in rows)
        # memoized repeat: zero-job dict hit
        again, job_free = _no_jobs(spark, lambda: r.retained_rows_by_key(r1, r2))
        assert job_free and again == r.retained_rows_by_key(r1, r2)
        # forced job path: identical rows through the fallback
        direct = r.retained_rows_by_key(r1, r2)
        _force_job_path(r)
        r.invalidate_asks()
        assert r.retained_rows_by_key(r1, r2) == direct
        _reenable(r)
        # a bound the job path raises on must still raise (ANSI cast)
        r.invalidate_asks()
        with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
            r.retained_rows_by_key(("20240201", "20240202"), r2)
    finally:
        r.unpersist()


def test_theta_retained_by_key_null_keys_and_unkeyed_raises(spark):
    from pyspark.sql import functions as F

    rows = [
        (BASE + timedelta(hours=h, minutes=m), (h * 7 + m) % 19)
        for h in range(30)
        for m in range(0, 60, 4)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, uid bigint").withColumn(
        "k", F.when(F.col("uid") % 3 == 0, F.lit(None)).otherwise(F.col("uid") % 3)
    )
    r = build_theta_rollup(ev, "ts", "uid", bucket_seconds=3600, partition_by="k")
    r1 = ("2024-02-01 00:00:00", "2024-02-02 00:00:00")
    r2 = ("2024-02-02 00:00:00", "2024-02-03 00:00:00")
    try:
        direct, job_free = _no_jobs(spark, lambda: r.retained_rows_by_key(r1, r2))
        assert job_free
        assert direct == [
            tuple(x) for x in r.retained_by_key(r1, r2).collect()
        ]
        assert direct[0][0] is None  # NULL key first, like the job ORDER BY
        assert any(x[3] > 0 for x in direct)  # cohorts genuinely overlap
    finally:
        r.unpersist()
    r2u = build_theta_rollup(ev, "ts", "uid", bucket_seconds=3600)
    try:
        with pytest.raises(ValueError, match="partition_by"):
            r2u.retained_rows_by_key(r1, r2)
    finally:
        r2u.unpersist()


def test_theta_cohort_by_key_parity_and_consistency(spark, events):
    # the FULL keyed set algebra: retained + new + jaccard per key in one
    # call — exact parity (order-free theta), internally consistent with
    # the 4-column retained subset
    r = build_theta_rollup(
        events, "ts", "uid", bucket_seconds=3600, partition_by="et"
    )
    r1 = (A, "2024-02-02 00:00:00")
    r2 = ("2024-02-02 00:00:00", "2024-02-03 00:00:00")
    try:
        direct, job_free = _no_jobs(spark, lambda: r.cohort_rows_by_key(r1, r2))
        assert job_free
        assert direct == [tuple(x) for x in r.cohort_by_key(r1, r2).collect()]
        # the retained columns are the 4-column form verbatim
        assert [(k, a, b, i) for k, a, b, i, _n, _j in direct] == (
            r.retained_rows_by_key(r1, r2)
        )
        for _k, n1, n2, ret, new, jac in direct:
            # exact regime on this fixture: new = r2 minus the overlap
            assert new == n2 - ret
            assert 0.0 <= jac <= 1.0
            if ret:
                assert jac > 0.0
        # forced job path: identical rows
        _force_job_path(r)
        r.invalidate_asks()
        assert r.cohort_rows_by_key(r1, r2) == direct
        _reenable(r)
        # empty r2 side: n_r2/n_retained/n_new 0, jaccard 0.0 per key
        r.invalidate_asks()
        rows = r.cohort_rows_by_key(r1, ("2030-01-01", "2030-01-02"))
        assert rows and all(
            x[2] == 0 and x[3] == 0 and x[4] == 0 and x[5] == 0.0 for x in rows
        )
        assert rows == [
            tuple(x)
            for x in r.cohort_by_key(r1, ("2030-01-01", "2030-01-02")).collect()
        ]
    finally:
        r.unpersist()
    r2u = build_theta_rollup(events, "ts", "uid", bucket_seconds=3600)
    try:
        with pytest.raises(ValueError, match="partition_by"):
            r2u.cohort_rows_by_key(r1, r2)
    finally:
        r2u.unpersist()


def test_theta_retained_by_key_tracks_mutations(spark, events):
    r = build_theta_rollup(
        events, "ts", "uid", bucket_seconds=3600, partition_by="et"
    )
    r1 = (A, "2024-02-02 00:00:00")
    r2 = ("2024-02-02 00:00:00", "2024-02-03 00:00:00")
    try:
        before = r.retained_rows_by_key(r1, r2)
        # a batch of uids present in BOTH ranges moves every column
        late = spark.createDataFrame(
            [
                (BASE + timedelta(days=d, hours=6, minutes=i), 7000 + i, "click")
                for d in range(2)
                for i in range(40)
            ],
            "ts timestamp, uid bigint, et string",
        )
        r.merge_batch(late, "ts")
        after = r.retained_rows_by_key(r1, r2)
        assert after != before
        assert after == [
            tuple(x) for x in r.retained_by_key(r1, r2).collect()
        ]
    finally:
        r.unpersist()


def test_by_key_tracks_mutations(spark, events):
    r = build_distinct_rollup(
        events, "ts", "uid", bucket_seconds=3600, partition_by="et"
    )
    try:
        before = r.distinct_rows_by_key()
        late = spark.createDataFrame(
            [(BASE + timedelta(hours=1, minutes=1), 9901 + i, "click")
             for i in range(30)],
            "ts timestamp, uid bigint, et string",
        )
        r.merge_batch(late, "ts")
        after = r.distinct_rows_by_key()
        assert after != before
        assert after == [
            tuple(x) for x in r.approx_distinct_by_key().collect()
        ]
    finally:
        r.unpersist()
