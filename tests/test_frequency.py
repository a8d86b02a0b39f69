"""Heavy-hitters / top-k truncated-counter rollup (operators/frequency.py):
the [est, upper] bound contract on adversarial skew, merge-bound growth,
retention folding, tie-break determinism, save/load, and the engine +
streaming-maintainer glue.

Unlike the union-monoid sketches (HLL/KLL/theta), the frequency summary is
*lossy by design*: per bucket only the top ``capacity`` exact counts are
kept and everything below folds into a per-bucket ``err``. The invariant
every test leans on: for EVERY item and every aligned range,

    est <= true_count <= est + total_err(range)        (= ``upper``)

with est EXACT (err 0) whenever capacity >= per-bucket distinct items.
"""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timedelta
import random as _random

import pytest

from datafusion_uwheel_spark import WheelEngine
from datafusion_uwheel_spark.operators.frequency import (
    build_frequency_rollup,
    load_frequency_rollup,
)

BASE = datetime(2024, 2, 1)
DAY1 = "2024-02-01 00:00:00"
DAY2 = "2024-02-02 00:00:00"
DAY3 = "2024-02-03 00:00:00"
FULL = (DAY1, DAY3)


def _mk_rows():
    """Two days x six hourly buckets of skewed traffic: two heavy items
    dominate every bucket; ten tail items carry near-tied small counts
    (adversarial for truncation — the kept set flips between buckets)."""
    rng = _random.Random(42)
    rows = []
    for day in range(2):
        for hour in range(6):
            ts = BASE + timedelta(days=day, hours=hour)
            rows += [(ts, "hvy_a")] * 30
            rows += [(ts, "hvy_b")] * 20
            for t in range(10):
                rows += [(ts, f"t{t:02d}")] * rng.randint(1, 6)
    # a NULL item in two buckets: NULL is a countable value, not a drop
    rows += [(BASE + timedelta(hours=1), None)] * 5
    rows += [(BASE + timedelta(days=1, hours=2), None)] * 3
    return rows


ROWS = _mk_rows()


def _truth(a: str, b: str) -> Counter:
    lo = datetime.fromisoformat(a)
    hi = datetime.fromisoformat(b)
    return Counter(item for ts, item in ROWS if lo <= ts < hi)


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(ROWS, "ts timestamp, item string")


@pytest.fixture(scope="module")
def tight(events):
    """capacity 4 < 13 distinct per bucket — truncation active."""
    r = build_frequency_rollup(events, "item", "ts", bucket_seconds=3600, capacity=4)
    yield r
    r.unpersist()


@pytest.fixture(scope="module")
def ample(events):
    """capacity 64 >= distinct per bucket — exact everywhere."""
    r = build_frequency_rollup(events, "item", "ts", bucket_seconds=3600, capacity=64)
    yield r
    r.unpersist()


def _bounds(rollup, a: str, b: str) -> tuple[dict, int]:
    """{item: (est, upper)} for every KEPT item in range + the range's
    total_err (items absent from the rollup have est 0, upper total_err)."""
    kept = {
        row["item"]: (row["est"], row["upper"])
        for row in rollup.approx_topk(a, b, k=10_000).collect()
    }
    return kept, rollup.total_err(a, b)


def _assert_bounds_hold(rollup, a: str, b: str) -> None:
    kept, terr = _bounds(rollup, a, b)
    truth = _truth(a, b)
    for item, true in truth.items():
        est, upper = kept.get(item, (0, terr))
        assert est <= true <= upper, (item, est, true, upper)
    # kept items never overcount: est is a sum of exact kept counts
    for item, (est, upper) in kept.items():
        assert est <= truth.get(item, 0)
        assert upper == est + terr


# ------------------------------------------------------------ exact regime
def test_exact_when_capacity_covers(ample):
    assert ample.total_err(*FULL) == 0
    truth = _truth(*FULL)
    got = {r["item"]: (r["est"], r["upper"]) for r in
           ample.approx_topk(*FULL, k=10_000).collect()}
    assert {i: e for i, (e, _) in got.items()} == dict(truth)
    assert all(e == u for e, u in got.values())  # upper == est when err 0
    # top-k ordering: est desc, then item asc
    top3 = [r["item"] for r in ample.approx_topk(*FULL, k=3).collect()]
    want = sorted(truth, key=lambda i: (-truth[i], i if i is not None else ""))[:3]
    assert top3 == want


def test_point_query_exact_and_null_item(ample):
    truth = _truth(*FULL)
    assert ample.approx_count("hvy_a", *FULL) == (truth["hvy_a"], truth["hvy_a"])
    assert ample.approx_count(None, *FULL) == (truth[None], truth[None])
    assert ample.approx_count("nope", *FULL) == (0, 0)


# ------------------------------------------------------- truncated regime
def test_bounds_hold_under_truncation(tight):
    assert tight.total_err(*FULL) > 0
    for a, b in (FULL, (DAY1, DAY2), (DAY2, DAY3),
                 ("2024-02-01 02:00:00", "2024-02-01 05:00:00")):
        _assert_bounds_hold(tight, a, b)


def test_heavy_hitter_guarantee(tight):
    """Any item whose true count beats the k-th est + total_err MUST be in
    the returned top-k (the standard SpaceSaving guarantee)."""
    k = 4
    top = tight.approx_topk(*FULL, k=k).collect()
    kth_est = top[-1]["est"]
    terr = tight.total_err(*FULL)
    present = {r["item"] for r in top}
    for item, true in _truth(*FULL).items():
        if true > kth_est + terr:
            assert item in present, (item, true, kth_est, terr)
    # the two genuinely heavy items always survive
    assert {"hvy_a", "hvy_b"} <= present


def test_empty_range_and_validation(tight):
    empty = ("2030-01-01 00:00:00", "2030-01-02 00:00:00")
    assert tight.approx_topk(*empty).collect() == []
    assert tight.approx_count("hvy_a", *empty) == (0, 0)
    assert tight.total_err(*empty) == 0
    with pytest.raises(ValueError):  # not hour-aligned
        tight.approx_topk(DAY1, "2024-02-01 03:30:00")
    with pytest.raises(ValueError):  # unparseable bound
        tight.approx_count("hvy_a", "not-a-time", DAY2)


def test_capacity_must_be_positive(events):
    with pytest.raises(ValueError):
        build_frequency_rollup(events, "item", "ts", capacity=0)


def test_tie_break_deterministic(spark):
    """Exact ties at the truncation boundary keep the lexicographically
    smallest items — two builds collect identically."""
    ts = datetime(2024, 2, 1)
    df = spark.createDataFrame(
        [(ts, i) for i in ("c", "a", "b", "d", "e") for _ in range(5)],
        "ts timestamp, item string",
    )
    r1 = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=2)
    r2 = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=2)
    try:
        day = ("2024-02-01 00:00:00", "2024-02-02 00:00:00")
        got1 = r1.approx_topk(*day, k=5).collect()
        assert [x["item"] for x in got1] == ["a", "b"]
        assert [x["est"] for x in got1] == [5, 5]
        assert [x["upper"] for x in got1] == [10, 10]  # err = 5 (the 3rd)
        assert got1 == r2.approx_topk(*day, k=5).collect()
    finally:
        r1.unpersist()
        r2.unpersist()


def test_total_err_is_driver_resident(tight, spark):
    """total_err is a prefix-sum lookup over the driver-mirrored error
    table — zero Spark jobs (the wheels' driver-residency discipline)."""
    tight.total_err(*FULL)  # warm
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    assert tight.total_err(*FULL) > 0
    assert tight.total_err(DAY1, DAY2) >= 0
    after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    assert after == before


# ------------------------------------------------------------ group-by form
def _truth_by_day() -> dict:
    out: dict = {}
    for ts, item in ROWS:
        day = datetime(ts.year, ts.month, ts.day)
        out.setdefault(day, Counter())[item] += 1
    return out


def test_topk_by_exact_per_day(ample):
    got: dict = {}
    for r in ample.approx_topk_by("day", k=2).collect():
        got.setdefault(r["bucket"], []).append((r["item"], r["est"], r["upper"]))
    truth = _truth_by_day()
    assert set(got) == set(truth)
    for day, rows in got.items():
        want = sorted(
            truth[day].items(), key=lambda kv: (-kv[1], kv[0] or "")
        )[:2]
        assert [(i, e) for i, e, _ in rows] == want
        assert all(e == u for _, e, u in rows)  # err 0 -> upper == est


def test_topk_by_bounds_under_truncation(tight):
    truth = _truth_by_day()
    rows = tight.approx_topk_by("day", k=100).collect()
    terr_by_day: dict = {}
    for r in rows:
        terr_by_day[r["bucket"]] = r["upper"] - r["est"]  # cell terr constant
    for r in rows:
        true = truth[r["bucket"]][r["item"]]
        assert r["est"] <= true <= r["upper"], r
    # per-cell error is positive somewhere (capacity 4 < 13 distinct)
    assert any(v > 0 for v in terr_by_day.values())


def test_topk_by_int_width_and_restriction(ample):
    # 2-hour epoch-aligned tumbling windows over a restricted aligned range
    rows = ample.approx_topk_by(7200, k=1, start=DAY1, end=DAY2).collect()
    assert [r["bucket"] for r in rows] == [
        BASE + timedelta(hours=h) for h in (0, 2, 4)
    ]
    assert all(r["item"] == "hvy_a" and r["est"] == 60 for r in rows)
    with pytest.raises(ValueError):  # one-sided restriction
        ample.approx_topk_by("day", start=DAY1)
    with pytest.raises(ValueError):  # unaligned restriction
        ample.approx_topk_by("day", start=DAY1, end="2024-02-01 03:30:00")
    with pytest.raises(ValueError):  # granularity finer than buckets
        ample.approx_topk_by(1800)


def test_topk_by_compaction_gate(spark, events):
    r = build_frequency_rollup(events, "item", "ts", 3600, capacity=64)
    try:
        day2_sec = int(datetime(2024, 2, 2).timestamp())
        r.compact_before(day2_sec, 86400)
        with pytest.raises(ValueError):  # hour cells would split day buckets
            r.approx_topk_by("hour")
        got = {x["bucket"]: (x["item"], x["est"]) for x in
               r.approx_topk_by("day", k=1).collect()}
        truth = _truth_by_day()
        want = {
            d: sorted(truth[d].items(), key=lambda kv: (-kv[1], kv[0] or ""))[0]
            for d in truth
        }
        assert got == want
        # restriction to the fine suffix keeps fine group-bys answerable
        assert r.approx_topk_by("hour", k=1, start=DAY2, end=DAY3).count() == 6
    finally:
        r.unpersist()


def test_engine_topk_by(spark, events, tmp_path):
    src = str(tmp_path / "freq_events_by.parquet")
    events.write.mode("overwrite").parquet(src)
    eng = WheelEngine(spark, "freq_events_by", src, time_column="ts")
    eng.build_topk_index("item", bucket_seconds=3600, capacity=64)
    rows = eng.approx_topk_by("item", "day", k=1).collect()
    assert [r["item"] for r in rows] == ["hvy_a", "hvy_a"]


# ------------------------------------------------------------------ merge
def test_merge_exact_equals_fresh(spark, events):
    """Ample capacity: merge_batch over halves == one batch build, err 0."""
    first = events.filter(f"ts < '{DAY2}'")
    second = events.filter(f"ts >= '{DAY2}'")
    streamed = build_frequency_rollup(first, "item", "ts", 3600, capacity=64)
    try:
        streamed.merge_batch(second, "ts")
        assert streamed.total_err(*FULL) == 0
        truth = _truth(*FULL)
        got = {r["item"]: r["est"] for r in
               streamed.approx_topk(*FULL, k=10_000).collect()}
        assert got == dict(truth)
    finally:
        streamed.unpersist()


def test_merge_bounds_valid_and_errors_add(spark, events, tight):
    """Tight capacity: the streamed rollup's bounds stay valid vs total
    truth, and its error never shrinks below the fresh build's (errors add
    across merges — Agarwal et al., Mergeable Summaries)."""
    first = events.filter(f"ts < '{DAY2}'")
    second = events.filter(f"ts >= '{DAY2}'")
    streamed = build_frequency_rollup(first, "item", "ts", 3600, capacity=4)
    try:
        streamed.merge_batch(second, "ts")
        _assert_bounds_hold(streamed, *FULL)
        _assert_bounds_hold(streamed, DAY2, DAY3)
        assert streamed.total_err(*FULL) >= tight.total_err(*FULL)
    finally:
        streamed.unpersist()


# -------------------------------------------------------------- retention
def test_compact_before_reclaims_and_gates(spark, events):
    r = build_frequency_rollup(events, "item", "ts", 3600, capacity=64)
    try:
        day2_sec = int(datetime(2024, 2, 2).timestamp())
        reclaimed = r.compact_before(day2_sec, 86400)
        assert reclaimed > 0  # 6 hourly buckets x 13 items -> 1 day bucket
        assert r.tiers == [(day2_sec, 86400)]
        # coarse-aligned asks over the prefix still bounded correctly
        _assert_bounds_hold(r, DAY1, DAY2)
        _assert_bounds_hold(r, *FULL)
        # ample capacity: folding 6 exact hourly buckets is still exact
        assert r.total_err(DAY1, DAY2) == 0
        # fine asks into the compacted prefix refuse
        with pytest.raises(ValueError):
            r.approx_topk(DAY1, "2024-02-01 03:00:00")
        # the uncompacted suffix still answers hour-aligned asks
        _assert_bounds_hold(r, "2024-02-02 02:00:00", "2024-02-02 05:00:00")
        # ladder: cutoff may not retreat, width must nest
        with pytest.raises(ValueError):
            r.check_compact(day2_sec - 86400, 86400)
        with pytest.raises(ValueError):
            r.check_compact(day2_sec, 86400 + 3600)
    finally:
        r.unpersist()


def test_compact_truncation_folds_into_err(spark, events):
    """Tight capacity: the coarse day bucket holds 13 distinct items > 4,
    so compaction itself truncates — the folded err absorbs both the fine
    errors and the re-truncation, bounds stay valid."""
    r = build_frequency_rollup(events, "item", "ts", 3600, capacity=4)
    try:
        fine_err = r.total_err(DAY1, DAY2)
        day2_sec = int(datetime(2024, 2, 2).timestamp())
        r.compact_before(day2_sec, 86400)
        assert r.total_err(DAY1, DAY2) >= fine_err
        _assert_bounds_hold(r, DAY1, DAY2)
        _assert_bounds_hold(r, *FULL)
    finally:
        r.unpersist()


def test_late_rows_merge_at_tier_width(spark, events):
    """merge_batch after compaction: late rows landing in the compacted
    prefix bucket at the tier width (no fine bucket reappears) and the
    bounds still cover them."""
    r = build_frequency_rollup(events, "item", "ts", 3600, capacity=64)
    try:
        day2_sec = int(datetime(2024, 2, 2).timestamp())
        r.compact_before(day2_sec, 86400)
        late = spark.createDataFrame(
            [(datetime(2024, 2, 1, 10), "late_x")] * 7,
            "ts timestamp, item string",
        )
        r.merge_batch(late, "ts")
        est, upper = r.approx_count("late_x", DAY1, DAY2)
        assert est <= 7 <= upper
        assert est == 7  # ample capacity keeps it exactly
        # still exactly one coarse bucket in the prefix
        assert r._df.filter("__sec < {}".format(day2_sec)).select("__sec").distinct().count() == 1
    finally:
        r.unpersist()


# ------------------------------------------------------------ persistence
def test_save_load_round_trip(spark, tight, tmp_path):
    p = str(tmp_path / "freq")
    tight.save(p)
    loaded = load_frequency_rollup(spark, p)
    try:
        assert loaded.capacity == tight.capacity
        assert loaded.bucket_seconds == tight.bucket_seconds
        assert loaded.column == tight.column
        assert loaded.approx_topk(*FULL, k=50).collect() == \
            tight.approx_topk(*FULL, k=50).collect()
        assert loaded.total_err(*FULL) == tight.total_err(*FULL)
    finally:
        loaded.unpersist()


def test_save_load_preserves_tiers(spark, events, tmp_path):
    r = build_frequency_rollup(events, "item", "ts", 3600, capacity=64)
    day2_sec = int(datetime(2024, 2, 2).timestamp())
    r.compact_before(day2_sec, 86400)
    p = str(tmp_path / "freq_tiered")
    r.save(p)
    loaded = load_frequency_rollup(spark, p)
    try:
        assert loaded.tiers == [(day2_sec, 86400)]
        with pytest.raises(ValueError):  # alignment gate survives reload
            loaded.approx_topk(DAY1, "2024-02-01 03:00:00")
        assert loaded.approx_count("hvy_a", DAY1, DAY2) == \
            r.approx_count("hvy_a", DAY1, DAY2)
    finally:
        loaded.unpersist()
        r.unpersist()


# ------------------------------------------------------------ engine glue
def test_engine_opt_in_and_persistence(spark, events, tmp_path):
    src = str(tmp_path / "freq_events.parquet")
    events.write.mode("overwrite").parquet(src)
    eng = WheelEngine(spark, "freq_events", src, time_column="ts")
    with pytest.raises(KeyError):
        eng.approx_topk("item", *FULL)  # opt-in, never silent
    eng.build_topk_index("item", bucket_seconds=3600, capacity=64)
    truth = _truth(*FULL)
    top = eng.approx_topk("item", *FULL, k=2).collect()
    assert [(r["item"], r["est"]) for r in top] == [
        ("hvy_a", truth["hvy_a"]), ("hvy_b", truth["hvy_b"])
    ]
    assert eng.approx_item_count("item", "hvy_b", *FULL) == \
        (truth["hvy_b"], truth["hvy_b"])
    out = str(tmp_path / "idx")
    eng.save_indexes(out)
    eng2 = WheelEngine(spark, "freq_events", src, time_column="ts",
                       load_indexes=out)
    assert eng2.approx_topk("item", *FULL, k=2).collect() == top


def test_engine_compact_indexes_includes_topk(spark, events, tmp_path):
    src = str(tmp_path / "freq_events2.parquet")
    events.write.mode("overwrite").parquet(src)
    eng = WheelEngine(spark, "freq_events2", src, time_column="ts")
    eng.build_topk_index("item", bucket_seconds=3600, capacity=64)
    day2_sec = int(datetime(2024, 2, 2).timestamp())
    eng.compact_indexes(day2_sec, "day")
    r = eng.topk_rollups["item"]
    assert r.tiers == [(day2_sec, 86400)]
    _assert_bounds_hold(r, DAY1, DAY2)


def test_maintainer_streams_topk(spark, events, tmp_path):
    """The streaming maintainer folds micro-batches into the top-k rollup
    like every sibling sketch family — post-merge answers cover the whole
    stream, with valid bounds (stale never answers)."""
    from datafusion_uwheel_spark.streaming.maintenance import (
        StreamingWheelMaintainer,
    )

    first = events.filter(f"ts < '{DAY2}'")
    src = str(tmp_path / "stream_events.parquet")
    first.write.mode("overwrite").parquet(src)
    eng = WheelEngine(spark, "stream_events", src, time_column="ts")
    eng.build_topk_index("item", bucket_seconds=3600, capacity=64)
    StreamingWheelMaintainer(eng).merge_batch(events.filter(f"ts >= '{DAY2}'"))
    truth = _truth(*FULL)
    got = {r["item"]: r["est"] for r in
           eng.approx_topk("item", *FULL, k=10_000).collect()}
    assert got == dict(truth)  # ample capacity: streamed == exact


# -------------------------------------------------------------- keyed form
def _mk_keyed_rows():
    """Two hourly buckets x three segments ('a', 'b', NULL) with per-segment
    skew: each segment's top item differs, and segment 'b' carries a long
    tail so a tight capacity truncates it (per-key err > 0)."""
    rows = []
    for hour in range(2):
        ts = BASE + timedelta(hours=hour)
        rows += [(ts, "seg_a_top", "a")] * 20 + [(ts, "shared", "a")] * 5
        rows += [(ts, "seg_b_top", "b")] * 15 + [(ts, "shared", "b")] * 4
        for t in range(8):  # segment-b tail, near-tied
            rows += [(ts, f"b_tail{t}", "b")] * (2 + t % 3)
        rows += [(ts, "nullseg_top", None)] * 7
    return rows


KEYED_ROWS = _mk_keyed_rows()


def _keyed_truth(seg) -> Counter:
    return Counter(item for _ts, item, s in KEYED_ROWS if s == seg)


@pytest.fixture(scope="module")
def keyed_events(spark):
    return spark.createDataFrame(
        KEYED_ROWS, "ts timestamp, item string, seg string"
    )


def test_keyed_exact_per_key(spark, keyed_events):
    r = build_frequency_rollup(
        keyed_events, "item", "ts", 3600, capacity=64, partition_by="seg"
    )
    try:
        got: dict = {}
        for x in r.approx_topk_by_key(k=2).collect():
            got.setdefault(x["seg"], []).append((x["item"], x["est"], x["upper"]))
        for seg in ("a", "b", None):
            truth = _keyed_truth(seg)
            want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
            assert [(i, e) for i, e, _ in got[seg]] == want, seg
            assert all(e == u for _, e, u in got[seg])  # ample -> exact
        # unkeyed asks on the keyed rollup still answer exactly (union of
        # kept counts is complete when nothing truncates)
        all_truth = _truth_of(KEYED_ROWS)
        day = ("2024-02-01 00:00:00", "2024-02-02 00:00:00")
        est, upper = r.approx_count("shared", *day)
        assert est == upper == all_truth["shared"]
    finally:
        r.unpersist()


def test_keyed_bounds_under_truncation(spark, keyed_events):
    """capacity 2 truncates segment b's tail (and nothing else): per-key
    bounds hold, including for the NULL segment (its err must not be lost
    to a NULL-unsafe join), and unkeyed bounds stay valid."""
    r = build_frequency_rollup(
        keyed_events, "item", "ts", 3600, capacity=2, partition_by="seg"
    )
    try:
        rows = r.approx_topk_by_key(k=100).collect()
        by_seg: dict = {}
        for x in rows:
            by_seg.setdefault(x["seg"], {})[x["item"]] = (x["est"], x["upper"])
        for seg in ("a", "b", None):
            truth = _keyed_truth(seg)
            kept = by_seg[seg]
            terr = next(u - e for e, u in kept.values())
            for item, true in truth.items():
                est, upper = kept.get(item, (0, terr))
                assert est <= true <= upper, (seg, item, est, true, upper)
        # segment b truncated, a and NULL did not
        terr_of = {s: next(u - e for e, u in by_seg[s].values()) for s in by_seg}
        assert terr_of["b"] > 0 and terr_of["a"] == 0 and terr_of[None] == 0
        # unkeyed ask: bounds still valid summing across keys
        day = ("2024-02-01 00:00:00", "2024-02-02 00:00:00")
        all_truth = _truth_of(KEYED_ROWS)
        est, upper = r.approx_count("shared", *day)
        assert est <= all_truth["shared"] <= upper
    finally:
        r.unpersist()


def test_keyed_merge_compact_save_load(spark, keyed_events, tmp_path):
    first = keyed_events.filter("ts < '2024-02-01 01:00:00'")
    second = keyed_events.filter("ts >= '2024-02-01 01:00:00'")
    r = build_frequency_rollup(
        first, "item", "ts", 3600, capacity=64, partition_by="seg"
    )
    try:
        r.merge_batch(second, "ts")
        want = {}
        for x in r.approx_topk_by_key(k=1).collect():
            want[x["seg"]] = (x["item"], x["est"], x["upper"])
        assert want["a"] == ("seg_a_top", 40, 40)  # streamed == exact
        assert want[None] == ("nullseg_top", 14, 14)
        # compact both hours into one day bucket: still exact, keys intact
        day2 = int(datetime(2024, 2, 2).timestamp())
        assert r.compact_before(day2, 86400) > 0
        got = {x["seg"]: (x["item"], x["est"]) for x in
               r.approx_topk_by_key(k=1).collect()}
        assert got["b"] == ("seg_b_top", 30)
        p = str(tmp_path / "keyed_freq")
        r.save(p)
        loaded = load_frequency_rollup(spark, p)
        try:
            assert loaded.key_column == "seg"
            assert loaded.tiers == r.tiers
            assert loaded.approx_topk_by_key(k=1).collect() == \
                r.approx_topk_by_key(k=1).collect()
        finally:
            loaded.unpersist()
    finally:
        r.unpersist()


def test_keyed_gates(spark, keyed_events, tight):
    with pytest.raises(ValueError):  # unkeyed rollup refuses the keyed ask
        tight.approx_topk_by_key()
    r = build_frequency_rollup(
        keyed_events, "item", "ts", 3600, capacity=8, partition_by="seg"
    )
    try:
        with pytest.raises(ValueError):  # one-sided restriction
            r.approx_topk_by_key(start="2024-02-01 00:00:00")
        with pytest.raises(ValueError):  # unaligned restriction
            r.approx_topk_by_key(
                start="2024-02-01 00:00:00", end="2024-02-01 00:30:00"
            )
        # aligned restriction limits to the first hour
        got = {x["seg"]: x["est"] for x in r.approx_topk_by_key(
            k=1, start="2024-02-01 00:00:00", end="2024-02-01 01:00:00"
        ).collect()}
        assert got["a"] == 20
    finally:
        r.unpersist()


def test_engine_keyed_topk(spark, keyed_events, tmp_path):
    src = str(tmp_path / "keyed_events.parquet")
    keyed_events.write.mode("overwrite").parquet(src)
    eng = WheelEngine(spark, "keyed_events", src, time_column="ts")
    eng.build_topk_index("item", bucket_seconds=3600, capacity=64,
                         partition_by="seg")
    rows = eng.approx_topk_by_key("item", k=1).collect()
    assert {x["seg"]: x["item"] for x in rows} == {
        "a": "seg_a_top", "b": "seg_b_top", None: "nullseg_top"
    }
    out = str(tmp_path / "keyed_idx")
    eng.save_indexes(out)
    eng2 = WheelEngine(spark, "keyed_events", src, time_column="ts",
                       load_indexes=out)
    assert eng2.approx_topk_by_key("item", k=1).collect() == rows


def _truth_of(rows) -> Counter:
    return Counter(item for _ts, item, *_ in rows)


# ---------------------------------------------------------------- sf data
def test_sf_data_exact_topk(spark, sf_small_dir):
    """Real testdata: capacity >= the 5 distinct event types -> the rollup
    answer IS the exact GROUP BY top-k."""
    from datafusion_uwheel_spark.sources import read_parquet
    from pyspark.sql import functions as F

    ev = read_parquet(spark, f"{sf_small_dir}/events.parquet")
    r = build_frequency_rollup(ev, "event_type", "ts", 3600, capacity=8)
    try:
        a, b = "2024-01-05 00:00:00", "2024-01-12 00:00:00"
        want = [
            (x["event_type"], x["n"])
            for x in ev.filter(f"ts >= '{a}' AND ts < '{b}'")
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("event_type")).limit(3).collect()
        ]
        got = [(x["item"], x["est"]) for x in r.approx_topk(a, b, k=3).collect()]
        assert got == want
        assert r.total_err(a, b) == 0
    finally:
        r.unpersist()


# ------------------------------------------------- property: random regimes
from hypothesis import given, settings
from hypothesis import strategies as st


@given(capacity=st.integers(1, 14), seed=st.integers(0, 10**6))
@settings(max_examples=8, deadline=None)
def test_bounds_property_random_data_and_capacity(spark, capacity, seed):
    """The advisor's original ask, as a property: for RANDOM skew and
    RANDOM capacity, every item's true count lies in [est, upper], kept
    estimates never overcount, the heavy-hitter guarantee holds at k=3,
    and a split-then-merge build keeps all of it true with error never
    shrinking below the fresh build's."""
    rng = _random.Random(seed)
    rows = []
    for hour in range(3):
        ts = BASE + timedelta(hours=hour)
        for item_id in range(rng.randint(1, 18)):
            rows.append((ts, f"i{item_id:02d}", rng.randint(1, 25)))
    data = [(ts, item) for ts, item, n in rows for _ in range(n)]
    truth = Counter(item for _ts, item in data)
    df = spark.createDataFrame(data, "ts timestamp, item string")
    span = ("2024-02-01 00:00:00", "2024-02-01 03:00:00")
    fresh = build_frequency_rollup(df, "item", "ts", 3600, capacity=capacity)
    streamed = build_frequency_rollup(
        df.filter("ts < '2024-02-01 01:00:00'"), "item", "ts", 3600,
        capacity=capacity,
    )
    try:
        streamed.merge_batch(df.filter("ts >= '2024-02-01 01:00:00'"), "ts")
        for r in (fresh, streamed):
            kept = {
                row["item"]: (row["est"], row["upper"])
                for row in r.approx_topk(*span, k=10_000).collect()
            }
            terr = r.total_err(*span)
            for item, true in truth.items():
                est, upper = kept.get(item, (0, terr))
                assert est <= true <= upper, (item, est, true, upper, capacity)
            for item, (est, _u) in kept.items():
                assert est <= truth.get(item, 0)
            top = r.approx_topk(*span, k=3).collect()
            if top:
                kth = top[-1]["est"]
                present = {x["item"] for x in top}
                for item, true in truth.items():
                    if true > kth + terr:
                        assert item in present, (item, true, kth, terr)
        assert streamed.total_err(*span) >= fresh.total_err(*span)
    finally:
        fresh.unpersist()
        streamed.unpersist()


def test_maintainer_stale_marks_unmaintainable_sketches(spark, tmp_path):
    """r8: a maintenance batch that does not carry a sketch rollup's value
    (or partition) column MARKS it stale — asks refuse with a clear error
    until mark_fresh(), later batches do NOT quietly un-stale it, and
    maintainable siblings in the same engine keep merging. Before, a
    missing value column was skipped SILENTLY (stale answers) and a
    missing key column raised mid-stream (killing the query)."""
    from datafusion_uwheel_spark.streaming.maintenance import (
        StreamingWheelMaintainer,
    )

    rows = [(BASE + timedelta(hours=h), f"it{h % 3}", h) for h in range(6)]
    df = spark.createDataFrame(rows, "ts timestamp, item string, uid long")
    src = str(tmp_path / "stale_events.parquet")
    df.write.mode("overwrite").parquet(src)
    eng = WheelEngine(spark, "stale_events", src, time_column="ts")
    eng.build_topk_index("item", bucket_seconds=3600, capacity=8)
    eng.build_distinct_index("uid")
    m = StreamingWheelMaintainer(eng)

    # batch carries uid but not item -> topk stale, distinct merged
    batch = spark.createDataFrame(
        [(BASE + timedelta(hours=10), 99)], "ts timestamp, uid long"
    )
    m.merge_batch(batch)
    fr = eng.topk_rollups["item"]
    assert fr.stale
    with pytest.raises(RuntimeError, match="STALE"):
        fr.approx_topk(DAY1, DAY2)
    with pytest.raises(RuntimeError, match="STALE"):
        fr.total_err(DAY1, DAY2)
    dr = eng.distinct_rollups["uid"]
    assert not dr.stale
    span = ("2024-02-01 00:00:00", "2024-02-01 11:00:00")
    assert dr.approx_distinct(*span) == 7  # 6 built + the streamed uid 99

    # a LATER full batch must not quietly repair the topk rollup
    full = spark.createDataFrame(
        [(BASE + timedelta(hours=11), "late", 100)],
        "ts timestamp, item string, uid long",
    )
    m.merge_batch(full)
    assert fr.stale  # the hour-10 rows are gone forever
    with pytest.raises(RuntimeError):
        fr.approx_count("late", DAY1, DAY2)
    # explicit operator decision re-opens it (documented, never implicit)
    fr.mark_fresh()
    assert fr.approx_count("it0", *span)[0] == 2


def test_stale_mark_survives_save_load(spark, events, tmp_path):
    """r8 review: the stale mark persists through save/load — a
    checkpoint/restart cycle must not quietly convert 'refuse' back into
    answers that miss dropped batches."""
    r = build_frequency_rollup(events, "item", "ts", 3600, capacity=8)
    try:
        r.mark_stale("test: dropped batch")
        p = str(tmp_path / "stale_freq")
        r.save(p)
        loaded = load_frequency_rollup(spark, p)
        try:
            assert loaded.stale
            with pytest.raises(RuntimeError, match="STALE"):
                loaded.approx_topk(DAY1, DAY2)
            loaded.mark_fresh()
            assert loaded.approx_topk(DAY1, DAY2, k=1).count() == 1
        finally:
            loaded.unpersist()
    finally:
        r.unpersist()


def test_merged_sketch_gated_too(spark, tmp_path):
    """The sketch-bytes escape hatches (distinct/theta merged_sketch) obey
    the same freshness gate as the numeric asks."""
    from datafusion_uwheel_spark.operators.distinct import (
        build_distinct_rollup,
    )

    df = spark.createDataFrame(
        [(BASE + timedelta(hours=h), h) for h in range(4)],
        "ts timestamp, uid long",
    )
    r = build_distinct_rollup(df, "ts", "uid", bucket_seconds=3600)
    try:
        assert r.merged_sketch(DAY1, DAY2) is not None
        r.mark_stale("test")
        with pytest.raises(RuntimeError, match="STALE"):
            r.merged_sketch(DAY1, DAY2)
    finally:
        r.unpersist()


def test_maintainer_missing_time_column_stale_marks_engine(spark, tmp_path):
    """A batch without the TIME column can maintain nothing — the whole
    engine stale-marks (wheels incomplete, sketches refusing) instead of
    an AnalysisException killing the stream."""
    from datafusion_uwheel_spark.operators.lookup import STAR_AGGREGATION_ALIAS
    from datafusion_uwheel_spark.streaming.maintenance import (
        StreamingWheelMaintainer,
    )

    rows = [(BASE + timedelta(hours=h), f"i{h}", float(h)) for h in range(4)]
    df = spark.createDataFrame(rows, "ts timestamp, item string, v double")
    src = str(tmp_path / "no_tc_events.parquet")
    df.write.mode("overwrite").parquet(src)
    eng = WheelEngine(spark, "no_tc_events", src, time_column="ts")
    eng.build_index("v")
    eng.build_topk_index("item", bucket_seconds=3600, capacity=8)
    epoch = eng.index_epoch
    batch = spark.createDataFrame([("x", 1.0)], "item string, v double")
    StreamingWheelMaintainer(eng).merge_batch(batch)  # must not raise
    assert not eng.count_wheels[STAR_AGGREGATION_ALIAS].complete
    assert not eng.agg_wheels[("v", STAR_AGGREGATION_ALIAS)].complete
    assert eng.topk_rollups["item"].stale
    assert eng.index_epoch > epoch


# --------------------------------- r9: driver-resident direct-ask path
def _job_topk(rollup, a, b, k=10):
    """The routed-DataFrame path's rows, as plain tuples — the parity
    oracle for the zero-job topk_rows mirror."""
    return [
        (r["item"], r["est"], r["upper"])
        for r in rollup.approx_topk(a, b, k).collect()
    ]


@pytest.mark.parametrize("fx", ["ample", "tight"])
def test_topk_rows_parity_with_job_path(fx, request):
    """topk_rows == approx_topk row-for-row (values AND order, NULL item
    included) in both the exact and truncated regimes, across range widths
    and k above/below the distinct-item count."""
    rollup = request.getfixturevalue(fx)
    for a, b in (
        FULL,
        (DAY1, DAY2),
        ("2024-02-01 02:00:00", "2024-02-01 05:00:00"),
    ):
        for k in (1, 3, 10_000):
            assert rollup.topk_rows(a, b, k) == _job_topk(rollup, a, b, k)


def test_direct_asks_are_zero_jobs(tight, spark):
    """topk_rows and approx_count launch NO Spark jobs — the wheels'
    driver-residency discipline extended to the frequency rollup (the
    whole point of the r9 kept-rows mirror: the ~100 ms small-job floor
    made probes slower than vanilla scans at sf0.1)."""
    tight.topk_rows(*FULL)  # caches built at build time; warm anyway
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    rows = tight.topk_rows(*FULL, k=5)
    est, upper = tight.approx_count("hvy_a", *FULL)
    n_est, n_upper = tight.approx_count(None, *FULL)
    after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    assert after == before
    assert rows and est > 0 and upper >= est
    # NULL item is truncated out of the capacity-4 kept set (est 0), but
    # its true count ≤ upper still holds — the bound survives zero-job
    assert n_upper >= n_est >= 0
    assert n_upper >= 5  # true NULL count in DAY1 is 5; upper must cover it


def test_approx_count_parity_with_dataframe(ample, tight):
    """approx_count (driver mirror since r9) == the pre-r9 one-collect
    DataFrame computation, item by item, NULL and absent items included."""
    from pyspark.sql import functions as F

    for rollup in (ample, tight):
        a, b = rollup._range(*FULL)
        for item in ("hvy_a", "t03", None, "nope"):
            df_est = (
                rollup._restrict(rollup._df, a, b)
                .filter(F.col("__item").eqNullSafe(F.lit(item)))
                .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long"))
                .collect()[0][0]
            )
            est, upper = rollup.approx_count(item, *FULL)
            assert est == int(df_est)
            assert upper == est + rollup.total_err(*FULL)


def test_direct_caches_follow_merge_and_compact(spark, events):
    """The kept-rows mirror invalidates wherever the frames change:
    after merge_batch and compact_before the direct answers still match
    the job path (and actually reflect the fold)."""
    r = build_frequency_rollup(events, "item", "ts", bucket_seconds=3600, capacity=4)
    try:
        before = r.topk_rows(*FULL, k=3)
        extra = spark.createDataFrame(
            [(BASE + timedelta(hours=1), "merged_item")] * 500,
            "ts timestamp, item string",
        )
        r.merge_batch(extra, "ts")
        after = r.topk_rows(*FULL, k=3)
        assert after == _job_topk(r, *FULL, k=3)
        assert after != before  # 500 merged rows must surface
        assert after[0][0] == "merged_item"
        cutoff = int(datetime.fromisoformat(DAY2).timestamp())
        r.compact_before(cutoff, 86_400)
        assert r.topk_rows(*FULL, k=5) == _job_topk(r, *FULL, k=5)
        assert r.approx_count("merged_item", *FULL)[1] >= 500
    finally:
        r.unpersist()


def test_direct_caches_follow_save_load(spark, tight, tmp_path):
    path = str(tmp_path / "fr_direct")
    tight.save(path)
    lo = load_frequency_rollup(spark, path)
    try:
        assert lo.topk_rows(*FULL, k=8) == tight.topk_rows(*FULL, k=8)
        assert lo.approx_count("hvy_a", *FULL) == tight.approx_count(
            "hvy_a", *FULL
        )
    finally:
        lo.unpersist()


def test_direct_asks_freshness_gated(spark, events):
    """A stale rollup refuses the direct asks too — driver mirrors are
    snapshots and MUST honor the stale-never-answers contract."""
    r = build_frequency_rollup(events, "item", "ts", bucket_seconds=3600, capacity=4)
    try:
        r.mark_stale("test")
        with pytest.raises(RuntimeError, match="STALE"):
            r.topk_rows(*FULL)
        with pytest.raises(RuntimeError, match="STALE"):
            r.approx_count("hvy_a", *FULL)
        r.mark_fresh()
        assert r.topk_rows(*FULL, k=1) == _job_topk(r, *FULL, k=1)
    finally:
        r.unpersist()


def test_keyed_build_direct_parity(spark, keyed_events):
    """Unkeyed direct asks on a keyed build: the mirror carries duplicate
    (sec, item) rows (one per key) that sum at ask time — parity with the
    job path, which groups the same rows."""
    r = build_frequency_rollup(
        keyed_events, "item", "ts", bucket_seconds=3600, capacity=3,
        partition_by="seg",
    )
    try:
        a, b = DAY1, "2024-02-01 02:00:00"
        assert r.topk_rows(a, b, k=100) == _job_topk(r, a, b, k=100)
        assert r.approx_count("shared", a, b)[0] == sum(
            est for item, est, _u in r.topk_rows(a, b, k=1000)
            if item == "shared"
        )
    finally:
        r.unpersist()


def test_partition_by_reserved_names_rejected(events):
    """ADVICE r8: a partition column named like a result column of
    approx_topk_by_key would shadow/ambiguate the output select — rejected
    at build time."""
    for bad in ("item", "est", "upper"):
        with pytest.raises(ValueError, match="reserved"):
            build_frequency_rollup(events, "item", "ts", partition_by=bad)


def test_engine_topk_rows_delegates(spark, events, tmp_path):
    src = str(tmp_path / "fr_engine_direct.parquet")
    events.write.mode("overwrite").parquet(src)
    eng = WheelEngine(spark, "fr_engine_direct", src, time_column="ts")
    eng.build_topk_index("item", bucket_seconds=3600, capacity=4)
    got = eng.approx_topk_rows("item", *FULL, k=4)
    want = [
        (r["item"], r["est"], r["upper"])
        for r in eng.approx_topk("item", *FULL, k=4).collect()
    ]
    assert got == want


def test_approx_count_nan_item_matches_spark_equality(spark):
    """Spark SQL groups float NaN as ONE value and eqNullSafe(NaN, NaN) is
    TRUE — the driver-resident approx_count must mirror that, not IEEE
    NaN != NaN."""
    rows = [(BASE, float("nan"))] * 7 + [(BASE, 1.5)] * 3
    df = spark.createDataFrame(rows, "ts timestamp, item double")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        assert r.approx_count(float("nan"), DAY1, DAY2) == (7, 7)
        assert r.approx_count(1.5, DAY1, DAY2) == (3, 3)
    finally:
        r.unpersist()


def test_topk_rows_nan_grouping_matches_job_path(spark):
    """r9 review repro: NaN items spanning buckets must aggregate as ONE
    item in topk_rows (Spark groups all NaN together; distinct Python
    float('nan') objects hash apart since 3.10) and must sort LAST among
    doubles like Spark's ASC — pre-fix the direct path returned a wrong
    top-1 with duplicate NaN rows."""
    import math

    rows = (
        [(BASE, float("nan"))] * 4
        + [(BASE + timedelta(hours=1), float("nan"))] * 3
        + [(BASE, 1.5)] * 5
    )
    df = spark.createDataFrame(rows, "ts timestamp, item double")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        direct = r.topk_rows(DAY1, DAY2, k=5)
        job = [
            (x["item"], x["est"], x["upper"])
            for x in r.approx_topk(DAY1, DAY2, k=5).collect()
        ]
        assert len(direct) == len(job) == 2
        for (di, de, du), (ji, je, ju) in zip(direct, job):
            assert (de, du) == (je, ju)
            assert (math.isnan(di) and math.isnan(ji)) or di == ji
        assert math.isnan(direct[0][0]) and direct[0][1] == 7  # NaN top-1
        # est-tied NaN vs number (both 7): NaN sorts LAST (Spark ASC)
        extra = spark.createDataFrame(
            [(BASE, 0.5)] * 7, "ts timestamp, item double"
        )
        r.merge_batch(extra, "ts")
        tied = r.topk_rows(DAY1, DAY2, k=5)
        jtied = [
            (x["item"], x["est"], x["upper"])
            for x in r.approx_topk(DAY1, DAY2, k=5).collect()
        ]
        assert [e for _i, e, _u in tied] == [e for _i, e, _u in jtied]
        assert all(
            (math.isnan(a) and math.isnan(b)) or a == b
            for (a, _, _), (b, _, _) in zip(tied, jtied)
        )
    finally:
        r.unpersist()


def test_approx_count_cross_type_coercion(spark):
    """The pre-r9 eqNullSafe(col, lit(item)) path let Spark coerce
    string-vs-numeric comparisons — the driver mirror must keep matching
    (both sides promote to double), not silently answer 0."""
    rows = [(BASE, "7")] * 4 + [(BASE, "x")] * 2
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        assert r.approx_count(7, DAY1, DAY2) == (4, 4)  # int vs string col
        assert r.approx_count(7.0, DAY1, DAY2) == (4, 4)
        assert r.approx_count("7", DAY1, DAY2) == (4, 4)
        assert r.approx_count(99, DAY1, DAY2) == (0, 0)
    finally:
        r.unpersist()


def test_direct_build_is_lazy_after_merge(spark, events):
    """r9 review: a stream that never takes direct asks must not pay a
    per-batch driver collect — merge_batch only CAPTURES the new frame
    pair; each mirror half builds independently on first use (err-only
    consumers like approx_topk never pull the kept rows)."""
    r = build_frequency_rollup(events, "item", "ts", bucket_seconds=3600, capacity=4)
    try:
        c = r._caches
        assert c._err is not None and c._kept is not None  # eager at build
        extra = spark.createDataFrame(
            [(BASE + timedelta(hours=1), "lazy_item")] * 50,
            "ts timestamp, item string",
        )
        r.merge_batch(extra, "ts")
        c = r._caches
        assert c._err is None and c._kept is None  # captured, not collected
        r.approx_topk(*FULL, k=2).collect()  # job path: err half only
        assert c._err is not None and c._kept is None
        assert r.approx_count("lazy_item", *FULL)[1] >= 50
        assert c._kept is not None  # kept half built by the direct ask
    finally:
        r.unpersist()


def test_array_item_column_direct_parity(spark):
    """r9 review pass 2: array item columns — the mirror must hold 1-D
    object entries (np.array over uniform tuples silently went 2-D),
    group them like Spark groups arrays by value, order ties with NULL
    and NaN ELEMENTS without raising, and match counts for array asks."""
    import math

    rows = (
        [(BASE, [1.0, 2.0])] * 5
        + [(BASE + timedelta(hours=1), [1.0, 2.0])] * 2
        + [(BASE, [None])] * 3
        + [(BASE, [3.0])] * 3  # est-tied with [None]: sort must not raise
        + [(BASE, [float("nan")])] * 3  # and NaN elements order like Spark
    )
    df = spark.createDataFrame(rows, "ts timestamp, item array<double>")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        direct = r.topk_rows(DAY1, DAY2, k=10)
        job = [
            (x["item"], x["est"], x["upper"])
            for x in r.approx_topk(DAY1, DAY2, k=10).collect()
        ]
        assert [(e, u) for _i, e, u in direct] == [(e, u) for _i, e, u in job]
        def norm(v):
            return [
                "nan" if isinstance(x, float) and math.isnan(x) else x
                for x in v
            ]
        assert [norm(i) for i, _e, _u in direct] == [
            norm(i) for i, _e, _u in job
        ]
        assert r.approx_count([1.0, 2.0], DAY1, DAY2) == (7, 7)
        assert r.approx_count([None], DAY1, DAY2) == (3, 3)
        assert r.approx_count([9.9], DAY1, DAY2) == (0, 0)
        # r9 pass 3: tuple asks are exactly what topk_rows returns, so
        # they must round-trip — including NaN elements
        assert r.approx_count((1.0, 2.0), DAY1, DAY2) == (7, 7)
        assert r.approx_count((float("nan"),), DAY1, DAY2) == (3, 3)
        assert r.approx_count([float("nan")], DAY1, DAY2) == (3, 3)
    finally:
        r.unpersist()


def test_struct_item_column_direct_parity(spark):
    """r9 review pass 2: struct item columns group by value in Spark —
    the mirror canonicalizes dicts to (field, value) tuples so the
    driver dict can group them too."""
    rows = (
        [(BASE, {"a": 1, "b": "x"})] * 4
        + [(BASE + timedelta(hours=1), {"a": 1, "b": "x"})] * 2
        + [(BASE, {"a": 2, "b": "y"})] * 3
    )
    df = spark.createDataFrame(
        rows, "ts timestamp, item struct<a: bigint, b: string>"
    )
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        direct = r.topk_rows(DAY1, DAY2, k=5)
        assert [(e, u) for _i, e, u in direct] == [(6, 6), (3, 3)]
        assert direct[0][0] == (("a", 1), ("b", "x"))
        assert r.approx_count({"a": 2, "b": "y"}, DAY1, DAY2) == (3, 3)
        # r9 pass 3: struct equality is by VALUE — key order must not
        # matter (canonical form sorts field pairs)
        assert r.approx_count({"b": "y", "a": 2}, DAY1, DAY2) == (3, 3)
    finally:
        r.unpersist()


def test_cross_type_coercion_uses_spark_cast_grammar(spark):
    """r9 review pass 2: Python float() accepts '1_0' where Spark's
    CAST(string AS DOUBLE) is NULL/raise, and Spark's cast accepts 'NaN'.
    The driver shim follows the TRY_CAST-to-double semantics (malformed
    strings simply don't match) — a raw ANSI eqNullSafe would RAISE
    mid-ask on any malformed kept string, which is exactly the behavior
    an ask API must not have. Pinned against the try_cast job path."""
    from pyspark.sql import functions as F

    rows = [(BASE, "1_0")] * 3 + [(BASE, "NaN")] * 4 + [(BASE, "10")] * 5
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        def job_count(item):
            a, b = r._range(DAY1, DAY2)
            return int(
                r._restrict(r._df, a, b)
                .filter(
                    F.col("__item")
                    .try_cast("double")
                    .eqNullSafe(F.lit(float(item)))
                )
                .agg(F.coalesce(F.sum("cnt"), F.lit(0)))
                .collect()[0][0]
            )

        for ask in (10, 10.0, float("nan")):
            assert r.approx_count(ask, DAY1, DAY2)[0] == job_count(ask), ask
        assert r.approx_count(10, DAY1, DAY2)[0] == 5  # '1_0' must NOT match
        assert r.approx_count(float("nan"), DAY1, DAY2)[0] == 4  # 'NaN' must
        assert r.approx_count("10", DAY1, DAY2) == (5, 5)  # same-type exact
    finally:
        r.unpersist()


def test_stale_load_pays_no_collect(spark, events, tmp_path):
    """r9 review pass 2: loading a stale-saved rollup must not eagerly
    build mirrors it can never serve — loads stay lazy."""
    r = build_frequency_rollup(events, "item", "ts", bucket_seconds=3600, capacity=4)
    r.mark_stale("test")
    path = str(tmp_path / "fr_stale_lazy")
    r.save(path)
    r.unpersist()
    lo = load_frequency_rollup(spark, path)
    try:
        assert lo.stale
        c = lo._caches
        assert c._err is None and c._kept is None  # nothing collected
        with pytest.raises(RuntimeError, match="STALE"):
            lo.topk_rows(*FULL)
        lo.mark_fresh()
        assert lo.topk_rows(*FULL, k=1)  # builds on first served ask
    finally:
        lo.unpersist()


def test_cast_grammar_suffixes_hex_bool_decimal(spark):
    """r9 pass 3: the driver cast grammar is probe-pinned to Spark's
    TRY_CAST — d/f suffixes and p-exponent hex floats match, plain hex
    ints do not; boolean asks use the boolean-cast string sets; Decimal
    items cross-match strings."""
    from decimal import Decimal

    rows = (
        [(BASE, "1.5d")] * 2 + [(BASE, "0x1.8p1")] * 3 + [(BASE, "0x10")] * 4
        + [(BASE, "yes")] * 5 + [(BASE, "0")] * 6
    )
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        assert r.approx_count(1.5, DAY1, DAY2) == (2, 2)     # '1.5d'
        assert r.approx_count(3.0, DAY1, DAY2) == (3, 3)     # hex float
        assert r.approx_count(16.0, DAY1, DAY2) == (0, 0)    # '0x10' = NULL
        assert r.approx_count(Decimal("1.5"), DAY1, DAY2) == (2, 2)
        assert r.approx_count(True, DAY1, DAY2) == (5, 5)    # 'yes'
        assert r.approx_count(False, DAY1, DAY2) == (6, 6)   # '0'
        # '0' also casts to double 0.0 for a numeric ask
        assert r.approx_count(0, DAY1, DAY2) == (6, 6)
    finally:
        r.unpersist()


def test_int_vs_float_promotes_to_double_like_spark(spark):
    """r10 ADVICE: Spark's bigint<->double comparison promotes BOTH sides
    to double, so bigint 2**53 + 1 equals double 2**53 (the lossy cast) —
    while Python's int == float is exact and says False. Probe-pinned
    (r10): ``9007199254740993L <=> CAST(9007199254740992L AS DOUBLE)`` is
    TRUE. The mirror must follow the job path, not Python."""
    from pyspark.sql import functions as F

    two53 = 2**53
    rows = [(BASE, float(two53))] * 3 + [(BASE, 7.0)] * 2
    df = spark.createDataFrame(rows, "ts timestamp, item double")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        def job_count(ask_lit):
            a, b = r._range(DAY1, DAY2)
            return int(
                r._restrict(r._df, a, b)
                .filter(F.col("__item").eqNullSafe(ask_lit))
                .agg(F.coalesce(F.sum("cnt"), F.lit(0)))
                .collect()[0][0]
            )

        # the lossy-promotion ask: 2**53 + 1 as a bigint literal
        assert job_count(F.lit(two53 + 1)) == 3  # Spark's own answer
        assert r.approx_count(two53 + 1, DAY1, DAY2) == (3, 3)
        assert r.approx_count(two53, DAY1, DAY2) == (3, 3)
        # plain int-vs-double still matches (and bool-as-int stays exact)
        assert r.approx_count(7, DAY1, DAY2) == (2, 2)
        assert r.approx_count(True, DAY1, DAY2) == (0, 0)
    finally:
        r.unpersist()


def test_cast_grammar_pass4_edges(spark):
    """r9 pass 4 probe-pinned edges: signed NaN matches, hex overflow is
    a signed Infinity (never a crash), NBSP-prefixed strings are NULL in
    Spark's cast (Python strip() would wrongly eat them), tab-wrapped
    numerals parse, and Decimal('0.1') matches a '0.1' string (both sides
    promote to double — exact Decimal==float is False)."""
    from decimal import Decimal

    rows = (
        [(BASE, "-NaN")] * 2 + [(BASE, "0x1p99999")] * 3
        + [(BASE, " 1.5")] * 4 + [(BASE, "\t2.5\t")] * 5
        + [(BASE, "0.1")] * 6
    )
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        assert r.approx_count(float("nan"), DAY1, DAY2) == (2, 2)
        assert r.approx_count(float("inf"), DAY1, DAY2) == (3, 3)
        assert r.approx_count(1.5, DAY1, DAY2) == (0, 0)  # NBSP = NULL cast
        assert r.approx_count(2.5, DAY1, DAY2) == (5, 5)  # tabs trim
        assert r.approx_count(Decimal("0.1"), DAY1, DAY2) == (6, 6)
    finally:
        r.unpersist()


def test_struct_nonalpha_schema_order_parity(spark):
    """r9 pass 4: struct tie-break ordering follows field POSITION (the
    schema), not name — a name-sorted canonical form would order
    struct<b, a> ties by 'a' first and diverge from approx_topk. Ask
    dicts in any key order still match (reordered against the schema)."""
    rows = (
        [(BASE, {"b": 1, "a": "z"})] * 3
        + [(BASE, {"b": 2, "a": "a"})] * 3  # est-tied with the above
        + [(BASE, {"b": 9, "a": "m"})] * 5
    )
    df = spark.createDataFrame(
        rows, "ts timestamp, item struct<b: bigint, a: string>"
    )
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        direct = r.topk_rows(DAY1, DAY2, k=5)
        job = [
            (tuple(zip(x["item"].__fields__, x["item"])), x["est"], x["upper"])
            for x in r.approx_topk(DAY1, DAY2, k=5).collect()
        ]
        assert direct == job  # identical order INCLUDING the b-first tie
        assert direct[1][0] == (("b", 1), ("a", "z"))  # b=1 wins the tie
        # ask-dict key order is irrelevant
        assert r.approx_count({"a": "m", "b": 9}, DAY1, DAY2) == (5, 5)
        assert r.approx_count({"b": 9, "a": "m"}, DAY1, DAY2) == (5, 5)
    finally:
        r.unpersist()


def test_cast_grammar_pass5_edges(spark):
    """r9 pass 5 probe-pinned: signed NaN only in Java casing ('-nan' is
    NULL, '-NaN' is NaN); boolean trim is trimAll (NUL-prefixed 'yes' is
    true, NBSP-prefixed is NULL); Decimal asks against stored DOUBLE
    items promote to double; nested struct key order is schema-driven;
    mismatched struct field sets never match."""
    from decimal import Decimal

    rows = [(BASE, "-nan")] * 2 + [(BASE, "-NaN")] * 3 + [(BASE, "\x00yes")] * 4
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        assert r.approx_count(float("nan"), DAY1, DAY2) == (3, 3)  # -NaN only
        assert r.approx_count(True, DAY1, DAY2) == (4, 4)  # NUL trims
        assert r.approx_count(False, DAY1, DAY2) == (0, 0)
    finally:
        r.unpersist()

    dbl = spark.createDataFrame(
        [(BASE, 0.1)] * 5 + [(BASE, 0.25)] * 2, "ts timestamp, item double"
    )
    r2 = build_frequency_rollup(dbl, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        assert r2.approx_count(Decimal("0.1"), DAY1, DAY2) == (5, 5)
        assert r2.approx_count(Decimal("0.25"), DAY1, DAY2) == (2, 2)
    finally:
        r2.unpersist()

    nested = spark.createDataFrame(
        [(BASE, {"s": {"x": 1, "y": 2}, "n": 3})] * 6,
        "ts timestamp, item struct<s: struct<x: bigint, y: bigint>, n: bigint>",
    )
    r3 = build_frequency_rollup(nested, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        # inner dict in caller order != schema order still matches
        assert r3.approx_count(
            {"n": 3, "s": {"y": 2, "x": 1}}, DAY1, DAY2
        ) == (6, 6)
        # extra / missing fields must NEVER match (not silently dropped)
        assert r3.approx_count(
            {"n": 3, "s": {"y": 2, "x": 1}, "zz": 1}, DAY1, DAY2
        ) == (0, 0)
        assert r3.approx_count({"n": 3}, DAY1, DAY2) == (0, 0)
    finally:
        r3.unpersist()


def test_cast_grammar_pass6_edges(spark):
    """r9 pass 6 (bytecode-verified): U+0085-prefixed boolean words are
    NULL in Spark's byte-level trimAll (only 0x00-0x20 and 0x7F trim);
    Decimal('sNaN') asks must not match, never crash."""
    from decimal import Decimal

    rows = [(BASE, "\x85yes")] * 3 + [(BASE, "\x7fyes")] * 4
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    r = build_frequency_rollup(df, "item", "ts", bucket_seconds=3600, capacity=8)
    try:
        assert r.approx_count(True, DAY1, DAY2) == (4, 4)  # only \x7f trims
        assert r.approx_count(Decimal("sNaN"), DAY1, DAY2) == (0, 0)
    finally:
        r.unpersist()


# ------------------------------- r9: grouped driver-resident direct asks
def _job_topk_by(rollup, granularity, k=10, start=None, end=None):
    return [
        (x["bucket"], x["item"], x["est"], x["upper"])
        for x in rollup.approx_topk_by(
            granularity, k, start=start, end=end
        ).collect()
    ]


def _job_topk_by_key(rollup, k=10, start=None, end=None):
    return [
        tuple(x) for x in rollup.approx_topk_by_key(
            k, start=start, end=end
        ).collect()
    ]


@pytest.mark.parametrize("fx", ["ample", "tight"])
def test_topk_rows_by_parity(fx, request):
    """topk_rows_by == approx_topk_by row-for-row across granularities
    (int widths, fixed and calendar levels), k values, and restrictions,
    in both the exact and truncated regimes."""
    rollup = request.getfixturevalue(fx)
    for gran in (3600, 7200, "hour", "day", "week", "month"):
        for kwargs in ({}, {"start": DAY1, "end": DAY2}):
            for k in (1, 2, 10_000):
                got = rollup.topk_rows_by(gran, k, **kwargs)
                want = _job_topk_by(rollup, gran, k, **kwargs)
                assert got == want, (gran, k, kwargs)


def test_topk_rows_by_key_parity(spark, keyed_events):
    r = build_frequency_rollup(
        keyed_events, "item", "ts", bucket_seconds=3600, capacity=3,
        partition_by="seg",
    )
    try:
        for kwargs in ({}, {"start": DAY1, "end": "2024-02-01 01:00:00"}):
            for k in (1, 2, 100):
                got = r.topk_rows_by_key(k, **kwargs)
                want = _job_topk_by_key(r, k, **kwargs)
                assert got == want, (k, kwargs)
        # negative k raises on BOTH keyed entry points (r9p9: the job
        # form's gate was untested)
        with pytest.raises(ValueError, match="k must be"):
            r.topk_rows_by_key(k=-1)
        with pytest.raises(ValueError, match="k must be"):
            r.approx_topk_by_key(k=-1)
        # unkeyed build refuses, mirroring the job path
        fx = build_frequency_rollup(
            keyed_events, "item", "ts", bucket_seconds=3600, capacity=3
        )
        try:
            with pytest.raises(ValueError, match="partition_by"):
                fx.topk_rows_by_key()
        finally:
            fx.unpersist()
    finally:
        r.unpersist()


def test_grouped_direct_zero_jobs_and_lazy_keyed_mirror(spark, keyed_events):
    """Grouped direct asks launch no jobs once mirrors are built; on a
    keyed build the kept mirror is keyed-from-birth (one collect serves
    the keyed and unkeyed views) and only the keyed ERR mirror builds
    lazily on the first keyed direct ask."""
    r = build_frequency_rollup(
        keyed_events, "item", "ts", bucket_seconds=3600, capacity=3,
        partition_by="seg",
    )
    try:
        c = r._caches
        # the build-time warm single-sources the kept view from the keyed
        # mirror (one collect serves both); the keyed ERR mirror stays
        # lazy until the first keyed direct ask
        assert c._kkept is not None and c._kept is not None
        assert c._kerr is None
        r.topk_rows_by_key(k=2)  # builds the keyed err mirror
        assert c._kerr is not None
        sc = spark.sparkContext
        before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        rows_k = r.topk_rows_by_key(k=2)
        rows_b = r.topk_rows_by("hour", k=2)
        after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        assert after == before
        assert rows_k and rows_b
    finally:
        r.unpersist()


def test_topk_rows_by_gates_match_job_path(tight):
    """Same guardrails as approx_topk_by: both-or-neither bounds, the
    granularity tiling gate, and unsupported driver levels raise with a
    pointer to the job path."""
    with pytest.raises(ValueError, match="both bounds"):
        tight.topk_rows_by("day", start=DAY1)
    with pytest.raises(ValueError, match="not tiled"):
        tight.topk_rows_by(1800)  # finer than the hourly buckets
    with pytest.raises(ValueError, match="driver-side truncation"):
        tight.topk_rows_by("millennium")
    # the gate fires BEFORE any row work — an empty restriction must not
    # silently return [] for a typo'd level (review r9p7)
    with pytest.raises(ValueError, match="driver-side truncation"):
        tight.topk_rows_by(
            "millennium", start="2030-01-01 00:00:00",
            end="2030-01-02 00:00:00",
        )
    # negative k raises on BOTH paths (r9p8: the grouped job forms used
    # to silently return empty; now all five entry points agree)
    for call in (
        lambda: tight.topk_rows(DAY1, DAY2, k=-1),
        lambda: tight.topk_rows_by("day", k=-1),
        lambda: tight.approx_topk_by("day", k=-1),
    ):
        with pytest.raises(ValueError, match="k must be"):
            call()
    # mixed-case named levels work on BOTH paths (Spark date_trunc is
    # case-insensitive; bucket_starts keys are lowercase — r9p8/p9):
    # direct == direct-lower == actual job path with the mixed-case level
    assert (
        tight.topk_rows_by("Day", k=2)
        == tight.topk_rows_by("day", k=2)
        == _job_topk_by(tight, "Day", k=2)
    )


def test_grouped_direct_follow_merge(spark, events):
    """The keyed/grouped mirrors ride the same capture invalidation: after
    a merge the grouped direct answers match the job path again."""
    r = build_frequency_rollup(events, "item", "ts", bucket_seconds=3600, capacity=4)
    try:
        before = r.topk_rows_by("day", k=2)
        extra = spark.createDataFrame(
            [(BASE + timedelta(hours=2), "merged_g")] * 300,
            "ts timestamp, item string",
        )
        r.merge_batch(extra, "ts")
        after = r.topk_rows_by("day", k=2)
        assert after == _job_topk_by(r, "day", k=2)
        assert after != before
    finally:
        r.unpersist()


def test_keyed_build_caps_key_cardinality(spark):
    """r10 (verdict #5): the keyed kept mirror is buckets × capacity ×
    KEYS driver rows — a direct build_frequency_rollup(partition_by=) on
    an unbounded key domain must raise AT BUILD with the max_keys pointer,
    never OOM the driver at the first direct ask."""
    rows = [
        (BASE + timedelta(minutes=i), f"it{i % 3}", f"user{i}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, item string, key string")
    with pytest.raises(ValueError, match="max_keys=16"):
        build_frequency_rollup(
            df, "item", "ts", 3600, capacity=4,
            partition_by="key", max_keys=16,
        )
    # a cap that fits (or an explicit None opt-out) builds normally
    r = build_frequency_rollup(
        df, "item", "ts", 3600, capacity=4, partition_by="key", max_keys=64,
    )
    try:
        assert r.max_keys == 64
        assert r.approx_count("it0", DAY1, DAY2)[0] > 0
    finally:
        r.unpersist()


def test_merge_batch_rechecks_key_cap_and_keeps_prebatch_state(spark, tmp_path):
    """A stream can GROW the key domain past the build-time cap: the
    merge re-check must refuse BEFORE publishing, leaving the rollup
    fresh and answering its pre-batch state — and the cap must survive
    save/load (a restored stream keeps the same guard)."""
    rows = [(BASE + timedelta(minutes=i), "a", f"k{i % 4}") for i in range(20)]
    df = spark.createDataFrame(rows, "ts timestamp, item string, key string")
    r = build_frequency_rollup(
        df, "item", "ts", 3600, capacity=4, partition_by="key", max_keys=8,
    )
    try:
        before = r.approx_count("a", DAY1, DAY2)
        burst = spark.createDataFrame(
            [(BASE + timedelta(minutes=i), "a", f"new{i}") for i in range(20)],
            "ts timestamp, item string, key string",
        )
        with pytest.raises(ValueError, match="max_keys=8"):
            r.merge_batch(burst, "ts")
        assert not r.stale
        assert r.approx_count("a", DAY1, DAY2) == before  # pre-batch state
        path = str(tmp_path / "fr_capped")
        r.save(path)
        lo = load_frequency_rollup(spark, path)
        try:
            assert lo.max_keys == 8
            with pytest.raises(ValueError, match="max_keys=8"):
                lo.merge_batch(burst, "ts")
        finally:
            lo.unpersist()
    finally:
        r.unpersist()


def test_legacy_saves_load_without_retroactive_key_cap(spark, tmp_path, monkeypatch):
    """r10 review (two passes): a pre-r10 save has no max_keys in its
    meta. Loading must neither brick a legitimately-large legacy domain
    with the new default cap (merge_batch would fail a previously working
    recovery pipeline) NOR strip the driver-OOM guard from a SMALL legacy
    domain — the cap re-derives from the loaded domain."""
    import json as _json
    import os as _os

    from datafusion_uwheel_spark.operators import frequency as freq_mod

    def save_as_legacy(n_keys, name):
        rows = [
            (BASE + timedelta(minutes=i), "a", f"k{i % n_keys}")
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, item string, key string")
        r = build_frequency_rollup(
            df, "item", "ts", 3600, capacity=4, partition_by="key",
            max_keys=None,
        )
        path = str(tmp_path / name)
        r.save(path)
        r.unpersist()
        meta_path = _os.path.join(path, "_frequency_meta.json")
        with open(meta_path) as f:
            meta = _json.load(f)
        meta.pop("max_keys")  # simulate a pre-r10 save
        with open(meta_path, "w") as f:
            _json.dump(meta, f)
        return path

    monkeypatch.setattr(freq_mod, "_DEFAULT_MAX_KEYS", 8)
    # big legacy domain (> default): loads UNCAPPED, keeps merging
    lo = load_frequency_rollup(spark, save_as_legacy(12, "fr_legacy_big"))
    try:
        assert lo.max_keys is None
        burst = spark.createDataFrame(
            [(BASE + timedelta(minutes=i), "a", f"new{i}") for i in range(30)],
            "ts timestamp, item string, key string",
        )
        lo.merge_batch(burst, "ts")  # would raise under a retroactive cap
        assert lo.approx_count("a", DAY1, DAY2)[0] == 50
    finally:
        lo.unpersist()
    # small legacy domain (<= default): the guard comes back
    lo = load_frequency_rollup(spark, save_as_legacy(4, "fr_legacy_small"))
    try:
        assert lo.max_keys == 8
        burst = spark.createDataFrame(
            [(BASE + timedelta(minutes=i), "a", f"new{i}") for i in range(30)],
            "ts timestamp, item string, key string",
        )
        with pytest.raises(ValueError, match="max_keys=8"):
            lo.merge_batch(burst, "ts")
    finally:
        lo.unpersist()


def test_engine_build_topk_index_passes_max_keys(spark):
    """r10 review: the cap's own remediation ('pass max_keys=') must be
    reachable from the primary engine API, not only the operator."""
    eng = WheelEngine(
        spark, "events_maxkeys", "/root/testdata/sf0.001/events.parquet",
        time_column="ts",
    )
    with pytest.raises(ValueError, match="max_keys=2"):
        eng.build_topk_index(
            "event_type", capacity=4, partition_by="user_id", max_keys=2,
        )


def test_asks_validate_against_the_captures_tiers(spark, events):
    """r11 review pass 5: alignment/granularity gates must read the tiers
    that rode the published capture, not live self.tiers — a compaction
    racing an ask could otherwise pair old widths with new frames and
    return a silently empty top-k instead of the alignment raise."""
    r = build_frequency_rollup(events, "item", "ts", 3600, capacity=64)
    try:
        day2_sec = int(datetime(2024, 2, 2).timestamp())
        r.compact_before(day2_sec, 86400)
        assert r._caches.tiers == [(day2_sec, 86400)]
        # simulate the torn window: live tiers look pre-compaction while
        # the capture is post-compaction — the gates must follow the
        # CAPTURE
        saved = r._tiers
        r._tiers = []
        try:
            with pytest.raises(ValueError, match="align"):
                r.topk_rows("2024-02-01 01:00:00", "2024-02-01 05:00:00")
            with pytest.raises(ValueError, match="align"):
                r.approx_topk("2024-02-01 01:00:00", "2024-02-01 05:00:00")
            with pytest.raises(ValueError, match="not tiled"):
                r.topk_rows_by("hour", k=2)
        finally:
            r._tiers = saved
        # coherent state: day-aligned asks answer fine
        assert r.topk_rows("2024-02-01 00:00:00", "2024-02-02 00:00:00", k=2)
    finally:
        r.unpersist()


def test_topk_by_day_matches_duckdb_real_table(spark, sf_medium_dir):
    """Funding for the r13 registry rotation (freq_topk_by_day out for
    mm_media_dedup): the retired row's DuckDB hash check moves here
    verbatim — top event types per day over the registry window from the
    hourly truncated-counter rollup (capacity 8 >= the 5 distinct types,
    so est is EXACT and upper == est) vs the per-day GROUP BY + rank SQL,
    at the driver's comparison scale (sf0.01). The probe machinery stays
    hash-checked every round via freq_topk (scalar) + freq_topk_by_key
    (keyed)."""
    import duckdb

    from datafusion_uwheel_spark.sources import read_parquet

    A, B = "2024-01-05 00:00:00", "2024-01-12 00:00:00"
    ev = read_parquet(spark, f"{sf_medium_dir}/events.parquet")
    r = build_frequency_rollup(
        ev, "event_type", "ts", bucket_seconds=3600, capacity=8
    )
    try:
        got = sorted(
            map(
                tuple,
                r.approx_topk_by("day", k=3, start=A, end=B).collect(),
            )
        )
    finally:
        r.unpersist()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_medium_dir}/events.parquet'"
    )
    exp = sorted(
        map(
            tuple,
            con.execute(
                "WITH c AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, "
                "event_type AS item, count(*) AS est FROM events "
                f"WHERE ts >= TIMESTAMP '{A}' AND ts < TIMESTAMP '{B}' GROUP BY 1, 2), "
                "r AS (SELECT bucket, item, est, row_number() OVER "
                "(PARTITION BY bucket ORDER BY est DESC, item) AS rk FROM c) "
                "SELECT bucket, item, est, est AS upper FROM r WHERE rk <= 3 "
                "ORDER BY bucket, est DESC, item"
            ).fetchall(),
        )
    )
    assert got == exp and len(got) > 0


def test_grouped_topk_refuses_unbounded_input(spark, tight):
    """r15 verdict #7: _grouped_topk's repartition(group) is skew-safe
    only over capacity-truncated rollup frames — an arbitrary frame must
    trip the lineage assert, never run."""
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [(0, "a", 1)], "__sec long, __item string, cnt long"
    )
    with pytest.raises(AssertionError, match="truncated rollup"):
        tight._grouped_topk(
            raw, raw, F.timestamp_seconds(F.col("__sec")), "bucket", 3
        )
    # the real frames (and their _restrict slices) carry the flag
    c = tight._caches
    assert getattr(c.kept_df, "_uw_rollup_bounded", False)
    assert getattr(
        tight._restrict(c.kept_df, 0, 10**10), "_uw_rollup_bounded", False
    )
