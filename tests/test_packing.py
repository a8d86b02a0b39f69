"""Sequence packing + mixture sampling: invariants (these ops are greedy /
cross-frame, not SQL-expressible — the documented weaker-check tier)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators import packing, text as text_ops
from datafusion_uwheel_spark.sources import read_parquet

MAX = 2048


@pytest.fixture(scope="module")
def docs_tokens(spark, sf_small_dir):
    docs = read_parquet(spark, f"{sf_small_dir}/documents.parquet")
    return text_ops.with_token_stats(docs).select("doc_id", "n_tokens")


def test_every_doc_packed_exactly_once(spark, docs_tokens):
    packed = packing.pack_sequences(docs_tokens, MAX)
    assert packed.count() == docs_tokens.count()
    assert packed.select("doc_id").distinct().count() == docs_tokens.count()


def test_no_sequence_exceeds_budget(spark, docs_tokens):
    packed = packing.pack_sequences(docs_tokens, MAX)
    over = (
        packed.filter(~F.col("oversize"))
        .groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("t"))
        .filter(F.col("t") > MAX)
        .count()
    )
    assert over == 0
    # oversize docs sit alone in their sequences, flagged
    o = packed.filter("oversize")
    if o.count():
        solo = o.groupBy("seq_id").count().filter("count > 1").count()
        assert solo == 0


def test_packing_efficiency_vs_lower_bound(spark, docs_tokens):
    """FFD per shard: total bins within 2x of the global lower bound
    ceil(total_tokens / max) (sharding adds slack; 2x is conservative)."""
    packed = packing.pack_sequences(docs_tokens, MAX)
    n_bins = packed.filter(~F.col("oversize")).select("seq_id").distinct().count()
    tot = (
        packed.filter(~F.col("oversize")).agg(F.sum("n_tokens")).collect()[0][0]
    )
    lower = math.ceil(tot / MAX)
    assert n_bins <= 2 * lower, (n_bins, lower)


def test_packing_deterministic(spark, docs_tokens):
    a = sorted(map(tuple, packing.pack_sequences(docs_tokens, MAX, shards=8).collect()))
    b = sorted(map(tuple, packing.pack_sequences(docs_tokens, MAX, shards=8).collect()))
    assert a == b


def test_oversize_docs_flagged_not_dropped(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 5000), (3, 20)], "doc_id long, n_tokens long"
    )
    packed = packing.pack_sequences(df, 100, shards=2)
    rows = {r["doc_id"]: r for r in packed.collect()}
    assert rows[2]["oversize"] and not rows[1]["oversize"]
    assert len(rows) == 3


@settings(max_examples=20, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=120),
    cap=st.integers(min_value=50, max_value=500),
)
def test_packing_invariants_property(spark, tokens, cap):
    """Random workloads: every doc lands exactly once, no bin over cap,
    oversize docs isolated, and per-shard FFD stays within the classic
    bound (total bins ≤ shards' worth of slack over ceil(total/cap))."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc_id long, n_tokens long"
    )
    packed = packing.pack_sequences(df, cap, shards=2).collect()
    assert sorted(r["doc_id"] for r in packed) == list(range(len(tokens)))
    by_bin: dict = {}
    for r in packed:
        by_bin.setdefault(r["seq_id"], []).append(r)
    for members in by_bin.values():
        if any(m["oversize"] for m in members):
            assert len(members) == 1
        else:
            assert sum(m["n_tokens"] for m in members) <= cap
    fit = [t for t in tokens if t <= cap]
    if fit:
        n_bins = len({r["seq_id"] for r in packed if not r["oversize"]})
        # FFD ≤ (11/9)·OPT + 1 per shard; 2 shards + small-OPT slack
        assert n_bins <= math.ceil(1.5 * math.ceil(sum(fit) / cap)) + 3


def test_zero_token_docs_never_join_oversize(spark):
    """A zero-token doc fits anywhere, but an oversize singleton is not an
    open bin — the ADVICE-flagged regression (capacity-0 closed bins
    accepting t == 0 probes)."""
    df = spark.createDataFrame(
        [(1, 5000), (2, 0), (3, 0), (4, 40)], "doc_id long, n_tokens long"
    )
    packed = packing.pack_sequences(df, 100, shards=1).collect()
    rows = {r["doc_id"]: r for r in packed}
    assert rows[1]["oversize"]
    others = {rows[i]["seq_id"] for i in (2, 3, 4)}
    assert rows[1]["seq_id"] not in others
    assert sorted(r["doc_id"] for r in packed) == [1, 2, 3, 4]


def test_worst_case_probe_is_not_quadratic(spark):
    """Every doc just over max/2: each opens its own bin and no later doc
    fits any earlier bin. The old linear probe was O(n^2) Python here; the
    sorted-capacity probe closes each bin immediately (capacity < min doc),
    so 20k docs in one shard must pack comfortably fast."""
    import time

    n, cap = 20_000, 1000
    df = spark.createDataFrame(
        [(i, cap // 2 + 1 + (i % 3)) for i in range(n)],
        "doc_id long, n_tokens long",
    )
    t0 = time.monotonic()
    packed = packing.pack_sequences(df, cap, shards=1)
    n_bins = packed.select("seq_id").distinct().count()
    elapsed = time.monotonic() - t0
    assert n_bins == n  # nothing fits with anything else
    assert elapsed < 30, f"packing took {elapsed:.1f}s — probe degraded"


def test_mixture_hits_shares(spark, docs_tokens):
    half = docs_tokens.filter("doc_id % 2 = 0")
    other = docs_tokens.filter("doc_id % 2 = 1")
    et = half.agg(F.sum("n_tokens")).collect()[0][0]
    ot = other.agg(F.sum("n_tokens")).collect()[0][0]
    # largest target both sources can fund at 75/25, with headroom
    target = int(0.8 * min(et / 0.75, ot / 0.25))
    blend = packing.mixture_sample(
        {"even": half, "odd": other}, {"even": 3.0, "odd": 1.0}, target
    )
    got = {
        r["source"]: r["t"]
        for r in blend.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert abs(got["even"] - 0.75 * target) / (0.75 * target) < 0.30
    assert abs(got["odd"] - 0.25 * target) / (0.25 * target) < 0.35


def test_mixture_deterministic_for_seed(spark, docs_tokens):
    half = docs_tokens.filter("doc_id % 2 = 0")
    other = docs_tokens.filter("doc_id % 2 = 1")
    tot = docs_tokens.agg(F.sum("n_tokens")).collect()[0][0]
    args = ({"a": half, "b": other}, {"a": 1.0, "b": 1.0}, int(tot * 0.2))
    one = sorted(map(tuple, packing.mixture_sample(*args, seed=7).collect()))
    two = sorted(map(tuple, packing.mixture_sample(*args, seed=7).collect()))
    assert one == two


def test_mixture_refuses_underfilled_source(spark, docs_tokens):
    tiny = docs_tokens.limit(3)
    with pytest.raises(ValueError, match="upsample"):
        packing.mixture_sample(
            {"tiny": tiny, "rest": docs_tokens},
            {"tiny": 0.9, "rest": 0.1},
            10**9,
        )


def test_mixture_key_mismatch_raises(spark, docs_tokens):
    with pytest.raises(ValueError, match="identical keys"):
        packing.mixture_sample({"a": docs_tokens}, {"b": 1.0}, 1000)


# ------------------------------------------------- per-key caps (r6)
def test_cap_per_key_matches_duckdb_window(spark, sf_small_dir):
    """The skew-safe two-stage top-k selects EXACTLY what the one-stage
    SQL window selects — pinned against a DuckDB ROW_NUMBER() mirror on
    the same parquet (order: n_chars DESC, doc_id tiebreak)."""
    import duckdb

    docs = read_parquet(spark, f"{sf_small_dir}/documents.parquet")
    got = sorted(
        r["doc_id"]
        for r in packing.cap_per_key(
            docs, "source", 30, order_by=F.col("n_chars").desc()
        )
        .select("doc_id")
        .collect()
    )
    con = duckdb.connect()
    want = sorted(
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM (SELECT doc_id, ROW_NUMBER() OVER "
            "(PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk "
            f"FROM '{sf_small_dir}/documents.parquet') WHERE rk <= 30"
        ).fetchall()
    )
    assert got == want


def test_cap_per_key_bounds_and_default_order(spark, sf_small_dir):
    docs = read_parquet(spark, f"{sf_small_dir}/documents.parquet")
    out = packing.cap_per_key(docs, "source", 5)
    sizes = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, n in sizes.items():
        assert n == min(5, orig[s]), (s, n, orig[s])
    # default order keeps the LOWEST ids per key
    first = out.filter(F.col("source") == sorted(orig)[0]).select("doc_id")
    want_first = (
        docs.filter(F.col("source") == sorted(orig)[0])
        .orderBy("doc_id")
        .limit(5)
        .select("doc_id")
    )
    assert sorted(r[0] for r in first.collect()) == sorted(
        r[0] for r in want_first.collect()
    )
    with pytest.raises(ValueError, match="max_rows"):
        packing.cap_per_key(docs, "source", 0)


def test_cap_per_key_skew_safe_plan(spark, sf_small_dir):
    """No single-task global sort: both window stages partition by a key
    (never an empty partition spec), so a hot domain cannot funnel its
    whole row set through one task."""
    docs = read_parquet(spark, f"{sf_small_dir}/documents.parquet")
    plan = packing.cap_per_key(docs, "source", 10)._jdf.queryExecution().executedPlan().toString()
    # a Window with an empty partition spec plans a SinglePartition
    # exchange — the one-task funnel this operator exists to avoid
    assert "SinglePartition" not in plan, plan


def test_sample_per_key_exact_sizes_and_determinism(spark, sf_small_dir):
    docs = read_parquet(spark, f"{sf_small_dir}/documents.parquet")
    a = packing.sample_per_key(docs, "source", 7, seed=1)
    b = packing.sample_per_key(docs, "source", 7, seed=1)
    c = packing.sample_per_key(docs, "source", 7, seed=2)
    ids = lambda d: sorted(r["doc_id"] for r in d.select("doc_id").collect())
    assert ids(a) == ids(b)  # deterministic for a seed
    assert ids(a) != ids(c)  # seed changes the draw
    sizes = {
        r["source"]: r["n"]
        for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, n in sizes.items():
        assert n == min(7, orig[s])


def test_packing_single_arrow_pass_per_task(spark, docs_tokens):
    """r15: packing runs as ONE mapInArrow pass per task over the shard
    repartition — no per-shard pandas group dispatch (the old
    applyInPandas paid one pandas frame per shard, dominant with more
    shards than cores). String ids must survive the Arrow landing too."""
    packed = packing.pack_sequences(docs_tokens, MAX)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan, plan
    assert "FlatMapGroupsInPandas" not in plan, plan

    # string-id corpus: same invariants through the typed Arrow output
    sdocs = docs_tokens.select(
        F.concat(F.lit("d-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "n_tokens",
    )
    out = packing.pack_sequences(sdocs, MAX)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    assert out.count() == sdocs.count()
    worst = (
        out.filter(~F.col("oversize"))
        .groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("t"))
        .agg(F.max("t"))
        .collect()[0][0]
    )
    assert worst <= MAX
