"""ANN index freshness: staleness accounting, the max_delta_fraction routing
gate, and retrain() — the "stale never answers" discipline (wheel freshness
gates, shim view revocation) applied to the similarity registry, where a long
append stream could otherwise degrade recall silently (the reference pins its
index at build and documents staleness, lib.rs:153-239; this engine gates and
remedies it)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators import similarity
from datafusion_uwheel_spark.operators.ann_index import (
    build_ann_index,
    load_ann_index,
)
from datafusion_uwheel_spark.similarity_engine import SimilarityEngine
from datafusion_uwheel_spark.sources import read_parquet

DIM = 64
K = 10
_rng = random.Random(123)
QUERY = [round(_rng.uniform(-1.0, 1.0), 6) for _ in range(DIM)]


@pytest.fixture(scope="module")
def emb(spark, sf_small_dir):
    return read_parquet(spark, f"{sf_small_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def split(emb):
    """(base, delta, full, n_base, n_delta): a 3:1-ish split by vec_id so
    appends move staleness past a 0.2 gate."""
    n = emb.count()
    cut = (3 * n) // 4
    base = emb.filter(F.col("vec_id") < cut)
    delta = emb.filter(F.col("vec_id") >= cut)
    return base, delta, emb, cut, n - cut


def test_staleness_counts_rows_and_survives_compaction(spark, split, tmp_path_factory):
    base, delta, _full, n_base, n_delta = split
    path = str(tmp_path_factory.mktemp("fresh") / "lsh")
    build_ann_index(base, path, kind="lsh", dim=DIM, bits=4, tables=2)
    idx = load_ann_index(spark, path)
    assert idx.staleness() == 0.0
    idx.append(delta)
    expect = n_delta / (n_base + n_delta)
    assert idx.staleness() == pytest.approx(expect)
    # compaction bounds FILES, not drift: generations reset, staleness kept
    idx.compact()
    assert idx.m["generations"] == 1
    assert idx.staleness() == pytest.approx(expect)
    # a fresh handle (restart story) reads the same counters
    assert load_ann_index(spark, path).staleness() == pytest.approx(expect)


def test_gate_degrades_topk_and_retrain_restores(spark, split, tmp_path_factory):
    base, delta, full, _nb, _nd = split
    path = str(tmp_path_factory.mktemp("fresh") / "lsh_gate")
    build_ann_index(base, path, kind="lsh", dim=DIM, bits=4, tables=2)
    eng = SimilarityEngine(
        spark, "emb_gate", full, dim=DIM, max_delta_fraction=0.2
    )
    idx = eng.register_index(path)
    idx.append(delta)
    assert idx.staleness() > 0.2

    # past the gate: the probe degrades to the query-time operator over the
    # engine's (complete) source — correct answers, slower plan
    got = eng.topk(QUERY, k=K, kind="lsh", bits=4, tables=2).collect()
    assert eng.last_route.kind == "query_time"
    assert eng.last_route.detail["reason"] == "stale"
    want = similarity.ann_topk(full, QUERY, k=K, bits=4, tables=2).collect()
    assert got == want

    # retrain(): re-pinned against the full population, routing restored,
    # and the probe now matches the query-time operator exactly (recall 1.0
    # vs the routing contract — trivially ≥ the 0.8 bar)
    assert eng.retrain() == 1
    assert eng.staleness() == 0.0
    routed = eng.topk(QUERY, k=K, kind="lsh", bits=4, tables=2).collect()
    assert eng.last_route.kind == "indexed"
    assert routed == want


def test_dup_pairs_gate(spark, split, tmp_path_factory):
    base, delta, full, _nb, _nd = split
    path = str(tmp_path_factory.mktemp("fresh") / "lsh_dup")
    build_ann_index(base, path, kind="lsh", dim=DIM, bits=8, tables=2)
    eng = SimilarityEngine(
        spark, "emb_dup_gate", full, dim=DIM, max_delta_fraction=0.2
    )
    eng.register_index(path).append(delta)
    got = eng.dup_pairs(0.4, bits=8, tables=2).collect()
    assert eng.last_route.kind == "query_time"
    assert eng.last_route.detail["reason"] == "stale"
    want = similarity.embedding_dup_pairs(
        full, 0.4, bits=8, tables=2, dim=DIM
    ).collect()
    assert sorted(got) == sorted(want)


def test_knn_join_refuses_stale(spark, split, tmp_path_factory):
    base, delta, full, _nb, _nd = split
    path = str(tmp_path_factory.mktemp("fresh") / "lsh_knn")
    build_ann_index(base, path, kind="lsh", dim=DIM, bits=4, tables=2)
    eng = SimilarityEngine(
        spark, "emb_knn_gate", full, dim=DIM, max_delta_fraction=0.2
    )
    eng.register_index(path).append(delta)
    qs = full.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="staleness"):
        eng.knn_join(qs, k=5, kind="lsh", bits=4, tables=2)
    # retrain restores the route (and the join answers)
    eng.retrain()
    rows = eng.knn_join(qs, k=5, kind="lsh", bits=4, tables=2).collect()
    assert eng.last_route.kind == "indexed"
    assert len(rows) == 15  # 3 queries × k


def test_no_gate_keeps_pre_gate_behavior(spark, split, tmp_path_factory):
    base, delta, _full, _nb, _nd = split
    path = str(tmp_path_factory.mktemp("fresh") / "lsh_nogate")
    build_ann_index(base, path, kind="lsh", dim=DIM, bits=4, tables=2)
    eng = SimilarityEngine(spark, "emb_nogate", base, dim=DIM)  # gate off
    eng.register_index(path).append(delta)
    eng.topk(QUERY, k=K, kind="lsh", bits=4, tables=2).collect()
    assert eng.last_route.kind == "indexed"  # caller watches staleness


def test_retrain_trained_ivf_equals_fresh_build(spark, split, tmp_path_factory):
    """The drift-prone case: trained IVF centroids fitted on the base
    population, then appends. retrain() must be indistinguishable from a
    from-scratch build over today's population (deterministic seeded
    k-means), and full-fanout recall stays exact."""
    base, delta, full, _nb, _nd = split
    root = tmp_path_factory.mktemp("fresh")
    cents0 = similarity.train_ivf_centroids(base, DIM, 8, seed=7)
    path = str(root / "ivf_trained")
    build_ann_index(
        base, path, kind="ivf", dim=DIM, n_centroids=8, seed=7, centroids=cents0
    )
    idx = load_ann_index(spark, path)
    idx.append(delta)
    assert idx.staleness() > 0.2
    idx.retrain(source=full.select("vec_id", "embedding"))
    assert idx.staleness() == 0.0
    # quantizer re-fitted on the full population == a fresh build's
    cents_fresh = similarity.train_ivf_centroids(full, DIM, 8, seed=7)
    assert idx.m["centroids"] == cents_fresh
    fresh_path = str(root / "ivf_fresh")
    build_ann_index(
        full, fresh_path, kind="ivf", dim=DIM, n_centroids=8, seed=7,
        centroids=cents_fresh,
    )
    fresh = load_ann_index(spark, fresh_path)
    got = idx.topk(QUERY, k=K, nprobe=2).collect()
    assert got == fresh.topk(QUERY, k=K, nprobe=2).collect()
    # recall vs exact at full fan-out (nprobe = all cells → candidate set is
    # the whole table, so the rerank path must reproduce ground truth)
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(full, QUERY, K).collect()
    }
    approx = {r["vec_id"] for r in idx.topk(QUERY, k=K, nprobe=8).collect()}
    assert len(exact & approx) / K >= 0.8


def test_quantized_retrain_requires_source(spark, split, tmp_path_factory):
    base, delta, full, _nb, _nd = split
    path = str(tmp_path_factory.mktemp("fresh") / "lsh_q8")
    build_ann_index(
        base, path, kind="lsh", dim=DIM, bits=4, tables=2, quantize="int8"
    )
    idx = load_ann_index(spark, path)
    idx.append(delta)
    with pytest.raises(ValueError, match="full-precision"):
        idx.retrain()
    idx.retrain(source=full.select("vec_id", "embedding"))
    assert idx.staleness() == 0.0
    assert idx.m["quantize"] == "int8"
    assert idx.topk(QUERY, k=K).count() == K


def test_legacy_manifest_falls_back_to_generations(spark, split, tmp_path_factory):
    base, _delta, _full, _nb, _nd = split
    path = str(tmp_path_factory.mktemp("fresh") / "lsh_legacy")
    build_ann_index(base, path, kind="lsh", dim=DIM, bits=4, tables=2)
    idx = load_ann_index(spark, path)
    # a manifest written before the row counters existed
    idx.m = {
        k: v for k, v in idx.m.items() if k not in ("base_rows", "delta_rows")
    }
    assert idx.staleness() == 0.0
    idx.m["generations"] = 3
    assert idx.staleness() == pytest.approx(2 / 3)
