"""int8-quantized ANN index: identical partition layout and candidate sets
(hashing happens on exact vectors), near-identical ranking (cosine is
scale-invariant; only rounding moves it), exact ranking back via
``rescore_with``, ~8× smaller files, and append parity."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators.ann_index import (
    build_ann_index,
    load_ann_index,
)
from datafusion_uwheel_spark.sources import read_parquet

DIM = 64
K = 10
_rng = random.Random(123)
QUERY = [round(_rng.uniform(-1.0, 1.0), 6) for _ in range(DIM)]


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


@pytest.fixture(scope="module")
def emb(spark, sf_small_dir):
    return read_parquet(spark, f"{sf_small_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def pair(spark, emb, tmp_path_factory):
    """The same LSH build with and without quantization."""
    base = tmp_path_factory.mktemp("annq")
    full = str(base / "full")
    q8 = str(base / "q8")
    build_ann_index(emb, full, kind="lsh", dim=DIM, bits=4, tables=2)
    build_ann_index(
        emb, q8, kind="lsh", dim=DIM, bits=4, tables=2, quantize="int8"
    )
    return load_ann_index(spark, full), load_ann_index(spark, q8)


def test_candidate_sets_identical(pair):
    """Buckets are assigned from the EXACT vectors, so quantization must
    not move a single candidate."""
    full, q8 = pair
    want = sorted(r["vec_id"] for r in full.candidates(QUERY).collect())
    got = sorted(r["vec_id"] for r in q8.candidates(QUERY).collect())
    assert got == want and len(got) > 0


def test_quantized_recall(pair):
    full, q8 = pair
    want = [r["vec_id"] for r in full.topk(QUERY, k=K).collect()]
    got = [r["vec_id"] for r in q8.topk(QUERY, k=K).collect()]
    overlap = len(set(want) & set(got))
    assert overlap / K >= 0.8, (want, got)


def test_rescore_recovers_exact_ranking(emb, pair):
    full, q8 = pair
    want = [
        (r["vec_id"], r["sim"]) for r in full.topk(QUERY, k=K).collect()
    ]
    got = [
        (r["vec_id"], r["sim"])
        for r in q8.topk(QUERY, k=K, rescore_with=emb).collect()
    ]
    assert got == want


def test_rescore_requires_manifest_columns(pair, spark):
    _, q8 = pair
    bad = spark.createDataFrame([(1,)], "vec_id long")
    with pytest.raises(ValueError):
        q8.topk(QUERY, k=K, rescore_with=bad).collect()


def test_quantized_index_is_much_smaller(pair):
    full, q8 = pair
    assert dir_bytes(q8.path) < 0.5 * dir_bytes(full.path)


def test_stored_codes_are_bytes(spark, pair):
    _, q8 = pair
    raw = spark.read.parquet(q8.path)
    assert dict(raw.dtypes)["embedding"] == "array<tinyint>"
    # the probe frame casts back to double at scan time
    assert dict(q8._df.dtypes)["embedding"] == "array<double>"


def test_append_stays_quantized(spark, emb, tmp_path):
    path = str(tmp_path / "q8_append")
    head = emb.limit(400)
    build_ann_index(
        head, path, kind="ivf", dim=DIM, n_centroids=8, quantize="int8"
    )
    idx = load_ann_index(spark, path)
    tail = emb.join(head.select("vec_id"), on="vec_id", how="anti")
    idx.append(tail)
    raw = spark.read.parquet(path)
    assert dict(raw.dtypes)["embedding"] == "array<tinyint>"
    # probing across generations still works and sees all rows
    assert raw.count() == emb.count()
    got = idx.topk(QUERY, k=K).collect()
    assert len(got) == K


def test_similarity_engine_quantized_stays_unregistered(spark, emb, tmp_path):
    """A quantized build is returned for handle probes but never registered
    for seeded routing — routing promises results identical to the
    query-time operators, which int8 rounding cannot."""
    import pytest as _pytest

    from datafusion_uwheel_spark import SimilarityEngine

    eng = SimilarityEngine(
        spark, "embq", emb, dim=DIM, index_root=str(tmp_path / "idx")
    )
    before = dict(eng.indexes)
    idx = eng.build_index(kind="lsh", bits=4, tables=2, quantize="int8")
    assert eng.indexes == before  # nothing registered
    assert idx.m["quantize"] == "int8"
    assert len(idx.topk(QUERY, k=K).collect()) == K
    with _pytest.raises(ValueError):
        eng.register_index(idx)
