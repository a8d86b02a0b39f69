"""Ingestion-time semantic dedup (SemanticCorpusDedup): two-batch crawl
replay against a pure-Python SemDeDup oracle with stream-arrival order —
corpus members earlier than the batch, batch rows in keep order."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators.similarity import ivf_centroids
from datafusion_uwheel_spark.operators.stream_dedup import SemanticCorpusDedup

DIM = 8
CENTS = ivf_centroids(DIM, 3, seed=7)
T = 0.92


def _mkdf(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture()
def bundles():
    rng = random.Random(5)
    base = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(4)]

    def near(b):
        return [x + rng.uniform(-0.005, 0.005) for x in b]

    # batch 1: two bundles of 3 + noise
    b1 = []
    rid = 0
    for b in base[:2]:
        for _ in range(3):
            b1.append((rid, near(b)))
            rid += 1
    for _ in range(4):
        b1.append((rid, [rng.uniform(-1, 1) for _ in range(DIM)]))
        rid += 1
    # batch 2: near-dups of batch-1 bundles + one fresh bundle + noise
    b2 = [(100 + i, near(base[i % 2])) for i in range(3)]
    b2 += [(110 + i, near(base[2])) for i in range(3)]
    b2.append((120, [rng.uniform(-1, 1) for _ in range(DIM)]))
    return b1, b2


def test_two_batch_semantics_and_replay(spark, tmp_path, bundles):
    b1, b2 = bundles
    dd = SemanticCorpusDedup(
        spark, str(tmp_path / "st"), CENTS, threshold=T
    )
    s1 = dd.filter_batch(_mkdf(spark, b1))
    kept1 = sorted(r["vec_id"] for r in s1.collect())
    # within-batch SemDeDup ran: each 3-bundle keeps at least 1, not all 3
    assert 0 < len(kept1) < len(b1)
    n_state1 = dd.seen_count()
    assert n_state1 == len(kept1)

    s2 = dd.filter_batch(_mkdf(spark, b2))
    kept2 = sorted(r["vec_id"] for r in s2.collect())
    # near-dups of batch-1 bundles must DROP against the corpus; the fresh
    # bundle keeps one representative; the noise row survives
    assert all(i not in kept2 for i in (100, 101, 102))
    assert sum(1 for i in kept2 if 110 <= i < 113) == 1
    assert 120 in kept2
    assert dd.seen_count() == n_state1 + len(kept2)

    # replay of batch 2: everything matches its own recorded vector
    s2r = dd.filter_batch(_mkdf(spark, b2))
    assert s2r.count() == 0
    assert dd.seen_count() == n_state1 + len(kept2)


def test_no_cross_state_pair_above_threshold(spark, tmp_path, bundles):
    """The streaming invariant mirroring batch idempotence: after any
    sequence of batches, the recorded corpus contains no pair ≥ T."""
    from datafusion_uwheel_spark.operators.semantic_dedup import (
        semantic_dup_pairs,
    )

    b1, b2 = bundles
    dd = SemanticCorpusDedup(spark, str(tmp_path / "st"), CENTS, threshold=T)
    dd.filter_batch(_mkdf(spark, b1))
    dd.filter_batch(_mkdf(spark, b2))
    state = dd._vectors().select(
        F.col("owner").alias("vec_id"),
        F.col("embedding"),
    )
    pairs = semantic_dup_pairs(state, CENTS, threshold=T)
    assert pairs.count() == 0


def test_two_phase_uncommitted_replays_clean(spark, tmp_path, bundles):
    b1, _ = bundles
    dd = SemanticCorpusDedup(spark, str(tmp_path / "st"), CENTS, threshold=T)
    surv, pending = dd.prepare_batch(_mkdf(spark, b1))
    n = surv.count()
    assert dd.seen_count() == 0  # nothing recorded yet
    # a replay before commit answers identically (sink failed, re-emit)
    surv2, pending2 = dd.prepare_batch(_mkdf(spark, b1))
    assert surv2.count() == n
    dd.commit(pending)
    assert dd.seen_count() == n


def test_zero_vector_passthrough_unrecorded(spark, tmp_path):
    dd = SemanticCorpusDedup(spark, str(tmp_path / "st"), CENTS, threshold=T)
    df = _mkdf(spark, [(1, [0.0] * DIM), (2, [1.0] + [0.0] * (DIM - 1))])
    kept = sorted(r["vec_id"] for r in dd.filter_batch(df).collect())
    assert kept == [1, 2]
    assert dd.seen_count() == 1  # only the real vector recorded
    # replay: the zero vector passes again, the real one drops
    kept2 = sorted(r["vec_id"] for r in dd.filter_batch(df).collect())
    assert kept2 == [1]


def test_manifest_pins_centroids(spark, tmp_path):
    path = str(tmp_path / "st")
    SemanticCorpusDedup(spark, path, CENTS, threshold=T)
    # same centroids reopen fine
    SemanticCorpusDedup(spark, path, CENTS, threshold=T)
    with pytest.raises(ValueError, match="DIFFERENT"):
        SemanticCorpusDedup(
            spark, path, ivf_centroids(DIM, 3, seed=8), threshold=T
        )


def test_compact_folds_double_records(spark, tmp_path, bundles):
    b1, _ = bundles
    dd = SemanticCorpusDedup(spark, str(tmp_path / "st"), CENTS, threshold=T)
    surv, pending = dd.prepare_batch(_mkdf(spark, b1))
    n = surv.count()
    dd.commit(pending)
    pending.committed = False  # simulate a replayed commit (double record)
    dd.commit(pending)
    assert dd.seen_count() == 2 * n
    dd.compact()
    assert dd.seen_count() == n
    # state still answers after compaction
    assert dd.filter_batch(_mkdf(spark, b1)).count() == 0


def test_string_id_refused(spark, tmp_path):
    """r11 review: a silent cast('long') on string ids records NULL
    owners — refuse instead."""
    dd = SemanticCorpusDedup(spark, str(tmp_path / "st"), CENTS, threshold=T)
    df = spark.createDataFrame(
        [("a", [1.0] * DIM)], "vec_id string, embedding array<float>"
    )
    with pytest.raises(ValueError, match="integral"):
        dd.prepare_batch(df)


def test_compact_keeps_rekept_ids_distinct_vectors(spark, tmp_path):
    """r11 review: a legitimately re-kept id (updated page, dissimilar new
    embedding) owns TWO state vectors; compact must keep both — only
    byte-identical replay double-records fold."""
    rng = random.Random(9)
    v1 = [rng.uniform(-1, 1) for _ in range(DIM)]
    v2 = [-x for x in v1]  # cosine -1: definitely below threshold
    dd = SemanticCorpusDedup(spark, str(tmp_path / "st"), CENTS, threshold=T)
    assert dd.filter_batch(_mkdf(spark, [(42, v1)])).count() == 1
    assert dd.filter_batch(_mkdf(spark, [(42, v2)])).count() == 1
    assert dd.seen_count() == 2  # same owner, two vectors
    dd.compact()
    assert dd.seen_count() == 2  # both survive the fold
    # near-dups of EACH vector still drop post-compact
    near1 = [x + 0.001 for x in v1]
    near2 = [x + 0.001 for x in v2]
    assert dd.filter_batch(_mkdf(spark, [(50, near1), (51, near2)])).count() == 0


def test_arg_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        SemanticCorpusDedup(spark, str(tmp_path / "a"), [], threshold=T)
    with pytest.raises(ValueError):
        SemanticCorpusDedup(spark, str(tmp_path / "b"), CENTS, threshold=0.0)
    with pytest.raises(ValueError):
        SemanticCorpusDedup(spark, str(tmp_path / "c"), CENTS, keep="nope")


# ------------------------------------------------- int8 state (r12)
def _dir_bytes(p):
    import os

    total = 0
    for root, _dirs, files in os.walk(p):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def test_q8_state_decisions_match_full_precision(spark, tmp_path, bundles):
    """Quantized-state decisions ≡ full-precision decisions on the same
    two-batch replay: the int8 code tilts each stored direction by at most
    the max-abs rounding angle, so flips are confined to pairs whose exact
    cosine sits within that margin of the threshold — these bundles (and
    the real corpus below) sit nowhere near it."""
    b1, b2 = bundles
    full = SemanticCorpusDedup(spark, str(tmp_path / "f"), CENTS, threshold=T)
    q8 = SemanticCorpusDedup(
        spark, str(tmp_path / "q"), CENTS, threshold=T, quantize="int8"
    )
    for batch in (b1, b2):
        df = _mkdf(spark, batch)
        kf = sorted(r["vec_id"] for r in full.filter_batch(df).collect())
        kq = sorted(r["vec_id"] for r in q8.filter_batch(df).collect())
        assert kf == kq
    # replay through the quantized state: self-cosine ≈ 1.0 >= T, nothing
    # re-emits (the at-least-once contract the threshold cap protects)
    assert q8.filter_batch(_mkdf(spark, b1)).count() == 0
    # the stored rows really are int8 codes
    st = q8._vectors()
    assert st.schema["embedding"].dataType.simpleString() == "array<tinyint>"
    assert st.count() == full._vectors().count()


def test_q8_state_matches_full_on_real_embeddings(spark, tmp_path, sf_small_dir):
    """The r11 verdict's Done-bar: quantized-state decisions ≡
    full-precision decisions on the real embeddings table, and the state
    is materially smaller."""
    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").head()[0])
    cents = ivf_centroids(dim, 8, seed=42)
    full = SemanticCorpusDedup(
        spark, str(tmp_path / "rf"), cents, threshold=0.4
    )
    q8 = SemanticCorpusDedup(
        spark, str(tmp_path / "rq"), cents, threshold=0.4, quantize="int8"
    )
    b1 = emb.filter(F.col("vec_id") % 3 == 0)
    b2 = emb.filter(F.col("vec_id") % 3 != 0)
    for batch in (b1, b2):
        kf = sorted(r["vec_id"] for r in full.filter_batch(batch).collect())
        kq = sorted(r["vec_id"] for r in q8.filter_batch(batch).collect())
        assert kf == kq and len(kf) > 0
    fb = _dir_bytes(str(tmp_path / "rf" / "vectors"))
    qb = _dir_bytes(str(tmp_path / "rq" / "vectors"))
    # float32 -> int8 is 4x raw; parquet encoding keeps most of it
    assert qb < 0.5 * fb, (qb, fb)


def test_q8_threshold_cap_and_manifest_mode_pin(spark, tmp_path):
    with pytest.raises(ValueError, match="quantize='int8'"):
        SemanticCorpusDedup(
            spark, str(tmp_path / "c"), CENTS, threshold=0.999, quantize="int8"
        )
    with pytest.raises(ValueError, match="unknown quantize"):
        SemanticCorpusDedup(
            spark, str(tmp_path / "c2"), CENTS, quantize="int4"
        )
    # a state dir opened with a different mode refuses (mixed encodings
    # under one schema would silently mis-read)
    SemanticCorpusDedup(
        spark, str(tmp_path / "m"), CENTS, threshold=T, quantize="int8"
    )
    with pytest.raises(ValueError, match="quantize"):
        SemanticCorpusDedup(spark, str(tmp_path / "m"), CENTS, threshold=T)


def test_q8_threshold_cap_scales_with_dim(spark, tmp_path):
    """The r12 review finding: the flat 0.995 ceiling stops guaranteeing
    replay safety past dim ~ 650; the r12 ADVICE geometry fix: s =
    0.5·sqrt(dim)/127 bounds sin(tilt), so the guaranteed worst-case
    self-cosine is cos(arcsin(s)) = sqrt(1 - s^2), ~s^4/6 below cos(s)
    (4e-5 at dim 1024 — more than the 1e-6 margin). The effective cap is
    min(0.995, sqrt(1 - s^2) - 1e-6): strictly below the old cos(s) form
    for dim > 0, and a dim-1024 state must refuse thresholds a dim-8
    state accepts."""
    import math

    big = ivf_centroids(1024, 2, seed=3)
    s = 0.5 * math.sqrt(1024) / 127
    cap_big = SemanticCorpusDedup._q8_threshold_cap(1024)
    assert cap_big == min(0.995, math.sqrt(1 - s * s) - 1e-6)
    # the geometry fix: sqrt(1-s^2) <= cos(s) always, and the gap at
    # dim 1024 (~4e-5) exceeds the 1e-6 margin the old form relied on
    assert cap_big < math.cos(s) - 1e-6
    assert cap_big < 0.995
    # degenerate guard: s clamps at 1.0 (dim >= 64516) -> cap stays finite
    assert SemanticCorpusDedup._q8_threshold_cap(70000) == -1e-6
    with pytest.raises(ValueError, match="quantize='int8'"):
        SemanticCorpusDedup(
            spark, str(tmp_path / "big"), big, threshold=0.994,
            quantize="int8",
        )
    # the same threshold is fine at dim 8 (cap there is the flat 0.995)
    SemanticCorpusDedup(
        spark, str(tmp_path / "small"), CENTS, threshold=0.994,
        quantize="int8",
    )
