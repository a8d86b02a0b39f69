"""Multimodal plumbing tests: schemas, Arrow batching, determinism, and the
stub gate. The decode itself is a deterministic fake (no media libs in this
container) — what's under test is the Spark-side contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators import multimodal as mm
from datafusion_uwheel_spark.operators import similarity


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", ("image/png", 64, 48, None, None)),
        (2, "image", b"\x89PNG-fake-bytes-1", ("image/png", 64, 48, None, None)),  # dup
        (3, "audio", b"RIFF-fake-audio", ("audio/wav", None, None, 16000, 2500)),
        (4, "video", b"mp4-fake-video", ("video/mp4", 320, 240, None, 3500)),
        (5, "image", None, None),  # missing payload
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_media_stats_and_exact_dedup(media):
    stats = mm.with_media_stats(media)
    rows = {r["media_id"]: r for r in stats.collect()}
    assert rows[1]["size_bytes"] == len(b"\x89PNG-fake-bytes-1")
    assert rows[1]["digest"] == rows[2]["digest"]  # exact dup detectable
    assert rows[1]["digest"] != rows[3]["digest"]
    assert rows[5]["size_bytes"] is None


def test_decode_media_schema_and_determinism(media):
    out = mm.decode_media(media, n_values=32)
    assert out.schema["decoded"].dataType.simpleString() == "array<float>"
    a = {r["media_id"]: r["decoded"] for r in out.collect()}
    b = {r["media_id"]: r["decoded"] for r in mm.decode_media(media, n_values=32).collect()}
    assert a == b  # deterministic fake
    assert len(a[1]) == 32
    assert a[1] == a[2]  # same payload → same decode
    assert a[1] != a[3]
    assert a[5] is None  # NULL payload propagates
    assert all(0.0 <= v <= 1.0 for v in a[1])


def test_extract_features_feeds_similarity(media):
    feats = mm.extract_features(media, dim=16).filter(F.col("feature").isNotNull())
    assert feats.columns == ["media_id", "feature"]
    q = feats.filter(F.col("media_id") == 1).head()["feature"]
    top = similarity.cosine_topk(feats, [float(x) for x in q], k=2,
                                 vec_col="feature", id_col="media_id").collect()
    assert top[0]["media_id"] in (1, 2)  # duplicate payloads tie at sim=1.0
    assert top[0]["sim"] == 1.0 and top[1]["sim"] == 1.0


def test_sample_frames_explodes_by_duration(media):
    frames = mm.sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {4}  # only the video row explodes
    got = sorted((r["frame_idx"], r["ts_ms"]) for r in by_id[4])
    assert got == [(0, 0), (1, 1000), (2, 2000)]  # 3500ms // 1000
    f0, f1 = by_id[4][0]["frame"], by_id[4][1]["frame"]
    assert f0 != f1  # per-timestamp decode differs


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception) as err:
        mm.decode_media(media.filter(F.col("media_id") == 1), fake=False).collect()
    assert "NotImplementedError" in str(err.value) or isinstance(
        err.value, NotImplementedError
    )


def test_repartition_for_media(media):
    out = mm.repartition_for_media(media.filter(F.col("data").isNotNull()),
                                   target_partition_bytes=16)
    assert out.count() == 4
    assert out.rdd.getNumPartitions() >= 2  # ~50 bytes total / 16-byte target
