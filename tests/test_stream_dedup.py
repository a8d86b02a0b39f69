"""Ingestion-time exact dedup: corpus-backed digest state (batch-by-batch
filtering, replay idempotence, compaction) and the watermarked
within-stream form driven through a real Structured Streaming query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators.stream_dedup import (
    CorpusDedup,
    dedup_within_stream,
)

DOC = "doc_id long, text string"


def docs(spark, rows):
    return spark.createDataFrame(rows, DOC)


@pytest.fixture()
def dedup(spark, tmp_path):
    return CorpusDedup(spark, str(tmp_path / "digests"), n_buckets=8)


def ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_first_batch_keeps_lowest_id_per_content(spark, dedup):
    out = dedup.filter_batch(
        docs(spark, [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc")])
    )
    assert ids(out) == [1, 2, 4]  # 3 is an in-batch dup of 1
    assert dedup.seen_count() == 3


def test_second_batch_filters_against_corpus(spark, dedup):
    dedup.filter_batch(docs(spark, [(1, "aaa"), (2, "bbb")]))
    out = dedup.filter_batch(
        docs(spark, [(10, "aaa"), (11, "new one"), (12, "bbb")])
    )
    assert ids(out) == [11]
    assert dedup.seen_count() == 3


def test_replayed_batch_emits_nothing(spark, dedup):
    """foreachBatch is at-least-once: a replay re-filters against a state
    that already holds its digests — fewer rows out, never duplicates."""
    batch = docs(spark, [(1, "aaa"), (2, "bbb")])
    assert ids(dedup.filter_batch(batch)) == [1, 2]
    assert ids(dedup.filter_batch(batch)) == []


def test_null_text_passes_through_unrecorded(spark, dedup):
    out = dedup.filter_batch(docs(spark, [(1, None), (2, "x")]))
    assert ids(out) == [1, 2]
    assert dedup.seen_count() == 1  # only 'x'
    out2 = dedup.filter_batch(docs(spark, [(3, None), (4, "x")]))
    assert ids(out2) == [3]  # NULL passes again; 'x' is seen


def test_compact_folds_state_without_changing_answers(spark, dedup):
    for i in range(4):
        dedup.filter_batch(docs(spark, [(i * 10 + j, f"t{i}-{j}") for j in range(5)]))
    before = dedup.seen_count()
    dedup.compact()
    assert dedup.seen_count() == before == 20
    # previously seen content still filtered after the rewrite
    assert ids(dedup.filter_batch(docs(spark, [(99, "t0-0"), (100, "fresh")]))) == [100]


def test_attach_drives_sink_per_microbatch(spark, dedup, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    docs(spark, [(1, "aaa"), (2, "aaa"), (3, "bbb")]).write.mode(
        "append"
    ).parquet(str(src))
    got = []
    stream = spark.readStream.schema(DOC).parquet(str(src))
    q = dedup.attach(
        stream,
        sink=lambda df, bid: got.extend(ids(df)),
        checkpointLocation=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == [1, 3]
    assert dedup.seen_count() == 2


def test_within_stream_watermark_dedup(spark, tmp_path):
    """The unbounded form through a real streaming query: duplicate content
    inside the lookback is dropped, distinct content kept."""
    src = tmp_path / "wm_src"
    src.mkdir()
    spark.createDataFrame(
        [
            ("2024-05-10 00:00:01", 1, "same text"),
            ("2024-05-10 00:00:02", 2, "same text"),
            ("2024-05-10 00:00:03", 3, "other text"),
        ],
        "ts_s string, doc_id long, text string",
    ).selectExpr(
        "CAST(ts_s AS TIMESTAMP) AS ts", "doc_id", "text"
    ).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(
        "ts timestamp, doc_id long, text string"
    ).parquet(str(src))
    out = dedup_within_stream(stream, "10 minutes", time_column="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("wm_dedup_out")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT doc_id FROM wm_dedup_out").collect()
    kept = sorted(r["doc_id"] for r in rows)
    assert len(kept) == 2 and 3 in kept  # one of {1,2} plus 3


# ----------------------------------------------------- near-dup corpus form
def ndocs(spark, rows):
    return spark.createDataFrame(rows, DOC)


BASE = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "falls gently on the quiet town and the lights flicker softly"
)


@pytest.fixture()
def near(spark, tmp_path):
    from datafusion_uwheel_spark.operators.stream_dedup import NearCorpusDedup

    return NearCorpusDedup(spark, str(tmp_path / "near"), n_buckets=8)


def test_near_batch_drops_rewrites_of_corpus(spark, near):
    out1 = near.filter_batch(ndocs(spark, [(1, BASE), (2, "completely different content about spacecraft navigation systems and orbital mechanics calculations")]))
    assert ids(out1) == [1, 2]
    # a re-crawl with a tweaked tail is NOT byte-identical but IS a
    # near-dup — the banded rule must drop it; fresh content survives
    out2 = near.filter_batch(
        ndocs(
            spark,
            [
                (10, BASE + " extra footer"),
                (11, "entirely new text describing deep sea creatures and their bioluminescent displays in the midnight zone"),
            ],
        )
    )
    assert ids(out2) == [11]


def test_near_within_batch_keeps_lowest(spark, near):
    out = near.filter_batch(
        ndocs(spark, [(5, BASE), (3, BASE + " tail"), (9, BASE + " tail two")])
    )
    assert ids(out) == [3]  # one survivor per near-dup cluster, lowest id


def test_near_replay_emits_nothing(spark, near):
    batch = ndocs(spark, [(1, BASE)])
    assert ids(near.filter_batch(batch)) == [1]
    assert ids(near.filter_batch(batch)) == []


def test_near_short_docs_pass_through(spark, near):
    out = near.filter_batch(ndocs(spark, [(1, "ab"), (2, BASE)]))
    assert ids(out) == [1, 2]
    out2 = near.filter_batch(ndocs(spark, [(3, "ab"), (4, BASE + " x")]))
    assert ids(out2) == [3]  # shingle-less doc passes again; near-dup drops


#: est ≈ 0.66 vs BASE with the pinned seed — collides on exactly one band
#: (so the pure LSH rule drops it) while clearly failing a 0.9 estimator
#: gate (so a verifying instance keeps it). Deterministic: seeded MinHash.
MID = BASE + " " + " ".join(f"word{i}" for i in range(10))


def test_near_verified_gate(spark, tmp_path):
    """min_est_jaccard verifies band collisions against stored signatures:
    the near-identical doc is dropped, while the mid-similarity doc that
    COLLIDES on a band (the pure rule would drop it — see the companion
    test) clears verification and survives."""
    from datafusion_uwheel_spark.operators.stream_dedup import NearCorpusDedup

    strict = NearCorpusDedup(
        spark, str(tmp_path / "v"), n_buckets=8, min_est_jaccard=0.9
    )
    strict.filter_batch(ndocs(spark, [(1, BASE)]))
    out = strict.filter_batch(
        ndocs(spark, [(10, BASE + " y"), (11, MID)])
    )
    got = ids(out)
    assert 10 not in got and 11 in got


def test_near_pure_rule_drops_band_collisions(spark, tmp_path):
    """The same mid-similarity doc through a rule-only instance IS dropped
    (band collision = decision), proving the estimator gate above is doing
    real verification work rather than vacuously passing."""
    from datafusion_uwheel_spark.operators.stream_dedup import NearCorpusDedup

    plain = NearCorpusDedup(spark, str(tmp_path / "r"), n_buckets=8)
    plain.filter_batch(ndocs(spark, [(1, BASE)]))
    assert ids(plain.filter_batch(ndocs(spark, [(11, MID)]))) == []


def test_near_rule_only_state_refuses_verification(spark, tmp_path):
    from datafusion_uwheel_spark.operators.stream_dedup import NearCorpusDedup

    plain = NearCorpusDedup(spark, str(tmp_path / "p"), n_buckets=8)
    plain.filter_batch(ndocs(spark, [(1, BASE)]))
    verifying = NearCorpusDedup(
        spark, str(tmp_path / "p"), n_buckets=8, min_est_jaccard=0.5
    )
    with pytest.raises(ValueError):
        verifying.filter_batch(ndocs(spark, [(2, BASE + " z")])).collect()


def test_near_compact_preserves_filtering(spark, near):
    for i in range(3):
        near.filter_batch(
            ndocs(spark, [(i * 10, BASE + f" round {i} marker")])
        )
    before = near.seen_bands()
    near.compact()
    assert near.seen_bands() == before
    # previously kept content still drops after the rewrite
    assert ids(near.filter_batch(ndocs(spark, [(99, BASE + " round 0 marker")]))) == []


def test_state_read_is_partition_pruned(spark, tmp_path):
    """The scale claim, held in the executed plan: a batch's anti-join
    reads ONLY the state buckets its own digests hash into
    (PartitionFilters on the bucket dirs), not the whole corpus state."""
    import re

    cd = CorpusDedup(spark, str(tmp_path / "pruned"), n_buckets=64)
    cd.filter_batch(
        docs(spark, [(i, f"doc number {i}") for i in range(500)])
    ).count()
    small = docs(spark, [(9001, "doc number 7"), (9002, "brand new")])
    digests = cd._digests(small).filter(F.col("digest").isNotNull())
    keep = digests.groupBy("digest", "bucket").agg(
        F.min("doc_id").alias("doc_id")
    )
    touched = [r["bucket"] for r in keep.select("bucket").distinct().collect()]
    pruned = cd._state().filter(F.col("bucket").isin(touched))
    plan = (
        keep.join(pruned, on="digest", how="left_anti")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1) and "IN" in m.group(1), plan[:800]


# ------------------------------------------------ two-phase prepare/commit
def test_prepare_without_commit_loses_nothing(spark, dedup):
    """Sink-failure path: state is NOT recorded at prepare time, so a
    replayed batch re-emits the same documents (at-least-once re-emission,
    never loss — ADVICE r5, stream_dedup.py:132)."""
    batch = docs(spark, [(1, "aaa"), (2, "bbb")])
    survivors, pending = dedup.prepare_batch(batch)
    assert ids(survivors) == [1, 2]
    assert dedup.seen_count() == 0  # nothing recorded yet
    # the sink "failed": no commit — the replay sees the docs as unseen
    replay, pending2 = dedup.prepare_batch(batch)
    assert ids(replay) == [1, 2]
    dedup.commit(pending2)
    assert dedup.seen_count() == 2
    assert ids(dedup.filter_batch(batch)) == []
    # committing the abandoned token twice is allowed and idempotent
    dedup.commit(pending)
    dedup.commit(pending)
    assert pending.committed


def test_attach_commits_after_sink_success(spark, dedup, tmp_path):
    """A sink that fails on its first attempt must see the batch's docs
    again on retry — attach commits state only after the sink returns."""
    src = tmp_path / "incoming2"
    src.mkdir()
    docs(spark, [(1, "aaa"), (2, "bbb")]).write.mode("append").parquet(
        str(src)
    )
    calls = {"n": 0}
    got = []

    def flaky_sink(df, bid):
        calls["n"] += 1
        emitted = ids(df)
        if calls["n"] == 1:
            raise RuntimeError("sink down")
        got.extend(emitted)

    stream = spark.readStream.schema(DOC).parquet(str(src))
    q = dedup.attach(
        stream,
        sink=flaky_sink,
        checkpointLocation=str(tmp_path / "ckpt2"),
    )
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    assert dedup.seen_count() == 0  # failed sink → no state recorded
    # restart from the checkpoint: the batch replays in full
    q2 = dedup.attach(
        spark.readStream.schema(DOC).parquet(str(src)),
        sink=flaky_sink,
        checkpointLocation=str(tmp_path / "ckpt2"),
    )
    q2.processAllAvailable()
    q2.stop()
    assert sorted(got) == [1, 2]
    assert dedup.seen_count() == 2


def test_near_prepare_without_commit_loses_nothing(spark, near):
    batch = ndocs(spark, [(1, BASE)])
    survivors, pending = near.prepare_batch(batch)
    assert ids(survivors) == [1]
    assert near.seen_bands() == 0
    replay, pending2 = near.prepare_batch(batch)
    assert ids(replay) == [1]  # nothing lost
    near.commit(pending2)
    assert near.seen_bands() > 0
    assert ids(near.filter_batch(ndocs(spark, [(9, BASE + " x")]))) == []
