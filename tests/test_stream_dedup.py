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
