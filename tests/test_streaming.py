"""Streaming maintenance tests: a file-source stream merged into the wheel
index must be indistinguishable from a fresh batch build over the union."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import types as T

from datafusion_uwheel_spark import WheelEngine
from datafusion_uwheel_spark.operators.lookup import WheelIndex
from datafusion_uwheel_spark.streaming import StreamingWheelMaintainer

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("v", T.DoubleType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)


def rows(sec_from, sec_to, kind="a"):
    return [
        (datetime(2024, 5, 10, 0, 0, 0) + __import__("datetime").timedelta(seconds=i), float(i + 1), kind)
        for i in range(sec_from, sec_to)
    ]


@pytest.fixture()
def stream_setup(spark, tmp_path):
    initial = spark.createDataFrame(rows(0, 10), SCHEMA)
    eng = WheelEngine(spark, "stream_tbl", initial, time_column="ts", min_max_columns=("v",))
    eng.build_index("v")
    eng.build_index("v", filter="kind = 'a'")
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    ckpt = tmp_path / "ckpt"
    return eng, str(stream_dir), str(ckpt)


def run_stream(spark, eng, stream_dir, ckpt, filters=None):
    maintainer = StreamingWheelMaintainer(eng, filters=filters)
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    q = maintainer.attach(stream, checkpoint=ckpt, trigger_once=True)
    q.awaitTermination(120)
    return maintainer


def test_stream_merge_extends_index(spark, stream_setup):
    eng, stream_dir, ckpt = stream_setup
    spark.createDataFrame(rows(10, 20), SCHEMA).write.mode("append").parquet(stream_dir)
    run_stream(spark, eng, stream_dir, ckpt)

    rng = "ts >= '2024-05-10 00:00:00' AND ts < '2024-05-10 00:00:20'"
    assert eng.sql(f"SELECT COUNT(*) AS c FROM stream_tbl WHERE {rng}").collect()[0][0] == 20
    assert eng.last_route.kind == "count_range"
    assert eng.sql(f"SELECT SUM(v) AS s FROM stream_tbl WHERE {rng}").collect()[0][0] == 210.0
    assert eng.sql(f"SELECT MAX(v) AS m FROM stream_tbl WHERE {rng}").collect()[0][0] == 20.0
    # landmark reflects merged data too (cache invalidated on merge)
    assert eng.sql("SELECT SUM(v) AS s FROM stream_tbl").collect()[0][0] == 210.0


def test_stream_merge_handles_late_overlapping_data(spark, stream_setup):
    eng, stream_dir, ckpt = stream_setup
    # late rows landing in ALREADY-OCCUPIED seconds 5..9 — monoid merge adds
    spark.createDataFrame(rows(5, 10), SCHEMA).write.mode("append").parquet(stream_dir)
    run_stream(spark, eng, stream_dir, ckpt)
    rng = "ts >= '2024-05-10 00:00:00' AND ts < '2024-05-10 00:00:10'"
    assert eng.sql(f"SELECT COUNT(*) AS c FROM stream_tbl WHERE {rng}").collect()[0][0] == 15
    want = sum(range(1, 11)) + sum(range(6, 11))
    assert eng.sql(f"SELECT SUM(v) AS s FROM stream_tbl WHERE {rng}").collect()[0][0] == float(want)


def test_stream_merge_keyed_wheel(spark, stream_setup):
    eng, stream_dir, ckpt = stream_setup
    mixed = rows(10, 15, kind="a") + rows(15, 20, kind="b")
    spark.createDataFrame(mixed, SCHEMA).write.mode("append").parquet(stream_dir)
    run_stream(spark, eng, stream_dir, ckpt, filters={"kind = 'a'": "kind = 'a'"})
    rng = "ts >= '2024-05-10 00:00:00' AND ts < '2024-05-10 00:00:20'"
    df = eng.sql(f"SELECT SUM(v) AS s FROM stream_tbl WHERE {rng} AND kind = 'a'")
    assert eng.last_route.kind == "single_agg"
    want = float(sum(range(1, 11)) + sum(range(11, 16)))  # initial + streamed 'a' rows
    assert df.collect()[0][0] == want


def test_stream_merge_spark_backend(spark, tmp_path):
    # the Spark-backed rollup wheel merges micro-batches as DataFrame unions
    initial = spark.createDataFrame(rows(0, 10), SCHEMA)
    eng = WheelEngine(
        spark, "stream_spk", initial, time_column="ts", index_backend="spark"
    )
    eng.build_index("v")
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    spark.createDataFrame(rows(5, 20), SCHEMA).write.mode("append").parquet(str(stream_dir))
    run_stream(spark, eng, str(stream_dir), str(tmp_path / "ck"))

    rng = "ts >= '2024-05-10 00:00:00' AND ts < '2024-05-10 00:00:20'"
    assert eng.sql(f"SELECT COUNT(*) AS c FROM stream_spk WHERE {rng}").collect()[0][0] == 25
    assert eng.last_route.kind == "count_range"
    want = float(sum(range(1, 11)) + sum(range(6, 21)))
    assert eng.sql(f"SELECT SUM(v) AS s FROM stream_spk WHERE {rng}").collect()[0][0] == want
    assert eng.sql("SELECT MAX(v) AS m FROM stream_spk").collect()[0][0] == 20.0


def test_merge_delta_min_max_and_bounds():
    w = WheelIndex(
        "t", "v", "*_AGG",
        secs=np.array([100, 101]), cnt=np.array([1, 1]),
        sum_=np.array([5.0, 7.0]), min_=np.array([5.0, 7.0]), max_=np.array([5.0, 7.0]),
        min_ts_us=100_000_000, max_ts_us=101_000_000, complete=True,
    )
    w.merge_delta(
        np.array([101, 103]), np.array([2, 1]),
        np.array([3.0, 9.0]), np.array([1.0, 9.0]), np.array([2.0, 9.0]),
        min_ts_us=101_000_000, max_ts_us=103_500_000,
    )
    assert list(w.secs) == [100, 101, 103]
    assert list(w.cnt) == [1, 3, 1]
    got = w.combine_range(100, 104)
    want = {"count": 5, "sum": 24.0, "min": 1.0, "max": 9.0, "avg": 24.0 / 5}
    assert {k: got[k] for k in want} == want
    # no sumsq state on this wheel → variance keys absent (router delegates
    # instead of mis-answering NULL)
    assert "var_pop" not in got and "stddev_samp" not in got
    assert w.max_ts_us == 103_500_000
    assert w.count_range(103, 104) == 1


def test_merge_delta_missing_state_drops_not_corrupts():
    """A delta that omits a value state the wheel carries must DROP that
    state (queries delegate) — never leave the old array misaligned with the
    widened secs axis (ADVICE r2: silent wrong slice lookups)."""
    w = WheelIndex(
        "t", "v", "*_AGG",
        secs=np.array([100, 101]), cnt=np.array([1, 1]),
        sum_=np.array([5.0, 7.0]), min_=np.array([5.0, 7.0]), max_=np.array([5.0, 7.0]),
        min_ts_us=100_000_000, max_ts_us=101_000_000, complete=True,
    )
    # delta carries only counts — no sum/min/max
    w.merge_delta(np.array([103]), np.array([2]), min_ts_us=103_000_000, max_ts_us=103_000_000)
    assert w.sum_ is None and w.min_ is None and w.max_ is None
    assert list(w.secs) == [100, 101, 103]
    got = w.combine_range(100, 104)
    assert got["count"] == 4
    # value keys absent → the router delegates instead of answering from
    # misaligned arrays
    assert "sum" not in got and "min" not in got and "max" not in got


def test_merge_at_states_incomplete_delta_drops_tracking():
    """A delta whose at-states carry 'cnt' but miss a tracked value key must
    drop at-start tracking up front — not raise mid-merge with at_cnt_
    already widened (ADVICE r2: partial merge)."""
    w = WheelIndex(
        "t", "v", "*_AGG",
        secs=np.array([100]), cnt=np.array([2]),
        sum_=np.array([5.0]),
        min_ts_us=100_000_000, max_ts_us=100_500_000, complete=True,
        at_secs_=np.array([100]), at_cnt_=np.array([1]), at_vcnt_=np.array([1]),
        at_sum_=np.array([3.0]),
    )
    before_cnt = w.at_cnt_.copy() if w.at_cnt_ is not None else None
    w.merge_delta(
        np.array([101]), np.array([1]), np.array([4.0]),
        min_ts_us=101_000_000, max_ts_us=101_000_000,
        at_states={"cnt": np.array([1])},  # 'sum' missing while at_sum_ tracked
    )
    assert w.at_secs_ is None and w.at_cnt_ is None and w.at_sum_ is None
    assert not w.tracks_at_start
    # the base states still merged consistently
    assert list(w.secs) == [100, 101]
    assert w.combine_range(100, 102)["sum"] == 9.0
    del before_cnt


# ---------------------------------------------------------- ANN maintenance
EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
    ]
)


def _vecs(lo, hi, dim=8, seed=7):
    import random

    rng = random.Random(seed)
    out = []
    for i in range(lo, hi):
        rng.seed(seed + i)
        out.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    return out


def test_stream_ann_maintenance_matches_batch_build(spark, tmp_path):
    """File-source stream appended into registered ANN indexes must probe
    identically to a one-shot build over the union (same pinned params)."""
    from datafusion_uwheel_spark import SimilarityEngine
    from datafusion_uwheel_spark.operators import similarity
    from datafusion_uwheel_spark.streaming import StreamingAnnMaintainer

    dim = 8
    initial = spark.createDataFrame(_vecs(0, 60, dim), EMB_SCHEMA)
    full = spark.createDataFrame(_vecs(0, 100, dim), EMB_SCHEMA)
    eng = SimilarityEngine(
        spark, "stream_emb", initial, dim=dim, index_root=str(tmp_path / "idx")
    )
    eng.build_index(kind="lsh", bits=4, tables=2)
    eng.build_index(kind="ivf", n_centroids=4)

    stream_dir = tmp_path / "emb_incoming"
    stream_dir.mkdir()
    spark.createDataFrame(_vecs(60, 100, dim), EMB_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(stream_dir))
    stream = spark.readStream.schema(EMB_SCHEMA).parquet(str(stream_dir))
    q = StreamingAnnMaintainer(eng).attach(
        stream, checkpoint=str(tmp_path / "emb_ckpt"), trigger_once=True
    )
    q.awaitTermination(120)

    query = _vecs(0, 1, dim)[0][1]
    got = eng.topk(query, k=10, kind="lsh", bits=4, tables=2).collect()
    assert eng.last_route.kind == "indexed"
    want = similarity.ann_topk(full, query, k=10, bits=4, tables=2).collect()
    assert got == want
    got_ivf = eng.topk(query, k=10, kind="ivf", nprobe=2, n_centroids=4).collect()
    want_ivf = similarity.ivf_topk(full, query, k=10, nprobe=2, n_centroids=4).collect()
    assert got_ivf == want_ivf


def test_stream_ann_dedup_ids_drops_replayed_rows(spark, tmp_path):
    from datafusion_uwheel_spark import SimilarityEngine
    from datafusion_uwheel_spark.streaming import StreamingAnnMaintainer

    dim = 8
    initial = spark.createDataFrame(_vecs(0, 50, dim), EMB_SCHEMA)
    eng = SimilarityEngine(
        spark, "stream_emb2", initial, dim=dim, index_root=str(tmp_path / "idx2")
    )
    idx = eng.build_index(kind="lsh", bits=4, tables=2)
    m = StreamingAnnMaintainer(eng, dedup_ids=True)
    # replay of already-indexed ids + genuinely new ones
    batch = spark.createDataFrame(_vecs(40, 70, dim), EMB_SCHEMA)
    m.merge_batch(batch)
    stored = idx._df.select("vec_id").distinct().count()
    assert stored == 70  # 0..69 exactly once, replayed 40..49 not duplicated
    total_rows = idx._df.count()
    assert total_rows == 70 * eng.indexes[("lsh", 4, 2, 42)].m["tables"]


# ------------------------------------------- stateful per-key caps (r6)
def test_stream_cap_per_key(spark, tmp_path):
    """applyInPandasWithState-backed ingestion cap: a hot key admits at
    most max_rows rows over the stream's LIFETIME (state = one counter per
    key), cold keys pass whole; the cap carries across micro-batches."""
    from datafusion_uwheel_spark.streaming import stream_cap_per_key

    src = tmp_path / "cap_src"
    src.mkdir()
    schema = "doc_id long, source string"

    def write_batch(rows):
        # ONE part-file per append: a file is atomic to the file-stream
        # source, so the rows cannot split across micro-batches — under
        # full-suite load a multi-part append sometimes did, and the
        # order_by assertion below (which admits the lowest doc_ids of
        # ONE micro-batch's flood) flaked while the cap itself held
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    # batch 1: hot=8 rows, cold=2
    write_batch([(i, "hot") for i in range(8)] + [(100, "cold"), (101, "cold")])
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = stream_cap_per_key(stream, "source", 12, order_by="doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("cap_out")
        .option("checkpointLocation", str(tmp_path / "cap_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.sql("SELECT source, count(*) AS n FROM cap_out GROUP BY 1").collect()
        assert {r["source"]: r["n"] for r in got1} == {"hot": 8, "cold": 2}
        # batch 2: hot floods 10 more — only 4 admit (8 + 4 = 12 cap)
        write_batch([(200 + i, "hot") for i in range(10)] + [(300, "cold")])
        q.processAllAvailable()
        got2 = {
            r["source"]: r["n"]
            for r in spark.sql(
                "SELECT source, count(*) AS n FROM cap_out GROUP BY 1"
            ).collect()
        }
        assert got2 == {"hot": 12, "cold": 3}
        # order_by admitted the LOWEST doc_ids of batch 2's flood
        hot2 = sorted(
            r["doc_id"]
            for r in spark.sql(
                "SELECT doc_id FROM cap_out WHERE doc_id >= 200 AND source = 'hot'"
            ).collect()
        )
        assert hot2 == [200, 201, 202, 203]
    finally:
        q.stop()


def test_stream_cap_validation(spark):
    from datafusion_uwheel_spark.streaming import stream_cap_per_key

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="max_rows"):
        stream_cap_per_key(df, "source", 0)
    with pytest.raises(ValueError, match="key column"):
        stream_cap_per_key(df, "nope", 5)


def test_stream_cap_order_spans_arrow_chunks(spark, tmp_path):
    """order_by must rank across the WHOLE micro-batch group, not per
    Arrow chunk (r6 review finding): with maxRecordsPerBatch=3 a 10-row
    group splits into chunks, and the globally-best rows must still win."""
    from datafusion_uwheel_spark.streaming import stream_cap_per_key

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        src = tmp_path / "chunk_src"
        src.mkdir()
        # best (lowest rank) rows LAST so a per-chunk sort would miss them
        rows = [(i, "hot", 100 - i) for i in range(10)]
        spark.createDataFrame(
            rows, "doc_id long, source string, rank long"
        ).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(
            "doc_id long, source string, rank long"
        ).parquet(str(src))
        out = stream_cap_per_key(stream, "source", 4, order_by="rank")
        q = (
            out.writeStream.format("memory")
            .queryName("chunk_cap_out")
            .option("checkpointLocation", str(tmp_path / "chunk_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            kept = sorted(
                r["doc_id"]
                for r in spark.sql("SELECT doc_id FROM chunk_cap_out").collect()
            )
            # lowest rank = highest doc_id: 6..9 must win regardless of
            # which Arrow chunk carried them
            assert kept == [6, 7, 8, 9], kept
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_stream_cap_incremental_fold_equals_whole_group_sort():
    """Incremental stable top-k (r7: the order_by path no longer buffers
    the whole group) must be BYTE-IDENTICAL to the old semantics — one
    stable mergesort of the concatenated chunks, take budget — including
    boundary ties, for every chunking. Pinned as a pandas-level property
    over random chunk splits and tie-heavy data."""
    import random

    import pandas as pd

    rng = random.Random(42)
    for trial in range(50):
        n_rows = rng.randint(1, 40)
        budget = rng.randint(1, 12)
        # heavy ties: ranks drawn from a tiny alphabet
        df = pd.DataFrame(
            {
                "doc_id": range(n_rows),
                "rank": [rng.randint(0, 4) for _ in range(n_rows)],
            }
        )
        # random chunking preserving order (what Arrow delivery does
        # within one group iterator)
        cuts = sorted(rng.sample(range(1, n_rows), min(rng.randint(0, 5), n_rows - 1))) if n_rows > 1 else []
        bounds = [0, *cuts, n_rows]
        chunks = [df.iloc[a:b] for a, b in zip(bounds, bounds[1:])]
        # reference: whole-group stable sort, take budget
        want = (
            pd.concat(chunks).sort_values("rank", kind="mergesort").iloc[:budget]
        )
        # the operator's fold
        kept = None
        for pdf in chunks:
            both = pdf if kept is None else pd.concat([kept, pdf])
            kept = both.sort_values("rank", kind="mergesort").iloc[:budget]
        assert kept["doc_id"].tolist() == want["doc_id"].tolist(), (
            trial, bounds, budget,
        )
