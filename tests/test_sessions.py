"""Sessionization: row-level gap-and-islands labels ≡ native session_window
aggregates ≡ DuckDB gap-and-islands oracle."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators.sessions import session_agg, with_session_id

BASE = datetime(2024, 3, 1)
GAP = 300.0  # 5 minutes


@pytest.fixture(scope="module")
def events(spark):
    rng = random.Random(7)
    rows = []
    for user in range(8):
        t = 0
        for _ in range(rng.randrange(20, 60)):
            # mix of intra-session jitter and > gap silences; include exact-gap
            # boundaries to pin the strict-inequality merge rule
            t += rng.choice([1, 5, 30, 100, 250, 300, 301, 900])
            rows.append((f"u{user}", BASE + timedelta(seconds=t)))
    return spark.createDataFrame(rows, "user string, ts timestamp"), pd.DataFrame(
        rows, columns=["user", "ts"]
    )


def _stats_from_labels(labeled):
    return (
        labeled.groupBy("user", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )


def test_labels_match_native_session_window(events):
    df, _ = events
    labeled = with_session_id(df, on="ts", by=("user",), gap=GAP)
    got = sorted(
        (r["user"], r["session_start"], r["session_end"], r["n_events"])
        for r in _stats_from_labels(labeled)
    )
    native = sorted(
        (r["user"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_agg(df, on="ts", by=("user",), gap=GAP).collect()
    )
    assert got == native and len(got) > 8


def test_session_ids_are_dense_ordinals(events):
    df, _ = events
    labeled = with_session_id(df, on="ts", by=("user",), gap=GAP)
    per_user = (
        labeled.groupBy("user")
        .agg(
            F.min("session_id").alias("lo"),
            F.max("session_id").alias("hi"),
            F.countDistinct("session_id").alias("n"),
        )
        .collect()
    )
    for r in per_user:
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1


def test_matches_duckdb_gap_and_islands(events):
    df, pdf = events
    got = sorted(
        (r["user"], r["session_start"], r["session_end"], r["n_events"], r["duration_sec"])
        for r in session_agg(df, on="ts", by=("user",), gap=GAP).collect()
    )
    con = duckdb.connect()
    con.register("e", pdf)
    want = con.sql(
        """
        WITH d AS (
          SELECT user, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 300 SECOND
                      THEN 1 ELSE 0 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user ORDER BY ts)
        ), s AS (
          SELECT user, ts,
                 SUM(is_new) OVER (PARTITION BY user ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM d
        )
        SELECT user, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               EXTRACT(EPOCH FROM MAX(ts) - MIN(ts)) AS duration_sec
        FROM s GROUP BY user, sid
        """
    ).fetchall()
    assert got == sorted((u, a, b, int(n), float(d)) for u, a, b, n, d in want)


def test_exact_gap_merges(spark):
    # Spark's session_window merges touching windows: events exactly GAP
    # apart share a session; one second past the gap splits.
    df = spark.createDataFrame(
        [(BASE + timedelta(seconds=int(i * GAP)),) for i in range(3)], "ts timestamp"
    )
    labeled = with_session_id(df, on="ts", gap=GAP)
    assert [r["session_id"] for r in labeled.orderBy("ts").collect()] == [0, 0, 0]
    assert session_agg(df, on="ts", gap=GAP).count() == 1
    df2 = spark.createDataFrame(
        [(BASE + timedelta(seconds=int(i * (GAP + 1))),) for i in range(3)],
        "ts timestamp",
    )
    assert session_agg(df2, on="ts", gap=GAP).count() == 3


def test_validation(events, spark):
    df, _ = events
    with pytest.raises(ValueError, match="gap"):
        with_session_id(df, gap=0)
    with pytest.raises(ValueError, match="gap"):
        session_agg(df, gap=-1)
    with pytest.raises(ValueError, match="already exists"):
        with_session_id(with_session_id(df, by=("user",)), by=("user",))


def test_streaming_session_agg_emits_closed_sessions(spark, tmp_path):
    """Append-mode streaming sessionization: a session is emitted exactly
    once, when the watermark passes its close; emitted rows equal the batch
    session_agg over the same data."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    stream_dir = tmp_path / "sess_in"
    stream_dir.mkdir()
    ckpt = str(tmp_path / "sess_ckpt")
    emitted = []

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(stream_dir))
        agg = session_agg(stream, on="ts", by=("user",), gap=60.0, watermark="0 seconds")
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda bdf, _bid: emitted.extend(bdf.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    chunk1 = [
        ("u1", BASE + timedelta(seconds=s)) for s in (0, 10, 30)      # one session
    ] + [
        ("u1", BASE + timedelta(seconds=s)) for s in (300, 310)       # second session
    ] + [
        ("u2", BASE + timedelta(seconds=s)) for s in (5, 100)         # two sessions
    ]
    spark.createDataFrame(chunk1, schema).write.mode("append").parquet(str(stream_dir))
    run_once()  # state only — nothing can be emitted before the watermark moves

    # far-future chunk pushes the watermark past every chunk1 session close
    spark.createDataFrame(
        [("u3", BASE + timedelta(days=1))], schema
    ).write.mode("append").parquet(str(stream_dir))
    run_once()

    got = sorted(
        (r["user"], r["session_start"], r["session_end"], r["n_events"], r["duration_sec"])
        for r in emitted
    )
    want = sorted(
        (r["user"], r["session_start"], r["session_end"], r["n_events"], r["duration_sec"])
        for r in session_agg(
            spark.createDataFrame(chunk1, schema), on="ts", by=("user",), gap=60.0
        ).collect()
    )
    assert got == want and len(got) == 4
