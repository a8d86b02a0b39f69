"""Streaming index maintenance end-to-end: wheels AND ANN stay fresh as
micro-batches land, with no rebuild.

Flow: build indexes over an initial snapshot → start Structured Streaming
maintenance (file-source here; any readStream source works) → land new
parquet → both index families answer over the union:

* wheels: per-batch per-second partials merged into the driver index
  (monoid states — late data just merges; `StreamingWheelMaintainer`),
* ANN: the batch's vectors hashed with each index's pinned parameters and
  appended into the partition layout (`StreamingAnnMaintainer`).

Run:  python examples/streaming_maintenance.py
"""

from __future__ import annotations

import random
import sys
import tempfile
from datetime import datetime, timedelta
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from datafusion_uwheel_spark import SimilarityEngine, WheelEngine, get_spark  # noqa: E402
from datafusion_uwheel_spark.streaming import (  # noqa: E402
    StreamingAnnMaintainer,
    StreamingWheelMaintainer,
)

DIM = 16


def main() -> None:
    spark = get_spark("streaming-maintenance", master="local[4]", shuffle_partitions=4)
    root = Path(tempfile.mkdtemp(prefix="stream_maint_"))
    rng = random.Random(11)

    def event_rows(lo, hi):
        base = datetime(2024, 6, 1)
        return [
            (base + timedelta(seconds=i), float(i % 97), i, [rng.uniform(-1, 1) for _ in range(DIM)])
            for i in range(lo, hi)
        ]

    schema = "ts timestamp, v double, vec_id long, embedding array<double>"
    initial = spark.createDataFrame(event_rows(0, 600), schema)

    # ---- build both index families over the snapshot
    eng = WheelEngine(spark, "stream_events", initial, time_column="ts")
    eng.build_index("v")
    sim = SimilarityEngine(
        spark, "stream_events", initial, dim=DIM, index_root=str(root / "ann")
    )
    sim.build_index(kind="lsh", bits=4, tables=2)

    full_sql = "SELECT COUNT(*) AS n, SUM(v) AS s FROM stream_events WHERE " \
        "ts >= '2024-06-01 00:00:00' AND ts < '2024-06-01 00:20:00'"
    before = eng.sql(full_sql).collect()[0]
    print(f"before stream: n={before['n']} sum={before['s']:.1f} "
          f"(route={eng.last_route.kind})")

    # ---- stream: a micro-batch of new rows lands as parquet
    incoming = root / "incoming"
    incoming.mkdir()
    new_rows = event_rows(600, 900)
    spark.createDataFrame(new_rows, schema).write.mode("append").parquet(
        str(incoming)
    )

    stream = spark.readStream.schema(initial.schema).parquet(str(incoming))
    wq = StreamingWheelMaintainer(eng).attach(
        stream.select("ts", "v"), checkpoint=str(root / "ck_wheel"), trigger_once=True
    )
    aq = StreamingAnnMaintainer(sim).attach(
        stream.select("vec_id", "embedding"),
        checkpoint=str(root / "ck_ann"),
        trigger_once=True,
    )
    wq.awaitTermination(120)
    aq.awaitTermination(120)

    after = eng.sql(full_sql).collect()[0]
    print(f"after stream:  n={after['n']} sum={after['s']:.1f} "
          f"(route={eng.last_route.kind}, zero rebuild)")
    assert after["n"] == before["n"] + 300

    streamed_vec = new_rows[-1][3]  # the embedding that arrived via the stream
    top = sim.topk(streamed_vec, k=3, kind="lsh", bits=4, tables=2).collect()
    assert sim.last_route.kind == "indexed"
    assert top[0]["vec_id"] == new_rows[-1][2] and top[0]["sim"] == 1.0
    print(f"ANN probe sees streamed vector: top1={top[0]['vec_id']} "
          f"(sim={top[0]['sim']}) — appended generation, no rebuild")


if __name__ == "__main__":
    main()
