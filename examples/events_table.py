"""End-to-end tour on a real parquet table — the PySpark counterpart of the
reference's ``examples/nyc_taxi`` (``/root/reference/examples/nyc_taxi/src/main.rs``),
using the driver-generated events table instead of the taxi dataset:
count/sum/keyed/group-by rewrites, BETWEEN boundaries, landmark, index
persistence, and a materialized ANN index over the embeddings table.

Run:  python examples/events_table.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from datafusion_uwheel_spark import WheelEngine, get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:<38} {1e3 * (time.perf_counter() - t0):8.1f} ms")
    return out


def main() -> None:
    spark = get_spark("uwheel-example-events", master="local[8]", shuffle_partitions=8)

    # events.ts is parquet TIMESTAMP(NANOS) — WheelEngine normalizes via
    # sources.read_parquet when given a path.
    engine = timed(
        "engine + COUNT/value/keyed index build",
        lambda: _build(spark),
    )

    r = "ts >= '2024-01-05 00:00:00' AND ts < '2024-01-12 00:00:00'"
    queries = [
        ("COUNT range (wheel)", f"SELECT COUNT(*) AS n FROM events WHERE {r}"),
        ("multi-agg (wheel)",
         f"SELECT COUNT(*) AS n, SUM(value) AS s, AVG(value) AS a FROM events WHERE {r}"),
        ("keyed SUM (wheel)",
         f"SELECT SUM(value) AS s FROM events WHERE {r} AND event_type = 'click'"),
        ("GROUP BY hour (wheel)",
         "SELECT date_trunc('hour', ts) AS b, COUNT(*) AS n FROM events "
         f"WHERE {r} GROUP BY date_trunc('hour', ts)"),
        ("BETWEEN boundaries (wheel + sliver)",
         "SELECT COUNT(*) AS n FROM events "
         "WHERE ts BETWEEN '2024-01-05 00:00:00' AND '2024-01-11 23:59:59'"),
        ("HAVING + ORDER BY (wheel)",
         "SELECT date_trunc('hour', ts) AS b, AVG(value) AS a FROM events "
         f"WHERE {r} GROUP BY date_trunc('hour', ts) HAVING AVG(value) > 50 ORDER BY b"),
        ("OR of two windows (wheel)",
         "SELECT COUNT(*) AS n FROM events WHERE "
         "(ts >= '2024-01-05 00:00:00' AND ts < '2024-01-06 00:00:00') OR "
         "(ts >= '2024-01-15 00:00:00' AND ts < '2024-01-16 00:00:00')"),
        ("point instant ts = x (wheel)",
         "SELECT COUNT(*) AS n FROM events WHERE ts = '2024-01-05 00:00:00'"),
        ("landmark (no filter, wheel)", "SELECT SUM(value) AS s FROM events"),
        ("window rank (delegated to Catalyst)",
         "SELECT user_id, rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS rk "
         f"FROM events WHERE {r} LIMIT 5"),
    ]
    for label, sql in queries:
        rows = timed(label, lambda s=sql: engine.sql(s).collect())
        print(f"    route={engine.last_route.kind:<12} rows={len(rows)}")

    # Partitioned wheel family (r4): one scan → every per-event_type query
    # family — dim group-bys, keyed equality/IN, categorical rollups, exact
    # COUNT(DISTINCT).
    timed(
        "build_partitioned_index(event_type)",
        lambda: engine.build_partitioned_index("value", partition_by="event_type"),
    )
    for label, sql in [
        ("GROUP BY hour x event_type (family)",
         "SELECT date_trunc('hour', ts) AS b, event_type AS et, COUNT(*) AS n, "
         f"SUM(value) AS s FROM events WHERE {r} "
         "GROUP BY date_trunc('hour', ts), event_type"),
        ("keys-only GROUP BY (family)",
         f"SELECT event_type AS et, COUNT(*) AS n, AVG(value) AS a "
         f"FROM events WHERE {r} GROUP BY event_type"),
        ("IN over two keys (family)",
         f"SELECT COUNT(*) AS n, SUM(value) AS s FROM events WHERE {r} "
         "AND event_type IN ('click', 'view')"),
        ("exact COUNT(DISTINCT event_type) (family)",
         f"SELECT COUNT(DISTINCT event_type) AS n FROM events WHERE {r}"),
        ("SELECT DISTINCT event_type (family)",
         f"SELECT DISTINCT event_type FROM events WHERE {r}"),
    ]:
        rows = timed(label, lambda s=sql: engine.sql(s).collect())
        assert engine.last_route.rewritten, engine.last_route
        print(f"    route={engine.last_route.kind:<12} rows={len(rows)}")

    # Build-once index persistence: restart-free reloads.
    with tempfile.TemporaryDirectory() as d:
        timed("save_indexes (parquet rollups)", lambda: engine.save_indexes(d))
        timed(
            "reload engine from persisted indexes",
            lambda: WheelEngine(
                spark, "events", f"{SF_DIR}/events.parquet",
                time_column="ts", load_indexes=d,
            ),
        )

    # Sketch rollups (opt-in): COUNT(DISTINCT) and percentiles over any
    # aligned range in O(buckets) — per-bucket HLL / KLL sketches, mergeable
    # monoids, maintained by the same streaming hook as the wheels.
    timed("build HLL distinct rollup (one-time)",
          lambda: engine.build_distinct_index("user_id"))
    timed("build KLL quantile rollup (one-time)",
          lambda: engine.build_quantile_index("value"))
    a, b = "2024-01-05 00:00:00", "2024-01-12 00:00:00"
    est = timed("approx_distinct(user_id) over 7 days",
                lambda: engine.approx_distinct("user_id", a, b))
    p50, p95, p99 = timed(
        "approx_quantile(value, [.5,.95,.99]) — one merge job",
        lambda: engine.approx_quantile("value", [0.5, 0.95, 0.99], a, b),
    )
    print(f"    distinct users ≈ {est}; value p50={p50:.2f} p95={p95:.2f} p99={p99:.2f}")
    # Dimensional form: ONE keyed build answers per-segment percentiles.
    timed("build keyed KLL rollup (partition_by=event_type)",
          lambda: engine.build_quantile_index("value", partition_by="event_type"))
    rows = timed("approx_quantile_by_key(value, .95) per event_type",
                 lambda: engine.approx_quantile_by_key("value", 0.95, a, b).collect())
    print("    p95 by segment: " + ", ".join(
        f"{r[0]}={r['approx_quantile']:.1f}" for r in rows))

    # ANN over the embeddings table through the SimilarityEngine registry:
    # build once, and every topk() call routes to the partition-pruned
    # probe (falling back to query-time hashing only when no index matches).
    from datafusion_uwheel_spark import SimilarityEngine
    from datafusion_uwheel_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = 64
    query_vec = [((i * 37) % 100) / 100.0 - 0.5 for i in range(dim)]
    with tempfile.TemporaryDirectory() as d:
        sim = SimilarityEngine(spark, "embeddings", emb, dim=dim, index_root=d)
        timed("build LSH ANN index (one-time)",
              lambda: sim.build_index(kind="lsh", bits=4, tables=2))
        # warm both once (plan + codegen) — steady-state is what matters for
        # a probe-many index
        sim.topk(query_vec, k=5, kind="lsh", bits=4, tables=2).collect()
        assert sim.last_route.kind == "indexed", sim.last_route
        cosine_topk(emb, query_vec, k=5).collect()
        timed("ANN probe (engine-routed, partition-pruned)",
              lambda: sim.topk(query_vec, k=5, kind="lsh", bits=4, tables=2).collect())
        timed("brute-force top-k (full scan)",
              lambda: cosine_topk(emb, query_vec, k=5).collect())
        print(
            "    (probe vs brute crossover is scale-dependent: at tiny SFs the\n"
            "     fixed partitioned-read overhead dominates; at sf0.1+ the probe\n"
            "     wins and the gap grows with data — candidates scale as 1/2^bits)"
        )
    spark.stop()


def _build(spark):
    e = WheelEngine(
        spark, "events", f"{SF_DIR}/events.parquet",
        time_column="ts", min_max_columns=("value",),
    )
    e.build_index("value")
    e.build_index("value", filter="event_type = 'click'")
    return e


if __name__ == "__main__":
    main()
