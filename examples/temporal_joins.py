"""Temporal-join walkthrough: sessionize → as-of enrich → range join — the
event-pipeline shapes the reference engine has no joins for (SURVEY.md §2.2
"explicitly absent"), each verified in-line against an independent check.

Pipeline over the driver-generated events table:

1. ``session_agg`` — gap-based sessions per user (native ``session_window``).
2. ``asof_join`` — enrich every event with the most recent per-type hourly
   rollup row (point-in-time correct: no peeking at the current hour).
3. ``range_join`` — count each user's events inside their own session
   intervals via the bucketized equi-join (must equal the session sizes).

Run:  python examples/temporal_joins.py [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_uwheel_spark import get_spark  # noqa: E402
from datafusion_uwheel_spark.operators import asof, rangejoin, sessions  # noqa: E402
from datafusion_uwheel_spark.sources import read_parquet  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
GAP = 1800.0


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:<44} {1e3 * (time.perf_counter() - t0):8.1f} ms")
    return out


def main() -> None:
    spark = get_spark("temporal-joins", master="local[8]", shuffle_partitions=8)
    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    n_events = ev.count()

    # 1. Sessions ----------------------------------------------------------
    sess = sessions.session_agg(ev, on="ts", by=("user_id",), gap=GAP)
    n_sessions, sess_events = timed(
        "session_agg (per-user, 30 min gap)",
        lambda: sess.agg(F.count(F.lit(1)), F.sum("n_events")).collect()[0],
    )
    assert sess_events == n_events, "every event belongs to exactly one session"
    print(f"    {n_events} events -> {n_sessions} sessions")

    # row-level labels agree with the native aggregate
    labeled = sessions.with_session_id(ev, on="ts", by=("user_id",), gap=GAP)
    n_labeled = timed(
        "with_session_id (row labels)",
        lambda: labeled.select("user_id", "session_id").distinct().count(),
    )
    assert n_labeled == n_sessions, (n_labeled, n_sessions)

    # 2. As-of enrichment --------------------------------------------------
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("ts"), "event_type"
    ).agg(F.avg("value").alias("hr_avg"))
    # shift forward one hour: the rollup for hour H becomes visible at H+1,
    # so the join is point-in-time correct (no leakage from the open hour)
    visible = hourly.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    enriched = asof.asof_join(
        ev.select("event_id", "ts", "event_type", "value"),
        visible,
        on="ts",
        by=("event_type",),
        how="left",
    )
    got = timed(
        "asof_join (latest completed hourly avg)",
        lambda: enriched.agg(
            F.count(F.lit(1)).alias("n"), F.count("hr_avg").alias("n_matched")
        ).collect()[0],
    )
    assert got["n"] == n_events
    assert 0 < got["n_matched"] < n_events  # first-hour events have no history
    # leakage check: the matched rollup hour strictly precedes the event's hour
    leak = enriched.filter(
        F.col("ts_r").isNotNull()
        & (F.col("ts_r") > F.date_trunc("hour", "ts"))
    ).count()
    assert leak == 0, f"{leak} rows joined an unfinished hour"

    # 3. Range join --------------------------------------------------------
    per_session = rangejoin.range_join(
        ev.select("event_id", "ts", "user_id"),
        sess,
        "ts",
        "session_start",
        "session_end",
        by=("user_id",),
        bucket=GAP,
        bounds="[]",
    )
    joined = timed(
        "range_join (events x own-session intervals)",
        lambda: per_session.count(),
    )
    assert joined == n_events, "each event falls in exactly its own session"
    print("OK: all invariants hold")


if __name__ == "__main__":
    main()
