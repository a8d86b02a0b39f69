"""A monitoring/retention dashboard over the driver testdata, composed
entirely from index state: routed range aggregates, zero-job NULL/value
drift monitors, HLL distinct estimates, theta set-algebra retention, and
tiered compaction keeping the index bounded — the queries a product
dashboard refreshes every minute, none of which should scan a 100 TB
table.

Run: ``python examples/retention_dashboard.py`` (env ``SPARK_GRAFT_SF_DIR``
to point at a larger SF).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from datafusion_uwheel_spark import WheelEngine, get_spark

    spark = get_spark("retention-dashboard", master="local[8]", shuffle_partitions=8)
    eng = WheelEngine(
        spark,
        "events",
        f"{SF_DIR}/events.parquet",
        time_column="ts",
        min_max_columns=("value",),
    )
    eng.build_index("value")
    eng.build_distinct_index("user_id")  # HLL: range distinct estimates
    eng.build_theta_index("user_id")  # theta: set algebra across ranges

    W1 = ("2024-01-01 00:00:00", "2024-01-08 00:00:00")
    W2 = ("2024-01-08 00:00:00", "2024-01-15 00:00:00")

    # -- the per-refresh dashboard tiles: all zero-job or one tiny job ----
    t0 = time.perf_counter()
    traffic = eng.sql(
        "SELECT COUNT(*) AS n, AVG(value) AS avg_v FROM events "
        f"WHERE ts >= '{W2[0]}' AND ts < '{W2[1]}'"
    ).collect()[0]
    assert eng.last_route.kind == "multi_agg"  # routed, no scan
    nulls = eng.null_stats("value")  # zero jobs: wheel states only
    envelope = eng.value_range_by("value", "day")  # per-day MIN/MAX drift
    dau = eng.approx_distinct_by("user_id", "day")  # HLL group-by
    retained = eng.approx_retained("user_id", W1, W2)
    new_users = eng.approx_new("user_id", W1, W2)
    churned = eng.approx_new("user_id", W2, W1)
    series = eng.theta_retention_by("user_id", "week").collect()
    dt = time.perf_counter() - t0

    print(
        f"week 2: {traffic['n']} events, avg value {traffic['avg_v']:.2f}; "
        f"value NULL ratio {nulls['null_ratio']:.3f}"
    )
    print(
        f"retention: {retained} retained, {new_users} new, {churned} churned "
        f"(week 1 -> 2)"
    )
    print(
        "weekly series: "
        + ", ".join(
            f"{r['period'].date()}: {r['n_curr']}"
            + (f" ({r['retention']:.0%} retained)" if r["retention"] is not None else "")
            for r in series
        )
    )
    print(
        f"daily active users: {dau.count()} days; "
        f"value envelope rows: {envelope.count()}"
    )
    print(f"dashboard refresh: {dt:.2f}s for all tiles")

    # -- retention keeps the index bounded without changing answers -------
    before = eng.index_usage_bytes()
    before_n = eng.sql(
        "SELECT COUNT(*) AS n FROM events "
        f"WHERE ts >= '{W1[0]}' AND ts < '{W1[1]}'"
    ).collect()[0]["n"]
    reclaimed = eng.compact_indexes("2024-02-01 00:00:00", "hour")
    after_n = eng.sql(
        "SELECT COUNT(*) AS n FROM events "
        f"WHERE ts >= '{W1[0]}' AND ts < '{W1[1]}'"
    ).collect()[0]["n"]
    assert eng.last_route.kind == "count_range"  # still routed, coarser tier
    assert after_n == before_n  # monoid states: identical answers
    print(
        f"compacted {reclaimed} buckets to hour tiers: index "
        f"{before / 1e3:.0f} KB -> {eng.index_usage_bytes() / 1e3:.0f} KB, "
        "answers unchanged"
    )
    print("OK retention dashboard")


if __name__ == "__main__":
    main()
