"""In-memory table walkthrough — the PySpark counterpart of the reference's
``examples/memtable`` (``/root/reference/examples/memtable/src/main.rs``):
build a tiny in-memory table, index it, and watch a temporal COUNT(*) get
answered at plan time (zero Spark jobs) instead of scanned.

Run:  python examples/memtable.py
"""

from __future__ import annotations

import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from datafusion_uwheel_spark import WheelEngine, get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("uwheel-example-memtable", master="local[4]", shuffle_partitions=4)

    # 10 rows, one per second — the reference's create_memtable() fixture.
    rows = [(datetime(2024, 5, 10, 0, 0, i), float(i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "timestamp timestamp, agg_col double")

    # Builder::new("timestamp").with_name("my_table").build_with_provider(...)
    engine = WheelEngine(spark, "my_table", df, time_column="timestamp")
    engine.build_index("agg_col")

    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)

    out = engine.sql(
        "SELECT COUNT(*) AS cnt FROM my_table "
        "WHERE timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10'"
    )
    assert engine.last_route.kind == "count_range", engine.last_route
    n = out.collect()[0]["cnt"]
    assert n == 10
    assert tracker.getJobIdsForGroup(None) == before, "routed query must run no job"
    print(f"COUNT(*) over the range = {n} (answered from the wheel, zero Spark jobs)")

    # Anything outside the routable shapes delegates to stock Spark SQL.
    out = engine.sql("SELECT SUM(agg_col) AS s FROM my_table WHERE agg_col > 5")
    print(f"delegated query result = {out.collect()[0]['s']} (route: {engine.last_route.kind})")
    spark.stop()


if __name__ == "__main__":
    main()
