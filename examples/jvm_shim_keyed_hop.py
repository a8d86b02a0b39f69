"""Deterministic probe for the shim's KEYED hopping-window rewrites (r7):
``GROUP BY window(ts, w, s)`` with a key equality in the WHERE clause —
the last documented plain-``spark.sql`` fall-through family. Aligned
bounds must rewrite via ``tryHop`` (per-value keyed view, or the dim
family filtered to the value), boundary bounds via ``tryHopHybrid``
(keyed/dim core leg + key-filtered raw slivers), and every answer must
match the delegate scan row-for-row. Runs in a subprocess (the extensions
class must load with the JVM); see ``tests/test_jvm_shim.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

#: (sql, description, pure_rollup) — all must rewrite AND match the scan.
#: pure_rollup=True (the aligned tryHop cases) additionally asserts NO
#: table-file scan; hybrid cases legitimately scan tiny key-filtered
#: SLIVERS of the table alongside the rollup core, so only rollup
#: participation is asserted there (same check jvm_shim_hop_hybrid.py uses).
CASES = [
    (
        # aligned bounds + registered keyed view → tryHop off the keyed view
        "SELECT window(ts, '6 hours', '2 hours').start AS b, COUNT(*) AS n, "
        "SUM(value) AS s FROM events "
        "WHERE ts >= '2024-01-03 00:00:00' AND ts < '2024-01-08 00:00:00' "
        "AND event_type = 'click' "
        "GROUP BY window(ts, '6 hours', '2 hours')",
        "keyed view, aligned",
        True,
    ),
    (
        # a key value with NO per-value view → the dim family, filtered
        "SELECT window(ts, '1 hour', '30 minutes').start AS b, AVG(value) AS a "
        "FROM events "
        "WHERE ts >= '2024-01-03 00:00:00' AND ts < '2024-01-06 00:00:00' "
        "AND event_type = 'view' "
        "GROUP BY window(ts, '1 hour', '30 minutes')",
        "dim family, aligned",
        True,
    ),
    (
        # boundary ops + keyed → tryHopHybrid: keyed core + keyed slivers
        "SELECT window(ts, '6 hours', '3 hours').start AS b, COUNT(*) AS n, "
        "MAX(value) AS hi FROM events "
        "WHERE ts > '2024-01-03 00:00:00' AND ts <= '2024-01-08 00:00:00' "
        "AND event_type = 'click' "
        "GROUP BY window(ts, '6 hours', '3 hours')",
        "keyed hybrid, strict bounds",
        False,
    ),
    (
        # OR-of-ranges + dim-family key → hybrid with key-filtered legs
        "SELECT window(ts, '6 hours', '2 hours').end AS e, COUNT(value) AS c "
        "FROM events "
        "WHERE ((ts >= '2024-01-03 00:00:00' AND ts < '2024-01-04 00:00:00') "
        "OR (ts > '2024-01-05 00:00:00' AND ts <= '2024-01-06 00:00:00')) "
        "AND event_type = 'view' "
        "GROUP BY window(ts, '6 hours', '2 hours')",
        "dim hybrid, OR-of-ranges",
        False,
    ),
]

#: must NOT produce wrong answers when they fall through: unregistered key
#: column (no keyed/dim family) keeps the scan.
FALLTHROUGH = [
    "SELECT window(ts, '6 hours', '2 hours').start AS b, COUNT(*) AS n "
    "FROM events "
    "WHERE ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00' "
    "AND props = 'nope' "
    "GROUP BY window(ts, '6 hours', '2 hours')",
]


def rows_equal(xs, ys) -> bool:
    if len(xs) != len(ys):
        return False
    for x, y in zip(xs, ys):
        for u, v in zip(x, y):
            if isinstance(u, float) and isinstance(v, float):
                if abs(u - v) > 1e-9 * max(1.0, abs(u), abs(v)):
                    return False
            elif u != v:
                return False
    return True


def main() -> None:
    from pyspark.sql import SparkSession

    from datafusion_uwheel_spark import WheelEngine
    from datafusion_uwheel_spark.jvmshim import (
        build_shim_jar,
        register_agg_rollup,
        register_count_rollup,
        register_dim_rollup,
        register_keyed_agg_rollup,
        shim_builder_confs,
    )

    builder = (
        SparkSession.builder.appName("uwheel-shim-keyed-hop")
        .master("local[2]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
    )
    for k, v in shim_builder_confs(build_shim_jar()).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    eng = WheelEngine(spark, "events", f"{SF}/events.parquet", time_column="ts")
    register_count_rollup(spark, eng)
    eng.build_index("value")
    register_agg_rollup(spark, eng, "value")
    eng.build_index("value", filter="event_type = 'click'")
    register_keyed_agg_rollup(spark, eng, "value", "event_type = 'click'")
    eng.build_partitioned_index("value", partition_by="event_type")
    register_dim_rollup(spark, eng, "event_type")
    tables_conf = spark.conf.get("spark.uwheel.shim.tables")

    def delegate(sql):
        spark.conf.set("spark.uwheel.shim.tables", "")
        want = sorted(map(tuple, spark.sql(sql).collect()))
        spark.conf.set("spark.uwheel.shim.tables", tables_conf)
        return want

    rewritten = 0
    for sql, desc, pure_rollup in CASES:
        df = spark.sql(sql)
        plan = df._jdf.queryExecution().executedPlan().toString()
        used_rollup = "LocalTableScan" in plan or "__uwheel_rollup_" in plan
        scans_table = "events.parquet" in plan
        got = sorted(map(tuple, df.collect()))
        want = delegate(sql)
        assert rows_equal(got, want), (
            f"MISMATCH ({desc}):\n{sql}\nshim: {got[:5]}\nscan: {want[:5]}"
        )
        assert used_rollup, f"NOT REWRITTEN ({desc}):\n{sql}\n{plan[:800]}"
        if pure_rollup:
            assert not scans_table, (
                f"ALIGNED CASE SCANS TABLE ({desc}):\n{sql}\n{plan[:800]}"
            )
        rewritten += 1
    for sql in FALLTHROUGH:
        got = sorted(map(tuple, spark.sql(sql).collect()))
        assert rows_equal(got, delegate(sql)), f"FALLTHROUGH MISMATCH:\n{sql}"
    print(
        f"OK shim keyed-hop: {rewritten} keyed hopping shapes rewritten "
        f"(no table scan), {len(FALLTHROUGH)} fall-throughs match the scan"
    )


if __name__ == "__main__":
    main()
