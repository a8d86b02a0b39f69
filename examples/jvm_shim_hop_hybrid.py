"""Deterministic probe for the shim's hopping-window HYBRID rewrite
(``tryHopHybrid``): hopping ``window(ts, w, s)`` group-bys whose temporal
bounds the exact tiling cannot serve — strict ``>``, inclusive ``<=``,
sub-bucket literals, OR-of-ranges — must rewrite to the Expand over a
Union of rollup core rows and raw sliver rows, and match the delegate
scan row-for-row. Runs in a subprocess (the extensions class must load
with the JVM); see ``tests/test_jvm_shim.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

CASES = [
    # strict-lower + inclusive-upper: core + two slivers through the Expand
    "SELECT window(ts, '6 hours', '2 hours').start AS b, COUNT(*) AS n, "
    "SUM(value) AS s FROM events "
    "WHERE ts > '2024-01-03 00:00:00' AND ts <= '2024-01-08 00:00:00' "
    "GROUP BY window(ts, '6 hours', '2 hours')",
    # OR-of-ranges with mixed boundary ops, variance family
    "SELECT window(ts, '6 hours', '3 hours').end AS e, COUNT(value) AS c, "
    "STDDEV(value) AS sd FROM events "
    "WHERE (ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00') "
    "OR (ts > '2024-01-06 00:00:00' AND ts <= '2024-01-08 00:00:00') "
    "GROUP BY window(ts, '6 hours', '3 hours')",
    # whole-struct select, half-open strict lower
    "SELECT window(ts, '1 hour', '30 minutes') AS w, AVG(value) AS a, "
    "MIN(value) AS lo FROM events WHERE ts > '2024-01-05 00:00:00' "
    "GROUP BY window(ts, '1 hour', '30 minutes')",
    # sub-bucket (empty-core) interval: sliver-only legs
    "SELECT window(ts, '1 hour', '30 minutes').start AS b, MAX(value) AS hi "
    "FROM events WHERE ts > '2024-01-03 00:00:00.100' "
    "AND ts <= '2024-01-03 00:05:00.900' "
    "GROUP BY window(ts, '1 hour', '30 minutes')",
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
        shim_builder_confs,
    )

    builder = (
        SparkSession.builder.appName("uwheel-shim-hop-hybrid")
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
    tables_conf = spark.conf.get("spark.uwheel.shim.tables")

    rewritten = 0
    for sql in CASES:
        df = spark.sql(sql)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the rewrite feeds the Expand from the rollup (LocalTableScan or a
        # __uwheel_rollup_ parquet view); a pure fall-through has neither
        used_rollup = "LocalTableScan" in plan or "__uwheel_rollup_" in plan
        got = sorted(map(tuple, df.collect()))
        spark.conf.set("spark.uwheel.shim.tables", "")
        want = sorted(map(tuple, spark.sql(sql).collect()))
        spark.conf.set("spark.uwheel.shim.tables", tables_conf)
        assert rows_equal(got, want), (
            f"MISMATCH:\n{sql}\nshim: {got[:5]}\nscan: {want[:5]}"
        )
        rewritten += used_rollup
    assert rewritten == len(CASES), f"only {rewritten}/{len(CASES)} rewrote"
    print(
        f"OK shim hop-hybrid: {len(CASES)} boundary hopping shapes "
        "rewritten, answers match the scan"
    )


if __name__ == "__main__":
    main()
